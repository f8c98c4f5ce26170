"""Deduplication operators for training-data pipelines over `documents`.

Five tiers, all shuffle-aware for the 100-TB case:

  exact          hash-groupBy on normalized text (one shuffle on the digest,
                 never on the raw text — group by md5, not by the document)
  minhash_lsh    shingle → k MinHashes → b bands → bucket join. Hash = md5
                 (available in BOTH Spark and DuckDB → exact SQL oracle;
                 lexicographic min over hex digests is a valid min-hash)
  simhash        64-bit SimHash from token md5 prefixes; near-dups = equal
                 simhash (or banded prefixes at scale)
  ngram_jaccard  exact Jaccard over word n-gram sets for candidate pairs —
                 the verify stage after LSH blocking
  embedding near-dup lives in similarity.py (cosine threshold)

Everything below is built-in Spark SQL expressions (explode / groupBy /
join) — no Python UDFs; all joins are equi-joins on digests so Catalyst can
pick shuffle-hash/sort-merge, and candidate generation never materializes
the O(n²) pair space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(col: str = "text"):
    return F.lower(F.regexp_replace(F.col(col), r"\s+", " "))


def _word_shingles(col: str = "text", k: int = 5):
    words = F.split(F.trim(_norm(col)), " ")
    n = F.size(words)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )


def dedup_exact(df: DataFrame, col: str = "text") -> DataFrame:
    """Exact dedup: keep the min doc_id per normalized-text digest.
    Returns (doc_id, exact_fp, n_copies). Shuffles 16-byte digests, not
    documents."""
    return (
        df.select("doc_id", F.md5(_norm(col)).alias("exact_fp"))
        .groupBy("exact_fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(df: DataFrame, col: str = "text", k: int = 8, shingle: int = 5) -> DataFrame:
    """k MinHash values per doc: min over md5(seed_i || shingle) hex digests.
    (doc_id, mh_0..mh_{k-1})."""
    # Explode shingles once, then k min-aggregates. Keeping the shingle
    # expression inside k higher-order transforms makes Catalyst inline and
    # re-evaluate it k times (53 s for 500 docs); explode + groupBy-min
    # evaluates it once and gets map-side partial aggregation — the plan
    # that survives 100 TB (shuffles k×16-byte digests per doc, not text).
    ex = df.select("doc_id", F.explode(_word_shingles(col, shingle)).alias("s"))
    return ex.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"seed{i}:"), F.col("s")))).alias(f"mh_{i}")
            for i in range(k)
        ]
    )


def _band_table(df: DataFrame, col: str, k: int, bands: int, shingle: int) -> DataFrame:
    """(doc_id, band_id, band_key) — ONE definition of the LSH band keys so
    the pair join and the bucket audit always describe the same buckets
    (band key = md5 of the '|'-joined row hashes of that band)."""
    rows = k // bands
    sigs = minhash_signatures(df, col, k, shingle)
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws("|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)])
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("band")).select(
        "doc_id", "band.band_id", "band.band_key"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    col: str = "text",
    k: int = 8,
    bands: int = 4,
    shingle: int = 5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing any band key.
    k MinHashes split into `bands` bands of k/bands rows each; band key =
    md5 of the concatenated row hashes. Returns distinct (doc_a, doc_b),
    doc_a < doc_b. The join is equi on (band_id, band_key) — bucketed, never
    all-pairs.

    ``max_bucket`` guards the adversarial case: a corpus with thousands of
    near-identical documents puts them all in ONE band bucket, and the
    self-join of that bucket is O(n²) pairs — a single straggler task that
    can kill the job at 100 TB. Band keys whose bucket exceeds the cap are
    dropped from candidate generation (standard LSH practice: such a
    mega-cluster is better handled by the cheaper exact tier — identical
    docs share an exact_fp — or by clustering on the bucket key directly).
    Audit what a cap would drop with ``lsh_bucket_stats``. The cap is
    OPT-IN (default None = exhaustive candidates): silently dropping pairs
    is a semantic change callers must ask for, and any oracle/expectation
    checked against this function must model the same cap. A production
    100-TB pass should set it (1024 is a reasonable ceiling) after reviewing
    ``lsh_bucket_stats``."""
    exploded = _band_table(df, col, k, bands, shingle)
    # self-join: without materialization, BOTH sides recompute the whole
    # shingle→minhash pipeline. localCheckpoint (eager) computes the band
    # table ONCE — digests only, bands × 16-byte keys per doc, tiny relative
    # to the corpus — truncates its lineage, and needs no caller-visible
    # cache management (blocks are released with the RDD by GC), unlike the
    # round-1 module-global persist cache (thread-unsafe, surprising).
    # CAVEAT (cluster): localCheckpoint blocks live on executor-local
    # storage only — an executor lost between here and the join fails the
    # job instead of recomputing; with dynamic allocation or preemptible
    # executors prefer reliable checkpointing (set a checkpoint dir and use
    # .checkpoint()) or persist with replication.
    exploded = exploded.localCheckpoint(eager=True)
    if max_bucket is not None:
        # one extra shuffle of (band_id, band_key) digests — cheap insurance
        # against the quadratic bucket; map-side partial agg keeps it light
        sizes = exploded.groupBy("band_id", "band_key").agg(
            F.count("*").alias("_bsz")
        )
        exploded = exploded.join(
            sizes.filter(F.col("_bsz") <= max_bucket), ["band_id", "band_key"]
        ).drop("_bsz")
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_bucket_stats(
    df: DataFrame, col: str = "text", k: int = 8, bands: int = 4, shingle: int = 5
) -> DataFrame:
    """Band-bucket size distribution — the audit query for choosing
    ``max_bucket`` (returns (band_id, band_key, n_docs), largest first).
    Run this before a production dedup pass: any bucket in the thousands is
    a mega-cluster the pair join should not expand."""
    return (
        _band_table(df, col, k, bands, shingle)
        .groupBy("band_id", "band_key")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"))
    )


def ngram_jaccard(
    pairs: DataFrame, docs: DataFrame, col: str = "text", shingle: int = 3
) -> DataFrame:
    """Exact Jaccard similarity over word n-gram sets for candidate pairs
    (the verify stage after LSH blocking). `pairs` = (doc_a, doc_b)."""
    sh = docs.select(F.col("doc_id"), _word_shingles(col, shingle).alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
    )


def simhash(df: DataFrame, col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash over word tokens: bit j of the fingerprint = majority vote of
    bit j across md5-derived token hashes (conv(substr(md5(tok),1,8),16,10)).

    Plan: explode tokens ONCE → hash each token ONCE → `bits` conditional
    sums in a single groupBy. The round-1 version ran `bits` separate
    F.aggregate higher-order folds, and Catalyst re-inlines the hash
    expression under each fold — md5 evaluated `bits`× per token (the same
    trap documented for MinHash above). The explode shape evaluates md5 once
    per token AND gets map-side partial aggregation: what shuffles is one
    row of `bits` small ints per doc, not tokens. Docs with no tokens get
    simhash=0 via the left join (matches the oracle's LEFT JOIN+coalesce).
    Pure SQL; exact DuckDB oracle exists."""
    words = F.filter(
        F.array_distinct(F.split(F.trim(_norm(col)), " ")), lambda w: F.length(w) > 0
    )
    ex = df.select("doc_id", F.explode(words).alias("w")).select(
        "doc_id", F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long").alias("hv")
    )
    votes = ex.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("hv"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = bit if fp is None else fp + bit
    return (
        df.select("doc_id")
        .join(votes, "doc_id", "left")
        .select("doc_id", F.coalesce(fp, F.lit(0).cast("long")).alias("simhash"))
    )


def dedup_keep_first(df: DataFrame, pairs: DataFrame) -> DataFrame:
    """Resolve near-dup pairs into a keep/drop decision: drop every doc that
    appears as the larger id of a pair (doc_a < doc_b by construction), i.e.
    keep the earliest doc of each near-dup cluster. Single-link, one round —
    exact when clusters are star-shaped around the earliest doc; run to
    fixpoint for full transitive closure."""
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return df.join(drop, "doc_id", "left_anti")
