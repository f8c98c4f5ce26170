"""Text-analysis operators for training-data pipelines over `documents`
(doc_id, text, lang, source, n_chars): language-ID, quality scoring, token
counting, document fingerprinting.

All pure built-in Spark SQL expressions (JVM, codegen) — no Python UDFs.
Each has an exact DuckDB oracle (dialect-portable expressions only), wired in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "fr": ["le", "la", "et"],
    "de": ["der", "die", "und"],
}


# GPT-2-ish pre-tokenizer shape, dialect-portable (no lookaheads, so it means
# the same thing to Java regex and RE2): letter runs | single digit | single
# non-alnum symbol. The real BPE merges further; this counts pre-merge pieces.
BPE_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# PII patterns, dialect-portable. Applied in order; earlier replacements
# insert only <TAG> tokens that later patterns cannot match.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\+[0-9][0-9 ()-]{7,}[0-9]"),
]


def _ws_token_count(col: str) -> F.Column:
    """THE whitespace tokenizer (shared by token_count and pack_sequences —
    review r7c: two copies would let packing assignments and token counts
    silently diverge if the convention ever changes)."""
    return F.size(F.split(F.trim(F.col(col)), r"\s+"))


def token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish counts: a real pre-tokenizer regex match
    count (BPE_REGEX) and the cheap chars/4 estimate."""
    toks = _ws_token_count(col)
    return df.select(
        "doc_id",
        toks.alias("n_ws_tokens"),
        F.regexp_count(F.col(col), F.lit(BPE_REGEX)).cast("long").alias("n_bpe_regex"),
        F.ceil(F.length(col) / 4).cast("long").alias("n_bpe_est"),
        F.length(col).alias("n_chars_measured"),
    )


def redact_pii(df: DataFrame, col: str = "text") -> DataFrame:
    """Training-data scrubbing: replace emails / IPv4s / phone numbers with
    <TAG> tokens and count each kind. Pure codegen regexp_replace chain —
    no Python, narrow (no shuffle), exactly what you want applied to 100 TB
    of raw text before anything else runs."""
    redacted = F.col(col)
    counts = []
    for name, pat in PII_PATTERNS:
        # count on THIS STAGE'S INPUT (the progressively-redacted string),
        # not the original text: when patterns overlap (e.g. 'a@1.2.3.4.net'
        # is consumed whole by the email replace), counting the original
        # would report an <IPV4> that was never inserted — n_<kind> must
        # equal the number of <KIND> tokens actually in `redacted`
        counts.append(
            F.regexp_count(redacted, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return df.select("doc_id", redacted.alias("redacted"), *counts)


def vocab_topk(df: DataFrame, col: str = "text", k: int = 50) -> DataFrame:
    """Corpus vocabulary head: top-k whitespace tokens by frequency — the
    first question asked of any new training corpus (tokenizer coverage,
    boilerplate detection). explode → groupBy count gets map-side partial
    aggregation, so what shuffles is one (token, partial_count) row per
    distinct token per partition, not the token stream; the final top-k is
    a TakeOrdered (no full sort) at 100 TB. Deterministic tie-break by
    token so the cut at k is stable."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(col))), r"\s+"), lambda w: F.length(w) > 0
    )
    return (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def doc_length_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Corpus length distribution: exact percentiles + mean of character
    lengths — the standard budget/truncation analysis. Uses Spark's EXACT
    percentile (linear interpolation, same definition as DuckDB's
    quantile_cont) so the oracle matches bit-for-bit on integer lengths.
    Scale note: exact-percentile state is a per-partition value→count map,
    O(distinct lengths) — bounded for character lengths, so safe at 100 TB;
    for an unbounded metric swap in percentile_approx."""
    length = F.length(col).alias("len")
    return df.select(length).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("CAST(percentile(len, 0.5D) AS DOUBLE)").alias("p50_chars"),
        F.expr("CAST(percentile(len, 0.9D) AS DOUBLE)").alias("p90_chars"),
        F.expr("CAST(percentile(len, 0.99D) AS DOUBLE)").alias("p99_chars"),
        F.avg("len").alias("mean_chars"),
        F.max("len").cast("long").alias("max_chars"),
    )


def _marker_hits(col: str, words: list[str]) -> F.Column:
    """Stopword hit count: ' the ' / ' and ' style marker matches in the
    lowered, space-padded text."""
    lowered = F.concat(F.lit(" "), F.lower(F.col(col)), F.lit(" "))
    return sum(
        (F.length(lowered) - F.length(F.regexp_replace(lowered, rf" {w} ", "|")))
        / (len(w) + 1)
        for w in words
    ).cast("long")


def _quality_exprs(col: str) -> dict[str, F.Column]:
    """The quality-gate feature expressions, name → Column — shared by
    quality_score and training_mix so the composed pipeline evaluates them
    inline on its single corpus scan instead of re-deriving them through a
    self-join."""
    length = F.length(col)
    n_tokens = F.size(F.split(F.trim(F.col(col)), r"\s+"))
    n_punct = length - F.length(F.regexp_replace(F.col(col), r"[.,;:!?]", ""))
    n_stop = _marker_hits(col, LANG_MARKERS["en"])
    mean_tok_len = (length - n_tokens + 1) / n_tokens
    return {
        "n_chars_q": length,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "n_stopword_hits": n_stop,
        "mean_token_len": F.round(mean_tok_len, 4),
        "quality": F.round(
            F.least(F.lit(1.0), n_tokens / 64.0) * 0.5
            + F.when(n_punct > 0, 0.25).otherwise(0.0)
            + F.least(F.lit(0.25), n_stop / 20.0),
            4,
        ),
    }


def quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score — the standard cheap quality gates of LLM data pipelines."""
    e = _quality_exprs(col)
    return df.select("doc_id", *(v.alias(k) for k, v in e.items()))


def _lang_best(col: str) -> F.Column:
    """argmax-by-marker-hits language struct (n, ord, code) with a
    deterministic tie-break: greatest over (count, -code-rank). Shared by
    lang_id and training_mix."""
    pairs = F.array(
        *[
            F.struct(
                _marker_hits(col, LANG_MARKERS[c]).alias("n"),
                F.lit(-i).alias("ord"),
                F.lit(c).alias("code"),
            )
            for i, c in enumerate(sorted(LANG_MARKERS))
        ]
    )
    return F.array_max(pairs)


def lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax over per-language stopword hit counts
    (deterministic tie-break by language code)."""
    best = _lang_best(col)
    return df.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        best["code"].alias("lang_pred"),
        best["n"].alias("marker_hits"),
    )


def fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of normalized text (exact-dup key) + a
    shingle sketch fingerprint (min of word-5-gram md5s — a 1-perm MinHash,
    rolling-hash analog) for near-dup blocking."""
    norm = F.lower(F.regexp_replace(F.col(col), r"\s+", " "))
    words = F.split(F.trim(norm), " ")
    n = F.size(words)
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 5, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, 5)),
    )
    return df.select(
        "doc_id",
        F.md5(norm).alias("exact_fp"),
        F.array_min(F.transform(shingles, F.md5)).alias("shingle_fp"),
    )


def repetition_score(df: DataFrame, col: str = "text", shingle: int = 3) -> DataFrame:
    """Intra-document repetition: 1 - distinct/total word n-grams — the
    standard boilerplate/looping-text quality signal (high score = the doc
    repeats itself). Pure codegen over an in-row array; no shuffle at all —
    the plan is a narrow projection, ideal at 100 TB. Docs with fewer than
    one shingle score 0.0. Returns (doc_id, rep_score) rounded to 6dp for
    cross-engine exactness."""
    from .dedup import _norm

    words = F.split(F.trim(_norm(col)), " ")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - shingle, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, shingle)),
    )
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    score = F.when(
        n < shingle, F.lit(0.0)
    ).otherwise(F.round(1.0 - distinct / total, 6))
    return df.select("doc_id", score.alias("rep_score"))


def _md5_bucket(key, salt: str, modulus: int):
    """The ONE md5 hash-bucket expression behind dataset_split and
    sample_stratified: bucket = int(first 8 hex chars of md5(key[:salt]))
    mod modulus. Content-independent, stable under re-runs/re-partitioning
    and corpus growth, zero shuffle; md5 rather than xxhash64 so the DuckDB
    oracles are bit-exact. Any change here must be mirrored in BOTH
    hand-written oracles (__spark_entry__)."""
    keyed = F.concat(key.cast("string"), F.lit(salt)) if salt else key.cast("string")
    return (
        F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long") % modulus
    )


def dataset_split(
    df: DataFrame,
    train_pct: int = 90,
    val_pct: int = 5,
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent hash
    bucket: split = f(md5(key) mod 100). Properties that matter in a real
    pipeline: stable under re-runs and re-partitioning (no RNG), documents
    never migrate between splits when the corpus grows, and the operation
    is a narrow projection (zero shuffle). md5 rather than xxhash64 so the
    DuckDB oracle is bit-exact. Returns (doc_id, split)."""
    return df.select(
        "doc_id", _split_expr(key, train_pct, val_pct).alias("split")
    )


def _split_expr(key: str, train_pct: int, val_pct: int) -> F.Column:
    """The ONE train/val/test md5-bucket CASE expression — shared by
    dataset_split and training_mix (review r6b: a third hand copy of the
    recipe is a divergence waiting to happen; the oracles are already two)."""
    bucket = _md5_bucket(F.col(key), "", 100)
    return (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )


def decontaminate(
    df: DataFrame, benchmark: DataFrame, col: str = "text", shingle: int = 8
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    `shingle`-gram with an evaluation set — the standard n-gram-overlap
    contamination test run before training. Plan shape for 100 TB: the
    BENCHMARK side (small by nature — eval sets are thousands of rows) is
    digested to distinct 16-byte gram hashes and BROADCAST; the corpus
    explodes its grams once and left-semi-joins the broadcast set, so the
    corpus is scanned once, never shuffled, and what flows is doc_id +
    matched digest. Returns (doc_id, n_contaminated_grams) for flagged
    docs only; drop them with an anti-join on the result."""
    from .dedup import _word_shingles

    bench_grams = (
        benchmark.select(
            F.explode(_word_shingles(col, shingle)).alias("g")
        )
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    doc_grams = df.select(
        "doc_id", F.explode(_word_shingles(col, shingle)).alias("g")
    ).select("doc_id", F.md5("g").alias("gh"))
    return (
        doc_grams.join(F.broadcast(bench_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_contaminated_grams"))
    )


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    stratum: str = "source",
    default_rate: float = 0.0,
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the data-mixing primitive a
    training pipeline runs last (e.g. keep 100% of books, 10% of common
    crawl). Keep decision = md5-bucket(key) < rate·scale, so it has the
    same production properties as dataset_split: stable under re-runs and
    corpus growth (a kept document stays kept when more data arrives),
    no RNG, and a pure narrow projection — zero shuffle at any scale; the
    per-stratum rate lookup is a small CASE expression, never a join.
    Rates are fractions in [0, 1]; strata absent from `rates` use
    `default_rate`. Returns the kept rows (all input columns).

    A seeded-RNG sample() cannot give any of this: it changes membership
    on every retry/re-partition and cannot be reproduced by an external
    auditor from the data alone. md5 rather than xxhash64 keeps the DuckDB
    oracle bit-exact (same choice as dataset_split)."""
    # bucket in [0, 1e6): md5 is uniform, so P(bucket < r·1e6) = r with
    # ±1e-6 rate granularity
    bucket = _md5_bucket(F.col(key), ":sample", 1_000_000)
    rate = F.lit(float(default_rate))
    for name, r in sorted(rates.items()):
        rate = F.when(F.col(stratum) == name, F.lit(float(r))).otherwise(rate)
    # round, don't truncate (ADVICE r5): casting 0.3·1e6 = 299999.999…
    # straight to long would silently drop one bucket (~1e-6 of docs) for
    # any rate whose float64 product lands below the integer
    return df.filter(bucket < F.round(rate * 1_000_000).cast("long"))


def training_mix(
    docs: DataFrame,
    benchmark: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    rates: dict[str, float] | None = None,
    stratum: str = "source",
    default_rate: float = 1.0,
    train_pct: int = 90,
    val_pct: int = 5,
    col: str = "text",
) -> DataFrame:
    """The end-to-end training-data curation mix, composed the way a real
    pretraining pipeline chains it: language gate → quality gate →
    benchmark decontamination → per-stratum deterministic downsampling →
    train/val/test assignment. Returns the kept documents as
    (doc_id, <stratum>, n_tokens, quality, split).

    Plan shape for 100 TB (the reason this is one operator and not five
    joined queries): the language-ID argmax and quality features are
    evaluated INLINE on a single narrow corpus scan (`_lang_best` /
    `_quality_exprs` — no self-joins re-reading the corpus per feature);
    the only second corpus pass is decontaminate's gram explode, whose
    flagged-doc output (tiny by nature — docs overlapping an eval set) is
    broadcast for the anti-join; sampling and split assignment are
    zero-shuffle md5-bucket projections. Net: two corpus scans, one
    broadcast, and no corpus-scale shuffle — the only exchange in the plan
    aggregates the matched (doc_id, gram) pairs out of the contamination
    join, a set bounded by eval-set overlap, not corpus size.

    `default_rate` deliberately defaults to 1.0 (keep strata absent from
    `rates`): a curation entry point whose default silently dropped every
    document would be a footgun (review r6b); pass an explicit
    default_rate to downsample unlisted strata.

    Every stage reuses the exact-oracle recipe of its standalone operator
    (lang_id / quality_score / decontaminate / sample_stratified /
    dataset_split), so the composition stays reproducible in SQL."""
    q = _quality_exprs(col)
    best = _lang_best(col)
    flagged = decontaminate(docs, benchmark, col=col).select("doc_id")
    survivors = (
        docs.withColumn("n_tokens", q["n_tokens"])
        .withColumn("quality", q["quality"])
        .withColumn("lang_pred", best["code"])
        .filter(
            (F.col("lang_pred") == lang)
            & (F.col("quality") >= float(min_quality))
        )
        .join(F.broadcast(flagged), "doc_id", "left_anti")
    )
    kept = sample_stratified(
        survivors, rates or {}, stratum=stratum, default_rate=default_rate
    )
    return kept.select(
        "doc_id",
        stratum,
        "n_tokens",
        "quality",
        _split_expr("doc_id", train_pct, val_pct).alias("split"),
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    col: str = "text",
    order: str = "doc_id",
    buckets: int = 8192,
) -> DataFrame:
    """Pretraining sequence-packing assignment: documents are concatenated
    in ``order`` and chunked every ``max_tokens`` whitespace tokens (the
    standard concat-and-chunk packing GPT-style pipelines use); each doc is
    assigned the chunk its first token falls in plus its offset inside it.

    100-TB plan shape: a global prefix sum is the textbook scale trap (one
    ORDER BY window = every row through one partition), so this runs the
    distributed two-phase form — per-bucket cumulative sums in parallel
    windows over contiguous ``order`` RANGES (bucket width derived from the
    order column's actual min/max, one narrow-column agg, so sparse ids and
    epoch timestamps still yield ~``buckets`` buckets — review r7c: a
    value-magnitude bucket id degenerates to one doc per bucket on sparse
    keys and resurrects the global window), bucket totals rolled into
    offsets (a window over ≤``buckets`` rows, driver-scale), offsets
    BROADCAST back. Exactly equal to the single-window form, which is what
    the DuckDB oracle runs. ``order`` must be numeric; ties are broken
    deterministically by doc_id (document the same tie-break in any custom
    oracle).

    Output: (doc_id, n_tokens, seq_id, token_offset).
    """
    if int(max_tokens) < 1:
        # ADVICE r7: max_tokens=0 would make the `_cum DIV max_tokens` /
        # pmod projections emit NULL seq_id/token_offset silently — fail at
        # config time like the function's other validations
        raise ValueError(f"pack_sequences max_tokens must be >= 1, got {max_tokens}")
    if not any(
        f.name == order and f.dataType.typeName() in
        ("integer", "long", "short", "byte", "double", "float", "decimal",
         "timestamp", "timestamp_ntz", "date")
        for f in df.schema.fields
    ):
        raise ValueError(
            f"pack_sequences order column {order!r} must be numeric or "
            "temporal (bucket ranges are arithmetic on its values)"
        )
    n_tok = _ws_token_count(col).cast("long")
    t = df.select(
        "doc_id", F.col(order).cast("long").alias("_ord"), n_tok.alias("n_tokens")
    )
    lo, hi = t.agg(F.min("_ord"), F.max("_ord")).collect()[0]
    if lo is None:
        return t.select(
            "doc_id", "n_tokens",
            F.lit(None).cast("long").alias("seq_id"),
            F.lit(None).cast("long").alias("token_offset"),
        ).filter(F.lit(False))
    width = max(1, -(-(int(hi) - int(lo) + 1) // int(buckets)))  # ceil div
    t = t.withColumn(
        "_b", F.floor((F.col("_ord") - F.lit(int(lo))) / F.lit(width)).cast("long")
    )
    wb = (
        Window.partitionBy("_b")
        .orderBy("_ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn("_cum_b", F.coalesce(F.sum("n_tokens").over(wb), F.lit(0)))
    totals = t.groupBy("_b").agg(F.sum("n_tokens").alias("_tot"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select("_b", "_off")
    return (
        t.join(F.broadcast(offsets), "_b")
        .withColumn("_cum", F.col("_off") + F.col("_cum_b"))
        .select(
            "doc_id",
            "n_tokens",
            # integer div/mod — exact at any scale (no double rounding)
            F.expr(f"CAST(_cum DIV {int(max_tokens)} AS BIGINT)").alias("seq_id"),
            F.pmod(F.col("_cum"), F.lit(int(max_tokens)))
            .cast("long")
            .alias("token_offset"),
        )
    )


def repeated_ngrams(
    df: DataFrame, shingle: int = 8, min_docs: int = 2, col: str = "text"
) -> DataFrame:
    """Cross-document repeated-passage detection (the boilerplate /
    memorization hazard class of Lee et al. 2022's train-data dedup): word
    ``shingle``-grams occurring in at least ``min_docs`` DISTINCT documents.
    The result is the blocklist a masking/filter pass consumes.

    100-TB plan shape: the corpus is scanned once, grams leave the scan as
    16-byte md5 digests, and the only shuffles move (digest, doc_id) pairs
    — never text. Returns (gh, n_docs)."""
    from .dedup import _word_shingles

    # _word_shingles is array_distinct PER DOC already, so (gh, doc_id) is
    # unique out of the explode — count(*) IS the distinct-doc count, and a
    # .distinct() here would only add a second full-width shuffle for
    # nothing (review r7c)
    return (
        df.select("doc_id", F.explode(_word_shingles(col, shingle)).alias("g"))
        .select(F.md5("g").alias("gh"), "doc_id")
        .groupBy("gh")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= int(min_docs))
    )
