"""Connected-components scale evidence: the pointer-jumping claim, measured.

dedup_clusters promises O(log diameter) rounds (min-label propagation with
label compression); this runs the ADVERSARIAL worst case — one chain of N
nodes, the maximum-diameter graph, where plain propagation would need N
rounds — plus a mixed graph (chains + stars + singletons) closer to a real
near-dup corpus, and records rounds, wall time, and correctness of every
label.

Usage: python tools/cc_scale_bench.py [--n 1000000] [--cpus 32]
Writes BENCH/cc_scale.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    # the mixed-corpus expected-label algebra assumes n/2 is a multiple of
    # 100 (star hubs) and 50 (chain starts): clamp --n to the nearest valid
    # size (min 200) and SAY SO — a silently different workload than
    # requested would make external comparisons mismatched (r4d review)
    n_eff = max(200, args.n - args.n % 200)
    if n_eff != args.n:
        print(json.dumps({"event": "n_adjusted", "requested": args.n,
                          "effective": n_eff,
                          "reason": "n must be a multiple of 200 (>=200)"}))
        args.n = n_eff

    from pyspark.sql import functions as F

    from dataflow_ordered_processing_spark.functions.dedup import dedup_clusters
    from dataflow_ordered_processing_spark.session import get_spark

    spark = get_spark("cc-scale", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    n = args.n
    results = {}

    # ---- worst case: ONE chain of n nodes (diameter n-1) ----
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    chain = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    stats: dict = {}
    t0 = time.time()
    labels = dedup_clusters(docs, chain, max_iter=64, stats=stats, driver_max_edges=0)
    wrong = labels.filter(F.col("cluster_id") != 0).count()
    wall = round(time.time() - t0, 2)
    results["single_chain"] = {
        "nodes": n, "edges": n - 1, "diameter": n - 1,
        "rounds": stats.get("rounds"), "wall_s": wall, "mislabeled": wrong,
    }
    print(json.dumps({"case": "single_chain", **results["single_chain"]}))

    # ---- realistic mix: n/100 chains of 50 + n/2 star members + singletons ----
    # chains: node ids [0, n/2); edges (i, i+1) except at 50-boundaries
    half = n // 2
    chain_edges = spark.range(half - 1).filter(
        (F.col("id") % 50) != 49
    ).select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    # stars: hub h = half + 100*k, spokes h+1..h+99
    star_edges = spark.range(half, n - 100).filter(
        (F.col("id") % 100) != 0
    ).select(
        ((F.col("id") / 100).cast("long") * 100).alias("doc_a"),
        F.col("id").alias("doc_b"),
    )
    mixed = chain_edges.unionByName(star_edges)
    stats2: dict = {}
    t0 = time.time()
    labels2 = dedup_clusters(docs, mixed, max_iter=64, stats=stats2, driver_max_edges=0)
    # correctness: every chain member labels to its chain start, every star
    # member to its hub
    exp_chain = (F.col("doc_id") / 50).cast("long") * 50
    exp_star = (F.col("doc_id") / 100).cast("long") * 100
    expected = F.when(F.col("doc_id") < half, exp_chain).when(
        F.col("doc_id") < n - 100, exp_star
    ).otherwise(F.col("doc_id"))
    wrong2 = labels2.filter(F.col("cluster_id") != expected).count()
    wall2 = round(time.time() - t0, 2)
    results["mixed_corpus"] = {
        "nodes": n, "edges": mixed.count(),
        "rounds": stats2.get("rounds"), "wall_s": wall2, "mislabeled": wrong2,
    }
    print(json.dumps({"case": "mixed_corpus", **results["mixed_corpus"]}))

    out = {"bench": "cc_scale", "cpus": args.cpus, "cases": results}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "cc_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
