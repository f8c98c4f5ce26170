"""Materialized-IVF-index evidence (round 6): `ivf_topk` re-assigns the
whole corpus to cells on EVERY call — fine for one query batch, absurd for
a query service. `build_ivf_index` + `ivf_topk_indexed` is the deployment
shape: assign once, write the corpus partitioned by cell, and let each
query batch read ONLY its probed `cell=N/` dirs via a static partition
filter.

This tool measures that trade at the ann_recall scale (100k × 64
clustered Gaussian, trained 64-cell codebook, n_probe=2):

- per-call path: B query batches × ivf_topk (prebuilt codebook passed in,
  so the delta is purely the per-call corpus assignment + full scan);
- indexed path: one build_ivf_index, then B batches × ivf_topk_indexed;
- the pruning fact itself: probed cells / total cells per batch, and the
  parquet files opened under probed dirs vs the whole index.

Both paths read the corpus from parquet per call (no .cache()) — that is
the service shape, and it keeps the comparison about plan work, not about
which side was warmed. One batch is also checked bit-identical across the
two paths.

Usage: python tools/ivf_index_bench.py [--n 100000] [--dim 64]
Writes BENCH/ivf_index.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ann_recall import synth_corpus, topk_sets  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batches", type=int, default=8)
    # a service answers SMALL batches often — 8 queries × n_probe=2 touch
    # ~quarter of a 64-cell index; 32-query batches probe most cells and
    # the index can't prune (measured: 40/64 cells at 32 queries)
    ap.add_argument("--batch-queries", type=int, default=8)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--n-cells", type=int, default=64)
    ap.add_argument("--n-probe", type=int, default=2)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dataflow_ordered_processing_spark.functions import similarity as S
    from dataflow_ordered_processing_spark.session import get_spark

    workdir = tempfile.mkdtemp(prefix="ivf-index-", dir="/dev/shm")
    corpus_path = os.path.join(workdir, "embeddings.parquet")
    idx_path = os.path.join(workdir, "ivf-index")
    synth_corpus(corpus_path, args.n, args.dim)

    spark = get_spark(
        "ivf-index-bench", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    try:
        def fresh_corpus():
            # single-file corpus → spread across cores like a multi-file
            # real table would be; NOT cached (service shape: every call
            # pays its own read)
            return spark.read.parquet(corpus_path).repartition(args.cpus * 2)

        def batch_queries(b: int):
            stride = args.n // (args.batches * args.batch_queries)
            qids = [
                (b * args.batch_queries + i) * stride
                for i in range(args.batch_queries)
            ]
            return fresh_corpus().filter(F.col("vec_id").isin(qids)).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_embedding"),
            )

        # one trained codebook for BOTH paths (the per-call side gets it
        # prebuilt so the measured delta is assignment+scan, not training)
        t0 = time.time()
        codebook = S.train_ivf_codebook(
            fresh_corpus(), "embedding", n_cells=args.n_cells, n_iter=3
        )
        train_wall = round(time.time() - t0, 2)

        t0 = time.time()
        S.build_ivf_index(
            fresh_corpus(), idx_path, n_cells=args.n_cells, codebook=codebook
        )
        build_wall = round(time.time() - t0, 2)

        # equality spot-check, batch 0
        direct0 = topk_sets(
            S.ivf_topk(
                fresh_corpus(), batch_queries(0), k=args.k,
                n_cells=args.n_cells, n_probe=args.n_probe, codebook=codebook,
            )
        )
        indexed0 = topk_sets(
            S.ivf_topk_indexed(
                spark, idx_path, batch_queries(0), k=args.k, n_probe=args.n_probe
            )
        )
        assert direct0 == indexed0, "indexed path diverged from per-call path"

        t0 = time.time()
        for b in range(args.batches):
            S.ivf_topk(
                fresh_corpus(), batch_queries(b), k=args.k,
                n_cells=args.n_cells, n_probe=args.n_probe, codebook=codebook,
            ).count()
        percall_wall = round(time.time() - t0, 2)

        probed_cells = []
        t0 = time.time()
        for b in range(args.batches):
            probed = S.ivf_assign(
                batch_queries(b), "q_embedding", codebook, n_probe=args.n_probe
            )
            probed_cells.append(
                sorted(
                    int(r["cell"])
                    for r in probed.select("cell").distinct().collect()
                )
            )
            S.ivf_topk_indexed(
                spark, idx_path, batch_queries(b), k=args.k, n_probe=args.n_probe
            ).count()
        indexed_wall = round(time.time() - t0, 2)

        # layout moved under atomic generation dirs (r6): count files in
        # the LIVE generation, the one every indexed query reads
        gen_corpus = os.path.join(S._gen_dir(idx_path), "corpus")
        files_total = len(
            glob.glob(os.path.join(gen_corpus, "epoch=*", "cell=*", "*.parquet"))
        )
        files_probed = [
            sum(
                len(glob.glob(os.path.join(gen_corpus, "epoch=*", f"cell={c}", "*.parquet")))
                for c in cells
            )
            for cells in probed_cells
        ]
        mean_cells = float(np.mean([len(c) for c in probed_cells]))
        mean_files = float(np.mean(files_probed))

        out = {
            "bench": "ivf_index",
            "n_vectors": args.n,
            "dim": args.dim,
            "n_cells": args.n_cells,
            "n_probe": args.n_probe,
            "batches": args.batches,
            "batch_queries": args.batch_queries,
            "cpus": args.cpus,
            "train_wall_s": train_wall,
            "build_wall_s": build_wall,
            "per_call_wall_s": percall_wall,
            "indexed_wall_s": indexed_wall,
            "speedup_at_batches": round(percall_wall / indexed_wall, 2),
            "breakeven_batches": (
                round(build_wall / per_batch_saving, 1)
                if (per_batch_saving := (percall_wall - indexed_wall) / args.batches) > 0
                else None
            ),
            "pruning": {
                "mean_probed_cells": round(mean_cells, 1),
                "total_cells": args.n_cells,
                "cell_fraction_pct": round(100.0 * mean_cells / args.n_cells, 1),
                "mean_files_opened": round(mean_files, 1),
                "total_index_files": files_total,
                "file_fraction_pct": round(100.0 * mean_files / files_total, 1),
            },
            "equality_check": "batch 0 bit-identical across paths",
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "ivf_index.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
