"""Batch-ordering throughput at scale: generate N shuffled arrival rows,
run the pure-Catalyst ordering plan end-to-end (scan → one shuffle →
window drain → parquet write), report rows/s → BENCH/batch_<tag>.json.

This is the bulk/backfill path's scale evidence (the 100M-row line in
BENCH/BASELINE.md). The write is part of the measurement — a bulk job that
only counts is not a pipeline.

Usage: python tools/batch_bench.py [--rows 100000000] [--convs 1000000]
       [--workdir /dev/shm/batchbench] [--impl sql]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scaling_bench import generate_input  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--convs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--impl", default="sql", choices=["sql", "pandas"])
    ap.add_argument("--workdir", default="/dev/shm/batchbench")
    ap.add_argument("--files", type=int, default=64)
    args = ap.parse_args()

    src = os.path.join(args.workdir, "src")
    out = os.path.join(args.workdir, "out")
    # regenerate unless an existing dataset matches THIS workload — reusing
    # a stale cache would mislabel the evidence artifact
    gen_cfg = {"rows": args.rows, "convs": args.convs, "files": args.files}
    cfg_marker = os.path.join(args.workdir, "gen_config.json")
    cached = (
        os.path.exists(os.path.join(src, "_SUCCESS"))
        and os.path.exists(cfg_marker)
        and json.load(open(cfg_marker)) == gen_cfg
    )
    if not cached:
        shutil.rmtree(src, ignore_errors=True)
        n = generate_input(src, args.rows, args.convs, cpus=args.cpus, files=args.files)
        with open(cfg_marker, "w") as f:
            json.dump(gen_cfg, f)
        print(f"generated {n} rows", file=sys.stderr)

    from dataflow_ordered_processing_spark.operators.ordered_batch import (
        ordered_emit_batch,
    )
    from dataflow_ordered_processing_spark.session import get_spark

    spark = get_spark(
        "batch-bench", master=f"local[{args.cpus}]", shuffle_partitions=64
    )
    df = spark.read.parquet(src)
    n_in = df.count()  # warm the scan metadata; input size for the rate

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    ordered_emit_batch(df, impl=args.impl).write.mode("overwrite").parquet(out)
    wall = time.time() - t0
    n_out = spark.read.parquet(out).count()
    # self-verifying artifact: the rate claim is meaningless if rows dropped
    assert n_out == n_in, f"ordered output lost rows: {n_out} != {n_in}"
    result = {
        "rows_in": n_in,
        "rows_out": n_out,
        "convs": args.convs,
        "impl": args.impl,
        "cpus": args.cpus,
        "wall_s": round(wall, 2),
        "rows_per_sec": round(n_in / wall, 1),
    }
    shutil.rmtree(out, ignore_errors=True)
    tag = f"{args.rows // 1_000_000}m"
    with open(os.path.join(REPO, "BENCH", f"batch_{tag}.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
