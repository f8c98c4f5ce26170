"""Per-key read evidence for key-clustered compact generations (VERDICT r5
#2): the reference clusters its BigQuery tables by key
(terraform/bigquery.tf:26,35,44) so per-key downstream queries prune; since
r6 our compaction folds write range-partitioned, conv_id-sorted generations
for the same effect. This tool measures it:

  1. build a 120-epoch sink (convs interleaved across every epoch — the
     worst case for pruning: every epoch dir contains every conv)
  2. time a single-conversation read (read_sink + filter) UNCOMPACTED
  3. compact (grace 0), time the same read over the clustered generations
  4. report the walls, the visible-dir counts, and the parquet row-group
     stats: what fraction of row groups a conv_id predicate can skip

Writes BENCH/clustered_read.json.

Usage: python tools/clustered_read_bench.py [--epochs 120] [--convs 400]
       [--rows-per-epoch 4000] [--cpus 8] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rowgroup_prune_stats(base: str, key: str) -> dict:
    """Across all VISIBLE committed dirs: how many parquet row groups could
    a conv_id == key predicate skip on min/max stats alone? Reported
    per dir kind — level-0 `epoch=` dirs hold every conv by construction
    (interleaved arrival) and can never prune; the clustered `compact=`
    generations are where the stats bite."""
    import pyarrow.parquet as pq

    from dataflow_ordered_processing_spark.streaming.sinks import sink_dirs

    by_kind = {"epoch": [0, 0], "compact": [0, 0]}  # kind -> [total, matching]
    for d in sink_dirs(base):
        kind = "compact" if os.path.basename(d).startswith("compact=") else "epoch"
        for fn in os.listdir(d):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, fn)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            ci = idx["conv_id"]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                by_kind[kind][0] += 1
                if st is None or st.min is None or st.min <= key <= st.max:
                    by_kind[kind][1] += 1  # no stats, or range covers key
    out = {}
    for kind, (total, kept) in by_kind.items():
        out[kind] = {
            "row_groups_total": total,
            "row_groups_matching_key": kept,
            "prunable_pct": round(100.0 * (1 - kept / total), 1) if total else None,
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--convs", type=int, default=400)
    ap.add_argument("--rows-per-epoch", type=int, default=4000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dataflow_ordered_processing_spark.session import get_spark
    from dataflow_ordered_processing_spark.streaming import sinks as sk

    # small parquet row groups (1 MB vs the 128 MB default) so the bench
    # exercises ROW-GROUP-level stat pruning at /dev/shm scale — at 100 TB
    # the default block size gives the same many-row-groups-per-file shape
    spark = get_spark(
        "clustered-read",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={"spark.hadoop.parquet.block.size": str(1 << 20)},
    )
    workdir = tempfile.mkdtemp(prefix="clustered-read-", dir="/dev/shm")
    base = os.path.join(workdir, "data")
    try:
        per_conv = args.rows_per_epoch // args.convs
        # every epoch holds rows for EVERY conv (interleaved arrival) — an
        # unclustered fold of these can never prune a per-key predicate
        batch = spark.range(args.rows_per_epoch).select(
            F.format_string("conv%05d", F.col("id") % args.convs).alias("conv_id"),
            (F.col("id") / args.convs).cast("long").alias("turn_off"),
            F.lit("data").alias("row_type"),
            F.sha2(F.col("id").cast("string"), 256).alias("text"),
        )
        for e in range(args.epochs):
            sk._write_idempotent(
                batch.withColumn(
                    "turn_idx", F.col("turn_off") + 1 + e * per_conv
                ).drop("turn_off"),
                base,
                e,
            )

        key = f"conv{args.convs // 2:05d}"

        def read_wall() -> tuple[float, int]:
            walls = []
            n = 0
            for _ in range(args.reps):
                t0 = time.time()
                n = (
                    sk.read_sink(spark, base, table="unified")
                    .filter(F.col("conv_id") == key)
                    .count()
                )
                walls.append(time.time() - t0)
            walls.sort()
            return walls[len(walls) // 2], n  # median

        dirs_before = len(sk.sink_dirs(base))
        stats_before = _rowgroup_prune_stats(base, key)
        wall_before, n_before = read_wall()

        t0 = time.time()
        folds = sk.compact_data_epochs(spark, base, fanout=16, grace_seconds=0)
        compact_wall = time.time() - t0

        dirs_after = len(sk.sink_dirs(base))
        stats_after = _rowgroup_prune_stats(base, key)
        wall_after, n_after = read_wall()
        assert n_before == n_after, (n_before, n_after)

        out = {
            "bench": "clustered_read",
            "epochs": args.epochs,
            "convs": args.convs,
            "rows_total": args.epochs * args.rows_per_epoch,
            "cpus": args.cpus,
            "reps": args.reps,
            "single_conv_rows": n_after,
            "folds": folds,
            "compact_wall_s": round(compact_wall, 2),
            "visible_dirs": {"before": dirs_before, "after": dirs_after},
            "per_key_read_wall_s": {
                "uncompacted": round(wall_before, 3),
                "compacted_clustered": round(wall_after, 3),
                "speedup": round(wall_before / wall_after, 2),
            },
            "rowgroup_stats": {"before": stats_before, "after": stats_after},
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "clustered_read.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
