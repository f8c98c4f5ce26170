"""Offline drain for the hot-key side channel.

When routing is disabled (--reset-hot-channel with no --hot-keys),
run_pipeline preserves <out>/hot_raw — it may hold routed rows never
released to hot_ordered, and no future replay regenerates it. This tool
runs the same incremental ordering pass the pipeline runs post-stream
(streaming.hotkey.order_hot_channel) so those rows are released, after
which read_pipeline_output serves the complete combined view.

Usage: python tools/drain_hot_channel.py --out <pipeline out dir> [--cpus 8]
Prints one JSON line: {"rows_total": ..., "rows_new": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="pipeline output base dir")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--block", type=int, default=1024, help="salted-plan block size")
    args = ap.parse_args()

    from dataflow_ordered_processing_spark.session import get_spark
    from dataflow_ordered_processing_spark.streaming.hotkey import order_hot_channel

    spark = get_spark(
        "drain-hot", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    st = order_hot_channel(
        spark,
        os.path.join(args.out, "hot_raw"),
        os.path.join(args.out, "hot_ordered"),
        block=args.block,
    )
    print(json.dumps(st))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
