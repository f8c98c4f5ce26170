"""Cluster entrypoint: spark-submit --py-files <package.zip> jobs/run_pipeline.py

Runs the ordered-transcript pipeline: streaming source directory (or Iceberg
table when a catalog is configured) → ordered processor → dual sink
(data + status) with checkpointing and the metrics listener.

    spark-submit --py-files dataflow_ordered_processing_spark.zip \\
        jobs/run_pipeline.py --source /data/arrivals --out /data/out \\
        --checkpoint /data/ckpt [--heartbeat-ms 60000] [--trigger-s 2] \\
        [--available-now]

The same entrypoint serves the scaling-efficiency runs (north_rule): submit
identical jobs at N and 4N executors and compare the turns/sec reported on
stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="directory of arrival parquet files")
    ap.add_argument("--out", required=True, help="output base dir (data/, status/, dlq/)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--heartbeat-ms", type=int, default=None)
    ap.add_argument("--trigger-s", type=float, default=None)
    ap.add_argument("--available-now", action="store_true")
    ap.add_argument("--master", default=None, help="override master (tests/bench only)")
    args = ap.parse_args()

    from dataflow_ordered_processing_spark.schemas import TRANSCRIPT_SCHEMA
    from dataflow_ordered_processing_spark.session import get_spark
    from dataflow_ordered_processing_spark.streaming import (
        BufferMetricsListener,
        OrderedStreamConfig,
        ordered_stream,
    )
    from dataflow_ordered_processing_spark.streaming.sinks import (
        SinkConfig,
        read_sink,
        split_sink,
    )

    spark = get_spark("ordered-pipeline", master=args.master)
    spark.streams.addListener(
        BufferMetricsListener(os.path.join(args.out, "metrics.jsonl"))
    )

    cfg = OrderedStreamConfig(status_heartbeat_ms=args.heartbeat_ms)
    sink = SinkConfig(
        data_path=os.path.join(args.out, "data"),
        status_path=os.path.join(args.out, "status"),
        dlq_path=os.path.join(args.out, "dlq"),
        checkpoint=args.checkpoint,
    )

    src = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(args.source)
    writer = (
        ordered_stream(src, cfg)
        .writeStream.outputMode("append")
        .foreachBatch(split_sink(sink))
        .option("checkpointLocation", sink.checkpoint)
        .queryName("ordered-transcripts")
    )
    if args.available_now:
        writer = writer.trigger(availableNow=True)
    elif args.trigger_s:
        writer = writer.trigger(processingTime=f"{args.trigger_s} seconds")

    t0 = time.time()
    q = writer.start()
    if args.available_now:
        q.awaitTermination()
    else:
        q.processAllAvailable()
        q.stop()
    wall = time.time() - t0

    n = read_sink(spark, sink.data_path).count()
    print(
        json.dumps(
            {"rows_emitted": n, "wall_s": round(wall, 2), "turns_per_sec": round(n / wall, 1)}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
