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


def _warmup(spark) -> None:
    """Touch every python worker with the state-function code path once so
    the timed run measures steady-state throughput, not 32× cold pandas
    imports (real clusters run warm, long-lived executors)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dataflow_ordered_processing_spark.operators.ordered_batch import (
        ordered_emit_batch,
    )

    cores = spark.sparkContext.defaultParallelism
    pdf = pd.DataFrame(
        {
            "conv_id": [f"warm-{i}" for i in range(cores * 4)],
            "turn_idx": [1] * cores * 4,
            "role": ["user"] * cores * 4,
            "text": ["w"] * cores * 4,
            "tool": [None] * cores * 4,
            "ts": pd.Timestamp("2026-01-01"),
        }
    )
    df = spark.createDataFrame(pdf).repartition(cores, "conv_id")
    ordered_emit_batch(df, impl="pandas").count()
    df.groupBy("conv_id").agg(F.count("*")).count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="directory of arrival parquet files")
    ap.add_argument("--out", required=True, help="output base dir (data/, status/, dlq/)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--heartbeat-ms", type=int, default=None)
    ap.add_argument(
        "--evict-idle-heartbeats",
        type=int,
        default=None,
        help="state TTL: evict a key after this many idle timer firings "
        "(requires --heartbeat-ms)",
    )
    ap.add_argument("--trigger-s", type=float, default=None)
    ap.add_argument("--available-now", action="store_true")
    ap.add_argument(
        "--run-seconds",
        type=float,
        default=None,
        help="run the stream for a fixed duration then stop (required for "
        "timer-driven modes: processAllAvailable never quiesces while "
        "processing-time timers keep scheduling batches)",
    )
    ap.add_argument("--master", default=None, help="override master (tests/bench only)")
    ap.add_argument(
        "--hdfs-state-store",
        action="store_true",
        help="use the default HDFS-backed (in-heap) state store instead of "
        "RocksDB (RocksDB is the default: off-heap state avoids the "
        "HDFS store's per-version in-heap maps and scales better)",
    )
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="pin the state/shuffle partition count (production streaming "
        "keeps state shards FIXED while executor counts scale — required "
        "for a fair N vs 4N comparison and for checkpoint compatibility)",
    )
    ap.add_argument(
        "--no-warmup",
        action="store_true",
        help="skip the python-worker warm-up pass (cold-start measurement)",
    )
    ap.add_argument(
        "--max-files-per-trigger",
        type=int,
        default=None,
        help="split the bounded input into multiple micro-batches (enables "
        "sustained-throughput measurement over steady-state batches)",
    )
    ap.add_argument(
        "--engine",
        choices=["classic", "sharded"],
        default="classic",
        help="classic = state per conv_id (applyInPandasWithState per key); "
        "sharded = state per hash shard, one invocation per shard per batch "
        "(amortizes per-group overhead across conversations)",
    )
    ap.add_argument(
        "--export",
        choices=["avro", "json", "parquet"],
        default=None,
        help="after the run, bulk-export the ordered data table to "
        "<out>/export.<fmt> (Avro works jar-less via the built-in OCF "
        "writer) — the reference simulator's output-connector analog",
    )
    ap.add_argument(
        "--n-shards",
        type=int,
        default=None,
        help="shard count for --engine sharded; default 8 x defaultParallelism "
        "(measured sweet spot). PINNED to the checkpoint on first start: "
        "n_shards is baked into the state key, so resuming an existing "
        "checkpoint with a different value is refused (it would strand "
        "per-conversation state and break exactly-once)",
    )
    ap.add_argument(
        "--merge-on-key",
        action="store_true",
        help="paranoid exactly-once: additionally drop data rows at or below "
        "their conversation's sink high watermark (covers cross-epoch "
        "re-emission under eager state cleanup). O(batch) per epoch via the "
        "compact _keyidx high-watermark index — never re-reads the sink",
    )
    args = ap.parse_args()

    from dataflow_ordered_processing_spark.schemas import TRANSCRIPT_SCHEMA
    from dataflow_ordered_processing_spark.session import get_spark
    from dataflow_ordered_processing_spark.streaming import (
        BufferMetricsListener,
        OrderedStreamConfig,
        build_ordered_stream,
    )
    from dataflow_ordered_processing_spark.streaming.sinks import (
        SinkConfig,
        _check_engine_marker,
        export_table,
        read_sink,
        split_sink,
    )

    spark = get_spark(
        "ordered-pipeline", master=args.master, shuffle_partitions=args.shuffle_partitions
    )
    if not args.hdfs_state_store:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    spark.streams.addListener(
        BufferMetricsListener(os.path.join(args.out, "metrics.jsonl"))
    )

    cfg = OrderedStreamConfig(
        status_heartbeat_ms=args.heartbeat_ms,
        evict_idle_after_heartbeats=args.evict_idle_heartbeats,
    )
    sink = SinkConfig(
        data_path=os.path.join(args.out, "data"),
        dlq_path=os.path.join(args.out, "dlq"),
        checkpoint=args.checkpoint,
        merge_on_key=args.merge_on_key,
    )

    if not args.no_warmup:
        _warmup(spark)

    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if args.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
    from dataflow_ordered_processing_spark.streaming import resolve_n_shards

    src = reader.parquet(args.source)
    n_shards = args.n_shards
    if args.engine == "sharded":
        n_shards = resolve_n_shards(src, n_shards)
    _check_engine_marker(args.checkpoint, args.engine, n_shards)
    unified = build_ordered_stream(src, cfg, engine=args.engine, n_shards=n_shards)
    writer = (
        unified.writeStream.outputMode("append")
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
    if args.run_seconds:
        q.awaitTermination(args.run_seconds)
        q.stop()
    elif args.available_now:
        q.awaitTermination()
    else:
        q.processAllAvailable()
        q.stop()
    wall = time.time() - t0

    data = read_sink(spark, sink.data_path)
    if args.export:
        export_table(data, os.path.join(args.out, f"export.{args.export}"), args.export)
    n = data.count()
    result = {
        "rows_emitted": n,
        "wall_s": round(wall, 2),
        "turns_per_sec": round(n / wall, 1),
    }
    # sustained throughput: steady-state batches only (exclude batch 0 —
    # first-batch costs are one-time: planning, state-store open, source
    # listing). This is the rate a long-running stream settles at.
    try:
        rows, ms = 0, 0
        with open(os.path.join(args.out, "metrics.jsonl")) as f:
            for line in f:
                e = json.loads(line)
                if e.get("event") == "progress" and e["batchId"] >= 1 and e["numInputRows"]:
                    rows += e["numInputRows"]
                    ms += e["durationMs"].get("triggerExecution", 0)
        if rows and ms:
            result["sustained_rows"] = rows
            result["sustained_turns_per_sec"] = round(rows / (ms / 1000.0), 1)
    except OSError:
        pass
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
