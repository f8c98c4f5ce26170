"""Isolate which stage limits scaling: JVM-only batch ordering vs the
pandas-state streaming stage vs the sink. One mode per process.

Usage: python tools/profile_scaling.py <mode> <cpus> <src>
  mode: sql | state | state_sink
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode, cpus, src = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from dataflow_ordered_processing_spark.session import get_spark
    from dataflow_ordered_processing_spark.schemas import TRANSCRIPT_SCHEMA

    spark = get_spark(f"prof-{mode}", master=f"local[{cpus}]", shuffle_partitions=cpus)

    if mode == "sql":
        from dataflow_ordered_processing_spark.operators.ordered_batch import (
            ordered_emit_batch,
        )

        df = spark.read.parquet(src)
        t0 = time.time()
        n = ordered_emit_batch(df, impl="sql").count()
    elif mode in ("state", "state_sink"):
        from dataflow_ordered_processing_spark.streaming import ordered_stream

        stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
        unified = ordered_stream(stream)
        t0 = time.time()
        if mode == "state":
            counts = {}

            def noop(bdf, eid):
                counts["n"] = bdf.count()

            q = (
                unified.writeStream.outputMode("append")
                .foreachBatch(noop)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            n = counts["n"]
        else:
            import tempfile

            from dataflow_ordered_processing_spark.streaming.sinks import (
                SinkConfig,
                split_sink,
            )

            sink = SinkConfig(data_path=tempfile.mkdtemp(prefix=f"pss-{cpus}-"))
            q = (
                unified.writeStream.outputMode("append")
                .foreachBatch(split_sink(sink))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            n = -1
    wall = time.time() - t0
    print(f"RESULT mode={mode} cpus={cpus} rows={n} wall={wall:.2f}")


if __name__ == "__main__":
    main()
