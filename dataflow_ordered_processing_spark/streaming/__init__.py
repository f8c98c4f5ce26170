from .ordered_stream import OrderedStreamConfig, ordered_stream
from .ordered_sharded import ordered_stream_sharded
from .sinks import split_sink, start_ordered_pipeline
from .metrics import BufferMetricsListener


def build_ordered_stream(source, cfg=None, engine="classic", n_shards=None):
    """Single engine-dispatch point (used by the pipeline entrypoint, the
    sink wiring, and the test harness): 'classic' = state per conv_id,
    'sharded' = state per hash shard (same output, ~3x throughput).
    n_shards=None → 8 × defaultParallelism (measured sweet spot, see
    BENCH/BASELINE.md shard sweep)."""
    if engine == "sharded":
        if n_shards is None:
            n_shards = 8 * source.sparkSession.sparkContext.defaultParallelism
        return ordered_stream_sharded(source, cfg, n_shards=n_shards)
    if engine == "classic":
        return ordered_stream(source, cfg)
    raise ValueError(f"unknown engine {engine!r}")


__all__ = [
    "OrderedStreamConfig",
    "ordered_stream",
    "ordered_stream_sharded",
    "build_ordered_stream",
    "split_sink",
    "start_ordered_pipeline",
    "BufferMetricsListener",
]
