from .ordered_stream import OrderedStreamConfig, ordered_stream
from .ordered_sharded import ordered_stream_sharded
from .sinks import split_sink, start_ordered_pipeline
from .metrics import BufferMetricsListener

__all__ = [
    "OrderedStreamConfig",
    "ordered_stream",
    "ordered_stream_sharded",
    "split_sink",
    "start_ordered_pipeline",
    "BufferMetricsListener",
]
