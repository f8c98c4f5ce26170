from .ordered_stream import OrderedStreamConfig, ordered_stream
from .sinks import split_sink, start_ordered_pipeline
from .metrics import BufferMetricsListener

__all__ = [
    "OrderedStreamConfig",
    "ordered_stream",
    "split_sink",
    "start_ordered_pipeline",
    "BufferMetricsListener",
]
