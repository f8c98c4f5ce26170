from .ordered_core import OrderedState, apply_batch, default_is_last, status_dict
from .ordered_batch import ordered_emit_batch, ordered_status_batch
from .cep_core import Step, match_strict

__all__ = [
    "OrderedState",
    "apply_batch",
    "default_is_last",
    "status_dict",
    "ordered_emit_batch",
    "ordered_status_batch",
    "Step",
    "match_strict",
]
