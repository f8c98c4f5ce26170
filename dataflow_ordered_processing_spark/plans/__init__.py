from . import analytics, cep
from .cep import match_pattern

__all__ = ["analytics", "cep", "match_pattern"]
