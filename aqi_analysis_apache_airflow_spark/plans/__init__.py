from .registry import REGISTRY, Query, query

__all__ = ["REGISTRY", "Query", "query"]
