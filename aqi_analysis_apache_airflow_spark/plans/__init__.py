from .registry import REGISTRY, Query, query

# Importing the package fully populates REGISTRY — consumers
# (__spark_entry__, bench, tests) never see a partial registry.
from . import queries as _queries  # noqa: E402,F401
from . import extended as _extended  # noqa: E402,F401
from . import streaming_q as _streaming_q  # noqa: E402,F401
from . import tpch_extra as _tpch_extra  # noqa: E402,F401
from . import llm_ops as _llm_ops  # noqa: E402,F401
from . import curation as _curation  # noqa: E402,F401
from . import mining as _mining  # noqa: E402,F401
from . import retrieval as _retrieval  # noqa: E402,F401
from . import selection as _selection  # noqa: E402,F401
from . import analysis as _analysis  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "query"]
