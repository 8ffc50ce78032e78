from .dedupe import distinct_on, keep_first
from .filters import anti_join, cdc_window, not_in
from .merge import merge_upsert
from .surrogate import with_surrogate_keys

__all__ = [
    "anti_join",
    "cdc_window",
    "distinct_on",
    "keep_first",
    "merge_upsert",
    "not_in",
    "with_surrogate_keys",
]
