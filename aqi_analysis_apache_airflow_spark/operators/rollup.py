"""Incremental rollup: continuous-aggregate maintenance.

The 100 TB pattern behind "hypertable rollups"/materialized
aggregates: never re-aggregate history — aggregate each new batch to
PARTIAL state (mergeable sums/counts, decimal-exact) and MERGE it into
the rollup table keyed on the group columns. Cost per refresh is
O(batch + touched groups), independent of history size.

Only aggregates with a mergeable partial form belong here: sum, count,
min, max (avg = merged sum / merged count at read time). Non-mergeable
forms (exact median, distinct counts) need sketches — see
``g6_approx_sketches`` for the HLL route.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure -> (per-batch partial aggregate, merge of two partials)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def partial_rollup(
    batch: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate one batch to partial state.

    ``measures`` maps output column -> (agg_name, input_col), e.g.
    ``{"total_value": ("sum", "value"), "n_events": ("count", "*")}``.
    Sum inputs should be pre-cast to DECIMAL by the caller when exact
    cross-engine totals matter.
    """
    aggs = []
    for out, (how, col) in measures.items():
        partial_fn, _ = _MERGEABLE[how]
        aggs.append(partial_fn(F.lit(1) if col == "*" else F.col(col)).alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def merge_rollup(
    rollup: DataFrame | None,
    partial: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge a batch's partial state into the rollup table (None on
    first load). One union + one re-aggregation over the union's
    groups — at scale, with both sides bucketed on ``keys``, this is
    the no-Exchange MERGE shape proven in tests/test_scale_ops.py."""
    if rollup is None:
        return partial
    merged = rollup.unionByName(partial)
    aggs = []
    for out, (how, _) in measures.items():
        _, merge_fn = _MERGEABLE[how]
        aggs.append(merge_fn(F.col(out)).alias(out))
    return merged.groupBy(*keys).agg(*aggs)
