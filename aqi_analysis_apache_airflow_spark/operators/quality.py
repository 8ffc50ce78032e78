"""Pipeline data-quality metrics via ``Dataset.observe`` — counters
collected DURING the action that already runs, not by a second pass.

A warehouse write that also wants row counts / null rates / bounds
normally pays an extra aggregation job over the same input (or worse,
a ``count()`` that re-runs the whole plan). ``observe`` attaches the
aggregates to the existing plan as accumulator-style metrics: zero
extra scan, zero extra shuffle, available on the driver the moment the
action finishes — the Spark-native form of the reference's row-count
bookkeeping around each load (``dags/etl/stage_to_nds.py``'s
merge-then-log pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(cols: list[str]) -> list[Column]:
    """n_rows plus per-column null counts and min/max — the standard
    load-audit set. All algebraic aggregates, so they merge map-side
    inside whatever action the caller runs."""
    ms: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        ms.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        ms.append(F.min(c).alias(f"{c}__min"))
        ms.append(F.max(c).alias(f"{c}__max"))
    return ms


def with_quality_observation(
    df: DataFrame, cols: list[str]
) -> tuple[DataFrame, Observation]:
    """Attach a quality observation to ``df``. The returned DataFrame
    is the same data; after the caller runs ANY action on it, the
    Observation's ``.get`` holds the metrics dict."""
    obs = Observation()
    return df.observe(obs, *quality_metrics(cols)), obs


def assert_quality(
    metrics: dict,
    min_rows: int = 1,
    max_null_fraction: float = 0.0,
    cols: list[str] | None = None,
) -> None:
    """The gate: raise if the observed load is empty or a watched
    column's null rate exceeds the budget. Runs on the driver against
    the already-collected observation — no Spark job."""
    n = metrics["n_rows"]
    if n < min_rows:
        raise ValueError(f"quality gate: {n} rows < required {min_rows}")
    for c in cols or []:
        nulls = metrics[f"{c}__nulls"]
        if n and nulls / n > max_null_fraction:
            raise ValueError(
                f"quality gate: {c} null fraction {nulls / n:.4f} exceeds "
                f"{max_null_fraction}"
            )
