"""Projections / column ops (reference ops P1-P7, SURVEY.md §2.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P1/P2: bulk rename (``dags/etl/source_to_stage.py:55-68,92-98``)."""
    return df.withColumnsRenamed(mapping)


def with_audit_columns(
    df: DataFrame, created_col: str = "created_date_nds", updated_col: str = "last_updated_nds"
) -> DataFrame:
    """P7: NDS audit timestamps (``dags/etl/stage_to_nds.py:25-26`` etc.).

    The reference stamps ``utcnow()`` per row / per call; Spark stamps
    once per query (``current_timestamp()`` is a query-constant). That
    relaxation is deliberate — per-row clocks don't exist in a
    distributed plan and the reference's per-row values only differ by
    microseconds of loop time.
    """
    now = F.current_timestamp()
    return df.withColumn(created_col, now).withColumn(updated_col, now)


def with_source_id(df: DataFrame, source_id: int = 1) -> DataFrame:
    """P6: constant lineage column (``dags/etl/stage_to_nds.py:27`` etc.)."""
    return df.withColumn("source_id", F.lit(source_id))


def derive_measured_date(df: DataFrame) -> DataFrame:
    """P4: ``measured_date = date(created)``.

    Faithful to the reference quirk at ``dags/etl/source_to_stage.py:70``:
    the EPA ``Date`` column is renamed to ``measured_date`` and then
    immediately OVERWRITTEN by the date part of ``created``. Yes, that
    discards the actual measurement date; it is the reference's
    contract and parity requires it.
    """
    return df.withColumn("measured_date", F.to_date(F.col("created")))
