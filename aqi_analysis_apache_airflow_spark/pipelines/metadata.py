"""CET/LSET incremental-load control (reference op C1, SURVEY.md §2.9).

The reference keeps one row per stage table in a Postgres ``metadata``
table: ``cet`` (Current Extraction Time, stamped at run start by
``set_cet``, ``dags/etl/source_to_stage.py:9-16``) and ``lset`` (Last
Successful Extraction Time, stamped after a successful load by
``set_lset``, ``:19-26``); ``get_metadata`` reads both (``:37-45``).
Rows with ``lset <= last_updated <= cet`` are extracted (``:73``) —
a hand-rolled batch watermark. Same protocol here over a tiny parquet
table; the streaming surface replaces it with ``withWatermark``.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from ..schemas import METADATA_SCHEMA
from .warehouse import Warehouse

METADATA_TABLE = "metadata"


def _now() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def _upsert_field(wh: Warehouse, table_name: str, field: str, value: datetime) -> None:
    meta = wh.read(METADATA_TABLE, METADATA_SCHEMA)
    others = meta.filter(F.col("table_name") != table_name)
    mine = meta.filter(F.col("table_name") == table_name)
    updated = mine.withColumn(field, F.lit(value))
    if mine.isEmpty():
        row = {"table_name": table_name, "cet": None, "lset": None}
        row[field] = value
        updated = wh.spark.createDataFrame(
            [tuple(row[f.name] for f in METADATA_SCHEMA.fields)], METADATA_SCHEMA
        )
    wh.overwrite(others.unionByName(updated), METADATA_TABLE)


def set_cet(wh: Warehouse, table_name: str, at: datetime | None = None) -> None:
    """Stamp extraction start (``dags/etl/source_to_stage.py:9-16``)."""
    _upsert_field(wh, table_name, "cet", at or _now())


def set_lset(wh: Warehouse, table_name: str, at: datetime | None = None) -> None:
    """Stamp extraction success (``dags/etl/source_to_stage.py:19-26``)."""
    _upsert_field(wh, table_name, "lset", at or _now())


def get_metadata(wh: Warehouse, table_name: str) -> tuple[datetime | None, datetime | None]:
    """Return (cet, lset) (``dags/etl/source_to_stage.py:37-45``)."""
    rows = (
        wh.read(METADATA_TABLE, METADATA_SCHEMA)
        .filter(F.col("table_name") == table_name)
        .collect()
    )
    if not rows:
        return None, None
    return rows[0]["cet"], rows[0]["lset"]
