"""spread_if_narrow (functions/spread.py): the size-conditional scan
spread must fire on narrow inputs (single-split bench corpus,
in-memory frames) and VANISH when the natural file splits already
feed the session parallelism — the property that keeps the r13 helper
spreads from becoming a full corpus shuffle at production scale.
"""

from __future__ import annotations

import re

from aqi_analysis_apache_airflow_spark.functions import spread as spread_mod
from aqi_analysis_apache_airflow_spark.functions.spread import (
    spread_if_narrow,
)

SF_DIR = "/root/testdata/sf0.001"


def _n_round_robin(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"RoundRobinPartitioning", plan))


def test_spread_fires_on_single_split_file(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = spread_if_narrow(df)
    assert _n_round_robin(out) == 1
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert out.rdd.getNumPartitions() == n_part


def test_spread_fires_on_in_memory_frame(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, t string")
    assert _n_round_robin(spread_if_narrow(df)) == 1


def test_spread_vanishes_when_splits_suffice(spark, monkeypatch):
    # shrink the split quantum so the tiny file counts as >= n_part
    # natural splits — the production-scale condition, exercised
    # without a 4 GiB fixture
    monkeypatch.setattr(spread_mod, "MAX_SPLIT_BYTES", 1)
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = spread_if_narrow(df)
    assert out is df
    assert _n_round_robin(out) == 0


def test_spread_values_unchanged(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    a = {tuple(r) for r in df.collect()}
    b = {tuple(r) for r in spread_if_narrow(df).collect()}
    assert a == b
