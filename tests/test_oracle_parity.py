"""Local mirror of the driver's correctness gate (SURVEY.md §5).

Runs every registered query on Spark AND its DuckDB oracle on the same
parquet, then compares row count, sorted column names, and the full
order-insensitive multiset of canonicalized rows (stricter than a hash:
mismatches show the offending rows).

Scale factor via SPARK_GRAFT_TEST_SF (default sf0.001 for speed;
CI-style full check: SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from aqi_analysis_apache_airflow_spark.plans import REGISTRY
from aqi_analysis_apache_airflow_spark.plans import extended as _extended  # noqa: F401
from aqi_analysis_apache_airflow_spark.plans import queries as _queries  # noqa: F401
from aqi_analysis_apache_airflow_spark.schemas import CORPUS_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _canon_cell(x) -> str:
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return "NULL"
    try:
        if pd.isna(x):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(x, float):
        return repr(x)
    return str(x)


def _canon_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return cols, rows


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in CORPUS_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


ORACLE_NAMES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_DIR).toPandas()
    odf = duck.execute(q.oracle).fetchdf()

    assert len(sdf) == len(odf), f"{name}: rowcount {len(sdf)} != {len(odf)}"
    scols, srows = _canon_frame(sdf)
    ocols, orows = _canon_frame(odf)
    assert scols == ocols, f"{name}: columns {scols} != {ocols}"
    if srows != orows:
        diffs = [
            (a, b) for a, b in zip(srows, orows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_no_rows_only_queries():
    """Every registry query is oracle-backed (the round-5 state; the
    former xxhash rows-only ops now self-verify in-query). A query
    registered with oracle=None fails here: either give it an oracle
    or consciously reinstate a rows-only runner for it."""
    assert ROWS_ONLY_NAMES == []
