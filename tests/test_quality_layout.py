"""observe()-based quality metrics and the z-order write layout."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from aqi_analysis_apache_airflow_spark.operators.layout import write_zordered
from aqi_analysis_apache_airflow_spark.operators.quality import (
    assert_quality,
    with_quality_observation,
)

SF_DIR = "/root/testdata/sf0.001"


def test_observation_matches_exact_aggregation(spark):
    """The observed metrics equal a direct aggregation over the same
    input — and cost zero extra jobs (they ride the noop write)."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    observed, obs = with_quality_observation(df, ["o_totalprice", "o_custkey"])
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    want = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("np"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
    ).first()
    assert got["n_rows"] == want["n"]
    assert got["o_totalprice__nulls"] == want["np"]
    assert got["o_totalprice__min"] == want["mn"]
    assert got["o_totalprice__max"] == want["mx"]
    # the gate passes on a healthy load...
    assert_quality(got, min_rows=100, cols=["o_totalprice", "o_custkey"])


def test_quality_gate_raises(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id int, v string"
    )
    observed, obs = with_quality_observation(df, ["v"])
    observed.write.format("noop").mode("overwrite").save()
    with pytest.raises(ValueError, match="null fraction"):
        assert_quality(obs.get, cols=["v"], max_null_fraction=0.5)
    with pytest.raises(ValueError, match="rows"):
        assert_quality(obs.get, min_rows=10)


def test_zorder_files_are_narrow_in_both_dims(spark, tmp_path_factory):
    """Every z-ordered file must cover a narrow min/max band of BOTH
    cluster columns — the property footer-stat skipping relies on. A
    single-column sort would leave the second column's per-file range
    at ~100% of the domain."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path_factory.mktemp("zorder")) + "/orders_z"
    write_zordered(orders, path, "o_custkey", "o_totalprice", n_files=8)

    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) >= 4

    g = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ca"),
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("cb"),
    ).first()
    frac_a, frac_b = [], []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(
                (F.max("o_custkey") - F.min("o_custkey")).alias("ra"),
                (F.max("o_totalprice") - F.min("o_totalprice")).alias("rb"),
            )
            .first()
        )
        frac_a.append(r["ra"] / g["ca"])
        frac_b.append(r["rb"] / g["cb"])
    # average per-file coverage of each dimension well under the full
    # domain (a 2-dim z-curve over 8 splits ⇒ each file is a run of
    # small quads; exact fraction depends on the split boundaries)
    assert sum(frac_a) / len(frac_a) < 0.6
    assert sum(frac_b) / len(frac_b) < 0.6
    # round-trip: no rows lost or duplicated
    assert spark.read.parquet(path).count() == orders.count()
