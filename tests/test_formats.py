"""Source/sink format coverage beyond parquet+CSV: JSON and ORC
round-trips through the engine's loader conventions (timestamps stay
NTZ-comparable, schema survives)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aqi_analysis_apache_airflow_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def _canon(df, cols):
    return sorted(tuple(map(str, r)) for r in df.select(*cols).collect())


def test_json_round_trip(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fmt") / "events_json")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value",
        # JSON has no native timestamp: serialize as ISO string and
        # parse back on read — the documented convention for the format
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_iso"),
    )
    ev.write.mode("overwrite").json(out)
    back = (
        spark.read.json(out)
        .withColumn("ts", F.to_timestamp("ts_iso").cast("timestamp_ntz"))
        .drop("ts_iso")
    )
    want = ev.withColumn("ts", F.to_timestamp("ts_iso").cast("timestamp_ntz")).drop(
        "ts_iso"
    )
    cols = ["event_id", "user_id", "event_type", "value", "ts"]
    assert _canon(back, cols) == _canon(want, cols)


def test_orc_round_trip(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fmt") / "lineitem_orc")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )
    li.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == li.schema
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"]
    assert _canon(back, cols) == _canon(li, cols)
    # predicate pushdown works against the ORC scan too
    n = back.filter(F.col("l_shipdate") < "1996-01-01").count()
    m = li.filter(F.col("l_shipdate") < "1996-01-01").count()
    assert n == m
