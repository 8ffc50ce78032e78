"""Custom Python DataSource (PySpark 4 API): the synthetic AQI
generator source — partitioned parallel generation, deterministic
content independent of partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from aqi_analysis_apache_airflow_spark.sources.aqi_gen import AQIGenDataSource


def _load(spark, **opts):
    spark.dataSource.register(AQIGenDataSource)
    r = spark.read.format("aqi_gen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_aqi_gen_rows_and_schema(spark):
    df = _load(spark, numRows=1000, numPartitions=4)
    assert df.count() == 1000
    assert [f.name for f in df.schema.fields] == [
        "measurement_id", "state_name", "county_name",
        "measured_date", "aqi_value", "defining_parameter",
    ]
    # generated values respect the domain contract
    agg = df.agg(
        F.min("aqi_value").alias("lo"), F.max("aqi_value").alias("hi"),
        F.countDistinct("state_name").alias("ns"),
    ).collect()[0]
    assert 0 <= agg["lo"] and agg["hi"] <= 500 and agg["ns"] == 5


def test_aqi_gen_partition_independence(spark):
    """Same (seed, numRows) must produce identical content no matter
    how the keyspace is partitioned — rows are a pure function of the
    row index."""
    canon = lambda df: sorted(tuple(map(str, r)) for r in df.collect())
    a = _load(spark, numRows=500, numPartitions=1)
    b = _load(spark, numRows=500, numPartitions=7)
    assert canon(a) == canon(b)
    # and the task count really follows numPartitions
    assert b.rdd.getNumPartitions() == 7


def test_aqi_gen_feeds_engine_ops(spark):
    """The generated frame flows through the engine's own operators
    (AQI bucketing + keep-first dedup) like any file-backed source."""
    from aqi_analysis_apache_airflow_spark.functions.scalar import aqi_category
    from aqi_analysis_apache_airflow_spark.operators.dedupe import keep_first

    df = _load(spark, numRows=2000, numPartitions=8).withColumn(
        "category", aqi_category(F.col("aqi_value"))
    )
    cats = {r["category"] for r in df.select("category").distinct().collect()}
    assert "Good" in cats and "Hazardous" in cats
    one_per_day = keep_first(
        df,
        keys=["state_name", "measured_date"],
        order_by=["measurement_id"],
    )
    per_key = one_per_day.groupBy("state_name", "measured_date").count()
    assert per_key.filter(F.col("count") > 1).count() == 0


def test_aqi_gen_streaming_prefix_equals_batch(spark):
    """The streaming reader's first batches are exactly the batch
    reader's prefix: offset == row index, so replay is bit-identical
    (the exactly-once contract a real connector gets from Kafka
    offsets, here from the pure row function)."""
    import time

    spark.dataSource.register(AQIGenDataSource)
    q = (
        spark.readStream.format("aqi_gen")
        .option("rowsPerBatch", 50)
        .option("seed", 7)
        .load()
        .writeStream.format("memory")
        .queryName("aqi_gen_stream_sink")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("aqi_gen_stream_sink").count() >= 100:
                break
            time.sleep(0.5)
        got = (
            spark.table("aqi_gen_stream_sink")
            .orderBy("measurement_id")
            .limit(100)
            .collect()
        )
    finally:
        q.stop()
    want = (
        spark.read.format("aqi_gen")
        .option("numRows", 100)
        .option("seed", 7)
        .load()
        .orderBy("measurement_id")
        .collect()
    )
    assert len(got) == 100
    assert got == want
