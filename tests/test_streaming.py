"""Structured Streaming surface tests: each streaming operator's
availableNow run over the events parquet must agree with its batch twin
(the oracle-verified plans in plans/extended.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aqi_analysis_apache_airflow_spark.plans import REGISTRY
from aqi_analysis_apache_airflow_spark.plans import extended as _extended  # noqa: F401
from aqi_analysis_apache_airflow_spark.streaming.ops import (
    dedup_within_watermark,
    read_events_stream,
    run_to_memory,
    session_windows,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _canon(df, cols):
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def events_stream(spark):
    return read_events_stream(spark, SF_DIR)


def test_stream_is_streaming(events_stream):
    assert events_stream.isStreaming
    assert dict(events_stream.dtypes)["ts"].startswith("timestamp")


def test_windowed_counts_match_batch_twin(spark, events_stream):
    got = run_to_memory(windowed_counts(events_stream), "win_counts")
    want = REGISTRY["e1_tumbling_window"].fn(spark, SF_DIR)
    cols = ["window_start", "window_end", "event_type", "n_events", "total_value"]
    assert _canon(got, cols) == _canon(want, cols)


def test_session_windows_match_batch_twin(spark, events_stream):
    got = run_to_memory(session_windows(events_stream), "sess")
    want = REGISTRY["e2_sessionization"].fn(spark, SF_DIR)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _canon(got, cols) == _canon(want, cols)


def test_dedup_within_watermark(spark, events_stream):
    got = run_to_memory(
        dedup_within_watermark(events_stream, keys=["event_id"]), "dedup", mode="append"
    )
    n_distinct = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_late_rows_accounted_not_silently_dropped(spark, events_stream):
    """The reference silently drops late rows
    (``dags/etl/source_to_stage.py:73``); the streaming surface exposes
    drop counts in query progress. With availableNow over a single
    batch nothing is late, so the metric exists and reads 0."""
    q = (
        windowed_counts(events_stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("late_check")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None
    ops = q.lastProgress["stateOperators"]
    assert ops and "numRowsDroppedByWatermark" in ops[0]
    assert ops[0]["numRowsDroppedByWatermark"] == 0


def test_running_user_stats_stateful(spark, events_stream):
    from aqi_analysis_apache_airflow_spark.streaming.ops import running_user_stats

    got = run_to_memory(running_user_stats(events_stream), "user_stats", mode="update")
    # update mode + availableNow: the LAST emitted row per user carries
    # the final accumulated state; compare against the batch aggregate
    final = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6), r["max_value"])
        for r in got.collect()
    }
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        r["user_id"]: (r["n"], round(r["t"], 6), r["m"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("t"),
            F.max("value").alias("m"),
        )
        .collect()
    }
    assert final == want


def test_foreach_batch_idempotent_sink(spark, events_stream, tmp_path_factory):
    """Exactly-once-on-retry: the epoch-partitioned dynamic-overwrite
    sink absorbs a replayed micro-batch instead of duplicating it."""
    from aqi_analysis_apache_airflow_spark.streaming.ops import (
        start_idempotent_parquet_sink,
    )

    out = str(tmp_path_factory.mktemp("fb_sink") / "out")
    ckpt = str(tmp_path_factory.mktemp("fb_sink") / "ckpt")
    q = start_idempotent_parquet_sink(events_stream, out, ckpt)
    q.awaitTermination()

    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    first = spark.read.parquet(out)
    assert first.count() == n_events
    epochs = [r["__epoch"] for r in first.select("__epoch").distinct().collect()]

    # fault injection: replay the last epoch (failure after write,
    # before checkpoint commit) — row count must not change
    replay = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(500)
    q._write_epoch(replay.drop("__epoch"), max(epochs))
    after = spark.read.parquet(out)
    non_replayed = first.filter(F.col("__epoch") != max(epochs)).count()
    assert after.filter(F.col("__epoch") == max(epochs)).count() == 500
    assert after.count() == non_replayed + 500
    # and a SECOND identical replay is a strict no-op
    q._write_epoch(replay.drop("__epoch"), max(epochs))
    assert spark.read.parquet(out).count() == non_replayed + 500


def test_running_user_stats_transform_with_state(spark, events_stream):
    """Spark 4 StatefulProcessor path (transformWithStateInPandas):
    must accumulate exactly like the applyInPandasWithState op and the
    batch aggregate. The runtime's state-server protocol needs
    google.protobuf in the driver AND every Python worker; pip/apt are
    sealed here, so conftest.py exposes the vendored pure-Python
    runtime (vendor/README.md) when no system copy exists — the
    importorskip stays only for environments with neither. The op also
    requires a state store with column families, so the query runs
    under RocksDBStateStoreProvider (HDFSBackedStateStoreProvider
    rejects it; RocksDB ships in Spark 4 core and is the provider a
    production tws deployment uses anyway)."""
    pytest.importorskip("google.protobuf.descriptor")
    from aqi_analysis_apache_airflow_spark.streaming.ops import (
        running_user_stats_tws,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = run_to_memory(
            running_user_stats_tws(events_stream),
            "user_stats_tws",
            mode="update",
        )
    finally:
        if before is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, before)
    final = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6), r["max_value"])
        for r in got.collect()
    }
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        r["user_id"]: (r["n"], round(r["t"], 6), r["m"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("t"),
            F.max("value").alias("m"),
        )
        .collect()
    }
    assert final == want
