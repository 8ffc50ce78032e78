"""Misra–Gries sketch invariants (functions/sketch.py).

The mg1 registry query's oracle asserts the guarantee booleans are
TRUE on the corpus; these tests prove the underlying invariants hold
on ADVERSARIAL streams — arbitrary key distributions, arbitrary batch
splits, arbitrary partition counts — which is what makes the booleans
a theorem rather than an observation."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from aqi_analysis_apache_airflow_spark.functions.sketch import mg_absorb


def _run_partition(stream: list[str], batch_size: int, capacity: int):
    """Replay the mapInPandas inner loop: value_counts per batch,
    mg_absorb each into the running summary."""
    counters = pd.Series(dtype="int64")
    err = 0
    for i in range(0, len(stream), batch_size):
        vc = pd.Series(stream[i : i + batch_size]).value_counts()
        if vc.empty:
            continue
        counters, added = mg_absorb(counters, vc, capacity)
        err += added
    return counters, err


keys = st.integers(min_value=0, max_value=30).map(lambda i: f"k{i}")
streams = st.lists(keys, min_size=0, max_size=300)


@settings(max_examples=200, deadline=None)
@given(
    stream=streams,
    batch_size=st.integers(min_value=1, max_value=50),
    capacity=st.integers(min_value=1, max_value=12),
)
def test_partition_invariant(stream, batch_size, capacity):
    """Per partition: true - err <= est <= true for EVERY key (absent
    keys count as est 0), and the summary never exceeds capacity."""
    counters, err = _run_partition(stream, batch_size, capacity)
    true = pd.Series(stream).value_counts() if stream else pd.Series(dtype="int64")
    assert len(counters) <= capacity
    for k in set(stream):
        est = int(counters.get(k, 0))
        t = int(true[k])
        assert est <= t
        assert t - err <= est
    # no phantom keys
    assert set(counters.index) <= set(stream)


@settings(max_examples=100, deadline=None)
@given(
    parts=st.lists(streams, min_size=1, max_size=5),
    capacity=st.integers(min_value=1, max_value=12),
)
def test_merged_invariant(parts, capacity):
    """Across partitions (the groupBy-sum merge the mg1 plan does):
    true - sum(err_p) <= sum(est_p) <= true — so every φ-heavy key
    passes the candidate cut est + err >= φN."""
    merged: dict[str, int] = {}
    err_total = 0
    for stream in parts:
        counters, err = _run_partition(stream, 7, capacity)
        err_total += err
        for k, v in counters.items():
            merged[k] = merged.get(k, 0) + int(v)
    allkeys = [k for stream in parts for k in stream]
    true = pd.Series(allkeys).value_counts() if allkeys else pd.Series(dtype="int64")
    n = len(allkeys)
    for k in set(allkeys):
        est = merged.get(k, 0)
        t = int(true[k])
        assert est <= t
        assert t - err_total <= est
        # candidate cut can never drop a φ-heavy key (φ = 1/10 here)
        if 10 * t >= n:
            assert 10 * est + 10 * err_total >= n
