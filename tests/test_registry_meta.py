"""Registry hygiene: properties the driver contract silently depends on."""

from __future__ import annotations

from aqi_analysis_apache_airflow_spark.plans import REGISTRY


def test_bench_headline_names_exist():
    import bench

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"bench names not in registry: {missing}"


def test_query_names_unique_and_wellformed():
    for name in REGISTRY:
        assert name.replace("_", "").isalnum(), name


def test_every_oracle_query_in_some_adversarial_suite():
    """Sentinel for the hostile-input coverage contract: every
    oracle-backed registry query must land in at least one adversarial
    suite's derived list. All seven suites derive from the registry by
    oracle table references, so this only fires if a new query's table
    mix matches no suite (e.g. a brand-new table) — add a suite or a
    documented exemption here, never a silent gap."""
    import tests.test_adversarial_corpus as tc
    import tests.test_adversarial_embeddings as te
    import tests.test_adversarial_events as tev
    import tests.test_adversarial_lineitem as tl
    import tests.test_adversarial_multitable as tm
    import tests.test_adversarial_orders as to
    import tests.test_adversarial_tpch as tt

    covered = (
        set(tc.DOC_QUERIES)
        | set(te.EMB_QUERIES)
        | set(to.ORDERS_QUERIES)
        | set(tl.LINEITEM_QUERIES)
        | set(tev.EVENT_QUERIES)
        | set(tm.MULTI_QUERIES)
        | set(tt.TPCH_QUERIES)
    )
    oracle_backed = {n for n, q in REGISTRY.items() if q.oracle is not None}
    uncovered = sorted(oracle_backed - covered)
    assert not uncovered, f"queries in no adversarial suite: {uncovered}"


def test_no_duplicate_output_columns(spark):
    """The driver sorts columns by name before hashing values — a
    duplicate column name would silently corrupt the comparison."""
    sf = "/root/testdata/sf0.001"
    for name, q in sorted(REGISTRY.items()):
        cols = q.fn(spark, sf).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"


def test_bench_block_map_frozen_capacity():
    """Block-mode comparability contract (r12): HEADLINE is
    append-only and duplicate-free, so consecutive BLOCK_CAPACITY
    slices have frozen membership; every full block must hold exactly
    BLOCK_CAPACITY queries and block 1 must still open with the
    canary query (its committed reference assumes q1 runs in a fresh
    child after warmup)."""
    import bench

    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    blocks = bench.headline_blocks()
    for b in blocks[:-1]:
        assert len(b) == bench.BLOCK_CAPACITY
    assert 0 < len(blocks[-1]) <= bench.BLOCK_CAPACITY
    assert blocks[0][0] == "q1_pricing_summary"


def test_bench_ref_names_exist():
    """BENCH_REF.json (frozen mover references) must only name live
    registry queries — a renamed/removed query must be re-frozen, not
    silently carried."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_REF.json")
    if not os.path.isfile(path):
        return
    with open(path) as fh:
        ref = json.load(fh)
    stale = [n for n in ref["queries"] if n not in REGISTRY]
    assert not stale, f"BENCH_REF names not in registry: {stale}"
