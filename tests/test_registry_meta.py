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


def test_no_duplicate_output_columns(spark):
    """The driver sorts columns by name before hashing values — a
    duplicate column name would silently corrupt the comparison."""
    sf = "/root/testdata/sf0.001"
    for name, q in sorted(REGISTRY.items()):
        cols = q.fn(spark, sf).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"
