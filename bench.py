#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "total_headline_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced through the noop writer so every column/aggregate
is actually computed (a bare count() would let Catalyst prune the
projections being benchmarked).
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from aqi_analysis_apache_airflow_spark.plans import REGISTRY
from aqi_analysis_apache_airflow_spark.plans import extended as _extended  # noqa: F401
from aqi_analysis_apache_airflow_spark.plans import queries as _queries  # noqa: F401
from aqi_analysis_apache_airflow_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q10_returned_items",
    "j2_star_join_agg",
    "j6_merge_upsert",
    "a3_keepfirst_dedup",
    "w1_topk_per_group",
    "f4_not_in",
    "e1_tumbling_window",
    "e2_sessionization",
    "e3_sliding_window",
    "d1_exact_dedup",
    "d2_ngram_jaccard",
    "d3_minhash_lsh",
    "d3v_minhash_verified",
    "d4_simhash_neardup",
    "t1_token_stats",
    "t4_tfidf",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "q7_nation_volume",
    "q8_market_share",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="bench")

    # Uncounted warmup: JIT the write path/codegen once, and fault the
    # input files into the OS page cache so per-query numbers reflect
    # steady state instead of charging the first query for cold disk.
    spark.range(1_000_000).selectExpr("sum(id) AS s").write.format("noop").mode(
        "overwrite"
    ).save()
    from aqi_analysis_apache_airflow_spark.schemas import CORPUS_TABLES
    from aqi_analysis_apache_airflow_spark.sources.readers import load_table

    for t in CORPUS_TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_headline_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
