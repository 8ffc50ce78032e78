#!/usr/bin/env python
"""Build the ~10x scaling corpus for SCALING.md (verdict r11 task 5).

/root/testdata is read-only and stops at sf0.1, so the scaling sweep
needs a larger deterministic corpus. This unions sf0.1 with K-1
KEY-SHIFTED, CONTENT-PERTURBED replicas into
``spark-warehouse/scaling_sfN/*.parquet``:

- every surrogate key (doc_id, vec_id, event/user ids, TPC-H keys)
  shifts by ``k * stride`` so joins and groupings scale honestly;
- document TEXT is alphabet-rotated per replica (a deterministic
  ``translate`` — JVM-side, no UDF), so shingles/tokens DIFFER across
  replicas: per-replica dup structure (clusters, near-dup pairs,
  quality mix) is preserved while CROSS-replica pairs don't exist —
  the dup RATE stays constant as the corpus grows, which is the
  realistic growth model (naive replication would grow LSH pair counts
  quadratically and corrupt every dedup exponent);
- embeddings ROTATE (array roll by k) — norms preserved, directions
  changed, so no artificial exact-dup vectors;
- events keep the calendar span and gain users (user_id shift) — more
  traffic on the same 30 days, the production growth shape;
- region/nation (bounded dims) copy through unchanged.

Determinism: pure column arithmetic on the driver corpus, no RNG.
Usage: python tools/make_scaling_corpus.py [K]   (default K=10)
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, functions as F

from aqi_analysis_apache_airflow_spark.session import get_spark
from aqi_analysis_apache_airflow_spark.sources.readers import load_table

SRC = "/root/testdata/sf0.1"
_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()
_DIGIT = "0123456789"

# key strides: comfortably above the max key of each id space at sf0.1
STRIDES = {
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "o_orderkey": 10_000_000,
    "c_custkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    "l_suppkey": 1_000_000,
}


def _rot_alpha(col, k: int):
    src = _LOWER + _UPPER + _DIGIT
    dst = (
        _LOWER[k % 26 :] + _LOWER[: k % 26]
        + _UPPER[k % 26 :] + _UPPER[: k % 26]
        + _DIGIT[k % 10 :] + _DIGIT[: k % 10]
    )
    return F.translate(col, src, dst)


def _shift_keys(df: DataFrame, k: int) -> DataFrame:
    for c in df.columns:
        if c in STRIDES:
            df = df.withColumn(c, (F.col(c) + F.lit(k * STRIDES[c])).cast("long"))
    return df


def _replica(spark, table: str, k: int) -> DataFrame:
    df = load_table(spark, SRC, table)
    if k == 0:
        return df
    df = _shift_keys(df, k)
    if table == "documents":
        df = df.withColumn("text", _rot_alpha(F.col("text"), k))
    if table == "embeddings":
        n = F.size("embedding")
        r = F.lit(k % 16 + 1)
        df = df.withColumn(
            "embedding",
            F.when(
                F.col("embedding").isNotNull() & (n > r),
                F.concat(
                    F.slice("embedding", r + 1, n - r), F.slice("embedding", 1, r)
                ),
            ).otherwise(F.col("embedding")),
        )
    return df


def main() -> None:
    k_total = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = os.path.join(_HERE, "spark-warehouse", f"scaling_sf{k_total}")
    spark = get_spark(app_name="make_scaling_corpus")
    from aqi_analysis_apache_airflow_spark.schemas import CORPUS_TABLES

    for table in CORPUS_TABLES:
        if table in ("region", "nation"):
            df = load_table(spark, SRC, table)
        else:
            df = _replica(spark, table, 0)
            for k in range(1, k_total):
                df = df.unionByName(_replica(spark, table, k))
        dest = os.path.join(out, f"{table}.parquet")
        df.repartition(8).write.mode("overwrite").parquet(dest)
        print(table, "->", dest)
    spark.stop()


if __name__ == "__main__":
    main()
