#!/usr/bin/env python
"""Capture ``explain('formatted')`` for every registry query into a
directory (one file per query) — the plan evidence for optimization
rounds: run before and after a change, diff the directories, and the
affected-query set (and the plan-shape delta) falls out mechanically.

Usage: python tools/capture_plans.py OUTDIR [SF_DIR] [name ...]
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)

    from aqi_analysis_apache_airflow_spark.plans import REGISTRY
    from aqi_analysis_apache_airflow_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    names = [n for n in REGISTRY if not only or n in only]
    # streaming queries need a running stream to explain — skip
    names = [n for n in names if not n.startswith("st")]
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — capture the failure text
            txt = f"EXPLAIN FAILED: {e}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
    spark.stop()
    print(f"captured {len(names)} plans -> {outdir}")


if __name__ == "__main__":
    main()
