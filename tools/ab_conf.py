#!/usr/bin/env python
"""Interleaved same-JVM A/B of a RUNTIME SQL conf for a set of
registry queries — the conf-level sibling of ``ab_toggle.py`` (guide
§1: measure first; §1.2: config last, and only with a measurement).

Arm A = conf set to the candidate value; arm B = the session default
(the conf is restored per arm via ``spark.conf.set``/``unset``). Each
query is noop-sink timed, warmup per arm, ``--passes`` interleaved
passes with alternating within-pass order; medians reported.

Usage:
    python tools/ab_conf.py OUT.json SF_DIR KEY=CANDIDATE \
        [--passes N] name...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def main() -> None:
    args = sys.argv[1:]
    out_path, sf_dir, kv = args[0], args[1], args[2]
    args = args[3:]
    passes = 3
    if args and args[0] == "--passes":
        passes = int(args[1])
        args = args[2:]
    names = args
    key, a_value = kv.split("=", 1)

    from aqi_analysis_apache_airflow_spark.plans import REGISTRY
    from aqi_analysis_apache_airflow_spark.session import get_spark

    for n in names:
        if n not in REGISTRY:
            raise SystemExit(f"unknown query: {n}")

    spark = get_spark(app_name="ab-conf")
    try:
        b_value = spark.conf.get(key)
    except Exception:  # noqa: BLE001 — unset conf → restore by unset
        b_value = None

    def set_arm(a: bool) -> None:
        if a:
            spark.conf.set(key, a_value)
        elif b_value is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, b_value)

    def run(name: str, a: bool) -> float:
        set_arm(a)
        arm = f"A:{a_value}" if a else f"B:{b_value}"
        spark.sparkContext.setJobDescription(f"ab_conf {key} {arm} {name}")
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    results: dict[str, dict] = {}
    for name in names:
        run(name, True)
        run(name, False)
    samples = {n: {"A": [], "B": []} for n in names}
    for p in range(passes):
        first_a = p % 2 == 0
        for name in names:
            for a in (first_a, not first_a):
                samples[name]["A" if a else "B"].append(run(name, a))
    for name in names:
        a = statistics.median(samples[name]["A"])
        b = statistics.median(samples[name]["B"])
        results[name] = {
            "A_s": round(a, 3),
            "B_s": round(b, 3),
            "ratio_A_over_B": round(a / b, 3) if b else None,
            "raw_A": [round(x, 3) for x in samples[name]["A"]],
            "raw_B": [round(x, 3) for x in samples[name]["B"]],
        }
        print(
            f"{name:40s} A {a:7.3f}s  B {b:7.3f}s  "
            f"A/B {a / b if b else float('nan'):5.2f}"
        )
    set_arm(False)
    with open(out_path, "w") as fh:
        json.dump(
            {
                "sf_dir": sf_dir,
                "passes": passes,
                "conf": kv,
                "default": b_value,
                "queries": results,
            },
            fh,
            indent=1,
        )
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
