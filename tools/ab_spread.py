#!/usr/bin/env python
"""Interleaved same-JVM A/B of ``load_spread`` vs plain ``load`` for a
set of registry queries (optimization guide §1: measure first, both
arms in one session so box state cancels).

Arm A = the committed code (load_spread where applied); arm B = every
plans module's ``load_spread`` monkeypatched back to ``load``. Each
query is noop-sink timed (guide §1.4), warmup pass per arm, then
``--passes`` interleaved A/B passes; medians reported per query.

Usage:
    python tools/ab_spread.py OUT.json SF_DIR [--passes N] name...

The patch is module-attribute level: every module in
``aqi_analysis_apache_airflow_spark.plans`` that imported
``load_spread`` gets the attribute swapped, so arm B reproduces the
pre-change plan exactly FOR ``load_spread`` CALL SITES (verified by
the plan captures in plans/r13/). It does NOT reach
``spread_if_narrow`` helper sites or function-local imports — use
``ab_toggle.py`` for those (ADVICE r13 #4).

Within each pass the A/B order ALTERNATES (A,B / B,A / …) so a fixed
ordering cannot bias the medians (ADVICE r13 #4).
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
    out_path, sf_dir = args[0], args[1]
    args = args[2:]
    passes = 3
    if args and args[0] == "--passes":
        passes = int(args[1])
        args = args[2:]
    names = args

    import aqi_analysis_apache_airflow_spark.plans as plans_pkg
    from aqi_analysis_apache_airflow_spark.plans import REGISTRY, registry
    from aqi_analysis_apache_airflow_spark.session import get_spark

    for n in names:
        if n not in REGISTRY:
            raise SystemExit(f"unknown query: {n}")

    # every plans module that imported load_spread at module level
    import importlib
    import pkgutil

    mods = []
    for m in pkgutil.iter_modules(plans_pkg.__path__):
        mod = importlib.import_module(f"{plans_pkg.__name__}.{m.name}")
        if hasattr(mod, "load_spread"):
            mods.append(mod)
    spread_fn, plain_fn = registry.load_spread, registry.load

    def set_arm(spread: bool) -> None:
        fn = spread_fn if spread else plain_fn
        for mod in mods:
            mod.load_spread = fn

    spark = get_spark(app_name="ab-spread")

    def run(name: str, spread: bool) -> float:
        set_arm(spread)
        arm = "A:spread" if spread else "B:plain"
        spark.sparkContext.setJobDescription(f"ab_spread {arm} {name}")
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    results: dict[str, dict] = {}
    # warmup both arms once (codegen/scan caches), then interleave
    for name in names:
        run(name, True)
        run(name, False)
    samples = {n: {"A": [], "B": []} for n in names}
    for p in range(passes):
        first_a = p % 2 == 0  # alternate order per pass (ADVICE r13)
        for name in names:
            for a in (first_a, not first_a):
                samples[name]["A" if a else "B"].append(run(name, a))
    for name in names:
        a = statistics.median(samples[name]["A"])
        b = statistics.median(samples[name]["B"])
        results[name] = {
            "spread_s": round(a, 3),
            "plain_s": round(b, 3),
            "ratio": round(a / b, 3) if b else None,
            "raw_A": [round(x, 3) for x in samples[name]["A"]],
            "raw_B": [round(x, 3) for x in samples[name]["B"]],
        }
        print(
            f"{name:40s} spread {a:7.3f}s  plain {b:7.3f}s  "
            f"ratio {a / b if b else float('nan'):5.2f}"
        )
    set_arm(True)  # leave the session as the committed code
    with open(out_path, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "passes": passes, "queries": results}, fh, indent=1
        )
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
