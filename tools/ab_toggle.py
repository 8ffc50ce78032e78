#!/usr/bin/env python
"""Interleaved same-JVM A/B of a module-attribute toggle for a set of
registry queries (optimization guide §1: measure first, both arms in
one session so box state cancels) — the generic sibling of
``ab_spread.py`` for changes that ship behind a module flag.

Arm A = the committed code (flag at its committed value); arm B = the
flag monkeypatched to the given alternative. Each query is noop-sink
timed (guide §1.4), warmup pass per arm, then ``--passes`` interleaved
A/B passes with the within-pass order ALTERNATING (A,B / B,A / …) so a
fixed ordering cannot bias the medians; medians reported per query.

Usage:
    python tools/ab_toggle.py OUT.json SF_DIR MODULE:ATTR=B_VALUE \
        [--passes N] name...

``B_VALUE`` is parsed with ``ast.literal_eval`` (so ``False``, ``0``,
``"str"`` all work). The committed value is read from the module and
restored at the end.
"""

from __future__ import annotations

import ast
import importlib
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
    out_path, sf_dir, toggle = args[0], args[1], args[2]
    args = args[3:]
    passes = 3
    if args and args[0] == "--passes":
        passes = int(args[1])
        args = args[2:]
    names = args

    mod_attr, b_repr = toggle.split("=", 1)
    mod_name, attr = mod_attr.rsplit(":", 1)
    b_value = ast.literal_eval(b_repr)
    mod = importlib.import_module(mod_name)
    a_value = getattr(mod, attr)

    from aqi_analysis_apache_airflow_spark.plans import REGISTRY
    from aqi_analysis_apache_airflow_spark.session import get_spark

    for n in names:
        if n not in REGISTRY:
            raise SystemExit(f"unknown query: {n}")

    def set_arm(a: bool) -> None:
        setattr(mod, attr, a_value if a else b_value)

    spark = get_spark(app_name="ab-toggle")

    def run(name: str, a: bool) -> float:
        set_arm(a)
        arm = f"A:{a_value!r}" if a else f"B:{b_value!r}"
        spark.sparkContext.setJobDescription(f"ab_toggle {arm} {name}")
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    results: dict[str, dict] = {}
    for name in names:  # warmup both arms once (codegen/scan caches)
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
    set_arm(True)
    with open(out_path, "w") as fh:
        json.dump(
            {
                "sf_dir": sf_dir,
                "passes": passes,
                "toggle": toggle,
                "a_value": repr(a_value),
                "queries": results,
            },
            fh,
            indent=1,
        )
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
