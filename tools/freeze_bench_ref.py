#!/usr/bin/env python
"""Freeze BENCH_REF.json from the current BENCH_DETAIL.json (verdict
r11 task 4): RAW per-query reference medians measured under the
block-mode methodology. Raw, not canary-normalized: the start-of-block
canary overestimates the block window (2026-08-16: block-1 canary
1.223 while q1's in-block median was 0.82x reference minutes later),
so box_state is frozen as CONTEXT per block, never divided out.

Run only after a full `python bench.py` at sf0.1 whose run-level
cleanliness is independently evidenced (e.g. a same-day solo-vs-block
pressure comparison like BENCH_PRESSURE2.json within ~5%).

NOTE: this tool freezes from ONE run. The committed r12 BENCH_REF.json
is a per-query GEOMETRIC MEAN of the two 2026-08-16 full runs (block
windows swing ~+-20% on this box, see its methodology field) — prefer
merging >= 2 same-day runs over re-running this single-run tool, and
never let a single-run freeze overwrite a multi-run reference without
updating the methodology string.
Usage: python tools/freeze_bench_ref.py [--force]
       python tools/freeze_bench_ref.py --add-missing A.json B.json

--add-missing: the additive path for queries that landed AFTER the
frozen reference (r12: iqr1/gof2; r13: caldrift1/pperm1): given two
saved block-mode BENCH_DETAIL files from the same day, add rows ONLY
for queries absent from BENCH_REF.json, as the per-query geometric
mean of the two runs (the committed multi-run convention), leaving
every frozen row untouched and appending a dated provenance note.
"""

from __future__ import annotations

import datetime
import json
import math
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(_REPO, "BENCH_DETAIL.json")
REF = os.path.join(_REPO, "BENCH_REF.json")


def _all_queries(detail: dict) -> dict[str, float]:
    q = dict(detail.get("queries", {}))
    for n, t in detail.get("appendix", {}).get("queries", {}).items():
        if not n.endswith("__ivf_prefilter"):
            q[n] = t
    return q


def add_missing(path_a: str, path_b: str) -> None:
    with open(path_a) as fh:
        qa = _all_queries(json.load(fh))
    with open(path_b) as fh:
        qb = _all_queries(json.load(fh))
    with open(REF) as fh:
        ref = json.load(fh)
    added = {}
    for n in sorted(set(qa) & set(qb)):
        if n not in ref["queries"]:
            added[n] = round(math.sqrt(qa[n] * qb[n]), 4)
    if not added:
        raise SystemExit("nothing to add: every measured query has a row")
    ref["queries"].update(added)
    today = datetime.date.today().isoformat()
    ref["methodology"] = (
        ref.get("methodology", "")
        + f"; {today}: rows for {sorted(added)} added as the geometric "
        "mean of two same-day block-mode runs (--add-missing; frozen "
        "rows untouched)"
    )
    with open(REF, "w") as fh:
        json.dump(ref, fh, indent=1)
    print(f"added {len(added)} rows -> BENCH_REF.json: {added}")


def refreeze(path_a: str, path_b: str) -> None:
    """Full replacement: every per-query row becomes the geometric
    mean of two same-day canonical block-mode runs (the committed
    multi-run convention; r14). Refuses hot runs like the single-run
    path."""
    runs = []
    for p in (path_a, path_b):
        with open(p) as fh:
            d = json.load(fh)
        if not d.get("canonical", True):
            raise SystemExit(f"refuse: {p} is stamped non-canonical")
        runs.append(d)
    qa, qb = (_all_queries(d) for d in runs)
    common = sorted(set(qa) & set(qb))
    if not common:
        raise SystemExit("no common queries between the two runs")
    queries = {n: round(math.sqrt(qa[n] * qb[n]), 4) for n in common}
    today = datetime.date.today().isoformat()
    ref = {
        "date": today,
        "methodology": (
            f"{today}: full re-freeze (--refreeze) — per-query "
            "geometric mean of two same-day canonical fresh-JVM "
            "block-mode runs (totals "
            f"{runs[0].get('value')}s / {runs[1].get('value')}s); RAW "
            "medians (box_state frozen as context, not divided out)"
        ),
        "sf": 0.1,
        "block_box_states": {
            "run_a": {
                str(b["block"]): b.get("box_state")
                for b in runs[0].get("blocks", [])
            },
            "run_b": {
                str(b["block"]): b.get("box_state")
                for b in runs[1].get("blocks", [])
            },
        },
        "queries": queries,
    }
    with open(REF, "w") as fh:
        json.dump(ref, fh, indent=1)
    print(f"re-froze {len(queries)} reference medians -> BENCH_REF.json")
    q1 = queries.get("q1_pricing_summary")
    if q1:
        print(
            f"update bench.py _CANARY_REF_S to {q1} (currently frozen"
            " from the pre-r13 plan)"
        )


def main() -> None:
    if "--refreeze" in sys.argv:
        i = sys.argv.index("--refreeze")
        if len(sys.argv) < i + 3:
            raise SystemExit(
                "usage: freeze_bench_ref.py --refreeze A.json B.json"
            )
        refreeze(sys.argv[i + 1], sys.argv[i + 2])
        return
    if "--add-missing" in sys.argv:
        i = sys.argv.index("--add-missing")
        if len(sys.argv) < i + 3:
            raise SystemExit(
                "usage: freeze_bench_ref.py --add-missing A.json B.json"
            )
        add_missing(sys.argv[i + 1], sys.argv[i + 2])
        return
    with open(DETAIL) as fh:
        d = json.load(fh)
    if "blocks" not in d:
        raise SystemExit("BENCH_DETAIL.json is not a block-mode run")
    if abs(d.get("sf", 0) - 0.1) > 1e-9:
        raise SystemExit(f"refuse to freeze at sf={d.get('sf')}: need sf0.1")
    hot = [b for b in d["blocks"] if (b.get("box_state") or 1.0) > 1.30]
    if hot and "--force" not in sys.argv:
        raise SystemExit(
            f"refuse: very hot blocks {[(b['block'], b['box_state']) for b in hot]}"
            " (rerun on an idle box, or --force). Canary <= 1.30 passes"
            " because the start-of-block canary overestimates the block"
            " window; corroborate with a solo-vs-block pressure check."
        )
    box_by_query: dict[str, float] = {}
    # headline blocks: membership = consecutive slices of the committed list
    sys.path.insert(0, _REPO)
    from bench import BLOCK_CAPACITY, HEADLINE

    for b in d["blocks"]:
        names = HEADLINE[
            (b["block"] - 1) * BLOCK_CAPACITY : b["block"] * BLOCK_CAPACITY
        ]
        for n in names:
            box_by_query[n] = b.get("box_state") or 1.0
    appx = d.get("appendix", {})
    if appx:
        # appendix block membership is alphabetical; recompute the chunks
        appx_names = sorted(
            n
            for n in appx["queries"]
            if not n.endswith("__ivf_prefilter")
        )
        chunks = [
            appx_names[i : i + BLOCK_CAPACITY]
            for i in range(0, len(appx_names), BLOCK_CAPACITY)
        ]
        for b, names in zip(appx.get("blocks", []), chunks):
            for n in names:
                box_by_query[n] = b.get("box_state") or 1.0
    queries = {}
    for n, med in d["queries"].items():
        queries[n] = round(med, 4)
    for n, med in appx.get("queries", {}).items():
        if n.endswith("__ivf_prefilter"):
            continue
        queries[n] = round(med, 4)
    ref = {
        "date": datetime.date.today().isoformat(),
        "methodology": (
            f"fresh-JVM blocks of {BLOCK_CAPACITY}, warmup + "
            f"{d.get('passes', 3)} interleaved passes, median, adaptive "
            "top-ups; RAW medians (box_state frozen as context, not "
            "divided out)"
        ),
        "sf": 0.1,
        "block_box_states": {
            str(b["block"]): b.get("box_state") for b in d["blocks"]
        },
        "queries": queries,
    }
    with open(REF, "w") as fh:
        json.dump(ref, fh, indent=1)
    print(f"froze {len(queries)} reference medians -> BENCH_REF.json")


if __name__ == "__main__":
    main()
