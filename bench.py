#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "total_headline_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced through the noop writer so every column/aggregate
is actually computed (a bare count() would let Catalyst prune the
projections being benchmarked).

Methodology: one UNCOUNTED warmup pass over the full query list (the
first execution of a query pays whole-stage-codegen compilation and
JIT — structural cold-start, not plan cost), then
$SPARK_GRAFT_BENCH_PASSES (default 3) counted INTERLEAVED passes; the
reported per-query number is the median across counted passes. One
shared JVM means late queries inherit GC/JIT/cache pressure from
earlier ones — interleaving spreads that drift over every query
instead of charging it to whichever query ran last, and the median
drops one-off hiccups, so round-over-round deltas are attributable to
plan changes. ``spread_pct`` (max−min over median, per query) is
emitted so a noisy measurement is visible as such. The session cache
is cleared between queries: several registry plans persist
intermediates (LSH signatures, candidate pairs), and without the
clear a later pass would reuse a prior pass's cache and measure
nothing.

Shared-JVM pressure is MEASURED, not assumed (BENCH_PRESSURE.json,
2026-08-15): under Spark's DEFAULT 100-entry generated-class cache,
the 65 queries common to rounds 6–8 ran 13.1% slower inside the full
186-query headline than in a solo run with identical methodology —
the r6→r7 +13.5% "drift" on common queries was codegen-cache thrash,
not plan regressions. The session now sets
spark.sql.codegen.cache.maxEntries=5000 (a 186-query pass compiles
far more distinct stages than 100), which cut the identical headline
271.8s → 185.7s (−32%) and the residual pressure ratio to 1.062.
Compare totals only against runs of the SAME headline size and
session config, or against the solo figures in BENCH_PRESSURE.json.
Single cross-JVM runs on this box also swing ~±5% run-to-run
(measured with identical configs back-to-back); one-query conclusions
need interleaved same-process A/Bs.

Round-11 comparability note (2026-08-16): the headline grew 204 → 219
(verdict r10 task 4 promotions), and on a CANARY-VERIFIED clean box
(box_state 0.961) the 204 common queries ran 1.20x the r10 committed
run — a broad shift on untouched queries (q9 1.48x, cp2 1.49x, qc4
1.45x) that is the documented headline-size pressure, not code
regression; r10 itself measured the same mechanism (BENCH_PRESSURE:
+13.1% commons inside a 186-query headline vs solo). r11 totals are
the new baseline for a 219-query headline. The r9 worst-mover loop
(verdict r10 task 5) closes clean: against r10's committed run, d8
2.14 → 1.66s, d3 2.97 → 2.18s, sub2 1.53 → 1.34s, cov1 1.91 → 2.02s —
none exceeds the uniform context shift, no residual per-query
regression."""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

# st7 (transformWithStateInPandas) needs google.protobuf in the
# streaming driver worker: if no system protobuf exists, expose the
# vendored pure-Python runtime to the driver AND the worker daemon —
# must happen before the first SparkSession builds the JVM (the same
# gate as tests/conftest.py).
import importlib.util as _ilu

try:
    _HAVE_PROTOBUF = _ilu.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    _HAVE_PROTOBUF = False
if not _HAVE_PROTOBUF:
    _VENDOR = os.path.join(_HERE, "vendor", "protobuf_py.zip")
    if os.path.isfile(_VENDOR):
        sys.path.insert(0, _VENDOR)
        os.environ["PYTHONPATH"] = os.pathsep.join(
            p for p in [_VENDOR, os.environ.get("PYTHONPATH", "")] if p
        )

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
    "d8_incremental_dedup",
    "d3_minhash_lsh",
    "d3v_minhash_verified",
    "d4_simhash_neardup",
    "t1_token_stats",
    "t4_tfidf",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "sim_ivfd_topk",
    "sdd1_semantic_dedup",
    "q7_nation_volume",
    "q8_market_share",
    # round-3 additions (new rows vs r02 — absence in older BENCH_r*
    # files means "not yet implemented", not a regression)
    "samp1_stratified_sample",
    "pack1_sequence_packing",
    "d7_cross_source_dedup",
    "cm1_countmin_heavyhitters",
    "rj1_interval_lookup",
    "w5_distribution_ranks",
    "gr1_pagerank",
    "qc1_quality_score",
    "qc2_repetition_filter",
    "ws1_priority_sample",
    "mix1_temperature_mix",
    "ups1_epoch_plan",
    "trunc1_truncation_loss",
    "cal1_quality_gate_sweep",
    "oov1_vocab_coverage",
    "drift1_source_length_drift",
    "sw1_stopword_derivation",
    "pmi1_collocations",
    "ed1_editdist_join",
    "tri1_triangle_count",
    "bf1_bloom_semi_join",
    "knn1_knn_join",
    "emb2_cluster_centroids",
    "hll1_sketch_union",
    "sp1_shortest_path",
    "dq1_referential_integrity",
    "dq2_column_profile",
    "an1_zscore_outliers",
    "ts2_time_weighted_avg",
    "m3_overlap_frames",
    "rc1_recursive_hierarchy",
    "x10_variant_extract",
    "cp1_curation_pipeline",
    "dc1_decontamination",
    "dc2_exact_leak",
    "w6_sliding_distinct",
    "t10_topp_vocab",
    "emb3_unit_normalize",
    "x11_calendar_funcs",
    "j13_null_safe_join",
    "u4_except_all",
    "g12_conditional_aggs",
    "r3_new_users_cumulative",
    "dq3_distribution_drift",
    # round-4 additions
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_stock",
    "q16_supplier_relationship",
    "q20_excess_supply",
    "split2_cluster_split",
    "sub1_duplicate_spans",
    "qc3_df_quality",
    "zorder1_morton_layout",
    "cdc1_changelog_compact",
    "ts3_linear_interpolate",
    "pq1_product_quantize",
    "dq4_table_checksum",
    "dq5_snapshot_diff",
    "w7_topk_with_ties",
    "an2_mad_outliers",
    "sky1_pareto_frontier",
    "pit1_point_in_time_join",
    "markov1_event_transitions",
    "qb1_quantile_binning",
    "emb4_matryoshka_recall",
    "emb5_centroid_outliers",
    "seg1_rfm_segments",
    "ovl1_interval_overlap_join",
    "bpe1_merge_step",
    "lm1_unigram_rank_score",
    "corr1_spearman",
    "an3_winsorize",
    "gini1_lang_impurity",
    "zone1_zonemap_stats",
    "fe1_decayed_activity",
    "g13_linear_trend",
    "att1_linear_attribution",
    "itv1_merge_intervals",
    "w8_nth_value",
    "w9_ratio_to_report",
    "dq6_skew_profile",
    "wmed1_weighted_median",
    "cos1_tfidf_cosine_pairs",
    "mw1_mann_whitney",
    "seq1_event_trigrams",
    "late1_restatement_plan",
    "dq7_benford_digits",
    "ivm1_partial_merge",
    "grp1_group_top3_concat",
    "den1_grid_density",
    "wmed2_weighted_median_banded",
    "pv1_pivot_multi_agg",
    "dq8_uniqueness_audit",
    # round-6 additions
    "ret1_bm25_topk",
    "shuf1_deterministic_shard",
    "gdpr1_cascade_delete",
    "fmt1_multiformat_roundtrip",
    "lm2_bigram_predictability",
    "mg1_misra_gries_hh",
    "anon1_k_anonymity",
    "sch1_schema_evolution",
    "hn1_hard_negatives",
    "lr1_budget_apportionment",
    "place1_rendezvous_owner",
    "rh1_content_chunks",
    "d9_canonical_best",
    "rp1_hyperplane_lsh",
    "dsir1_importance_rank",
    "d10_containment",
    "ovr1_source_overlap",
    "snm1_sorted_neighborhood",
    "d11_segment_dedup",
    "split3_temporal_split",
    # round-7 additions
    "dc3_semantic_decontamination",
    "km1_lloyd_kmeans",
    "sub2_exact_substring_dedup",
    "rr1_rank_fusion",
    "div1_distinct_ngrams",
    "bloom1_bloom_membership",
    "winnow1_winnowing_fingerprints",
    "kcen1_kcenter_coreset",
    "mmr1_diversified_topk",
    "ks1_ks_drift",
    "ent1_token_entropy",
    "ndcg1_ann_ranking_quality",
    "domcap1_source_cap",
    "zipf1_rank_frequency_fit",
    "dp1_dp_source_counts",
    "cp2_selection_pipeline",
    "dd1_ddsketch_quantiles",
    "kmv1_kmv_distinct",
    "lpa1_label_propagation",
    "ab1_experiment_readout",
    "ab2_mean_shift_ztest",
    "kcore1_kcore_peeling",
    "tau1_ranker_agreement",
    "cpd1_changepoint_cusum",
    "read1_flesch_readability",
    "heaps1_vocab_growth",
    "emb6_dimension_stats",
    "mem1_memorization_risk",
    "gt1_good_turing",
    "bpe2_merge_training",
    "pca1_power_iteration",
    "d4v_simhash_verified",
    "sil1_cluster_silhouette",
    "sea1_hourly_seasonality",
    "val1_gate_dup_independence",
    "priv2_l_diversity",
    "fresh1_staleness_audit",
    "phr1_phrase_retrieval",
    "bpe3_compression_curve",
    "cmp1_corpus_diff",
    "imp1_group_median_impute",
    "sax1_sax_symbols",
    "dq9_contract_check",
    "gap1_interarrival_stats",
    # round-8 additions
    "winnow2_fingerprint_pairs",
    "ppx1_unigram_cross_entropy",
    "rec1_ivf_recall",
    "cur1_curriculum_stages",
    "wv1_winnowing_recall",
    # round-9 additions: the 5 most expensive appendix queries promoted
    # to the 3-pass interleaved methodology (verdict r8 task 4 — they
    # were single-cold-pass-only before; g6 also carries the r9
    # Expand-plan fix, 22.4s cold / 5.4s interleaved → 2.2s), plus the
    # new fixed-point k-core registry query
    "g6_approx_sketches",
    "m1_binary_features",
    "d6_dedup_clusters",
    "g3_quantiles",
    "j11_salted_join",
    "kcore2_fixed_point_core",
    "drm1_domain_reweight",
    "kw1_source_keywords",
    "qc4_dup_ngram_coverage",
    "cov1_embedding_cell_coverage",
    "m4_payload_dedup_audit",
    "wm1_watermark_detect",
    "kn1_kneser_ney_bigram",
    "m5_frame_overlap_pairs",
    # round-10 additions: the lpa1/gr1 fixed-point convergence twins
    # (kcore2 precedent — the convergence machinery is hash-certified);
    # both are round-count-bound (~1s/round scheduling floor, gr2 3
    # rounds / lpa2 4 full rounds at sf0.1)
    "gr2_fixed_point_pagerank",
    "lpa2_fixed_point_communities",
    # round-11 promotions (verdict r10 task 4): the expensive /
    # representative round-10 appendix entries move to the 3-pass
    # interleaved methodology so round-over-round comparisons cover
    # them at full rigor (committed appendix medians 0.55-3.7s)
    "bh1_fdr_source_drift",
    "da1_detector_agreement",
    "perm1_randomization_test",
    "hits1_hubs_authorities",
    "rbo1_rank_biased_overlap",
    "snm2_blocking_recall",
    "basket1_association_rules",
    "ppmi1_sppmi_pairs",
    "rh2_chunk_dedup_payoff",
    "dq10_order_reconciliation",
    "place2_placement_balance",
    "sb1_self_bleu_bigram",
    "auc1_score_auc",
    "mk1_trend_test",
    "ece1_reliability_diagram",
]

# Box-state canary (verdict r10 task 2): q1's committed 3-pass median
# at sf0.1 on a verified-idle box (BENCH_DETAIL.json @ a095b1a). The
# driver's r10 run landed a UNIFORM 1.16x above the same-round
# committed run — the dose-dependent box-state degradation this repo
# measured (post-13-min-pytest run: +15% uniform; 60s cooldown
# restored it). The canary makes that shift machine-detectable: q1 is
# measured FIRST, its ratio to this reference is stamped into the
# artifact as box_state, and a hot box gets ONE 60s cooldown + retry
# (the measured recovery dose) before the headline starts.
_CANARY_NAME = "q1_pricing_summary"
_CANARY_REF_S = 0.94
_CANARY_HOT_RATIO = 1.10  # was 1.15: the 2026-08-16 final r11 run
# measured 1.127 — under the old gate, yet the whole run came back a
# uniform 1.08x of the same-day 0.961-box run; cross-JVM noise is
# ±4-5%, so >=10% is real heat, not noise, and deserves the cooldown
_CANARY_COOLDOWN_S = 60


def median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def spread_pct(xs: list[float]) -> float:
    # trimmed range once extra samples exist: one GC pause on a
    # 0.3s query reads as 100% min-max spread while the reported
    # MEDIAN is unaffected — drop the single best/worst sample at
    # >= 4 (both extremes at >= 6, three at >= 9) so the spread
    # describes the stability of the median
    s = sorted(xs)
    if len(s) >= 9:
        core = s[3:-3]
    elif len(s) >= 6:
        core = s[2:-2]
    elif len(s) >= 4:
        core = s[1:-1]
    else:
        core = s
    return 100 * (core[-1] - core[0]) / median(xs)


def raw_spread_pct(xs: list[float]) -> float:
    # untrimmed min-max: the trimmed gate above can pass a
    # genuinely bimodal query on its middle samples — recording
    # the raw range alongside keeps bimodality visible
    s = sorted(xs)
    return 100 * (s[-1] - s[0]) / median(xs)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    # Iteration aid: SPARK_GRAFT_BENCH_ONLY="d3_minhash_lsh,gr1_pagerank"
    # restricts the headline to the named queries (same warmup +
    # interleave methodology) so a single query can be re-measured
    # without a full 113-query run. Unset = the full headline.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        unknown = keep - set(HEADLINE)
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY names not in HEADLINE: {unknown}")
        HEADLINE[:] = [n for n in HEADLINE if n in keep]
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    if n_passes < 1:
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_PASSES={n_passes}: need >= 1 counted pass "
            "(pass 0 is always an uncounted warmup)"
        )
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

    # ---- box-state canary (verdict r10 task 2) ----
    # q1 warmup + 3 counted samples, median vs the committed reference.
    # Ratio > _CANARY_HOT_RATIO => one cooldown + re-measure; BOTH
    # readings land in the detail file so a uniformly-shifted run is
    # machine-detectable instead of argued from commit messages. The
    # reference is only meaningful at sf0.1 (the committed scale); at
    # other SFs the canary is skipped and box_state is null.
    def _canary_median() -> float:
        q = REGISTRY[_CANARY_NAME]
        xs: list[float] = []
        for pass_no in range(4):  # pass 0 = uncounted warmup
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            if pass_no > 0:
                xs.append(time.perf_counter() - t0)
        return median(xs)

    canary_detail: dict | None = None
    box_state: float | None = None
    if abs(sf - 0.1) < 1e-9:
        first = _canary_median()
        box_state = first / _CANARY_REF_S
        canary_detail = {
            "query": _CANARY_NAME,
            "ref_s": _CANARY_REF_S,
            "first_median_s": round(first, 4),
            "first_ratio": round(box_state, 3),
            "retried": False,
        }
        if box_state > _CANARY_HOT_RATIO:
            time.sleep(_CANARY_COOLDOWN_S)
            second = _canary_median()
            box_state = second / _CANARY_REF_S
            canary_detail.update(
                retried=True,
                cooldown_s=_CANARY_COOLDOWN_S,
                second_median_s=round(second, 4),
            )
        canary_detail["box_state"] = round(box_state, 3)

    # ---- streaming block FIRST, on the fresh JVM (r9 finding) ----
    # Comparability note (ADVICE r11): since r11 the box-state canary
    # above runs 8 q1 batch executions (2 canary medians x 4 passes
    # worst case) BEFORE this block, so "fresh JVM" means ~8 batch
    # executions deep, not zero — a fixed, tiny dose that is identical
    # every run from r11 onward (r10-and-earlier streaming medians were
    # measured at literally zero prior executions).
    # st1–st8 availableNow replay wall time: warmup + interleaved
    # passes + median + the headline's adaptive re-run. Runs BEFORE
    # the headline because micro-batch replays are acutely sensitive
    # to accumulated same-JVM execution state: after the full ~850-
    # execution headline, every streaming replay ran 5-10× slower
    # (st3 2.7s → 68s MEDIAN over 11 samples, r9 measured) while
    # batch queries in the same degraded JVM stayed at full speed
    # (the appendix, running later still, was unaffected) — and
    # neither half of the headline alone nor 12 back-to-back
    # streaming passes reproduce it, so it is a dose-dependent
    # JVM-state effect, not a leak in the streams themselves. This
    # also explains r8's st7 87.9% / st3 49.6% spreads (its streaming
    # block ran after ~780 executions). Production streams run in
    # dedicated long-lived jobs, not after 850 ad-hoc batch queries
    # in one driver — measuring them on the fresh JVM is the honest
    # number; the degraded-JVM figure is a bench artifact.
    st_detail: dict | None = None
    extras = not only and os.environ.get(
        "SPARK_GRAFT_BENCH_SKIP_EXTRAS", ""
    ) not in ("1", "true")
    if extras:
        st_names = sorted(
            n for n in REGISTRY if n.startswith("st") and n not in HEADLINE
        )
        st_samples: dict[str, list[float]] = {n: [] for n in st_names}
        for pass_no in range(n_passes + 1):  # pass 0 = uncounted warmup
            for name in st_names:
                q = REGISTRY[name]
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                if pass_no > 0:
                    st_samples[name].append(time.perf_counter() - t0)
        if n_passes > 1:  # same adaptive budget as the headline
            for _ in range(8):
                noisy = [
                    n for n, xs in st_samples.items() if spread_pct(xs) > 30.0
                ]
                if not noisy:
                    break
                for name in noisy:
                    q = REGISTRY[name]
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    q.fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    st_samples[name].append(time.perf_counter() - t0)
        st_detail = {
            "queries": {n: round(median(xs), 4) for n, xs in st_samples.items()},
            "spread_pct": {
                n: round(spread_pct(xs), 1) for n, xs in st_samples.items()
            },
            "raw_spread_pct": {
                n: round(raw_spread_pct(xs), 1) for n, xs in st_samples.items()
            },
            "total": round(sum(median(xs) for xs in st_samples.values()), 4),
            "passes": n_passes,
            "note": "measured on the fresh JVM before the headline — see "
            "the dose-dependent degradation note in bench.py",
        }

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for pass_no in range(n_passes + 1):  # pass 0 = uncounted warmup
        for name in HEADLINE:
            q = REGISTRY[name]
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            if pass_no > 0:
                samples[name].append(time.perf_counter() - t0)

    # Adaptive re-run: sub-second queries on a shared JVM can show
    # 70-90% min-max spread over 3 passes, which hides real regressions.
    # Queries over the threshold get extra samples (up to 11 total) so
    # the median settles; the detail file records the final spread.
    # Eight rounds (round-6: mg1 was bimodal-in-context — stable alone
    # AND next to its write-heavy neighbors, so the full-run outliers
    # are accumulated-JVM-pressure noise that only more samples +
    # stronger trimming can average out) — only still-noisy queries
    # pay for each round, so the extra budget lands exactly on the
    # repeat offenders.
    if n_passes > 1:
        for _ in range(8):
            noisy = [n for n, xs in samples.items() if spread_pct(xs) > 30.0]
            if not noisy:
                break
            for name in noisy:
                q = REGISTRY[name]
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples[name].append(time.perf_counter() - t0)

    # ---- appendix (verdict r7 task 7; r8 tasks 4-5) ----
    # Every remaining registry query gets ONE uncounted warmup
    # (codegen/JIT) + TWO counted passes with a min-max spread,
    # replacing the r8 single cold pass that had no trend line.
    # Skipped on SPARK_GRAFT_BENCH_ONLY partial runs and under
    # SPARK_GRAFT_BENCH_SKIP_EXTRAS=1 (quick headline iteration).
    appx_detail: dict | None = None
    if extras:
        appx_names = sorted(
            n
            for n in REGISTRY
            if n not in HEADLINE and not n.startswith("st")
        )
        appx_samples: dict[str, list[float]] = {n: [] for n in appx_names}
        for pass_no in range(4):  # pass 0 = uncounted warmup, 3 counted
            for name in appx_names:
                q = REGISTRY[name]
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                if pass_no > 0:
                    appx_samples[name].append(time.perf_counter() - t0)
        # same adaptive top-up as the headline (verdict r9 task 2: no
        # appendix query may carry ONLY a 2-sample raw range) — noisy
        # queries get extra samples until the TRIMMED spread (the
        # stability of the median) gates at 30%, raw range published
        # alongside so bimodality stays visible
        for _ in range(8):
            noisy = [
                n for n, xs in appx_samples.items() if spread_pct(xs) > 30.0
            ]
            if not noisy:
                break
            for name in noisy:
                q = REGISTRY[name]
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                appx_samples[name].append(time.perf_counter() - t0)
        appx_detail = {
            "queries": {
                n: round(median(xs), 4) for n, xs in appx_samples.items()
            },
            "spread_pct": {
                n: round(spread_pct(xs), 1) for n, xs in appx_samples.items()
            },
            "raw_spread_pct": {
                n: round(raw_spread_pct(xs), 1)
                for n, xs in appx_samples.items()
            },
            "n_samples": {n: len(xs) for n, xs in appx_samples.items()},
            "total": round(
                sum(median(xs) for xs in appx_samples.values()), 4
            ),
            "passes": 3,
            "note": "warmup + 3 counted interleaved passes + adaptive "
            "top-ups for trimmed spread > 30%; spread_pct is the trimmed "
            "(median-stability) figure, raw min-max alongside",
        }

        # dc3 IVF-prefilter twin (verdict r8 task 5): the flag-gated
        # path is correctness-tested (tests/test_dc3_prefilter.py) but
        # was never TIMED — record it next to the exact path so the
        # 10k-probe scenario's claimed win is a number, not prose. At
        # the registry's eval-suite-sized probe set the exact broadcast
        # path is expected to win (the prefilter pays centroid build +
        # assignment); the twin exists to keep that honest.
        _DC3_FLAG = "spark.graft.dc3.ivfPrefilter"
        dc3 = REGISTRY["dc3_semantic_decontamination"]
        _dc3_prior = spark.conf.get(_DC3_FLAG, None)
        try:
            spark.conf.set(_DC3_FLAG, "true")
            xs = []
            for pass_no in range(3):  # warmup + 2 counted
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                dc3.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                if pass_no > 0:
                    xs.append(time.perf_counter() - t0)
        finally:
            # restore the PRIOR state, don't pin "false": if a future
            # default flips the flag on, the bench must not silently
            # turn it off for everything after this block (ADVICE r9)
            if _dc3_prior is None:
                spark.conf.unset(_DC3_FLAG)
            else:
                spark.conf.set(_DC3_FLAG, _dc3_prior)
        appx_detail["queries"]["dc3_semantic_decontamination__ivf_prefilter"] = (
            round(median(xs), 4)
        )
        appx_detail["spread_pct"][
            "dc3_semantic_decontamination__ivf_prefilter"
        ] = round(raw_spread_pct(xs), 1)

    timings = {name: round(median(xs), 4) for name, xs in samples.items()}
    spread = {name: round(spread_pct(xs), 1) for name, xs in samples.items()}
    raw_spread = {
        name: round(raw_spread_pct(xs), 1) for name, xs in samples.items()
    }
    total = round(sum(timings.values()), 4)

    # Full-precision detail (incl. per-query spread) goes to a side file;
    # stdout gets ONE compact JSON line. The harness that consumes stdout
    # keeps only the LAST 2000 CHARACTERS of output, so the line must stay
    # under that budget or the whole result is unparseable (this bit round
    # 3: 61 queries + spread_pct = ~4 KB line, recorded as parsed:null).
    # Partial runs (SPARK_GRAFT_BENCH_ONLY) must never clobber the
    # committed full-run artifact — they go to BENCH_PARTIAL.json.
    detail_name = "BENCH_PARTIAL.json" if only else "BENCH_DETAIL.json"
    with open(os.path.join(_HERE, detail_name), "w") as fh:
        json.dump(
            {
                "metric": "total_headline_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "passes": n_passes,
                "spread_pct": spread,
                "raw_spread_pct": raw_spread,
                **({"canary": canary_detail} if canary_detail else {}),
                **({"streaming": st_detail} if st_detail else {}),
                **({"appendix": appx_detail} if appx_detail else {}),
            },
            fh,
            indent=1,
        )

    budget = 1900
    shown = {name: round(t, 2) for name, t in timings.items()}
    line = ""
    # If every query doesn't fit, fold the fastest ones into one
    # "zz_others" bucket (slowest queries are the interesting ones).
    for _ in range(len(shown) + 1):
        payload = {
            "metric": "total_headline_seconds",
            "value": round(total, 2),
            "unit": "sec",
            "queries": shown,
            "sf": sf,
            "passes": n_passes,
            "detail": detail_name,
            **(
                {"box_state": round(box_state, 3)}
                if box_state is not None
                else {}
            ),
            **(
                {"st_total": round(st_detail["total"], 2)} if st_detail else {}
            ),
            **(
                {"appx_total": round(appx_detail["total"], 2)}
                if appx_detail
                else {}
            ),
        }
        line = json.dumps(payload, separators=(",", ":"))
        if len(line) <= budget:
            break
        real = [(n, t) for n, t in shown.items() if n != "zz_others"]
        if not real:
            break
        real.sort(key=lambda nt: nt[1])
        folded = shown.get("zz_others", 0.0) + real[0][1]
        shown = dict(real[1:])
        shown["zz_others"] = round(folded, 2)
    # Hard guarantee: a line over the harness capture budget means the
    # whole round's bench is recorded as parsed:null (bit round 3).
    assert len(line) <= budget, f"bench line {len(line)} chars > {budget}"
    print(line)


if __name__ == "__main__":
    main()
