"""Plan-structure proofs for the round-11 analysis ops
(plans/analysis.py): each docstring's 100 TB claim about shuffles,
windows, and broadcasts is asserted from the executed plan, not
assumed — the test_scale_ops / test_selection_plans convention."""

from __future__ import annotations

import contextlib
import io
import re

from aqi_analysis_apache_airflow_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_ap1_window_partitions_by_score(spark):
    """ap1's claim: the per-doc ranking window partitions BY SCORE —
    never a corpus-wide single-partition sort. Every window node in
    the plan must carry a partition spec (the kw1 de-vacuoused
    parse: assert on the windowspecdefinition text itself)."""
    df = REGISTRY["ap1_average_precision"].fn(spark, SF_DIR)
    p = _plan(df)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert specs, p
    # corpus-side windows must name the score partition key; the one
    # permitted unpartitioned window is the bounded SPINE cumulative
    # (operates on groupBy(score) output, sources-x-buckets rows)
    partitioned = [s for s in specs if s.startswith("score")]
    assert partitioned, specs


def test_rle1_windows_partition_by_user(spark):
    """rle1's claim: the lag windows partition by user — the layout
    audit never globally sorts the corpus."""
    df = REGISTRY["rle1_run_length_payoff"].fn(spark, SF_DIR)
    p = _plan(df)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert specs, p
    assert all(s.startswith("user_id") for s in specs), specs


def test_qc6_no_corpus_joins_beyond_topword(spark):
    """qc6's claim: one explode + two counting aggregates + ONE
    doc-keyed join (the top-word attach); no broadcast of a
    corpus-sized relation, no window."""
    df = REGISTRY["qc6_gopher_rules"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "Window" not in p, p
    # exactly one join pair (SortMergeJoin or ShuffledHashJoin on doc_id)
    joins = re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", p)
    assert len(joins) == 1, p


def test_boot1_replica_spine_broadcasts(spark):
    """boot1's claim: the corpus is read once and fanned out against
    a BROADCAST 50-row replica spine — the bootstrap never shuffles
    the corpus per replica."""
    df = REGISTRY["boot1_poisson_bootstrap_ci"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    # one corpus scan only (documents appears in one FileScan)
    scans = re.findall(r"Scan parquet[^\n]*documents", p)
    assert len(scans) <= 2, p  # point estimate + replica arm


def test_mrr1_probes_broadcast(spark):
    """mrr1's claim: the bounded probe panel broadcasts onto the
    corpus; the ranking window partitions by probe."""
    df = REGISTRY["mrr1_first_relevant_rank"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "BroadcastNestedLoopJoin" in p, p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert specs and all(s.startswith("q_id") for s in specs), specs


def test_hilbert1_no_shuffle_before_bucket_agg(spark):
    """hilbert1's claim: the 8 unrolled curve rounds are narrow
    projections — the ONLY exchanges are the broadcast of the 1-row
    bounds and the final 32-cell groupBy."""
    df = REGISTRY["hilbert1_hilbert_layout"].fn(spark, SF_DIR)
    p = _plan(df)
    # hash-aggregate exchange for (curve, bucket) + possibly AQE reads;
    # no sort-merge join, no window
    assert "SortMergeJoin" not in p, p
    assert "Window" not in p, p


def test_funnel1_no_windows_no_arrays(spark):
    """funnel1's claim: chained user-keyed min-joins — no windows, no
    per-user array materialization (collect_list absent)."""
    df = REGISTRY["funnel1_ordered_conversion"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "Window" not in p, p
    assert "collect_list" not in p, p


def test_anova1_single_pass_per_group_agg(spark):
    """anova1's claim: one map-side-combinable (group) aggregate is
    the only corpus work — lineitem scans EXACTLY ONCE (the
    totals-attach runs as a window over the k-row group table, not a
    joined-back aggregate that would re-execute the corpus subtree),
    and the only window is that bounded k-row one."""
    df = REGISTRY["anova1_variance_explained"].fn(spark, SF_DIR)
    p = _plan(df)
    scans = re.findall(r"\(\d+\) Scan parquet", p)
    assert len(scans) == 1, p
    assert "SortMergeJoin" not in p, p


def test_markov2_degenerate_no_transitions(spark, tmp_path):
    """ADVICE r11: a corpus whose events yield ZERO transitions (one
    event per user) must return the empty k-row frame, not raise
    ZeroDivisionError on the driver-side 1000000 // k init."""
    import pandas as pd

    d = tmp_path / "sf_degenerate"
    d.mkdir()
    ev = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02")],
            "user_id": [1, 2],
            "event_type": ["view", "click"],
            "value": [1.0, 2.0],
            "props": [None, None],
        }
    )
    spark.createDataFrame(ev).coalesce(1).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )
    out = REGISTRY["markov2_stationary_distribution"].fn(spark, str(d))
    assert out.columns == ["event_type", "stationary_micro"]
    assert out.count() == 0


def test_gof1_single_pass_typed_windows(spark):
    """gof1's claim: one (type, weekday) counting groupBy is the only
    corpus pass; span geometry rides event_type-partitioned windows
    over that <= 7-rows-per-type relation, and the only join is the
    6-row broadcast chi^2 spine."""
    df = REGISTRY["gof1_weekday_uniformity"].fn(spark, SF_DIR)
    p = _plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert specs and all(s.startswith("event_type") for s in specs), specs
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", p)
    assert joins == ["BroadcastHashJoin"] or joins == [
        "BroadcastNestedLoopJoin"
    ], joins


def test_tost1_single_pass_no_joins(spark):
    """tost1's claim: identical to ab2 — ONE map-side-combined
    groupBy(event_type), all six power sums in the same pass."""
    df = REGISTRY["tost1_equivalence_test"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "Window" not in p, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert not re.findall(r"\(\d+\) \w*Join", p), p


def test_cv1_one_equi_join_plus_broadcast_totals(spark):
    """cv1's claim: one md5-keyed join back + one broadcast 1-row
    totals crossJoin; no windows, no corpus cartesian."""
    df = REGISTRY["cv1_fold_balance_audit"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "Window" not in p, p
    assert "CartesianProduct" not in p, p
    equi = re.findall(
        r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", p
    )
    assert len(equi) == 1, p


def test_reg1_no_windows_bounded_fanout(spark):
    """reg1's claim: the forecast fan-out is a broadcast 35-row power
    table against the calendar spine — no window operator anywhere
    (the weight index is pure date arithmetic, the ewma1 contract)."""
    df = REGISTRY["reg1_forecast_accuracy"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "Window" not in p, p


def test_srd1_two_bounded_rank_windows(spark):
    """srd1's claim: exactly the two global rank windows, both over
    the calendar-bounded forecast frame (the ap1-documented
    single-partition exception) — nothing corpus-sized is sorted."""
    df = REGISTRY["srd1_spearman_pearson_gap"].fn(spark, SF_DIR)
    p = _plan(df)
    specs = re.findall(r"windowspecdefinition\(", p)
    assert len(specs) == 2, p


def test_fleiss1_no_cartesian(spark):
    """fleiss1's claim: strictly the three detectors' documented
    shapes + doc-keyed joins — nothing all-pairs on the corpus."""
    df = REGISTRY["fleiss1_multirater_kappa"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "CartesianProduct" not in p, p


def test_brier1_one_scan_ten_groups(spark):
    """brier1's claim: one map-side-combinable (bin) groupBy is the
    ONLY corpus pass — totals ride a window over the 10-row bin
    relation instead of a second aggregate branch re-executing the
    scan."""
    df = REGISTRY["brier1_murphy_decomposition"].fn(spark, SF_DIR)
    p = _plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p


def test_tcl1_no_window_no_cartesian(spark):
    """tcl1's claim: stacked aggregates + broadcast segment totals —
    no window, no corpus cartesian."""
    df = REGISTRY["tcl1_t_closeness"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "Window" not in p, p
    assert "CartesianProduct" not in p, p


def test_seqdep1_single_lag_window(spark):
    """seqdep1's claim: the corpus is scanned ONCE (the user-keyed
    lag pass); margins/totals are windows over the k^2-row
    transition table, so the only corpus-side window partitions by
    user_id."""
    df = REGISTRY["seqdep1_markov_order_test"].fn(spark, SF_DIR)
    p = _plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert any(s.startswith("user_id") for s in specs), specs


def test_caldrift1_no_window_one_batch_groupby(spark):
    """caldrift1's claim: ONE map-side-combinable (batch) groupBy over
    a per-row projection plus heaps1's broadcast 1-row count — no
    window, no corpus cartesian beyond that 1-row broadcast, two
    scans total (the count arm + the scoring arm)."""
    df = REGISTRY["caldrift1_calibration_drift"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "Window" not in p, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2, p
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", p)
    assert joins == ["BroadcastNestedLoopJoin"], joins


def test_pperm1_probe_windows_share_exchange(spark):
    """pperm1's claim: both rank windows partition BY PROBE (q_id) and
    share one exchange; the probe panel and the 1-row totals are
    broadcasts; no corpus-wide window, no CartesianProduct."""
    df = REGISTRY["pperm1_paired_ranker_test"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "CartesianProduct" not in p, p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    ranked = [s for s in specs if s.startswith("q_id")]
    others = [s for s in specs if not s.startswith("q_id")]
    assert len(ranked) == 2, specs
    # the only unpartitioned windows are the totals over the
    # probe-sized diffs relation (the srd1/ap1 documented exception)
    assert all(s.startswith("specifiedwindowframe") for s in others), specs
    # the two row_number windows ride ONE q_id hash exchange, and the
    # observed/permutation arms share one lineage (a branched 1-row
    # aggregate would show a second q_id exchange)
    assert len(re.findall(r"hashpartitioning\(q_id", p)) == 1, p


def test_mcn1_single_pass_no_joins(spark):
    """mcn1's claim: ONE map-side-combinable (source) groupBy over a
    per-row projection — the cls1 shape with a GROUP BY; no join, no
    window, one corpus scan."""
    df = REGISTRY["mcn1_mcnemar_rules"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "Window" not in p, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert not re.findall(r"\(\d+\) \w*Join", p), p


def test_iqr1_spine_windows_one_scan(spark):
    """iqr1's r13 claim: ONE map-side-combinable (group, cents)
    groupBy is the only corpus pass; the cumulative and quartile
    walls ride per-group windows over the DISTINCT-value spine (the
    r12 form ranked raw rows — parallelism collapsed to |groups|
    tasks, e=0.82/decade measured; spine form e=0.16)."""
    df = REGISTRY["iqr1_tukey_fences"].fn(spark, SF_DIR)
    p = _plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert specs and all(s.startswith("g#") for s in specs), specs
    # the spine groupBy adds its partial+final HashAggregate pair on
    # top of the census pair — the r12 row-ranking plan had only two
    aggs = re.findall(r"\(\d+\) HashAggregate", p)
    assert len(aggs) >= 4, p


def test_kruskal1_spine_windows_one_scan_no_join(spark):
    """kruskal1's claim: ONE map-side-combinable (group, cents)
    groupBy is the only corpus pass; the cross-group cumulative,
    per-value totals, and tie marks ride windows over DISTINCT CENTS
    (the iqr1/mw1 spine convention); the chi^2 critical is an inlined
    CASE — no join anywhere."""
    df = REGISTRY["kruskal1_kruskal_wallis"].fn(spark, SF_DIR)
    p = _plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert not re.findall(r"\(\d+\) \w*Join", p), p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    spine = [s for s in specs if s.startswith("c#")]
    walls = [s for s in specs if s.startswith("specifiedwindowframe")]
    assert len(spine) == 3, specs  # cumulative, per-value total, rn
    assert len(walls) == 2, specs  # N and tie totals over the k rows
    # spine groupBy pair + group pair + final pair
    assert len(re.findall(r"\(\d+\) \w*HashAggregate", p)) >= 6, p


def test_cliffs1_mw1_shape_one_scan_no_join(spark):
    """cliffs1's claim: mw1's exact shape — one value-key groupBy,
    the strictly-less cumulative and half total as windows over the
    value domain, one 1-row aggregate; no join."""
    df = REGISTRY["cliffs1_cliffs_delta"].fn(spark, SF_DIR)
    p = _plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert not re.findall(r"\(\d+\) \w*Join", p), p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert len(specs) == 2, specs  # n_chars cumulative + wall total


def test_cochq1_shares_fleiss_shape_no_cartesian(spark):
    """cochq1's claim: identical pipeline to fleiss1 (the shared
    ``_detector_flag_sums``) — pair-sized detector relations,
    doc-keyed joins, ONE 1-row aggregate; nothing all-pairs."""
    df = REGISTRY["cochq1_cochran_q"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_dw1_runs1_single_bounded_lag_window(spark):
    """dw1/runs1's claim: the reg1/ewma1 machinery (daily groupBy +
    broadcast 35-row power fan-out) plus exactly ONE lag window over
    the calendar-bounded residual frame, partitioned by event_type."""
    for name in ("dw1_durbin_watson", "runs1_wald_wolfowitz"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        p = _plan(df)
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
        assert len(specs) == 1 and specs[0].startswith("event_type"), (
            name,
            specs,
        )
        assert "CartesianProduct" not in p, (name, p)


def test_dm1_single_bounded_lag_window(spark):
    """dm1's claim: the dw1 shape — the reg1/ewma1 daily machinery
    plus exactly ONE lag window over the calendar-bounded forecast
    frame; the naive arm never rescans the corpus."""
    df = REGISTRY["dm1_diebold_mariano"].fn(spark, SF_DIR)
    p = _plan(df)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert len(specs) == 1 and specs[0].startswith("event_type"), specs
    assert "CartesianProduct" not in p, p


def test_cmh1_single_pass_no_joins(spark):
    """cmh1's claim: mcn1's shape — ONE map-side-combinable (source)
    groupBy over a per-row projection, then a 1-row final; no join,
    no window, one corpus scan."""
    df = REGISTRY["cmh1_mantel_haenszel"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "Window" not in p, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert not re.findall(r"\(\d+\) \w*Join", p), p


def test_sen1_bounded_pair_join_broadcast(spark):
    """sen1's claim: the pair self-join and rank window live on the
    CALENDAR-BOUNDED daily aggregate (broadcast — never a shuffled
    corpus join); windows partition by event_type."""
    df = REGISTRY["sen1_theil_sen_slope"].fn(spark, SF_DIR)
    p = _plan(df)
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", p)
    assert joins == ["BroadcastHashJoin"], joins
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert specs and all(s.startswith("event_type") for s in specs), specs


def test_lb1_lag_windows_share_exchange_no_selfjoin(spark):
    """lb1's claim: all 7 lag columns ride ONE ordered window over
    the calendar-bounded residual frame (sharing the type exchange
    with the wall totals) — no self-join of the frame, no lag-literal
    fan-out (the first cut self-joined and doubled the corpus scans:
    8 -> 4, this gate pins the fix)."""
    df = REGISTRY["lb1_ljung_box"].fn(spark, SF_DIR)
    p = _plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 4, p
    assert "SortMergeJoin" not in p, p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert all(s.startswith("event_type") for s in specs), specs


def test_pettitt1_bounded_pair_join_spine_windows(spark):
    """pettitt1's claim: the sign pair join, running sum, and argmax
    live on the calendar-bounded dense spine — broadcast joins only,
    windows partitioned by event_type."""
    df = REGISTRY["pettitt1_change_point"].fn(spark, SF_DIR)
    p = _plan(df)
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", p)
    assert all(j.startswith("Broadcast") for j in joins), joins
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert specs and all(s.startswith("event_type") for s in specs), specs


def test_mhor1_single_pass_no_joins(spark):
    """mhor1's claim: mcn1/cmh1's shape — ONE (source) groupBy over a
    per-row projection, 1-row final; no join, no window."""
    df = REGISTRY["mhor1_mh_common_or"].fn(spark, SF_DIR)
    p = _plan(df)
    assert "Window" not in p, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert not re.findall(r"\(\d+\) \w*Join", p), p


def test_di1_eo1_one_pass_k_row_windows(spark):
    """di1/eo1's claim: ONE (source) groupBy is the only corpus pass;
    the reference pick / leave-one-out totals are windows over the
    k-row source relation; no join anywhere."""
    for name in ("di1_disparate_impact", "eo1_equalized_odds"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        p = _plan(df)
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, (name, p)
        assert not re.findall(r"\(\d+\) \w*Join", p), (name, p)
        assert "windowspecdefinition" in p, (name, p)
