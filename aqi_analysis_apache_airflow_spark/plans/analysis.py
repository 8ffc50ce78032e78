"""Round-11 analysis operators — published quality-filter rules,
detector-agreement statistics, and graph-structure metrics
(SURVEY.md §7 phase 5 extension; no reference counterpart — the
reference is a 479-line pandas ETL).

Families in this module:

- quality filtering: ``qc6`` (the Gopher rules scorecard, Rae et al.
  2021 — the published heuristic set large-corpus curation actually
  ships)
- evaluation harness: ``kappa1`` (Cohen's kappa between two deployed
  detectors), ``mcc1`` (Matthews correlation of the cls1 rule),
  ``ap1`` (average precision — the PR-curve companion to auc1's ROC)
- graph structure: ``assort1`` (degree assortativity, Newman 2002 —
  exact rational on a doubled edge list), ``lcc1`` (local clustering
  coefficient, Watts & Strogatz 1998, off tri1's triangle corners)
- diversity/divergence: ``simp1`` (unbiased Simpson diversity),
  ``jsd1`` (Jensen-Shannon divergence — the SYMMETRIC, bounded
  companion to psi1/ks1 drift)
- storage modeling: ``rle1`` (run-length-encoding payoff of the
  time-clustered layout per column)

Determinism contract (registry docstring): counts are integers; every
window order ends in a unique tiebreak key; ratios exit through
integral division of exact integers (sign-shifted where a numerator
can go negative — the mk1 OFF trick); logarithms appear only as the
6dp-then-1e6 micro-nat pin of a ratio of exact integers (the
psi1/zipf1 precedent). No RNG, no floats accumulated in partition
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dedup import tokens
from .registry import load, query

# sign-safe integral division shift (the mk1 precedent): for den > 0,
# (num + OFF*den) div den - OFF == floor(num/den) exactly for any sign
# of num while |num| <= OFF*den — both engines agree because the
# shifted numerator is non-negative
_OFF = 10**12


# --------------------------------------------------------------------------
# qc6 — Gopher quality rules scorecard (round 11)
# --------------------------------------------------------------------------

_QC6_SQL = r"""
WITH d AS (
  SELECT source,
         regexp_extract_all(text, '\S+') AS toks
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND source IS NOT NULL
),
feat AS (
  SELECT source,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(toks, w -> length(w)))
              AS BIGINT) AS sum_len,
         CAST((SELECT max(c) FROM (
                 SELECT count(*) AS c FROM unnest(toks) AS t(w) GROUP BY w
               )) AS BIGINT) AS top_c,
         CAST(len(list_intersect(list_distinct(toks),
              ['the', 'a', 'of', 'to', 'and'])) AS BIGINT) AS stop_hits
  FROM d
),
rules AS (
  SELECT source,
         CASE WHEN n_words >= 50 AND n_words <= 100000
              THEN 1 ELSE 0 END AS r_wc,
         CASE WHEN 3 * n_words <= sum_len AND sum_len <= 10 * n_words
              THEN 1 ELSE 0 END AS r_mwl,
         CASE WHEN 5 * top_c <= n_words THEN 1 ELSE 0 END AS r_rep,
         CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS r_stop
  FROM feat
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(r_wc) AS BIGINT) AS pass_word_count,
       CAST(sum(r_mwl) AS BIGINT) AS pass_mean_word_len,
       CAST(sum(r_rep) AS BIGINT) AS pass_repetition,
       CAST(sum(r_stop) AS BIGINT) AS pass_stop_words,
       CAST(sum(r_wc * r_mwl * r_rep * r_stop) AS BIGINT) AS pass_all,
       CAST((1000 * sum(r_wc * r_mwl * r_rep * r_stop)) // count(*)
            AS BIGINT) AS pass_all_permille
FROM rules GROUP BY source
"""


@query("qc6_gopher_rules", oracle=_QC6_SQL)
def qc6_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule scorecard per source (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Appendix A1.1 — THE
    published heuristic filter set that large-corpus curation
    pipelines ship, later reused by MassiveText/RefinedWeb/Dolma):
    word count in [50, 1e5]; mean word length in [3, 10]; most
    frequent word <= 20% of tokens (the repetition rule); document
    must contain >= 2 of a required stop-word set (adapted to this
    corpus's vocabulary: the/a/of/to/and — Gopher's own list is 8
    English function words). Where qc1 scores ONE blended quality
    number, this emits the per-RULE pass counts a curation rollout
    tunes against — which rule is doing the filtering is the
    actionable readout (Gopher's authors report exactly this
    per-rule ablation).

    Exactness: every rule is an integer cross-multiplication
    (3*words <= sum_len, 5*top_c <= words — never a float ratio);
    pass counts are 0/1 sums; the one emitted ratio is an integral
    permille division.

    Scale shape: tokenization + per-doc features in one projection
    (the top-word count via a bounded per-doc aggregate over the
    exploded token list — map-side combinable on (doc, word)), then
    one (source) counting groupBy. No joins, no windows over the
    corpus."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(
            F.col("doc_id").isNotNull()
            & F.col("text").isNotNull()
            & F.col("source").isNotNull()
        )
        .select("doc_id", "source", tokens(F.col("text")).alias("toks"))
    )
    # top-word count: explode -> (doc, word) counts -> per-doc max;
    # map-side combinable both levels, bounded by per-doc vocabulary
    top = (
        docs.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top_c"))
    )
    feat = docs.join(top, "doc_id").select(
        "source",
        F.size("toks").cast("long").alias("n_words"),
        F.aggregate(
            F.transform(F.col("toks"), lambda w: F.length(w)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_len"),
        "top_c",
        F.size(
            F.array_intersect(
                F.array_distinct("toks"),
                F.array(
                    F.lit("the"), F.lit("a"), F.lit("of"),
                    F.lit("to"), F.lit("and"),
                ),
            )
        ).cast("long").alias("stop_hits"),
    )
    rules = feat.select(
        "source",
        F.when(
            (F.col("n_words") >= 50) & (F.col("n_words") <= 100000), 1
        ).otherwise(0).alias("r_wc"),
        F.when(
            (3 * F.col("n_words") <= F.col("sum_len"))
            & (F.col("sum_len") <= 10 * F.col("n_words")),
            1,
        ).otherwise(0).alias("r_mwl"),
        F.when(5 * F.col("top_c") <= F.col("n_words"), 1)
        .otherwise(0)
        .alias("r_rep"),
        F.when(F.col("stop_hits") >= 2, 1).otherwise(0).alias("r_stop"),
    )
    return rules.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("r_wc").cast("long").alias("pass_word_count"),
        F.sum("r_mwl").cast("long").alias("pass_mean_word_len"),
        F.sum("r_rep").cast("long").alias("pass_repetition"),
        F.sum("r_stop").cast("long").alias("pass_stop_words"),
        F.sum(
            F.col("r_wc") * F.col("r_mwl") * F.col("r_rep") * F.col("r_stop")
        ).cast("long").alias("pass_all"),
        F.expr(
            "CAST((1000 * sum(r_wc * r_mwl * r_rep * r_stop))"
            " div count(*) AS BIGINT)"
        ).alias("pass_all_permille"),
    )


# --------------------------------------------------------------------------
# kappa1 — Cohen's kappa between two deployed detectors (round 11)
# --------------------------------------------------------------------------

_KAPPA1_SQL = f"""
WITH d AS (
  SELECT md5(text) AS h,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok,
         CAST(length(text) AS BIGINT) AS n_chr
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
hc AS (SELECT h, count(*) AS c FROM d GROUP BY h),
flags AS (
  SELECT CASE WHEN hc.c >= 2 THEN 1 ELSE 0 END AS fa,
         CASE WHEN d.n_tok < 20 OR d.n_chr > 12 * d.n_tok
              THEN 1 ELSE 0 END AS fb
  FROM d JOIN hc USING (h)
),
cm AS (
  SELECT CAST(count(*) FILTER (fa = 1 AND fb = 1) AS HUGEINT) AS a,
         CAST(count(*) FILTER (fa = 1 AND fb = 0) AS HUGEINT) AS b,
         CAST(count(*) FILTER (fa = 0 AND fb = 1) AS HUGEINT) AS c,
         CAST(count(*) FILTER (fa = 0 AND fb = 0) AS HUGEINT) AS d
  FROM flags
)
SELECT CAST(a AS BIGINT) AS both_flag,
       CAST(b AS BIGINT) AS only_dup,
       CAST(c AS BIGINT) AS only_qfail,
       CAST(d AS BIGINT) AS neither,
       CAST((1000 * (a + d)) // NULLIF(a + b + c + d, 0) AS BIGINT)
         AS agree_permille,
       CAST((1000000 * ((a + b + c + d) * (a + d)
                        - ((a + b) * (a + c) + (c + d) * (b + d)))
             + {_OFF} * NULLIF((a + b + c + d) * (a + b + c + d)
                        - ((a + b) * (a + c) + (c + d) * (b + d)), 0))
            // NULLIF((a + b + c + d) * (a + b + c + d)
                      - ((a + b) * (a + c) + (c + d) * (b + d)), 0)
            - {_OFF} AS BIGINT) AS kappa_micro
FROM cm
"""


@query("kappa1_cohen_kappa", oracle=_KAPPA1_SQL)
def kappa1_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (Cohen 1960) between two DEPLOYED document
    detectors — the exact-duplicate flag (d1's md5 rule) and the
    quality-gate fail (card1's qpass negation: under 20 tokens or
    over 12 chars/token). Raw agreement overstates concordance when
    both detectors fire rarely; kappa = (p_o - p_e)/(1 - p_e)
    discounts chance agreement, which is the number a curation
    review asks for before treating two filters as redundant (da1
    asks the same question of the two SKETCH families via pair-set
    Jaccard; kappa asks it of any two row-level flags on the same
    population).

    Exactness: the four cells come from one FILTERed counting
    aggregate; kappa exits as ONE integral micro division —
    kappa = (n*(a+d) - pe_n) / (n^2 - pe_n) with
    pe_n = (a+b)(a+c) + (c+d)(b+d) — made sign-safe with the OFF
    shift (kappa is negative when agreement is below chance; den >= 0
    by construction, NULL when every doc lands in one cell).

    Scale shape: one md5-keyed counting groupBy (the d1 shape) + one
    1-row aggregate; no pairwise anything."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .select(
            F.md5("text").alias("h"),
            F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
            F.length("text").cast("long").alias("n_chr"),
        )
    )
    hc = d.groupBy("h").agg(F.count("*").alias("c"))
    flags = d.join(hc, "h").select(
        F.when(F.col("c") >= 2, 1).otherwise(0).alias("fa"),
        F.when(
            (F.col("n_tok") < 20) | (F.col("n_chr") > 12 * F.col("n_tok")), 1
        ).otherwise(0).alias("fb"),
    )
    dec = "decimal(38,0)"
    cm = flags.agg(
        F.count(F.when((F.col("fa") == 1) & (F.col("fb") == 1), 1))
        .cast(dec).alias("a"),
        F.count(F.when((F.col("fa") == 1) & (F.col("fb") == 0), 1))
        .cast(dec).alias("b"),
        F.count(F.when((F.col("fa") == 0) & (F.col("fb") == 1), 1))
        .cast(dec).alias("c"),
        F.count(F.when((F.col("fa") == 0) & (F.col("fb") == 0), 1))
        .cast(dec).alias("d"),
    )
    pe_n = "((a + b) * (a + c) + (c + d) * (b + d))"
    den = f"((a + b + c + d) * (a + b + c + d) - {pe_n})"
    return cm.select(
        F.col("a").cast("long").alias("both_flag"),
        F.col("b").cast("long").alias("only_dup"),
        F.col("c").cast("long").alias("only_qfail"),
        F.col("d").cast("long").alias("neither"),
        F.expr(
            "CAST((1000 * (a + d)) div nullif(a + b + c + d, 0) AS BIGINT)"
        ).alias("agree_permille"),
        F.expr(
            f"CAST((1000000 * ((a + b + c + d) * (a + d) - {pe_n})"
            f" + {_OFF} * nullif({den}, 0)) div nullif({den}, 0)"
            f" - {_OFF} AS BIGINT)"
        ).alias("kappa_micro"),
    )


# --------------------------------------------------------------------------
# mcc1 — Matthews correlation of the cls1 decision rule (round 11)
# --------------------------------------------------------------------------

_MCC1_SQL = """
WITH scored AS (
  SELECT (lang = 'en') AS truth,
         (50 * CAST(len(regexp_extract_all(lower(text),
                        '\\b(the|a|of|to|and)\\b')) AS BIGINT)
          > CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)) AS pred
  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
),
cm AS (
  SELECT CAST(count(*) FILTER (truth AND pred) AS HUGEINT) AS tp,
         CAST(count(*) FILTER (NOT truth AND pred) AS HUGEINT) AS fp,
         CAST(count(*) FILTER (truth AND NOT pred) AS HUGEINT) AS fn,
         CAST(count(*) FILTER (NOT truth AND NOT pred) AS HUGEINT) AS tn
  FROM scored
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CAST(sign(tp * tn - fp * fn) AS BIGINT) AS mcc_sign,
       CAST((1000000 * (tp * tn - fp * fn) * (tp * tn - fp * fn))
            // NULLIF((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn), 0)
            AS BIGINT) AS mcc_sq_micro
FROM cm
"""


@query("mcc1_matthews_corr", oracle=_MCC1_SQL)
def mcc1_matthews_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient (Matthews 1975) of cls1's
    stopword decision rule against the language label — the single
    imbalance-robust scalar the confusion matrix reduces to: unlike
    accuracy or F1 it uses all four cells symmetrically, so a rule
    that games the majority class scores near 0, not near 1
    (Chicco & Jurman 2020 argue it as the default binary-eval
    metric). Completes the evaluation harness: cls1 = the cells +
    P/R/F1, auc1 = threshold-free ordering, mcc1 = the one-number
    balanced summary.

    Exactness: MCC needs sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn)), so the
    emitted figure is the SIGNED SQUARE in micro units — mcc_sign
    carries sign(tp*tn - fp*fn) and mcc_sq_micro = 1e6*(tp*tn-fp*fn)^2
    / denom, both exact integers (the corr1 no-sqrt convention);
    MCC = mcc_sign * sqrt(mcc_sq_micro/1e6) for any float consumer.
    DECIMAL(38,0) cross-products so a 1e10-doc corpus doesn't wrap.

    Scale shape: identical to cls1 — one pass, one 1-row aggregate,
    zero joins."""
    txt = F.col("text")
    hits = F.size(
        F.regexp_extract_all(
            F.lower(txt), F.lit(r"\b(the|a|of|to|and)\b"), 0
        )
    ).cast("long")
    toks = F.size(F.regexp_extract_all(txt, F.lit(r"\S+"), 0)).cast("long")
    scored = (
        load(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull() & txt.isNotNull())
        .select(
            (F.col("lang") == "en").alias("truth"),
            (50 * hits > toks).alias("pred"),
        )
    )
    t, p = F.col("truth"), F.col("pred")
    dec = "decimal(38,0)"
    cm = scored.agg(
        F.count(F.when(t & p, 1)).cast(dec).alias("tp"),
        F.count(F.when(~t & p, 1)).cast(dec).alias("fp"),
        F.count(F.when(t & ~p, 1)).cast(dec).alias("fn"),
        F.count(F.when(~t & ~p, 1)).cast(dec).alias("tn"),
    )
    return cm.select(
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.expr("CAST(sign(tp * tn - fp * fn) AS BIGINT)").alias("mcc_sign"),
        F.expr(
            "CAST((1000000 * (tp * tn - fp * fn) * (tp * tn - fp * fn))"
            " div nullif((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn), 0)"
            " AS BIGINT)"
        ).alias("mcc_sq_micro"),
    )


# --------------------------------------------------------------------------
# assort1 — degree assortativity of the order graph (round 11)
# --------------------------------------------------------------------------

_ASSORT1_SQL = """
WITH e0 AS (
  SELECT DISTINCT CAST(o.o_custkey * 2 AS BIGINT) AS src,
         CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
e AS (
  SELECT src, dst FROM e0
  UNION ALL SELECT dst AS src, src AS dst FROM e0
),
deg AS (SELECT src AS node, CAST(count(*) AS HUGEINT) AS d FROM e GROUP BY src),
ed AS (
  SELECT ds.d AS j, dd.d AS k
  FROM e
  JOIN deg ds ON ds.node = e.src
  JOIN deg dd ON dd.node = e.dst
),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS m,
         CAST(sum(j) AS HUGEINT) AS sj,
         CAST(sum(j * j) AS HUGEINT) AS sj2,
         CAST(sum(j * k) AS HUGEINT) AS sjk
  FROM ed
)
SELECT CAST(m AS BIGINT) AS n_edge_ends,
       CAST(sign(m * sjk - sj * sj) AS BIGINT) AS r_sign,
       CAST((1000000 * abs(m * sjk - sj * sj))
            // NULLIF(m * sj2 - sj * sj, 0) AS BIGINT) AS abs_r_micro
FROM s
"""


@query("assort1_degree_assortativity", oracle=_ASSORT1_SQL)
def assort1_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity (Newman 2002, "Assortative mixing in
    networks") of the customer-supplier order graph: the Pearson
    correlation of endpoint degrees across edges — positive means
    hubs link to hubs (social-network shape), negative means hubs
    link to leaves (the disassortative shape typical of bipartite
    commerce/web graphs). The one-scalar structural summary that
    tells a sampling/partitioning strategy whether degree-based
    salting will face hub-hub edges; complements gr1/hits1 (who is
    important) with HOW the important nodes wire to each other.

    Exactness: on a DOUBLED edge list the two endpoint marginals are
    identical (every edge contributes (j,k) and (k,j)), so Newman's
    r = (M*S_jk - S_j^2) / (M*S_j2 - S_j^2) EXACTLY — the usual
    sqrt(den_j * den_k) collapses because den_j = den_k, and the
    whole statistic is one integral micro division of exact HUGEINT /
    DECIMAL(38,0) sums; sign emitted separately so the division runs
    on non-negatives (the mcc1 convention). Denominator >= 0 by
    Cauchy-Schwarz, NULL on a degree-regular graph (zero variance).

    Scale shape: one distinct edge build (the gr1 join), one degree
    groupBy, two node-sized degree joins back onto edges (broadcast
    at this scale; at billion-node scale the same size gate as the
    label loops applies — deg is one row per node), one 1-row
    aggregate."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
    )
    e = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("decimal(38,0)").alias("d")
    )
    ed = (
        e.join(
            F.broadcast(deg.withColumnRenamed("node", "src")).withColumnRenamed(
                "d", "j"
            ),
            "src",
        )
        .join(
            F.broadcast(deg.withColumnRenamed("node", "dst")).withColumnRenamed(
                "d", "k"
            ),
            "dst",
        )
        .select("j", "k")
    )
    s = ed.agg(
        F.count("*").cast("decimal(38,0)").alias("m"),
        F.sum("j").cast("decimal(38,0)").alias("sj"),
        F.sum(F.col("j") * F.col("j")).cast("decimal(38,0)").alias("sj2"),
        F.sum(F.col("j") * F.col("k")).cast("decimal(38,0)").alias("sjk"),
    )
    return s.select(
        F.col("m").cast("long").alias("n_edge_ends"),
        F.expr("CAST(sign(m * sjk - sj * sj) AS BIGINT)").alias("r_sign"),
        F.expr(
            "CAST((1000000 * abs(m * sjk - sj * sj))"
            " div nullif(m * sj2 - sj * sj, 0) AS BIGINT)"
        ).alias("abs_r_micro"),
    )


# --------------------------------------------------------------------------
# lcc1 — local clustering coefficient (round 11)
# --------------------------------------------------------------------------

_LCC_MIN_SUPPORT = 20  # keep in sync with tri1 (curation.py)

_LCC1_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_distinct(regexp_extract_all(text, '\\S+')) AS l
  FROM documents
),
dw AS (SELECT doc_id, unnest(l) AS w FROM toks),
edges AS (
  SELECT a.w AS u, b.w AS v
  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w
  HAVING count(*) >= {_LCC_MIN_SUPPORT}
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
tcnt AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_tri
  FROM (SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
  GROUP BY node
)
SELECT d.node, d.deg,
       coalesce(t.n_tri, 0) AS n_tri,
       CAST((2000 * coalesce(t.n_tri, 0)) // (d.deg * (d.deg - 1))
            AS BIGINT) AS lcc_permille
FROM deg d LEFT JOIN tcnt t USING (node)
WHERE d.deg >= 2
ORDER BY lcc_permille DESC, node
"""


@query("lcc1_clustering_coefficient", oracle=_LCC1_SQL)
def lcc1_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Local clustering coefficient (Watts & Strogatz 1998,
    "Collective dynamics of 'small-world' networks") per node of the
    word co-occurrence graph: C(v) = 2*tri(v) / (deg(v)*(deg(v)-1)) —
    how close each word's neighborhood is to a clique. tri1 counts
    the triangles; this NORMALIZES them by the possible wedge count,
    which is the figure that separates a genuine topic cluster
    (high C at moderate degree) from a promiscuous stop-word hub
    (huge degree, near-zero C) — the standard small-world diagnostic
    a co-occurrence-based phrase miner (pmi1, phr1) sanity-checks
    its graph with.

    Exactness: triangle and degree counts are exact integers off the
    same support-{_LCC_MIN_SUPPORT} edge set as tri1 (kept in sync);
    the coefficient exits as one integral permille division of
    non-negatives; nodes of degree < 2 are excluded (the coefficient
    is undefined there — the published convention).

    Scale shape: tri1's oriented wedge join (low→high orientation
    bounds fan-out by the smaller-degree endpoint) plus ONE extra
    vocabulary-sized degree aggregate and a node-keyed left join —
    the normalization adds no corpus-scale work. Final order ends in
    the unique node key."""
    from pyspark.storagelevel import StorageLevel

    dw = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("w")
    )
    a = dw.alias("a")
    b = dw.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("u"), F.col("b.w").alias("v"))
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= _LCC_MIN_SUPPORT)
        .select("u", "v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
            "left_semi",
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    tcnt = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select("b"))
        .unionAll(tri.select("c"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_tri"))
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select("v"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tcnt, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.expr(
                "CAST((2000 * coalesce(n_tri, 0)) div (deg * (deg - 1))"
                " AS BIGINT)"
            ).alias("lcc_permille"),
        )
        .orderBy(F.col("lcc_permille").desc(), "node")
    )


# --------------------------------------------------------------------------
# simp1 — unbiased Simpson diversity of the language mix (round 11)
# --------------------------------------------------------------------------

_SIMP1_SQL = """
WITH lc AS (
  SELECT source, lang, CAST(count(*) AS HUGEINT) AS c
  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
  GROUP BY source, lang
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_langs,
       CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(1000000 - (1000000 * sum(c * (c - 1)))
            // NULLIF(sum(c) * (sum(c) - 1), 0) AS BIGINT)
         AS simpson_micro
FROM lc GROUP BY source
"""


@query("simp1_simpson_diversity", oracle=_SIMP1_SQL)
def simp1_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased Simpson diversity (Simpson 1949) of each source's
    language mix: 1 - sum(c_i*(c_i-1)) / (n*(n-1)) — the probability
    two documents drawn WITHOUT replacement differ in language.
    gini1 measures the same mix with the plug-in impurity
    sum(p_i^2), which is biased low for small groups; the
    without-replacement form is exactly unbiased, which matters when
    comparing sources of very different sizes (the small source's
    diversity isn't penalized by its own sample size). The
    ecology-standard diversity metric, used here as the
    language-balance readout a multilingual mixing plan (mix1, drm1)
    monitors.

    Exactness: numerator and denominator are exact integer products
    of counts; ONE integral micro division (both sides non-negative;
    NULL for single-doc sources where the statistic is undefined).

    Scale shape: one (source, lang) counting groupBy — map-side
    combinable — then a source-sized aggregate. No joins."""
    lc = (
        load(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull() & F.col("lang").isNotNull())
        .groupBy("source", "lang")
        .agg(F.count("*").cast("decimal(38,0)").alias("c"))
    )
    return lc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_langs"),
        F.sum("c").cast("long").alias("n_docs"),
        F.expr(
            "CAST(1000000 - (1000000 * sum(c * (c - 1)))"
            " div nullif(sum(c) * (sum(c) - 1), 0) AS BIGINT)"
        ).alias("simpson_micro"),
    )
