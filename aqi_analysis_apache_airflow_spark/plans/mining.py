"""Corpus-statistics mining operators: a BPE merge step, unigram-LM
quality ranks, rank statistics (Spearman, winsorization), impurity and
trend measures, and physical-layout zone maps.

These extend the LLM-curation surface (SURVEY.md §7 phase 5; no
reference counterpart — the reference is a 479-line pandas ETL) with
the *statistics* stages of a training-data pipeline: the tokenizer-
training inner loop (``bpe1``), CCNet-style language-model quality
scoring (``lm1``), robust outlier treatment (``an3``), monotone-
association and drift measures (``corr1``, ``gini1``, ``g13``),
time-decayed feature engineering (``fe1``), and the min/max file
statistics a lakehouse writer maintains (``zone1``).

Determinism contract (registry docstring): counts and ranks are
integers; every rank window ends in a unique tiebreak key; double
arithmetic happens only on exact integer-derived operands (IEEE-
identical across engines) and is ``round``-ed where a quotient is
emitted. No RNG, no floats accumulated in partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dedup import tokens
from .registry import EVENTS_US_CTE, load, query

# --------------------------------------------------------------------------
# bpe1 — one BPE-training merge step (char-pair counting)
# --------------------------------------------------------------------------

_BPE1_TOP = 20


@query(
    "bpe1_merge_step",
    oracle=f"""
    WITH words AS (
      SELECT unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                   i -> substring(w, CAST(i AS INTEGER), 2))) AS pair
      FROM words WHERE length(w) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS c
    FROM pairs GROUP BY pair
    ORDER BY c DESC, pair LIMIT {_BPE1_TOP}
    """,
)
def bpe1_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One inner-loop step of BPE tokenizer training: count every
    adjacent symbol pair inside each word across the corpus and emit
    the top merge candidates. Real BPE iterates this (merge the top
    pair, recount); one step is the engine-shaped kernel — the rest
    is a driver loop over a shrinking alphabet.

    Shape: explode words (narrow), explode per-word char bigrams via
    ``transform(sequence(...))`` (narrow — no join, no UDF), one
    pair-keyed groupBy (map-side combined: the key space is
    alphabet², tiny), TakeOrdered top-k. At 100 TB the only shuffle
    is alphabet²-sized aggregation — this scales with corpus bytes,
    not pairs. Words of length 1 are filtered BEFORE the sequence:
    Spark's ``sequence(1, 0)`` counts *down* ([1, 0]) instead of
    returning empty, which would fabricate pairs."""
    docs = load(spark, sf_dir, "documents").select("text")
    w = F.col("w")
    pairs = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .where(F.length(w) >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(w) - 1),
                    lambda i: w.substr(i, F.lit(2)),
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("long").alias("c"))
        .orderBy(F.desc("c"), "pair")
        .limit(_BPE1_TOP)
    )


# --------------------------------------------------------------------------
# lm1 — unigram-LM document quality score via integer frequency ranks
# --------------------------------------------------------------------------


@query(
    "lm1_unigram_rank_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents
    ),
    uni AS (
      SELECT w, count(*) AS c FROM tok GROUP BY w
    ),
    ranked AS (
      SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS r
      FROM uni
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           CAST(sum(r.r) AS BIGINT) AS rank_sum,
           round(CAST(sum(r.r) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS avg_rank
    FROM tok t JOIN ranked r ON t.w = r.w
    GROUP BY t.doc_id
    """,
)
def lm1_unigram_rank_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality scoring with a unigram LM, made bit-exact:
    instead of mean log-probability (libm-specific), score each doc
    by the mean corpus FREQUENCY RANK of its tokens — the ranking of
    docs is equivalent for filtering purposes (rank is a monotone
    proxy for -log p under Zipf), and integer ranks hash-match across
    engines. Low avg_rank = common-word prose; very high = rare-token
    noise — the standard perplexity-bucket curation signal.

    Shape: one vocab groupBy, one GLOBAL row_number over the vocab
    (vocabulary-sized — millions of rows at web scale, one partition
    of a few MB; NOT corpus-sized), a broadcast-friendly rank join
    back onto the exploded tokens, one doc-keyed reaggregation. The
    corpus-sized stages are all narrow or map-side combined."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("c"))
    ranked = uni.select(
        "w",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), "w"))
        .cast("long")
        .alias("r"),
    )
    n_tok = F.count("*").cast("long")
    rank_sum = F.sum("r").cast("long")
    return (
        tok.join(F.broadcast(ranked), "w")
        .groupBy("doc_id")
        .agg(
            n_tok.alias("n_tok"),
            rank_sum.alias("rank_sum"),
            F.round(
                rank_sum.cast("double") / n_tok.cast("double"), 6
            ).alias("avg_rank"),
        )
    )


# --------------------------------------------------------------------------
# corr1 — Spearman rank correlation (integer rank arithmetic)
# --------------------------------------------------------------------------


@query(
    "corr1_spearman",
    oracle=f"""
    WITH {EVENTS_US_CTE},
    ranked AS (
      SELECT event_type,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS BIGINT) AS rx,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) AS BIGINT) AS ry
      FROM ev
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
           round(1.0 - 6.0 * CAST(sum((rx - ry) * (rx - ry)) AS DOUBLE)
                 / CAST(count(*) * (count(*) * count(*) - 1) AS DOUBLE), 6)
             AS rho
    FROM ranked GROUP BY event_type
    """,
)
def corr1_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value and event time,
    per event type — the robust monotone-association measure (drift:
    'are values trending over time?'). Pearson on ranks degrades to
    pure integer arithmetic: rho = 1 - 6·Σd²/(n(n²-1)), where d is
    the difference of the two row_number ranks — bit-exact across
    engines, unlike float-accumulated ``corr``.

    Shape: two rank windows over the SAME partition key (one
    exchange — Catalyst reuses the hash partitioning for both sorts),
    then a partial-aggregated groupBy. No joins. Ties are broken by
    the unique event_id so ranks are deterministic; with heavy
    value-ties this is 'Spearman with arbitrary-but-stable tie order'
    — the documented trade for exactness (average-rank ties would
    need fractional ranks)."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "ts", "value")
    by_type = Window.partitionBy("event_type")
    rx = F.row_number().over(by_type.orderBy("value", "event_id")).cast("long")
    ry = F.row_number().over(by_type.orderBy("ts", "event_id")).cast("long")
    d = F.col("rx") - F.col("ry")
    n = F.count("*").cast("long")
    sum_d2 = F.sum(d * d).cast("long")
    return (
        ev.select("event_type", rx.alias("rx"), ry.alias("ry"))
        .groupBy("event_type")
        .agg(
            n.alias("n"),
            sum_d2.alias("sum_d2"),
            F.round(
                F.lit(1.0)
                - F.lit(6.0)
                * sum_d2.cast("double")
                / (n * (n * n - F.lit(1))).cast("double"),
                6,
            ).alias("rho"),
        )
    )


# --------------------------------------------------------------------------
# an3 — rank-based winsorization (percentile clamping without floats)
# --------------------------------------------------------------------------

_WINSOR_LO = 0.05
_WINSOR_HI = 0.95


@query(
    "an3_winsorize",
    oracle=f"""
    WITH {EVENTS_US_CTE},
    ranked AS (
      SELECT event_id, event_type, value,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM ev
    ),
    bounded AS (
      SELECT *,
             CAST(ceil(CAST(n AS DOUBLE) * {_WINSOR_LO}) AS BIGINT) AS k_lo,
             CAST(ceil(CAST(n AS DOUBLE) * {_WINSOR_HI}) AS BIGINT) AS k_hi
      FROM ranked
    ),
    walls AS (
      SELECT *,
             max(CASE WHEN rn = k_lo THEN value END)
               OVER (PARTITION BY event_type) AS lo_val,
             max(CASE WHEN rn = k_hi THEN value END)
               OVER (PARTITION BY event_type) AS hi_val
      FROM bounded
    )
    SELECT event_id, event_type, value,
           CASE WHEN rn < k_lo THEN lo_val
                WHEN rn > k_hi THEN hi_val
                ELSE value END AS winsorized
    FROM walls
    """,
)
def an3_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp each group's values into its [p05, p95]
    band — the robust pre-aggregation treatment for heavy-tailed
    metrics (an1/an2 *flag* outliers; this *repairs* them). The
    percentile boundary is chosen by RANK (the value at row_number
    ceil(q·n)), not interpolated — the boundary is an actual datum,
    clamped rows copy it verbatim, and no float arithmetic ever
    happens on the measure, so the result hash-matches bit-for-bit.

    Shape: one hash exchange on event_type, reused by all three
    window passes (rank, wall lookup — Catalyst collapses same-key
    windows into one sort); no joins, no second shuffle. Group
    cardinality (events per type) must fit a partition — the same
    contract as any per-group sort window; salt or pre-bucket if a
    single group outgrows an executor."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    by_type = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(by_type.orderBy("value", "event_id"))
        .cast("long")
        .alias("rn"),
        F.count("*").over(by_type).cast("long").alias("n"),
    )
    bounded = ranked.select(
        "*",
        F.ceil(F.col("n").cast("double") * _WINSOR_LO).cast("long").alias("k_lo"),
        F.ceil(F.col("n").cast("double") * _WINSOR_HI).cast("long").alias("k_hi"),
    )
    walls = bounded.select(
        "*",
        F.max(F.when(F.col("rn") == F.col("k_lo"), F.col("value")))
        .over(by_type)
        .alias("lo_val"),
        F.max(F.when(F.col("rn") == F.col("k_hi"), F.col("value")))
        .over(by_type)
        .alias("hi_val"),
    )
    return walls.select(
        "event_id",
        "event_type",
        "value",
        F.when(F.col("rn") < F.col("k_lo"), F.col("lo_val"))
        .when(F.col("rn") > F.col("k_hi"), F.col("hi_val"))
        .otherwise(F.col("value"))
        .alias("winsorized"),
    )


# --------------------------------------------------------------------------
# gini1 — Gini impurity of the language mix per source (rational form)
# --------------------------------------------------------------------------


@query(
    "gini1_lang_impurity",
    oracle="""
    WITH cl AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY source, lang
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_langs,
           round(CAST(sum(c) * sum(c) - sum(c * c) AS DOUBLE)
                 / CAST(sum(c) * sum(c) AS DOUBLE), 9) AS gini
    FROM cl GROUP BY source
    """,
)
def gini1_lang_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity of each source's language distribution — the
    mixture-diversity dashboard number for a multilingual corpus
    (0 = monolingual source, →1 = uniform over many languages).
    Computed in RATIONAL form, 1 - Σpᵢ² = (N² - Σcᵢ²)/N², from exact
    integer counts: one double division at the end (IEEE-identical on
    identical integers) instead of accumulating float shares —
    entropy would need libm ``ln``; Gini ranks mixtures identically
    and stays exact.

    Shape: two cascaded map-side-combined groupBys ((source, lang)
    then source) — the first output is |sources|×|langs| rows, so the
    second aggregation is driver-trivial at any corpus size."""
    docs = load(spark, sf_dir, "documents").select("source", "lang")
    cl = docs.groupBy("source", "lang").agg(F.count("*").cast("long").alias("c"))
    n = F.sum("c").cast("long")
    sum_c2 = F.sum(F.col("c") * F.col("c")).cast("long")
    return cl.groupBy("source").agg(
        n.alias("n_docs"),
        F.count("*").cast("long").alias("n_langs"),
        F.round(
            (n * n - sum_c2).cast("double") / (n * n).cast("double"), 9
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# zone1 — zone-map (min/max) file statistics + pruning estimate
# --------------------------------------------------------------------------

_ZONE_BUCKETS = 64
_ZONE_LO = "1995-06-01"
_ZONE_HI = "1995-09-01"


@query(
    "zone1_zonemap_stats",
    oracle=f"""
    SELECT l_orderkey % {_ZONE_BUCKETS} AS file_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           (max(l_shipdate) < DATE '{_ZONE_LO}'
            OR min(l_shipdate) >= DATE '{_ZONE_HI}') AS prunable
    FROM lineitem
    GROUP BY l_orderkey % {_ZONE_BUCKETS}
    """,
)
def zone1_zonemap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map construction: per physical file (modeled as orderkey
    mod N — the round-robin layout a naive writer produces), the
    min/max column statistics a parquet footer / Delta add-file entry
    carries, plus whether a given shipdate range-predicate could skip
    the file entirely. This is the maintenance query behind
    data-skipping: on a clustered layout (zorder1) most zones become
    prunable; on this hash layout almost none are — the pair of
    queries demonstrates WHY layout matters at 100 TB.

    Shape: one groupBy on a key derived in the scan projection,
    map-side combined to N rows. Nothing else."""
    li = load(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % _ZONE_BUCKETS).alias("file_id"),
        "l_shipdate",
        "l_extendedprice",
    )
    return li.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        (
            (F.max("l_shipdate") < F.lit(_ZONE_LO).cast("date"))
            | (F.min("l_shipdate") >= F.lit(_ZONE_HI).cast("date"))
        ).alias("prunable"),
    )


# --------------------------------------------------------------------------
# fe1 — time-decayed activity score (integer halving decay)
# --------------------------------------------------------------------------


@query(
    "fe1_decayed_activity",
    oracle=f"""
    WITH {EVENTS_US_CTE},
    seq AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS v_e2,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT) AS i,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
      FROM ev
    )
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN n - i >= 63 THEN 0
                         ELSE v_e2 >> (n - i) END) AS BIGINT) AS decayed_e2
    FROM seq GROUP BY user_id
    """,
)
def fe1_decayed_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed user activity score — the classic recency-
    weighted feature (EWMA with α=1/2 per event): after a user's
    latest event, each prior event contributes its value halved once
    per intervening event. Float EWMA accumulates in libm/order-
    specific ways; here the value is fixed-pointed to cents and the
    decay is an INTEGER right-shift (exact floor-halving, identical
    in every engine), so the feature is reproducible bit-for-bit —
    what a feature store actually requires for training/serving skew
    audits.

    Shape: one hash exchange on user_id reused by both windows, then
    a map-side-combined reaggregation on the same key — Catalyst
    plans zero additional shuffles. Shift amounts ≥63 short-circuit
    to 0 (the contribution is provably zero) so ANSI mode never sees
    an out-of-range shift."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    by_user = Window.partitionBy("user_id")
    seq = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("v_e2"),
        F.row_number().over(by_user.orderBy("ts", "event_id"))
        .cast("long")
        .alias("i"),
        F.count("*").over(by_user).cast("long").alias("n"),
    )
    age = (F.col("n") - F.col("i")).cast("int")
    term = F.when(age >= 63, F.lit(0)).otherwise(
        F.expr("shiftright(v_e2, CAST(n - i AS INT))")
    )
    return seq.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.sum(term).cast("long").alias("decayed_e2"),
    )


# --------------------------------------------------------------------------
# g13 — per-group linear trend from exact decimal power sums
# --------------------------------------------------------------------------

_G13_EPOCH = "2021-01-01"


@query(
    "g13_linear_trend",
    oracle=f"""
    WITH {EVENTS_US_CTE},
    pts AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '{_G13_EPOCH}', CAST(ts AS DATE))
                  AS DECIMAL(18,2)) AS x,
             CAST(value AS DECIMAL(18,6)) AS y
      FROM ev
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(x * y) AS DOUBLE) AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS slope_per_day,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept
    FROM s
    """,
)
def g13_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend line (value vs. day index) from exact
    decimal power sums — ``regr_slope``/``regr_intercept`` without
    their float-accumulation nondeterminism, extending g8's moment
    pattern to regression. The drift question dq3 answers
    categorically ('did the distribution move?') this answers
    parametrically ('how fast is the level moving per day?').

    Shape: one map-side-combined groupBy computing five shared sums;
    slope/intercept are per-group scalar arithmetic on exact inputs.
    Day index (not epoch seconds) keeps x² sums within decimal(18)
    range at any corpus age."""
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value")
    x = F.datediff(F.to_date("ts"), F.lit(_G13_EPOCH).cast("date")).cast(
        "decimal(18,2)"
    )
    y = F.col("value").cast("decimal(18,6)")
    s = ev.select("event_type", x.alias("x"), y.alias("y")).groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_per_day"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )
