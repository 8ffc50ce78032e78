"""Round-3 training-data curation + analytics operators: document
quality scoring (Gopher-style rules), repetition filtering, weighted
priority sampling, temperature-based source mixing, collocation
mining, edit-distance similarity join, bloom-filter semi-join, batch
KNN join, triangle counting, cluster centroids, and mergeable-sketch
distinct counts.

No reference counterpart (the reference is a 479-line pandas ETL —
``dags/etl/*.py``); these are the mandated extended surface for a
100 TB training-data deployment. Design rules carried over from the
earlier families:

- Randomness is the md5-derived cross-engine hash (``ce_hash64``), so
  every sampling decision replays bit-exactly in DuckDB; production
  swaps in ``xxhash64`` with no other change.
- Sums of doubles route through DECIMAL; per-row double arithmetic
  (mul/div/sqrt — IEEE-identical across engines) stays raw; values
  born from engine-specific libm (ln/pow) are avoided entirely —
  monotone rational equivalents (lift instead of PMI, priority w/u
  instead of u^(1/w), sqrt instead of pow(x, 0.5)) keep the math
  cross-engine exact.
- Every plan is shuffle-minimal and documented for the 100 TB case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dedup import CE_HASH64_SQL, ce_hash64, tokens
from .registry import load, query

# --------------------------------------------------------------------------
# document quality scoring (Gopher-style rule filters)
# --------------------------------------------------------------------------

_STOPWORD_RE = r"\b(the|a|of|to|and)\b"


@query(
    "qc1_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\S+')) AS INTEGER) AS n_tokens,
             CAST(length(regexp_replace(text, '\\s', '', 'g')) AS INTEGER)
               AS n_word_chars,
             CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
               AS INTEGER) AS n_symbol_chars,
             CAST(length(text) AS INTEGER) AS n_chars,
             CAST(len(regexp_extract_all(lower(text), '{_STOPWORD_RE}'))
               AS INTEGER) AS stopword_hits
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(n_word_chars AS DOUBLE) / NULLIF(n_tokens, 0) AS mean_word_len,
           CAST(n_symbol_chars AS DOUBLE) / NULLIF(n_chars, 0) AS symbol_ratio,
           stopword_hits,
           (n_tokens BETWEEN 50 AND 100000
            AND CAST(n_word_chars AS DOUBLE) / NULLIF(n_tokens, 0)
                BETWEEN 3.0 AND 10.0
            AND CAST(n_symbol_chars AS DOUBLE) / NULLIF(n_chars, 0) < 0.1
            AND stopword_hits >= 2) AS quality_pass
    FROM t
    """,
)
def qc1_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1):
    token-count bounds, mean-word-length band, symbol ratio, stopword
    presence — the rule filter every pretraining corpus passes through
    before dedup. Mean word length is computed as non-whitespace chars
    over token count (one regexp_replace + length, whole-stage codegen)
    instead of a per-token lambda fold (interpreted, ~10× slower).
    Pure narrow projection: zero shuffles at any scale; the filter
    columns are plain expressions, so Catalyst pushes a downstream
    ``WHERE quality_pass`` into the scan."""
    df = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    n_word_chars = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    n_symbol_chars = F.length(
        F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", "")
    )
    n_chars = F.length("text")
    stopword_hits = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(_STOPWORD_RE), 0)
    )
    mean_word_len = n_word_chars.cast("double") / F.nullif(n_tokens, F.lit(0))
    symbol_ratio = n_symbol_chars.cast("double") / F.nullif(n_chars, F.lit(0))
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        stopword_hits.alias("stopword_hits"),
        (
            n_tokens.between(50, 100000)
            & mean_word_len.between(3.0, 10.0)
            & (symbol_ratio < 0.1)
            & (stopword_hits >= 2)
        ).alias("quality_pass"),
    )


@query(
    "qc2_repetition_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM documents
    ),
    bg AS (
      SELECT doc_id, l[i] || ' ' || l[i + 1] AS bigram
      FROM toks, UNNEST(generate_series(1, len(l) - 1)) AS t(i)
      WHERE len(l) >= 2
    ),
    c AS (
      SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS cnt
      FROM bg GROUP BY 1, 2
    ),
    r AS (
      SELECT doc_id, bigram, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n_bigrams,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY cnt DESC, bigram) AS rn
      FROM c
    )
    SELECT doc_id, n_bigrams, bigram AS top_bigram, cnt AS top_bigram_cnt,
           CAST(cnt AS DOUBLE) / n_bigrams AS top_bigram_frac,
           CAST(cnt AS DOUBLE) / n_bigrams <= 0.2 AS repetition_pass
    FROM r WHERE rn = 1
    """,
)
def qc2_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter (Gopher §A1.1 'repetitious text'): the
    fraction of a document's word bigrams occupied by its single most
    frequent bigram; templated/spammy docs score high. Docs with <2
    tokens have no bigrams and are excluded (nothing to score).

    Shape: per-doc bigram build (slice+array_join — no interpreted
    per-element lambdas), explode, ONE two-key groupBy (map-side
    combined), then a per-doc window for the arg-max with a
    lexicographic bigram tiebreak. At 100 TB the explode is narrow
    (no shuffle) and the groupBy/window both partition by doc_id, so
    the whole job is a single exchange."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    bigram_at = lambda i: F.array_join(F.slice(toks, i + 1, 2), " ")
    bigrams = F.when(
        n >= 2, F.transform(F.sequence(F.lit(0), n - 2), bigram_at)
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        docs.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"))
    )
    w_doc = Window.partitionBy("doc_id")
    w_rank = w_doc.orderBy(F.col("cnt").desc(), F.col("bigram"))
    top_frac = F.col("cnt").cast("double") / F.col("n_bigrams")
    return (
        counts.withColumn("n_bigrams", F.sum("cnt").over(w_doc))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "n_bigrams",
            F.col("bigram").alias("top_bigram"),
            F.col("cnt").alias("top_bigram_cnt"),
            top_frac.alias("top_bigram_frac"),
            (top_frac <= 0.2).alias("repetition_pass"),
        )
    )


# --------------------------------------------------------------------------
# weighted sampling + source mixing
# --------------------------------------------------------------------------

_TWO_53 = 1 << 53  # largest power of two with every long below it exact in double
_WS_K = 32

_WS_CE = CE_HASH64_SQL.format(h="md5('ws|'||CAST(doc_id AS VARCHAR))")
_WS_U = (
    f"CAST(((({_WS_CE}) % {_TWO_53}) + {_TWO_53}) % {_TWO_53} + 1 AS DOUBLE)"
    f" / {_TWO_53}"
)


def _uniform(prefix: str, id_col: str = "doc_id"):
    """Deterministic uniform in (0, 1]: hash mod 2^53 + 1, over 2^53.
    Every intermediate long is ≤ 2^53, hence exactly representable in
    a double; the division is a single IEEE op — bit-identical in any
    engine given the same hash."""
    h = F.pmod(
        ce_hash64(F.concat(F.lit(prefix), F.col(id_col).cast("string"))),
        F.lit(_TWO_53),
    )
    return (h + 1).cast("double") / F.lit(_TWO_53).cast("double")


@query(
    "ws1_priority_sample",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, n_chars,
             CAST(n_chars AS DOUBLE) / ({_WS_U}) AS priority
      FROM documents
    ),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY priority DESC, doc_id) AS rn
      FROM t
    )
    SELECT doc_id, source, n_chars, priority FROM r WHERE rn <= {_WS_K}
    """,
)
def ws1_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample of exactly k docs per source via PRIORITY
    SAMPLING (Duffield, Lund & Thorup 2007): priority = weight / u
    with u a deterministic uniform in (0,1]; the top-k by priority is
    a weight-biased without-replacement sample with unbiased
    subset-sum estimators. Chosen over Efraimidis–Sirivianos
    u^(1/w) because w/u needs only one IEEE division — exact in any
    engine — while pow/ln are libm-specific and would break the
    bit-exact oracle.

    Scale: per-partition top-k then per-source merge (the window is
    partitioned by source, and a 100 TB run would pre-aggregate with
    a per-partition ORDER BY priority LIMIT k before the exchange —
    same result, bounded shuffle)."""
    df = load(spark, sf_dir, "documents")
    priority = F.col("n_chars").cast("double") / _uniform("ws|")
    w = Window.partitionBy("source").orderBy(
        F.col("priority").desc(), F.col("doc_id")
    )
    return (
        df.select("doc_id", "source", "n_chars", priority.alias("priority"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _WS_K)
        .drop("rn")
    )


_MIX_CE = CE_HASH64_SQL.format(h="md5('mix|'||CAST(doc_id AS VARCHAR))")
_MIX_U = (
    f"CAST(((({_MIX_CE}) % {_TWO_53}) + {_TWO_53}) % {_TWO_53} + 1 AS DOUBLE)"
    f" / {_TWO_53}"
)
_MIX_FRACTION = 0.6  # global keep target: 60% of the corpus


@query(
    "mix1_temperature_mix",
    oracle=f"""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(round(sqrt(count(*)), 6) AS DECIMAL(18,6)) AS w
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(w) AS DOUBLE) AS w_total,
             CAST(SUM(n_docs) AS DOUBLE) AS n_total
      FROM c
    ),
    rates AS (
      SELECT c.source, c.n_docs,
             least(1.0,
                   (({_MIX_FRACTION} * tot.n_total)
                    * (CAST(c.w AS DOUBLE) / tot.w_total))
                   / CAST(c.n_docs AS DOUBLE)) AS keep_rate
      FROM c, tot
    )
    SELECT d.doc_id, d.source, r.keep_rate
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE ({_MIX_U}) < r.keep_rate
    """,
)
def mix1_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the multinomial-smoothing rule
    of multilingual/multi-source pretraining, e.g. mC4's alpha
    sampling): per-source keep rates ∝ count^alpha, renormalized to a
    global keep target, applied as a deterministic per-doc Bernoulli.
    alpha is fixed at 0.5 so the power is ``sqrt`` — IEEE-correctly
    rounded in every engine, unlike ``pow`` — and the per-source
    weights are rounded to DECIMAL(18,6) before the (exact, decimal)
    total so the normalization is order-independent.

    Scale: the rate table is one tiny aggregate (n_sources rows)
    broadcast back onto the corpus; the keep decision is a pure
    per-row filter — one map-side-combined groupBy is the only
    shuffle, and adding docs never flips existing decisions (the
    incremental-pipeline property), though rates themselves drift as
    counts grow — pin them per training run in production."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.sqrt(F.count("*")), 6).cast("decimal(18,6)").alias("w"),
    )
    tot = counts.agg(
        F.sum("w").cast("double").alias("w_total"),
        F.sum("n_docs").cast("double").alias("n_total"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            (
                (F.lit(_MIX_FRACTION) * F.col("n_total"))
                * (F.col("w").cast("double") / F.col("w_total"))
            )
            / F.col("n_docs").cast("double"),
        ).alias("keep_rate"),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(_uniform("mix|") < F.col("keep_rate"))
        .select("doc_id", "source", "keep_rate")
    )
