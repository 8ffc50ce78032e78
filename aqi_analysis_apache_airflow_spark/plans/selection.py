"""Round-7 data-selection, fusion, and diversity operators: hybrid
reciprocal-rank fusion (rr1), corpus distinct-n diversity (div1), and
friends added over the round.

No reference counterpart (the reference is a 479-line pandas ETL —
``dags/etl/*.py``); these extend the training-data-pipeline surface a
100 TB deployment needs, following the established design rules
(see ``plans/curation.py`` / ``plans/retrieval.py``):

- every surfaced double is produced by the SAME sequence of IEEE
  operations in Spark and the DuckDB oracle (sums route through
  DECIMAL / exact integers; one-shot mul/div stays raw);
- ranking always ends in a unique tiebreak key;
- plans are shuffle-minimal and documented for the 100 TB case.

Public sources: Cormack, Clarke & Buettcher SIGIR 2009 (reciprocal
rank fusion, k=60); Li et al. NAACL 2016 (distinct-n diversity);
Robertson & Zaragoza 2009 (the BM25 lexical arm, shared with ret1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dedup import tokens
from ..functions.similarity import cosine
from .registry import load, query
from .retrieval import _BM25_CTES, bm25_doc_scores

# --------------------------------------------------------------------------
# rr1 — hybrid retrieval via reciprocal rank fusion (BM25 ⊕ cosine)
# --------------------------------------------------------------------------

_RRF_K = 60  # Cormack et al.'s constant — dampens the head of each list
_RRF_POOL = 50  # per-ranker candidate pool
_RRF_TOPK = 20

#: exact cosine ranker against the vec_id=0 query — the semantic arm.
#: Same decimal-dot + 6dp-round recipe as sim_cosine_topk
#: (plans/extended.py), reduced to (id, rank) for fusion.
_SEM_CTES = f"""
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sem_pairs AS (
  SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qv) AS y
  FROM embeddings e, q
  WHERE e.vec_id <> 0
),
sem_dots AS (
  SELECT vec_id,
         SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,14))) AS dot,
         SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,14))) AS na,
         SUM(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,14))) AS nb
  FROM sem_pairs GROUP BY vec_id
),
sem_pool AS (
  SELECT vec_id,
         round(CAST(dot AS DOUBLE)
           / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) AS sim
  FROM sem_dots
  WHERE na > 0 AND nb > 0
  ORDER BY sim DESC, vec_id
  LIMIT {_RRF_POOL}
),
sem AS (
  SELECT vec_id AS doc_id,
         CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INTEGER)
           AS sem_rank
  FROM sem_pool
)"""

_RR1_SQL = f"""
WITH {_BM25_CTES},
lex_pool AS (
  SELECT doc_id, score FROM bm
  ORDER BY score DESC, doc_id
  LIMIT {_RRF_POOL}
),
lex AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
           AS lex_rank
  FROM lex_pool
),
{_SEM_CTES}
SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
       lex.lex_rank AS lex_rank,
       sem.sem_rank AS sem_rank,
       COALESCE(1.0 / ({_RRF_K}.0 + CAST(lex.lex_rank AS DOUBLE)), 0.0)
         + COALESCE(1.0 / ({_RRF_K}.0 + CAST(sem.sem_rank AS DOUBLE)), 0.0)
         AS rrf_score
FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT {_RRF_TOPK}
"""


@query("rr1_rank_fusion", oracle=_RR1_SQL)
def rr1_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal rank fusion (Cormack–Clarke–
    Buettcher 2009, k=60) of a lexical BM25 ranker and a semantic
    cosine ranker — the standard hybrid-search recipe for RAG corpus
    slicing, fusing rankers whose scores live on incomparable scales
    by rank alone. Docs surfaced by only one ranker score with the
    other arm at 0 (the published convention).

    Scale shape: each arm independently reduces the corpus to a
    bounded ``_RRF_POOL``-row ranked list via TakeOrderedAndProject
    (per-partition heap + driver merge — no global sort, no corpus
    shuffle beyond the arms' own aggregations, see ret1 /
    sim_cosine_topk for those). Rank assignment windows run on the
    pooled ≤50-row lists (single partition over a bounded list — NOT
    over the corpus), and the fusion join is a full-outer of two
    bounded lists. At 100 TB nothing here grows with the corpus.

    Determinism: BM25 scores are the ret1 decimal-summed form; cosine
    is the 6dp-rounded decimal-dot form; ranks are integers; the RRF
    score is two IEEE divisions and one addition with fixed operand
    order — bit-identical in any engine. Ties break on doc_id."""
    lex = (
        bm25_doc_scores(spark, sf_dir)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_RRF_POOL)
        .withColumn(
            "lex_rank",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "doc_id"))
            .cast("int"),
        )
        .select("doc_id", "lex_rank")
    )
    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    sem = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("embedding"), F.col("qv")).alias("sim"),
        )
        .filter(F.col("sim").isNotNull())
        .orderBy(F.col("sim").desc(), "doc_id")
        .limit(_RRF_POOL)
        .withColumn(
            "sem_rank",
            F.row_number()
            .over(Window.orderBy(F.col("sim").desc(), "doc_id"))
            .cast("int"),
        )
        .select("doc_id", "sem_rank")
    )
    arm = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col(r).cast("double")), F.lit(0.0)
    )
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            (arm("lex_rank") + arm("sem_rank")).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(_RRF_TOPK)
    )


# --------------------------------------------------------------------------
# div1 — corpus diversity: distinct-n ratios per source
# --------------------------------------------------------------------------

_DIV1_SQL = """
WITH toks AS (
  SELECT source, regexp_extract_all(text, '\\S+') AS t FROM documents
),
uni AS (
  SELECT source, unnest(t) AS g FROM toks
),
big AS (
  SELECT source, t[i] || ' ' || t[i+1] AS g
  FROM toks, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
),
uni_gc AS (SELECT source, g, count(*) AS c FROM uni GROUP BY 1, 2),
big_gc AS (SELECT source, g, count(*) AS c FROM big GROUP BY 1, 2),
uni_s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS distinct_unigrams,
         CAST(sum(c) AS BIGINT) AS total_unigrams
  FROM uni_gc GROUP BY 1
),
big_s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS distinct_bigrams,
         CAST(sum(c) AS BIGINT) AS total_bigrams
  FROM big_gc GROUP BY 1
),
nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1)
SELECT nd.source,
       nd.n_docs,
       COALESCE(u.total_unigrams, 0) AS total_unigrams,
       COALESCE(u.distinct_unigrams, 0) AS distinct_unigrams,
       CAST(COALESCE(u.distinct_unigrams, 0) AS DOUBLE)
         / nullif(CAST(COALESCE(u.total_unigrams, 0) AS DOUBLE), 0.0)
         AS distinct_1,
       COALESCE(b.total_bigrams, 0) AS total_bigrams,
       COALESCE(b.distinct_bigrams, 0) AS distinct_bigrams,
       CAST(COALESCE(b.distinct_bigrams, 0) AS DOUBLE)
         / nullif(CAST(COALESCE(b.total_bigrams, 0) AS DOUBLE), 0.0)
         AS distinct_2
FROM nd
LEFT JOIN uni_s u ON u.source = nd.source
LEFT JOIN big_s b ON b.source = nd.source
"""


def _bigrams(t):
    """Adjacent-token bigram list via two shifted slice views — the
    qc2 zip_with recipe (no per-element re-evaluation of the token
    expression). <2 tokens (or NULL text) → empty list, matching the
    oracle's empty range()."""
    n = F.size(t)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


@query("div1_distinct_ngrams", oracle=_DIV1_SQL)
def div1_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-n lexical diversity (Li et al. 2016's
    distinct-1/distinct-2): the share of a source's token (and
    adjacent-bigram) stream made of unique grams. Low distinct-n
    flags templated / machine-generated / boilerplate-heavy sources
    before they flood a training mix; the ratio pairs with drift1's
    length monitoring as a standing per-ingest diversity dashboard.

    Scale shape: two exploded gram streams, each reduced by ONE
    map-side-combined groupBy on (source, gram) — the only shuffles
    that see corpus-sized data; per-partition combining collapses the
    stream to its distinct grams before the wire. The per-source
    rollups and the three-way source join are |sources|-sized
    (broadcast). Exact distinct counts are the point here (the ratio
    is a published metric); a corpus whose distinct-gram set itself
    overwhelms the shuffle swaps in the hll1 sketch for the distinct
    term with no other change.

    Determinism: counts are exact BIGINTs; each ratio is ONE IEEE
    division (NULL for a gramless source — nullif on both engines,
    no ANSI divide-by-zero)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("source", tokens(F.col("text")).alias("t"))

    def roll(grams, d_name, t_name):
        return (
            grams.groupBy("source", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("source")
            .agg(
                F.count("*").alias(d_name),
                F.sum("c").alias(t_name),
            )
        )

    uni_s = roll(toks.select("source", F.explode("t").alias("g")), "du", "tu")
    big_s = roll(
        toks.select("source", F.explode(_bigrams(F.col("t"))).alias("g")),
        "db",
        "tb",
    )
    nd = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    z = F.lit(0).cast("long")
    tu = F.coalesce(F.col("tu"), z)
    du = F.coalesce(F.col("du"), z)
    tb = F.coalesce(F.col("tb"), z)
    db = F.coalesce(F.col("db"), z)

    def ratio(d, t):
        return d.cast("double") / F.nullif(t.cast("double"), F.lit(0.0))

    return (
        nd.join(uni_s, "source", "left_outer")
        .join(big_s, "source", "left_outer")
        .select(
            "source",
            "n_docs",
            tu.alias("total_unigrams"),
            du.alias("distinct_unigrams"),
            ratio(du, tu).alias("distinct_1"),
            tb.alias("total_bigrams"),
            db.alias("distinct_bigrams"),
            ratio(db, tb).alias("distinct_2"),
        )
    )
