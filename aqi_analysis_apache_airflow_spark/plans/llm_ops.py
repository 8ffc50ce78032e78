"""Training-data curation operators beyond the dedup/ANN families:
deterministic stratified sampling, sequence packing, and cross-source
canonical dedup — the sampling/packing stages of an LLM data pipeline
(SURVEY.md §7 phase 5 extension; no reference counterpart — the
reference is a pandas ETL, these are the mandated extended surface).

All three are bit-exact oracle-backed: randomness is replaced by the
md5-derived cross-engine hash (``ce_hash64``), so DuckDB replays every
sampling decision. The production variant swaps ``xxhash64`` in for
md5 with no other change (the d3/sim_ivf precedent).

Scale notes: every operator here is one narrow projection + at most
one shuffle (the packing window / dedup groupBy); sampling is a pure
per-row filter with NO shuffle at all — rates are literals in the
plan, so Catalyst pushes the hash filter into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dedup import CE_HASH64_SQL, ce_hash64
from .registry import load, query

#: per-lang keep rates in permille — the curation knob: oversample
#: high-resource strata, downsample the rest. Deterministic per doc.
_LANG_RATES = {"en": 900, "es": 600, "fr": 300}
_DEFAULT_RATE = 150

_SAMP_CE = CE_HASH64_SQL.format(h="md5('samp|'||CAST(doc_id AS VARCHAR))")
_SAMP_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _LANG_RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)


@query(
    "samp1_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE ((({_SAMP_CE}) % 1000) + 1000) % 1000 < {_SAMP_CASE}
    """,
)
def samp1_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by language: each doc is kept
    iff ``hash(doc_id) mod 1000`` falls under its stratum's permille
    rate. Unlike ``sampleBy`` (seeded RNG, engine-private), the hash
    rule is a pure function of the row — reproducible across engines
    (bit-exact oracle), stable under corpus growth (adding docs never
    flips existing decisions — the property incremental pipelines
    need), and shuffle-free: the filter is a narrow projection pushed
    to the scan."""
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in reversed(_LANG_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    key = F.pmod(
        ce_hash64(F.concat(F.lit("samp|"), F.col("doc_id").cast("string"))),
        F.lit(1000),
    )
    return (
        load(spark, sf_dir, "documents")
        .filter(key < rate)
        .select("doc_id", "lang", "source", "n_chars")
    )


_SHARD_CE = CE_HASH64_SQL.format(h="md5('shard|'||CAST(doc_id AS VARCHAR))")
_PACK_BUDGET = 2048
_N_SHARDS = 8


@query(
    "pack1_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(((({_SHARD_CE}) % {_N_SHARDS}) + {_N_SHARDS}) % {_N_SHARDS}
                  AS BIGINT) AS shard,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    p AS (
      SELECT doc_id, shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS stream_offset
      FROM t
    )
    SELECT doc_id, shard, n_tokens, stream_offset,
           CAST(floor(stream_offset / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id
    FROM p
    """,
)
def pack1_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assigning documents to fixed-token-budget
    training bins. First-fit packing is inherently sequential, so the
    scalable form is PREFIX-SUM BINNING: shard docs by hash (each
    shard is an independent packing stream = one window partition, so
    the sort is per-shard, never global), order within the shard by
    doc_id, and bin = exclusive-prefix-token-count div budget. A doc
    may straddle a bin boundary — at training time that's exactly the
    cross-document attention boundary a packed batch has anyway.
    One shuffle (the window partition), all-JVM expressions."""
    from ..functions.dedup import tokens

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.pmod(
            ce_hash64(F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))),
            F.lit(_N_SHARDS),
        ).alias("shard"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return docs.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("stream_offset"),
    ).withColumn(
        "bin_id", F.floor(F.col("stream_offset") / _PACK_BUDGET).cast("long")
    )


# normalized-content key: lower, non-alphanumerics → space, collapse
# runs, trim — the same canonicalization family as t7_text_clean
_NORM_SPARK = lambda c: F.trim(
    F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " "), " +", " ")
)
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)


@query(
    "d7_cross_source_dedup",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, source, md5({_NORM_SQL}) AS content_key
      FROM documents
    )
    SELECT content_key,
           arg_min(doc_id, source || '|' || lpad(CAST(doc_id AS VARCHAR), 12, '0'))
             AS keep_doc_id,
           arg_min(source, source || '|' || lpad(CAST(doc_id AS VARCHAR), 12, '0'))
             AS keep_source,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM n GROUP BY content_key
    """,
)
def d7_cross_source_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source canonical dedup: when the same (normalized)
    content appears in several sources, keep ONE canonical copy from
    the preferred source — the multi-crawl consolidation step that
    runs after near-dup detection. Preference = lexicographic source
    order, doc_id tiebreak, encoded as a single string key so both
    engines' arg_min agree (DuckDB's arg_min takes no composite key;
    the lpad makes the numeric tiebreak sort textually). keep_source
    comes from the SAME arg_min key as keep_doc_id — a separate
    min(source) could disagree when one source name is a prefix of
    another ('web2|...' < 'web|...' since '|' sorts above
    alphanumerics), yielding an inconsistent (doc, source) pair. One
    hash groupBy on the content key, map-side combined; the md5
    content key (not the raw text) is what shuffles — bounded-width
    rows at any corpus scale."""
    n = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(_NORM_SPARK(F.col("text"))).alias("content_key"),
    )
    pref = F.concat(
        F.col("source"), F.lit("|"), F.lpad(F.col("doc_id").cast("string"), 12, "0")
    )
    return n.groupBy("content_key").agg(
        F.min_by("doc_id", pref).alias("keep_doc_id"),
        F.min_by("source", pref).alias("keep_source"),
        F.count("*").alias("n_copies"),
    )


def _pagerank_oracle(n_iter: int = 5) -> str:
    """Unroll the PageRank recurrence as chained CTEs — DuckDB replays
    the exact FIXED-POINT integer recurrence of
    :func:`...functions.graph.pagerank` (integral divides, BIGINT
    sums, rational damping), so any iteration count stays
    bit-identical with no float anywhere."""
    head = """
    WITH e AS (
      SELECT DISTINCT 'c'||CAST(o.o_custkey AS VARCHAR) AS src,
                      's'||CAST(l.l_suppkey AS VARCHAR) AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
    ed AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d USING (src)),
    r0 AS (
      SELECT node,
             CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS rank_e12
      FROM nodes
    )"""
    step = """,
    r{k1} AS (
      SELECT n.node,
             CAST((150000000000 // (SELECT n FROM nn))
                  + (85 * COALESCE(m.mass, 0)) // 100 AS BIGINT) AS rank_e12
      FROM nodes n LEFT JOIN (
        SELECT ed.dst AS node, SUM(r.rank_e12 // ed.deg) AS mass
        FROM ed JOIN r{k} r ON ed.src = r.node
        GROUP BY 1
      ) m USING (node)
    )"""
    body = "".join(step.format(k=k, k1=k + 1) for k in range(n_iter))
    return (
        head
        + body
        + f"\n    SELECT node, rank_e12 FROM r{n_iter}"
    )


@query("gr1_pagerank", oracle=_pagerank_oracle(5))
def gr1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 iterations, damping 0.85) over the customer→supplier
    order graph — link-authority scoring, the iterative-algorithm
    family beyond connected components (rank the canonical doc of a
    dup cluster, score crawl frontiers, weight sources). Node ids are
    domain-prefixed ('c…'/'s…') so the two key spaces can't collide.

    Scale shape (see :func:`...functions.graph.pagerank`): per round
    one groupBy over the persisted degree-annotated edge list + one
    label join; previous round's cache released eagerly; nothing but
    two control-plane scalars (node count, convergence none — fixed
    iterations) ever reaches the driver. The whole recurrence is
    FIXED-POINT BIGINT arithmetic (ranks in units of 1e-12, integral
    divides, 85/100 rational damping) — no float ever enters, so the
    oracle's unrolled-CTE replay hash-matches bit-for-bit at any
    scale (a double formulation broke at sf0.1 on Spark's
    shortest-decimal vs DuckDB's binary rounding of the 12th digit)."""
    from ..functions.graph import pagerank

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(e, n_iterations=5, damping_pct=85)
    return ranks.select("node", "rank_e12")
