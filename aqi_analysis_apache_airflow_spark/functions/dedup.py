"""Near-duplicate detection over the documents table (SURVEY.md §7
phase 5; the training-data-pipeline surface the 100 TB deployment
needs).

Three families, all shuffle-conscious:

- **n-gram Jaccard** (exact): explode distinct word shingles, self-join
  on the shingle, count intersections. One shuffle on the shingle key;
  a hot shingle fans out quadratically, so callers cap per-shingle
  document frequency (stop-shingle pruning — standard practice, and at
  100 TB non-negotiable).
- **MinHash + LSH** (approximate): k independent min-hashes per doc
  from one xxhash64 per (shingle, seed); band the signature and
  self-join on (band, band-hash). Collisions are candidates; the
  signature-agreement rate estimates Jaccard. Shuffle is on band
  buckets — bounded by design, no quadratic blowup.
- **SimHash** (approximate, Hamming space): 64-bit sign-aggregated
  token hashes; near-dups collide on 16-bit bands (Hamming ≤ 3 within
  64 bits ⇒ at least one of 4 bands equal, by pigeonhole).

Everything is pure column expressions — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\S+"


def tokens(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)


def ce_hash64(col: Column) -> Column:
    """Cross-engine 64-bit hash: the first 16 hex chars of ``md5``,
    reinterpreted as a signed 64-bit integer (high and low 32-bit
    halves assembled with bitwise shift/or — no overflow-checked
    arithmetic, so it is safe under ANSI mode).

    Slower than ``xxhash64`` but bit-identical in any engine that has
    ``md5`` (DuckDB, Trino, Postgres): this is the hash family that
    makes the simhash/minhash surfaces oracle-VERIFIABLE instead of
    merely unit-tested. Production paths keep xxhash64; the
    ``*_md5``-family registry queries use this.
    """
    hx = F.md5(col)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


# The DuckDB-side twin of ce_hash64, as a format template over a hex-
# string SQL expression. Signed reinterpretation: DuckDB's << overflow-
# checks BIGINT, so the high half is re-biased arithmetically instead.
CE_HASH64_SQL = (
    "((('0x'||substr({h},1,8))::BIGINT"
    " - CASE WHEN ('0x'||substr({h},1,8))::BIGINT >= 2147483648"
    "   THEN 4294967296 ELSE 0 END) * 4294967296"
    " + ('0x'||substr({h},9,8))::BIGINT)"
)


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles; fewer than k tokens → empty array
    (guarded: Spark's ``sequence`` would happily count backwards).

    ``slice`` + ``array_join`` instead of per-element ``get`` lambdas:
    higher-order lambdas run interpreted, and the nested-get version
    measured ~4× slower on the bench corpus.
    """
    toks = tokens(text)
    n = F.size(toks)
    shingle_at = lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
    return F.when(
        n >= k,
        F.array_distinct(F.transform(F.sequence(F.lit(0), n - k), shingle_at)),
    ).otherwise(F.array().cast("array<string>"))


def exploded_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, shingle) pairs. The shingle transform is the CPU-heavy part
    of every near-dup pipeline, so parallelize it across cores even
    when the input arrives as one split (the bench corpus is a single
    row group — without this the whole explode runs on one task)."""
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        docs.select(id_col, text_col)
        .repartition(n_part)
        .select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), k)).alias("shingle"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    max_doc_freq: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard over k-word shingle sets for every candidate pair.

    ``max_doc_freq`` drops shingles shared by more than that many docs
    (stop-shingles): they contribute little discrimination but dominate
    the self-join cost. Output: doc_a < doc_b, jaccard.

    Two physical strategies for the same logical result:

    - capped: aggregate ONCE to (shingle → sorted doc set), filter by
      set size, and enumerate pairs from the bounded array (≤ C(cap,2)
      per shingle). The expensive shingle explode runs exactly once.
    - uncapped: shingle-keyed self-join — a hot shingle's pair list
      may not fit in one array, so fan-out must stream through the
      join. (Pathological on low-entropy corpora; that's what the cap
      is for.)
    """
    sh = exploded_shingles(docs, id_col, text_col, k)
    if max_doc_freq is not None:
        grouped = (
            sh.groupBy("shingle")
            .agg(F.array_sort(F.collect_set(id_col)).alias("docs"))
            .filter(F.size("docs") <= max_doc_freq)
        )
        capped = grouped.select(F.explode("docs").alias(id_col))
        sizes = capped.groupBy(id_col).agg(F.count("*").alias("set_size"))
        pair_structs = F.expr(
            "flatten(transform(docs, (x, i) -> "
            "transform(slice(docs, i + 2, size(docs)), "
            "y -> struct(x AS doc_a, y AS doc_b))))"
        )
        inter = (
            grouped.select(F.explode(pair_structs).alias("p"))
            .select("p.doc_a", "p.doc_b")
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
        a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
        b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"))
        )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def exact_jaccard_for_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact k-word-shingle Jaccard for a GIVEN set of candidate pairs
    (columns ``doc_a``, ``doc_b``) — the verification stage after an
    approximate candidate generator (LSH bands, simhash).

    Scale shape: shingles are computed only for docs that appear in
    some candidate pair (semi-join pushdown), and the intersection is
    counted by fanning each pair out over doc_a's shingles and probing
    doc_b's — cost is O(Σ pair shingle sizes), linear in candidate
    volume, never corpus-quadratic.
    """
    cand_ids = (
        pairs.select(F.col("doc_a").alias(id_col))
        .union(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sh = exploded_shingles(
        docs.join(cand_ids, id_col, "left_semi"), id_col, text_col, k
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    sh_a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        pairs.select("doc_a", "doc_b")
        .join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 32,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """One row per doc with ``sig: array<bigint>`` of length n_hashes.

    Hash families (both deterministic across runs and partitionings):

    - ``"xxhash64"`` (default): ``xxhash64(shingle, seed=i)`` — the
      fast production path.
    - ``"md5"``: :func:`ce_hash64` over ``"{i}|" || shingle`` — ~3×
      slower, but reproducible in any md5-equipped engine, which lets
      the DuckDB oracle recompute the exact signatures (see
      ``d3m_minhash_md5``).

    Aggregation is a groupBy(doc) of per-shingle minima: map-side
    combine collapses most of the data before the single shuffle.
    """
    if hash_family == "xxhash64":
        hash_i = lambda i: F.xxhash64(F.col("shingle"), F.lit(i))
    elif hash_family == "md5":
        hash_i = lambda i: ce_hash64(F.concat(F.lit(f"{i}|"), F.col("shingle")))
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    sh = exploded_shingles(docs, id_col, text_col, k)
    mins = sh.groupBy(id_col).agg(
        *[F.min(hash_i(i)).alias(f"h{i}") for i in range(n_hashes)]
    )
    return mins.select(
        id_col, F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 8,
    id_col: str = "doc_id",
    n_hashes: int = 32,
    band_key: str = "hash",
    include_estimate: bool = True,
) -> DataFrame:
    """Band the signature and self-join on the band bucket.

    Output: doc_a < doc_b [, est_jaccard (fraction of agreeing
    signature components) unless ``include_estimate=False``]. The join
    key is the band bucket, so work scales with bucket occupancy, not
    the corpus square.

    ``n_hashes`` is the signature length and must match what
    :func:`minhash_signatures` produced — passed as a parameter so plan
    construction never triggers a Spark action (a ``first()`` here
    would execute the whole minhash aggregation once just to learn the
    array length, then recompute it in the main query).

    ``band_key="hash"`` joins on a 32-bit hash of the band slice —
    smallest shuffle payload, the production default (a hash collision
    adds a spurious CANDIDATE, never a wrong result, since candidates
    are verified downstream). ``band_key="slice"`` joins on the raw
    slice array — zero collisions, which is what the oracle-verified
    md5-family query needs for exact parity with DuckDB.

    ``include_estimate=False`` skips re-attaching signatures entirely —
    the right mode when candidates feed an exact verifier anyway
    (see :func:`exact_jaccard_for_pairs`), saving two joins.
    """
    rows_per_band = n_hashes // bands
    if band_key == "hash":
        key_of = lambda sl: F.hash(sl)
    elif band_key == "slice":
        key_of = lambda sl: sl
    else:
        raise ValueError(f"unknown band_key {band_key!r}")
    banded = signatures.select(
        id_col,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        key_of(
                            F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                        ).alias("band_hash"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "sig", "b.band_id", "b.band_hash")
    # candidate pairs are deduped as BARE id pairs — carrying the
    # signature arrays through the band join + dropDuplicates shuffle
    # multiplies shuffle volume ~30× (measured 17s → 4s at sf0.1).
    # Signatures re-attach afterwards WITHOUT a broadcast hint: the
    # signature table is O(corpus) and would not fit in executor
    # memory at 100 TB — AQE broadcasts it when it is actually small
    # and falls back to a shuffle join when it isn't.
    a = banded.select(F.col(id_col).alias("doc_a"), "band_id", "band_hash")
    b = banded.select(F.col(id_col).alias("doc_b"), "band_id", "band_hash")
    pairs = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    if not include_estimate:
        return pairs
    sig_a = signatures.select(
        F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a")
    )
    sig_b = signatures.select(
        F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b")
    )
    pairs = pairs.join(sig_a, "doc_a").join(sig_b, "doc_b")
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    n = F.size(F.col("sig_a"))
    return pairs.select(
        "doc_a", "doc_b", (agree.cast("double") / n).alias("est_jaccard")
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash: per-token :func:`ce_hash64`, each bit votes ±1,
    the sign of the per-bit sum becomes the fingerprint bit.
    Array-native fold — no explode, no shuffle.

    Token hash is the md5-derived cross-engine family (not xxhash64)
    so the DuckDB oracle can recompute identical fingerprints — the
    whole simhash surface is hash-match-verified, not just unit-tested
    (one md5 per token; simhash is outside the bench hot path).
    """
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: ce_hash64(t))
    # 1<<63 overflows a signed long literal; shiftleft stays in-type
    bit = lambda i: F.shiftleft(F.lit(1).cast("long"), i)
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(bit(i)) != 0, 1).otherwise(-1),
        )
        for i in range(64)
    ]
    out = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        out = out + F.when(v > 0, bit(i)).otherwise(F.lit(0).cast("long"))
    return out


def simhash_band_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs by 16-bit SimHash bands (pigeonhole:
    Hamming ≤ 3 over 64 bits ⇒ ≥1 of 4 bands identical), verified with
    the exact Hamming distance.

    Token-less docs are excluded up front: their fingerprint would be
    the degenerate all-zeros value (every empty doc "matches" every
    other), and the exclusion keeps the output identical to the
    oracle's token-driven SQL, where such docs never produce rows.
    """
    sh = docs.filter(F.size(tokens(F.col(text_col))) > 0).select(
        F.col(id_col), simhash64(F.col(text_col)).alias("simhash")
    )
    banded = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.band_id", "b.band_val")
    a = banded.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "band_id", "band_val"
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "band_id", "band_val"
    )
    pairs = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
