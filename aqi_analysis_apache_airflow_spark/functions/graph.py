"""Iterative graph algorithms over edge-list DataFrames.

:func:`connected_components` (in :mod:`.dedup`) labels duplicate
clusters; PageRank here ranks them — e.g. picking the canonical doc of
a near-dup cluster by link authority instead of smallest-id, or
scoring crawl frontiers. Same execution contract as components: each
iteration is one groupBy + one join over the edge list, per-round
persist with eager release of the previous round, driver loop only for
the fixed iteration count (the sanctioned iterative-algorithm shape —
no data ever reaches the driver).

Determinism: the recurrence runs in FIXED-POINT integer arithmetic —
ranks are BIGINT multiples of 1e-12, every division is integral, and
the damping factor is a rational (85/100). No float touches any
intermediate, so there is nothing to round and nothing engine-specific
to diverge: any engine that replays the integer recurrence (the DuckDB
oracle unrolls it as chained CTEs) matches bit-for-bit. The earlier
double-based formulation failed exactly here — Spark rounds a double
via its shortest decimal representation while DuckDB rounds the binary
value, and at one-in-a-few-thousand rank values the 12th digit split.
Floats only appear on the way OUT, if a caller casts for display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: ranks are integer multiples of 1e-12
ONE_E12 = 10**12


def pagerank(
    edges: DataFrame,
    n_iterations: int = 5,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list, fixed iteration count.

    Returns (node, rank_e12: bigint) with rank_e12 ≈ rank·1e12. Nodes
    = every id appearing as src or dst; dangling nodes (no out-edges)
    contribute nothing per round (the classic simplification — their
    mass leaves the system, keeping the recurrence local so one
    groupBy per round suffices at any scale; the normalized variant
    redistributes a 1-row aggregate and costs one extra broadcast join
    per round). ``damping_pct`` is an integer percentage so the damp
    step stays integral.
    """
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # edge list annotated with its source's out-degree, reused verbatim
    # every round — persist once, HASH-PARTITIONED ON THE JOIN KEY.
    # The degree attaches via an unordered WINDOW over partitionBy(src)
    # rather than groupBy + join-back + repartition: the window's own
    # exchange IS the hash(src) layout the cache needs, so the edge
    # list crosses the wire exactly once (the groupBy+join form cost
    # three edge-list exchanges, and letting AQE broadcast the degree
    # table instead silently left the cache in the upstream layout —
    # fine while the rank stream is broadcast-able, fatal at graph
    # scale where each round would then re-exchange every edge). A
    # skewed hub src buffers its out-edges in one window partition —
    # the same skew exposure the join form had on its build key.
    # Cached as hashpartitioning(src, conf partitions), each round's
    # rank join reuses the layout and only the (much smaller) rank
    # stream shuffles.
    ed = (
        e.withColumn("deg", F.count("*").over(Window.partitionBy("src")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # node list DERIVED FROM the cached ed (the deg join drops no edge
    # row — every src has deg >= 1), not from the raw edge expression:
    # building it independently would run the upstream edge plan (for
    # gr1, a lineitem⋈orders join + distinct) a second time just to
    # count nodes
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    n = nodes.count()  # control-plane scalar: the teleport denominator
    teleport = (ONE_E12 * (100 - damping_pct) // 100) // n
    init = ONE_E12 // n

    # The recurrence is LINEAR — each round's ranks feed exactly one
    # consumer (the next round's contribution join), so no intermediate
    # is ever read twice and the whole n-round chain can stay one lazy
    # plan: one job submission, full stage pipelining, AQE re-planning
    # each exchange with runtime stats. (Materializing every round, the
    # connected-components shape, is only needed when a round's output
    # fans out — dropping it cut gr1's warm bench time 9.5s → ~7s; the
    # one-off plan-compilation cost of the deeper tree lands on the
    # uncounted warmup pass.)
    # Only `ed` and `nodes` are reused every round and stay persisted.
    # Round-7 A/B closed the "try per-round localCheckpoint" question
    # for good: at sf0.1 under the bench harness the lazy chain
    # measured 3.76/3.05 s vs 3.59/3.79 s with an eager
    # localCheckpoint per round — identical within run noise, i.e.
    # the recurrence is floor-bound on its two per-round exchanges,
    # not on plan depth. The lazy form stays: localCheckpoint blocks
    # are unrecoverable on executor loss, so at cluster scale the
    # lazy/AQE plan (or a reliable checkpoint to durable storage for
    # 50+-round runs) is the correct shape anyway.
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_e12"))
    zero_mass = nodes.select("node", F.lit(0).cast("long").alias("c"))
    for _ in range(n_iterations):
        # one join + one groupBy per round: instead of left-outer
        # joining the node list back to re-admit sink nodes (a second
        # join per round), every node contributes a zero row into the
        # same aggregation — the union is narrow and the groupBy was
        # already there
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                # integral divide: the per-edge mass, exact in any engine
                F.expr("rank_e12 div deg").alias("c"),
            )
            .unionAll(zero_mass)
            .groupBy("node")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = contrib.select(
            "node",
            (
                F.lit(teleport).cast("long")
                + F.expr(f"({damping_pct} * mass) div 100")
            ).alias("rank_e12"),
        )
    # ed/nodes stay cached for the (lazy) returned plan; the session
    # cache-clear between registry queries releases them
    return ranks
