"""Skew mitigation: salted joins.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime by splitting oversized partitions. Salting is the
explicit fallback for the pathological case AQE can't fix: one join
key so hot that a single task would still own it after splitting
(think the empty-string document hash, or a null-like sentinel key
holding 10% of 100 TB).

``salted_join`` replicates the (small) right side once per salt value
and scatters the left side's hot keys across ``n_salts`` partitions —
turning one straggler task into ``n_salts`` even ones at the cost of
an ``n_salts``× blowup of the right side. Use it when the right side
is broadcast-size but the left is skewed; for two large skewed sides,
isolate the hot keys and union a broadcast join for just those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side
    replicated across ``n_salts`` salt values. Result is identical to
    ``left.join(right, keys, how)`` for inner/left-shaped joins ONLY:
    a right or full outer join would emit each unmatched right key
    once per salt replica — refuse those instead of silently
    multiplying rows."""
    allowed = {
        "inner",
        "cross",
        "left",
        "leftouter",
        "left_outer",
        "semi",
        "leftsemi",
        "left_semi",
        "anti",
        "leftanti",
        "left_anti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not supported — right-side "
            "replication is only correct for inner/left-shaped joins "
            f"({sorted(allowed)}); for a skewed right/full outer join, "
            "salt the other side or isolate hot keys explicitly"
        )
    # salt must vary WITHIN a key (that's the whole point — scatter the
    # hot key), so derive it per-row, never from the key columns
    salted_left = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated_right = right.select("*", salts)
    out = salted_left.join(replicated_right, [*keys, "__salt"], how)
    return out.drop("__salt")
