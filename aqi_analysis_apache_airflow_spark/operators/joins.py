"""Joins (reference ops J1-J5, SURVEY.md §2.4).

All reference joins are equi-joins with at most two keys and tiny
dimension sides (states ≈ 51 rows, counties ≈ 3,144 rows — far below
any broadcast threshold). The helpers here make the broadcast intent
explicit so the plan is stable even when statistics are missing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame, dim: DataFrame, keys: list[str] | str, how: str = "inner"
) -> DataFrame:
    """J2/J3/J4/J5: fact ⋈ small dimension, broadcast the dim side.

    At 100 TB the fact side never moves: a broadcast hash join streams
    fact partitions against an in-memory copy of the dim — zero
    shuffle. Used for counties⋈state_nds (``dags/etl/stage_to_nds.py:105``),
    state⋈county (``:209``), AQI⋈dims composite (``:210``).
    """
    return fact.join(F.broadcast(dim), on=keys, how=how)


def full_outer_union_keys(
    left: DataFrame, right: DataFrame, key: str
) -> DataFrame:
    """J1: the reference's full-outer merge of state name sets
    (``dags/etl/stage_to_nds.py:44``) — a key-universe union with
    presence on either side preserved."""
    return left.join(right, on=key, how="full_outer")
