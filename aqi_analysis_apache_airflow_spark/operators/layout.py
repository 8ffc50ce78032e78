"""Z-order write layout: multi-dimensional data clustering for
min/max-stat file skipping.

A table range-partitioned on one column prunes beautifully on that
column and not at all on any other. Interleaving the bits of TWO
columns' normalized ranks (the Z-/Morton curve) yields a single sort
key whose contiguous ranges are small rectangles in (a, b) space — so
every written file covers a narrow band of BOTH columns, and a reader
filtering on either one skips most files on footer stats alone. This
is the public technique behind Delta/Iceberg's OPTIMIZE ZORDER,
implemented here as plain column expressions over a vanilla parquet
write (no table-format dependency).

Scale shape: the min/max bounds come from a 1-row aggregate broadcast
onto the corpus (no global sort, no sampling pass); the z-key write is
``repartitionByRange`` + within-partition sort — the same shuffle a
plain sorted write costs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two integer columns already scaled to
    ``[0, 2^bits)``: result bit 2i is a's bit i, bit 2i+1 is b's.
    Built as a driver-side sum of shift/mask expressions — 2*bits JVM
    ops per row, whole-stage-codegen friendly, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def z_value(
    a: Column,
    b: Column,
    a_min: Column,
    a_max: Column,
    b_min: Column,
    b_max: Column,
    bits: int = 16,
) -> Column:
    """Scale two numeric columns to ``[0, 2^bits)`` by their global
    bounds (bound columns, e.g. from a broadcast 1-row aggregate) and
    Morton-interleave them."""
    top = (1 << bits) - 1

    def scaled(c: Column, lo: Column, hi: Column) -> Column:
        span = hi.cast("double") - lo.cast("double")
        return F.when(
            span > 0,
            F.least(
                F.lit(top).cast("long"),
                ((c.cast("double") - lo.cast("double")) / span * top).cast("long"),
            ),
        ).otherwise(F.lit(0).cast("long"))

    return interleave_bits(scaled(a, a_min, a_max), scaled(b, b_min, b_max), bits)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of
    (``col_a``, ``col_b``): bounds from a broadcast 1-row aggregate,
    z-key projection, range-repartition into ``n_files`` splits,
    within-partition sort, drop the key. Each output file then covers
    a narrow min/max band of BOTH columns — the property
    ``tests/test_scale_ops.py`` asserts on the written footers."""
    bounds = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )
    keyed = df.join(F.broadcast(bounds)).withColumn(
        "__z",
        z_value(
            F.col(col_a),
            F.col(col_b),
            F.col("__amin"),
            F.col("__amax"),
            F.col("__bmin"),
            F.col("__bmax"),
            bits,
        ),
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__amin", "__amax", "__bmin", "__bmax")
        .write.mode("overwrite")
        .parquet(path)
    )
