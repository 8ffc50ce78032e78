"""Size-conditional scan spreading (optimization guide §2.4/§2.5/§6).

``spread_if_narrow`` is the DataFrame-level twin of
``plans.registry.load_spread``: a round-robin repartition to the
session's shuffle parallelism applied ONLY while the input's natural
file splits cannot feed that parallelism
(``ceil(total_bytes / maxPartitionBytes) < shuffle.partitions``).

The bench corpus ships each table as ONE parquet row group, so every
CPU-heavy per-row stage (shingle explodes, token hashing, vector norm
folds) otherwise runs its whole map stage on a single task. The
helpers that learned this lesson first (``exploded_shingles``,
``simhash_fingerprints``, IVF assignment, …) repartitioned
UNCONDITIONALLY — correct locally, but at production scale the scan
already has thousands of natural splits and the repartition becomes a
full corpus shuffle of text/vector payloads for nothing (guide §8:
never move heavy payloads you don't have to). This helper makes the
spread vanish exactly when the splits suffice.

Inputs with no file source (in-memory test frames, post-shuffle
relations whose lineage files cannot be sized) keep the unconditional
spread — the conservative arm, and the pre-r13 behavior.

NOT for partition-SEMANTIC repartitions: a site where the partition
layout is part of the query definition (mg1's per-partition
Misra-Gries summaries) must keep its unconditional form.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

#: mirrors spark.sql.files.maxPartitionBytes, which no session here
#: overrides (kept in lockstep with plans.registry._MAX_SPLIT_BYTES)
MAX_SPLIT_BYTES = 128 * 1024 * 1024


def _natural_splits(df: DataFrame) -> int | None:
    """Lower-bound split count of df's file sources, or None when it
    cannot be determined (no files / non-local / listing failure)."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — any listing failure → unknown
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        path = urlparse(uri).path or uri
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    return -(-total // MAX_SPLIT_BYTES)


def spread_if_narrow(df: DataFrame) -> DataFrame:
    """``df.repartition(shuffle.partitions)`` while the natural splits
    are fewer than the session parallelism; identity otherwise."""
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    splits = _natural_splits(df)
    if splits is None or splits < n_part:
        return df.repartition(n_part)
    return df
