"""The sanctioned UDF escape hatch (SURVEY.md §2.7).

The reference's only "UDF mechanism" is pandas row-wise ``apply``
(``dags/etl/source_to_stage.py:74``, ``dags/etl/stage_to_nds.py:45,106``).
In this engine the rules are:

1. If it can be a column expression, it MUST be (see
   ``functions/scalar.py`` — the AQI CASE became a when-chain).
2. If Python is genuinely required, it is an Arrow-vectorized
   ``pandas_udf`` over batches — never a row-at-a-time ``F.udf``
   (10-100× slower: per-row pickle + Python call).
3. Per-group/partition shapes use ``applyInPandas``/``mapInPandas``
   (see ``functions/multimodal.py``).

``vectorized_zscore`` is the reference implementation of rule 2 —
a numerical kernel that composes awkwardly as column expressions but
is one numpy expression per batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def _zscore_kernel(v: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
    # one Arrow batch per call; numpy-vectorized, zero per-row Python
    return (v - mean) / std.where(std != 0, other=pd.NA)


def vectorized_zscore(value: Column, mean: Column, std: Column) -> Column:
    """(value - mean) / std over Arrow batches; NULL where std == 0."""
    return _zscore_kernel(value, mean, std)


@F.udtf(returnType="chunk_idx int, chunk_off bigint, chunk string")
class ChunkTextUDTF:
    """Python UDTF (PySpark 4 table function): overlapping text
    chunking, the user-extensible twin of the pure-column
    ``c1_chunk_text`` plan (size 200 / stride 150 — tested equal).

    The expression form is the production path (JVM, no Python); the
    UDTF is the sanctioned extension point for chunkers that need real
    Python — sentence-boundary models, tokenizer-aware packing — where
    a lateral join (``df.lateralJoin(chunk_text_udtf(...))``) keeps the
    expansion partition-parallel with no shuffle.
    """

    def eval(self, text: str):  # noqa: D102 — API-mandated name
        if not text:
            return
        start = 0
        idx = 0
        while start < len(text):
            yield idx, start, text[start : start + 200]
            idx += 1
            start += 150


@F.pandas_udf(T.DoubleType())
def trimmed_mean_10(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (the UDAF surface): 10%-trimmed
    mean — drop the lowest and highest decile, average the rest. The
    robust-statistics aggregate Spark has no builtin for; Arrow ships
    each group's column once, numpy does the math, no per-row Python.

    Trim boundaries use the same nearest-rank convention as
    ``np.percentile(..., method='lower'/'higher')`` so the result is
    deterministic for any group ordering.
    """
    import numpy as np

    a = np.sort(v.to_numpy(dtype="float64"))
    n = len(a)
    if n == 0:
        return float("nan")
    k = int(n * 0.1)
    trimmed = a[k : n - k] if n - 2 * k > 0 else a
    return float(trimmed.mean())
