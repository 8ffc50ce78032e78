"""Oracle parity on an ADVERSARIAL embeddings corpus: the zero vector
(every real embedding pipeline eventually produces one — a blank image,
an empty string through an encoder), exact duplicates of the query,
antipodal vectors, near-zero magnitudes, constant vectors. The driver
corpus is well-behaved gaussian data, so norm-zero division and cosine
ties never get exercised by the main parity sweep; this fixture forces
them. Derived from the registry (every embeddings-only oracle query
runs here, the orders/lineitem/events/multitable pattern), so new
embedding ops are covered automatically."""

from __future__ import annotations

import math
import os
import re

import duckdb
import numpy as np
import pandas as pd
import pytest

from aqi_analysis_apache_airflow_spark.plans import REGISTRY
from aqi_analysis_apache_airflow_spark.schemas import CORPUS_TABLES

_OTHERS = [t for t in CORPUS_TABLES if t != "embeddings"]


def _emb_only(name: str) -> bool:
    q = REGISTRY[name]
    if q.oracle is None or "embeddings" not in q.oracle:
        return False
    return not any(re.search(rf"\b{t}\b", q.oracle) for t in _OTHERS)


EMB_QUERIES = sorted(n for n in REGISTRY if _emb_only(n))

# the round-6 manual list, kept as a regression floor: derivation must
# never silently shrink below what was covered by hand
_MANUAL_FLOOR = [
    "sim_cosine_topk",
    "sim_ivfm_topk",
    "sim_ivf_topk",
    "sim_ivfd_topk",
    "sdd1_semantic_dedup",
    "emb1_quantize",
    "emb3_unit_normalize",
    "emb4_matryoshka_recall",
    "pq1_product_quantize",
    "d5_embedding_near_dup",
    "knn1_knn_join",
    # round 6: hard-negative mining (zero-norm anchors and candidates
    # must drop identically on both sides; cos=±1 ties break on id)
    "hn1_hard_negatives",
    # round 6: centroid-outlier audit (zero vectors, exact duplicates
    # and antipodal members stress the quantized distance + the exact
    # cross-multiplied flag; a 1-member label is its own centroid —
    # dist2 0, never an outlier — on both engines)
    "emb5_centroid_outliers",
]


def test_derivation_covers_manual_floor():
    missing = sorted(set(_MANUAL_FLOOR) - set(EMB_QUERIES))
    assert not missing, f"derived EMB_QUERIES lost manual coverage: {missing}"


_DIM = 64


def _rows():
    rng = np.random.default_rng(7)
    q = rng.normal(size=_DIM).astype(np.float32)
    rows = [
        (0, q),  # the query vector
        (1, np.zeros(_DIM, dtype=np.float32)),  # THE classic hazard
        (2, q.copy()),  # exact duplicate of the query (cos = 1)
        (3, (-q).astype(np.float32)),  # antipodal (cos = -1)
        (4, np.ones(_DIM, dtype=np.float32)),  # constant vector
        (5, np.full(_DIM, 1e-3, dtype=np.float32)),  # tiny magnitude
        (6, rng.normal(size=_DIM).astype(np.float32)),
        (7, rng.normal(size=_DIM).astype(np.float32)),
        (8, rng.normal(size=_DIM).astype(np.float32)),
        (9, rng.normal(size=_DIM).astype(np.float32)),
        # second zero vector: zero-zero pairs as well as zero-query
        (10, np.zeros(_DIM, dtype=np.float32)),
        (50, rng.normal(size=_DIM).astype(np.float32)),  # d5's %50 subsample
        (100, rng.normal(size=_DIM).astype(np.float32)),
        (150, np.zeros(_DIM, dtype=np.float32)),  # zero vec inside d5's %50
    ]
    # label = vec_id % 3, matching the corpus schema (hn1 needs it):
    # the sole anchor (vec 0, label 0) gets the exact-duplicate vec 2
    # (cos = 1, other label) as a rank-1 negative, while the antipodal
    # vec 3 shares its label and must be excluded; zero-norm vecs drop
    # under the same na/nb > 0 rule on both engines
    return [(i, list(map(float, v)), i % 3) for i, v in rows]


@pytest.fixture(scope="module")
def adversarial_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_emb")
    pdf = pd.DataFrame(_rows(), columns=["vec_id", "embedding", "label"])
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.Table.from_pandas(
        pdf,
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
        preserve_index=False,
    )
    pq.write_table(table, os.path.join(d, "embeddings.parquet"))
    return str(d)


def _canon_cell(x):
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return "NULL"
    try:
        if pd.isna(x):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(x, float):
        return repr(x)
    if isinstance(x, (list, np.ndarray)):
        return "[" + ",".join(_canon_cell(v) for v in x) + "]"
    return str(x)


def _canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    df = df[cols]
    return cols, sorted(
        tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)
    )


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_adversarial_embedding_parity(spark, adversarial_emb_dir, name):
    q = REGISTRY[name]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{adversarial_emb_dir}/embeddings.parquet'"
    )
    sdf = q.fn(spark, adversarial_emb_dir).toPandas()
    odf = con.execute(q.oracle).fetchdf()
    assert len(sdf) == len(odf), f"{name}: rowcount {len(sdf)} != {len(odf)}"
    scols, srows = _canon(sdf)
    ocols, orows = _canon(odf)
    assert scols == ocols, f"{name}: columns {scols} != {ocols}"
    diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
    assert srows == orows, f"{name}: first diffs {diffs}"
