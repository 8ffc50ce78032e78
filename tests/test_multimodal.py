"""Multimodal stub plumbing tests (resize; features/frames are covered
in test_llm_ops.py)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"

def test_resize_stub_strides_deterministically(spark):
    from aqi_analysis_apache_airflow_spark.functions.multimodal import (
        documents_as_media,
        resize_stub,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    out = resize_stub(documents_as_media(docs), factor=4).collect()
    assert len(out) == 50
    for r in out:
        assert r["n_bytes_out"] == (r["n_bytes_in"] + 3) // 4
    # pure function of the payload: a rerun yields identical bytes
    again = {
        r["doc_id"]: bytes(r["resized"])
        for r in resize_stub(documents_as_media(docs), factor=4).collect()
    }
    assert {r["doc_id"]: bytes(r["resized"]) for r in out} == again


def test_resize_stub_real_decoder_gate(spark):
    import pytest as _pytest

    from aqi_analysis_apache_airflow_spark.functions.multimodal import (
        documents_as_media,
        resize_stub,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(2)
    with _pytest.raises(Exception, match="NotImplementedError|image library"):
        resize_stub(documents_as_media(docs), decode_stub=False).collect()
