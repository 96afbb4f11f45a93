"""Multimodal plumbing tests: binary column layout, the stubbed decode's
determinism and batch shape, and the NotImplementedError gate for real
codecs."""

from __future__ import annotations

import pandas as pd
import pytest

from allora_indexer_spark.operators import multimodal
from allora_indexer_spark.registry import all_queries


def test_binary_layout(spark, sf_dir):
    b = multimodal.binary_documents(spark, sf_dir)
    row = b.orderBy("doc_id").first()
    assert isinstance(row["payload"], bytearray | bytes)
    assert row["meta"]["mime"] == "text/plain"
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_decode_stub_deterministic(spark, sf_dir):
    q = all_queries()["q61_multimodal_decode"]
    a = q.fn(spark, sf_dir).toPandas()
    b = q.fn(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert a["decode_ok"].all()
    assert a["width"].between(16, 255).all()
    assert a["height"].between(16, 255).all()
    # one output row per document
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(a) == docs


def test_real_decoder_is_gated():
    pdf = pd.DataFrame({"doc_id": [1], "payload": [b"xyz"]})
    with pytest.raises(NotImplementedError):
        list(multimodal.decode_image_batch(iter([pdf]), decoder="pillow"))
