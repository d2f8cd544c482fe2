"""Behavioral tests for extension operators beyond oracle parity."""

from __future__ import annotations

import pytest

from nabatshy_spark.catalog import load
from nabatshy_spark.operators import multimodal, similarity


def test_lsh_topk_recall(spark, sf_dir):
    """LSH top-k must recover most of the exact top-k (same data, same
    query): recall ≥ 0.5 at k=10 with 16 planes / 4 bands."""
    emb = load(spark, sf_dir, "embeddings")
    exact = {
        r.vec_id
        for r in similarity.cosine_topk(emb, "vec_id", "embedding", 0, 10).collect()
    }
    approx = {
        r.vec_id
        for r in similarity.lsh_topk(emb, "vec_id", "embedding", 0, 10).collect()
    }
    assert len(approx) == 10
    assert len(exact & approx) / len(exact) >= 0.5


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_multimodal_plumbing(spark, sf_dir):
    """The binary pipeline carries real payloads through mapInPandas."""
    docs = load(spark, sf_dir, "documents").limit(20)
    out = multimodal.extract_features(
        multimodal.attach_binary(docs, "doc_id", "text")
    ).collect()
    assert len(out) == 20
    assert all(len(r.sha_hex) == 64 and r.n_bytes > 0 for r in out)
