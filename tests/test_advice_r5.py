"""Regression tests for the ADVICE round-5 fixes: duplicate query
terms must not leak positives into hard negatives, and
pca_variance_report must fail loudly on null / ragged vectors instead
of silently mis-shaping the moment sums."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nabatshy_spark.operators.invindex import (
    build_postings,
    hard_negatives,
    search_and,
)
from nabatshy_spark.operators.similarity import pca_variance_report


def _tiny_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),  # full match for [alpha, beta]
            (2, "alpha delta delta"),  # partial match
            (3, "beta epsilon"),  # partial match
            (4, "zeta eta"),  # no match
        ],
        "doc: bigint, text: string",
    )
    postings = build_postings(docs, "doc", "text")
    doc_lens = docs.select(
        "doc", F.size(F.split("text", " ")).alias("dl")
    )
    return postings, doc_lens


def test_hard_negatives_dedups_duplicate_query_terms(spark):
    """With terms=[alpha, beta, alpha], len(terms)==3 would let doc 1
    (a true full match on {alpha, beta}) pass n_terms_matched < 3 and
    leak into the negatives; the dedup keeps it out."""
    postings, doc_lens = _tiny_corpus(spark)
    negs = hard_negatives(
        postings, doc_lens, ["alpha", "beta", "alpha"], k=10
    ).collect()
    docs = {r.doc for r in negs}
    assert 1 not in docs  # the positive must not leak
    assert docs == {2, 3}
    assert all(r.n_terms_matched == 1 for r in negs)


def test_hard_negatives_rejects_single_distinct_term(spark):
    postings, doc_lens = _tiny_corpus(spark)
    with pytest.raises(ValueError, match="distinct"):
        hard_negatives(postings, doc_lens, ["alpha", "alpha"], k=10)


def test_search_and_dedups_duplicate_query_terms(spark):
    """A repeated term must not make the conjunction unsatisfiable:
    [alpha, alpha] is the query {alpha}."""
    postings, _ = _tiny_corpus(spark)
    docs = {r.doc for r in search_and(postings, ["alpha", "alpha"]).collect()}
    assert docs == {1, 2}


def test_pca_rejects_null_first_vector(spark):
    df = spark.createDataFrame(
        [(None,), ([1.0, 2.0],)], "embedding: array<double>"
    )
    with pytest.raises(ValueError, match="NULL"):
        pca_variance_report(df, "embedding")


def test_pca_rejects_ragged_vectors(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0, 2.0, 3.0],)], "embedding: array<double>"
    )
    with pytest.raises(ValueError, match="lengths vary"):
        pca_variance_report(df, "embedding")


def test_pca_rejects_null_vector_past_first_row(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0],), (None,), ([3.0, 4.0],)], "embedding: array<double>"
    )
    with pytest.raises(ValueError, match="lengths vary"):
        pca_variance_report(df, "embedding")
