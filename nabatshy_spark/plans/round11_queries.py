"""Round-11 queries: the output-bounded ER contract generalized to the
LLM-pipeline consumer — DOCUMENT entity resolution (VERDICT r10 task
#4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nabatshy_spark.operators import entity
from nabatshy_spark.plans.queries import query


@query("er_doc_topk")
def er_doc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 near-duplicate matches by exact word-3-gram
    Jaccard ≥ 0.5 — the bounded document-ER surface. Candidates are
    df-capped shingle postings (Σ min(df, 200)², the
    dedup.ngram_jaccard_pairs bound) ∪ rep-capped identical-shingle-set
    groups (8 lowest ids — Σ g·8, linear on exact-dup clusters, the
    case where the all-pairs relation goes output-quadratic). Shares
    the part contract's candidate core (entity.candidate_pairs_from_sets)
    and dedup's shingle definition, so the two ER surfaces and the
    Jaccard dedup family can never encode different semantics. The cap
    miss conditions are encoded IDENTICALLY in the DuckDB oracle —
    exact differential at any group size.

    Served from the fingerprint-keyed ``doc_matches`` artifact
    (entity.shared_doc_matches — near-dup matching is THE
    once-per-corpus-version job at 100 TB; the matched relation is
    dup-bounded and every consumer reads it), the same shape as the
    part-ER family after VERDICT r10 task #1. Raw Jaccard through
    parquet, ranked exact, rounded at output — bit-identical to the
    direct operator (unit-asserted). The direct contract's own scale
    curve lives in SCALE.md (sf0.001→1)."""
    return entity.directed_topk(
        entity.shared_doc_matches(
            spark, sf_dir, n=3, threshold=0.5, max_df=200, rep_cap=8
        ),
        "jac",
        "doc_id",
        "match_id",
        3,
        score_out="jaccard",
    )
