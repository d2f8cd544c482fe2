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


@query("er_doc_clusters")
def er_doc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate document clusters at Jaccard ≥ 0.5: connected
    components (large-star/small-star) over the SAME bounded matched
    relation er_doc_topk ranks (the ``doc_matches`` artifact),
    singleton documents included, reported as a cluster-size histogram
    — the corpus-level view a curation run signs off on before
    keep-best dedup. The DuckDB twin runs a recursive CTE over the
    shared capped fragment, so the two consumers cannot encode
    different cap semantics."""
    from pyspark.sql import functions as F

    from nabatshy_spark.catalog import load

    return entity.cluster_histogram(
        entity.shared_doc_matches(spark, sf_dir),
        load(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("node")
        ),
    )


@query("er_doc_topk_eval")
def er_doc_topk_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantitative gate for the document caps (the er_topk_eval
    convention): compare er_doc_topk's edges against the TRUE per-doc
    top-3 derived from the EXACT uncapped pair relation
    (dedup.ngram_jaccard_pairs with no df cap — the audit deliberately
    pays the unbounded cost, like minhash_dedup_eval). Where no
    shingle exceeds the df cap and no identical-set group exceeds
    rep_cap the recall is exactly 1.0. Both sides rank by the 6-dp
    jaccard (the exact relation emits rounded values; identical
    doubles round identically in DuckDB), ties broken by match id.
    One row of deterministic integer counts + the recall ratio."""
    from pyspark.sql import functions as F

    from nabatshy_spark.operators import dedup

    capped = entity.directed_topk(
        entity.shared_doc_matches(spark, sf_dir),
        "jac",
        "doc_id",
        "match_id",
        3,
    ).select("doc_id", "match_id", F.lit(1).alias("__c"))
    # Truth side from the fingerprint-keyed UNCAPPED pair artifact
    # (round 12, VERDICT r11 task #3): shared_ngram_pairs with
    # max_df=None materializes exactly ngram_jaccard_pairs(documents,
    # n=3, t=0.5, no cap) — deterministic operator, exact doubles
    # through parquet, so the gate's truth is byte-identical while the
    # uncapped Σ df² expansion runs once per corpus version instead of
    # per invocation (the same cure the part family's eval gate got in
    # round 11). The gate still deliberately PAYS the unbounded cost —
    # in the build, where it belongs.
    exact = dedup.shared_ngram_pairs(
        spark, sf_dir, n=3, threshold=0.5, max_df=None
    ).select(
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        F.col("jaccard").alias("jac"),
    )
    true_topk = (
        entity.directed_topk(exact, "jac", "doc_id", "match_id", 3)
        .select("doc_id", "match_id", F.lit(1).alias("__t"))
    )
    # One full-outer join + one aggregate (the er_topk_eval shape): the
    # truth and capped subtrees are each referenced once.
    joined = true_topk.join(capped, ["doc_id", "match_id"], "full_outer")
    return joined.agg(
        F.countDistinct(
            F.when(F.col("__t") == 1, F.col("doc_id"))
        ).alias("n_records"),
        F.sum(F.when(F.col("__t") == 1, 1).otherwise(0)).alias("true_edges"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0)).alias("capped_edges"),
        F.sum(
            F.when((F.col("__t") == 1) & (F.col("__c") == 1), 1).otherwise(0)
        ).alias("shared_edges"),
    ).select(
        "n_records",
        "true_edges",
        "capped_edges",
        "shared_edges",
        F.round(F.col("shared_edges") / F.col("true_edges"), 6).alias(
            "edge_recall"
        ),
    )
