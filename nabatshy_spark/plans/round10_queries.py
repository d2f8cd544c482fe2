"""Round-10 queries: output-bounded entity resolution (the 100 TB-safe
ER surface — VERDICT r9 task #4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nabatshy_spark.catalog import load
from nabatshy_spark.operators import entity
from nabatshy_spark.plans.queries import query


@query("er_part_topk")
def er_part_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record top-3 scored ER matches over ``part`` — the bounded
    contract that replaces the all-pairs relation at scale. The sf1
    curve proved er_part_pairs is output-quadratic on dup-heavy
    catalogs (exp 1.56, adjudicated output-bound: a group of g
    identical names emits g²/2 pairs); this surface emits ≤ 3 rows per
    record with candidate generation bounded by df-capped token
    postings ∪ record×group-representative pairs (rep_cap=8 lowest
    ids per identical-(name-tokens, brand) group, Σ g·8 — linear).
    The deterministic miss condition (a true top match that is a
    non-representative of an over-cap group) is encoded IDENTICALLY in
    the DuckDB oracle, so the differential is exact at any group size;
    er_part_pairs remains the registry's exact all-pairs twin.

    Round 11 (VERDICT r10 task #1): the scored-candidate relation is
    served from the fingerprint-keyed ``part_matches`` artifact
    (entity.shared_part_matches — built once per catalog version,
    shared with er_part_pairs and the eval gate), so this query is one
    artifact scan + one explode + one window instead of re-expanding
    the blocking DAG (was ex17/scan16, the most expensive headline
    query). Scores rank RAW through parquet (exact doubles), output
    identical bit-for-bit."""
    return entity.directed_topk(
        entity.shared_part_matches(
            spark, sf_dir, threshold=0.8, max_df=200, rep_cap=8
        ),
        "score",
        "p_partkey",
        "match_key",
        3,
    )


@query("er_topk_eval")
def er_topk_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantitative gate for the rep-capped top-k contract: compare
    er_part_topk's edges against the TRUE per-record top-3 derived
    from the exact all-pairs relation (er_part_pairs' blocking). The
    audit itself pays the quadratic twin's cost by design — it exists
    to measure what the cap loses, like minhash_dedup_eval for LSH.
    Where no (name, brand) group exceeds rep_cap the recall is exactly
    1.0; above that the lost edges are non-representative partners
    whose size happened to be closer than every representative's.
    Emits one row: record coverage and edge recall, both derived from
    deterministic integer counts.

    Round 11: both sides read the shared ``part_matches`` artifacts
    (exact all-pairs and rep-capped — VERDICT r10 task #1; this gate's
    plan re-expanded BOTH candidate DAGs, ex49/scan44, the single worst
    plan in the audit). The quadratic twin's cost now lives in the
    all-pairs artifact BUILD line, paid once per catalog version."""
    capped = entity.directed_topk(
        entity.shared_part_matches(
            spark, sf_dir, threshold=0.8, max_df=200, rep_cap=8
        ),
        "score",
        "p_partkey",
        "match_key",
        3,
    ).select("p_partkey", "match_key")
    true_topk = (
        entity.directed_topk(
            entity.shared_part_matches(
                spark, sf_dir, threshold=0.8, max_df=200, rep_cap=None
            ),
            "score",
            "p_partkey",
            "match_key",
            3,
        )
        .select("p_partkey", "match_key", F.lit(1).alias("__t"))
    )
    # One full-outer join + one aggregate: every count comes from a
    # single pass over the edge union, so the truth and capped subtrees
    # are each referenced ONCE (three separate 1-row aggregates would
    # re-expand the whole candidate DAG per count — 90 exchanges in the
    # plan audit before this shape).
    joined = true_topk.join(
        capped.withColumn("__c", F.lit(1)),
        ["p_partkey", "match_key"],
        "full_outer",
    )
    return joined.agg(
        F.countDistinct(
            F.when(F.col("__t") == 1, F.col("p_partkey"))
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


@query("exactsubstr_rewrite_preview")
def exactsubstr_rewrite_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of ExactSubstr dedup: splice the keep-first cut
    intervals out of every affected document
    (suffixes.exactsubstr_rewrite over the shared runs artifact) and
    emit the verification record a curation run signs off on —
    (doc_id, old_len, new_len, sha256 of the rewritten text). The
    content hash makes the differential pin the SPLICED BYTES, not
    just lengths; docs whose every byte came out identical in DuckDB's
    independent string_agg splice prove the interval complement math
    end-to-end. Unaffected documents are excluded (they pass through
    byte-identical by construction, asserted in the unit)."""
    from nabatshy_spark.operators import suffixes

    runs = suffixes.shared_substring_runs(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    rewritten = suffixes.exactsubstr_rewrite(docs, "doc_id", "text", runs)
    affected = rewritten.join(
        runs.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id"
    )
    return (
        affected.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("old_len"),
            F.length("text").cast("long").alias("new_len"),
            F.sha2("text", 256).alias("new_sha"),
        )
        .orderBy("doc_id")
    )
