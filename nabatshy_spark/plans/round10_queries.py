"""Round-10 queries: output-bounded entity resolution (the 100 TB-safe
ER surface — VERDICT r9 task #4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    er_part_pairs remains the registry's exact all-pairs twin."""
    return entity.part_topk_matches(
        load(spark, sf_dir, "part"),
        threshold=0.8,
        k=3,
        max_df=200,
        rep_cap=8,
    )
