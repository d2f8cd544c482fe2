"""Round-6 queries: incremental materialized-view maintenance,
mergeable-HLL distinct rollups, cosine range search, service-graph
drift, blocklist accounting, and cohort LTV curves.  Registered into
the same QUERIES dict; oracles in plans/oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nabatshy_spark.catalog import load
from nabatshy_spark.operators import similarity, sketches
from nabatshy_spark.plans.queries import query

# Refresh boundary for the incremental-MV demo: everything shipped
# before this date plays the "already materialized" aggregate, on/after
# it the delta batch. Static so the partition split is deterministic
# across engines and scale factors.
_MV_CUTOFF = "2001-06-01"


@query("mv_incremental_refresh")
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a monthly-revenue MV
    over lineitem refreshed by MERGING the delta batch's partial
    aggregate into the stored one — never recomputing from the full
    fact table (the TimescaleDB continuous-aggregate / Spark
    foreachBatch-upsert pattern; batch twin of continuous_aggregate).

    The two branches here (base < cutoff, delta >= cutoff) stand in
    for "the MV on disk" and "the new partition"; the refresh is
    union-of-partials → re-aggregate, which is associative because the
    partials carry raw sums and counts (rounding happens only after
    the merge). At 100 TB the base branch is the stored MV (|months|
    rows, no fact scan) and only the delta partition is scanned: the
    refresh cost is O(|delta| + |MV|) regardless of history size. The
    driver oracle checks the merged result against a full recompute —
    the exact invariant an incremental pipeline must keep.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
        F.col("l_shipdate"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("ship_month").agg(
            F.sum("__rev").alias("__rev"), F.count("*").alias("__n")
        )

    base = partial(li.filter(F.col("l_shipdate") < F.lit(_MV_CUTOFF)))
    delta = partial(li.filter(F.col("l_shipdate") >= F.lit(_MV_CUTOFF)))
    return (
        base.unionByName(delta)
        .groupBy("ship_month")
        .agg(
            F.round(F.sum("__rev"), 2).alias("revenue"),
            F.sum("__n").alias("n_lines"),
        )
        .orderBy("ship_month")
    )


@query("hll_user_rollup")
def hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct users from UNIONED per-day HLL sketches
    (operators/sketches.hll_rollup): the mergeable-sketch pre-agg that
    answers any day-range distinct without rescanning the fact table.
    Rows-only (DataSketches estimates aren't reproducible in DuckDB);
    the unit test pins estimate(union(daily)) == estimate(direct) and
    ±2% accuracy vs exact."""
    return sketches.hll_rollup(
        load(spark, sf_dir, "events"), "ts", "user_id"
    )


@query("ann_threshold_search")
def ann_threshold_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine range search (all neighbors with cos ≥ 0.25 of vector 0,
    operators/similarity.cosine_range_search): broadcast query, one
    corpus scan, codegen'd filter, no shuffle. The radius-query twin
    of ann_cosine_topk, oracle-checked exactly (DuckDB
    list_dot_product arithmetic matches Spark's aggregate fold)."""
    return similarity.cosine_range_search(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        query_id=0, threshold=0.25,
    )


# Blocklist for the term-hit audit: vocabulary words the synthetic
# corpus actually contains plus one guaranteed-absent term, so the
# query exercises both hit and miss paths at every scale factor.
_BLOCKLIST = ["error", "join", "filter", "forbiddenterm"]


@query("blocklist_term_hits")
def blocklist_term_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist accounting per source: how many documents and total
    occurrences each blocklist term has, by source — the audit a
    filtering pipeline runs before deciding what a term-level scrub
    would remove. The blocklist is a literal isin over the exploded
    token stream (predicate on the scan; at 100 TB the same shape
    broadcast-joins a blocklist TABLE against a token-bucketed
    layout); one (source, term) groupBy."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    ).filter(F.col("term").isin(_BLOCKLIST))
    return (
        toks.groupBy("source", "term")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_hits"),
        )
        .orderBy("source", "term")
    )


@query("cohort_ltv_curve")
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    quarter, revenue accumulated by quarter-age — the curve a growth
    team reads to compare cohort quality at equal age.  First-order
    quarter via groupBy-min broadcast back onto the orders scan (no
    full-history window); the cumulative sum is a window over the
    (cohort, age) AGGREGATE (|cohorts|×|ages| rows), never the fact
    table."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("oq"),
    )
    first = o.groupBy("o_custkey").agg(F.min("oq").alias("cohort_q"))
    aged = o.join(F.broadcast(first), "o_custkey").select(
        "cohort_q",
        "o_totalprice",
        (
            (F.year("oq") - F.year("cohort_q")) * 4
            + (F.quarter("oq") - F.quarter("cohort_q"))
        ).alias("age_q"),
    )
    agg = aged.groupBy("cohort_q", "age_q").agg(
        F.sum("o_totalprice").alias("__rev")
    )
    w = (
        Window.partitionBy("cohort_q")
        .orderBy("age_q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cohort_sizes = first.groupBy("cohort_q").agg(
        F.count("*").alias("n_customers")
    )
    return (
        agg.withColumn("__cum", F.sum("__rev").over(w))
        .join(F.broadcast(cohort_sizes), "cohort_q")
        .select(
            "cohort_q",
            "age_q",
            "n_customers",
            F.round("__rev", 2).alias("revenue"),
            F.round("__cum", 2).alias("cum_revenue"),
        )
        .orderBy("cohort_q", "age_q")
    )
