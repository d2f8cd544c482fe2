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


@query("cluster_safe_split")
def cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test split: the split key is the exact-
    dup GROUP (md5 of the text), not the document id — so identical
    documents can never land in different splits, by construction
    (what `split_leakage_audit` measures after the fact, this
    guarantees up front; FineWeb/Dolma-style splits hash content for
    exactly this reason). Per-split accounting over the group relation:
    docs, groups, multi-doc groups, largest group. Same no-shuffle
    split function as corpus_split (operators/sampling.split_corpus);
    the only exchange is the (group, split) aggregation."""
    from nabatshy_spark.operators import sampling

    docs = load(spark, sf_dir, "documents").withColumn(
        "__grp", F.md5(F.col("text"))
    )
    split = sampling.split_corpus(docs, "__grp", train_bps=62259, val_bps=1638)
    groups = split.groupBy("split", "__grp").agg(F.count("*").alias("__n"))
    return (
        groups.groupBy("split")
        .agg(
            F.sum("__n").alias("n_docs"),
            F.count("*").alias("n_groups"),
            F.sum(F.when(F.col("__n") > 1, 1).otherwise(0)).alias(
                "n_dup_groups"
            ),
            F.max("__n").alias("max_group_size"),
        )
        .orderBy("split")
    )


# Columns profiled by column_stats_profile — the CBO statistics set
# (ndv / nulls / min / max) for the lineitem fact table.
_STATS_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
    "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus",
]


@query("column_stats_profile")
def column_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics for the lineitem fact table:
    exact distinct count, null count, min and max per column (as
    strings, one row per column) — the statistics a cost-based
    optimizer's join-ordering and selectivity estimates feed on.

    Shape: one single-column aggregate PER column, unioned — NOT one
    multi-aggregate pass. k exact count-distincts in one agg trigger
    Catalyst's EXPAND ×(k+1) (every fact row replicated 9× here —
    measured 17 s vs 2 s at sf0.1; the profile_orders lesson), while
    per-column branches each scan ONE parquet column (column pruning
    ⇒ ~1/11 of the bytes) with an ordinary two-phase partial distinct.
    The approx twin at 100 TB swaps count_distinct for
    approx_count_distinct in a genuinely single pass (see
    profile_orders_approx) — this is the exact form the audit gate
    uses.

    Float min/max are rendered through DECIMAL(38,6), not a direct
    cast-to-string: shortest-roundtrip double printing (Java
    Double.toString vs DuckDB's float formatter) is not contractually
    identical across engines, exactly the hazard table_checksum_audit
    excludes floats for — fixed-point rendering is."""
    li = load(spark, sf_dir, "lineitem")
    dtypes = dict(li.dtypes)
    outs = []
    for c in _STATS_COLS:
        if dtypes[c] in ("double", "float"):
            min_s = F.min(c).cast("decimal(38,6)").cast("string")
            max_s = F.max(c).cast("decimal(38,6)").cast("string")
        else:
            min_s = F.min(c).cast("string")
            max_s = F.max(c).cast("string")
        outs.append(
            li.select(c).agg(
                F.lit(c).alias("col_name"),
                F.countDistinct(c).alias("ndv"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                    "n_nulls"
                ),
                min_s.alias("min_value"),
                max_s.alias("max_value"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("col_name")


# (table, integer/string columns folded into the checksum) — float
# columns are excluded on purpose: shortest-roundtrip float printing
# is not contractually identical across engines, and a checksum must
# never be "close".
_CHECKSUM_TABLES = [
    ("region", ["r_regionkey", "r_name"]),
    ("nation", ["n_nationkey", "n_name", "n_regionkey"]),
    ("customer", ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]),
    ("supplier", ["s_suppkey", "s_name", "s_nationkey"]),
    ("part", ["p_partkey", "p_name", "p_brand", "p_type", "p_size"]),
]


@query("table_checksum_audit")
def table_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable table checksums — the replication/migration
    verification primitive: per table, the row count and an
    ORDER-INSENSITIVE content checksum (sum over rows of the first 32
    md5 bits of the '|'-joined key/string columns).  Two copies of a
    table on different engines (here: Spark vs the DuckDB oracle) agree
    iff counts and checksums agree — no row-by-row diff, no sort.

    Scale shape: one scan per table, all partial-aggregated (each task
    contributes one running sum); the checksum never shuffles row data.
    md5 rather than xxhash64 because the checksum must be identical
    ACROSS engines, not merely within Spark."""
    outs = []
    for tname, cols in _CHECKSUM_TABLES:
        t = load(spark, sf_dir, tname)
        row_hash = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        outs.append(
            t.agg(
                F.lit(tname).alias("table_name"),
                F.count("*").alias("n_rows"),
                F.sum(row_hash).alias("checksum"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name")


@query("priority_sample_docs")
def priority_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sampling via priority sampling (Duffield-
    Lund-Thorup, JACM 2007; operators/sampling.priority_sample): the
    200 docs with the highest priority q = n_chars/u form a weighted-
    without-replacement sample, and the 201st priority τ turns it into
    an unbiased subset-sum estimator — Σ max(w, τ) over the sample
    estimates total corpus chars. The demo is self-grading (the exact
    total and relative error ride along, approx_revenue_estimate
    precedent); a production run ships only the k rows + τ.

    Scale: top-(k+1) by priority is a per-partition partial top-k —
    no global sort, no shuffle of non-sample rows; the estimator sums
    k DECIMAL(18,6) values (exact, associative, engine-identical).
    The true-total scan exists only for the self-check."""
    from nabatshy_spark.operators import sampling

    docs = load(spark, sf_dir, "documents")
    samp = sampling.priority_sample(docs, "doc_id", "n_chars", 200)
    tot = docs.agg(F.sum("n_chars").alias("true_total_chars"))
    est = (
        samp.filter(F.col("__rank") <= 200)
        .agg(
            F.count("*").alias("n_sample"),
            F.round(F.min("__tau"), 6).alias("tau"),
            F.sum(
                F.greatest(F.col("n_chars").cast("double"), F.col("__tau"))
                .cast("decimal(18,6)")
            ).alias("__est"),
        )
    )
    return (
        est.join(F.broadcast(tot))
        .select(
            "n_sample",
            "tau",
            F.round(F.col("__est").cast("double"), 2).alias("est_total_chars"),
            "true_total_chars",
            F.round(
                (F.col("__est").cast("double") - F.col("true_total_chars"))
                / F.col("true_total_chars")
                * 100,
                4,
            ).alias("rel_err_pct"),
        )
    )


@query("fuzzy_name_pairs")
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-similarity join with edit-distance verify — the record-
    linkage primitive the token-Jaccard ER path (er_part_pairs) can't
    express: near-identical names that differ by a typo, not by a
    token. Classic block-and-verify: dedupe to DISTINCT names first
    (names ≪ rows — the cardinality collapse that makes fuzzy joins
    feasible at 100 TB), block on the head noun so only names sharing
    it ever compare, prune by length band, then verify with exact
    Levenshtein ≤ 3. Both engines implement the same integer DP, so
    the oracle is exact.

    Scale: the self-join runs on the distinct-name relation keyed by
    (block, length-bucket) — the Ed-Join/length-filter composite. The
    head noun alone has ~92 distinct values on TPC-H names, so a
    block-only join is Σ|block|² ≈ |names|²/92 — still quadratic in
    distinct names. Folding the ±3 length band INTO the join key
    (bucket = floor(len/4); probe side explodes to bucket±1, so any
    pair within the band shares a key) multiplies the effective block
    count by the number of occupied length buckets, bounding candidate
    growth. The block key coalesces to '' for single-token names to
    match DuckDB split_part semantics (absent token → '', not NULL)."""
    part = load(spark, sf_dir, "part")
    names = (
        part.select("p_name")
        .distinct()
        .withColumn(
            # F.get (not getItem): out-of-bounds yields NULL under ANSI
            # instead of throwing; coalesce('') then matches split_part.
            "__block",
            F.coalesce(F.get(F.split("p_name", " "), 1), F.lit("")),
        )
        .withColumn("__len", F.length("p_name"))
    )
    # Probe side: each name probes its own length bucket and both
    # neighbors — |la-lb| <= 3 with width-4 buckets implies the bucket
    # indices differ by at most 1, so no band pair is missed.
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("__block"),
        F.col("__len").alias("__la"),
        F.explode(
            F.array(
                F.floor(F.col("__len") / 4) - 1,
                F.floor(F.col("__len") / 4),
                F.floor(F.col("__len") / 4) + 1,
            )
        ).alias("__bkt"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("__block"),
        F.col("__len").alias("__lb"),
        F.floor(F.col("__len") / 4).alias("__bkt"),
    )
    return (
        a.join(b, ["__block", "__bkt"])
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= 3)
        )
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select("name_a", "name_b", "edit_dist")
        .orderBy("name_a", "name_b")
    )


@query("pareto_suppliers")
def pareto_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) preference query over the per-supplier
    aggregate: suppliers not dominated on (revenue ↑, return_rate ↓) —
    no other supplier has ≥ revenue AND ≤ return rate with one strict.
    The preference-query operator class (Börzsönyi et al., ICDE 2001)
    the plain top-N surface can't express: "best tradeoffs", not "best
    single metric".

    2-D skyline = the staircase scan: collapse to distinct revenue
    levels with each level's min return rate, running-min over levels
    sorted by revenue desc gives the best rate among strictly-richer
    suppliers; dominated iff that min ≤ own rate, or a same-revenue
    supplier has a strictly lower rate. The running-min goes through
    stats.running_min_prev_ordered's TWO-PHASE form — the level
    relation is ≤|suppliers|, a dimension that grows with the data,
    so the staircase never sorts on one task. Revenue compares as the
    exact DECIMAL sum; rates compare after the same round-6 both
    engines apply."""
    from nabatshy_spark.operators.stats import running_min_prev_ordered

    li = load(spark, sf_dir, "lineitem")
    sup = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(28,6)"
            )
        ).alias("__rev"),
        F.round(
            F.avg((F.col("l_returnflag") == "R").cast("int")), 6
        ).alias("return_rate"),
    )
    lvl = running_min_prev_ordered(
        sup.groupBy("__rev").agg(F.min("return_rate").alias("__lvl_min")),
        [F.col("__rev").desc()],
        "__lvl_min",
        force="twophase",
    ).withColumnRenamed("__prevmin", "__runmin_prev")
    supplier = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    return (
        sup.join(lvl, "__rev")
        .filter(
            (
                F.col("__runmin_prev").isNull()
                | (F.col("__runmin_prev") > F.col("return_rate"))
            )
            & (F.col("__lvl_min") >= F.col("return_rate"))
        )
        .join(F.broadcast(supplier), "suppkey")
        .select(
            "suppkey",
            "s_name",
            F.round(F.col("__rev").cast("double"), 2).alias("revenue"),
            "return_rate",
        )
        .orderBy(F.col("revenue").desc(), F.col("suppkey").asc())
    )


@query("join_size_estimate")
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based join cardinality estimation (sketches.
    cms_inner_product — Cormode-Muthukrishnan count-min inner product):
    estimate |events ⋈ orders| on the user key (user_id ≡ o_custkey
    mod 150, the repo's standing mapping) from two 4×512 sketches,
    never joining the tables — the cost-based-optimizer primitive
    behind join ordering and broadcast decisions. The estimate is
    min over hash rows of Σ_col cmsA·cmsB; collisions only add, so
    est ≥ true always (and the oracle REBUILDS both sketches, so
    construction and estimator are both checked). The true size rides
    along from the per-key frequency join (Σ f_A·f_B — itself never a
    row-level join) to make the demo self-grading.

    Scale: each side is one scan + a d·w-cell agg; the estimator is
    O(d·w). The exact twin shuffles both tables' distinct keys; this
    shuffles 2048 cells. Width trades space for bound: the expected
    overshoot here is ~|keys|/width (150/512 ≈ 30%), and the min over
    4 rows lands tighter."""
    from nabatshy_spark.operators import sketches

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key")
    )
    od = load(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 150).cast("string").alias("key")
    )
    est = (
        sketches.cms_inner_product(ev, od, "key", depth=4, width=512)
        .agg(F.min("est").alias("cms_estimate"))
    )
    fa = ev.groupBy("key").agg(F.count("*").alias("fa"))
    fb = od.groupBy("key").agg(F.count("*").alias("fb"))
    true = fa.join(fb, "key").agg(
        F.sum(F.col("fa") * F.col("fb")).alias("true_join_size")
    )
    return est.join(F.broadcast(true)).select(
        "true_join_size",
        "cms_estimate",
        F.round(
            (F.col("cms_estimate") - F.col("true_join_size"))
            / F.col("true_join_size")
            * 100,
            4,
        ).alias("overest_pct"),
    )
