"""Round-8 queries: relational operator classes the registry did not
yet surface — grouping sets (ROLLUP), PIVOT/UNPIVOT reshaping,
non-equi range joins, gaps-and-islands date streaks, exact quantile
segmentation — plus the
MinHash-LSH quantitative eval gate (the dedup twin of
ann_recall_report). All but the eval gate are oracle-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nabatshy_spark.catalog import load
from nabatshy_spark.plans.queries import query


@query("sales_rollup_cube")
def sales_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS surface (§2.7 generalization): order counts and
    revenue by (year, status) with ROLLUP — subtotal rows per year and
    a grand total, each tagged by grouping_id so consumers can tell a
    NULL group from a subtotal. The operator class OLAP cubes are made
    of; Spark evaluates all grouping sets in one Expand+Aggregate pass
    (one scan, one shuffle), not one job per set.

    NAMING NOTE (VERDICT r8 #7): despite the historical name this
    computes ROLLUP, not CUBE — the hierarchy-shaped subset of
    grouping sets ((yr,status),(yr),()). The registry's true CUBE
    (every subset, including (status)-only) is ``cube_pricing``. The
    name is kept because the external correctness evidence chain
    (CORRECTNESS_r08, staleness ledger) is keyed by it.

    Scale: output is |years|×|statuses| + |years| + 1 rows —
    dimension-bounded however large the fact table."""
    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(28,6)").alias("price"),
    )
    return (
        o.rollup("yr", "status")
        .agg(
            # grouping_id must live INSIDE the aggregate (it reads the
            # Expand node's spark_grouping_id, which a later select no
            # longer sees).
            F.grouping_id("yr", "status").alias("grouping_lvl"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("price").cast("double"), 2).alias("revenue"),
        )
        .select("yr", "status", "grouping_lvl", "n_orders", "revenue")
        .orderBy("grouping_lvl", "yr", "status")
    )


@query("orders_pivot_status_by_year")
def orders_pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT reshaping: one row per year, one column per order status
    (long→wide). The pivot values are pinned explicitly — at 100 TB an
    unpinned pivot needs a distinct-scan planning pass AND an unpinned
    output schema, both of which a production job avoids by declaring
    its columns. One scan, one shuffle of |years| groups."""
    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), "o_orderstatus"
    )
    return (
        o.groupBy("yr")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))  # count("*") star is invalid inside Pivot
        .select(
            "yr",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
        .orderBy("yr")
    )


@query("part_size_price_unpivot")
def part_size_price_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (wide→long): per-brand averages of two numeric part
    attributes unpivoted to (brand, attribute, avg_value) rows — the
    reshaping step feature stores and long-format exporters run.
    Aggregate FIRST, melt the |brands|×2 result (`stack` is evaluated
    on the dimension-sized aggregate, never on fact rows)."""
    p = load(spark, sf_dir, "part")
    per_brand = p.groupBy("p_brand").agg(
        F.round(F.avg("p_size"), 6).alias("avg_size"),
        F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
    )
    return per_brand.selectExpr(
        "p_brand",
        "stack(2, 'avg_size', avg_size, 'avg_price', avg_price)"
        " as (attribute, avg_value)",
    ).orderBy("p_brand", "attribute")


# Static price bands — pinned edges (a production banding table), the
# small side of the non-equi range join below.
_PRICE_BANDS = [
    ("budget", 0.0, 950.0),
    ("mid", 950.0, 1400.0),
    ("premium", 1400.0, 1800.0),
    ("luxury", 1800.0, 10_000.0),
]


@query("range_join_price_bands")
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi RANGE join: parts classified into static price bands by
    ``lo <= price < hi`` — the interval-lookup join class (banding,
    rate tables, SCD date ranges). The band table is tiny and
    DELIBERATELY broadcast: a broadcast-nested-loop over 4 rows per
    probe is the right physical plan for an interval lookup whose small
    side cannot equi-hash (the plan-audit BNLJ exception, like the
    1-row grand-total joins). If the band table ever grew data-sized,
    the rewrite is binning the probe side to the band key (a CASE
    expression or width_bucket) and equi-joining.

    Scale: one scan of part, zero shuffle (broadcast + partial agg to
    |bands| rows)."""
    bands = spark.createDataFrame(
        _PRICE_BANDS, "band string, lo double, hi double"
    )
    p = load(spark, sf_dir, "part")
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band", "lo", "hi")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        )
        .orderBy("lo")
    )


@query("supplier_balance_quartiles")
def supplier_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantile segmentation: suppliers cut into account-balance
    quartiles by RANK ARITHMETIC (ceil(4·rank/n) over a total order —
    engine-portable, unlike ntile whose remainder-distribution rule
    differs across engines), then per-quartile stats. The rank comes
    from stats.cumulative_sum_ordered's two-phase form, so the
    segmentation never sorts the supplier dimension on one task.

    Scale: rank two-phase (range shuffle + config-bounded offsets);
    the report is 4 rows."""
    from nabatshy_spark.operators.stats import cumulative_sum_ordered

    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_acctbal").cast("decimal(28,6)").alias("bal")
    )
    ranked = cumulative_sum_ordered(
        s,
        [F.col("bal").asc(), F.col("s_suppkey").asc()],
        "bal",
        force="twophase",
    )
    q = ranked.withColumn(
        "quartile",
        F.ceil(F.lit(4) * F.col("__rank") / F.col("__n")).cast("int"),
    )
    return (
        q.groupBy("quartile")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.min("bal").cast("double"), 2).alias("min_bal"),
            F.round(F.max("bal").cast("double"), 2).alias("max_bal"),
            F.round(F.avg(F.col("bal").cast("double")), 6).alias("avg_bal"),
        )
        .orderBy("quartile")
    )


@query("customer_order_streaks")
def customer_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over DATES: each customer's longest streak of
    consecutive order months (distinct months where month_index −
    dense-order-index is constant within an island) — the retention
    streak the char-level dup_span_chars islands logic generalizes to
    calendars. One shuffle on customer; windows are per-customer.

    Output: streak-length histogram (streak_months, n_customers) —
    bounded by the observation horizon in months."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "__m"
        ),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("__m")
    islands = (
        o.withColumn("__rn", F.row_number().over(w))
        .withColumn("__island", F.col("__m") - F.col("__rn"))
        .groupBy("o_custkey", "__island")
        .agg(F.count("*").alias("__len"))
    )
    longest = islands.groupBy("o_custkey").agg(
        F.max("__len").alias("streak_months")
    )
    return (
        longest.groupBy("streak_months")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("streak_months")
    )


@query("minhash_dedup_eval")
def minhash_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantitative gate for the probabilistic dedup path — the dedup
    twin of ann_recall_report: minhash_lsh_pairs' (exactly verified)
    output scored against the EXACT capped posting join's pairs
    (threshold 0.5) as precision/recall per signature budget.
    P[band miss | J=t] = (1−t^rows_per_band)^bands, so recall should
    climb toward 1 with the hash budget; "precision" < 1 can only come
    from cap divergence (the minhash path verifies full arrays, the
    exact side drops hot shingles from candidate generation — the
    documented df-cap miss condition), which makes this report a live
    measurement of that divergence too. Probabilistic by construction
    → rows-only driver check; the hard floor lives in
    tests/test_round8_ops.py::test_minhash_dedup_floor.

    Scale: the exact side is the capped posting join (Σ min(df,cap)²);
    the approximate side shuffles fixed-width signatures; the scoring
    joins ride the two pair relations (tiny next to the corpus)."""
    from nabatshy_spark.operators import dedup

    docs = load(spark, sf_dir, "documents")
    exact = (
        dedup.shared_ngram_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    n_true = exact.count()
    # ONE full-budget signature artifact serves all three configs: the
    # seeded hash family is prefix-stable, so sig[:32]/sig[:64] ARE the
    # 32-/64-hash signatures and banding only reads indices below each
    # budget (see minhash_lsh_pairs' sig_override note, round 12).
    sigs = dedup.shared_minhash_signatures(spark, sf_dir, n=3, num_hashes=128)
    reports = []
    for n_hashes in [32, 64, 128]:
        got = (
            dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", n=3, threshold=0.5,
                num_hashes=n_hashes, rows_per_band=2,
                sig_override=sigs,
            )
            .select("doc_a", "doc_b")
            .localCheckpoint()
        )
        n_got = got.count()
        n_hit = got.join(exact, ["doc_a", "doc_b"], "inner").count()
        reports.append(
            (
                f"{n_hashes}h_{n_hashes // 2}bands",
                n_true,
                n_got,
                n_hit,
                round(n_hit / n_got, 4) if n_got else None,
                round(n_hit / n_true, 4) if n_true else None,
            )
        )
    return spark.createDataFrame(
        reports,
        "config string, n_true long, n_pairs long, n_hits long,"
        " precision double, recall double",
    )


@query("bloom_pruned_fact_join")
def bloom_pruned_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join (the pattern behind Spark's own
    spark.sql.optimizer.runtime.bloomFilter and ClickHouse's
    set-index pruning): a Bloom filter built over the QUALIFYING dim
    keys (BUILDING-segment customers) becomes a codegen'd predicate ON
    THE FACT SCAN — orders rows whose custkey cannot be in the segment
    never reach the join — and the exact semi-join afterwards clears
    the false positives, so the result is bit-identical to the plain
    join (which is exactly what the oracle checks).

    Scale shape: the bit set packs into ⌈num_bits/64⌉ long words
    however large the dim (collected once — a CONFIG-bounded driver
    transfer, like CMS sketch merges), inlined as a literal array so
    each probe is element_at + shift + AND inside the scan's codegen —
    O(1) per probe, no join and no shuffle until the survivors. At
    billions of fact rows the win is the shuffle writing only rows
    that can match."""
    from nabatshy_spark.operators.sketches import (
        bloom_bitmap,
        bloom_bits,
        bloom_pred,
    )

    num_hashes, num_bits = 5, 1024
    cust = load(spark, sf_dir, "customer")
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    words = bloom_bitmap(
        (r.bit for r in bloom_bits(seg, "c_custkey", num_hashes, num_bits).collect()),
        num_bits,
    )
    o = load(spark, sf_dir, "orders")
    pruned = o.filter(
        bloom_pred(F.col("o_custkey"), words, num_hashes, num_bits)
    )
    exact = pruned.join(
        F.broadcast(seg),
        pruned.o_custkey == seg.c_custkey,
        "left_semi",
    )
    return (
        exact.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
        .orderBy("yr")
    )


@query("customer_yearly_setops")
def customer_yearly_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET OPERATIONS surface (INTERSECT / EXCEPT — the one relational
    operator family the registry had not yet exercised): the 1995 and
    1996 active-customer sets compared as retained (INTERSECT), churned
    (1995 EXCEPT 1996) and new (1996 EXCEPT 1995) cohorts. Spark plans
    both as aggregate + left-semi/anti joins; inputs are
    distinct-custkey relations (dimension-sized), so each set op is one
    small shuffle."""
    o = load(spark, sf_dir, "orders")
    # Each yearly cohort is dimension-sized and consumed three ways
    # (direct count, intersect, subtract): checkpointed so the orders
    # scan + distinct run once per year, not once per set op — the
    # before-plan scanned orders 8× (round 12).
    a95 = (
        o.filter(F.year("o_orderdate") == 1995)
        .select("o_custkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a96 = (
        o.filter(F.year("o_orderdate") == 1996)
        .select("o_custkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    cohorts = [
        ("active_1995", a95),
        ("active_1996", a96),
        ("retained", a95.intersect(a96)),
        ("churned", a95.subtract(a96)),
        ("new", a96.subtract(a95)),
    ]
    out = None
    for name, df in cohorts:
        row = df.agg(F.count("*").alias("n_customers")).select(
            F.lit(name).alias("cohort"), "n_customers"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("cohort")


@query("nation_revenue_yoy_growth")
def nation_revenue_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: the lag-window KPI
    every warehouse dashboard carries. The fact table collapses to the
    (nation, year) aggregate FIRST; the lag window runs over that
    |nations|×|years| relation partitioned BY NATION (bounded
    partitions — never a global sort). try_divide keeps a first-year
    NULL a NULL, not a crash."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("__rev")
        )
    )
    w = Window.partitionBy("nation").orderBy("yr")
    prev = F.lag(F.col("__rev").cast("double")).over(w)
    return rev.select(
        "nation",
        "yr",
        F.round(F.col("__rev").cast("double"), 2).alias("revenue"),
        F.round(
            F.try_divide(F.col("__rev").cast("double") - prev, prev), 6
        ).alias("yoy_growth"),
    ).orderBy("nation", "yr")


@query("sequence_packing_plan")
def sequence_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing audit (greedy concat-stream packing:
    documents concatenated in doc order, a document belongs to the
    sequence where it STARTS, sequences overflow at boundaries rather
    than splitting documents) for a 2048-token budget, using the same
    ceil(chars/4) subword estimate as tokenizer_fertility. The packing
    assignment is floor(exclusive_prefix_tokens / budget) — one
    two-phase prefix sum over the corpus (stats.cumulative_sum_ordered,
    never a single-task sort), then a |sequences|-bounded aggregate
    collapsed to the one-row report training-export jobs gate on:
    sequence count, mean fill vs budget, docs per sequence, and how
    many boundary sequences overflowed.

    Complements export_shard_plan (hash sharding) and
    padding_efficiency (per-batch pad waste): this is the packed
    (padding-free) export shape."""
    from nabatshy_spark.operators.stats import cumulative_sum_ordered

    budget = 2048
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.ceil(F.col("n_chars") / F.lit(4.0)).alias("__tok")
    )
    cum = cumulative_sum_ordered(
        docs, [F.col("doc_id").asc()], "__tok", force="twophase"
    ).withColumn(
        "__seq",
        F.floor((F.col("__cum") - F.col("__tok")) / F.lit(budget)),
    )
    per_seq = cum.groupBy("__seq").agg(
        F.count("*").alias("__docs"), F.sum("__tok").alias("__tokens")
    )
    return per_seq.agg(
        F.count("*").alias("n_sequences"),
        F.sum("__docs").alias("n_docs"),
        F.sum("__tokens").alias("total_tokens"),
        F.round(
            F.sum("__tokens") / (F.count("*") * F.lit(budget)), 6
        ).alias("mean_fill"),
        F.min("__docs").alias("min_docs_per_seq"),
        F.max("__docs").alias("max_docs_per_seq"),
        F.count_if(F.col("__tokens") > budget).alias("n_overflow_seqs"),
    )


@query("spans_latency_exemplars")
def spans_latency_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency EXEMPLARS (the Grafana/OpenMetrics pattern: each
    histogram bucket carries one representative trace to click into):
    per (endpoint, power-of-two ms bucket), the span count plus the
    slowest span's ids — deterministic under duration ties via the
    unique span_id tiebreak (max duration, then min span_id), never
    max_by's undefined-on-ties pick.

    Scale: one scan → (endpoint, bucket) aggregate for counts+max, a
    self-join back on the max to pick the exemplar row — the argmax
    join touches only bucket-max spans. Complements
    spans_duration_histogram (counts only) with the drill-in handle."""
    from nabatshy_spark.plans.span_queries import load_spans

    df = load_spans(spark)
    ms = (F.col("duration_ns") / F.lit(1_000_000)).cast("long")
    b = df.select(
        F.col("name").alias("endpoint"),
        (F.length(F.bin(ms + 1)) - 1).alias("log2_ms_bucket"),
        "duration_ns",
        "span_id",
        "trace_id",
    )
    m = b.groupBy("endpoint", "log2_ms_bucket").agg(
        F.count("*").alias("n_spans"),
        F.max("duration_ns").alias("__maxd"),
    )
    return (
        b.join(m, ["endpoint", "log2_ms_bucket"])
        .filter(F.col("duration_ns") == F.col("__maxd"))
        .groupBy("endpoint", "log2_ms_bucket", "n_spans", "__maxd")
        .agg(
            F.min("span_id").alias("exemplar_span"),
            F.min_by("trace_id", "span_id").alias("exemplar_trace"),
        )
        .select(
            "endpoint",
            "log2_ms_bucket",
            "n_spans",
            (F.col("__maxd") / F.lit(1_000_000)).cast("long").alias("max_ms"),
            "exemplar_span",
            "exemplar_trace",
        )
        .orderBy("endpoint", "log2_ms_bucket")
    )


@query("chi2_priority_returnflag")
def chi2_priority_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between order priority and
    line-item return flag — the categorical-association audit next to
    the numeric drift family (psi_order_value_drift) and the DiD lift
    (did_purchase_lift): "does return behavior depend on priority?".
    Observed counts from ONE (priority, flag) aggregate; expected
    counts and the χ² sum ride the |priorities|×|flags| contingency
    relation with its margins broadcast back. Exact integer counts in,
    fixed double arithmetic out (rounded), so the oracle replays it
    bit-for-bit.

    Scale: one fact scan + one dimension-bounded aggregate; everything
    after is arithmetic on ≤ 15 rows."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    # The ≤15-row contingency relation is checkpointed: four consumers
    # (cells, both margins, the grand total) would otherwise each
    # re-run the fact join + aggregate — the before-plan scanned
    # lineitem and orders 4× each for a relation of 15 rows (round 12,
    # same move as spans_mad_outliers' median relation).
    obs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("l_returnflag").alias("flag"),
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    row_m = obs.groupBy("priority").agg(F.sum("n").alias("__rn"))
    col_m = obs.groupBy("flag").agg(F.sum("n").alias("__cn"))
    tot = obs.agg(F.sum("n").alias("__t"))
    cells = (
        obs.join(F.broadcast(row_m), "priority")
        .join(F.broadcast(col_m), "flag")
        .join(F.broadcast(tot))
        .withColumn(
            "__e",
            F.col("__rn").cast("double")
            * F.col("__cn").cast("double")
            / F.col("__t").cast("double"),
        )
        .withColumn(
            "__chi",
            (F.col("n").cast("double") - F.col("__e"))
            * (F.col("n").cast("double") - F.col("__e"))
            / F.col("__e"),
        )
    )
    return cells.agg(
        F.max("__t").alias("n_lineitems"),
        F.count("*").alias("n_cells"),
        (
            (F.count_distinct("priority") - 1)
            * (F.count_distinct("flag") - 1)
        ).alias("dof"),
        F.round(F.sum("__chi"), 6).alias("chi2"),
    )
