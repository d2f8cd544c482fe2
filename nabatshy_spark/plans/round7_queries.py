"""Round-7 queries: ML-data-prep splits (stratified k-fold, class
balancing), embedding evaluation (k-NN label eval, Mahalanobis
outliers), interval-union span analytics, storage advisors, graph
degree distributions, and weighted percentiles.  Registered into the
same QUERIES dict; oracles in plans/oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nabatshy_spark.catalog import load
from nabatshy_spark.plans.queries import query
from nabatshy_spark.plans.span_queries import load_spans


@query("stratified_kfold_assignment")
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified k-fold split (k=5) over the corpus:
    within each lang stratum, docs are ordered by md5(doc_id) and dealt
    round-robin into folds — every fold gets an EXACTLY balanced share
    of every stratum (sizes differ by ≤1), unlike plain hash-mod-k
    whose per-stratum balance is only in expectation. The eval-split
    primitive for quality-classifier training over curated corpora.

    Scale: one shuffle on the stratum key; the window is a
    rank-within-stratum (no global sort). Assignment is a pure
    function of (doc_id, lang) — reproducible across engines, stable
    under re-runs, and appends only ever shift fold sizes by the
    appended rows."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("fold", ((F.row_number().over(w) - 1) % 5).cast("int"))
        .groupBy("lang", "fold")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang", "fold")
    )


@query("class_balance_resample")
def class_balance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-class downsampling to a bounded imbalance ratio: each
    lang keeps at most 2× the smallest class's count, chosen
    deterministically by md5 rank — the class-balancing step before
    training a language-ID or quality model on skewed corpora.

    Scale: the class histogram is a dimension-sized aggregate (|langs|
    rows, broadcast); the keep decision is a rank-within-class window
    + filter — one shuffle on the class key, losers never shuffle
    anywhere else. Deterministic: re-runs and engine swaps keep the
    identical subset."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_before"))
    min_n = counts.agg(F.min("n_before").alias("__min"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    kept = (
        docs.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(min_n))
        .filter(F.col("__rn") <= 2 * F.col("__min"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_after"))
    )
    return (
        counts.join(kept, "lang")
        .select(
            "lang",
            "n_before",
            "n_after",
            F.round(F.col("n_after") / F.col("n_before"), 6).alias("kept_ratio"),
        )
        .orderBy("lang")
    )


@query("knn_label_eval")
def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label-propagation evaluation (k=5): hold out every 10th
    vector, predict its label by majority vote of its 5 nearest
    training vectors (exact cosine, ties → smaller label), and report
    per-label accuracy — the eval harness behind embedding-based
    quality/topic classifiers bootstrapped from a small labeled set.

    Scale: the eval set is broadcast (it is the SMALL side by
    construction); the corpus is scanned once, and per-eval top-k is a
    WindowGroupLimit (partial per-partition top-5, then final) over
    |eval|×|train| candidate rows — losers never survive the shuffle.
    Each side's norm is computed ONCE per row before the pair
    expansion, so the per-pair expression is just the dot fold — the
    norm folds are O(N+M), not O(N·M) (measured 3× on the interpreted
    higher-order-function path). The train side is rebalanced to the
    session's parallelism when the source arrives in fewer partitions
    (a 2 MB single-file scan would otherwise run the whole nested loop
    on one task); at 100 TB the scan is naturally parallel and the
    train side would first pass through the IVF/LSH pruner
    (operators/ivf.py) — this is the exact-reference twin."""
    emb = load(spark, sf_dir, "embeddings")

    def norm(col: str):  # noqa: ANN202 — sqrt of the self-dot fold
        return F.sqrt(
            F.aggregate(
                F.transform(
                    F.col(col), lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    evals = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("__qv"),
        F.col("label").alias("true_label"),
        norm("embedding").alias("__qn"),
    )
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("train_id"),
        F.col("embedding").alias("__tv"),
        F.col("label").alias("train_label"),
        norm("embedding").alias("__tn"),
    )
    # Rebalance only when the source arrives in fewer files than the
    # session's parallelism (inputFiles is driver-side metadata — no
    # job, unlike .rdd.getNumPartitions() which converts the plan). At
    # 100 TB the scan has thousands of splits and this never fires, so
    # the big side is never gratuitously shuffled.
    par = spark.sparkContext.defaultParallelism
    if len(emb.inputFiles()) < par:
        train = train.repartition(par)
    dot = F.aggregate(
        F.zip_with(
            F.col("__tv"),
            F.col("__qv"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = train.join(F.broadcast(evals)).select(
        "eval_id",
        "true_label",
        "train_id",
        "train_label",
        F.round(dot / (F.col("__tn") * F.col("__qn")), 6).alias("__cos"),
    )
    w_rank = Window.partitionBy("eval_id").orderBy(
        F.col("__cos").desc(), F.col("train_id").asc()
    )
    votes = (
        pairs.withColumn("__rk", F.row_number().over(w_rank))
        .filter(F.col("__rk") <= 5)
        .groupBy("eval_id", "true_label", "train_label")
        .agg(F.count("*").alias("__v"))
    )
    w_vote = Window.partitionBy("eval_id").orderBy(
        F.col("__v").desc(), F.col("train_label").asc()
    )
    pred = (
        votes.withColumn("__pr", F.row_number().over(w_vote))
        .filter(F.col("__pr") == 1)
        .select(
            "eval_id",
            "true_label",
            F.col("train_label").alias("pred_label"),
        )
    )
    return (
        pred.groupBy("true_label")
        .agg(
            F.count("*").alias("n_eval"),
            F.sum(
                (F.col("pred_label") == F.col("true_label")).cast("int")
            ).alias("n_correct"),
        )
        .select(
            "true_label",
            "n_eval",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n_eval"), 6).alias("accuracy"),
        )
        .orderBy("true_label")
    )


@query("embedding_outlier_mahal")
def embedding_outlier_mahal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier audit via diagonal Mahalanobis distance:
    per-dimension mean/variance over the corpus, then each vector's
    distance sqrt(Σ (x_d-μ_d)²/σ²_d); the 20 most anomalous vectors are
    flagged — the embedding-quality gate that catches collapsed,
    corrupt, or out-of-distribution vectors before they poison
    dedup/ANN stages. Top-k rather than a fixed radius because a χ₆₄
    distance concentrates hard around √64 — an absolute threshold is
    either empty or the whole corpus; "most anomalous k" is the form
    that stays meaningful at every corpus size.

    Scale: the stats relation is d rows (dimension-sized, broadcast);
    both passes are explode→sum aggregates with map-side partials —
    no all-pairs term anywhere, O(N·d) total."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("__d", "__x"),
    ).withColumn("__x", F.col("__x").cast("double"))
    stats = dims.groupBy("__d").agg(
        F.avg("__x").alias("__mu"),
        (F.avg(F.col("__x") * F.col("__x"))).alias("__msq"),
    ).withColumn("__var", F.col("__msq") - F.col("__mu") * F.col("__mu"))
    dist = (
        dims.join(F.broadcast(stats), "__d")
        .withColumn(
            "__z2",
            (F.col("__x") - F.col("__mu"))
            * (F.col("__x") - F.col("__mu"))
            / F.col("__var"),
        )
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum("__z2")).alias("__dist"))
    )
    return (
        dist.select(
            "vec_id", "label", F.round("__dist", 3).alias("mahal_dist")
        )
        .orderBy(F.col("mahal_dist").desc(), F.col("vec_id").asc())
        .limit(20)
    )


@query("spans_service_busy_time")
def spans_service_busy_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service BUSY time: the union of each service's span
    intervals (gaps-and-islands merge), so concurrent spans count
    wall-clock once — the utilization number raw duration sums
    overstate by the concurrency factor. Complements spans_concurrency
    (peak parallelism) with total occupied time.

    Scale: one shuffle on service, one running-max window per
    partition (sorted within service, never globally); island
    arithmetic is exact int64 ns."""
    sp = load_spans(spark).select(
        F.element_at(F.col("resource_attributes"), F.lit("service.name")).alias(
            "service_name"
        ),
        F.col("span_id"),
        F.col("start_time_unix_nano").alias("__s"),
        F.col("end_time_unix_nano").alias("__e"),
    ).filter(F.col("service_name").isNotNull())
    w = Window.partitionBy("service_name").orderBy("__s", "__e", "span_id")
    prev_max = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = sp.withColumn(
        "__new_island",
        F.when(prev_max.isNull() | (F.col("__s") > prev_max), 1).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = flagged.groupBy("service_name", "__island").agg(
        (F.max("__e") - F.min("__s")).alias("__busy"),
        F.count("*").alias("__n"),
    )
    return (
        islands.groupBy("service_name")
        .agg(
            F.sum("__n").alias("n_spans"),
            F.count("*").alias("n_islands"),
            F.sum("__busy").alias("busy_ns"),
        )
        .orderBy("service_name")
    )


# (table, string column) pairs the dictionary-encoding advisor profiles.
_DICT_COLS = [
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("customer", "c_mktsegment"),
    ("customer", "c_name"),
    ("part", "p_brand"),
    ("part", "p_type"),
    ("part", "p_name"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
]


@query("dictionary_encoding_advisor")
def dictionary_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-layout advisor for string columns: per column, the
    cardinality, average length, estimated plain-encoding bytes
    (Σ len) vs dictionary-encoding bytes (Σ distinct len + n·⌈log₂
    ndv⌉/8 index bits), and the verdict — the parquet-encoding
    decision a 100 TB layout job makes per column (complements
    parquet_layout_audit's file-level view with column-level encoding
    economics).

    Scale: ONE pruned scan per TABLE (round 12; was one scan + two
    exchanges per COLUMN): each table's profiled columns are stacked
    into (column_name, value) rows — same total bytes as the former
    per-column scans, since a columnar scan of k columns reads exactly
    what k single-column scans read — then a single
    groupBy(column_name, value) with map-side partial aggregation
    collapses each task to its local per-column vocabulary before the
    ONE shuffle, and every statistic falls out of the (column, value,
    count) relation in one dimension-sized aggregate: n_rows = Σ count,
    plain bytes = Σ len·count, ndv = |groups|, dictionary payload =
    Σ len. Identical integers to the per-column form (rows-equal
    asserted before the rewrite landed): stack keeps NULL values as
    rows, so NULL groups count toward n_rows and ndv exactly as
    before, and length(NULL) drops out of both byte sums. The literal
    column-name spine (left join) preserves the empty-table contract —
    a column with no rows still reports n_rows = 0, ndv = 0 (ADVICE
    r11); its nullability is declared so the output schema is
    unchanged."""
    from pyspark.sql.types import StringType, StructField, StructType

    by_table: dict[str, list[str]] = {}
    for tname, c in _DICT_COLS:
        by_table.setdefault(tname, []).append(c)
    parts = []
    for tname, cols in by_table.items():
        args = ", ".join(f"'{tname}.{c}', {c}" for c in cols)
        parts.append(
            load(spark, sf_dir, tname)
            .select(*cols)
            .select(
                F.expr(f"stack({len(cols)}, {args})").alias(
                    "column_name", "__v"
                )
            )
        )
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)
    g = stacked.groupBy("column_name", "__v").agg(F.count("*").alias("__n"))
    stats = g.groupBy("column_name").agg(
        F.sum("__n").alias("__nr"),
        F.count("*").alias("__ndv"),
        F.sum(F.length("__v") * F.col("__n")).alias("plain_bytes"),
        # Dictionary payload = Σ length over DISTINCT VALUES (what
        # the dictionary page stores).
        F.sum(F.length("__v")).alias("__payload"),
    )
    spine = spark.createDataFrame(
        [(f"{t}.{c}",) for t, c in _DICT_COLS],
        StructType([StructField("column_name", StringType(), False)]),
    )
    bits = F.ceil(F.log2(F.col("ndv")))
    return (
        spine.join(stats, "column_name", "left")
        .select(
            "column_name",
            F.coalesce(F.col("__nr"), F.lit(0)).alias("n_rows"),
            F.coalesce(F.col("__ndv"), F.lit(0)).alias("ndv"),
            "plain_bytes",
            "__payload",
        )
        .select(
            "column_name",
            "n_rows",
            "ndv",
            F.round(F.col("plain_bytes") / F.col("n_rows"), 2).alias(
                "avg_len"
            ),
            "plain_bytes",
            (
                F.col("__payload") + F.floor((F.col("n_rows") * bits + 7) / 8)
            ).cast("long").alias("dict_bytes"),
        )
        .select(
            "*",
            F.when(F.col("dict_bytes") < F.col("plain_bytes"), "dict")
            .otherwise("plain")
            .alias("recommend"),
        )
        .orderBy("column_name")
    )


@query("degree_distribution_trade")
def degree_distribution_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part↔customer trade graph (how many
    distinct customers bought each part), log₂-bucketed — the
    skew-shape diagnostic that decides salting/broadcast strategy for
    the graph algorithms (pagerank_trade, lpa_trade_communities) and
    documents whether a hub-node blowup is lurking.

    Scale: one orderkey join (both sides bucketable), one distinct on
    (part, customer) — the heavy shuffle — then dimension-sized
    aggregates; the histogram is |buckets| rows."""
    from nabatshy_spark.operators import graph

    # Round 11: the distinct (part, cust) relation comes from the
    # shared bipartite edge artifact (already distinct by build).
    deg = (
        graph.shared_part_cust_edges(spark, sf_dir)
        .groupBy("part")
        .agg(F.count("*").alias("__deg"))
    )
    return (
        deg.withColumn(
            "degree_bucket", F.floor(F.log2(F.col("__deg"))).cast("int")
        )
        .groupBy("degree_bucket")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("__deg").alias("min_degree"),
            F.max("__deg").alias("max_degree"),
        )
        .orderBy("degree_bucket")
    )


@query("weighted_percentiles_brand")
def weighted_percentiles_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price percentiles per brand (p25/p50/p75/p90):
    the smallest extended price whose cumulative quantity share reaches
    p — the general weighted-quantile operator (weighted_median_price
    is its single-quantile global special case), the per-unit-weighted
    distribution view plain percentiles (which weight each ORDER LINE
    equally) misstate.

    Scale: collapse to distinct (brand, price) levels first — the
    windows then run over the LEVEL relation, bounded by price
    cardinality, not fact rows; one shuffle on brand. Cumulative
    comparisons are double ops on integer-valued quantities — exact
    and engine-identical."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_extendedprice").alias("__price"),
        F.col("l_quantity").alias("__w"),
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lv = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "__price")
        .agg(F.sum("__w").alias("__w"))
    )
    w = Window.partitionBy("p_brand").orderBy("__price")
    w_full = Window.partitionBy("p_brand")
    cum = lv.withColumn(
        "__cum",
        F.sum("__w").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("__tot", F.sum("__w").over(w_full))
    aggs = [
        F.round(
            F.min(
                F.when(
                    F.col("__cum") >= F.lit(pq) * F.col("__tot"),
                    F.col("__price"),
                )
            ),
            2,
        ).alias(name)
        for pq, name in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.9, "p90")]
    ]
    return cum.groupBy("p_brand").agg(*aggs).orderBy("p_brand")


@query("image_dhash_near_dups")
def image_dhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup groups via dHash
    (operators/multimodal.image_dhash): decode → grayscale → 9×8
    nearest-resize → 64 horizontal-gradient-sign bits, then group by
    hash — collapses "same image at a different exposure" duplicates
    that exact pixel dedup (image_dup_groups) and byte hashing both
    miss, because dHash depends only on gradient signs, which a global
    brightness shift leaves untouched.

    The synthetic ingest (attach_patterned_images) makes the check
    analytic: pattern = id%4, brightness = (id·7)%64, so the hash
    groups must be EXACTLY the id%4 classes — the SQL oracle derives
    the expected groups from id arithmetic while the Spark side earns
    them through the real PNG encode→decode→resize→hash path (the
    attach_audio differential-check trick applied to perceptual
    hashing).

    Scale: hashing is a narrow Arrow-batched stage over the blob scan;
    the group-by shuffles 8-byte hashes, never pixels."""
    from nabatshy_spark.operators import multimodal

    docs = load(spark, sf_dir, "documents")
    h = multimodal.image_dhash(
        multimodal.attach_patterned_images(docs, "doc_id")
    )
    return (
        h.filter(F.col("decode_error").isNull())
        .groupBy("dhash")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count("*").alias("n_images"),
        )
        .select("canonical_doc", "n_images")
        .orderBy("canonical_doc")
    )


@query("kcore_trade_pruning")
def kcore_trade_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round (25,25)-core peel of the part↔customer trade
    graph (operators/graph.bipartite_core_prune): three simultaneous
    degree-prune rounds, one audit row per round with surviving
    node/edge counts — the dense-core extraction that precedes
    community detection or co-purchase embedding training (hubs-only
    subgraph), and the iterative-graph operator class with an EXACTLY
    unrollable SQL oracle (unlike run-to-fixpoint forms).

    Scale: per round two groupBy-count shuffles + two semi-joins;
    edges localCheckpoint per round so lineage stays one round deep."""
    from nabatshy_spark.operators import graph

    # Round 11: the distinct (part, cust) pair relation is served from
    # the shared bipartite edge artifact. Round 12: the artifact is
    # distinct BY BUILD, so the operator's dedup exchange is skipped
    # (edges_distinct=True — §2.4, a distinct on already-unique data).
    edges = graph.shared_part_cust_edges(spark, sf_dir)
    return graph.bipartite_core_prune(
        edges, "part", "cust", k=25, rounds=3, edges_distinct=True
    )


@query("event_value_twap")
def event_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type (TWAP): each event's
    value holds until the user's next event, so the average weighs
    values by HOW LONG they were in force, not how often they were
    sampled — the metric plain avg() misstates whenever emission rate
    correlates with value (bursty sessions). The plain average rides
    along to make the bias visible.

    Scale: one shuffle on user_id, a lead() window per user (sorted
    within user only), then an ordinary per-type aggregate. Durations
    are exact int64 microseconds; only the final ratio rounds."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__us"),
    )
    w = Window.partitionBy("user_id").orderBy("__us", "event_id")
    held = (
        ev.withColumn("__nxt", F.lead("__us").over(w))
        .filter(F.col("__nxt").isNotNull())
        .withColumn("__dur", F.col("__nxt") - F.col("__us"))
    )
    return (
        held.groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("__dur").alias("held_us"),
            F.round(
                F.sum(F.col("value") * F.col("__dur")) / F.sum("__dur"), 6
            ).alias("twap"),
            F.round(F.avg("value"), 6).alias("plain_avg"),
        )
        .orderBy("event_type")
    )


@query("part_abc_classes")
def part_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto-class) analysis of parts by revenue: sort parts by
    revenue descending, classify by cumulative share — A up to 80%,
    B up to 95%, C the tail — the inventory-policy classification
    behind "which 20% of parts earn 80% of revenue". Complements
    pareto_suppliers (a 2-D skyline) with the 1-D cumulative-share
    classing warehouses actually run.

    Scale: the fact table collapses to one row per part FIRST (the
    only full shuffle); the cumulative share then runs through
    stats.cumulative_sum_ordered's TWO-PHASE partitioned prefix sum —
    range-partition on (revenue desc, partkey), per-partition running
    sums, broadcast prefix offsets — never a global-order window,
    because the part dimension at production scale (~20B parts at
    100×) cannot sort on one task. The (rev, partkey) order is total,
    so the two-phase result is bit-identical to the single-sort form
    (differential unit in test_round8_ops). Revenue sums are exact
    DECIMAL; shares round after the cumulative division."""
    from nabatshy_spark.operators.stats import cumulative_sum_ordered

    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(28,6)"
            )
        ).alias("__rev")
    )
    classed = (
        cumulative_sum_ordered(
            per_part,
            [F.col("__rev").desc(), F.col("l_partkey").asc()],
            "__rev",
            force="twophase",
        )
        .withColumn("__share", F.col("__cum") / F.col("__tot"))
        .withColumn(
            "abc_class",
            F.when(F.col("__share") <= 0.80, "A")
            .when(F.col("__share") <= 0.95, "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(
                (F.sum("__rev") / F.max("__tot")).cast("double") * 100, 4
            ).alias("revenue_share_pct"),
        )
        .orderBy("abc_class")
    )


# Static price bands for the PSI drift bins — fixed edges (not
# quantiles) so bin membership is engine-identical and stable across
# scale factors, the way a production drift monitor pins its bins at
# model-training time.
_PSI_EDGES = [50_000, 100_000, 150_000, 200_000, 300_000]


@query("psi_order_value_drift")
def psi_order_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution per
    year against the first year — THE production-ML drift gate for
    numeric features (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25
    retrain). Complements the text-side drift family (ks_source_drift,
    source_kl_drift) with the binned-numeric form monitors actually
    run: fixed price bands, Laplace-smoothed proportions, Σ (p−q)·ln(p/q).

    Scale: one scan → (year, band) counts (a dimension-sized
    aggregate); the PSI algebra runs on |years|×|bands| rows. Bands are
    static so the monitor never recomputes quantiles on 100 TB."""
    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), F.col("o_totalprice").alias("__p")
    )
    bucket = F.lit(len(_PSI_EDGES))
    for i, e in enumerate(reversed(_PSI_EDGES)):
        bucket = F.when(
            F.col("__p") < e, len(_PSI_EDGES) - 1 - i
        ).otherwise(bucket)
    # Round 12 measured (and rejected) a localCheckpoint on this
    # |years|×|bands| relation: solo 0.57 → 0.72 s. The three orders
    # scans it would save are tiny and run CONCURRENTLY on idle cores,
    # while the checkpoint serializes a materialize-then-compute
    # barrier — the dup_ngram_coverage round-11 lesson again.
    counts = o.withColumn("__b", bucket).groupBy("yr", "__b").agg(
        F.count("*").alias("__n")
    )
    years = counts.select("yr").distinct()
    bins = spark.range(len(_PSI_EDGES) + 1).select(F.col("id").alias("__b"))
    full = (
        years.crossJoin(F.broadcast(bins))
        .join(counts, ["yr", "__b"], "left")
        .withColumn("__n", F.coalesce("__n", F.lit(0)))
    )
    n_bins = len(_PSI_EDGES) + 1
    tot = Window.partitionBy("yr")
    props = full.withColumn(
        "__prop",
        (F.col("__n") + 0.5) / (F.sum("__n").over(tot) + 0.5 * n_bins),
    )
    base_yr = props.agg(F.min("yr").alias("__by"))
    base = (
        props.join(F.broadcast(base_yr), props.yr == F.col("__by"))
        .select(F.col("__b"), F.col("__prop").alias("__q"))
    )
    return (
        props.join(base, "__b")
        .groupBy("yr")
        .agg(
            F.sum("__n").alias("n_orders"),
            F.round(
                F.sum(
                    (F.col("__prop") - F.col("__q"))
                    * F.log(F.col("__prop") / F.col("__q"))
                ),
                6,
            ).alias("psi"),
        )
        .orderBy("yr")
    )


@query("compression_quality_flags")
def compression_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compressibility profile + flag counts: documents
    whose zlib ratio drops under 0.3 are repetition/boilerplate
    suspects (operators/textanalysis.compression_ratio) — the
    compression-based quality signal that catches templated text the
    token-level heuristics (gopher_rule_flags, text_repetition) can
    miss when the repetition unit is longer than their n-grams.

    Rows-only by design: no SQL zlib, so there is no cross-engine
    oracle; the signal's semantics are pinned by crafted-text units
    (repetitive text → low ratio, prose → higher) and the output here
    is a deterministic per-source aggregate of a deterministic
    per-doc ratio.

    Scale: narrow Arrow-batched stage over (id, text), one
    dimension-sized group-by; nothing shuffles text."""
    from nabatshy_spark.operators import textanalysis

    docs = load(spark, sf_dir, "documents")
    rat = textanalysis.compression_ratio(docs, "doc_id", "text")
    joined = rat.join(docs.select("doc_id", "source"), "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ratio"), 4).alias("avg_ratio"),
            F.round(F.min("ratio"), 4).alias("min_ratio"),
            F.sum((F.col("ratio") < 0.3).cast("int")).alias("n_flagged"),
        )
        .orderBy("source")
    )


@query("supplier_single_source_risk")
def supplier_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source supply risk: for each part, the share of its
    shipped quantity coming from its TOP supplier, banded into risk
    classes (≥90% sole-sourced / 60-90% concentrated / <60%
    diversified) — the procurement-risk audit a supply-chain team runs
    before a capacity shock; complements supplier_concentration
    (market-level HHI) with the per-part sourcing view.

    Scale: one (part, supplier) rollup — the only fact shuffle — then
    a per-part max/sum over the rollup (bounded by |parts|·|suppliers
    per part|); the band histogram is 3 rows."""
    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("__q")
    )
    per_part = ps.groupBy("l_partkey").agg(
        F.max("__q").alias("__top"),
        F.sum("__q").alias("__tot"),
        F.count("*").alias("n_suppliers"),
    )
    banded = per_part.withColumn(
        "__share", F.col("__top") / F.col("__tot")
    ).withColumn(
        "risk_band",
        F.when(F.col("__share") >= 0.9, "sole_sourced")
        .when(F.col("__share") >= 0.6, "concentrated")
        .otherwise("diversified"),
    )
    return (
        banded.groupBy("risk_band")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("__share"), 6).alias("avg_top_share"),
            F.round(F.avg("n_suppliers"), 4).alias("avg_suppliers"),
        )
        .orderBy("risk_band")
    )


@query("embedding_label_separation")
def embedding_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space class-separation audit: per label, the average
    cosine of members to their OWN label centroid vs to their nearest
    FOREIGN centroid, and the margin between the two — the
    Davies-Bouldin-flavored health check that tells you whether labels
    are even separable in this embedding space before training a
    classifier on it (complements embedding_label_drift, which tracks
    movement, not separability).

    Scale: centroids are a |labels|×d aggregate (dimension-sized,
    broadcast); each vector computes d-length folds against ≤|labels|
    centroid arrays — O(N·L·d) scan work, no pairwise term."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("__d", "__x")
    ).withColumn("__x", F.col("__x").cast("double"))
    cent = (
        dims.groupBy("label", "__d")
        .agg(F.avg("__x").alias("__m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__d"), F.col("__m")))
                ),
                lambda s: s["__m"],
            ).alias("__cv")
        )
        .select(F.col("label").alias("c_label"), "__cv")
    )

    def _norm(col):  # sqrt of the self-dot fold — engine-portable
        return F.sqrt(
            F.aggregate(
                F.transform(col, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    # Hoist each side's norm out of the vector×centroid expansion (the
    # knn_label_eval lesson: HOF folds are interpreted, so the per-pair
    # expression should be the dot alone — norms are O(N+L), not O(N·L)).
    cent = cent.withColumn("__cn", _norm(F.col("__cv")))
    vecs = emb.withColumn("__vn", _norm(F.col("embedding")))
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.col("__cv"), lambda x, y: x.cast("double") * y
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = vecs.join(F.broadcast(cent)).withColumn(
        "__cos", dot / (F.col("__vn") * F.col("__cn"))
    )
    own = scored.filter(F.col("label") == F.col("c_label")).select(
        "vec_id", "label", F.col("__cos").alias("__own")
    )
    foreign = (
        scored.filter(F.col("label") != F.col("c_label"))
        .groupBy("vec_id")
        .agg(F.max("__cos").alias("__best_foreign"))
    )
    return (
        own.join(foreign, "vec_id")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("__own"), 6).alias("avg_intra_cos"),
            F.round(F.avg("__best_foreign"), 6).alias("avg_best_foreign_cos"),
            F.round(F.avg(F.col("__own") - F.col("__best_foreign")), 6).alias(
                "separation_margin"
            ),
        )
        .orderBy("label")
    )


@query("percentile_accuracy_audit")
def percentile_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-grading calibration of the approx-percentile switch: per
    event type, exact p50/p95/p99 of value next to
    ``approx_percentile`` at the default accuracy, with the worst
    relative error — the number that justifies (or vetoes) swapping
    F.percentile for the sketch at 100 TB (SURVEY §2.4 A3 documents
    the switch; this query measures what it costs). Rows-only by
    design: the sketch's estimates are engine-specific, so there is no
    cross-engine oracle — the exact percentiles ARE the in-row ground
    truth, which is stronger than an external oracle could be.

    Scale: the exact side is the expensive one (full sort per group) —
    at 100 TB only the approx side runs and this audit runs on a
    sample; both sides here are one grouped aggregate."""
    ev = load(spark, sf_dir, "events")
    pcts = [0.5, 0.95, 0.99]
    exact = [
        F.round(F.expr(f"percentile(value, {p})"), 6).alias(
            f"exact_p{int(p * 100)}"
        )
        for p in pcts
    ]
    approx = [
        F.round(F.expr(f"approx_percentile(value, {p})"), 6).alias(
            f"approx_p{int(p * 100)}"
        )
        for p in pcts
    ]
    out = ev.groupBy("event_type").agg(*exact, *approx)
    rel_errs = [
        F.abs(
            F.col(f"approx_p{int(p * 100)}") - F.col(f"exact_p{int(p * 100)}")
        )
        / F.abs(F.col(f"exact_p{int(p * 100)}"))
        for p in pcts
    ]
    return (
        out.withColumn("max_rel_err", F.round(F.greatest(*rel_errs), 6))
        .orderBy("event_type")
    )
