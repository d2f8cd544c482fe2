"""Extension query registry (SURVEY §2.11): dedup, similarity search,
text analysis, multimodal — the training-data-pipeline surface over the
``documents`` and ``embeddings`` tables. Registered into the same
QUERIES dict as the core queries; oracles in plans/oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nabatshy_spark.catalog import load
from nabatshy_spark.operators import (
    dedup,
    joins,
    multimodal,
    pii,
    sampling,
    sessions,
    similarity,
    textanalysis,
)
from nabatshy_spark.plans.queries import query


def _parquet_rows(sf_dir: str, table: str) -> int:
    """Row count from the parquet footer — driver-local metadata read,
    no Spark job; the cheap cardinality bound semi-join sizing needs."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


@query("dedup_exact")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via sha256 hash-groupBy: one survivor (min doc_id)
    per distinct content + duplicate count. The shuffle key is the
    32-byte digest, never the document body."""
    return dedup.exact_dedup(load(spark, sf_dir, "documents"), "doc_id", "text")


@query("dedup_ngram_jaccard")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5) via
    inverted-index self-join, with the document-frequency cap
    (max_df=200) on candidate generation: join cost Σ min(df, 200)²
    stays bounded on boilerplate-heavy corpora, and verification over
    FULL shingle sets keeps the result exact (oracle-checked).

    Served from the fingerprint-keyed shared pair materialization
    (dedup.shared_ngram_pairs) — eight registry queries consume this
    exact relation, so the posting join runs once per corpus version,
    not once per question."""
    return dedup.shared_ngram_pairs(spark, sf_dir)


@query("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact verification: 64 bands × 2
    rows gives P[miss | J≥0.5] ≤ (1-0.25)^64 ≈ 1e-8, so the oracle is
    the exact-Jaccard SQL — the scale path produces the exact answer.
    max_bucket=200 drops hot band buckets (boilerplate collisions)
    from pair expansion; a true pair needs every one of its ~64
    colliding bands hot to be missed. Signatures are served from the
    fingerprint-keyed artifact (dedup.shared_minhash_signatures —
    round 12): the seeded signature relation is deterministic per
    corpus, so the pandas-UDF stage is the once-per-corpus build;
    banding + candidate expansion + exact verification stay per-run."""
    return dedup.minhash_lsh_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.5,
        max_bucket=200,
        sig_override=dedup.shared_minhash_signatures(spark, sf_dir, n=3),
    )


@query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3) via the 4×15-bit band
    pigeonhole join — exact result, no N² compare."""
    return dedup.simhash_pairs(load(spark, sf_dir, "documents"), "doc_id", "text")


@query("dedup_embedding")
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.45): EXACT all-pairs
    via blocked BLAS matrix products (replicate-to-block-pair tasks →
    one matmul per task) — no nested-loop join in the plan (asserted in
    test_plans.py). Exact because this corpus has no cosine gap at the
    threshold, so LSH with recall≈1 would degenerate to all-candidates
    (measured; see operators/dedup.py docstring)."""
    return dedup.embedding_dup_pairs(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.45
    )


@query("dedup_embedding_clustered")
def dedup_embedding_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-pruned EXACT embedding dedup — same result set (and same
    oracle) as dedup_embedding, but compute is Σ|i|·|j| over k-means
    cluster pairs surviving the ball-cover bound instead of N²/2: the
    sub-quadratic 100 TB path (SemDeDup-shaped, made exact; see
    operators/dedup.py::embedding_dup_pairs_clustered, curve in
    SCALE.md)."""
    return dedup.embedding_dup_pairs_clustered(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        threshold=0.45, k=8,
    )


@query("audio_wav_features")
def audio_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV decode (stdlib wave) over a binary audio column: the
    deterministic square-wave synth (operators/multimodal.py
    attach_audio) makes every decoded feature analytically known, so
    the oracle checks the actual byte-level decode, not a fake."""
    return multimodal.audio_features(
        multimodal.attach_audio(load(spark, sf_dir, "documents"), "doc_id")
    ).select(
        "doc_id", "sample_rate", "n_channels", "n_samples", "duration_s", "rms"
    )


@query("video_frame_sample")
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a keyframe-array video column (every 2nd of
    4 PNG frames, decoded for real by the stdlib codec); per-frame
    mean pixel is analytic so the oracle is exact."""
    return multimodal.frame_sample_features(
        multimodal.attach_frames(load(spark, sf_dir, "documents"), "doc_id"),
        every_n=2,
    ).select("doc_id", "frame_idx", "width", "height", "mean_pixel")


@query("kmeans_embeddings")
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means over the embedding table (k=4,
    2 rounds): per-round centroid literals → narrow argmin scan →
    k·dim-group mean update (operators/clustering.py). Exactly
    reproducible, so the oracle replays both rounds in SQL."""
    from nabatshy_spark.operators import clustering

    return clustering.kmeans(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=4, iters=2
    )


@query("decontaminate_corpus")
def decontaminate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.py:decontaminate):
    training docs sharing ≥3 distinct word 3-grams with the held-out
    eval slice (doc_id % 50 == 0 stands in for the benchmark table)
    are flagged with their hit counts. The eval side's shingle set is
    broadcast — the corpus scans once and never shuffles."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return dedup.decontaminate(
        corpus, bench, "doc_id", "text", n=3, min_hits=3
    )


@query("ann_cosine_topk")
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 neighbours of vec_id 0 —
    broadcast query vector + TakeOrderedAndProject."""
    return similarity.cosine_topk(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", query_id=0, k=10
    )


@query("ann_lsh_topk")
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH bucketing + exact
    rerank of candidates. Probabilistic recall → no SQL oracle (driver
    records a rows-only check); tests measure recall vs brute force."""
    return similarity.lsh_topk(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", query_id=0, k=10
    )


@query("text_stats")
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics (token/char counts, avg token
    length, stopword ratio, blended quality score)."""
    return textanalysis.text_stats(load(spark, sf_dir, "documents"), "doc_id", "text")


@query("text_langid")
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language-ID heuristic with deterministic argmax."""
    return textanalysis.lang_scores(load(spark, sf_dir, "documents"), "doc_id", "text")


@query("text_token_counts")
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate."""
    return textanalysis.token_counts(load(spark, sf_dir, "documents"), "doc_id", "text")


@query("text_fingerprint")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized md5 fingerprint + 60-bit numeric shard key."""
    return textanalysis.fingerprints(load(spark, sf_dir, "documents"), "doc_id", "text")


@query("pii_redaction")
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/pii.py): deterministic PII snippets are
    planted expression-side (doc_id % 4 picks email/phone/SSN/IPv4), so
    the regex redaction + per-type counts are verified end-to-end by an
    exact DuckDB oracle running the same plant + same patterns."""
    docs = load(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 1,
                F.concat(
                    F.lit(" call 555-867-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 2,
                F.concat(
                    F.lit(" ssn 123-45-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit(" host 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".7"),
                )
            ),
        ),
    )
    return pii.redact_pii(planted, "doc_id", "text")


@query("text_repetition")
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repeated-n-gram quality filter
    (operators/textanalysis.py:repetition_stats): word 2-/3-gram dup
    ratios per document, exact oracle."""
    return textanalysis.repetition_stats(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column plumbing: attach payload → Arrow-batched
    mapInPandas feature extraction (size + sha256). The decode step is
    a documented stub; the pipeline shape is real."""
    return multimodal.extract_features(
        multimodal.attach_binary(load(spark, sf_dir, "documents"), "doc_id", "text")
    )


@query("sessionization")
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function sessionization (lag + running sum, 30-min gap)
    with per-session rollup — standard log-analytics extension beyond
    the reference's surface (SURVEY §2.8)."""
    from nabatshy_spark.operators.sessions import session_stats

    return session_stats(load(spark, sf_dir, "events"))


@query("topk_per_group")
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per event type via row_number window."""
    from nabatshy_spark.operators.sessions import topk_per_group

    return topk_per_group(
        load(spark, sf_dir, "events"), "event_type", "value", "event_id", k=3
    ).select("event_type", "event_id", "value", "rank")


@query("endpoint_stats_approx")
def endpoint_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented 100 TB switch of endpoint_stats, executable:
    t-digest percentile_approx + HLL approx_count_distinct (mergeable
    sketches, bounded memory). Approximate ⇒ rows-only check; the
    tolerance test lives in tests/test_extensions.py."""
    from pyspark.sql import functions as F

    li = load(spark, sf_dir, "lineitem")
    p = F.percentile_approx("l_extendedprice", F.lit([0.5, 0.95, 0.99]), F.lit(10000))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("call_count"),
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            p.alias("__p"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "call_count",
            "approx_parts",
            F.col("__p")[0].alias("p50_price"),
            F.col("__p")[1].alias("p95_price"),
            F.col("__p")[2].alias("p99_price"),
        )
    )


@query("dedup_embedding_lsh")
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs — the scale path of
    dedup_embedding (probabilistic recall ⇒ rows-only check; overlap
    measured in tests)."""
    return similarity.lsh_dup_pairs(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.45
    )


@query("cube_pricing")
def cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — grouping-sets surface the
    reference lacks (SURVEY §2.4 'not present'), native in both
    engines."""
    from pyspark.sql import functions as F

    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@query("distinct_customers_by_priority")
def distinct_customers_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) — absent from the reference (SURVEY §2.4);
    exact distinct per group (the approx twin is approx_count_distinct
    in endpoint_stats_approx)."""
    from pyspark.sql import functions as F

    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query("asof_join_orders")
def asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.3 'not present' — extension): for each
    event, the o_orderdate of the latest order (key: user_id ≡
    o_custkey mod 150) at or before the event time. Union +
    last-value-window — one shuffle, no range cross product. The
    matched date (value-determined) is projected so boundary ties
    can't make the output nondeterministic."""
    from pyspark.sql import functions as F

    from nabatshy_spark.operators.joins import asof_join

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load(spark, sf_dir, "orders")
    return asof_join(
        ev,
        orders,
        left_key=F.col("user_id"),
        right_key=F.col("o_custkey") % 150,
        left_ts=F.col("ts"),
        right_ts=F.col("o_orderdate"),
        payload={"matched_date": F.col("o_orderdate")},
    )


@query("pivot_status_price")
def pivot_status_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (SURVEY §2.4 'not present' — extension): order totals by
    priority × status, statuses as columns."""
    from pyspark.sql import functions as F

    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )


@query("range_join_events")
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range join (SURVEY §2.3 'not present' — extension): error
    events paired with purchase events within 60 seconds, via bucketed
    equi-join (no cross product). Aggregated per error event to keep
    the output compact."""
    from pyspark.sql import functions as F

    from nabatshy_spark.operators.joins import range_join_buckets

    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pur_id"), F.col("ts").alias("pur_ts")
    )
    pairs = range_join_buckets(
        errors, purchases, F.col("err_ts"), F.col("pur_ts"), max_gap_seconds=60
    )
    return pairs.groupBy("err_id").agg(
        F.count("*").alias("n_nearby"),
        F.min("pur_id").alias("first_pur_id"),
    )


@query("text_tfidf_top_terms")
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (corpus-statistics text
    analysis; single corpus explode, df via window count — no join)."""
    return textanalysis.tfidf_top_terms(
        load(spark, sf_dir, "documents"), "doc_id", "text", k=3
    )


@query("sample_hash")
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% consistent sample of documents via md5-prefix
    hash sampling (reproducible across engines and reruns; pure filter,
    no shuffle, no RNG)."""
    return sampling.hash_sample(
        load(spark, sf_dir, "documents"), "doc_id", bps=6554
    ).select("doc_id", "lang", "source")


@query("sample_stratified")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-25% longest documents via percent_rank —
    quality-filtered stratified sampling for corpus curation."""
    return sampling.stratified_topfrac(
        load(spark, sf_dir, "documents"), "lang", "n_chars", "doc_id", frac=0.25
    )


@query("text_normalize")
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization pass (lowercase / punct→space / collapse
    / trim) + token count; the JVM-side pre-pass feeding fingerprints."""
    return textanalysis.normalize_text(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query("dedup_components")
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: exact 3-gram Jaccard pairs (threshold 0.5)
    grouped into connected components by alternating large-star /
    small-star rounds (O(log n) convergence); component = min doc_id
    reachable. Pairs come from the shared materialization
    (dedup.shared_ngram_pairs)."""
    pairs = dedup.shared_ngram_pairs(spark, sf_dir)
    return dedup.connected_components(pairs)


@query("event_funnel")
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase ordered funnel over events: per-step
    user counts + overall conversion rate in one declarative plan."""
    return sessions.funnel(
        load(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


@query("dedup_pipeline")
def dedup_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup composition: exact content-hash dedup, then
    3-gram Jaccard (≥0.5) components over survivors, keep min-id per
    cluster; returns the surviving corpus rows."""
    return dedup.dedup_pipeline(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.5,
        max_df=200,
    ).select("doc_id", "lang", "source")


@query("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via the IVF file layout: embeddings written
    partitioned by coarse LSH cell, probe list → partition pruning →
    exact cosine rerank (nprobe=8 of 16 cells). The index comes from
    ``ivf.ensure_ivf`` — content-fingerprinted and staging-then-rename
    published, so a changed embeddings table rebuilds and a concurrent
    or failed build never serves a partial layout. Probabilistic recall
    → no SQL oracle (driver records a rows-only check); tests assert
    the recall shape, the PartitionFilters plan, and the rebuild-on-
    change lifecycle."""
    import os as _os

    from nabatshy_spark.operators import ivf

    emb = load(spark, sf_dir, "embeddings")
    qrow = emb.filter(emb.vec_id == 0).first()
    if qrow is None:  # empty table: no query vector, empty result
        return spark.createDataFrame([], "vec_id: long, cos: double")
    path = ivf.ensure_ivf(spark, _os.path.join(sf_dir, "embeddings.parquet"))
    qvec = [float(x) for x in qrow["embedding"]]
    return ivf.ivf_topk(spark, path, qvec, k=10, cell_bits=4, nprobe=8)


@query("corpus_length_stats")
def corpus_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus length distribution (count, avg, p50/p95/p99
    of n_chars, total chars) — the curation dashboard query a
    training-data pipeline watches; one partial-agg shuffle of ~|source|
    groups."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.percentile("n_chars", F.lit(0.5)).alias("p50_chars"),
        F.percentile("n_chars", F.lit(0.95)).alias("p95_chars"),
        F.percentile("n_chars", F.lit(0.99)).alias("p99_chars"),
        F.sum("n_chars").alias("total_chars"),
    )


@query("skew_salted_value_by_user")
def skew_salted_value_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase count+sum over events grouped by user —
    the salted aggregation produces results identical to the plain
    groupBy (which is what the oracle checks); the salt exists to split
    a hot user across reducers at scale."""
    from pyspark.sql import functions as F

    from nabatshy_spark.operators.skew import salted_count_sum

    ev = load(spark, sf_dir, "events")
    out = salted_count_sum(ev, ["user_id"], "value", salt_buckets=16)
    return out.select(
        "user_id", "n", F.round(F.col("sum_value"), 6).alias("sum_value")
    )


@query("props_json_stats")
def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time JSON path extraction (surface the reference lacks —
    SURVEY §2.7 'not present'): pull props.k out of the JSON string
    column and aggregate per event type. get_json_object is codegen'd;
    at scale the answer is to materialize hot paths as columns at
    ingest, but ad-hoc extraction must still work."""
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query("sample_weighted")
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling / domain reweighting: keep doc with
    probability least(n_chars/200, 1) via the deterministic per-key
    uniform — reproducible mixture, pure filter."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    w = F.least(F.col("n_chars") / F.lit(200.0), F.lit(1.0))
    return sampling.weighted_sample(docs, "doc_id", w).select(
        "doc_id", "lang", "n_chars"
    )


@query("sample_capped_per_source")
def sample_capped_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus balancing: at most 15 docs per source, chosen by the
    deterministic per-key uniform (reproducible unbiased survivors)."""
    return sampling.capped_per_group(
        load(spark, sf_dir, "documents"), "source", "doc_id", cap=15
    ).select("doc_id", "source")


@query("pack_chunks")
def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing planner: per-source token start-offsets and
    512-token training-chunk ids from one windowed prefix sum."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    return sampling.pack_token_chunks(
        docs,
        "doc_id",
        F.size(F.split(F.col("text"), " ")),
        "source",
        chunk_tokens=512,
    )


@query("embedding_centroids")
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids as (label, dim, centroid_v, n)
    rows — posexplode + hash agg, the scale form of vector averaging."""
    return similarity.label_centroids(
        load(spark, sf_dir, "embeddings"), "label", "embedding"
    )


@query("bucketed_revenue_join")
def bucketed_revenue_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join through the bucketed layout (sources/bucketed.py):
    orders and lineitem are hash-bucketed on their orderkey at write
    time, so the join itself has NO Exchange on either side (asserted
    in test_plans.py) — the 100 TB answer to the most shuffle-expensive
    plan shape in the reference surface (J1/J3, api/service.go:365-418).
    Returns revenue and line count per order priority."""
    from nabatshy_spark.sources import bucketed

    j = bucketed.bucketed_join(
        spark, sf_dir, "orders", "lineitem",
        ["o_orderkey"], ["l_orderkey"], num_buckets=8,
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


@query("dedup_incremental")
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-corpus dedup (operators/dedup.py incremental_dedup):
    documents with doc_id % 10 < 2 play the incoming batch, the rest
    the existing corpus. One status row per batch doc; the corpus side
    is joined as digests + postings only, never corpus×corpus — and
    (round 12) served from the fingerprint-keyed corpus index artifact
    (dedup.shared_incremental_corpus_index): the standing corpus is a
    deterministic split of static parquet, so its digests / shingle
    postings / hot set are the once-per-corpus-version build, and each
    run pays only the batch side — the steady-state production shape
    the operator docstring always promised."""
    docs = load(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 < 2)
    corpus = docs.filter(F.col("doc_id") % 10 >= 2)
    return dedup.incremental_dedup(
        corpus, batch, "doc_id", "text", n=3, threshold=0.5, max_df=200,
        corpus_index=dedup.shared_incremental_corpus_index(
            spark, sf_dir, n=3, max_df=200, mod=10, batch_lt=2
        ),
    )


@query("zorder_pruning_stats")
def zorder_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D selective scan over the z-ordered events layout
    (sources/zorder.py): the layout rewrite is lossless, so this agg
    over a (user_id, value) box matches the same SQL over the original
    table — while the parquet footers of the layout prune both
    dimensions at once (measured in tests/test_zorder.py)."""
    from nabatshy_spark.sources import zorder

    path = zorder.ensure_zordered(spark, sf_dir, "events", ["user_id", "value"])
    ev = spark.read.parquet(path)
    return (
        ev.filter(
            (F.col("user_id") >= 100) & (F.col("user_id") <= 300)
            & (F.col("value") >= 10.0) & (F.col("value") <= 50.0)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@query("profile_orders")
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan data-quality profile of the orders table
    (operators/profile.py): null counts, exact cardinalities, and
    min/max per column from one aggregate pass."""
    from nabatshy_spark.operators.profile import profile

    return profile(
        load(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"],
    )


@query("sliding_window_counts")
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window time series (T-family extension): event count and
    value sum per 1-hour window sliding every 15 minutes. Spark's
    built-in window() expands each row into its 4 covering windows
    inside codegen — one scan, one shuffle on the window start."""
    ev = load(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "15 minutes")
    return (
        ev.groupBy(w.alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("__w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


@query("curate_corpus")
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the composition a 100 TB training
    run actually executes, each stage the cheapest that can reject a
    document: (1) codegen'd quality score ≥ 0.6, (2) language-ID keep
    'en', (3) exact + near dedup (dedup_pipeline: digests → capped
    postings → components), (4) deterministic 10% hash sample. Filters
    run FIRST so the expensive dedup stages see only the kept docs;
    the sample runs LAST so it never discards a doc that dedup needed
    to see."""
    docs = load(spark, sf_dir, "documents")
    # The two rejectors are regexp-heavy scan expressions, and the
    # dedup pipeline consumes its input 4-5 times — fusing the
    # predicate into every consumer's scan re-pays the regex cost per
    # scan (~0.75 s each at sf0.1). Evaluate the rejectors ONCE into a
    # checkpointed id list and semi-join it instead: each downstream
    # scan is then a pruned parquet read + hash semi-join (measured
    # 7.5 s → 5.3 s, identical rows; checkpointing the exact-dedup
    # survivors too measured WORSE, 6.0 s). The semi-join strategy is
    # size-aware (joins.semi_join_ids): a broadcast while the id list
    # fits spark.sql.autoBroadcastJoinThreshold, a shuffle-hash semi
    # past it — at 100 TB billions of kept ids would OOM a broadcast.
    # The estimate is the corpus row count from the parquet footer
    # (kept ⊆ corpus), read driver-side with zero Spark jobs.
    # Round 12: the rejector evaluation itself is served from the
    # fingerprint-keyed flag artifact shared with curation_funnel and
    # the curated_pairs build (dedup.shared_curation_flags) — the
    # regexes run once per corpus version, this query reads booleans.
    # flags.__fp (sha256 per kept doc) also supplies the exact-dedup
    # survivors, so the pipeline's stage (1) re-hash pass is gone too.
    flags = dedup.shared_curation_flags(spark, sf_dir)
    kept_ids = flags.filter("__k").select("doc_id")
    kept = joins.semi_join_ids(
        docs, kept_ids, "doc_id", n_ids_estimate=_parquet_rows(sf_dir, "documents")
    )
    exact_sur = (
        flags.filter("__k")
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # The near-dup pair relation over the kept corpus is served from
    # the fingerprint-keyed artifact (dedup.shared_curated_pairs) it
    # shares with curation_funnel — byte-identical to the inline
    # posting join, which was ~3 s of this query's 5 s recomputed per
    # run (round 11; build itemized once per corpus in the bench).
    survivors = dedup.dedup_pipeline(
        kept, "doc_id", "text", n=3, threshold=0.5, max_df=200,
        pairs_override=dedup.shared_curated_pairs(
            spark, sf_dir, n=3, threshold=0.5, max_df=200
        ),
        exact_sur_override=exact_sur,
    )
    return sampling.hash_sample(survivors, "doc_id", bps=6554).select(
        "doc_id", "lang", "source"
    )


@query("corpus_split")
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 95/2.5/2.5 train/val/test assignment over the
    corpus (operators/sampling.py:split_corpus): membership is a pure
    md5-of-key function — no shuffle, reproducible across engines,
    stable under appends."""
    return sampling.split_corpus(
        load(spark, sf_dir, "documents"), "doc_id", train_bps=62259, val_bps=1638
    ).select("doc_id", "lang", "source", "split")


@query("vocab_top_terms")
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-vocabulary build: global term count + doc frequency,
    min_count=2, global top-500 via TakeOrdered (never a full-vocab
    sort)."""
    return textanalysis.vocab_top_terms(
        load(spark, sf_dir, "documents"), "doc_id", "text", min_count=2, k=500
    )


@query("embedding_quantize")
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization stats per embedding
    (operators/similarity.py:quantize_int8) — codegen'd floor-based
    mapping whose arithmetic both engines reproduce bit-for-bit."""
    return similarity.quantize_int8(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding"
    )


@query("latest_event_per_user")
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/log compaction (operators/cdc.py:latest_per_key): newest
    event per user with a total-order tiebreak; WindowGroupLimit keeps
    hot users from materializing their history in one sort buffer."""
    from nabatshy_spark.operators import cdc

    return cdc.latest_per_key(
        load(spark, sf_dir, "events"),
        "user_id",
        [F.col("ts"), F.col("event_id")],
    ).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        "value",
    )


@query("distinct_users_approx")
def distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ cardinality per event_type (approx_count_distinct,
    rsd=2%) — THE 100 TB count-distinct: constant-size mergeable
    sketch per partition instead of shuffling every distinct key.
    Rows-only check (sketch estimates aren't engine-portable); the
    exact twin is ``distinct_customers_by_priority`` and the ≤5%%
    error bound is pinned in tests/test_extensions.py."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
        .orderBy("event_type")
    )


@query("continuous_aggregate")
def continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate serving (sources/contagg.py): materialized
    hourly rollup of settled history (ts < Jan 24, fingerprint-keyed
    build) unioned with a raw aggregation of only the tail — the
    query scans ~1/4 of the raw table yet the oracle is the DIRECT
    full aggregation, proving the split is lossless."""
    from nabatshy_spark.sources import contagg

    return contagg.serve_series(spark, sf_dir, cutoff="2024-01-24 00:00:00")


@query("text_search_and")
def text_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive inverted-index search (operators/invindex.py):
    docs containing ALL of {join, hash, vector}, ranked by total term
    frequency — postings intersection by distinct-term count, never an
    N-way self-join; cost is the queried posting lists only."""
    from nabatshy_spark.operators import invindex

    # Round 11: postings served from the shared term-bucket-partitioned
    # layout (invindex.shared_postings) — the scan is pruned to the
    # queried terms' buckets; search_and's own isin filter runs on top,
    # so the result is identical to the inline build.
    terms = ["join", "hash", "vector"]
    postings, _ = invindex.shared_postings(spark, sf_dir, terms=terms)
    return invindex.search_and(postings, terms, k=20)


@query("pagerank_trade")
def pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget PageRank (operators/graph.py) over the nation
    trade graph: one edge per lineitem from the customer's nation to
    the supplier's nation (broadcast dims onto the fact scan). 5
    deterministic power iterations, one shuffle pair per round,
    localCheckpoint-truncated lineage."""
    from nabatshy_spark.operators import graph

    # Round 11: the aggregated (src, dst, parallel-edge count) relation
    # is served from the shared trade-edge artifact (one fact pass per
    # corpus, four graph-query consumers — graph.shared_trade_edges);
    # cnt is exactly the multiplicity pagerank's internal aggregation
    # computed, so the power iteration is unchanged.
    edges = graph.shared_trade_edges(spark, sf_dir).select("src", "dst", "cnt")
    return graph.pagerank(edges, iterations=5, mult_col="cnt").select(
        F.col("node").alias("nationkey"), "rank"
    )


@query("chunk_documents")
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (size=100, stride=80) —
    narrow sequence+explode+slice expansion, tokens bound once, no
    shuffle (operators/textanalysis.py:chunk_documents)."""
    return textanalysis.chunk_documents(
        load(spark, sf_dir, "documents"), "doc_id", "text", size=100, stride=80
    )


@query("user_event_deltas")
def user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gaps (lag over the user's event-time order
    with event_id tiebreak): seconds since previous event + value
    delta — the §2.8 lead/lag surface. One hash shuffle on user_id;
    the sort is per-partition within the window."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.round(
            (
                # ts is TIMESTAMP_NTZ; session TZ is pinned UTC so the
                # cast to instant-typed TIMESTAMP is the identity map
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(w))
            )
            / 1_000_000.0,
            6,
        ).alias("gap_s"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
    )


@query("order_value_deciles")
def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile stats over order totalprice (ntile(10) global window →
    per-decile count/min/max/avg). The global sort is the ntile
    contract; the follow-up agg is partial-agg cheap. At 100 TB the
    swap is approx_percentile boundaries + a bucket join — same output
    contract, no global sort."""
    from pyspark.sql import Window

    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@query("rolling_user_value")
def rolling_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1h per-user rolling count/sum (operators/stats.py:
    rolling_range_agg) — the RANGE-frame window surface; sliding
    frame, O(rows) per partition."""
    from nabatshy_spark.operators import stats

    return stats.rolling_range_agg(
        load(spark, sf_dir, "events"), "user_id", "ts", "value", 3600
    )


@query("value_outliers")
def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (|z| > 2.5): group moments via
    partial agg + broadcast-back, never a whole-group window buffer."""
    from nabatshy_spark.operators import stats

    return stats.zscore_outliers(
        load(spark, sf_dir, "events").select("event_id", "event_type", "value"),
        "event_type",
        "value",
    ).select("event_id", "event_type", "value", "zscore")


@query("price_histogram")
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bucket equi-width histogram of order totalprice: min/max
    agg broadcast back + width_bucket groupBy — no sort, no driver
    loop."""
    from nabatshy_spark.operators import stats

    return stats.equi_width_histogram(
        load(spark, sf_dir, "orders").select("o_totalprice"), "o_totalprice", 20
    )


@query("lineitem_correlations")
def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of quantity/price/discount in ONE
    aggregate pass, unpivoted with stack."""
    from nabatshy_spark.operators import stats

    return stats.correlations(
        load(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


@query("text_search_bm25")
def text_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked OR search for {join, hash, vector} over the
    inverted index (operators/invindex.py:search_bm25): queried
    posting lists only + one groupBy(doc) + TakeOrdered."""
    from nabatshy_spark.operators import invindex

    # Round 11: pruned postings + doc_lens from the shared layout
    # artifact (see text_search_and).
    terms = ["join", "hash", "vector"]
    postings, doc_lens = invindex.shared_postings(spark, sf_dir, terms=terms)
    return invindex.search_bm25(postings, doc_lens, terms, k=20)


@query("fuzzy_prefix_pairs")
def fuzzy_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Levenshtein near-match pairs (block = source, 40-char
    prefix, dist ≤ 12): quadratic only within blocks, JVM-side
    levenshtein (operators/textanalysis.py:blocked_edit_distance_pairs)."""
    return textanalysis.blocked_edit_distance_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text", "source"
    )


@query("cohort_retention")
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-event day
    (cohort), counted by activity-day offset — the product-analytics
    rollup. First-event day via a groupBy-min (partial-agg, not a
    window over full history), broadcast back onto the fact scan; one
    distinct-count per (cohort, offset). Day arithmetic is date_diff
    on date-truncated timestamps — engine-portable."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(F.broadcast(first), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query("hourly_latency_percentiles")
def hourly_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour p50/p95/p99 of event value — the percentile time
    series every latency dashboard draws (reference only serves
    avg/count series, api/service.go:1341-1428). Exact percentiles at
    test scale; percentile_approx is the same-alias 100 TB switch
    (endpoint_stats_approx precedent)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
    )


@query("embedding_gram")
def embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix of the embedding table (similarity.gram_matrix):
    per-partition d×d BLAS partials, shuffle carries tasks×d² scalars
    — never rows×d² (the PCA/whitening pre-pass)."""
    return similarity.gram_matrix(load(spark, sf_dir, "embeddings"), "embedding")


@query("orders_snapshot_diff")
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/diff.py): the new snapshot
    is a deterministic in-plan mutation of orders (drop key%97==0,
    reprice key%31==0, add shifted copies of key%113==0). Sides
    reduce to (key, xxhash64) before the full-outer join — row bodies
    never shuffle; the oracle classifies by comparing values, proving
    the hash-based classification exact."""
    from nabatshy_spark.operators import diff

    orders = load(spark, sf_dir, "orders")
    cols = ["o_totalprice", "o_orderstatus", "o_orderpriority"]
    new = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 31 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 113 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            )
        )
    )
    return diff.snapshot_diff(orders, new, "o_orderkey", cols)


@query("orders_diff_summary")
def orders_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status counts of the snapshot diff — the publish-gate
    health check."""
    from nabatshy_spark.operators import diff

    orders = load(spark, sf_dir, "orders")
    cols = ["o_totalprice", "o_orderstatus", "o_orderpriority"]
    new = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 31 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 113 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            )
        )
    )
    return diff.diff_summary(orders, new, "o_orderkey", cols)


@query("shipping_priority")
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shape shipping priority: segment-filtered customers ⋈ orders
    ⋈ lineitem, revenue per order, top-10. The customer dim broadcasts
    (filter shrinks it below the threshold); the orders↔lineitem join
    shuffles on orderkey; TakeOrdered caps the sort at 10 rows. Both
    date filters reach the scans (AUTOMOBILE segment, date literals
    chosen inside the data range so every sf discriminates)."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query("local_supplier_volume")
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shape local supplier volume: revenue per nation where the
    customer and supplier share a nation — a 6-table star with BOTH
    dim chains broadcast onto the single fact shuffle; the
    same-nation predicate is a post-join filter on broadcast columns
    (never a shuffle key)."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    dims = F.broadcast(
        nation.join(region, F.col("n_regionkey") == F.col("r_regionkey")).select(
            "n_nationkey", "n_name"
        )
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(dims, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query("image_thumbnails")
def image_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode→resize preprocessing (multimodal.thumbnail_features
    over real PNG bytes from the deterministic synth): solid-gray
    sources make the thumbnail mean analytic, so the oracle checks the
    actual decode+resize arithmetic."""
    return multimodal.thumbnail_features(
        multimodal.attach_images(load(spark, sf_dir, "documents"), "doc_id")
    ).select("doc_id", "width", "height", "thumb_w", "thumb_h", "thumb_mean")


@query("weekly_revenue_wow")
def weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue per order priority: weekly rollup (one
    partial-agg shuffle), then lag over the tiny aggregated series —
    the reporting comparison runs on |weeks × priorities| rows, never
    on the fact table."""
    from pyspark.sql import Window

    weekly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            # to_date: DuckDB's date_trunc('week') yields DATE — emit
            # the same type so driver-side value hashing matches
            F.to_date(F.date_trunc("week", F.col("o_orderdate"))).alias("week"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("week")
    return weekly.select(
        "week",
        "o_orderpriority",
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias("wow_delta"),
    )


@query("event_transitions")
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts between consecutive event types
    per user (lag over the user's event-time order with event_id
    tiebreak) — the Markov/behavior matrix. One shuffle on user_id;
    the transition count agg rides on ~|types|² groups."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )


@query("hybrid_search_rrf")
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25({join,hash,vector}) ∪ cosine(vec 0)
    fused by reciprocal rank (invindex.hybrid_search) — each branch
    sub-linear, fusion on 2·20 rows."""
    from nabatshy_spark.operators import invindex

    # Round 11: pruned postings + doc_lens from the shared layout
    # artifact (see text_search_and).
    terms = ["join", "hash", "vector"]
    postings, doc_lens = invindex.shared_postings(spark, sf_dir, terms=terms)
    return invindex.hybrid_search(
        postings, doc_lens, load(spark, sf_dir, "embeddings"),
        terms, query_vec_id=0, k=10,
    )


@query("daily_event_pivot")
def daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface: events per (day × event_type) as a wide matrix —
    groupBy().pivot() with the value list PINNED (passing values
    explicitly skips Spark's extra distinct-scan pass and keeps the
    output schema deterministic at any scale)."""
    # Statically pinned domain (the testdata generator fixes it): no
    # distinct-scan, no driver round-trip, and the output schema is
    # identical on any input — an absent type is an all-zero column,
    # matching the oracle's five fixed columns even on empty data.
    types = ["click", "view", "purchase", "signup", "error"]
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))  # count("*") is rejected inside pivot
        .na.fill(0, types)
    )


@query("dedup_containment")
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram containment pairs (|A∩B|/|A| ≥ 0.6): the
    asymmetric near-dup mode Jaccard misses when the container is much
    longer; one intersection join scores both directions."""
    return dedup.ngram_containment_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.6
    )


@query("retention_purge")
def retention_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention + right-to-erasure purge plan: drop events older than
    the retention cutoff OR belonging to erasure-listed users
    (user_id % 101 == 0 stands in for the request list). The age
    predicate pushes to the scan; the (tiny) erasure list is a
    broadcast anti join — the standard compliance rewrite job, here
    returning the surviving rows' keys plus a per-reason audit of
    what a rewrite WOULD drop (the gate a purge job logs before
    committing)."""
    ev = load(spark, sf_dir, "events")
    erasure = ev.select("user_id").distinct().filter(F.col("user_id") % 101 == 0)
    cutoff = F.lit("2024-01-08 00:00:00").cast("timestamp")
    survivors = ev.filter(F.col("ts") >= cutoff).join(
        F.broadcast(erasure), "user_id", "left_anti"
    )
    return survivors.select("event_id", "user_id", "event_type")


@query("retention_purge_audit")
def retention_purge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The purge gate: per-reason drop counts (too_old / erasure /
    kept) in one scan — reason attribution mirrors the purge
    predicates exactly (age wins ties so the two reasons partition
    the dropped set)."""
    ev = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-08 00:00:00").cast("timestamp")
    reason = (
        F.when(F.col("ts") < cutoff, "too_old")
        .when(F.col("user_id") % 101 == 0, "erasure")
        .otherwise("kept")
    )
    return ev.groupBy(reason.alias("reason")).agg(F.count("*").alias("n"))


@query("profile_orders_approx")
def profile_orders_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of profile_orders: approx_count_distinct (HLL++,
    rsd=2%) replaces the exact distinct expansion — fixed-size partial
    state per column instead of the multi-distinct EXPAND. Sketch
    estimates aren't engine-portable → rows-only check; the ≤5% error
    bound vs the exact profile is pinned in tests."""
    from nabatshy_spark.operators import profile as P

    orders = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null{i}"),
            F.approx_count_distinct(F.col(c), 0.02).alias(f"__dist{i}"),
        ]
    one = orders.agg(*aggs)
    stack_args = ", ".join(f"'{c}', __null{i}, __dist{i}" for i, c in enumerate(cols))
    return one.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as (column, n_nulls, approx_distinct)",
    ).select("column", "n_rows", "n_nulls", "approx_distinct")


@query("fk_integrity_audit")
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan
    counts for every FK edge (lineitem→orders, lineitem→part,
    lineitem→supplier, orders→customer, customer→nation,
    supplier→nation, nation→region) — each edge one left-anti join
    shuffled on the key (dims broadcast), unioned into the one-row-
    per-edge report an ingest gate asserts on."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    def orphans(name, child, ck, parent, pk, bcast=True):
        p = parent.select(F.col(pk))
        if bcast:
            p = F.broadcast(p)
        n = (
            child.select(F.col(ck))
            .join(p, child[ck] == p[pk], "left_anti")
            .count()
        )
        return spark.createDataFrame(
            [(name, n)], "fk_edge string, n_orphans long"
        )

    reports = [
        orphans("lineitem->orders", li, "l_orderkey", orders, "o_orderkey", False),
        orphans("lineitem->part", li, "l_partkey", part, "p_partkey"),
        orphans("lineitem->supplier", li, "l_suppkey", supp, "s_suppkey"),
        orphans("orders->customer", orders, "o_custkey", cust, "c_custkey"),
        orphans("customer->nation", cust, "c_nationkey", nation, "n_nationkey"),
        orphans("supplier->nation", supp, "s_nationkey", nation, "n_nationkey"),
        orphans("nation->region", nation, "n_regionkey", region, "r_regionkey"),
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


@query("series_anomalies")
def series_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alerting primitive over the dashboard series: hourly per-type
    event counts flagged where the bucket deviates > 2σ from its
    type's own mean (population σ over the series). Both the rollup
    and the moments are aggregate-sized — the anomaly scan never
    touches the fact table twice at full width, and the moments join
    back via broadcast."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )
    moments = hourly.groupBy("event_type").agg(
        F.avg("n").alias("__mu"), F.stddev_pop("n").alias("__sd")
    )
    z = (F.col("n") - F.col("__mu")) / F.col("__sd")
    return (
        hourly.join(F.broadcast(moments), "event_type")
        .filter(F.col("__sd") > 0)
        .withColumn("zscore", F.round(z, 6))
        .filter(F.abs(F.col("zscore")) > 2)
        .select("bucket", "event_type", "n", "zscore")
    )


@query("winsorized_values")
def winsorized_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized event values (clip to exact p1/p99 —
    operators/stats.py:winsorize): bounds via one scalar agg broadcast
    back, clip codegen'd; approx_percentile is the documented 100 TB
    switch."""
    from nabatshy_spark.operators import stats

    return stats.winsorize(
        load(spark, sf_dir, "events").select("event_id", "value"), "value"
    ).select("event_id", "value", "value_winsorized")


@query("user_features")
def user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feature assembly — the feature-engineering rollup a
    training pipeline materializes: event count, distinct types,
    value stats, recency (seconds from last event to the corpus max),
    and per-type counts — ALL in one partial-agg pass over one scan
    (conditional counts instead of a pivot join); the corpus max ts
    is a 1-row broadcast."""
    ev = load(spark, sf_dir, "events")
    maxts = ev.agg(F.max("ts").alias("__maxts"))
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        # DECIMAL sum: double partial-sums are order-dependent, and any
        # rounding precision has some row straddling a boundary
        # (observed twice); decimal addition is exact and
        # order-independent, so both engines agree bit-for-bit
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")) / F.count("*"), 4
        ).cast("double").alias("avg_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.max("ts").alias("__last"),
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in ("click", "view", "purchase", "signup", "error")
        ],
    )
    return (
        per_user.join(F.broadcast(maxts))
        .withColumn(
            "recency_s",
            F.round(
                (
                    F.unix_micros(F.col("__maxts").cast("timestamp"))
                    - F.unix_micros(F.col("__last").cast("timestamp"))
                )
                / 1_000_000.0,
                6,
            ),
        )
        .drop("__last", "__maxts")
    )


@query("time_to_convert")
def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user first-view → first-purchase latency: two conditional
    min-aggregates in one pass (no self-join, no window), keep users
    who converted AFTER their first view, report hours to convert."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("__v"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("__p"),
    )
    hours = (
        F.unix_micros(F.col("__p").cast("timestamp"))
        - F.unix_micros(F.col("__v").cast("timestamp"))
    ) / 3_600_000_000.0
    return (
        firsts.filter(F.col("__v").isNotNull() & (F.col("__p") >= F.col("__v")))
        .select("user_id", F.round(hours, 6).alias("hours_to_convert"))
    )


@query("dedup_rates_by_source")
def dedup_rates_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-health monitoring: per-source exact-duplicate rate —
    distinct sha256 digests vs rows, in one partial-agg pass over the
    digest projection (the 32-byte key is all that shuffles). The
    gate a crawl pipeline alerts on when a source starts mirroring."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("source", F.sha2(F.col("text"), 256).alias("__h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("__h").alias("n_distinct"),
            F.round(
                1.0 - F.countDistinct("__h") / F.count("*"), 6
            ).alias("dup_rate"),
        )
    )


@query("nation_revenue_share")
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-total report: per-nation revenue and share of the
    grand total. The total comes from a second aggregate over the
    per-nation rollup broadcast back — NOT a `sum over ()` window,
    which would drag every rollup row into ONE task (the
    whole-table-partition trap §2.8 warns about; harmless at 25
    nations, fatal at 10⁸ groups)."""
    cust = F.broadcast(load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    nation = F.broadcast(load(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    per_nation = (
        load(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        # |nations| rows, consumed twice (grand total, then the share
        # projection): checkpointed so the orders join chain runs once
        # (round 12).
        .localCheckpoint(eager=False)
    )
    total = per_nation.agg(F.sum("revenue").alias("__total"))
    return (
        per_nation.join(F.broadcast(total))
        .select(
            "n_name",
            "revenue",
            F.round(F.col("revenue") / F.col("__total"), 6).alias("share"),
        )
    )


@query("unigram_fluency_scores")
def unigram_fluency_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style fluency scores under the corpus's own unigram
    LM (textanalysis.unigram_logprob_scores): one corpus explode, two
    aggregates, vocab joined back — the CCNet-class quality filter
    shape with the LM swappable."""
    return textanalysis.unigram_logprob_scores(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query("boilerplate_scrub")
def boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup / boilerplate removal
    (textanalysis.boilerplate_scrub): 5-word chunks appearing in >2
    distinct documents are scrubbed and every document reassembled.
    The hot-chunk vocabulary is served from the fingerprint-keyed
    artifact (textanalysis.shared_hot_chunks — round 12): the corpus
    chunk-explodes once per run (flag + reassemble in one group-by)
    instead of re-aggregating chunk frequencies per invocation, and
    the probe stays a broadcast."""
    return textanalysis.boilerplate_scrub(
        load(spark, sf_dir, "documents"), "doc_id", "text",
        chunk_words=5, max_docs=2,
        hot_override=textanalysis.shared_hot_chunks(
            spark, sf_dir, chunk_words=5, max_docs=2
        ),
    )


@query("quality_model_scores")
def quality_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (textanalysis.quality_model_scores):
    five engineered features → linear model → sigmoid → label, all as
    one codegen'd projection (the fastText-classifier stand-in)."""
    return textanalysis.quality_model_scores(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query("token_mixture_plan")
def token_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based token-budget allocation across sources
    (sampling.temperature_mixture_rates, τ=2, budget = 50% of corpus
    tokens): per-source keep-rates from one agg + a 1-row broadcast
    grand total — no empty-frame window, no driver collect."""
    docs = load(spark, sf_dir, "documents")
    return sampling.temperature_mixture_rates(
        docs, "source", F.size(F.split(F.col("text"), " ")),
        budget_frac=0.5, temperature=2.0,
    )


@query("sample_token_mixture")
def sample_token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture plan applied (sampling.mixture_sample): broadcast
    the k-row rate table onto the corpus scan and keep each doc by the
    deterministic md5 uniform — reproducible corpus rebalancing."""
    docs = load(spark, sf_dir, "documents")
    return sampling.mixture_sample(
        docs, "doc_id", "source", F.size(F.split(F.col("text"), " ")),
        budget_frac=0.5, temperature=2.0,
    )


@query("ann_pq_topk")
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (similarity.pq_topk, Jégou et al. PQ):
    deterministic per-subspace codebooks, nibble codes, ADC lookup-table
    scan over the 64×-smaller code relation, exact-cosine re-rank of
    the top candidates. Approximate ⇒ rows-only driver check; the
    recall unit test pins quality against brute force."""
    return similarity.pq_topk(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        query_id=0, k=10, m=8, ks=16, rerank=8,
    )


@query("trade_triangles")
def trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle counts on the undirected nation trade graph
    (operators/graph.py:triangle_counts — degree-oriented wedge join,
    Suri-Vassilvitskii): same edge derivation as pagerank_trade, so
    together they give the topology dashboard rank + cohesion."""
    from nabatshy_spark.operators import graph

    # Round 11: served from the shared trade-edge artifact — the
    # operator's first step is normalize+distinct, so the aggregated
    # (src, dst) pair relation induces the identical simple graph.
    edges = graph.shared_trade_edges(spark, sf_dir).select("src", "dst")
    return graph.triangle_counts(edges).select(
        F.col("node").alias("nationkey"), "triangles"
    )


@query("bpe_vocab_merges")
def bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table (operators/bpe.py, Sennrich et al.
    2016): 20 deterministic merges trained on the word-frequency table
    (ONE corpus pass; every round runs on the small distinct-word
    relation). Iterative training is not SQL-expressible ⇒ rows-only
    driver check; the classic-corpus unit pins the merge sequence."""
    from nabatshy_spark.operators import bpe

    merges = bpe.bpe_train(load(spark, sf_dir, "documents"), "text", num_merges=20)
    return spark.createDataFrame(
        [(i, l, r, l + r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string, merged string",
    )


@query("bpe_token_stats")
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the trained BPE vocabulary
    (bpe.bpe_token_counts): whitespace vs subword counts + fertility —
    the accounting that drives packing budgets. Tokenization is one
    narrow mapInPandas pass with a per-batch word cache."""
    from nabatshy_spark.operators import bpe

    docs = load(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, "text", num_merges=20)
    return bpe.bpe_token_counts(docs, "doc_id", "text", merges)


@query("ann_ivfpq_topk")
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via the composed IVF+PQ index (FAISS IVFADC
    architecture, Jégou et al.): partition pruning on the coarse cell
    × ADC scan over the (id, code) projection × exact-cosine re-rank.
    Content-fingerprinted lifecycle (ivf.ensure_ivfpq). Probabilistic
    recall ⇒ rows-only; the unit pins exactness at full probe + deep
    re-rank."""
    import os as _os

    from nabatshy_spark.operators import ivf

    emb = load(spark, sf_dir, "embeddings")
    qrow = emb.filter(emb.vec_id == 0).first()
    if qrow is None:
        return spark.createDataFrame([], "vec_id long, cos double")
    path = ivf.ensure_ivfpq(spark, _os.path.join(sf_dir, "embeddings.parquet"))
    return ivf.ivfpq_topk(
        spark, path, [float(x) for x in qrow.embedding], k=10, nprobe=8, rerank=8
    )


@query("cms_user_counts")
def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimates per user (operators/sketches.py,
    Cormode-Muthukrishnan): depth 4 × width 64 forces collisions at 150
    users, so estimates genuinely exercise the min-over-rows bound
    (est ≥ true, always). The md5 hashing is engine-portable, so the
    ORACLE REBUILDS THE SKETCH — construction and query both checked,
    not just sanity."""
    from nabatshy_spark.operators import sketches

    ev = load(spark, sf_dir, "events")
    return sketches.cms_estimates(ev, "user_id", depth=4, width=64).select(
        F.col("key").cast("string").alias("key"), "est"
    )


@query("bloom_purchase_users")
def bloom_purchase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership prefilter (operators/sketches.py): the
    bit set is built over users with a 'purchase' event and probed with
    every user — no false negatives by construction (flagged ⊇ true
    purchasers), false positives bounded by (1-e^{-kn/m})^k. The
    broadcast bit-set join is the cheap guard in front of expensive
    dedup/decontamination joins at 100 TB."""
    from nabatshy_spark.operators import sketches

    ev = load(spark, sf_dir, "events")
    big_buyers = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 250)
    ).select("user_id")
    # m=256 keeps a real (bounded) false-positive rate in play at this
    # SF, so the query exercises the probabilistic side too; the
    # no-false-negative guarantee is exact regardless.
    bits = sketches.bloom_bits(big_buyers, "user_id", num_hashes=5, num_bits=256)
    return sketches.bloom_probe(
        bits, ev.select("user_id"), "user_id", num_hashes=5, num_bits=256
    ).select(F.col("key").cast("string").alias("key"), "may_contain")


@query("source_kl_drift")
def source_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence from the corpus distribution
    (textanalysis.source_kl_drift) — the domain-drift monitor. One
    corpus explode; all totals are aggregates over the (source, term)
    relation."""
    return textanalysis.source_kl_drift(
        load(spark, sf_dir, "documents"), "source", "text"
    )


@query("pmi_collocations")
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-word collocations by PMI (Church-Hanks;
    textanalysis.pmi_collocations, min_count=5): narrow pair explode,
    partial-agg counts, marginals joined back, TakeOrdered ranking."""
    return textanalysis.pmi_collocations(
        load(spark, sf_dir, "documents"), "text", min_count=5, k=20
    )


@query("bigram_fluency_scores")
def bigram_fluency_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram fluency scores under the corpus's own LM
    (textanalysis.bigram_logprob_scores, Jelinek-Mercer λ=0.8) — the
    step above the unigram filter; one transition explode, corpus
    tables aggregated over it and joined back."""
    return textanalysis.bigram_logprob_scores(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query("repeated_ngram_docs")
def repeated_ngram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated 3-gram stats per doc
    (textanalysis.cross_doc_ngram_dup) — the exact-substring-dedup
    signal of Lee et al. 2021: fraction of a document's gram
    occurrences shared with at least one other document. Grams shuffle
    as 8-byte xxhash64 keys, never strings."""
    return textanalysis.cross_doc_ngram_dup(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=3
    )


@query("text_search_phrase")
def text_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over positional postings
    (invindex.search_phrase): docs where "table hash" occurs
    consecutively, ranked by occurrence count. Positional
    intersection via start-position voting — one filtered posting
    scan + broadcast of the 2-row phrase table, no self-join chain."""
    from nabatshy_spark.operators import invindex

    postings = invindex.build_positional_postings(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    )
    return invindex.search_phrase(spark, postings, ["table", "hash"], k=50)


@query("frequent_part_pairs")
def frequent_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pairs (operators/itemsets.py): parts co-ordered
    in ≥3 distinct orders, A-priori item pruning before the pair
    self-join and a basket-size cap bounding the quadratic expansion."""
    from nabatshy_spark.operators import itemsets

    # Round 11: pair supports from the shared basket-stats artifact
    # (one A-priori mining pass per corpus, shared with
    # association_rules_parts — itemsets.shared_part_basket_stats).
    pair_sup, _, _ = itemsets.shared_part_basket_stats(
        spark, sf_dir, min_support=3
    )
    return itemsets.topk_pairs(pair_sup, k=100)


@query("dedup_cluster_stats")
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster rollup — the report a curation run actually
    ships: each near-dup component (3-gram Jaccard ≥ 0.5, large-star/
    small-star components) joined back to the documents table and
    aggregated to cluster size, distinct sources spanned, and total
    duplicated bytes. The join key is the doc id; the components
    relation is tiny next to the corpus, so AQE broadcasts it onto the
    documents scan — no corpus-wide shuffle beyond the pair finding
    itself (amortized via dedup.shared_ngram_pairs)."""
    pairs = dedup.shared_ngram_pairs(spark, sf_dir)
    comp = dedup.connected_components(pairs)
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return (
        docs.join(comp, "doc_id")
        .groupBy("component")
        .agg(
            F.count("*").alias("cluster_size"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy(F.col("cluster_size").desc(), F.col("component").asc())
    )


@query("data_quality_report")
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations gate (operators/expectations.py,
    Deequ-shaped): five constraints over orders — not-null FK, exact
    key uniqueness, price range, status domain, minimum volume — all
    evaluated in ONE scan (every metric is a column of a single agg;
    verdicts computed on the one-row result). The range check's upper
    bound 450000 deliberately FAILS on real data so the report
    demonstrably discriminates."""
    from nabatshy_spark.operators import expectations as E

    return E.check(
        load(spark, sf_dir, "orders"),
        [
            E.not_null("o_custkey"),
            E.unique("o_orderkey", exact=True),
            E.in_range("o_totalprice", 0.0, 450000.0),
            E.accepted_values("o_orderstatus", ["F", "O", "P"]),
            E.min_rows(100),
        ],
    )


@query("split_leakage_audit")
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split leakage audit — the check a training run gates on
    after splitting: near-duplicate pairs (3-gram Jaccard >= 0.5, the
    same finder as `dedup_ngram_jaccard`) classified by the split
    combination of their endpoints (sampling.split_corpus, the same
    95/2.5/2.5 assignment as `corpus_split`). A (train, test) row IS
    leakage; the same-split rows double as the intra-split dup rate.
    The classification joins ride the pairs relation — tiny next to
    the corpus — against the shuffle-free split projection. Pairs come
    from the shared materialization (dedup.shared_ngram_pairs)."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.shared_ngram_pairs(spark, sf_dir)
    splits = sampling.split_corpus(docs, "doc_id", train_bps=62259, val_bps=1638)
    sp = splits.select("doc_id", "split")
    classified = (
        pairs.join(
            sp.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("__sa")
            ),
            "doc_a",
        )
        .join(
            sp.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("__sb")
            ),
            "doc_b",
        )
        .select(
            F.least("__sa", "__sb").alias("split_a"),
            F.greatest("__sa", "__sb").alias("split_b"),
        )
    )
    return (
        classified.groupBy("split_a", "split_b")
        .agg(F.count("*").alias("n_dup_pairs"))
        .orderBy("split_a", "split_b")
    )


@query("value_trends")
def value_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of value over time: OLS slope
    (scaled to per-day), intercept-free fit quality r², and n — the
    drift/trend monitor over the event stream. Entirely built-in
    regression aggregates (`regr_slope`/`regr_r2`: sums of x, y, xy,
    x² with map-side partial aggregation — ONE scan, one shuffle of
    |event_types| groups). The x axis is epoch seconds CENTERED on a
    fixed date so the double-precision products stay far from the
    1e18 range where engine rounding could diverge."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (
            F.col("ts").cast("timestamp").cast("double")
            - F.lit(1704067200.0)  # 2024-01-01 epoch: fixed, engine-portable
        ).alias("__x"),
        F.col("value").cast("double").alias("__y"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.regr_slope("__y", "__x") * 86400, 6).alias("slope_per_day"),
            F.round(F.regr_r2("__y", "__x"), 6).alias("r2"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@query("approx_revenue_estimate")
def approx_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing: total revenue estimated from a
    deterministic ~10% CLUSTER sample (whole orders in or out, decided
    by md5(l_orderkey) — sampling.hash_sample's engine-portable
    predicate), inverse-probability scaled. The sample filter sits
    directly on the scan (no shuffle, no RNG state), so the estimator
    reads ~10% of the data — the point of AQP at 100 TB. The true
    total and relative error ride along here so the demo is
    self-grading; a production estimator returns only the estimate ±
    CI."""
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    bps = 6554  # ~10.0021% — the exact inclusion probability is bps/65536
    sampled = sampling.hash_sample(li, "l_orderkey", bps=bps)
    est = sampled.agg(
        (F.sum(rev) * F.lit(65536.0 / bps)).alias("__est")
    )
    true = li.agg(F.sum(rev).alias("__true"))
    return (
        est.join(F.broadcast(true))
        .select(
            F.round("__est", 2).alias("estimated_revenue"),
            F.round("__true", 2).alias("true_revenue"),
            F.round(
                F.abs(F.col("__est") - F.col("__true")) / F.col("__true"), 6
            ).alias("rel_error"),
        )
    )


@query("trade_reach_hops")
def trade_reach_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS (operators/graph.py:bfs_hops) over the SPARSE
    trade graph — the 150 highest-revenue nation→nation edges (top-K by
    revenue keeps the graph sparse at ANY scale factor; the dense
    all-pairs graph has diameter ~1 and nothing to traverse). Min hops
    from nation 0; frontier joins + anti-join per round, lineage
    truncated per iteration."""
    from nabatshy_spark.operators import graph

    # Round 11: the per-pair revenue aggregate is served from the
    # shared trade-edge artifact (rev = the identical groupBy sum,
    # doubles bit-exact through parquet).
    pair_rev = graph.shared_trade_edges(spark, sf_dir).select(
        "src", "dst", F.col("rev").alias("__rev")
    )
    top = pair_rev.orderBy(
        F.col("__rev").desc(), F.col("src").asc(), F.col("dst").asc()
    ).limit(150)
    return (
        graph.bfs_hops(top, source=0)
        .select(F.col("node").alias("nationkey"), "hop")
        .orderBy("hop", "nationkey")
    )


@query("customer_rfm_segments")
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer analytics rollup: per
    customer recency (days since last order, against the corpus max
    date), frequency (order count) and monetary (total spend), each
    scored 1–3 against corpus-wide TERCILE boundaries computed with
    exact quantile_cont (fixed value thresholds, NOT ntile — ntile
    breaks ties by row order, which no two engines replicate), then
    segment sizes. One groupBy(customer) + a 1-row broadcast of the
    six boundaries; scoring is pure arithmetic on the joined row."""
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("__last"),
        F.count("*").alias("__freq"),
        F.sum("o_totalprice").alias("__spend"),
    )
    maxd = o.agg(F.max("o_orderdate").alias("__maxd"))
    rfm = per_cust.join(F.broadcast(maxd)).select(
        "o_custkey",
        F.datediff(F.col("__maxd"), F.col("__last")).alias("__rec"),
        "__freq",
        "__spend",
    )
    bounds = rfm.agg(
        F.percentile(F.col("__rec"), F.lit(1.0 / 3)).alias("__r1"),
        F.percentile(F.col("__rec"), F.lit(2.0 / 3)).alias("__r2"),
        F.percentile(F.col("__freq"), F.lit(1.0 / 3)).alias("__f1"),
        F.percentile(F.col("__freq"), F.lit(2.0 / 3)).alias("__f2"),
        F.percentile(F.col("__spend"), F.lit(1.0 / 3)).alias("__m1"),
        F.percentile(F.col("__spend"), F.lit(2.0 / 3)).alias("__m2"),
    )

    def score(col, lo, hi, invert=False):
        s = (
            F.when(F.col(col) <= F.col(lo), 1)
            .when(F.col(col) <= F.col(hi), 2)
            .otherwise(3)
        )
        return (4 - s) if invert else s

    scored = rfm.join(F.broadcast(bounds)).select(
        # low recency days = RECENT = best → invert
        score("__rec", "__r1", "__r2", invert=True).alias("r_score"),
        score("__freq", "__f1", "__f2").alias("f_score"),
        score("__spend", "__m1", "__m2").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


@query("top_session_paths")
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 2-step event-type paths within sessions
    (sessions.top_session_paths; n is a parameter — 2 here because
    this corpus's sessions are short enough that longer paths are
    all-unique): sessionize → lead-window n-gram → corpus count.
    Deterministic sequence order via the event_id tiebreak."""
    return sessions.top_session_paths(
        load(spark, sf_dir, "events"), n=2, k=20
    )


# round-4 additions live in their own module; importing it registers them.
from nabatshy_spark.plans import pipeline_queries as _pipeline_queries  # noqa: E402,F401

# round-6 additions, same pattern.
from nabatshy_spark.plans import round6_queries as _round6_queries  # noqa: E402,F401
from nabatshy_spark.plans import round7_queries as _round7_queries  # noqa: E402,F401
from nabatshy_spark.plans import round8_queries as _round8_queries  # noqa: E402,F401
from nabatshy_spark.plans import round9_queries as _round9_queries  # noqa: E402,F401
from nabatshy_spark.plans import round10_queries as _round10_queries  # noqa: E402,F401
from nabatshy_spark.plans import round11_queries as _round11_queries  # noqa: E402,F401


@query("association_rules_parts")
def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over part co-orders (operators/itemsets.py
    association_rules): support, directional confidences, and lift per
    frequent pair — the actionable layer above frequent_part_pairs.
    Item supports broadcast onto the pair relation; basket total is a
    1-row broadcast."""
    from nabatshy_spark.operators import itemsets

    # Round 11: support relations from the shared basket-stats
    # artifact (one mining pass per corpus, shared with
    # frequent_part_pairs).
    pair_sup, item_sup, n_baskets = itemsets.shared_part_basket_stats(
        spark, sf_dir, min_support=3
    )
    return itemsets.rules_from_supports(pair_sup, item_sup, n_baskets, k=100)
