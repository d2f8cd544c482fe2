"""Round-9 queries: exact-substring duplicate detection (the
suffix-ordering dedup class, operators/suffixes.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nabatshy_spark.catalog import load
from nabatshy_spark.plans.queries import query


@query("longest_dup_substrings")
def longest_dup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 longest exactly-duplicated cross-document substrings
    (length ≥ 50 chars at ARBITRARY length — Lee et al. ExactSubstr,
    the marquee training-data dedup signal the fixed-n
    cross_doc_ngram_dup can only lower-bound): char-window hashing +
    diagonal run assembly (operators/suffixes.py), verified by
    substring equality, with a 40-char sample of each find.

    Oracle parity note: Spark shuffles 8-byte xxhash64 window keys,
    the DuckDB oracle groups by the 50-char window STRING — agreement
    is itself the no-collision check at test scale (same contract as
    repeated_ngram_docs). The df>200 cap is the shared miss condition.

    Scale: window relation ≈ total_chars rows × 12 bytes, shuffled on
    the hash (same memory order as a suffix array, but partitionable);
    posting self-join Σ min(df,cap)² over DUPLICATED windows only; the
    islands window partitions per (pair, diagonal). Nothing sorts
    globally; the output is dup-bounded and served from the
    fingerprint-keyed materialization (suffixes.shared_substring_runs,
    built once per corpus version)."""
    from nabatshy_spark.operators import suffixes

    docs = load(spark, sf_dir, "documents")
    runs = suffixes.shared_substring_runs(spark, sf_dir, 50, 200)
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("__t"))
    return (
        runs.join(da, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            "pos_a",
            "pos_b",
            "dup_len",
            F.expr("substring(substring(__t, pos_a, dup_len), 1, 40)").alias(
                "sample"
            ),
        )
        .orderBy(
            F.col("dup_len").desc(),
            F.col("doc_a").asc(),
            F.col("doc_b").asc(),
            F.col("pos_a").asc(),
            F.col("pos_b").asc(),
        )
        .limit(20)
    )


@query("dup_substring_doc_stats")
def dup_substring_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document exact-substring duplication exposure: for each doc
    appearing in any verified ≥50-char duplicated run, the number of
    runs, the partner count, and the longest run — the remove-list
    input an ExactSubstr dedup pass acts on (complements
    dup_span_chars, which measures char coverage from the fixed-n
    signal). One extra dup-bounded aggregate over the shared runs
    relation (suffixes.shared_substring_runs)."""
    from nabatshy_spark.operators import suffixes

    runs = suffixes.shared_substring_runs(spark, sf_dir, 50, 200)
    per_side = runs.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("partner"),
        "dup_len",
    ).unionByName(
        runs.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("partner"),
            "dup_len",
        )
    )
    return (
        per_side.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_runs"),
            F.countDistinct("partner").alias("n_partners"),
            F.max("dup_len").alias("max_dup_len"),
            F.sum("dup_len").alias("total_dup_chars"),
        )
        .orderBy(
            F.col("max_dup_len").desc(),
            F.col("doc_id").asc(),
        )
        .limit(50)
    )


@query("exactsubstr_cut_plan")
def exactsubstr_cut_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup's actionable output (Lee et al. §4.2): per
    affected document, the merged duplicated spans to cut under the
    keep-first (lower doc_id survives) policy, and the resulting
    document size — the audit report a curation run reviews before
    committing the corpus rewrite. Interval merging is a per-document
    gaps-and-islands window (partition-local); the runs come from the
    shared verified artifact (suffixes.shared_substring_runs)."""
    from nabatshy_spark.operators import suffixes

    docs = load(spark, sf_dir, "documents")
    runs = suffixes.shared_substring_runs(spark, sf_dir, 50, 200)
    return suffixes.exactsubstr_cut_stats(docs, "doc_id", runs)


@query("intra_doc_repeats")
def intra_doc_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document verbatim repeats >= 20 chars at arbitrary
    length (suffixes.intra_doc_repeat_runs) — the self-repeat half of
    ExactSubstr: boilerplate lists, repeated headers, copy-paste
    stutter that word-level repetition_stats cannot measure at
    arbitrary char length. All runs, ordered deterministically; the
    period column distinguishes adjacent stutter (period == rep gap)
    from far apart repeats."""
    from nabatshy_spark.operators import suffixes

    # Served from the fingerprint-keyed artifact: the window pass is a
    # once-per-corpus-version job; the per-invocation form only looked
    # cheap under bench because the cache manager re-served the prior
    # lap's persisted window relation (round-10 adjudication).
    runs = suffixes.shared_intra_repeat_runs(
        spark, sf_dir, min_len=20, max_occ=50
    )
    return runs.orderBy(
        F.col("rep_len").desc(),
        F.col("doc_id").asc(),
        F.col("pos_a").asc(),
        F.col("period").asc(),
    ).limit(50)


@query("exactsubstr_source_coverage")
def exactsubstr_source_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al.'s headline corpus metric per source: what fraction of
    each feed's characters sit inside a verified cross-document
    duplicated run (BOTH occurrences count — the doc_a copy is just as
    duplicated as the doc_b copy; contrast exactsubstr_cut_plan, which
    counts only the copies the keep-first policy removes). Pairs with
    source_overlap_matrix: that says who copies from whom, this says
    how much of each feed is copies. Per-document interval merge is
    the same partition-local gaps-and-islands pass as the cut plan;
    the rollup is |sources| rows."""
    from nabatshy_spark.operators import suffixes

    docs = load(spark, sf_dir, "documents")
    runs = suffixes.shared_substring_runs(spark, sf_dir, 50, 200)
    ivals = runs.select(
        F.col("doc_a").alias("doc_id"),
        F.col("pos_a").alias("__s"),
        (F.col("pos_a") + F.col("dup_len")).alias("__e"),
    ).unionByName(
        runs.select(
            F.col("doc_b").alias("doc_id"),
            F.col("pos_b").alias("__s"),
            (F.col("pos_b") + F.col("dup_len")).alias("__e"),
        )
    )
    merged = (
        suffixes.merge_intervals(ivals, "doc_id", "__s", "__e")
        .groupBy("doc_id")
        .agg(F.sum(F.col("__me") - F.col("__ms")).alias("__covered"))
    )
    per_src = (
        docs.join(merged, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count_if(F.col("__covered").isNotNull()).alias("n_docs_dup"),
            F.sum(F.coalesce("__covered", F.lit(0))).alias("covered_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    return per_src.select(
        "source",
        "n_docs_dup",
        "covered_chars",
        F.round(
            F.col("covered_chars") / F.col("total_chars").cast("double"), 6
        ).alias("frac_covered"),
    ).orderBy("source")


@query("decontaminate_exactsubstr")
def decontaminate_exactsubstr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-level train/test decontamination (the ExactSubstr
    complement of the n-gram decontaminate_corpus): verbatim >=50-char
    overlaps between the TRAIN and TEST splits of the deterministic
    95/2.5/2.5 corpus split — arbitrary-length leak spans with exact
    positions, not fixed-n gram hits. Reported per leak, ordered by
    severity; an empty result is the clean-export gate.

    Scale: the test-split window relation is broadcast-sized by
    construction (2.5% of the corpus); the train side streams through
    one hash shuffle with the df cap (cap applies to the TRAIN side
    only — capping the benchmark would hide the leaks being hunted)."""
    from nabatshy_spark.operators import suffixes

    # Served from the fingerprint-keyed artifact (built once per corpus
    # version over the deterministic hash split; leak-bounded output) —
    # see shared_decontamination_runs for the round-10 adjudication.
    runs = suffixes.shared_decontamination_runs(
        spark, sf_dir, min_len=50, max_df=200, train_bps=62259,
        val_bps=1638,
    )
    return (
        runs.select(
            F.col("corpus_id").alias("train_doc"),
            F.col("bench_id").alias("test_doc"),
            F.col("pos_c").alias("pos_train"),
            F.col("pos_b").alias("pos_test"),
            "dup_len",
        )
        .orderBy(
            F.col("dup_len").desc(),
            F.col("train_doc").asc(),
            F.col("test_doc").asc(),
            F.col("pos_train").asc(),
            F.col("pos_test").asc(),
        )
        .limit(50)
    )
