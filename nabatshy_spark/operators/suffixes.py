"""Exact-substring duplicate detection — the suffix-ordering dedup
class (Lee et al. 2021, "Deduplicating Training Data Makes Language
Models Better", §3 ExactSubstr) re-expressed for Spark.

No reference counterpart (SURVEY §2.11 extension surface). Lee et al.
build a monolithic suffix array over the concatenated corpus; that
construction is single-machine-shaped (one giant sort over all
suffixes). The distributed equivalent used here is CHARACTER-WINDOW
HASHING + DIAGONAL RUN ASSEMBLY:

1. every start position of every document emits the xxhash64 of its
   ``min_len``-char window — the same "bucket suffixes by their first
   k bytes" idea as a sampled/bucketed suffix sort, except the bucket
   key (the window) is ALL the evidence needed for matches of length
   ≥ min_len, so no per-bucket suffix comparison is required at all;
2. windows whose hash appears in ≥2 distinct documents (and under a
   document-frequency cap) form the posting relation; a self-join on
   the hash yields cross-document position pairs — cost
   Σ min(df, cap)² over duplicated windows only, never N²;
3. matching positions of one shared substring all lie on one DIAGONAL
   (pos_a − pos_b constant); a per-(pair, diagonal) gaps-and-islands
   pass (row_number over a partition-local window) collapses each
   maximal consecutive run of matching windows into one candidate.

EXACTNESS: a maximal shared region of length M ≥ min_len contains
exactly M − min_len + 1 matching window starts, all consecutive on one
diagonal, and no matching window straddles its edges — so the
reconstructed length (run_length + min_len − 1) equals M exactly. The
reported substrings are then VERIFIED by actual substring equality
(guards the ~2⁻⁶⁴ per-pair hash-collision risk; the df-cap is the one
documented miss condition — a run containing a window with df > cap
splits or shrinks, the same boilerplate-ignoring trade as
dedup.ngram_jaccard_pairs).

Scale shape (100 TB): the window relation is rows ≈ total_chars with
8-byte hash + 4-byte position — the same order of memory a suffix
array costs (Lee et al. use 8 bytes/char), but shuffled on the hash so
it partitions freely; nothing ever sorts globally. The window
generation is one codegen'd pass over the text (transform + sequence +
substring are all JVM expressions — no Python in the hot path); the
frequency pass and the posting self-join shuffle 12-byte rows. The
verify join ships only candidate substrings (output-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_hash_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 50,
    chunk: int = 16384,
) -> DataFrame:
    """(id, pos, h) for every ``min_len``-char window of every document
    — pos is the 1-based character start. Documents shorter than
    ``min_len`` contribute nothing (filtered, not sequence(1,0), which
    Spark would treat as a DESCENDING range).

    CHUNKED in two explode steps so per-row transient memory is
    O(chunk), not O(doc_len): a single ``transform(sequence(1, L), ...)``
    materializes the whole per-document hash array (one long per
    character, plus transient min_len-char substrings) inside one row
    before the explode — a tens-of-MB document would concentrate its
    entire window relation in a single task's row buffer (ADVICE r9).
    Instead the document first explodes into fixed-size position
    ranges; each chunk row slices ``chunk + min_len − 1`` characters
    (the min_len−1 overlap makes boundary-straddling windows exact) and
    hashes its ≤``chunk`` window starts. The emitted (id, pos, h) set
    is IDENTICAL to the unchunked form — positions are globally
    numbered via the chunk offset — so artifact keys don't change."""
    n_wins = F.length(text_col) - (min_len - 1)  # windows in this doc
    chunks = F.expr(
        f"sequence(0, cast(floor((length({text_col}) - {min_len}) "
        f"/ {chunk}) as int))"
    )
    piece_hashes = F.expr(
        f"transform(sequence(1, least({chunk}, __nw - __off)),"
        f" i -> xxhash64(substring(__piece, i, {min_len})))"
    )
    return (
        df.filter(F.length(text_col) >= min_len)
        .select(
            F.col(id_col),
            n_wins.alias("__nw"),
            F.col(text_col).alias("__t"),
            F.explode(chunks).alias("__ci"),
        )
        .select(
            F.col(id_col),
            "__nw",
            (F.col("__ci") * chunk).alias("__off"),
            F.expr(
                f"substring(__t, __ci * {chunk} + 1, {chunk + min_len - 1})"
            ).alias("__piece"),
        )
        .select(
            F.col(id_col),
            F.col("__off"),
            F.posexplode(piece_hashes).alias("__p0", "__h"),
        )
        .select(
            F.col(id_col),
            (F.col("__off") + F.col("__p0") + 1).cast("int").alias("pos"),
            F.col("__h"),
        )
    )


def duplicated_substring_runs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 50,
    max_df: int | None = 200,
    _handles: list[DataFrame] | None = None,
) -> DataFrame:
    """All maximal cross-document duplicated substrings of length ≥
    ``min_len``: one row per (doc_a < doc_b, diagonal, run) with the
    exact 1-based positions and the exact duplicated length, verified
    by substring equality. Columns: doc_a, doc_b, pos_a, pos_b,
    dup_len.

    See the module docstring for the construction and the df-cap miss
    condition. ``max_df=None`` disables the cap (exact but unbounded
    Σ df² on boilerplate-heavy corpora).

    The window relation is persist()ed internally (it feeds two
    branches of the DAG). RELEASE IS THE CALLER'S RESPONSIBILITY: pass
    ``_handles`` to collect the persisted frames and unpersist them
    once the result is materialized (shared_substring_runs does), or
    rely on an outer clearCache. Without either, repeated invocations
    accumulate cached blocks (ADVICE r9)."""
    # The window relation feeds BOTH the frequency pass and the posting
    # join; without pinning it is generated twice (measured 1.9 s per
    # generation at sf0.1 — the single biggest stage). Same rationale
    # as ngram_jaccard_pairs' shingle persist.
    wins = window_hash_postings(df, id_col, text_col, min_len).persist()
    if _handles is not None:
        _handles.append(wins)
    return _dup_runs_from_postings(wins, df, id_col, text_col, min_len, max_df)


def _dup_runs_from_postings(
    wins: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int,
    max_df: int | None,
) -> DataFrame:
    """Diagonal-run assembly from a precomputed (id, pos, __h) window
    relation — the post-scan half of :func:`duplicated_substring_runs`.
    ``wins`` should be persisted: it feeds the frequency pass and the
    posting join. (Round 11 note: a combined builder deriving all
    three runs families from ONE materialized dual-length window
    relation was implemented, measured 1.7× SLOWER than the standalone
    builds — the window relation is ~20× its source text, so caching
    it costs more than regenerating it, and the decontamination family
    loses its probe-inside-scan prune — and reverted; evidence in
    SCALE.md round-11.)"""
    freq = wins.groupBy("__h").agg(
        F.count("*").alias("__c"),
        # min != max <=> >=2 distinct docs, without a countDistinct
        F.min(id_col).alias("__mn"),
        F.max(id_col).alias("__mx"),
    )
    dup = freq.filter(F.col("__mn") != F.col("__mx"))
    if max_df is not None:
        dup = dup.filter(F.col("__c") <= max_df)
    posts = wins.join(dup.select("__h"), "__h")
    return _runs_from_dup_posts(posts, df, id_col, text_col, min_len)


def _runs_from_dup_posts(
    posts: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int,
) -> DataFrame:
    """Diagonal-run assembly from an ALREADY dup-filtered (id, pos,
    __h) posting relation — the tail of :func:`_dup_runs_from_postings`
    (round 12: factored out so the level-1 dup-window artifact can feed
    it directly — see :func:`shared_dup_window_postings`)."""
    a = posts.select(
        "__h", F.col(id_col).alias("doc_a"), F.col("pos").alias("pa")
    )
    b = posts.select(
        "__h", F.col(id_col).alias("doc_b"), F.col("pos").alias("pb")
    )
    pairs = (
        a.join(b, "__h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("d", F.col("pa") - F.col("pb"))
    )
    # gaps-and-islands on the diagonal: (pa − row_number) is constant
    # exactly across consecutive pa values. The window partitions by
    # (pair, diagonal) — run-length-bounded partitions, never global.
    w = Window.partitionBy("doc_a", "doc_b", "d").orderBy("pa")
    runs = pairs.withColumn("__isl", F.col("pa") - F.row_number().over(w))
    cand = (
        runs.groupBy("doc_a", "doc_b", "d", "__isl")
        .agg(
            F.min("pa").alias("pos_a"),
            F.min("pb").alias("pos_b"),
            (F.count("*") + (min_len - 1)).alias("dup_len"),
        )
        .drop("d", "__isl")
    )
    # collision guard: the reported substrings must actually be equal.
    # Candidates are output-bounded (dup runs only), so AQE broadcasts
    # them onto the two document scans.
    ta = df.select(
        F.col(id_col).alias("doc_a"), F.col(text_col).alias("__ta")
    )
    tb = df.select(
        F.col(id_col).alias("doc_b"), F.col(text_col).alias("__tb")
    )
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(
            F.expr("substring(__ta, pos_a, dup_len)")
            == F.expr("substring(__tb, pos_b, dup_len)")
        )
        .select("doc_a", "doc_b", "pos_a", "pos_b", "dup_len")
    )


def cross_corpus_substring_runs(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 50,
    max_df: int | None = 200,
    _handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Verbatim ≥``min_len``-char overlaps BETWEEN two relations — the
    char-level decontamination check (did benchmark text leak into the
    training corpus verbatim?), the ExactSubstr complement of the
    n-gram `dedup.decontaminate`: that one needs a fixed n, this finds
    arbitrary-length leaks ≥ min_len and their exact spans.

    Same diagonal-run machinery as :func:`duplicated_substring_runs`,
    but the posting join is corpus×bench instead of a self-join — cost
    Σ df_corpus(h)·df_bench(h) over shared window hashes, and only the
    corpus side is df-capped (the benchmark is small by definition;
    capping it would hide exactly the leaks being hunted). Emits
    (corpus_id, bench_id, pos_c, pos_b, dup_len), equality-verified.

    Scale (round 10, VERDICT task #5): when the benchmark window-hash
    SET is broadcast-sized (an eval benchmark always is), it is pushed
    onto the corpus-side window generation as a BROADCAST SEMI-JOIN —
    the probe rides in the same codegen stage as the window scan, so a
    non-matching train window is dropped where it is generated and
    NEVER shuffles. Exact (a set probe has no false positives or
    negatives — strictly better than a lossy bloom bitmap where the
    set fits a broadcast). Round 11 (ADVICE r10): the broadcast is
    size-GATED — above ``_BENCH_BROADCAST_MAX_HASHES`` distinct hashes
    the same slot downgrades to a plain shuffled semi-join instead of
    collecting an arbitrarily large set to the driver (the function is
    a generic two-corpus operator, not bench-only). The df cap
    is counted AFTER the prune — provably the same cap decisions, since
    pruning keeps every corpus occurrence of a shared hash, and only
    shared hashes can produce output. Before this restructure the cap's
    groupBy shuffled the ENTIRE corpus window relation (≈ total_chars
    rows) to count frequencies of hashes that mostly match nothing; now
    every post-scan stage operates on the shared-hash subset only. At
    100 TB this is the shape actually run before every training export.
    """
    bw = window_hash_postings(bench, id_col, text_col, min_len).persist()
    if _handles is not None:
        _handles.append(bw)
    bench_hashes = bw.select("__h").distinct()
    # Bench-side size gate (ADVICE r10): forcing the broadcast
    # unconditionally would collect the whole bench hash set to the
    # driver even when the "bench" relation is a second full corpus
    # (the function is a generic cross-corpus operator, not bench-only),
    # bypassing autoBroadcastJoinThreshold. Counting the distinct set is
    # one cheap job over the already-persisted bw; under the bound the
    # probe rides in the corpus window-generation codegen stage, above
    # it the same slot downgrades to a plain shuffled semi-join (exact
    # either way — a bloom_pred would trade false positives for memory
    # only once even the SHUFFLE of corpus windows is the bottleneck).
    n_bench = bench_hashes.count()
    probe = (
        F.broadcast(bench_hashes)
        if n_bench <= _BENCH_BROADCAST_MAX_HASHES
        else bench_hashes
    )
    cw = (
        window_hash_postings(corpus, id_col, text_col, min_len)
        .join(probe, "__h", "left_semi")
        .persist()
    )
    if _handles is not None:
        _handles.append(cw)
    return _cross_runs_from_postings(
        cw, bw, corpus, bench, id_col, text_col, min_len, max_df
    )


# ~32 MB of int64 hashes — comfortably inside executor broadcast range
# while bounding driver collect for the generic two-corpus case.
_BENCH_BROADCAST_MAX_HASHES = 4_000_000


def _cross_runs_from_postings(
    cw: DataFrame,
    bw: DataFrame,
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int,
    max_df: int | None,
) -> DataFrame:
    """Cross-corpus diagonal-run assembly from precomputed window
    postings: ``cw`` = corpus-side (id, pos, __h) ALREADY semi-joined
    to the bench hash set, ``bw`` = bench-side postings. The df cap is
    counted after the prune — provably the same cap decisions, since
    pruning keeps every corpus occurrence of a shared hash, and only
    shared hashes can produce output."""
    if max_df is not None:
        ok = (
            cw.groupBy("__h")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("__h")
        )
        cw = cw.join(ok, "__h")
    c = cw.select(
        "__h", F.col(id_col).alias("corpus_id"), F.col("pos").alias("pc")
    )
    b = bw.select(
        "__h", F.col(id_col).alias("bench_id"), F.col("pos").alias("pb")
    )
    pairs = c.join(b, "__h").withColumn("d", F.col("pc") - F.col("pb"))
    w = Window.partitionBy("corpus_id", "bench_id", "d").orderBy("pc")
    runs = pairs.withColumn("__isl", F.col("pc") - F.row_number().over(w))
    cand = (
        runs.groupBy("corpus_id", "bench_id", "d", "__isl")
        .agg(
            F.min("pc").alias("pos_c"),
            F.min("pb").alias("pos_b"),
            (F.count("*") + (min_len - 1)).alias("dup_len"),
        )
        .drop("d", "__isl")
    )
    tc = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(text_col).alias("__tc")
    )
    tb = bench.select(
        F.col(id_col).alias("bench_id"), F.col(text_col).alias("__tb")
    )
    return (
        cand.join(tc, "corpus_id")
        .join(tb, "bench_id")
        .filter(
            F.expr("substring(__tc, pos_c, dup_len)")
            == F.expr("substring(__tb, pos_b, dup_len)")
        )
        .select("corpus_id", "bench_id", "pos_c", "pos_b", "dup_len")
    )


def intra_doc_repeat_runs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 20,
    max_occ: int | None = 50,
    _handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Maximal WITHIN-document repeated substrings of length ≥
    ``min_len`` — the self-repeat half of ExactSubstr (Lee et al. also
    cut a document's own verbatim repeats: boilerplate lists, repeated
    headers, copy-paste stutter; complements the word-level
    repetition_stats, which cannot see arbitrary-length char repeats).

    Same machinery as :func:`duplicated_substring_runs`, with the
    diagonal now the repeat PERIOD: positions pa < pb of one document
    sharing a window hash lie on diagonal d = pb − pa; a maximal
    contiguous run of matching window starts on one diagonal
    reconstructs the exact repeat length (run + min_len − 1 = |{p :
    text[p] = text[p+d]}| — the same edge argument as the cross-doc
    form, exact also for OVERLAPPING repeats d < min_len, i.e.
    periodic text). ``max_occ`` caps per-document occurrences of one
    window (C(occ,2) pair blow-up on degenerate single-char runs —
    the documented miss condition).

    Columns: id, pos_a, pos_b, period, rep_len — equality-verified.
    """
    wins = window_hash_postings(df, id_col, text_col, min_len).persist()
    if _handles is not None:
        _handles.append(wins)
    return _intra_runs_from_postings(
        wins, df, id_col, text_col, min_len, max_occ
    )


def _intra_runs_from_postings(
    wins: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int,
    max_occ: int | None,
) -> DataFrame:
    """Within-document diagonal-run assembly from a precomputed
    (id, pos, __h) window relation — the post-scan half of
    :func:`intra_doc_repeat_runs` (see :func:`_dup_runs_from_postings`
    for why the scan is parameterized out)."""
    occ = wins.groupBy(id_col, "__h").agg(F.count("*").alias("__c"))
    dup = occ.filter(F.col("__c") >= 2)
    if max_occ is not None:
        dup = dup.filter(F.col("__c") <= max_occ)
    posts = wins.join(dup.select(id_col, "__h"), [id_col, "__h"])
    a = posts.select(id_col, "__h", F.col("pos").alias("pa"))
    b = posts.select(id_col, "__h", F.col("pos").alias("pb"))
    pairs = (
        a.join(b, [id_col, "__h"])
        .filter(F.col("pa") < F.col("pb"))
        .withColumn("period", F.col("pb") - F.col("pa"))
    )
    w = Window.partitionBy(id_col, "period").orderBy("pa")
    runs = pairs.withColumn("__isl", F.col("pa") - F.row_number().over(w))
    cand = (
        runs.groupBy(id_col, "period", "__isl")
        .agg(
            F.min("pa").alias("pos_a"),
            (F.count("*") + (min_len - 1)).alias("rep_len"),
        )
        .withColumn("pos_b", F.col("pos_a") + F.col("period"))
        .drop("__isl")
    )
    t = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    return (
        cand.join(t, id_col)
        .filter(
            F.expr("substring(__t, pos_a, rep_len)")
            == F.expr("substring(__t, pos_b, rep_len)")
        )
        .select(id_col, "pos_a", "pos_b", "period", "rep_len")
    )


def merge_intervals(
    ivals: DataFrame, id_col: str, start_col: str, end_col: str
) -> DataFrame:
    """Merge overlapping/touching half-open intervals per ``id_col``
    (classic gaps-and-islands: running max of interval end, partition-
    local — never a global sort). Returns one row per merged island
    with ``__ms``/``__me`` bounds. ONE definition shared by the cut
    plan and the coverage metric, so an edge-rule fix cannot make the
    two reports disagree."""
    w = Window.partitionBy(id_col).orderBy(start_col, end_col)
    prev_e = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    return (
        ivals.withColumn(
            "__new",
            F.when(
                prev_e.isNull() | (F.col(start_col) > prev_e), 1
            ).otherwise(0),
        )
        .withColumn(
            "__g",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "__g")
        .agg(
            F.min(start_col).alias("__ms"), F.max(end_col).alias("__me")
        )
    )


def exactsubstr_cut_stats(
    df: DataFrame,
    id_col: str,
    runs: DataFrame,
    nchars_col: str = "n_chars",
) -> DataFrame:
    """The ACTIONABLE output of ExactSubstr dedup (Lee et al. 2021 §4.2
    "deduplicate by removing the duplicated spans"): per affected
    document, the merged cut intervals and resulting size, under the
    deterministic keep-first policy — for every verified duplicated
    run the occurrence in the LOWER-id document survives and the
    higher-id document's span is cut. Pairwise-consistent: content
    shared by a set of documents always survives in the set's minimum
    id (any other copy is the ``doc_b`` of some pair), subject to the
    runs relation's df-cap miss condition.

    Overlapping cut intervals per document are merged with the classic
    gaps-and-islands pass (running max of interval end, partitioned
    per document — never a global sort), so ``chars_removed`` counts
    each character once however many partners duplicated it.

    Returns (doc_id, n_spans_cut, chars_removed, new_len) for affected
    documents — the summary a curation run audits before committing
    the rewrite; the rewrite itself is a substring-splice over the
    same merged intervals.
    """
    cuts = runs.select(
        F.col("doc_b").alias(id_col),
        F.col("pos_b").alias("__s"),
        (F.col("pos_b") + F.col("dup_len")).alias("__e"),
    )
    merged = merge_intervals(cuts, id_col, "__s", "__e")
    per_doc = merged.groupBy(id_col).agg(
        F.count("*").alias("n_spans_cut"),
        F.sum(F.col("__me") - F.col("__ms")).alias("chars_removed"),
    )
    return (
        per_doc.join(df.select(id_col, nchars_col), id_col)
        .select(
            id_col,
            "n_spans_cut",
            "chars_removed",
            (F.col(nchars_col) - F.col("chars_removed")).alias("new_len"),
        )
        .orderBy(id_col)
    )


_RUNS_VERSION = 1
_XCORPUS_VERSION = 1
_IREPEAT_VERSION = 1
_DUP_WINDOWS_VERSION = 1


def shared_dup_window_postings(
    spark, sf_dir: str, min_len: int = 50
) -> DataFrame:
    """LEVEL-1 of the two-level ExactSubstr scheme (VERDICT r11 task
    #7): the (doc_id, pos, __h, __c) posting relation restricted to
    window hashes seen in ≥2 DISTINCT documents — UNCAPPED (no df cap;
    ``__c`` is the global occurrence count, so every df cap is a
    consumer-side filter), fingerprint-keyed.

    Why: the substr-runs and decontamination-runs builds each
    regenerated the FULL corpus window relation and re-aggregated its
    frequencies per build, while round 11 measured (and rejected)
    materializing that full relation — it is ~20× its source text.
    The dup-restricted subset measured **9.2% of the window relation**
    at sf0.1, and both l=50 families derive from it exactly:

    - substr runs: posts = level-1 filtered ``__c <= max_df`` — equal
      to wins ⋈ {h: ≥2 docs ∧ c ≤ cap} by construction;
    - decon runs: a train-window sharing a hash with a test window has
      a ≥2-distinct-doc hash (the pair IS two docs), so the semi-join
      prune loses nothing; ALL train occurrences of a dup hash are
      present, so the post-prune df-cap counts are unchanged; split
      membership is a pure md5(doc_id) function, recomputable from the
      posting rows. (Exact-equality experiment recorded in
      OPTIMIZATION_r12.md; pinned by tests.)

    The intra-repeat family deliberately does NOT share it: different
    window length (l=20) and same-document repeats are invisible to the
    ≥2-distinct-docs criterion. Caveat for 100 TB: the relation is
    uncapped, so its size tracks corpus duplication (boilerplate-heavy
    corpora grow it); the builds that consume it still apply their df
    caps, only this build pays the uncapped join — the standard
    inverted-index trade, documented rather than hidden."""
    import os

    from nabatshy_spark import artifacts
    from nabatshy_spark.catalog import load

    src = os.path.join(sf_dir, "documents.parquet")
    key = (
        f"{artifacts.source_fingerprint(src)}_v{_DUP_WINDOWS_VERSION}"
        f"_l{min_len}"
    )

    def _build(staging: str) -> None:
        docs = load(spark, sf_dir, "documents")
        wins = window_hash_postings(docs, "doc_id", "text", min_len).persist()
        try:
            freq = wins.groupBy("__h").agg(
                F.count("*").alias("__c"),
                F.min("doc_id").alias("__mn"),
                F.max("doc_id").alias("__mx"),
            )
            dup = freq.filter(F.col("__mn") != F.col("__mx")).select(
                "__h", "__c"
            )
            # Explicit hash partitioning before the write: without it
            # AQE coalesced the posting join's reduce side to ONE task
            # on the cold run (measured 9.1 vs 4.3 s — the output is
            # small in bytes but the join is not small in compute),
            # and the written layout would be a single file that pins
            # the consumers' self-join to one scan task. Core-count
            # files, hash-clustered by __h for the downstream joins.
            par = spark.sparkContext.defaultParallelism
            (
                wins.join(dup, "__h")
                .repartition(par, "__h")
                .write.mode("overwrite")
                .parquet(staging)
            )
        finally:
            wins.unpersist()

    path = artifacts.ensure(
        "dup_windows", key, _build, env_var="SPARK_GRAFT_SUBSTR_DIR"
    )
    return spark.read.schema(
        "__h bigint, doc_id bigint, pos int, __c bigint"
    ).parquet(path)


def shared_substring_runs(
    spark,
    sf_dir: str,
    min_len: int = 50,
    max_df: int | None = 200,
) -> DataFrame:
    """Fingerprint-keyed materialization of
    ``duplicated_substring_runs(documents, ...)`` — the exact-substring
    twin of dedup.shared_ngram_pairs, with the same lifecycle (content
    fingerprint + parameters key, staging+rename publish, `_SUCCESS`
    gate — all owned by nabatshy_spark.artifacts.ensure). The runs
    relation is dup-bounded (tens of rows here, always orders of
    magnitude below the corpus); at 100 TB the window pass is a
    multi-hour job whose artifact every consumer reads.

    The internal window-relation persist is released here as soon as
    the artifact is written (the build is the one materialization this
    cache exists for), so repeated invocations leak no storage blocks.
    """
    import os

    from nabatshy_spark import artifacts
    from nabatshy_spark.catalog import load

    src = os.path.join(sf_dir, "documents.parquet")
    # _RUNS_VERSION tracks the operator, the fingerprint tracks the
    # data — bump on any semantic change to duplicated_substring_runs.
    key = (
        f"{artifacts.source_fingerprint(src)}_v{_RUNS_VERSION}"
        f"_l{min_len}_df{max_df}"
    )

    def _build(staging: str) -> None:
        # Round 12 (VERDICT r11 task #7): derive from the level-1
        # dup-window artifact instead of regenerating + re-aggregating
        # the full window relation — posts = level-1 filtered to the
        # df cap is exactly wins ⋈ {h: ≥2 docs ∧ c ≤ cap}, so the runs
        # relation is identical (exact-equality pinned in
        # tests/test_round12_ops.py and measured in
        # OPTIMIZATION_r12.md: builds 4.2+3.0 s → 3.6 shared + 0.7 +
        # 1.4 s at sf0.1, and ONE corpus window scan per corpus
        # version instead of two).
        posts = shared_dup_window_postings(spark, sf_dir, min_len)
        if max_df is not None:
            posts = posts.filter(F.col("__c") <= max_df)
        runs = _runs_from_dup_posts(
            posts.select("__h", "doc_id", "pos"),
            load(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            min_len,
        )
        runs.coalesce(1).write.mode("overwrite").parquet(staging)

    path = artifacts.ensure(
        "substr_runs", key, _build, env_var="SPARK_GRAFT_SUBSTR_DIR"
    )
    return spark.read.parquet(path)


def shared_decontamination_runs(
    spark,
    sf_dir: str,
    min_len: int = 50,
    max_df: int | None = 200,
    train_bps: int = 62259,
    val_bps: int = 1638,
) -> DataFrame:
    """Fingerprint-keyed materialization of the train/test
    cross-corpus runs over the deterministic hash split of
    ``documents`` — decontamination is a once-per-corpus-version job
    whose (leak-bounded) output every consumer reads, exactly like
    :func:`shared_substring_runs`. Round 10: the per-invocation form
    looked cheap in bench only because Spark's cache manager was
    silently re-serving the previous lap's persisted window relations;
    releasing those persists exposed the honest ~2.8 s-per-invocation
    cost, and the artifact is the correct fix — the build is paid once
    (recorded as a BUILD line), consumers read tens of rows."""
    import os

    from nabatshy_spark import artifacts
    from nabatshy_spark.catalog import load
    from nabatshy_spark.operators import sampling

    src = os.path.join(sf_dir, "documents.parquet")
    key = (
        f"{artifacts.source_fingerprint(src)}_v{_XCORPUS_VERSION}"
        f"_l{min_len}_df{max_df}_tb{train_bps}_vb{val_bps}"
    )

    def _build(staging: str) -> None:
        # Round 12 (VERDICT r11 task #7): both sides of the cross-split
        # posting join come from the level-1 dup-window artifact.
        # Equivalence (measured exact at sf0.1, pinned in
        # tests/test_round12_ops.py): a train window that shares a hash
        # with a test window has a ≥2-distinct-doc hash, so the dup
        # restriction drops nothing the semi-join keeps; all train
        # occurrences of a dup hash are present, so the post-prune df
        # cap counts the same rows; split membership is a pure
        # md5(doc_id) function, so attaching it to posting rows equals
        # windowing the split relations. The generic
        # cross_corpus_substring_runs operator is unchanged — this is
        # the artifact build's derivation only.
        docs = load(spark, sf_dir, "documents")
        splits = sampling.split_corpus(
            docs, "doc_id", train_bps=train_bps, val_bps=val_bps
        )
        train = splits.filter(F.col("split") == "train")
        test = splits.filter(F.col("split") == "test")
        lvl1 = shared_dup_window_postings(spark, sf_dir, min_len).join(
            splits.select("doc_id", "split"), "doc_id"
        )
        trainw = lvl1.filter(F.col("split") == "train").select(
            "doc_id", "pos", "__h"
        )
        testw = lvl1.filter(F.col("split") == "test").select(
            "doc_id", "pos", "__h"
        )
        test_hashes = testw.select("__h").distinct()
        # same broadcast size gate as the generic operator
        n_bench = test_hashes.count()
        probe = (
            F.broadcast(test_hashes)
            if n_bench <= _BENCH_BROADCAST_MAX_HASHES
            else test_hashes
        )
        cw = trainw.join(probe, "__h", "left_semi")
        runs = _cross_runs_from_postings(
            cw, testw, train, test, "doc_id", "text", min_len, max_df
        )
        runs.coalesce(1).write.mode("overwrite").parquet(staging)

    path = artifacts.ensure(
        "decon_runs", key, _build, env_var="SPARK_GRAFT_SUBSTR_DIR"
    )
    return spark.read.parquet(path)


def shared_intra_repeat_runs(
    spark,
    sf_dir: str,
    min_len: int = 20,
    max_occ: int | None = 50,
) -> DataFrame:
    """Fingerprint-keyed materialization of
    ``intra_doc_repeat_runs(documents, ...)`` — same lifecycle and
    rationale as :func:`shared_decontamination_runs`."""
    import os

    from nabatshy_spark import artifacts
    from nabatshy_spark.catalog import load

    src = os.path.join(sf_dir, "documents.parquet")
    key = (
        f"{artifacts.source_fingerprint(src)}_v{_IREPEAT_VERSION}"
        f"_l{min_len}_occ{max_occ}"
    )

    def _build(staging: str) -> None:
        handles: list[DataFrame] = []
        runs = intra_doc_repeat_runs(
            load(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            min_len=min_len,
            max_occ=max_occ,
            _handles=handles,
        )
        try:
            runs.coalesce(1).write.mode("overwrite").parquet(staging)
        finally:
            for h in handles:
                h.unpersist()

    path = artifacts.ensure(
        "intra_runs", key, _build, env_var="SPARK_GRAFT_SUBSTR_DIR"
    )
    return spark.read.parquet(path)


def exactsubstr_rewrite(
    df: DataFrame, id_col: str, text_col: str, runs: DataFrame
) -> DataFrame:
    """APPLY the ExactSubstr cut plan (Lee et al. 2021 §4.2): splice
    the keep-first cut intervals out of each affected document and
    return the rewritten corpus — same schema as ``df``, unaffected
    rows passed through byte-identical. This is the step
    :func:`exactsubstr_cut_stats` audits; until round 10 it existed
    only as the unit test's reference splice.

    Mechanics: cut intervals (doc_b side of every verified run) merge
    per document via :func:`merge_intervals` — the ONE interval-merge
    definition, so the rewrite can never disagree with the audited
    plan — then one ``aggregate`` expression walks the sorted interval
    list building the kept-segment concatenation (per-document work is
    O(intervals + |text|), affected documents only; the HOF runs
    interpreted but over the dup-bounded affected set, never the
    corpus).

    Scale: at 100 TB this is the rewrite job between the runs artifact
    and the exported corpus; everything is a join + per-row expression
    — no shuffle beyond the merge's per-document window.
    """
    cuts = runs.select(
        F.col("doc_b").alias(id_col),
        F.col("pos_b").cast("long").alias("__s"),
        (F.col("pos_b") + F.col("dup_len")).cast("long").alias("__e"),
    )
    merged = merge_intervals(cuts, id_col, "__s", "__e")
    iv = merged.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("__ms").cast("long").alias("s"),
                    F.col("__me").cast("long").alias("e"),
                )
            )
        ).alias("__iv")
    )
    splice = F.expr(
        f"""concat(
          aggregate(
            __iv,
            struct(cast(1 as bigint) as pos, '' as acc),
            (st, x) -> struct(
              x.e as pos,
              concat(st.acc,
                     substring({text_col}, cast(st.pos as int),
                               cast(x.s - st.pos as int))) as acc),
            st -> concat(st.acc,
                         substring({text_col}, cast(st.pos as int),
                                   cast(length({text_col}) - st.pos + 1
                                        as int)))
        ))"""
    )
    out = df.join(iv, id_col, "left")
    return out.withColumn(
        text_col,
        F.when(F.col("__iv").isNull(), F.col(text_col)).otherwise(splice),
    ).drop("__iv")
