"""Deduplication operators for large-scale training-data pipelines.

No reference counterpart (SURVEY §2.11) — designed Spark-first:

- exact:     hash-groupBy on a content fingerprint (sha256), so the
             shuffle key is 32 bytes instead of the full document;
- n-gram Jaccard: inverted-index self-join on shingles (never a cross
             join) — the exact near-dup baseline;
- MinHash+LSH: shingle → 128 minhashes → 64 bands × 2 rows → bucket
             join → exact-Jaccard verification of candidates only.
             At threshold t=0.5 the miss probability per true pair is
             (1 - t^2)^64 ≈ 1e-8, so the output equals the exact
             operator's (which is what the DuckDB oracle checks);
- SimHash:   60-bit simhash (md5-derived token hashes, so any engine
             can reproduce it), near-dup = hamming ≤ 3 found via
             4×15-bit band pigeonhole join (distance ≤ 3 ⇒ at least
             one band identical — lossless, not approximate);
- embedding: cosine-threshold pairs over the vector column.

Scale notes (100 TB): every operator here shuffles on short keys
(fingerprints, shingle hashes, band buckets) and verifies only
candidate pairs; document bodies move at most once. For skewed
shingles (boilerplate), add a document-frequency cap on the inverted
index before the self-join.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def fingerprint(col: Column) -> Column:
    """Content fingerprint: sha256 hex of the raw text."""
    return F.sha2(col, 256)


def tokens(col: Column) -> Column:
    return F.split(col, " ")


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram strings (space-joined) of a text column.

    The token array is bound ONCE through a single-element-array
    ``transform`` so the lambda variable ``t`` is a materialized value:
    referencing the raw ``tokens(col)`` expression inside the n-gram
    lambda instead re-evaluates the split per ``element_at`` (HOFs are
    interpreted, no common-subexpression elimination) — measured 9×
    slower at sf0.1."""

    def gram_of(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
        gram = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(n)]
            ),
        )
        return F.when(F.size(t) >= n, F.array_distinct(gram)).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(tokens(col)), gram_of), 1)


def _md5_60bit(col: Column) -> Column:
    """Deterministic 60-bit token hash both Spark and DuckDB can
    compute: first 15 hex chars of md5, parsed base-16."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group by content fingerprint; keep the smallest id as survivor.

    Returns (doc_id, n_dups): one row per distinct content.
    """
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("__fp"))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
        .select(id_col, "n_dups")
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (inverted-index join)
# ---------------------------------------------------------------------------


def _jaccard_from_shingled(sh: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """Pairs with Jaccard ≥ threshold from a (id, __sh array) frame."""
    sizes = sh.select(F.col(id_col), F.size("__sh").alias("__sz"))
    ex = sh.select(F.col(id_col), F.explode("__sh").alias("__s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("__i"))
    )
    ja = (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("__sz", "__sa"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("__sz", "__sb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("__i") / (F.col("__sa") + F.col("__sb") - F.col("__i")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return ja.select("doc_a", "doc_b", "jaccard")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact near-dup pairs: word-n-gram Jaccard ≥ threshold.

    Inverted-index self-join on shingles: only documents sharing at
    least one shingle ever meet, so cost is Σ df(s)² over shingles,
    not N².

    ``max_df`` is the document-frequency cap (SCALE.md): shingles shared
    by more than ``max_df`` documents are dropped from CANDIDATE
    GENERATION only — the join cost becomes Σ min(df, cap)², bounded on
    boilerplate-heavy corpora where one header shingle's df² would
    otherwise dominate. Verification then computes Jaccard from the
    FULL shingle sets of each candidate pair, so reported values are
    exact and the only possible divergence from the uncapped operator
    is a pair whose every shared shingle is boilerplate (df > cap) —
    the pairs the cap exists to ignore.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.repartition(parallelism, id_col)
        .select(F.col(id_col), shingles(F.col(text_col), n).alias("__sh"))
        .persist()  # referenced by sizes + both explode sides
    )
    if max_df is None:
        return _jaccard_from_shingled(sh, id_col, threshold)
    # The HOT set (df > cap) is small BY DEFINITION (≤ postings/cap
    # distinct shingles), so it broadcasts and the posting filter is a
    # narrow join — the corpus postings are never shuffled to apply
    # the cap. The capped self-join then costs Σ min(df, cap)².
    ex = sh.select(F.col(id_col), F.explode("__sh").alias("__s"))
    hot = (
        ex.groupBy("__s")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("__s", F.lit(True).alias("__hot"))
    )
    flagged = ex.join(F.broadcast(hot), "__s", "left")
    rare = flagged.filter(F.col("__hot").isNull()).select(F.col(id_col), "__s")
    # per-doc count of hot shingles: nonzero only for docs touching
    # boilerplate, so this side table is small on clean corpora
    hot_cnt = (
        flagged.filter(F.col("__hot"))
        .groupBy(id_col)
        .agg(F.count("*").alias("__h"))
    )
    # Rare-posting self-join gives the EXACT intersection count over
    # non-hot shingles — no array payloads move. The hot contribution
    # is bounded per pair by min(hot_a, hot_b), so only pairs where
    # that slack could push Jaccard over the threshold need their full
    # shingle arrays compared; everything else resolves from counts.
    a, b = rare.alias("a"), rare.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("__i"))
    )
    sizes = sh.select(F.col(id_col), F.size("__sh").alias("__sz"))
    scored = (
        inter.join(
            sizes.select(F.col(id_col).alias("doc_a"), F.col("__sz").alias("__sa")),
            "doc_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("doc_b"), F.col("__sz").alias("__sb")),
            "doc_b",
        )
        .join(
            hot_cnt.select(F.col(id_col).alias("doc_a"), F.col("__h").alias("__ha")),
            "doc_a",
            "left",
        )
        .join(
            hot_cnt.select(F.col(id_col).alias("doc_b"), F.col("__h").alias("__hb")),
            "doc_b",
            "left",
        )
        .withColumn(
            "__slack",
            F.least(F.coalesce("__ha", F.lit(0)), F.coalesce("__hb", F.lit(0))),
        )
        .withColumn(
            "__ub",
            F.least(F.col("__i") + F.col("__slack"), F.least("__sa", "__sb")),
        )
        # upper-bound Jaccard ≥ true Jaccard (monotonic in i), so this
        # filter never drops a qualifying pair
        .filter(
            F.round(F.col("__ub") / (F.col("__sa") + F.col("__sb") - F.col("__ub")), 6)
            >= threshold
        )
        # tiny (only threshold-crossing pairs) but referenced by four
        # downstream branches — without this the posting self-join
        # re-executes per branch (measured 8× the query)
        .persist()
    )
    exact_now = (
        scored.filter(F.col("__slack") == 0)
        .withColumn(
            "jaccard",
            F.round(F.col("__i") / (F.col("__sa") + F.col("__sb") - F.col("__i")), 6),
        )
        .select("doc_a", "doc_b", "jaccard")
    )
    maybe = scored.filter(F.col("__slack") > 0).select("doc_a", "doc_b")
    maybe_ids = (
        maybe.select(F.col("doc_a").alias(id_col))
        .union(maybe.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sized = sh.join(maybe_ids, id_col, "left_semi").select(
        F.col(id_col), F.col("__sh"), F.size("__sh").alias("__sz")
    )
    verified = (
        maybe.join(
            sized.select(
                F.col(id_col).alias("doc_a"),
                F.col("__sh").alias("__sh_a"),
                F.col("__sz").alias("__sa"),
            ),
            "doc_a",
        )
        .join(
            sized.select(
                F.col(id_col).alias("doc_b"),
                F.col("__sh").alias("__sh_b"),
                F.col("__sz").alias("__sb"),
            ),
            "doc_b",
        )
        .withColumn("__i", F.size(F.array_intersect("__sh_a", "__sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("__i") / (F.col("__sa") + F.col("__sb") - F.col("__i")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return exact_now.unionByName(verified)


# Bump when ngram_jaccard_pairs' OUTPUT semantics change (see key note
# in shared_ngram_pairs).
_PAIRS_VERSION = 1


def shared_ngram_pairs(
    spark,
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 200,
) -> DataFrame:
    """Fingerprint-keyed materialization of
    ``ngram_jaccard_pairs(documents, "doc_id", "text", n, threshold,
    max_df)`` — the pair relation EIGHT registry queries consume with
    identical parameters (dedup_ngram_jaccard, dedup_components,
    dedup_cluster_stats, dedup_keep_best, source_overlap_matrix,
    dup_threshold_curve, split-leakage, minhash_dedup_eval).

    Same lifecycle as the IVF index / continuous-aggregate rollup
    (sources/contagg.py): keyed by a content fingerprint of the source
    parquet plus the operator parameters, built once, staged to a temp
    dir and atomically renamed so a failed or concurrent build can
    never be read as complete. Any rewrite of the documents table
    invalidates the key.

    Why (VERDICT r8 #1): the capped posting join costs ~2.1 s at sf0.1
    — the measured floor for EVERY query that recomputes it — while the
    pair relation itself is a few hundred rows. A curation run asks all
    of these questions of the SAME pair set; recomputing the join per
    question is the single biggest redundant cost in the bench. The
    materialized relation is byte-identical to the direct operator
    output (deterministic operator, exact doubles through parquet), so
    oracle differentials are unaffected.

    At 100 TB this is not an optimization but the only sane shape: the
    pair-finding pass is a multi-hour job whose output (dup pairs) is
    many orders of magnitude smaller than its input; every downstream
    consumer reads the artifact.

    Lifecycle (key/staging/publish/GC) is owned by
    nabatshy_spark.artifacts.ensure — shared with the substring-run
    artifact, the IVF indexes, the continuous-aggregate rollup, and
    the layout tables.
    """
    import os

    from nabatshy_spark import artifacts
    from nabatshy_spark.catalog import load

    src = os.path.join(sf_dir, "documents.parquet")
    thr = f"{threshold:g}".replace(".", "p")
    # _PAIRS_VERSION is part of the key: the fingerprint tracks the
    # DATA, not the operator — bump it whenever ngram_jaccard_pairs'
    # semantics change, or a machine with a warm cache silently serves
    # pre-change pairs to all eight consumers.
    key = (
        f"{artifacts.source_fingerprint(src)}_v{_PAIRS_VERSION}"
        f"_n{n}_t{thr}_df{max_df}"
    )

    def _build(staging: str) -> None:
        pairs = ngram_jaccard_pairs(
            load(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            n=n,
            threshold=threshold,
            max_df=max_df,
        )
        # coalesce(1): the pair relation is output-bounded (threshold-
        # crossing near-dup pairs — hundreds of rows here, and always
        # orders of magnitude below the corpus). If a corpus ever made
        # it write-bound, drop the coalesce: readers are schema-stable
        # either way.
        pairs.coalesce(1).write.mode("overwrite").parquet(staging)

    path = artifacts.ensure(
        "ngram_pairs", key, _build, env_var="SPARK_GRAFT_PAIRS_DIR"
    )
    return spark.read.parquet(path)


# Versions the curation FLAG artifact: the documents fingerprint tracks
# the data; this tracks the keep predicate (quality ≥ 0.6 ∧ lang = 'en'
# — textanalysis.quality_score_expr / pred_lang_expr) and the flag
# schema. Bump on any change to those, or a warm artifact root serves
# pre-change flags to every curation consumer.
_CURATION_FLAGS_VERSION = 1


def shared_curation_flags(spark, sf_dir: str) -> DataFrame:
    """Fingerprint-keyed materialization of the per-document curation
    KEEP-FLAG relation: (doc_id, __q quality≥0.6, __k quality∧lang-en,
    __fp sha256-of-text when kept else NULL) — one narrow row per
    document, never text.

    Why (VERDICT r11 task #4): the quality/langid regex expressions are
    the most expensive scan predicates in the tree, and before round 12
    they were evaluated independently by curation_funnel (per run, into
    a session-local checkpoint), by curate_corpus (per run) and by the
    shared_curated_pairs BUILD — three evaluations of one deterministic
    per-corpus relation. This artifact is the single evaluation; the
    funnel's stage counts, both queries' kept sets and the pair build's
    survivor base are all projections of it. Deterministic booleans +
    sha256 hex → parquet round-trip exact, consumers byte-identical.
    Explicit read schema: an empty corpus writes no part files."""
    import os

    from nabatshy_spark import artifacts
    from nabatshy_spark.catalog import load
    from nabatshy_spark.operators import textanalysis

    src = os.path.join(sf_dir, "documents.parquet")
    # "flags_" prefix: this family shares SPARK_GRAFT_PAIRS_DIR with
    # the pair artifacts, and env-var roots drop the family segment —
    # the same collision class ADVICE r11 flagged on curated_pairs.
    key = (
        f"flags_{artifacts.source_fingerprint(src)}"
        f"_v{_CURATION_FLAGS_VERSION}"
    )

    def _build(staging: str) -> None:
        docs = load(spark, sf_dir, "documents")
        qpred = textanalysis.quality_score_expr(F.col("text")) >= 0.6
        lpred = textanalysis.pred_lang_expr(F.col("text")) == "en"
        (
            docs.select(
                "doc_id",
                qpred.alias("__q"),
                (qpred & lpred).alias("__k"),
                F.when(qpred & lpred, fingerprint(F.col("text"))).alias(
                    "__fp"
                ),
            )
            .repartition(1)
            .write.mode("overwrite")
            .parquet(staging)
        )

    path = artifacts.ensure(
        "curation_flags", key, _build, env_var="SPARK_GRAFT_PAIRS_DIR"
    )
    return spark.read.schema(
        "doc_id bigint, __q boolean, __k boolean, __fp string"
    ).parquet(path)


# Versions the CURATED pair artifact: the documents fingerprint tracks
# the data; this tracks (a) the keep predicate (quality ≥ 0.6 ∧
# lang = 'en' — textanalysis.quality_score_expr / pred_lang_expr), (b)
# the exact-dedup-first composition, and (c) ngram_jaccard_pairs
# semantics. Bump on any change to those, or a warm artifact root
# serves pre-change pairs to both curation queries.
_CURATED_PAIRS_VERSION = 1


def shared_curated_pairs(
    spark,
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 200,
) -> DataFrame:
    """Fingerprint-keyed materialization of the CURATION pair relation:
    ``ngram_jaccard_pairs`` over the exact-dedup survivors of the
    quality/lang-kept documents — the subtree `curate_corpus` and
    `curation_funnel` both recomputed per run (round-11 measurement:
    the posting join over the kept corpus is ~3 s of each query's
    5-6 s at sf0.1, paid twice per sweep for one deterministic
    relation).

    Same lifecycle and identity argument as :func:`shared_ngram_pairs`
    (deterministic operator, exact doubles through parquet ⇒
    byte-identical to the inline subtree; oracle differentials
    unaffected). At 100 TB the near-dup pass over the curated subset is
    the scheduled once-per-corpus job; the curated-corpus materializer
    and its funnel audit are two consumers of its output.
    """
    import os

    from nabatshy_spark import artifacts
    from nabatshy_spark.catalog import load

    src = os.path.join(sf_dir, "documents.parquet")
    thr = f"{threshold:g}".replace(".", "p")
    # "curated_" prefix disambiguates this key from shared_ngram_pairs'
    # (ADVICE r11, high): both families share SPARK_GRAFT_PAIRS_DIR, and
    # _resolve drops the family path segment under an env-var root — an
    # un-prefixed key would collide with the corpus-wide pair relation
    # at identical parameters and silently serve whichever built first.
    key = (
        f"curated_{artifacts.source_fingerprint(src)}"
        f"_v{_CURATED_PAIRS_VERSION}_n{n}_t{thr}_df{max_df}"
    )

    def _build(staging: str) -> None:
        docs = load(spark, sf_dir, "documents")
        # Keep predicate + exact-dedup survivors from the shared flag
        # artifact (round 12, VERDICT r11 task #4) instead of
        # re-running the quality/langid regexes and re-hashing the
        # corpus inside this build: flags.__fp is sha256(text) of each
        # kept doc, so min(doc_id) per __fp IS exact_dedup(kept) — the
        # same identity curation_funnel's exact_sur_override uses. The
        # survivor semi-join runs against docs directly (survivor ids
        # are a subset of kept ids, so the composed filter is
        # equivalent to kept ∩ survivors).
        flags = shared_curation_flags(spark, sf_dir)
        exact_sur = (
            flags.filter("__k")
            .groupBy("__fp")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        sur_docs = docs.join(exact_sur, "doc_id", "left_semi")
        pairs = ngram_jaccard_pairs(
            sur_docs, "doc_id", "text", n=n, threshold=threshold, max_df=max_df
        )
        # output-bounded like the corpus pair relation — see the
        # coalesce note on shared_ngram_pairs
        pairs.coalesce(1).write.mode("overwrite").parquet(staging)

    path = artifacts.ensure(
        "curated_pairs", key, _build, env_var="SPARK_GRAFT_PAIRS_DIR"
    )
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# Mersenne prime 2^31-1: keeps a*h + b within a signed 64-bit long
# (ANSI mode throws on overflow, so the affine family works in the
# reduced domain pmod(h, M31) first).
_MERSENNE31 = (1 << 31) - 1


def _hash_family(num: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
        for _ in range(num)
    ]


def _shingle_sig_udf(n: int, fam: list[tuple[int, int]]):
    """text → struct(hs: distinct shingle hashes, sig: MinHash
    signature) in ONE Arrow-batched stage.

    Vectorized on purpose — Spark's higher-order array functions run
    interpreted (no codegen), so 128 affine-min passes per row are
    ~50× slower as `transform`/`array_min` expressions than one numpy
    broadcast; fusing hash + signature halves the Arrow serde. The
    signature is min over shingles of (a·(h mod M31) + b) mod M31 per
    (a, b); values are identical to the expression form.
    """
    from hashlib import blake2b

    import numpy as np
    import pandas as pd

    a = np.array([x for x, _ in fam], dtype=np.int64)[:, None]
    b = np.array([y for _, y in fam], dtype=np.int64)[:, None]
    empty = np.array([], dtype=np.int64)
    # Token-level hashing with a cross-row cache + numpy polynomial
    # combine per n-gram: natural text has a bounded vocabulary per
    # batch, so blake2b runs once per DISTINCT token instead of once
    # per shingle occurrence (~n× fewer Python-level hash calls), and
    # the n-gram combine is pure vectorized uint64 arithmetic. The
    # combine (odd-constant multiply-add chain + murmur finalizer) is
    # position-sensitive and 63-bit uniform; `hs` is an internal
    # verification key, so any collision-improbable hash family is
    # semantically equivalent (final pairs come from exact set
    # intersection, oracle unchanged).
    _C = np.uint64(0x9E3779B97F4A7C15)
    _F1 = np.uint64(0xFF51AFD7ED558CCD)
    _tok_cache: dict[str, int] = {}

    def _tok_h(tok: str) -> int:
        v = _tok_cache.get(tok)
        if v is None:
            v = int.from_bytes(blake2b(tok.encode(), digest_size=8).digest(), "big")
            _tok_cache[tok] = v
        return v

    def f(texts):
        hs_out, sig_out = [], []
        with np.errstate(over="ignore"):
            for t in texts:
                # a NULL document has no shingles (the expression-side
                # twin yields null → no rows); don't crash the batch
                toks = t.split(" ") if t is not None else []
                ln = len(toks)
                if ln < n:
                    hs_out.append(empty)
                    sig_out.append(None)
                    continue
                th = np.fromiter(
                    (_tok_h(x) for x in toks), dtype=np.uint64, count=ln
                )
                m = ln - n + 1
                h = th[:m].copy()
                for k in range(1, n):
                    h = h * _C + th[k : m + k]
                h ^= h >> np.uint64(33)
                h *= _F1
                h ^= h >> np.uint64(29)
                h &= np.uint64((1 << 63) - 1)
                h = np.unique(h).astype(np.int64)
                hs_out.append(h)
                sig_out.append(
                    ((a * (h % _MERSENNE31)[None, :] + b) % _MERSENNE31).min(axis=1)
                )
        return pd.DataFrame({"hs": hs_out, "sig": sig_out})

    f.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf("struct<hs: array<bigint>, sig: array<bigint>>")(f)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 128,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
    sig_override: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash signatures + banded LSH, with exact
    Jaccard verification of the candidates.

    128 minhashes in 64 bands of 2: P[miss | J=t] = (1-t²)^64 ≈ 1e-8
    at t=0.5, so the result set matches the exact operator while the
    join touches only band-bucket collisions — the scale path when the
    inverted-index join's Σdf(s)² blows up.

    ``max_bucket`` is the hot-bucket cap (SCALE.md): a band bucket with
    more than ``max_bucket`` members is dropped from pair expansion
    entirely. A hot bucket means thousands of documents share one band
    signature — boilerplate, not near-duplication — and expanding it is
    |bucket|² pairs; genuinely similar pairs almost surely also collide
    in a cooler band (miss only if every shared band is hot). Keeps the
    pair-expansion cost bounded per bucket regardless of corpus skew.

    ``sig_override`` substitutes a precomputed (id, __hs, __sig)
    signature relation (already filtered to non-empty shingle sets) for
    the shingle/signature stage — for callers serving the deterministic
    per-corpus signatures from a fingerprint-keyed artifact
    (:func:`shared_minhash_signatures`). ``__sig`` may carry MORE than
    ``num_hashes`` entries: the seeded hash family is prefix-stable
    (``_hash_family(k) == _hash_family(K)[:k]`` for k ≤ K, same rng
    stream) and banding only references indices below ``num_hashes``,
    so one full-budget signature serves every smaller budget unchanged.
    """
    bands = num_hashes // rows_per_band

    if sig_override is not None:
        # persisted for the same four-reference reason as the inline
        # stage (banding + both verify sides)
        hs = sig_override.select(F.col(id_col), "__hs", "__sig").persist()
    else:
        fam = _hash_family(num_hashes)
        # Repartition before the CPU-bound shingle/signature stage — a
        # single-file table would otherwise pin the whole pipeline to
        # one task — and persist: the frame is referenced four times in
        # the DAG (banding + both join sides of candidate verification)
        # and must not be recomputed per reference. The Python-stage
        # fan-out is capped below core count: each task costs a worker
        # spawn + Arrow channel, and the vectorized batch work is
        # cheap, so fewer, larger batches win until data volume
        # actually needs the width.
        parallelism = max(
            8, df.sparkSession.sparkContext.defaultParallelism // 2
        )
        hs = (
            df.repartition(parallelism, id_col)
            .select(
                F.col(id_col),
                _shingle_sig_udf(n, fam)(F.col(text_col)).alias("__hsig"),
            )
            .select(
                F.col(id_col),
                F.col("__hsig.hs").alias("__hs"),
                F.col("__hsig.sig").alias("__sig"),
            )
            .filter(F.size("__hs") > 0)
            .persist()
        )
    # Band key = xxhash64(band_index, the band's signature rows), built
    # by ONE transform(sequence(...)) expression rather than `bands`
    # separate column trees. Two reasons, both measured (round 10):
    # (a) driver-side Catalyst ANALYSIS of 64 concat_ws trees cost
    #     1.2–5 s PER CALL depending on JVM JIT warmth — the whole
    #     source of dedup_minhash_lsh's 1.68→2.8 s session-to-session
    #     bench band (VERDICT r9 "what's wrong" #2); the single small
    #     tree analyzes in ~0.3 s regardless of warmth;
    # (b) an 8-byte long shuffle key beats a ~20-char string key.
    # Folding the band index INTO the hash keys the groupBy on one
    # column; a cross-band xxhash64 collision (~2⁻⁶⁴) could only merge
    # two buckets, which adds candidates (verification discards them)
    # — it cannot lose a true pair except through the max_bucket cap,
    # at odds far below the banding scheme's own 1e-8 miss floor.
    row_refs = ", ".join(
        f"__sig[b * {rows_per_band} + {r}]" for r in range(rows_per_band)
    )
    band_keys = F.expr(
        f"transform(sequence(0, {bands - 1}), b -> xxhash64(b, {row_refs}))"
    )
    banded = hs.select(F.col(id_col), F.explode(band_keys).alias("__key"))
    # Candidate pairs via groupBy-bucket + in-bucket pair expansion:
    # one shuffle on the band key, pairs generated inside each (tiny)
    # bucket — measured ~4× faster than the equivalent self-join,
    # which sorts both 64×N-row sides.
    ids = F.array_sort(F.collect_list(id_col))
    pairs = F.flatten(
        F.transform(
            F.col("__ids"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("__ids"), i + 2, F.greatest(F.size("__ids") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    in_range = F.size("__ids") > 1
    if max_bucket is not None:
        in_range = in_range & (F.size("__ids") <= max_bucket)
    candidates = (
        banded.groupBy("__key")
        .agg(ids.alias("__ids"))
        .filter(in_range)
        .select(F.explode(pairs).alias("__p"))
        .select(F.col("__p.doc_a"), F.col("__p.doc_b"))
        .distinct()
    )
    # exact verification on candidates only; the 63-bit hash sets
    # stand in for the shingle sets (collision odds per pair ~2^-43,
    # so hash-set Jaccard == string-set Jaccard)
    sized = hs.select(F.col(id_col), F.col("__hs"), F.size("__hs").alias("__sz"))
    verified = (
        candidates.join(
            sized.select(
                F.col(id_col).alias("doc_a"),
                F.col("__hs").alias("__sh_a"),
                F.col("__sz").alias("__sa"),
            ),
            "doc_a",
        )
        .join(
            sized.select(
                F.col(id_col).alias("doc_b"),
                F.col("__hs").alias("__sh_b"),
                F.col("__sz").alias("__sb"),
            ),
            "doc_b",
        )
        .withColumn("__i", F.size(F.array_intersect("__sh_a", "__sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("__i") / (F.col("__sa") + F.col("__sb") - F.col("__i")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


# Bump when the shingle-hash/signature construction changes (token
# hash, combine, hash family seed) — see key note on shared_ngram_pairs.
_MINHASH_SIG_VERSION = 1


def shared_minhash_signatures(
    spark,
    sf_dir: str,
    n: int = 3,
    num_hashes: int = 128,
) -> DataFrame:
    """Fingerprint-keyed materialization of the MinHash signature
    relation over ``documents``: (doc_id, __hs, __sig) — the output of
    the shingle/signature pandas-UDF stage of :func:`minhash_lsh_pairs`
    filtered to non-empty shingle sets.

    Why (VERDICT r11 task #5): under the honest cold-cache protocol the
    signature UDF + its Arrow boundary are ~60% of dedup_minhash_lsh's
    2.5 s/run at sf0.1, re-done per run for a deterministic per-corpus
    relation (seeded hash family). At 100 TB signature computation over
    the corpus is THE scheduled job of a MinHash dedup deployment;
    banding, candidate expansion and verification stay per-run (they
    depend on the band geometry under evaluation). One full-budget
    signature serves every smaller ``num_hashes`` budget because the
    seeded family is prefix-stable (see :func:`minhash_lsh_pairs`).

    Integer-valued arrays (int64 hashes / minima) → parquet round-trip
    exact; consumers are byte-identical to the inline stage. Explicit
    read schema: an empty corpus writes no part files.
    """
    import os

    from nabatshy_spark import artifacts
    from nabatshy_spark.catalog import load

    src = os.path.join(sf_dir, "documents.parquet")
    key = (
        f"{artifacts.source_fingerprint(src)}_v{_MINHASH_SIG_VERSION}"
        f"_n{n}_h{num_hashes}"
    )

    def _build(staging: str) -> None:
        docs = load(spark, sf_dir, "documents")
        fam = _hash_family(num_hashes)
        parallelism = max(
            8, spark.sparkContext.defaultParallelism // 2
        )
        (
            docs.repartition(parallelism, "doc_id")
            .select(
                F.col("doc_id"),
                _shingle_sig_udf(n, fam)(F.col("text")).alias("__hsig"),
            )
            .select(
                F.col("doc_id"),
                F.col("__hsig.hs").alias("__hs"),
                F.col("__hsig.sig").alias("__sig"),
            )
            .filter(F.size("__hs") > 0)
            .write.mode("overwrite")
            .parquet(staging)
        )

    path = artifacts.ensure(
        "minhash_sigs", key, _build, env_var="SPARK_GRAFT_MINHASH_DIR"
    )
    return spark.read.schema(
        "doc_id bigint, __hs array<bigint>, __sig array<bigint>"
    ).parquet(path)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a signed 64-bit long


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per document over whitespace tokens.

    Token hash = first 15 hex chars of md5 (engine-portable). Bit i of
    the fingerprint is 1 iff Σ_tokens (±1 by token-hash bit i) > 0.
    Everything is array-expression arithmetic — single scan, no UDF.
    """
    def _bit_sum(i: int, hs: Column):
        # factory, not a default-arg lambda: pyspark dispatches on the
        # lambda's arity, so an extra bound parameter would be
        # misread as the (acc, x, idx) form.
        def merge(acc, h):
            return acc + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(hs, F.lit(0).cast("long"), merge)

    def _fp_of(hs: Column) -> Column:
        # bound lambda variable: the token-hash array is materialized
        # ONCE per row; referencing the raw md5-transform expression in
        # each of the 60 bit aggregates instead re-hashes every token
        # 60 times (projection collapse inlines it; HOF aggregates are
        # interpreted, no CSE)
        fp = None
        for i in range(SIMHASH_BITS):
            term = F.when(
                _bit_sum(i, hs) > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
            fp = term if fp is None else fp + term
        return fp

    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par).select(
        F.col(id_col),
        F.element_at(
            F.transform(
                F.array(F.transform(tokens(F.col(text_col)), _md5_60bit)), _fp_of
            ),
            1,
        ).alias("simhash"),
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance ≤ max_hamming,
    found via the band-pigeonhole trick: split 60 bits into 4 bands of
    15; distance ≤ 3 ⇒ some band is byte-identical, so an equi-join on
    (band_idx, band_value) finds every qualifying pair — exact, no
    recall loss, and no N² compare.
    """
    sh = simhash(df, id_col, text_col)
    bands = F.array(
        *[
            F.shiftright("simhash", 15 * j).bitwiseAND(F.lit((1 << 15) - 1))
            for j in range(4)
        ]
    )
    banded = sh.select(
        F.col(id_col), F.col("simhash"), F.posexplode(bands).alias("__band", "__key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__key") == F.col("b.__key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, computed in
    double with sequential fold order (matches the oracle's list_sum
    order exactly)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (na * nb)


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.45,
    num_blocks: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: EXACT cosine ≥ threshold over all
    pairs, computed as a blocked matrix product.

    Why exact and not LSH here: the test corpus (and most embedding
    spaces at moderate thresholds) has a smooth cosine continuum at the
    threshold — measured at sf0.01, pair counts per 0.05-cosine bucket
    are 719/212/45/13/1 from 0.30 up, with no gap at 0.45. Hyperplane
    LSH with miss ≤ 1e-8 AT the threshold needs per-band match ≥ 0.25
    there, which a cos≈0 background pair matches at ≥ 0.125/band — over
    64 bands that's ~every pair as a candidate, i.e. brute force plus
    overhead. So the honest scale design is exact all-pairs done right:

    - rows are hashed into K blocks; each row is replicated to the K
      unordered block-pair tasks it participates in (the
      communication-optimal replication for all-pairs, Afrati & Ullman,
      "Optimizing joins in a MapReduce environment");
    - one shuffle on the task key, then each task computes its block
      pair as ONE numpy/BLAS matrix product over unit-normalized
      vectors — no per-row join, no BroadcastNestedLoopJoin in the
      plan (asserted in tests/test_plans.py).

    ``operators/similarity.py::lsh_dup_pairs`` remains the approximate
    twin for corpora that DO have a near-dup gap (then its verification
    is exact and only recall is probabilistic).
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    if num_blocks is None:
        # K²/2 tasks ≈ 2× parallelism keeps every core busy without
        # inflating the N·K replication factor
        num_blocks = max(2, int((4 * spark.sparkContext.defaultParallelism) ** 0.5))
    k = num_blocks
    block = F.pmod(F.xxhash64(F.col(id_col)), F.lit(k))
    task_keys = F.array(
        *[
            F.concat_ws(
                "_",
                F.least(block, F.lit(j)).cast("string"),
                F.greatest(block, F.lit(j)).cast("string"),
            )
            for j in range(k)
        ]
    )
    # A NULL embedding cannot be a duplicate of anything; dropping it
    # here also keeps the numpy stack in the task fn rectangular.
    tasks = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        block.alias("__b"),
        F.explode(F.array_distinct(task_keys)).alias("__task"),
    )

    return tasks.groupBy("__task").applyInPandas(
        _block_pair_fn(threshold), schema="doc_a long, doc_b long, cos double"
    )


def _block_pair_fn(threshold: float):
    """One all-pairs task: rows grouped by ``__task`` = "lo_hi" with
    ``__b`` ∈ {lo, hi} → unit-normalize, ONE BLAS matmul (triangular for
    lo==hi, cross otherwise), emit canonical (doc_a < doc_b, cos≥t)
    pairs. Shared by the Afrati-Ullman blocked form and the
    cluster-pruned form so both produce bit-identical cosines."""
    import numpy as np
    import pandas as pd

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = (int(x) for x in pdf["__task"].iloc[0].split("_"))
        mat = np.stack(pdf["__v"].map(np.asarray)).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat /= np.where(norms == 0, 1.0, norms)  # zero vectors → cos 0, never match
        ids = pdf["__id"].to_numpy()
        if lo == hi:
            sims = np.round(mat @ mat.T, 6)
            ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
            da, db, cos = ids[ia], ids[ib], sims[ia, ib]
        else:
            left = pdf["__b"].to_numpy() == lo
            sims = np.round(mat[left] @ mat[~left].T, 6)
            ia, ib = np.nonzero(sims >= threshold)
            da, db, cos = ids[left][ia], ids[~left][ib], sims[ia, ib]
        a = np.minimum(da, db)
        b = np.maximum(da, db)
        return pd.DataFrame({"doc_a": a, "doc_b": b, "cos": cos})

    return block_pairs


def embedding_dup_pairs_clustered(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.45,
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Cluster-pruned EXACT embedding near-dup pairs — the sub-quadratic
    scale path for ``embedding_dup_pairs`` (whose blocked all-pairs is
    communication-optimal but still O(N²) *compute*).

    SemDeDup-shaped (Abbas et al. 2023) but exact, via the classic
    ball-cover / triangle-inequality bound instead of within-cluster
    truncation: cos(a,b) ≥ t on unit vectors ⟺ ‖â−b̂‖ ≤ R = √(2−2t), so
    a qualifying pair split across k-means clusters (i,j) forces
    ‖c_i−c_j‖ ≤ r_i + R + r_j (r = cluster radius). Plan:

    1. unit-normalize once (norm as its own column — inlining it into
       the transform lambda re-evaluates per element, O(d²));
    2. deterministic k-means on the unit vectors (clustering.py — the
       centroids are already O(k·d) driver data), plus per-row distance
       to its centroid → per-cluster radii (k scalars);
    3. the k×k cluster-pair graph is pruned ON THE DRIVER with the
       bound above (+1e-6 float slack) — typically O(k) survivors when
       the space is clusterable, k² tiny regardless;
    4. rows replicate only to surviving pair-tasks (broadcast join on
       the cluster id), then the SAME one-matmul-per-task kernel as
       ``embedding_dup_pairs`` (raw vectors in, so the float path and
       hence every emitted cosine is bit-identical to the all-pairs
       form — one oracle covers both).

    Compute drops from N²/2 to Σ_{surviving (i,j)} |i|·|j|; a cluster
    pair too large for one task composes with the Afrati-Ullman
    sub-blocking (run ``embedding_dup_pairs`` within the pair). If the
    data does NOT cluster (one ball), every pair survives and this
    degrades to exactly the blocked all-pairs — never worse, never
    lossy. Replaces nothing: both forms stay registered; this one
    carries the 100 TB claim (measured curve in SCALE.md).
    """
    from nabatshy_spark.operators import clustering

    spark = df.sparkSession
    R = math.sqrt(max(0.0, 2.0 - 2.0 * threshold))

    sq_norm = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # NULL embeddings cannot pair; drop them before normalization (the
    # blocked all-pairs twin applies the same filter).
    with_norm = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__raw"),
        F.sqrt(sq_norm).alias("__nrm"),
    )
    unit = with_norm.select(
        "__id",
        "__raw",
        F.when(
            F.col("__nrm") > 0,
            F.transform("__raw", lambda x: x.cast("double") / F.col("__nrm")),
        )
        .otherwise(F.transform("__raw", lambda x: F.lit(0.0)))
        .alias("__u"),
    )
    unit = unit.localCheckpoint(eager=False)  # reused by kmeans rounds + radii

    cents = clustering.kmeans_centroids(unit, "__id", "__u", k=k, iters=iters)
    if not cents:
        return spark.createDataFrame([], "doc_a long, doc_b long, cos double")

    sq = F.array(
        *[F.round(clustering._sqdist(F.col("__u"), c), 9) for c in cents]
    )
    assigned = unit.select(
        "__id",
        "__raw",
        (F.array_position(sq, F.array_min(sq)) - 1).cast("int").alias("__c"),
        F.sqrt(F.array_min(sq)).alias("__d"),
    )
    assigned = assigned.localCheckpoint(eager=False)  # radii pass + task build

    radii = {
        r["__c"]: r["r"]
        for r in assigned.groupBy("__c").agg(F.max("__d").alias("r")).collect()
    }

    import numpy as np

    C = np.asarray(cents, dtype=np.float64)
    candidates: list[tuple[int, int]] = []
    for i in sorted(radii):
        for j in sorted(radii):
            if j < i:
                continue
            if i == j or float(np.linalg.norm(C[i] - C[j])) <= radii[i] + radii[j] + R + 1e-6:
                candidates.append((i, j))

    cluster_tasks = spark.createDataFrame(
        [(c, f"{i}_{j}") for (i, j) in candidates for c in {i, j}],
        "__c int, __task string",
    )
    tasks = assigned.join(F.broadcast(cluster_tasks), "__c").select(
        "__id", F.col("__raw").alias("__v"), F.col("__c").alias("__b"), "__task"
    )
    return tasks.groupBy("__task").applyInPandas(
        _block_pair_fn(threshold), schema="doc_a long, doc_b long, cos double"
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", alg. 2): for every node u with neighborhood
    Γ(u), connect each strictly larger neighbor to
    m = min(Γ(u) ∪ {u}). Input/output edges are canonical (u > v)."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("__mn"))
    return (
        sym.join(m, "u")
        .withColumn("__m", F.least(F.col("__mn"), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("__m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round (alg. 3): key every edge by its larger
    endpoint u; with Γ(u) all ≤ u and m = min(Γ(u)), connect u and each
    other smaller neighbor to m. Canonical (u > v) in and out."""
    m = edges.groupBy("u").agg(F.min("v").alias("__mn"))
    joined = edges.join(m, "u")
    leaves = (
        joined.filter(F.col("v") != F.col("__mn"))
        .select(F.col("v").alias("u"), F.col("__mn").alias("v"))
    )
    centers = m.select(F.col("u"), F.col("__mn").alias("v"))
    return leaves.union(centers).distinct()


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    rounds_out: list[int] | None = None,
    local_threshold: int | None = None,
) -> DataFrame:
    """Group near-dup *pairs* into duplicate clusters: every node gets
    ``component`` = the minimum doc id reachable from it. This is the
    step after any pair-finder (MinHash/SimHash/Jaccard/embedding) —
    training-data dedup keeps one survivor per component, not per pair.

    Alternating large-star/small-star (Kiveris et al., public
    algorithm): each round is two groupBy-min shuffles over the edge
    relation, and the edge set contracts toward one star per component
    in O(log n) rounds — adversarially long chains converge
    logarithmically, unlike plain min-label propagation's O(diameter)
    (the round-count unit test in test_extensions.py pins this).
    ``localCheckpoint`` per round truncates lineage; convergence is
    detected by the canonical edge set reaching a fixed point
    (count + order-insensitive hash — no full except-diff).

    Adaptive small-graph path: the first convergence probe already
    counts the canonical edge set; when it is at or below
    ``local_threshold`` edges (default 1M, env
    ``NABATSHY_LOCAL_CC_EDGES``), the edges collect to the driver and
    a path-compressed min-root union-find labels them — identical
    output, none of the per-round job overhead that dominates small
    graphs. Pair-finder edge sets are SMALL relative to their corpora
    (they are the near-dup survivors), so this path serves most real
    runs; a 100 TB-scale edge set exceeds the threshold and takes the
    distributed star rounds. Passing ``rounds_out`` forces the
    distributed path (round telemetry only exists there)."""
    # Materialize the (usually expensive) pair-finder output once —
    # every star round re-reads edges, and without this the whole
    # upstream plan (e.g. a MinHash/Jaccard self-join) would
    # re-execute per round.
    edges = (
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("u"),
            F.least(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)  # materialized by the first _state probe
    )

    def _state(e: DataFrame) -> tuple[int, int]:
        # bit_xor is order-insensitive and cannot overflow under ANSI
        # (a plain sum of int64 hashes would).
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    state = _state(edges)
    if local_threshold is None:
        import os as _os

        # Driver-memory note (ADVICE r5): the local path holds a
        # union-find dict of up to 2x this many entries on the driver
        # (~60-100 MB per million edges in CPython). Edges land as ONE
        # Arrow table (16 MB per million int64 pairs — columnar, not a
        # Row list), so the dict is the only heavyweight driver state.
        # toArrow beats toLocalIterator here: the iterator runs one
        # job per partition (~32 sequential mini-jobs for a small edge
        # set — measured ~+1 s on every CC-dependent query), Arrow is
        # one job and one transfer. Raise NABATSHY_LOCAL_CC_EDGES only
        # with a matching spark.driver.memory bump.
        local_threshold = int(
            _os.environ.get("NABATSHY_LOCAL_CC_EDGES", "1000000")
        )
    if rounds_out is None and state[0] <= local_threshold:
        utype = edges.schema["u"].dataType
        parent: dict = {}

        def _find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        tbl = edges.toArrow()
        for u, v in zip(
            tbl.column("u").to_pylist(), tbl.column("v").to_pylist()
        ):
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = _find(u), _find(v)
            if ru != rv:
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru  # min id stays the root
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField("doc_id", utype, False),
                StructField("component", utype, False),
            ]
        )
        spark = pairs.sparkSession
        return spark.createDataFrame(
            [(n, _find(n)) for n in parent], schema
        )
    for _round in range(64):  # 64 ≫ log₂(any real corpus): loop guard only
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        new_state = _state(edges)
        if new_state == state:
            if rounds_out is not None:
                rounds_out.append(_round + 1)
            break
        state = new_state
    else:  # pragma: no cover - loop guard
        raise RuntimeError("connected_components failed to converge in 64 rounds")
    # Fixed point: one star per component, centered at its min node.
    leaves = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("component"))
    centers = edges.select(
        F.col("v").alias("doc_id"), F.col("v").alias("component")
    ).distinct()
    return leaves.union(centers)


def dedup_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    pairs_override: DataFrame | None = None,
    exact_sur_override: DataFrame | None = None,
) -> DataFrame:
    """End-to-end corpus dedup — the composition a training-data
    pipeline actually runs: (1) exact dedup by content hash, (2) exact
    n-gram Jaccard near-dup pairs over the exact survivors, (3) pairs
    clustered into components, (4) keep the min-id doc per cluster.
    Returns the surviving rows of ``df`` (all original columns).

    Stage shapes at scale: (1) shuffles 32-byte digests, (2) shuffles
    (shingle-hash, id) postings, (3) iterates over the tiny pair
    relation, (4) is a shuffle-on-id anti join. Nothing ever shuffles
    document bodies except the final survivor join, which moves only
    the surviving rows.

    ``pairs_override`` substitutes a pre-materialized pair relation
    for stage (2) — for callers that serve the (deterministic,
    byte-identical) near-dup pairs from a fingerprint-keyed artifact
    (``shared_curated_pairs``) instead of re-running the posting join
    per invocation. It must be exactly
    ``ngram_jaccard_pairs(sur_docs, id_col, text_col, n, threshold,
    max_df)`` for the same input; the artifact key encodes that.

    ``exact_sur_override`` substitutes the stage-(1) exact-survivor id
    relation — for callers that already fingerprinted the corpus in an
    earlier pass (curation_funnel's flag relation carries the same
    sha256 per kept doc). Must equal
    ``exact_dedup(df, id_col, text_col).select(id_col)`` — i.e. the
    min id per content fingerprint — or stage (2)'s survivor base
    diverges from the pair relation's.
    """
    exact_sur = (
        exact_sur_override
        if exact_sur_override is not None
        else exact_dedup(df, id_col, text_col).select(id_col)
    )
    # NOT checkpointed deliberately: the three consumers each take a
    # different narrow projection of the survivors, and recomputing the
    # (cheap, codegen'd) filter per consumer beats materializing full
    # text bodies — measured 2.0 s vs 4.6 s at sf0.1 for the pipeline
    # (localCheckpoint here blocks column pruning through the join).
    sur_docs = df.join(exact_sur, id_col, "left_semi")
    pairs = (
        pairs_override
        if pairs_override is not None
        else ngram_jaccard_pairs(sur_docs, id_col, text_col, n, threshold, max_df)
    )
    removed = (
        connected_components(pairs)
        .filter(F.col("component") < F.col("doc_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return sur_docs.join(removed, id_col, "left_anti")


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Flag training documents that overlap an evaluation/benchmark set
    — the decontamination pass a training-data pipeline runs before
    every release (no reference counterpart, SURVEY §2.11).

    A corpus document is contaminated when it shares ≥ ``min_hits``
    distinct word ``n``-grams with ANY benchmark document. Returns
    (id, n_hits) for contaminated documents only.

    Scale shape: the benchmark side is orders of magnitude smaller
    than the corpus (thousands of eval documents vs billions of
    training documents), so its distinct shingle set is broadcast —
    the corpus is scanned once, never shuffled, and each task does a
    local hash-probe per shingle. If a benchmark ever outgrows
    broadcast, drop the hint and the same plan becomes a shuffle
    equi-join on the shingle.
    """
    c = corpus.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("__s")
    )
    b = (
        bench.select(F.explode(shingles(F.col(text_col), n)).alias("__s"))
        .distinct()
    )
    return (
        c.join(F.broadcast(b), "__s")
        .groupBy(id_col)
        .agg(F.count_distinct("__s").alias("n_hits"))
        .filter(F.col("n_hits") >= F.lit(min_hits))
    )


def _incremental_corpus_relations(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_df: int | None,
) -> dict[str, DataFrame]:
    """The CORPUS-side relations of :func:`incremental_dedup`, derived
    in-plan: content digests, shingle arrays, rare postings (df ≤ cap),
    the hot-shingle set (df > cap) and per-doc hot counts. Factored out
    (round 12) so :func:`shared_incremental_corpus_index` can
    materialize exactly these relations fingerprint-keyed — they are a
    deterministic function of the corpus relation, which in the
    steady-state contract is a deterministic split of static parquet.
    ``csh`` is persisted (feeds the explode plus the verify join);
    release is the caller's concern (bench clearCache / unpersist)."""
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    ch = corpus.select(
        F.col(id_col).alias("__cid"), F.sha2(F.col(text_col), 256).alias("__h")
    )
    csh = (
        corpus.repartition(parallelism, id_col)
        .select(
            F.col(id_col).alias("__cid"),
            shingles(F.col(text_col), n).alias("__sh"),
        )
        .persist()
    )
    cex = csh.select("__cid", F.explode("__sh").alias("__s"))
    out: dict[str, DataFrame] = {"hashes": ch, "shingles": csh}
    if max_df is not None:
        hot = (
            cex.groupBy("__s")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("__s")
        )
        cflag = cex.join(
            F.broadcast(hot.select("__s", F.lit(True).alias("__hot"))),
            "__s",
            "left",
        )
        out["rare"] = cflag.filter(F.col("__hot").isNull()).select(
            "__cid", "__s"
        )
        out["hot"] = hot
        out["hot_counts"] = (
            cflag.filter(F.col("__hot"))
            .groupBy("__cid")
            .agg(F.count("*").alias("__hc"))
        )
    else:
        out["rare"] = cex
        out["hot"] = None
        out["hot_counts"] = None
    return out


# Bump when incremental_dedup's corpus-side relations change shape or
# semantics (see key note on shared_ngram_pairs).
_INCR_INDEX_VERSION = 1


def shared_incremental_corpus_index(
    spark,
    sf_dir: str,
    n: int = 3,
    max_df: int | None = 200,
    mod: int = 10,
    batch_lt: int = 2,
) -> dict[str, DataFrame]:
    """Fingerprint-keyed materialization of the CORPUS-side relations
    of the incremental-dedup contract (``documents`` rows with
    ``doc_id % mod >= batch_lt`` as the standing corpus): digests,
    shingle arrays (+ sizes), rare postings, hot-shingle set, per-doc
    hot counts — everything :func:`incremental_dedup` derives from the
    corpus per run.

    Why (VERDICT r11 task #1): the steady-state production mode is "the
    corpus was indexed long ago; each batch checks against it", but the
    query re-shingled and re-aggregated the corpus side (80% of the
    table) on every run — 3.9 s driver, the slowest headline row. The
    split is a deterministic function of static parquet, so these
    relations are exactly as fingerprint-stable as every other artifact
    in the tree. At 100 TB the corpus postings list IS a materialized
    layout (write once per corpus version, reuse per batch); the batch
    side stays inline by design (it changes per run).

    All relations are deterministic (sha256 / string shingles / integer
    counts) so the parquet round-trip is exact and the composed result
    is byte-identical to the inline derivation. Reads carry explicit
    schemas: an empty corpus writes no part files (Spark skips empty
    partitions), and schema inference on an empty dir would throw —
    the invindex empty-layout lesson (round 11).
    """
    import os

    from nabatshy_spark import artifacts
    from nabatshy_spark.catalog import load

    src = os.path.join(sf_dir, "documents.parquet")
    key = (
        f"{artifacts.source_fingerprint(src)}_v{_INCR_INDEX_VERSION}"
        f"_n{n}_df{max_df}_m{mod}b{batch_lt}"
    )

    def _build(staging: str) -> None:
        docs = load(spark, sf_dir, "documents")
        corpus = docs.filter(F.col("doc_id") % mod >= batch_lt)
        rel = _incremental_corpus_relations(corpus, "doc_id", "text", n, max_df)
        try:
            # digests / hot set / hot counts are vocabulary- or
            # doc-bounded → single file; shingle arrays and rare
            # postings are corpus-proportional → parallel-readable but
            # FILE-BOUNDED (the build's raw partitioning wrote 32
            # ~55 KB files per relation at sf0.1 — per-file open
            # overhead on every consumer read for no parallelism
            # gain). Scale-adaptive count, keyed so the downstream
            # joins read hash-clustered files.
            nf = max(8, spark.sparkContext.defaultParallelism // 4)
            rel["hashes"].repartition(1).write.mode("overwrite").parquet(
                os.path.join(staging, "hashes")
            )
            rel["shingles"].select(
                "__cid", F.size("__sh").alias("__csz"), "__sh"
            ).repartition(nf, "__cid").write.mode("overwrite").parquet(
                os.path.join(staging, "shingles")
            )
            rel["rare"].repartition(nf, "__s").write.mode(
                "overwrite"
            ).parquet(os.path.join(staging, "rare"))
            if rel["hot"] is not None:
                rel["hot"].repartition(1).write.mode("overwrite").parquet(
                    os.path.join(staging, "hot")
                )
                rel["hot_counts"].repartition(1).write.mode(
                    "overwrite"
                ).parquet(os.path.join(staging, "hot_counts"))
            # Multi-relation artifact: each parquet dir has its own
            # _SUCCESS; the lifecycle gate checks the top level.
            with open(os.path.join(staging, "_SUCCESS"), "w"):
                pass
        finally:
            rel["shingles"].unpersist()

    path = artifacts.ensure(
        "incr_corpus", key, _build, env_var="SPARK_GRAFT_INCR_DIR"
    )
    sh = spark.read.schema(
        "__cid bigint, __csz int, __sh array<string>"
    ).parquet(os.path.join(path, "shingles"))
    out: dict[str, DataFrame] = {
        "hashes": spark.read.schema("__cid bigint, __h string").parquet(
            os.path.join(path, "hashes")
        ),
        "shingles": sh,
        "rare": spark.read.schema("__cid bigint, __s string").parquet(
            os.path.join(path, "rare")
        ),
        "hot": None,
        "hot_counts": None,
    }
    if max_df is not None:
        out["hot"] = spark.read.schema("__s string").parquet(
            os.path.join(path, "hot")
        )
        out["hot_counts"] = spark.read.schema(
            "__cid bigint, __hc bigint"
        ).parquet(os.path.join(path, "hot_counts"))
    return out


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    corpus_index: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus — the steady-state
    production mode of a crawl pipeline: the corpus was deduped long
    ago; each incoming batch only needs checking against it (and the
    batch against itself is a separate, far smaller problem).

    Returns one row per batch document: (id, status, match_id) with
    status 'dup_exact' (byte-identical to a corpus doc), 'dup_near'
    (n-gram Jaccard ≥ threshold against a corpus doc), or 'kept';
    match_id is the smallest matching corpus id (null when kept).

    Scale shape — the corpus is the big side and it is never shuffled
    twice: the exact check joins 32-byte digests only; the near check
    is an inverted-index join of BATCH postings against CORPUS postings
    (cost Σ_s df_batch(s)·df_corpus(s), never corpus×corpus), with the
    same ``max_df`` document-frequency cap as ngram_jaccard_pairs
    applied to the corpus side to bound boilerplate shingles. The cap
    affects CANDIDATE GENERATION only: candidates are scored with the
    same count-based verification as ngram_jaccard_pairs (rare-posting
    intersection counts + per-doc hot-shingle slack bounds; full
    shingle arrays move only for the threshold-straddling pairs), so
    reported matches are exact unless a pair's every shared shingle is
    boilerplate (df > cap) — the same documented blind spot as
    ngram_jaccard_pairs. At 100 TB the corpus
    postings list is a materialized layout (write once, reuse per
    batch). ``corpus_index`` supplies exactly that: the relations of
    :func:`_incremental_corpus_relations` served from a
    fingerprint-keyed artifact (:func:`shared_incremental_corpus_index`)
    — byte-identical to the in-plan derivation (deterministic digests /
    shingles / counts through parquet); when ``None`` they are derived
    inline from ``corpus``. The index must have been built with the
    same ``n``/``max_df`` (the artifact key encodes them).
    """
    if corpus_index is not None:
        ch = corpus_index["hashes"]
        csh = corpus_index["shingles"].select("__cid", "__sh")
        csz = corpus_index["shingles"].select("__cid", "__csz")
        cex_rare = corpus_index["rare"]
        hot = corpus_index["hot"]
        chot = corpus_index["hot_counts"]
    else:
        # Same count-based verification as ngram_jaccard_pairs: the
        # rare-posting join gives the exact intersection over non-hot
        # shingles; the hot contribution per pair is bounded by
        # min(batch-doc hot count, corpus-doc hot count), so only
        # pairs whose Jaccard could cross the threshold inside that
        # slack ever ship their shingle arrays.
        rel = _incremental_corpus_relations(corpus, id_col, text_col, n, max_df)
        ch = rel["hashes"]
        csh = rel["shingles"]
        csz = csh.select("__cid", F.size("__sh").alias("__csz"))
        cex_rare = rel["rare"]
        hot = rel["hot"]
        chot = rel["hot_counts"]
    bh = batch.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("__h"))
    exact = bh.join(ch, "__h").groupBy(id_col).agg(
        F.min("__cid").alias("__exact_id")
    )

    parallelism = batch.sparkSession.sparkContext.defaultParallelism
    bsh = (
        batch.repartition(parallelism, id_col)
        .select(F.col(id_col), shingles(F.col(text_col), n).alias("__sh"))
        .persist()
    )
    bex = bsh.select(F.col(id_col), F.explode("__sh").alias("__s"))
    bsz = bsh.select(F.col(id_col), F.size("__sh").alias("__bsz"))
    if max_df is not None:
        bhot = (
            bex.join(F.broadcast(hot), "__s")
            .groupBy(id_col)
            .agg(F.count("*").alias("__hb"))
        )
    else:
        bhot = None
    inter = (
        bex.join(cex_rare, "__s")
        .groupBy(id_col, "__cid")
        .agg(F.count("*").alias("__i"))
    )
    scored = inter.join(bsz, id_col).join(csz, "__cid")
    if max_df is None:
        near_pairs = scored.withColumn(
            "jaccard",
            F.col("__i") / (F.col("__bsz") + F.col("__csz") - F.col("__i")),
        ).filter(F.round("jaccard", 6) >= threshold)
    else:
        scored = (
            scored.join(bhot, id_col, "left")
            .join(chot, "__cid", "left")
            .withColumn(
                "__slack",
                F.least(F.coalesce("__hb", F.lit(0)), F.coalesce("__hc", F.lit(0))),
            )
            .withColumn(
                "__ub",
                F.least(
                    F.col("__i") + F.col("__slack"), F.least("__bsz", "__csz")
                ),
            )
            # upper bound ≥ true Jaccard, so nothing qualifying is dropped
            .filter(
                F.round(
                    F.col("__ub") / (F.col("__bsz") + F.col("__csz") - F.col("__ub")),
                    6,
                )
                >= threshold
            )
            .persist()
        )
        exact_now = scored.filter(F.col("__slack") == 0).select(id_col, "__cid")
        maybe = scored.filter(F.col("__slack") > 0).select(id_col, "__cid")
        verified = (
            maybe.join(bsh, id_col)
            .join(csh.withColumnRenamed("__sh", "__csh"), "__cid")
            .withColumn("__it", F.size(F.array_intersect("__sh", "__csh")))
            .filter(
                F.round(
                    F.col("__it")
                    / (F.size("__sh") + F.size("__csh") - F.col("__it")),
                    6,
                )
                >= threshold
            )
            .select(id_col, "__cid")
        )
        near_pairs = exact_now.unionByName(verified)
    near = near_pairs.groupBy(id_col).agg(F.min("__cid").alias("__near_id"))
    return (
        batch.select(id_col)
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("__exact_id").isNotNull(), F.lit("dup_exact"))
            .when(F.col("__near_id").isNotNull(), F.lit("dup_near"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.coalesce("__exact_id", "__near_id").alias("match_id"),
        )
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Directed near-CONTAINMENT pairs: |A∩B| / |A| ≥ threshold means
    document A is (mostly) contained in document B — the asymmetric
    dedup mode (CCNet/RefinedWeb-style pipelines drop quotes, mirrors
    and snippet pages that Jaccard misses when the container is much
    longer than the contained doc).

    Same inverted-index shape as ngram_jaccard_pairs: one undirected
    intersection count per colliding pair (Σ df(s)² join cost, never
    N²), then BOTH directions are scored from the same count — the
    direction is a projection, not a second join.
    """
    sh = df.select(
        F.col(id_col), shingles(F.col(text_col), n).alias("__sh")
    ).filter(F.size("__sh") > 0)
    ex = sh.select(F.col(id_col), F.explode("__sh").alias("__s"))
    sizes = sh.select(F.col(id_col), F.size("__sh").alias("__sz"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("__ida"), F.col(f"b.{id_col}").alias("__idb")
        )
        .agg(F.count("*").alias("__i"))
        .join(sizes.select(F.col(id_col).alias("__ida"), F.col("__sz").alias("__sa")), "__ida")
        .join(sizes.select(F.col(id_col).alias("__idb"), F.col("__sz").alias("__sb")), "__idb")
        # colliding-pair-bounded and consumed by BOTH direction
        # projections: checkpointed so the Σ df² intersection join runs
        # once, not once per direction (round 12 small-hub-reuse move;
        # the before-plan ran the whole self-join chain twice).
        .localCheckpoint(eager=False)
    )
    ab = inter.select(
        F.col("__ida").alias("contained"),
        F.col("__idb").alias("container"),
        F.round(F.col("__i") / F.col("__sa"), 6).alias("containment"),
    )
    ba = inter.select(
        F.col("__idb").alias("contained"),
        F.col("__ida").alias("container"),
        F.round(F.col("__i") / F.col("__sb"), 6).alias("containment"),
    )
    return ab.unionByName(ba).filter(F.col("containment") >= threshold)


# ---------------------------------------------------------------------------
# per-document duplicated-window coverage
# ---------------------------------------------------------------------------


def duplicate_ngram_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
    dup_vocab_override: DataFrame | None = None,
) -> DataFrame:
    """Per-document fraction of character ``k``-gram windows that also
    occur in at least one OTHER document — the per-doc "how much of me
    is boilerplate/copied" signal used to decide span-level scrubbing
    vs whole-doc dropping in training-data curation (the document-level
    view of what substring-dedup papers remove span-wise).

    Plan: explode each doc into its window positions (narrow, no
    shuffle), shuffle once on the shingle to get cross-doc document
    frequency, then one shuffle back on the doc id.  At 100 TB the
    shingle shuffle key should be ``xxhash64(shingle)`` (8 bytes
    instead of k chars — collisions only overcount duplication by
    ~1e-9); the string key is kept here so the DuckDB oracle is exact.
    Docs shorter than ``k`` have no windows and are excluded, matching
    the oracle.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    docs = (
        df.repartition(parallelism, id_col)
        .select(
            F.col(id_col), F.col(text_col).alias("__t"),
            F.length(text_col).alias("__len"),
        )
        .filter(F.col("__len") >= k)
    )
    sh = docs.select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.col("__len") - (k - 1))).alias("__pos"),
        "__t",
    ).select(id_col, F.expr(f"substring(__t, __pos, {k})").alias("__sh"))
    # Compact to (doc, shingle, occurrence-count) in ONE shuffle. Both
    # downstream consumers re-derive this subtree (2 scans / 2 explodes
    # in the plan) — deliberately: materializing it with a
    # localCheckpoint was measured 1.5-1.7× SLOWER at sf0.1 (min-of-4
    # noop 3.0-3.3 s vs 1.9-2.0 s) because the compacted doc×shingle
    # relation is large and the two regenerating branches run
    # concurrently, while the checkpoint serializes a full
    # materialization before either consumer starts — same outcome as
    # the reverted one-scan ExactSubstr window relation (SCALE.md).
    # The repartition by id makes the (id, sh) aggregation
    # exchange-free, so each pass is explode + local hash agg.
    if dup_vocab_override is not None:
        # The dup vocabulary comes precomputed (shared_dup_char_vocab,
        # round 12): ONE explode pass — windows probe the (broadcast-
        # sized) vocabulary and count per doc; dup_windows = number of
        # window positions whose shingle is duplicated, identical to
        # Σ __c over dup shingles of the compacted relation.
        dupw = (
            sh.join(dup_vocab_override, "__sh")
            .groupBy(id_col)
            .agg(F.count("*").alias("dup_windows"))
        )
    else:
        g = sh.groupBy(id_col, "__sh").agg(F.count("*").alias("__c"))
        # Only duplicated shingles (df ≥ 2) matter downstream: the join
        # ships the dup vocabulary, not every shingle's df, and
        # n_windows needs no join at all — Σ occurrence counts per doc
        # is exactly the window count ``len − k + 1``, already on the
        # docs relation.
        dup_sh = (
            g.groupBy("__sh")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") >= 2)
            .select("__sh")
        )
        dupw = (
            g.join(dup_sh, "__sh")
            .groupBy(id_col)
            .agg(F.sum("__c").alias("dup_windows"))
        )
    return (
        docs.select(id_col, (F.col("__len") - (k - 1)).alias("n_windows"))
        .join(dupw, id_col, "left")
        .select(
            id_col,
            F.col("n_windows").cast("long").alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            F.round(
                F.coalesce("dup_windows", F.lit(0)) / F.col("n_windows"), 6
            ).alias("dup_coverage"),
        )
        .orderBy(id_col)
    )


def duplicate_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
    dup_vocab_override: DataFrame | None = None,
) -> DataFrame:
    """Character-level duplicated-SPAN coverage per document: the union
    of all duplicated ``k``-gram windows (gaps-and-islands over window
    intervals), i.e. exactly how many characters span-level scrubbing
    would remove — the decision input for scrub-vs-drop in curation.

    The island merge is two window functions over (doc, pos) — runs
    inside the per-doc partition after the same two shuffles as
    ``duplicate_ngram_coverage`` (shingle df, then doc rollup); pure
    integer arithmetic end to end, so the DuckDB oracle is exact.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    docs = (
        df.repartition(parallelism, id_col)
        .select(
            F.col(id_col), F.col(text_col).alias("__t"),
            F.length(text_col).alias("n_chars"),
        )
        .filter(F.col("n_chars") >= k)
    )
    sh = docs.select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.col("n_chars") - (k - 1))).alias("__pos"),
        "__t",
    ).select(id_col, "__pos", F.expr(f"substring(__t, __pos, {k})").alias("__sh"))
    # Duplicated vocabulary ONLY (df ≥ 2) before the join — the same
    # §2.3 move duplicate_ngram_coverage got in round 11: the join's
    # build side shrinks from every shingle's df to the dup vocabulary
    # (broadcastable), instead of shipping a df for every window just
    # to filter on it afterwards. Row set identical: a window survives
    # iff its shingle's df ≥ 2 either way. With ``dup_vocab_override``
    # (shared_dup_char_vocab, round 12) the df derivation — a second
    # full explode pass — disappears from the per-run plan entirely.
    dup_sh = (
        dup_vocab_override
        if dup_vocab_override is not None
        else sh.select(id_col, "__sh")
        .distinct()
        .groupBy("__sh")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") >= 2)
        .select("__sh")
    )
    dupw = sh.join(dup_sh, "__sh").select(
        id_col, "__pos", (F.col("__pos") + (k - 1)).alias("__end")
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    prev_end = F.max("__end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dupw.withColumn(
        "__new",
        F.when(prev_end.isNull() | (F.col("__pos") > prev_end), 1).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy(id_col, "__island").agg(
        (F.max("__end") - F.min("__pos") + 1).alias("__covered")
    )
    per_doc = islands.groupBy(id_col).agg(F.sum("__covered").alias("dup_chars"))
    return (
        docs.select(id_col, "n_chars")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_chars",
            F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
            F.round(
                F.coalesce("dup_chars", F.lit(0)) / F.col("n_chars"), 6
            ).alias("dup_char_frac"),
        )
        .orderBy(id_col)
    )


# Bump when the char-window definition (substring windows, df ≥ 2 over
# distinct docs) changes — see key note on shared_ngram_pairs.
_DUP_VOCAB_VERSION = 1


def shared_dup_char_vocab(spark, sf_dir: str, k: int = 20) -> DataFrame:
    """Fingerprint-keyed materialization of the DUPLICATED char-window
    vocabulary over ``documents``: the ``k``-char substrings occurring
    in ≥ 2 distinct documents — the df ≥ 2 set BOTH
    :func:`duplicate_ngram_coverage` and :func:`duplicate_span_stats`
    derive per run with a full explode + aggregate pass (the same
    doc-frequency definition in both: rows of the per-(doc, shingle)
    compaction / distinct per shingle).

    Why (round 12, guide §2.3/§2.4): the two queries each exploded the
    corpus twice per run — once to compute this vocabulary, once to
    probe it. With the artifact each query is ONE explode pass + a
    broadcast probe; the vocabulary build is the once-per-corpus job.
    Duplication-bounded (distinct duplicated k-grams), string-exact
    through parquet. Explicit read schema: an empty corpus writes no
    part files."""
    import os

    from nabatshy_spark import artifacts
    from nabatshy_spark.catalog import load

    src = os.path.join(sf_dir, "documents.parquet")
    key = (
        f"dupvocab_{artifacts.source_fingerprint(src)}"
        f"_v{_DUP_VOCAB_VERSION}_k{k}"
    )

    def _build(staging: str) -> None:
        docs = load(spark, sf_dir, "documents")
        par = spark.sparkContext.defaultParallelism
        d = (
            docs.repartition(par, "doc_id")
            .select(
                F.col("doc_id"),
                F.col("text").alias("__t"),
                F.length("text").alias("__len"),
            )
            .filter(F.col("__len") >= k)
        )
        sh = d.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.col("__len") - (k - 1))
            ).alias("__pos"),
            "__t",
        ).select("doc_id", F.expr(f"substring(__t, __pos, {k})").alias("__sh"))
        (
            sh.select("doc_id", "__sh")
            .distinct()
            .groupBy("__sh")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") >= 2)
            .select("__sh")
            # bounded file count, parallel reduce (the repartition(1)
            # vs coalesce(1) lesson — the distinct keeps its width)
            .repartition(8)
            .write.mode("overwrite")
            .parquet(staging)
        )

    path = artifacts.ensure(
        "dup_vocab", key, _build, env_var="SPARK_GRAFT_PAIRS_DIR"
    )
    return spark.read.schema("__sh string").parquet(path)


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard pairs via PREFIX FILTERING (AllPairs,
    Bayardo et al. WWW'07; PPJoin, Xiao et al. WWW'08) — same output
    contract as :func:`ngram_jaccard_pairs`, far fewer candidates.

    Order every document's shingles by a global rarity order (df asc,
    shingle asc); a pair with Jaccard ≥ t MUST share a shingle inside
    each side's first ``|d| − ⌈t·|d|⌉ + 1`` shingles (if it shared
    only later ones, the intersection couldn't reach t·|d| on either
    side). Candidate generation therefore joins only the PREFIX
    postings — Σ prefix-df² instead of Σ df² — and verification
    computes exact Jaccard from the full shingle arrays of the
    surviving candidates only.

    ``max_df`` drops shingles with df > cap from the prefix index.
    CAUTION — the capped miss condition here is STRICTLY WEAKER in
    recall than :func:`ngram_jaccard_pairs` with the same cap: this
    operator misses a pair whenever every shingle it shares INSIDE the
    required prefixes is hot, while the posting-join operator verifies
    hot-slack candidates against full shingle arrays and so misses a
    pair only when EVERY shared shingle (anywhere) is hot. Rarity
    ordering pushes hot shingles to the back of each document, so
    prefixes are mostly rare shingles and the gap is small in
    practice, but it is real: the capped prefix variant can drop pairs
    the capped posting join keeps. (Dropping hot shingles before vs.
    after the per-doc rank is equivalent under the df-asc order — hot
    shingles sort last either way — so the only full fix would be a
    posting-style hot-slack verify, which would forfeit the prefix
    filter's candidate bound. Use max_df=None for exact parity.)

    Scale shape: attach df (one shuffle on shingle, linear), per-doc
    rank window (one shuffle on id, linear), prefix self-join
    (Σ prefix-df², the whole point), then an array_intersect verify
    over candidate pairs only. No global rank relation is ever
    materialized — the total order is the (df, shingle) tuple itself,
    so nothing sorts on one task.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.repartition(parallelism, id_col)
        .select(F.col(id_col), shingles(F.col(text_col), n).alias("__sh"))
        .persist()
    )
    sizes = sh.select(F.col(id_col), F.size("__sh").alias("__sz"))
    ex = sh.select(F.col(id_col), F.explode("__sh").alias("__s"))
    dfreq = ex.groupBy("__s").agg(F.count("*").alias("__df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("__df") <= max_df)
    posted = ex.join(dfreq, "__s")  # hot shingles drop out of the index here
    w_doc = Window.partitionBy(id_col).orderBy("__df", "__s")
    pref = (
        posted.withColumn("__rn", F.row_number().over(w_doc))
        .join(sizes, id_col)
        .filter(
            F.col("__rn")
            <= F.col("__sz") - F.ceil(F.lit(threshold) * F.col("__sz")) + 1
        )
        .select(F.col(id_col), "__s")
    )
    a = pref.select(F.col(id_col).alias("doc_a"), "__s")
    b = pref.select(F.col(id_col).alias("doc_b"), "__s")
    cand = (
        a.join(b, "__s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    withsets = cand.join(
        sh.select(F.col(id_col).alias("doc_a"), F.col("__sh").alias("__sh_a")),
        "doc_a",
    ).join(
        sh.select(F.col(id_col).alias("doc_b"), F.col("__sh").alias("__sh_b")),
        "doc_b",
    )
    i = F.size(F.array_intersect("__sh_a", "__sh_b"))
    return (
        withsets.withColumn("__i", i)
        .withColumn(
            "jaccard",
            F.round(
                F.col("__i")
                / (F.size("__sh_a") + F.size("__sh_b") - F.col("__i")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
