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

import random

from pyspark.sql import Column, DataFrame
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
    """Distinct word n-gram strings (space-joined) of a text column."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


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
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact near-dup pairs: word-n-gram Jaccard ≥ threshold.

    Inverted-index self-join on shingles: only documents sharing at
    least one shingle ever meet, so cost is Σ df(s)² over shingles,
    not N².
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.repartition(parallelism, id_col)
        .select(F.col(id_col), shingles(F.col(text_col), n).alias("__sh"))
        .persist()  # referenced by sizes + both explode sides
    )
    return _jaccard_from_shingled(sh, id_col, threshold)


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

    def f(texts):
        hs_out, sig_out = [], []
        for t in texts:
            toks = t.split(" ")
            if len(toks) < n:
                hs_out.append(empty)
                sig_out.append(None)
                continue
            grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            h = np.fromiter(
                (
                    int.from_bytes(blake2b(g.encode(), digest_size=8).digest(), "big")
                    & ((1 << 63) - 1)
                    for g in grams
                ),
                dtype=np.int64,
                count=len(grams),
            )
            hs_out.append(h)
            sig_out.append(((a * (h % _MERSENNE31)[None, :] + b) % _MERSENNE31).min(axis=1))
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
) -> DataFrame:
    """Near-dup pairs via MinHash signatures + banded LSH, with exact
    Jaccard verification of the candidates.

    128 minhashes in 64 bands of 2: P[miss | J=t] = (1-t²)^64 ≈ 1e-8
    at t=0.5, so the result set matches the exact operator while the
    join touches only band-bucket collisions — the scale path when the
    inverted-index join's Σdf(s)² blows up.

    All hashing is JVM-side (`xxhash64` + affine family mod 2^61-1);
    no Python in the hot path.
    """
    bands = num_hashes // rows_per_band
    fam = _hash_family(num_hashes)

    # Repartition before the CPU-bound shingle/signature stage — a
    # single-file table would otherwise pin the whole pipeline to one
    # task — and persist: the frame is referenced four times in the
    # DAG (banding + both join sides of candidate verification) and
    # must not be recomputed per reference. The Python-stage fan-out
    # is capped below core count: each task costs a worker spawn +
    # Arrow channel, and the vectorized batch work is cheap, so fewer,
    # larger batches win until data volume actually needs the width.
    parallelism = max(8, df.sparkSession.sparkContext.defaultParallelism // 4)
    hs = (
        df.repartition(parallelism, id_col)
        .select(
            F.col(id_col), _shingle_sig_udf(n, fam)(F.col(text_col)).alias("__hsig")
        )
        .select(
            F.col(id_col),
            F.col("__hsig.hs").alias("__hs"),
            F.col("__hsig.sig").alias("__sig"),
        )
        .filter(F.size("__hs") > 0)
        .persist()
    )
    signed = hs
    band_keys = [
        F.concat_ws(
            "-",
            *[
                F.col("__sig")[b * rows_per_band + r].cast("string")
                for r in range(rows_per_band)
            ],
        )
        for b in range(bands)
    ]
    banded = signed.select(
        F.col(id_col), F.posexplode(F.array(*band_keys)).alias("__band", "__key")
    )
    # Candidate pairs via groupBy-bucket + in-bucket pair expansion:
    # one shuffle on (band, key), pairs generated inside each (tiny)
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
    candidates = (
        banded.groupBy("__band", "__key")
        .agg(ids.alias("__ids"))
        .filter(F.size("__ids") > 1)
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
    hs = df.select(
        F.col(id_col),
        F.transform(tokens(F.col(text_col)), _md5_60bit).alias("__hs"),
    )

    def _bit_sum(i: int):
        # factory, not a default-arg lambda: pyspark dispatches on the
        # lambda's arity, so an extra bound parameter would be
        # misread as the (acc, x, idx) form.
        def merge(acc, h):
            return acc + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return merge

    bit_sums = [
        F.aggregate("__hs", F.lit(0).cast("long"), _bit_sum(i))
        for i in range(SIMHASH_BITS)
    ]
    fp = None
    for i, s in enumerate(bit_sums):
        term = F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return hs.select(F.col(id_col), fp.alias("simhash"))


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
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.45
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold over a self-join.

    Brute-force N²/2 compare — correct baseline. The scale path is the
    LSH bucketing in operators/similarity.py (random-hyperplane
    signatures), which turns this into a band-bucket join.
    """
    a = df.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("cos", F.round(cosine(F.col("__va"), F.col("__vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("doc_a", "doc_b", "cos")
    )


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """Group near-dup *pairs* into duplicate clusters: every node gets
    ``component`` = the minimum doc id reachable from it. This is the
    step after any pair-finder (MinHash/SimHash/Jaccard/embedding) —
    training-data dedup keeps one survivor per component, not per pair.

    Iterative min-label propagation on DataFrames: each round every
    node takes min(own label, neighbours' labels); converges in
    O(graph diameter) rounds. Duplicate clusters are near-cliques, so
    the diameter is tiny in practice. Each round is one shuffle on the
    node id; ``localCheckpoint`` truncates the lineage so plans don't
    grow superlinearly with rounds. For adversarially long chains at
    100 TB the drop-in upgrade is the alternating large-star/small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce"),
    which converges in O(log n) rounds with the same per-round shape.
    """
    # Materialize the (usually expensive) pair-finder output once —
    # every propagation round re-reads edges, and without this the
    # whole upstream plan (e.g. a MinHash/Jaccard self-join) would
    # re-execute per round.
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    ).localCheckpoint()
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    while True:
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                "node",
                "component",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("new_component"),
            )
        ).localCheckpoint()  # eager: one materialization per round
        changed = updated.filter(
            F.col("new_component") < F.col("component")
        ).limit(1).count()
        labels = updated.select(
            "node", F.col("new_component").alias("component")
        )
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), "component")


def dedup_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
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
    """
    exact_sur = exact_dedup(df, id_col, text_col).select(id_col)
    sur_docs = df.join(exact_sur, id_col, "left_semi")
    pairs = ngram_jaccard_pairs(sur_docs, id_col, text_col, n, threshold)
    removed = (
        connected_components(pairs)
        .filter(F.col("component") < F.col("doc_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return sur_docs.join(removed, id_col, "left_anti")
