"""Similarity search over embedding columns (SURVEY §2.11).

Baseline: brute-force cosine top-k (exact, one scan, broadcast query
vector). Scale path: random-hyperplane LSH — signatures are computed
with engine-portable deterministic planes, candidates come from a
band-bucket join, and only candidates get the exact cosine.

At 100 TB the brute-force path is a full scan per query — fine for
batch scoring (it's embarrassingly parallel, no shuffle), wrong for
interactive lookup; the LSH path reads only matching buckets, and an
IVF layout (partitionBy coarse cluster id on write) would let the scan
prune files entirely.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nabatshy_spark.operators.dedup import cosine


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_id: int, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine to the vector of ``query_id`` (excluded
    from results). The 1-row query side is broadcast; ranking is a
    TakeOrderedAndProject (per-partition top-k, single-reduce merge —
    no global sort)."""
    q = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q")
    )
    return (
        df.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("__q")), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


# --- random-hyperplane LSH -------------------------------------------------


def _planes(dim: int, num: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num)]


def lsh_signature(df: DataFrame, vec_col: str, num_planes: int = 16, dim: int = 64) -> DataFrame:
    """Append a ``__sig`` bit-signature column: bit i = sign of the dot
    product with deterministic gaussian plane i. Pure array-expression
    arithmetic (single scan, codegen'd)."""
    planes = _planes(dim, num_planes)
    sig = None
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(x) for x in p]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return df.withColumn("__sig", sig)


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    num_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share at least one signature band
    with the query (16 planes → 4 bands of 4 bits), then exact cosine
    on candidates only. Returns the same schema as ``cosine_topk``;
    recall is probabilistic (hence no SQL oracle — the driver records
    a rows-only check)."""
    bits = num_planes // bands
    mask = (1 << bits) - 1
    signed = lsh_signature(df, vec_col, num_planes)
    band_arr = F.array(
        *[F.shiftright("__sig", bits * j).bitwiseAND(F.lit(mask)) for j in range(bands)]
    )
    banded = signed.select(
        F.col(id_col), F.col(vec_col), F.posexplode(band_arr).alias("__band", "__key")
    )
    qb = banded.filter(F.col(id_col) == query_id).select(
        F.col("__band").alias("__qband"),
        F.col("__key").alias("__qkey"),
        F.col(vec_col).alias("__q"),
    )
    candidates = (
        banded.filter(F.col(id_col) != query_id)
        .join(
            F.broadcast(qb),
            (F.col("__band") == F.col("__qband")) & (F.col("__key") == F.col("__qkey")),
        )
        .select(F.col(id_col), F.col(vec_col), F.col("__q"))
        .dropDuplicates([id_col])
    )
    return (
        candidates.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("__q")), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.45,
    num_planes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed (the scale path for
    ``dedup.embedding_dup_pairs``): candidates share a signature band,
    then exact cosine ≥ threshold on candidates only; verification is
    exact, so precision is 1 and only recall is probabilistic.

    Parameter rule: bits-per-band trades recall against candidate
    volume, and must scale with log N — 2-bit bands (defaults, tuned
    for the 500-vector test tables: recall ≈ 1-(1-0.42)^16 ≈ 0.9998 at
    cos 0.45) create only 4 buckets per band, fine at N=500 but
    near-cross-join at N=10⁹, where ~16-bit bands × 16 (256 planes)
    keep buckets small at the same band count. Rows-only check; tests
    measure overlap vs brute force."""
    bits = num_planes // bands
    mask = (1 << bits) - 1
    signed = lsh_signature(df, vec_col, num_planes)
    band_arr = F.array(
        *[F.shiftright("__sig", bits * j).bitwiseAND(F.lit(mask)) for j in range(bands)]
    )
    banded = signed.select(
        F.col(id_col), F.posexplode(band_arr).alias("__band", "__key")
    )
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
    vecs = df.select(F.col(id_col), F.col(vec_col))
    return (
        candidates.join(
            vecs.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("__va")),
            "doc_a",
        )
        .join(
            vecs.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("__vb")),
            "doc_b",
        )
        .withColumn("cos", F.round(cosine(F.col("__va"), F.col("__vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("doc_a", "doc_b", "cos")
    )


def label_centroids(df: DataFrame, label_col: str, vec_col: str) -> DataFrame:
    """Per-label centroid of a vector column, emitted as (label, dim,
    centroid_v, n) rows — the aggregation a clustering / prototype /
    drift-monitoring job runs over an embedding table.

    Row-form on purpose: posexplode → groupBy(label, dim) is a plain
    partial-aggregated hash agg (|labels|×|dims| groups), which scales
    to any corpus without ever holding arrays in agg state; re-assemble
    with array_agg ordered by dim when an array is needed.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_v"),
        F.count("*").alias("n"),
    )
