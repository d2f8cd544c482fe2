"""IVF-style vector index: embeddings written partitioned by a coarse
LSH cell, so a top-k query prunes at the FILE level — the storage-side
upgrade of the LSH bucket join (SCALE.md "similarity" section made
executable).

Cell id = the first ``cell_bits`` of the random-hyperplane signature
(deterministic planes, same family as operators/similarity.py). A
query reads only the cells sharing its id — with multi-probe widening
(flip one bit at a time) to recover recall near cell boundaries, the
standard IVF nprobe knob.

At 100 TB this is a directory layout: ``cell=<id>/part-*.parquet``;
Spark's partition pruning turns the probe list into a file-list
restriction before any IO happens (asserted on the physical plan in
tests — PartitionFilters, not a post-scan filter).

Recall depends on how similar the true neighbours actually are:
near-dup workloads (cos > 0.8) concentrate into few cells and probe
cheaply; weakly-similar neighbours (cos ≈ 0.3, near-random directions,
as in the synthetic test embeddings) scatter and need a high nprobe —
the tests assert the recall *shape* (monotone in nprobe, exact at full
probe), not a flattering constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nabatshy_spark.operators.dedup import cosine
from nabatshy_spark.operators.similarity import lsh_signature

CELL_COL = "cell"


def build_ivf(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    cell_bits: int = 4,
    dim: int = 64,
) -> None:
    """Write the vector table partitioned by its coarse LSH cell."""
    signed = lsh_signature(df, vec_col, num_planes=cell_bits, dim=dim)
    (
        signed.withColumn(CELL_COL, F.col("__sig").cast("int"))
        .drop("__sig")
        .write.mode("overwrite")
        .partitionBy(CELL_COL)
        .parquet(path)
    )


def _probe_cells(cell: int, cell_bits: int, nprobe: int) -> list[int]:
    """The query's cell plus its nearest neighbours in hamming order
    (deterministic: by bit-distance, then cell value) — the IVF nprobe
    widening; nprobe = 2^cell_bits probes everything."""
    masks = sorted(range(1 << cell_bits), key=lambda m: (m.bit_count(), m))
    return [cell ^ m for m in masks[:nprobe]]


def ivf_topk(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    cell_bits: int = 4,
    nprobe: int = 3,
) -> DataFrame:
    """Top-k by cosine, scanning only the probed cells.

    The cell filter is on the partition column, so it resolves to a
    directory listing before any data IO (PartitionFilters in the
    plan); exact cosine reranks within the probed cells.
    """
    sig = 0
    from nabatshy_spark.operators.similarity import _planes

    for i, plane in enumerate(_planes(len(query_vec), cell_bits)):
        if sum(a * b for a, b in zip(query_vec, plane)) > 0:
            sig |= 1 << i
    cells = _probe_cells(sig, cell_bits, nprobe)
    df = spark.read.parquet(path).filter(F.col(CELL_COL).isin(cells))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qcol), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )
