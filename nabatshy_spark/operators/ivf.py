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

import hashlib
import os
import shutil
import tempfile

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


def _source_fingerprint(source_path: str) -> str:
    """Cheap content key for an on-disk parquet source: sha256 over the
    sorted (relative path, size, mtime_ns) of every data file. No data
    is read; any rewrite of the source changes the key."""
    h = hashlib.sha256(os.path.abspath(source_path).encode())
    if os.path.isdir(source_path):
        for root, _dirs, files in sorted(os.walk(source_path)):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                rel = os.path.relpath(p, source_path)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    else:
        st = os.stat(source_path)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def ensure_ivf(
    spark: SparkSession,
    source_path: str,
    base_dir: str | None = None,
    vec_col: str = "embedding",
    cell_bits: int = 4,
    dim: int = 64,
) -> str:
    """Explicit, idempotent IVF build step — the index lifecycle owner.

    The index directory is keyed by a fingerprint of the source parquet
    files (path + size + mtime), so a changed embeddings table can
    never be served by a stale layout; the build writes to a staging
    directory and renames it into place, so a failed or concurrent
    build can never expose a partial index. Returns the index path.

    At 100 TB this maps to a catalog-registered table location whose
    name embeds the source snapshot version; the staging-then-rename
    publish is the same pattern (rename is atomic per filesystem /
    object-store commit).
    """
    base = base_dir or os.path.join(tempfile.gettempdir(), "nabatshy_ivf")
    os.makedirs(base, exist_ok=True)
    path = os.path.join(
        base, f"{_source_fingerprint(source_path)}_b{cell_bits}_d{dim}"
    )
    if os.path.isdir(path):
        return path
    staging = f"{path}.staging-{os.getpid()}"
    build_ivf(spark.read.parquet(source_path), staging, vec_col, cell_bits, dim)
    try:
        os.rename(staging, path)
    except OSError:
        # another builder won the publish race; its index is identical
        shutil.rmtree(staging, ignore_errors=True)
    return path


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
