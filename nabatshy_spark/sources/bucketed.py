"""Bucketed table layout: pay the join shuffle once, at write time.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem on
orderkey) is shuffling BOTH sides onto the join key — every query, every
time. Spark's bucketed tables amortize that: each table is hash-bucketed
into the same number of buckets on the key at write time
(``df.write.bucketBy(n, key).sortBy(key)``), so any later equi-join or
aggregation on that key reads bucket-aligned files and the physical plan
has NO Exchange under the join — a SortMergeJoin straight over the scans
(asserted in tests/test_plans.py). The reference gets the same effect
from ClickHouse's co-located MergeTree parts ordered by key
(db/clickhouse.go:107-109); this is the Spark-native equivalent for the
normalized-table surface (SURVEY §2.1 S8, §2.3 J3).

Scale notes:
- Bucket count is a layout-time choice: pick ``total_size / target_file``
  (e.g. 100 TB / 1 GB ≈ 10⁵ buckets); both tables MUST use the same
  count for the shuffle-free join (Spark can coalesce mismatched counts
  when one divides the other, but same-count is the predictable path).
- ``sortBy`` inside buckets gives parquet row-group min/max on the key →
  point lookups and merge joins skip row groups.
- Layout tables are external (explicit ``path``) and keyed by a content
  fingerprint of the source parquet, so a changed source can never serve
  a stale layout (same lifecycle rule as operators/ivf.py).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from nabatshy_spark.operators.ivf import _source_fingerprint

BUCKET_ROOT = os.environ.get(
    "SPARK_GRAFT_BUCKET_DIR", os.path.join(tempfile.gettempdir(), "nabatshy_bucketed")
)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    num_buckets: int,
    sort_keys: list[str] | None = None,
) -> None:
    """Write ``df`` as an external parquet table hash-bucketed on
    ``keys`` (and sorted inside each bucket on ``sort_keys`` or the
    bucket keys). This is the one-time shuffle that every later join on
    ``keys`` avoids."""
    sort = sort_keys or keys
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, keys[0], *keys[1:])
        .sortBy(sort[0], *sort[1:])
        .option("path", path)
        .saveAsTable(table)
    )


def _schema_ddl(schema) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )


def _register_external_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    schema,
    keys: list[str],
    num_buckets: int,
    sort_keys: list[str] | None = None,
) -> None:
    """Register an already-on-disk bucketed layout as a catalog table.
    Bucket ids live in the parquet file names, so a CREATE TABLE with
    the matching CLUSTERED BY spec over the same LOCATION reads them
    exactly as the writing session's saveAsTable table did."""
    sort = sort_keys or keys
    bucket_cols = ", ".join(f"`{k}`" for k in keys)
    sort_cols = ", ".join(f"`{k}`" for k in sort)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS `{table}` ({_schema_ddl(schema)}) "
        f"USING parquet CLUSTERED BY ({bucket_cols}) "
        f"SORTED BY ({sort_cols}) INTO {num_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    source: str,
    keys: list[str],
    num_buckets: int = 8,
) -> str:
    """Idempotently materialize the bucketed layout of ``sf_dir/source``
    and return its catalog table name.

    The name embeds a content fingerprint of the source file, so a
    changed source yields a new layout rather than a stale read. The
    layout is built in a pid-unique STAGING directory and atomically
    renamed into place (the same lifecycle as operators/ivf.py), so
    concurrent sessions can never read a half-written or mid-overwrite
    layout: whoever loses the rename race discards its staging copy and
    registers the winner's (content-identical) layout.
    """
    src = os.path.join(sf_dir, f"{source}.parquet")
    fp = _source_fingerprint(src)
    table = f"nab_{source}_bkt{num_buckets}_{fp[:12]}"
    if spark.catalog.tableExists(table):
        return table
    path = os.path.join(BUCKET_ROOT, table)
    df = spark.read.parquet(src)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        staging_table = f"{table}__stg{os.getpid()}"
        staging_path = f"{path}.staging-{os.getpid()}"
        write_bucketed(df, staging_table, staging_path, keys, num_buckets)
        # External table: dropping it leaves the staged files in place.
        spark.sql(f"DROP TABLE IF EXISTS `{staging_table}`")
        try:
            os.rename(staging_path, path)
        except OSError:
            import shutil

            if os.path.exists(os.path.join(path, "_SUCCESS")):
                # Another session published the same fingerprint first;
                # its layout is content-identical, so use it and
                # discard ours.
                shutil.rmtree(staging_path, ignore_errors=True)
            else:
                # `path` exists but carried no _SUCCESS at check time: a
                # stale partial layout left by a crashed run, NOT a
                # completed publish. Registering over it would silently
                # serve corrupt data to every later join — but a racer
                # can complete an atomic rename-publish between that
                # check and the eviction, so never rmtree `path` in
                # place (readers of the already-registered external
                # table would transiently see a half-deleted VALID
                # layout). Quarantine-rename first: atomic, so whatever
                # sits at `path` moves aside whole, then decide.
                quarantine = f"{path}.quarantine-{os.getpid()}-{uuid.uuid4().hex[:8]}"
                try:
                    os.rename(path, quarantine)
                except OSError:
                    quarantine = None  # a racer evicted it first
                if quarantine is not None and os.path.exists(
                    os.path.join(quarantine, "_SUCCESS")
                ):
                    # We quarantined a publish a racer completed in the
                    # window. It is content-identical to our staging
                    # copy: restore it atomically and discard ours. If
                    # the restore loses to yet another publish, theirs
                    # is equally valid — just drop the quarantined copy.
                    try:
                        os.rename(quarantine, path)
                    except OSError:
                        shutil.rmtree(quarantine, ignore_errors=True)
                    shutil.rmtree(staging_path, ignore_errors=True)
                else:
                    if quarantine is not None:
                        shutil.rmtree(quarantine, ignore_errors=True)
                    try:
                        os.rename(staging_path, path)
                    except OSError:
                        shutil.rmtree(staging_path, ignore_errors=True)
                        if not os.path.exists(
                            os.path.join(path, "_SUCCESS")
                        ):
                            raise RuntimeError(
                                f"bucketed layout at {path} is incomplete "
                                "(no _SUCCESS) and could not be replaced"
                            )
    _register_external_bucketed(spark, table, path, df.schema, keys, num_buckets)
    return table


def bucketed_join(
    spark: SparkSession,
    sf_dir: str,
    left: str,
    right: str,
    left_keys: list[str],
    right_keys: list[str],
    num_buckets: int = 8,
) -> DataFrame:
    """Equi-join two sources through their bucketed layouts — no
    Exchange on either side of the join. Key NAMES may differ per side
    (o_orderkey vs l_orderkey); what matters is that each side is
    bucketed on its own join key, so both scans already satisfy the
    join's required hash distribution."""
    lt = ensure_bucketed(spark, sf_dir, left, left_keys, num_buckets)
    rt = ensure_bucketed(spark, sf_dir, right, right_keys, num_buckets)
    ldf, rdf = spark.table(lt), spark.table(rt)
    cond = None
    for lk, rk in zip(left_keys, right_keys):
        c = ldf[lk] == rdf[rk]
        cond = c if cond is None else (cond & c)
    return ldf.join(rdf, on=cond)
