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
    in-memory catalog is session-scoped; re-registering in a fresh
    session rewrites at most once per (source content, bucket count).
    """
    src = os.path.join(sf_dir, f"{source}.parquet")
    fp = _source_fingerprint(src)
    table = f"nab_{source}_bkt{num_buckets}_{fp[:12]}"
    if not spark.catalog.tableExists(table):
        path = os.path.join(BUCKET_ROOT, table)
        write_bucketed(spark.read.parquet(src), table, path, keys, num_buckets)
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
