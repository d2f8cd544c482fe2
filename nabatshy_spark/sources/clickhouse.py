"""ClickHouse sink slot (BASELINE "spark_approach": Structured
Streaming + ClickHouse sink; reference connection config
db/clickhouse.go:13-27).

No ClickHouse server or JDBC driver jar ships in this container, so
the writer is a thin, testable option-builder around
``df.write.format("jdbc")`` — drop the clickhouse-jdbc jar on the
classpath and point ``url`` at the server and the same `foreachBatch`
body used for parquet appends streams into `denormalized_span`.

Connection semantics mapped from the reference:
- 60s max execution time (db/clickhouse.go:21) → socket/query timeout;
- LZ4 wire compression (db/clickhouse.go:24-25) → `compress=1`
  (ClickHouse JDBC negotiates LZ4);
- batch inserts (utils/utils.go:169-241) → JDBC `batchsize`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_OPTIONS = {
    "driver": "com.clickhouse.jdbc.ClickHouseDriver",
    "batchsize": "10000",               # batched inserts (U:169-241)
    "socket_timeout": "60000",          # 60s ceiling (db/clickhouse.go:21)
    "compress": "1",                    # LZ4 wire compression (:24-25)
    "isolationLevel": "NONE",           # append-only, no transactions
    "numPartitions": "8",
}


def jdbc_options(url: str, table: str, **overrides: str) -> dict[str, str]:
    """Build the option map for a ClickHouse JDBC write."""
    opts = dict(DEFAULT_OPTIONS)
    opts.update({"url": url, "dbtable": table})
    opts.update(overrides)
    return opts


def write_spans_jdbc(df: DataFrame, url: str, table: str = "denormalized_span", **overrides: str) -> None:
    """Append a span batch to ClickHouse over JDBC. Requires the
    clickhouse-jdbc jar on the session classpath; raises the underlying
    ClassNotFound error otherwise (no silent fallback — the caller
    chose this sink)."""
    writer = df.write.format("jdbc").mode("append")
    for k, v in jdbc_options(url, table, **overrides).items():
        writer = writer.option(k, v)
    writer.save()
