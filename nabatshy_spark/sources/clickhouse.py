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


# ---------------------------------------------------------------------------
# HTTP-interface writer — the path that IS exercisable in this container.
#
# ClickHouse's public HTTP interface accepts
#   POST /?query=INSERT+INTO+<table>+FORMAT+JSONEachRow&<settings>
# with newline-delimited JSON rows in the body.  Spark-side this is a
# foreachPartition batched POST: every executor streams its own
# partitions directly to the server (no driver funnel, no collect), the
# same fan-in shape clickhouse-go gives the reference
# (utils/utils.go:169-241 batches; db/clickhouse.go:21 60s ceiling,
# :24-25 LZ4 — HTTP negotiates gzip via Content-Encoding instead).
# ---------------------------------------------------------------------------


def _post_batch(url: str, query: str, lines: list[str], timeout_s: float, gzip_body: bool) -> None:
    import gzip as _gzip
    import urllib.parse
    import urllib.request

    body = ("\n".join(lines) + "\n").encode("utf-8")
    headers = {"Content-Type": "application/x-ndjson"}
    if gzip_body:
        body = _gzip.compress(body)
        headers["Content-Encoding"] = "gzip"
    full = url.rstrip("/") + "/?" + urllib.parse.urlencode({"query": query})
    req = urllib.request.Request(full, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        resp.read()


def insert_http(
    df: DataFrame,
    url: str,
    table: str = "denormalized_span",
    batch_rows: int = 10_000,
    timeout_s: float = 60.0,
    gzip_body: bool = True,
) -> None:
    """Append ``df`` to a ClickHouse table over the HTTP interface.

    Executes as ``foreachPartition``: each Spark task JSON-encodes its
    rows and POSTs them in ``batch_rows``-sized chunks — the write
    parallelism IS the partition count, so `df.repartition(n)` is the
    throughput knob.  A failed POST raises inside the task and Spark's
    task retry re-sends the whole partition; pair with a ClickHouse
    `ReplacingMergeTree` (or insert_deduplicate) for effective
    idempotence, mirroring the at-least-once contract of the parquet
    spool sink (sources/sink.py)."""
    import json

    query = f"INSERT INTO {table} FORMAT JSONEachRow"
    cols = df.columns

    def send(rows) -> None:
        buf: list[str] = []
        for row in rows:
            buf.append(json.dumps(dict(zip(cols, row)), default=str, separators=(",", ":")))
            if len(buf) >= batch_rows:
                _post_batch(url, query, buf, timeout_s, gzip_body)
                buf = []
        if buf:
            _post_batch(url, query, buf, timeout_s, gzip_body)

    df.foreachPartition(send)
