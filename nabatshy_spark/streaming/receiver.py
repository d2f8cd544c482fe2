"""Live OTLP push-ingest endpoint (SURVEY §2.1 S1): the reference's
only write path, ``POST /v1/traces`` on :4318
(collector/controller.go:28-95, 225-227, 319-323), re-expressed for
Spark's execution model.

The reference couples receive and insert: each POST synchronously
becomes ClickHouse batch inserts. A Spark cluster can't (and shouldn't)
run a socket server inside executors, so the faithful decomposition is

    HTTP receiver (this module, driver/edge-side, stdlib-only)
      → durable spool directory (atomic rename per request)
      → Structured Streaming file source (streaming/ingest.py)
      → partitioned span table

which preserves the reference's semantics — at-least-once, no dedup,
one POST body = one ingest unit — while making the receive path durable
(a POST is ack'd only after its payload is on disk, which is *stronger*
than the reference's ack-after-insert-started). At production scale the
spool directory is a Kafka topic and the file source a Kafka source;
the receiver and every downstream transform are unchanged.

Content negotiation matches collector/controller.go:43-78 exactly:
``application/x-protobuf`` (S2 wire decode), ``application/json``
(including the legacy ``instrumentationLibrarySpans`` rewrite, which
parse_otlp_json handles in-plan), 405 for non-POST, 415 for other
content types, 400 for undecodable JSON. Success returns 200 with an
empty ``ExportTraceServiceResponse`` (zero bytes on the wire, as
proto.Marshal of the empty message produces).
"""

from __future__ import annotations

import itertools
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

JSON_SUBDIR = "json"
PB_SUBDIR = "pb"


class OTLPReceiver:
    """Threaded HTTP server spooling OTLP export requests for the
    streaming ingest. ``port=0`` binds an ephemeral port (tests)."""

    def __init__(self, spool_dir: str, host: str = "0.0.0.0", port: int = 4318):
        self.spool_json = os.path.join(spool_dir, JSON_SUBDIR)
        self.spool_pb = os.path.join(spool_dir, PB_SUBDIR)
        os.makedirs(self.spool_json, exist_ok=True)
        os.makedirs(self.spool_pb, exist_ok=True)
        self._seq = itertools.count()
        receiver = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self) -> None:
                if self.path != "/v1/traces":
                    self.send_error(404)
                    return
                length = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if ctype == "application/x-protobuf":
                    receiver._spool(receiver.spool_pb, ".pb", body)
                elif ctype == "application/json":
                    try:
                        doc = json.loads(body)
                    except ValueError:
                        self.send_error(400, "invalid json")
                        return
                    # one request = one line; the text file source is
                    # line-oriented, and OTLP JSON may be pretty-printed
                    line = json.dumps(doc, separators=(",", ":")) + "\n"
                    receiver._spool(receiver.spool_json, ".jsonl", line.encode())
                else:
                    self.send_error(415, "unsupported content type")
                    return
                # empty ExportTraceServiceResponse = zero bytes
                self.send_response(200)
                self.send_header("Content-Type", "application/x-protobuf")
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_GET(self) -> None:
                self.send_error(405, "only POST allowed")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="otlp-receiver", daemon=True
        )

    def _spool(self, d: str, ext: str, payload: bytes) -> None:
        """Ack only after the payload is durably in the watched dir;
        write-then-rename so the file source never reads a partial
        file."""
        name = f"req-{os.getpid()}-{threading.get_ident()}-{next(self._seq)}"
        tmp = os.path.join(d, name + ".tmp")
        with open(tmp, "wb") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, os.path.join(d, name + ext))

    def start(self) -> "OTLPReceiver":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


def start_collector(
    spark: SparkSession,
    spool_dir: str,
    output_path: str,
    checkpoint_root: str,
    port: int = 4318,
    trigger_interval: str = "2 seconds",
) -> tuple[OTLPReceiver, list[StreamingQuery]]:
    """The full collector swap-in (reference collector.Run,
    controller.go:307-323): receiver + both ingest streams (JSON and
    protobuf) into one span table. Returns (receiver, queries); caller
    owns shutdown. Tests use availableNow triggers via the underlying
    ``start_*_ingest`` functions directly."""
    from nabatshy_spark.streaming.ingest import (
        start_file_ingest,
        start_protobuf_file_ingest,
    )

    rcv = OTLPReceiver(spool_dir, port=port).start()
    queries = [
        start_file_ingest(
            spark, rcv.spool_json, output_path,
            os.path.join(checkpoint_root, "json"),
            trigger_interval=trigger_interval,
        ),
        start_protobuf_file_ingest(
            spark, rcv.spool_pb, output_path,
            os.path.join(checkpoint_root, "pb"),
            trigger_interval=trigger_interval,
        ),
    ]
    return rcv, queries


# ---------------------------------------------------------------------------
# Kafka spool slot — the production form of the spool directory.
#
# At scale the spool directory above IS a Kafka topic: the receiver
# produces one record per POST body and the Structured Streaming file
# source becomes ``readStream.format("kafka")``. No broker ships in
# this container, so (mirroring the ClickHouse JDBC approach in
# sources/clickhouse.py) the production path is typed, unit-tested
# OPTION-MAP code rather than prose; point it at a broker and the
# downstream parse/denormalize plan is unchanged — parse_otlp_json
# consumes the record ``value`` exactly as it consumes a spooled line.
# ---------------------------------------------------------------------------

KAFKA_DEFAULT_OPTIONS = {
    # at-least-once from the earliest unprocessed offset — the same
    # contract as the file spool (checkpointed offsets, no dedup;
    # collector/controller.go ack semantics).
    "startingOffsets": "earliest",
    # a poisoned topic-retention gap should FAIL the query loudly, not
    # silently skip data (the file-spool analogue of a deleted spool
    # file mid-read).
    "failOnDataLoss": "true",
    # one POST body can carry many spans; cap the per-trigger intake so
    # micro-batches stay memory-bounded however deep the backlog.
    "maxOffsetsPerTrigger": "100000",
    "kafka.compression.type": "lz4",  # wire parity with db/clickhouse.go:24-25
}


def kafka_source_options(
    bootstrap_servers: str, topic: str, **overrides: str
) -> dict[str, str]:
    """Build the ``readStream.format('kafka')`` option map for the
    OTLP spool topic. Overrides win (e.g. startingOffsets='latest'
    for a tap that only wants new traffic)."""
    opts = dict(KAFKA_DEFAULT_OPTIONS)
    opts.update(
        {
            "kafka.bootstrap.servers": bootstrap_servers,
            "subscribe": topic,
        }
    )
    opts.update(overrides)
    return opts


def kafka_spool_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "otlp-spans",
    **overrides: str,
):
    """``readStream`` over the OTLP Kafka spool topic, projected to the
    (value, timestamp) shape streaming/ingest.py's JSON parser expects.
    Requires the spark-sql-kafka package on the session classpath;
    raises Spark's data-source-not-found error otherwise (no silent
    fallback — the caller chose this source)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic, **overrides).items():
        reader = reader.option(k, v)
    return reader.load().selectExpr(
        "CAST(value AS STRING) AS line", "timestamp AS ingest_ts"
    )
