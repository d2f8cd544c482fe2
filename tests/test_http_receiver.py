"""S1 live push-ingest: HTTP receiver → durable spool → streaming
ingest → span table (reference collector/controller.go:28-95, POST
/v1/traces content negotiation + empty-protobuf 200 response)."""

from __future__ import annotations

import urllib.error
import urllib.request

from nabatshy_spark.sources.sink import read_spans
from nabatshy_spark.streaming.ingest import (
    ingest_batch,
    start_file_ingest,
    start_protobuf_file_ingest,
)
from nabatshy_spark.streaming.receiver import OTLPReceiver
from tests import pb_wire
from tests.test_otlp_ingest import _legacy_payload, _payload
from tests.test_otlp_protobuf import _request_dict


def _post(port: int, body: bytes, ctype: str) -> tuple[int, bytes, str]:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/traces",
        data=body,
        headers={"Content-Type": ctype},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read(), resp.headers.get("Content-Type", "")


def test_receiver_end_to_end(spark, tmp_path):
    rcv = OTLPReceiver(str(tmp_path / "spool"), host="127.0.0.1", port=0).start()
    try:
        # JSON POSTs: current + legacy format, both accepted with the
        # reference's empty-protobuf 200 ack
        for payload in (_payload(), _legacy_payload()):
            status, body, ctype = _post(
                rcv.port, payload.encode(), "application/json"
            )
            assert (status, body, ctype) == (200, b"", "application/x-protobuf")
        # protobuf POST (S2 wire format)
        status, body, _ = _post(
            rcv.port, pb_wire.request(_request_dict()), "application/x-protobuf"
        )
        assert (status, body) == (200, b"")
    finally:
        rcv.stop()

    out, ck = str(tmp_path / "out"), tmp_path / "ck"
    start_file_ingest(
        spark, rcv.spool_json, out, str(ck / "json")
    ).awaitTermination()
    start_protobuf_file_ingest(
        spark, rcv.spool_pb, out, str(ck / "pb")
    ).awaitTermination()

    got = {r.span_id for r in read_spans(spark, out).collect()}
    want = {
        r.span_id
        for r in ingest_batch(spark, [_payload(), _legacy_payload()]).collect()
    }
    want |= {sp["spanId"] for rs in _request_dict()["resourceSpans"]
             for ss in rs["scopeSpans"] for sp in ss["spans"]}
    assert got == want and len(got) >= 5


def test_receiver_rejects_bad_requests(tmp_path):
    import pytest

    rcv = OTLPReceiver(str(tmp_path / "spool"), host="127.0.0.1", port=0).start()
    try:
        for body, ctype, code in [
            (b"not json{", "application/json", 400),
            (b"x", "text/plain", 415),
        ]:
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(rcv.port, body, ctype)
            assert e.value.code == code
        # GET → 405 (only POST allowed), wrong path → 404
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{rcv.port}/v1/traces")
        assert e.value.code == 405
        with pytest.raises(urllib.error.HTTPError) as e:
            req = urllib.request.Request(
                f"http://127.0.0.1:{rcv.port}/v1/metrics",
                data=b"{}", headers={"Content-Type": "application/json"},
                method="POST",
            )
            urllib.request.urlopen(req)
        assert e.value.code == 404
        # nothing reached the spool from any rejected request
        import os

        assert len(os.listdir(rcv.spool_pb)) == 0
        assert len(os.listdir(rcv.spool_json)) == 0
    finally:
        rcv.stop()
