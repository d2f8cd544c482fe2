"""S2 protobuf decode tests (reference collector/controller.go:46-53):
wire-format decoding converges into the same explode chain as JSON, so
both content types produce identical span rows."""

from __future__ import annotations

import base64
import json
import struct

from pyspark.sql import types as T

from nabatshy_spark.sources.otlp import parse_otlp_json
from nabatshy_spark.sources.otlp_pb import (
    parse_otlp_protobuf,
    parse_otlp_protobuf_with_dead_letter,
    request_to_json,
)
from tests import pb_wire

BIN_SCHEMA = T.StructType([T.StructField("value", T.BinaryType())])
STR_SCHEMA = T.StructType([T.StructField("value", T.StringType())])

NS = 1_700_000_000_000_000_000


def _b64(raw: bytes) -> str:
    return base64.b64encode(raw).decode()


def _request_dict():
    """One request exercising every AnyValue variant, events, two
    resources — ids as base64 strings (the JSON twin uses it verbatim)."""
    attrs = [
        {"key": "str", "value": {"stringValue": "hello"}},
        {"key": "neg_int", "value": {"intValue": "-42"}},
        {"key": "dbl", "value": {"doubleValue": 2.0}},
        {"key": "flag", "value": {"boolValue": True}},
        {"key": "blob", "value": {"bytesValue": _b64(b"\x00\xff")}},
        {"key": "arr", "value": {"arrayValue": {"values": [
            {"stringValue": "a"}, {"intValue": "7"}]}}},
        {"key": "kv", "value": {"kvlistValue": {"values": [
            {"key": "z", "value": {"intValue": "9"}},
            {"key": "a", "value": {"doubleValue": 0.5}}]}}},
    ]
    span = {
        "traceId": _b64(b"\x01" * 16),
        "spanId": _b64(b"\x02" * 8),
        "parentSpanId": _b64(b"\x03" * 8),
        "name": "op-a",
        "startTimeUnixNano": str(NS),
        "endTimeUnixNano": str(NS + 5_000_000),
        "attributes": attrs,
        "events": [{
            "timeUnixNano": str(NS + 1),
            "name": "exception",
            "attributes": [{"key": "exception.type", "value": {"stringValue": "E"}}],
        }],
        "flags": 1,
    }
    root = dict(span, spanId=_b64(b"\x04" * 8), parentSpanId="", name="root")
    return {"resourceSpans": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "svc-pb"}}]},
        "schemaUrl": "https://opentelemetry.io/schemas/1.0",
        "scopeSpans": [{"scope": {"name": "svc-pb", "version": "1"},
                        "spans": [root, span]}],
    }]}


def test_protobuf_matches_json_path(spark):
    """The decisive parity check: protobuf wire bytes and the equivalent
    OTLP-JSON document must yield IDENTICAL denormalized rows."""
    req = _request_dict()
    payload = pb_wire.request(req)
    pb_df = spark.createDataFrame([(bytearray(payload),)], BIN_SCHEMA)
    js_df = spark.createDataFrame([(json.dumps(req),)], STR_SCHEMA)
    pb_rows = sorted(parse_otlp_protobuf(pb_df).collect(), key=lambda r: r.span_id)
    js_rows = sorted(parse_otlp_json(js_df).collect(), key=lambda r: r.span_id)
    assert len(pb_rows) == 2
    assert pb_rows == js_rows


def test_decoded_values(spark):
    rows = {
        r.name: r
        for r in parse_otlp_protobuf(
            spark.createDataFrame(
                [(bytearray(pb_wire.request(_request_dict())),)], BIN_SCHEMA
            )
        ).collect()
    }
    r = rows["op-a"]
    assert r.trace_id == _b64(b"\x01" * 16)         # encodeBytes parity
    assert r.parent_span_id == _b64(b"\x03" * 8)
    assert rows["root"].parent_span_id == ""
    assert r.duration_ns == 5_000_000
    assert r.flags == 1
    sa = r.span_attributes
    assert sa["neg_int"] == "-42"                   # 10-byte varint two's complement
    assert sa["dbl"] == "2"                         # Go 'f' shortest form
    assert sa["blob"] == _b64(b"\x00\xff")
    assert sa["arr"] == '["a","7"]'                 # mixed → stringified JSON
    assert json.loads(sa["kv"]) == {"a": "0.5", "z": "9"}
    assert r.resource_attributes["service.name"] == "svc-pb"
    assert r.events[0].attributes["exception.type"] == "E"


def test_golden_bytes_decode():
    """Hand-assembled wire bytes (no shared encoder) guard against
    symmetric encoder/decoder bugs."""
    span = (
        bytes([0x0A, 0x02, 0x01, 0x02])             # trace_id = 0x0102
        + bytes([0x12, 0x01, 0x03])                 # span_id = 0x03
        + bytes([0x2A, 0x02]) + b"op"               # name = "op"
        + bytes([0x39]) + struct.pack("<Q", 5)      # start = 5
        + bytes([0x41]) + struct.pack("<Q", 9)      # end = 9
    )
    ss = bytes([0x12, len(span)]) + span            # ScopeSpans.spans
    rs = bytes([0x12, len(ss)]) + ss                # ResourceSpans.scope_spans
    req = bytes([0x0A, len(rs)]) + rs               # Request.resource_spans
    doc = json.loads(request_to_json(req))
    sp = doc["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
    assert sp["traceId"] == base64.b64encode(b"\x01\x02").decode()
    assert sp["spanId"] == base64.b64encode(b"\x03").decode()
    assert sp["name"] == "op"
    assert sp["startTimeUnixNano"] == "5" and sp["endTimeUnixNano"] == "9"


def test_dead_letter_split(spark):
    good_payload = bytearray(pb_wire.request(_request_dict()))
    df = spark.createDataFrame(
        [(good_payload,), (bytearray(b"\xff\xff\xff"),)], BIN_SCHEMA
    )
    good, bad = parse_otlp_protobuf_with_dead_letter(df)
    assert good.count() == 2
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert bytes(bad_rows[0].raw_payload) == b"\xff\xff\xff"
    assert bad_rows[0].error


def test_streaming_protobuf_ingest(spark, tmp_path):
    from nabatshy_spark.sources.sink import read_spans
    from nabatshy_spark.streaming.ingest import start_protobuf_file_ingest

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "req1.pb").write_bytes(pb_wire.request(_request_dict()))
    q = start_protobuf_file_ingest(
        spark, str(in_dir), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    spans = read_spans(spark, str(tmp_path / "out"))
    assert spans.count() == 2
    assert {r.name for r in spans.collect()} == {"root", "op-a"}
