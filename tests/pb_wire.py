"""Test-only protobuf wire-format ENCODER for OTLP trace requests.

Mirrors the public opentelemetry-proto field numbers so tests can build
``application/x-protobuf`` payloads without a protobuf runtime. Kept in
tests/ — the engine only ever decodes (sources/otlp_pb.py)."""

from __future__ import annotations

import base64
import struct
from typing import Any


def varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def tag(fno: int, wt: int) -> bytes:
    return varint(fno << 3 | wt)


def ld(fno: int, payload: bytes) -> bytes:
    return tag(fno, 2) + varint(len(payload)) + payload


def s(fno: int, text: str) -> bytes:
    return ld(fno, text.encode("utf-8"))


def vint(fno: int, n: int) -> bytes:
    return tag(fno, 0) + varint(n)


def f64(fno: int, n: int) -> bytes:
    return tag(fno, 1) + struct.pack("<Q", n)


def f32(fno: int, n: int) -> bytes:
    return tag(fno, 5) + struct.pack("<I", n)


def anyvalue(d: dict[str, Any]) -> bytes:
    if "stringValue" in d:
        return s(1, d["stringValue"])
    if "boolValue" in d:
        return vint(2, 1 if d["boolValue"] else 0)
    if "intValue" in d:
        return vint(3, int(d["intValue"]))
    if "doubleValue" in d:
        return tag(4, 1) + struct.pack("<d", float(d["doubleValue"]))
    if "arrayValue" in d:
        return ld(
            5, b"".join(ld(1, anyvalue(x)) for x in d["arrayValue"]["values"])
        )
    if "kvlistValue" in d:
        return ld(
            6, b"".join(ld(1, keyvalue(x)) for x in d["kvlistValue"]["values"])
        )
    if "bytesValue" in d:
        return ld(7, base64.b64decode(d["bytesValue"]))
    return b""  # empty AnyValue (no oneof set)


def keyvalue(kv: dict[str, Any]) -> bytes:
    out = s(1, kv["key"])
    if kv.get("value") is not None:
        out += ld(2, anyvalue(kv["value"]))
    return out


def event(e: dict[str, Any]) -> bytes:
    out = f64(1, int(e.get("timeUnixNano", 0)))
    out += s(2, e.get("name", ""))
    for kv in e.get("attributes", []):
        out += ld(3, keyvalue(kv))
    return out


def span(sp: dict[str, Any], *, id_bytes: bool = False) -> bytes:
    """``sp`` uses the OTLP-JSON shape; ids are base64 strings unless
    ``id_bytes`` (then raw bytes are passed directly)."""

    def _id(x: Any) -> bytes:
        return x if id_bytes else base64.b64decode(x)

    out = b""
    if sp.get("traceId"):
        out += ld(1, _id(sp["traceId"]))
    if sp.get("spanId"):
        out += ld(2, _id(sp["spanId"]))
    if sp.get("parentSpanId"):
        out += ld(4, _id(sp["parentSpanId"]))
    out += s(5, sp.get("name", ""))
    out += f64(7, int(sp.get("startTimeUnixNano", 0)))
    out += f64(8, int(sp.get("endTimeUnixNano", 0)))
    for kv in sp.get("attributes", []):
        out += ld(9, keyvalue(kv))
    for e in sp.get("events", []):
        out += ld(11, event(e))
    if "flags" in sp:
        out += f32(16, int(sp["flags"]))
    return out


def scope_spans(ss: dict[str, Any], **kw: Any) -> bytes:
    sc = ss.get("scope", {})
    scope = s(1, sc.get("name", "")) + s(2, sc.get("version", ""))
    out = ld(1, scope)
    for sp in ss.get("spans", []):
        out += ld(2, span(sp, **kw))
    return out


def resource_spans(rs: dict[str, Any], **kw: Any) -> bytes:
    res = b"".join(
        ld(1, keyvalue(kv)) for kv in rs.get("resource", {}).get("attributes", [])
    )
    out = ld(1, res)
    for ss in rs.get("scopeSpans", []):
        out += ld(2, scope_spans(ss, **kw))
    if rs.get("schemaUrl"):
        out += s(3, rs["schemaUrl"])
    return out


def request(req: dict[str, Any], **kw: Any) -> bytes:
    return b"".join(ld(1, resource_spans(rs, **kw)) for rs in req["resourceSpans"])
