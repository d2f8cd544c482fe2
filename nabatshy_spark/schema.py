"""Span data model (SURVEY §1.2) — Spark schema for the denormalized
span table (reference DDL: db/clickhouse.go:86-109, row struct
utils/utils.go:138-158).

Design decisions vs the ClickHouse layout:
- ``Nested(key,value)`` parallel arrays → ``MapType(String,String)``
  (idiomatic; `has(key,k)` ≙ map_contains_key). The parallel arrays are
  *also* materialized (``sa_keys``/``sa_values``/``ra_keys``/
  ``ra_values``) because the reference's negation predicate P7
  (api/service.go:753-771) is defined over the independent arrays, and
  the DuckDB oracle needs the same physical shape.
- ``events`` keeps ArrayType(Struct) — ordered, each with its own map.
- timestamps stay Int64 nanoseconds (source of truth); conversion to
  µs timestamps happens only at bucketing time (T3).
"""

from __future__ import annotations

from pyspark.sql import types as T

ATTR_MAP = T.MapType(T.StringType(), T.StringType())

EVENT_STRUCT = T.StructType(
    [
        T.StructField("time_unix_nano", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("attributes", ATTR_MAP),
    ]
)

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType()),          # base64 (collector/service.go:273-275)
        T.StructField("span_id", T.StringType()),
        T.StructField("parent_span_id", T.StringType()),    # '' ⇒ root (api/service.go:183)
        T.StructField("flags", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("start_time_unix_nano", T.LongType()),
        T.StructField("end_time_unix_nano", T.LongType()),
        T.StructField("duration_ns", T.LongType()),         # materialized (db/clickhouse.go:94)
        T.StructField("scope_name", T.StringType()),        # service name (api/service.go:253)
        T.StructField("resource_schema_url", T.StringType()),
        T.StructField("resource_attributes", ATTR_MAP),
        T.StructField("span_attributes", ATTR_MAP),
        T.StructField("ra_keys", T.ArrayType(T.StringType())),
        T.StructField("ra_values", T.ArrayType(T.StringType())),
        T.StructField("sa_keys", T.ArrayType(T.StringType())),
        T.StructField("sa_values", T.ArrayType(T.StringType())),
        T.StructField("events", T.ArrayType(EVENT_STRUCT)),
    ]
)


def otlp_anyvalue_schema(depth: int = 2) -> T.StructType:
    """OTLP AnyValue (one/two nesting levels — practical payloads are
    shallow; the reference recurses, collector/service.go:184-237)."""
    fields = [
        T.StructField("stringValue", T.StringType()),
        T.StructField("intValue", T.StringType()),      # JSON int64 is a string in OTLP JSON
        T.StructField("doubleValue", T.DoubleType()),
        T.StructField("boolValue", T.BooleanType()),
        T.StructField("bytesValue", T.StringType()),    # base64
    ]
    if depth > 0:
        inner = otlp_anyvalue_schema(depth - 1)
        fields.append(
            T.StructField(
                "arrayValue",
                T.StructType([T.StructField("values", T.ArrayType(inner))]),
            )
        )
        fields.append(
            T.StructField(
                "kvlistValue",
                T.StructType(
                    [
                        T.StructField(
                            "values",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("key", T.StringType()),
                                        T.StructField("value", inner),
                                    ]
                                )
                            ),
                        )
                    ]
                ),
            )
        )
    return T.StructType(fields)


def otlp_request_schema() -> T.StructType:
    """ExportTraceServiceRequest JSON schema (current *and* legacy
    ``instrumentationLibrarySpans`` shape, collector/controller.go:97-223)."""
    attr = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", otlp_anyvalue_schema()),
        ]
    )
    event = T.StructType(
        [
            T.StructField("timeUnixNano", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("attributes", T.ArrayType(attr)),
        ]
    )
    span = T.StructType(
        [
            T.StructField("traceId", T.StringType()),
            T.StructField("spanId", T.StringType()),
            T.StructField("parentSpanId", T.StringType()),
            T.StructField("flags", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("startTimeUnixNano", T.StringType()),
            T.StructField("endTimeUnixNano", T.StringType()),
            T.StructField("attributes", T.ArrayType(attr)),
            T.StructField("events", T.ArrayType(event)),
        ]
    )
    scope = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("version", T.StringType()),
        ]
    )
    scope_spans = T.StructType(
        [
            T.StructField("scope", scope),
            T.StructField("spans", T.ArrayType(span)),
        ]
    )
    legacy_scope_spans = T.StructType(
        [
            T.StructField("instrumentationLibrary", scope),
            T.StructField("spans", T.ArrayType(span)),
        ]
    )
    resource = T.StructType([T.StructField("attributes", T.ArrayType(attr))])
    resource_spans = T.StructType(
        [
            T.StructField("resource", resource),
            T.StructField("schemaUrl", T.StringType()),
            T.StructField("scopeSpans", T.ArrayType(scope_spans)),
            T.StructField(
                "instrumentationLibrarySpans", T.ArrayType(legacy_scope_spans)
            ),
        ]
    )
    return T.StructType(
        [T.StructField("resourceSpans", T.ArrayType(resource_spans))]
    )
