"""OTLP trace ingest, Spark-first (SURVEY §2.1 S1–S6, §3.1).

The reference's write path (collector/controller.go:28-95 dispatch,
collector/service.go:100-182 triple nested loop,
collector/service.go:184-237 AnyValue stringification) becomes a pure
DataFrame transform:

    raw JSON → from_json(OTLP schema) → explode(resourceSpans)
             → explode(scopeSpans | legacy instrumentationLibrarySpans)
             → explode(spans) → wide span rows

Everything is column expressions — the "triple nested loop" is three
`explode`s with parent fields carried along by Catalyst, and the
AnyValue normalization is a CASE expression, so ingest runs at scan
speed with whole-stage codegen, batch or streaming alike.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nabatshy_spark.schema import otlp_request_schema


def normalize_anyvalue(v: Column) -> Column:
    """OTLP AnyValue → String, replicating the reference's rules
    (collector/service.go:184-237):

    - string as-is; int/double/bool → decimal/bool literal string;
    - bytes → base64 (OTLP JSON already carries base64 — kept verbatim);
    - array of simple strings → comma join (collector/service.go:210);
      other arrays → JSON;
    - kvlist → JSON object (collector/service.go:222).
    """
    arr = v["arrayValue"]["values"]
    all_strings = F.forall(arr, lambda e: e["stringValue"].isNotNull())
    return (
        F.when(v["stringValue"].isNotNull(), v["stringValue"])
        .when(v["intValue"].isNotNull(), v["intValue"])
        .when(v["doubleValue"].isNotNull(), v["doubleValue"].cast("string"))
        .when(v["boolValue"].isNotNull(), v["boolValue"].cast("string"))
        .when(v["bytesValue"].isNotNull(), v["bytesValue"])
        .when(
            arr.isNotNull() & all_strings,
            F.array_join(F.transform(arr, lambda e: e["stringValue"]), ","),
        )
        .when(arr.isNotNull(), F.to_json(arr))
        .when(
            v["kvlistValue"]["values"].isNotNull(), F.to_json(v["kvlistValue"]["values"])
        )
        .otherwise(F.lit(""))
    )


def attrs_to_map(attrs: Column) -> Column:
    """[{key, value:AnyValue}] → Map<String,String> (S5)."""
    entries = F.transform(
        attrs, lambda a: F.struct(a["key"].alias("key"), normalize_anyvalue(a["value"]).alias("value"))
    )
    return F.when(attrs.isNotNull(), F.map_from_entries(entries)).otherwise(
        F.map_from_entries(F.array().cast("array<struct<key:string,value:string>>"))
    )


def _sorted_keys(m: Column) -> Column:
    return F.array_sort(F.map_keys(m))


def parse_otlp_json(df: DataFrame, json_col: str = "value") -> DataFrame:
    """Raw OTLP JSON documents → denormalized wide span rows
    (S3 decode + S4 legacy rewrite + S5 normalize + S6 denormalize).

    Legacy payloads (``instrumentationLibrarySpans``,
    collector/controller.go:97-223) are rewritten in-plan: scope comes
    from ``instrumentationLibrary`` and span attributes are merged into
    the resource attributes, matching formatOldOTELData's behavior.
    """
    req = df.select(
        F.from_json(F.col(json_col), otlp_request_schema()).alias("req")
    )
    rs = req.select(F.explode("req.resourceSpans").alias("rs"))
    # unify current + legacy scope-span shapes (S4)
    scoped = rs.select(
        F.col("rs.resource.attributes").alias("res_attrs"),
        F.col("rs.schemaUrl").alias("resource_schema_url"),
        F.coalesce(
            F.col("rs.scopeSpans"),
            F.transform(
                "rs.instrumentationLibrarySpans",
                lambda ils: F.struct(
                    ils["instrumentationLibrary"].alias("scope"),
                    ils["spans"].alias("spans"),
                ),
            ),
        ).alias("scope_spans"),
        F.col("rs.scopeSpans").isNull().alias("__legacy"),
    ).select(
        "res_attrs", "resource_schema_url", "__legacy", F.explode("scope_spans").alias("ss")
    )
    spans = scoped.select(
        "res_attrs",
        "resource_schema_url",
        "__legacy",
        F.col("ss.scope.name").alias("scope_name"),
        F.explode("ss.spans").alias("sp"),
    )
    span_attrs = attrs_to_map(F.col("sp.attributes"))
    res_attrs = attrs_to_map(F.col("res_attrs"))
    # legacy: span attrs merged into resource attrs (collector/controller.go:150-180)
    res_attrs = F.when(
        F.col("__legacy"), F.map_concat(res_attrs, span_attrs)
    ).otherwise(res_attrs)
    events = F.coalesce(
        F.transform(
            "sp.events",
            lambda e: F.struct(
                e["timeUnixNano"].cast("long").alias("time_unix_nano"),
                e["name"].alias("name"),
                attrs_to_map(e["attributes"]).alias("attributes"),
            ),
        ),
        F.array().cast(
            "array<struct<time_unix_nano:bigint,name:string,attributes:map<string,string>>>"
        ),
    )
    start = F.col("sp.startTimeUnixNano").cast("long")
    end = F.col("sp.endTimeUnixNano").cast("long")
    out = spans.select(
        F.col("sp.traceId").alias("trace_id"),
        F.col("sp.spanId").alias("span_id"),
        F.coalesce(F.col("sp.parentSpanId"), F.lit("")).alias("parent_span_id"),
        F.coalesce(F.col("sp.flags").cast("int"), F.lit(0)).alias("flags"),
        F.col("sp.name").alias("name"),
        start.alias("start_time_unix_nano"),
        end.alias("end_time_unix_nano"),
        (end - start).alias("duration_ns"),  # materialized (db/clickhouse.go:94)
        F.col("scope_name"),
        F.coalesce(F.col("resource_schema_url"), F.lit("")).alias("resource_schema_url"),
        res_attrs.alias("resource_attributes"),
        span_attrs.alias("span_attributes"),
        events.alias("events"),
    )
    # materialize the parallel-array layout (sorted keys) alongside the maps
    return out.select(
        "*",
        _sorted_keys(F.col("resource_attributes")).alias("ra_keys"),
        F.transform(
            _sorted_keys(F.col("resource_attributes")),
            lambda k: F.element_at(F.col("resource_attributes"), k),
        ).alias("ra_values"),
        _sorted_keys(F.col("span_attributes")).alias("sa_keys"),
        F.transform(
            _sorted_keys(F.col("span_attributes")),
            lambda k: F.element_at(F.col("span_attributes"), k),
        ).alias("sa_values"),
    )


def parse_otlp_json_with_dead_letter(
    df: DataFrame, json_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Like ``parse_otlp_json`` but splits out undecodable documents.

    The reference panics the handler on decode errors
    (collector/controller.go:83) — no retry, no dead letter. Here the
    bad documents (``from_json`` → null, or no resourceSpans) are
    returned as a second DataFrame with the raw payload, for replay or
    inspection, while the good path proceeds unchanged.
    """
    tagged = df.select(
        F.col(json_col).alias("__raw"),
        F.from_json(F.col(json_col), otlp_request_schema()).alias("__req"),
    )
    bad = tagged.filter(
        F.col("__req").isNull() | F.col("__req.resourceSpans").isNull()
    ).select(F.col("__raw").alias("raw_payload"))
    good = tagged.filter(
        F.col("__req").isNotNull() & F.col("__req.resourceSpans").isNotNull()
    ).select(F.col("__raw").alias(json_col))
    return parse_otlp_json(good, json_col), bad
