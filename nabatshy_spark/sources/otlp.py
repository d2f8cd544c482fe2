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

from nabatshy_spark.functions.exprs import go_float_string
from nabatshy_spark.schema import otlp_request_schema

_ANYVALUE_DEPTH = 2  # matches schema.otlp_anyvalue_schema() nesting


def _extract_single(e: Column) -> Column:
    """Scalar-only AnyValue → string, mirroring extractSingleValue
    (collector/service.go:240-258): nested array/kvlist (and absent)
    values yield '' so the caller drops them."""
    return (
        F.when(e.isNull(), F.lit(""))
        .when(e["stringValue"].isNotNull(), e["stringValue"])
        .when(e["intValue"].isNotNull(), e["intValue"])
        .when(e["doubleValue"].isNotNull(), go_float_string(e["doubleValue"]))
        .when(e["boolValue"].isNotNull(), e["boolValue"].cast("string"))
        .when(e["bytesValue"].isNotNull(), e["bytesValue"])
        .otherwise(F.lit(""))
    )


def normalize_anyvalue(v: Column, depth: int = _ANYVALUE_DEPTH) -> Column:
    """OTLP AnyValue → String, replicating the reference's rules
    (collector/service.go:184-237) exactly:

    - string as-is; int → decimal string; double → Go ``'f'`` shortest
      form (1.0 → "1"); bool → true/false;
    - bytes → base64 (OTLP JSON already carries base64 — kept verbatim);
    - array → per-element *stringified* values with empty extractions
      dropped (:199-206); all-strings arrays comma-joined (:210), mixed
      arrays JSON-marshaled as the extracted strings ``["1","2"]``
      (:212-214), empty extraction ⇒ the attribute is NOT set;
    - kvlist → recursive flatten to {key: stringified} with
      lexicographically sorted keys, matching Go ``json.Marshal`` of the
      map (:222-228);
    - absent/unknown value ⇒ NULL, and ``attrs_to_map`` drops the key
      (reference sets no map entry).

    Recursion is Python-side composition bounded by the schema's
    nesting depth, so everything stays a single codegen'd CASE tree.
    Divergence note: Go ``json.Marshal`` escapes ``& < >`` as ``\\u0026``
    etc. inside kvlist/array JSON; Spark ``to_json`` does not.
    """
    out = (
        F.when(v.isNull(), F.lit(None).cast("string"))
        .when(v["stringValue"].isNotNull(), v["stringValue"])
        .when(v["intValue"].isNotNull(), v["intValue"])
        .when(v["doubleValue"].isNotNull(), go_float_string(v["doubleValue"]))
        .when(v["boolValue"].isNotNull(), v["boolValue"].cast("string"))
        .when(v["bytesValue"].isNotNull(), v["bytesValue"])
    )
    if depth > 0:
        arr = v["arrayValue"]["values"]
        vals = F.filter(
            F.transform(arr, _extract_single), lambda x: x != F.lit("")
        )
        # isSimpleStringArray checks the raw elements (nil ⇒ skipped)
        all_strings = F.forall(
            arr, lambda e: e.isNull() | e["stringValue"].isNotNull()
        )
        kv = v["kvlistValue"]["values"]
        out = (
            out.when(
                arr.isNotNull() & (F.size(vals) > 0) & all_strings,
                F.array_join(vals, ","),
            )
            .when(arr.isNotNull() & (F.size(vals) > 0), F.to_json(vals))
            .when(arr.isNotNull(), F.lit(None).cast("string"))  # nothing extracted → key unset
            .when(kv.isNotNull(), F.to_json(_kvlist_to_map(kv, depth - 1)))
        )
    return out.otherwise(F.lit(None).cast("string"))


def _kvlist_to_map(kv: Column, depth: int) -> Column:
    """kvlist entries → Map<String,String> with entries sorted by key so
    ``to_json`` matches Go's sorted-key map marshal; entries whose value
    normalizes to NULL are dropped (extractAttributes sets no key)."""
    entries = F.transform(
        kv,
        lambda a: F.struct(
            a["key"].alias("key"),
            normalize_anyvalue(a["value"], depth).alias("value"),
        ),
    )
    kept = F.filter(entries, lambda s: s["value"].isNotNull())
    return F.map_from_entries(F.array_sort(kept))


def attrs_to_map(attrs: Column, depth: int = _ANYVALUE_DEPTH) -> Column:
    """[{key, value:AnyValue}] → Map<String,String> (S5). Keys whose
    value normalizes to NULL (absent value / empty array extraction) are
    omitted, matching extractAttributes (collector/service.go:184-237)."""
    entries = F.transform(
        attrs,
        lambda a: F.struct(
            a["key"].alias("key"),
            normalize_anyvalue(a["value"], depth).alias("value"),
        ),
    )
    kept = F.filter(entries, lambda s: s["value"].isNotNull())
    return F.when(attrs.isNotNull(), F.map_from_entries(kept)).otherwise(
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
