"""Normalized star schema (SURVEY §2.1 S8, §2.3 J3) — the reference's
dormant second data model (DDL in comments db/clickhouse.go:35-83,
insert helpers collector/controller.go:229-301, read helper
api/service.go:1300-1327 `baseSpanDS`). Nothing on the reference's live
path uses it; provided here for parity completeness and as the
bucketed-join showcase.

Wide span rows → four tables:
    resource(resource_id, schema_url)  + resource_attributes(resource_id, key, value)
    scope(scope_id, name)
    span(span_id, trace_id, parent_span_id, name, start/end ns,
         duration_ns, scope_id, resource_id)
    event(span_id, time_unix_nano, name)

IDs are deterministic (sha of the content) rather than the DDL's
generateUUIDv4 (db/clickhouse.go:37,53) so re-normalizing is
idempotent and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _resource_id() -> F.Column:
    return F.sha2(
        F.concat_ws(
            "|", F.col("resource_schema_url"), F.to_json(F.col("resource_attributes"))
        ),
        256,
    )


def _scope_id() -> F.Column:
    return F.sha2(F.col("scope_name"), 256)


def normalize(wide: DataFrame) -> dict[str, DataFrame]:
    """Split the denormalized span table into the star schema."""
    with_ids = wide.withColumn("resource_id", _resource_id()).withColumn(
        "scope_id", _scope_id()
    )
    resource = (
        with_ids.select(
            "resource_id", F.col("resource_schema_url").alias("schema_url")
        )
        .distinct()
    )
    resource_attributes = (
        with_ids.select(
            "resource_id", F.explode("resource_attributes").alias("key", "value")
        )
        .distinct()
    )
    scope = with_ids.select("scope_id", F.col("scope_name").alias("name")).distinct()
    span = with_ids.select(
        "span_id",
        "trace_id",
        "parent_span_id",
        "flags",
        "name",
        "start_time_unix_nano",
        "end_time_unix_nano",
        "duration_ns",
        "scope_id",
        "resource_id",
    )
    event = with_ids.select(
        "span_id", F.explode("events").alias("__e")
    ).select(
        "span_id",
        F.col("__e.time_unix_nano").alias("time_unix_nano"),
        F.col("__e.name").alias("name"),
    )
    return {
        "resource": resource,
        "resource_attributes": resource_attributes,
        "scope": scope,
        "span": span,
        "event": event,
    }


def base_span_ds(tables: dict[str, DataFrame]) -> DataFrame:
    """J3: the reference's 3-way normalized join
    (api/service.go:1300-1327): span ⋈ scope ⋈ resource_attributes
    filtered to service.name — reconstructing (span, service) rows.

    scope and the attribute slice are tiny → broadcast; the fact table
    never shuffles. At 100 TB, bucketBy(span.scope_id) on write would
    co-locate repeats of this join with zero shuffle even if scope
    outgrew broadcast range.
    """
    span, scope, ra = tables["span"], tables["scope"], tables["resource_attributes"]
    svc = ra.filter(F.col("key") == "service.name").select(
        "resource_id", F.col("value").alias("service_name")
    )
    scope_named = scope.withColumnRenamed("name", "scope_service")
    return (
        span.join(F.broadcast(scope_named), "scope_id")
        .join(F.broadcast(svc), "resource_id")
        .select(
            "span_id",
            "trace_id",
            F.col("name").alias("span_name"),
            "duration_ns",
            "scope_service",
            "service_name",
        )
    )
