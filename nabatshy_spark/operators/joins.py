"""Join operators Spark lacks natively (SURVEY §2.3 notes the
reference has none of these either — extension surface): as-of join
via the union + last-value-window technique.

The naive as-of is a range join (cross product per key, then filter
and rank); this implementation is the scalable form: union both sides
tagged, sort within key partitions by (time, side), and carry the
build side's payload forward with ``last(ignorenulls)``. One shuffle
on the key, no cross product; skew on a hot key is handled like any
window over a key (AQE / salting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: Column,
    right_key: Column,
    left_ts: Column,
    right_ts: Column,
    payload: dict[str, Column],
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with ``right_ts <= left_ts`` and matching key — the semantics of
    DuckDB/kdb ``ASOF JOIN`` / pandas ``merge_asof`` (inclusive,
    inner: left rows with no prior right row are dropped).

    ``payload`` maps output column name → right-side Column. All
    payload fields ride in one struct, so they always come from the
    same matched row. When several right rows tie on the boundary
    timestamp, which of them is carried is unspecified — project
    value-determined columns (e.g. the timestamp itself) if ties are
    possible and determinism matters.
    """
    pay = F.struct(*[payload[n].alias(n) for n in payload])
    l = left.select(
        left_key.alias("__k"),
        left_ts.alias("__t"),
        F.lit(1).alias("__side"),  # probe rows sort after build rows at equal ts
        F.struct(*left.columns).alias("__l"),
        F.lit(None).alias("__p"),
    )
    r = right.select(
        right_key.alias("__k"),
        right_ts.alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).alias("__l"),
        pay.alias("__p"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l.unionByName(r, allowMissingColumns=False).select(
        "__side",
        "__l",
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    matched = carried.filter((F.col("__side") == 1) & F.col("__p").isNotNull())
    return matched.select(F.col("__l.*"), F.col("__p.*"))
