"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``nabatshy_spark``; this module only adapts it
to the driver's entry-point shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

import nabatshy_spark.plans.ext_queries  # noqa: F401  (registers extension queries)
import nabatshy_spark.plans.span_queries  # noqa: F401  (registers span-native queries)
import nabatshy_spark.plans.sql_queries  # noqa: F401
from nabatshy_spark.plans.oracles import ORACLES
from nabatshy_spark.plans.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-endpoint latency
    stats (count/avg/min/max/exact-percentiles, SURVEY §2.4 A1-A3/A7/A8;
    reference api/service.go:315-363)."""
    return QUERIES["endpoint_stats"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """Matching DuckDB SQL per query key (omitted keys → rows-only check)."""
    return dict(ORACLES)
