"""SparkSession factory.

Local test profile runs on ``local[N]`` (one JVM); the same builder
settings are what we'd ship on a 1000-executor cluster: AQE on (runtime
partition coalescing, auto-broadcast, skew-join splitting), UTC session
timezone (oracle parity with DuckDB's naive-UTC timestamps), Arrow for any
Pandas-UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "nabatshy_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the session.

    ``spark.sql.shuffle.partitions`` is sized to the local core count; at
    cluster scale AQE's coalescePartitions makes the static number mostly
    irrelevant (it only caps the initial shuffle fan-out).
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
