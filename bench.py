"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed to completion (collect) after a warm-up of the
session; timings are wall-clock per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nabatshy_spark.plans.queries import QUERIES
from nabatshy_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "endpoint_stats",
    "service_dependency",
    "combined_metrics",
    "region_nation_rollup",
    "trace_rollup",
    "dynamic_buckets",
    "search_page",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("nabatshy_bench")

    # Warm up the JVM / parquet footer caches with a trivial action.
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
