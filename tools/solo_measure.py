"""Solo per-query measurement + plan capture (round-11 optimization).

Usage:
    python tools/solo_measure.py [--sf-dir DIR] [--out JSON] [--plans DIR]
        [--runs N] [--noop] query [query ...]

Fresh session (same settings as bench.py), footers warmed, then per
query: one unmeasured warm run (compile/codegen/artifact build), then
min-of-N timed runs with clearCache+gc before each (the bench solo
adjudication protocol). With --noop each timed run drives the noop sink
instead of .collect() — guide §1.4: computation cost without driver row
materialization — and BOTH numbers are reported so collect-transfer
overhead is visible. With --plans, .explain("formatted") is written to
<plans>/<query>.txt.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nabatshy_spark.plans.ext_queries  # noqa: F401
import nabatshy_spark.plans.span_queries  # noqa: F401
import nabatshy_spark.plans.sql_queries  # noqa: F401
from nabatshy_spark.catalog import TABLES, load
from nabatshy_spark.plans.queries import QUERIES
from nabatshy_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--noop", action="store_true", help="also time the noop sink")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    # Match bench.py's scaled span fixture so spans_* queries measure
    # the same table the bench times.
    import tempfile

    from tools.gen_spans_fixture import write_scaled

    sf = os.path.basename(args.sf_dir.rstrip("/")).replace("sf", "")
    sf_num = float(sf) if sf.replace(".", "").isdigit() else 0.1
    n_traces = max(250, int(1_500_000 * sf_num))
    spath = os.path.join(tempfile.gettempdir(), f"nabatshy_spans_{n_traces}tr")
    os.environ["NABATSHY_SPANS_PATH"] = write_scaled(spath, n_traces)

    spark = get_spark("nabatshy_solo_measure")
    for t in TABLES:
        load(spark, args.sf_dir, t).count()

    results: dict[str, dict] = {}
    for name in args.queries:
        if name not in QUERIES:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"solo:{name}")
        df = QUERIES[name](spark, args.sf_dir)
        df.collect()  # warm: compile/codegen/artifact build
        rec: dict = {}
        best = float("inf")
        for _ in range(args.runs):
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        rec["collect_s"] = round(best, 4)
        if args.noop:
            best = float("inf")
            for _ in range(args.runs):
                spark.catalog.clearCache()
                gc.collect()
                t0 = time.perf_counter()
                (
                    QUERIES[name](spark, args.sf_dir)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                best = min(best, time.perf_counter() - t0)
            rec["noop_s"] = round(best, 4)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            # The same JVM call DataFrame.explain() prints through.
            plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                QUERIES[name](spark, args.sf_dir)._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        results[name] = rec
        print(name, json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
