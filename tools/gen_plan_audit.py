"""Generate PLANS.md — an auditable inventory of every registered
query's physical plan shape at sf0.01: exchange count, broadcast
count, parquet scans, whole-stage-codegen presence, and the pushdown
evidence (PushedFilters / PartitionFilters). Run after adding queries:

    python tools/gen_plan_audit.py

The point: SCALE.md's claims are per-operator prose; this file is the
mechanically-extracted ground truth the claims can be diffed against
(and a reviewer can grep "exchanges=0" to find the shuffle-free
queries, or spot a query whose exchange count jumped in review).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import nabatshy_spark.plans.ext_queries  # noqa: F401
import nabatshy_spark.plans.span_queries  # noqa: F401
import nabatshy_spark.plans.sql_queries  # noqa: F401
from nabatshy_spark.plans.queries import QUERIES
from nabatshy_spark.session import get_spark

OUT = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

# Queries whose construction runs driver-side work (iterative training,
# index builds) — planned like the rest, but worth flagging in the table.
ITERATIVE = {
    "kmeans_embeddings", "pagerank_trade", "dedup_components",
    "dedup_pipeline", "curate_corpus", "bpe_vocab_merges",
    "bpe_token_stats", "ann_ivf_topk", "ann_ivfpq_topk",
    "dedup_embedding_clustered", "spans_critical_path",
    "trade_reach_hops",
}


def _indent(line: str) -> int:
    m = re.search(r"[A-Za-z*]", line)
    return m.start() if m else len(line)


def _dedupe_cached(plan: str) -> str:
    """Return plan text with each cached (InMemoryRelation) subtree
    counted ONCE. The toString() of a plan re-prints a persisted
    subtree under every InMemoryTableScan that references it, which
    inflates naive operator counts by the reference count — execution
    materializes the cache exactly once. Each distinct cached block is
    kept a single time; repeats are dropped."""
    seen: set[str] = set()

    def process(lines: list[str]) -> list[str]:
        out: list[str] = []
        i = 0
        while i < len(lines):
            line = lines[i]
            if "InMemoryRelation" in line:
                d = _indent(line)
                j = i + 1
                while j < len(lines) and _indent(lines[j]) > d:
                    j += 1
                # The cached RELATION is identified by its header
                # (columns + storage level), not the full subtree text —
                # nested references inside a block make byte equality
                # unreliable. Expr ids differ per print; strip them.
                key = re.sub(r"#\d+", "#", line.lstrip(" :+-"))
                if key not in seen:
                    seen.add(key)
                    out.append(line)
                    out.extend(process(lines[i + 1 : j]))
                i = j
            else:
                out.append(line)
                i += 1
        return out

    return "\n".join(process(plan.splitlines()))


def _field_count(struct_body: str) -> int:
    """Top-level field count of a ReadSchema struct<...> body, robust
    to nested types and toString truncation ('... N more fields')."""
    n, depth = 0, 0
    more = re.search(r"\.\.\. (\d+) more fields", struct_body)
    body = struct_body.split("...")[0].rstrip(", ")
    if body:
        n = 1
        for ch in body:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "," and depth == 0:
                n += 1
    return n + (int(more.group(1)) if more else 0)


def _read_widths(plan: str) -> str:
    """Per-scan projected column counts — the column-pruning evidence
    (a 2-column projection must not read an 11-column schema). A
    trailing ``+`` marks a scan whose schema text was line-truncated
    by toString, making the count a lower bound."""
    widths = []
    for m in re.finditer(r"ReadSchema: struct<([^\n]*)", plan):
        body = m.group(1)
        truncated = not body.rstrip().endswith(">")
        n = _field_count(body.rstrip().rstrip(">"))
        widths.append(f"{n}+" if truncated else str(n))
    return "/".join(widths) if widths else "-"


def audit(plan: str, final_plan: str = "") -> dict[str, object]:
    plan = _dedupe_cached(plan)
    return {
        "read_widths": _read_widths(plan),
        "exchanges": len(re.findall(r"\bExchange hashpartitioning", plan)),
        "broadcasts": len(re.findall(r"\bBroadcastExchange", plan)),
        "scans": len(re.findall(r"\bFileScan parquet", plan)),
        # Codegen stages only appear in the FINAL AQE plan (the `*(n)`
        # markers CollapseCodegenStages adds at execution prep; the
        # initial `isFinalPlan=false` string has none).  The final plan
        # is captured after a noop-sink execution below.
        "codegen": bool(re.search(r"\*\(\d+\)", final_plan or plan)),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "partfil": bool(re.search(r"PartitionFilters: \[[^\]]", plan)),
        "nested_loop": "BroadcastNestedLoopJoin" in plan,
        "cartesian": "CartesianProduct" in plan,
    }


def main() -> None:
    spark = get_spark("plan_audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in sorted(QUERIES):
        try:
            # Each query audits in isolation: caches persisted by a
            # previous query's construction would otherwise be spliced
            # into later plans by the cache manager.
            spark.catalog.clearCache()
            df = QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            # Execute df's OWN query execution (a .write would spawn a
            # separate one and leave this plan initial) so AQE
            # finalizes and the `*(n)` codegen stages exist. Results
            # are sf0.01-sized — hundreds of rows.
            final_plan = ""
            try:
                df.collect()
                final_plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception:  # noqa: BLE001 — cg falls back to initial plan
                pass
            rows.append((name, audit(plan, final_plan)))
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            rows.append((name, {"error": str(e)[:80]}))
    with open(OUT, "w") as f:
        f.write(
            "# PLANS — physical-plan shape per registered query "
            f"(sf0.01, auto-generated by tools/gen_plan_audit.py)\n\n"
            "`ex` = hash-exchange (shuffle) count in the initial AQE plan, "
            "`bc` = broadcast exchanges, `scan` = parquet scans, "
            "`cg` = whole-stage codegen present in the final (executed) "
            "AQE plan, `pf` = non-empty "
            "PushedFilters, `part` = non-empty PartitionFilters, "
            "`it` = driver-coordinated iterative/index construction "
            "(plan shown is the final job's), `readcols` = per-scan "
            "projected column counts (pruning evidence).\n"
            "Persisted subtrees are counted ONCE (toString re-prints a "
            "cached subtree per InMemoryTableScan reference; execution "
            "materializes it once).\n"
            "BroadcastNestedLoopJoin appears only for deliberate 1-row "
            "joins (grand totals); a `CART` flag would be a bug.\n\n"
            "| query | ex | bc | scan | readcols | cg | pf | part | flags |\n"
            "|---|---|---|---|---|---|---|---|---|\n"
        )
        for name, a in rows:
            if "error" in a:
                f.write(f"| `{name}` | — | — | — | — | — | — | — | ERROR: {a['error']} |\n")
                continue
            flags = []
            if name in ITERATIVE:
                flags.append("it")
            if a["nested_loop"]:
                flags.append("bnlj-1row")
            if a["cartesian"]:
                flags.append("CART")
            f.write(
                f"| `{name}` | {a['exchanges']} | {a['broadcasts']} | {a['scans']} | "
                f"{a['read_widths']} | "
                f"{'y' if a['codegen'] else '-'} | {'y' if a['pushed'] else '-'} | "
                f"{'y' if a['partfil'] else '-'} | {', '.join(flags) or '-'} |\n"
            )
    n_err = sum(1 for _, a in rows if "error" in a)
    print(f"wrote {OUT}: {len(rows)} queries, {n_err} errors")


if __name__ == "__main__":
    main()
