"""Deterministic span-table fixture generator (FIXTURES.md §1).

Writes a single parquet file shaped like the reference's
``denormalized_span`` table (db/clickhouse.go:86-109) with both the
map and the parallel-array attribute layouts, trace tree structure,
cross-service parent/child edges, exception events, and crafted rows
exercising the P7 independent-arrays negation semantics
(api/service.go:753-771) — e.g. spans where the value 'postgres'
appears under a *different* key than 'db.system'.

Seed-fixed (7); regenerating produces byte-identical content. Run:
    python tools/gen_spans_fixture.py
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "spans.parquet")

BASE_NS = 1_706_745_600_000_000_000  # 2024-02-01 00:00:00 UTC
SERVICES = ["svc-auth", "svc-api", "svc-db", "svc-cache", "svc-worker"]
ENDPOINTS = [
    f"{m} /api/v{v}/{r}"
    for m in ("GET", "POST")
    for v in (1, 2)
    for r in ("users", "orders", "items", "carts", "search")
]


def build_rows(n_traces: int = 250, seed: int = 7, trace_offset: int = 0):
    """Span rows for ``n_traces`` traces. ``trace_offset`` shifts trace
    and span id ranges so independently-generated chunks never collide
    (each trace has ≤ 8 spans)."""
    rng = random.Random(seed)
    rows = []
    span_no = trace_offset * 8
    for t in range(trace_offset, trace_offset + n_traces):
        trace_id = f"tr{t:04d}"
        n_spans = rng.randint(1, 8)
        trace_span_ids: list[str] = []
        trace_start = BASE_NS + rng.randrange(0, 3 * 3600) * 1_000_000_000
        for i in range(n_spans):
            span_id = f"sp{span_no:05d}"
            span_no += 1
            parent = "" if i == 0 else rng.choice(trace_span_ids)
            service = rng.choice(SERVICES)
            start = trace_start + i * rng.randrange(1_000_000, 50_000_000)
            # heavy-tailed durations so quantiles differ from avg
            dur = int(rng.lognormvariate(16, 1.5)) + 100_000
            sa = {"http.status": str(rng.choice([200, 200, 200, 404, 500]))}
            roll = rng.random()
            if roll < 0.3:
                sa["db.system"] = rng.choice(["postgres", "mysql"])
                sa["db.statement"] = "SELECT * FROM t WHERE id = ?"
                if sa["db.system"] == "mysql" and rng.random() < 0.4:
                    # P7 discriminating case: db.system=mysql BUT the
                    # value 'postgres' appears under ANOTHER key — the
                    # reference's independent-arrays negation
                    # (api/service.go:753-771) REJECTS this row for
                    # `db.system != postgres`, map-pair semantics would
                    # keep it.
                    sa["cache.backend"] = "postgres"
            elif roll < 0.45:
                # 'postgres' under a different key, no db.system at all
                # (key-absent branch keeps these)
                sa["cache.backend"] = "postgres"
            events = []
            if rng.random() < 0.10:
                events.append(
                    {
                        "time_unix_nano": start + dur // 2,
                        "name": "exception",
                        "attributes": {
                            "exception.type": rng.choice(["IOError", "Timeout"]),
                            "exception.message": "boom",
                        },
                    }
                )
            if rng.random() < 0.2:
                events.append(
                    {
                        "time_unix_nano": start + dur // 3,
                        "name": "log",
                        "attributes": {"level": "info"},
                    }
                )
            ra = {
                "service.name": service,
                "env": rng.choice(["prod", "prod", "dev"]),
                "region": rng.choice(["us-east", "eu-west"]),
            }
            rows.append(
                {
                    "trace_id": trace_id,
                    "span_id": span_id,
                    "parent_span_id": parent,
                    "flags": rng.choice([0, 1]),
                    "name": rng.choice(ENDPOINTS),
                    "start_time_unix_nano": start,
                    "end_time_unix_nano": start + dur,
                    "duration_ns": dur,
                    "scope_name": service,
                    "resource_schema_url": "https://opentelemetry.io/schemas/1.21.0",
                    "resource_attributes": ra,
                    "span_attributes": sa,
                    "ra_keys": sorted(ra),
                    "ra_values": [ra[k] for k in sorted(ra)],
                    "sa_keys": sorted(sa),
                    "sa_values": [sa[k] for k in sorted(sa)],
                    "events": events,
                }
            )
            trace_span_ids.append(span_id)
    return rows


def rows_to_table(rows) -> pa.Table:
    attr_map = pa.map_(pa.string(), pa.string())
    schema = pa.schema(
        [
            ("trace_id", pa.string()),
            ("span_id", pa.string()),
            ("parent_span_id", pa.string()),
            ("flags", pa.int32()),
            ("name", pa.string()),
            ("start_time_unix_nano", pa.int64()),
            ("end_time_unix_nano", pa.int64()),
            ("duration_ns", pa.int64()),
            ("scope_name", pa.string()),
            ("resource_schema_url", pa.string()),
            ("resource_attributes", attr_map),
            ("span_attributes", attr_map),
            ("ra_keys", pa.list_(pa.string())),
            ("ra_values", pa.list_(pa.string())),
            ("sa_keys", pa.list_(pa.string())),
            ("sa_values", pa.list_(pa.string())),
            (
                "events",
                pa.list_(
                    pa.struct(
                        [
                            ("time_unix_nano", pa.int64()),
                            ("name", pa.string()),
                            ("attributes", attr_map),
                        ]
                    )
                ),
            ),
        ]
    )
    cols = {
        name: [
            list(r[name].items()) if isinstance(r[name], dict) else r[name]
            for r in rows
        ]
        for name in schema.names
    }
    # events carry a nested map each
    cols["events"] = [
        [
            {**e, "attributes": list(e["attributes"].items())}
            for e in r["events"]
        ]
        for r in rows
    ]
    return pa.table(cols, schema=schema)


def main() -> None:
    rows = build_rows()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(rows_to_table(rows), OUT, compression="snappy")
    print(f"wrote {len(rows)} spans to {OUT}")


def write_scaled(
    path: str, n_traces: int, seed: int = 7, chunks: int = 16
) -> str:
    """Scaled span table for benchmarks: ``chunks`` parquet files under
    ``path`` (a single file would serialize the whole scan on one task
    — the committed 1,101-row fixture is for semantics, this is for
    parallelism). Deterministic for a given (n_traces, seed); chunk i
    generates its own trace-id range so files are independent. Writes
    to a staging dir and renames, so a partial build is never read."""
    import shutil

    if os.path.isdir(path):
        return path
    staging = f"{path}.staging-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    per = (n_traces + chunks - 1) // chunks
    off = 0
    for i in range(chunks):
        n = min(per, n_traces - off)
        if n <= 0:
            break
        rows = build_rows(n, seed=seed + i, trace_offset=off)
        pq.write_table(
            rows_to_table(rows),
            os.path.join(staging, f"part-{i:03d}.parquet"),
            compression="snappy",
        )
        off += n
    try:
        os.rename(staging, path)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
    return path


if __name__ == "__main__":
    main()
