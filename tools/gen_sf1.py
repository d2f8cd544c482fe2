"""Generate a LOCAL sf1 decade (default /tmp/sf1 — deliberately outside
git and outside /root/testdata, which is read-only) so scale curves
span three decades (sf0.01 → 0.1 → 1) instead of two ending at 600k
rows (VERDICT r8 task #3). A superlinear plan term the 100× span hides
shows up in the extra decade — the posting join's Σ min(df,cap)² is
the one this exists to watch.

Construction (deterministic, seed-pinned):

- region/nation: copied verbatim (fixed dimensions — TPC-H semantics).
- customer/supplier/part/orders/lineitem/events: 10 FK-CONSISTENT
  key-shifted copies of sf0.1 (copy i shifts every key by i·max_key),
  with a tiny per-copy jitter on price/value columns so exact-tie
  artifacts don't distort top-k/threshold queries. Group-by key
  cardinalities scale 10× — the same direction TPC-H scaling moves
  them — while per-key fan-ins stay constant. ONE documented
  exception: queries joining events to orders via the HARDCODED
  ``e.user_id = o_custkey % 150`` (asof_join_orders family) keep a
  constant matching-key set under ANY user-domain scaling (the mod
  base is pinned in the query), so for that relation per-key order
  fan-in grows 10× and join output grows 10× — which is also exactly
  what a true sf1 with a 10× user domain produces; the shifted
  user_id reproduces that shape, it does not distort it.
- documents: generated fresh (NOT copied — replicating text 10× would
  make every doc a cross-copy exact duplicate and blow up the pair
  relation by construction). Vocabulary, language mix, source mix and
  length distribution are sampled from the sf0.1 empirical
  distributions; ~1% exact duplicates and ~2.5% near-duplicate clones
  (10% word replacement → 3-gram Jaccard ≈ 0.55) are planted so the
  dedup stack sees the same structure at 10× the rows.
- embeddings: 10 unit-norm gaussian clusters in dim 64 (the fixture's
  shape), 20k rows.

Usage: python tools/gen_sf1.py [outdir]        (~1 min)
Then:  SPARK_GRAFT_EXTRA_SF_DIRS=/tmp/sf1 python tools/gen_scale_curve.py q...
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def _rel(con: duckdb.DuckDBPyConnection, out: str) -> None:
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet'"
        )
    shifts = {
        "customer": ("c_custkey",),
        "supplier": ("s_suppkey",),
        "part": ("p_partkey",),
        "orders": ("o_orderkey", "o_custkey"),
        "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
        "events": ("event_id", "user_id"),
    }
    jitter = {
        "customer": "c_acctbal",
        "supplier": "s_acctbal",
        "part": "p_retailprice",
        "orders": "o_totalprice",
        "lineitem": "l_extendedprice",
        "events": "value",
    }
    # every FK shifts by the max of ITS referenced dimension, so copy
    # i's orders point at copy i's customers, etc.
    key_base = {}
    for t, keys in shifts.items():
        for k in keys:
            dim = {
                "c_custkey": "customer", "o_custkey": "customer",
                "s_suppkey": "supplier", "l_suppkey": "supplier",
                "p_partkey": "part", "l_partkey": "part",
                "o_orderkey": "orders", "l_orderkey": "orders",
                "event_id": "events", "user_id": "events",
            }[k]
            col = {"customer": "c_custkey", "supplier": "s_suppkey",
                   "part": "p_partkey", "orders": "o_orderkey",
                   "events": "event_id" if k == "event_id" else "user_id"}[dim]
            key_base[k] = con.execute(
                f"SELECT max({col}) + 1 FROM '{SRC}/{dim}.parquet'"
            ).fetchone()[0]
    for t, keys in shifts.items():
        copies = []
        for i in range(10):
            repl = ", ".join(
                f"{k} + {i * key_base[k]} AS {k}" for k in keys
            )
            jc = jitter[t]
            repl += f", round({jc} + {i} * 0.000001, 6) AS {jc}"
            copies.append(
                f"SELECT * REPLACE ({repl}) FROM '{SRC}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(copies)}) TO '{out}/{t}.parquet'"
        )


def _documents(con: duckdb.DuckDBPyConnection, out: str, n_docs: int = 50_000) -> None:
    rows = con.execute(
        f"SELECT text, lang, source FROM '{SRC}/documents.parquet'"
    ).fetchall()
    vocab: dict[str, int] = {}
    lengths = []
    langs = [r[1] for r in rows]
    # Sample ACTUAL source names from the sf0.1 empirical distribution
    # (same as lang) — fabricated src{i} labels would change the source
    # domain at the third decade and weaken every source-keyed query's
    # scale-curve comparability (ADVICE r9).
    sources = [r[2] for r in rows]
    for text, _l, _s in rows:
        words = text.split(" ")
        lengths.append(len(words))
        for w in words:
            vocab[w] = vocab.get(w, 0) + 1
    words, weights = zip(*sorted(vocab.items()))
    docs = []
    for doc_id in range(n_docs):
        rng = random.Random(10_000_000 + doc_id)
        if doc_id >= 40 and rng.random() < 0.01:  # exact duplicate
            base = docs[rng.randrange(doc_id - 40, doc_id)]
            text = base[1]
        elif doc_id >= 40 and rng.random() < 0.025:  # near-dup clone
            base = docs[rng.randrange(doc_id - 40, doc_id)]
            ws = base[1].split(" ")
            ws = [
                (rng.choices(words, weights)[0] if rng.random() < 0.10 else w)
                for w in ws
            ]
            text = " ".join(ws)
        else:
            n = rng.choice(lengths)
            text = " ".join(rng.choices(words, weights, k=n))
        docs.append(
            (
                doc_id,
                text,
                rng.choice(langs),
                rng.choice(sources),
                len(text),
            )
        )
    con.execute(
        "CREATE OR REPLACE TABLE _docs (doc_id BIGINT, text VARCHAR,"
        " lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO _docs VALUES (?, ?, ?, ?, ?)", docs)
    con.execute(f"COPY _docs TO '{out}/documents.parquet'")


def _embeddings(con: duckdb.DuckDBPyConnection, out: str, n: int = 20_000) -> None:
    import numpy as np

    rs = np.random.RandomState(42)
    centers = rs.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rs.randint(0, 10, size=n)
    vecs = centers[labels] + 0.35 * rs.normal(size=(n, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    con.execute(
        "CREATE OR REPLACE TABLE _emb (vec_id BIGINT, embedding FLOAT[],"
        " label INTEGER)"
    )
    con.executemany(
        "INSERT INTO _emb VALUES (?, ?, ?)",
        [
            (i, [float(x) for x in vecs[i]], int(labels[i]))
            for i in range(n)
        ],
    )
    con.execute(f"COPY _emb TO '{out}/embeddings.parquet'")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    _rel(con, out)
    _documents(con, out)
    _embeddings(con, out)
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        print(t, con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0])


if __name__ == "__main__":
    main()
