"""Property tests for round-7 operators against pure-Python references:
bipartite core pruning vs a dict-based peel, weighted percentiles vs a
cumulative-weight reference, priority sampling's estimator contract on
random weights, and dHash brightness invariance on random patterns."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

bip_edges = st.lists(
    st.tuples(st.integers(0, 8), st.integers(100, 108)),
    min_size=1,
    max_size=40,
    unique=True,
)


def _peel(edges, k, rounds):
    cur = set(edges)
    out = []
    for _ in range(rounds):
        from collections import Counter

        ld = Counter(a for a, _ in cur)
        rd = Counter(b for _, b in cur)
        cur = {(a, b) for a, b in cur if ld[a] >= k and rd[b] >= k}
        out.append(
            (
                len({a for a, _ in cur}),
                len({b for _, b in cur}),
                len(cur),
            )
        )
    return out


@SLOW
@given(bip_edges, st.integers(1, 4))
def test_bipartite_core_prune_matches_reference(spark, edges, k):
    from nabatshy_spark.operators.graph import bipartite_core_prune

    df = spark.createDataFrame(edges, ["l", "r"])
    got = [
        (r.n_left, r.n_right, r.n_edges)
        for r in bipartite_core_prune(df, "l", "r", k=k, rounds=3)
        .orderBy("round")
        .collect()
    ]
    assert got == _peel(edges, k, 3)


weights = st.lists(
    st.integers(1, 1000), min_size=1, max_size=30, unique=True
)


@SLOW
@given(weights)
def test_weighted_percentile_matches_reference(spark, ws):
    """min price whose cumulative weight reaches p·total, against a
    sorted-scan reference (weight == value so ties are impossible)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(float(v), float(v)) for v in ws]
    df = spark.createDataFrame(rows, ["price", "w"])
    lv = df.groupBy("price").agg(F.sum("w").alias("w"))
    w = Window.orderBy("price")
    cum = lv.withColumn(
        "cum", F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("w").over(Window.partitionBy()))
    got = cum.agg(
        *[
            F.min(
                F.when(F.col("cum") >= F.lit(p) * F.col("tot"), F.col("price"))
            ).alias(f"p{int(p*100)}")
            for p in (0.25, 0.5, 0.75, 0.9)
        ]
    ).collect()[0]

    svals = sorted(ws)
    tot = sum(svals)
    for p in (0.25, 0.5, 0.75, 0.9):
        acc = 0
        expect = None
        for v in svals:
            acc += v
            if acc >= p * tot:
                expect = float(v)
                break
        assert got[f"p{int(p*100)}"] == expect


@SLOW
@given(st.lists(st.integers(1, 10_000), min_size=1, max_size=40, unique=True))
def test_priority_sample_contract_on_random_weights(spark, ws):
    """k rows exactly (or all rows when n<=k with tau=0), tau <= every
    sampled priority, and determinism across invocations."""
    from nabatshy_spark.operators.sampling import priority_sample

    k = 10
    df = spark.createDataFrame([(i, w) for i, w in enumerate(ws)], ["key", "w"])
    rows = priority_sample(df, "key", "w", k).collect()
    n = len(ws)
    if n <= k:
        assert len(rows) == n
        assert all(r["__tau"] == 0.0 for r in rows)
    else:
        assert len(rows) == k + 1
        tau = rows[0]["__tau"]
        sample = [r for r in rows if r["__rank"] <= k]
        assert all(r["__priority"] >= tau for r in sample)
    again = priority_sample(df, "key", "w", k).collect()
    assert sorted(r.key for r in rows) == sorted(r.key for r in again)


@SLOW
@given(
    st.lists(st.integers(0, 200), min_size=8, max_size=8),
    st.integers(0, 50),
)
def test_dhash_invariant_under_brightness_shift(spark, rowvals, offset):
    """For ANY 8-wide pattern, adding a constant brightness (without
    clipping) must not change the dHash."""
    import numpy as np

    from nabatshy_spark.operators.multimodal import image_dhash
    from nabatshy_spark.operators.pngcodec import encode_png

    base = np.tile(np.array(rowvals, dtype=np.int64), (6, 1))
    shifted = base + offset  # max 250 < 256, no clipping
    df = spark.createDataFrame(
        [
            (0, encode_png(base.astype(np.uint8))),
            (1, encode_png(shifted.astype(np.uint8))),
        ],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r.dhash for r in image_dhash(df).collect()}
    assert out[0] == out[1]
