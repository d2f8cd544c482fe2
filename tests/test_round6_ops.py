"""Invariant tests for the round-6 operators: HLL sketch rollup
merge identity, incremental-MV merge, cosine range search vs top-k,
dependency drift conservation, blocklist and LTV shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

import nabatshy_spark.plans.ext_queries  # noqa: F401
import nabatshy_spark.plans.span_queries  # noqa: F401
from nabatshy_spark.catalog import load
from nabatshy_spark.operators import spans as S
from nabatshy_spark.operators.similarity import cosine_range_search, cosine_topk
from nabatshy_spark.plans.queries import QUERIES
from nabatshy_spark.plans.span_queries import load_spans


def test_hll_union_equals_direct_sketch(spark, sf_dir):
    """HLL union is register-wise max, so the estimate from unioned
    daily sketches must EQUAL the estimate of one sketch built
    directly over each week — the property that makes the pre-agg
    answer any day range without rescanning."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week_start"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    direct = ev.groupBy("week_start").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))
        ).alias("direct_est")
    )
    rolled = QUERIES["hll_user_rollup"](spark, sf_dir)
    j = rolled.join(direct, "week_start").collect()
    assert len(j) == rolled.count()
    for r in j:
        assert r.est_users == r.direct_est, r


def test_hll_rollup_close_to_exact(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week_start"),
        "user_id",
    )
    exact = {
        r.week_start: r.n
        for r in ev.groupBy("week_start")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in QUERIES["hll_user_rollup"](spark, sf_dir).collect():
        e = exact[r.week_start]
        assert abs(r.est_users - e) <= max(2, 0.02 * e), (r, e)


def test_mv_merge_equals_full_recompute(spark, sf_dir):
    """The merged (base + delta) MV must equal a single-pass
    aggregation — including the cutoff month, which receives rows from
    BOTH branches."""
    li = load(spark, sf_dir, "lineitem")
    full = {
        r.ship_month: (r.revenue, r.n_lines)
        for r in li.groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .collect()
    }
    merged = QUERIES["mv_incremental_refresh"](spark, sf_dir).collect()
    assert len(merged) == len(full)
    import datetime

    cutoff_month = datetime.date(2001, 6, 1)
    assert any(r.ship_month == cutoff_month for r in merged)
    for r in merged:
        fr, fn = full[r.ship_month]
        assert r.n_lines == fn
        assert abs(r.revenue - fr) < 0.02, (r.ship_month, r.revenue, fr)


def test_range_search_consistent_with_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    rng = {
        r.vec_id: r.cos
        for r in cosine_range_search(
            emb, "vec_id", "embedding", 0, 0.25
        ).collect()
    }
    top = cosine_topk(emb, "vec_id", "embedding", 0, k=50).collect()
    # every top-k hit above the radius is in the range result w/ same cos
    for r in top:
        if r.cos >= 0.25:
            assert rng[r.vec_id] == r.cos
    # and the range result has nothing below the radius
    assert all(c >= 0.25 for c in rng.values())


def test_dependency_drift_conserves_edge_counts(spark, sf_dir):
    sp = load_spans(spark)
    drift = QUERIES["spans_dependency_drift"](spark, sf_dir).collect()
    base = {
        (r.parent_service, r.child_service): r.call_count
        for r in S.service_dependency_graph(sp).collect()
    }
    assert len(drift) == len(base)
    for r in drift:
        assert r.calls_h1 + r.calls_h2 == base[(r.parent_service, r.child_service)]
        assert r.delta == r.calls_h2 - r.calls_h1


def test_blocklist_hits_shape(spark, sf_dir):
    rows = QUERIES["blocklist_term_hits"](spark, sf_dir).collect()
    assert rows
    terms = {r.term for r in rows}
    assert "forbiddenterm" not in terms  # absent term yields no row
    for r in rows:
        assert r.n_hits >= r.n_docs >= 1


def test_ltv_cumulative_is_monotone(spark, sf_dir):
    rows = QUERIES["cohort_ltv_curve"](spark, sf_dir).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_q, []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_q)
        assert rs[0].age_q == 0  # the cohort's first quarter has orders
        cum = 0.0
        for r in rs:
            assert r.age_q >= 0
            cum += r.revenue
            assert abs(r.cum_revenue - cum) < 0.05
        # every row of one cohort reports the same cohort size
        assert len({r.n_customers for r in rs}) == 1
