"""Round-4 operator semantics: gaps-and-islands span coverage, EWMA
lag-pyramid, Zipf fit shape, image pixel-dedup grouping."""

from __future__ import annotations

from pyspark.sql import Row

from nabatshy_spark.operators import dedup, stats, textanalysis


def test_span_stats_merges_overlapping_windows(spark):
    # Two docs share a 25-char run -> 6 overlapping 20-gram windows in
    # each; the island union must count 25 chars, not 6*20.
    run = "abcdefghijklmnopqrstuvwxy"  # 25 chars
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=run + "1UNIQ-TAIL-AAAAAAAAAA"),
            Row(doc_id=2, text="2UNIQ-HEAD-BBBBBBBBBB" + run),
        ]
    )
    out = {
        r.doc_id: r
        for r in dedup.duplicate_span_stats(docs, "doc_id", "text", k=20).collect()
    }
    assert out[1].dup_chars == 25
    assert out[2].dup_chars == 25


def test_span_stats_disjoint_islands_sum(spark):
    a = "A" * 9 + "abcdefghijklmnopqrst"  # dup window at tail
    b = "abcdefghijklmnopqrst" + "B" * 9 + "uvwxyz0123456789ABCD"
    c = "uvwxyz0123456789ABCD"
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=a), Row(doc_id=2, text=b), Row(doc_id=3, text=c)]
    )
    out = {
        r.doc_id: r
        for r in dedup.duplicate_span_stats(docs, "doc_id", "text", k=20).collect()
    }
    # doc 2 has two disjoint 20-char duplicated islands
    assert out[2].dup_chars == 40
    assert out[1].dup_chars == 20 and out[3].dup_chars == 20


def test_ewma_weights_newest_heaviest(spark):
    import datetime as dt

    rows = [
        Row(
            user_id=1,
            ts=dt.datetime(2024, 1, 1, 0, 0, i),
            event_id=i,
            value=float(v),
        )
        for i, v in enumerate([0.0, 0.0, 8.0])
    ]
    df = spark.createDataFrame(rows)
    out = stats.ewma_last(df, "user_id", "ts", "value", "event_id").collect()
    assert len(out) == 1
    # weights 1, .5, .25 over values 8, 0, 0 -> 8/1.75
    assert abs(out[0].ewma_value - 8 / 1.75) < 1e-6
    assert out[0].n_events == 3


def test_ewma_single_event_is_identity(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [Row(user_id=7, ts=dt.datetime(2024, 1, 1), event_id=1, value=3.25)]
    )
    out = stats.ewma_last(df, "user_id", "ts", "value", "event_id").collect()
    assert out[0].ewma_value == 3.25


def test_zipf_slope_negative_on_skewed_counts(spark):
    # rank-1 term appears 64x, rank-2 32x, ... -> slope = -1 exactly in
    # log2 space; natural log keeps the ratio, slope -1.
    words = []
    for i, n in enumerate([64, 32, 16, 8, 4, 2, 1]):
        words.extend([f"w{i}"] * n)
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(words))])
    row = textanalysis.zipf_fit(df, "text", top_n=10).collect()[0]
    assert row.n_terms == 7
    assert row.zipf_slope < -0.8


def test_image_dup_groups_match_analytic(spark, sf_dir):
    from nabatshy_spark.plans.queries import QUERIES
    import nabatshy_spark.plans.ext_queries  # noqa: F401

    rows = QUERIES["image_dup_groups"](spark, sf_dir).collect()
    # 500 docs at sf0.01: ids x and x+256 share gray -> 244 groups of 2
    assert all(r.n_images == 2 for r in rows)
    assert len(rows) == 244
