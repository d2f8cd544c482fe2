"""Entity resolution (operators/entity.py) and duplicated-window
coverage (dedup.duplicate_ngram_coverage) unit tests on tiny frames —
the oracle sweep covers the sf0.01 parity; these pin semantics."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from nabatshy_spark.operators import dedup, entity


def _parts(spark, rows):
    return spark.createDataFrame(
        [Row(p_partkey=i, p_name=n, p_brand=b, p_size=s) for i, n, b, s in rows]
    )


def test_score_pairs_exact_match(spark):
    df = _parts(
        spark,
        [
            (1, "red widget", "Brand#1", 10),
            (2, "red widget", "Brand#1", 10),
            (3, "blue bolt", "Brand#2", 30),
        ],
    )
    out = entity.score_part_pairs(df, threshold=0.8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.name_jaccard == 1.0 and r.brand_eq == 1 and r.score == 1.0


def test_score_pairs_brand_mismatch_drops_below_threshold(spark):
    df = _parts(
        spark,
        [
            (1, "red widget", "Brand#1", 10),
            (2, "red widget", "Brand#2", 10),
        ],
    )
    # 0.5*1.0 + 0.3*0 + 0.2*1.0 = 0.7 < 0.8
    assert entity.score_part_pairs(df, threshold=0.8).count() == 0
    assert entity.score_part_pairs(df, threshold=0.7).count() == 1


def test_max_df_cap_drops_stop_tokens(spark):
    # "common" appears in every row; with max_df=2 it cannot generate
    # candidates, and the remaining tokens are all distinct -> no pairs.
    df = _parts(
        spark,
        [
            (1, "common alpha", "B", 1),
            (2, "common beta", "B", 1),
            (3, "common gamma", "B", 1),
        ],
    )
    assert entity.blocked_candidate_pairs(df, "p_partkey", "p_name").count() == 3
    assert (
        entity.blocked_candidate_pairs(df, "p_partkey", "p_name", max_df=2).count()
        == 0
    )


def test_clusters_include_singletons(spark):
    df = _parts(
        spark,
        [
            (1, "red widget", "Brand#1", 10),
            (2, "red widget", "Brand#1", 10),
            (3, "blue bolt", "Brand#2", 30),
        ],
    )
    hist = {
        r.cluster_size: r.n_clusters
        for r in entity.part_entity_clusters(df, threshold=0.9).collect()
    }
    assert hist == {1: 1, 2: 1}


def test_duplicate_ngram_coverage_semantics(spark):
    shared = "0123456789abcdefghij"  # one 20-char window
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=shared),
            Row(doc_id=2, text=shared + "XYZ"),
            Row(doc_id=3, text="completely different text padding!!"),
            Row(doc_id=4, text="short"),  # < k, excluded
        ]
    )
    out = {
        r.doc_id: r
        for r in dedup.duplicate_ngram_coverage(docs, "doc_id", "text").collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].n_windows == 1 and out[1].dup_windows == 1
    assert out[1].dup_coverage == 1.0
    # doc 2 has 4 windows, only the first equals doc 1's window
    assert out[2].n_windows == 4 and out[2].dup_windows == 1
    assert out[3].dup_windows == 0


def test_within_doc_repeat_is_not_cross_doc_duplication(spark):
    rep = "0123456789abcdefghij"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=rep + rep),  # window repeats inside one doc
            Row(doc_id=2, text="zz" + "y" * 30),
        ]
    )
    out = {
        r.doc_id: r
        for r in dedup.duplicate_ngram_coverage(docs, "doc_id", "text").collect()
    }
    assert out[1].dup_windows == 0


def test_capped_blocking_equals_exhaustive_at_high_threshold(spark):
    # On a catalog where EVERY token is above the df cap (the
    # low-cardinality regime that melts pure token blocking), the
    # capped multi-pass result must still equal the exhaustive
    # (max_df=None) result for thresholds that force token-set
    # equality — the canonical-name pass carries those pairs.
    from pyspark.sql import Row

    rows = []
    for i in range(30):
        rows.append(
            Row(
                p_partkey=i,
                p_name="red plate" if i % 2 == 0 else "blue plate",
                p_brand=f"Brand#{i % 3}",
                p_size=(i % 7) + 1,
            )
        )
    df = spark.createDataFrame(rows)
    exhaustive = {
        (r.id_a, r.id_b, r.score)
        for r in entity.score_part_pairs(df, threshold=0.8).collect()
    }
    capped = {
        (r.id_a, r.id_b, r.score)
        for r in entity.score_part_pairs(df, threshold=0.8, max_df=5).collect()
    }
    assert exhaustive and capped == exhaustive
