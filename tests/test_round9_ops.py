"""Round-9 operator tests: the shared n-gram pair materialization."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nabatshy_spark.catalog import load
from nabatshy_spark.operators import dedup


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_shared_ngram_pairs_identical_to_direct(spark, sf_dir, tmp_path):
    """The materialized relation must be byte-identical to the direct
    operator output — same pairs, same exact jaccard doubles."""
    os.environ["SPARK_GRAFT_PAIRS_DIR"] = str(tmp_path / "pairs")
    try:
        direct = dedup.ngram_jaccard_pairs(
            load(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            n=3,
            threshold=0.5,
            max_df=200,
        )
        shared = dedup.shared_ngram_pairs(spark, sf_dir)
        assert dict(shared.dtypes) == dict(direct.dtypes)
        assert _rows(shared) == _rows(direct)
        # second call is a pure read (no rebuild): the artifact dir is
        # unchanged and still carries its _SUCCESS marker
        key_dirs = os.listdir(str(tmp_path / "pairs"))
        assert len(key_dirs) == 1
        before = os.stat(
            os.path.join(str(tmp_path / "pairs"), key_dirs[0], "_SUCCESS")
        ).st_mtime_ns
        again = dedup.shared_ngram_pairs(spark, sf_dir)
        assert _rows(again) == _rows(direct)
        after = os.stat(
            os.path.join(str(tmp_path / "pairs"), key_dirs[0], "_SUCCESS")
        ).st_mtime_ns
        assert before == after
    finally:
        del os.environ["SPARK_GRAFT_PAIRS_DIR"]


def test_shared_ngram_pairs_key_varies_with_params(spark, sf_dir, tmp_path):
    """Different operator parameters must map to different artifacts —
    a threshold change may NOT serve stale pairs."""
    os.environ["SPARK_GRAFT_PAIRS_DIR"] = str(tmp_path / "pairs")
    try:
        p05 = dedup.shared_ngram_pairs(spark, sf_dir, threshold=0.5)
        p09 = dedup.shared_ngram_pairs(spark, sf_dir, threshold=0.9)
        assert len(os.listdir(str(tmp_path / "pairs"))) == 2
        n05 = p05.count()
        n09 = p09.count()
        assert n09 <= n05
        assert (
            p09.filter(F.col("jaccard") < 0.9).count() == 0
        )
    finally:
        del os.environ["SPARK_GRAFT_PAIRS_DIR"]


# ---------------------------------------------------------------------------
# exact-substring dedup (operators/suffixes.py)
# ---------------------------------------------------------------------------


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_duplicate_exact_length(spark):
    """A planted 200-char exact duplicate must be recovered with its
    EXACT length and positions — the window-run reconstruction is exact
    for maximal shared regions (module docstring proof)."""
    from nabatshy_spark.operators import suffixes

    dup = "X" .join(f"tok{i}" for i in range(40))[:200]
    assert len(dup) == 200
    a = "left-unique-prefix-aaaaaaaaaaaaaaaa " + dup + " right-unique-suffix-aaaa"
    b = "completely different start bbbbbbbbb " + dup + " other ending bbbbbbbbbb"
    c = "no duplicate content here at all, just filler text to stay realistic"
    out = suffixes.duplicated_substring_runs(
        _mkdocs(spark, [(1, a), (2, b), (3, c)]), "doc_id", "text", min_len=50
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.dup_len == 202  # planted 200 chars + the shared ' ' on each side
    assert a[r.pos_a - 1 : r.pos_a - 1 + r.dup_len] == b[
        r.pos_b - 1 : r.pos_b - 1 + r.dup_len
    ]


def test_planted_duplicate_excludes_same_doc_and_short(spark):
    """Same-doc repeats and sub-threshold (<min_len) overlaps must not
    produce runs."""
    from nabatshy_spark.operators import suffixes

    chunk = "z".join(str(i) for i in range(60))[:120]
    same_doc = f"{chunk} middle filler goes here {chunk}"
    short_shared = "shared-30-chars-abcdefghijklmn"
    assert len(short_shared) < 50
    d1 = short_shared + " unique tail one that is long enough to window over ok"
    d2 = short_shared + " different tail two also long enough to window over yes"
    out = suffixes.duplicated_substring_runs(
        _mkdocs(spark, [(1, same_doc), (2, d1), (3, d2)]),
        "doc_id",
        "text",
        min_len=50,
    ).collect()
    assert out == []


def test_two_disjoint_runs_same_pair(spark):
    """Two separate duplicated regions between one doc pair must come
    back as two runs, not merge."""
    from nabatshy_spark.operators import suffixes

    r1 = "A".join(f"w{i}" for i in range(30))[:80]
    r2 = "B".join(f"v{i}" for i in range(30))[:80]
    a = f"start-one {r1} gap-unique-alpha-alpha-alpha {r2} tail-one-unique"
    b = f"begin-two {r1} gap-unique-beta-beta-beta-bb {r2} tail-two-unique"
    out = sorted(
        suffixes.duplicated_substring_runs(
            _mkdocs(spark, [(1, a), (2, b)]), "doc_id", "text", min_len=50
        ).collect(),
        key=lambda r: r.pos_a,
    )
    assert len(out) == 2
    for r in out:
        assert a[r.pos_a - 1 : r.pos_a - 1 + r.dup_len] == b[
            r.pos_b - 1 : r.pos_b - 1 + r.dup_len
        ]


def test_substring_recall_vs_ngram_signal(spark, sf_dir):
    """Recall floor vs the fixed-n signal on the real fixture: every
    near-dup pair found by 3-gram Jaccard >= 0.5 shares long verbatim
    spans in this corpus, so the ExactSubstr runs must cover (at least)
    a large majority of those pairs; and every reported run is exactly
    duplicated by construction (verified in-operator)."""
    from nabatshy_spark.catalog import load
    from nabatshy_spark.operators import dedup, suffixes

    docs = load(spark, sf_dir, "documents")
    jacc = {
        (r.doc_a, r.doc_b)
        for r in dedup.shared_ngram_pairs(spark, sf_dir).collect()
    }
    runs = {
        (r.doc_a, r.doc_b)
        for r in suffixes.duplicated_substring_runs(
            docs, "doc_id", "text", min_len=50, max_df=200
        ).collect()
    }
    assert jacc, "fixture should contain near-dup pairs"
    recall = len(jacc & runs) / len(jacc)
    assert recall >= 0.8, f"ExactSubstr recall vs n-gram signal: {recall}"
