"""Property tests for the exact-substring operators against an
INDEPENDENT pure-Python reference: the operator finds duplicated
substrings via window hashing + diagonal runs, the reference is a
direct O(n²) dynamic program over the raw strings — different
algorithm, same answer, so agreement is evidence the reconstruction
math (run + min_len − 1, edge maximality) is right, not just
self-consistent. A small alphabet forces dense repeats, including the
overlapping/periodic cases."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

MIN_LEN = 8

doc = st.text(alphabet="ab ", min_size=0, max_size=120)
docs = st.lists(doc, min_size=2, max_size=4)


def _lcs_len(x: str, y: str) -> int:
    """Longest common substring length, O(|x|·|y|) DP."""
    best = 0
    prev = [0] * (len(y) + 1)
    for i in range(1, len(x) + 1):
        cur = [0] * (len(y) + 1)
        for j in range(1, len(y) + 1):
            if x[i - 1] == y[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def _longest_self_repeat(x: str) -> int:
    """Longest substring occurring at two DIFFERENT positions of x
    (overlaps allowed) — max over periods d of the longest run of
    x[p] == x[p+d]."""
    best = 0
    for d in range(1, len(x)):
        run = 0
        for p in range(len(x) - d):
            run = run + 1 if x[p] == x[p + d] else 0
            best = max(best, run)
    return best


@SLOW
@given(docs)
def test_cross_doc_longest_matches_dp(spark, texts):
    from nabatshy_spark.operators import suffixes

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    runs = suffixes.duplicated_substring_runs(
        df, "doc_id", "text", min_len=MIN_LEN, max_df=None
    ).collect()
    # every reported run is a genuine equality with the exact length
    for r in runs:
        a, b = texts[r.doc_a], texts[r.doc_b]
        assert (
            a[r.pos_a - 1 : r.pos_a - 1 + r.dup_len]
            == b[r.pos_b - 1 : r.pos_b - 1 + r.dup_len]
        )
        assert r.dup_len >= MIN_LEN
    # the maximum reported length per pair equals the DP answer
    got = {}
    for r in runs:
        k = (r.doc_a, r.doc_b)
        got[k] = max(got.get(k, 0), r.dup_len)
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            want = _lcs_len(texts[i], texts[j])
            if want >= MIN_LEN:
                assert got.get((i, j)) == want, (i, j, want, got.get((i, j)))
            else:
                assert (i, j) not in got


@SLOW
@given(doc)
def test_intra_doc_longest_matches_dp(spark, text):
    from nabatshy_spark.operators import suffixes

    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    runs = suffixes.intra_doc_repeat_runs(
        df, "doc_id", "text", min_len=MIN_LEN, max_occ=None
    ).collect()
    for r in runs:
        assert (
            text[r.pos_a - 1 : r.pos_a - 1 + r.rep_len]
            == text[r.pos_b - 1 : r.pos_b - 1 + r.rep_len]
        )
    want = _longest_self_repeat(text)
    got = max((r.rep_len for r in runs), default=0)
    if want >= MIN_LEN:
        assert got == want, (want, got)
    else:
        assert not runs
