"""Property tests for the mini attribute-DSL parser (SURVEY §5.3;
reference api/service.go:651-696)."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from nabatshy_spark.operators.search import AttributeQuery, parse_attribute_query

key = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="._"),
    min_size=1,
    max_size=10,
)
value = key


@given(st.lists(st.tuples(key, value, st.booleans()), min_size=1, max_size=5))
def test_roundtrip_valid_queries(pairs):
    """Well-formed queries parse into exactly their conditions."""
    q = ",".join(f"{k}!={v}" if neg else f"{k}={v}" for k, v, neg in pairs)
    parsed = parse_attribute_query(q)
    assert parsed == [AttributeQuery(k, v, neg) for k, v, neg in pairs]


@given(st.lists(st.tuples(key, value), min_size=1, max_size=3))
def test_one_bad_pair_forces_fallback(pairs):
    """The all-pairs-valid-or-fallback rule (api/service.go:690-695):
    one pair without '=' anywhere → whole query falls back (None)."""
    parts = [f"{k}={v}" for k, v in pairs]
    parts.insert(len(parts) // 2, "plaintext")
    assert parse_attribute_query(",".join(parts)) is None


def test_empty_key_or_value_is_valid():
    """The reference's SplitN keeps empty keys/values as conditions
    (api/service.go:668-688): 'k=' filters on empty value, '=v' on
    empty key — they do NOT force fallback."""
    assert parse_attribute_query("novalue=") == [AttributeQuery("novalue", "", False)]
    assert parse_attribute_query("=nokey") == [AttributeQuery("", "nokey", False)]
    assert parse_attribute_query("a=b,c!=") == [
        AttributeQuery("a", "b", False),
        AttributeQuery("c", "", True),
    ]


@given(st.text(max_size=30).filter(lambda s: "=" not in s))
def test_no_equals_is_fallback(s):
    assert parse_attribute_query(s) is None


def test_whitespace_tolerance():
    assert parse_attribute_query(" a = b , c != d ") == [
        AttributeQuery("a", "b", False),
        AttributeQuery("c", "d", True),
    ]
