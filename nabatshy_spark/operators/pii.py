"""PII redaction for training-data pipelines (SURVEY §2.11 extension;
no reference counterpart — the reference stores telemetry, not corpora).

Scrubbing personally identifiable information is a standard pass before
any corpus release. All patterns are pure ``regexp_replace`` /
``regexp_count`` column expressions — single scan, codegen'd, no UDFs —
and are written in the common RE2/Java-regex subset so a DuckDB oracle
can replicate them verbatim.

Scale shape: a narrow map over the text column; no shuffle, no state.
At 100 TB this runs at parquet-scan speed and composes with any
downstream operator (the redacted column simply replaces the raw one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: SSN before phone — both are digit-dash shapes and one match
# must not be rewritten into a partial of the other. Patterns stay in
# the RE2 ∩ java.util.regex subset (no lookarounds, no backrefs).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_text(col: Column) -> Column:
    """The text with every PII pattern replaced by its tag, applied in
    PII_PATTERNS order."""
    out = col
    for _name, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, redacted text, per-type match counts, total). Counts are
    taken BEFORE redaction — order-independent, so each count is the
    raw occurrence count of that pattern in the original text."""
    counts = {
        name: F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _tag in PII_PATTERNS
    }
    out = df.select(
        F.col(id_col),
        redact_text(F.col(text_col)).alias("redacted"),
        *counts.values(),
    )
    total = None
    for name, _pat, _tag in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)
