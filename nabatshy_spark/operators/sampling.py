"""Deterministic sampling operators for training-data curation
(SURVEY §2.11 extension surface).

At 100 TB you cannot use `df.sample()` for curation: it is
nondeterministic across retries/partitions and cannot be reproduced by
a downstream consumer. The standard fix is *consistent hash sampling*:
a pure function of the row key decides membership, so every engine
(Spark, DuckDB, a later rerun) selects the identical subset, the
filter rides predicate pushdown, and no shuffle is introduced.

Both operators here are pure column expressions — single scan, fully
codegen'd, no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_sample(df: DataFrame, key_col: str, bps: int) -> DataFrame:
    """Keep ~``bps``/65536 of rows, decided by the first 4 hex chars of
    md5(key). Hex strings of equal length compare lexicographically in
    numeric order ('0'<'9'<'a'<'f'), so the predicate is a plain string
    compare that any engine reproduces bit-for-bit.

    Scale: a deterministic filter directly over the scan — no shuffle,
    no RNG state, safe under task retries and speculative execution.
    """
    if not 0 <= bps <= 65536:
        raise ValueError("bps must be in [0, 65536]")
    thresh = format(bps, "04x")
    return df.filter(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4) < F.lit(thresh)
    )


def stratified_topfrac(
    df: DataFrame,
    stratum_col: str,
    score_col: str,
    id_col: str,
    frac: float,
) -> DataFrame:
    """Per-stratum top-``frac`` selection by score (quality-filtered
    stratified sampling: e.g. keep the longest/highest-quality quarter
    of documents *per language* so small languages aren't crowded out).

    percent_rank is exact rational arithmetic ((rank-1)/(n-1)), and the
    ordering is made total with the id tiebreak, so the output is
    deterministic and oracle-checkable.

    Scale: one hash shuffle on the stratum key; skewed strata (one
    dominant language) are the known hazard — mitigate by salting the
    rank computation or pre-aggregating per-stratum thresholds via
    approx quantiles when n_strata is small.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("pr", F.round(F.percent_rank().over(w), 6))
        .filter(F.col("pr") <= frac)
        .select(id_col, stratum_col, score_col, "pr")
    )
