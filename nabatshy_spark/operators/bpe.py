"""Byte-pair-encoding tokenizer training and application — the
tokenizer-aware member of the training-data pipeline surface
(SURVEY §2.11 extensions; no reference counterpart).

Algorithm: Sennrich, Haddow, Birch, "Neural Machine Translation of
Rare Words with Subword Units" (ACL 2016) — public. Words start as
character sequences with an end-of-word marker; each round merges the
globally most frequent adjacent symbol pair.

Scale shape (the part that matters at 100 TB):

- Training NEVER iterates over the corpus. One corpus pass builds the
  (distinct word, frequency) table — for web text that is ~10⁷ rows
  against 10¹¹ corpus tokens — and every merge round runs on that
  small relation: explode adjacent pairs weighted by freq → partial-agg
  count → top-1 to the driver (an O(1) scalar pair per round, like the
  k-means centroids).
- The per-round merge application is an Arrow-batched pandas UDF over
  the word table only (sequential adjacent-pair rewriting is inherently
  per-sequence; the table is small, so Python here is off the hot
  path).
- ``localCheckpoint`` per round truncates lineage exactly like
  connected_components / pagerank.
- APPLYING the trained tokenizer to the corpus is one narrow
  mapInPandas pass with the merge list broadcast in the closure — no
  shuffle, embarrassingly parallel.

Determinism: pair ties break lexicographically, so the merge sequence
— and therefore every downstream token count — is exactly reproducible
(unit-tested on the classic low/lower/newest/widest corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def _merge_seq(symbols: list[str], left: str, right: str) -> list[str]:
    """Apply one merge to one symbol sequence (leftmost-first,
    non-overlapping — the standard BPE rewrite)."""
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus — the ONE corpus-proportional pass
    of BPE training. Partial-agg groupBy on the word; at corpus scale
    add a min-freq floor to drop hapax noise."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 20,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list — O(num_merges) driver data, the whole trained
    tokenizer."""
    from pyspark.sql.functions import pandas_udf

    def merge_udf(left: str, right: str):
        # factory binds the pair by VALUE: the checkpoint is lazy, so a
        # closure over the loop variables would re-resolve them at
        # materialization time (next round's job) — a late-binding bug.
        # no type hints: `from __future__ import annotations` stringifies
        # them and pandas_udf's inference can't resolve local names.
        @pandas_udf("array<string>")
        def apply_merge(col):
            return col.map(lambda s: _merge_seq(list(s), left, right))

        return apply_merge

    words = word_freq_table(df, text_col)
    # initial symbolization: characters + end-of-word marker
    syms = words.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("symbols"),
        "freq",
    ).localCheckpoint(eager=False)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = syms.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("symbols"), 1, F.greatest(F.size("symbols") - 1, F.lit(0))),
                    F.slice(F.col("symbols"), 2, F.greatest(F.size("symbols") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < 2:
            break  # nothing left worth merging
        left, right = top[0]["p"]["l"], top[0]["p"]["r"]
        merges.append((left, right))
        syms = syms.select(
            merge_udf(left, right)(F.col("symbols")).alias("symbols"), "freq"
        ).localCheckpoint(eager=False)
    return merges


def bpe_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a trained merge list (replay in order)."""
    syms = list(word) + [EOW]
    for left, right in merges:
        if len(syms) == 1:
            break
        syms = _merge_seq(syms, left, right)
    return syms


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Per-document token counts under a trained BPE vocabulary:
    (id, ws_tokens, bpe_tokens, compression) — the statistic that
    drives sequence-packing budgets and per-source token accounting.

    One narrow mapInPandas pass; the merge list rides the closure
    (O(num_merges) — broadcast-sized). A per-batch segmentation cache
    keyed by distinct word makes the cost proportional to distinct
    words per batch, not tokens.
    """
    import pandas as pd

    def batches(it):
        cache: dict[str, int] = {}

        def count_doc(text: str) -> tuple[int, int]:
            words = [w for w in text.split(" ") if w]
            total = 0
            for w in words:
                n = cache.get(w)
                if n is None:
                    n = len(bpe_segment(w, merges))
                    cache[w] = n
                total += n
            return len(words), total

        for pdf in it:
            counts = pdf[text_col].map(count_doc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "ws_tokens": counts.map(lambda t: t[0]),
                    "bpe_tokens": counts.map(lambda t: t[1]),
                }
            )

    out = df.select(id_col, text_col).mapInPandas(
        batches, f"{id_col} long, ws_tokens long, bpe_tokens long"
    )
    return out.select(
        id_col,
        "ws_tokens",
        "bpe_tokens",
        F.round(
            F.col("bpe_tokens") / F.greatest(F.col("ws_tokens"), F.lit(1)), 6
        ).alias("tokens_per_word"),
    )
