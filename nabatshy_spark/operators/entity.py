"""Entity resolution / record linkage over attribute-bearing tables.

Beyond-reference extension (SURVEY §2.11 spirit): a training-data /
warehouse pipeline routinely needs to collapse near-identical records
(products, authors, users) before dedup or feature building.  The
classic scalable shape is **blocking → pairwise scoring → clustering**:

- blocking via an inverted index on cheap keys (name tokens here, with
  a document-frequency cap) so candidate generation is Σ min(df, cap)²
  instead of N² — the same bounded-postings design as
  ``operators/dedup.py`` n-gram Jaccard;
- pairwise scoring as pure column arithmetic (token Jaccard, attribute
  equality, bounded numeric distance) — whole-stage-codegen'd, no UDFs;
- clustering by reusing the large-star/small-star connected components
  in ``operators/dedup.py`` (O(log n) rounds at scale).

Everything here is deterministic integer/ratio arithmetic so the DuckDB
oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nabatshy_spark.operators.dedup import connected_components


def _name_tokens(df: DataFrame, id_col: str, name_col: str) -> DataFrame:
    """(id, tok, n_tokens) with distinct lowercase whitespace tokens."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.split(F.lower(F.trim(F.col(name_col))), r"\s+")
        ).alias("ts"),
    )
    return toks.select(
        "id", F.explode("ts").alias("tok"), F.size("ts").alias("n")
    )


def blocked_candidate_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_df: int | None = None,
) -> DataFrame:
    """Candidate pairs sharing ≥1 name token, with the token-Jaccard
    ingredients (``inter``, ``n_a``, ``n_b``).

    ``max_df`` drops tokens whose posting list exceeds the cap before
    the self-join (stop-token suppression): at 100 TB the join cost is
    Σ min(df, cap)² per token, bounded even when one token appears in
    half the corpus.  Candidates lost to the cap share only ubiquitous
    tokens, i.e. are low-Jaccard anyway.
    """
    tok = _name_tokens(df, id_col, name_col)
    if max_df is not None:
        w = Window.partitionBy("tok")
        tok = (
            tok.withColumn("df", F.count("*").over(w))
            .filter(F.col("df") <= max_df)
            .drop("df")
        )
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.n").alias("n_a"),
            F.first("b.n").alias("n_b"),
        )
    )
    return pairs


def score_part_pairs(
    part: DataFrame,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Multi-attribute ER scoring for the ``part`` table.

    score = 0.5·Jaccard(name tokens) + 0.3·[brand equal]
          + 0.2·(1 − min(|Δsize|, 10)/10)

    All components are ratios of integers, so the score is the same
    IEEE double in Spark and DuckDB; the threshold compare and the
    6-dp rounding are therefore hash-stable.
    """
    pairs = blocked_candidate_pairs(part, "p_partkey", "p_name", max_df=max_df)
    attrs = part.select(
        F.col("p_partkey").alias("id"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"),
    )
    a = attrs.alias("pa")
    b = attrs.alias("pb")
    scored = (
        pairs.join(a, pairs.id_a == F.col("pa.id"))
        .join(b, pairs.id_b == F.col("pb.id"))
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))).alias(
                "name_jaccard"
            ),
            F.when(F.col("pa.brand") == F.col("pb.brand"), 1).otherwise(0).alias(
                "brand_eq"
            ),
            (
                1.0
                - F.least(F.abs(F.col("pa.size") - F.col("pb.size")), F.lit(10)) / 10.0
            ).alias("size_sim"),
        )
        .withColumn(
            "score",
            0.5 * F.col("name_jaccard")
            + 0.3 * F.col("brand_eq")
            + 0.2 * F.col("size_sim"),
        )
        .filter(F.col("score") >= threshold)
    )
    return scored.select(
        "id_a",
        "id_b",
        F.round("name_jaccard", 6).alias("name_jaccard"),
        "brand_eq",
        F.round("size_sim", 6).alias("size_sim"),
        F.round("score", 6).alias("score"),
    )


def part_entity_clusters(
    part: DataFrame,
    threshold: float = 0.9,
    max_df: int | None = None,
) -> DataFrame:
    """Cluster-size histogram of matched part entities.

    Edges = scored pairs ≥ threshold; components via the
    large-star/small-star rounds in ``dedup.connected_components``;
    isolated records count as singleton clusters.  Output is the
    histogram (cluster_size, n_clusters) — the shape reviewers actually
    look at for an ER run.
    """
    edges = score_part_pairs(part, threshold=threshold).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    comp = connected_components(edges, "a", "b").withColumnRenamed(
        "doc_id", "node"
    )
    all_ids = part.select(F.col("p_partkey").alias("node"))
    labeled = (
        all_ids.join(comp, "node", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    )
    sizes = labeled.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("cluster_size")
    )
