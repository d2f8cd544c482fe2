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


def blocked_candidate_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_df: int | None = None,
    block_cols: list[str] | None = None,
    carry_cols: list[str] | None = None,
    min_jaccard: float = 0.0,
    rep_cap: int | None = None,
) -> DataFrame:
    """Candidate pairs sharing ≥1 name token, with the token-Jaccard
    ingredients (``inter``, ``n_a``, ``n_b``).

    ``rep_cap`` bounds the canonical-name pass (round 10): instead of
    all pairs within an identical-token-set group (Σ g², the quadratic
    term on dup-heavy catalogs), each record pairs only with the
    ``rep_cap`` LOWEST-ID representatives of its group — Σ g·rep_cap,
    linear in group size. Groups ≤ rep_cap are exhaustively paired, so
    the cap is invisible until it binds; a deterministic, documented
    miss condition beyond that (non-rep×non-rep pairs are not
    emitted). ``None`` keeps the exact full pass.

    Multi-pass blocking, the scalable record-linkage shape:

    - *Token pass*: inverted index on name tokens; ``max_df`` drops
      tokens whose posting list exceeds the cap before the self-join
      (stop-token suppression), bounding join cost at Σ min(df, cap)²
      per token even when one token appears in half the corpus.
    - *Canonical-name pass* (only when a cap is set): equality join on
      the sorted token set. This closes the cap's one real hole —
      records whose name is made ENTIRELY of ubiquitous tokens are
      still perfect token-set matches of each other (a low-cardinality
      catalog is exactly that), and group-key equality finds them at
      Σ group² cost with no postings at all.

    Scoring then recomputes the TRUE intersection per surviving
    candidate via ``array_intersect`` on the full token arrays — so a
    candidate found through one rare token still counts its capped
    common tokens, and the emitted (inter, n_a, n_b) are exact
    regardless of which pass produced the pair.  With ``max_df`` the
    candidate SET is exact for pairs sharing a sub-cap token or with
    identical token sets; anything lost shares only capped tokens AND
    differs somewhere, i.e. sits at partial Jaccard.

    ``block_cols`` adds conjunctive equality blocking: columns whose
    equality the caller has PROVEN necessary for a match (e.g. a score
    threshold unreachable without brand equality) join the block key
    of both passes, dividing posting lists / name groups by that
    column's cardinality at zero recall cost.

    ``carry_cols`` rides attribute columns through to the output as
    ``<col>_a`` / ``<col>_b`` so scorers don't need two more id-keyed
    joins back to the source relation after candidate generation.

    ``min_jaccard`` prunes candidates whose token-Jaccard UPPER BOUND
    (shared surviving tokens + the smaller capped count, the most the
    true intersection can reach) falls below it — recall-lossless for
    any scorer that needs at least that Jaccard, and it shrinks the
    exact-verify join from every co-token pair to the near-match set.
    Callers derive it from their score threshold (see
    :func:`score_part_pairs`); 0.0 disables the prune.
    """
    extra = list(block_cols or [])
    carry = list(carry_cols or [])
    sets = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.split(F.lower(F.trim(F.col(name_col))), r"\s+")
        ).alias("ts"),
        *[F.col(c).alias(f"__bk{i}") for i, c in enumerate(extra)],
        *[F.col(c) for c in carry],
    )
    bks = [f"__bk{i}" for i in range(len(extra))]

    def _bk_eq(x: str, y: str):
        cond = F.lit(True)
        for k in bks:
            cond = cond & (F.col(f"{x}.{k}") == F.col(f"{y}.{k}"))
        return cond

    tok = sets.select("id", F.explode("ts").alias("tok"), *bks)
    if max_df is not None:
        # df-cap as aggregate + equi-join instead of a count-over-
        # partition window: the window sorts the whole exploded token
        # relation inside one exchange, while the aggregate's partial
        # combine shrinks it to the (token, block) vocabulary before
        # the shuffle and AQE broadcasts the surviving keys back on.
        keep = (
            tok.groupBy("tok", *bks)
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("tok", *bks)
        )
        tok = tok.join(keep, ["tok", *bks])
    # Pin the self-join's parallelism: the posting relation is tiny in
    # BYTES (AQE would coalesce it to one partition — a single small
    # source file serializes the whole pair expansion on one core,
    # measured 5s for ~2M expanded pairs) but the join OUTPUT is
    # Σ df² rows of compute. An explicit partition count is respected
    # by AQE; keying by (token, block) keeps the equi-join co-located.
    fanout = tok.sparkSession.sparkContext.defaultParallelism
    # The capped posting relation feeds both self-join sides plus the
    # prune's survivor counts. Measured (sf0.1, within-session A/B):
    # localCheckpoint-ing it here is a net LOSS (er_part_pairs 4.46 s
    # checkpointed vs 3.84 s recomputed) — the narrow scan → explode →
    # cap chain recomputes cheaper than the materialization barrier it
    # introduces (the checkpoint serializes the consumers behind one
    # materialization and defeats stage pipelining). Checkpoint only
    # when the upstream is genuinely expensive relative to its size.
    tok = tok.repartition(fanout, "tok", *bks)
    a = tok.alias("a")
    b = tok.alias("b")
    # One aggregation replaces the former dropDuplicates at the same
    # shuffle cost AND yields the shared-surviving-token count the
    # Jaccard prune below needs.
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id"))
            & _bk_eq("a", "b"),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count("*").alias("__c"))
    )
    if min_jaccard > 0.0:
        # Threshold-derived candidate prune, EXACT: per pair, the true
        # intersection I satisfies I <= __c + min(dropped_a, dropped_b)
        # (a shared token is either surviving — counted in __c — or
        # capped on both sides, bounded by either side's capped count).
        # J = I/(n_a+n_b-I) is increasing in I, so pairs whose upper
        # bound falls below min_jaccard can never verify; with no cap
        # (or nothing actually dropped) the bound IS the true Jaccard
        # and the verify join below receives only genuine matches.
        kept = tok.groupBy("id").agg(F.count("*").alias("__k"))
        per_id = (
            sets.select("id", F.size("ts").alias("__n"))
            .join(kept, "id", "left")
            .select(
                "id",
                "__n",
                (F.col("__n") - F.coalesce("__k", F.lit(0))).alias("__d"),
            )
        )
        pa = per_id.select(
            F.col("id").alias("id_a"),
            F.col("__n").alias("__na"),
            F.col("__d").alias("__da"),
        )
        pb = per_id.select(
            F.col("id").alias("id_b"),
            F.col("__n").alias("__nb"),
            F.col("__d").alias("__db"),
        )
        ub = F.col("__c") + F.least("__da", "__db")
        cand = (
            cand.join(pa, "id_a")
            .join(pb, "id_b")
            .filter(
                ub * (1.0 + min_jaccard)
                >= min_jaccard * (F.col("__na") + F.col("__nb")) - 1e-9
            )
        )
    cand = cand.select("id_a", "id_b")
    if max_df is not None:
        # same single-small-file serialization risk as the token pass
        canon = sets.select(
            "id", F.sort_array("ts").alias("key"), *bks
        ).repartition(fanout, "key", *bks)
        if rep_cap is not None:
            w = Window.partitionBy("key", *bks).orderBy("id")
            ranked = canon.withColumn("__r", F.row_number().over(w))
            reps = ranked.filter(F.col("__r") <= rep_cap).select(
                F.col("id").alias("__rep"), "key", *bks
            )
            canon_pairs = (
                ranked.join(reps, ["key", *bks])
                .filter(F.col("id") != F.col("__rep"))
                .select(
                    F.least("id", "__rep").alias("id_a"),
                    F.greatest("id", "__rep").alias("id_b"),
                )
                .distinct()
            )
        else:
            ca = canon.alias("ca")
            cb = canon.alias("cb")
            canon_pairs = ca.join(
                cb,
                (F.col("ca.key") == F.col("cb.key"))
                & (F.col("ca.id") < F.col("cb.id"))
                & _bk_eq("ca", "cb"),
            ).select(
                F.col("ca.id").alias("id_a"), F.col("cb.id").alias("id_b")
            )
        cand = cand.unionByName(canon_pairs)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    return (
        cand.join(sa, cand.id_a == F.col("sa.id"))
        .join(sb, cand.id_b == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect(F.col("sa.ts"), F.col("sb.ts"))).alias(
                "inter"
            ),
            F.size(F.col("sa.ts")).alias("n_a"),
            F.size(F.col("sb.ts")).alias("n_b"),
            *[F.col(f"sa.{c}").alias(f"{c}_a") for c in carry],
            *[F.col(f"sb.{c}").alias(f"{c}_b") for c in carry],
        )
    )


def _score_part_candidates(pairs: DataFrame) -> DataFrame:
    """THE part-ER score — 0.5·Jaccard(name tokens) + 0.3·[brand equal]
    + 0.2·(1 − min(|Δsize|, 10)/10) — over a candidate relation
    carrying (inter, n_a, n_b, p_brand_a/b, p_size_a/b). One
    definition consumed by both score_part_pairs and
    part_topk_matches (and mirrored by the DuckDB twins), so a weight
    or cap change can never leave the truth and capped relations
    scored by different rules."""
    return pairs.select(
        "id_a",
        "id_b",
        (
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
        ).alias("name_jaccard"),
        F.when(F.col("p_brand_a") == F.col("p_brand_b"), 1)
        .otherwise(0)
        .alias("brand_eq"),
        (
            1.0
            - F.least(
                F.abs(F.col("p_size_a") - F.col("p_size_b")), F.lit(10)
            ) / 10.0
        ).alias("size_sim"),
    ).withColumn(
        "score",
        0.5 * F.col("name_jaccard")
        + 0.3 * F.col("brand_eq")
        + 0.2 * F.col("size_sim"),
    )


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

    Threshold-derived conjunctive blocking: name_jaccard and size_sim
    cap at 1.0, so without brand equality the score caps at
    0.5 + 0.2 = 0.7 — any threshold above that makes brand a NECESSARY
    condition, and it joins the block key (25× fewer candidates on a
    25-brand catalog) with zero recall loss.
    """
    block_cols = ["p_brand"] if threshold > 0.7 else None
    # name_jaccard is the only unbounded-from-below component: brand_eq
    # and size_sim cap at 0.3 + 0.2, so score >= threshold REQUIRES
    # J >= (threshold - 0.5)/0.5 — a recall-lossless candidate prune.
    pairs = blocked_candidate_pairs(
        part, "p_partkey", "p_name", max_df=max_df, block_cols=block_cols,
        carry_cols=["p_brand", "p_size"],
        min_jaccard=max(0.0, (threshold - 0.5) / 0.5),
    )
    scored = _score_part_candidates(pairs).filter(
        F.col("score") >= threshold
    )
    return scored.select(
        "id_a",
        "id_b",
        F.round("name_jaccard", 6).alias("name_jaccard"),
        "brand_eq",
        F.round("size_sim", 6).alias("size_sim"),
        F.round("score", 6).alias("score"),
    )


def part_topk_matches(
    part: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    max_df: int | None = 200,
    rep_cap: int = 8,
) -> DataFrame:
    """Per-record top-``k`` scored matches — the OUTPUT-BOUNDED ER
    surface (VERDICT r9 task #4).

    The all-pairs contract (:func:`score_part_pairs`) is inherently
    output-quadratic on dup-heavy catalogs: a (name, brand) group of g
    records emits g·(g−1)/2 matched pairs, so its cost grows with its
    own output (sf1 curve exponent 1.56, adjudicated output-bound). At
    100 TB nobody consumes that relation row-by-row; the useful
    bounded contract is "for each record, its k best matches", ≤ N·k
    rows total. Candidate generation is bounded too:

    - *token pass*: df-capped inverted index on (token, brand) — the
      same Σ min(df, cap)² bound as :func:`blocked_candidate_pairs`;
    - *canonical pass*: each record pairs with the ``rep_cap``
      LOWEST-ID REPRESENTATIVES of its identical-(token-set, brand)
      group instead of with every member — Σ g·rep_cap, linear in g.

    Miss condition (documented, deterministic): a record's true k-th
    best match can be a same-group NON-representative whose size is
    closer than every representative's; reps are a fixed deterministic
    sample (lowest ids), so the result is exactly reproducible and the
    oracle encodes the same cap. Groups ≤ rep_cap are exhaustively
    paired (the cap binds nowhere at small scale, so the answer equals
    the uncapped one there). Emits
    (p_partkey, match_key, score, rank) with rank 1..k by
    (score DESC, match_key ASC).

    Brand equality is threshold-necessary above 0.7 (see
    :func:`score_part_pairs`), so both passes block on it.
    """
    if threshold <= 0.7:
        raise ValueError(
            "part_topk_matches requires threshold > 0.7 (brand-equality "
            "blocking is threshold-derived; below 0.7 use the all-pairs "
            "contract)"
        )
    # Same candidate machinery and score definition as the all-pairs
    # contract (blocked_candidate_pairs + _score_part_candidates) —
    # only the canonical pass runs rep-capped. min_jaccard stays 0:
    # the prune exists to shrink an UNBOUNDED verify join, but here
    # candidates are already df- and rep-capped, and its survivor-count
    # machinery re-references the posting subtree (plan audit: 29→17
    # exchanges without it) — the post-threshold match set is identical
    # either way (the prune is recall-lossless by construction).
    pairs = blocked_candidate_pairs(
        part, "p_partkey", "p_name", max_df=max_df,
        block_cols=["p_brand"], carry_cols=["p_brand", "p_size"],
        rep_cap=rep_cap,
    )
    matched = (
        _score_part_candidates(pairs)
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", F.col("score").alias("__score"))
    )
    directed = matched.select(
        F.col("id_a").alias("p_partkey"),
        F.col("id_b").alias("match_key"),
        "__score",
    ).unionByName(
        matched.select(
            F.col("id_b").alias("p_partkey"),
            F.col("id_a").alias("match_key"),
            "__score",
        )
    )
    tw = Window.partitionBy("p_partkey").orderBy(
        F.col("__score").desc(), F.col("match_key").asc()
    )
    return (
        directed.withColumn("rank", F.row_number().over(tw))
        .filter(F.col("rank") <= k)
        .select(
            "p_partkey",
            "match_key",
            F.col("rank").cast("int").alias("rank"),
            F.round("__score", 6).alias("score"),
        )
        .orderBy("p_partkey", "rank")
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
    edges = score_part_pairs(part, threshold=threshold, max_df=max_df).select(
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
