"""Frequent-itemset mining (market-basket co-occurrence) — the
pairwise core of A-priori (Agrawal/Srikant, public) expressed as
DataFrame ops. The reference has no itemset surface (extension brief:
large-scale pipeline analytics); this gives "parts bought together"
over the order/lineitem star.

Scale shape, in order of importance at 100 TB:
- **A-priori pruning before pair expansion**: an item in a frequent
  pair must itself be frequent, so infrequent items are dropped with
  one aggregate + semi-join BEFORE the quadratic-in-basket-size
  self-join. On a heavy-tailed catalog this removes most of the join
  input.
- **Basket-size cap**: a basket of size m emits m(m-1)/2 pairs; a few
  pathological baskets (a crawler's cart, a test account) can dominate
  the shuffle. Baskets larger than ``max_basket`` are dropped — the
  standard bound (they contribute noise pairs, not signal support).
- The pair self-join is an equi-join on the basket key with the
  ``item_a < item_b`` canonical ordering applied in the join condition
  itself, so each unordered pair is produced once — no post-hoc dedup
  shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    max_basket: int = 1000,
    k: int = 100,
) -> DataFrame:
    """Unordered item pairs co-occurring in ≥ ``min_support`` distinct
    baskets, top ``k`` by support (desc; item ids asc as tiebreak).
    Input rows are (basket, item) — duplicates within a basket are
    collapsed first so support counts baskets, not rows.
    """
    b = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
        .persist()  # referenced by the cap, the item-support agg, and both join sides
    )
    sizes = b.groupBy("basket").agg(F.count("*").alias("__m"))
    b = b.join(
        sizes.filter(F.col("__m") <= max_basket).select("basket"), "basket"
    )
    frequent_items = (
        b.groupBy("item")
        .agg(F.count("*").alias("__sup"))
        .filter(F.col("__sup") >= min_support)
        .select("item")
    )
    pruned = b.join(frequent_items, "item").select("basket", "item")
    a = pruned.alias("a")
    c = pruned.alias("c")
    pairs = a.join(
        c,
        (F.col("a.basket") == F.col("c.basket"))
        & (F.col("a.item") < F.col("c.item")),
    ).select(F.col("a.item").alias("item_a"), F.col("c.item").alias("item_b"))
    out = (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
        .orderBy(
            F.col("support").desc(),
            F.col("item_a").asc(),
            F.col("item_b").asc(),
        )
        .limit(k)
    )
    # Materialize the ≤k-row result, then drop the cached basket
    # relation — a long-lived session running many queries must not
    # accumulate per-query cached relations (same policy as
    # ann_recall_report / curation_funnel).
    rows = out.collect()
    schema = out.schema
    b.unpersist()
    return df.sparkSession.createDataFrame(rows, schema)
