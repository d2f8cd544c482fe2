"""SQL-front-end queries — the same engine served through
``spark.sql`` over registered views (SURVEY §3.2 note: Catalyst
produces the same plan either way; these prove the SQL surface works
against the same catalog, for users who speak SQL rather than the
DataFrame API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nabatshy_spark.catalog import register_views
from nabatshy_spark.plans.queries import query


@query("sql_top_revenue_brands")
def sql_top_revenue_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup via the SQL API: lineitem ⋈ part, grouped by
    brand, top 10 by revenue."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p.p_brand,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
        ORDER BY revenue DESC, p.p_brand ASC
        LIMIT 10
        """
    )


@query("sql_segment_order_stats")
def sql_segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment customer/order stats via the SQL API."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               count(DISTINCT c.c_custkey) AS n_customers,
               count(o.o_orderkey)         AS n_orders,
               round(avg(o.o_totalprice), 6) AS avg_order_price
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )


@query("sql_grouping_sets_revenue")
def sql_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup in ONE pass via GROUPING SETS —
    (flag, status), (flag), and grand total share a single scan and
    shuffle instead of three union'd aggregations."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query("sql_cheapest_supplier_per_brand")
def sql_cheapest_supplier_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery surface (the TPC-H Q2 shape, adapted
    to this star — no partsupp table): lineitems selling a part at
    that part's corpus-wide minimum price, rolled up per brand.
    Catalyst DECORRELATES the subquery into an aggregate + equi-join
    (one extra shuffle keyed on l_partkey), so the correlated form is
    scale-safe — no per-row re-execution as a naive reading implies."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p.p_brand AS brand,
               count(*) AS n_min_price_lines,
               round(min(l.l_extendedprice), 2) AS cheapest_line
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_extendedprice = (
            SELECT min(l2.l_extendedprice) FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY p.p_brand
        ORDER BY brand
        """
    )


@query("sql_promo_revenue_share")
def sql_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-sum ratio over a join (the TPC-H Q14 shape):
    share of revenue from ECONOMY-type parts in one month. Single
    scan+join, the ratio is arithmetic over two conditional
    aggregates — no second pass."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT round(
                 100.0 * sum(CASE WHEN p.p_type = 'ECONOMY'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6
               ) AS promo_share_pct,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
        """
    )
