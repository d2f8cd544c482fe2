"""DuckDB oracle SQL — one ANSI-SQL statement per registry query, with
column aliases matching the Spark side byte-for-byte (the driver sorts
columns by name before hashing).

DuckDB specifics handled here:
- ``sum`` over integers returns HUGEINT → cast ``::BIGINT`` to match
  Spark's LongType;
- ``epoch_us(ts) // 1000000`` is the exact integer-floor epoch that
  Spark's ``unix_timestamp`` produces;
- ``quantile_cont`` == Spark exact ``percentile`` (linear interpolation);
- double aggregates rounded identically to the Spark side (see
  plans/queries.py float policy).
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}

ORACLES["pricing_summary"] = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                          AS sum_qty,
  round(sum(l_extendedprice), 2)                                     AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
  round(avg(l_quantity), 6)                                          AS avg_qty,
  round(avg(l_extendedprice), 6)                                     AS avg_price,
  round(avg(l_discount), 6)                                          AS avg_disc,
  count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["endpoint_stats"] = """
SELECT
  l_returnflag,
  l_linestatus,
  count(*)                                    AS call_count,
  round(avg(l_extendedprice), 6)              AS avg_price,
  min(l_extendedprice)                        AS min_price,
  max(l_extendedprice)                        AS max_price,
  round(quantile_cont(l_extendedprice, 0.5), 6)  AS p50_price,
  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["trace_rollup"] = """
SELECT
  l_orderkey,
  count(*)           AS span_count,
  max(l_extendedprice) AS max_price,
  min(l_shipdate)    AS first_ship
FROM lineitem
GROUP BY l_orderkey
ORDER BY max_price DESC, l_orderkey ASC
LIMIT 100
"""

ORACLES["error_rate_by_priority"] = """
WITH stats AS (
  SELECT o_orderpriority, avg(o_totalprice) AS avg_price
  FROM orders GROUP BY o_orderpriority
)
SELECT
  o.o_orderpriority                                        AS priority,
  count(*)                                                 AS total_count,
  sum(CASE WHEN o.o_totalprice > 2 * s.avg_price THEN 1 ELSE 0 END)::BIGINT
                                                           AS issue_count,
  round(sum(CASE WHEN o.o_totalprice > 2 * s.avg_price THEN 1 ELSE 0 END)
        / count(*) * 100.0, 6)                             AS error_rate
FROM orders o JOIN stats s ON o.o_orderpriority = s.o_orderpriority
GROUP BY o.o_orderpriority
"""

ORACLES["distinct_segments"] = """
SELECT DISTINCT c_mktsegment FROM customer
"""

ORACLES["top_event_types"] = """
SELECT event_type, round(avg(value), 6) AS avg_value, count(*) AS n
FROM events
GROUP BY event_type
ORDER BY avg_value DESC
LIMIT 10
"""

ORACLES["pct_vs_baseline"] = """
WITH t AS (SELECT event_type, avg(value) AS a FROM events GROUP BY event_type),
     g AS (SELECT avg(value) AS ga FROM events)
SELECT
  t.event_type,
  round(t.a, 6)                          AS avg_value,
  round((t.a - g.ga) / g.ga * 100.0, 6)  AS pct_diff
FROM t, g
"""

ORACLES["slowest_traces"] = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderdate DESC, o_orderkey ASC
LIMIT 100
"""

ORACLES["point_lookup"] = """
SELECT * FROM events WHERE event_id = 4242
"""

ORACLES["search_page"] = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
WHERE event_type = 'click'
ORDER BY ts DESC, event_id ASC
LIMIT 20 OFFSET 40
"""

ORACLES["search_dsl_typed"] = """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE event_type = 'error' AND json_extract_string(props, '$.k') = '42'
"""

ORACLES["search_dsl_fallback"] = """
SELECT event_id, event_type, value
FROM events
WHERE event_type = 'purchase'
   OR COALESCE(json_extract_string(props, '$.k'), '') = 'purchase'
"""

ORACLES["service_dependency"] = """
SELECT
  s1.l_returnflag AS parent_flag,
  s2.l_returnflag AS child_flag,
  count(*)        AS call_count
FROM lineitem s1
JOIN lineitem s2
  ON s1.l_orderkey = s2.l_orderkey
 AND s2.l_linenumber = s1.l_linenumber + 1
WHERE s1.l_suppkey != s2.l_suppkey
GROUP BY s1.l_returnflag, s2.l_returnflag
"""

ORACLES["region_nation_rollup"] = """
SELECT
  r.r_name,
  n.n_name,
  count(*)                  AS n_customers,
  round(avg(c.c_acctbal), 6) AS avg_acctbal,
  round(sum(c.c_acctbal), 2) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""

ORACLES["hourly_heatmap"] = """
SELECT
  date_trunc('hour', ts)   AS bucket,
  count(*)                 AS n,
  round(avg(value), 6)     AS avg_value,
  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS err_count
FROM events
GROUP BY date_trunc('hour', ts)
ORDER BY bucket ASC
LIMIT 24
"""

ORACLES["dynamic_buckets"] = """
WITH s AS (
  SELECT min(epoch_us(ts) // 1000000) AS lo, max(epoch_us(ts) // 1000000) AS hi
  FROM events
)
SELECT
  (epoch_us(ts) // 1000000)
    - (epoch_us(ts) // 1000000) % greatest((s.hi - s.lo) // 15, 1) AS bucket_epoch,
  count(*)             AS n,
  round(avg(value), 6) AS avg_value
FROM events, s
GROUP BY bucket_epoch
ORDER BY bucket_epoch
"""

ORACLES["gapfill_series"] = """
WITH buckets AS (
  SELECT unnest(generate_series(1704067200, 1704239999, 3600)) AS bucket_epoch
),
agg AS (
  SELECT
    (epoch_us(ts) // 1000000) - (epoch_us(ts) // 1000000) % 3600 AS bucket_epoch,
    count(*) AS n
  FROM events
  WHERE event_type = 'purchase' AND value > 45
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-03 00:00:00'
  GROUP BY 1
)
SELECT b.bucket_epoch, COALESCE(a.n, 0)::BIGINT AS n
FROM buckets b LEFT JOIN agg a ON b.bucket_epoch = a.bucket_epoch
ORDER BY b.bucket_epoch
"""

_CM_IV = (1705276800 - 1704067200) // 15  # 80640s, range/15 (utils.go:81-85)
# toStartOfInterval aligns to the absolute epoch, so the padded series
# starts at the *aligned* range start (utils/utils.go:74-79).
_CM_ALIGNED = 1704067200 - (1704067200 % _CM_IV)

ORACLES["combined_metrics"] = f"""
WITH buckets AS (
  SELECT unnest(generate_series({_CM_ALIGNED}, 1705276799, {_CM_IV})) AS bucket_epoch
),
agg AS (
  SELECT
    (epoch_us(ts) // 1000000) - (epoch_us(ts) // 1000000) % {_CM_IV} AS bucket_epoch,
    round(quantile_cont(value, 0.95), 6) AS p95_value,
    count(*)                             AS n,
    round(avg(value), 6)                 AS avg_value
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-15 00:00:00'
  GROUP BY 1
)
SELECT
  b.bucket_epoch,
  COALESCE(a.p95_value, 0.0)  AS p95_value,
  COALESCE(a.n, 0)::BIGINT    AS n,
  COALESCE(a.avg_value, 0.0)  AS avg_value
FROM buckets b LEFT JOIN agg a ON b.bucket_epoch = a.bucket_epoch
ORDER BY b.bucket_epoch
"""

ORACLES["relative_window"] = """
WITH mx AS (SELECT max(ts) AS m FROM events)
SELECT event_type, count(*) AS n, round(avg(value), 6) AS avg_value
FROM events, mx
WHERE ts >= mx.m - INTERVAL 1 DAY
GROUP BY event_type
"""
