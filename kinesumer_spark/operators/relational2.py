"""Advanced relational shapes (TPC-H-inspired, adapted to the fixture
schema): correlated scalar subqueries, EXISTS / NOT EXISTS, IN with
grouped HAVING, disjunctive predicate pushdown, conditional aggregation,
CTE + scalar cross join. These exercise Catalyst's subquery
decorrelation (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery
— rewritten into joins, so they scale like joins, not like per-row
probes).

The Spark side executes the SAME SQL text as the DuckDB oracle (both
are ANSI engines; the surface here was chosen to need no dialect
forks), via temp views registered by catalog.load_tables — proving the
engine's SQL front door, not just the DataFrame API.

All money/quantity aggregates use the shared exact-decimal fragments;
correlated averages are decimal-sum based so the comparison threshold
is bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesumer_spark.catalog import load_tables
from kinesumer_spark.functions.exact import oracle_sum
from kinesumer_spark.registry import register


def _register_sql(name: str, sql: str, tags: tuple[str, ...], doc: str) -> None:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir)
        return spark.sql(sql)

    run.__name__ = name
    run.__doc__ = doc
    register(name, oracle=sql, tags=tags, doc=doc)(run)


_register_sql(
    "q4_late_orders",
    f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    ("subquery", "exists"),
    "TPC-H Q4 shape: EXISTS-correlated count by priority (late shippers).",
)


_register_sql(
    "q7_nation_volume",
    f"""
SELECT supp_nation, cust_nation, l_year,
       {oracle_sum('vol')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS vol
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    ("join", "agg"),
    "TPC-H Q7 shape: bidirectional nation-pair trade volume by year.",
)


_register_sql(
    "q8_market_share",
    """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
       CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS vol,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
    ("join", "agg"),
    "TPC-H Q8 shape: one nation's market share inside a region, by year.",
)


_register_sql(
    "q12_priority_by_flag",
    """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    ("agg",),
    "TPC-H Q12 shape: conditional (CASE) counting by priority class.",
)


_register_sql(
    "q13_order_count_distribution",
    """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    ("join", "agg"),
    "TPC-H Q13 shape: distribution of per-customer order counts "
    "(left join with join-side filter, double aggregation).",
)


_register_sql(
    "q14_promo_revenue",
    """
SELECT (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol
                              ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE))
       / CAST(SUM(vol) AS DOUBLE) AS promo_revenue_pct
FROM (
  SELECT p_type, CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS vol
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
) t
""",
    ("agg",),
    "TPC-H Q14 shape: promotional revenue share for one month.",
)


_register_sql(
    "q17_small_quantity_revenue",
    """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
""",
    ("subquery",),
    "TPC-H Q17 shape: correlated scalar subquery (per-part average "
    "threshold; decimal-exact so both engines compare the same bound).",
)


_register_sql(
    "q18_large_volume_orders",
    """
SELECT c_custkey, o_orderkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250
)
GROUP BY c_custkey, o_orderkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
""",
    ("subquery", "agg", "topk"),
    "TPC-H Q18 shape: IN over a grouped-HAVING subquery (large orders).",
)


_register_sql(
    "q19_disjunctive_predicates",
    f"""
SELECT {oracle_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
    ("filter", "agg"),
    "TPC-H Q19 shape: disjunction of conjunctive range predicates "
    "(common-factor extraction & partial pushdown territory).",
)


_register_sql(
    "q21_waiting_supplier",
    """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
    ("subquery", "exists"),
    "TPC-H Q21 shape: EXISTS + NOT EXISTS with non-equality correlation "
    "(the sole late-shipping supplier on multi-supplier orders).",
)


_register_sql(
    "q22_prospect_customers",
    """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal.v
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    ("subquery", "exists", "agg"),
    "TPC-H Q22 shape: CTE scalar threshold + NOT EXISTS anti-join "
    "(rich customers with no orders).",
)


_register_sql(
    "q15_top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    ("subquery", "agg"),
    "TPC-H Q15 shape: CTE revenue view + uncorrelated scalar MAX subquery "
    "(top supplier for a quarter).",
)


# -- Recursive CTE (Spark 4 WITH RECURSIVE) ----------------------------------

def _recursive_sql(int_div: str) -> str:
    """Shared text of the recursive bill-of-materials walk; only the
    integer-division operator differs (Spark ``div``, DuckDB ``//``)."""
    return f"""
WITH RECURSIVE walk (start_key, node, depth) AS (
  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey % 997 = 1
  UNION ALL
  SELECT start_key, node {int_div} 2, depth + 1
  FROM walk WHERE node > 1
)
SELECT start_key, node, CAST(depth AS INT) AS depth
FROM walk
ORDER BY start_key, depth
"""


@register(
    "sql_recursive_bom",
    oracle=_recursive_sql("//"),
    tags=("sql", "subquery", "iterative"),
)
def sql_recursive_bom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE front-end parity (Spark 4 WITH RECURSIVE): walk a
    synthetic bill-of-materials hierarchy (assembly of part k is
    k div 2) from seed parts up to the root — ancestor-chain traversal
    in PURE SQL, no driver loop. The engine executes the recursion as
    iterated UNION steps (the same microbatch-per-level shape as the
    hand-built BFS in graph_bfs_copurchase — that one remains the
    broadcast-optimized form for fact-derived graphs; this one is the
    declarative spelling). Strictly decreasing keys bound the depth at
    log₂(max key). Identical SQL runs on DuckDB, modulo the integer
    division spelling (div vs //)."""
    load_tables(spark, sf_dir)
    return spark.sql(_recursive_sql("div"))
