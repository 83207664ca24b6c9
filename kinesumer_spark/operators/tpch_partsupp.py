"""TPC-H Q2/Q9/Q11/Q16/Q20 shapes over a DERIVED partsupp relation.

The driver's testdata has no ``partsupp`` table (TESTDATA.md), which
excluded these five canonical shapes through r4 (COVERAGE.md). They
matter because each exercises a distinct planner path no other
registered query hits in combination:

- Q2  — correlated scalar MIN subquery equated in WHERE (decorrelated
        into a join against a grouped MIN, then re-joined).
- Q9  — 6-way fact⨝dims join with a composite-key (partkey, suppkey)
        fact-to-derived-fact join and an expression GROUP BY.
- Q11 — grouped HAVING against an uncorrelated scalar aggregate
        (global total), i.e. two scans of the same derived relation.
- Q16 — COUNT(DISTINCT) with a NOT IN anti-join inside the aggregation
        input.
- Q20 — IN-subquery whose inner WHERE carries a correlated scalar SUM
        over lineitem (double decorrelation).

Rather than skip them, partsupp is DERIVED deterministically from
part × {0,1,2,3} (the TPC-H generator itself assigns each part exactly
4 suppliers — dbgen's PS_SUPPKEY formula; public spec §4.2.3). All
arithmetic is integer (supplycost kept in CENTS as BIGINT), so Spark
and the DuckDB oracle rebuild byte-identical relations from the same
CTE text — the whole query, derivation included, is hash-checked.
Supplier fan-out uses offsets {0,17,34,51} mod |supplier|, distinct for
every tested scale (|S| ∈ {10, 100, 1000} divides none of 17/34/51).

Scale: partsupp is 4×|part| rows built map-side from a part scan — no
shuffle, no driver collect (|S| enters as a scalar subquery the
optimizer turns into a broadcast). At 100 TB the same text would read a
real partsupp table; every join below is still keyed and
broadcast-eligible on the dim side.

Reference parity: the reference delegates all SQL to the application
(kinesumer.go:97-102 — opaque records); these shapes are part of the
declared analytic surface in SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesumer_spark.catalog import load_tables
from kinesumer_spark.registry import register

# Derived partsupp: 4 suppliers per part, integer-cents supplycost.
# Offsets {0,17,34,51} mod |S| are pairwise distinct for |S| ∈ {10,100,
# 1000}; availqty ∈ [1,1000]; supplycost_cents ∈ [10000,99999] ⇒
# supplycost ∈ [100.00, 999.99] exact at 2 decimals.
_PS_CTE = """partsupp AS (
  SELECT p_partkey AS ps_partkey,
         CAST((p_partkey + i.i * 17) % (SELECT COUNT(*) FROM supplier) AS BIGINT)
           AS ps_suppkey,
         CAST((p_partkey * 31 + i.i * 7) % 1000 + 1 AS BIGINT) AS ps_availqty,
         CAST((p_partkey * 13 + i.i * 101) % 90000 + 10000 AS BIGINT)
           AS ps_supplycost_cents
  FROM part
  CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1
              UNION ALL SELECT 2 UNION ALL SELECT 3) i
)"""


def _register_sql(name: str, sql: str, tags: tuple[str, ...], doc: str) -> None:
    """Same-SQL-both-engines registration (pattern: relational2.py:28)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir)
        return spark.sql(sql)

    run.__name__ = name
    run.__doc__ = doc
    register(name, oracle=sql, tags=tags, doc=doc)(run)


_register_sql(
    "q2_min_cost_supplier",
    f"""
WITH {_PS_CTE}
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
       CAST(ps.ps_supplycost_cents AS DOUBLE) / 100 AS ps_supplycost
FROM part p
JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE p.p_size = 15
  AND r.r_name = 'EUROPE'
  AND ps.ps_supplycost_cents = (
    SELECT MIN(ps2.ps_supplycost_cents)
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
""",
    ("tpch", "subquery", "partsupp"),
    "TPC-H Q2 shape: region-scoped minimum-cost supplier per part via a "
    "correlated scalar MIN subquery (total ORDER BY ⇒ LIMIT is "
    "deterministic).",
)


_register_sql(
    "q9_product_type_profit",
    f"""
WITH {_PS_CTE}
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - ps.ps_supplycost_cents * l.l_quantity / 100.0
                AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                AND ps.ps_suppkey = l.l_suppkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
ORDER BY nation, o_year DESC
""",
    ("tpch", "join", "partsupp"),
    "TPC-H Q9 shape: profit by nation and order-year through a 6-way "
    "join incl. the composite-key (partkey, suppkey) partsupp probe; "
    "exact-decimal profit sum.",
)


_register_sql(
    "q11_important_stock",
    f"""
WITH {_PS_CTE}
SELECT ps.ps_partkey,
       CAST(SUM(ps.ps_supplycost_cents * ps.ps_availqty) AS DOUBLE) / 100
         AS part_value
FROM partsupp ps
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_regionkey = 3
GROUP BY ps.ps_partkey
HAVING SUM(ps.ps_supplycost_cents * ps.ps_availqty) >
  (SELECT 1.5 * SUM(ps2.ps_supplycost_cents * ps2.ps_availqty)
            / COUNT(DISTINCT ps2.ps_partkey)
   FROM partsupp ps2
   JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
   JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
   WHERE n2.n_regionkey = 3)
ORDER BY part_value DESC, ps.ps_partkey
""",
    ("tpch", "having", "partsupp"),
    "TPC-H Q11 shape: per-part stock value filtered by a HAVING against "
    "an uncorrelated global scalar subquery. The threshold is 1.5x the "
    "per-part AVERAGE (TPC-H's fixed fraction divides by SF precisely "
    "because a constant share returns 0 rows as |part| grows — this "
    "form stays selective at every scale). Integer-cents sums stay "
    "exact; the >-threshold double conversion is identical in both "
    "engines below 2^53.",
)


_register_sql(
    "q16_supplier_part_counts",
    f"""
WITH {_PS_CTE}
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 7, 10, 15, 22, 33, 44)
  AND ps.ps_suppkey NOT IN (
    SELECT s.s_suppkey FROM supplier s WHERE s.s_acctbal < 1000)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    ("tpch", "distinct", "partsupp"),
    "TPC-H Q16 shape: distinct-supplier counts per (brand, type, size) "
    "with a NOT IN anti-join excluding low-balance suppliers (all keys "
    "non-null, so NOT IN ≡ anti-join in both engines).",
)


_register_sql(
    "q20_promotable_suppliers",
    f"""
WITH {_PS_CTE}
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_regionkey = 2
  AND s.s_suppkey IN (
    SELECT ps.ps_suppkey FROM partsupp ps
    WHERE ps.ps_partkey IN (
        SELECT p.p_partkey FROM part p WHERE p.p_name LIKE 'red%')
      AND ps.ps_availqty > (
        SELECT 0.5 * SUM(CAST(l.l_quantity AS DECIMAL(18,6)))
        FROM lineitem l
        WHERE l.l_partkey = ps.ps_partkey
          AND l.l_suppkey = ps.ps_suppkey
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'))
ORDER BY s.s_name
""",
    ("tpch", "subquery", "partsupp"),
    "TPC-H Q20 shape: suppliers whose available stock of 'red' parts "
    "exceeds half a year's shipped quantity — IN-subquery with a "
    "correlated scalar SUM inside (double decorrelation); empty "
    "correlated SUM ⇒ NULL ⇒ row filtered, same in both engines.",
)
