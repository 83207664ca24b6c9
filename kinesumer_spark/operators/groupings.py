"""Multi-dimensional aggregation: rollup, cube, grouping sets, pivot
(SURVEY.md §2.2 "Aggregations": rollup/cube/grouping sets).

All are Catalyst `Expand`-based: the input is replicated once per
grouping set before a single hash aggregation — one shuffle total, no
per-set re-scan, which is the right plan at 100 TB (cost scales with
#grouping-sets × input, all map-side partial-aggregated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.functions.exact import exact_sum, oracle_sum
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


_ROLLUP_ORACLE = f"""
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       GROUPING(l_returnflag) + GROUPING(l_linestatus) AS lvl,
       {oracle_sum('l_quantity')} AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY lvl, returnflag, linestatus
"""


@register("agg_rollup", oracle=_ROLLUP_ORACLE, tags=("agg", "grouping"))
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with GROUPING() disambiguating the nulls."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + F.grouping("l_linestatus"))
            .cast("bigint")
            .alias("lvl"),
            exact_sum("l_quantity", "sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "lvl",
            "sum_qty",
            "n",
        )
        .orderBy("lvl", "returnflag", "linestatus")
    )


_CUBE_ORACLE = f"""
SELECT COALESCE(o_orderstatus, '<all>') AS orderstatus,
       COALESCE(o_orderpriority, '<all>') AS orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       {oracle_sum('o_totalprice')} AS sum_price,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY g_status, g_priority, orderstatus, orderpriority
"""


@register("agg_cube", oracle=_CUBE_ORACLE, tags=("agg", "grouping"))
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one pass."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
            exact_sum("o_totalprice", "sum_price"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("orderpriority"),
            "g_status",
            "g_priority",
            "sum_price",
            "n",
        )
        .orderBy("g_status", "g_priority", "orderstatus", "orderpriority")
    )


_GSETS_ORACLE = f"""
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(CAST(l_suppkey AS VARCHAR), '<all>') AS suppkey,
       {oracle_sum('l_extendedprice')} AS sum_price
FROM lineitem
WHERE l_suppkey <= 5
GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
ORDER BY returnflag, suppkey
"""


@register("agg_grouping_sets", oracle=_GSETS_ORACLE, tags=("agg", "grouping"))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (disjoint per-dimension totals)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        f"""
        SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
               COALESCE(CAST(l_suppkey AS STRING), '<all>') AS suppkey,
               {oracle_sum('l_extendedprice')} AS sum_price
        FROM gs_lineitem
        WHERE l_suppkey <= 5
        GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
        ORDER BY returnflag, suppkey
        """
    )


_PIVOT_ORACLE = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS "click",
       COUNT(*) FILTER (WHERE event_type = 'view')     AS "view",
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS "signup",
       COUNT(*) FILTER (WHERE event_type = 'error')    AS "error"
FROM events
GROUP BY day
ORDER BY day
"""


@register("agg_pivot", oracle=_PIVOT_ORACLE, tags=("agg", "pivot"))
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per day into one column per event type.

    Explicit pivot values avoid the extra distinct-values job Spark
    otherwise runs — mandatory at scale.
    """
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0, ["click", "view", "purchase", "signup", "error"])
        .orderBy("day")
    )


# -- Multi-aggregate PIVOT ---------------------------------------------------

_PIVOT_MULTI_ORACLE = """
SELECT c_nationkey,
       CAST(COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS BIGINT)
         AS automobile_n,
       CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                     THEN CAST(c_acctbal AS DECIMAL(18,6)) END) AS DOUBLE)
         AS automobile_bal,
       CAST(COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS BIGINT)
         AS building_n,
       CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                     THEN CAST(c_acctbal AS DECIMAL(18,6)) END) AS DOUBLE)
         AS building_bal,
       CAST(COUNT(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS BIGINT)
         AS machinery_n,
       CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY'
                     THEN CAST(c_acctbal AS DECIMAL(18,6)) END) AS DOUBLE)
         AS machinery_bal
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register("agg_pivot_multi", oracle=_PIVOT_MULTI_ORACLE, tags=("agg", "reshape"))
def agg_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with MULTIPLE aggregates per cell (count + exact balance
    sum per segment column pair) — the wide-report variant of
    agg_pivot; Spark expands it to conditional aggregation internally
    (one keyed shuffle with map-side combine, #groups × #values × #aggs
    partials), which is exactly the rewrite the oracle spells out."""
    from kinesumer_spark.functions.exact import dec

    c = read_table(spark, sf_dir, "customer")
    p = (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", ["AUTOMOBILE", "BUILDING", "MACHINERY"])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(dec("c_acctbal")).cast("double").alias("bal"),
        )
    )
    # pivot emits NULL (not 0) for absent (group, value) count cells;
    # COUNT(CASE …) in the conditional-aggregation spelling emits 0 —
    # coalesce the counts (sums stay NULL on both sides)
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("bigint")  # noqa: E731
    return p.select(
        "c_nationkey",
        z("AUTOMOBILE_n").alias("automobile_n"),
        F.col("AUTOMOBILE_bal").alias("automobile_bal"),
        z("BUILDING_n").alias("building_n"),
        F.col("BUILDING_bal").alias("building_bal"),
        z("MACHINERY_n").alias("machinery_n"),
        F.col("MACHINERY_bal").alias("machinery_bal"),
    ).orderBy("c_nationkey")
