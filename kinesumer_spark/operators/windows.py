"""Window-function surface (SURVEY.md §2.2 "Window functions").

The reference has no windowed computation; this is declared engine
surface. Determinism discipline: every ORDER BY inside a window ends
with a unique key (tie-break), frames are spelled out as ROWS (never
the implicit RANGE default), and windowed sums go through the exact
decimal path — so results are identical under any partitioning and in
the DuckDB oracle.

Scale notes: a window partitioned by a key is one shuffle on that key;
running frames then evaluate without further exchange. Top-k per group
via row_number is the scalable pattern (no global sort; only the final
small result is ordered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.functions.exact import dec
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


_TOPK_ORACLE = """
SELECT p_brand, p_partkey, p_name, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) WHERE rn <= 3
ORDER BY p_brand, rn
"""


@register("window_topk_per_group", oracle=_TOPK_ORACLE, tags=("window", "topk"))
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by retail price (row_number ≤ k pattern)."""
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.col("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    )


_RUNNING_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_qty
FROM lineitem
WHERE l_suppkey <= 3
ORDER BY l_suppkey, l_orderkey, l_linenumber
"""


@register("window_running_sum", oracle=_RUNNING_ORACLE, tags=("window",))
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running quantity per supplier over ship order (cumulative ROWS frame)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 3)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        l.withColumn("running_qty", F.sum(dec("l_quantity")).over(w).cast("double"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


_LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       LAG(o_totalprice)  OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price
FROM orders
WHERE o_custkey <= 20
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, orderdate, o_orderkey
"""


@register("window_lag_lead", oracle=_LAG_ORACLE, tags=("window",))
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next order price per customer (lag/lead, no arithmetic)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
        )
        .orderBy("o_custkey", "orderdate", "o_orderkey")
    )


_RANK_ORACLE = """
SELECT s_suppkey, s_name, s_acctbal,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       NTILE(4)       OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank
FROM supplier
WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
ORDER BY rnk, s_suppkey
"""


@register("window_rank_forms", oracle=_RANK_ORACLE, tags=("window",))
def window_rank_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank over account balance."""
    s = _t(spark, sf_dir, "supplier")
    w = W.orderBy(F.desc("s_acctbal"), F.col("s_suppkey"))
    return (
        s.select(
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
        )
        .orderBy("rnk", "s_suppkey")
    )


_FIRSTLAST_ORACLE = """
SELECT l_orderkey,
       FIRST_VALUE(l_partkey) OVER w AS first_part,
       LAST_VALUE(l_partkey)  OVER w AS last_part,
       NTH_VALUE(l_partkey, 2) OVER w AS second_part
FROM lineitem
WHERE l_orderkey <= 100
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) = 1
ORDER BY l_orderkey
"""


@register("window_first_last_nth", oracle=_FIRSTLAST_ORACLE, tags=("window",))
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over a full-partition ROWS frame."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    frame = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    rn = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            F.first("l_partkey").over(frame).alias("first_part"),
            F.last("l_partkey").over(frame).alias("last_part"),
            F.nth_value("l_partkey", 2).over(frame).alias("second_part"),
        )
        .withColumn("rn", F.row_number().over(rn))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "first_part", "last_part", "second_part")
        .orderBy("l_orderkey")
    )


_RANGE_ORACLE = """
SELECT o_custkey, o_orderkey, day_no,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day_no
                      RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
       AS orders_last_90d
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(epoch(o_orderdate) / 86400 AS BIGINT) AS day_no
  FROM orders WHERE o_custkey <= 20
)
ORDER BY o_custkey, day_no, o_orderkey
"""


@register("window_range_frame", oracle=_RANGE_ORACLE, tags=("window",))
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric day column: trailing-90-day order count."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 20)
        .withColumn(
            "day_no", (F.unix_timestamp("o_orderdate") / 86400).cast("bigint")
        )
    )
    w = W.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-90, 0)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "day_no",
            F.count("*").over(w).alias("orders_last_90d"),
        )
        .orderBy("o_custkey", "day_no", "o_orderkey")
    )


_CUME_ORACLE = """
SELECT c_custkey,
       c_nationkey,
       cume_dist() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
         AS cd,
       CAST(count(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_in_nation
FROM customer
ORDER BY c_custkey
LIMIT 1000
"""


@register("window_cume_dist", oracle=_CUME_ORACLE, tags=("window",))
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist over (nation, balance) — the remaining ranked-window
    form beside rank/dense_rank/ntile/percent_rank (window_rank_forms):
    cumulative distribution position, exact because it is rows-≤-me /
    rows-total (one int→int division per row; ties broken by custkey so
    both engines see the same total order)."""
    d = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        d.select(
            "c_custkey",
            "c_nationkey",
            F.cume_dist().over(w).alias("cd"),
            F.count(F.lit(1))
            .over(W.partitionBy("c_nationkey"))
            .cast("bigint")
            .alias("n_in_nation"),
        )
        .orderBy("c_custkey")
        .limit(1000)
    )
