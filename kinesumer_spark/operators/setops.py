"""Set-operation surface (SURVEY.md §2.2 "Set ops").

The reference's only set-shaped code is string-slice membership/equality
(pkg/collection/slice.go:4-24, used for assignment change detection);
the engine exposes the full relational set algebra. Distinct /
except-all / intersect are hash aggregations or shuffles on the full
row — at 100 TB prefer key-projected inputs (as these queries do) so
the shuffle carries only the key columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _rich(spark, sf_dir):
    """Customers with account balance above 8000."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 8000)
        .select("c_custkey")
    )


def _building(spark, sf_dir):
    """Customers in the BUILDING market segment."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )


_UNION_ORACLE = """
SELECT c_custkey, COUNT(*) AS n_dup FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 8000
  UNION ALL
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
) GROUP BY c_custkey ORDER BY c_custkey
"""


@register("set_union_all", oracle=_UNION_ORACLE, tags=("setop",))
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics): overlap shows up as n_dup=2."""
    u = _rich(spark, sf_dir).union(_building(spark, sf_dir))
    return u.groupBy("c_custkey").agg(F.count("*").alias("n_dup")).orderBy("c_custkey")


_INTERSECT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 8000
INTERSECT
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey
"""


@register("set_intersect", oracle=_INTERSECT_ORACLE, tags=("setop",))
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): rich ∩ BUILDING customers."""
    return _rich(spark, sf_dir).intersect(_building(spark, sf_dir)).orderBy("c_custkey")


_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 8000
EXCEPT
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey
"""


@register("set_except", oracle=_EXCEPT_ORACLE, tags=("setop",))
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): rich customers not in BUILDING."""
    return _rich(spark, sf_dir).exceptAll(
        _building(spark, sf_dir)
    ).distinct().orderBy("c_custkey")


_DISTINCT_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
ORDER BY user_id, event_type
"""


@register("set_distinct", oracle=_DISTINCT_ORACLE, tags=("setop",))
def set_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a projected key pair (exact dedup primitive)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select("user_id", "event_type")
        .dropDuplicates()
        .orderBy("user_id", "event_type")
    )


_UNION_BYNAME_ORACLE = """
SELECT kind, key_id, name FROM (
  SELECT 'customer' AS kind, c_custkey AS key_id, c_name AS name FROM customer
  UNION ALL
  SELECT 'supplier' AS kind, s_suppkey AS key_id, s_name AS name FROM supplier
) ORDER BY kind, key_id
"""


@register("set_union_by_name", oracle=_UNION_BYNAME_ORACLE, tags=("setop",))
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName over differently-ordered schemas (the multi-stream merge
    primitive — SURVEY.md §2.1 O4 maps multi-stream Consume to exactly this)."""
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("key_id"),
        F.col("c_name").alias("name"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_suppkey").alias("key_id"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s).orderBy("kind", "key_id")
