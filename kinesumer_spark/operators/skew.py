"""Skew- and layout-aware join strategies: explicit key salting and
bucketed (pre-partitioned) co-located joins.

Why these are first-class queries and not just tests (100 TB): the two
ways a big join dies at scale are (a) one hot key concentrating a
reducer's worth of rows in a single task, and (b) re-shuffling the same
fact table on the same key every single run. Salting fixes (a) by
spreading each hot key over S sub-keys; bucketing fixes (b) by paying
the shuffle ONCE at write time so every later join on the bucket key is
exchange-free. Both rewrites are semantics-preserving — proven here by
DuckDB oracles that run the PLAIN join — and both have plan audits in
tests/test_skew_ops.py (salt present in the join keys; zero Exchange
under the bucketed join).

Reference parity: kinesumer delegates all analytics to its application
(kinesumer.go:346-370); this module is SURVEY.md §2 "joins: skew/
layout scale paths" surface. AQE's skew-join split (OptimizeSkewedJoin)
covers sort-merge joins adaptively; the explicit salt form here is the
one that also works for hash-aggregate fan-in and for engines/settings
where AQE is off — and it documents the exact rewrite AQE performs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.functions.exact import exact_sum, oracle_sum
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


_SALT_BUCKETS = 8

_SALTED_JOIN_ORACLE = f"""
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       {oracle_sum('o_totalprice')} AS sum_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register("join_skew_salted", oracle=_SALTED_JOIN_ORACLE, tags=("join", "skew"))
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted inner join: orders ⨝ customer with the join key
    widened to (custkey, salt) — identical result to the plain join,
    proven by the oracle running the unsalted form.

    The rewrite: the probe/fact side (orders) gets a deterministic
    salt = pmod(xxhash64(o_orderkey), S); the build/dim side (customer)
    is replicated S× with one row per salt value. Every fact row still
    meets exactly one replica of its key, so the join result is
    bit-identical — but a key that used to land in ONE task's hash
    bucket now spreads across S tasks. The salt value itself never
    affects the output (any per-row deterministic salt works), which is
    why the plain-join oracle hash-matches.

    Cost model at 100 TB: replication multiplies dim bytes by S — pick
    S ≈ (hottest-key rows / target task rows), not a large constant;
    salting only the hot keys (replicate dim rows for hot keys S×,
    others 1×, after a cheap key-frequency sketch) bounds that blowup.
    AQE's OptimizeSkewedJoin performs this split adaptively for
    sort-merge joins; the explicit form is the portable rewrite. The
    merge hint forces the shuffle-join path so the salt actually
    spreads work (a broadcast would hide the property at test SF — and
    at 100 TB the dim wouldn't broadcast).
    """
    o = _t(spark, sf_dir, "orders").withColumn(
        "salt_o", F.pmod(F.xxhash64("o_orderkey"), F.lit(_SALT_BUCKETS)).cast("int")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .withColumn(
            "salt_c", F.explode(F.sequence(F.lit(0), F.lit(_SALT_BUCKETS - 1)))
        )
    )
    return (
        o.hint("merge")
        .join(
            c,
            (o.o_custkey == c.c_custkey) & (F.col("salt_o") == F.col("salt_c")),
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum("o_totalprice", "sum_totalprice"),
        )
        .orderBy("c_nationkey")
    )


_PRUNE_DAY = "2024-01-15"

_PRUNE_ORACLE = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {oracle_sum('value')} AS sum_value
FROM events
WHERE ts >= TIMESTAMP '{_PRUNE_DAY} 00:00:00'
  AND ts < TIMESTAMP '{_PRUNE_DAY} 00:00:00' + INTERVAL 1 DAY
GROUP BY event_type
ORDER BY event_type
"""


@register("events_partitioned_prune", oracle=_PRUNE_ORACLE, tags=("layout", "prune"))
def events_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan over a day-partitioned events layout: the
    table is written `partitionBy(day)`, and a one-day query reads ONLY
    that day's directory — the scan's PartitionFilters prune every other
    partition before a single byte is read (plan-audited in
    tests/test_skew_ops.py).

    This is the time-series data-skipping primitive at 100 TB: a year of
    events is ~365 partitions, and the overwhelmingly common "last
    day/week" queries touch 0.3–2% of the bytes. Partition pruning is
    metadata-only (directory listing), unlike row-group min/max skipping
    which still opens footers — both compose here since each partition's
    files stay ts-clustered. Partition granularity rule of thumb: keep
    partitions ≥ ~1 GB (here: day) — hour×type double-partitioning at
    low volume produces the small-files problem the bucketed layout
    above avoids.

    The day column derives from ts in UTC (catalog.read_table pins the
    session zone), so the oracle's half-open [day, day+1) timestamp
    range selects exactly the rows of the pruned partition.
    """
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/kinesumer_spark_partitions/{tag}/events"
    (
        _t(spark, sf_dir, "events")
        .withColumn("day", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .filter(F.col("day") == F.lit(_PRUNE_DAY).cast("date"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", "sum_value"),
        )
        .orderBy("event_type")
    )


_BUCKETED_JOIN_ORACLE = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       {oracle_sum('l_extendedprice')} AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_N_BUCKETS = 8


def _bucketed_table(
    spark: SparkSession, sf_dir: str, table: str, key: str, tag: str
) -> DataFrame:
    """Write ``table`` bucketed on ``key`` (once per sf_dir content tag;
    overwrite keeps reruns idempotent) and read it back with bucket
    metadata attached."""
    name = f"kbkt_{table}_{tag}"
    path = f"/tmp/kinesumer_spark_buckets/{tag}/{table}"
    # a stale registration from an earlier run with a different path or
    # schema would make saveAsTable fail — drop first, it's metadata only
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        _t(spark, sf_dir, table)
        .write.mode("overwrite")
        .bucketBy(_N_BUCKETS, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(name)
    )
    return spark.table(name)


@register("join_bucketed_colocated", oracle=_BUCKETED_JOIN_ORACLE, tags=("join", "bucket"))
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⨝fact join with ZERO exchanges: both sides written bucketed
    on the join key, so the sort-merge join reads co-located buckets
    directly (plan-audited: no Exchange operator under the join,
    tests/test_skew_ops.py).

    This is the "pay the shuffle once" layout story for the one
    remaining fact-fact shuffle at 100 TB: lineitem ⨝ orders on
    orderkey re-shuffles ~both tables' full bytes on EVERY query; a
    bucketed table layout moves that cost to write time, after which
    every orderkey-join (and orderkey-groupBy, via the same hash
    distribution) is exchange-free. Bucket count at scale is chosen so
    each bucket file lands near the 128–256 MB scan-split sweet spot —
    e.g. ~100k buckets for 25 TB of lineitem; here 8 keeps the fixture
    readable. The sortBy makes each bucket file pre-sorted so the SMJ
    also skips the per-task sort after an exchange-free read.

    The write (an action) runs inside this builder — the returned
    DataFrame then plans against the bucketed tables; the merge hint
    pins the SMJ path so AQE/broadcast can't mask the layout property
    being demonstrated at small SF.
    """
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey", tag)
    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey", tag)
    return (
        li.select("l_orderkey", "l_extendedprice")
        .hint("merge")
        .join(
            o.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum("l_extendedprice", "sum_price"),
        )
        .orderBy("o_orderpriority")
    )
