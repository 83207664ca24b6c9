"""Plan audits for the skew/layout join strategies (operators/skew.py):
the salted join must actually join on the widened (key, salt) pair, and
the bucketed join must be exchange-free. Value correctness for both is
covered by the oracle gate (tests/test_oracle_queries.py)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from kinesumer_spark.plans.inspect import plan_string
from kinesumer_spark.registry import all_queries

from .conftest import SF_SMALL


def _df(spark, name):
    return all_queries()[name].spark(spark, SF_SMALL)


def test_salted_join_keys_include_salt(spark):
    """The SortMergeJoin keys must contain BOTH the custkey pair and the
    salt pair — a salt dropped from the join condition would silently
    multiply every group's counts by the replication factor (the oracle
    would catch the values; this pins the mechanism)."""
    plan = plan_string(_df(spark, "join_skew_salted"))
    assert "SortMergeJoin" in plan, plan
    lm = re.search(r"Left keys \[\d+\]: \[([^\]]*)\]", plan)
    rm = re.search(r"Right keys \[\d+\]: \[([^\]]*)\]", plan)
    assert lm and rm, f"no join key lists in plan:\n{plan}"
    left, right = lm.group(1), rm.group(1)
    assert "o_custkey" in left and "salt_o" in left, left
    assert "c_custkey" in right and "salt_c" in right, right


def test_salted_join_spreads_hot_key_across_partitions(spark):
    """The point of salting: one key's rows must land in >1 shuffle
    partition. Join the salted fact side's (key, salt) distribution and
    check a key with many rows occupies multiple salt buckets."""
    from kinesumer_spark.catalog import read_table

    o = read_table(spark, SF_SMALL, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(8)).cast("int")
    )
    n_salts = (
        o.groupBy("o_custkey")
        .agg(F.countDistinct("salt").alias("s"), F.count("*").alias("n"))
        .filter(F.col("n") >= 8)
        .agg(F.min("s"))
        .collect()[0][0]
    )
    # a customer with >=8 orders should hash across >=2 of 8 salts
    assert n_salts is None or n_salts >= 2, n_salts


def test_partitioned_scan_prunes_to_one_day(spark):
    """The one-day filter must appear as a PartitionFilter on the scan
    (metadata-only pruning) — not merely as a post-scan Filter — and the
    scan must report exactly one selected partition."""
    df = _df(spark, "events_partitioned_prune")
    plan = plan_string(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, f"no PartitionFilters in plan:\n{plan}"
    assert "day" in m.group(1), m.group(1)
    # formatted plans print the scan's partition count selected/total
    pc = re.search(r"partition count: (\d+)", plan)
    if pc:  # spark prints this in most formatted-scan variants
        assert pc.group(1) == "1", plan


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed on the join key → SortMergeJoin with ZERO
    Exchange operators anywhere in the plan (the write paid the shuffle;
    the groupBy on o_orderpriority still exchanges, so the assertion is
    scoped to the join subtree via the simple-plan prefix)."""
    df = _df(spark, "join_bucketed_colocated")
    plan = plan_string(df, mode="simple")
    join_subtree = plan[plan.index("SortMergeJoin") :]
    assert "Exchange" not in join_subtree, join_subtree
    assert "SortMergeJoin" in plan, plan


def test_zorder_bounds_both_dims_unlike_single_key_sort(spark):
    """The point of Z-order: every bucket's min/max stays narrow on BOTH
    dimensions. Build the same number of buckets from a single-key
    (user) sort and compare: the linear layout leaves the hour dimension
    near full-range in its buckets, the z-layout bounds it."""
    from pyspark.sql import functions as F

    from kinesumer_spark.registry import all_queries
    from kinesumer_spark.catalog import read_table

    from .conftest import SF_SMALL

    zb = all_queries()["events_zorder_layout"].spark(spark, SF_SMALL).collect()
    assert len(zb) > 4  # the interleave actually splits into many buckets

    ev = read_table(spark, SF_SMALL, "events").selectExpr(
        "user_id % 65536 AS ux",
        "(unix_micros(ts) div 3600000000) % 65536 AS hx",
    )
    lo_h, hi_h = ev.agg(F.min("hx"), F.max("hx")).first()
    full_hour_range = hi_h - lo_h

    # single-key layout: same bucket count, split by user rank
    n_buckets = len(zb)
    linear = (
        ev.selectExpr(
            "ux", "hx",
            f"cast(ux * {n_buckets} / 65536 AS int) AS bucket",
        )
        .groupBy("bucket")
        .agg((F.max("hx") - F.min("hx")).alias("hr"))
        .collect()
    )
    lin_avg_hr = sum(r["hr"] for r in linear) / len(linear)
    z_avg_hr = sum(r["max_hour"] - r["min_hour"] for r in zb) / len(zb)
    # linear user-sort cannot bound the hour dim: near full range per
    # bucket; z-order must do strictly (and substantially) better
    assert lin_avg_hr > 0.5 * full_hour_range, (lin_avg_hr, full_hour_range)
    assert z_avg_hr < 0.5 * lin_avg_hr, (z_avg_hr, lin_avg_hr)
