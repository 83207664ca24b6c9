"""Scale-path features that small-SF correctness doesn't exercise by
itself: RocksDB streaming state and bucketed co-located joins
(SCALE.md "known scale debts" items, now closed)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.plans.inspect import plan_string

from .conftest import SF_SMALL


def test_rocksdb_state_store_runs_stateful_query(spark, tmp_path):
    """A streaming stateful aggregation runs on the RocksDB state store
    provider (the off-heap/on-disk state backend for 100 TB keyed
    state) and produces the same result as the default provider."""
    from kinesumer_spark.catalog import events_raw_schema

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(events_raw_schema(spark, SF_SMALL))
            .option("pathGlobFilter", "events.parquet")
            .parquet(SF_SMALL)
        )
        agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("t_rocksdb")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
        got = {r["event_type"]: r["n"] for r in spark.sql("select * from t_rocksdb").collect()}
        want = {
            r["event_type"]: r["n"]
            for r in read_table(spark, SF_SMALL, "events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
        # the state store actually was RocksDB (checkpoint layout proof:
        # RocksDB checkpoints write .zip snapshots / .changelog files,
        # HDFSBackedStateStore writes .delta/.snapshot)
        state_dir = tmp_path / "ck" / "state"
        assert state_dir.exists()
        names = [p.name for p in state_dir.rglob("*") if p.is_file()]
        assert any(
            n.endswith(".zip") or n.endswith(".changelog") for n in names
        ), names[:20]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Fact⨝fact co-located join: both sides bucketed on the join key →
    SortMergeJoin with NO shuffle exchange (the pre-partitioning story
    for the one remaining fact-fact shuffle at 100 TB)."""
    # warehouse dir is a static conf, pointed at a temp dir in conftest
    orders = read_table(spark, SF_SMALL, "orders")
    lineitem = read_table(spark, SF_SMALL, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    # at this SF the dim side would broadcast (also shuffle-free, but it
    # hides the bucketing property under test); force the sort-merge path
    # (incl. past the r17 session default preferSortMergeJoin=false — this
    # test pins SMJ-specific machinery, not the session's join choice)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0"
    )
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_string(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        n = j.count()
        expect = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
        )
        assert n == expect
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.join.preferSortMergeJoin")
        spark.conf.unset(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime bloom-filter join pruning (SPARK-32268): a selective dim
    filter is compiled into a bloom_filter_agg on the build side and
    pushed into the fact scan as a might_contain probe — the row-level
    skipping tier between static partition pruning and the join itself.

    At 100 TB this engages by itself: the defaults require a >10 GB
    application-side scan (far above any local fixture), so the test
    lowers that threshold to 0 and disables broadcast (the bloom path
    targets shuffle joins; a broadcastable dim already prunes via DPP).
    The assertion is on the optimized plan: bloom filter built from the
    filtered orders side, applied over lineitem's orderkey."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = read_table(spark, SF_SMALL, "lineitem")
        o = read_table(spark, SF_SMALL, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = plan_string(j)
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_skew_join_split_fires(spark):
    """AQE's OptimizeSkewedJoin (the engine-native tier join_skew_salted
    documents as its adaptive alternative) must actually SPLIT a hot
    partition: an 80 %-hot join key under local-scale thresholds plans
    SortMergeJoin(skew=true) with the fact side read as
    'AQEShuffleRead … skewed', and the result still matches the join
    semantics.

    Two hard-won preconditions, asserted here so they stay documented:
    (1) the skewed side must be a PLAIN shuffle under the join — an
    aggregate between shuffle and sort (e.g. distinct()) breaks the
    rule's pattern match; (2) the map side must have >1 mapper —
    skew splits are PartialReducerPartitionSpec MAPPER RANGES, so a
    single-input-split stage (one local parquet file) can never split
    a skewed reduce partition no matter its size. At 100 TB both hold
    by construction (thousands of input splits, scan-under-join); a
    single-file local fixture silently can't reproduce skew handling
    without the repartition."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4096",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2048",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # pin SMJ past the r17 session default (this test exercises
        # OptimizeSkewedJoin's SMJ pattern, not the session join choice)
        "spark.sql.join.preferSortMergeJoin": "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = read_table(spark, SF_SMALL, "lineitem")
        # >1 mapper (precondition 2); 8 round-robin map tasks
        fact = li.repartition(8).select(
            F.when(F.col("l_orderkey") % 10 < 8, F.lit(1))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            "l_extendedprice",
            # incompressible pad so the hot partition's shuffle BYTES
            # (post-compression) clear the lowered threshold
            F.sha2(
                F.concat_ws("-", "l_orderkey", "l_partkey").cast("binary"),
                512,
            ).alias("pad"),
        )
        od = read_table(spark, SF_SMALL, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        j = fact.join(od, fact.k == od.o_orderkey)
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "SortMergeJoin(skew=true)" in plan, plan
    assert "skewed" in plan, plan
    # correctness under the split: row count = fact rows whose key
    # exists in orders (every k is an existing orderkey by construction)
    assert len(rows) == li.count()
