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
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
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
