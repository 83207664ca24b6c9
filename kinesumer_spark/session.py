"""SparkSession factory.

Replaces the reference's client bootstrap ``NewKinesumer(cfg)``
(kinesumer.go:188-291): there is no state-store registration or AWS
session to build — a SparkSession with AQE and Arrow enabled is the
whole bootstrap. Config knobs that matter at 100 TB scale are set here
once so every entry point (tests, bench, driver) runs the same plan
environment:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  selection) — replaces hand-tuning shuffle partition counts per query.
- ``spark.sql.session.timeZone=UTC`` — deterministic timestamp semantics
  (and required for DuckDB-oracle comparison).
- Arrow on — vectorized Pandas-UDF / toPandas path.
- shuffle partitions default to the local core count; on a real cluster
  AQE coalescing makes the initial number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kinesumer_spark",
    cpus: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state_store: bool = False,
) -> SparkSession:
    """Build (or fetch) the canonical SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` else all local cores.
    ``rocksdb_state_store=True`` switches Structured Streaming state to
    the RocksDB provider — the 100 TB choice: state lives off-heap /
    on-disk with changelog checkpointing instead of executor-heap
    HDFSBackedStateStore maps (which OOM once keyed state outgrows the
    heap). The conf is also settable per-query at runtime via
    ``spark.conf.set`` before ``start()``.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if driver_memory is None:
        driver_memory = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r17 (guide §3.1/§9): let the planner use shuffled-hash join when
        # its size conditions hold instead of always preferring sort-merge,
        # and let AQE rewrite SMJ→SHJ when every post-shuffle partition is
        # under the local-map threshold. Evidence is PLAN-level (the
        # apparent local timing wins failed a same-conf null test — see
        # OPTIMIZATION_r17.md "Measurement discipline"): split_leakage_
        # audit's band-key join flips SMJ→SHJ (one sort removed); the
        # broadcast-dominated headline joins are plan-identical. Both
        # knobs stay size-gated — an over-threshold build side still gets
        # sort-merge, so the 100 TB risk profile is unchanged; ops that
        # NEED merge (bucketed SMB probes, salted skew join) pin it with
        # explicit hints and are unaffected. Env-parameterized for
        # cluster-side tuning; defaults are the production recommendation.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP", "64m"),
        )
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    if rocksdb_state_store:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
