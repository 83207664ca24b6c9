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
    path = _partitioned_events(spark, sf_dir)
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


def _partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write (overwrite) the day-partitioned events layout and return its
    path. Shared by the static-prune and dynamic-prune queries; the day
    column derives from ts under the catalog's UTC session pin."""
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/kinesumer_spark_partitions/{tag}/events"
    (
        _t(spark, sf_dir, "events")
        .withColumn("day", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
    return path


# Dynamic partition pruning: the partition filter is NOT a literal in
# the query text — it arrives at runtime from the dim side of a join on
# the partition column. The oracle states the same semantics as a plain
# per-row predicate over the unpartitioned table.
_DPP_ORACLE = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {oracle_sum('value')} AS sum_value
FROM events
WHERE isodow(CAST(ts AS DATE)) = 1
GROUP BY event_type
ORDER BY event_type
"""


@register("join_dpp_partitioned", oracle=_DPP_ORACLE, tags=("layout", "prune", "join"))
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: fact scan pruned by a JOIN, not a
    literal — "Mondays only" where Monday-ness comes from a day
    dimension joined on the partition column.

    events_partitioned_prune above is the static tier: the partition
    predicate is a literal the optimizer folds into PartitionFilters at
    plan time. Here the selective predicate (weekday(day) = 0) lives on
    the DIM side of a join, so plain planning would scan every
    partition; Catalyst's DynamicPartitionPruning instead plants a
    dynamicpruning#N subquery in the fact scan's PartitionFilters
    (plan-audited in tests/test_plans.py) — the dim side executes
    first, its day list is reused from the broadcast exchange, and the
    fact scan opens ONLY matching day directories. At 100 TB this is
    the star-schema workhorse: "fact ⨝ dim WHERE dim.attr = x" touches
    the qualifying partitions' bytes only, metadata-skipping everything
    else — without materializing a literal IN-list in the query text.

    The dim here is the day column's own distinct values (a listing-only
    scan of partition metadata, zero data bytes) with the weekday
    predicate; a real warehouse would join a calendar dim — the plan
    shape is identical. Spark weekday() (0 = Monday) ↔ oracle isodow()
    (1 = Monday) express the same day set.
    """
    path = _partitioned_events(spark, sf_dir)
    fact = spark.read.parquet(path)
    dim = (
        fact.select("day").distinct().filter(F.expr("weekday(day) = 0"))
    )
    return (
        fact.join(F.broadcast(dim), "day")
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


# --------------------------------------------------------------------------
# Z-order (Morton) multi-dimensional clustering
# --------------------------------------------------------------------------

_Z_BUCKETS_SHIFT = 26  # 32-bit z-value >> 26 → 64 buckets ("files")


def _spread_sql(x: str) -> str:
    """SQL: interleave zeros between the low 16 bits of ``x`` (the
    classic Morton magic-shift spread) — pure &/|/<< on BIGINT,
    identical syntax and semantics in Spark SQL and DuckDB."""
    s = f"(({x}) & 65535)"
    s = f"((({s}) | (({s}) << 8)) & 16711935)"
    s = f"((({s}) | (({s}) << 4)) & 252645135)"
    s = f"((({s}) | (({s}) << 2)) & 858993459)"
    return f"((({s}) | (({s}) << 1)) & 1431655765)"


def _zval_sql(x: str, y: str) -> str:
    return f"({_spread_sql(x)} | ({_spread_sql(y)} << 1))"


_ZORDER_ORACLE = f"""
WITH d AS (
  SELECT user_id % 65536 AS ux,
         (epoch_us(ts) // 3600000000) % 65536 AS hx
  FROM events
), stats AS (
  SELECT MIN(ux) AS lo_u, GREATEST(MAX(ux) - MIN(ux), 1) AS rg_u,
         MIN(hx) AS lo_h, GREATEST(MAX(hx) - MIN(hx), 1) AS rg_h
  FROM d
), n AS (
  SELECT ux, hx,
         ((ux - lo_u) * 65535) // rg_u AS un,
         ((hx - lo_h) * 65535) // rg_h AS hn
  FROM d CROSS JOIN stats
), z AS (
  SELECT ux, hx, {_zval_sql('un', 'hn')} >> {_Z_BUCKETS_SHIFT} AS bucket
  FROM n
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(ux) AS BIGINT) AS min_user, CAST(MAX(ux) AS BIGINT) AS max_user,
       CAST(MIN(hx) AS BIGINT) AS min_hour, CAST(MAX(hx) AS BIGINT) AS max_hour
FROM z
GROUP BY bucket
ORDER BY bucket
"""


@register("events_zorder_layout", oracle=_ZORDER_ORACLE, tags=("layout",))
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering — the multi-dimensional data-skipping
    layout behind Delta `OPTIMIZE ZORDER BY (user_id, ts)`: interleave
    the bits of the two skipping dimensions, range-split the z-value
    into buckets (stand-ins for files), and emit each bucket's per-dim
    min/max — the footer statistics a reader would prune on. Because z
    is bit-interleaved, BOTH dims' ranges stay narrow in every bucket,
    so predicates on either column (or both) skip most buckets; a
    single-key sort gives narrow ranges on one dim and full-range on
    the other (proven quantitatively in tests/test_skew_ops.py).

    The Morton spread is the classic magic-shift sequence on BIGINT
    (&/|/<<), identical syntax in Spark SQL and DuckDB, so the whole
    layout computation — including bucket assignment — is hash-checked
    bit-for-bit, not just row counts. Dims are min/max-normalized to
    the full 16-bit range first (integer scale, both engines identical)
    — the analog of Delta's range-partition-id normalization; without
    it, low-entropy columns leave the interleave's high bits constant
    and everything lands in one bucket.

    Scale: z-value computation is per-row integer arithmetic at scan
    speed; the real OPTIMIZE job sorts by z within partitions
    (repartitionByRange(z) — one range shuffle, the same cost as any
    sort-based layout) and writes ~1 GB files whose min/max footers are
    exactly what this query emits. Hour granularity on the time dim
    matches the partition-prune tier above it (events_partitioned_prune);
    the two compose: directory pruning first, then z-file pruning.
    """
    ev = _t(spark, sf_dir, "events")
    d = ev.selectExpr(
        "user_id % 65536 AS ux",
        "(unix_micros(ts) div 3600000000) % 65536 AS hx",
    )
    # per-dim min/max for 16-bit normalization: 4 scalars to the driver
    # (the same bounded stats collect every layout optimizer performs)
    lo_u, max_u, lo_h, max_h = d.agg(
        F.min("ux"), F.max("ux"), F.min("hx"), F.max("hx")
    ).first()
    rg_u = max(max_u - lo_u, 1)
    rg_h = max(max_h - lo_h, 1)
    n = d.selectExpr(
        "ux",
        "hx",
        f"((ux - {lo_u}) * 65535) div {rg_u} AS un",
        f"((hx - {lo_h}) * 65535) div {rg_h} AS hn",
    )
    z = n.selectExpr(
        "ux", "hx", f"{_zval_sql('un', 'hn')} >> {_Z_BUCKETS_SHIFT} AS bucket"
    )
    return (
        z.groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("ux").alias("min_user"),
            F.max("ux").alias("max_user"),
            F.min("hx").alias("min_hour"),
            F.max("hx").alias("max_hour"),
        )
        .selectExpr(
            "cast(bucket AS bigint) AS bucket",
            "cast(n_rows AS bigint) AS n_rows",
            "cast(min_user AS bigint) AS min_user",
            "cast(max_user AS bigint) AS max_user",
            "cast(min_hour AS bigint) AS min_hour",
            "cast(max_hour AS bigint) AS max_hour",
        )
        .orderBy("bucket")
    )


# -- runtime Bloom-filter join pruning ---------------------------------------

_RBLOOM_ORACLE = f"""
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       {oracle_sum('l_extendedprice')} AS sum_price
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size = 1
GROUP BY p_brand
ORDER BY p_brand
"""

# The at-scale regime, simulated locally: the dim side exceeds any
# broadcast threshold (forced with autoBroadcastJoinThreshold = -1) so
# the join is shuffle-based, and the fact scan is large enough to be
# worth filtering (applicationSideScanSizeThreshold = 0 — the default
# 10 GB floor exists precisely because this only pays on big scans).
_RBLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def runtime_bloom_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UN-materialized join — callers must hold ``_RBLOOM_CONFS``
    while planning/executing it (join_runtime_bloom does; the plan test
    audits might_contain on exactly this frame)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    p = read_table(spark, sf_dir, "part").filter("p_size = 1").select(
        "p_partkey", "p_brand"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum("l_extendedprice", "sum_price"),
        )
        .orderBy("p_brand")
    )


@register(
    "join_runtime_bloom",
    oracle=_RBLOOM_ORACLE,
    tags=("join", "prune", "scale"),
)
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime row-level Bloom-filter join pruning — the non-partitioned
    counterpart of join_dpp_partitioned: when the selective predicate
    lives on the dim side of a SHUFFLE join (too big to broadcast, no
    partition column to prune), Catalyst's InjectRuntimeFilter plants a
    bloom_filter_agg subquery on the dim side and a might_contain
    filter directly above the FACT scan, so ~all non-matching fact rows
    drop before the shuffle instead of after it. At 100 TB this is the
    difference between shuffling the whole fact table and shuffling the
    qualifying fraction (~3.5% here: p_size = 1).

    Locally the dim side fits any broadcast threshold and the fact scan
    is below the 10 GB application-side floor, so the two thresholds
    are pinned for the query's scope (set/restore, the RocksDB-provider
    pattern) to reproduce the at-scale plan shape; planning is lazy, so
    the join MATERIALIZES (localCheckpoint eager — the aggregated
    result is |brands| rows) inside the conf scope. The plan test
    audits might_contain + bloom_filter_agg on the un-materialized
    frame under the same confs.

    The oracle is the plain join — the Bloom filter may only ever
    REMOVE rows the join would drop anyway (false positives pass
    through to the exact join), so any semantic leak reddens the
    hash."""
    prev = {k: spark.conf.get(k, None) for k in _RBLOOM_CONFS}
    for k, v in _RBLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        out = runtime_bloom_plan(spark, sf_dir).localCheckpoint(eager=True)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out
