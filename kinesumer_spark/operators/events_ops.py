"""Event-stream analytics in batch form (SURVEY.md §2.2 "Streaming ops"
batch analogs) plus the record-envelope construction that is the
reference's actual data model (kinesumer.go:97-102).

`events_envelope` is the load-bearing one for parity: it produces the
exact RECORD_SCHEMA the streaming engine emits (stream, shard_id,
sequence_number, partition_key, data, arrival_ts) from the events
table, with shard assignment = hash(partition_key) → shard, mirroring
Kinesis's partition-key→shard hashing (kinesumer_test.go:119-127) via
the FIXTURES.md §2 recipe (pmod(user_id, 5), zero-padded seqnum).

Scale notes: sessionization and as-of join are both one shuffle on the
entity key followed by in-partition window evaluation — the canonical
layout for per-entity ordered processing at 100 TB (same layout the
reference gets per-shard via its single-goroutine-per-shard loops,
SURVEY.md §2.1 O1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.functions.exact import exact_sum, oracle_sum
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


_ENVELOPE_ORACLE = """
SELECT 'events' AS stream,
       'shardId-' || lpad(CAST(((user_id % 5) + 5) % 5 AS VARCHAR), 12, '0')
         AS shard_id,
       lpad(CAST(event_id AS VARCHAR), 21, '0') AS sequence_number,
       CAST(user_id AS VARCHAR) AS partition_key,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS arrival_ts_str,
       length(json_object('event_id', event_id, 'event_type', event_type,
                          'value', "value")::VARCHAR) > 0 AS has_payload
FROM events
ORDER BY sequence_number
"""


@register("events_envelope", oracle=_ENVELOPE_ORACLE, tags=("envelope", "parity"))
def events_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap events into the reference's record envelope (RECORD_SCHEMA).

    Matches Record{Stream, ShardID, SequenceNumber, PartitionKey, Data,
    ApproximateArrivalTimestamp} of kinesumer.go:97-102. The opaque
    `data` payload is JSON bytes (schema-on-read, SURVEY.md §1.1); the
    oracle checks its presence, not its key order (JSON key order is
    engine-specific).
    """
    e = _t(spark, sf_dir, "events")
    payload = F.to_json(F.struct("event_id", "event_type", "value"))
    return (
        e.select(
            F.lit("events").alias("stream"),
            F.concat(
                F.lit("shardId-"),
                F.lpad(F.pmod("user_id", F.lit(5)).cast("string"), 12, "0"),
            ).alias("shard_id"),
            F.lpad(F.col("event_id").cast("string"), 21, "0").alias(
                "sequence_number"
            ),
            F.col("user_id").cast("string").alias("partition_key"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "arrival_ts_str"
            ),
            (F.length(payload) > 0).alias("has_payload"),
        )
        .orderBy("sequence_number")
    )


_TUMBLING_ORACLE = f"""
SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {oracle_sum('"value"')} AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


@register("events_tumbling_hourly", oracle=_TUMBLING_ORACLE, tags=("events", "window"))
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregate (batch analog of streaming window();
    `window(ts, '1 hour')` aligns to epoch, i.e. exactly date_trunc)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.window("ts", "1 hour").start, _TS_FMT).alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", "total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_start", "event_type")
    )


_SESSION_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_no
  FROM ordered
)
SELECT user_id, session_no,
       strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
       strftime(MAX(ts), '{_TS_FMT_DUCK}') AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


@register("events_sessionize", oracle=_SESSION_ORACLE, tags=("events", "session"))
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap (lag + gap-flag +
    running sum — the batch analog of session_window; one shuffle on
    user_id, then in-partition windows)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1).otherwise(
            0
        ),
    ).withColumn("session_no", F.sum("new_session").over(wrun))
    return (
        flagged.groupBy("user_id", "session_no")
        .agg(
            F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), _TS_FMT).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "session_no")
    )


# As-of join: for each purchase, the latest click by the same user at or
# before the purchase time. Clicks are pre-deduplicated per (user, ts) so
# the as-of pick is unique → deterministic in both engines.
_ASOF_ORACLE = f"""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
       strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts,
       c.click_event_id
FROM purchases p ASOF JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


@register("events_asof_join", oracle=_ASOF_ORACLE, tags=("events", "asof"))
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join — Spark lacks a native one (SURVEY.md
    §2.2 Joins); composed as equi-join on the entity key + time predicate
    + row_number dedup keeping the latest match.

    Scale note: this formulation expands to all (purchase, earlier-click)
    pairs per user before dedup — fine when per-key fan-out is bounded
    (AQE skew handling otherwise); the unbounded-fan-out alternative is
    applyInPandas + pandas.merge_asof per key partition, kept in
    operators/custom_asof (M2+) for the hot path.
    """
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("c_ts"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    w = W.partitionBy("event_id").orderBy(F.desc("c_ts"))
    return (
        p.join(c, "user_id")
        .filter(F.col("p_ts") >= F.col("c_ts"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("p_ts", _TS_FMT).alias("purchase_ts"),
            F.date_format("c_ts", _TS_FMT).alias("click_ts"),
            "click_event_id",
        )
        .orderBy("event_id")
    )


_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
"""


@register("topk_orderby_limit", oracle=_TOPK_ORACLE, tags=("sort", "topk"))
def topk_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — per-partition heap + merge of
    k·P candidates on the driver; never a full global sort)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
    )


# Per-shard ordering audit: the guarantee the reference provides by
# construction (one goroutine per shard, O1) and this engine provides by
# per-shard sort — asserted as data, not assumed.
_SHARD_ORDER_ORACLE = """
WITH env AS (
  SELECT 'events' AS stream,
         'shardId-' || lpad(CAST(((user_id % 5) + 5) % 5 AS VARCHAR), 12, '0')
           AS shard_id,
         lpad(CAST(event_id AS VARCHAR), 21, '0') AS sequence_number
  FROM events
), ordered AS (
  SELECT stream, shard_id, sequence_number,
         LAG(sequence_number) OVER (PARTITION BY stream, shard_id
                                    ORDER BY sequence_number) AS prev_seq
  FROM env
)
SELECT stream, shard_id,
       COUNT(*) AS n_records,
       MIN(sequence_number) AS min_seq,
       MAX(sequence_number) AS max_seq,
       COUNT(*) FILTER (WHERE prev_seq IS NOT NULL
                        AND sequence_number <= prev_seq) AS order_violations
FROM ordered
GROUP BY stream, shard_id
ORDER BY stream, shard_id
"""


@register(
    "envelope_shard_order_audit",
    oracle=_SHARD_ORDER_ORACLE,
    tags=("envelope", "parity"),
)
def envelope_shard_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(stream, shard) ordering stats over the record envelope:
    sequence numbers are zero-padded strings ordered lexicographically
    (statemodel.go:51 semantics); order_violations must be 0. The
    repartition on the shard key + in-partition window is the layout
    that preserves per-shard order through any downstream processing
    (SURVEY.md §4 custom piece #2)."""
    e = _t(spark, sf_dir, "events")
    env = e.select(
        F.lit("events").alias("stream"),
        F.concat(
            F.lit("shardId-"),
            F.lpad(F.pmod("user_id", F.lit(5)).cast("string"), 12, "0"),
        ).alias("shard_id"),
        F.lpad(F.col("event_id").cast("string"), 21, "0").alias("sequence_number"),
    ).repartition("stream", "shard_id")
    w = W.partitionBy("stream", "shard_id").orderBy("sequence_number")
    ordered = env.withColumn("prev_seq", F.lag("sequence_number").over(w))
    return (
        ordered.groupBy("stream", "shard_id")
        .agg(
            F.count("*").alias("n_records"),
            F.min("sequence_number").alias("min_seq"),
            F.max("sequence_number").alias("max_seq"),
            F.sum(
                F.when(
                    F.col("prev_seq").isNotNull()
                    & (F.col("sequence_number") <= F.col("prev_seq")),
                    1,
                ).otherwise(0)
            ).alias("order_violations"),
        )
        .orderBy("stream", "shard_id")
    )


# Forward as-of: for each click, the NEXT purchase by the same user
# strictly after it — the time-to-next-conversion lookup (the mirror of
# events_asof_join's backward pick). Purchases are pre-deduplicated per
# (user, ts) so the pick is unique → deterministic in both engines.
_ASOF_FWD_ORACLE = f"""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, MAX(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
), ranked AS (
  SELECT c.event_id, c.user_id, c.ts AS c_ts, p.ts AS p_ts,
         p.purchase_event_id,
         ROW_NUMBER() OVER (PARTITION BY c.event_id ORDER BY p.ts) AS rn
  FROM clicks c JOIN purchases p
    ON p.user_id = c.user_id AND p.ts > c.ts
)
SELECT event_id, user_id,
       strftime(c_ts, '{_TS_FMT_DUCK}') AS click_ts,
       strftime(p_ts, '{_TS_FMT_DUCK}') AS next_purchase_ts,
       purchase_event_id,
       CAST(epoch_us(p_ts) - epoch_us(c_ts) AS BIGINT) AS wait_us
FROM ranked WHERE rn = 1
ORDER BY event_id
"""


@register(
    "events_asof_join_forward", oracle=_ASOF_FWD_ORACLE, tags=("events", "asof")
)
def events_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward (next-event) as-of join: each click's NEXT purchase by
    the same user — the other direction of the point-in-time lookup
    (events_asof_join picks the latest PRIOR event). Same composition:
    equi-join on the key + time predicate + row_number keeping the
    EARLIEST later match; same scale story (per-key fan-out bounded,
    merge_asof cogrouped form in custom_asof for the unbounded case —
    pandas.merge_asof(direction='forward'))."""
    e = _t(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("c_ts")
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    w = W.partitionBy("event_id").orderBy("p_ts")
    return (
        c.join(p, "user_id")
        .filter(F.col("p_ts") > F.col("c_ts"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("c_ts", _TS_FMT).alias("click_ts"),
            F.date_format("p_ts", _TS_FMT).alias("next_purchase_ts"),
            "purchase_event_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("wait_us"),
        )
        .orderBy("event_id")
    )


# Nearest as-of with tolerance: pandas.merge_asof(direction='nearest',
# tolerance=...) semantics — the remaining member of the as-of family
# (backward: events_asof_join, forward: events_asof_join_forward,
# cogrouped merge: events_asof_join_merge).
_ASOF_NEAREST_TOL_US = 3_600_000_000  # ±1 h

_ASOF_NEAREST_ORACLE = f"""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, MAX(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
), ranked AS (
  SELECT c.event_id, c.user_id, c.ts AS c_ts, p.ts AS p_ts,
         p.purchase_event_id,
         epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
         ROW_NUMBER() OVER (
           PARTITION BY c.event_id
           ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)),
                    p.ts, p.purchase_event_id) AS rn
  FROM clicks c JOIN purchases p
    ON p.user_id = c.user_id
   AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= {_ASOF_NEAREST_TOL_US}
)
SELECT event_id, user_id,
       strftime(c_ts, '{_TS_FMT_DUCK}') AS click_ts,
       strftime(p_ts, '{_TS_FMT_DUCK}') AS nearest_purchase_ts,
       purchase_event_id,
       CAST(gap_us AS BIGINT) AS gap_us
FROM ranked WHERE rn = 1
ORDER BY event_id
"""


@register(
    "events_asof_join_nearest",
    oracle=_ASOF_NEAREST_ORACLE,
    tags=("events", "asof"),
)
def events_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of join WITH tolerance — pandas.merge_asof
    (direction='nearest', tolerance=1h) semantics: each click pairs
    with the same user's purchase minimizing |Δt|, looking BOTH ways,
    and only within ±1 h (clicks with nothing that close drop out).
    Ties (equidistant before/after) break deterministically toward the
    earlier purchase then the id, so both engines pick the same row.

    Completes the as-of family: backward (events_asof_join), forward
    (events_asof_join_forward), cogrouped pandas merge
    (events_asof_join_merge), nearest-with-tolerance (here).

    Scale: the tolerance predicate is the scale lever the unbounded
    directions lack — the equi-join fan-out per key is capped by event
    density within the ±1 h band, not by per-user history length, so
    the pre-rank row count stays linear in events at any corpus size.
    One shuffle on user_id, one window keyed by the (already
    co-located) click id; the same banded-range composition Spark's
    own range-join hints target. Reference: the reference streams
    envelopes to consuming apps that do exactly this point-in-time
    stitching (README.md:67-70)."""
    e = _t(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("c_ts")
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    gap = F.unix_micros("p_ts") - F.unix_micros("c_ts")
    w = W.partitionBy("event_id").orderBy(
        F.abs(F.col("gap_us")), "p_ts", "purchase_event_id"
    )
    return (
        c.join(p, "user_id")
        .withColumn("gap_us", gap)
        .filter(F.abs(F.col("gap_us")) <= _ASOF_NEAREST_TOL_US)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("c_ts", _TS_FMT).alias("click_ts"),
            F.date_format("p_ts", _TS_FMT).alias("nearest_purchase_ts"),
            "purchase_event_id",
            F.col("gap_us").cast("bigint").alias("gap_us"),
        )
        .orderBy("event_id")
    )


# Max concurrent sessions: interval sweep (+1 at start, −1 past end)
# over the sessionized intervals. Half-open boundaries: at equal time a
# departure processes BEFORE an arrival (delta ascending), so touching
# sessions never count as overlapping.
_CONCURRENCY_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_no
  FROM ordered
), sessions AS (
  SELECT user_id, session_no,
         MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
  FROM numbered GROUP BY user_id, session_no
), deltas AS (
  SELECT s_us AS t, 1 AS d, user_id, session_no FROM sessions
  UNION ALL
  SELECT e_us AS t, -1 AS d, user_id, session_no FROM sessions
), sweep AS (
  SELECT t, d,
         CAST(SUM(d) OVER (
           ORDER BY t, d, user_id, session_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS conc
  FROM deltas
)
SELECT CAST(conc AS BIGINT) AS max_concurrent,
       strftime(make_timestamp(t), '%Y-%m-%d %H:%M:%S') AS at_ts,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM sessions) AS n_sessions
FROM sweep ORDER BY conc DESC, t, d LIMIT 1
"""


@register(
    "events_max_concurrent_sessions",
    oracle=_CONCURRENCY_ORACLE,
    tags=("events", "session"),
)
def events_max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency: the interval-sweep (+1/−1 running sum) over
    sessionized intervals — capacity planning's favorite number. The
    oracle sweeps one global window; the Spark side decomposes it
    scale-honestly into TWO levels so no data-bounded single-partition
    window exists: per-hour-bucket running sums (parallel across
    buckets) plus a cumulative offset over the per-bucket totals (a
    calendar-bounded window — thousands of cells at any data volume).
    concurrency(row) = bucket_offset + within_bucket_running; identical
    tie ordering (t, delta, user, session) both engines, departures
    before arrivals at equal t (half-open intervals)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    numbered = e.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    ).withColumn("session_no", F.sum("new_session").over(wrun))
    sessions = numbered.groupBy("user_id", "session_no").agg(
        F.min(F.unix_micros("ts")).alias("s_us"),
        F.max(F.unix_micros("ts")).alias("e_us"),
    )
    n_sessions = sessions.count()  # bounded scalar (reporting column)
    deltas = sessions.selectExpr(
        "s_us AS t", "1 AS d", "user_id", "session_no"
    ).unionByName(
        sessions.selectExpr("e_us AS t", "-1 AS d", "user_id", "session_no")
    ).withColumn("bucket", F.expr("t div 3600000000"))
    wb = (
        W.partitionBy("bucket")
        .orderBy("t", "d", "user_id", "session_no")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    within = deltas.withColumn("run", F.sum("d").over(wb))
    totals = deltas.groupBy("bucket").agg(F.sum("d").alias("tot"))
    woff = (
        W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    )  # calendar-bounded cells only — see docstring
    offsets = totals.withColumn(
        "off", F.coalesce(F.sum("tot").over(woff), F.lit(0))
    ).select("bucket", "off")
    swept = within.join(F.broadcast(offsets), "bucket").withColumn(
        "conc", (F.col("off") + F.col("run")).cast("bigint")
    )
    return (
        swept.orderBy(F.desc("conc"), "t", "d", "user_id", "session_no")
        .limit(1)
        .select(
            F.col("conc").alias("max_concurrent"),
            F.date_format(F.timestamp_micros("t"), _TS_FMT).alias("at_ts"),
            F.lit(n_sessions).cast("bigint").alias("n_sessions"),
        )
    )
