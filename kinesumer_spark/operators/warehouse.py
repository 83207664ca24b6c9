"""Warehouse-maintenance + marketing-analytics shapes: last-touch
attribution, SCD2 (slowly-changing-dimension type 2) versioning, and a
data-quality audit gate.

These complete the "downstream application" surface the reference hands
its delivered records to (kinesumer.go:97-102, README.md:67-70): once an
ingestion engine lands an event stream in a warehouse, the first three
jobs every team schedules are attribution over the event log, dimension
history maintenance, and a quality gate in front of both. Each query is
a planner shape the existing suite lacks: `IGNORE NULLS` last-value over
an ordered per-user frame (attribution), change-detection lag/lead
chained windows on one shuffle (SCD2), and a single-pass multi-predicate
audit aggregate.

Scale notes (100 TB):
- Attribution is ONE keyed shuffle (user_id) + in-partition ordered
  window — no self-join of the fact table against itself, which is the
  naive formulation's downfall. The per-user frame state is O(1) (only
  the running last touch), so skewed power users cost sort time, not
  memory blowups.
- SCD2 is one keyed shuffle (custkey) shared by BOTH windows (lag for
  change detection, lead for interval close) — Catalyst reuses the sort
  since partitioning+ordering match.
- The audit is a shuffle-free partial+final aggregate over one scan;
  count_distinct(event_id) is its only wide state and rides Spark's
  partial-distinct machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from kinesumer_spark.catalog import read_table
from kinesumer_spark.functions.exact import exact_sum, oracle_sum
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# -- Last-touch attribution -------------------------------------------------
#
# For each purchase: credit the user's most recent PRECEDING click/view
# (strictly earlier in (ts, event_id) order) if it happened within the
# 3-day lookback; else the purchase is 'direct'. Timestamps compare as
# integer epoch-micros in both engines (the events-funnel discipline:
# analytics.py module comment).

_LOOKBACK_US = 3 * 24 * 3600 * 1_000_000
_TOUCH_TYPES = ("click", "view")

_ATTRIBUTION_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_type, value, epoch_us(ts) AS tus,
         last_value(CASE WHEN event_type IN ('click','view')
                         THEN event_type END IGNORE NULLS)
           OVER w AS touch_type,
         last_value(CASE WHEN event_type IN ('click','view')
                         THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS touch_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), conv AS (
  SELECT CASE WHEN touch_us IS NOT NULL
                   AND tus - touch_us <= {_LOOKBACK_US}
              THEN touch_type ELSE 'direct' END AS channel,
         value
  FROM ordered WHERE event_type = 'purchase'
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       {oracle_sum("value")} AS attributed_value
FROM conv
GROUP BY channel
ORDER BY channel
"""


@register(
    "events_attribution",
    oracle=_ATTRIBUTION_ORACLE,
    tags=("analytics", "events", "window"),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the
    user's most recent strictly-preceding click/view within a 3-day
    lookback, else 'direct'. The `IGNORE NULLS last_value` over an
    unbounded-preceding row frame is the canonical formulation — one
    user_id shuffle, O(1) frame state per row, no fact self-join (the
    naive `purchases JOIN touches ON touch_ts < purchase_ts` explodes
    quadratically on active users). Deterministic: frame order is
    (epoch-micros, event_id) — a total order."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        "value",
        F.unix_micros("ts").alias("tus"),
    )
    is_touch = F.col("event_type").isin(*_TOUCH_TYPES)
    w = (
        W.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ordered = e.select(
        "event_type",
        "value",
        "tus",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("tus")), ignorenulls=True)
        .over(w)
        .alias("touch_us"),
    )
    conv = ordered.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_us").isNotNull()
            & (F.col("tus") - F.col("touch_us") <= F.lit(_LOOKBACK_US)),
            F.col("touch_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "value",
    )
    return (
        conv.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            exact_sum("value", "attributed_value"),
        )
        .orderBy("channel")
    )


# -- SCD2 dimension versioning ----------------------------------------------
#
# Treat each customer's order stream as change events for a dimension
# attribute (o_orderpriority): collapse consecutive repeats, open a new
# version at each change, close it at the next change (half-open
# [valid_from, valid_to) intervals; the live version has NULL valid_to).

_SCD2_MAX_CUST = 300  # bound the emitted history for the golden check

_SCD2_ORACLE = f"""
WITH ordered AS (
  SELECT o_custkey, o_orderpriority AS priority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS prev_priority
  FROM orders WHERE o_custkey < {_SCD2_MAX_CUST}
), changes AS (
  SELECT o_custkey, priority, o_orderdate AS valid_from, o_orderkey
  FROM ordered
  WHERE prev_priority IS NULL OR prev_priority <> priority
)
SELECT o_custkey,
       CAST(row_number() OVER w AS BIGINT) AS version_no,
       priority, valid_from,
       lead(valid_from) OVER w AS valid_to,
       lead(valid_from) OVER w IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey)
ORDER BY o_custkey, version_no
"""


@register(
    "scd2_customer_priority",
    oracle=_SCD2_ORACLE,
    tags=("warehouse", "window"),
)
def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (type-2 slowly-changing-dimension) history build from an
    ordered change log: consecutive repeats collapse, each change opens
    a version row with half-open [valid_from, valid_to) validity and
    the live version carries NULL valid_to / is_current = true.

    Plan: BOTH windows (lag change-detect, then row_number/lead close)
    partition on o_custkey with compatible ordering, so Catalyst plans
    ONE exchange + one sort for the whole query — the incremental-merge
    formulation warehouses use (MERGE INTO dim ... WHEN MATCHED AND
    attribute changed) reuses `sink_merge_upsert`'s machinery; this is
    the initial-history builder."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < _SCD2_MAX_CUST
    )
    w_ord = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ordered = o.select(
        "o_custkey",
        F.col("o_orderpriority").alias("priority"),
        "o_orderdate",
        "o_orderkey",
        F.lag("o_orderpriority").over(w_ord).alias("prev_priority"),
    )
    changes = ordered.filter(
        F.col("prev_priority").isNull()
        | (F.col("prev_priority") != F.col("priority"))
    ).select(
        "o_custkey",
        "priority",
        F.col("o_orderdate").alias("valid_from"),
        "o_orderkey",
    )
    w_ver = W.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    return (
        changes.select(
            "o_custkey",
            F.row_number().over(w_ver).cast("bigint").alias("version_no"),
            "priority",
            "valid_from",
            F.lead("valid_from").over(w_ver).alias("valid_to"),
            F.lead("valid_from").over(w_ver).isNull().alias("is_current"),
        )
        .orderBy("o_custkey", "version_no")
    )


# -- Data-quality audit gate ------------------------------------------------

_KNOWN_TYPES = "('signup','click','view','purchase','error')"

_AUDIT_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) - COUNT(user_id) AS BIGINT) AS n_null_user,
       CAST(COUNT(*) - COUNT(ts) AS BIGINT) AS n_null_ts,
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS n_dup_event_id,
       CAST(COUNT(CASE WHEN value < 0 THEN 1 END) AS BIGINT) AS n_neg_value,
       CAST(COUNT(CASE WHEN event_type NOT IN {_KNOWN_TYPES} OR
                            event_type IS NULL THEN 1 END) AS BIGINT)
         AS n_unknown_type,
       CAST(COUNT(CASE WHEN props IS NULL OR props = '' THEN 1 END) AS BIGINT)
         AS n_empty_props,
       CAST(date_diff('day', MIN(ts), MAX(ts)) AS BIGINT) AS ts_span_days,
       (COUNT(*) = COUNT(user_id)
        AND COUNT(*) = COUNT(ts)
        AND COUNT(*) = COUNT(DISTINCT event_id)
        AND COUNT(CASE WHEN value < 0 THEN 1 END) = 0
        AND COUNT(CASE WHEN event_type NOT IN {_KNOWN_TYPES} OR
                            event_type IS NULL THEN 1 END) = 0) AS audit_pass
FROM events
"""


@register(
    "events_quality_audit",
    oracle=_AUDIT_ORACLE,
    tags=("analytics", "quality"),
)
def events_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality gate over the delivered event stream:
    null keys, null timestamps, duplicate event ids, negative values,
    unknown event types, empty payloads, and the covered time span —
    plus the conjunctive `audit_pass` verdict a pipeline branches on
    (the dbt-test / Deequ-check shape).

    Plan: ONE scan, partial+final aggregate, shuffle-free but for the
    single-row final combine; count_distinct(event_id) is the only
    wide accumulator and uses Spark's partial-distinct rewrite. At
    100 TB this is the cheapest query in the suite — it reads every
    row once and moves nothing."""
    e = _t(spark, sf_dir, "events")
    known = F.col("event_type").isin("signup", "click", "view", "purchase", "error")
    n_all = F.count(F.lit(1))
    n_user = F.count("user_id")
    n_ts = F.count("ts")
    n_dup = F.count(F.lit(1)) - F.count_distinct("event_id")
    n_neg = F.count(F.when(F.col("value") < 0, 1))
    n_unk = F.count(F.when(~known | F.col("event_type").isNull(), 1))
    return e.agg(
        n_all.alias("n_events"),
        (n_all - n_user).alias("n_null_user"),
        (n_all - n_ts).alias("n_null_ts"),
        n_dup.alias("n_dup_event_id"),
        n_neg.alias("n_neg_value"),
        n_unk.alias("n_unknown_type"),
        F.count(
            F.when(F.col("props").isNull() | (F.col("props") == ""), 1)
        ).alias("n_empty_props"),
        F.datediff(F.max("ts"), F.min("ts")).cast("bigint").alias(
            "ts_span_days"
        ),
        (
            ((n_all - n_user) == 0)
            & ((n_all - n_ts) == 0)
            & (n_dup == 0)
            & (n_neg == 0)
            & (n_unk == 0)
        ).alias("audit_pass"),
    )


# -- Linear (multi-touch) attribution ----------------------------------------
#
# Every click/view in the purchase's 3-day lookback shares the credit
# equally. Per-purchase fan-out makes this a RANGE join; the naive
# formulation (theta join on user + time inequality) nests-loops per
# user. The scale shape is the binned range join (rollups.py's
# events_range_join_binned): bin both sides by the lookback width, join
# on (user, bin) with the purchase exploded to its two candidate bins,
# then apply the precise range predicate — an equi-join Catalyst hashes.

_LINEAR_ATTR_ORACLE = f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus, value
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus, event_type
  FROM events WHERE event_type IN ('click','view')
), m AS (
  SELECT p.event_id AS p_id, p.value, t.event_type AS ch
  FROM p JOIN t ON p.user_id = t.user_id
   AND (t.tus < p.tus OR (t.tus = p.tus AND t.event_id < p.event_id))
   AND p.tus - t.tus <= {_LOOKBACK_US}
), c AS (
  SELECT ch, round(value / (COUNT(*) OVER (PARTITION BY p_id)), 6) AS credit
  FROM m
), credits AS (
  SELECT ch AS channel, credit FROM c
  UNION ALL
  SELECT 'direct', round(value, 6) FROM p
  WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.p_id = p.event_id)
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_touchpoints,
       {oracle_sum("credit")} AS credited_value
FROM credits
GROUP BY channel
ORDER BY channel
"""


@register(
    "events_attribution_linear",
    oracle=_LINEAR_ATTR_ORACLE,
    tags=("analytics", "events", "join"),
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    equally across ALL strictly-preceding click/view touches inside the
    3-day lookback; untouched purchases credit 'direct' in full.

    Plan: purchases explode to their two candidate lookback bins
    (floor(tus/L) and that −1 — a touch within L µs must land in one of
    them), the join is EQUI on (user_id, bin) with the exact range +
    strict (tus, event_id) precedence as a post-filter, so Catalyst
    plans a hash join keyed on (user, bin) — never a per-user nested
    loop. Fractional credits are rounded to 6 places as doubles
    (identical division in both engines) and summed exactly via
    decimals. Two keyed shuffles + the bin join; per-purchase frame
    state never materializes beyond its own touches."""
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("tus"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("tus").alias("p_tus"),
        "value",
    )
    t = e.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.col("tus").alias("t_tus"),
        F.col("event_type").alias("ch"),
        (F.floor(F.col("tus") / _LOOKBACK_US)).alias("bin"),
    )
    p2 = p.withColumn(
        "bin",
        F.explode(
            F.array(
                F.floor(F.col("p_tus") / _LOOKBACK_US),
                F.floor(F.col("p_tus") / _LOOKBACK_US) - 1,
            )
        ),
    )
    m = (
        p2.join(t, ["user_id", "bin"])
        .filter(
            (
                (F.col("t_tus") < F.col("p_tus"))
                | (
                    (F.col("t_tus") == F.col("p_tus"))
                    & (F.col("t_id") < F.col("p_id"))
                )
            )
            & (F.col("p_tus") - F.col("t_tus") <= F.lit(_LOOKBACK_US))
        )
        .select("p_id", "value", "ch")
    )
    n_per_p = m.groupBy("p_id").agg(F.count(F.lit(1)).alias("n_touches"))
    touched = m.join(n_per_p, "p_id").select(
        F.col("ch").alias("channel"),
        F.round(F.col("value") / F.col("n_touches"), 6).alias("credit"),
    )
    direct = p.join(n_per_p, "p_id", "left_anti").select(
        F.lit("direct").alias("channel"),
        F.round("value", 6).alias("credit"),
    )
    return (
        touched.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touchpoints"),
            exact_sum("credit", "credited_value"),
        )
        .orderBy("channel")
    )


# Snapshot diff (table change-data audit): compare two snapshots of the
# customer dimension and classify every key as added / removed / changed /
# unchanged. Snapshot B is DERIVED deterministically from A (delete keys
# ≡0 mod 97, bump acctbal by +10.00 for keys ≡0 mod 13, insert a shifted
# copy of keys ≡0 mod 89), so both engines rebuild the identical pair of
# relations from the same rules and the whole diff — derivation included —
# is hash-checked. The +10 double add is a single correctly-rounded IEEE
# op on identical input bits: bit-equal in both engines.
_SNAPDIFF_ORACLE = """
WITH b AS (
  SELECT c_custkey, c_name, c_nationkey,
         CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 10 ELSE c_acctbal END
           AS c_acctbal
  FROM customer WHERE c_custkey % 97 <> 0
  UNION ALL
  SELECT c_custkey + 10000000, c_name || '_new', c_nationkey, c_acctbal
  FROM customer WHERE c_custkey % 89 = 0
), d AS (
  SELECT CASE
           WHEN a.c_custkey IS NULL THEN 'added'
           WHEN b.c_custkey IS NULL THEN 'removed'
           WHEN a.c_acctbal IS DISTINCT FROM b.c_acctbal
             OR a.c_name IS DISTINCT FROM b.c_name
             OR a.c_nationkey IS DISTINCT FROM b.c_nationkey THEN 'changed'
           ELSE 'unchanged'
         END AS change_type,
         COALESCE(b.c_acctbal, 0) - COALESCE(a.c_acctbal, 0) AS delta
  FROM customer a FULL OUTER JOIN b USING (c_custkey)
)
SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(delta AS DECIMAL(18,6))) AS DOUBLE) AS acctbal_delta
FROM d GROUP BY change_type ORDER BY change_type
"""


@register(
    "warehouse_snapshot_diff",
    oracle=_SNAPDIFF_ORACLE,
    tags=("warehouse", "cdc"),
)
def warehouse_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot table diff — the audit primitive behind CDC
    backfills, replication checks, and dataset-version comparisons
    (the batch complement of stream_scd2_apply's row-level CDC). Every
    key is classified added/removed/changed/unchanged via ONE full
    outer join on the key plus null-safe column comparisons; per-class
    row counts and the exact net acctbal movement come out of a final
    4-row aggregate.

    Scale: the full outer join hash-partitions both snapshots on the
    key — no broadcast needed and none attempted (both sides are
    table-sized); AQE handles skew. Column comparison is map-side; the
    classifying aggregate rides map-side combine down to 4 rows. At
    100 TB the same plan diffs daily snapshots of a dimension feed;
    for fact-scale diffs the column compare collapses to a row-hash
    compare (sha2 over concat_ws), same join shape — that variant is
    exactly dedup_exact's hash discipline."""
    a = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    b = a.filter(F.col("c_custkey") % 97 != 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.when(F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 10)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    ).unionByName(
        a.filter(F.col("c_custkey") % 89 == 0).select(
            (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
            F.concat(F.col("c_name"), F.lit("_new")).alias("c_name"),
            "c_nationkey",
            "c_acctbal",
        )
    )
    al = a.select(*[F.col(c).alias(f"a_{c}") for c in a.columns])
    bl = b.select(*[F.col(c).alias(f"b_{c}") for c in b.columns])
    joined = al.join(
        bl, al.a_c_custkey == bl.b_c_custkey, "full_outer"
    )
    differs = (
        ~F.col("a_c_acctbal").eqNullSafe(F.col("b_c_acctbal"))
        | ~F.col("a_c_name").eqNullSafe(F.col("b_c_name"))
        | ~F.col("a_c_nationkey").eqNullSafe(F.col("b_c_nationkey"))
    )
    d = joined.select(
        F.when(F.col("a_c_custkey").isNull(), "added")
        .when(F.col("b_c_custkey").isNull(), "removed")
        .when(differs, "changed")
        .otherwise("unchanged")
        .alias("change_type"),
        (
            F.coalesce("b_c_acctbal", F.lit(0))
            - F.coalesce("a_c_acctbal", F.lit(0))
        ).alias("delta"),
    )
    return (
        d.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            exact_sum("delta", "acctbal_delta"),
        )
        .orderBy("change_type")
    )


# -- Referential-integrity audit ---------------------------------------------

_RI_ORACLE = """
SELECT 'lineitem->orders' AS fk,
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
         AS n_orphans
UNION ALL
SELECT 'orders->customer' AS fk,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_child,
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
         AS n_orphans
UNION ALL
SELECT 'customer->nation' AS fk,
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_child,
       CAST((SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
         AS n_orphans
ORDER BY fk
"""


@register("warehouse_referential_integrity", oracle=_RI_ORACLE, tags=("warehouse", "quality"))
def warehouse_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema (child rows whose
    parent key does not exist) — the constraint check engines without
    enforced constraints (Spark, most lakehouses) run as a batch audit
    instead. Each edge is one left-anti join: the fact side streams,
    the parent key set broadcasts when dim-sized, and the count is the
    audit result (zero on consistent data — the interesting output is
    when ingest breaks).

    Scale: three independent anti-joins, each the cheapest possible
    existence check (key columns only, broadcast parent for dims;
    lineitem→orders is the one fact-fact anti — same single shuffle as
    any fact join)."""
    def orphans(child: DataFrame, ckey: str, parent: DataFrame, pkey: str):
        return child.join(
            parent.select(pkey), child[ckey] == parent[pkey], "left_anti"
        ).count()

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey")
    rows = [
        ("customer->nation", c.count(), orphans(c, "c_nationkey", n, "n_nationkey")),
        ("lineitem->orders", li.count(), orphans(li, "l_orderkey", o, "o_orderkey")),
        ("orders->customer", o.count(), orphans(o, "o_custkey", c, "c_custkey")),
    ]
    return spark.createDataFrame(
        rows, "fk string, n_child bigint, n_orphans bigint"
    ).orderBy("fk")


# -- Small-file compaction planner ------------------------------------------
#
# The ops job behind SCALE.md's "driver file listing on millions of
# small files" note: given a file manifest (here: one entry per hourly
# partition of the event stream, the granularity the ingest engine
# lands), plan which files coalesce into which output group so every
# group approaches a target size. The plan is METADATA-only — at 100 TB
# a manifest of a few million file entries is megabytes; the planner
# never touches data, and the rewrite it drives is an ordinary
# partitioned write (sink surface already covered by sink_wap_publish).

_COMPACT_ROW_BYTES = 64  # fixed estimator: manifest rows carry n_rows
_COMPACT_TARGET = 4096  # target output-group size (bytes)

_COMPACTION_ORACLE = f"""
WITH manifest AS (
  SELECT date_trunc('hour', ts) AS file_hour,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) * {_COMPACT_ROW_BYTES} AS BIGINT) AS est_bytes
  FROM events GROUP BY 1
), planned AS (
  SELECT file_hour, n_rows, est_bytes,
         CAST(COALESCE(SUM(est_bytes) OVER (
           ORDER BY file_hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_before
  FROM manifest
)
SELECT CAST(FLOOR(cum_before / {_COMPACT_TARGET}) AS BIGINT) AS group_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(est_bytes) AS BIGINT) AS group_bytes,
       MIN(file_hour) AS first_hour,
       MAX(file_hour) AS last_hour
FROM planned
GROUP BY 1
ORDER BY group_id
"""


@register("warehouse_compaction_plan", oracle=_COMPACTION_ORACLE, tags=("warehouse",))
def warehouse_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan small-file compaction: assign time-ordered manifest entries
    (one per hourly ingest partition, sized by a fixed bytes/row
    estimator) to output groups by cumulative-quota packing —
    ``group = floor(bytes_before / target)`` — so each group lands
    within one file of the target size while PRESERVING time clustering
    (groups are hour-contiguous, so partition pruning on the compacted
    layout keeps working). This is the size-banded strategy behind
    lakehouse OPTIMIZE/bin-packing maintenance jobs, expressed as one
    declarative plan the driver can hash-check.

    Plan: one aggregate of the stream to the hourly manifest (the only
    data-bounded stage; on a real lake the manifest comes from the
    catalog's file listing instead and nothing scans data), then a
    cumulative sum over the time-ordered manifest and a group-keyed
    aggregate. The cumsum window is single-partition BY DESIGN — the
    manifest is calendar/file-count-bounded metadata (the
    events_missing_hours discipline), ~10⁶ rows at 100 TB, far under
    one executor's memory; the alternative (range-partitioned prefix
    sums) buys nothing at that size.
    """
    from pyspark.sql import Window as W

    manifest = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("file_hour"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .withColumn(
            "est_bytes", (F.col("n_rows") * _COMPACT_ROW_BYTES).cast("bigint")
        )
    )
    w = (
        W.orderBy("file_hour")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    planned = manifest.withColumn(
        "cum_before", F.coalesce(F.sum("est_bytes").over(w), F.lit(0)).cast("bigint")
    )
    return (
        planned.groupBy(
            # explicit floor: a bare double→bigint cast TRUNCATES in
            # Spark but ROUNDS in DuckDB — floor is the portable intent
            F.floor(F.col("cum_before") / F.lit(_COMPACT_TARGET))
            .cast("bigint")
            .alias("group_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("est_bytes").cast("bigint").alias("group_bytes"),
            F.min("file_hour").alias("first_hour"),
            F.max("file_hour").alias("last_hour"),
        )
        .orderBy("group_id")
    )
