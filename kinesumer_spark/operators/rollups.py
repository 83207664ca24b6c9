"""Time-series rollups and range joins over the events table — the
hypertable-style operators a training-data/telemetry pipeline layers on
the record envelope (SURVEY.md §2.2 "Streaming ops" batch analogs; the
reference leaves all aggregation to its application, kinesumer.go:346-370
delivers raw records).

Two operators, both chosen for their 100 TB plan shape:

- ``events_range_join_binned`` — "events within a time range of another
  event" is a theta join (quadratic if expressed naively). Binning each
  side to fixed-width buckets turns it into an EQUI-join on
  (entity, bucket) with a bounded candidate fan-out (window width ==
  bin width → exactly 2 candidate bins per probe row), then the exact
  range predicate filters candidates. Same candidates→verify shape as
  the MinHash/LSH dedup tier: the shuffle is on (user, bin), never a
  cross product.
- ``events_rollup_multires`` — the continuous-aggregate / hypertable
  rollup: minute → hour → day, each resolution computed FROM THE
  PREVIOUS ONE, not from raw data. Exactness under re-aggregation is
  guaranteed by decimal partial sums (associative, order-independent —
  functions/exact.py); the oracle computes every resolution directly
  from raw events and must match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.functions.exact import dec, oracle_sum
from kinesumer_spark.registry import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

_BIN_S = 900  # range-join window AND bin width: 15 minutes


def _t(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


_RANGE_JOIN_ORACLE = f"""
SELECT p.event_id AS purchase_id,
       p.user_id,
       strftime(p.ts, '{_TS_FMT_DUCK}') AS p_ts_str,
       COUNT(c.ts) AS n_clicks_15m,
       COALESCE(CAST(SUM(CAST(c."value" AS DECIMAL(18,6))) AS DOUBLE), 0.0)
         AS clicks_value_15m
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 15 MINUTE
 AND c.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id, p.ts
ORDER BY purchase_id
"""


@register("events_range_join_binned", oracle=_RANGE_JOIN_ORACLE, tags=("events", "join"))
def events_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: how many clicks (and how much click value) the same
    user produced in the 15 minutes before it — a time-range join.

    Plan: both sides bin to 900 s buckets on the truncated epoch; a
    purchase in bin b probes bins {b-1, b} (window width == bin width ⇒
    2 bins provably cover [ts-900 s, ts): truncation is monotone, so
    epoch_c ≥ epoch_p − 900 ⇒ bin_c ≥ bin_p − 1, and c.ts < p.ts ⇒
    bin_c ≤ bin_p). The join is then a plain equi-join on
    (user_id, bin) — shuffled once on that composite key, broadcast-able
    when one side is small, AQE-splittable on skewed users — and the
    exact interval predicate filters the bounded candidate set. No
    theta join, no cross product, no per-row subquery anywhere in the
    plan [plan-audited]. Purchases with zero clicks are restored by a
    left join against the aggregated counts (coalesce 0).

    Decimal click-value partials keep the sum order-independent, so the
    oracle (direct theta-join SQL) matches exactly.
    """
    e = _t(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
        F.floor(F.unix_timestamp("ts") / _BIN_S).alias("bin"),
        dec("value").alias("c_val"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    probes = purchases.withColumn(
        "bin",
        F.explode(
            F.array(
                F.floor(F.unix_timestamp("p_ts") / _BIN_S) - 1,
                F.floor(F.unix_timestamp("p_ts") / _BIN_S),
            )
        ),
    )
    hits = (
        probes.join(clicks, ["user_id", "bin"])
        .filter(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 15 MINUTES"))
            & (F.col("c_ts") < F.col("p_ts"))
        )
        .groupBy("purchase_id")
        .agg(
            F.count("c_ts").alias("n_clicks_15m"),
            F.sum("c_val").alias("v_dec"),
        )
    )
    return (
        purchases.join(hits, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            F.date_format("p_ts", _TS_FMT).alias("p_ts_str"),
            F.coalesce(F.col("n_clicks_15m"), F.lit(0)).alias("n_clicks_15m"),
            F.coalesce(F.col("v_dec").cast("double"), F.lit(0.0)).alias(
                "clicks_value_15m"
            ),
        )
        .orderBy("purchase_id")
    )


_MULTIRES_ORACLE = f"""
SELECT 'minute' AS resolution,
       strftime(date_trunc('minute', ts), '{_TS_FMT_DUCK}') AS bucket_start,
       COUNT(*) AS n_events,
       {oracle_sum('"value"')} AS total_value
FROM events GROUP BY bucket_start
UNION ALL
SELECT 'hour', strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}'),
       COUNT(*), {oracle_sum('"value"')}
FROM events GROUP BY 2
UNION ALL
SELECT 'day', strftime(date_trunc('day', ts), '{_TS_FMT_DUCK}'),
       COUNT(*), {oracle_sum('"value"')}
FROM events GROUP BY 2
ORDER BY resolution, bucket_start
"""


@register("events_rollup_multires", oracle=_MULTIRES_ORACLE, tags=("events", "rollup"))
def events_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup (minute/hour/day), hierarchically: the
    hour level aggregates the MINUTE aggregate, the day level aggregates
    the HOUR aggregate — raw data is scanned exactly once.

    This is the hypertable / continuous-aggregate pattern: at 100 TB the
    day rollup reads |distinct hours| rows (≈ 10⁴/year) instead of
    re-scanning 10¹² raw rows, and in an incremental pipeline each
    resolution is maintainable from the finer one's delta. Correctness
    under re-aggregation needs associative, order-independent partials —
    COUNT trivially, SUM via the decimal representation (a double
    re-aggregation would drift vs the direct answer; the oracle computes
    each resolution DIRECTLY from raw events, so the hierarchy is proven
    lossless, not assumed).

    The minute aggregate is materialized once (lazy localCheckpoint —
    #minute-buckets rows, trivially small) because Catalyst does NOT
    reuse a subtree referenced by three union branches (measured: the
    naive chain re-scanned raw parquet per branch, no ReusedExchange);
    hour and day then provably read the materialized minute RDD, and the
    plan shows exactly ONE parquet scan [plan-audited]. In a production
    pipeline each level is its own table and this materialization is the
    table write. (Single-pass alternative: GROUPING SETS
    ((minute),(hour),(day)) — also one scan, but Expand triples every
    raw row before the map-side combine; the hierarchical form does the
    heavy first-level combine once.)
    """
    e = _t(spark, sf_dir)
    minute = (
        e.groupBy(F.date_trunc("minute", "ts").alias("m_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).alias("v_dec"),
        )
        .localCheckpoint(eager=False)
    )
    hour = (
        minute.groupBy(F.date_trunc("hour", "m_start").alias("h_start"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("v_dec").alias("v_dec"),
        )
    )
    day = (
        hour.groupBy(F.date_trunc("day", "h_start").alias("d_start"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("v_dec").alias("v_dec"),
        )
    )

    def fmt(df: DataFrame, res: str, start_col: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            F.date_format(start_col, _TS_FMT).alias("bucket_start"),
            "n_events",
            F.col("v_dec").cast("double").alias("total_value"),
        )

    return (
        fmt(minute, "minute", "m_start")
        .unionByName(fmt(hour, "hour", "h_start"))
        .unionByName(fmt(day, "day", "d_start"))
        .orderBy("resolution", "bucket_start")
    )
