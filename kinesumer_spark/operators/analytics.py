"""Product-analytics shapes over the events stream table: conversion
funnel, cohort retention, and fixed-bin value histograms.

These are the queries an analytics user of the engine runs daily on the
delivered envelope (the reference hands records to exactly this kind of
application — kinesumer.go:97-102, README.md:67-70); each exercises a
planner path the TPC-H set does not: sequential event-order predicates
(funnel), self-aligned date bucketing (cohorts), and numeric binning
(histogram).

Scale: every query below is one narrow projection + one keyed shuffle
(user_id or bin) — no self-joins, no windows over the full stream, no
driver collects. All aggregates follow the exact-decimal discipline
(functions/exact.py) so results hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.registry import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _t(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


# Funnel: per user, first signup → first purchase AFTER it; conversion
# counted when the purchase follows the signup within 7 days. One
# groupBy(user_id) with conditional aggregates — min(ts) filtered per
# stage — then one global rollup. No join, no window.
_FUNNEL_ORACLE = """
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events
  GROUP BY user_id
), flags AS (
  SELECT user_id,
         first_signup IS NOT NULL AS signed_up,
         first_signup IS NOT NULL AND first_purchase > first_signup
           AND first_purchase <= first_signup + INTERVAL 7 DAY AS converted
  FROM stages
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(CASE WHEN signed_up THEN 1 END) AS BIGINT) AS n_signed_up,
       CAST(COUNT(CASE WHEN converted THEN 1 END) AS BIGINT) AS n_converted,
       round(COUNT(CASE WHEN converted THEN 1 END)
             / CAST(COUNT(CASE WHEN signed_up THEN 1 END) AS DOUBLE), 6)
         AS conversion_rate
FROM flags
"""


@register("events_funnel", oracle=_FUNNEL_ORACLE, tags=("analytics", "events"))
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion funnel (7-day window): sequential
    event-order analytics as ONE conditional-aggregate pass — the
    min-per-stage formulation avoids the naive self-join of signup rows
    to later purchase rows (which shuffles the fact against itself; this
    form shuffles each event once, keyed by user)."""
    e = _t(spark, sf_dir)
    stages = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    flags = stages.select(
        F.col("first_signup").isNotNull().alias("signed_up"),
        (
            F.col("first_signup").isNotNull()
            & (F.col("first_purchase") > F.col("first_signup"))
            & (
                F.col("first_purchase")
                <= F.col("first_signup") + F.expr("INTERVAL 7 DAY")
            )
        ).alias("converted"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("signed_up"), 1)).alias("n_signed_up"),
        F.count(F.when(F.col("converted"), 1)).alias("n_converted"),
        F.round(
            F.count(F.when(F.col("converted"), 1))
            / F.count(F.when(F.col("signed_up"), 1)).cast("double"),
            6,
        ).alias("conversion_rate"),
    )


# Cohort retention: cohort = ISO week of a user's first event; activity
# weeks counted relative to it. Two keyed shuffles (user first-week, then
# cohort cell) — never a user×week cross join.
_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts))
              AS BIGINT) AS week_no
  FROM events e JOIN firsts f USING (user_id)
)
SELECT strftime(cohort_week, '%Y-%m-%d %H:%M:%S') AS cohort_week,
       week_no,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM activity
WHERE week_no <= 4
GROUP BY cohort_week, week_no
ORDER BY cohort_week, week_no
"""


@register("events_retention_cohorts", oracle=_RETENTION_ORACLE, tags=("analytics", "events"))
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (first-activity cohort × weeks-since,
    capped at 4): the standard retention matrix. Week bucketing uses
    date_trunc('week') on both sides so the week_no difference is an
    exact integer in both engines."""
    e = _t(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_no"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("week_no") <= 4)
        .groupBy("cohort_week", "week_no")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .select(
            F.date_format("cohort_week", _TS_FMT).alias("cohort_week"),
            "week_no",
            "n_active_users",
        )
        .orderBy("cohort_week", "week_no")
    )


# Histogram: fixed-width bins over events.value — integer bin index from
# floor division, so bin edges are identical in both engines.
_HIST_BIN = 25  # value range is [0, ~200); 25-wide bins → ≤ 8 rows
_HISTOGRAM_ORACLE = f"""
SELECT CAST(FLOOR("value" / {_HIST_BIN}) AS BIGINT) * {_HIST_BIN} AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS bin_sum
FROM events
GROUP BY bin_lo
ORDER BY bin_lo
"""


@register("events_value_histogram", oracle=_HISTOGRAM_ORACLE, tags=("analytics", "events"))
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (map-side bin index + one keyed agg —
    the profiling primitive behind any numeric distribution dashboard).
    Bin index is FLOOR(value / width): pure double division + floor,
    IEEE-identical in both engines; sums are exact-decimal."""
    e = _t(spark, sf_dir)
    bin_lo = (F.floor(F.col("value") / _HIST_BIN).cast("bigint") * _HIST_BIN).alias(
        "bin_lo"
    )
    return (
        e.select(bin_lo, "value")
        .groupBy("bin_lo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "bin_sum"
            ),
        )
        .orderBy("bin_lo")
    )
