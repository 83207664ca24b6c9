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
from kinesumer_spark.functions.exact import exact_sum, oracle_sum
from kinesumer_spark.registry import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _t(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


# Funnel: per user, first signup -> first purchase strictly AFTER it,
# within 7 days. Two keyed passes: (1) first-signup per user over the
# whole stream, (2) purchases joined to signed-up users, filtered to
# after-signup, min per user. All comparisons on integer epoch-MICROS
# (unix_micros / epoch_us) so both engines compare identical integers
# even if the generator's physical ts precision drifts again (a raw-ts
# comparison would use ns in DuckDB but us in Spark under the NANOS
# variant).
_DAY7_US = 7 * 24 * 3600 * 1_000_000

_FUNNEL_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
           AS signup_us
  FROM events
  GROUP BY user_id
), conv AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS conv_us
  FROM events e JOIN users u USING (user_id)
  WHERE e.event_type = 'purchase' AND u.signup_us IS NOT NULL
    AND epoch_us(e.ts) > u.signup_us
  GROUP BY e.user_id
), flags AS (
  SELECT u.user_id,
         u.signup_us IS NOT NULL AS signed_up,
         c.conv_us IS NOT NULL
           AND c.conv_us <= u.signup_us + {_DAY7_US} AS converted
  FROM users u LEFT JOIN conv c USING (user_id)
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
    """Signup->purchase conversion funnel (7-day window): converted means
    the user's first purchase STRICTLY AFTER their first signup lands
    within 7 days of it (purchases predating signup are ignored, not
    disqualifying). Two keyed shuffles (first-signup agg, after-signup
    purchase agg) + a per-user left join -- never a row-level fact
    self-join. Timestamps compare as integer epoch-micros in BOTH
    engines (see module comment)."""
    e = _t(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus")
    )
    users = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("tus"))).alias(
            "signup_us"
        )
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(users.filter(F.col("signup_us").isNotNull()), "user_id")
        .filter(F.col("tus") > F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("conv_us"))
    )
    flags = users.join(conv, "user_id", "left").select(
        F.col("signup_us").isNotNull().alias("signed_up"),
        (
            F.col("conv_us").isNotNull()
            & (F.col("conv_us") <= F.col("signup_us") + F.lit(_DAY7_US))
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
_HIST_BIN = 25  # fixture value range is [0.01, ~490] → ~20 bins
_HISTOGRAM_ORACLE = f"""
SELECT CAST(FLOOR("value" / {_HIST_BIN}) AS BIGINT) * {_HIST_BIN} AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_sum('"value"')} AS bin_sum
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
        .agg(F.count(F.lit(1)).alias("n"), exact_sum("value", "bin_sum"))
        .orderBy("bin_lo")
    )
