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
from pyspark.sql.window import Window as W

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


# Path analysis: per-user ordered event-type trigrams, global top-k —
# the "what do users do next" query. The per-user window shuffles once
# on user_id; the global rank runs over at most |event_type|^3 distinct
# paths (a few hundred rows), so the single-partition rank window is
# bounded by the TYPE alphabet, not the stream.
_PATH_TOP = 10

_PATH_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), paths AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS path
  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
), counted AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM paths GROUP BY path
)
SELECT path, n,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS BIGINT) AS rnk
FROM counted
QUALIFY rnk <= {_PATH_TOP}
ORDER BY rnk
"""


@register("events_path_topk", oracle=_PATH_ORACLE, tags=("analytics", "events"))
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 event-type trigram paths across all users (path = three
    consecutive events in one user's timeline, ordered by (ts,
    event_id) — event_id is globally unique, so the order and therefore
    the path multiset is deterministic). Ties rank by path string."""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    counted = (
        seq.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(F.concat_ws(">", "event_type", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = W.orderBy(F.desc("n"), "path")
    return (
        counted.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rnk") <= _PATH_TOP)
        .orderBy("rnk")
    )


# Robust outlier detection: Hampel identifier (|v − median| > k·MAD) per
# event_type. Exact interpolated medians on both engines (percentile ↔
# quantile_cont, the agg_percentile_exact precedent); the per-type
# median/MAD tables are tiny (|event_type| rows) and broadcast back, so
# the fact table is scanned twice and shuffled never beyond its two
# keyed aggs.
_MAD_K = 3.0

_MAD_ORACLE = f"""
WITH med AS (
  SELECT event_type, quantile_cont("value", 0.5) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, m.med, abs(e."value" - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(MAX(d.med), 6) AS med,
       round(MAX(m2.mad), 6) AS mad,
       CAST(COUNT(CASE WHEN d.adev > {_MAD_K} * m2.mad THEN 1 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m2 USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


@register("events_anomaly_mad", oracle=_MAD_ORACLE, tags=("analytics", "events", "stats"))
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier counts per event_type (Hampel
    identifier, k = 3): robust to the heavy tails that make
    mean/stddev gates useless on value-like columns. The outlier
    comparison runs on UNROUNDED doubles — both engines derive them
    from identical IEEE arithmetic on identical inputs, so the counts
    hash-match; medians/MADs are rounded for display only."""
    e = _t(spark, sf_dir).select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.count(
                F.when(F.col("adev") > F.lit(_MAD_K) * F.col("mad"), 1)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# Conversion latency: distribution of (first qualifying purchase − first
# signup) per converting user — the funnel's "how fast", not "how many".
_TTC_ORACLE = """
WITH users AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
           AS signup_us
  FROM events GROUP BY user_id
), conv AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) - ANY_VALUE(u.signup_us) AS lat_us
  FROM events e JOIN users u USING (user_id)
  WHERE e.event_type = 'purchase' AND u.signup_us IS NOT NULL
    AND epoch_us(e.ts) > u.signup_us
  GROUP BY e.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       round(quantile_cont(lat_us, 0.5) / 3600000000.0, 6) AS p50_hours,
       round(quantile_cont(lat_us, 0.9) / 3600000000.0, 6) AS p90_hours,
       round(MAX(lat_us) / 3600000000.0, 6) AS max_hours
FROM conv
"""


@register("events_time_to_convert", oracle=_TTC_ORACLE, tags=("analytics", "events"))
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion LATENCY distribution (exact
    interpolated p50/p90/max over per-user first-qualifying-purchase
    latency). Same two keyed passes as ``events_funnel``; latencies
    stay integer micros through the percentile (sort-exact in both
    engines — Spark `percentile` and DuckDB `quantile_cont` are the
    same linear-interpolation estimator), converting to hours only in
    the final identical double expression.

    Scale: the percentile runs over |converting users| rows (already
    aggregated), not the event stream — exact is affordable here; the
    stream-scale substitute is percentile_approx (agg_approx_sketches
    shows the error-bound treatment)."""
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
        .agg(
            (F.min("tus") - F.first("signup_us")).alias("lat_us")
        )
    )
    h = 3_600_000_000.0
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(lat_us, 0.5)") / h, 6).alias("p50_hours"),
        F.round(F.expr("percentile(lat_us, 0.9)") / h, 6).alias("p90_hours"),
        F.round(F.max("lat_us") / h, 6).alias("max_hours"),
    )


# Markov transition matrix over the per-user event sequence: P(next event
# type | current event type), the behavioral-model / next-action primitive.
# One lag window over (user_id, ts, event_id) + one pair-keyed aggregate;
# the probability is a single int64→double division (bit-exact both
# engines), never a float sum.
_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
FROM pairs
ORDER BY prev_type, next_type
"""


@register(
    "events_markov_transitions",
    oracle=_MARKOV_ORACLE,
    tags=("analytics", "events"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    ordered pair of event types, how often does ``next_type`` directly
    follow ``prev_type`` in a user's timeline, and with what conditional
    probability. The output is |event_types|² rows — the input to
    next-action prediction, anomalous-sequence detection, and the path
    analysis that ``events_path_topk`` samples.

    Determinism: the sequence order is (ts, event_id) — total within a
    user — so lag() pairs identically in both engines; counts are
    integer-exact, and ``p`` is one correctly-rounded int64→double
    division per OUTPUT row (never a float aggregate).

    Scale: lag() partitions by user_id — one keyed shuffle of a narrow
    3-column projection, each user's slice sorts independently (no
    global sort, no single-partition window); the pair aggregate rides
    map-side combine down to |types|² rows, and the per-prev totals are
    a window over that tiny table, not a second pass over events."""
    seq = _t(spark, sf_dir).select(
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    n_from = F.sum("n").over(W.partitionBy("prev_type")).cast("bigint")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        n_from.alias("n_from"),
        (F.col("n").cast("double") / n_from.cast("double")).alias("p"),
    ).orderBy("prev_type", "next_type")


# RFM segmentation, mean-split: each user is scored on Recency (last
# activity), Frequency (event count), Monetary (exact purchase-value sum)
# and assigned high/low per dimension vs the ACROSS-USERS mean — 8
# segments. The mean comparisons are cross-multiplied into pure
# integer/decimal inequalities (metric·n_users > Σmetric), so segment
# membership is bit-exact in both engines with zero float comparisons.
# (Classic quartile RFM needs a global ntile — a single-partition window
# at scale; the mean-split keeps one keyed shuffle + one broadcast and is
# the shape that survives 100 TB. Quartile thresholds at scale ride
# percentile_approx with an error-bound gate, as in agg_approx_sketches.)
_RFM_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MAX(epoch_us(ts)) AS last_us,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         COALESCE(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,6)) END),
                  0) AS monetary
  FROM events GROUP BY user_id
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(last_us) AS DECIMAL(38,0)) AS sum_last,
         CAST(SUM(n_events) AS BIGINT) AS sum_n,
         CAST(SUM(monetary) AS DECIMAL(38,6)) AS sum_m
  FROM per_user
), seg AS (
  SELECT CAST(u.last_us AS DECIMAL(38,0)) * t.n_users > t.sum_last AS r_hi,
         u.n_events * t.n_users > t.sum_n AS f_hi,
         CAST(u.monetary AS DECIMAL(38,6)) * t.n_users > t.sum_m AS m_hi,
         u.n_events, u.monetary
  FROM per_user u CROSS JOIN tot t
)
SELECT r_hi, f_hi, m_hi,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(CAST(SUM(monetary) AS DECIMAL(38,6)) AS DOUBLE) AS monetary
FROM seg GROUP BY r_hi, f_hi, m_hi
ORDER BY r_hi, f_hi, m_hi
"""


@register("events_rfm_segments", oracle=_RFM_ORACLE, tags=("analytics", "events"))
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM user segmentation (mean-split): one row per (recency-high,
    frequency-high, monetary-high) cell with user count, event volume,
    and exact monetary total. See the oracle comment for why mean-split
    with cross-multiplied integer comparisons is the scale-safe,
    bit-exact formulation (no global ntile, no float thresholds).

    Plan: one user-keyed aggregate over a narrow projection → one-row
    totals aggregate broadcast back → 8-row segment aggregate. Monetary
    rides decimal(18,6) per exact.py; the only doubles are the final
    display casts."""
    # localCheckpoint: the totals branch and the segment branch both read
    # per_user; without materialization the one-row totals aggregate
    # re-scans the event stream (the text_lm_doc_score lesson — |users|
    # rows is the right thing to pay twice, the fact table is not)
    per_user = (
        _t(spark, sf_dir)
        .select(
            "user_id",
            F.unix_micros("ts").alias("tus"),
            "event_type",
            "value",
        )
        .groupBy("user_id")
        .agg(*rfm_user_aggs())
        .localCheckpoint(eager=False)
    )
    return segment_rfm(per_user)


def rfm_user_aggs() -> list:
    """The per-user RFM aggregate expressions over (tus, event_type,
    value) — ONE definition shared by the batch query above and the
    streaming variant (streaming/queries.stream_rfm_segments), so the
    batch/stream three-way equivalence is pinned at the expression
    level, not by parallel copies."""
    return [
        F.max("tus").alias("last_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,6)"),
                )
            ),
            F.lit(0).cast("decimal(18,6)"),
        ).alias("monetary"),
    ]


def segment_rfm(per_user: DataFrame) -> DataFrame:
    """Mean-split RFM segmentation over a per-user aggregate frame
    (last_us bigint, n_events bigint, monetary decimal) — shared by the
    batch query above and the streaming variant
    (streaming/queries.stream_rfm_segments), which is what pins their
    equivalence: both feed the identical segmentation plan."""
    tot = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        # cast each element BEFORE summing: an int64 SUM of epoch-micros
        # overflows the long accumulator at ~5,400 users (ANSI mode
        # throws; non-ANSI silently wraps and corrupts every r_hi) —
        # DuckDB's SUM(BIGINT)→HUGEINT never had the problem
        F.sum(F.col("last_us").cast("decimal(38,0)")).cast("decimal(38,0)").alias(
            "sum_last"
        ),
        F.sum("n_events").cast("bigint").alias("sum_n"),
        F.sum("monetary").cast("decimal(38,6)").alias("sum_m"),
    )
    seg = per_user.crossJoin(F.broadcast(tot)).select(
        (
            F.col("last_us").cast("decimal(38,0)") * F.col("n_users")
            > F.col("sum_last")
        ).alias("r_hi"),
        (F.col("n_events") * F.col("n_users") > F.col("sum_n")).alias("f_hi"),
        (
            F.col("monetary").cast("decimal(38,6)") * F.col("n_users")
            > F.col("sum_m")
        ).alias("m_hi"),
        "n_events",
        "monetary",
    )
    return (
        seg.groupBy("r_hi", "f_hi", "m_hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("monetary").cast("decimal(38,6)").cast("double").alias(
                "monetary"
            ),
        )
        .orderBy("r_hi", "f_hi", "m_hi")
    )


# Session summary / bounce rate: sessionize (30-min gap, the
# events_sessionize discipline) then fold to one engagement row. All
# ratios are single int→double divisions; durations stay integer micros
# until the final identical double division by 3.6e9.
_BOUNCE_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  -- (tus, event_id) — the SAME total order as the lag window and the
  -- Spark side; ordering by tus alone would sessionize tie rows
  -- nondeterministically
  SELECT user_id, tus,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM seq
), sessions AS (
  SELECT user_id, session_no,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(tus) - MIN(tus) AS dur_us
  FROM numbered GROUP BY user_id, session_no
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS BIGINT) AS n_bounces,
       CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS bounce_rate,
       CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS avg_events_per_session,
       CAST(SUM(dur_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 3600000000.0
         AS avg_session_hours
FROM sessions
"""


@register(
    "events_bounce_rate", oracle=_BOUNCE_ORACLE, tags=("analytics", "events")
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement summary over 30-minute-gap sessions: session count,
    bounce count/rate (single-event sessions), mean events per session,
    mean session duration. The sessionization is the events_sessionize
    shape (ONE user-keyed shuffle, lag + gap-flag + running sum in the
    partition); the summary is a 1-row aggregate over the
    |sessions|-sized table. Integer micros throughout; the only doubles
    are four final identical divisions."""
    e = _t(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("tus")
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap = F.col("tus") - F.lag("tus").over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(F.lag("tus").over(w).isNull() | (gap > 1_800_000_000), 1).otherwise(0),
    ).withColumn("session_no", F.sum("new_session").over(wrun))
    sessions = flagged.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("tus") - F.min("tus")).alias("dur_us"),
    )
    n_sessions = F.count(F.lit(1))
    n_bounces = F.count(F.when(F.col("n_events") == 1, 1))
    return sessions.agg(
        n_sessions.cast("bigint").alias("n_sessions"),
        n_bounces.cast("bigint").alias("n_bounces"),
        (n_bounces.cast("double") / n_sessions.cast("double")).alias("bounce_rate"),
        (F.sum("n_events").cast("double") / n_sessions.cast("double")).alias(
            "avg_events_per_session"
        ),
        (
            F.sum("dur_us").cast("double")
            / n_sessions.cast("double")
            / 3_600_000_000.0
        ).alias("avg_session_hours"),
    )


# DAU/WAU rolling actives: the daily/weekly active-user dashboard metric.
# WAU(day) = distinct users active in [day-6, day]. Exact distinct does
# not merge across days, so the rolling count EXPANDS each (day, user)
# row to the ≤7 window days it contributes to (a calendar-bounded
# generator, 7× the |day×user| table — not the event stream) and
# re-distincts per window day. At 100 TB the same dashboard usually
# downgrades to HLL union over per-day sketches (agg_hll_sketch_merge is
# exactly that path); this is the exact tier.
_DAU_WAU_ORACLE = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
), dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
), contrib AS (
  SELECT day + to_days(CAST(g.g AS INTEGER)) AS wday, user_id
  FROM du CROSS JOIN generate_series(0, 6) g(g)
), wau AS (
  SELECT wday AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM contrib GROUP BY wday
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau
FROM dau d JOIN wau w ON w.day = d.day
ORDER BY day
"""


@register("events_dau_wau", oracle=_DAU_WAU_ORACLE, tags=("analytics", "events"))
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily + trailing-7-day active users per day (DAU/WAU). The event
    stream collapses map-side to the distinct (day, user) table ONCE
    (materialized — both metrics read it); WAU expands each active-day
    row to the 7 window days it serves and re-distincts per day —
    shuffle volume is 7·|day×user|, bounded by the calendar and the
    active-user set, never by event volume. Days with no activity in
    the trailing week simply don't appear (inner join on observed
    days). Exact tier of the rolling-distinct family;
    agg_hll_sketch_merge is the sketch tier."""
    du = (
        _t(spark, sf_dir)
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    contrib = du.select(
        F.explode(
            F.expr(
                "transform(sequence(0, 6), i -> timestampadd(DAY, i, day))"
            )
        ).alias("day"),
        "user_id",
    )
    wau = contrib.groupBy("day").agg(
        F.count_distinct("user_id").cast("bigint").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "wau")
        .orderBy("day")
    )


# Multi-step ordered funnel: signup → click → purchase, each step
# STRICTLY after the user's first qualifying previous step (the chained
# sequential-pattern shape; the 2-step events_funnel is its base case).
# Three keyed aggregate passes over the same narrow projection — never a
# row-level self-join; each stage's threshold broadcasts per user
# through an equi-join on the |users|-sized previous stage.
_FUNNEL_STEPS_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
), s1 AS (
  SELECT user_id, MIN(tus) AS t1 FROM e
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.tus) AS t2
  FROM e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.tus > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.tus) AS t3
  FROM e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.tus > s2.t2
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_signup,
       CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_click_after,
       CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchase_after,
       CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE) AS rate_step2,
       CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM s2) AS DOUBLE) AS rate_step3
"""


@register(
    "events_funnel_steps",
    oracle=_FUNNEL_STEPS_ORACLE,
    tags=("analytics", "events"),
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step ordered funnel (signup → click → purchase, each step
    strictly after the user's first qualifying previous step): stage
    populations and step-to-step conversion rates. Each stage is one
    filtered aggregate equi-joined to the previous stage's per-user
    threshold — the chain generalizes to any step list with one keyed
    pass per step, and shuffle volume per stage is |qualifying users|,
    never the event stream squared. Integer micros; two final int→double
    divisions."""
    e = _t(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus")
    ).localCheckpoint(eager=False)
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("tus").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("tus") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("tus") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_signup"))
        .crossJoin(
            F.broadcast(
                s2.agg(F.count(F.lit(1)).cast("bigint").alias("n_click_after"))
            )
        )
        .crossJoin(
            F.broadcast(
                s3.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_purchase_after")
                )
            )
        )
    )
    return counts.select(
        "n_signup",
        "n_click_after",
        "n_purchase_after",
        (
            F.col("n_click_after").cast("double") / F.col("n_signup").cast("double")
        ).alias("rate_step2"),
        (
            F.col("n_purchase_after").cast("double")
            / F.col("n_click_after").cast("double")
        ).alias("rate_step3"),
    )


# -- Distribution drift: chi-square between two halves of the month ---------

_DRIFT_SPLIT = "2024-01-16 00:00:00"

# Per-cell chi-square contributions with deterministic float discipline:
# expected = (row_total · col_total) / N is integer×integer (exact in
# double up to 2^53) followed by ONE division; (obs − exp)²/exp is three
# more IEEE ops; round(·, 6) pins the printed value; the total is the
# order-independent DECIMAL sum of the rounded contributions — identical
# in both engines (the same trick as jaccard/round(…,6) elsewhere).
_DRIFT_ORACLE = f"""
WITH cells AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 'w1' ELSE 'w2' END AS cohort,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM events
  GROUP BY 1, 2
), tot AS (
  SELECT event_type, cohort, n_obs,
         SUM(n_obs) OVER (PARTITION BY event_type) AS rt,
         SUM(n_obs) OVER (PARTITION BY cohort) AS ct,
         SUM(n_obs) OVER () AS n
  FROM cells
), scored AS (
  SELECT event_type, cohort, n_obs,
         round(CAST(rt * ct AS DOUBLE) / n, 6) AS expected,
         round(
           (n_obs - CAST(rt * ct AS DOUBLE) / n)
           * (n_obs - CAST(rt * ct AS DOUBLE) / n)
           / (CAST(rt * ct AS DOUBLE) / n), 6) AS contrib
  FROM tot
)
SELECT event_type, cohort, n_obs, expected, contrib,
       CAST(SUM(CAST(contrib AS DECIMAL(18,6))) OVER () AS DOUBLE) AS chi2_total
FROM scored
ORDER BY event_type, cohort
"""


@register("events_drift_chi2", oracle=_DRIFT_ORACLE, tags=("analytics", "quality"))
def events_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection: chi-square statistic of the
    event-type mix between the first and second half of the month — the
    data-quality monitor a training pipeline runs on every ingest slice
    (the categorical analog of PSI, without PSI's engine-divergent
    logarithms; see _DRIFT_ORACLE comment for the float discipline).

    One keyed aggregate to the (type × cohort) contingency cells —
    map-side combined, ≤ |types|·2 rows — then window sums ON THE CELLS
    (never the stream) for the marginals, a few IEEE ops per cell, and
    an order-independent decimal total. At 100 TB: the fact scan is the
    whole cost; everything after the first aggregate is constant-size.
    """
    return chi2_from_cells(drift_cells(_t(spark, sf_dir)))


def drift_cells(ev: DataFrame) -> DataFrame:
    """(event_type × half-of-month) contingency cells — the single
    stream-scale aggregation of the drift monitor; shared by the batch
    query above and its streaming twin (streaming/queries.py)."""
    return (
        ev.select(
            "event_type",
            F.when(
                F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), "w1"
            ).otherwise("w2").alias("cohort"),
        )
        .groupBy("event_type", "cohort")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )


def chi2_from_cells(cells: DataFrame) -> DataFrame:
    """Chi-square scoring over a contingency-cell table. Window sums run
    on the CELLS (≤ |types|·2 rows — the single-partition window warning
    is about this constant-size table, not the stream), so this tail is
    free at any data scale."""
    rt = F.sum("n_obs").over(W.partitionBy("event_type"))
    ct = F.sum("n_obs").over(W.partitionBy("cohort"))
    n = F.sum("n_obs").over(W.partitionBy())
    exp = (rt * ct).cast("double") / n
    scored = cells.select(
        "event_type",
        "cohort",
        "n_obs",
        F.round(exp, 6).alias("expected"),
        F.round((F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp, 6).alias(
            "contrib"
        ),
    )
    return scored.select(
        "*",
        F.sum(F.col("contrib").cast("decimal(18,6)"))
        .over(W.partitionBy())
        .cast("double")
        .alias("chi2_total"),
    ).orderBy("event_type", "cohort")


# -- Market-basket association rules (brand co-occurrence) -------------------

_BASKET_TOP = 20

_BASKET_ORACLE = f"""
WITH bi AS (
  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), nb AS (
  SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM bi
), isup AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item FROM bi GROUP BY item
), pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM bi a JOIN bi b ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2
)
SELECT item_a, item_b, n_ab,
       round(n_ab / CAST(nb.n AS DOUBLE), 6) AS support,
       round(n_ab / CAST(ia.n_item AS DOUBLE), 6) AS confidence,
       round((n_ab * CAST(nb.n AS DOUBLE)) / (ia.n_item * CAST(ib.n_item AS DOUBLE)), 6)
         AS lift
FROM pairs
JOIN isup ia ON ia.item = item_a
JOIN isup ib ON ib.item = item_b
CROSS JOIN nb
ORDER BY lift DESC, item_a, item_b
LIMIT {_BASKET_TOP}
"""


@register("basket_association_rules", oracle=_BASKET_ORACLE, tags=("analytics",))
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: brand-pair
    support / confidence / lift, top-{top} by lift — the co-occurrence
    mining shape (a-priori's pair pass) a recommender or curriculum
    builder runs on interaction data.

    Distributed shape: items per basket dedup to (basket, brand) — a
    ≤25-brand item space keeps the pair fan-out per basket bounded at
    C(25,2); the pair count is the SAME bounded self-join as
    graph_bfs_copurchase's edge derivation (equi-keyed on basket,
    never all-pairs across baskets). Supports divide once per rule,
    rounded to 6 dp — deterministic IEEE in both engines; ordering ties
    break on the item pair.
    """
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bi = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
        .distinct()
    )
    n_baskets = bi.select("basket").distinct().count()
    isup = bi.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("n_item"))
    a = bi.selectExpr("basket", "item AS item_a")
    b = bi.selectExpr("basket", "item AS item_b")
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    ia = isup.selectExpr("item AS item_a", "n_item AS n_a")
    ib = isup.selectExpr("item AS item_b", "n_item AS n_b")
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(F.col("n_ab") / F.lit(float(n_baskets)), 6).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a").cast("double"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_ab") * F.lit(float(n_baskets)))
                / (F.col("n_a") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(_BASKET_TOP)
    )


basket_association_rules.__doc__ = basket_association_rules.__doc__.format(
    top=_BASKET_TOP
)


# -- Cohort LTV curves (cumulative value by weeks-since-first-activity) ------

_LTV_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), cells AS (
  SELECT f.cohort_week,
         CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts))
              AS BIGINT) AS week_no,
         CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS wk_value
  FROM events e JOIN firsts f USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
), sized AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM firsts GROUP BY cohort_week
)
SELECT strftime(c.cohort_week, '%Y-%m-%d %H:%M:%S') AS cohort_week,
       c.week_no,
       s.cohort_users,
       CAST(c.wk_value AS DOUBLE) AS week_value,
       CAST(SUM(c.wk_value) OVER (
              PARTITION BY c.cohort_week ORDER BY c.week_no) AS DOUBLE)
         AS cum_value,
       round(CAST(SUM(c.wk_value) OVER (
               PARTITION BY c.cohort_week ORDER BY c.week_no) AS DOUBLE)
             / s.cohort_users, 6) AS ltv_per_user
FROM cells c JOIN sized s USING (cohort_week)
WHERE c.week_no <= 4
ORDER BY cohort_week, week_no
"""


@register("events_cohort_ltv", oracle=_LTV_ORACLE, tags=("analytics", "events"))
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative purchase value per first-activity
    cohort across weeks-since-signup, per-user normalized — the revenue
    companion of events_retention_cohorts (same two keyed shuffles; the
    cumulative window runs over the cohort×week CELLS, never the
    stream). The running sum accumulates in exact decimal and converts
    to double once per cell, so the cumulative values are
    order-independent — safe to hash."""
    e = _t(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    cells = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_no"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy("cohort_week", "week_no")
        .agg(F.sum("v").cast("decimal(28,6)").alias("wk_value"))
    )
    sized = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    w = W.partitionBy("cohort_week").orderBy("week_no")
    cum = F.sum("wk_value").over(w).cast("double")
    return (
        cells.join(sized, "cohort_week")
        .filter(F.col("week_no") <= 4)
        .select(
            F.date_format("cohort_week", _TS_FMT).alias("cohort_week"),
            "week_no",
            "cohort_users",
            F.col("wk_value").cast("double").alias("week_value"),
            cum.alias("cum_value"),
            F.round(cum / F.col("cohort_users"), 6).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "week_no")
    )


# -- Completeness: missing hours against the calendar spine ------------------

_MISSING_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
), expected AS (
  SELECT t.event_type, s.hour FROM types t CROSS JOIN spine s
), observed AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour FROM events
), missing AS (
  SELECT e.event_type, e.hour
  FROM expected e LEFT JOIN observed o
    ON o.event_type = e.event_type AND o.hour = e.hour
  WHERE o.hour IS NULL
)
SELECT t.event_type,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM spine) AS n_expected_hours,
       CAST(COUNT(o.hour) AS BIGINT) AS n_observed_hours,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM spine)
         - CAST(COUNT(o.hour) AS BIGINT) AS n_missing_hours,
       strftime((SELECT MIN(m.hour) FROM missing m
                 WHERE m.event_type = t.event_type),
                '%Y-%m-%d %H:%M:%S') AS first_missing_hour
FROM types t LEFT JOIN observed o ON o.event_type = t.event_type
GROUP BY t.event_type
ORDER BY t.event_type
"""


@register("events_missing_hours", oracle=_MISSING_ORACLE, tags=("analytics", "quality"))
def events_missing_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-completeness audit against the calendar spine: per event
    type, how many hours of the stream's [min, max] range have NO
    events, and the first such gap — the ingestion-hole detector every
    pipeline runs before trusting a day's data (the gaps side of
    gaps-and-islands; events_sessionize is the islands side).

    Scale: the spine derives from one min/max aggregate (two scalars to
    the driver — the zorder-stats class) and is |hours| × |types| rows
    (calendar-bounded, ~9 k/year·type — broadcast-sized at ANY data
    volume); observed hours are one distinct over the (type, hour)
    projection (map-side combined). The anti-join runs spine-vs-hours,
    never touching row-level data again."""
    e = _t(spark, sf_dir)
    observed = e.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).distinct()
    return missing_hours_report(observed)


def missing_hours_report(observed: DataFrame) -> DataFrame:
    """Completeness tail over a distinct (event_type, hour) table: spine
    bounds come from the OBSERVED hours (identical to truncating the raw
    min/max ts — the minimal event's own hour IS the truncated minimum),
    so this tail serves both the batch query above and its streaming
    twin, which hands in drained aggregate cells."""
    spark = observed.sparkSession
    lo, hi = observed.agg(F.min("hour"), F.max("hour")).first()
    spine = spark.sql(
        f"SELECT explode(sequence(TIMESTAMP '{lo}', TIMESTAMP '{hi}',"
        " INTERVAL 1 HOUR)) AS hour"
    )
    n_spine = spine.count()
    types = observed.select("event_type").distinct()
    missing = (
        types.crossJoin(spine)
        .join(observed, ["event_type", "hour"], "left_anti")
        .groupBy("event_type")
        .agg(F.min("hour").alias("first_missing"))
    )
    return (
        observed.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_observed_hours"))
        .join(missing, "event_type", "left")
        .select(
            "event_type",
            F.lit(n_spine).cast("bigint").alias("n_expected_hours"),
            "n_observed_hours",
            (F.lit(n_spine) - F.col("n_observed_hours"))
            .cast("bigint")
            .alias("n_missing_hours"),
            F.date_format("first_missing", _TS_FMT).alias("first_missing_hour"),
        )
        .orderBy("event_type")
    )


# -- Sequence-pattern matching over per-user event journeys ------------------

# MATCH_RECOGNIZE-lite: the per-user journey becomes an ordered
# event-type string (tie-break on event_id so the string is unique),
# and funnel patterns become regexes over it — the portable spelling of
# row-pattern matching, which neither engine implements natively.
_SEQ_ORACLE = """
WITH j AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS journey
  FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(CASE WHEN regexp_matches(journey, 's.*c.*p') THEN 1 END)
            AS BIGINT) AS n_signup_click_purchase,
       CAST(COUNT(CASE WHEN regexp_matches(journey, 'e{2}') THEN 1 END)
            AS BIGINT) AS n_double_error,
       CAST(COUNT(CASE WHEN regexp_matches(journey, '^v') THEN 1 END)
            AS BIGINT) AS n_view_first,
       CAST(COUNT(CASE WHEN regexp_matches(journey, 'p[^e]*$') THEN 1 END)
            AS BIGINT) AS n_purchase_no_error_after
FROM j
"""


@register("events_sequence_match", oracle=_SEQ_ORACLE, tags=("analytics", "events"))
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching over user journeys (MATCH_RECOGNIZE-lite):
    each user's ordered event sequence collapses to a compact string
    (first letter per event, deterministic (ts, event_id) order) and
    funnel/pattern questions become REGEXES over it — ordered funnel
    with arbitrary gaps, immediate repetition, anchored first-touch,
    and 'no error after purchase'. Patterns stay in the Java∩RE2
    subset so both engines agree.

    Scale: ONE user-keyed shuffle to build journeys (ordered string_agg
    is the same per-key sort any sessionization pays); the regex
    evaluation is map-side over |users| short strings. This is how
    sequence analytics actually ships on engines without native
    MATCH_RECOGNIZE — and why journey strings, not row self-joins, are
    the 100 TB shape (a K-step self-join funnel is K fact shuffles)."""
    e = _t(spark, sf_dir)
    j = (
        e.select(
            "user_id",
            F.substring("event_type", 1, 1).alias("c"),
            "ts",
            "event_id",
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(ts, event_id, c))), x -> x.c), '')"
            ).alias("journey")
        )
    )
    m = lambda pat: F.count(  # noqa: E731
        F.when(F.col("journey").rlike(pat), 1)
    ).cast("bigint")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        m("s.*c.*p").alias("n_signup_click_purchase"),
        m("e{2}").alias("n_double_error"),
        m("^v").alias("n_view_first"),
        m("p[^e]*$").alias("n_purchase_no_error_after"),
    )


# -- Rolling z-score anomaly monitor over hourly event volume ----------------
#
# The on-call question "is this hour's traffic abnormal given the last
# day": trailing-24h mean/std of hourly event counts, z-score per hour,
# |z| > 3 flagged. The hourly grid is DENSIFIED before the window
# (generate the min→max hour range, left-join counts, COALESCE 0 — r13
# driver advice): observed hours alone would let the frame silently
# span more wall-clock across gaps, and a total ingest outage — the
# strongest volume anomaly — would be invisible to the alarm. Rolling
# sums stay INTEGER (exact, no accumulation-order hazard); only the
# per-row variance products run in double (24·Σx² and (Σx)² overflow
# int64 once an hourly count exceeds ~1.1e8 — r13 driver advice — and
# a non-ANSI Spark would wrap silently while DuckDB errors; int64→
# double conversion and single IEEE products are deterministic and
# identical cross-engine, unlike a windowed double SUM would be).
# Remaining exact-integer bound: Σx² itself wraps past ~6e8 events/hr
# (170k/s sustained — beyond any single reference stream). Warmup
# hours (fewer than 24 in the frame) are excluded; a zero-variance
# frame yields a NULL z (flat traffic is not anomalous).

_ZSCORE_ORACLE = """
WITH h0 AS (
  SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), g AS (
  SELECT unnest(generate_series(MIN(hr), MAX(hr), INTERVAL 1 HOUR)) AS hr
  FROM h0
), h AS (
  SELECT g.hr, CAST(COALESCE(h0.cnt, 0) AS BIGINT) AS cnt
  FROM g LEFT JOIN h0 ON h0.hr = g.hr
), w AS (
  SELECT hr, cnt,
         COUNT(*) OVER win AS n,
         CAST(SUM(cnt) OVER win AS BIGINT) AS s1,
         CAST(SUM(cnt * cnt) OVER win AS BIGINT) AS s2
  FROM h
  WINDOW win AS (ORDER BY hr ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
       cnt,
       round(s1 / 24.0, 6) AS mean_24h,
       CASE WHEN 24.0 * s2 - CAST(s1 AS DOUBLE) * s1 > 0 THEN
         round((cnt - s1 / 24.0)
               / sqrt((24.0 * s2 - CAST(s1 AS DOUBLE) * s1) / (24.0 * 23)), 6)
       END AS zscore,
       CASE WHEN 24.0 * s2 - CAST(s1 AS DOUBLE) * s1 > 0 THEN
         abs((cnt - s1 / 24.0)
             / sqrt((24.0 * s2 - CAST(s1 AS DOUBLE) * s1) / (24.0 * 23))) > 3.0
       ELSE FALSE END AS is_anomaly
FROM w
WHERE n = 24
ORDER BY hour
"""


@register(
    "events_anomaly_zscore",
    oracle=_ZSCORE_ORACLE,
    tags=("analytics", "quality", "timeseries"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-hour z-score anomaly monitor over hourly event
    volume — the ingest-health alarm a pipeline reads next to the
    chi-square mix monitor (``events_drift_chi2`` asks "did the TYPE
    mix shift"; this asks "is the VOLUME abnormal"). |z| > 3 flags;
    warmup hours excluded; zero-variance frames yield NULL z (flat
    traffic is not anomalous). Non-vacuous at every SF (1–2 flagged
    hours). Reference analog: none (its only time semantics are
    processing-time ticks, kinesumer.go:636).

    Scale: the stream-scale work is ONE keyed aggregate to hourly
    counts (map-side combined); the rolling window runs on the bounded
    hourly relation (744 rows/month — the single-partition window
    caveat applies to that constant-size table, not the stream), with
    integer rolling sums and a fixed single-op float chain per row."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return zscore_from_hours(hourly_counts(_t(spark, sf_dir)))


def hourly_counts(ev: DataFrame) -> DataFrame:
    """(hr, cnt) — hourly event volume: the single stream-scale
    aggregation of the volume monitor; shared by the batch query above
    and its streaming twin (streaming/queries.py), mirroring the
    drift_cells / chi2_from_cells split."""
    return ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def zscore_from_hours(h: DataFrame) -> DataFrame:
    """Rolling z-score tail over an (hr, cnt) relation — runs on the
    bounded hourly table (744 rows/month), never the stream. Densifies
    the hourly grid first (see the module note: a zero-event hour must
    appear as cnt=0, or the frame silently spans gaps and an outage is
    invisible); both consumers — the batch query and the streaming twin
    that drains its stateful hourly counts — inherit the densify here,
    so the twins cannot drift."""
    grid = h.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi")).selectExpr(
        "explode(sequence(lo, hi, interval 1 hour)) AS hr"
    )
    dense = grid.join(h, "hr", "left").selectExpr(
        "hr", "CAST(COALESCE(cnt, 0) AS bigint) AS cnt"
    )
    win = W.orderBy("hr").rowsBetween(-23, 0)
    w = dense.select(
        "hr",
        "cnt",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("cnt").over(win).cast("bigint").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).over(win).cast("bigint").alias("s2"),
    ).filter("n = 24")
    # double(24): Spark parses a bare 24.0 literal as DECIMAL and its
    # decimal division truncates scale (z diverged in the 7th digit);
    # DuckDB's 24.0 is already a double, so the casts pin both engines
    # to the same IEEE ops. The variance products run in double (NOT the
    # sums — see the module note's overflow/exactness split).
    var = "(double(24) * s2 - double(s1) * s1)"
    z = f"(cnt - s1 / double(24)) / sqrt({var} / (double(24) * 23))"
    return (
        w.selectExpr(
            "date_format(hr, 'yyyy-MM-dd HH:mm:ss') AS hour",
            "cnt",
            "round(s1 / double(24), 6) AS mean_24h",
            f"CASE WHEN {var} > 0 THEN round({z}, 6) END AS zscore",
            f"CASE WHEN {var} > 0 THEN abs({z}) > 3.0"
            " ELSE FALSE END AS is_anomaly",
        )
        .orderBy("hour")
    )
