"""Time-series operators over the warehouse's calendar axis: exponential
smoothing (EMA), Holt linear-trend forecasting, and CUSUM change-point
detection — the monitoring/forecasting layer a pipeline runs over its
daily/hourly rollups.

Exactness strategy per shape:

- EMA/Holt are RECURRENCES (each output depends on the previous), the
  classic "not SQL-expressible" excuse. They ARE expressible as a left
  fold over the time-ordered value array: Spark's `aggregate` higher-
  order function and DuckDB's `list_reduce` both fold left in array
  order, executing the IDENTICAL sequence of IEEE double ops — so the
  smoothed values are bit-equal and hash-checkable. Smoothing constants
  are exact binary fractions (1/4, 1/8) so even constant parsing cannot
  differ. The folded array is CALENDAR-BOUNDED (|days| ≈ 2.4 k over the
  TPC-H range, |hours| ≈ a few k) — aggregating 100 TB of facts down to
  it is the distributed work; the fold itself is O(|calendar|) on one
  row and independent of data scale.
- CUSUM's recurrence S_h = max(0, S_{h-1} + d_h) is eliminated entirely
  by the reflected-walk identity S_h = C_h − min(0, min_{j≤h} C_j)
  (C = running sum of deviations): two ordered windows over the hourly
  aggregate, no fold at all. Deviations are scaled integers
  (d_h = n_h·H − N, i.e. count minus mean cross-multiplied by H), so
  the whole statistic is integer-exact; sums ride decimal(38,0) /
  HUGEINT so 100 TB row counts cannot overflow.

Reference parity: the kinesumer delegates all analytics to its consuming
application (kinesumer.go:346-370, README.md:67-70); this registers the
monitoring/forecast slice of that surface (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesumer_spark.catalog import read_table
from kinesumer_spark.registry import register

# Exact binary smoothing constants (see module docstring).
_ALPHA = 0.25  # level
_BETA = 0.125  # trend
_HORIZON = 7

_DAILY_CTE = """
daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM orders GROUP BY day
), series AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         strftime(MAX(day), '%Y-%m-%d') AS last_day,
         list(rev ORDER BY day) AS vals
  FROM daily
)"""

_EMA_ORACLE = f"""
WITH {_DAILY_CTE}
SELECT n_days, last_day,
       vals[n_days] AS last_rev,
       list_reduce(vals, (acc, x) -> {_ALPHA} * x + {1 - _ALPHA} * acc) AS ema
FROM series
"""


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row frame with the time-ordered daily-revenue array (plus
    n_days / last_day) — the Spark mirror of ``_DAILY_CTE``, shared by
    EMA and Holt so the two folds provably fit the same series (a drift
    in either copy would silently break the EMA/Holt parity the module
    docstring promises)."""
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("rev")
        )
    )
    return daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_day"),
        F.expr(
            "transform(sort_array(collect_list(struct(day, rev))), s -> s.rev)"
        ).alias("vals"),
    )


@register("timeseries_ema_daily", oracle=_EMA_ORACLE, tags=("timeseries",))
def timeseries_ema_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMA (α = 1/4) of daily order revenue — the smoothed-baseline
    primitive behind drift monitors and anomaly thresholds. Daily
    revenue aggregates exactly (decimal sums, one keyed shuffle of a
    2-column projection); the calendar-bounded series folds left with
    ``aggregate``, seeded by its first element exactly as DuckDB's
    ``list_reduce`` is — bit-equal smoothed value (module docstring)."""
    return _daily_series(spark, sf_dir).select(
        "n_days",
        "last_day",
        F.expr("element_at(vals, -1)").alias("last_rev"),
        F.expr(
            f"aggregate(slice(vals, 2, size(vals) - 1), vals[0], "
            f"(acc, x) -> {_ALPHA}D * x + {1 - _ALPHA}D * acc)"
        ).alias("ema"),
    )


# Holt: l₀ = v₁, b₀ = v₂ − v₁, fold over v₃… The oracle iterates via a
# RECURSIVE CTE rather than list_reduce with a struct accumulator:
# DuckDB 1.0's struct-fold evaluates result fields SEQUENTIALLY against
# a mutating accumulator (the 'b' expression already sees the updated
# 'l' — verified with a hand-stepped 2-element fold), so a coupled
# two-state recurrence silently computes the wrong recursion there.
# The recursive CTE has standard per-row semantics and matches Spark's
# `aggregate` fold (which is pure) bit-for-bit.
_HOLT_ORACLE = f"""
WITH RECURSIVE {_DAILY_CTE},
fit AS (
  SELECT 2 AS i, vals[1] AS l, vals[2] - vals[1] AS b FROM series
  UNION ALL
  SELECT i + 1,
         {_ALPHA} * s.vals[i + 1] + {1 - _ALPHA} * (l + b),
         {_BETA} * (({_ALPHA} * s.vals[i + 1] + {1 - _ALPHA} * (l + b)) - l)
           + {1 - _BETA} * b
  FROM fit, series s WHERE i < s.n_days
), fitted AS (
  SELECT l, b FROM fit, series WHERE i = n_days
)
SELECT CAST(h.h AS BIGINT) AS h, f.l + h.h * f.b AS forecast
FROM fitted f CROSS JOIN (SELECT unnest(range(1, {_HORIZON + 1})) AS h) h
ORDER BY h
"""


@register("timeseries_holt_forecast", oracle=_HOLT_ORACLE, tags=("timeseries",))
def timeseries_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast (α = 1/4, β = 1/8) of daily revenue,
    horizons 1…7: level/trend state folds left over the calendar-bounded
    daily series (bit-exact in both engines — module docstring), then
    ŷ(h) = l + h·b. The same two-stage shape a production forecaster
    uses: heavy distributed rollup, tiny sequential model fit."""
    series = _daily_series(spark, sf_dir)
    step_l = f"{_ALPHA}D * x + {1 - _ALPHA}D * (acc.l + acc.b)"
    fitted = series.select(
        F.expr(
            f"aggregate(slice(vals, 3, size(vals) - 2), "
            f"named_struct('l', vals[0], 'b', vals[1] - vals[0]), "
            f"(acc, x) -> named_struct("
            f"'l', {step_l}, "
            f"'b', {_BETA}D * (({step_l}) - acc.l) + {1 - _BETA}D * acc.b))"
        ).alias("s")
    )
    horizons = spark.range(1, _HORIZON + 1).select(F.col("id").alias("h"))
    return (
        fitted.crossJoin(F.broadcast(horizons))
        .select(
            "h",
            (F.col("s.l") + F.col("h") * F.col("s.b")).alias("forecast"),
        )
        .orderBy("h")
    )


_CUSUM_TOP = 10

_CUSUM_ORACLE = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY hr
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS h_count, CAST(SUM(n) AS BIGINT) AS n_total
  FROM hourly
), dev AS (
  SELECT hr, n,
         CAST(n * t.h_count - t.n_total AS HUGEINT) AS d
  FROM hourly CROSS JOIN tot t
), walk AS (
  SELECT hr, n,
         SUM(d) OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING) AS c
  FROM dev
), refl AS (
  SELECT hr, n,
         c - LEAST(MIN(c) OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING),
                   CAST(0 AS HUGEINT)) AS s
  FROM walk
)
SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr, n, CAST(s AS BIGINT) AS cusum
FROM refl
ORDER BY cusum DESC, hr
LIMIT {_CUSUM_TOP}
"""


@register(
    "events_changepoint_cusum",
    oracle=_CUSUM_ORACLE,
    tags=("timeseries", "analytics", "events"),
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point statistic over hourly event volume: the
    one-sided cumulative sum of (count − mean) deviations, reset at
    zero — the standard drift detector for "when did traffic shift?".
    Top-10 hours by the statistic.

    The max(0, ·) recurrence is replaced by the reflected-walk identity
    S_h = C_h − min(0, min_{j≤h} C_j), turning CUSUM into a running sum
    plus a running min — two ordered windows SHARING one sort over the
    hourly aggregate (Catalyst computes both in a single Window node).
    Deviations are mean-free by integer cross-multiplication
    (d = n·H − N), and the walk accumulates in decimal(38,0)/HUGEINT —
    integer-exact end to end, hash-stable across engines.

    Scale: the fact scan collapses to |hours| rows map-side (one keyed
    shuffle); the ordered windows run on the CALENDAR-BOUNDED hourly
    table (thousands of rows at any data scale) — a single-partition
    sort there is O(|hours| log |hours|) driver-free work, not a
    fact-table sort. The totals branch reads the localCheckpoint'd
    hourly aggregate, never the fact table twice."""
    hourly = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = hourly.agg(
        F.count(F.lit(1)).cast("bigint").alias("h_count"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    dev = hourly.crossJoin(F.broadcast(tot)).select(
        "hr",
        "n",
        (F.col("n") * F.col("h_count") - F.col("n_total"))
        .cast("decimal(38,0)")
        .alias("d"),
    )
    w = W.orderBy("hr").rowsBetween(W.unboundedPreceding, W.currentRow)
    walk = dev.select("hr", "n", F.sum("d").over(w).alias("c"))
    refl = walk.select(
        "hr",
        "n",
        (
            F.col("c")
            - F.least(F.min("c").over(w), F.lit(0).cast("decimal(38,0)"))
        ).alias("s"),
    )
    return (
        refl.select(
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hr"),
            "n",
            F.col("s").cast("bigint").alias("cusum"),
        )
        .orderBy(F.desc("cusum"), "hr")
        .limit(_CUSUM_TOP)
    )


# -- Additive seasonal decomposition (two-factor means model) ----------------

_SEASONAL_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS day, EXTRACT(hour FROM ts) AS hod, value
  FROM events
), grand AS (
  SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS g
  FROM base
), hodmeans AS (
  SELECT hod,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS m_hod
  FROM base GROUP BY hod
), daymeans AS (
  SELECT day,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS m_day
  FROM base GROUP BY day
), scored AS (
  SELECT b.hod,
         abs(b.value - (h.m_hod + d.m_day - g.g)) AS abs_resid
  FROM base b
  JOIN hodmeans h USING (hod)
  JOIN daymeans d USING (day)
  CROSS JOIN grand g
)
SELECT s.hod AS hour_of_day,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(h.m_hod - g.g, 6) AS seasonal,
       round(CAST(SUM(CAST(s.abs_resid AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS residual_mae
FROM scored s JOIN hodmeans h ON h.hod = s.hod CROSS JOIN grand g
GROUP BY s.hod, h.m_hod, g.g
ORDER BY hour_of_day
"""


@register(
    "timeseries_seasonal_additive",
    oracle=_SEASONAL_ORACLE,
    tags=("timeseries",),
)
def timeseries_seasonal_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition (two-factor means model):
    fitted(t) = day_mean + hour-of-day_mean − grand_mean; per
    hour-of-day the seasonal coefficient and the residual MAE — the
    STL-lite profile a forecasting pipeline fits before choosing model
    complexity (large seasonal + small residual → the hourly profile
    explains the series; EMA/Holt pick up the trend leg, CUSUM the
    changepoints).

    Determinism: every mean is an exact-decimal sum over RAW values ÷
    count (one double division); the residual is a fixed 4-op IEEE
    expression over those means, its magnitude re-quantized to
    DECIMAL(18,6) before the order-independent sum. Scale: three keyed
    aggregates over (hod / day / all) — calendar-bounded outputs — and
    one map-side join of the stream against those broadcast means."""
    from kinesumer_spark.functions.exact import dec

    e = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.hour("ts").cast("bigint").alias("hod"),
        "value",
    )
    grand = e.agg(
        (F.sum(dec("value")).cast("double") / F.count(F.lit(1))).alias("g")
    )
    hod_means = e.groupBy("hod").agg(
        (F.sum(dec("value")).cast("double") / F.count(F.lit(1))).alias("m_hod")
    )
    day_means = e.groupBy("day").agg(
        (F.sum(dec("value")).cast("double") / F.count(F.lit(1))).alias("m_day")
    )
    scored = (
        e.join(F.broadcast(hod_means), "hod")
        .join(F.broadcast(day_means), "day")
        .crossJoin(F.broadcast(grand))
        .select(
            "hod",
            "m_hod",
            "g",
            F.abs(
                F.col("value") - (F.col("m_hod") + F.col("m_day") - F.col("g"))
            ).alias("abs_resid"),
        )
    )
    return (
        scored.groupBy("hod", "m_hod", "g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.sum(F.col("abs_resid").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mae_raw"),
        )
        .select(
            F.col("hod").alias("hour_of_day"),
            "n",
            F.round(F.col("m_hod") - F.col("g"), 6).alias("seasonal"),
            F.round("mae_raw", 6).alias("residual_mae"),
        )
        .orderBy("hour_of_day")
    )


# -- calendar gap-fill + linear interpolation --------------------------------

_GAP_ORACLE = """
WITH obs AS (
  SELECT event_type, day,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS val
  FROM (SELECT event_type, CAST(ts AS DATE) AS day, value FROM events)
  WHERE date_part('day', day) % 3 = 1
  GROUP BY event_type, day
), cal AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
  FROM (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
        FROM obs GROUP BY event_type)
), j AS (
  SELECT c.event_type, c.day, o.val,
         last_value(o.val IGNORE NULLS) OVER w_prev AS prev_val,
         last_value(CASE WHEN o.val IS NOT NULL THEN c.day END IGNORE NULLS)
           OVER w_prev AS prev_day,
         first_value(o.val IGNORE NULLS) OVER w_next AS next_val,
         first_value(CASE WHEN o.val IS NOT NULL THEN c.day END IGNORE NULLS)
           OVER w_next AS next_day
  FROM cal c LEFT JOIN obs o ON o.event_type = c.event_type AND o.day = c.day
  WINDOW
    w_prev AS (PARTITION BY c.event_type ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY c.event_type ORDER BY c.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       val IS NOT NULL AS is_observed,
       round(CASE
         WHEN val IS NOT NULL THEN val
         WHEN prev_val IS NULL THEN next_val
         WHEN next_val IS NULL THEN prev_val
         ELSE prev_val + (next_val - prev_val)
              * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                 / CAST(date_diff('day', prev_day, next_day) AS DOUBLE))
       END, 6) AS val_filled
FROM j
ORDER BY event_type, day
"""


@register(
    "timeseries_gapfill_interpolate", oracle=_GAP_ORACLE, tags=("timeseries",)
)
def timeseries_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + linear interpolation: the daily mean
    event value, OBSERVED only every third calendar day (a downsampled
    sensor/metric series), is re-expanded to the full per-type calendar
    (`sequence` + explode — Spark's generate_series) and missing days
    are linearly interpolated between the nearest observed anchors
    (edges forward/backward-filled). The standard time-series
    preparation step before any of this module's models (EMA / Holt /
    seasonal) can run on gappy data.

    Exactness: the daily mean is an exact decimal sum with ONE int→
    double division; anchors are found with IGNORE NULLS frame
    endpoints (last/first over unbounded frames — both engines define
    them identically); the interpolation weight is an integer day-diff
    ratio, and the fill expression is spelled with the identical
    operation order in both engines, then rounded to 6 dp.

    Scale: one events scan → per-(type, day) aggregate; the calendar
    explode is |types|×|days| rows (tiny vs the fact table); both
    anchor windows are per-type sorts of the DENSIFIED series — at
    100 TB the fact-scale work is still only the first aggregate, and
    the window partitions by event_type keep the sort distributed (a
    high-cardinality key series would partition by (key) the same
    way)."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    obs = (
        ev.filter(F.dayofmonth("day") % 3 == 1)
        .groupBy("event_type", "day")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("val")
        )
    )
    cal = (
        obs.groupBy("event_type")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("day"),
        )
    )
    j = cal.join(obs, ["event_type", "day"], "left")
    w_prev = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, W.unboundedFollowing)
    )
    obs_day = F.when(F.col("val").isNotNull(), F.col("day"))
    anch = j.select(
        "event_type",
        "day",
        "val",
        F.last("val", ignorenulls=True).over(w_prev).alias("prev_val"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("prev_day"),
        F.first("val", ignorenulls=True).over(w_next).alias("next_val"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("next_day"),
    )
    fill = (
        F.when(F.col("val").isNotNull(), F.col("val"))
        .when(F.col("prev_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .otherwise(
            F.col("prev_val")
            + (F.col("next_val") - F.col("prev_val"))
            * (
                F.datediff("day", "prev_day").cast("double")
                / F.datediff("next_day", "prev_day").cast("double")
            )
        )
    )
    return anch.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("val").isNotNull().alias("is_observed"),
        F.round(fill, 6).alias("val_filled"),
    ).orderBy("event_type", "day")
