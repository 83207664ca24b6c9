"""Aggregate-function surface beyond basic sum/avg (SURVEY.md §2.2
"Aggregations"): distinct counts, exact statistical moments, exact
percentiles, collect_list/set, and the approximate sketches
(approx_count_distinct / percentile_approx) the 100 TB path relies on.

Determinism discipline: statistical moments are computed from exact
decimal power sums (sum, sum of squares, sum of products) and combined
with a handful of IEEE double ops — identical in Spark and DuckDB —
rather than Spark's single-pass M2 accumulators, whose merge order is
partition-dependent. Spark's native `stddev`/`corr` remain available;
the oracle-checked forms are these order-independent ones.

Sketch aggregates (HLL++, GK-quantile) cannot hash-match an exact
oracle by construction → registered rows-only; tests assert bounded
relative error against the exact answer instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.functions.exact import dec, oracle_sum
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_partkey)  AS n_parts,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_count_distinct", oracle=_DISTINCT_ORACLE, tags=("agg",))
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT(DISTINCT) (Expand-based single pass)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# Exact moments from decimal power sums. var = (n*Sxx - Sx^2) / (n*(n-1)),
# computed in doubles from exact sums → order-independent.
_STATS_ORACLE = f"""
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       (n * sxx - sx * sx) / (n * (n - 1)) AS var_qty,
       sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS stddev_qty,
       round((n * sxy - sx * sy) /
         (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12) AS corr_qty_price
FROM (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {oracle_sum('l_quantity')} AS sx,
         {oracle_sum('l_quantity * l_quantity')} AS sxx,
         {oracle_sum('l_extendedprice')} AS sy,
         {oracle_sum('l_extendedprice * l_extendedprice')} AS syy,
         {oracle_sum('l_quantity * l_extendedprice')} AS sxy
  FROM lineitem GROUP BY l_returnflag
)
ORDER BY l_returnflag
"""


@register("agg_stats_moments", oracle=_STATS_ORACLE, tags=("agg", "stats"))
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / Pearson correlation from exact power sums."""
    l = _t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    sums = l.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec(q)).cast("double").alias("sx"),
        F.sum(dec(q * q)).cast("double").alias("sxx"),
        F.sum(dec(p)).cast("double").alias("sy"),
        F.sum(dec(p * p)).cast("double").alias("syy"),
        F.sum(dec(q * p)).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    return (
        sums.select(
            "l_returnflag",
            n.cast("bigint").alias("n"),
            ((n * sxx - sx * sx) / (n * (n - 1))).alias("var_qty"),
            F.sqrt((n * sxx - sx * sx) / (n * (n - 1))).alias("stddev_qty"),
            # rounded: the quotient's last ulp is at the mercy of libm/FMA
            # differences between engines; 12 dp is far beyond any real use
            F.round(
                (n * sxy - sx * sy)
                / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
                12,
            ).alias("corr_qty_price"),
        )
        .orderBy("l_returnflag")
    )


_MEDIAN_ORACLE = """
SELECT l_linestatus,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@register("agg_percentile_exact", oracle=_MEDIAN_ORACLE, tags=("agg", "stats"))
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (sort-based; fine per-group, the
    whole-table exact form is what percentile_approx replaces at scale)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_linestatus")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .orderBy("l_linestatus")
    )


_COLLECT_ORACLE = """
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',')          AS nations,
       array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations_set
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""


@register("agg_collect_list_set", oracle=_COLLECT_ORACLE, tags=("agg", "array"))
def agg_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set (sorted for determinism — collection
    order is partition-dependent, so golden queries must sort).

    The collected arrays are emitted joined into one string per group:
    external hash gates canonicalize rows with pandas sort/factorize,
    which cannot handle unhashable list cells — a scalar projection of
    the same content keeps the check well-defined without changing what
    the aggregate computes.
    """
    n = _t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias(
                "nations"
            ),
            F.concat_ws(",", F.sort_array(F.collect_set("n_name"))).alias(
                "nations_set"
            ),
        )
        .orderBy("n_regionkey")
    )


# Sketch values are engine-specific, so the oracle checks error BOUNDS
# instead: the Spark side emits booleans asserting the sketch landed
# inside a window around the exact answer (computed in the same pass),
# and the oracle emits the same group keys + exact values + literal TRUE.
# A sketch outside its advertised error → FALSE → hash mismatch → red row.
_SKETCH_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS orders_ok,
       TRUE AS median_ok,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_approx_sketches", oracle=_SKETCH_ORACLE, tags=("agg", "approx"))
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) + percentile_approx (GK) — the
    100 TB substitutes for exact distinct/percentile: mergeable fixed-size
    sketches, no shuffle of distinct values.

    The exact companions computed here exist only to make the error bound
    a checkable column (validation harness); a production run at scale
    executes the sketch aggregates alone.
    """
    l = _t(spark, sf_dir, "lineitem")
    agg = (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.percentile_approx("l_quantity", 0.5, 10000).alias("approx_median_qty"),
            F.expr("percentile(l_quantity, 0.45)").alias("p45"),
            F.expr("percentile(l_quantity, 0.55)").alias("p55"),
            F.count("*").alias("n_rows"),
        )
    )
    return (
        agg.select(
            "l_returnflag",
            "exact_orders",
            # HLL++ at rsd=0.02: ±10% is 5 standard errors — a real miss,
            # not noise, if this ever reads FALSE
            (
                F.abs(F.col("approx_orders") - F.col("exact_orders"))
                <= 0.1 * F.col("exact_orders")
            ).alias("orders_ok"),
            # GK at accuracy 10000 pins rank error to 1e-4·n — far inside
            # the exact p45..p55 window
            F.col("approx_median_qty").between(F.col("p45"), F.col("p55")).alias(
                "median_ok"
            ),
            "n_rows",
        )
        .orderBy("l_returnflag")
    )


_MINMAXBY_ORACLE = """
SELECT o_orderpriority,
       strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
       arg_min(o_orderkey,
               CAST(epoch(o_orderdate) AS BIGINT) * 10000000 + o_orderkey)
         AS first_orderkey,
       arg_max(o_orderkey,
               CAST(epoch(o_orderdate) AS BIGINT) * 10000000 + o_orderkey)
         AS last_orderkey
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("agg_min_max_by", oracle=_MINMAXBY_ORACLE, tags=("agg",))
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by (argmin/argmax) — ordered-companion aggregates.

    Ties on the ordering column are engine-arbitrary, so the ordering
    key is made unique by folding the row key into its low digits
    (epoch·1e7 + orderkey) — deterministic in both engines.
    """
    o = _t(spark, sf_dir, "orders")
    ord_key = (
        F.unix_timestamp("o_orderdate").cast("bigint") * 10_000_000
        + F.col("o_orderkey")
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
            F.min_by("o_orderkey", ord_key).alias("first_orderkey"),
            F.max_by("o_orderkey", ord_key).alias("last_orderkey"),
        )
        .orderBy("o_orderpriority")
    )


# HLL sketch-merge rollup: the RE-AGGREGATABLE distinct count. Daily
# user sketches union into monthly estimates WITHOUT re-scanning raw
# events — the property that makes distinct-count rollup tables possible
# at 100 TB (exact distinct does not re-aggregate; sketches do). Sketch
# bytes are engine-specific, so the oracle checks error BOUNDS (the
# agg_approx_sketches pattern): exact monthly distinct + a TRUE per
# month asserting the merged estimate landed within the sketch's
# advertised accuracy (lgK=12 → RSE ≈ 1.04/√2¹² ≈ 1.6%; gate at 5%).
_HLL_MERGE_ORACLE = """
SELECT strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       TRUE AS estimate_ok
FROM events
GROUP BY month
ORDER BY month
"""


@register(
    "agg_hll_sketch_merge",
    oracle=_HLL_MERGE_ORACLE,
    tags=("agg", "approx", "sketch"),
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL rollup over the event stream: per-DAY Apache
    DataSketches HLL sketches of distinct users (`hll_sketch_agg`),
    merged per MONTH with `hll_union_agg` and estimated — exactly how a
    warehouse maintains distinct-user rollups (daily sketch table →
    any coarser period by union, never re-reading raw). The same pass
    computes the exact monthly distinct for the bound check; at scale
    the exact branch disappears and only the sketch path runs.

    Plan: one day-keyed partial+final aggregate builds the (day,
    sketch) table; the month merge re-aggregates |days| sketch rows —
    calendar-bounded. The exact branch reads the SAME scan (Catalyst
    reuses it: both branches aggregate the identical projection)."""
    # Pre-aggregate the fact scan to (month, day, user) BEFORE the
    # materialization: HLL insertion is duplicate-insensitive and
    # n_events = Σcnt, so the checkpointed table is |day×user|-bounded —
    # materializing the raw event projection would pin the whole fact
    # table (the exact cost events_rfm_segments' comment warns against)
    du = (
        _t(spark, sf_dir, "events")
        .select(
            F.date_trunc("month", "ts").alias("month"),
            F.date_trunc("day", "ts").alias("day"),
            "user_id",
        )
        .groupBy("month", "day", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    daily = du.groupBy("month", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.sum("cnt").alias("n"),
    )
    monthly = daily.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    exact = du.groupBy("month").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users")
    )
    return (
        monthly.join(exact, "month")
        .select(
            F.date_format("month", "yyyy-MM-dd").alias("month"),
            "exact_users",
            "n_events",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("estimate_ok"),
        )
        .orderBy("month")
    )


# -- Misra-Gries heavy hitters (two-pass, provably exact) --------------------

_HH_K = 125  # report keys with frequency > N/K
_HH_COUNTERS = 500  # per-partition summary slots (≥ K ⇒ no heavy key lost)

_HH_ORACLE = f"""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
HAVING COUNT(*) * {_HH_K} > (SELECT COUNT(*) FROM events)
ORDER BY n_events DESC, user_id
"""


@register("agg_heavy_hitters_mg", oracle=_HH_ORACLE, tags=("agg", "sketch"))
def agg_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-item (heavy hitter) detection: every user with more than
    N/K of all events (K = {K}), found WITHOUT a full groupBy over the
    key space — the frequency-sketch member of the sketch family next
    to HLL (distinct) and GK (quantiles).

    Two-pass Misra-Gries, the standard exact formulation:
    pass 1 streams each partition through a {C}-slot Misra-Gries summary
    (mapInPandas, Arrow-batched; O(slots) memory per partition, NO
    shuffle of the key space) and unions the surviving candidate keys —
    pigeonhole guarantees any key with global frequency > N/{C} survives
    in at least one partition's summary, so with slots ≥ K the candidate
    set provably contains every heavy hitter. Pass 2 rescans, counts
    ONLY the candidates (broadcast semi-join; the shuffle carries
    |candidates| ≤ partitions × slots rows, key-space- and
    corpus-UNBOUNDED-safe) and keeps counts strictly above N/K
    (integer cross-multiply, no division). The output is therefore
    EXACTLY ``GROUP BY key HAVING count·K > N`` — which is the oracle —
    while the plan never materializes the full key-frequency table: at
    100 TB with billions of distinct keys, that is the entire point.

    The one driver scalar is N (a count), same bounded class as the
    layout min/max collects (events_zorder_layout).
    """
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("user_id")

    def mg(batches):
        counters: dict[int, int] = {}
        for pdf in batches:
            for v in pdf["user_id"]:
                v = int(v)
                if v in counters:
                    counters[v] += 1
                elif len(counters) < _HH_COUNTERS:
                    counters[v] = 1
                else:
                    dead = [k for k, c in counters.items() if c == 1]
                    for k in counters:
                        counters[k] -= 1
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame({"user_id": pd.Series(list(counters), dtype="int64")})

    candidates = ev.mapInPandas(mg, "user_id bigint").distinct()
    total = ev.count()
    return (
        ev.join(F.broadcast(candidates), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .filter(F.col("n_events") * _HH_K > F.lit(total))
        .orderBy(F.desc("n_events"), "user_id")
    )


agg_heavy_hitters_mg.__doc__ = agg_heavy_hitters_mg.__doc__.format(
    K=_HH_K, C=_HH_COUNTERS
)


# -- Exact deterministic MODE ------------------------------------------------

_MODE_ORACLE = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_mode
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority) AS rn
  FROM c
)
WHERE rn = 1
ORDER BY o_orderstatus
"""


@register("agg_mode_exact", oracle=_MODE_ORACLE, tags=("agg",))
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value, ties → smallest value):
    the built-in ``mode()`` aggregate leaves ties implementation-defined
    (and engine-divergent), so the golden form is the count + rank
    rewrite — one keyed aggregate (map-side combined) over the
    (group, value) pairs, then a per-group top-1, which is how a 100 TB
    mode computes anyway (the agg shuffles #groups × #values partials,
    never rows)."""
    c = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderstatus").orderBy(F.desc("n"), "o_orderpriority")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("n_mode"),
        )
        .orderBy("o_orderstatus")
    )


# -- Ordered LISTAGG / string_agg --------------------------------------------

_LISTAGG_ORACLE = """
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY c_name) AS names,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer
WHERE c_acctbal > 9000
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register("agg_listagg_ordered", oracle=_LISTAGG_ORACLE, tags=("agg",))
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string concatenation per group (LISTAGG ... WITHIN GROUP /
    string_agg ORDER BY): without the explicit order the result is
    partition-order dependent — the WITHIN GROUP clause is what makes a
    concatenation aggregate deterministic and therefore shippable. One
    keyed shuffle; the per-group sort is bounded by group size (the
    scale guard is the same HAVING-style cap any reporting layer puts on
    group cardinality before concatenating)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.expr(
                "listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name)"
            ).alias("names"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("c_nationkey")
    )


# -- Exact distinct counting via bitmap aggregates ---------------------------

_BITMAP_ORACLE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


@register("agg_bitmap_distinct", oracle=_BITMAP_ORACLE, tags=("agg", "sketch"))
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through the bitmap aggregate family
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
    bitmap_count) — the roaring-bitmap rollup trick (ClickHouse
    uniqExact / Iceberg distinct-count maintenance): integer keys become
    bit positions in per-bucket bitmaps, buckets OR-merge
    associatively, and the final count is a popcount.

    Why it matters at 100 TB: COUNT(DISTINCT) via Expand shuffles every
    distinct (group, key) pair; the bitmap path shuffles fixed-size
    bucket bitmaps instead (each bucket covers 32 768 keys → dense key
    spaces compress thousands-to-one), and — unlike HLL
    (agg_approx_sketches) — stays exact, so the oracle is plain
    COUNT(DISTINCT). Partial aggregation applies to the bitmap
    construct; the per-(group, bucket) pre-aggregate is one extra
    map-side combine."""
    ev = _t(spark, sf_dir, "events")
    per_bucket = (
        ev.groupBy(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        )
        .agg(
            F.expr(
                "bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))"
            ).alias("cnt")
        )
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum("cnt").cast("bigint").alias("n_users"))
        .orderBy("event_type")
    )


# -- Boolean aggregates ------------------------------------------------------

_BOOL_ORACLE = """
SELECT event_type,
       bool_and(value >= 0) AS all_non_negative,
       bool_or(value > 400) AS any_large,
       bool_and(user_id IS NOT NULL) AS all_attributed,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("agg_bool_every_any", oracle=_BOOL_ORACLE, tags=("agg",))
def agg_bool_every_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/bool_and, any/bool_or) — the predicate
    rollups data-quality gates are written in (events_quality_audit
    composes exactly these); associative and map-side combinable like
    any other aggregate."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("every(value >= 0)").alias("all_non_negative"),
            F.expr("any(value > 400)").alias("any_large"),
            F.expr("every(user_id IS NOT NULL)").alias("all_attributed"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("event_type")
    )


# -- Custom UDAF via pandas_udf grouped-agg: exact Gini coefficient ----------

_GINI_ORACLE = """
WITH x AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 1000000) AS HUGEINT) AS us
  FROM orders
), ranked AS (
  SELECT o_orderpriority, us,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY us) AS i,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM x
), sums AS (
  SELECT o_orderpriority,
         CAST(SUM((2 * i - n - 1) * us) AS HUGEINT) AS num,
         CAST(MAX(n) * SUM(us) AS HUGEINT) AS den,
         CAST(MAX(n) AS BIGINT) AS n_orders
  FROM ranked GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS gini,
       n_orders
FROM sums ORDER BY o_orderpriority
"""


@register("agg_gini_pandas_udaf", oracle=_GINI_ORACLE, tags=("agg", "udf"))
def agg_gini_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A CUSTOM aggregate through the grouped-agg pandas_udf API — the
    UDAF extension surface (everything else in the registry is
    deliberately built-in): the Gini coefficient of order value per
    priority class, the inequality measure data-mixture tuning uses on
    source contributions.

    Exactness through a Python aggregate: values quantize to integer
    micro-units; the UDAF computes Σ(2i−n−1)·xᵢ over the sorted values
    and n·Σxᵢ in PYTHON BIG INTS (numpy int64 would overflow at
    ~10⁵ rows × 10¹¹ micro-units), then rounds each to double BEFORE
    the one division — the identical sequence the oracle spells with
    HUGEINT → DOUBLE casts. Ties need no break: equal values contribute
    the same regardless of their order within the tie run... with
    coefficients summed across the tie the total is order-invariant.

    Scale: grouped-agg pandas_udf is Arrow-batched with one shuffle on
    the group key; each group's sort is in-executor (the same cost
    class as percentile_exact). The deliberate contrast row for the
    plan audit: this one IS allowed to show Python in its plan."""
    import pandas as pd

    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def gini(v: pd.Series) -> float:
        us = sorted(int(x) for x in (v * 1_000_000).round().astype("int64"))
        n = len(us)
        num = sum((2 * i - n + 1) * x for i, x in enumerate(us))  # i 0-based
        den = n * sum(us)
        if den == 0:
            return 0.0
        return float(num) / float(den)

    o = _t(spark, sf_dir, "orders")
    # a grouped-agg pandas UDF cannot mix with JVM aggregates in one
    # agg() — the count joins from a separate (tiny, group-keyed) agg
    g = o.groupBy("o_orderpriority").agg(
        gini(F.col("o_totalprice")).alias("gini")
    )
    n = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    return g.join(n, "o_orderpriority").orderBy("o_orderpriority")


# -- Count-Min sketch: distributed build + bound-audited probe ---------------

_CMS_EPS = 0.001  # relative-error bound: overestimate ≤ ceil(eps · N)
_CMS_TOP = 20

_CMS_ORACLE = f"""
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
  ORDER BY n_events DESC, user_id LIMIT {_CMS_TOP}
)
SELECT user_id, n_events, TRUE AS within_bound
FROM c ORDER BY user_id
"""


@register(
    "agg_count_min_sketch", oracle=_CMS_ORACLE, tags=("agg", "approx")
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation — the point-query
    companion of agg_hll_sketch_merge's distinct-count sketch: ONE
    distributed `count_min_sketch(user_id, eps, 0.99, 42)` aggregate
    (partial sketches merge associatively map-side, exactly like HLL)
    builds a fixed ~depth×⌈e/eps⌉-counter summary of the whole event
    stream, then the top-20 hottest users are probed through the
    sketch and each estimate audited against the CMS guarantee:
    exact ≤ estimate ≤ exact + ⌈eps·N⌉ (a Count-Min NEVER
    underestimates; the overestimate is collision mass). The emitted
    rows are the exact counts + the audit flag — the
    similarity_ann_hyperplane bound-oracle pattern: the driver hash
    pins the exact side, and any estimate escaping its deterministic
    (seeded) bound flips within_bound and reddens the row. Measured
    max overestimate at sf0.1: 50 of the allowed 100.

    Scale: the sketch is the 100 TB story — frequency estimates for
    ANY key in O(1) space (~110 KB here) with one pass and no
    per-key state, where the exact groupBy needs a full-cardinality
    shuffle; the exact top-20 here exists to AUDIT the sketch, not to
    feed it. The probe deserializes the collected sketch through the
    public org.apache.spark.util.sketch.CountMinSketch JVM API
    (driver-side, 20 point queries — bounded).
    """
    import math

    ev = _t(spark, sf_dir, "events").select("user_id")
    sk_bytes = bytes(
        ev.agg(
            F.expr(
                f"count_min_sketch(user_id, CAST({_CMS_EPS} AS DOUBLE),"
                " CAST(0.99 AS DOUBLE), 42)"
            ).alias("sk")
        ).collect()[0]["sk"]
    )
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(sk_bytes)
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .orderBy(F.desc("n_events"), "user_id")
        .limit(_CMS_TOP)
        .collect()
    )
    n_total = int(cms.totalCount())
    slack = math.ceil(_CMS_EPS * n_total)
    out = [
        (
            int(r["user_id"]),
            int(r["n_events"]),
            0 <= cms.estimateCount(int(r["user_id"])) - r["n_events"] <= slack,
        )
        for r in exact
    ]
    return spark.createDataFrame(
        out, "user_id bigint, n_events bigint, within_bound boolean"
    ).orderBy("user_id")


_BLOOM_EXPECT = 10_000  # sized-for expected items (≫ actual keys here)
_BLOOM_FPP = 0.01
_BLOOM_PROBES = 100  # bounded driver-side probe sample per class

_BLOOM_ORACLE = """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
       TRUE AS no_false_negatives,
       TRUE AS fpp_within_bound
FROM events
"""


@register(
    "agg_bloom_filter_audit", oracle=_BLOOM_ORACLE, tags=("agg", "approx")
)
def agg_bloom_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership — the third sketch next to HLL (distinct
    counts) and Count-Min (point frequencies): a distributed
    DataFrameStatFunctions.bloomFilter build over the event stream's
    user ids (treeAggregate of fixed-size bit arrays — the same
    structure InjectRuntimeFilter plants inside join_runtime_bloom,
    here surfaced as a user-facing set-membership summary), audited
    against both of its guarantees. No-false-negatives is HARD (a
    member key can never probe absent) and checked over the
    ``_BLOOM_PROBES`` lowest present keys; the false-positive rate is
    checked over the same count of definitely-absent keys (present
    + 10⁹) against a 5× margin on the nominal 1 % — deterministic for
    fixed data and sizing (measured 0.0 observed FPP at every SF; the
    filter is sized for 10⁴ items, so the local load factor is low).
    The bound-oracle pattern: the driver hash pins the exact key
    count, and a guarantee violation flips a boolean.

    Scale: the filter is O(bits) regardless of N — the shape used for
    100 TB anti-join prefilters and cross-cluster key shipping; the
    build is one pass, map-side mergeable; probes are driver-side and
    BOUNDED (2·100 py4j calls), never per-row."""
    ev = _t(spark, sf_dir, "events").select("user_id")
    jbf = ev._jdf.stat().bloomFilter(
        "user_id", _BLOOM_EXPECT, _BLOOM_FPP
    )
    present = [
        int(r["user_id"])
        for r in ev.distinct().orderBy("user_id").limit(_BLOOM_PROBES).collect()
    ]
    n_keys = ev.distinct().count()
    fn = sum(0 if jbf.mightContainLong(u) else 1 for u in present)
    fp = sum(
        1 if jbf.mightContainLong(u + 1_000_000_000) else 0 for u in present
    )
    return spark.createDataFrame(
        [
            (
                int(n_keys),
                fn == 0,
                fp / len(present) <= 5 * _BLOOM_FPP,
            )
        ],
        "n_keys bigint, no_false_negatives boolean, fpp_within_bound boolean",
    )
