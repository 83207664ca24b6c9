"""Core relational surface: scan → filter → project → join → agg → sort.

The reference implements none of these (SURVEY.md §2.2: it hands opaque
records to the application, README.md:67-70); this module is the
declared analytic surface, expressed as plain DataFrame ops so Catalyst
owns pushdown, pruning, join selection and whole-stage codegen.

Scale notes (100 TB):
- Filters are applied on base columns before joins/aggs → parquet
  predicate pushdown + column pruning (verified in tests/test_plans.py).
- Dimension tables (region/nation/supplier/part/customer at TPC-H
  ratios) are broadcast — no shuffle of the fact table for those joins;
  `F.broadcast` hints make it explicit rather than stats-dependent.
- Aggregations use Catalyst's automatic partial (map-side) aggregation;
  group-by keys here are low-cardinality, so the shuffle after partial
  agg moves only #groups × #partitions rows.
- All money aggregates go through functions.exact (decimal) so results
  are order-independent → stable under any partitioning / AQE replan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import fan_out, load_tables, read_table
from kinesumer_spark.functions.exact import exact_avg, exact_sum, oracle_avg, oracle_sum
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q1 — pricing summary (TPC-H Q1 shape). The M0 flagship: exercises
# scan → filter → project → partial+final agg → sort, the whole Catalyst path.
# --------------------------------------------------------------------------

_Q1_CUTOFF = "1998-09-02 00:00:00"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_sum('l_quantity')} AS sum_qty,
  {oracle_sum('l_extendedprice')} AS sum_base_price,
  {oracle_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {oracle_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {oracle_avg('l_quantity')} AS avg_qty,
  {oracle_avg('l_extendedprice')} AS avg_price,
  {oracle_avg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("agg", "flagship"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: 2 group keys, 8 aggregates, total order.

    The partial (map-side) aggregation — 8 decimal aggregates over the
    ~98%-surviving rows — is the dominant cost and runs entirely in the
    scan stage, so on a single-split input it is single-threaded; the
    gated fan_out parallelizes it (r17 interleaved A/B at sf0.1:
    1.53 → 1.01 s min, 1.5x) and disables itself on a multi-split
    layout where the scan already feeds every core. Filter stays below
    the fan-out, so pushdown is unchanged (PushedFilters: l_shipdate —
    plans/r17)."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        fan_out(
            l.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp")),
            sf_dir,
            "lineitem",
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", "sum_qty"),
            exact_sum("l_extendedprice", "sum_base_price"),
            exact_sum(disc_price, "sum_disc_price"),
            exact_sum(charge, "sum_charge"),
            exact_avg("l_quantity", "avg_qty"),
            exact_avg("l_extendedprice", "avg_price"),
            exact_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q3 — shipping priority (TPC-H Q3 shape): 3-way join, agg, top-10.
# --------------------------------------------------------------------------

_Q3_DATE = "1998-03-15 00:00:00"

_Q3_ORACLE = f"""
SELECT
  l_orderkey,
  {oracle_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
  AND l_shipdate  > TIMESTAMP '{_Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("join", "agg", "topk"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-orders revenue: customer⨝orders⨝lineitem, top-10 by revenue.

    customer is broadcast (dimension side); orders⨝lineitem is the only
    shuffle join and AQE may still turn it broadcast at small SF.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5 — local supplier volume (TPC-H Q5 shape): 6-way join with a
# non-key equi-condition (c_nationkey = s_nationkey), agg over nation.
# --------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT
  n_name,
  {oracle_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE, tags=("join", "agg"))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation where customer and supplier share a nation.

    All dimension sides (supplier, nation, region, customer-at-ratio)
    broadcast; the fact table shuffles once for the orders join.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# q6 — forecast revenue change (TPC-H Q6 shape): pure filter + global agg.
# The canonical pushdown test: all three predicates reach the parquet scan.
# --------------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT {oracle_sum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("filter", "agg"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate with conjunctive range predicates (all pushed down)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(exact_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# --------------------------------------------------------------------------
# q10 — returned items (TPC-H Q10 shape): join + agg + top-20.
# --------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT
  c_custkey,
  c_name,
  {oracle_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE, tags=("join", "agg", "topk"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by lost revenue from returned items."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Join-type family. The reference's only join-like op is a KV batch-get
# (statestore.go:224-257 ≈ semi-join by key list); the engine exposes the
# full join matrix. Each variant is oracle-checked separately so the
# driver inventory shows per-type coverage.
# --------------------------------------------------------------------------

_JOIN_LEFT_ORACLE = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY c_custkey
"""


@register("join_left_outer", oracle=_JOIN_LEFT_ORACLE, tags=("join",))
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER: order count per customer, preserving order-less customers."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


_JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_totalprice > 400000)
ORDER BY c_custkey
"""


@register("join_left_semi", oracle=_JOIN_SEMI_ORACLE, tags=("join",))
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers with at least one big order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


_JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


@register("join_left_anti", oracle=_JOIN_ANTI_ORACLE, tags=("join",))
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no orders at all."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# NOT IN (subquery) with a NULLABLE probe key — the three-valued-logic
# join corner plain anti join gets WRONG: a NULL probe key makes the
# NOT IN predicate UNKNOWN, so those rows are dropped, whereas a
# DataFrame-API left_anti on == keeps them (no equi-match). The SQL text
# is identical in both engines; Catalyst plans the single-key form as a
# null-aware anti join (BroadcastHashJoin … isNullAwareAntiJoin=true,
# asserted in tests/test_plans.py) — the probe side streams, the build
# side broadcasts with its null-existence bit, no shuffle of the fact.
_JOIN_NAAJ_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM (
  SELECT o_orderpriority, o_totalprice,
         CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END AS probe_key
  FROM orders
) o
WHERE probe_key NOT IN (
  SELECT c_custkey FROM customer
  WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 5000
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("join_null_aware_anti", oracle=_JOIN_NAAJ_SQL, tags=("join",))
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (subquery) over a nullable probe key — null-aware anti
    join. Pending orders get a NULL probe key, so NOT IN's three-valued
    logic excludes them along with the actual matches; identical SQL
    runs on both engines (see _JOIN_NAAJ_SQL comment for the physical
    plan story)."""
    load_tables(spark, sf_dir)
    return spark.sql(_JOIN_NAAJ_SQL)


# Correlated LATERAL subquery with ORDER BY … LIMIT — the "top-k rows
# of the right table PER left row" join form. Catalyst decorrelates the
# LIMIT via DomainJoin → window rewrite (one shuffle, no per-row
# re-execution); identical SQL runs on DuckDB, which executes LATERAL
# natively. Semantically overlaps window_topk_per_group, but exercises
# the planner's correlated-subquery decorrelation path, which nothing
# else in the registry touches.
_JOIN_LATERAL_SQL = """
SELECT c_custkey, t.o_orderkey, t.o_totalprice
FROM customer,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey, o_totalprice DESC, o_orderkey
"""


@register("join_lateral_topk", oracle=_JOIN_LATERAL_SQL, tags=("join", "subquery"))
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each BUILDING customer's two most expensive orders via a
    correlated LATERAL (ORDER BY … LIMIT) subquery — see
    _JOIN_LATERAL_SQL comment for the decorrelation story."""
    load_tables(spark, sf_dir)
    return spark.sql(_JOIN_LATERAL_SQL)


_JOIN_FULL_ORACLE = """
SELECT n_nationkey, n_name, s_suppkey, s_name
FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey
ORDER BY n_nationkey NULLS LAST, s_suppkey NULLS LAST
"""


@register("join_full_outer", oracle=_JOIN_FULL_ORACLE, tags=("join",))
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER: nations × suppliers, keeping both unmatched sides."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "full")
        .select("n_nationkey", "n_name", "s_suppkey", "s_name")
        .orderBy(
            F.col("n_nationkey").asc_nulls_last(), F.col("s_suppkey").asc_nulls_last()
        )
    )


_JOIN_CROSS_ORACLE = """
SELECT a.r_name AS r1, b.r_name AS r2
FROM region a CROSS JOIN region b
ORDER BY r1, r2
"""


@register("join_cross", oracle=_JOIN_CROSS_ORACLE, tags=("join",))
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS: all region pairs (25 rows) — the cartesian path."""
    a = _t(spark, sf_dir, "region").select(F.col("r_name").alias("r1"))
    b = _t(spark, sf_dir, "region").select(F.col("r_name").alias("r2"))
    return a.crossJoin(b).orderBy("r1", "r2")


_JOIN_RIGHT_ORACLE = """
SELECT o_orderkey, o_custkey, c_name
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
WHERE c_acctbal < -900
ORDER BY c_name, o_orderkey NULLS LAST
"""


@register("join_right_outer", oracle=_JOIN_RIGHT_ORACLE, tags=("join",))
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER: all poorest customers, with their orders if any."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -900)
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .select("o_orderkey", "o_custkey", "c_name")
        .orderBy("c_name", F.col("o_orderkey").asc_nulls_last())
    )


_JOIN_THETA_ORACLE = """
SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS rkey
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
ORDER BY rkey, nation_a, nation_b
"""


@register("join_theta_pairs", oracle=_JOIN_THETA_ORACLE, tags=("join",))
def join_theta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + inequality (theta) join: unordered nation pairs per region."""
    a = _t(spark, sf_dir, "nation").alias("a")
    b = _t(spark, sf_dir, "nation").alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
            F.col("a.n_regionkey").alias("rkey"),
        )
        .orderBy("rkey", "nation_a", "nation_b")
    )


_BROADCAST_ORACLE = f"""
SELECT p_brand, {oracle_sum('l_quantity')} AS total_qty, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


@register("join_broadcast_dim", oracle=_BROADCAST_ORACLE, tags=("join", "broadcast"))
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⨝dim with an explicit broadcast hint — no shuffle of lineitem.

    At 100 TB, `part` at TPC-H ratio is ~1/30 of lineitem and too big to
    broadcast wholesale; the pattern then is pruning the dim first
    (filter/project) to get under the broadcast threshold, which this
    query demonstrates by projecting only (p_partkey, p_brand).
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(exact_sum("l_quantity", "total_qty"), F.count("*").alias("n_items"))
        .orderBy("p_brand")
    )


def q1_pricing_summary_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput variant of q1: native double aggregation (no decimal),
    ~2x the scan-to-result rate of the exact form. Deliberately NOT
    registered — double sums are partition-order dependent in their last
    ulp, so the raw output can never hash-match an oracle; its
    correctness proof is the registered ``q1_fast_validation`` below
    (per-measure |fast − exact| ≤ 1e-9·|exact| bounds, driver-green),
    and bench.py times this function directly so the headline total
    stays comparable across rounds. Rounded to 2 dp, which is stable
    for reporting even though not hash-stable."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# The fast (double) path cannot hash-match an exact oracle — its last ulp
# depends on partition merge order. What CAN be checked: that every fast
# sum lands within a tight relative tolerance of the exact decimal sum.
# Both paths run in ONE aggregate pass; the oracle emits the group keys,
# the exact row count, and literal TRUE for each bound.
_Q1_FAST_VALID_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       TRUE AS ok_sum_qty,
       TRUE AS ok_sum_base_price,
       TRUE AS ok_sum_disc_price,
       TRUE AS ok_sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_fast_validation", oracle=_Q1_FAST_VALID_ORACLE, tags=("agg", "fast"))
def q1_fast_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-bound proof for the q1 fast path: |double_sum − exact_sum|
    ≤ 1e-9·|exact_sum| per measure (double summation of ~n values drifts
    by at most ~n·2⁻⁵² relative — 1e-9 is orders of magnitude of slack at
    any SF the driver runs). A FALSE here means the fast variant's answer
    is wrong beyond float noise, not merely unhashable."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    pairs = {
        "sum_qty": F.col("l_quantity"),
        "sum_base_price": F.col("l_extendedprice"),
        "sum_disc_price": disc_price,
        "sum_charge": charge,
    }
    aggs = []
    for name, expr in pairs.items():
        aggs.append(F.sum(expr).alias(f"fast_{name}"))
        aggs.append(exact_sum(expr, f"exact_{name}"))
    agg = (
        l.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*aggs, F.count("*").alias("count_order"))
    )
    checks = [
        (
            F.abs(F.col(f"fast_{name}") - F.col(f"exact_{name}"))
            <= 1e-9 * F.abs(F.col(f"exact_{name}"))
        ).alias(f"ok_{name}")
        for name in pairs
    ]
    return agg.select(
        "l_returnflag", "l_linestatus", *checks, "count_order"
    ).orderBy("l_returnflag", "l_linestatus")
