"""Reshaping + array-programming surface: explode/posexplode, Spark's
higher-order array functions, unpivot (melt), and the two-stage salted
aggregation pattern for skewed keys.

Salting note (100 TB): a hot group key concentrates a whole key's rows
in one reducer. `agg_salted_skew` shows the standard fix — aggregate on
(key, salt) first (spreads each hot key over N reducers), then merge
partials on key. Catalyst's AQE skew handling covers *joins*
automatically; for aggregations the partial-agg usually suffices, but
high-cardinality accumulators (collect/distinct) need explicit salt —
hence a first-class, oracle-checked demonstration that the rewrite is
semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.functions.exact import dec, oracle_sum
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


_EXPLODE_ORACLE = """
SELECT doc_id, CAST(pos AS BIGINT) AS pos, word
FROM (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS words FROM documents
  WHERE doc_id < 20
), UNNEST(range(1, len(words) + 1)) AS t(pos0),
LATERAL (SELECT words[pos0] AS word, pos0 - 1 AS pos)
ORDER BY doc_id, pos
"""


@register("reshape_posexplode", oracle=_EXPLODE_ORACLE, tags=("reshape",))
def reshape_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → (position, element) rows (the 1→N generator;
    UDTF-shaped surface)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
        )
        .withColumn("pos", F.col("pos").cast("bigint"))
        .orderBy("doc_id", "pos")
    )


_HOF_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 50
)
SELECT vec_id,
       round(list_aggregate(list_transform(v, x -> x * 2.0), 'sum'), 6)
         AS doubled_sum,
       CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_positive,
       round(list_aggregate(v, 'max'), 6) AS max_val,
       round(list_aggregate(list_transform(v, x -> abs(x)), 'max'), 6)
         AS max_abs
FROM e
ORDER BY vec_id
"""


@register("scalar_higher_order_funcs", oracle=_HOF_ORACLE, tags=("scalar", "hof"))
def scalar_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / aggregate
    (fold) / array_max — the lambda-expression surface.

    NB both engines sum element-wise in list order (left fold), so the
    double sums agree; rounded to 6 dp as belt-and-braces.
    """
    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        em.select(
            "vec_id",
            F.round(
                F.aggregate(
                    F.transform(v, lambda x: x * 2.0),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("doubled_sum"),
            F.size(F.filter(v, lambda x: x > 0)).cast("bigint").alias("n_positive"),
            F.round(F.array_max(v), 6).alias("max_val"),
            F.round(F.array_max(F.transform(v, lambda x: F.abs(x))), 6).alias(
                "max_abs"
            ),
        )
        .orderBy("vec_id")
    )


_UNPIVOT_ORACLE = """
SELECT c_custkey, metric, val
FROM (
  SELECT c_custkey,
         CAST(c_acctbal AS DOUBLE) AS acctbal,
         CAST(c_nationkey AS DOUBLE) AS nationkey
  FROM customer WHERE c_custkey <= 50
) UNPIVOT (val FOR metric IN (acctbal, nationkey))
ORDER BY c_custkey, metric
"""


@register("reshape_unpivot", oracle=_UNPIVOT_ORACLE, tags=("reshape",))
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide columns → (metric, value) long format —
    the inverse of agg_pivot."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 50)
        .select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.col("c_nationkey").cast("double").alias("nationkey"),
        )
    )
    return (
        c.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
        .orderBy("c_custkey", "metric")
    )


_SALT_ORACLE = f"""
SELECT event_type,
       {oracle_sum('"value"')} AS total_value,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("agg_salted_skew", oracle=_SALT_ORACLE, tags=("agg", "skew"))
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a 5-hot-key distribution:
    stage 1 aggregates (key, salt∈[0,16)) partials, stage 2 merges on
    key — identical result to the direct groupBy, proven by the oracle.
    Decimal partials keep the merge order-independent."""
    e = _t(spark, sf_dir, "events")
    salted = e.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.sum(dec("value")).alias("pv"),
        F.count("*").alias("pn"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pv").cast("double").alias("total_value"),
            F.sum("pn").alias("n"),
        )
        .orderBy("event_type")
    )


_SEEDED_FRACS = {"BUILDING": 0.5, "AUTOMOBILE": 0.2, "MACHINERY": 0.1}

# Sampling RNGs are engine-specific, so the draw itself can't hash-match
# a DuckDB replay. What CAN be checked (the sketch-oracle pattern): the
# drawn count lands inside a 5σ binomial window around the expected
# count, and the same seed reproduces the identical key set. The oracle
# emits the group keys, the SQL-derivable population/expected counts,
# and literal TRUE per bound — a FALSE → hash mismatch → red row.
_SEEDED_ORACLE = f"""
SELECT 'plain' AS kind,
       (SELECT COUNT(*) FROM orders) AS population,
       TRUE AS count_ok,
       TRUE AS determinism_ok
UNION ALL
SELECT 'stratified',
       (SELECT COUNT(*) FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')),
       TRUE, TRUE
ORDER BY kind
"""


@register("sample_seeded", oracle=_SEEDED_ORACLE, tags=("sample",))
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (10%) + per-stratum sampleBy — the
    corpus-subsampling primitives, emitted as a validation row per kind:
    (kind, population, count_ok, determinism_ok).

    count_ok: |n − E[n]| ≤ 5σ (binomial); a FALSE is a real sampler
    defect, not noise. determinism_ok: drawing twice with the same seed
    yields the identical key multiset (exceptAll both ways is empty).
    Spark seeds the sampler per PARTITION (seed + partition index), so
    reproducibility is 'same seed + same input split layout → same
    sample' — a repartition changes the sample; use
    ``sample_hash_deterministic`` when a manifest must survive
    re-layout. The raw sampled rows remain available programmatically
    (``df.sample`` / ``sampleBy`` — this query IS those calls, plus the
    validation fold)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")

    def _check(kind: str, draw, pop: DataFrame, expected, variance):
        s1, s2 = draw(), draw()
        n_diff = (
            s1.exceptAll(s2).unionAll(s2.exceptAll(s1)).agg(
                F.count("*").alias("n_diff")
            )
        )
        n = s1.agg(F.count("*").alias("n"))
        stats = pop.crossJoin(n).crossJoin(n_diff)
        return stats.select(
            F.lit(kind).alias("kind"),
            F.col("population"),
            (
                F.abs(F.col("n") - expected) <= 5 * F.sqrt(variance)
            ).alias("count_ok"),
            (F.col("n_diff") == 0).alias("determinism_ok"),
        )

    plain = _check(
        "plain",
        lambda: o.sample(fraction=0.1, seed=42).select("o_orderkey"),
        o.agg(F.count("*").alias("population")),
        0.1 * F.col("population"),
        0.1 * 0.9 * F.col("population"),
    )
    strata = c.filter(F.col("c_mktsegment").isin(*_SEEDED_FRACS))
    frac = F.when(
        F.col("c_mktsegment") == "BUILDING", F.lit(0.5)
    ).when(F.col("c_mktsegment") == "AUTOMOBILE", F.lit(0.2)).otherwise(F.lit(0.1))
    strat_pop = strata.agg(
        F.count("*").alias("population"),
        F.sum(frac).alias("expected"),
        F.sum(frac * (1 - frac)).alias("variance"),
    )
    stratified = _check(
        "stratified",
        lambda: c.sampleBy("c_mktsegment", _SEEDED_FRACS, seed=42).select(
            "c_custkey"
        ),
        strat_pop,
        F.col("expected"),
        F.col("variance"),
    )
    return plain.unionByName(stratified).orderBy("kind")


_HASH_SAMPLE_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus
FROM orders
WHERE ((o_orderkey % 2147483648) * 2654435761) % 4294967296 < 429496729
ORDER BY o_orderkey
"""


@register("sample_hash_deterministic", oracle=_HASH_SAMPLE_ORACLE, tags=("sample",))
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via a Knuth multiplicative hash on the
    key: (key * 2654435761) mod 2^32 < 0.1·2^32. Unlike seeded RNG
    sampling (see ``sample_seeded``), membership depends ONLY on the key
    value — stable under repartitioning, re-layout, engine choice, and
    incremental reruns, which is what a training-data manifest needs
    (the sample taken today must be reproducible against tomorrow's
    re-sharded copy of the corpus). Pure integer arithmetic → expressed
    identically in both engines, so this one IS oracle-exact.

    Scale: a narrow filter evaluated map-side at scan speed — no
    shuffle, no RNG state; the predicate is codegen'd. Overflow guard:
    the key is reduced mod 2^31 BEFORE the multiply, so the product is
    < 2^31·2654435761 ≈ 5.7e18 < 2^63−1 in both engines at any key
    width — without the mask, keys ≳3.5e9 (TPC-H SF ≳ 600) would
    silently wrap in Spark (sign-preserving %, over-sampling negatives)
    while DuckDB raises an out-of-range error, i.e. the engines would
    diverge rather than merely lose uniformity. Sampling is uniform
    within each 2^31 block of key space.
    """
    o = _t(spark, sf_dir, "orders")
    keep = (
        (F.col("o_orderkey") % F.lit(2147483648)) * F.lit(2654435761)
    ) % F.lit(4294967296) < F.lit(429496729)
    return (
        o.filter(keep)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


# -- stratified exact-count sampling ---------------------------------------

_STRAT_N = 20  # rows kept per stratum


_STRAT_ORACLE = f"""
SELECT lang, doc_id, n_chars, rnk FROM (
  SELECT lang, doc_id, n_chars,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296,
                    doc_id) AS BIGINT) AS rnk
  FROM documents) t
WHERE rnk <= {_STRAT_N}
ORDER BY lang, rnk
"""


@register("sample_stratified_exact", oracle=_STRAT_ORACLE, tags=("sample",))
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly N documents per language stratum, deterministically.

    ``sample_seeded``'s sampleBy draws Bernoulli per row — stratum counts
    are binomial, not exact, and depend on the input split layout. This
    operator instead ranks each stratum by the Knuth multiplicative hash
    of the key (the ``sample_hash_deterministic`` contract: mod-2^31
    mask before the multiply so the product never overflows int64, see
    reshape.py:251) and keeps rank <= N — an exact per-stratum quota
    whose membership depends only on key values, so the manifest is
    reproducible across engines, re-sharding, and reruns; hash-ordering
    makes the quota a uniform draw rather than a doc_id-prefix bias.
    Fully integer → oracle-exact.

    Scale: one hash-partition shuffle on the stratum key, then a
    per-partition rank — the same shape as any windowed top-k. Skewed
    strata (one language = 90% of a 100 TB corpus) bound the single
    largest task by that stratum's row count; for that regime pre-filter
    with an approximate per-stratum threshold on the hash value (keep
    hash < N/count(stratum)·2^32 · safety-factor, then exact-rank the
    survivors) so the shuffle carries ~N rows per stratum, not the
    stratum. The quota semantics (and the tie-break on doc_id) are
    unchanged by that optimization."""
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    hsh = (
        (F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)
    ) % F.lit(4294967296)
    w = W.partitionBy("lang").orderBy(hsh.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", "n_chars")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _STRAT_N)
        .orderBy("lang", "rnk")
    )


# -- Python UDTF (user-defined TABLE function) -------------------------------

_UDTF_ORACLE = """
SELECT doc_id, CAST(pos AS BIGINT) AS pos, word, CAST(wlen AS BIGINT) AS wlen
FROM (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS words FROM documents
  WHERE doc_id < 15
), UNNEST(range(1, len(words) + 1)) AS t(p1),
LATERAL (SELECT words[p1] AS word, p1 - 1 AS pos, length(words[p1]) AS wlen)
ORDER BY doc_id, pos
"""


@register("udtf_tokenize_lateral", oracle=_UDTF_ORACLE, tags=("reshape", "udf"))
def udtf_tokenize_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Python UDTF (Spark 4 ``@udtf``) applied via LATERAL join —
    the 1→N user-defined TABLE function surface itself, not its
    mapInPandas emulation (SURVEY.md §2.2 UDTF row): per document the
    UDTF yields (pos, word, wlen) rows.

    Deliberately bounded (doc_id < 15): Python UDTFs evaluate
    row-at-a-time in a worker subprocess — correct API parity, wrong
    hot path. The SAME result at corpus scale is ``reshape_posexplode``
    (JVM Generate, zero Python); the pairing documents when to reach
    for which."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: long, word: string, wlen: long")
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield i, w, len(w)

    spark.udtf.register("ks_tokenize", Tokenize)
    _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 15
    ).createOrReplaceTempView("ks_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.word, t.wlen
        FROM ks_udtf_docs d, LATERAL ks_tokenize(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )
