"""Scalar-function surface (SURVEY.md §2.2 "Scalar functions"): string,
date/time, math, array, map/json, and conditional families — each as one
oracle-checked query so the driver inventory shows per-family coverage.

The reference's only scalar computation is state-store key formatting
(`fmt.Sprintf("client::{app}")` etc., statemodel.go:8-14,:24-26,:35-37)
and a base64 id suffix (pkg/xrand/xrand.go:16); `scalar_string_funcs`
reproduces both shapes (concat_ws/format_string, base64) among the
general string set.

All functions here are built-in `pyspark.sql.functions` — JVM-side,
inside whole-stage codegen; nothing in this module touches Python at
row level. Math demos stick to IEEE-exact operations (sqrt is
correctly-rounded; pow on small integer exponents is exact) so the
cross-engine hash match is not at the mercy of libm rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


_STRING_ORACLE = """
SELECT p_partkey,
       concat_ws('#', p_brand, p_type)                    AS part_key_fmt,
       printf('part::%s::%d', p_brand, p_size)            AS part_key_printf,
       upper(p_name)                                      AS name_upper,
       lower(p_brand)                                     AS brand_lower,
       substring(p_name, 1, 8)                            AS name_prefix,
       length(p_name)                                     AS name_len,
       regexp_extract(p_type, '([A-Z]+)', 1)              AS type_first_word,
       replace(p_brand, 'BRAND', 'B')                     AS brand_short,
       lpad(CAST(p_size AS VARCHAR), 4, '0')              AS size_padded,
       trim('  ' || p_brand || ' ')                       AS brand_trim,
       to_base64(encode(p_brand))                         AS brand_b64,
       md5(p_name)                                        AS name_md5,
       sha256(p_name)                                     AS name_sha256
FROM part
ORDER BY p_partkey
"""


@register("scalar_string_funcs", oracle=_STRING_ORACLE, tags=("scalar", "string"))
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family incl. the reference's key-format and base64 shapes."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.concat_ws("#", "p_brand", "p_type").alias("part_key_fmt"),
            F.format_string("part::%s::%d", "p_brand", "p_size").alias(
                "part_key_printf"
            ),
            F.upper("p_name").alias("name_upper"),
            F.lower("p_brand").alias("brand_lower"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").cast("bigint").alias("name_len"),
            F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("type_first_word"),
            F.replace(F.col("p_brand"), F.lit("BRAND"), F.lit("B")).alias(
                "brand_short"
            ),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias(
                "brand_trim"
            ),
            F.base64(F.col("p_brand").cast("binary")).alias("brand_b64"),
            F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
            F.sha2(F.col("p_name").cast("binary"), 256).alias("name_sha256"),
        )
        .orderBy("p_partkey")
    )


_DATE_ORACLE = """
SELECT event_id,
       strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')  AS day_start,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       CAST(year(ts)  AS BIGINT) AS y,
       CAST(month(ts) AS BIGINT) AS m,
       CAST(day(ts)   AS BIGINT) AS d,
       CAST(hour(ts)  AS BIGINT) AS h,
       CAST(isodow(ts) AS BIGINT) AS iso_weekday,
       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS unix_sec,
       CAST(datediff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
         AS days_since_ny,
       strftime(date_trunc('day', ts) + INTERVAL 7 DAY, '%Y-%m-%d') AS plus_week
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


@register("scalar_date_funcs", oracle=_DATE_ORACLE, tags=("scalar", "datetime"))
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: trunc, field extraction, epoch, diff, arithmetic."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return (
        e.select(
            "event_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "day_start"
            ),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            F.year("ts").cast("bigint").alias("y"),
            F.month("ts").cast("bigint").alias("m"),
            F.dayofmonth("ts").cast("bigint").alias("d"),
            F.hour("ts").cast("bigint").alias("h"),
            (F.weekday(F.col("ts")) + 1).cast("bigint").alias("iso_weekday"),
            F.unix_timestamp(F.date_trunc("second", "ts")).alias("unix_sec"),
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("days_since_ny"),
            F.date_format(
                F.date_add(F.to_date(F.date_trunc("day", "ts")), 7), "yyyy-MM-dd"
            ).alias("plus_week"),
        )
        .orderBy("event_id")
    )


_MATH_ORACLE = """
SELECT p_partkey,
       round(p_retailprice, 1)            AS price_round,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT)  AS price_ceil,
       abs(p_size - 25)                   AS size_dev,
       ((p_size % 7) + 7) % 7             AS size_mod7,
       power(2.0, p_size % 10)            AS pow2,
       sqrt(CAST(p_size AS DOUBLE))       AS size_sqrt,
       round(ln(p_retailprice), 9)        AS price_ln,
       round(log10(p_retailprice), 9)     AS price_log10,
       CAST(sign(p_size - 25) AS DOUBLE)  AS size_sign,
       greatest(p_size, 25)               AS size_max25,
       least(p_size, 25)                  AS size_min25
FROM part
ORDER BY p_partkey
"""


@register("scalar_math_funcs", oracle=_MATH_ORACLE, tags=("scalar", "math"))
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (IEEE-exact subset; see module docstring)."""
    p = _t(spark, sf_dir, "part")
    size = F.col("p_size")
    return (
        p.select(
            "p_partkey",
            F.round("p_retailprice", 1).alias("price_round"),
            F.floor("p_retailprice").alias("price_floor"),
            F.ceil("p_retailprice").alias("price_ceil"),
            F.abs(size - 25).alias("size_dev"),
            F.pmod(size, F.lit(7)).alias("size_mod7"),
            F.pow(F.lit(2.0), size % 10).alias("pow2"),
            F.sqrt(size.cast("double")).alias("size_sqrt"),
            # libm-backed, not correctly-rounded by IEEE → engines may
            # differ in the last ulp; rounded to 9 dp (margin ~1e6×)
            F.round(F.log(F.col("p_retailprice")), 9).alias("price_ln"),
            F.round(F.log10(F.col("p_retailprice")), 9).alias("price_log10"),
            F.signum(size - 25).cast("double").alias("size_sign"),
            F.greatest(size, F.lit(25)).cast("bigint").alias("size_max25"),
            F.least(size, F.lit(25)).cast("bigint").alias("size_min25"),
        )
        .orderBy("p_partkey")
    )


_ARRAY_ORACLE = """
SELECT doc_id,
       len(words)                                   AS n_words,
       len(list_distinct(words))                    AS n_unique_words,
       list_contains(words, 'spark')                AS has_spark,
       array_to_string(list_sort(list_distinct(words))[1:5], ',') AS first_words_csv,
       words[1]                                     AS head_word,
       array_to_string(list_sort(list_distinct(words))[1:3], ',') AS top3_csv
FROM (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS words FROM documents
)
ORDER BY doc_id
"""


@register("scalar_array_funcs", oracle=_ARRAY_ORACLE, tags=("scalar", "array"))
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized documents: size, distinct, contains,
    sort, slice, element_at, join.

    Output discipline: array-typed cells are projected to delimited
    strings (array_join over the sorted slice) — same semantics, but the
    result is hashable by pandas-based canonicalizers; bare list cells
    crash `sort_values` (the r2 gate failure for this query)."""
    d = _t(spark, sf_dir, "documents").withColumn("words", F.split("text", " "))
    uniq_sorted = F.sort_array(F.array_distinct("words"))
    return (
        d.select(
            "doc_id",
            F.size("words").cast("bigint").alias("n_words"),
            F.size(F.array_distinct("words")).cast("bigint").alias("n_unique_words"),
            F.array_contains("words", "spark").alias("has_spark"),
            F.array_join(F.slice(uniq_sorted, 1, 5), ",").alias("first_words_csv"),
            F.element_at("words", 1).alias("head_word"),
            F.array_join(F.slice(uniq_sorted, 1, 3), ",").alias("top3_csv"),
        )
        .orderBy("doc_id")
    )


_JSON_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
       json_extract_string(props, '$.missing')            AS missing_key,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod10
FROM events
WHERE event_id < 300
ORDER BY event_id
"""


@register("scalar_json_funcs", oracle=_JSON_ORACLE, tags=("scalar", "json"))
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over the events payload — the schema-on-read decode the
    reference leaves to its application (SURVEY.md §1.1)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select(
            "event_id",
            k.alias("k_value"),
            F.get_json_object("props", "$.missing").alias("missing_key"),
            (k % 10).alias("k_mod10"),
        )
        .orderBy("event_id")
    )


_COND_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END                           AS bal_bucket,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
       CASE WHEN c_acctbal >= 0 THEN c_acctbal END    AS bal_nonneg,
       c_nationkey IN (1, 2, 3)                       AS in_first_nations,
       c_acctbal BETWEEN 0 AND 1000                   AS small_positive
FROM customer
ORDER BY c_custkey
"""


@register("scalar_conditional_funcs", oracle=_COND_ORACLE, tags=("scalar", "cond"))
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif, isin, between."""
    c = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return (
        c.select(
            "c_custkey",
            F.when(bal < 0, "debt")
            .when(bal < 5000, "low")
            .otherwise("high")
            .alias("bal_bucket"),
            F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
                "segment_masked"
            ),
            F.when(bal >= 0, bal).alias("bal_nonneg"),
            F.col("c_nationkey").isin(1, 2, 3).alias("in_first_nations"),
            bal.between(0, 1000).alias("small_positive"),
        )
        .orderBy("c_custkey")
    )


# URL functions: the crawl-pipeline scalar family (host extraction for
# per-domain grouping, path/query parsing, parameter pull, encoding).
# URLs are CONSTRUCTED from table columns so the oracle can mirror each
# extraction with plain string ops — what is under test is that Spark's
# parse_url implements the spec'd decomposition (a real crawl pipeline
# groups by exactly this HOST output).
_URL_ORACLE = """
SELECT doc_id,
       'https://' || source || '.example.com/docs/' || doc_id
         || '?lang=' || lang || '&v=' || (n_chars % 10) AS url,
       'https' AS proto,
       source || '.example.com' AS host,
       '/docs/' || doc_id AS path,
       'lang=' || lang || '&v=' || (n_chars % 10) AS query,
       lang AS lang_param,
       'a+b%2Bc' AS encoded  -- form-encoding: space->'+', '+'->%2B
FROM documents
ORDER BY doc_id
LIMIT 500
"""


@register("scalar_url_funcs", oracle=_URL_ORACLE, tags=("scalar", "url"))
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url over constructed per-doc URLs: PROTOCOL/HOST/PATH/QUERY
    decomposition plus single-parameter extraction and url_encode — the
    scalar layer of per-domain crawl analytics (group-by-host rides the
    HOST output). Pure map-side JVM expressions; the oracle rebuilds
    every component from the same source columns."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v="),
        F.col("n_chars") % 10,
    )
    return (
        d.select(
            "doc_id",
            url.alias("url"),
            F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
            F.parse_url(url, F.lit("HOST")).alias("host"),
            F.parse_url(url, F.lit("PATH")).alias("path"),
            F.parse_url(url, F.lit("QUERY")).alias("query"),
            F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
            F.url_encode(F.lit("a b+c")).alias("encoded"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


# Bitwise function family: shifts, AND/OR/XOR, bit_count — the scalar
# layer under bitmap indexes, flag packing, and the simhash/z-order
# operators (dedup.py, skew.py) that already rely on them in anger.
_BITWISE_ORACLE = """
SELECT p_partkey,
       p_partkey << 3 AS shl,
       p_partkey >> 2 AS shr,
       p_partkey & 255 AS band,
       p_partkey | 4096 AS bor,
       xor(p_partkey, 1365) AS bxor,
       CAST(bit_count(p_partkey) AS INTEGER) AS popcount,
       CAST(~p_partkey AS BIGINT) AS bnot
FROM part
ORDER BY p_partkey
LIMIT 500
"""


@register("scalar_bitwise_funcs", oracle=_BITWISE_ORACLE, tags=("scalar", "bitwise"))
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar coverage: shiftleft/shiftright, AND/OR/XOR,
    bit_count (popcount), NOT — pure map-side JVM expressions, the
    primitives the simhash Hamming tier and Morton/Z-order layout are
    built from."""
    d = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return (
        d.select(
            "p_partkey",
            F.shiftleft(k, 3).alias("shl"),
            F.shiftright(k, 2).alias("shr"),
            k.bitwiseAND(255).alias("band"),
            k.bitwiseOR(4096).alias("bor"),
            k.bitwiseXOR(1365).alias("bxor"),
            F.bit_count(k).alias("popcount"),
            F.expr("~p_partkey").cast("bigint").alias("bnot"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


# -- Regex function family ---------------------------------------------------

# Patterns live in the Java-regex ∩ RE2 common subset (word boundaries,
# classes, groups — no lookaround/backrefs in the PATTERN; the
# REPLACEMENT backreference is spelled $1 in Spark, \1 in DuckDB).
_RX_WORDS = r"\bs[a-z]+"

_REGEX_ORACLE = rf"""
SELECT doc_id,
       COALESCE(array_to_string(regexp_extract_all(text, '{_RX_WORDS}'), ','), '')
         AS s_words,
       CAST(len(regexp_extract_all(text, '{_RX_WORDS}')) AS BIGINT)
         AS n_s_words,
       regexp_extract(text, '{_RX_WORDS}') AS first_s_word,
       md5(regexp_replace(text, '({_RX_WORDS})', '<\1>', 'g'))
         AS tagged_md5,
       regexp_matches(text, 'stream [a-z]+ window') AS has_phrase
FROM documents
ORDER BY doc_id
"""


@register("scalar_regex_funcs", oracle=_REGEX_ORACLE, tags=("scalar",))
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regex surface as one row-parallel pass: extract-all (list),
    match count, first match, replace-all with a group backreference
    (md5-pinned so the entire rewritten text is value-checked), boolean
    match. All JVM regexp expressions at scan speed; the oracle runs
    the same patterns on RE2 (DuckDB), so the query doubles as a
    portability gate for the Java∩RE2 pattern subset — same discipline
    as text_pii_scrub. The extract-all list is serialized to a
    comma-joined string on BOTH engines: registered queries must not
    return array/map columns (driver canonicalizer constraint — see
    the r2 note above; enforced by oracle.lint_output_schema inside
    the gate)."""
    d = read_table(spark, sf_dir, "documents")
    # Spark SQL string literals process backslash escapes ('\b' would be
    # a backspace); DuckDB's standard-SQL literals do not — so the Spark
    # expr gets the doubled spelling of the same pattern
    rx = _RX_WORDS.replace("\\", "\\\\")
    return d.select(
        "doc_id",
        # coalesce mirrors the oracle's COALESCE: DuckDB needs it because
        # array_to_string([]) is NULL there; Spark needs it for NULL text
        # (array_join propagates NULL where the oracle coalesces to '') —
        # without BOTH, a NULL documents.text row would diverge (r7 advice)
        F.expr(
            f"coalesce(array_join(regexp_extract_all(text, '{rx}', 0), ','), '')"
        ).alias("s_words"),
        F.expr(f"cast(size(regexp_extract_all(text, '{rx}', 0)) AS bigint)").alias(
            "n_s_words"
        ),
        F.expr(f"regexp_extract(text, '{rx}', 0)").alias("first_s_word"),
        F.md5(F.expr(f"regexp_replace(text, '({rx})', '<$1>')")).alias(
            "tagged_md5"
        ),
        F.col("text").rlike("stream [a-z]+ window").alias("has_phrase"),
    ).orderBy("doc_id")


# -- ANSI-safe try_* family --------------------------------------------------

# Spark 4 runs ANSI mode by default: bad casts and zero divisions THROW
# unless the try_* forms are used — making this family the production
# error-safety surface, not a convenience. DuckDB's TRY_CAST matches;
# its arithmetic returns NULL-on-NULL but errors differently on /0 for
# integers, so the oracle spells the same semantics with CASE.
_TRY_ORACLE = """
SELECT doc_id,
       TRY_CAST(word AS BIGINT) AS as_int,
       strftime(TRY_CAST(CASE WHEN doc_id % 3 = 0 THEN 'not a date'
                         ELSE '2024-01-15' END AS DATE), '%Y-%m-%d') AS as_date,
       CASE WHEN (doc_id % 5) = 0 THEN NULL
            ELSE CAST(n_chars AS DOUBLE) / (doc_id % 5) END AS safe_div,
       CASE WHEN n_chars > 9223372036854775807 - doc_id THEN NULL
            ELSE n_chars + doc_id END AS safe_add
FROM (
  SELECT doc_id, n_chars,
         CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id AS VARCHAR)
              ELSE 'x' || CAST(doc_id AS VARCHAR) END AS word
  FROM documents
)
ORDER BY doc_id
"""


@register("scalar_try_funcs", oracle=_TRY_ORACLE, tags=("scalar",))
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The try_* error-safe expression family (try_cast / try_divide /
    try_add, plus a failing date cast): under Spark 4's default ANSI
    mode these return NULL where the plain forms THROW — the difference
    between a 100 TB job surviving one malformed row and dying at hour
    nine. All map-side, scan-speed; the oracle mirrors the NULL-on-
    failure semantics with TRY_CAST + CASE."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    word = F.when(
        F.col("doc_id") % 2 == 0, F.col("doc_id").cast("string")
    ).otherwise(F.concat(F.lit("x"), F.col("doc_id").cast("string")))
    return (
        d.withColumn("word", word)
        .select(
            "doc_id",
            F.expr("try_cast(word AS bigint)").alias("as_int"),
            F.date_format(
                F.expr(
                    "try_cast(CASE WHEN doc_id % 3 = 0 THEN 'not a date'"
                    " ELSE '2024-01-15' END AS date)"
                ),
                "yyyy-MM-dd",
            ).alias("as_date"),
            F.expr(
                "try_divide(cast(n_chars AS double),"
                " cast(doc_id % 5 AS double))"
            ).alias("safe_div"),
            F.expr("try_add(n_chars, doc_id)").alias("safe_add"),
        )
        .orderBy("doc_id")
    )
