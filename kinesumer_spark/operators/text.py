"""Text-analysis operators for training-data curation over `documents`:
stats, quality scoring, token counting, heuristic language ID, and
document fingerprinting. All pure columnar expressions (no Python UDFs);
every query here is oracle-checked, including the fingerprint (the
rolling hash is built from md5, which both engines share).

Scale: each operator is a narrow map over the text column — no shuffle
at all until the final ORDER BY (which exists only for golden-test
determinism); at 100 TB these run at scan speed and pipeline into the
dedup/similarity stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesumer_spark.catalog import fan_out, read_table
from kinesumer_spark.operators.dedup import _sha32, _sha32_duck
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


_STATS_ORACLE = """
WITH w AS (
  SELECT doc_id, n_chars, regexp_split_to_array(text, ' ') AS words,
         length(replace(text, ' ', '')) AS letters
  FROM documents
)
SELECT doc_id,
       n_chars,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(list_distinct(words)) AS BIGINT) AS n_unique,
       round(len(list_distinct(words)) / CAST(len(words) AS DOUBLE), 6)
         AS type_token_ratio,
       round(letters / CAST(len(words) AS DOUBLE), 6) AS avg_word_len,
       CAST(list_max(list_transform(words, w -> length(w))) AS BIGINT)
         AS longest_word
FROM w
ORDER BY doc_id
"""


@register("text_stats", oracle=_STATS_ORACLE, tags=("text",))
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surface statistics (length, vocabulary, word shape)."""
    d = _t(spark, sf_dir)
    words = F.split("text", " ")
    letters = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return (
        d.select(
            "doc_id",
            "n_chars",
            F.size(words).cast("bigint").alias("n_words"),
            F.size(F.array_distinct(words)).cast("bigint").alias("n_unique"),
            F.round(
                F.size(F.array_distinct(words)) / F.size(words).cast("double"), 6
            ).alias("type_token_ratio"),
            F.round(letters / F.size(words).cast("double"), 6).alias("avg_word_len"),
            F.array_max(F.transform(words, lambda w: F.length(w)))
            .cast("bigint")
            .alias("longest_word"),
        )
        .orderBy("doc_id")
    )


# words-per-language stoplists for the heuristic language scorer; the
# point is the operator shape (explode → semi-join → argmax), not NLP
# accuracy on this synthetic corpus.
_STOPLISTS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to"),
    "de": ("der", "die", "das", "und", "ist", "zu"),
    "es": ("el", "la", "de", "y", "es", "que"),
    "fr": ("le", "la", "de", "et", "est", "que"),
    "zh": ("的", "是", "在", "了", "和", "有"),
}


def _sql_array(vals: tuple[str, ...]) -> str:
    inner = ", ".join(f"'{v}'" for v in vals)
    return f"[{inner}]"


_LANG_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang, regexp_split_to_array(text, ' ') AS words FROM documents
), scored AS (
  SELECT doc_id, lang,
         len(list_filter(words, x -> list_contains({_sql_array(_STOPLISTS['en'])}, x))) AS hits_en,
         len(list_filter(words, x -> list_contains({_sql_array(_STOPLISTS['de'])}, x))) AS hits_de,
         len(list_filter(words, x -> list_contains({_sql_array(_STOPLISTS['es'])}, x))) AS hits_es,
         len(list_filter(words, x -> list_contains({_sql_array(_STOPLISTS['fr'])}, x))) AS hits_fr,
         len(list_filter(words, x -> list_contains({_sql_array(_STOPLISTS['zh'])}, x))) AS hits_zh
  FROM w
)
SELECT doc_id, lang,
       CAST(hits_en AS BIGINT) AS hits_en,
       CAST(hits_de AS BIGINT) AS hits_de,
       CAST(hits_es AS BIGINT) AS hits_es,
       CAST(hits_fr AS BIGINT) AS hits_fr,
       CAST(hits_zh AS BIGINT) AS hits_zh,
       CASE GREATEST(hits_en, hits_de, hits_es, hits_fr, hits_zh)
         WHEN hits_en THEN 'en' WHEN hits_de THEN 'de' WHEN hits_es THEN 'es'
         WHEN hits_fr THEN 'fr' ELSE 'zh' END AS predicted_lang
FROM scored
ORDER BY doc_id
"""


@register("text_lang_id", oracle=_LANG_ORACLE, tags=("text",))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-hit argmax with a fixed precedence
    order (en > de > es > fr > zh) for deterministic ties."""
    d = _t(spark, sf_dir)
    words = F.split("text", " ")
    def _hit_count(stoplist: tuple[str, ...]):
        # NB: the closure must be built through a factory — a default-arg
        # lambda (`lambda w, sl=sl:`) reads as a 2-parameter (element,
        # index) higher-order-function lambda to Spark
        return F.size(F.filter(words, lambda w: w.isin(*stoplist))).cast("bigint")

    hits = {lang: _hit_count(sl) for lang, sl in _STOPLISTS.items()}
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == hits["en"], "en")
        .when(best == hits["de"], "de")
        .when(best == hits["es"], "es")
        .when(best == hits["fr"], "fr")
        .otherwise("zh")
    )
    return (
        d.select(
            "doc_id",
            "lang",
            *[hits[lang].alias(f"hits_{lang}") for lang in _STOPLISTS],
            pred.alias("predicted_lang"),
        )
        .orderBy("doc_id")
    )


# The whole lang-id oracle (ORDER BY included — DuckDB allows ordered
# subqueries) wrapped as a CTE: the confusion matrix can never fork from
# the registered per-doc predictions.
_LANG_CONFUSION_ORACLE = f"""
WITH pred AS ({_LANG_ORACLE})
SELECT lang, predicted_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM pred
GROUP BY lang, predicted_lang
ORDER BY lang, predicted_lang
"""


@register(
    "text_lang_confusion",
    oracle=_LANG_CONFUSION_ORACLE,
    tags=("text", "quality"),
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix — the audit that decides whether
    the cheap stopword classifier is good enough to gate a corpus: for
    every (labeled lang, predicted lang) cell, the document count and
    an id checksum pinning WHICH docs landed there. Off-diagonal mass
    localizes the classifier's failure modes (e.g. romance-language
    stopword overlap) before anyone trusts per-lang mixture planning
    built on predictions. Composes the registered text_lang_id verbatim
    (its DataFrame is the input; its oracle is the CTE), so prediction
    semantics cannot fork between the per-doc row and this rollup.

    Scale: text_lang_id's one-scan map-side shape + a ≤|langs|² -row
    aggregate — runs at scan speed."""
    p = text_lang_id(spark, sf_dir).select("doc_id", "lang", "predicted_lang")
    return (
        p.groupBy("lang", "predicted_lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("lang", "predicted_lang")
    )


_QUALITY_ORACLE = """
WITH f AS (
  SELECT doc_id, n_chars,
         len(regexp_extract_all(text, '[^a-z ]')) AS n_nonalpha,
         len(regexp_split_to_array(text, ' ')) AS n_words,
         len(list_filter(regexp_split_to_array(text, ' '),
             x -> list_contains(['the','a','of','and','is','to'], x))) AS n_stop
  FROM documents
)
SELECT doc_id,
       round(n_nonalpha / CAST(n_chars AS DOUBLE), 6) AS nonalpha_ratio,
       round(n_stop / CAST(n_words AS DOUBLE), 6) AS stopword_ratio,
       (n_chars BETWEEN 100 AND 2000) AND n_words >= 20 AS passes_length_gate,
       round(LEAST(1.0, n_words / 100.0) *
             (1.0 - n_nonalpha / CAST(n_chars AS DOUBLE)), 6) AS quality_score
FROM f
ORDER BY doc_id
"""


@register("text_quality_score", oracle=_QUALITY_ORACLE, tags=("text",))
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gates: punctuation/non-alpha ratio, stopword ratio, length
    gate, and a composite score — the classic pretraining filter set."""
    d = _t(spark, sf_dir)
    words = F.split("text", " ")
    n_nonalpha = F.regexp_count(F.col("text"), F.lit(r"[^a-z ]"))
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*_STOPLISTS["en"])))
    return (
        d.select(
            "doc_id",
            F.round(n_nonalpha / F.col("n_chars").cast("double"), 6).alias(
                "nonalpha_ratio"
            ),
            F.round(n_stop / n_words.cast("double"), 6).alias("stopword_ratio"),
            (
                F.col("n_chars").between(100, 2000) & (n_words >= 20)
            ).alias("passes_length_gate"),
            F.round(
                F.least(F.lit(1.0), n_words / F.lit(100.0))
                * (F.lit(1.0) - n_nonalpha / F.col("n_chars").cast("double")),
                6,
            ).alias("quality_score"),
        )
        .orderBy("doc_id")
    )


_TOKENS_ORACLE = """
SELECT doc_id,
       CAST(len(regexp_split_to_array(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
         AS bpe_ish_tokens,
       round(n_chars / CAST(len(regexp_extract_all(
             text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE), 6)
         AS chars_per_token
FROM documents
ORDER BY doc_id
"""


@register("text_token_count", oracle=_TOKENS_ORACLE, tags=("text",))
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer
    (alpha runs / digit runs / single symbols)."""
    d = _t(spark, sf_dir)
    pat = r"[a-z]+|[0-9]+|[^a-z0-9 ]"
    bpe = F.regexp_count(F.col("text"), F.lit(pat))
    return (
        d.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
            bpe.cast("bigint").alias("bpe_ish_tokens"),
            F.round(F.col("n_chars") / bpe.cast("double"), 6).alias(
                "chars_per_token"
            ),
        )
        .orderBy("doc_id")
    )


# Rolling (positional polynomial) hash: Σ pos·h(word) mod P, with
# h = md5-prefix → bigint — order-sensitive (permuted docs differ),
# engine-portable (md5 everywhere), overflow-safe (h < 1e9+7, pos ≤ 1e4).
_P = 1_000_000_007

_FPRINT_ORACLE = f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS words FROM documents
), e AS (
  SELECT doc_id, i AS pos,
         CAST(('0x' || substr(md5(words[i]), 1, 15)) AS BIGINT) % {_P} AS h
  FROM w, UNNEST(range(1, len(words) + 1)) AS t(i)
)
SELECT doc_id, CAST(SUM(pos * h) % {_P} AS BIGINT) AS fingerprint
FROM e GROUP BY doc_id
ORDER BY doc_id
"""


@register("text_fingerprint", oracle=_FPRINT_ORACLE, tags=("text",))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint (positional rolling hash).

    r17 measured, deliberately NOT fanned out: the per-word md5 chain is
    light enough that a pre-explode fan-out regresses it (interleaved
    A/B at sf0.1: 0.505 s single-task vs 0.614 s fanned — the shuffled
    text + exchange overhead exceed the saved map time)."""
    d = _t(spark, sf_dir)
    e = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        (
            F.conv(F.substring(F.md5(F.col("word").cast("binary")), 1, 15), 16, 10)
            .cast("bigint")
            % _P
        ).alias("h"),
    )
    return (
        e.groupBy("doc_id")
        .agg((F.sum(F.col("pos") * F.col("h")) % _P).alias("fingerprint"))
        .orderBy("doc_id")
    )


# The composed curation pipeline: what the individual operators exist
# FOR. quality-gate → exact-dedup (keep min doc_id per content hash) →
# near-dup removal (drop the higher doc_id of each verified pair) →
# per-language stats. Entirely relational → the oracle replays the
# identical steps, so the full pipeline is hash-checked end to end.
_PIPELINE_ORACLE = """
WITH gated AS (
  SELECT doc_id, lang, text, n_chars FROM documents
  WHERE n_chars BETWEEN 100 AND 2000
    AND len(regexp_split_to_array(text, ' ')) >= 20
), exact_kept AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
    FROM gated
  ) WHERE doc_id = keeper
), w AS (
  SELECT doc_id, lang, regexp_split_to_array(text, ' ') AS words FROM exact_kept
), s AS (
  SELECT doc_id, lang,
         CASE WHEN len(words) >= 3 THEN
           list_distinct(list_transform(range(1, len(words) - 1),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM w
), e AS (
  SELECT doc_id, lang, len(shingles) AS n, unnest(shingles) AS shingle FROM s
), neardup_losers AS (
  SELECT DISTINCT b.doc_id
  FROM e a JOIN e b
    ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.n, b.n
  HAVING COUNT(*) * 1.0 / (a.n + b.n - COUNT(*)) >= 0.5
), curated AS (
  SELECT * FROM exact_kept
  WHERE doc_id NOT IN (SELECT doc_id FROM neardup_losers)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(regexp_split_to_array(text, ' '))) AS BIGINT) AS total_words
FROM curated
GROUP BY lang
ORDER BY lang
"""


@register("pipeline_curation", oracle=_PIPELINE_ORACLE, tags=("pipeline", "dedup"))
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline: quality gate → exact dedup →
    near-dup removal (exact Jaccard ≥ 0.5 pairs, higher doc_id dropped)
    → per-language corpus stats. The composition the individual
    operators exist for, hash-checked as one dataflow.

    Scale shape: gate is a narrow map; exact dedup shuffles 32-byte
    digests; near-dup here uses the exact pair path (at 100 TB swap in
    dedup_minhash_lsh's candidates — same join surface); final agg is
    5 groups.
    """
    from pyspark.sql import Window as W

    from kinesumer_spark.operators.dedup import _verified_pairs, _shingles

    d = _t(spark, sf_dir)
    words = F.split("text", " ")
    gated = d.filter(
        F.col("n_chars").between(100, 2000) & (F.size(words) >= 20)
    )
    h = F.sha2(F.col("text").cast("binary"), 256)
    exact_kept = (
        gated.withColumn("keeper", F.min("doc_id").over(W.partitionBy(h)))
        .filter(F.col("doc_id") == F.col("keeper"))
        .drop("keeper")
    )
    losers = (
        _verified_pairs(_shingles(exact_kept), 0.5)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    curated = exact_kept.join(losers, "doc_id", "left_anti")
    return (
        curated.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_words"),
        )
        .orderBy("lang")
    )


# -- BM25 relevance scoring -------------------------------------------------

_BM25_TERMS = ("dup", "vector", "spark", "scan")
_BM25_TOP = 50
# k1 = 6/5, b = 3/4 held as exact rationals; see the derivation in the
# docstring for how they fold into the cleared-denominator integers.


def _tf_col(words: Column, term: str) -> Column:
    # ONE-arg lambda only: a 2-arg HOF lambda makes Spark pass the array
    # INDEX as the second argument (clobbering any default-arg closure).
    return F.size(F.filter(words, lambda x: x == F.lit(term))).cast("bigint")


def _bm25_cte() -> str:
    """Shared DuckDB CTE chain ``tf → stats → bm25_scored`` mirroring
    :func:`bm25_scores`; consumed by the text_bm25 oracle and the
    hybrid-retrieval fusion oracle (similarity_hybrid_rrf)."""
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(words, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _BM25_TERMS
    )
    s_terms = " + ".join(
        f"(CAST((2*n_docs - 2*df_{t} + 1) * 22 * tf_{t} * s_len AS DOUBLE)"
        f" / CAST((2*df_{t} + 1) * (10*s_len*tf_{t} + 3*s_len + 9*dl*n_docs)"
        f" AS DOUBLE))"
        for t in _BM25_TERMS
    )
    return f"""tf AS (
  SELECT doc_id, lang,
         CAST(len(words) AS BIGINT) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, lang, regexp_split_to_array(text, ' ') AS words
        FROM documents) w
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, sum(dl) AS s_len, {df_cols}
  FROM tf
), bm25_scored AS (
  SELECT doc_id, lang, dl,
         {", ".join(f"tf_{t}" for t in _BM25_TERMS)},
         {s_terms} AS score
  FROM tf CROSS JOIN stats
  WHERE {" + ".join(f"tf_{t}" for t in _BM25_TERMS)} > 0
)"""


def _bm25_oracle() -> str:
    return f"""
WITH {_bm25_cte()}
SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
FROM bm25_scored QUALIFY rnk <= {_BM25_TOP} ORDER BY rnk
"""


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every matching document against a fixed query
    ({dup, vector, spark, scan}) — the relevance/quality-ranking
    primitive of a curation pipeline, oracle-checked bit-for-bit
    through its registered consumers (text_bm25's top-50 and
    similarity_hybrid_rrf's fusion).

    Exact-rational formulation (why this is oracle-checkable when
    textbook BM25 is not): ln() differs between glibc and the JVM by
    ulps, so the standard log-idf is replaced by its argument, the raw
    Robertson odds ratio idf = (N - df + ½)/(df + ½) — monotone in the
    same direction, so ranking semantics are preserved. With k1 = 6/5
    and b = 3/4, each per-term score

        idf · tf(k1+1) / (tf + k1(1 − b + b·dl/avgdl)),  avgdl = S/N

    clears to the integer ratio

        num = (2N − 2df + 1) · 22 · tf · S
        den = (2df + 1) · (10·S·tf + 3·S + 9·dl·N)

    computed in int64 (exact while num < 2^53 — holds to ~1e8 docs x
    300-word corpora; beyond that, promote to decimal(38,0), same
    plan). The only floats are one correctly-rounded int64→double
    division per term and a fixed left-associated 4-term sum — both
    engines execute the identical IEEE expression, hence bit-equal
    scores and a deterministic (score DESC, doc_id) top-50.

    Scale: one corpus scan computes (dl, tf_t); a single-row global
    aggregate (N, S, df_t) broadcasts back; scoring is map-side
    arithmetic; top-50 is TakeOrderedAndProject (per-partition heads,
    driver merge — no global sort shuffle). The df-aggregate is the
    inverted-index build folded to the 4 query terms; a full index is
    the same groupBy(term) shape. Reference: kinesumer delegates all
    analytics to its application (kinesumer.go:346-370); this is
    SURVEY.md 'text analysis: quality scoring' surface."""
    words = F.split("text", " ")
    tf = _t(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.size(words).cast("bigint").alias("dl"),
        *[_tf_col(words, t).alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    stats = tf.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").alias("s_len"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )

    def _s(t: str) -> Column:
        num = (
            (2 * F.col("n_docs") - 2 * F.col(f"df_{t}") + 1)
            * 22
            * F.col(f"tf_{t}")
            * F.col("s_len")
        )
        den = (2 * F.col(f"df_{t}") + 1) * (
            10 * F.col("s_len") * F.col(f"tf_{t}")
            + 3 * F.col("s_len")
            + 9 * F.col("dl") * F.col("n_docs")
        )
        return num.cast("double") / den.cast("double")

    score = _s(_BM25_TERMS[0])
    for t in _BM25_TERMS[1:]:
        score = score + _s(t)  # fixed left-associated order, both engines

    any_tf = F.col(f"tf_{_BM25_TERMS[0]}")
    for t in _BM25_TERMS[1:]:
        any_tf = any_tf + F.col(f"tf_{t}")

    return (
        tf.crossJoin(F.broadcast(stats))
        .filter(any_tf > 0)
        .select(
            "doc_id",
            "lang",
            "dl",
            *[f"tf_{t}" for t in _BM25_TERMS],
            score.alias("score"),
        )
    )


@register("text_bm25", oracle=_bm25_oracle(), tags=("text",))
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of ``bm25_scores`` (see its docstring): the
    distributed top-50 (TakeOrderedAndProject — per-partition heads, no
    global sort shuffle) of the exact-rational BM25 scores, ranked."""
    scored = bm25_scores(spark, sf_dir).orderBy(
        F.col("score").desc(), F.col("doc_id")
    ).limit(_BM25_TOP)
    w = W.orderBy(F.col("score").desc(), F.col("doc_id"))
    return scored.withColumn("rnk", F.row_number().over(w).cast("bigint")).orderBy(
        "rnk"
    )


# --------------------------------------------------------------------------
# Within-document repetition (Gopher-style quality signals)
# --------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS words FROM documents
), g AS (
  SELECT doc_id, words, len(words) AS n,
         CASE WHEN len(words) >= 2 THEN
           list_transform(range(1, len(words)),
             i -> words[i] || ' ' || words[i+1])
         ELSE [] END AS g2,
         CASE WHEN len(words) >= 3 THEN
           list_transform(range(1, len(words) - 1),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
         ELSE [] END AS g3
  FROM w
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       round(CASE WHEN n > 0 THEN
         (n - len(list_distinct(words))) / CAST(n AS DOUBLE) END, 6)
         AS dup_word_frac,
       round(CASE WHEN len(g2) > 0 THEN
         (len(g2) - len(list_distinct(g2))) / CAST(len(g2) AS DOUBLE) END, 6)
         AS dup_2gram_frac,
       round(CASE WHEN len(g3) > 0 THEN
         (len(g3) - len(list_distinct(g3))) / CAST(len(g3) AS DOUBLE) END, 6)
         AS dup_3gram_frac,
       round(CASE WHEN n > 0 THEN
         list_max(list_transform(list_distinct(words),
           t -> len(list_filter(words, x -> x = t)))) / CAST(n AS DOUBLE)
         END, 6) AS top_word_frac,
       (CASE WHEN len(g3) > 0 THEN
          (len(g3) - len(list_distinct(g3))) / CAST(len(g3) AS DOUBLE)
        ELSE 0 END) > 0.5 AS repetitive
FROM g
ORDER BY doc_id
"""


@register("text_repetition", oracle=_REPETITION_ORACLE, tags=("text", "quality"))
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText quality
    filters): duplicate word / 2-gram / 3-gram fractions and the top
    single word's mass, plus a `repetitive` drop flag.

    Scale: ZERO shuffle — every metric is a per-row columnar expression
    over the words array (n-grams via transform over sequence, distinct
    via array_distinct, the top-word count via a nested filter lambda,
    O(u·n) per row with n ≤ doc length). At 100 TB this runs at parquet
    scan speed; the ORDER BY exists only for golden-test determinism.
    Reference analog: per-record filter predicates (kinesumer delegates
    record-level quality gates to the app; SURVEY.md §2.2 text row).
    """
    d = _t(spark, sf_dir)
    # split once, in a PRIOR select: the HOF lambdas run interpreted and
    # re-evaluate any inline split(text) per element — O(words²) per doc
    # (SCALE.md r11/r12 lesson)
    g = d.selectExpr("doc_id", "split(text, ' ') AS words").selectExpr(
        "doc_id",
        "words",
        "size(words) AS n",
        # Spark arrays are 0-indexed; sequence(0, n-2) yields n-1 bigrams
        "CASE WHEN size(words) >= 2 THEN"
        "  transform(sequence(0, size(words) - 2),"
        "    i -> concat(words[i], ' ', words[i+1]))"
        " ELSE array() END AS g2",
        "CASE WHEN size(words) >= 3 THEN"
        "  transform(sequence(0, size(words) - 3),"
        "    i -> concat(words[i], ' ', words[i+1], ' ', words[i+2]))"
        " ELSE array() END AS g3",
    )
    return g.selectExpr(
        "doc_id",
        "cast(n AS bigint) AS n_words",
        "round(CASE WHEN n > 0 THEN"
        "  (n - size(array_distinct(words))) / cast(n AS double) END, 6)"
        "  AS dup_word_frac",
        "round(CASE WHEN size(g2) > 0 THEN"
        "  (size(g2) - size(array_distinct(g2))) / cast(size(g2) AS double)"
        "  END, 6) AS dup_2gram_frac",
        "round(CASE WHEN size(g3) > 0 THEN"
        "  (size(g3) - size(array_distinct(g3))) / cast(size(g3) AS double)"
        "  END, 6) AS dup_3gram_frac",
        "round(CASE WHEN n > 0 THEN"
        "  array_max(transform(array_distinct(words),"
        "    t -> size(filter(words, x -> x = t)))) / cast(n AS double)"
        "  END, 6) AS top_word_frac",
        "(CASE WHEN size(g3) > 0 THEN"
        "  (size(g3) - size(array_distinct(g3))) / cast(size(g3) AS double)"
        " ELSE 0 END) > 0.5 AS repetitive",
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Decontamination: eval-set n-gram overlap
# --------------------------------------------------------------------------

_EVAL_MOD = 97  # doc_id % 97 == 0 → the held-out "eval set" (deterministic)

_DECONTAM_ORACLE = f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS words FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(words) >= 3 THEN
           list_distinct(list_transform(range(1, len(words) - 1),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM w
), banned AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM s
  WHERE doc_id % {_EVAL_MOD} = 0
), corpus AS (
  SELECT doc_id, len(shingles) AS n_shingles, unnest(shingles) AS shingle
  FROM s WHERE doc_id % {_EVAL_MOD} <> 0
), hits AS (
  SELECT c.doc_id, COUNT(*) AS n_banned
  FROM corpus c JOIN banned b ON c.shingle = b.shingle
  GROUP BY c.doc_id
)
SELECT s.doc_id,
       CAST(len(s.shingles) AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n_banned, 0) AS BIGINT) AS n_banned,
       round(COALESCE(h.n_banned, 0) / CAST(len(s.shingles) AS DOUBLE), 6)
         AS contamination,
       COALESCE(h.n_banned, 0) >= 1 AS contaminated
FROM s LEFT JOIN hits h ON s.doc_id = h.doc_id
WHERE s.doc_id % {_EVAL_MOD} <> 0
ORDER BY s.doc_id
"""


@register("text_decontaminate", oracle=_DECONTAM_ORACLE, tags=("text", "dedup"))
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag training documents sharing any
    3-gram with the held-out eval set (docs with doc_id % 97 == 0 stand
    in for the benchmark suite). Emits per-doc overlap counts, the
    contamination ratio, and the drop flag.

    Scale: the eval side of the join is tiny relative to the corpus
    (benchmarks are KBs–MBs vs 100 TB of training data), so the banned
    shingle set is BROADCAST — the corpus is never shuffled on shingle;
    the only wide exchange is the per-doc hit count groupBy(doc_id),
    whose input is just the matched (doc_id) rows. Plan-audited in
    tests/test_plans.py (BroadcastHashJoin on the shingle probe).
    Reference analog: record filtering against an external keyset
    (kinesumer delegates to the app; SURVEY.md §2.2 text row).
    """
    d = _t(spark, sf_dir)
    # Shingle via the codegen'd regexp lookahead (dedup._shingles_raw's
    # formulation), not a transform lambda: Spark HOF lambdas run
    # INTERPRETED (SCALE.md r11) — the lambda form measured 3.9 s vs
    # 0.6 s for the regexp at sf0.1, and this op pays shingling twice
    # (banned + probe branches). Match order = word-start order, so the
    # array is element-wise identical to the 3-word-window transform
    # (multiset equality pinned in tests for the shared raw form).
    arr = r"regexp_extract_all(text, '(?:^| )(?=(\\S+ \\S+ \\S+))', 1)"
    s = d.selectExpr("doc_id", "text", f"{arr} AS sh_arr").selectExpr(
        "doc_id",
        "array_distinct(CASE WHEN size(sh_arr) >= 1 THEN sh_arr"
        "  ELSE array(text) END) AS shingles",
    )
    banned = (
        s.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .selectExpr("explode(shingles) AS shingle")
        .distinct()
    )
    corpus = s.filter(F.col("doc_id") % _EVAL_MOD != 0)
    exploded = corpus.selectExpr("doc_id", "explode(shingles) AS shingle")
    hits = (
        exploded.join(F.broadcast(banned), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_banned"))
    )
    return (
        corpus.selectExpr("doc_id", "cast(size(shingles) AS bigint) AS n_shingles")
        .join(hits, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "n_shingles",
            "cast(coalesce(n_banned, 0) AS bigint) AS n_banned",
            "round(coalesce(n_banned, 0) / cast(n_shingles AS double), 6)"
            "  AS contamination",
            "coalesce(n_banned, 0) >= 1 AS contaminated",
        )
        .orderBy("doc_id")
    )


# Fuzzy decontamination uses a WIDER eval slice than the exact screen's
# mod-97: near-dup pairs are rarer than shared 3-grams, and mod 97
# yields ZERO cross eval/corpus near-dup pairs at the driver's sf0.01 —
# a hash-green-but-vacuous oracle (the r10 trap). mod 7 gives hits at
# every gate SF while keeping the slice deterministic and content-free.
_FUZZY_EVAL_MOD = 7
_FUZZY_J = 0.5  # the LSH tier's verified-Jaccard threshold


def _fuzzy_decontam_oracle() -> str:
    from kinesumer_spark.operators.dedup import _minhash_cte

    return f"""
WITH {_minhash_cte()}, pj AS (
  SELECT p.doc_a, p.doc_b,
         round(shared / CAST(na + nb - shared AS DOUBLE), 6) AS jaccard
  FROM p JOIN cand c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
  WHERE round(shared / CAST(na + nb - shared AS DOUBLE), 6) >= {_FUZZY_J}
), x AS (
  SELECT CASE WHEN doc_a % {_FUZZY_EVAL_MOD} = 0 THEN doc_b ELSE doc_a END
           AS doc_id,
         CASE WHEN doc_a % {_FUZZY_EVAL_MOD} = 0 THEN doc_a ELSE doc_b END
           AS eval_id,
         jaccard
  FROM pj
  WHERE (doc_a % {_FUZZY_EVAL_MOD} = 0) <> (doc_b % {_FUZZY_EVAL_MOD} = 0)
), hits AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_eval_matches,
         MAX(jaccard) AS max_jaccard,
         CAST(SUM(eval_id) AS BIGINT) AS eval_id_checksum
  FROM x GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_eval_matches, 0) AS BIGINT) AS n_eval_matches,
       COALESCE(h.max_jaccard, 0.0) AS max_jaccard,
       CAST(COALESCE(h.eval_id_checksum, 0) AS BIGINT) AS eval_id_checksum,
       COALESCE(h.n_eval_matches, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % {_FUZZY_EVAL_MOD} <> 0
ORDER BY d.doc_id
"""


@register(
    "text_decontaminate_fuzzy",
    oracle=_fuzzy_decontam_oracle(),
    tags=("text", "dedup", "approx"),
)
def text_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUPLICATE eval-set decontamination — the fuzzy complement
    of text_decontaminate's exact 3-gram screen: a training document is
    contaminated if it is a verified near-duplicate (3-gram Jaccard ≥
    0.5 = ``_FUZZY_J``) of ANY held-out eval document (doc_id % 7 == 0
    stands in for the benchmark suite; see ``_FUZZY_EVAL_MOD`` for why
    this slice is wider than the exact screen's). Paraphrased or
    lightly-edited
    benchmark leakage shares few exact 13-gram-style spans but survives
    as a near-dup — real decontamination pipelines run BOTH screens.

    Implementation is the registered MinHash/LSH tier verbatim
    (minhash_pairs_df — shingles → 64-min signatures → 16×4 band
    buckets → exact-Jaccard verify), then pairs that straddle the
    eval/corpus split become per-corpus-doc verdicts: match count, max
    Jaccard, an eval-id checksum pinning WHICH eval docs matched, and
    the drop flag (clean docs emit with zeros — the screen's keep
    decision is part of the contract).

    Scale: everything down to the verify is dedup_minhash_lsh's
    documented shape (signatures-only shuffles, banded buckets, never
    all-pairs); the verdict join is corpus ⟕ (tiny hit table). In a
    real deployment the eval side is a fixed benchmark set, so its
    signatures broadcast and only corpus-side bands shuffle — the
    symmetric form here additionally dedups corpus-corpus pairs for
    free but is discarded by the straddle filter."""
    from kinesumer_spark.operators.dedup import minhash_pairs_df

    d = _t(spark, sf_dir)
    pairs = minhash_pairs_df(
        d.select("doc_id", "lang", "text"), min_jaccard=_FUZZY_J
    )
    a_eval = F.col("doc_a") % _FUZZY_EVAL_MOD == 0
    b_eval = F.col("doc_b") % _FUZZY_EVAL_MOD == 0
    cross = pairs.filter(a_eval != b_eval).select(
        F.when(a_eval, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
            "doc_id"
        ),
        F.when(a_eval, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
            "eval_id"
        ),
        "jaccard",
    )
    hits = cross.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_matches"),
        F.max("jaccard").alias("max_jaccard"),
        F.sum("eval_id").cast("bigint").alias("eval_id_checksum"),
    )
    return (
        d.filter(F.col("doc_id") % _FUZZY_EVAL_MOD != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "cast(coalesce(n_eval_matches, 0) AS bigint) AS n_eval_matches",
            "coalesce(max_jaccard, 0.0) AS max_jaccard",
            "cast(coalesce(eval_id_checksum, 0) AS bigint)"
            "  AS eval_id_checksum",
            "coalesce(n_eval_matches, 0) >= 1 AS contaminated",
        )
        .orderBy("doc_id")
    )


@register(
    "text_decontaminate_broadcast",
    oracle=_fuzzy_decontam_oracle(),
    tags=("text", "dedup", "approx"),
)
def text_decontaminate_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC (broadcast-eval) fuzzy decontamination — the
    production shape of ``text_decontaminate_fuzzy``, same verdict
    semantics (3-gram MinHash/LSH candidates, exact-Jaccard ≥ 0.5
    verify, per-corpus-doc match count / max Jaccard / eval-id
    checksum / drop flag), different physical plan. In a real pipeline
    the eval side is a FIXED benchmark suite (KBs–MBs) screened against
    100 TB of corpus, so the eval side's band keys and shingle sets are
    BROADCAST and only the corpus side ever shuffles:

    - candidates: corpus band keys ⋈ broadcast(eval band keys) on
      (lang, band, key1, key2) — a BroadcastHashJoin, NOT the symmetric
      form's bucket self-expansion; no corpus-corpus pair is ever
      materialized (the symmetric form generates and then discards
      them via the straddle filter).
    - verify: candidate (doc_id, eval_id) ⋈ corpus shingle sets
      (corpus-keyed shuffle) ⋈ broadcast(eval shingle sets), exact
      Jaccard via array_intersect.

    Corpus-side cost: one signature groupBy + one sets groupBy + the
    per-doc verdict aggregate — every wide exchange is keyed by
    corpus doc_id; the eval side never forces a shuffle. Plan-pinned in
    tests/test_plans.py (both eval joins broadcast; no symmetric
    self-join on band keys). The banding/verify tier is shared code
    (minhash_band_keys / shingle_sets, extracted from the registered
    symmetric tier) so the two forms cannot drift; both share one
    oracle because the asymmetric candidate condition — same (lang,
    band, key1, key2) bucket — is exactly the symmetric condition
    restricted to straddle pairs. Reference analog: record screening
    against an external keyset (kinesumer delegates to the app;
    SURVEY.md §2.2 text row)."""
    from kinesumer_spark.operators.dedup import minhash_band_keys, shingle_sets

    d = _t(spark, sf_dir)
    is_eval = F.col("doc_id") % _FUZZY_EVAL_MOD == 0
    eval_docs = d.filter(is_eval).select("doc_id", "lang", "text")
    corpus = d.filter(~is_eval).select("doc_id", "lang", "text")

    eval_bands = minhash_band_keys(eval_docs).withColumnRenamed(
        "doc_id", "eval_id"
    )
    cand = (
        minhash_band_keys(corpus)
        .join(F.broadcast(eval_bands), ["lang", "band", "key1", "key2"])
        .select("doc_id", "eval_id")
        .distinct()
    )
    corpus_sets = shingle_sets(corpus).selectExpr(
        "doc_id", "sh AS sh_c", "n AS nc"
    )
    eval_sets = shingle_sets(eval_docs).selectExpr(
        "doc_id AS eval_id", "sh AS sh_e", "n AS ne"
    )
    verified = (
        cand.join(corpus_sets, "doc_id")
        .join(F.broadcast(eval_sets), "eval_id")
        .withColumn(
            "shared",
            F.expr("cast(size(array_intersect(sh_c, sh_e)) AS bigint)"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("nc") + F.col("ne") - F.col("shared")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= _FUZZY_J)
    )
    hits = verified.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_matches"),
        F.max("jaccard").alias("max_jaccard"),
        F.sum("eval_id").cast("bigint").alias("eval_id_checksum"),
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "cast(coalesce(n_eval_matches, 0) AS bigint) AS n_eval_matches",
            "coalesce(max_jaccard, 0.0) AS max_jaccard",
            "cast(coalesce(eval_id_checksum, 0) AS bigint)"
            "  AS eval_id_checksum",
            "coalesce(n_eval_matches, 0) >= 1 AS contaminated",
        )
        .orderBy("doc_id")
    )


_SPANS_ORACLE = f"""
WITH s AS (
  SELECT doc_id,
         CASE WHEN len(regexp_split_to_array(text, ' ')) >= 3 THEN
           list_transform(range(1, len(regexp_split_to_array(text, ' ')) - 1),
             i -> regexp_split_to_array(text, ' ')[i] || ' ' ||
                  regexp_split_to_array(text, ' ')[i+1] || ' ' ||
                  regexp_split_to_array(text, ' ')[i+2])
         ELSE [text] END AS shingles
  FROM documents
), banned AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM s
  WHERE doc_id % {_EVAL_MOD} = 0
), pos AS (
  SELECT doc_id, unnest(shingles) AS shingle,
         generate_subscripts(shingles, 1) AS pos
  FROM s WHERE doc_id % {_EVAL_MOD} <> 0
), hits AS (
  SELECT p.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hits,
         CAST(MIN(p.pos) AS BIGINT) AS first_pos,
         CAST(MAX(p.pos) AS BIGINT) AS last_pos
  FROM pos p JOIN banned b USING (shingle)
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.first_pos, -1) AS BIGINT) AS first_pos,
       CAST(COALESCE(h.last_pos, -1) AS BIGINT) AS last_pos,
       COALESCE(h.n_hits, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % {_EVAL_MOD} <> 0
ORDER BY d.doc_id
"""


@register(
    "text_decontaminate_spans",
    oracle=_SPANS_ORACLE,
    tags=("text", "dedup"),
)
def text_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE the contamination sits: for every training document, the
    1-based word positions of 3-gram occurrences shared with the
    held-out eval slice (doc_id % 97 == 0) — occurrence count, first
    and last hit position (−1 when clean), and the drop flag. The
    registered exact screen (text_decontaminate) answers WHETHER to
    drop; this row carries the span data a surgical pipeline needs to
    EXCISE the leaked passage and keep the rest of the document —
    standard practice when the contaminated span is a quoted benchmark
    question inside an otherwise-clean page.

    Positions index the shingle's first word (1-based, duplicates
    counted per occurrence — excision needs every site, not the
    distinct set); a <3-word doc is one whole-text shingle at position
    1. Scale: same shape as the exact screen — banned set broadcast
    (benchmarks are tiny), corpus never shuffled on shingle, the only
    wide exchange is the per-doc groupBy(doc_id) over matched rows."""
    d = _t(spark, sf_dir)
    # Shingles via the codegen'd regexp lookahead, not a transform
    # lambda (HOF lambdas run interpreted — see text_decontaminate and
    # SCALE.md r11/r12). Match order IS word-start order, so
    # posexplode's index is the shingle's first-word position — the
    # position semantics survive the formulation change.
    arr = r"regexp_extract_all(text, '(?:^| )(?=(\\S+ \\S+ \\S+))', 1)"
    shingled = d.selectExpr("doc_id", "text", f"{arr} AS sh_arr").selectExpr(
        "doc_id",
        "CASE WHEN size(sh_arr) >= 1 THEN sh_arr"
        "  ELSE array(text) END AS shingles",
    )
    banned = (
        shingled.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .selectExpr("explode(shingles) AS shingle")
        .distinct()
    )
    pos = shingled.filter(F.col("doc_id") % _EVAL_MOD != 0).select(
        "doc_id", F.posexplode("shingles").alias("pos0", "shingle")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "shingle")
    hits = (
        pos.join(F.broadcast(banned), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
            F.min("pos").cast("bigint").alias("first_pos"),
            F.max("pos").cast("bigint").alias("last_pos"),
        )
    )
    return (
        d.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "cast(coalesce(n_hits, 0) AS bigint) AS n_hits",
            "cast(coalesce(first_pos, -1) AS bigint) AS first_pos",
            "cast(coalesce(last_pos, -1) AS bigint) AS last_pos",
            "coalesce(n_hits, 0) >= 1 AS contaminated",
        )
        .orderBy("doc_id")
    )


_EXCISE_ORACLE = f"""
WITH s AS (
  SELECT doc_id, text,
         regexp_split_to_array(text, ' ') AS words,
         CASE WHEN len(regexp_split_to_array(text, ' ')) >= 3 THEN
           list_transform(range(1, len(regexp_split_to_array(text, ' ')) - 1),
             i -> regexp_split_to_array(text, ' ')[i] || ' ' ||
                  regexp_split_to_array(text, ' ')[i+1] || ' ' ||
                  regexp_split_to_array(text, ' ')[i+2])
         ELSE [text] END AS shingles
  FROM documents
), banned AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM s
  WHERE doc_id % {_EVAL_MOD} = 0
), pos AS (
  SELECT doc_id, unnest(shingles) AS shingle,
         generate_subscripts(shingles, 1) AS pos
  FROM s WHERE doc_id % {_EVAL_MOD} <> 0
), cov AS (
  SELECT DISTINCT p.doc_id, unnest([p.pos - 1, p.pos, p.pos + 1]) AS idx
  FROM pos p JOIN banned b USING (shingle)
), w AS (
  SELECT doc_id, generate_subscripts(words, 1) - 1 AS idx,
         unnest(words) AS word
  FROM s WHERE doc_id % {_EVAL_MOD} <> 0
), kept AS (
  SELECT w.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(w.word, ' ' ORDER BY w.idx) AS cleaned
  FROM w ANTI JOIN cov ON cov.doc_id = w.doc_id AND cov.idx = w.idx
  GROUP BY w.doc_id
)
SELECT s.doc_id,
       CAST(len(s.words) AS BIGINT) AS n_words,
       CAST(len(s.words) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
       md5(COALESCE(k.cleaned, '')) AS cleaned_md5
FROM s LEFT JOIN kept k ON k.doc_id = s.doc_id
WHERE s.doc_id % {_EVAL_MOD} <> 0
ORDER BY s.doc_id
"""


@register(
    "text_decontaminate_excise",
    oracle=_EXCISE_ORACLE,
    tags=("text", "dedup"),
)
def text_decontaminate_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical decontamination — the EXCISION text_decontaminate_spans
    exists for: every word covered by a 3-gram occurrence shared with
    the eval slice (positions p−1..p+1 in 0-based word indices for a
    1-based hit at p) is cut, the survivors re-joined in order, and the
    cleaned text proven byte-identical across engines via its md5
    (not just counted — a re-join that drops a separator or reorders
    words flips the hash). Emits per-doc total words, removed words,
    and the cleaned-text digest; a fully-excised doc hashes the empty
    string (the drop case). This is the keep-the-page-cut-the-quote
    pipeline production decontamination actually runs — dropping whole
    documents for one leaked benchmark question wastes good tokens.

    Scale: banned set broadcast; covered-index set is |hits|·3 rows,
    anti-joined against the exploded word table keyed by (doc_id, idx);
    the re-join is one per-doc aggregate (collect_list of (idx, word)
    structs, array_sort — per-doc memory is the document itself, the
    same bound every per-doc aggregate here carries). Word explodes are
    codegen'd posexplode over one split — no HOF lambdas in the hot
    path (the r12 shingle lesson: shingles via regexp lookahead)."""
    d = _t(spark, sf_dir)
    arr = r"regexp_extract_all(text, '(?:^| )(?=(\\S+ \\S+ \\S+))', 1)"
    base = d.selectExpr(
        "doc_id", "text", "split(text, ' ') AS words", f"{arr} AS sh_arr"
    ).selectExpr(
        "doc_id",
        "words",
        "CASE WHEN size(sh_arr) >= 1 THEN sh_arr"
        "  ELSE array(text) END AS shingles",
    )
    banned = (
        base.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .selectExpr("explode(shingles) AS shingle")
        .distinct()
    )
    corpus = base.filter(F.col("doc_id") % _EVAL_MOD != 0).localCheckpoint(
        eager=False
    )
    hits = (
        corpus.select("doc_id", F.posexplode("shingles").alias("pos0", "shingle"))
        .join(F.broadcast(banned), "shingle")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"))
    )
    cov = hits.selectExpr(
        "doc_id", "explode(array(pos - 1, pos, pos + 1)) AS idx"
    ).distinct()
    words = corpus.select(
        "doc_id", F.posexplode("words").alias("idx", "word")
    )
    kept = (
        words.join(cov, ["doc_id", "idx"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(idx, word))), s -> s.word), ' ') AS cleaned"
            ),
        )
    )
    return (
        corpus.selectExpr("doc_id", "cast(size(words) AS bigint) AS n_words")
        .join(kept, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "n_words",
            "cast(n_words - coalesce(n_kept, 0) AS bigint) AS n_removed",
            "md5(cast(coalesce(cleaned, '') AS binary)) AS cleaned_md5",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# PII scrubbing (regex redaction)
# --------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, \b.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+1-555-[0-9]{4}"
_PII_IP = r"\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _pii_oracle() -> str:
    raw = (
        "text || ' contact user' || doc_id || '@example.com"
        " or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' from 10.' || (doc_id % 256) || '.0.1'"
    )
    return f"""
WITH r AS (
  SELECT doc_id, {raw} AS raw FROM documents
), s AS (
  SELECT doc_id, raw,
         regexp_replace(regexp_replace(regexp_replace(raw,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IP}', '<IP>', 'g') AS scrubbed
  FROM r
)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(raw, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(raw, '{_PII_IP}')) AS BIGINT) AS n_ips,
       CAST(length(raw) - length(scrubbed) AS BIGINT) AS bytes_removed,
       md5(scrubbed) AS scrubbed_md5
FROM s
ORDER BY doc_id
"""


@register("text_pii_scrub", oracle=_pii_oracle(), tags=("text", "quality"))
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the pre-training scrub pass: emails, phone
    numbers, and internal IPs replaced by typed placeholders in one
    fixed-order regexp_replace chain. The synthetic corpus contains no
    PII, so a deterministic contact line derived from (doc_id, text) is
    appended first; the operator under test is the scrub chain itself,
    and md5(scrubbed) proves the redacted text byte-identical across
    engines (not just the counts).

    Patterns are restricted to the Java-regex ∩ RE2 common subset
    (classes, bounded repetition, word boundary) so both engines match
    identically — the same discipline that makes the corpus-wide
    fingerprint/hash stages portable.

    Scale: ZERO shuffle — regexp_replace / regexp_count are per-row
    JVM-side expressions; at 100 TB this runs at scan speed (the ORDER
    BY is golden-test cosmetics). Reference analog: per-record payload
    transformation delegated to the app (SURVEY.md §2.2 text row).
    """
    d = _t(spark, sf_dir)
    # Spark SQL string literals consume backslash escapes ('\+' → '+'),
    # DuckDB's don't — double them on the Spark side only so both
    # engines see the identical regex
    em, ph, ip = (
        p.replace("\\", "\\\\") for p in (_PII_EMAIL, _PII_PHONE, _PII_IP)
    )
    raw = (
        "concat(text, ' contact user', doc_id, '@example.com or +1-555-',"
        " lpad(cast(doc_id % 10000 AS string), 4, '0'),"
        " ' from 10.', cast(doc_id % 256 AS string), '.0.1')"
    )
    r = d.selectExpr("doc_id", f"{raw} AS raw")
    s = r.selectExpr(
        "doc_id",
        "raw",
        f"regexp_replace(regexp_replace(regexp_replace(raw,"
        f" '{em}', '<EMAIL>'),"
        f" '{ph}', '<PHONE>'),"
        f" '{ip}', '<IP>') AS scrubbed",
    )
    return s.selectExpr(
        "doc_id",
        f"cast(regexp_count(raw, '{em}') AS bigint) AS n_emails",
        f"cast(regexp_count(raw, '{ph}') AS bigint) AS n_phones",
        f"cast(regexp_count(raw, '{ip}') AS bigint) AS n_ips",
        "cast(length(raw) - length(scrubbed) AS bigint) AS bytes_removed",
        "md5(scrubbed) AS scrubbed_md5",
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Corpus vocabulary (tokenizer-training term statistics)
# --------------------------------------------------------------------------

_VOCAB_TOP = 100

_VOCAB_ORACLE = f"""
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS word
  FROM documents
), v AS (
  SELECT word,
         COUNT(*) AS cf,
         COUNT(DISTINCT doc_id) AS df
  FROM w GROUP BY word
)
SELECT word, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df
FROM v
ORDER BY cf DESC, word
LIMIT {_VOCAB_TOP}
"""


@register("text_vocab_topk", oracle=_VOCAB_ORACLE, tags=("text",))
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide vocabulary statistics: collection frequency and
    document frequency per term, top-{100} by cf — the term-count pass
    every tokenizer training (BPE seed vocab) and idf table starts from.

    Scale: explode → partial count map-side, ONE shuffle keyed on the
    term; df via count(distinct doc_id), which Spark plans as the
    two-phase (word, doc_id) partial-dedup expand — no row ever carries
    more than (word, doc_id). Top-k is orderBy+limit →
    TakeOrderedAndProject (no global sort materialization). At 100 TB
    the term key space is Zipf-skewed but partial aggregation absorbs
    the head mass map-side before the shuffle (the classic word-count
    skew answer).
    """
    d = _t(spark, sf_dir)
    return (
        d.selectExpr("doc_id", "explode(split(text, ' ')) AS word")
        .groupBy("word")
        .agg(
            F.count("*").alias("cf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .selectExpr("word", "cast(cf AS bigint) AS cf", "cast(df AS bigint) AS df")
        .orderBy(F.col("cf").desc(), "word")
        .limit(_VOCAB_TOP)
    )


# --------------------------------------------------------------------------
# Gopher-style rule filter (Rae et al. 2021, MassiveText §A1.1) — the
# named-rule companion to text_quality_score's composite score: each rule
# is its own boolean column so a pipeline can report WHICH gate dropped a
# document (the number production filter-debugging actually needs).
# Thresholds are adapted to this synthetic corpus (the paper's 50-word
# floor would pass everything or nothing wholesale here); the shape —
# word-count band, mean-word-length band, stopword floor, alphabetic
# floor — is the published rule set.
# --------------------------------------------------------------------------

_GOPHER_WC_LO, _GOPHER_WC_HI = 20, 5000
_GOPHER_MWL_LO, _GOPHER_MWL_HI = 2.0, 10.0
_GOPHER_MIN_STOP = 2     # ≥ 2 DISTINCT stopwords present
_GOPHER_MIN_ALPHA = 0.8  # ≥ 80% of words purely alphabetic

_GOPHER_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         regexp_split_to_array(text, ' ') AS words,
         len(replace(text, ' ', '')) AS n_nonspace
  FROM documents
), m AS (
  SELECT doc_id,
         len(words) AS n_words,
         n_nonspace / CAST(len(words) AS DOUBLE) AS mean_word_len,
         len(list_filter({_sql_array(_STOPLISTS["en"])},
             s -> list_contains(words, s))) AS n_stop_distinct,
         len(list_filter(words, w -> regexp_matches(w, '^[a-z]+$')))
           / CAST(len(words) AS DOUBLE) AS alpha_frac
  FROM f
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(mean_word_len, 6) AS mean_word_len,
       CAST(n_stop_distinct AS BIGINT) AS n_stop_distinct,
       round(alpha_frac, 6) AS alpha_frac,
       n_words BETWEEN {_GOPHER_WC_LO} AND {_GOPHER_WC_HI} AS wc_ok,
       mean_word_len BETWEEN {_GOPHER_MWL_LO} AND {_GOPHER_MWL_HI} AS mwl_ok,
       n_stop_distinct >= {_GOPHER_MIN_STOP} AS stop_ok,
       alpha_frac >= {_GOPHER_MIN_ALPHA} AS alpha_ok,
       (n_words BETWEEN {_GOPHER_WC_LO} AND {_GOPHER_WC_HI})
         AND (mean_word_len BETWEEN {_GOPHER_MWL_LO} AND {_GOPHER_MWL_HI})
         AND n_stop_distinct >= {_GOPHER_MIN_STOP}
         AND alpha_frac >= {_GOPHER_MIN_ALPHA} AS keep
FROM m
ORDER BY doc_id
"""


@register("text_gopher_rules", oracle=_GOPHER_ORACLE, tags=("text", "quality"))
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule Gopher quality gates, one boolean column per rule plus
    the conjunctive keep flag. Pure JVM columnar (split + HOFs + regex
    — no Python anywhere); mean word length is computed as
    nonspace-chars / words so both engines divide identical integers.
    One scan, zero shuffles beyond the cosmetic final sort — at 100 TB
    this runs at parquet-scan speed like the rest of the text ladder."""
    # gated fan_out (r17): the per-word rlike/HOF chain runs in the scan
    # stage — ONE task on the single-split local fixtures (identity on
    # multi-split layouts).
    d = fan_out(_t(spark, sf_dir), sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    n_nonspace = F.length(F.regexp_replace("text", " ", ""))
    mean_wl = n_nonspace / n_words.cast("double")
    stoplist = F.array(*[F.lit(s) for s in _STOPLISTS["en"]])
    n_stop_distinct = F.size(
        F.filter(stoplist, lambda s: F.array_contains(words, s))
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("^[a-z]+$")))
        / n_words.cast("double")
    )
    wc_ok = n_words.between(_GOPHER_WC_LO, _GOPHER_WC_HI)
    mwl_ok = (mean_wl >= _GOPHER_MWL_LO) & (mean_wl <= _GOPHER_MWL_HI)
    stop_ok = n_stop_distinct >= _GOPHER_MIN_STOP
    alpha_ok = alpha_frac >= _GOPHER_MIN_ALPHA
    return d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        n_stop_distinct.cast("bigint").alias("n_stop_distinct"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        wc_ok.alias("wc_ok"),
        mwl_ok.alias("mwl_ok"),
        stop_ok.alias("stop_ok"),
        alpha_ok.alias("alpha_ok"),
        (wc_ok & mwl_ok & stop_ok & alpha_ok).alias("keep"),
    ).orderBy("doc_id")


# -- Per-source curation ledger: the "which sources to keep" audit ----------

_SRC_LEDGER_ORACLE = f"""
WITH f AS (
  SELECT doc_id, source, lang,
         regexp_split_to_array(text, ' ') AS words,
         len(replace(text, ' ', '')) AS n_nonspace
  FROM documents
), m AS (
  SELECT doc_id, source, lang,
         len(words) AS n_words,
         (len(words) BETWEEN {_GOPHER_WC_LO} AND {_GOPHER_WC_HI})
           AND (n_nonspace / CAST(len(words) AS DOUBLE)
                  BETWEEN {_GOPHER_MWL_LO} AND {_GOPHER_MWL_HI})
           AND len(list_filter({_sql_array(_STOPLISTS["en"])},
                   s -> list_contains(words, s))) >= {_GOPHER_MIN_STOP}
           AND len(list_filter(words, w -> regexp_matches(w, '^[a-z]+$')))
                 / CAST(len(words) AS DOUBLE) >= {_GOPHER_MIN_ALPHA} AS keep
  FROM f
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       round(SUM(CASE WHEN keep THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE), 4) AS keep_pct,
       CAST(SUM(n_words) AS BIGINT) AS sum_tokens,
       CAST(SUM(CASE WHEN keep THEN n_words ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM m
GROUP BY source
ORDER BY source
"""


@register(
    "source_quality_ledger",
    oracle=_SRC_LEDGER_ORACLE,
    tags=("text", "quality", "pipeline"),
)
def source_quality_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE curation ledger — the governance query a real corpus
    team runs before committing a source to the training mix: for each
    ingest source, document count, Gopher-gate pass count and rate,
    raw vs gate-surviving token mass, and language spread. A source
    whose keep_pct collapses (spam mirror, boilerplate farm) is cut at
    the SOURCE level before any per-document work is spent — the
    cheapest lever in a 100 TB pipeline.

    The gate is text_gopher_rules' exact conjunction (same constants,
    same integer-division discipline); this row only changes the
    aggregation grain from doc to source. Scale: one scan, map-side
    rule evaluation, a single |sources|-cardinality shuffle — runs at
    parquet-scan speed. Reference analog: per-stream accounting the
    reference delegates to its app (SURVEY.md §2.2 text row)."""
    d = _t(spark, sf_dir)
    gate = text_gopher_rules(spark, sf_dir).select("doc_id", "n_words", "keep")
    return (
        d.select("doc_id", "source", "lang")
        .join(gate, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_keep"),
            F.round(
                F.sum(F.when(F.col("keep"), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("keep_pct"),
            F.sum("n_words").cast("bigint").alias("sum_tokens"),
            F.sum(F.when(F.col("keep"), F.col("n_words")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
        .orderBy("source")
    )


# -- Per-source domain cap (the URL/domain frequency cap) --------------------
#
# CC-scale corpora cap documents per domain so one boilerplate farm or
# mirror cluster cannot dominate the mix. Priority inside a source is
# deterministic (doc_id ascending = arrival order elsewhere in the
# repo); K is small enough that both branches are non-vacuous at every
# SF (25 docs/source in the fixtures).
_SRC_CAP_K = 10

_SRC_CAP_ORACLE = f"""
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
           AS arrival_rank
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN arrival_rank <= {_SRC_CAP_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN arrival_rank > {_SRC_CAP_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN arrival_rank <= {_SRC_CAP_K} THEN doc_id ELSE 0 END)
            AS BIGINT) AS kept_id_sum
FROM r GROUP BY source ORDER BY source
"""


@register(
    "source_domain_cap",
    oracle=_SRC_CAP_ORACLE,
    tags=("text", "quality", "pipeline", "source"),
)
def source_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the domain-frequency cap every
    CC-scale pipeline applies before mixing (one mirror farm must not
    dominate): keep the first {K} documents per source in
    deterministic priority order (doc_id ascending), report the
    kept/dropped ledger per source with a kept-id checksum so the
    exact survivor SET (not just its size) is pinned cross-engine.
    Complements source_quality_ledger (which scores sources; this
    bounds them) and the streaming twin stream_source_cap_admit (the
    same cap enforced incrementally on the ingest stream).

    Scale: one scan → a rank window partitioned by source → a
    |sources|-row rollup. The window shuffles on source, so ONE hot
    domain is one fat partition: at 100 TB the production form
    pre-aggregates per-source counts (map-side combine, |sources|
    rows), broadcasts the under-cap source list — those rows pass with
    NO rank work — and runs the rank window only over the few over-cap
    sources' rows, which the cap then truncates to K each; the ledger
    below is the same relation either way. That production form is
    EXECUTED as ``source_domain_cap_skewsafe`` (r15, same oracle,
    plan-pinned). Reference analog: none (the reference delegates
    corpus governance to its application)."""
    d = _t(spark, sf_dir)
    r = d.select(
        "doc_id",
        "source",
        F.row_number()
        .over(W.partitionBy("source").orderBy("doc_id"))
        .alias("arrival_rank"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("arrival_rank") <= _SRC_CAP_K, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("arrival_rank") > _SRC_CAP_K, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
            F.sum(
                F.when(
                    F.col("arrival_rank") <= _SRC_CAP_K, F.col("doc_id")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("kept_id_sum"),
        )
        .orderBy("source")
    )


_SRC_CAP_SKEWSAFE_ORACLE = """
WITH dom AS (
  SELECT doc_id, source || '/' || lang AS domain FROM documents
), pre AS (
  SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(doc_id) AS BIGINT) AS id_sum
  FROM dom GROUP BY domain
), cap AS (
  SELECT (SELECT COUNT(*) FROM dom) // (SELECT COUNT(*) FROM pre) AS k
), r AS (
  SELECT d.doc_id, d.domain,
         ROW_NUMBER() OVER (PARTITION BY d.domain ORDER BY d.doc_id)
           AS arrival_rank
  FROM dom d JOIN pre p ON p.domain = d.domain
  WHERE p.n_docs > (SELECT k FROM cap)
)
SELECT p.domain, p.n_docs,
       CAST(COALESCE(o.n_kept, p.n_docs) AS BIGINT) AS n_kept,
       CAST(COALESCE(o.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(COALESCE(o.kept_id_sum, p.id_sum) AS BIGINT) AS kept_id_sum
FROM pre p
LEFT JOIN (
  SELECT domain,
         SUM(CASE WHEN arrival_rank <= (SELECT k FROM cap)
             THEN 1 ELSE 0 END) AS n_kept,
         SUM(CASE WHEN arrival_rank > (SELECT k FROM cap)
             THEN 1 ELSE 0 END) AS n_dropped,
         SUM(CASE WHEN arrival_rank <= (SELECT k FROM cap)
             THEN doc_id ELSE 0 END) AS kept_id_sum
  FROM r GROUP BY domain
) o ON o.domain = p.domain
ORDER BY p.domain
"""


@register(
    "source_domain_cap_skewsafe",
    oracle=_SRC_CAP_SKEWSAFE_ORACLE,
    tags=("text", "quality", "pipeline", "source", "scale"),
)
def source_domain_cap_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``source_domain_cap``'s SKEW-SAFE production form, EXECUTED (r14
    verdict #3 — the shape was docstring prose; the r14 over-cap gate
    layouts set the precedent that the degrade path must run): the
    plain variant ranks EVERY row in a window partitioned by domain,
    so one hot domain (a mirror farm at 100 TB) is one fat window
    partition. Here:

    1. ONE map-side pre-aggregate per domain (partial_count/partial_sum
       combine before the |domains|-row shuffle) carries count + id-sum;
    2. under-cap domains — at CC scale, the overwhelming majority —
       take their ledger STRAIGHT from the pre-aggregate: n_kept =
       n_docs, dropped 0, kept_id_sum = id_sum. No rank work; none of
       their rows ever enters a window;
    3. only the few over-cap domains' rows are re-scanned, filtered by
       a BROADCAST join against the (tiny) over-cap domain list, and
       ranked — each such window partition is then truncated to K.

    Domain & cap: the fixture's ``source`` column is uniform (every
    source carries exactly 25/250 docs), so source_domain_cap's fixed
    K=10 puts EVERY source over-cap — the under-cap branch would be
    vacuous at every SF, exactly the executed-in-name-only gap this op
    exists to close. The domain here is the finer source/lang cell and
    the cap is data-driven (total docs DIV |domains| — integer division,
    exact in both engines), which splits the branches 67/32, 67/30,
    80/20 at sf0.001/0.01/0.1 (measured r15): both the rank-free pass
    and the window truncation execute everywhere.

    Plan pins (tests/test_plans.py): exactly ONE Window operator, fed
    through a broadcast row filter — under-cap rows see no window
    exchange. Residual skew note: a single pathological domain still
    ranks in one partition; the per-partition partial top-K refinement
    that removes even that window is EXECUTED as
    ``source_domain_cap_partialk`` (same oracle, zero Window operators
    plan-pinned) — it only pays when one domain exceeds a task's row
    budget, so this broadcast-filter form remains the default."""
    d = _t(spark, sf_dir).selectExpr(
        "doc_id", "concat(source, '/', lang) AS domain"
    )
    pre = d.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    )
    # data-driven cap: total docs DIV number of domains — one tiny
    # 1-row relation, broadcast into both branches
    capdf = (
        d.agg(F.count(F.lit(1)).alias("n_total"))
        .crossJoin(pre.agg(F.count(F.lit(1)).alias("n_domains")))
        .selectExpr("n_total DIV n_domains AS k")
    )
    pre_k = pre.crossJoin(F.broadcast(capdf))
    under = pre_k.filter(F.col("n_docs") <= F.col("k")).selectExpr(
        "domain",
        "n_docs",
        "n_docs AS n_kept",
        "CAST(0 AS bigint) AS n_dropped",
        "id_sum AS kept_id_sum",
    )
    over_domains = pre_k.filter(F.col("n_docs") > F.col("k")).select(
        "domain", "k"
    )
    over = (
        d.join(F.broadcast(over_domains), "domain")
        .select(
            "doc_id",
            "domain",
            "k",
            F.row_number()
            .over(W.partitionBy("domain").orderBy("doc_id"))
            .alias("arrival_rank"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("arrival_rank") <= F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("arrival_rank") > F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
            F.sum(
                F.when(
                    F.col("arrival_rank") <= F.col("k"), F.col("doc_id")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("kept_id_sum"),
        )
    )
    return under.unionByName(over).orderBy("domain")


# -- Per-source token-distribution drift (chi-square over hashed buckets) ----
#
# "Which source's vocabulary shifted" — the token-level twin of
# events_drift_chi2's type-mix monitor: a source × hashed-token-bucket
# contingency table, per-cell chi-square contributions under the
# events_drift_chi2 float discipline (integer marginals exact in
# double, ONE division, three IEEE ops, round(·,6), DECIMAL sum — no
# accumulation-order hazard), rolled up per source. A boilerplate farm
# or template-spam source shows as the top drift_rank long before any
# per-document screen fires.
_SRC_DRIFT_B = 512  # buckets: enough resolution, bounded contingency


def _src_drift_oracle() -> str:
    from kinesumer_spark.operators.dedup import _sha32_duck

    return f"""
WITH tok AS (
  SELECT source,
         {_sha32_duck("unnest(regexp_split_to_array(text, ' '))")}
           % {_SRC_DRIFT_B} AS bucket
  FROM documents
), cells AS (
  SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM tok GROUP BY 1, 2
), tot AS (
  SELECT source, bucket, n_obs,
         SUM(n_obs) OVER (PARTITION BY source) AS rt,
         SUM(n_obs) OVER (PARTITION BY bucket) AS ct,
         SUM(n_obs) OVER () AS n
  FROM cells
), scored AS (
  SELECT source, n_obs, rt,
         round(
           (n_obs - CAST(rt * ct AS DOUBLE) / n)
           * (n_obs - CAST(rt * ct AS DOUBLE) / n)
           / (CAST(rt * ct AS DOUBLE) / n), 6) AS contrib
  FROM tot
), per_src AS (
  SELECT source,
         CAST(MAX(rt) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE) AS chi2_source
  FROM scored GROUP BY source
)
SELECT source, n_tokens, n_cells, chi2_source,
       CAST(ROW_NUMBER() OVER (ORDER BY chi2_source DESC, source)
            AS BIGINT) AS drift_rank
FROM per_src
ORDER BY source
"""


@register(
    "source_token_drift_chi2",
    oracle=_src_drift_oracle(),
    tags=("text", "quality", "source", "analytics"),
)
def source_token_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift: chi-square contributions of
    the source × hashed-token-bucket contingency table, rolled up per
    source and ranked — "whose vocabulary looks least like the
    corpus". events_drift_chi2 watches the EVENT-TYPE mix over time;
    this watches the TOKEN mix over sources, the corpus-governance
    axis (template spam, boilerplate farms, wrong-language mirrors
    surface here before any per-document screen).

    Float discipline is events_drift_chi2's, verbatim: expected counts
    are integer-marginal products (exact in double far past this
    scale) with ONE division; each cell contributes three IEEE ops +
    round(·,6); the per-source total is an order-independent DECIMAL
    sum of rounded cells. All-integer until the final fixed chain —
    hash-exact cross-engine.

    Scale: one scan → map-side (source, bucket) combine (≤ |sources|
    × {B} cells); three window sums over the bounded cell relation;
    the rollup is |sources| rows. The hash is the repo's portable
    sha-32 (shared with the DSIR/LSH tiers)."""
    return src_drift_from_cells(src_drift_cells(_t(spark, sf_dir))).orderBy(
        "source"
    )


def src_drift_cells(d: DataFrame) -> DataFrame:
    """(source, bucket, n_obs) — the source × hashed-token-bucket
    contingency cells: the single stream-scale aggregation of the
    drift monitor, shared by the batch query and its streaming twin
    (the hourly_counts / zscore_from_hours split)."""
    from kinesumer_spark.operators.dedup import _sha32

    return (
        d.selectExpr(
            "source",
            f"explode(transform(split(text, ' '), s -> {_sha32('s')}"
            f" % {_SRC_DRIFT_B})) AS bucket",
        )
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )


def src_drift_from_cells(cells: DataFrame) -> DataFrame:
    """Chi-square tail over a (source, bucket, n_obs) cell relation —
    runs on the bounded contingency table (≤ |sources|·B rows), never
    the corpus/stream."""
    tot = cells.select(
        "source",
        "n_obs",
        F.sum("n_obs").over(W.partitionBy("source")).alias("rt"),
        F.sum("n_obs").over(W.partitionBy("bucket")).alias("ct"),
        F.sum("n_obs").over(W.partitionBy()).alias("n"),
    )
    scored = tot.selectExpr(
        "source",
        "n_obs",
        "rt",
        "round((n_obs - cast(rt * ct AS double) / n)"
        " * (n_obs - cast(rt * ct AS double) / n)"
        " / (cast(rt * ct AS double) / n), 6) AS contrib",
    )
    per_src = scored.groupBy("source").agg(
        F.max("rt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.col("contrib").cast("decimal(18,6)"))
        .cast("double")
        .alias("chi2_source"),
    )
    return per_src.select(
        "source",
        "n_tokens",
        "n_cells",
        "chi2_source",
        F.row_number()
        .over(W.orderBy(F.desc("chi2_source"), F.col("source")))
        .cast("bigint")
        .alias("drift_rank"),
    ).orderBy("source")


# -- N-gram language-model counts (the count-based-LM / KN-smoothing prep) ---

_LM_TOP = 30

_NGRAM_LM_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), tri AS (
  SELECT words[i] AS w1, words[i + 1] AS w2, words[i + 2] AS w3
  FROM w, UNNEST(range(1, len(words) - 1)) AS t(i)
), c3 AS (
  SELECT w1, w2, w3, COUNT(*) AS c3 FROM tri GROUP BY w1, w2, w3
), c2 AS (
  SELECT w1, w2, SUM(c3) AS ctx_c2 FROM c3 GROUP BY w1, w2
), cont AS (
  SELECT w3, COUNT(*) AS cont_w3 FROM c3 GROUP BY w3
)
SELECT c3.w1, c3.w2, c3.w3,
       CAST(c3.c3 AS BIGINT) AS c3,
       CAST(c2.ctx_c2 AS BIGINT) AS ctx_c2,
       CAST(cont.cont_w3 AS BIGINT) AS cont_w3
FROM c3 JOIN c2 USING (w1, w2) JOIN cont USING (w3)
ORDER BY c3 DESC, c3.w1, c3.w2, c3.w3
LIMIT {_LM_TOP}
"""


@register("text_ngram_lm", oracle=_NGRAM_LM_ORACLE, tags=("text", "lm"))
def text_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based trigram language-model statistics — the tables a
    Kneser-Ney-smoothed LM (or a data-selection perplexity filter) is
    built from: per trigram its count ``c3``, its bigram-context total
    ``ctx_c2`` (= Σ_w3 c3, the KN denominator), and the continuation
    count ``cont_w3`` (distinct bigram contexts preceding w3 — KN's
    distinct-context numerator). Top-30 trigrams, total-ordered
    (count desc, then words) so the driver hash is stable.

    Plan: ONE narrow flatMap (sequence+transform → explode, zero
    shuffles until the count), one trigram-keyed aggregate, then the
    context and continuation counts as WINDOWS over the trigram table
    (sum over (w1,w2), count over (w3)) — never joins back through the
    corpus subtree: a join formulation makes Catalyst recompute the
    whole extraction per branch (measured: 6 parquet scans; this plan
    has exactly one — asserted in tests/test_plans.py). The
    hierarchical-rollup discipline (events_rollup_multires): raw text
    is scanned exactly once; downstream aggregates ride the
    vocab³-bounded trigram table LM pipelines shard on; every count is
    integer-exact."""
    d = _t(spark, sf_dir)
    tri = (
        d.select(F.split("text", " ").alias("w"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3), "
                    "i -> struct(w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3))"
                )
            ).alias("t")
        )
        .select("t.w1", "t.w2", "t.w3")
    )
    c3 = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c3"))
    # each c3 row is a UNIQUE trigram, so count-over-(w3) is exactly the
    # number of distinct (w1,w2) contexts preceding w3
    return (
        c3.select(
            "w1", "w2", "w3",
            F.col("c3").cast("bigint").alias("c3"),
            F.sum("c3").over(W.partitionBy("w1", "w2")).cast("bigint").alias(
                "ctx_c2"
            ),
            F.count(F.lit(1))
            .over(W.partitionBy("w3"))
            .cast("bigint")
            .alias("cont_w3"),
        )
        .orderBy(F.desc("c3"), "w1", "w2", "w3")
        .limit(_LM_TOP)
    )


# -- Corpus-LM document scoring (the data-selection quality filter) ----------

_LM_SCORE_BOTTOM = 200

_LM_SCORE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), wc AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY word) AS c_w FROM tok
), per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(c_w) AS BIGINT) AS sum_count,
         CAST(COUNT(CASE WHEN c_w = 1 THEN 1 END) AS BIGINT) AS n_hapax
  FROM wc GROUP BY doc_id
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_corpus FROM per_doc
)
SELECT doc_id, n_tokens, sum_count, n_hapax,
       CAST(sum_count AS DOUBLE) / CAST(n_tokens * n_corpus AS DOUBLE)
         AS mean_prob,
       CAST(n_hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS hapax_frac
FROM per_doc CROSS JOIN tot
ORDER BY mean_prob ASC, doc_id
LIMIT {_LM_SCORE_BOTTOM}
"""


@register("text_lm_doc_score", oracle=_LM_SCORE_ORACLE, tags=("text", "lm", "quality"))
def text_lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM document scoring — the CCNet-style data-selection
    signal: documents whose tokens are improbable under the corpus's own
    unigram distribution (rare-word-heavy, OOV-heavy, or noisy text)
    score lowest and surface as removal/review candidates. Returns the
    bottom-200 by ``mean_prob`` = (Σ_w c_w) / (n·N) — the
    arithmetic mean of per-token corpus probabilities — plus the hapax
    fraction (tokens seen exactly once corpus-wide).

    Exactness: textbook perplexity needs Σ log p (transcendental; glibc
    vs JVM differ by ulps — see text_bm25's docstring), so the score is
    kept an INTEGER ratio: Σ c_w, n, and N are exact int64 aggregates,
    and the only floats are two correctly-rounded int→double conversions
    and one IEEE division, bit-equal in both engines. mean_prob is
    order-equivalent to the mean-likelihood family of filters and keeps
    the hash oracle.

    Plan (same single-scan discipline as text_ngram_lm): ONE corpus scan
    explodes tokens; corpus counts attach via a count-over-(word) WINDOW
    on the exploded table — never a join back through the corpus subtree
    (a self-join recomputes the scan per branch); per-doc totals are one
    keyed aggregate; N broadcasts back from a one-row aggregate. Two
    shuffles of the token table (word, doc_id) — the canonical cost of
    corpus-frequency scoring; the result is TakeOrderedAndProject, no
    global sort. Reference: the kinesumer hands payloads to exactly this
    kind of scoring application (README.md:67-70)."""
    tok = _t(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    wc = tok.select(
        "doc_id", F.count(F.lit(1)).over(W.partitionBy("word")).alias("c_w")
    )
    # Materialize the per-doc aggregate once (lazy localCheckpoint, |docs|
    # rows): the totals branch and the scoring branch both reference it,
    # and Catalyst does not reuse a subtree across branches — unchecked,
    # the one-row N aggregate re-scanned and re-exploded the WHOLE corpus
    # (measured: 2 parquet scans; now 1, plan-audited in test_plans.py).
    per_doc = (
        wc.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("c_w").cast("bigint").alias("sum_count"),
            F.count(F.when(F.col("c_w") == 1, 1)).cast("bigint").alias("n_hapax"),
        )
        .localCheckpoint(eager=False)
    )
    tot = per_doc.agg(F.sum("n_tokens").cast("bigint").alias("n_corpus"))
    return (
        per_doc.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_tokens",
            "sum_count",
            "n_hapax",
            (
                F.col("sum_count").cast("double")
                / (F.col("n_tokens") * F.col("n_corpus")).cast("double")
            ).alias("mean_prob"),
            (
                F.col("n_hapax").cast("double") / F.col("n_tokens").cast("double")
            ).alias("hapax_frac"),
        )
        .orderBy("mean_prob", "doc_id")
        .limit(_LM_SCORE_BOTTOM)
    )


# -- BPE pair counting (the tokenizer-training inner loop) -------------------

_BPE_TOP = 40

_BPE_ORACLE = f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), pairs AS (
  SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2)))
    AS pair
  FROM words WHERE length(w) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY pair
ORDER BY n_pairs DESC, pair
LIMIT {_BPE_TOP}
"""


@register("text_bpe_pair_counts", oracle=_BPE_ORACLE, tags=("text", "tokenizer"))
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-symbol pair frequencies — the inner loop of BPE tokenizer
    training (the highest-count pair is the next merge). Counts every
    within-word adjacent character bigram across the corpus and returns
    the top-40 by (count desc, pair): after each merge a real
    BPE trainer re-runs exactly this count over the updated symbol
    sequences, so the distributed shape below IS the trainer's hot path.

    Plan: one corpus scan → explode words → explode the per-word bigram
    list (substring-generated, 1-based in both engines; words shorter
    than 2 symbols are filtered BEFORE sequence() so Spark never builds
    a descending sequence) → one pair-keyed aggregate →
    TakeOrderedAndProject. Counts are integer-exact. At 100 TB the
    pair-keyed shuffle carries only (pair, partial count) thanks to
    map-side combine — vocab²-bounded, not corpus-bounded."""
    words = _t(spark, sf_dir).select(F.explode(F.split("text", " ")).alias("w"))
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "pair")
        .limit(_BPE_TOP)
    )


# -- BPE tokenizer TRAINING (iterative merge selection) ---------------------

_BPE_MERGES = 8


def _bpe_train_oracle() -> str:
    """Unrolled K-level CTE chain replaying the full BPE training loop.

    Same encoding discipline as the Spark side (see ``text_bpe_train``):
    symbol sequences are pipe-doubled strings (``'||l||o||w||'``), the
    merge of pair (a, b) is ``replace(s, '|a||b|', '|ab|')`` — both
    engines' ``replace`` is leftmost non-overlapping sequential, which
    IS greedy left-to-right BPE merge semantics (shared '||' boundaries
    keep adjacent matches from stealing each other's separator)."""
    levels = []
    prev = "words0"
    for k in range(1, _BPE_MERGES + 1):
        levels.append(f"""pairs{k} AS (
  SELECT unnest(syms[1:len(syms)-1]) AS l, unnest(syms[2:len(syms)]) AS r, freq
  FROM (SELECT freq, list_filter(string_split(s, '||'), x -> x <> '') AS syms
        FROM {prev})
  WHERE len(syms) >= 2
), best{k} AS (
  SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM pairs{k} GROUP BY l, r
  ORDER BY cnt DESC, l, r LIMIT 1
), words{k} AS (
  SELECT word, freq,
         replace(s, '|' || b.l || '||' || b.r || '|', '|' || b.l || b.r || '|') AS s
  FROM {prev} CROSS JOIN best{k} b
)""")
        prev = f"words{k}"
    union = "\n  UNION ALL ".join(
        f"SELECT {k} AS step, l AS left_sym, r AS right_sym, l || r AS merged,"
        f" cnt AS pair_count FROM best{k}"
        for k in range(1, _BPE_MERGES + 1)
    )
    return f"""
WITH words0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         '||' || regexp_replace(word, '(.)', '\\1||', 'g') AS s
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' AND word NOT LIKE '%|%' GROUP BY word
),
{','.join(levels)}
SELECT * FROM ({union}) ORDER BY step
"""


@register("text_bpe_train", oracle=_bpe_train_oracle(), tags=("text", "tokenizer", "iterative"))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer TRAINING: K greedy merge iterations, returning
    the learned merge table (step, left_sym, right_sym, merged,
    pair_count) — ``text_bpe_pair_counts`` is one lap of this loop's
    counting stage; this runs the whole trainer.

    Distributed shape (the same one every production BPE trainer uses —
    Sennrich et al. 2016 operate on the word-frequency table, not the
    corpus): ONE corpus scan builds the (word, freq) vocabulary — the
    only corpus-bounded stage, a vocab-bounded shuffle with map-side
    combine — then each of the K iterations runs entirely on that
    vocab-sized table: adjacent-pair counts weighted by word freq (one
    tiny aggregate), argmax on the driver (a single (l, r, cnt) row per
    iteration — the same bounded model-collect class as the IVF
    codebooks in similarity.py), and a map-side ``replace`` rewrite of
    the symbol strings. At 100 TB the iterations cost the SAME as at
    1 GB: |vocab| rows, not |corpus|.

    Exactness: symbol sequences are pipe-doubled strings ('low' →
    '||l||o||w||'); merging (a, b) is ``replace(s, '|a||b|', '|ab|')``.
    ``replace`` scans leftmost, non-overlapping, continuing after each
    replacement — exactly greedy left-to-right BPE ('a a a' merges to
    '(aa) a', never '(a (a a))'), and the doubled separators keep
    adjacent matches from consuming each other's boundary. Counts are
    integer; argmax ties break on (count DESC, l, r). The oracle unrolls
    the identical K levels in SQL, so the driver hash-checks the entire
    learned merge table.

    Reference parity: the kinesumer hands records to downstream
    consumers (README.md:67-70); tokenizer training is the canonical
    downstream batch job of a pretraining-data pipeline."""
    vocab = (
        _t(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("word"))
        # '|' is the symbol-boundary metacharacter of the pipe-doubled
        # encoding: a literal '|' inside a word would corrupt it, so
        # such words are excluded from the vocabulary (both engines)
        .filter((F.col("word") != "") & ~F.col("word").contains("|"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn(
            "s", F.concat(F.lit("||"), F.regexp_replace("word", "(.)", "$1||"))
        )
        # materialize once: every iteration re-reads this vocab-sized
        # table; without it each pair-count job replays the corpus scan
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    words = vocab
    for step in range(1, _BPE_MERGES + 1):
        syms = words.select(
            "freq",
            F.expr("filter(split(s, '\\\\|\\\\|'), x -> x != '')").alias("a"),
        ).filter(F.expr("size(a) >= 2"))
        pairs = syms.select(
            "freq",
            F.expr(
                "explode(arrays_zip(slice(a, 1, size(a) - 1),"
                " slice(a, 2, size(a) - 1))) AS p"
            ),
        ).selectExpr("p['0'] AS l", "p['1'] AS r", "freq")
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()  # ONE (l, r, cnt) row — the model, not the data
        )
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((step, l, r, l + r, cnt))
        # learned symbols go in as literal COLUMN values (F.lit), never
        # interpolated into an expression string: a corpus word holding
        # a quote or backslash must not break (or inject into) the plan
        words = words.withColumn(
            "s",
            F.replace(
                F.col("s"), F.lit(f"|{l}||{r}|"), F.lit(f"|{l}{r}|")
            ),
        )
    return spark.createDataFrame(
        merges,
        "step int, left_sym string, right_sym string, merged string, pair_count bigint",
    ).orderBy("step")


# -- TF-IDF keyword extraction ----------------------------------------------

_KW_TOP = 3
_KW_MAX_DOC = 100

# Robertson-odds idf (the text_bm25 exact-rational trick): score =
# tf·(2N − 2df + 1) / (2df + 1) — integers up to one correctly-rounded
# int64→double division per (doc, word), so the per-doc ranking is
# bit-identical in both engines (ties broken by word).
_KW_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, word
), dfed AS (
  SELECT doc_id, word, tf,
         CAST(COUNT(*) OVER (PARTITION BY word) AS BIGINT) AS df
  FROM tf
), nn AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tf
), scored AS (
  SELECT doc_id, word, tf, df,
         CAST(tf * (2 * nn.n - 2 * df + 1) AS DOUBLE) / (2 * df + 1) AS score
  FROM dfed CROSS JOIN nn
), ranked AS (
  SELECT doc_id, word, tf, df, score,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, word) AS BIGINT) AS rnk
  FROM scored
)
SELECT doc_id, word, tf, df, score, rnk
FROM ranked
WHERE rnk <= {_KW_TOP} AND doc_id < {_KW_MAX_DOC}
ORDER BY doc_id, rnk
"""


@register("text_tfidf_keywords", oracle=_KW_ORACLE, tags=("text",))
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by exact-rational
    TF-IDF (Robertson odds idf — the text_bm25 discipline, so the
    ranking hash-matches where log-idf cannot). IDF attaches via a
    count-over-(word) window on the (doc, word) tf table — ONE corpus
    scan (the text_lm_doc_score lesson); N broadcasts from the
    materialized tf table. Output bounded to doc_id < 100 for the
    golden check; the plan is doc-count-independent.

    Scale: two shuffles of the tf table (word window, doc_id window) —
    tf is |doc|·|distinct words per doc|, already far smaller than the
    token stream; the rank window partitions by doc_id (no global
    sort)."""
    tf = (
        _t(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfed = tf.select(
        "doc_id",
        "word",
        "tf",
        F.count(F.lit(1)).over(W.partitionBy("word")).cast("bigint").alias("df"),
    )
    nn = tf.agg(F.count_distinct("doc_id").cast("bigint").alias("n"))
    scored = dfed.crossJoin(F.broadcast(nn)).select(
        "doc_id",
        "word",
        "tf",
        "df",
        (
            (F.col("tf") * (2 * F.col("n") - 2 * F.col("df") + 1)).cast("double")
            / (2 * F.col("df") + 1)
        ).alias("score"),
    )
    rnk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("score"), "word")
    )
    return (
        scored.withColumn("rnk", rnk.cast("bigint"))
        .filter((F.col("rnk") <= _KW_TOP) & (F.col("doc_id") < _KW_MAX_DOC))
        .orderBy("doc_id", "rnk")
    )


# -- deterministic stratified sampling --------------------------------------

_SAMPLE_K = 20

_STRAT_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                    doc_id
         ) AS BIGINT) AS rnk
  FROM documents
)
SELECT doc_id, lang, rnk FROM ranked
WHERE rnk <= {_SAMPLE_K}
ORDER BY lang, rnk
"""


@register("sample_stratified_hash", oracle=_STRAT_ORACLE, tags=("sampling",))
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly k=20 documents per
    language stratum, chosen by sha256(doc_id) rank — uniform-in-
    expectation like Bernoulli sampling but reproducible across runs,
    engines, and data layouts (the property `rand()`-based sampling
    lacks, and the reason split_train_val_test uses the same hash-rank
    family). One keyed shuffle (lang) + in-partition top-k rank.

    Scale note: rank-within-stratum sorts each stratum; for huge
    strata the same semantics ride a two-pass threshold (approx kth
    hash value, then filter) — the plan swap is documented, the
    hash-determinism contract identical."""
    d = _t(spark, sf_dir)
    h = F.expr(
        "cast(conv(substring(sha2(cast(cast(doc_id as string) as binary), 256),"
        " 1, 8), 16, 10) as bigint)"
    )
    rnk = F.row_number().over(W.partitionBy("lang").orderBy(h, "doc_id"))
    return (
        d.select("doc_id", "lang", rnk.cast("bigint").alias("rnk"))
        .filter(F.col("rnk") <= _SAMPLE_K)
        .orderBy("lang", "rnk")
    )


# -- BPE tokenizer APPLY (inference half of text_bpe_train) ------------------

def bpe_segmented_vocab(d: DataFrame) -> DataFrame:
    """(word, n_sym, n_chars) — the trained BPE segmentation applied to
    the distinct-word vocabulary: the Spark twin of
    :func:`_bpe_vocab_chain_sql`'s ``vocab`` CTE, extracted from
    ``text_bpe_apply`` so apply-side consumers (per-doc counts, per-lang
    fertility) share one merge loop. The K driver-side ``collect()`` calls
    pull ONE best-pair row each (the iterative-algorithm exception to the
    no-collect rule — the argmax of a global aggregate is a scalar)."""
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        # '|' is the symbol-boundary metacharacter of the pipe-doubled
        # encoding: a literal '|' inside a word would corrupt it, so
        # such words are excluded from the vocabulary (both engines)
        .filter((F.col("word") != "") & ~F.col("word").contains("|"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn(
            "s", F.concat(F.lit("||"), F.regexp_replace("word", "(.)", "$1||"))
        )
        .localCheckpoint(eager=False)
    )
    words = vocab
    for _ in range(1, _BPE_MERGES + 1):
        syms = words.select(
            "freq",
            F.expr("filter(split(s, '\\\\|\\\\|'), x -> x != '')").alias("a"),
        ).filter(F.expr("size(a) >= 2"))
        pairs = syms.select(
            "freq",
            F.expr(
                "explode(arrays_zip(slice(a, 1, size(a) - 1),"
                " slice(a, 2, size(a) - 1))) AS p"
            ),
        ).selectExpr("p['0'] AS l", "p['1'] AS r", "freq")
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r = best[0]["l"], best[0]["r"]
        # F.lit literals, not f-string expression text (see text_bpe_train)
        words = words.withColumn(
            "s",
            F.replace(
                F.col("s"), F.lit(f"|{l}||{r}|"), F.lit(f"|{l}{r}|")
            ),
        )
    return words.select(
        "word",
        F.expr(
            "cast(size(filter(split(s, '\\\\|\\\\|'), x -> x != '')) AS bigint)"
        ).alias("n_sym"),
        F.length("word").alias("n_chars"),
    )


def _bpe_vocab_chain_sql() -> str:
    """CTE prefix replaying BPE training and emitting the segmented
    ``vocab(word, n_sym, n_chars)`` relation — the shared front half of
    every apply-side oracle (per-doc counts, per-lang fertility), so the
    unrolled merge chain exists in exactly one place."""
    levels = []
    prev = "words0"
    for k in range(1, _BPE_MERGES + 1):
        levels.append(f"""pairs{k} AS (
  SELECT unnest(syms[1:len(syms)-1]) AS l, unnest(syms[2:len(syms)]) AS r, freq
  FROM (SELECT freq, list_filter(string_split(s, '||'), x -> x <> '') AS syms
        FROM {prev})
  WHERE len(syms) >= 2
), best{k} AS (
  SELECT l, r FROM pairs{k} GROUP BY l, r
  ORDER BY CAST(SUM(freq) AS BIGINT) DESC, l, r LIMIT 1
), words{k} AS (
  SELECT word, freq,
         replace(s, '|' || b.l || '||' || b.r || '|', '|' || b.l || b.r || '|') AS s
  FROM {prev} CROSS JOIN best{k} b
)""")
        prev = f"words{k}"
    return f"""words0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         '||' || regexp_replace(word, '(.)', '\\1||', 'g') AS s
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' AND word NOT LIKE '%|%' GROUP BY word
),
{','.join(levels)},
vocab AS (
  SELECT word,
         CAST(len(list_filter(string_split(s, '||'), x -> x <> '')) AS BIGINT)
           AS n_sym,
         length(word) AS n_chars
  FROM words{_BPE_MERGES}
)"""


def _bpe_apply_oracle() -> str:
    """Replays training (the same K unrolled levels) AND applies the
    learned segmentation to every document: each doc's token count is
    the sum of its words' final symbol counts."""
    return f"""
WITH {_bpe_vocab_chain_sql()}, tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT t.doc_id,
       CAST(SUM(v.n_chars) AS BIGINT) AS n_chars_tokens,
       CAST(SUM(v.n_sym) AS BIGINT) AS n_bpe_tokens,
       round(SUM(v.n_chars) / CAST(SUM(v.n_sym) AS DOUBLE), 6) AS compression
FROM tok t JOIN vocab v ON v.word = t.word
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@register(
    "text_bpe_apply",
    oracle=_bpe_apply_oracle(),
    tags=("text", "tokenizer", "iterative"),
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer INFERENCE: apply the merges learned by the
    ``text_bpe_train`` loop to every document and report per-doc token
    counts (char-level vs post-merge) and the compression ratio — the
    train→apply pair a pipeline runs to size its token budget.

    The trainer's insight carries over: segmentation is a WORD-level
    function, so the merges apply once per distinct word (the
    vocab-sized table the training loop already maintains) and documents
    just join their words to that segmented vocab — at 100 TB the apply
    step costs one word-keyed join of the exploded corpus against a
    broadcast-sized vocab, with the merge replaces never touching the
    corpus itself. The oracle replays training AND application in one
    unrolled SQL chain, so the driver hash-checks the end-to-end
    tokenizer."""
    seg = bpe_segmented_vocab(_t(spark, sf_dir))
    tok = (
        _t(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    return (
        tok.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_chars").cast("bigint").alias("n_chars_tokens"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_chars") / F.sum("n_sym").cast("double"), 6
            ).alias("compression"),
        )
        .orderBy("doc_id")
    )


_FERTILITY_ORACLE = f"""
WITH {_bpe_vocab_chain_sql()}, tok AS (
  SELECT d.lang, unnest(string_split(d.text, ' ')) AS word FROM documents d
)
SELECT t.lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(CASE WHEN v.n_sym = v.n_chars AND v.n_chars > 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_unmerged,
       CAST(SUM(CASE WHEN v.n_sym = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_token,
       CAST(SUM(v.n_sym) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(v.n_chars) AS BIGINT) AS n_char_tokens,
       round(SUM(v.n_sym) / CAST(COUNT(*) AS DOUBLE), 6) AS tokens_per_word,
       round(SUM(v.n_chars) / CAST(SUM(v.n_sym) AS DOUBLE), 6) AS compression
FROM tok t JOIN vocab v ON v.word = t.word
GROUP BY t.lang
ORDER BY t.lang
"""


@register(
    "text_tokenizer_fertility",
    oracle=_FERTILITY_ORACLE,
    tags=("text", "tokenizer", "audit", "iterative"),
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility audit over the trained BPE
    segmentation: word occurrences that stayed fully char-level
    (n_sym = n_chars on a multi-char word — the tokenizer learned
    nothing for them), words collapsed to a single token, and the two
    budget numbers a multilingual pipeline reads before fixing a
    tokenizer — tokens/word (fertility) and chars/token (compression)
    per language. A shared tokenizer systematically inflates token
    budgets for languages it undertrained on; this measures exactly
    that, corpus-wide. Reference has no analog.

    Shares :func:`bpe_segmented_vocab` (Spark) / the unrolled vocab
    chain (oracle) with ``text_bpe_apply`` — one merge loop, two
    consumers; the segmentation cannot fork between per-doc counts and
    this audit.

    Scale: segmentation stays a vocab-sized relation; the corpus pays
    one word explode + one broadcast join against the segmented vocab +
    one |langs|-row aggregate. No text column past the explode."""
    d = _t(spark, sf_dir)
    seg = bpe_segmented_vocab(d)
    tok = d.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        tok.join(F.broadcast(seg), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(
                F.expr(
                    "CASE WHEN n_sym = n_chars AND n_chars > 1"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_unmerged"),
            F.sum(F.expr("CASE WHEN n_sym = 1 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_single_token"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_char_tokens"),
            F.round(
                F.sum("n_sym") / F.count(F.lit(1)).cast("double"), 6
            ).alias("tokens_per_word"),
            F.round(
                F.sum("n_chars") / F.sum("n_sym").cast("double"), 6
            ).alias("compression"),
        )
        .orderBy("lang")
    )


# -- DSIR-style hashed-ngram importance weighting ---------------------------

_DSIR_B = 4096  # hashed feature buckets
_DSIR_S = 1_000_000_000  # integer probability scale
_DSIR_TOP = 200


def dsir_model_cte(tok: str, target_pred: str) -> str:
    """DuckDB CTE fragment fitting the DSIR bucket model over a token
    CTE ``tok`` (columns: bucket + whatever ``target_pred`` reads).
    Emits CTEs ``dmodel``/``dtot``/``m`` — ``m(bucket, m_t, m_r)`` is
    the Laplace-smoothed integer probability table. ONE definition
    shared by the standalone oracle and the pipeline oracle so the two
    can never drift (r10 review)."""
    return f"""dmodel AS (
  SELECT bucket, COUNT(*) AS c_r,
         SUM(CASE WHEN {target_pred} THEN 1 ELSE 0 END) AS c_t
  FROM {tok} GROUP BY bucket
), dtot AS (
  SELECT SUM(c_r) AS t_r, SUM(c_t) AS t_t FROM dmodel
), m AS (
  SELECT bucket,
         (c_t + 1) * {_DSIR_S} // (t_t + {_DSIR_B}) AS m_t,
         (c_r + 1) * {_DSIR_S} // (t_r + {_DSIR_B}) AS m_r
  FROM dmodel CROSS JOIN dtot
)"""


def dsir_model_df(tok: DataFrame, target: Column) -> DataFrame:
    """Spark twin of ``dsir_model_cte``: fit the ≤_DSIR_B-row model
    over a (bucket, …) token DataFrame and return (bucket, m_t, m_r).
    localCheckpoint truncates the fit lineage so consumers never
    re-scan the corpus for the totals branch (plan-audited)."""
    model = (
        tok.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("c_r"),
            F.sum(F.when(target, 1).otherwise(0)).alias("c_t"),
        )
        .localCheckpoint(eager=False)
    )
    tot = model.agg(F.sum("c_r").alias("t_r"), F.sum("c_t").alias("t_t"))
    return model.crossJoin(F.broadcast(tot)).selectExpr(
        "bucket",
        f"(c_t + 1) * {_DSIR_S} DIV (t_t + {_DSIR_B}) AS m_t",
        f"(c_r + 1) * {_DSIR_S} DIV (t_r + {_DSIR_B}) AS m_r",
    )


_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang,
         {_sha32_duck("unnest(regexp_split_to_array(text, ' '))")}
           % {_DSIR_B} AS bucket
  FROM documents
), {dsir_model_cte("tok", "lang = 'en'")}
SELECT tok.doc_id,
       MAX(tok.lang) AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(m.m_t - m.m_r) AS BIGINT) AS dsir_score
FROM tok JOIN m USING (bucket)
GROUP BY tok.doc_id
ORDER BY dsir_score DESC, tok.doc_id
LIMIT {_DSIR_TOP}
"""


@register("text_dsir_importance", oracle=_DSIR_ORACLE, tags=("text", "training"))
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more probable its hashed-unigram features are under a
    TARGET distribution (here the English slice — the stand-in for a
    high-quality target domain) than under the RAW corpus, and surface
    the top-{_DSIR_TOP} most target-like documents for selection.

    Words hash into {_DSIR_B} buckets (DSIR's hashed-ngram trick: the
    model is a fixed-size count table no matter the vocabulary).
    Both distributions are Laplace-smoothed integer "probabilities"
    scaled by 10⁹:  m[b] = (c[b]+1)·S div (T+B);  a document's score is
    Σ_tokens (m_target − m_raw) — the LINEAR-space importance margin
    rather than the paper's Σ log-ratio, because transcendental logs
    are not bit-portable across engines (glibc vs JVM ulps — see
    text_bm25), while this variant is pure int64 and ranks by the same
    "target-like vs raw-like" signal. Selection from the returned
    ranking (top-k or a threshold) IS importance resampling on the
    margin statistic.

    Plan/scale: pass 1 fits the model — explode → partial map-side
    count into ≤{_DSIR_B} buckets → ONE tiny shuffle ({_DSIR_B} keys
    after map-side combine); the model + totals broadcast (≤{_DSIR_B}
    rows — never corpus-bounded). Pass 2 scores — a second corpus scan
    explodes tokens, broadcast-joins the model map-side (no token
    shuffle by bucket: {_DSIR_B} keys would under-partition a 100 TB
    token stream), and aggregates per doc_id (one shuffle, full key
    cardinality). Top-k is TakeOrderedAndProject. Two corpus scans is
    the textbook fit-then-score shape: at 100 TB, re-scanning parquet
    beats materializing the exploded token table."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("word"),
    ).select(
        "doc_id",
        "lang",
        F.expr(f"{_sha32('word')} % {_DSIR_B}").alias("bucket"),
    )
    m = dsir_model_df(tok, F.col("lang") == "en")
    return (
        tok.join(F.broadcast(m), "bucket")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.col("m_t") - F.col("m_r")).cast("bigint").alias("dsir_score"),
        )
        .orderBy(F.desc("dsir_score"), "doc_id")
        .limit(_DSIR_TOP)
    )


# The paper's full feature set is hashed n-grams with n ≤ 2: every
# word PLUS every pair of adjacent words, all hashed into the same
# B-bucket table. Unigrams cannot contain a space (they come from a
# space split) and bigrams always do, so the two feature kinds never
# collide as strings — only (deliberately) in the hash buckets.
_DSIR_BG_FEATS_SPARK = """concat(
  ws,
  zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
           (a, b) -> concat(a, ' ', b)))"""

_DSIR_BG_FEATS_DUCK = """list_concat(
  ws,
  list_transform(range(1, len(ws)),
                 i -> ws[CAST(i AS INTEGER)] || ' '
                      || ws[CAST(i AS INTEGER) + 1]))"""

_DSIR_BG_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang, regexp_split_to_array(text, ' ') AS ws
  FROM documents
), tok AS (
  SELECT doc_id, lang,
         {_sha32_duck(f"unnest({_DSIR_BG_FEATS_DUCK})")}
           % {_DSIR_B} AS bucket
  FROM w
), {dsir_model_cte("tok", "lang = 'en'")}
SELECT tok.doc_id,
       MAX(tok.lang) AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_features,
       CAST(SUM(m.m_t - m.m_r) AS BIGINT) AS dsir_score
FROM tok JOIN m USING (bucket)
GROUP BY tok.doc_id
ORDER BY dsir_score DESC, tok.doc_id
LIMIT {_DSIR_TOP}
"""


@register(
    "text_dsir_importance_bigram",
    oracle=_DSIR_BG_ORACLE,
    tags=("text", "training"),
)
def text_dsir_importance_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_dsir_importance with the paper's FULL feature set: hashed
    n-grams, n ≤ 2 (Xie et al. 2023 §3 — unigrams capture topical
    vocabulary, bigrams capture the local word-order signal that
    distinguishes fluent target-domain prose from keyword soup). Every
    word and every adjacent word pair hash into the SAME
    {_DSIR_B}-bucket table via the same `_sha32 % B`; the model fit,
    Laplace smoothing, integer margin, and top-{_DSIR_TOP} selection
    are the shared dsir_model_cte/_df definitions — no arithmetic
    fork from the unigram operator.

    n_features per document is 2n−1 (n words + n−1 bigrams), so
    scores are NOT comparable across the two variants — each ranks
    within its own feature space; the bigram variant is the paper-
    faithful one and the unigram variant the cheaper screen.

    Plan/scale: identical two-scan fit-then-score shape as the unigram
    operator (pinned by the same plan test): the feature stream is a
    per-row HOF composition (zip_with over two slices — no Generate
    beyond the one explode, no Python), the model broadcasts back
    (≤{_DSIR_B} rows), scoring aggregates per doc_id, TakeOrdered
    top-k. The feature stream is ~2× the unigram stream — same
    asymptotics, measured cost in BENCH extended."""
    # gated fan_out (r17): both fit and score passes run the 2n-1
    # feature chain (HOF zip_with + sha per feature) in the scan stage —
    # ONE task on the single-split local fixtures (identity on
    # multi-split layouts). The unigram twin measured a LOSS under the
    # same treatment (0.78x) — its chain is half the weight — and stays
    # on the raw scan.
    d = fan_out(read_table(spark, sf_dir, "documents"), sf_dir, "documents")
    tok = (
        d.select("doc_id", "lang", F.split("text", " ").alias("ws"))
        .select(
            "doc_id",
            "lang",
            F.explode(F.expr(_DSIR_BG_FEATS_SPARK)).alias("feat"),
        )
        .select(
            "doc_id",
            "lang",
            F.expr(f"{_sha32('feat')} % {_DSIR_B}").alias("bucket"),
        )
    )
    m = dsir_model_df(tok, F.col("lang") == "en")
    return (
        tok.join(F.broadcast(m), "bucket")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("n_features"),
            F.sum(F.col("m_t") - F.col("m_r"))
            .cast("bigint")
            .alias("dsir_score"),
        )
        .orderBy(F.desc("dsir_score"), "doc_id")
        .limit(_DSIR_TOP)
    )


# -- Char-n-gram rank-profile language ID (Cavnar–Trenkle) -------------------
# The r12 lang-confusion audit exposed the stopword heuristic's
# off-diagonal mass; this is the classic public fix: Cavnar & Trenkle
# (1994), "N-Gram-Based Text Categorization" — per-language ranked
# char-n-gram profiles, out-of-place rank distance, argmin. Chosen over
# log-sum Naive Bayes DELIBERATELY: the out-of-place measure is pure
# integer arithmetic (counts → ranks → |rank diffs|), so the DuckDB
# oracle replays it bit-for-bit, where Σ log p differs between glibc
# and the JVM by ulps (the text_lm_doc_score / text_bm25 rule).

_CT_PREFIX = 300  # chars of text used per doc — lang-id saturates early
_CT_K = 64  # profile size (top-K trigrams); also the missing-gram penalty
_CT_TRAIN_MOD = 10  # doc_id % 10 == 0 → the labeled training slice
_CT_LANGS = ("en", "de", "es", "fr", "zh")


def _ct_grams_sql_spark() -> str:
    return (
        f"explode(transform(sequence(1, greatest(length(substring(text, 1,"
        f" {_CT_PREFIX})) - 2, 1)),"
        f" i -> substring(substring(text, 1, {_CT_PREFIX}), i, 3)))"
    )


_LANG_NGRAM_ORACLE = f"""
WITH g AS (
  SELECT doc_id, lang,
         unnest(list_transform(
           range(1, greatest(length(substr(text, 1, {_CT_PREFIX})) - 2, 1) + 1),
           i -> substr(substr(text, 1, {_CT_PREFIX}), i, 3))) AS gram
  FROM documents
), lp AS (
  SELECT lang, gram,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY COUNT(*) DESC, gram) AS lrank
  FROM g WHERE doc_id % {_CT_TRAIN_MOD} = 0
  GROUP BY lang, gram
  QUALIFY lrank <= {_CT_K}
), lpw AS (
  SELECT gram,
         MAX(CASE WHEN lang = 'en' THEN lrank END) AS r_en,
         MAX(CASE WHEN lang = 'de' THEN lrank END) AS r_de,
         MAX(CASE WHEN lang = 'es' THEN lrank END) AS r_es,
         MAX(CASE WHEN lang = 'fr' THEN lrank END) AS r_fr,
         MAX(CASE WHEN lang = 'zh' THEN lrank END) AS r_zh
  FROM lp GROUP BY gram
), dp AS (
  SELECT doc_id, lang, gram,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY COUNT(*) DESC, gram) AS drank
  FROM g GROUP BY doc_id, lang, gram
  QUALIFY drank <= {_CT_K}
), dist AS (
  SELECT d.doc_id, d.lang,
         SUM(COALESCE(abs(d.drank - l.r_en), {_CT_K})) AS dist_en,
         SUM(COALESCE(abs(d.drank - l.r_de), {_CT_K})) AS dist_de,
         SUM(COALESCE(abs(d.drank - l.r_es), {_CT_K})) AS dist_es,
         SUM(COALESCE(abs(d.drank - l.r_fr), {_CT_K})) AS dist_fr,
         SUM(COALESCE(abs(d.drank - l.r_zh), {_CT_K})) AS dist_zh
  FROM dp d LEFT JOIN lpw l ON l.gram = d.gram
  GROUP BY d.doc_id, d.lang
)
SELECT doc_id, lang,
       CAST(dist_en AS BIGINT) AS dist_en,
       CAST(dist_de AS BIGINT) AS dist_de,
       CAST(dist_es AS BIGINT) AS dist_es,
       CAST(dist_fr AS BIGINT) AS dist_fr,
       CAST(dist_zh AS BIGINT) AS dist_zh,
       CASE LEAST(dist_en, dist_de, dist_es, dist_fr, dist_zh)
         WHEN dist_en THEN 'en' WHEN dist_de THEN 'de'
         WHEN dist_es THEN 'es' WHEN dist_fr THEN 'fr'
         ELSE 'zh' END AS predicted_lang
FROM dist
ORDER BY doc_id
"""


def ct_lang_profiles(grams: DataFrame) -> DataFrame:
    """(lang, gram, lrank) — the per-language top-K trigram rank
    profiles over the labeled training slice (doc_id % _CT_TRAIN_MOD
    = 0): count desc, gram lexicographic ties. Extracted (r14) so the
    streaming gate bakes the IDENTICAL profiles the batch classifier
    joins — one training pass, two consumers, zero fork."""
    lw = W.partitionBy("lang").orderBy(F.desc("n"), F.col("gram"))
    return (
        grams.filter(F.col("doc_id") % _CT_TRAIN_MOD == 0)
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("lrank", F.row_number().over(lw))
        .filter(F.col("lrank") <= _CT_K)
    )


@register("text_lang_id_ngram", oracle=_LANG_NGRAM_ORACLE, tags=("text",))
def text_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram rank-profile language ID (Cavnar–Trenkle 1994 —
    the public n-gram lang-id standard, textcat's algorithm): per-lang
    profiles are the top-{K} trigrams of the labeled training slice
    (doc_id % {mod} = 0) ranked by count (ties lexicographic, both
    engines); each doc's profile is ranked the same way over its first
    {prefix} chars; distance to a language is the out-of-place measure
    Σ |doc rank − lang rank| with a missing-gram penalty of K; predict
    = argmin with the heuristic's fixed precedence (en>de>es>fr>zh) on
    ties. The improvement over the stopword heuristic is proven by
    text_lang_confusion_ngram beside text_lang_confusion.

    ALL-INTEGER on purpose: counts → row_number ranks → |rank diffs| —
    no Σ log p (glibc-vs-JVM ulp drift, the text_lm_doc_score rule), so
    the oracle replays the classifier bit-for-bit, training included.

    Scale (r14 rewrite): the training pass is unchanged (gram explode
    bounded by the {prefix}-char cap, one groupBy + a |langs|-partition
    rank window over the labeled slice), but SCORING is now the in-row
    form shared with stream_lang_id_gate: the ≤|langs|·K profile rows
    are one bounded collect baked as map literals, and each doc's
    profile + five distances are pure in-row array arithmetic — the
    doc-grain groupBy + per-doc rank window + broadcast join of the
    original form are GONE (measured 4.96 → ~1.5 s at sf0.1; the
    doc-profile shuffle was the whole cost). Zero fork: one scoring
    expression chain, two consumers. The explicit repartition is the
    single-split lesson: the parquet table is one scan split at these
    SFs, and the in-row chain is CPU-bound per row — without the
    fan-out it runs on one core (measured 11 s; fanned ~1.5 s), exactly
    like the streaming gates' microbatch fan-out. Reference analog:
    per-payload classification the consumer app runs on delivered
    records (README.md:67-70)."""
    d = _t(spark, sf_dir)
    scored = d.repartition(spark.sparkContext.defaultParallelism)
    return ct_inrow_lang_id(scored, ct_profile_maps(d)).orderBy("doc_id")


def ct_profile_maps(d: DataFrame) -> dict[str, str]:
    """lang → SQL map literal of its top-K trigram ranks, from ONE
    training pass (ct_lang_profiles) and one bounded collect
    (≤ |langs|·K = {n} rows — the codebook-pull exception). Shared by
    the batch classifier and the streaming gate."""
    grams = d.select(
        "doc_id", "lang", F.expr(f"{_ct_grams_sql_spark()} AS gram")
    )
    prof_rows = ct_lang_profiles(grams).collect()

    def esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    maps: dict[str, str] = {}
    for L in _CT_LANGS:
        entries = [
            f"'{esc(r['gram'])}', {int(r['lrank'])}L"
            for r in prof_rows
            if r["lang"] == L
        ]
        maps[L] = "map(" + ", ".join(entries) + ")" if entries else "map()"
    return maps


ct_profile_maps.__doc__ = ct_profile_maps.__doc__.format(
    n=len(_CT_LANGS) * _CT_K
)


def ct_inrow_lang_id(df: DataFrame, maps: dict[str, str]) -> DataFrame:
    """(doc_id, lang, dist_en..dist_zh, predicted_lang) computed IN-ROW
    over a (batch or streaming) (doc_id, lang, text) relation — the
    Cavnar–Trenkle scorer with zero doc-grain shuffles. The doc profile
    replaces the batch rank window (illegal on a stream, and the
    dominant cost in batch): sort the doc's trigram array, run
    boundaries via filter-over-sequence, run lengths via zip_with
    against the shifted boundary array, one struct array_sort (count
    desc, gram asc — ROW_NUMBER's exact tie semantics in both engines),
    slice(K); distances are one integer aggregate per language against
    the baked profile maps with the missing-gram COALESCE penalty.
    ALL-INTEGER; every pass is O(prefix) per document."""
    dist_exprs = [
        f"aggregate(sequence(1, size(prof)), 0L,"
        f" (acc, i) -> acc + coalesce("
        f"abs(cast(i AS bigint) - element_at({maps[L]},"
        f" element_at(prof, i).gram)), {_CT_K}L)) AS dist_{L}"
        for L in _CT_LANGS
    ]
    best = " , ".join(f"dist_{L}" for L in _CT_LANGS)
    pred_arms = " ".join(
        f"WHEN least({best}) = dist_{L} THEN '{L}'" for L in _CT_LANGS[:-1]
    )
    return (
        df.selectExpr(
            "doc_id",
            "lang",
            f"array_sort(transform(sequence(1,"
            f" greatest(length(substring(text, 1, {_CT_PREFIX})) - 2, 1)),"
            f" i -> substring(substring(text, 1, {_CT_PREFIX}), i, 3))) AS sg",
        )
        .selectExpr(
            "doc_id",
            "lang",
            "sg",
            "filter(sequence(1, size(sg)),"
            " i -> i = 1 OR element_at(sg, i) != element_at(sg, i - 1))"
            " AS bnd",
        )
        .selectExpr(
            "doc_id",
            "lang",
            f"slice(array_sort(zip_with(bnd,"
            f" concat(slice(bnd, 2, size(bnd)), array(size(sg) + 1)),"
            f" (a, b) -> struct(cast(a - b AS int) AS negn,"
            f" element_at(sg, cast(a AS int)) AS gram))), 1, {_CT_K}) AS prof",
        )
        .selectExpr("doc_id", "lang", *dist_exprs)
        .selectExpr(
            "doc_id",
            "lang",
            *[f"dist_{L}" for L in _CT_LANGS],
            f"CASE {pred_arms} ELSE '{_CT_LANGS[-1]}' END AS predicted_lang",
        )
    )


_LANG_NGRAM_CONFUSION_ORACLE = f"""
WITH pred AS ({_LANG_NGRAM_ORACLE})
SELECT lang, predicted_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM pred
GROUP BY lang, predicted_lang
ORDER BY lang, predicted_lang
"""


@register(
    "text_lang_confusion_ngram",
    oracle=_LANG_NGRAM_CONFUSION_ORACLE,
    tags=("text", "quality"),
)
def text_lang_confusion_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_lang_id_ngram's confusion matrix, registered BESIDE the
    stopword heuristic's (text_lang_confusion) — and the comparison's
    honest FINDING, measured before promising improvement: THIS CORPUS'
    lang labels carry no textual signal. Per-lang word rates are
    statistically identical (e.g. 'column' per-1000-token rate at
    sf0.1: 33.2/33.5/34.0/34.0/34.8 across en/de/es/fr/zh, converging
    with SF), and the stopword heuristic's off-diagonal mass equals
    1 − P(majority) EXACTLY at sf0.001 — it is a constant
    majority-class classifier in disguise. On label-independent text no
    classifier beats that baseline in expectation, so the r12 audit's
    hoped-for "strictly less off-diagonal mass" is unattainable here by
    ANY method; the rank-profile classifier's higher off-diagonal is
    the expected behavior of a real (prior-free) classifier on pure
    noise. Pinned by tests/test_llm_ops.py
    (test_lang_labels_carry_no_textual_signal); on a corpus with real
    per-language text the same audit pair would show the improvement.
    Same zero-fork rollup pattern — the per-doc op's DataFrame is the
    input, its oracle is the CTE."""
    p = text_lang_id_ngram(spark, sf_dir).select(
        "doc_id", "lang", "predicted_lang"
    )
    return (
        p.groupBy("lang", "predicted_lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("lang", "predicted_lang")
    )


@register(
    "source_domain_cap_partialk",
    oracle=_SRC_CAP_SKEWSAFE_ORACLE,
    tags=("text", "quality", "pipeline", "source", "scale"),
)
def source_domain_cap_partialk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe cap's FINAL refinement, executed (r15 — the
    ``source_domain_cap_skewsafe`` docstring named per-partition
    partial top-K as the step that remains when ONE domain exceeds a
    task's row budget; naming it is prose, this runs it): the over-cap
    branch's rank window — still one fat partition per pathological
    domain — is replaced by a TWO-LEVEL top-K with NO window operator
    anywhere in the plan:

    1. map-side per (domain, input-partition) partials: count, id-sum,
       and the K smallest doc_ids via slice(array_sort(collect_list)).
       NOTE on the transient bound (r15 verdict): Catalyst materializes
       the full per-(domain, partition) id array before the sort+slice,
       so each task's working buffer is bounded by its INPUT SPLIT
       (maxPartitionBytes), not by K — only the partial's OUTPUT is
       K-bounded. The fat-window problem the op exists to solve is
       still solved: no task ever holds a whole hot domain, because the
       buffer can never exceed one input split regardless of skew;
    2. one |domains|-keyed merge: counts/sums add; the kept set is the
       K smallest of the union of partials' K-smallest lists (≤ K ×
       n_partitions ids per domain on ONE row — bounded by the
       cluster, not the data), its sum via a HOF aggregate.

    Correctness of the two-level K-smallest is the standard
    order-statistic argument: any global top-K element is a top-K
    element of its own partition, so the union of partial top-Ks
    contains the global top-K. All arithmetic is integer; the under-cap
    branch is the skewsafe op's pre-aggregate verbatim (shared oracle —
    the three cap formulations must agree cell-for-cell). Plan pins:
    ZERO Window operators, partial aggregation present. Cost note: at
    fixture scale this pays collect_list materialization the window
    variant avoids — the shape exists for the one-hot-domain regime,
    and the skewsafe op's broadcast-filter form remains the default."""
    d = _t(spark, sf_dir).selectExpr(
        "doc_id", "concat(source, '/', lang) AS domain"
    )
    pre = d.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    )
    capdf = (
        d.agg(F.count(F.lit(1)).alias("n_total"))
        .crossJoin(pre.agg(F.count(F.lit(1)).alias("n_domains")))
        .selectExpr("n_total DIV n_domains AS k")
    )
    pre_k = pre.crossJoin(F.broadcast(capdf))
    under = pre_k.filter(F.col("n_docs") <= F.col("k")).selectExpr(
        "domain",
        "n_docs",
        "n_docs AS n_kept",
        "CAST(0 AS bigint) AS n_dropped",
        "id_sum AS kept_id_sum",
    )
    over_domains = pre_k.filter(F.col("n_docs") > F.col("k")).select(
        "domain", "k"
    )
    partials = (
        d.join(F.broadcast(over_domains), "domain")
        .groupBy("domain", F.spark_partition_id().alias("pid"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("pn"),
            F.expr("slice(array_sort(collect_list(doc_id)), 1, "
                   "int(first(k))) AS topk"),
            F.first("k").alias("k"),
        )
    )
    over = (
        partials.groupBy("domain")
        .agg(
            F.sum("pn").cast("bigint").alias("n_docs"),
            F.expr(
                "slice(array_sort(flatten(collect_list(topk))), 1,"
                " int(first(k))) AS kept"
            ),
            F.first("k").alias("k"),
        )
        .selectExpr(
            "domain",
            "n_docs",
            "CAST(size(kept) AS bigint) AS n_kept",
            "n_docs - CAST(size(kept) AS bigint) AS n_dropped",
            "aggregate(kept, CAST(0 AS bigint), (acc, x) -> acc + x)"
            " AS kept_id_sum",
        )
    )
    return under.unionByName(over).orderBy("domain")
