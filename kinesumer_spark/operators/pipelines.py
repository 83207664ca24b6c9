"""End-to-end pretraining-data curation pipeline — the capstone
composition of the curation operators into ONE oracle-checked dataflow
(r8: the near-dup tier is composed in, per the r7 verdict — real
pretraining curation runs MinHash/LSH between exact dedup and the
selection cut):

    documents
      → Gopher quality gate          (text_gopher_rules' keep rules)
      → exact dedup, canonical keep  (dedup_exact's sha256 / min-doc_id)
      → near-dup survivor filter     (dedup_minhash_lsh's full tier over
                                      the deduped corpus: MinHash(64) →
                                      LSH(16×4) candidates → exact-Jaccard
                                      verify ≥ 0.5; of each verified pair
                                      the LARGER doc_id drops — the same
                                      min-id canonical rule as the exact
                                      stage)
      → corpus-LM selection cut      (text_lm_doc_score's mean_prob,
                                      re-derived over the SURVIVING
                                      corpus — selection statistics must
                                      follow the surviving distribution)
      → corpus summary               (per-stage survivor counts, final
                                      token mass, doc-id checksum)

This is the "could a user run their whole pipeline here" proof: each
stage is the registered operator's exact semantics, chained, and the
DuckDB oracle replays the ENTIRE chain — so a drift in any stage's
semantics (not just its standalone query) reddens the driver row.

Scale: gate and dedup are map-side + one hash shuffle each; the
near-dup tier is the banded-LSH shape of dedup_minhash_lsh (signatures
and band keys shuffle, never text; no all-pairs) with its drop set
broadcast back; the LM cut is the two token-table shuffles
text_lm_doc_score documents; the bottom-K selection is TakeOrdered
(per-partition heads) anti-joined back as a broadcast of K ids. No
stage collects to the driver.

Reference parity: the reference hands records to exactly this kind of
downstream curation application (kinesumer.go:346-370, README.md:67-70).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesumer_spark.catalog import read_table
from kinesumer_spark.operators.dedup import (
    _minhash_cte,
    _sha32,
    _sha32_duck,
    _shingles_raw,
    minhash_band_keys,
    minhash_pairs_df,
    shingle_sets,
)
from kinesumer_spark.operators.text import (
    _DSIR_B,
    _EVAL_MOD,
    _FUZZY_EVAL_MOD,
    _FUZZY_J,
    dsir_model_cte,
    dsir_model_df,
    _GOPHER_MIN_ALPHA,
    _GOPHER_MIN_STOP,
    _GOPHER_MWL_HI,
    _GOPHER_MWL_LO,
    _GOPHER_WC_HI,
    _GOPHER_WC_LO,
    _sql_array,
    _STOPLISTS,
    text_gopher_rules,
)
from kinesumer_spark.operators.training_prep import (
    _BLOCK,
    _SEQ_LEN,
    _TMIX_D,
    block_running_offset,
    temperature_copies_duck,
    temperature_copies_spark,
    temperature_plan_cte,
    temperature_plan_df,
)
from kinesumer_spark.registry import register

_LM_DROP = 50  # documents cut at the LM-selection stage (bottom mean_prob)

_PIPE_ORACLE = f"""
WITH g AS (
  SELECT d.doc_id, d.lang, d.text,
         len(regexp_split_to_array(d.text, ' ')) AS n_words,
         len(replace(d.text, ' ', ''))
           / CAST(len(regexp_split_to_array(d.text, ' ')) AS DOUBLE)
           AS mean_word_len,
         len(list_filter({_sql_array(_STOPLISTS["en"])},
             s -> list_contains(regexp_split_to_array(d.text, ' '), s)))
           AS n_stop_distinct,
         len(list_filter(regexp_split_to_array(d.text, ' '),
             w -> regexp_matches(w, '^[a-z]+$')))
           / CAST(len(regexp_split_to_array(d.text, ' ')) AS DOUBLE)
           AS alpha_frac
  FROM documents d
), kept1 AS (
  SELECT doc_id, lang, text FROM g
  WHERE n_words BETWEEN {_GOPHER_WC_LO} AND {_GOPHER_WC_HI}
    AND mean_word_len BETWEEN {_GOPHER_MWL_LO} AND {_GOPHER_MWL_HI}
    AND n_stop_distinct >= {_GOPHER_MIN_STOP}
    AND alpha_frac >= {_GOPHER_MIN_ALPHA}
), kept_exact AS (
  SELECT doc_id, lang, text
  FROM (SELECT doc_id, lang, text,
               doc_id = MIN(doc_id) OVER (PARTITION BY sha256(text))
                 AS is_canonical
        FROM kept1)
  WHERE is_canonical
), {_minhash_cte(src="kept_exact")}, nd_drop AS (
  SELECT DISTINCT p.doc_b AS doc_id
  FROM p JOIN cand c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
  WHERE round(shared / CAST(na + nb - shared AS DOUBLE), 6) >= 0.5
), kept_nd AS (
  SELECT doc_id, text FROM kept_exact
  WHERE doc_id NOT IN (SELECT doc_id FROM nd_drop)
), tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM kept_nd
), wc AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY word) AS c_w FROM tok
), per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(c_w) AS BIGINT) AS sum_count
  FROM wc GROUP BY doc_id
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_corpus FROM per_doc
), scored AS (
  SELECT doc_id, n_tokens,
         CAST(sum_count AS DOUBLE) / CAST(n_tokens * n_corpus AS DOUBLE)
           AS mean_prob
  FROM per_doc CROSS JOIN tot
), dropset AS (
  SELECT doc_id FROM scored ORDER BY mean_prob ASC, doc_id LIMIT {_LM_DROP}
), final AS (
  SELECT doc_id, n_tokens FROM scored
  WHERE doc_id NOT IN (SELECT doc_id FROM dropset)
)
SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_input,
       CAST((SELECT COUNT(*) FROM kept1) AS BIGINT) AS n_after_gate,
       CAST((SELECT COUNT(*) FROM kept_exact) AS BIGINT) AS n_after_exact,
       CAST((SELECT COUNT(*) FROM kept_nd) AS BIGINT) AS n_after_neardup,
       CAST((SELECT COUNT(*) FROM final) AS BIGINT) AS n_final,
       CAST((SELECT SUM(n_tokens) FROM final) AS BIGINT) AS tokens_final,
       CAST((SELECT SUM(doc_id) FROM final) AS BIGINT) AS docid_checksum
"""


@register(
    "pipeline_pretraining_curation_neardup",
    oracle=_PIPE_ORACLE,
    tags=("pipeline", "dedup", "text", "quality", "approx"),
)
def pipeline_pretraining_curation_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The composed curation dataflow (module docstring): Gopher gate →
    exact dedup canonical keep → MinHash/LSH near-dup survivor filter →
    LM-selection cut (bottom-50 mean_prob over the surviving corpus) →
    one-row summary with per-stage survivor counts, the final corpus
    token mass, and an exact doc-id checksum. Extends the r6/r7 chain
    with the near-dup tier between exact dedup and the LM cut (r7
    verdict #5) — the gate stage REUSES the registered
    text_gopher_rules plan, the near-dup tier REUSES minhash_pairs_df
    (dedup_minhash_lsh's exact code path) over the deduped corpus, and
    the LM statistics are re-derived over the near-dup survivors
    (selection must follow the surviving distribution — scoring against
    full-corpus counts is a subtle, common curation bug this
    composition pins)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    kept_ids = text_gopher_rules(spark, sf_dir).filter("keep").select("doc_id")
    kept1 = docs.join(kept_ids, "doc_id")

    # exact dedup, canonical keep — materialized once: the near-dup tier
    # reads it twice (signatures + verify sets), the survivor filter and
    # the stage count once more
    kept_exact = (
        kept1.withColumn(
            "is_canonical",
            F.col("doc_id")
            == F.min("doc_id").over(
                W.partitionBy(F.sha2(F.col("text").cast("binary"), 256))
            ),
        )
        .filter("is_canonical")
        .select("doc_id", "lang", "text")
        .localCheckpoint(eager=False)
    )

    # near-dup tier: the registered LSH pipeline over the deduped corpus;
    # of each verified pair (doc_a < doc_b) the larger id drops. The drop
    # set is pair-bounded — broadcast back as an anti-join
    nd_drop = minhash_pairs_df(kept_exact).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    kept_nd = kept_exact.join(
        F.broadcast(nd_drop), "doc_id", "left_anti"
    ).localCheckpoint(eager=False)

    tok = kept_nd.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    wc = tok.select(
        "doc_id", F.count(F.lit(1)).over(W.partitionBy("word")).alias("c_w")
    )
    per_doc = (
        wc.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("c_w").cast("bigint").alias("sum_count"),
        )
        .localCheckpoint(eager=False)
    )
    tot = per_doc.agg(F.sum("n_tokens").cast("bigint").alias("n_corpus"))
    scored = per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_tokens",
        (
            F.col("sum_count").cast("double")
            / (F.col("n_tokens") * F.col("n_corpus")).cast("double")
        ).alias("mean_prob"),
    )
    dropset = scored.orderBy("mean_prob", "doc_id").limit(_LM_DROP).select("doc_id")
    final = scored.join(F.broadcast(dropset), "doc_id", "left_anti").select(
        "doc_id", "n_tokens"
    )
    stats = final.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_final"),
        F.sum("n_tokens").cast("bigint").alias("tokens_final"),
        F.sum("doc_id").cast("bigint").alias("docid_checksum"),
    )

    def _cnt(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias(name))

    return (
        _cnt(docs, "n_input")
        .crossJoin(F.broadcast(_cnt(kept_ids, "n_after_gate")))
        .crossJoin(F.broadcast(_cnt(kept_exact, "n_after_exact")))
        .crossJoin(F.broadcast(_cnt(kept_nd, "n_after_neardup")))
        .crossJoin(F.broadcast(stats))
        .select(
            "n_input",
            "n_after_gate",
            "n_after_exact",
            "n_after_neardup",
            "n_final",
            "tokens_final",
            "docid_checksum",
        )
    )


# -- Embedding-side curation pipeline ----------------------------------------

_EMB_DEGEN = 10_000_000_000  # ‖v‖² < 0.01 in 10⁻¹² quantized units

_EMB_PIPE_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
), exn AS (  -- norm quantization (no offset)
  SELECT vec_id, CAST(SUM(q * q) AS HUGEINT) AS n2q FROM (
    SELECT vec_id, CAST(floor(e[d.dim + 1] * 1000000) AS BIGINT) AS q
    FROM v CROSS JOIN (SELECT unnest(range(64)) AS dim) d
  ) GROUP BY vec_id
), gated AS (
  SELECT v.vec_id, v.label, v.e FROM v JOIN exn USING (vec_id)
  WHERE exn.n2q >= {_EMB_DEGEN}
), exc AS (  -- centroid quantization (+2 offset, non-negative division)
  SELECT vec_id, label, d.dim,
         CAST(floor((e[d.dim + 1] + 2) * 1000000) AS BIGINT) AS q
  FROM gated CROSS JOIN (SELECT unnest(range(64)) AS dim) d
), cent AS (
  SELECT label AS cand, dim, CAST(SUM(q) // COUNT(*) AS BIGINT) AS c
  FROM exc GROUP BY label, dim
), dist AS (
  SELECT x.vec_id, x.label, ct.cand,
         SUM((x.q - ct.c) * (x.q - ct.c)) AS d2
  FROM exc x JOIN cent ct ON ct.dim = x.dim
  GROUP BY x.vec_id, x.label, ct.cand
), assigned AS (
  SELECT vec_id, label, cand FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cand) AS rn
    FROM dist) WHERE rn = 1
), disposition AS (
  SELECT v.vec_id,
         CASE WHEN g.vec_id IS NULL THEN 'degenerate'
              WHEN a.cand <> a.label THEN 'mislabel'
              ELSE 'keep' END AS disposition
  FROM v LEFT JOIN gated g ON g.vec_id = v.vec_id
  LEFT JOIN assigned a ON a.vec_id = v.vec_id
)
SELECT CASE WHEN vec_id % 10 <= 7 THEN 'train'
            WHEN vec_id % 10 = 8 THEN 'val' ELSE 'test' END AS split,
       disposition,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(vec_id) AS BIGINT) AS id_checksum
FROM disposition
GROUP BY split, disposition
ORDER BY split, disposition
"""


@register(
    "pipeline_embedding_curation",
    oracle=_EMB_PIPE_ORACLE,
    tags=("pipeline", "similarity", "quality"),
)
def pipeline_embedding_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-side curation, composed:

        embeddings
          → norm health gate        (embedding_norm_audit's degenerate rule)
          → mislabel screen         (embedding_mislabel_audit's
                                     nearest-centroid rule, fitted on the
                                     GATED population — audit statistics
                                     must follow the surviving
                                     distribution, the pipeline_curation
                                     lesson)
          → deterministic split     (vec_id mod 10 → 8/1/1)
          → disposition ledger      (per-split keep/mislabel/degenerate
                                     counts + id checksum)

    The whole chain replays in one oracle — the third composed pipeline
    beside the document curation chain and the streaming ingest hop,
    proving the embedding operators compose as a dataflow, not just as
    standalone queries. All stages are the exact integer formulations
    of their standalone registrations; no float enters before the
    (absent) display layer. Scale: two posexplode aggregates + the
    broadcast-centroid assign join — everything corpus×k-bounded."""
    from kinesumer_spark.operators.similarity import _as_double

    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("e")
    )
    exn = (
        v.select("vec_id", F.posexplode("e").alias("dim", "val"))
        .select(
            "vec_id", F.floor(F.col("val") * 1000000).cast("bigint").alias("q")
        )
        .groupBy("vec_id")
        .agg(F.sum(F.expr("q * q")).cast("decimal(38,0)").alias("n2q"))
    )
    gated = v.join(
        exn.filter(F.col("n2q") >= _EMB_DEGEN).select("vec_id"), "vec_id"
    )
    exc = gated.select(
        "vec_id", "label", F.posexplode("e").alias("dim", "val")
    ).select(
        "vec_id",
        "label",
        "dim",
        F.floor((F.col("val") + 2) * 1000000).cast("bigint").alias("q"),
    )
    cent = exc.groupBy(F.col("label").alias("cand"), "dim").agg(
        F.expr("cast(sum(q) div count(*) AS bigint) AS c")
    )
    dist = (
        exc.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "cand")
        .agg(
            F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias(
                "d2"
            )
        )
    )
    w = W.partitionBy("vec_id").orderBy("d2", "cand")
    assigned = (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "cand")
    )
    disposition = (
        v.select("vec_id")
        .join(gated.select("vec_id", F.lit(1).alias("g")), "vec_id", "left")
        .join(assigned.select("vec_id", "label", "cand"), "vec_id", "left")
        .select(
            "vec_id",
            F.when(F.col("g").isNull(), "degenerate")
            .when(F.col("cand") != F.col("label"), "mislabel")
            .otherwise("keep")
            .alias("disposition"),
        )
    )
    split = (
        F.when(F.col("vec_id") % 10 <= 7, "train")
        .when(F.col("vec_id") % 10 == 8, "val")
        .otherwise("test")
    )
    return (
        disposition.select(split.alias("split"), "disposition", "vec_id")
        .groupBy("split", "disposition")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("vec_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("split", "disposition")
    )


# -- Selection-side pipeline: gate → DSIR target selection → mixture draw ----

_PMIX_D = 1_000_000  # mix-draw Bernoulli denominator
_PMIX_TARGET_CHARS = 300  # target-domain proxy: above-median-length docs
_PMIX_KEEP = 200  # DSIR selection budget (top-K by importance margin)

_PMIX_ORACLE = f"""
WITH g AS (
  SELECT d.doc_id, d.lang, d.text, d.n_chars,
         len(regexp_split_to_array(d.text, ' ')) AS n_words,
         len(replace(d.text, ' ', ''))
           / CAST(len(regexp_split_to_array(d.text, ' ')) AS DOUBLE)
           AS mean_word_len,
         len(list_filter({_sql_array(_STOPLISTS["en"])},
             s -> list_contains(regexp_split_to_array(d.text, ' '), s)))
           AS n_stop_distinct,
         len(list_filter(regexp_split_to_array(d.text, ' '),
             w -> regexp_matches(w, '^[a-z]+$')))
           / CAST(len(regexp_split_to_array(d.text, ' ')) AS DOUBLE)
           AS alpha_frac
  FROM documents d
), gated AS (
  SELECT doc_id, lang, text, n_chars FROM g
  WHERE n_words BETWEEN {_GOPHER_WC_LO} AND {_GOPHER_WC_HI}
    AND mean_word_len BETWEEN {_GOPHER_MWL_LO} AND {_GOPHER_MWL_HI}
    AND n_stop_distinct >= {_GOPHER_MIN_STOP}
    AND alpha_frac >= {_GOPHER_MIN_ALPHA}
), tok AS (
  SELECT doc_id, lang, n_chars >= {_PMIX_TARGET_CHARS} AS is_target,
         {_sha32_duck("unnest(regexp_split_to_array(text, ' '))")}
           % {_DSIR_B} AS bucket
  FROM gated
), {dsir_model_cte("tok", "is_target")}, scored AS (
  SELECT tok.doc_id, MAX(tok.lang) AS lang,
         SUM(m.m_t - m.m_r) AS dsir_score
  FROM tok JOIN m USING (bucket) GROUP BY tok.doc_id
), selected AS (
  SELECT doc_id, lang FROM scored
  ORDER BY dsir_score DESC, doc_id LIMIT {_PMIX_KEEP}
), {temperature_plan_cte("selected", "lang", "n_selected", _PMIX_D)}, drawn AS (
  SELECT s.lang, s.doc_id, t.n_selected, t.target_docs, t.threshold,
         {_sha32_duck("'pmix:' || doc_id")} % {_PMIX_D}
           < t.threshold AS keep
  FROM selected s JOIN thr t USING (lang)
), gate_n AS (
  SELECT lang, COUNT(*) AS n_gated FROM gated GROUP BY lang
)
SELECT d.lang,
       CAST(MAX(gn.n_gated) AS BIGINT) AS n_gated,
       CAST(MAX(d.n_selected) AS BIGINT) AS n_selected,
       CAST(MAX(d.target_docs) AS BIGINT) AS target_docs,
       CAST(MAX(d.threshold) AS BIGINT) AS threshold,
       CAST(SUM(CASE WHEN d.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN d.keep THEN d.doc_id ELSE 0 END) AS BIGINT)
         AS id_checksum
FROM drawn d JOIN gate_n gn USING (lang)
GROUP BY d.lang
ORDER BY d.lang
"""


@register(
    "pipeline_dsir_mixture",
    oracle=_PMIX_ORACLE,
    tags=("pipeline", "text", "training", "sample"),
)
def pipeline_dsir_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection-side pretraining pipeline, composed (the counterpart
    of the cleaning-side pipeline_pretraining_curation_neardup):

        documents
          → Gopher quality gate      (text_gopher_rules' keep rules)
          → DSIR target selection    (text_dsir_importance's
                                      hashed-unigram importance margin,
                                      fitted ON THE GATED corpus with
                                      above-median-length docs as the
                                      target-domain proxy; the top-200
                                      docs by importance margin survive
                                      — a RANKED budget, not a zero
                                      threshold: Laplace smoothing
                                      shrinks the smaller target table
                                      toward uniform harder than the
                                      raw table, so raw margins sit
                                      below zero corpus-wide and the
                                      selection knob is the budget)
          → temperature mixture draw (sample_temperature_draw's pure-
                                      int64 alpha=0.5 Bernoulli, rates
                                      planned from the SELECTED per-lang
                                      counts — mixture statistics must
                                      follow the surviving distribution,
                                      the standing pipeline lesson)
          → per-lang mixture ledger  (gated/selected/target/threshold/
                                      kept counts + kept-id checksum)

    Every stage is its standalone registration's exact semantics and
    the DuckDB oracle replays the entire chain, so a semantic drift in
    any stage reddens this driver row even if the standalone query
    still passes on its own slice of the data.

    Scale: gate and DSIR scoring are the shapes documented on their
    standalone registrations (map-side gate; a model of at most
    ``_DSIR_B`` = 4096 rows that
    broadcasts, token stream never shuffled by bucket); the mix plan
    is |langs| rows broadcast back; both draws are map-side hash
    compares. Nothing in the chain is corpus-all-pairs and the only
    full-cardinality shuffle keys are doc_id and lang."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    kept_ids = text_gopher_rules(spark, sf_dir).filter("keep").select("doc_id")
    # gated corpus read twice (model fit + scoring) and once for the
    # per-lang gate counts — materialize the slim projection once
    gated = docs.join(kept_ids, "doc_id").localCheckpoint(eager=False)

    tok = gated.select(
        "doc_id",
        "lang",
        (F.col("n_chars") >= _PMIX_TARGET_CHARS).alias("is_target"),
        F.explode(F.split("text", " ")).alias("word"),
    ).select(
        "doc_id",
        "lang",
        "is_target",
        F.expr(f"{_sha32('word')} % {_DSIR_B}").alias("bucket"),
    )
    m = dsir_model_df(tok, F.col("is_target"))
    scored = (
        tok.join(F.broadcast(m), "bucket")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.sum(F.col("m_t") - F.col("m_r")).alias("dsir_score"),
        )
    )
    selected = (
        scored.orderBy(F.desc("dsir_score"), "doc_id")
        .limit(_PMIX_KEEP)
        .select("doc_id", "lang")
        .localCheckpoint(eager=False)
    )

    thr = temperature_plan_df(selected, "lang", "n_selected", _PMIX_D)
    salted = "concat('pmix:', cast(doc_id AS string))"
    drawn = (
        selected.join(F.broadcast(thr), "lang")
        .withColumn(
            "keep",
            F.expr(f"{_sha32(salted)} % {_PMIX_D} < threshold"),
        )
    )
    gate_n = gated.groupBy("lang").agg(F.count(F.lit(1)).alias("n_gated"))
    return (
        drawn.join(F.broadcast(gate_n), "lang")
        .groupBy("lang")
        .agg(
            F.max("n_gated").cast("bigint").alias("n_gated"),
            F.max("n_selected").cast("bigint").alias("n_selected"),
            F.max("target_docs").cast("bigint").alias("target_docs"),
            F.max("threshold").cast("bigint").alias("threshold"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("doc_id")).otherwise(0))
            .cast("bigint")
            .alias("id_checksum"),
        )
        .orderBy("lang")
    )


_PTM_ORACLE = f"""
WITH {temperature_plan_cte("documents", "lang", "n_docs", _TMIX_D)}, tok AS (
  SELECT doc_id, lang,
         CAST(len(regexp_split_to_array(text, ' ')) AS BIGINT) AS tokens
  FROM documents
), drawn AS (
  SELECT k.lang, k.doc_id, k.tokens, t.n_docs, t.target_docs,
         {temperature_copies_duck("'trep:' || doc_id", _TMIX_D)} AS n_copies
  FROM tok k JOIN thr t USING (lang)
), emitted AS (
  SELECT lang, doc_id, tokens, n_docs, target_docs,
         unnest(generate_series(1, CAST(n_copies AS INTEGER))) AS copy_no
  FROM drawn WHERE n_copies > 0
), packed AS (
  SELECT lang, doc_id, tokens, n_docs, target_docs, copy_no,
         SUM(tokens) OVER (ORDER BY copy_no, doc_id
                           ROWS UNBOUNDED PRECEDING) - tokens AS start_off
  FROM emitted
)
SELECT lang,
       CAST(MAX(n_docs) AS BIGINT) AS n_docs,
       CAST(MAX(target_docs) AS BIGINT) AS target_docs,
       CAST(COUNT(*) AS BIGINT) AS n_emitted,
       CAST(SUM(tokens) AS BIGINT) AS emitted_tokens,
       CAST(SUM(start_off // {_SEQ_LEN}
                + (start_off + tokens - 1) // {_SEQ_LEN}) AS BIGINT)
         AS chunk_checksum,
       CAST((SUM(SUM(tokens)) OVER () + {_SEQ_LEN} - 1) // {_SEQ_LEN}
            AS BIGINT) AS total_chunks
FROM packed
GROUP BY lang
ORDER BY lang
"""


@register(
    "pipeline_training_mix",
    oracle=_PTM_ORACLE,
    tags=("pipeline", "training", "sample", "pack"),
)
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temperature mixture carried through to PACKED training
    sequences — the composition the sampling operators exist for:

        documents
          → temperature plan       (resample_temperature's alpha=0.5
                                    arithmetic via the shared
                                    temperature_plan_df — one
                                    definition, Spark + oracle)
          → mixture emission       (sample_temperature_repeat's exact
                                    per-document draw via the shared
                                    temperature_copies helper, SAME
                                    'trep:' salt — the emission
                                    multiset IS the standalone
                                    operator's, bit for bit; the
                                    keep/drop "draw" stage is the
                                    base-0 case of the same formula,
                                    and running a separate keep-draw
                                    first would square the keep
                                    probability — the arithmetic fork
                                    the shared helper prevents)
          → sequence packing       (pack_sequences' concat-and-chunk
                                    layout over the emission stream in
                                    (copy_no, doc_id) order, so the
                                    copies of an upsampled document
                                    land one full corpus pass apart —
                                    interleaved, never clustered)
          → per-lang mixture ledger

    The ledger proves the end-to-end mixture: n_emitted vs target_docs
    (the mix realized per language), emitted token mass, a checksum
    over every emission's chunk span (Σ first_chunk + last_chunk —
    any change in packing ORDER moves offsets and reddens the hash,
    so copy interleaving is pinned, not just counted), and the global
    packed-sequence count each language contributes to. One whole-chain
    DuckDB oracle replays plan → draw → pack, so a semantic drift in
    any stage reddens this driver row even while the standalone
    queries stay green on their own slices.

    Scale: the plan is |langs| rows broadcast; emission is
    explode(sequence) with output ∝ the target corpus (irreducible);
    packing reuses pack_sequences' two-pass distributed prefix sum —
    per-(copy, block) totals, a window over the bounded block-summary
    relation only, broadcast back — never a global single-partition
    sort of the data. The only full-cardinality shuffle keys are
    (copy_no, block) and lang.

    Reference parity: the downstream training-data application the
    reference feeds (README.md:67-70), composed end to end."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("tokens"),
    )
    thr = temperature_plan_df(d, "lang", "n_docs", _TMIX_D)
    salted = "concat('trep:', cast(doc_id AS string))"
    drawn = d.join(F.broadcast(thr), "lang").selectExpr(
        "lang",
        "doc_id",
        "tokens",
        "n_docs",
        "target_docs",
        f"{temperature_copies_spark(salted, _TMIX_D)} AS n_copies",
    )
    emitted = drawn.filter("n_copies > 0").select(
        "lang",
        "doc_id",
        "tokens",
        "n_docs",
        "target_docs",
        F.explode(F.expr("sequence(1, n_copies)")).alias("copy_no"),
    )
    # materialize the emission once: the packing stage reads it twice
    # (block totals + the offset join), and without the truncation the
    # whole emission pipeline — corpus scan, broadcast plan join,
    # per-doc sha draw, copy explode — executes twice (r11 review; the
    # same double-execution pack_bins_greedy's kernel had)
    emitted = emitted.withColumn(
        "block", F.expr(f"doc_id div {_BLOCK}")
    ).localCheckpoint(eager=False)
    # pack_sequences' two-pass prefix sum via the SHARED helper, keyed
    # on the emission order (copy_no, doc_id)
    packed = block_running_offset(
        emitted, "tokens", "doc_id", ["copy_no", "block"], "start_off"
    ).selectExpr(
        "lang",
        "tokens",
        "n_docs",
        "target_docs",
        f"start_off div {_SEQ_LEN} AS first_chunk",
        f"(start_off + tokens - 1) div {_SEQ_LEN} AS last_chunk",
    )
    ledger = packed.groupBy("lang").agg(
        F.max("n_docs").cast("bigint").alias("n_docs"),
        F.max("target_docs").cast("bigint").alias("target_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_emitted"),
        F.sum("tokens").cast("bigint").alias("emitted_tokens"),
        F.sum(F.col("first_chunk") + F.col("last_chunk"))
        .cast("bigint")
        .alias("chunk_checksum"),
    )
    return ledger.withColumn(
        "total_chunks",
        F.expr(
            f"CAST((SUM(emitted_tokens) OVER () + {_SEQ_LEN} - 1)"
            f" DIV {_SEQ_LEN} AS BIGINT)"
        ),
    ).orderBy("lang")


# -- The full curation flagship: every screening tier carried to packing ----

_PFULL_KEEP = 100  # DSIR selection budget (a REAL cut at every gate SF)


def _duck_3gram_shingles(src: str) -> str:
    """DuckDB SELECT fragment: (doc_id, shingle) — DISTINCT-per-doc
    3-word shingles with the whole-text fallback for <3-word docs, the
    exact screen's shingle definition (text_decontaminate's)."""
    return f"""SELECT doc_id, unnest(
    CASE WHEN len(regexp_split_to_array(text, ' ')) >= 3 THEN
      list_distinct(list_transform(
        range(1, len(regexp_split_to_array(text, ' ')) - 1),
        i -> regexp_split_to_array(text, ' ')[i] || ' ' ||
             regexp_split_to_array(text, ' ')[i+1] || ' ' ||
             regexp_split_to_array(text, ' ')[i+2]))
    ELSE [text] END) AS shingle
  FROM {src}"""


# Stage CTEs are MATERIALIZED: the chain is deep (each stage filters the
# previous with a NOT IN), and letting DuckDB inline them re-evaluates
# the LSH tier once per downstream reference — measured minutes instead
# of ~2 s per SF. Materialization pins the per-stage evaluate-once
# semantics the Spark side's localCheckpoints give.
_PFULL_ORACLE = f"""
WITH g AS MATERIALIZED (
  SELECT d.doc_id, d.lang, d.text, d.n_chars,
         len(regexp_split_to_array(d.text, ' ')) AS n_words,
         len(replace(d.text, ' ', ''))
           / CAST(len(regexp_split_to_array(d.text, ' ')) AS DOUBLE)
           AS mean_word_len,
         len(list_filter({_sql_array(_STOPLISTS["en"])},
             s -> list_contains(regexp_split_to_array(d.text, ' '), s)))
           AS n_stop_distinct,
         len(list_filter(regexp_split_to_array(d.text, ' '),
             w -> regexp_matches(w, '^[a-z]+$')))
           / CAST(len(regexp_split_to_array(d.text, ' ')) AS DOUBLE)
           AS alpha_frac
  FROM documents d
  WHERE d.doc_id % {_FUZZY_EVAL_MOD} <> 0 AND d.doc_id % {_EVAL_MOD} <> 0
), kept1 AS MATERIALIZED (
  SELECT doc_id, lang, text, n_chars FROM g
  WHERE n_words BETWEEN {_GOPHER_WC_LO} AND {_GOPHER_WC_HI}
    AND mean_word_len BETWEEN {_GOPHER_MWL_LO} AND {_GOPHER_MWL_HI}
    AND n_stop_distinct >= {_GOPHER_MIN_STOP}
    AND alpha_frac >= {_GOPHER_MIN_ALPHA}
), kept_exact AS MATERIALIZED (
  SELECT doc_id, lang, text, n_chars
  FROM (SELECT doc_id, lang, text, n_chars,
               doc_id = MIN(doc_id) OVER (PARTITION BY sha256(text))
                 AS is_canonical
        FROM kept1)
  WHERE is_canonical
), ev7 AS MATERIALIZED (
  SELECT doc_id, lang, text FROM documents
  WHERE doc_id % {_FUZZY_EVAL_MOD} = 0
), nd_src AS MATERIALIZED (
  SELECT doc_id, lang, text FROM kept_exact
  UNION ALL SELECT doc_id, lang, text FROM ev7
), {_minhash_cte(src="nd_src")}, verified AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b
  FROM p JOIN cand c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
  WHERE round(shared / CAST(na + nb - shared AS DOUBLE), 6) >= {_FUZZY_J}
), nd_drop AS MATERIALIZED (
  SELECT DISTINCT doc_b AS doc_id FROM verified
  WHERE doc_a % {_FUZZY_EVAL_MOD} <> 0 AND doc_b % {_FUZZY_EVAL_MOD} <> 0
), kept_nd AS MATERIALIZED (
  SELECT doc_id, lang, text, n_chars FROM kept_exact
  WHERE doc_id NOT IN (SELECT doc_id FROM nd_drop)
), b97 AS MATERIALIZED (
  SELECT DISTINCT shingle FROM (
    {_duck_3gram_shingles(f"documents WHERE doc_id % {_EVAL_MOD} = 0")})
), dx_drop AS MATERIALIZED (
  SELECT DISTINCT k.doc_id
  FROM ({_duck_3gram_shingles("kept_nd")}) k
  JOIN b97 USING (shingle)
), kept_dx AS MATERIALIZED (
  SELECT doc_id, lang, text, n_chars FROM kept_nd
  WHERE doc_id NOT IN (SELECT doc_id FROM dx_drop)
), fz_drop AS MATERIALIZED (
  SELECT DISTINCT
    CASE WHEN doc_a % {_FUZZY_EVAL_MOD} = 0 THEN doc_b ELSE doc_a END AS doc_id
  FROM verified
  WHERE (doc_a % {_FUZZY_EVAL_MOD} = 0) <> (doc_b % {_FUZZY_EVAL_MOD} = 0)
), kept_fz AS MATERIALIZED (
  SELECT doc_id, lang, text, n_chars FROM kept_dx
  WHERE doc_id NOT IN (SELECT doc_id FROM fz_drop)
), ftok AS MATERIALIZED (
  SELECT doc_id, lang, n_chars >= {_PMIX_TARGET_CHARS} AS is_target,
         {_sha32_duck("unnest(regexp_split_to_array(text, ' '))")}
           % {_DSIR_B} AS bucket
  FROM kept_fz
), {dsir_model_cte("ftok", "is_target")}, fscored AS MATERIALIZED (
  SELECT ftok.doc_id, MAX(ftok.lang) AS lang,
         CAST(COUNT(*) AS BIGINT) AS tokens,
         SUM(m.m_t - m.m_r) AS dsir_score
  FROM ftok JOIN m USING (bucket) GROUP BY ftok.doc_id
), fsel AS MATERIALIZED (
  SELECT doc_id, lang, tokens FROM fscored
  ORDER BY dsir_score DESC, doc_id LIMIT {_PFULL_KEEP}
), {temperature_plan_cte("fsel", "lang", "n_docs", _TMIX_D)}, fdrawn AS MATERIALIZED (
  SELECT s.lang, s.doc_id, s.tokens,
         {temperature_copies_duck("'pfull:' || s.doc_id", _TMIX_D)} AS n_copies
  FROM fsel s JOIN thr t ON t.lang = s.lang
), femit AS MATERIALIZED (
  SELECT lang, doc_id, tokens,
         unnest(generate_series(1, CAST(n_copies AS INTEGER))) AS copy_no
  FROM fdrawn WHERE n_copies > 0
), fpacked AS MATERIALIZED (
  SELECT doc_id, tokens, copy_no,
         SUM(tokens) OVER (ORDER BY copy_no, doc_id
                           ROWS UNBOUNDED PRECEDING) - tokens AS start_off
  FROM femit
)
SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_input,
       CAST((SELECT COUNT(*) FROM g) AS BIGINT) AS n_corpus,
       CAST((SELECT COUNT(*) FROM kept1) AS BIGINT) AS n_gate,
       CAST((SELECT COUNT(*) FROM kept_exact) AS BIGINT) AS n_exact,
       CAST((SELECT COUNT(*) FROM kept_nd) AS BIGINT) AS n_neardup,
       CAST((SELECT COUNT(*) FROM kept_dx) AS BIGINT) AS n_decontam_exact,
       CAST((SELECT COUNT(*) FROM kept_fz) AS BIGINT) AS n_decontam_fuzzy,
       CAST((SELECT COUNT(*) FROM fsel) AS BIGINT) AS n_selected,
       CAST((SELECT SUM(doc_id) FROM fsel) AS BIGINT) AS sel_id_checksum,
       CAST((SELECT COUNT(*) FROM femit) AS BIGINT) AS n_emitted,
       CAST((SELECT SUM(tokens) FROM femit) AS BIGINT) AS emitted_tokens,
       CAST((SELECT SUM(start_off // {_SEQ_LEN}
                        + (start_off + tokens - 1) // {_SEQ_LEN})
             FROM fpacked) AS BIGINT) AS chunk_checksum,
       CAST((SELECT (SUM(tokens) + {_SEQ_LEN} - 1) // {_SEQ_LEN}
             FROM femit) AS BIGINT) AS total_chunks
"""


@register(
    "pipeline_training_full",
    oracle=_PFULL_ORACLE,
    tags=("pipeline", "dedup", "text", "quality", "training", "sample", "pack"),
)
def pipeline_training_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end training-data flagship — every screening tier the
    repo registers, composed into the one chain a real 100 TB curation
    run executes (r11 verdict #6):

        documents (minus the two benchmark stand-in slices)
          → Gopher quality gate        (text_gopher_rules' keep rules)
          → exact dedup, canonical keep (dedup_exact's sha256/min-id; this
                                        synthetic corpus has no byte-exact
                                        dupes, so the stage's drop count is
                                        0 BY DATA — the ledger still pins
                                        it, and dedup_exact's own row pins
                                        the semantics)
          → fuzzy near-dup filter      (dedup_minhash_lsh's symmetric tier
                                        via minhash_pairs_df; larger id of
                                        each verified pair drops)
          → exact decontamination      (text_decontaminate's 3-gram screen
                                        against the doc_id%97 eval slice:
                                        any shared 3-gram drops the doc)
          → fuzzy decontamination      (text_decontaminate_broadcast's
                                        ASYMMETRIC shape against the wider
                                        doc_id%7 slice — eval bands and
                                        shingle sets broadcast, verified
                                        Jaccard ≥ 0.5 drops the doc)
          → DSIR selection             (hashed-unigram importance margin
                                        fitted ON THE SURVIVORS, above-
                                        median-length docs as the target
                                        proxy; top-100 _PFULL_KEEP budget)
          → temperature mixture        (alpha=0.5 plan from the SELECTED
                                        per-lang counts; exact integer
                                        draw∪repeat emission, 'pfull:'
                                        salt)
          → sequence packing           (pack_sequences' two-pass prefix
                                        sum in (copy_no, doc_id) order)
          → one-row whole-chain ledger (per-stage survivor counts,
                                        selected-id checksum, emission
                                        count + token mass, chunk-span
                                        checksum, packed-sequence total)

    Until r12 these existed as four disjoint pipelines; this row pins
    the full composition, so a semantic drift in ANY stage — or in how
    two stages hand off (the statistics-follow-the-survivors rule at
    both the DSIR fit and the mixture plan) — reddens one driver row.
    Every stage is the registered operator's exact arithmetic via the
    shared helpers (minhash_pairs_df / minhash_band_keys / shingle_sets
    / dsir_model_df / temperature_plan_df / temperature_copies_spark /
    block_running_offset), so no fork is possible.

    Scale: each stage keeps its standalone registration's documented
    shape — map-side gate; digest-width dedup shuffle; banded LSH
    (signatures only, never all-pairs); both decontamination screens
    broadcast the fixed eval side so only corpus-keyed exchanges exist;
    a ≤4096-row DSIR model broadcast; a |langs|-row mix plan broadcast;
    the pack stage's wide ops are per-(copy, block) — never a global
    data-sized sort. Stages are localCheckpointed exactly where a
    DataFrame is consumed twice, so no corpus subtree re-executes
    (scan-counted in tests/test_plans.py). Reference parity: the full
    downstream curation application the reference feeds
    (kinesumer.go:346-370, README.md:67-70)."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    corpus0 = docs.filter(
        (F.col("doc_id") % _FUZZY_EVAL_MOD != 0)
        & (F.col("doc_id") % _EVAL_MOD != 0)
    )
    kept_ids = text_gopher_rules(spark, sf_dir).filter("keep").select("doc_id")
    kept1 = corpus0.join(kept_ids, "doc_id").localCheckpoint(eager=False)

    kept_exact = (
        kept1.withColumn(
            "is_canonical",
            F.col("doc_id")
            == F.min("doc_id").over(
                W.partitionBy(F.sha2(F.col("text").cast("binary"), 256))
            ),
        )
        .filter("is_canonical")
        .select("doc_id", "lang", "text", "n_chars")
        .localCheckpoint(eager=False)
    )

    # near-dup tier (symmetric, corpus-internal): larger id drops
    nd_drop = (
        minhash_pairs_df(kept_exact)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept_nd = kept_exact.join(
        F.broadcast(nd_drop), "doc_id", "left_anti"
    ).localCheckpoint(eager=False)

    # exact decontamination: any 3-gram shared with the %97 eval slice
    ev97 = docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
    banned = _shingles_raw(ev97).select("shingle").distinct()
    dx_drop = (
        _shingles_raw(kept_nd)
        .join(F.broadcast(banned), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    kept_dx = kept_nd.join(
        F.broadcast(dx_drop), "doc_id", "left_anti"
    ).localCheckpoint(eager=False)

    # fuzzy decontamination, the ASYMMETRIC broadcast-eval shape:
    # eval bands + eval shingle sets broadcast, corpus-only shuffles
    ev7 = docs.filter(F.col("doc_id") % _FUZZY_EVAL_MOD == 0)
    eval_bands = minhash_band_keys(ev7).withColumnRenamed("doc_id", "eval_id")
    fz_cand = (
        minhash_band_keys(kept_dx)
        .join(F.broadcast(eval_bands), ["lang", "band", "key1", "key2"])
        .select("doc_id", "eval_id")
        .distinct()
    )
    c_sets = shingle_sets(kept_dx).selectExpr("doc_id", "sh AS sh_c", "n AS nc")
    e_sets = shingle_sets(ev7).selectExpr(
        "doc_id AS eval_id", "sh AS sh_e", "n AS ne"
    )
    fz_drop = (
        fz_cand.join(c_sets, "doc_id")
        .join(F.broadcast(e_sets), "eval_id")
        .withColumn(
            "shared",
            F.expr("cast(size(array_intersect(sh_c, sh_e)) AS bigint)"),
        )
        .filter(
            F.round(
                F.col("shared")
                / (F.col("nc") + F.col("ne") - F.col("shared")).cast("double"),
                6,
            )
            >= _FUZZY_J
        )
        .select("doc_id")
        .distinct()
    )
    kept_fz = kept_dx.join(
        F.broadcast(fz_drop), "doc_id", "left_anti"
    ).localCheckpoint(eager=False)

    # DSIR selection, fitted on the survivors
    tok = kept_fz.select(
        "doc_id",
        "lang",
        (F.col("n_chars") >= _PMIX_TARGET_CHARS).alias("is_target"),
        F.explode(F.split("text", " ")).alias("word"),
    ).select(
        "doc_id",
        "lang",
        "is_target",
        F.expr(f"{_sha32('word')} % {_DSIR_B}").alias("bucket"),
    )
    m = dsir_model_df(tok, F.col("is_target"))
    fscored = (
        tok.join(F.broadcast(m), "bucket")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("tokens"),
            F.sum(F.col("m_t") - F.col("m_r")).alias("dsir_score"),
        )
    )
    fsel = (
        fscored.orderBy(F.desc("dsir_score"), "doc_id")
        .limit(_PFULL_KEEP)
        .select("doc_id", "lang", "tokens")
        .localCheckpoint(eager=False)
    )

    # temperature mixture: plan from the SELECTED per-lang counts, then
    # the exact integer draw∪repeat emission (shared copies helper)
    thr = temperature_plan_df(fsel, "lang", "n_docs", _TMIX_D)
    salted = "concat('pfull:', cast(doc_id AS string))"
    drawn = fsel.join(F.broadcast(thr), "lang").selectExpr(
        "lang",
        "doc_id",
        "tokens",
        f"{temperature_copies_spark(salted, _TMIX_D)} AS n_copies",
    )
    emitted = (
        drawn.filter("n_copies > 0")
        .select(
            "doc_id",
            "tokens",
            F.explode(F.expr("sequence(1, n_copies)")).alias("copy_no"),
        )
        .withColumn("block", F.expr(f"doc_id div {_BLOCK}"))
        .localCheckpoint(eager=False)
    )
    packed = block_running_offset(
        emitted, "tokens", "doc_id", ["copy_no", "block"], "start_off"
    ).selectExpr(
        "tokens",
        f"start_off div {_SEQ_LEN} AS first_chunk",
        f"(start_off + tokens - 1) div {_SEQ_LEN} AS last_chunk",
    )

    def _cnt(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias(name))

    sel_stats = fsel.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.sum("doc_id").cast("bigint").alias("sel_id_checksum"),
    )
    emit_stats = emitted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_emitted"),
        F.sum("tokens").cast("bigint").alias("emitted_tokens"),
    )
    pack_stats = packed.agg(
        F.sum(F.col("first_chunk") + F.col("last_chunk"))
        .cast("bigint")
        .alias("chunk_checksum"),
        F.expr(
            f"cast((sum(tokens) + {_SEQ_LEN} - 1) div {_SEQ_LEN} AS bigint)"
        ).alias("total_chunks"),
    )
    return (
        _cnt(docs, "n_input")
        .crossJoin(F.broadcast(_cnt(corpus0, "n_corpus")))
        .crossJoin(F.broadcast(_cnt(kept1, "n_gate")))
        .crossJoin(F.broadcast(_cnt(kept_exact, "n_exact")))
        .crossJoin(F.broadcast(_cnt(kept_nd, "n_neardup")))
        .crossJoin(F.broadcast(_cnt(kept_dx, "n_decontam_exact")))
        .crossJoin(F.broadcast(_cnt(kept_fz, "n_decontam_fuzzy")))
        .crossJoin(F.broadcast(sel_stats))
        .crossJoin(F.broadcast(emit_stats))
        .crossJoin(F.broadcast(pack_stats))
        .select(
            "n_input",
            "n_corpus",
            "n_gate",
            "n_exact",
            "n_neardup",
            "n_decontam_exact",
            "n_decontam_fuzzy",
            "n_selected",
            "sel_id_checksum",
            "n_emitted",
            "emitted_tokens",
            "chunk_checksum",
            "total_chunks",
        )
    )


# -- Cross-modal admission: text screens + embedding-space semantics ---------


def _multimodal_admission_oracle() -> str:
    from kinesumer_spark.operators.similarity import (
        _IVF_ANCHOR_BASE,
        _IVF_CELLS,
        _SEM_ASSIGN,
        _SEM_TAU,
    )

    return f"""
WITH {_minhash_cte()}, vp AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b
  FROM p JOIN cand c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
  WHERE round(shared / CAST(na + nb - shared AS DOUBLE), 6) >= 0.5
), ndh AS (
  SELECT doc_id, CAST(COUNT(DISTINCT partner) AS BIGINT) AS n_partners
  FROM (SELECT doc_a AS doc_id, doc_b AS partner FROM vp
        UNION ALL SELECT doc_b, doc_a FROM vp)
  GROUP BY doc_id
), gq AS (
  SELECT doc_id,
         (len(words) BETWEEN {_GOPHER_WC_LO} AND {_GOPHER_WC_HI})
           AND (len(replace(text, ' ', '')) / CAST(len(words) AS DOUBLE)
                  BETWEEN {_GOPHER_MWL_LO} AND {_GOPHER_MWL_HI})
           AND len(list_filter({_sql_array(_STOPLISTS["en"])},
                   st -> list_contains(words, st))) >= {_GOPHER_MIN_STOP}
           AND len(list_filter(words, x -> regexp_matches(x, '^[a-z]+$')))
                 / CAST(len(words) AS DOUBLE) >= {_GOPHER_MIN_ALPHA}
           AS quality_ok
  FROM (SELECT doc_id, text, regexp_split_to_array(text, ' ') AS words
        FROM documents WHERE doc_id % {_EVAL_MOD} <> 0)
), ds AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(words) >= 3 THEN
           list_transform(range(1, len(words) - 1),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
         ELSE [text] END) AS shingles
  FROM (SELECT doc_id, text, regexp_split_to_array(text, ' ') AS words
        FROM documents)
), dbanned AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM ds
  WHERE doc_id % {_EVAL_MOD} = 0
), dhit AS (
  SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_banned
  FROM (SELECT doc_id, unnest(shingles) AS shingle FROM ds
        WHERE doc_id % {_EVAL_MOD} <> 0) e
  JOIN dbanned b ON b.shingle = e.shingle
  GROUP BY e.doc_id
), ev AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), anch AS (
  SELECT vec_id - {_IVF_ANCHOR_BASE} AS cell, e AS ae FROM ev
  WHERE vec_id BETWEEN {_IVF_ANCHOR_BASE}
    AND {_IVF_ANCHOR_BASE + _IVF_CELLS - 1}
), cscored AS (
  SELECT ev.vec_id, anch.cell,
         list_dot_product(ev.e, anch.ae)
           / sqrt(list_dot_product(anch.ae, anch.ae)) AS d
  FROM ev CROSS JOIN anch
), asg AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d DESC, cell) AS rnk
  FROM cscored
  QUALIFY rnk <= {_SEM_ASSIGN}
), sem AS (
  SELECT x.vec_id,
         CAST(COUNT(DISTINCT CASE WHEN y.vec_id <> x.vec_id AND
           round(list_dot_product(xv.e, yv.e)
                 / (sqrt(list_dot_product(xv.e, xv.e))
                    * sqrt(list_dot_product(yv.e, yv.e))), 6) >= {_SEM_TAU}
           THEN y.vec_id END) AS BIGINT) AS n_semdups
  FROM asg x JOIN asg y ON x.cell = y.cell
  JOIN ev xv ON xv.vec_id = x.vec_id
  JOIN ev yv ON yv.vec_id = y.vec_id
  GROUP BY x.vec_id
)
SELECT g.doc_id,
       g.quality_ok,
       CAST(COALESCE(d.n_banned, 0) AS BIGINT) AS n_banned,
       CAST(COALESCE(n.n_partners, 0) AS BIGINT) AS n_partners,
       CAST(COALESCE(s.n_semdups, 0) AS BIGINT) AS n_semdups,
       CASE WHEN NOT g.quality_ok THEN 'reject_quality'
            WHEN COALESCE(d.n_banned, 0) >= 1 THEN 'reject_contaminated'
            WHEN COALESCE(n.n_partners, 0) >= 1 THEN 'reject_neardup'
            WHEN COALESCE(s.n_semdups, 0) >= 1 THEN 'reject_semdup'
            ELSE 'admit' END AS verdict
FROM gq g
LEFT JOIN dhit d ON d.doc_id = g.doc_id
LEFT JOIN ndh n ON n.doc_id = g.doc_id
LEFT JOIN sem s ON s.vec_id = g.doc_id
ORDER BY g.doc_id
"""


@register(
    "pipeline_admission_multimodal",
    oracle=_multimodal_admission_oracle(),
    tags=("pipeline", "text", "dedup", "similarity", "quality"),
)
def pipeline_admission_multimodal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CROSS-MODAL admission — the batch form of the full screen a
    curation team runs when documents carry BOTH text and an embedding:
    quality (Gopher), exact decontamination (banned benchmark 3-grams),
    text near-dup (the symmetric MinHash/LSH tier), and SEMANTIC
    near-dup in embedding space (the SemDeDup in-plan screen shared
    with stream_semantic_gate — one copy of the codebook/verify
    arithmetic), fused into one verdict with the cost-ordered
    precedence quality → contaminated → neardup → semdup → admit.
    Documents are linked to their vectors by doc_id = vec_id; a doc
    without an embedding simply skips the semantic screen (LEFT join,
    zero n_semdups) — exactly how a partially-embedded corpus behaves
    mid-backfill.

    Every screen is the registered operator's own arithmetic
    (minhash_pairs_df, the shared gopher constants, the
    semantic_inplan_verdicts helper), and the oracle replays all four
    INCLUDING the in-SQL cell assignment — hash-exact. Scale: each
    screen keeps its registration's shape (banded candidates, broadcast
    banned set, broadcast cell index, one corpus-keyed aggregate per
    screen); the verdict join is doc-keyed."""
    from kinesumer_spark.operators.similarity import _as_double
    from kinesumer_spark.streaming.queries import semantic_inplan_verdicts

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    ingested = docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
    stops = ", ".join(f"'{s}'" for s in _STOPLISTS["en"])
    quality = ingested.selectExpr(
        "doc_id",
        "split(text, ' ') AS w",
        "length(replace(text, ' ', '')) AS n_nonspace",
    ).selectExpr(
        "doc_id",
        f"""(size(w) BETWEEN {_GOPHER_WC_LO} AND {_GOPHER_WC_HI})
            AND (n_nonspace / cast(size(w) AS double)
                   BETWEEN {_GOPHER_MWL_LO} AND {_GOPHER_MWL_HI})
            AND size(filter(array({stops}), st -> array_contains(w, st)))
                  >= {_GOPHER_MIN_STOP}
            AND size(filter(w, x -> x rlike '^[a-z]+$'))
                  / cast(size(w) AS double) >= {_GOPHER_MIN_ALPHA}
            AS quality_ok""",
    )
    banned = (
        _shingles_raw(docs.filter(F.col("doc_id") % _EVAL_MOD == 0))
        .select("shingle")
        .distinct()
    )
    contam = (
        _shingles_raw(ingested)
        .select("doc_id", "shingle")
        .distinct()
        .join(F.broadcast(banned), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_banned"))
    )
    pairs = minhash_pairs_df(docs).select("doc_a", "doc_b")
    neardup = (
        pairs.selectExpr("doc_a AS doc_id", "doc_b AS partner")
        .unionByName(
            pairs.selectExpr("doc_b AS doc_id", "doc_a AS partner")
        )
        .groupBy("doc_id")
        .agg(
            F.expr("cast(count(DISTINCT partner) AS bigint) AS n_partners")
        )
    )
    emb = read_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", _as_double("embedding").alias("e"))
    # fan the probe side out past the single-split scan bound — the
    # per-pair verify otherwise runs in ONE task (the streaming gate's
    # microbatch fan-out, batch form: 36 -> 12.5 s at sf0.1)
    probe = emb.repartition(spark.sparkContext.defaultParallelism)
    sem = semantic_inplan_verdicts(v, probe).selectExpr(
        "vec_id AS doc_id", "n_dups AS n_semdups"
    )
    return (
        quality.join(F.broadcast(contam), "doc_id", "left")
        .join(F.broadcast(neardup), "doc_id", "left")
        .join(F.broadcast(sem), "doc_id", "left")
        .selectExpr(
            "doc_id",
            "quality_ok",
            "CAST(COALESCE(n_banned, 0) AS bigint) AS n_banned",
            "CAST(COALESCE(n_partners, 0) AS bigint) AS n_partners",
            "CAST(COALESCE(n_semdups, 0) AS bigint) AS n_semdups",
            """CASE WHEN NOT quality_ok THEN 'reject_quality'
                    WHEN COALESCE(n_banned, 0) >= 1
                      THEN 'reject_contaminated'
                    WHEN COALESCE(n_partners, 0) >= 1
                      THEN 'reject_neardup'
                    WHEN COALESCE(n_semdups, 0) >= 1
                      THEN 'reject_semdup'
                    ELSE 'admit' END AS verdict""",
        )
        .orderBy("doc_id")
    )
