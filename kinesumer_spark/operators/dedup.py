"""Deduplication operators for large-scale training-data pipelines.

Four tiers, all batch-first over the `documents` table:

- ``dedup_exact``       — content-hash (sha256) grouping. Oracle-checked.
- ``dedup_ngram_jaccard`` — exact 3-word-shingle Jaccard pairs via a
  purely relational formulation (explode → self-join → count). Oracle-
  checked; also serves as ground truth for the approximate tiers.
- ``dedup_minhash_lsh`` — MinHash signatures (64 permutations) + LSH
  banding (16 bands × 4 rows) + exact-Jaccard verification of candidate
  pairs. Built ENTIRELY from portable deterministic arithmetic
  (sha256-prefix hashes, modular folds), so a generated DuckDB oracle
  replays the whole pipeline and the driver hash-checks the output.
- ``dedup_simhash``     — 32-bit SimHash + banded Hamming-distance
  candidate generation. Same portability: full generated oracle.

Scale design (100 TB of documents):
- exact: map-side sha256 then hash-shuffle on the 32-byte digest —
  minimal width, no text movement; keeper = min(doc_id) per digest.
- ngram-exact: the shingle explode multiplies data ~L×; at scale this
  tier is for *verification of candidates only* (as minhash does here),
  never run all-pairs. The relational form shuffles (shingle → pairs),
  so hot shingles are salted away by blocking keys (lang here).
- minhash: signatures are fixed-size (32×8 B) regardless of doc length;
  banding turns all-pairs O(n²) into per-bucket joins. Buckets are the
  skew risk → AQE skew-join + the band index in the key spreads them.
- Every stage is built-in columnar expressions (sha2/conv/pmod/least/
  aggregate) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import fan_out, read_table
from kinesumer_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

_EXACT_ORACLE = """
SELECT doc_id,
       sha256(text) AS content_hash,
       (doc_id = MIN(doc_id) OVER (PARTITION BY sha256(text))) AS is_canonical,
       COUNT(*) OVER (PARTITION BY sha256(text)) AS n_copies
FROM documents
ORDER BY doc_id
"""


@register("dedup_exact", oracle=_EXACT_ORACLE, tags=("dedup",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: sha256(text) grouping, min-doc_id keeper."""
    d = _t(spark, sf_dir, "documents")
    h = F.sha2(F.col("text").cast("binary"), 256)
    from pyspark.sql import Window as W

    w = W.partitionBy(h)
    return (
        d.select(
            "doc_id",
            h.alias("content_hash"),
            (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
            F.count("*").over(w).alias("n_copies"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# shingles (shared by the exact-Jaccard and MinHash tiers)
# --------------------------------------------------------------------------


def _shingles_raw(d: DataFrame) -> DataFrame:
    """(doc_id, lang, shingle) — 3-word shingles WITH duplicates,
    generated entirely MAP-SIDE.

    Overlapping shingles come from one regexp pass: a lookahead capture
    anchored at each word start (``(?:^| )(?=(\\S+ \\S+ \\S+))``) —
    the zero-width lookahead lets matches overlap, which neither split
    nor a plain global match can express. This replaces two earlier
    formulations that both paid a full shuffle of the exploded words
    (posexplode + window lead) or ran on the interpreted expression
    path (transform-lambda, 3× pipeline cost — SCALE.md): regexp +
    explode is whole-stage-codegen'd and keeps shingle generation
    shuffle-free, so the ONLY shuffle in a shingle consumer is its own
    groupBy(doc_id). Multiset-equality with the window formulation is
    asserted in tests. Docs with <3 words (no shingle match) contribute
    their whole text (union branch). Words are single-space separated
    in this corpus; a tokenizer change must update both the regex and
    the split-based consumers together.
    """
    arr = F.expr(r"regexp_extract_all(text, '(?:^| )(?=(\\S+ \\S+ \\S+))', 1)")
    with_arr = d.select("doc_id", "lang", "text", arr.alias("sh_arr"))
    tri = with_arr.filter(F.size("sh_arr") >= 1).select(
        "doc_id", "lang", F.explode("sh_arr").alias("shingle")
    )
    short = with_arr.filter(F.size("sh_arr") < 1).select(
        "doc_id", "lang", F.col("text").alias("shingle")
    )
    return tri.unionByName(short)


def _shingles(d: DataFrame) -> DataFrame:
    """(doc_id, lang, shingle, n_shingles) — DISTINCT shingles with the
    per-doc set size (the exact-Jaccard path's input)."""
    from pyspark.sql import Window as W

    per_doc = W.partitionBy("doc_id")
    return (
        _shingles_raw(d)
        .distinct()
        .withColumn("n_shingles", F.count("*").over(per_doc).cast("bigint"))
        .select("doc_id", "lang", "n_shingles", "shingle")
    )


def _verified_pairs(shingled: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard pairs from an exploded shingle table (relational:
    shared-count via self-join on shingle, |A∪B| = nA + nB - shared)."""
    a = shingled.alias("a")
    b = shingled.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count("*").alias("shared"),
            F.first("a.n_shingles").alias("na"),
            F.first("b.n_shingles").alias("nb"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("na") + F.col("nb") - F.col("shared")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard", "shared")
    )


_NGRAM_ORACLE = """
WITH w AS (
  SELECT doc_id, lang, regexp_split_to_array(text, ' ') AS words FROM documents
), s AS (
  SELECT doc_id, lang,
         CASE WHEN len(words) >= 3 THEN
           list_distinct(list_transform(range(1, len(words) - 1),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM w
), e AS (
  SELECT doc_id, lang, len(shingles) AS n, unnest(shingles) AS shingle FROM s
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         COUNT(*) AS shared, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM e a JOIN e b
    ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(shared / CAST(na + nb - shared AS DOUBLE), 6) AS jaccard,
       shared
FROM p
WHERE round(shared / CAST(na + nb - shared AS DOUBLE), 6) >= 0.5
ORDER BY doc_a, doc_b
"""


@register("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE, tags=("dedup",))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5), relational."""
    d = _t(spark, sf_dir, "documents")
    return _verified_pairs(_shingles(d), 0.5).orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

_P32 = 4_294_967_311  # smallest prime > 2^32: the permutation modulus
_N_HASHES = 64
_BANDS = 16
_ROWS_PER_BAND = _N_HASHES // _BANDS
# Deterministic coefficients for h_i(x) = (a_i·x + b_i) mod p. a_i is
# capped below 2^30 so a·h (h < 2^32) stays inside int64; it must be
# large enough that a·h wraps p many times — a tiny a would make the
# "permutation" monotone in h and collapse every minhash position onto
# the same argmin shingle.
_COEF = [
    ((2654435761 * i) % (1 << 30) | 1, (40503 * i * i + 97) % (1 << 30))
    for i in range(1, _N_HASHES + 1)
]

# Band keys: polynomial fold of the band's r min values, TWO independent
# components (different multiplier/modulus) joined together — effective
# key space ~Q1·Q2 ≈ 10¹⁸, same collision regime as the previous single
# xxhash64 key, but expressible IDENTICALLY in any SQL engine (the whole
# point: xxhash64 exists only in Spark, so the old key locked the oracle
# out of the banding stage). Overflow-safe by construction: k < Q < 2³⁰,
# k·M < 2³⁰·2³² = 2⁶² and +h < 2⁶²+2³² — inside int64 in Spark (which
# would wrap silently) AND DuckDB (which would raise).
_FOLD = ((4_294_967_311, 1_000_000_007), (2_654_435_761, 999_999_937))


def _sha32(col: str) -> str:
    """SQL: first 4 bytes of sha256(col) as an unsigned 32-bit integer —
    the portable shingle/word hash (sha256 is byte-identical in every
    engine; crc32/xxhash64 are Spark-only)."""
    return (
        f"cast(conv(substring(sha2(cast({col} as binary), 256), 1, 8), 16, 10)"
        " as bigint)"
    )


def _sha32_duck(col: str) -> str:
    """DuckDB spelling of ``_sha32`` (hex-literal cast instead of conv)."""
    return f"('0x' || substr(sha256({col}), 1, 8))::BIGINT"


def _fold_expr(terms: list[str], mult: int, mod: int) -> str:
    """SQL: polynomial fold ``((…(t0%Q)·M+t1)%Q…)`` — engine-neutral.
    Every intermediate is reduced mod Q (< 2³⁰) BEFORE the next multiply,
    so the running product never exceeds 2⁶² (see ``_FOLD``)."""
    k = f"(({terms[0]}) % {mod})"
    for t in terms[1:]:
        k = f"((({k}) * {mult} + {t}) % {mod})"
    return k


# ---- generated DuckDB oracle: the ENTIRE LSH pipeline, re-expressed ----
# Every stage is deterministic integer arithmetic over sha256 prefixes,
# so the oracle replays signatures → band keys → buckets → candidates →
# exact verify bit-for-bit and the driver hash-compares the final pair
# set. (This is what rows-only status bought nothing over: approximate
# RECALL does not mean irreproducible OUTPUT.)
def _shingle_base_cte(src: str = "documents") -> str:
    """CTE prefix ``w → s → e``: ``src`` → word arrays → per-doc shingle
    lists (3-word, whole-text fallback) → exploded DISTINCT shingles
    with the per-doc set size. The oracle-side twin of
    :func:`_shingles`; factored out of :func:`_minhash_cte` (r13) so
    non-LSH shingle consumers (n-gram novelty) replay the identical
    shingle definition instead of re-deriving it."""
    return f"""w AS (
  SELECT doc_id, lang, regexp_split_to_array(text, ' ') AS words FROM {src}
), s AS (
  SELECT doc_id, lang,
         CASE WHEN len(words) >= 3 THEN
           list_transform(range(1, len(words) - 1),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM w
), e AS (
  SELECT doc_id, lang, len(list_distinct(shingles)) AS n,
         unnest(list_distinct(shingles)) AS shingle
  FROM s
)"""


def _minhash_cte(src: str = "documents") -> str:
    """Shared CTE chain: ``src`` → shingles → signatures → band keys →
    candidates → exact-verify stats (``p``). Consumed by the pair oracle
    and, extended with a recursive walk, by the LSH clusters oracle;
    ``src`` lets composed pipelines run the identical tier over a
    FILTERED corpus CTE (must expose doc_id, lang, text)."""
    h = _sha32_duck("shingle")
    mins = ",\n         ".join(
        f"min(({a} * h + {b}) % {_P32}) AS h{i}" for i, (a, b) in enumerate(_COEF)
    )
    band_rows = []
    for i in range(_BANDS):
        cols = [f"h{i * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)]
        k1 = _fold_expr(cols, *_FOLD[0])
        k2 = _fold_expr(cols, *_FOLD[1])
        band_rows.append(
            f"SELECT doc_id, lang, {i} AS band, {k1} AS key1, {k2} AS key2 FROM sig"
        )
    bands = "\n  UNION ALL ".join(band_rows)
    return f"""{_shingle_base_cte(src)}, t AS (
  SELECT doc_id, lang, unnest(shingles) AS shingle FROM s
), hh AS (
  SELECT doc_id, lang, {h} AS h FROM t
), sig AS (
  SELECT doc_id, lang,
         {mins}
  FROM hh GROUP BY doc_id, lang
), bands AS (
  {bands}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.lang = b.lang AND a.band = b.band
   AND a.key1 = b.key1 AND a.key2 = b.key2 AND a.doc_id < b.doc_id
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         COUNT(*) AS shared, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM e a JOIN e b
    ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_minhash_cte()}
SELECT p.doc_a, p.doc_b,
       round(shared / CAST(na + nb - shared AS DOUBLE), 6) AS jaccard,
       shared
FROM p JOIN cand c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
WHERE round(shared / CAST(na + nb - shared AS DOUBLE), 6) >= 0.5
ORDER BY p.doc_a, p.doc_b
"""


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16×4) candidate generation, exact-Jaccard verify.

    Pipeline: shingles → signatures (fixed 64×8B per doc) → band keys →
    per-(lang, band, key) bucket grouping → in-bucket pair expansion →
    candidate pairs → verify with the exact relational Jaccard (≥0.5) →
    (doc_a, doc_b, jaccard, shared).
    With b=16, r=4: P(candidate) = 1-(1-j⁴)¹⁶ ≈ 0.9998 at j=0.8.

    ORACLE-EXACT despite being "approximate": every stage — sha256-prefix
    shingle hash, affine permutations mod p, polynomial-fold band keys,
    bucket pair expansion, exact-Jaccard verify — is deterministic
    integer arithmetic an ANSI engine can replay bit-for-bit, so the
    generated DuckDB oracle reproduces the exact candidate set and the
    driver hash-checks the full output (approximate recall ≠
    irreproducible output). This is why the hash family is sha256-prefix
    (byte-identical everywhere) rather than Spark-private crc32/xxhash64
    or murmur-seeded ml.feature.MinHashLSH, and why band keys are modular
    folds instead of xxhash64.

    Structure choices (all measured at sf0.1):
    - Candidates come from ONE shuffle: groupBy(lang, band, key) +
      collect_list(doc_id), then in-bucket pair expansion via a slice of
      the sorted id list — replacing the earlier two-sided self-join on
      band keys (two shuffles of the band table + join). A hot bucket of
      B docs still expands to B²/2 pairs, exactly as the self-join did;
      band specificity (r=4 mins folded into a ~10¹⁸ key) keeps B small.
    - The two per-doc aggregates stay SEPARATE, deliberately: the
      signature branch is a codegen'd HashAggregate over 64 min columns,
      the verify branch an ObjectHashAggregate over collect_set only.
      Fusing them (or checkpointing the fused row) forces the 64 min
      expressions onto ObjectHashAggregate's interpreted path — measured
      2× slower than the two pruned recomputes, and a session-lifetime
      cache leak besides. At 100 TB the fat intermediate would spill
      anyway: the two narrow recomputes shuffle fewer bytes.
    - Hot expression blocks are built as single SQL strings (F.expr /
      selectExpr): constructing 64 min-aggs + 16 band structs as Column
      objects costs ~600 py4j round trips ≈ 1.5 s of driver latency per
      build; one parse-on-the-JVM string costs none of that.
    - Min over the hash MULTISET equals min over the set (duplicates
      can't lower a minimum), so signatures need no distinct.
    - The shingle regexp + sha256 chain runs in the scan stage, so on a
      single-split input both per-doc branches are single-threaded. A
      gated fan_out here was tried in r17 and REVERTED: with BOTH
      branches re-executing the exchange (bands + sets each pay the
      text shuffle), four independent interleaved A/B sessions read
      0.79-0.86x — the added exchanges outweigh the parallelism at this
      chain weight. Single-consumer or much heavier chains (CDC
      chunkers, the DSIR bigram features, q1) keep their fan_out.
    """
    return minhash_pairs_df(_t(spark, sf_dir, "documents"))


def minhash_band_keys(d: DataFrame) -> DataFrame:
    """(doc_id, lang, band, key1, key2) — the LSH banding stage alone:
    shingles → 64 minhash positions → 16 two-fold band keys. Extracted
    from :func:`minhash_pairs_df` (r12) so ASYMMETRIC consumers — a tiny
    fixed eval set banded separately from the corpus and broadcast into
    the candidate join (text_decontaminate_broadcast) — reuse the exact
    tier instead of re-deriving it; the symmetric pair path calls this
    too, so the two forms cannot drift.

    band key = two independent polynomial folds of the band's r min
    values (~10¹⁸ key space, see _FOLD): at 10⁹ docs × 16 bands random
    collisions (≈ false candidates, later rejected by verify) stay
    negligible, where a single 32-bit key would already mix ~4 random
    docs per bucket — and unlike xxhash64 the folds are portable SQL.
    """
    tri = _shingles_raw(d).withColumn("h", F.expr(_sha32("shingle")))
    min_exprs = [
        F.expr(f"min(({a}L * h + {b}L) % {_P32}L) AS h{i}")
        for i, (a, b) in enumerate(_COEF)
    ]
    sig_rows = tri.groupBy("doc_id", "lang").agg(*min_exprs)

    band_structs = ", ".join(
        f"struct({i} AS band, {k1} AS key1, {k2} AS key2)"
        for i, k1, k2 in band_key_exprs()
    )
    return sig_rows.select(
        "doc_id", "lang", F.expr(f"explode(array({band_structs})) AS bk")
    ).select("doc_id", "lang", "bk.band", "bk.key1", "bk.key2")


def band_key_exprs() -> list[tuple[int, str, str]]:
    """``[(band, key1_sql, key2_sql)] × 16`` over signature columns
    ``h0..h63`` — THE band-fold formula, in exactly one place (r13,
    driver advice): :func:`minhash_band_keys` (batch groupBy form), the
    in-row streaming twins below, and any future banded consumer all
    assemble their band structs from this list, so a fold-constant or
    grouping change can never drift one copy."""
    out = []
    for i in range(_BANDS):
        cols = [f"h{i * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)]
        out.append((i, _fold_expr(cols, *_FOLD[0]), _fold_expr(cols, *_FOLD[1])))
    return out


def inrow_signatures(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, lang, sh_set, h0..h63[, *keep]) computed IN-ROW — the
    stateless twin of :func:`minhash_band_keys` + :func:`shingle_sets`
    for STREAMING consumers, where a pre-verdict groupBy is illegal
    (Structured Streaming cannot chain stateful aggregations). Each
    minhash position is ``array_min`` over the doc's own hashed
    distinct-shingle array: min over the distinct set equals min over
    the multiset equals the batch tier's ``min()`` aggregate, so the
    in-row arithmetic is bit-identical to ``minhash_band_keys`` and the
    two forms cannot disagree on a single band key.

    Formulation is the measured winner (SCALE.md r13): 64 separate
    ``array_min(transform(...))`` passes beat a single ``aggregate()``
    pass with a 64-field struct accumulator 3.7× (0.50 s vs 1.88 s over
    sf0.1 documents) — the per-element struct allocation dominates the
    saved lambda dispatches; both run on the interpreted HOF path, the
    documented price of statelessness. Hashing the distinct set (not
    the multiset) ties on this corpus and strictly shrinks the array.

    ``keep`` carries extra pre-computed columns (e.g. a quality boolean)
    through unchanged. One string-built selectExpr per stage — Column
    chains would cost ~hundreds of py4j round trips (minhash_pairs)."""
    arr = r"regexp_extract_all(text, '(?:^| )(?=(\\S+ \\S+ \\S+))', 1)"
    sh_hash = _sha32("s")
    min_exprs = [
        f"array_min(transform(hh, x -> ({a}L * x + {b}L) % {_P32}L)) AS h{i}"
        for i, (a, b) in enumerate(_COEF)
    ]
    return (
        df.selectExpr("doc_id", "lang", "text", f"{arr} AS sh_arr", *keep)
        .selectExpr(
            "doc_id",
            "lang",
            "array_distinct(CASE WHEN size(sh_arr) >= 1 THEN sh_arr"
            "  ELSE array(text) END) AS sh_set",
            *keep,
        )
        .selectExpr(
            "doc_id",
            "lang",
            "sh_set",
            f"transform(sh_set, s -> {sh_hash}) AS hh",
            *keep,
        )
        .selectExpr("doc_id", "lang", "sh_set", *min_exprs, *keep)
    )


def stream_inrow_band_probe(df: DataFrame, sentinel: bool = False) -> DataFrame:
    """(doc_id, lang, sh_set, band, key1, key2) — the in-row LSH probe
    rows for a (possibly streaming) DataFrame exposing (doc_id, lang,
    text): :func:`inrow_signatures` → 16 band structs → explode.
    Extracted r13 (driver advice) so stream_neardup_gate and
    pipeline_stream_admission share one copy of the probe chain.

    ``sentinel=True`` appends a 17th ``band = -1`` element per doc —
    probing a LEFT join against the band index, it guarantees every doc
    one surviving row, which lets a single source read feed both the
    probe and the every-doc-gets-a-verdict guarantee (r12 paid a second
    stream read + unionByName for that sentinel)."""
    band_structs = ", ".join(
        f"struct({i} AS band, {k1} AS key1, {k2} AS key2)"
        for i, k1, k2 in band_key_exprs()
    )
    elems = f"array({band_structs})"
    if sentinel:
        elems = (
            f"concat({elems}, array(struct(-1 AS band,"
            " CAST(NULL AS bigint) AS key1, CAST(NULL AS bigint) AS key2)))"
        )
    return (
        inrow_signatures(df)
        .selectExpr("doc_id", "lang", "sh_set", f"explode({elems}) AS bk")
        .select("doc_id", "lang", "sh_set", "bk.band", "bk.key1", "bk.key2")
    )


# Above this many corpus documents the gates drop their broadcast hints
# and pin the shuffled stream-static join instead: the broadcast sides
# (minhash_band_keys ≈ 16 rows/doc of bigints; shingle_sets ≈ the
# corpus' distinct-shingle text) grow linearly with the corpus, and an
# oversized explicit hint fails the job at the driver instead of
# degrading (r13, driver advice — SCALE.md records the bound). The
# over-cap branch hints SHUFFLE_HASH rather than merely dropping the
# broadcast hint: at a true over-cap corpus the index side exceeds
# spark.sql.autoBroadcastJoinThreshold anyway, so the planner would
# shuffle regardless — the explicit hint makes the cap-forced fixture
# variant (stream_neardup_gate_shuffled) execute the SAME physical
# shape at sf scale instead of being silently auto-broadcast back.
_STREAM_INDEX_BROADCAST_CAP = 100_000


def _maybe_broadcast(
    df: DataFrame, n_docs: int | None, cap: int = _STREAM_INDEX_BROADCAST_CAP
) -> DataFrame:
    """Size-gated probe-side hint: broadcast at-or-under ``cap`` corpus
    docs, SHUFFLE_HASH past it (the r14 degrade — see the cap note).
    When the size is UNKNOWN (``n_docs is None``) the planner is left
    free: pinning SHUFFLE_HASH there would force a non-spillable build
    side where the default sort-merge join could spill instead of OOM
    (r14 driver advice) — unknown is not over-cap."""
    if n_docs is None:
        return df
    if n_docs <= cap:
        return F.broadcast(df)
    return df.hint("shuffle_hash")


def stream_neardup_partners(
    stream: DataFrame,
    batch_docs: DataFrame,
    n_corpus_docs: int | None = None,
    threshold: float = 0.5,
    broadcast_cap: int = _STREAM_INDEX_BROADCAST_CAP,
    index: DataFrame | None = None,
    corpus_sets: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, corpus_id, jaccard) — each stream doc's VERIFIED
    near-dup partners against a static corpus index, plus one sentinel
    ``corpus_id IS NULL`` row per doc (so a downstream per-doc verdict
    aggregate sees clean docs with zeros), all from ONE read of
    ``stream``: in-row signatures → banded probe (sentinel element) →
    LEFT join the broadcast band index → LEFT join the broadcast
    corpus shingle sets → exact-Jaccard verify at ``threshold``.

    The shared core of stream_neardup_gate (r13 extraction, driver
    advice). Broadcast hints are size-gated on ``n_corpus_docs`` vs
    ``broadcast_cap`` (default ``_STREAM_INDEX_BROADCAST_CAP``): past
    the cap the plan degrades to a SHUFFLE_HASH stream-static join
    instead of failing at the driver — stream_neardup_gate_shuffled
    passes ``broadcast_cap=0`` so the degrade branch runs oracle-green
    at fixture scale (r13 verdict item: the over-cap path must EXECUTE,
    not just exist; reference analog: the exercised shard-cache
    fallback, syncclient.go:101-106). Callers with a pre-laid-out index
    (the bucketed 100 TB shape, stream_neardup_gate_bucketed) pass
    ``index`` / ``corpus_sets`` explicitly — used AS GIVEN, no hints
    added, so a bucketed table's co-located layout survives planning.
    Self-matches (corpus_id = doc_id) are excluded; the same partner
    verifying in several bands is deduplicated by the caller's
    ``collect_set`` (exactly as the batch tier's candidate distinct).

    Static-side fan-out and localCheckpoint were measured and REJECTED
    here (SCALE.md r13): per-microbatch re-planning of the extra
    exchanges costs more in stage scheduling than the single-split map
    stages they would parallelize."""
    idx_given = index is not None
    sets_given = corpus_sets is not None
    if index is None:
        index = minhash_band_keys(batch_docs).withColumnRenamed(
            "doc_id", "corpus_id"
        )
    if corpus_sets is None:
        corpus_sets = shingle_sets(batch_docs).selectExpr(
            "doc_id AS corpus_id", "sh AS sh_c", "n AS nc"
        )
    probe = stream_inrow_band_probe(stream, sentinel=True)
    idx = index if idx_given else _maybe_broadcast(index, n_corpus_docs, broadcast_cap)
    sets = (
        corpus_sets
        if sets_given
        else _maybe_broadcast(corpus_sets, n_corpus_docs, broadcast_cap)
    )
    return (
        probe.join(
            idx,
            ["lang", "band", "key1", "key2"],
            "left",
        )
        .filter(
            F.expr("band = -1 OR (corpus_id IS NOT NULL AND corpus_id != doc_id)")
        )
        .join(sets, "corpus_id", "left")
        .selectExpr(
            "doc_id",
            "corpus_id",
            "CASE WHEN corpus_id IS NULL THEN CAST(NULL AS double) ELSE"
            " round(size(array_intersect(sh_set, sh_c))"
            " / cast(size(sh_set) + nc"
            "        - size(array_intersect(sh_set, sh_c)) AS double), 6)"
            " END AS jaccard",
        )
        .filter(F.expr(f"corpus_id IS NULL OR jaccard >= {threshold}"))
        .selectExpr(
            "doc_id",
            "CASE WHEN jaccard IS NULL THEN CAST(NULL AS bigint)"
            " ELSE corpus_id END AS corpus_id",
            "jaccard",
        )
    )


def shingle_sets(d: DataFrame) -> DataFrame:
    """(doc_id, lang, sh, n) — per-doc DISTINCT shingle set as an array
    plus its size: the exact-Jaccard verify input (array_intersect form).
    Extracted from :func:`minhash_pairs_df` (r12) for the same asymmetric
    consumers as :func:`minhash_band_keys`."""
    return (
        _shingles_raw(d)
        .groupBy("doc_id", "lang")
        .agg(F.expr("collect_set(shingle) AS sh"))
        .selectExpr("doc_id", "lang", "sh", "cast(size(sh) AS bigint) AS n")
    )


def minhash_pairs_df(d: DataFrame, min_jaccard: float = 0.5) -> DataFrame:
    """DataFrame form of :func:`minhash_pairs` — ``d`` must expose
    (doc_id, lang, text). Composed pipelines run the identical LSH tier
    over a filtered corpus this way (mirroring ``_minhash_cte(src=...)``
    on the oracle side). ``min_jaccard`` is the verified-Jaccard cut
    (default 0.5, the registered pair tier's); a caller advertising its
    own threshold constant must PASS it here so the Spark side and its
    oracle cannot fork (r11 second review)."""
    bands = minhash_band_keys(d)

    buckets = (
        bands.groupBy("lang", "band", "key1", "key2")
        .agg(F.expr("sort_array(collect_list(doc_id)) AS ids"))
        .filter(F.expr("size(ids) > 1"))
    )
    candidates = (
        buckets.selectExpr("posexplode(ids) AS (i, cand_a)", "ids")
        .selectExpr("cand_a", "explode(slice(ids, i + 2, size(ids))) AS cand_b")
        .distinct()
    )

    # verify ONLY candidate pairs (the whole point of LSH: exact Jaccard
    # never runs all-pairs) — join candidates to per-doc shingle sets and
    # intersect arrays
    sets = shingle_sets(d).select("doc_id", "sh", "n")
    sa = sets.selectExpr("doc_id AS cand_a", "sh AS sh_a", "n AS na")
    sb = sets.selectExpr("doc_id AS cand_b", "sh AS sh_b", "n AS nb")
    return (
        candidates.join(sa, "cand_a")
        .join(sb, "cand_b")
        .withColumn(
            "shared", F.expr("cast(size(array_intersect(sh_a, sh_b)) AS bigint)")
        )
        .selectExpr(
            "cand_a AS doc_a",
            "cand_b AS doc_b",
            "round(shared / cast(na + nb - shared AS double), 6) AS jaccard",
            "shared",
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


@register("dedup_minhash_lsh", oracle=_minhash_oracle(), tags=("dedup", "approx"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of ``minhash_pairs`` (see its docstring — the
    full pipeline and scale rationale live there)."""
    return minhash_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


def _cross_source_oracle() -> str:
    return f"""
WITH {_minhash_cte()}, vp AS (
  SELECT p.doc_a, p.doc_b,
         round(shared / CAST(na + nb - shared AS DOUBLE), 6) AS jaccard
  FROM p JOIN cand c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
  WHERE round(shared / CAST(na + nb - shared AS DOUBLE), 6) >= 0.5
)
SELECT LEAST(da.source, db.source) AS source_a,
       GREATEST(da.source, db.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MAX(jaccard) AS max_jaccard
FROM vp
JOIN documents da ON da.doc_id = vp.doc_a
JOIN documents db ON db.doc_id = vp.doc_b
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "dedup_cross_source_matrix",
    oracle=_cross_source_oracle(),
    tags=("dedup", "approx", "pipeline"),
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE the duplication comes from: the verified near-dup pairs of
    the registered MinHash/LSH tier (Jaccard ≥ 0.5) rolled up to an
    unordered SOURCE-pair matrix — pair count and max Jaccard per
    (source_a ≤ source_b). The diagonal is intra-source duplication
    (template reuse inside one crawl); off-diagonal cells expose source
    MIRRORS — the web-crawl reality where two "different" sources are
    the same site syndicated, and the cheapest fix is dropping one
    source, not deduping 10⁹ document pairs. Per-source gate quality
    lives in source_quality_ledger; this is its duplication companion.

    Scale: the tier is minhash_pairs_df verbatim (banded, never
    all-pairs); the rollup joins the PAIR table (near-dup density ×
    corpus, orders of magnitude below corpus size) against the slim
    (doc_id, source) projection twice, then a |sources|²-bounded
    aggregate. Reference analog: per-stream accounting delegated to the
    app (SURVEY.md §2.2)."""
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_pairs_df(d.select("doc_id", "lang", "text"))
    src = d.select("doc_id", "source")
    return (
        pairs.join(
            src.selectExpr("doc_id AS doc_a", "source AS src_a"), "doc_a"
        )
        .join(src.selectExpr("doc_id AS doc_b", "source AS src_b"), "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


# -- LSH parameter audit: the b×r S-curve, measured on this corpus ----------

# Candidate (bands, rows_per_band) splits of the same 64-permutation
# signature. More rows per band = stricter buckets (P(candidate) =
# 1-(1-j^r)^b): (32,2) floods candidates for high recall, (8,8) prunes
# hardest. The registered tier's 16×4 sits between; this audit measures
# all three on the actual corpus so the choice is data, not folklore.
_LSH_CONFIGS = ((32, 2), (16, 4), (8, 8))


def _lsh_param_oracle() -> str:
    h = _sha32_duck("shingle")
    mins = ",\n         ".join(
        f"min(({a} * h + {b}) % {_P32}) AS h{i}" for i, (a, b) in enumerate(_COEF)
    )
    cfg_ctes = []
    cfg_rows = []
    for nb, rpb in _LSH_CONFIGS:
        band_rows = []
        for i in range(nb):
            cols = [f"h{i * rpb + r}" for r in range(rpb)]
            k1 = _fold_expr(cols, *_FOLD[0])
            k2 = _fold_expr(cols, *_FOLD[1])
            band_rows.append(
                f"SELECT doc_id, lang, {i} AS band, {k1} AS key1,"
                f" {k2} AS key2 FROM sig"
            )
        bands = "\n  UNION ALL ".join(band_rows)
        cfg_ctes.append(
            f"""bands_{nb} AS (
  {bands}
), cand_{nb} AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands_{nb} a JOIN bands_{nb} b
    ON a.lang = b.lang AND a.band = b.band
   AND a.key1 = b.key1 AND a.key2 = b.key2 AND a.doc_id < b.doc_id
)"""
        )
        cfg_rows.append(
            f"""SELECT {nb} AS bands, {rpb} AS rows_per_band,
       (SELECT COUNT(*) FROM cand_{nb}) AS n_candidates,
       (SELECT COUNT(*) FROM cand_{nb} c JOIN exact x
          ON x.doc_a = c.doc_a AND x.doc_b = c.doc_b) AS n_verified"""
        )
    cfgs = ",\n".join(cfg_ctes)
    rows = "\nUNION ALL ".join(cfg_rows)
    return f"""
WITH w AS (
  SELECT doc_id, lang, regexp_split_to_array(text, ' ') AS words
  FROM documents
), s AS (
  SELECT doc_id, lang,
         CASE WHEN len(words) >= 3 THEN
           list_transform(range(1, len(words) - 1),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM w
), t AS (
  SELECT doc_id, lang, unnest(shingles) AS shingle FROM s
), hh AS (
  SELECT doc_id, lang, {h} AS h FROM t
), sig AS MATERIALIZED (
  SELECT doc_id, lang,
         {mins}
  FROM hh GROUP BY doc_id, lang
), e AS (
  SELECT doc_id, lang, len(list_distinct(shingles)) AS n,
         unnest(list_distinct(shingles)) AS shingle
  FROM s
), exact AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM e a JOIN e b
    ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING round(COUNT(*) / CAST(any_value(a.n) + any_value(b.n) - COUNT(*)
               AS DOUBLE), 6) >= 0.5
), {cfgs}, cfg AS (
{rows}
)
SELECT CAST(bands AS BIGINT) AS bands,
       CAST(rows_per_band AS BIGINT) AS rows_per_band,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_verified AS BIGINT) AS n_verified,
       CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
       round(n_verified / CAST((SELECT COUNT(*) FROM exact) AS DOUBLE), 6)
         AS recall
FROM cfg
ORDER BY rows_per_band
"""


@register(
    "dedup_lsh_param_audit",
    oracle=_lsh_param_oracle(),
    tags=("dedup", "approx"),
)
def dedup_lsh_param_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH b×r S-curve measured on the actual corpus — the design
    audit behind the registered 16×4 choice: for each split of the same
    64-permutation signature into (32×2, 16×4, 8×8) bands, the candidate
    count the banding emits and its recall of the EXACT 3-gram-Jaccard
    ≥ 0.5 pair set (verify precision is 1 by construction, so recall and
    candidate volume are the whole tradeoff: 32×2 floods candidates,
    8×8 prunes hardest, P(candidate) = 1-(1-j^r)^b). Real deployments
    tune b×r per corpus duplication profile before a 100 TB run — this
    row makes the repo's parameter choice externally checkable data
    instead of folklore.

    Fully ORACLE-EXACT (the dedup_minhash_lsh discipline, not a bound
    oracle): signatures, band folds, bucket candidates, the exact pair
    set, and the recall division are deterministic integer/sha
    arithmetic both engines replay bit-for-bit.

    Scale: ONE signature pass shared by all three configs
    (localCheckpointed — 64×8 B per doc regardless of length); each
    config adds only its band explode + bucket groupBy over signatures,
    never touching text again. The exact pair set is corpus-wide ngram
    Jaccard — affordable at audit time on a SAMPLE at 100 TB (the
    documented dedup_ngram_jaccard caveat); candidates stay banded."""
    # gated fan_out (r17): both heavy chains — the 64-permutation
    # signature build and the exact-pair shingle path — are per-row
    # sha/regexp work in the scan stage, ONE task on the single-split
    # local fixtures (identity on multi-split layouts).
    d = fan_out(_t(spark, sf_dir, "documents"), sf_dir, "documents")
    tri = _shingles_raw(d).withColumn("h", F.expr(_sha32("shingle")))
    min_exprs = [
        F.expr(f"min(({a}L * h + {b}L) % {_P32}L) AS h{i}")
        for i, (a, b) in enumerate(_COEF)
    ]
    sig_rows = (
        tri.groupBy("doc_id", "lang").agg(*min_exprs).localCheckpoint(eager=False)
    )
    exact = (
        _verified_pairs(_shingles(d), 0.5)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    n_exact = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))

    def _cfg_row(nb: int, rpb: int) -> DataFrame:
        def _band_struct(i: int) -> str:
            cols = [f"h{i * rpb + r}" for r in range(rpb)]
            k1 = _fold_expr(cols, *_FOLD[0])
            k2 = _fold_expr(cols, *_FOLD[1])
            return f"struct({i} AS band, {k1} AS key1, {k2} AS key2)"

        structs = ", ".join(_band_struct(i) for i in range(nb))
        bands = sig_rows.select(
            "doc_id", "lang", F.expr(f"explode(array({structs})) AS bk")
        ).select("doc_id", "lang", "bk.band", "bk.key1", "bk.key2")
        buckets = (
            bands.groupBy("lang", "band", "key1", "key2")
            .agg(F.expr("sort_array(collect_list(doc_id)) AS ids"))
            .filter(F.expr("size(ids) > 1"))
        )
        cand = (
            buckets.selectExpr("posexplode(ids) AS (i, doc_a)", "ids")
            .selectExpr("doc_a", "explode(slice(ids, i + 2, size(ids))) AS doc_b")
            .distinct()
            .localCheckpoint(eager=False)
        )
        n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
        n_ver = cand.join(exact, ["doc_a", "doc_b"], "left_semi").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_verified")
        )
        return (
            n_cand.crossJoin(F.broadcast(n_ver))
            .crossJoin(F.broadcast(n_exact))
            .selectExpr(
                f"cast({nb} AS bigint) AS bands",
                f"cast({rpb} AS bigint) AS rows_per_band",
                "n_candidates",
                "n_verified",
                "n_exact",
                "round(n_verified / cast(n_exact AS double), 6) AS recall",
            )
        )

    out = None
    for nb, rpb in _LSH_CONFIGS:
        row = _cfg_row(nb, rpb)
        out = row if out is None else out.unionByName(row)
    return out.orderBy("rows_per_band")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

_SIMHASH_BITS = 32
_HAM_BANDS = 4  # 4 bands × 8 bits for candidate blocking


def _simhash(d: DataFrame) -> DataFrame:
    """(doc_id, lang, simhash) — 32-bit SimHash over sha256-prefix word
    hashes (portable: the oracle replays the identical integers).

    bit_j(simhash) = 1 iff Σ_words (±1 per word's bit_j) > 0; built as 32
    conditional sums over the exploded word table — pure JVM expressions.
    """
    words = (
        d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
        .withColumn("h", F.expr(_sha32("w")))
    )
    # SQL strings, not Column chains: 32 contrib aggs + the 32-term bit
    # reassembly as Columns are ~300 py4j round trips of pure driver
    # latency per build (see _dot_sql in similarity.py)
    contribs = [
        F.expr(f"sum(IF(shiftright(h, {j}) & 1 = 1, 1, -1)) AS b{j}")
        for j in range(_SIMHASH_BITS)
    ]
    agg = words.groupBy("doc_id", "lang").agg(*contribs)
    sim = " + ".join(
        f"IF(b{j} > 0, cast({1 << j} AS bigint), 0)" for j in range(_SIMHASH_BITS)
    )
    return agg.selectExpr("doc_id", "lang", f"({sim}) AS simhash")


def _simhash_cte() -> str:
    """Shared CTE chain: documents → simhash → bands → verified Hamming
    pairs (``simpairs``). Consumed by the simhash oracle and, extended
    with a levenshtein verify, by the edit-distance oracle."""
    h = _sha32_duck("wd")
    bsums = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(_SIMHASH_BITS)
    )
    sim = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END"
        for j in range(_SIMHASH_BITS)
    )
    return f"""w AS (
  SELECT doc_id, lang, unnest(regexp_split_to_array(text, ' ')) AS wd
  FROM documents
), hh AS (
  SELECT doc_id, lang, {h} AS h FROM w
), bs AS (
  SELECT doc_id, lang,
         {bsums}
  FROM hh GROUP BY doc_id, lang
), sh AS (
  SELECT doc_id, lang, CAST({sim} AS BIGINT) AS simhash FROM bs
), bands AS (
  SELECT doc_id, lang, simhash, band,
         (simhash >> (band * 8)) & 255 AS key
  FROM sh CROSS JOIN (SELECT unnest(range({_HAM_BANDS})) AS band) b
), simpairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM bands a JOIN bands b
    ON a.lang = b.lang AND a.band = b.band AND a.key = b.key
   AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
)"""


def _simhash_oracle() -> str:
    return f"""
WITH {_simhash_cte()}
SELECT doc_a, doc_b, hamming FROM simpairs
ORDER BY doc_a, doc_b
"""


@register("dedup_simhash", oracle=_simhash_oracle(), tags=("dedup", "approx"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded blocking (a shared 8-bit band is
    necessary for Hamming distance ≤ 3 by pigeonhole over 4 bands),
    then exact Hamming ≤ 3 verification via bit_count(xor).

    Oracle-exact like ``dedup_minhash_lsh``: sha256-prefix word hashes +
    integer bit arithmetic replay identically in DuckDB (generated SQL
    mirrors the 32 conditional sums, the bit reassembly, and the banded
    self-join)."""
    d = _t(spark, sf_dir, "documents")
    s = _simhash(d)
    structs = ", ".join(
        f"struct({i} AS band, shiftright(simhash, {i * 8}) & 255 AS key)"
        for i in range(_HAM_BANDS)
    )
    bands = s.select(
        "doc_id", "lang", "simhash", F.expr(f"explode(array({structs})) AS bk")
    ).select("doc_id", "lang", "simhash", "bk.band", "bk.key")
    # ONE shuffle for candidates: bucket-group on the band key and expand
    # pairs in place (sorted by doc_id, so doc_a < doc_b by construction)
    # — same shape as dedup_minhash_lsh; a two-sided self-join would
    # shuffle the band table twice
    return (
        bands.groupBy("lang", "band", "key")
        .agg(F.expr("sort_array(collect_list(struct(doc_id, simhash))) AS items"))
        .filter(F.expr("size(items) > 1"))
        .selectExpr("posexplode(items) AS (i, a)", "items")
        .selectExpr("a", "explode(slice(items, i + 2, size(items))) AS b")
        .selectExpr(
            "a.doc_id AS doc_a",
            "b.doc_id AS doc_b",
            "cast(bit_count(a.simhash ^ b.simhash) AS bigint) AS hamming",
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# Near-dup clustering (connected components over dup pairs)
# --------------------------------------------------------------------------

_CC_MAX_ITERS = 20

_CLUSTERS_ORACLE = """
WITH RECURSIVE w AS (
  SELECT doc_id, lang, regexp_split_to_array(text, ' ') AS words FROM documents
), s AS (
  SELECT doc_id, lang,
         CASE WHEN len(words) >= 3 THEN
           list_distinct(list_transform(range(1, len(words) - 1),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM w
), e AS (
  SELECT doc_id, lang, len(shingles) AS n, unnest(shingles) AS shingle FROM s
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         COUNT(*) AS shared, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM e a JOIN e b
    ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM p
  WHERE round(shared / CAST(na + nb - shared AS DOUBLE), 6) >= 0.5
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), walk AS (
  SELECT DISTINCT src AS doc_id, src AS reach FROM edges
  UNION
  SELECT wk.doc_id, e2.dst FROM walk wk JOIN edges e2 ON e2.src = wk.reach
)
SELECT min(reach) AS cluster_id, doc_id, (min(reach) = doc_id) AS is_canonical
FROM walk
GROUP BY doc_id
ORDER BY cluster_id, doc_id
"""


@register("dedup_clusters", oracle=_CLUSTERS_ORACLE, tags=("dedup", "iterative"))
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the exact
    3-gram-Jaccard ≥ 0.5 pair graph, labeling every clustered doc with
    the minimum doc_id reachable from it (cluster_id) and flagging the
    canonical survivor — the step that turns pairwise dedup output into
    the keep/drop decision a training-data pipeline actually applies
    (pairs alone can't: A~B, B~C must drop B AND C, though A~C was
    never emitted).

    Labels come from ``connected_components`` — the alternating
    large-star/small-star contraction (O(log n) rounds, see its
    docstring); r3 shipped O(diameter) min-label propagation and this
    round executed the documented upgrade.

    Edge source here is the EXACT pair generator, mirrored by the
    oracle's recursive CTE (transitive closure, min per node) — exact in,
    exact out. At 100 TB swap in the minhash-LSH tier as the edge
    source: that is exactly ``dedup_clusters_lsh`` below — identical
    contract, same contraction (it scales with |edges|, and its shuffles
    are keyed on doc_id — AQE-coalesced, skew-safe since near-dup degree
    is bounded by cluster size).

    The reference delegates all analytics to its application
    (kinesumer.go:346-370); this is declared-surface infrastructure, not
    a port.
    """
    d = _t(spark, sf_dir, "documents")
    pairs = _verified_pairs(_shingles(d), 0.5).select("doc_a", "doc_b")
    labels, _ = connected_components(pairs)
    return _cluster_output(labels)


def _cluster_output(labels: DataFrame) -> DataFrame:
    return (
        labels.select(
            F.col("label").alias("cluster_id"),
            "doc_id",
            (F.col("label") == F.col("doc_id")).alias("is_canonical"),
        )
        .orderBy("cluster_id", "doc_id")
    )


def connected_components(
    pairs: DataFrame, max_iters: int = _CC_MAX_ITERS, rounds_per_job: int = 2
) -> tuple[DataFrame, int]:
    """Connected components over an undirected pair list (doc_a, doc_b) →
    ((doc_id, label=component min), rounds used).

    Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"): each round rewires
    every node toward its neighborhood minimum —
      large-star: for each u, hook every LARGER neighbor v to
        m = min(Γ(u) ∪ {u});
      small-star: orient edges big→small, hook u and all its smaller
        non-min neighbors to m = min(N(u)).
    Path lengths roughly halve per alternation, so convergence is
    O(log n) rounds even on adversarial chain graphs — the upgrade the
    O(diameter) min-label propagation loop documented (near-dup graphs
    are short chains, but the bound shouldn't depend on that).

    Driver-pacing design (the r5 perf wart): ``rounds_per_job``
    alternations are chained LAZILY between materializations, and
    convergence is detected IN the same job that materializes the batch
    — no confirming extra batch, no separate checksum collect. The test
    exploits the fixpoint's structure directly: every edge both stars
    emit is downward (src > dst, see the per-op notes), so the current
    set is a fixpoint iff it is a star forest — every src occurs
    exactly once and no node is both a src and a dst (roots are the
    component minima because contraction preserves components and only
    rewires toward minima). That is ONE keyed agg over an exploded
    (node, role) view — a scalar to the driver per K rounds, like the
    commit ledger's high-water collect. localCheckpoint (lazy,
    materialized by that same job) truncates lineage so plan depth
    stays O(star ops × K) per job.
    """
    sym = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    edges = (
        sym.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint(
            eager=False
        )
    )
    # every endpoint appears as src after symmetrization, so the node set
    # derives from the CHECKPOINTED initial edges — deriving it from
    # `sym` would re-evaluate the (possibly expensive) pair-generation
    # subtree a second time at the final roots join
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()

    def _is_star_forest(e: DataFrame) -> bool:
        """True iff ``e`` is a fixpoint. Both stars only emit src > dst
        edges, so fixpoint ⇔ star forest: every src unique AND no node
        plays both roles. One shuffle on node; the count is 0/1 (limit
        short-circuits), so the driver transfer is one scalar."""
        roles = e.selectExpr("src AS node", "1 AS ns", "0 AS nd").unionAll(
            e.selectExpr("dst AS node", "0 AS ns", "1 AS nd")
        )
        bad = (
            roles.groupBy("node")
            .agg(F.sum("ns").alias("s"), F.max("nd").alias("d"))
            .filter("(s > 0 AND d > 0) OR s > 1")
            .limit(1)
            .count()
        )
        return bad == 0

    # Both stars need "per-src neighborhood min" joined back onto every
    # edge — a window min over partitionBy(src) computes it in ONE
    # shuffle (the groupBy+join-back formulation cost 2-3, and local
    # stage latency, not data volume, dominates this loop at any sf).
    # Dedup is deferred to once per K-batch: star math is set-semantic
    # under duplicates (per-node mins ignore multiplicity), duplication
    # per alternation is bounded (large-star emits ≤1 edge per input
    # edge; small-star ≤1 per edge + 1 per distinct src), and the batch
    # checkpoint's distinct restores the set before it can compound.
    from pyspark.sql import Window as W

    def _large_star(e: DataFrame) -> DataFrame:
        s = e.unionByName(e.selectExpr("dst AS src", "src AS dst"))
        w = W.partitionBy("src")
        return (
            s.withColumn("mn", F.min("dst").over(w))
            .withColumn("m", F.least(F.col("src"), F.col("mn")))
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )

    def _small_star(e: DataFrame) -> DataFrame:
        o = e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        w_min = W.partitionBy("src")
        w_rn = W.partitionBy("src").orderBy("dst")
        o2 = o.withColumn("m", F.min("dst").over(w_min)).withColumn(
            "rn", F.row_number().over(w_rn)
        )
        hang = o2.filter(F.col("dst") != F.col("m")).select(
            F.col("dst").alias("src"), F.col("m").alias("dst")
        )
        # rn==1 emits the (src, m) self-hook exactly once per src — which
        # duplicate row wins is arbitrary but the emitted edge identical
        own = o2.filter(F.col("rn") == 1).select("src", F.col("m").alias("dst"))
        return hang.unionByName(own).filter(F.col("src") != F.col("dst"))

    rounds = 0
    converged = False
    while rounds < max_iters:
        k = min(rounds_per_job, max_iters - rounds)
        for _ in range(k):
            edges = _small_star(_large_star(edges))
        edges = edges.distinct().localCheckpoint(eager=False)
        rounds += k
        # ONE job: materializes the whole K-batch checkpoint AND answers
        # "converged?" (post-fixpoint alternations are no-ops, so a
        # batch overshooting the exact convergence round is harmless)
        if _is_star_forest(edges):
            converged = True
            break
    if not converged:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iters} rounds")

    lab = edges.select(F.col("src").alias("doc_id"), F.col("dst").alias("label"))
    roots = nodes.join(lab, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("label")
    )
    return lab.unionByName(roots), rounds


def _clusters_lsh_oracle() -> str:
    return f"""
WITH RECURSIVE {_minhash_cte()}, lsh_pairs AS (
  SELECT p.doc_a, p.doc_b
  FROM p JOIN cand c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
  WHERE round(shared / CAST(na + nb - shared AS DOUBLE), 6) >= 0.5
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
  UNION ALL
  SELECT doc_b, doc_a FROM lsh_pairs
), walk AS (
  SELECT DISTINCT src AS doc_id, src AS reach FROM edges
  UNION
  SELECT wk.doc_id, e2.dst FROM walk wk JOIN edges e2 ON e2.src = wk.reach
)
SELECT min(reach) AS cluster_id, doc_id, (min(reach) = doc_id) AS is_canonical
FROM walk
GROUP BY doc_id
ORDER BY cluster_id, doc_id
"""


@register(
    "dedup_clusters_lsh",
    oracle=_clusters_lsh_oracle(),
    tags=("dedup", "iterative", "approx"),
)
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_clusters`` driven by the LSH edge source — the 100 TB
    composition: candidate pairs from ``minhash_pairs`` (bucketed, never
    all-pairs), exact-verified ≥ 0.5, then the same alternating-star
    contraction to component minima. This is the keep/drop decision at
    the scale the exact pair generator can't reach: the pair stage costs
    one shuffle over fixed-width signatures, and the contraction costs
    O(log n) rounds over |edges| — nothing in the plan touches all
    pairs.

    Oracle-exact end to end: the LSH pipeline is portable arithmetic
    (see ``dedup_minhash_lsh``), so the oracle rebuilds the identical
    edge set in SQL and closes it with a recursive CTE — the full
    approximate-dedup → clustering path is hash-checked, not rows-only.
    Where LSH recall drops an edge, both engines drop it identically
    (clusters may split vs the exact graph; tests compare against
    ``dedup_clusters`` on the gate corpus, where LSH finds every ≥0.5
    pair and the outputs coincide).
    """
    labels, _ = connected_components(
        minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    )
    return _cluster_output(labels)


# --------------------------------------------------------------------------
# Corpus-frequency boilerplate removal (C4-style chunk dedup)
# --------------------------------------------------------------------------

_CHUNK_WORDS = 8   # non-overlapping chunk width (the "line" unit)
_BOILER_DOCS = 3   # a chunk present in >= this many distinct docs is boilerplate


def _boilerplate_oracle() -> str:
    h = _sha32_duck("chunk")
    return f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS words FROM documents
), c AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(words) / {_CHUNK_WORDS}.0) AS BIGINT)),
           i -> array_to_string(words[(i * {_CHUNK_WORDS} + 1):((i + 1) * {_CHUNK_WORDS})], ' '))
           AS chunks
  FROM w
), e AS (
  SELECT doc_id, unnest(chunks) AS chunk FROM c
), hh AS (
  SELECT doc_id, {h} AS ch FROM e
), freq AS (
  SELECT ch, COUNT(DISTINCT doc_id) AS n_docs FROM hh GROUP BY ch
), flagged AS (
  SELECT hh.doc_id,
         COUNT(*) AS n_chunks,
         COUNT(*) FILTER (WHERE f.n_docs >= {_BOILER_DOCS}) AS n_boiler
  FROM hh JOIN freq f ON hh.ch = f.ch
  GROUP BY hh.doc_id
)
SELECT doc_id,
       CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(n_boiler AS BIGINT) AS n_boiler,
       round(n_boiler / CAST(n_chunks AS DOUBLE), 6) AS boiler_frac,
       n_boiler * 2 > n_chunks AS drop_doc
FROM flagged
ORDER BY doc_id
"""


@register("dedup_boilerplate", oracle=_boilerplate_oracle(), tags=("dedup", "text"))
def dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate detection (the C4 recipe: drop any
    line occurring in ≥ 3 documents). Documents are split into
    non-overlapping 8-word chunks; a chunk's corpus frequency (distinct
    docs) marks it boilerplate, and docs that are mostly boilerplate get
    the drop flag.

    Scale: chunks are hashed map-side to fixed-width 32-bit sha256
    prefixes, so the global frequency shuffle moves (hash, doc_id) pairs
    — ~16 B per chunk regardless of text size — and the per-doc rollup
    shuffles one row per chunk occurrence. No chunk STRING ever crosses
    the wire, and nothing is all-pairs: cost is linear in corpus tokens.
    This is the standing C4/RefinedWeb pre-filter that runs BEFORE
    near-dup (MinHash) so boilerplate mass doesn't poison signatures.
    Reference analog: record-level preprocessing delegated to the app
    (SURVEY.md §2.2 LLM row).
    """
    d = _t(spark, sf_dir, "documents")
    # split once in a prior select: the HOF lambda runs interpreted and
    # would re-split text per chunk — O(words²/C) per doc (the r12
    # shingle lesson, SCALE.md)
    c = d.selectExpr("doc_id", "split(text, ' ') AS w").selectExpr(
        "doc_id",
        # Spark slice() is 1-based and truncates at the array end, same
        # as the DuckDB list slice in the oracle
        f"transform(sequence(0, cast(ceil(size(w) / {_CHUNK_WORDS}.0)"
        f"    AS int) - 1),"
        f"  i -> array_join(slice(w, i * {_CHUNK_WORDS} + 1,"
        f"       {_CHUNK_WORDS}), ' ')) AS chunks",
    )
    e = c.selectExpr("doc_id", "explode(chunks) AS chunk").withColumn(
        "ch", F.expr(_sha32("chunk"))
    ).select("doc_id", "ch")
    freq = e.groupBy("ch").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    flagged = (
        e.join(freq, "ch")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count(F.when(F.col("n_docs") >= _BOILER_DOCS, 1)).alias("n_boiler"),
        )
    )
    return flagged.selectExpr(
        "doc_id",
        "cast(n_chunks AS bigint) AS n_chunks",
        "cast(n_boiler AS bigint) AS n_boiler",
        "round(n_boiler / cast(n_chunks AS double), 6) AS boiler_frac",
        "n_boiler * 2 > n_chunks AS drop_doc",
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Exact substring-run dedup (positional shingles + diagonal islands)
# --------------------------------------------------------------------------

_RUN_K = 8  # words per positional shingle
_RUN_MIN = 12  # report pairs sharing a run of >= this many tokens
_RUN_DF_CAP = 50  # drop shingles occurring more often (boilerplate guard)


def _substring_oracle() -> str:
    h = _sha32_duck("shingle")
    return f"""
WITH w AS (
  SELECT doc_id, lang, regexp_split_to_array(text, ' ') AS words FROM documents
), p AS (
  SELECT doc_id, lang, words,
         unnest(range(1, len(words) - {_RUN_K} + 2)) AS pos
  FROM w WHERE len(words) >= {_RUN_K}
), e AS (
  SELECT doc_id, lang, pos,
         {h} AS hsh
  FROM (SELECT doc_id, lang, pos,
               array_to_string(words[pos:pos+{_RUN_K}-1], ' ') AS shingle
        FROM p)
), f AS (
  SELECT * FROM (
    SELECT e.*, COUNT(*) OVER (PARTITION BY lang, hsh) AS occ FROM e)
  WHERE occ <= {_RUN_DF_CAP}
), m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.pos - b.pos AS diag, a.pos AS ia
  FROM f a JOIN f b
    ON a.hsh = b.hsh AND a.lang = b.lang AND a.doc_id < b.doc_id
), isl AS (
  SELECT doc_a, doc_b, diag,
         ia - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                 ORDER BY ia) AS island
  FROM m
), runs AS (
  SELECT doc_a, doc_b, COUNT(*) AS m FROM isl
  GROUP BY doc_a, doc_b, diag, island
)
SELECT doc_a, doc_b,
       CAST(MAX(m) + {_RUN_K} - 1 AS BIGINT) AS max_run_tokens,
       CAST(SUM(m) AS BIGINT) AS n_matches
FROM runs
GROUP BY doc_a, doc_b
HAVING MAX(m) + {_RUN_K} - 1 >= {_RUN_MIN}
ORDER BY doc_a, doc_b
"""


@register("dedup_substring_spans", oracle=_substring_oracle(), tags=("dedup",))
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shared-substring detection (the "Deduplicating Training Data
    Makes Language Models Better" operator, re-expressed relationally):
    report document pairs sharing a verbatim run of >= {MIN} consecutive
    tokens, with the longest run length.

    Method: positional {K}-word shingles; matched shingle positions
    between two documents lie on diagonals (pos_a - pos_b constant), and
    a shared run of m consecutive shingles is an "island" of consecutive
    positions on one diagonal (gaps-and-islands: pos - row_number() is
    constant within an island) -> run length = m + {K} - 1 tokens.

    Scale (100 TB):
    - Shingle generation is map-side (the overlapping-lookahead regexp,
      see _shingles_raw) -- no shuffle until the hash join.
    - The pair join is BLOCKED on (lang, sha256-prefix hash): never
      all-pairs. The worst case -- an ultra-common shingle bucket
      expanding quadratically -- is capped by the document-frequency
      guard (occ <= {CAP}): boilerplate shingles are dedup_boilerplate's
      job, and dropping them bounds any bucket to {CAP}^2 rows. This is
      the same frequency-capping the suffix-array implementations of the
      paper apply to keep memory bounded.
    - Islands need one shuffle keyed (doc_a, doc_b) -- pair-local,
      parallel; no global sort anywhere.

    Every stage (sha256-prefix hashes, integer positions, window
    row_number) is deterministic integer arithmetic, so the DuckDB
    oracle replays the pipeline bit-for-bit.
    """
    d = _t(spark, sf_dir, "documents")
    # overlapping K-gram lookahead (same idiom as _shingles_raw, K words)
    grp = " ".join([r"\\S+"] * _RUN_K)
    arr = F.expr(rf"regexp_extract_all(text, '(?:^| )(?=({grp}))', 1)")
    e = (
        d.select("doc_id", "lang", arr.alias("sh"))
        .select("doc_id", "lang", F.posexplode("sh").alias("pos0", "shingle"))
        .select(
            "doc_id",
            "lang",
            (F.col("pos0") + 1).alias("pos"),
            F.expr(_sha32("shingle")).alias("hsh"),
        )
    )
    from pyspark.sql import Window as W

    occ = W.partitionBy("lang", "hsh")
    f = e.withColumn("occ", F.count("*").over(occ)).filter(
        F.col("occ") <= _RUN_DF_CAP
    )
    a = f.selectExpr("doc_id AS doc_a", "lang", "hsh", "pos AS ia")
    b = f.selectExpr("doc_id AS doc_b", "lang", "hsh", "pos AS jb")
    m = (
        a.join(b, ["lang", "hsh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", (F.col("ia") - F.col("jb")).alias("diag"), "ia")
    )
    wisl = W.partitionBy("doc_a", "doc_b", "diag").orderBy("ia")
    runs = (
        m.withColumn("island", F.col("ia") - F.row_number().over(wisl))
        .groupBy("doc_a", "doc_b", "diag", "island")
        .agg(F.count("*").alias("m"))
        .groupBy("doc_a", "doc_b")
        .agg(
            (F.max("m") + _RUN_K - 1).cast("bigint").alias("max_run_tokens"),
            F.sum("m").cast("bigint").alias("n_matches"),
        )
        .filter(F.col("max_run_tokens") >= _RUN_MIN)
    )
    return runs.orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# Keep-best: quality-aware canonical selection per near-dup cluster
# --------------------------------------------------------------------------

_KEEP_BEST_ORACLE = """
WITH RECURSIVE w AS (
  SELECT doc_id, lang, regexp_split_to_array(text, ' ') AS words FROM documents
), s AS (
  SELECT doc_id, lang,
         CASE WHEN len(words) >= 3 THEN
           list_distinct(list_transform(range(1, len(words) - 1),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM w
), e AS (
  SELECT doc_id, lang, len(shingles) AS n, unnest(shingles) AS shingle FROM s
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         COUNT(*) AS shared, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM e a JOIN e b
    ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM p
  WHERE round(shared / CAST(na + nb - shared AS DOUBLE), 6) >= 0.5
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), walk AS (
  SELECT DISTINCT src AS doc_id, src AS reach FROM edges
  UNION
  SELECT wk.doc_id, e2.dst FROM walk wk JOIN edges e2 ON e2.src = wk.reach
), clusters AS (
  SELECT min(reach) AS cluster_id, doc_id FROM walk GROUP BY doc_id
), q AS (
  SELECT doc_id,
         round(LEAST(1.0, len(regexp_split_to_array(text, ' ')) / 100.0) *
               (1.0 - len(regexp_extract_all(text, '[^a-z ]'))
                    / CAST(n_chars AS DOUBLE)), 6) AS quality_score
  FROM documents
)
SELECT c.cluster_id, c.doc_id, q.quality_score,
       (ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                           ORDER BY q.quality_score DESC, c.doc_id) = 1)
         AS keep
FROM clusters c JOIN q USING (doc_id)
ORDER BY cluster_id, doc_id
"""


@register("dedup_keep_best", oracle=_KEEP_BEST_ORACLE, tags=("dedup", "iterative"))
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within each near-dup cluster
    keep the HIGHEST-quality member (ties → min doc_id), not the min-id
    member — the keeper policy production pipelines actually use (the
    near-identical copies differ in boilerplate/truncation, and min-id
    throws the cleanest copy away half the time).

    Composition: connected components over the exact 3-gram-Jaccard
    ≥ 0.5 pair graph (``connected_components``, alternating-star — the
    same engine dedup_clusters uses) ⨝ ``text_quality_score`` ranked per
    cluster. quality_score is rounded to 6 decimals BEFORE ranking, so
    the float comparison is engine-stable (the rounded values hash-match
    in the text_quality_score driver row).

    Scale: clusters scale with |edges| (see connected_components);
    quality is a map-side expression; the final rank windows over
    cluster members only (bounded by cluster size, not corpus size). At
    100 TB swap the exact pair source for minhash_pairs exactly as
    dedup_clusters_lsh does."""
    from kinesumer_spark.operators.text import text_quality_score

    d = _t(spark, sf_dir, "documents")
    pairs = _verified_pairs(_shingles(d), 0.5).select("doc_a", "doc_b")
    labels, _ = connected_components(pairs)
    quality = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    from pyspark.sql import Window as W

    clustered = labels.select(F.col("label").alias("cluster_id"), "doc_id").join(
        quality, "doc_id"
    )
    rank = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(
            F.col("quality_score").desc(), F.col("doc_id")
        )
    )
    return (
        clustered.withColumn("keep", rank == 1)
        .select("cluster_id", "doc_id", "quality_score", "keep")
        .orderBy("cluster_id", "doc_id")
    )


# -- Edit-distance (Levenshtein) verification of SimHash candidates ---------

_EDIT_MAX_HAMMING = 2  # the edit tier verifies the tightest band only


def _edit_oracle() -> str:
    return f"""
WITH {_simhash_cte()}
SELECT p.doc_a, p.doc_b, p.hamming,
       CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS edit_distance,
       round(1.0 - levenshtein(ta.text, tb.text)
                   / CAST(greatest(length(ta.text), length(tb.text)) AS DOUBLE),
             6) AS edit_similarity
FROM simpairs p
JOIN documents ta ON ta.doc_id = p.doc_a
JOIN documents tb ON tb.doc_id = p.doc_b
WHERE p.hamming <= {_EDIT_MAX_HAMMING}
  AND 10 * levenshtein(ta.text, tb.text)
      <= 3 * greatest(length(ta.text), length(tb.text))
ORDER BY doc_a, doc_b
"""


@register("dedup_edit_distance", oracle=_edit_oracle(), tags=("dedup",))
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup verification: SimHash-banded candidate
    pairs re-verified with exact Levenshtein edit distance (keep pairs
    with distance ≤ 30% of the longer text — the 10·lev ≤ 3·len integer
    cross-multiply avoids any division on the filter path).

    This is the dedup ladder's character tier: token-level measures
    (Jaccard, MinHash) miss in-word edits and reorder-free character
    noise; edit distance catches both. The O(len²) DP cost per pair is
    exactly why it runs LAST, on the banded candidate set only — never
    all-pairs (the plan inherits dedup_simhash's single bucket-grouped
    shuffle; the verify adds two doc_id-keyed broadcast-eligible joins
    back to the text). Both engines implement the same standard
    Levenshtein, and the similarity ratio rounds to 6 dp after one
    division — the jaccard discipline."""
    pairs = dedup_simhash(spark, sf_dir).filter(
        F.col("hamming") <= _EDIT_MAX_HAMMING
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ta = d.selectExpr("doc_id AS doc_a", "text AS text_a")
    tb = d.selectExpr("doc_id AS doc_b", "text AS text_b")
    longest = F.greatest(F.length("text_a"), F.length("text_b"))
    # banded DP: the 3-arg levenshtein early-exits past the per-row
    # threshold (O(len·k) instead of O(len²); returns -1 above it) —
    # measured 22.5 s → 3.3 s warm at sf0.1 together with the hamming ≤ 2
    # tier cut. The threshold equals the keep-filter bound, so the
    # surviving rows and their distances are identical to the plain
    # formulation the oracle runs.
    lev = F.expr(
        "levenshtein(text_a, text_b,"
        " cast(3 * greatest(length(text_a), length(text_b)) div 10 AS int))"
    )
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("lev", lev)
        .filter((F.col("lev") >= 0) & (10 * F.col("lev") <= 3 * longest))
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            F.col("lev").cast("bigint").alias("edit_distance"),
            F.round(1.0 - F.col("lev") / longest.cast("double"), 6).alias(
                "edit_similarity"
            ),
        )
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# Asymmetric containment (quote / subset detection over rare shingles)
# --------------------------------------------------------------------------

_CONTAIN_DF_CAP = 25  # shingles seen in more docs carry no signal
_CONTAIN_THRESHOLD = 0.8

_CONTAIN_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang, regexp_split_to_array(text, ' ') AS words FROM documents
), s AS (
  SELECT doc_id, lang,
         CASE WHEN len(words) >= 3 THEN
           list_distinct(list_transform(range(1, len(words) - 1),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM w
), e AS (
  SELECT doc_id, lang, unnest(shingles) AS shingle FROM s
), rare AS (
  SELECT lang, shingle FROM e
  GROUP BY lang, shingle HAVING COUNT(*) <= {_CONTAIN_DF_CAP}
), e2 AS (
  SELECT e.doc_id, e.lang, e.shingle FROM e JOIN rare USING (lang, shingle)
), sized AS (
  SELECT doc_id, lang, shingle,
         CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_rare
  FROM e2
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS shared,
         any_value(a.n_rare) AS na, any_value(b.n_rare) AS nb
  FROM sized a JOIN sized b
    ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared,
       LEAST(na, nb) AS n_smaller,
       round(shared / CAST(LEAST(na, nb) AS DOUBLE), 6) AS containment
FROM p
WHERE round(shared / CAST(LEAST(na, nb) AS DOUBLE), 6) >= {_CONTAIN_THRESHOLD}
ORDER BY doc_a, doc_b
"""


@register("dedup_containment", oracle=_CONTAIN_ORACLE, tags=("dedup",))
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: pairs where the SMALLER document's
    rare-shingle set is ≥80% contained in the other's — the quote /
    excerpt / superset relationship that symmetric Jaccard structurally
    misses (a short doc fully quoted inside a long one has tiny Jaccard
    but containment 1.0). This is the measure training-data pipelines
    use to drop excerpts whose superset is already kept (Broder's
    containment, the SEC/copy-detection formulation), complementing
    ``dedup_ngram_jaccard``/``dedup_minhash_lsh`` (symmetric tiers) and
    ``dedup_substring_spans`` (exact span tier).

    Semantics are defined over RARE shingles only (document frequency
    ≤ 25, per language): common shingles are boilerplate that inflates
    containment AND is precisely what makes a shingle self-join explode
    at scale — the df cap is simultaneously the quality filter and the
    scale guarantee (a shingle joins at most cap docs → ≤ cap² pair
    contributions; no all-pairs anywhere, same blocking discipline as
    the Jaccard tier). The oracle replays the identical definition, so
    the driver hash-checks it exactly.

    Plan: map-side shingle explode (the `_shingles_raw` regexp path, no
    shuffle) → distinct → one (lang, shingle) aggregate for the df cap
    → per-doc rare-set sizes (doc_id window) → shingle-keyed self-join
    bounded by the cap → pair aggregate. Shuffles carry (shingle,
    doc_id) fingerprints, never text. At 100 TB: identical shape, with
    the df-capped shingle table a small fraction of the corpus; skewed
    languages ride the shingle key, not a lang key.
    """
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    sh = _shingles_raw(d).distinct()
    per_shingle = W.partitionBy("lang", "shingle")
    rare = (
        sh.withColumn("df", F.count(F.lit(1)).over(per_shingle))
        .filter(F.col("df") <= _CONTAIN_DF_CAP)
        .drop("df")
    )
    sized = rare.withColumn(
        "n_rare", F.count(F.lit(1)).over(W.partitionBy("doc_id")).cast("bigint")
    )
    a, b = sized.alias("a"), sized.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("shared"),
            F.first("a.n_rare").alias("na"),
            F.first("b.n_rare").alias("nb"),
        )
    )
    return (
        pairs.withColumn("n_smaller", F.least("na", "nb"))
        .withColumn(
            "containment",
            F.round(F.col("shared") / F.col("n_smaller").cast("double"), 6),
        )
        .filter(F.col("containment") >= _CONTAIN_THRESHOLD)
        .select("doc_a", "doc_b", "shared", "n_smaller", "containment")
        .orderBy("doc_a", "doc_b")
    )


# -- Content-defined chunking (CDC) ------------------------------------------
#
# The storage/dataset-dedup primitive (LBFS/rsync lineage): cut each
# document at positions where the hash of the trailing w-byte window
# hits a fixed residue, so chunk boundaries follow CONTENT, not offsets
# — an insertion early in a document shifts every fixed-stride span but
# leaves all later CDC chunks identical, which is what makes chunk
# fingerprints reusable across document versions. Basic CDC (no
# min/max chunk bounds) keeps every boundary decision an INDEPENDENT
# per-position predicate, so the whole chunker is one higher-order
# expression over the text column — no explode, no shuffle, no Python.
# (Min/max-bounded variants make boundaries sequential-state-dependent;
# that version belongs in mapInPandas and is not needed for
# fingerprinting.) Expected chunk length = the modulus (64 bytes here,
# window w = 8).

_CDC_W = 8  # rolling window bytes
_CDC_M = 64  # boundary modulus -> expected chunk length


_CDC_ALLB_SPARK = """CASE WHEN size(cdc_bounds) > 0
          AND element_at(cdc_bounds, -1) = length(text)
     THEN cdc_bounds
     ELSE concat(cdc_bounds, array(length(text))) END"""

_CDC_CHUNKS_SPARK = """transform(cdc_allb,
  (x, j) -> substring(text,
                      CASE WHEN j = 0 THEN 0
                           ELSE element_at(cdc_allb, j) END + 1,
                      x - CASE WHEN j = 0 THEN 0
                           ELSE element_at(cdc_allb, j) END))"""


def _cdc_bounds_spark() -> str:
    """Spark SQL expression: text -> ascending array<int> of cut
    positions (position i cuts AFTER character i when the hash of the
    trailing window hits the residue)."""
    bound_hash = _sha32(f"substring(text, i - {_CDC_W - 1}, {_CDC_W})")
    return f"""filter(
      transform(
        CASE WHEN length(text) >= {_CDC_W}
             THEN sequence({_CDC_W}, length(text)) ELSE array() END,
        i -> CASE WHEN {bound_hash} % {_CDC_M} = {_CDC_M - 1} THEN i END),
      x -> x IS NOT NULL)"""


def _cdc_duck_chunks(bound_hash: str) -> str:
    """DuckDB CTE chain ``b → ab → ch``: per-position boundary predicate
    (``bound_hash`` is an SQL expression over ``text`` and the 1-based
    position ``i``) → forced final bound → chunk slices. Shared by the
    sha and rolling variants so the slicing arithmetic cannot drift."""
    return f"""
b AS (
  SELECT doc_id, text, length(text) AS len,
         list_filter(
           list_transform(range({_CDC_W}, length(text) + 1),
             i -> CASE WHEN {bound_hash}
                            % {_CDC_M} = {_CDC_M - 1}
                       THEN i END),
           x -> x IS NOT NULL) AS bounds
  FROM documents
), ab AS (
  SELECT doc_id, text, len,
         CASE WHEN len(bounds) > 0 AND bounds[-1] = len THEN bounds
              ELSE list_append(bounds, len) END AS allb
  FROM b
), ch AS (
  SELECT doc_id, len,
         list_transform(allb, (x, i) ->
           substr(text,
                  CAST(CASE WHEN i = 1 THEN 0 ELSE allb[i - 1] END AS INTEGER) + 1,
                  CAST(x - CASE WHEN i = 1 THEN 0 ELSE allb[i - 1] END AS INTEGER)))
           AS chunks
  FROM ab
)"""


def _cdc_duck_summary(chunks_cte: str) -> str:
    """DuckDB per-doc chunk summary over a ``ch`` CTE — the shared
    output contract of both CDC chunkers (chunk identity stays sha32
    in BOTH variants: rolling hashes pick BOUNDARIES; content identity
    always uses the strong hash, as production CDC stores do)."""
    return f"""
WITH {chunks_cte}
SELECT doc_id,
       CAST(len(chunks) AS BIGINT) AS n_chunks,
       CAST(list_max(list_transform(chunks, c -> length(c))) AS BIGINT)
         AS max_chunk_len,
       CAST(list_sum(list_transform(chunks,
              c -> {_sha32_duck("c")})) AS BIGINT) AS chunk_checksum,
       CAST(len AS BIGINT) AS chars_total
FROM ch
ORDER BY doc_id
"""


_CDC_DUCK_CHUNKS = _cdc_duck_chunks(
    _sha32_duck(f"substr(text, CAST(i AS INTEGER) - {_CDC_W - 1}, {_CDC_W})")
)

_CDC_ORACLE = _cdc_duck_summary(_CDC_DUCK_CHUNKS)


@register("dedup_cdc_chunking", oracle=_CDC_ORACLE, tags=("dedup", "text"))
def dedup_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content-defined chunk fingerprints: cut positions
    where sha32 of the trailing 8-CHARACTER window ≡ 63 (mod 64 — see
    _CDC_W/_CDC_M), final boundary forced at end-of-text; emit the
    chunk count, the largest chunk, the sum of chunk fingerprints (the
    content-addressed identity the reuse query joins on), and the
    character total (= doc length — conservation is part of the
    contract). Units are CHARACTERS, not bytes: both engines' length/
    substring count code points, so on multibyte text the window is 8
    characters of varying byte width; a byte-exact variant would hash
    the UTF-8 binary instead.

    Scale: the entire chunker is higher-order Catalyst expressions
    (sequence → transform → filter → transform) evaluated per row in
    the scan stage — zero shuffles, zero Python, no exploded copies of
    the text; per-row cost is O(len·w) window hashes, embarrassingly
    parallel. A production deployment swaps the sha window hash for a
    gear/rolling hash inside the same lambda. Boundary decisions are
    per-position independent (basic CDC), which is exactly what makes
    this expressible without a sequential pass.

    r17: "embarrassingly parallel" only materializes when the scan has
    splits — on the single-split fixtures the whole O(len·w) chain ran
    in ONE task (the documented repartition-rejection was about an
    UNCONDITIONAL repartition at 100 TB; the gated fan_out is identity
    exactly there, so both sides of that trade now hold)."""
    d = fan_out(_t(spark, sf_dir, "documents"), sf_dir, "documents")
    chunked = (
        d.select(
            "doc_id", "text", F.expr(_cdc_bounds_spark()).alias("cdc_bounds")
        )
        .withColumn("cdc_allb", F.expr(_CDC_ALLB_SPARK))
        .select("doc_id", F.expr(_CDC_CHUNKS_SPARK).alias("chunks"))
    )
    return _cdc_summary_spark(chunked)


def _cdc_summary_spark(chunked: DataFrame) -> DataFrame:
    """Per-doc chunk summary over a (doc_id, chunks) frame — the shared
    output contract of both CDC chunkers (see ``_cdc_duck_summary``)."""
    return chunked.select(
        "doc_id",
        F.size("chunks").cast("bigint").alias("n_chunks"),
        F.expr("array_max(transform(chunks, c -> length(c)))")
        .cast("bigint")
        .alias("max_chunk_len"),
        F.expr(
            f"aggregate(chunks, CAST(0 AS BIGINT), (acc, c) -> acc + {_sha32('c')})"
        ).alias("chunk_checksum"),
        F.expr("aggregate(chunks, CAST(0 AS BIGINT), (acc, c) -> acc + length(c))")
        .alias("chars_total"),
    ).orderBy("doc_id")


# ---- rolling-hash CDC twin (the production boundary-cost model) -------
#
# The sha chunker above is the cross-engine-PORTABILITY anchor: sha256
# is byte-identical everywhere, but costs ~a compression-function run
# per position. Production CDC (LBFS, rsync, FastCDC) detects
# boundaries with a cheap rolling/gear hash and reserves the strong
# hash for CHUNK IDENTITY. This twin does exactly that: the boundary
# predicate becomes an 8-term Horner polynomial over per-character
# code points — pure int64 multiply-adds that whole-stage codegen
# compiles to straight-line arithmetic — while chunk fingerprints stay
# sha32 so the two variants' stores speak the same identity.
#
# Two deliberate design points:
# - The text is decomposed ONCE per row into a code-point array
#   (split + ascii). Per-position substring(text, i, 1) would re-scan
#   the UTF8String from byte 0 on every call (O(n²) per doc);
#   element_at on the array is O(1). The array is row-local scratch —
#   it never shuffles.
# - Per position the window hash is recomputed from its 8 characters
#   (O(w) int ops) rather than carried incrementally (O(1)). A true
#   rolling carry needs a sequential scan, which Spark SQL has no HOF
#   for — aggregate() folds to ONE value, and an array-accumulator
#   rebuild is O(n²) copy churn. Stateless-per-position is what keeps
#   the operator embarrassingly parallel, and w = 8 integer
#   multiply-mods is already ~2 orders of magnitude below the sha
#   compression function (measured: see BENCH extended rows for the
#   two variants side by side).
#
# Engine agreement: Spark ascii() and DuckDB unicode() both return the
# full first code point (verified identical on é/中/𝄞 and on this
# corpus, which is pure ASCII 32–121 at every SF); the Horner mod
# Q = 2³¹−1 keeps every intermediate < 2⁵¹, inside exact int64 on both
# engines (DuckDB would raise on overflow rather than wrap — the bound
# is proven, not hoped).

_CDC_RP = 1_000_003  # Horner base (odd, > any code point)
_CDC_RQ = 2_147_483_647  # modulus 2³¹−1 (Mersenne prime)


def _cdc_roll_hash_spark(i: str = "i") -> str:
    """Spark SQL: Horner window hash of the ``_CDC_W`` code points
    ending at 1-based position ``i`` of the ``cdc_cp`` array."""
    h = f"element_at(cdc_cp, {i} - {_CDC_W - 1})"
    for k in range(_CDC_W - 2, -1, -1):
        c = (
            f"element_at(cdc_cp, {i} - {k})"
            if k
            else f"element_at(cdc_cp, {i})"
        )
        h = f"(({h} * {_CDC_RP} + {c}) % {_CDC_RQ})"
    return h


def _cdc_roll_hash_duck(i: str = "i") -> str:
    """DuckDB spelling of ``_cdc_roll_hash_spark`` (unicode ∘ substr
    per character — O(n) scans are fine at oracle scale)."""

    def c(off: int) -> str:
        pos = f"CAST({i} - {off} AS INTEGER)" if off else f"CAST({i} AS INTEGER)"
        # BIGINT at the leaf — DuckDB's unicode() is INT32 and the
        # Horner multiply overflows it (same fix as the Spark side)
        return f"CAST(unicode(substr(text, {pos}, 1)) AS BIGINT)"

    h = c(_CDC_W - 1)
    for k in range(_CDC_W - 2, -1, -1):
        h = f"(({h} * {_CDC_RP} + {c(k)}) % {_CDC_RQ})"
    return h


def _cdc_roll_bounds_spark() -> str:
    """Spark SQL: cut positions under the rolling-polynomial boundary
    predicate (same residue contract as the sha variant)."""
    return f"""filter(
      transform(
        CASE WHEN size(cdc_cp) >= {_CDC_W}
             THEN sequence({_CDC_W}, size(cdc_cp)) ELSE array() END,
        i -> CASE WHEN {_cdc_roll_hash_spark()} % {_CDC_M} = {_CDC_M - 1}
                  THEN i END),
      x -> x IS NOT NULL)"""


_CDC_ROLL_ORACLE = _cdc_duck_summary(_cdc_duck_chunks(_cdc_roll_hash_duck()))


@register(
    "dedup_cdc_chunking_rolling",
    oracle=_CDC_ROLL_ORACLE,
    tags=("dedup", "text"),
)
def dedup_cdc_chunking_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_cdc_chunking with the production boundary-hash cost model:
    cut positions where an 8-character Horner polynomial over code
    points (mod 2³¹−1) ≡ 63 (mod 64); chunk identity stays sha32.
    Output contract identical to the sha twin (n_chunks, max chunk,
    fingerprint checksum, conservation total) — only the boundary
    PLACEMENT differs, because a different hash picks different cut
    points on the same content.

    Scale: same plan shape as the sha twin — one scan, zero shuffles,
    zero Python, no exploded text copies (plan-pinned alongside it) —
    with the per-position constant dropped from a sha256 compression
    run to 8 int64 multiply-mods on an O(1)-indexed code-point array
    (see the block comment above for why stateless-per-position beats
    a sequential rolling carry in a distributed HOF setting).

    r17: gated fan_out above the chain (same rationale as the sha
    twin — the scan stage is the whole operator)."""
    d = fan_out(_t(spark, sf_dir, "documents"), sf_dir, "documents")
    chunked = (
        d.select(
            "doc_id",
            "text",
            # CAST to BIGINT at decomposition: ascii() is INT and the
            # Horner multiply would overflow 32-bit under ANSI mode
            F.expr(
                "transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))"
            ).alias("cdc_cp"),
        )
        .select(
            "doc_id",
            "text",
            F.expr(_cdc_roll_bounds_spark()).alias("cdc_bounds"),
        )
        .withColumn("cdc_allb", F.expr(_CDC_ALLB_SPARK))
        .select("doc_id", F.expr(_CDC_CHUNKS_SPARK).alias("chunks"))
    )
    return _cdc_summary_spark(chunked)


@register(
    "dedup_cdc_chunking_vectorized",
    oracle=_CDC_ROLL_ORACLE,
    tags=("dedup", "text"),
)
def dedup_cdc_chunking_vectorized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The rolling-hash chunker in its production execution shape:
    Arrow-batched mapInPandas computing the SAME 8-term Horner boundary
    polynomial as dedup_cdc_chunking_rolling — bit-identical cut
    positions, chunk identities, and output rows, hence the SAME DuckDB
    oracle — with numpy doing the per-position work vectorized.

    Why this exists alongside the pure-HOF twin: Spark evaluates
    higher-order-function lambdas INTERPRETED (transform/filter/
    aggregate never enter whole-stage codegen), so swapping sha256 for
    8 int64 multiply-mods inside a transform only bought ~1.7× on the
    boundary pass — the expression-interpreter constant dominates once
    the hash is cheap (measured r11, SCALE.md). Real CDC chunkers
    (LBFS, rsync, FastCDC) are imperative loops over bytes; the honest
    Spark translation of that is a vectorized Arrow kernel, which is
    exactly the sanctioned fallback for semantics the built-in
    operators can't express EFFICIENTLY. The code-point decode is
    utf-32-le reinterpretation (vectorized, exact for any text, not an
    ASCII shortcut) and the window hash is W numpy passes over the
    whole batch — no per-character Python.

    Scale: one scan, zero shuffles before the final presentation sort;
    Arrow batches stream through the kernel with O(batch) memory;
    embarrassingly parallel across file splits; per-chunk identity
    stays sha256-derived so a chunk store built by ANY of the three
    variants interoperates. Plan-pinned: exactly one MapInPandas, no
    Exchange below the sort, no row-at-a-time BatchEvalPython.

    r17 measured, deliberately NOT fanned out: a gated fan_out above
    the kernel bought only 1.12x at sf0.1 (1.19 -> 1.07 s interleaved
    A/B — the numpy kernel is already fast, so the fixed session cost
    dominates) and would cost the exchange-free-kernel plan pin below;
    the sha/HOF twins carry the fan-out where it pays 4-6x."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    out_schema = (
        "doc_id bigint, n_chunks bigint, max_chunk_len bigint, "
        "chunk_checksum bigint, chars_total bigint"
    )
    return d.mapInPandas(_cdc_vectorized_kernel, out_schema).orderBy(
        "doc_id"
    )


def _cdc_vectorized_kernel(batches):
    """The Arrow kernel of dedup_cdc_chunking_vectorized, module-level
    so property tests can drive it directly on arbitrary (incl.
    non-ASCII / non-BMP) text against an independent reference."""
    import hashlib

    import numpy as np
    import pandas as pd

    W, M, P, Q = _CDC_W, _CDC_M, _CDC_RP, _CDC_RQ
    for pdf in batches:
        ids, nch, mxl, cks, tot = [], [], [], [], []
        for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
            n = len(text)
            if n >= W:
                # exact code points, vectorized: utf-32-le bytes ARE
                # the code-point array (no ASCII assumption)
                cp = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                h = cp[: n - W + 1].copy()
                for k in range(1, W):
                    h *= P
                    h += cp[k : k + n - W + 1]
                    h %= Q
                # h[j] = Horner hash of text[j:j+W]; window END is
                # 1-based position j+W — same contract as the SQL
                cuts = np.nonzero(h % M == M - 1)[0] + W
            else:
                cuts = np.empty(0, dtype=np.int64)
            if cuts.size == 0 or cuts[-1] != n:
                bounds = np.append(cuts, n)
            else:
                bounds = cuts
            starts = np.concatenate(([0], bounds[:-1]))
            checksum = 0
            max_len = 0
            for s, e in zip(starts, bounds):
                chunk = text[s:e]
                if e - s > max_len:
                    max_len = int(e - s)
                # identical value to the SQL _sha32: first 4 bytes
                # of sha256 over the UTF-8 encoding, unsigned
                checksum += int.from_bytes(
                    hashlib.sha256(chunk.encode("utf-8")).digest()[:4],
                    "big",
                )
            ids.append(int(doc_id))
            nch.append(int(bounds.size))
            mxl.append(max_len)
            cks.append(checksum)
            tot.append(n)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_chunks": pd.Series(nch, dtype="int64"),
                "max_chunk_len": pd.Series(mxl, dtype="int64"),
                "chunk_checksum": pd.Series(cks, dtype="int64"),
                "chars_total": pd.Series(tot, dtype="int64"),
            }
        )



_CDC_REUSE_ORACLE = f"""
WITH {_CDC_DUCK_CHUNKS}, ex AS (
  SELECT doc_id, unnest(chunks) AS chunk FROM ch
), g AS (
  SELECT substr(sha256(chunk), 1, 32) AS h, length(chunk) AS clen,
         COUNT(*) AS cnt
  FROM ex GROUP BY 1, 2
)
SELECT CAST(SUM(cnt) AS BIGINT) AS n_chunks_total,
       CAST(COUNT(*) AS BIGINT) AS n_chunks_distinct,
       CAST(SUM(clen * cnt) AS BIGINT) AS chars_total,
       CAST(SUM(clen) AS BIGINT) AS chars_stored,
       CAST(SUM(clen * cnt) - SUM(clen) AS BIGINT) AS chars_saved
FROM g
"""


@register(
    "dedup_cdc_chunk_reuse", oracle=_CDC_REUSE_ORACLE, tags=("dedup", "text")
)
def dedup_cdc_chunk_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level chunk-store accounting over the CDC fingerprints:
    how many chunks a content-addressed store would hold (distinct
    (fingerprint, length) pairs) vs. how many the corpus emits, and
    the byte savings — the question CDC exists to answer, and the
    cross-document counterpart of dedup_cdc_chunking's per-doc rows
    (boundaries being content-defined is what lets two documents
    sharing a paragraph produce bit-identical middle chunks).

    Scale: chunking stays map-side (see dedup_cdc_chunking); only
    (128-bit fingerprint, length) pairs — ~40 bytes — shuffle, never
    chunk text, and the distinct-pair aggregate is the same
    partial-combine shape as dedup_exact. One corpus scan."""
    # gated fan_out (r17): the O(len·w) window-hash chunker runs in the
    # scan stage — ONE task on the single-split local fixtures (identity
    # on multi-split layouts); same rationale and win profile as
    # dedup_cdc_chunking (6.4x in the r17 interleaved A/B).
    d = fan_out(_t(spark, sf_dir, "documents"), sf_dir, "documents")
    fp = (
        d.select(
            "doc_id", "text", F.expr(_cdc_bounds_spark()).alias("cdc_bounds")
        )
        .withColumn("cdc_allb", F.expr(_CDC_ALLB_SPARK))
        .select(F.explode(F.expr(_CDC_CHUNKS_SPARK)).alias("chunk"))
        .select(
            # 128-bit store identity (r10 advisory): the 32-bit sha
            # prefix suffers birthday collisions at realistic corpus
            # scales (≈50% at 2¹⁶ distinct chunks), conflating distinct
            # chunks and overstating chars_saved; 128 bits is the
            # standard content-addressed-store width. It is a grouping
            # key only — no int64 arithmetic touches it — so the full
            # hex prefix stays oracle-portable.
            F.expr(
                "substring(sha2(cast(chunk as binary), 256), 1, 32)"
            ).alias("h"),
            F.length("chunk").alias("clen"),
        )
    )
    # ONE grouped pass: the O(len·w) chunker runs once (a separate
    # distinct-branch would re-scan and re-chunk the whole corpus —
    # r10 review), then a single scalar aggregate over the ≤|distinct|
    # group table yields both the total and the deduplicated view
    g = fp.groupBy("h", "clen").agg(F.count(F.lit(1)).alias("cnt"))
    return g.agg(
        F.sum("cnt").cast("bigint").alias("n_chunks_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks_distinct"),
        F.sum(F.col("clen") * F.col("cnt")).cast("bigint").alias("chars_total"),
        F.sum("clen").cast("bigint").alias("chars_stored"),
        (
            F.sum(F.col("clen") * F.col("cnt")) - F.sum("clen")
        ).cast("bigint").alias("chars_saved"),
    )


# --------------------------------------------------------------------------
# n-gram novelty profiling (memorization curve by arrival order)
# --------------------------------------------------------------------------

_NOVELTY_ORACLE = f"""
WITH {_shingle_base_cte()}, f AS (
  SELECT shingle, CAST(MIN(doc_id) AS BIGINT) AS first_doc
  FROM e GROUP BY shingle
)
SELECT e.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
FROM e JOIN f ON f.shingle = e.shingle
GROUP BY e.doc_id
ORDER BY e.doc_id
"""


@register("text_ngram_novelty", oracle=_NOVELTY_ORACLE, tags=("text", "dedup", "audit"))
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY in doc_id (arrival) order: the share
    of a document's distinct 3-gram shingles whose FIRST corpus
    occurrence is that document. Pairwise dedup asks "does a partner
    exist"; novelty asks "how much of this document is new at the time
    it arrives" — the memorization/staleness curve a corpus audit reads
    before deciding how much more of a source to ingest (exact copies
    score 0 unless first; boilerplate-heavy docs score low even with no
    single dominant partner). Corpus-global across langs on purpose:
    novelty is a property of the text, not of a label. Reference has no
    analog.

    Shares the shingle definition with the entire LSH family
    (:func:`_shingles` on the Spark side, :func:`_shingle_base_cte` in
    the oracle — factored from ``_minhash_cte`` this round so a fourth
    consumer could not re-derive it).

    Scale (100 TB): one shingle explode + a min-groupBy on shingle +
    one shingle-keyed join back — two shuffles of the (shingle, doc_id)
    relation, no text movement past the explode, never all-pairs. The
    min-aggregate is the same first-occurrence shape as dedup_exact's
    keeper rule, lifted from digests to shingles."""
    sh = _shingles(_t(spark, sf_dir, "documents")).select("doc_id", "shingle")
    first = sh.groupBy("shingle").agg(
        F.min("doc_id").cast("bigint").alias("first_doc")
    )
    is_novel = F.expr("CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END")
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(is_novel).cast("bigint").alias("n_novel"),
            F.round(
                F.sum(is_novel) / F.count(F.lit(1)).cast("double"), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )
