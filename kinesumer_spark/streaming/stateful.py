"""Custom stateful streaming operator via applyInPandasWithState —
the engine's answer for per-key logic Spark's built-in stateful ops
can't express (SURVEY.md §2.2 UDF row: "applyInPandasWithState for
custom stateful operators").

The demonstrator is a per-user running counter/sum: the microbatch-
spanning state the reference keeps per shard in its offsets sync.Map
(kinesumer.go:155-160), generalized to arbitrary keys. State is one
fixed-size row per key in Spark's state store — partitioned by key,
recoverable from the checkpoint like every other stateful op.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum) across microbatches.

    Emits the updated running totals for each user touched by a batch
    ("update" semantics downstream). NoTimeout: state lives for the
    query's life; production variants set ProcessingTimeTimeout to GC
    idle keys — the reference's 10 s staleness prune (O8/O9) analog.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EXPIRING_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, expired boolean"
)
EXPIRING_STATE_SCHEMA = "n bigint, total double, last_ts_ms bigint"


def _make_expiring_update(ttl_ms: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # idle-key GC: emit the final row tagged expired, drop state
            n, total, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                    "expired": [True],
                }
            )
            return
        n, total, last_ts_ms = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max_ms = int(pdf["ts"].max().value // 1_000_000)
            last_ts_ms = max(last_ts_ms, batch_max_ms)
        state.update((n, total, last_ts_ms))
        # Expire when the watermark passes last-seen event time + TTL.
        # Spark requires the timeout timestamp to be ahead of the current
        # watermark; a key fed only very-late data is floored just past it
        # (it will expire at the next watermark advance — already idle).
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_ts_ms + ttl_ms, wm + 1))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "expired": [False],
            }
        )

    return update


def running_user_totals_with_ttl(
    events: DataFrame,
    ttl_ms: int = 10_000,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """``running_user_totals`` + EventTimeTimeout idle-key GC — the
    analog of the reference's staleness prune (syncclient.go:171-201,
    O8/O9: clients/shards unseen for 10 s are pruned from the
    coordination table). A key whose last event time is more than
    ``ttl_ms`` behind the watermark fires a timeout callback: its final
    totals are emitted tagged ``expired = true`` and the state row is
    removed, so state-store size tracks the ACTIVE key set, not the
    all-time key set — at 100 TB / billions of keys, unbounded per-key
    state is otherwise a slow leak (RocksDB keeps it off-heap, but
    compaction and checkpoint size still scale with dead keys).

    Event-time (not wall-clock) expiry is deliberate: it is
    deterministic under replay/backfill, needs no empty-batch triggers
    (ProcessingTimeTimeout re-arms timers every microbatch, so a query
    with pending timers never quiesces), and the watermark is the same
    lateness contract the windowed aggs already use. ``events`` must
    carry an event-time column ``ts``; expiry fires at the first
    microbatch after the watermark passes ``last_seen + ttl_ms``.
    """
    return (
        events.select("user_id", "value", "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_expiring_update(ttl_ms),
            outputStructType=EXPIRING_OUTPUT_SCHEMA,
            stateStructType=EXPIRING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# -- streaming conversion funnel --------------------------------------------

# Sentinel -1 = "not seen yet" (epoch-micros are positive); arrays in the
# state row are supported by the Arrow state codec.
FUNNEL_OUTPUT_SCHEMA = (
    "user_id bigint, signup_us bigint, conv_us bigint, n_seen bigint"
)
FUNNEL_STATE_SCHEMA = (
    "signup_us bigint, conv_us bigint, pending array<bigint>, n_seen bigint"
)


def _update_funnel(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user funnel state: earliest signup, earliest purchase strictly
    after it, and the PENDING purchases at-or-before the current signup.

    Pending exists because event time and arrival order differ across
    microbatches: a purchase at t ≤ current-first-signup cannot qualify
    now, but an even-earlier signup may still arrive (s < t), promoting
    it — dropping such purchases would make the stream answer diverge
    from the batch answer on exactly the out-of-order streams this
    operator exists for. State size is O(purchases before the user's
    earliest-seen signup) — bounded by per-user pre-signup activity,
    not stream length (a production deployment caps it with a TTL like
    running_user_totals_with_ttl).
    """
    (user_id,) = key
    if state.exists:
        signup, conv, pending, n_seen = state.get
        pending = list(pending)
    else:
        signup, conv, pending, n_seen = -1, -1, [], 0
    for pdf in pdfs:
        n_seen += len(pdf)
        s = pdf.loc[pdf["event_type"] == "signup", "tus"]
        if len(s):
            m = int(s.min())
            signup = m if signup < 0 else min(signup, m)
        pending.extend(int(x) for x in pdf.loc[pdf["event_type"] == "purchase", "tus"])
    # promotion AFTER the batch is folded in: a signup learned in this
    # batch applies to this batch's and all pending purchases alike
    if signup >= 0:
        qualifying = [t for t in pending if t > signup]
        if qualifying:
            q = min(qualifying)
            conv = q if conv < 0 else min(conv, q)
        pending = [t for t in pending if t <= signup]
    state.update((signup, conv, sorted(pending), n_seen))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "signup_us": [signup],
            "conv_us": [conv],
            "n_seen": [n_seen],
        }
    )


def funnel_conversions(events: DataFrame) -> DataFrame:
    """Streaming signup→purchase funnel state per user. ``events`` must
    carry (user_id, event_type, tus epoch-micros). Update-mode output:
    one row per touched user per batch with the current
    (signup_us, conv_us) — -1 until seen — plus the monotone n_seen for
    last-emission selection downstream. Exactly the batch
    ``events_funnel`` semantics on a finite stream (equivalence-gated in
    tests/test_streaming_engine.py)."""
    return (
        events.select("user_id", "event_type", "tus")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# -- transformWithStateInPandas (Spark 4.x arbitrary-state API) --------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

TWS_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value bigint"


class UserTotalsProcessor(StatefulProcessor):
    """Per-user running (count, integer-micro sum) on the Spark 4
    ``transformWithStateInPandas`` API — the successor to
    applyInPandasWithState with NAMED state primitives (value/list/map
    states, timers, TTL) instead of one monolithic state tuple. This
    processor is the running_user_totals semantics re-expressed on the
    new API so the engine exercises both stateful surfaces; the
    equivalence is driver-proven by carrying the identical batch oracle.

    State: one ValueState row per key, (n bigint, total bigint) —
    fixed-size, RocksDB-backed (the API requires the RocksDB provider),
    partitioned by the grouping key like every stateful op.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n bigint, total bigint")

    def handleInputRows(self, key, rows, timerValues):
        got = self._totals.get()
        n, total = got if got is not None else (0, 0)
        for pdf in rows:
            n += len(pdf)
            total += int(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals via transformWithStateInPandas
    (update semantics, no time mode). ``events`` must carry
    (user_id, value: bigint integer-micros)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserTotalsProcessor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---- cross-microbatch near-dup admission index (r13) -----------------------
# State keyed by LSH band bucket (lang, band, key1, key2): the bucket's
# full arrival history as parallel arrays (doc ids + JSON-encoded
# distinct-shingle sets). Every arriving doc is exact-verified against
# every EARLIER arrival in the bucket (state + earlier rows of the same
# microbatch, processed in arrival order), then joins the bucket index
# itself — the admit-and-index semantics the reference's checkpointed
# consume loop keeps across scans (kinesumer.go:615-704;
# statestore.go:260-281). Idempotent under batch replay: a doc already
# present in the bucket's id list is neither re-verified nor re-added,
# so a restart that re-runs an uncommitted microbatch emits the same
# pair set (the exactly-once property stream_neardup_admit_restart
# proves end-to-end).

ADMIT_OUTPUT_SCHEMA = "doc_id bigint, partner bigint, jaccard double"
ADMIT_STATE_SCHEMA = "ids array<bigint>, sets array<string>"
# Fused-output schema (r15): the same operator can ALSO pass the
# index-maintenance rows through its output — kind='pair' rows carry
# the verified pair columns, kind='idx' rows carry the band-bucket key
# + the doc's shingle set (the exact rows the compacted index stores)
# — so ONE source read and ONE state pass feed BOTH the pair sink and
# the compacted index (the fusion the compacted twin's docstring
# defers to production).
ADMIT_FUSED_OUTPUT_SCHEMA = (
    "kind string, doc_id bigint, partner bigint, jaccard double,"
    " lang string, band int, key1 bigint, key2 bigint,"
    " sh_set array<string>"
)


def _bucket_verify_rows(
    ids: list,
    sets: list,
    rows,
    horizon: int | None,
):
    """The admit family's ONE verify kernel, shared verbatim by the
    applyInPandasWithState update fn (_make_bucket_update) and the
    transformWithStateInPandas processor (BucketAdmitProcessor) — the
    two state APIs must never fork the arithmetic (the r15 fused-probe
    rule: adjudicate state-API economics with the SAME kernel, or the
    measurement measures the fork).

    ``rows`` is a pandas frame sorted ascending by doc_id carrying
    (doc_id, sh_set). Mutates ids/sets in place (appends each fresh
    arrival) and returns (out_doc, out_partner, out_j, fresh_doc,
    fresh_sh): the tau-passing pairs plus the fresh arrivals (for index
    emission / state append). Replay-idempotent: a doc already in ids
    is neither re-verified nor re-appended."""
    from decimal import ROUND_HALF_UP, Decimal

    seen = set(ids)
    q6 = Decimal("0.000001")
    out_doc: list[int] = []
    out_partner: list[int] = []
    out_j: list[float] = []
    fresh_doc: list[int] = []
    fresh_sh: list[list[str]] = []
    for doc_id, sh_list in zip(rows["doc_id"], rows["sh_set"]):
        d = int(doc_id)
        if d in seen:  # replayed microbatch — already verified
            continue
        fresh_doc.append(d)
        fresh_sh.append([str(x) for x in sh_list])
        # ordering tripwire: the staging contract (chunk files fed
        # in ascending-doc_id order) is what makes "partner arrived
        # earlier" equal "partner < doc_id" — a violation must fail
        # loudly, not silently mis-attribute the rejection side
        if ids and d < ids[-1]:
            raise ValueError(
                f"out-of-order arrival: doc {d} after {ids[-1]} "
                "in the same bucket (staging contract broken)"
            )
        s = frozenset(sh_list)
        ns = len(s)
        for pid, ps in zip(ids, sets):
            if horizon is not None and pid < d - horizon:
                continue  # expired for THIS doc (prune happens after)
            shared = len(s & ps)
            if shared == 0:
                continue
            # IEEE double division then shortest-repr HALF_UP
            # rounding — bit-compatible with Spark's round(x, 6)
            j = float(
                Decimal(repr(shared / (ns + len(ps) - shared))).quantize(
                    q6, rounding=ROUND_HALF_UP
                )
            )
            if j >= 0.5:
                out_doc.append(d)
                out_partner.append(pid)
                out_j.append(j)
        ids.append(d)
        sets.append(s)
        seen.add(d)
    return out_doc, out_partner, out_j, fresh_doc, fresh_sh


def _prune_horizon(ids: list, sets: list, horizon: int | None):
    """Exact TTL prune shared by both state APIs: drop entries below
    max(ids) − horizon. Arrivals are ascending, so a dropped entry can
    never be in-horizon for any future doc — eviction changes no
    verdict, only state size. Returns (ids, sets, pruned_any)."""
    if horizon is not None and ids:
        cut = max(ids) - horizon
        keep = [i for i, pid in enumerate(ids) if pid >= cut]
        if len(keep) < len(ids):
            return [ids[i] for i in keep], [sets[i] for i in keep], True
    return ids, sets, False


def _make_bucket_update(horizon: int | None, emit_index: bool = False):
    """Build the bucket-index update fn. ``horizon=None`` keeps the full
    arrival history; ``horizon=T`` verifies only against partners within
    the last T arrivals (arrival index = doc_id, ascending by the
    staging contract) AND PRUNES expired entries from state — the
    bounded-state production form: per-bucket state tracks the active
    horizon, not the all-time arrival count. The prune is exact, not
    heuristic: arrivals are ascending, so an entry below
    max(batch) − T can never verify against any future doc.

    ``emit_index=True`` (the FUSED form, output schema
    ``ADMIT_FUSED_OUTPUT_SCHEMA``) additionally passes every FRESH
    arrival's (bucket key, doc_id, sh_set) through the output as a
    kind='idx' row — replay-idempotent exactly like the pair emission:
    a replay of a COMMITTED batch (doc already in state) emits neither,
    so it contributes no duplicate idx rows; a replay of an UNCOMMITTED
    batch re-emits, which the sink's per-(batchId, sink) markers guard
    (queries.py stream_neardup_admit_fused)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import json

        ids: list[int]
        if state.exists:
            st_ids, st_sets = state.get
            ids = list(st_ids)
            sets = [frozenset(json.loads(s)) for s in st_sets]
        else:
            ids, sets = [], []

        rows = pd.concat(list(pdfs), ignore_index=True)
        # arrival order within the microbatch = ascending doc_id (the
        # staging writer feeds chunks in doc_id order; within a chunk
        # the sort below is the arrival tiebreak)
        rows = rows.sort_values("doc_id", kind="mergesort")
        out_doc, out_partner, out_j, idx_doc, idx_sh = _bucket_verify_rows(
            ids, sets, rows, horizon
        )
        ids, sets, _ = _prune_horizon(ids, sets, horizon)
        state.update(
            (ids, [json.dumps(sorted(s)) for s in sets])
        )
        if not emit_index:
            if out_doc:
                yield pd.DataFrame(
                    {
                        "doc_id": out_doc,
                        "partner": out_partner,
                        "jaccard": out_j,
                    }
                )
            return
        # fused form: pair rows + idx rows through ONE output
        lang_k, band_k, key1_k, key2_k = key
        frames = []
        if out_doc:
            frames.append(
                pd.DataFrame(
                    {
                        "kind": "pair",
                        "doc_id": out_doc,
                        "partner": pd.array(out_partner, dtype="Int64"),
                        "jaccard": out_j,
                        "lang": None,
                        "band": pd.array([None] * len(out_doc), dtype="Int32"),
                        "key1": pd.array([None] * len(out_doc), dtype="Int64"),
                        "key2": pd.array([None] * len(out_doc), dtype="Int64"),
                        "sh_set": None,
                    }
                )
            )
        if idx_doc:
            frames.append(
                pd.DataFrame(
                    {
                        "kind": "idx",
                        "doc_id": idx_doc,
                        "partner": pd.array(
                            [None] * len(idx_doc), dtype="Int64"
                        ),
                        "jaccard": pd.array(
                            [None] * len(idx_doc), dtype="Float64"
                        ),
                        "lang": lang_k,
                        "band": pd.array(
                            [band_k] * len(idx_doc), dtype="Int32"
                        ),
                        "key1": pd.array(
                            [key1_k] * len(idx_doc), dtype="Int64"
                        ),
                        "key2": pd.array(
                            [key2_k] * len(idx_doc), dtype="Int64"
                        ),
                        "sh_set": pd.Series(idx_sh, dtype="object"),
                    }
                )
            )
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return update


_update_bucket_index = _make_bucket_update(None)


def bucket_admit_pairs(probe: DataFrame, horizon: int | None = None) -> DataFrame:
    """(doc_id, partner, jaccard) — verified near-dup pairs where
    ``partner`` arrived strictly earlier (and, with ``horizon=T``,
    within the last T arrivals), from a streaming LSH probe relation
    (dedup.stream_inrow_band_probe output). One state row per band
    bucket; the same pair verifying in several buckets is emitted once
    per bucket with an identical jaccard (exact arithmetic), so a
    downstream ``distinct()`` collapses it."""
    return (
        probe.select("lang", "band", "key1", "key2", "doc_id", "sh_set")
        .groupBy("lang", "band", "key1", "key2")
        .applyInPandasWithState(
            _make_bucket_update(horizon),
            outputStructType=ADMIT_OUTPUT_SCHEMA,
            stateStructType=ADMIT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def bucket_admit_pairs_fused(probe: DataFrame) -> DataFrame:
    """The FUSED admit operator: kind='pair' rows (verified pairs) and
    kind='idx' rows (the band-bucket index maintenance relation —
    bucket key + each fresh arrival's shingle set) through ONE output,
    from ONE source read and ONE state pass. The production shape the
    compacted twin's two-read fixture protocol stands in for: a
    foreachBatch sink splits the union by ``kind`` into the pair ledger
    and the bucketed compacted index. Same verify arithmetic — the
    update fn is _make_bucket_update with index emission switched on,
    not a fork."""
    return (
        probe.select("lang", "band", "key1", "key2", "doc_id", "sh_set")
        .groupBy("lang", "band", "key1", "key2")
        .applyInPandasWithState(
            _make_bucket_update(None, emit_index=True),
            outputStructType=ADMIT_FUSED_OUTPUT_SCHEMA,
            stateStructType=ADMIT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class BucketAdmitProcessor(StatefulProcessor):
    """The TTL admit operator on Spark 4's transformWithStateInPandas —
    the r15 fused-probe adjudication's open question made runnable: its
    design rule ("fuse source reads only when the stateful operator is
    JVM-side") left the new API's Arrow-native state channel as the one
    measurable unknown in the admit family's economics. This processor
    is the applyInPandasWithState TTL twin re-expressed on the named-
    state API with the SAME verify kernel (_bucket_verify_rows — not a
    fork), so a bench row comparing the two measures ONLY the state
    channel: one monolithic (ids[], sets[]) tuple re-serialized per
    batch (old API) vs a ListState of (doc_id, sh_json) rows appended
    incrementally and rewritten only on prune (new API).

    State: ListState "entries" (doc_id bigint, sh_json string), one
    list per band bucket, appended per fresh arrival; the TTL prune
    (exact, ascending-arrival argument — _prune_horizon) rewrites the
    list via put() only when something expired. At 100 TB the append-
    only steady state is the win candidate: the old API re-ships the
    whole bucket history through Arrow every batch, the new API ships
    only the delta.

    NOTE (r16): transformWithStateInPandas requires the Python
    ``protobuf`` package (its state server speaks proto to the JVM);
    this container ships without it and installs are out of scope, so
    the measurement is ENVIRONMENT-BLOCKED here — the query registers
    behind tws_supported() exactly like stream_transform_with_state,
    and SCALE.md r16 records the blocked verdict. The wiring is real
    and the kernel is the shared one, so the bench row lights up
    wherever protobuf exists."""

    def __init__(self, horizon: int | None = None):
        self._horizon = horizon

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._entries = handle.getListState(
            "entries", "doc_id bigint, sh_json string"
        )

    def handleInputRows(self, key, rows, timerValues):
        import json

        ids: list[int] = []
        sets: list[frozenset] = []
        for r in self._entries.get():
            ids.append(int(r[0]))
            sets.append(frozenset(json.loads(r[1])))
        n_stored = len(ids)
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        out_doc, out_partner, out_j, _, _ = _bucket_verify_rows(
            ids, sets, pdf, self._horizon
        )
        ids, sets, pruned = _prune_horizon(ids, sets, self._horizon)
        packed = [(d, json.dumps(sorted(s))) for d, s in zip(ids, sets)]
        if pruned:
            # something expired: rewrite the whole (post-prune) list
            self._entries.put(packed)
        elif len(packed) > n_stored:
            # steady state: ship only the fresh arrivals' rows
            self._entries.appendList(packed[n_stored:])
        if out_doc:
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "partner": out_partner,
                    "jaccard": out_j,
                }
            )

    def close(self) -> None:
        pass


def bucket_admit_pairs_tws(
    probe: DataFrame, horizon: int | None = None
) -> DataFrame:
    """bucket_admit_pairs on the transformWithStateInPandas API — same
    probe relation, same kernel, same output schema, so the TTL twin's
    oracle carries over unchanged (the old-API/new-API/batch three-way
    equivalence discipline of running_user_totals_tws). Requires the
    RocksDB state-store provider (API constraint) and the Python
    protobuf package (see BucketAdmitProcessor)."""
    return (
        probe.select("lang", "band", "key1", "key2", "doc_id", "sh_set")
        .groupBy("lang", "band", "key1", "key2")
        .transformWithStateInPandas(
            statefulProcessor=BucketAdmitProcessor(horizon),
            outputStructType=ADMIT_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


# -- Per-source admission cap: the domain-frequency cap ON the stream --------
#
# State is ONE fixed-size row per source (count so far + the high-water
# doc_id) — the counter generalization of the reference's per-shard
# offsets map (kinesumer.go:155-160), applied to corpus governance:
# admit a source's documents until its cap, reject the rest, across
# microbatches. Replay-idempotent exactly like the band-bucket index:
# arrivals ascend by the staging contract, so a doc at-or-below the
# high-water mark was already counted and is skipped (a restarted
# uncommitted microbatch emits the same verdicts).
#
# Bounded-state trade-off, stated precisely: with only (count,
# high-water) a FRESH out-of-order arrival (doc_id below the mark —
# a staging-contract violation) is indistinguishable from a replay and
# would be silently skipped, where the band-bucket index — which keeps
# the full id list — raises on the same violation. That is the price
# of O(1) state per source; a deployment that cannot trust its
# arrival-order contract should carry a per-source id sketch (Bloom)
# beside the counter and raise on sketch misses below the mark.

CAP_OUTPUT_SCHEMA = (
    "doc_id bigint, source string, arrival_rank bigint, admitted boolean"
)
CAP_STATE_SCHEMA = "n bigint, last_id bigint"


def make_source_cap_update(cap: int):
    """Build the per-source counter update fn for ``source_cap_admit``."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        n, last_id = state.get if state.exists else (0, -1)
        out_id: list[int] = []
        out_rank: list[int] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("doc_id", kind="mergesort")
        for doc_id in rows["doc_id"]:
            d = int(doc_id)
            if d <= last_id:  # replayed microbatch — already counted
                continue
            n += 1
            last_id = d
            out_id.append(d)
            out_rank.append(n)
        state.update((n, last_id))
        if out_id:
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "source": source,
                    "arrival_rank": out_rank,
                    "admitted": [r <= cap for r in out_rank],
                }
            )

    return update


def source_cap_admit(stream: DataFrame, cap: int) -> DataFrame:
    """(doc_id, source, arrival_rank, admitted) — per-source admission
    cap over a streaming (doc_id, source) relation: rank = cumulative
    arrival index within the source ACROSS microbatches, admitted iff
    rank <= cap. One state row per source."""
    return (
        stream.select("source", "doc_id")
        .groupBy("source")
        .applyInPandasWithState(
            make_source_cap_update(cap),
            outputStructType=CAP_OUTPUT_SCHEMA,
            stateStructType=CAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# -- Within-stream SEMANTIC admission: per-IVF-cell arrival history ----------
#
# The embedding-space twin of the band-bucket text index
# (_make_bucket_update): state is each IVF cell's arrival history
# (vec ids + their components), every arriving vector is exact-cosine
# verified against every earlier arrival in its assigned cells, then
# joins the cell history itself — admit-and-index in embedding space.
# Replay-idempotent and order-guarded exactly like the bucket op.
#
# Exactness: the cosine runs as a LEFT-ASSOCIATED sequential float64
# loop in pure Python — bit-identical to DuckDB's list_dot_product and
# to the plan-side HOF aggregate (numpy's pairwise/BLAS dot is NOT
# order-stable and is deliberately avoided) — then the same
# shortest-repr HALF_UP quantize the bucket op uses to match round(·,6).

SEM_ADMIT_OUTPUT_SCHEMA = "doc_id bigint, partner bigint, cos double"
# Packed state (r14 verdict #2): one flat array<double> of all cell
# vectors (dim = len(flat)/len(ids)) plus the PRE-COMPUTED norm of each
# — the r14 JSON-string encoding re-serialized and re-parsed the whole
# cell history every microbatch the cell was touched, and the per-pair
# verify recomputed sqrt(dot(pv,pv)) for every partner on every
# arrival. The flat encoding is an Arrow array round-trip (no text
# codec), and the cached norm is BIT-NEUTRAL: it is the identical
# left-assoc sequential dot over the identical floats, computed once
# at arrival instead of once per future pair.
SEM_ADMIT_STATE_SCHEMA = (
    "ids array<bigint>, flat array<double>, norms array<double>"
)


def make_semcell_update(
    tau: float, horizon: int | None = None, cap: int | None = None
):
    """Build the per-cell update fn for ``semcell_admit_pairs``: emits
    (doc, earlier_partner, cos) for every tau-passing pair plus one
    (doc, NULL, cell_max_cos) row per arriving doc that HAD earlier
    eligible cell-mates (so the per-doc rollup's max_cos covers
    sub-tau neighbours exactly like the static gate's).

    ``horizon`` bounds the state (the text admit's TTL discipline,
    stream_neardup_admit_ttl): a doc verifies only against cell-mates
    with id >= d - horizon, and entries below max(arrived) - horizon
    are EVICTED after each batch. The prune is exact: arrivals are
    ascending, so an evicted entry can never be in-horizon for any
    future doc — eviction changes no verdict, only state size.

    ``cap`` bounds the state by MEMBERSHIP COUNT instead (r15 verdict
    #6 — the guard TTL doesn't give when arrivals cluster in one cell):
    a doc verifies only against the cap most RECENT cell-mates, and
    each cell keeps only its last cap entries after every batch. The
    eviction is verdict-safe by the order-statistic analog of the TTL
    argument: arrivals are ascending, so the last-cap set only ever
    changes by appending newer entries — an entry that has fallen out
    of the last cap can never re-enter it for any future doc. The two
    bounds are mutually exclusive (a combined form would need recency
    ranked before the horizon filter, a different relation than either
    oracle)."""
    if horizon is not None and cap is not None:
        raise ValueError("horizon and cap are mutually exclusive bounds")

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math
        from decimal import ROUND_HALF_UP, Decimal

        if state.exists:
            st_ids, st_flat, st_norms = state.get
            ids = list(st_ids)
            norms = list(st_norms)
            dim = len(st_flat) // len(ids) if ids else 0
            # packing guard: dim is INFERRED from the flat buffer, so a
            # ragged pack (schema drift upstream delivering mixed-length
            # vectors into one cell) must fail loudly here — silent
            # truncation would misalign EVERY stored vector and produce
            # wrong cosines with no error (r15 driver advice)
            if ids and len(st_flat) != dim * len(ids):
                raise ValueError(
                    f"packed semcell state violated: {len(st_flat)} floats "
                    f"for {len(ids)} ids (not a multiple) — mixed vector "
                    "dims entered one cell"
                )
            vecs = [
                list(st_flat[i * dim : (i + 1) * dim])
                for i in range(len(ids))
            ]
        else:
            ids, vecs, norms = [], [], []
            dim = 0
        seen = set(ids)
        q6 = Decimal("0.000001")

        def _dot(a: list, b: list) -> float:
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + x * y
            return acc

        out_doc: list[int] = []
        out_partner: list[int | None] = []
        out_cos: list[float] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("doc_id", kind="mergesort")
        for doc_id, e_list in zip(rows["doc_id"], rows["e"]):
            d = int(doc_id)
            if d in seen:  # replayed microbatch — already verified
                continue
            if ids and d < ids[-1]:
                raise ValueError(
                    f"out-of-order arrival: vec {d} after {ids[-1]} "
                    "in the same cell (staging contract broken)"
                )
            e = [float(x) for x in e_list]
            if dim and len(e) != dim:
                raise ValueError(
                    f"vector dim drift: doc {d} arrived with {len(e)} "
                    f"floats in a cell packed at dim {dim}"
                )
            dim = dim or len(e)
            nrm = math.sqrt(_dot(e, e))
            cell_max: float | None = None
            # cap bound: only the cap most recent cell-mates are
            # eligible partners (ids is ascending, so the tail slice
            # IS the most-recent set)
            if cap is not None:
                p_iter = zip(ids[-cap:], vecs[-cap:], norms[-cap:])
            else:
                p_iter = zip(ids, vecs, norms)
            for pid, pv, pn in p_iter:
                if horizon is not None and pid < d - horizon:
                    continue  # out of the arrival window
                c = _dot(e, pv) / (nrm * pn)
                c = float(
                    Decimal(repr(c)).quantize(q6, rounding=ROUND_HALF_UP)
                )
                if cell_max is None or c > cell_max:
                    cell_max = c
                if c >= tau:
                    out_doc.append(d)
                    out_partner.append(pid)
                    out_cos.append(c)
            if cell_max is not None:
                out_doc.append(d)
                out_partner.append(None)
                out_cos.append(cell_max)
            ids.append(d)
            vecs.append(e)
            norms.append(nrm)
            seen.add(d)
        if horizon is not None and ids:
            floor = ids[-1] - horizon
            keep = [i for i, pid in enumerate(ids) if pid >= floor]
            if len(keep) < len(ids):
                ids = [ids[i] for i in keep]
                vecs = [vecs[i] for i in keep]
                norms = [norms[i] for i in keep]
        if cap is not None and len(ids) > cap:
            # membership-cap eviction: keep only the last cap arrivals
            ids = ids[-cap:]
            vecs = vecs[-cap:]
            norms = norms[-cap:]
        flat: list[float] = []
        for v in vecs:
            flat.extend(v)
        state.update((ids, flat, norms))
        if out_doc:
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "partner": pd.array(out_partner, dtype="Int64"),
                    "cos": out_cos,
                }
            )

    return update


def semcell_admit_pairs(
    probe: DataFrame,
    tau: float,
    horizon: int | None = None,
    cap: int | None = None,
) -> DataFrame:
    """(doc_id, partner, cos) — tau-passing earlier partners (plus the
    per-(doc, cell) NULL-partner max rows) from a streaming per-cell
    probe relation (doc_id, cell, e). One state row per IVF cell; the
    same pair verifying in two shared cells emits twice with an
    identical cos, collapsed by the caller's distinct. ``horizon``
    bounds per-cell state to the arrival window, ``cap`` to the last
    cap arrivals (mutually exclusive — see make_semcell_update)."""
    return (
        probe.select("cell", "doc_id", "e")
        .groupBy("cell")
        .applyInPandasWithState(
            make_semcell_update(tau, horizon, cap),
            outputStructType=SEM_ADMIT_OUTPUT_SCHEMA,
            stateStructType=SEM_ADMIT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
