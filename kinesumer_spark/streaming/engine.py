"""Consumer-group engine: the reference's public API surface, Spark-first.

Maps daangn/kinesumer's client (kinesumer.go) onto Structured Streaming:

| reference                                   | here |
|---------------------------------------------|------|
| ``NewKinesumer(cfg)`` bootstrap :188-291    | ``Engine(spark, app, ...)`` |
| ``Consume(streams)`` → record chan :346-370 | ``consume(streams)`` → streaming DF in RECORD_SCHEMA (multi-stream unionByName) |
| shard scan loops O1/O2 :615-704, :513-607   | file-microbatch source (``maxFilesPerTrigger`` ≈ ScanLimit pacing) |
| ``MarkRecord``/``Commit`` O12/O13 :746-804  | per-batch offset ledger written by ``run()``'s foreachBatch wrapper (at-least-once), on top of Spark's exactly-once checkpoint WAL |
| state store (statestore.go)                 | ``checkpoint_root`` dirs + ``consumer_state()`` observability view (statemodel.go:17-53 schema) |
| ``Errors()`` chan O20 :833-844              | ``errors()`` (listener-captured, non-blocking) |
| ``Refresh(streams)`` O18 :817-831           | ``refresh()`` — stop + restart with new source set |
| ``Close()`` drain O22 :846-869              | ``close()`` |

Partition assignment, leader election, heartbeats, rebalance (O5-O10,
O17) have no code here at all: the Spark driver plans each microbatch
and the scheduler assigns source partitions to executors — that is the
entire point of rebuilding on Spark (SURVEY.md §1.3).

Delivery semantics: Spark's checkpoint WAL gives exactly-once batch
bookkeeping; the ledger reproduces the reference's *observable*
at-least-once contract (commit every batch ≈ commit interval → replay
window on crash is one microbatch instead of 5 s of marks).

Scale notes: one streaming DF per stream, unioned — each source lists
and plans its own files/offsets per batch (driver-side, like the
leader's shard-cache refresh O10 but free); state (dedup/window) is
keyed by (stream, shard_id) downstream, so executors scale with shard
count × partitions.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import uuid
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.streaming.envelope import (
    RECORD_SCHEMA,
    events_to_envelope,
)


def _dir_has_data_files(path: str) -> bool:
    """True if ``path`` exists and holds at least one non-hidden file —
    the schema probe runs only then, so real probe failures (corrupt
    footer, permission error) propagate instead of being swallowed by a
    blanket empty-dir fallback."""
    if not os.path.isdir(path):
        return False
    return any(
        e.is_file() and not e.name.startswith((".", "_"))
        for e in os.scandir(path)
    )


def _generic_to_envelope(df: DataFrame, stream: str) -> DataFrame:
    """Adapt a non-file streaming source's rows to RECORD_SCHEMA. The
    source must provide shard_id / sequence_number / partition_key;
    remaining payload columns become the JSON data bytes, and
    arrival_ts derives deterministically from the sequence number (a
    real connector supplies the service timestamp here)."""
    key_cols = {"stream", "shard_id", "sequence_number", "partition_key"}
    payload_cols = [c for c in df.columns if c not in key_cols]
    return df.select(
        F.lit(stream).alias("stream"),
        F.col("shard_id"),
        F.col("sequence_number"),
        F.col("partition_key"),
        F.to_json(F.struct(*payload_cols)).cast("binary").alias("data"),
        F.timestamp_micros(
            F.col("sequence_number").cast("bigint")
        ).alias("arrival_ts"),
    )


def ordered_per_shard(records: DataFrame, fn, output_schema: str) -> DataFrame:
    """Apply ``fn(pdf) -> pdf`` per (stream, shard_id) with rows sorted by
    sequence_number — the reference's processing model (one ordered
    record feed per shard, kinesumer.go O1) as a first-class operator.

    One shuffle on the shard key, then Arrow-batched per-group apply;
    parallelism = number of shards × streams, exactly like the
    reference's goroutine-per-shard fan-out (kinesumer.go:487-499).
    """
    import pandas as pd

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return fn(pdf.sort_values("sequence_number").reset_index(drop=True))

    return records.groupBy("stream", "shard_id").applyInPandas(run, output_schema)


@dataclass
class CommitConfig:
    """Mirror of the reference's CommitConfig (kinesumer.go:77-95).

    ``auto=True`` → the run() wrapper writes the offset ledger after
    every microbatch (the reference flushes marks every 5 s; a
    microbatch is our commit interval). ``auto=False`` → the caller
    invokes ``Engine.commit(batch_df, batch_id)`` inside its sink.

    ``on_sink_error`` extends the reference's fail-fast contract with
    the Kafka-Connect ``errors.tolerance=all`` mode: ``"fail"``
    (default, reference behavior — the query dies and WAL replay
    redelivers the batch) or ``"dlq"`` — a batch whose sink raises is
    written WHOLE to the dead-letter area instead, the error is
    recorded on the side channel, the batch still commits, and the
    stream keeps flowing (poison-pill isolation: one bad batch cannot
    wedge the consumer; the DLQ parquet is replayable via
    ``Engine.replay_from`` semantics — original envelope bytes)."""

    auto: bool = True
    on_sink_error: str = "fail"  # "fail" | "dlq"


@dataclass
class StreamSource:
    """One named stream. ``format="parquet"`` (default): backed by a
    parquet directory (stand-in for a Kinesis stream). Any other value
    is a Spark streaming source format name — e.g. the custom Python
    source ``"kinesumer_sim_stream"`` (sources/python_source.py) —
    read with ``options`` and adapted to the record envelope; the
    delivery/ledger layer is source-agnostic
    (test_consume_from_python_stream_source)."""

    name: str
    path: str = ""
    max_files_per_trigger: int | None = 1
    format: str = "parquet"
    options: dict | None = None


@dataclass(frozen=True)
class ShardLineage:
    """One reshard edge: ``child`` shard was created when ``parent``
    closed at ``parent_end`` (the parent's EndingSequenceNumber).

    This is the piece the reference explicitly punts on —
    ``TODO(mingrammer): handle the closed shards`` (kinesumer.go:314):
    after a Kinesis reshard, per-key ordering only survives if every
    parent record is processed BEFORE any child record. The engine
    enforces exactly that (see ``Engine.consume``'s ``lineage``
    parameter): child-shard rows are deferred — durably, via a loopback
    stream, never buffered on the driver — until the ledger shows the
    parent committed through ``parent_end``. A merge reshard is two
    edges with the same child; the child waits for both parents."""

    stream: str
    child: str
    parent: str
    parent_end: str


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        app: str,
        checkpoint_root: str,
        commit: CommitConfig | None = None,
    ) -> None:
        if not app:
            # errEmptyAppName parity (kinesumer.go:189-193)
            raise ValueError("app name must not be empty")
        self.spark = spark
        self.app = app
        # client-id parity (kinesumer.go:195-204 / pkg/xrand): hostname +
        # random suffix; purely informational here (the driver is the
        # only "client"), surfaced via consumer_state()
        self.client_id = f"{socket.gethostname()}-{uuid.uuid4().hex[:6]}"
        self.checkpoint_root = checkpoint_root
        self.commit_config = commit or CommitConfig()
        self._streams: dict[str, StreamSource] = {}
        self._query = None
        # ids of queries THIS engine started — the session-wide listener
        # bus delivers every query's events (other engines, test sinks);
        # progress()/errors() must only reflect ours
        self._query_ids: set[str] = set()
        self._errors: list[str] = []
        self._progress: list[dict] = []
        self._listener = None
        self._lock = threading.Lock()
        self._generation = 0
        # (stream, child_shard) → [(parent_shard, parent_end), ...];
        # populated by consume(lineage=...), empty = no reshard gating
        self._lineage: dict[tuple[str, str], list[tuple[str, str]]] = {}
        os.makedirs(self._ledger_dir(), exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _ledger_dir(self) -> str:
        return os.path.join(self.checkpoint_root, self.app, "ledger")

    def _sink_dlq_dir(self) -> str:
        """Dead-letter area for whole batches whose sink raised under
        CommitConfig(on_sink_error="dlq") — envelope rows, replayable."""
        return os.path.join(self.checkpoint_root, self.app, "sink_dlq")

    def _deferred_dir(self) -> str:
        """Durable holding area for reshard-deferred child rows (see
        ShardLineage): written as parquet by the admission gate, read
        back by the loopback stream source — distributed end to end,
        nothing buffers on the driver."""
        return os.path.join(self.checkpoint_root, self.app, "deferred")

    def _ckpt_dir(self) -> str:
        # one WAL per query generation: a refresh()ed query has a new
        # source set, and Spark restores WAL offsets by source ordinal —
        # reusing the old WAL would alias the new sources onto the old
        # sources' progress. The cross-generation durable state is the
        # ledger (per-(stream, shard) high-water marks), mirroring how
        # the reference keys checkpoints by stream+shard, not by query.
        return os.path.join(self.checkpoint_root, self.app, f"wal-{self._generation}")

    # -- source construction ----------------------------------------------
    def consume(
        self,
        sources: list[StreamSource],
        lineage: list[ShardLineage] | None = None,
    ) -> DataFrame:
        """Multi-stream merged envelope (O4: N streams → one channel).

        Returns a *streaming* DataFrame in RECORD_SCHEMA; the caller
        attaches transformations and hands a sink to ``run()``.

        ``lineage`` opts into reshard-aware delivery: rows of a child
        shard are withheld from the sink until the ledger shows its
        parent committed through ``parent_end`` (per-key ordering across
        a reshard boundary — the reference's open TODO, kinesumer.go:314).
        Blocked rows take zero driver memory: the delivery wrapper
        writes them to the deferred parquet area and a loopback stream
        source (appended here) re-admits them in a later microbatch once
        the gate opens. Deferred re-delivery is at-least-once, same as
        the engine's crash-replay contract.
        """
        from kinesumer_spark.catalog import parquet_file_schema
        from kinesumer_spark.streaming.envelope import EVENTS_RAW_SCHEMA

        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp normalization (NTZ cast) is session-tz dependent;
        # pin UTC so a caller-built non-UTC session cannot shift instants
        self.spark.conf.set("spark.sql.session.timeZone", "UTC")
        self._streams = {s.name: s for s in sources}
        merged: DataFrame | None = None
        for s in sources:
            if s.format != "parquet":
                # non-file source path: read by format name and adapt to
                # the envelope; the rest of the engine (run/commit/lag/
                # replay/lineage) never knows the difference
                reader = self.spark.readStream.format(s.format)
                for k, v in (s.options or {}).items():
                    reader = reader.option(k, v)
                env = _generic_to_envelope(reader.load(), stream=s.name)
                merged = env if merged is None else merged.unionByName(env)
                continue
            # footer-read physical schema per source — the generator's ts
            # encoding has varied across rounds (nanos-long vs NTZ µs).
            # An EMPTY source dir (consumer started before the producer,
            # the normal Kinesis startup order) has no footer to probe:
            # fall back to the logical envelope schema, which
            # normalize_event_ts passes through unchanged. The fallback
            # is taken ONLY for the genuinely-empty case — a corrupt
            # footer or permission error must surface, not silently
            # degrade; and the fallback schema (ts TimestampType) does
            # NOT cover late-arriving TIMESTAMP(NANOS) files, which
            # surface as LongType under nanosAsLong and would fail the
            # fixed-schema stream read.
            if _dir_has_data_files(s.path):
                schema = parquet_file_schema(self.spark, s.path)
            else:
                schema = EVENTS_RAW_SCHEMA
            reader = self.spark.readStream.schema(schema)
            if s.max_files_per_trigger:
                reader = reader.option("maxFilesPerTrigger", s.max_files_per_trigger)
            raw = reader.parquet(s.path)
            env = events_to_envelope(raw, stream=s.name)
            merged = env if merged is None else merged.unionByName(env)
        assert merged is not None, "at least one stream required"
        self._lineage = {
            (e.stream, e.child): [] for e in (lineage or [])
        }
        for e in lineage or []:
            # merge reshard = two edges per child; admission waits on all
            self._lineage[(e.stream, e.child)].append((e.parent, e.parent_end))
        if self._lineage:
            os.makedirs(self._deferred_dir(), exist_ok=True)
            loopback = (
                self.spark.readStream.schema(RECORD_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(self._deferred_dir())
            )
            merged = merged.unionByName(loopback)
        return merged

    # -- mark / commit ledger ---------------------------------------------
    @staticmethod
    def _seq_order_key(seq: str) -> tuple[int, str]:
        """Numeric ordering key for decimal sequence-number strings:
        (length, lexicographic) orders unpadded decimals correctly
        ('9' < '10') without parsing — Kinesis sequence numbers run to
        ~56 digits, past any fixed-width integer/decimal type. Identical
        ordering to the padded internal envelope (equal lengths fall back
        to lexicographic)."""
        return (len(seq), seq)

    def mark(self, stream: str, shard_id: str, sequence_number: str) -> None:
        """Manual offset staging — MarkRecord parity (kinesumer.go:746-764)
        including its validation set: empty sequence numbers and unknown
        streams are rejected (errEmptySequenceNumber / errInvalidStream).
        Marks accumulate in memory until :meth:`commit_marks`.

        Deviation from the reference: MarkRecord OVERWRITES with the
        last-marked value (kinesumer.go:764), trusting the caller's
        ordering; this engine keeps the numeric maximum instead, because
        microbatch sinks may process a shard's rows on several tasks with
        no cross-task ordering — a last-write-wins mark could regress the
        high-water mark that commit() persists."""
        if not sequence_number:
            raise ValueError("sequence number must not be empty")
        if self._streams and stream not in self._streams:
            raise ValueError(f"invalid stream {stream!r}: not subscribed")
        with self._lock:
            if not hasattr(self, "_marks"):
                self._marks: dict[tuple[str, str], str] = {}
            prev = self._marks.get((stream, shard_id))
            if prev is None or self._seq_order_key(sequence_number) > self._seq_order_key(prev):
                self._marks[(stream, shard_id)] = sequence_number

    def commit_marks(self, batch_id: int) -> None:
        """Flush manually-staged marks to the ledger — Commit() parity
        (kinesumer.go:767-789; marks are kept after commit, idempotent
        re-put, exactly like the reference's offsets map)."""
        with self._lock:
            marks = dict(getattr(self, "_marks", {}))
        path = os.path.join(
            self._ledger_dir(), f"batch-{self._generation:06d}-{batch_id:020d}.json"
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "app": self.app,
                    "batch_id": batch_id,
                    "checkpoints": [
                        {
                            "stream": s,
                            "shard_id": sh,
                            "sequence_number": seq,
                        }
                        for (s, sh), seq in sorted(marks.items())
                    ],
                },
                f,
            )
        os.replace(tmp, path)

    def commit(self, batch_df: DataFrame, batch_id: int) -> None:
        """Write per-(stream, shard) high-water marks for one batch —
        the ShardCheckPoint row set of statemodel.go:40-45. Idempotent
        per batch_id (overwrite), like the reference's re-put commits."""
        # numeric max over decimal strings of any length: order by
        # (length, string) — plain F.max would rank '9…' above '10…' for
        # unpadded connector sequence numbers (decimal casts can't help:
        # Kinesis sequence numbers exceed decimal(38,0))
        marks = (
            batch_df.groupBy("stream", "shard_id")
            .agg(
                F.max_by(
                    "sequence_number",
                    F.struct(
                        F.length("sequence_number").alias("l"),
                        F.col("sequence_number").alias("s"),
                    ),
                ).alias("sequence_number")
            )
            .collect()
        )
        # generation in the name: batch ids restart at 0 after refresh(),
        # and a same-named file would overwrite the previous generation's
        # committed marks
        path = os.path.join(
            self._ledger_dir(), f"batch-{self._generation:06d}-{batch_id:020d}.json"
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "app": self.app,
                    "batch_id": batch_id,
                    "checkpoints": [
                        {
                            "stream": r["stream"],
                            "shard_id": r["shard_id"],
                            "sequence_number": r["sequence_number"],
                        }
                        for r in marks
                    ],
                },
                f,
            )
        os.replace(tmp, path)  # atomic, crash-safe like a DDB batch-put

    # -- reshard admission gate (ShardLineage) -----------------------------
    def _parent_complete(self, cps, stream: str, parent: str, end: str) -> bool:
        cur = cps.get((stream, parent))
        return cur is not None and self._seq_order_key(cur) >= self._seq_order_key(end)

    def _blocked_children(self) -> list[str]:
        """(stream, child) keys whose parent(s) are not yet committed
        through parent_end — one ledger read per microbatch, the same
        cadence as the reference's checkpoint lookups (O14)."""
        cps = self.checkpoints()
        return [
            f"{stream}\x1f{child}"
            for (stream, child), parents in self._lineage.items()
            if not all(
                self._parent_complete(cps, stream, p, end) for p, end in parents
            )
        ]

    def _admit(self, batch_df: DataFrame) -> DataFrame:
        """Split a microbatch at the reshard boundary: rows of still-
        blocked child shards go durably to the deferred area (the
        loopback source re-presents them next batch); everything else is
        admitted. The commit that follows sees only admitted rows, so a
        child's high-water never advances before its parent closes."""
        blocked = self._blocked_children()
        if not blocked:
            return batch_df
        key = F.concat_ws("\x1f", F.col("stream"), F.col("shard_id"))
        deferred = batch_df.filter(key.isin(blocked))
        # write only when rows exist: an unconditional write would drop
        # an empty file per batch and self-trigger the loopback forever
        if deferred.limit(1).count() > 0:
            deferred.write.mode("append").parquet(self._deferred_dir())
        return batch_df.filter(~key.isin(blocked))

    def run(
        self,
        records: DataFrame,
        sink: Callable[[DataFrame, int], None],
        query_name: str = "consume",
        trigger: dict | None = None,
    ):
        """Start the delivery query: user sink + auto-commit ledger in one
        foreachBatch (the reference's records-channel + auto-mark of the
        batch's last record, kinesumer.go:551-554, :656-658).

        ``trigger`` is passed to ``writeStream.trigger(**trigger)``:
        ``{"availableNow": True}`` gives the bounded-backfill mode (drain
        everything currently in the source, respecting
        maxFilesPerTrigger batching, then stop on its own — the
        production catch-up pattern); ``{"processingTime": "5 seconds"}``
        mirrors the reference's 5 s scan cadence (kinesumer.go:26).
        Default (None) is the continuous micro-batch default."""

        def deliver(batch_df: DataFrame, batch_id: int) -> None:
            arrived = batch_df  # the persisted handle (pre-admission)
            try:
                arrived.persist()
                if self._lineage:
                    batch_df = self._admit(batch_df)
                try:
                    sink(batch_df, batch_id)
                except Exception as exc:
                    if self.commit_config.on_sink_error != "dlq":
                        raise
                    # poison-pill isolation: park the batch, keep flowing
                    with self._lock:
                        self._errors.append(
                            f"batch {batch_id}: sink failed, routed to DLQ: {exc}"
                        )
                    batch_df.write.mode("append").parquet(self._sink_dlq_dir())
                if self.commit_config.auto:
                    self.commit(batch_df, batch_id)
            except Exception as exc:  # error side-channel, non-blocking (O20)
                with self._lock:
                    self._errors.append(f"batch {batch_id}: {exc}")
                raise
            finally:
                arrived.unpersist()

        self._attach_listener()
        writer = (
            records.writeStream.queryName(query_name)
            .option("checkpointLocation", self._ckpt_dir())
            .foreachBatch(deliver)
        )
        if trigger:
            writer = writer.trigger(**trigger)
        self._query = writer.start()
        with self._lock:
            self._query_ids.add(str(self._query.id))
        return self._query

    def run_ordered(
        self,
        records: DataFrame,
        fn,
        output_schema: str,
        sink: Callable[[DataFrame, int], None],
        query_name: str = "consume_ordered",
    ):
        """Delivery with the reference's per-shard ordered processing
        model: each microbatch is shuffled to shard granularity, rows
        handed to ``fn`` sorted by sequence_number, results to ``sink``."""

        def ordered_sink(batch_df: DataFrame, batch_id: int) -> None:
            sink(ordered_per_shard(batch_df, fn, output_schema), batch_id)

        return self.run(records, ordered_sink, query_name=query_name)

    # -- lifecycle ---------------------------------------------------------
    def refresh(self, sources: list[StreamSource]) -> DataFrame:
        """O18 Refresh: a Spark query's source set is fixed, so refresh is
        stop → new consume() (documented semantic gap, SURVEY.md §7)."""
        if self._query is not None:
            self._query.stop()
            self._query = None
        self._generation += 1
        return self.consume(sources)

    def errors(self) -> list[str]:
        """Error side-channel (O20) — never blocks the query."""
        with self._lock:
            return list(self._errors)

    def _attach_listener(self) -> None:
        """StreamingQueryListener capture (the O20 'listener bus' path):
        progress metrics per microbatch + terminal exceptions, without
        ever blocking the query (matches sendOrDiscardError's
        non-blocking contract, kinesumer.go:838-844)."""
        if self._listener is not None:
            return
        from pyspark.sql.streaming import StreamingQueryListener

        engine = self

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                with engine._lock:
                    if str(p.id) not in engine._query_ids:
                        return  # another query on the shared listener bus
                    engine._progress.append(
                        {
                            "batch_id": p.batchId,
                            "num_input_rows": p.numInputRows,
                            "name": p.name,
                        }
                    )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                if event.exception:
                    with engine._lock:
                        if str(event.id) not in engine._query_ids:
                            return
                        engine._errors.append(f"terminated: {event.exception}")

        self._listener = _Listener()
        self.spark.streams.addListener(self._listener)

    def progress(self) -> list[dict]:
        """Per-microbatch progress (batch id, input rows) — the
        observability the reference exposes only as log lines."""
        with self._lock:
            return list(self._progress)

    def close(self) -> None:
        """Graceful close: stop + final commit is already on disk because
        commits are per-batch (stricter than the reference's 5 s flush)."""
        if self._query is not None:
            self._query.stop()
            self._query = None
        if self._listener is not None:
            try:
                self.spark.streams.removeListener(self._listener)
            finally:
                self._listener = None

    # -- observability -----------------------------------------------------
    def checkpoints(self) -> dict[tuple[str, str], str]:
        """Latest committed sequence number per (stream, shard_id) —
        ``ListCheckPoints`` parity (statestore.go:224-257)."""
        out: dict[tuple[str, str], str] = {}
        for fn in sorted(os.listdir(self._ledger_dir())):
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(self._ledger_dir(), fn)) as f:
                doc = json.load(f)
            for cp in doc["checkpoints"]:
                out[(cp["stream"], cp["shard_id"])] = cp["sequence_number"]
        return out

    # predicate: envelope row strictly after its committed mark, in the
    # length-then-lexicographic order of _seq_order_key (unpadded
    # connector sequence numbers order correctly)
    _AHEAD_SQL = (
        "committed_seq IS NULL"
        " OR length(sequence_number) > length(committed_seq)"
        " OR (length(sequence_number) = length(committed_seq)"
        "     AND sequence_number > committed_seq)"
    )

    def _batch_envelope(self, columns: list[str] | None = None) -> DataFrame | None:
        """Batch (non-streaming) read of every subscribed stream as the
        envelope, unioned; None when no source has data yet."""
        from functools import reduce

        from kinesumer_spark.catalog import parquet_file_schema

        parts: list[DataFrame] = []
        for s in self._streams.values():
            if not _dir_has_data_files(s.path):
                continue
            raw = self.spark.read.schema(
                parquet_file_schema(self.spark, s.path)
            ).parquet(s.path)
            env = events_to_envelope(raw, stream=s.name)
            parts.append(env.select(*columns) if columns else env)
        if not parts:
            return None
        return reduce(lambda x, y: x.unionByName(y), parts)

    def _committed_df(self) -> DataFrame:
        return self.spark.createDataFrame(
            [(st, sh, seq) for (st, sh), seq in sorted(self.checkpoints().items())]
            or [],
            schema="stream string, shard_id string, committed_seq string",
        )

    def lag(self) -> DataFrame:
        """Per-(stream, shard) consumer lag — the operational metric the
        reference never exposes (its users read CloudWatch): committed
        high-water vs the latest sequence actually present in the
        source, plus the pending-record count.

        Distributed end to end: one batch scan per stream (narrow
        projection to the envelope key columns), a broadcast join
        against the ledger's committed marks (bounded by shard count),
        and a per-shard aggregate."""
        env = self._batch_envelope(["stream", "shard_id", "sequence_number"])
        if env is None:
            return self.spark.createDataFrame(
                [],
                schema=(
                    "stream string, shard_id string, committed_seq string, "
                    "latest_seq string, pending_records bigint"
                ),
            )
        return (
            env.join(F.broadcast(self._committed_df()), ["stream", "shard_id"], "left")
            .groupBy("stream", "shard_id")
            .agg(
                F.first("committed_seq").alias("committed_seq"),
                F.max_by(
                    "sequence_number",
                    F.struct(
                        F.length("sequence_number").alias("l"),
                        F.col("sequence_number").alias("s"),
                    ),
                ).alias("latest_seq"),
                F.sum(F.expr(f"CASE WHEN {self._AHEAD_SQL} THEN 1 ELSE 0 END"))
                .cast("bigint")
                .alias("pending_records"),
            )
            .orderBy("stream", "shard_id")
        )

    def replay_from(
        self, marks: dict[tuple[str, str], str] | None = None
    ) -> DataFrame:
        """Batch redelivery of every record strictly AFTER the given
        marks (default: the ledger's committed high-water) — the
        backfill/repair reader. This is the AFTER_SEQUENCE_NUMBER
        restore (O11, kinesumer.go:716-718) exposed as a batch surface:
        repair jobs re-read exactly the un-committed tail without
        touching the streaming query's WAL, and delivery stays
        at-least-once end to end.

        Distributed: batch envelope scan ⨝ broadcast marks (shard-
        bounded), filtered by the ledger ordering predicate."""
        env = self._batch_envelope()
        if env is None:
            return self.spark.createDataFrame([], schema=RECORD_SCHEMA)
        if marks is None:
            committed = self._committed_df()
        else:
            committed = self.spark.createDataFrame(
                [(st, sh, seq) for (st, sh), seq in sorted(marks.items())] or [],
                schema="stream string, shard_id string, committed_seq string",
            )
        return (
            env.join(F.broadcast(committed), ["stream", "shard_id"], "left")
            .filter(F.expr(self._AHEAD_SQL))
            .drop("committed_seq")
        )

    def compact_ledger(self) -> int:
        """Compact the per-batch commit files into ONE snapshot holding
        the latest mark per (stream, shard) — the ledger's answer to
        unbounded small-file growth (a month of 1 s microbatches is
        ~2.6 M files; the DynamoDB analog is a single row per shard by
        construction, statemodel.go:40-45). Returns the number of files
        removed. Crash-safe: the snapshot (named to sort BEFORE any
        live batch file, so later batches still win replay order) is
        written atomically first, old files removed after; a crash
        between leaves duplicates, which checkpoints() resolves by
        last-writer-wins exactly as before."""
        cps = self.checkpoints()
        old_files = [
            fn
            for fn in os.listdir(self._ledger_dir())
            if fn.endswith(".json")
        ]
        if not old_files:
            return 0
        # "a-" sorts before every "batch-…" file, so live batches keep
        # winning last-writer-wins replay; also avoids colliding with
        # generation 0 / batch 0's own file name
        snap = os.path.join(self._ledger_dir(), "a-snapshot.json")
        tmp = snap + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "app": self.app,
                    "batch_id": -1,
                    "compacted": True,
                    "checkpoints": [
                        {"stream": s, "shard_id": sh, "sequence_number": seq}
                        for (s, sh), seq in sorted(cps.items())
                    ],
                },
                f,
            )
        os.replace(tmp, snap)
        removed = 0
        for fn in old_files:
            p = os.path.join(self._ledger_dir(), fn)
            if p != snap and os.path.exists(p):
                os.remove(p)
                removed += 1
        return removed

    def consumer_state(self) -> DataFrame:
        """The state-store observability view (FIXTURES.md §1 schema;
        replaces the DynamoDB table of statemodel.go:17-53). Entities:
        'check_point' rows from the ledger, 'client' (this driver, with
        its hostname+suffix id), and one 'shard_cache' row per stream
        (stateShardCache parity, statemodel.go:17-22). A shard shows
        closed=True once it is a lineage parent committed through its
        parent_end — the CLOSED state O3 filters on; without a lineage
        manifest every file-source shard stays open."""
        cps = self.checkpoints()
        closed_by_stream = {
            (stream, p): True
            for (stream, _child), parents in self._lineage.items()
            for p, end in parents
            if self._parent_complete(cps, stream, p, end)
        }
        rows: list[dict] = [
            {
                "entity": "check_point",
                "app": self.app,
                "stream": stream,
                "shard_id": shard,
                "client_id": None,
                "sequence_number": seq,
                "shards": None,
            }
            for (stream, shard), seq in cps.items()
        ]
        per_stream: dict[str, list[str]] = {}
        for stream, shard in cps:
            per_stream.setdefault(stream, []).append(shard)
        rows.extend(
            {
                "entity": "shard_cache",
                "app": self.app,
                "stream": stream,
                "shard_id": None,
                "client_id": None,
                "sequence_number": None,
                "shards": [
                    {"id": s, "closed": closed_by_stream.get((stream, s), False)}
                    for s in sorted(shards)
                ],
            }
            for stream, shards in per_stream.items()
        )
        rows.append(
            {
                "entity": "client",
                "app": self.app,
                "stream": None,
                "shard_id": None,
                "client_id": self.client_id,
                "sequence_number": None,
                "shards": None,
            }
        )
        schema = (
            "entity string, app string, stream string, shard_id string, "
            "client_id string, sequence_number string, "
            "shards array<struct<id: string, closed: boolean>>"
        )
        return self.spark.createDataFrame(rows, schema=schema)
