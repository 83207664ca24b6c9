"""Custom PySpark Data Source (Spark 4 Python Data Source API): a
deterministic Kinesis-shaped shard feed, `kinesumer_sim`.

The reference's source surface is the Kinesis connector (O1/O2), which
is environment-blocked in this sandbox (sources/kinesis.py maps its
options; the live path never executes). This module exercises the OTHER
half of source completeness: the engine-side extension API a user
implements when their system has no connector at all — Spark 4's
``pyspark.sql.datasource`` plugin point, the Python analog of the
DataSource V2 interface the real Kinesis connector implements.

Design:
- One InputPartition per shard (``numShards`` option): the planner owns
  shard→task assignment, exactly like the file/Kinesis sources — the
  reference's range-split assignment (syncclient.go:114-117) maps to
  "one partition per shard" here.
- Rows are generated DETERMINISTICALLY from (shard, offset), so the
  whole feed is SQL-replayable: the registered query's DuckDB oracle
  reconstructs every row from ``range()`` — the source is oracle-
  checkable like any table.
- Batch reader only (the streaming lifecycle is the Engine's file
  microbatch path); per-partition generation is pure Python yielding
  tuples — Spark feeds them through Arrow batches.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_DDL = (
    "stream string, shard_id string, sequence_number string, "
    "partition_key string, payload_k bigint"
)


class _ShardPartition(InputPartition):
    def __init__(self, shard: int, n_records: int) -> None:
        self.shard = shard
        self.n_records = n_records


class KinesumerSimReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.n_shards = int(options.get("numshards", 5))
        self.records_per_shard = int(options.get("recordspershard", 100))
        self.stream = options.get("stream", "sim")

    def partitions(self):  # one planner partition per shard
        return [
            _ShardPartition(s, self.records_per_shard)
            for s in range(self.n_shards)
        ]

    def read(self, partition: _ShardPartition):
        shard = partition.shard
        for i in range(partition.n_records):
            seq = shard * partition.n_records + i
            yield (
                self.stream,
                f"shardId-{shard:012d}",
                str(seq).zfill(21),
                str(seq % 97),
                (seq * 31 + shard) % 1000,
            )


class KinesumerSimDataSource(DataSource):
    """`spark.read.format("kinesumer_sim")` after registration."""

    @classmethod
    def name(cls) -> str:
        return "kinesumer_sim"

    def schema(self) -> str:
        return _DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return KinesumerSimReader(schema, self.options)


def register_sim_source(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(KinesumerSimDataSource)


# -- Streaming variant: the polling shard scan (O1) as a REAL source ---------


class KinesumerSimStreamReader(DataSourceStreamReader):
    """Microbatch stream reader with per-shard offset tracking — the
    reference's polling scan loop (O1, kinesumer.go:615-704) expressed
    in the engine's own source contract:

    - offset = {shard: next_sequence} map, exactly the ShardCheckPoint
      row set (statemodel.go:40-45); Spark persists it in the WAL, so
      restart-from-checkpoint is the AFTER_SEQUENCE_NUMBER restore
      (O11) with no engine code.
    - each ``latestOffset`` advances every shard by ≤ ``scanLimit``
      records (GetRecords' limit parameter) toward ``totalPerShard``
      (the simulated stream end) — maxRecordsPerTrigger-style pacing.
    - ``partitions(start, end)`` plans one InputPartition per shard per
      batch (range-split assignment, syncclient.go:114-117); ``read``
      generates that shard's [start, end) slice deterministically, so
      the feed is SQL-replayable like the batch variant.
    """

    def __init__(self, schema: StructType, options: dict) -> None:
        self.n_shards = int(options.get("numshards", 5))
        self.total = int(options.get("totalpershard", 100))
        self.scan_limit = int(options.get("scanlimit", 25))
        self.stream = options.get("stream", "sim")

    def initialOffset(self) -> dict:
        return {str(s): 0 for s in range(self.n_shards)}

    def latestOffset(self) -> dict:
        # admission control lives HERE (the offset the planner commits
        # to IS the batch end — clamping later in partitions() would
        # silently drop the tail of the committed range): each call
        # advances every shard by ≤ scanLimit toward the simulated
        # stream end, the GetRecords-limit pacing of O1. The cursor is
        # driver-side reader state; on a WAL restart it is SEEDED from
        # the WAL high learned in partitions() (Spark probes the
        # restored offset as partitions(last, last) before the first
        # plan), so the offsets log never rewinds — an emission behind
        # the WAL would make the NEXT batch replay committed records.
        if not hasattr(self, "_cursor"):
            self._cursor = {str(s): 0 for s in range(self.n_shards)}
            self._heal_cursor_from_wal()
        self._cursor = {
            s: min(v + self.scan_limit, self.total)
            for s, v in self._cursor.items()
        }
        return dict(self._cursor)

    def _heal_cursor_from_wal(self) -> None:
        for k, v in getattr(self, "_wal_high", {}).items():
            if self._cursor.get(k, 0) < v:
                self._cursor[k] = v

    def partitions(self, start: dict, end: dict):
        # Track the WAL HIGH — the max position Spark has ever handed
        # us, starts and ends alike (on restart the FIRST call is a
        # probe with the restored offset as both) — and heal the probe
        # cursor with it. The high is only a cursor seed, never a
        # slice clamp: a replayed uncommitted batch arrives as
        # (start, end) BELOW the high and must be delivered verbatim
        # (clamping it would LOSE the batch — its first run never
        # committed). Same contract as the wire reader's
        # _learn_wal_position/_heal_cursor_from_wal (kinesis_wire.py),
        # minus the closed-shard sentinel this finite sim lacks.
        high = getattr(self, "_wal_high", {})
        for src in (start, end):
            for k, v in src.items():
                if int(v) > high.get(k, 0):
                    high[k] = int(v)
        self._wal_high = high
        if hasattr(self, "_cursor"):
            self._heal_cursor_from_wal()
        out = []
        for s in range(self.n_shards):
            lo = int(start[str(s)])
            hi = int(end[str(s)])
            if hi > lo:
                out.append(_ShardSlice(s, lo, hi))
        return out

    def read(self, partition: "_ShardSlice"):
        for i in range(partition.lo, partition.hi):
            seq = partition.shard * self.total + i
            yield (
                self.stream,
                f"shardId-{partition.shard:012d}",
                str(seq).zfill(21),
                str(seq % 97),
                (seq * 31 + partition.shard) % 1000,
            )

    def commit(self, end: dict) -> None:  # checkpoint ack; WAL owns it
        pass


class _ShardSlice(InputPartition):
    def __init__(self, shard: int, lo: int, hi: int) -> None:
        self.shard = shard
        self.lo = lo
        self.hi = hi


class KinesumerSimStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kinesumer_sim_stream"

    def schema(self) -> str:
        return _DDL

    def streamReader(self, schema: StructType) -> "KinesumerSimStreamReader":
        return KinesumerSimStreamReader(schema, self.options)


def register_sim_stream_source(spark) -> None:
    spark.dataSource.register(KinesumerSimStreamDataSource)


# -- Writer variant: the PutRecords producer path as a REAL custom sink ------
#
# The reference is consumer-side only, but its operational contract has a
# producer on the other end (Kinesis PutRecords: records hashed to shards
# by partition key, accepted in batches, durable once acknowledged). This
# sink expresses that contract through Spark 4's DataSourceWriter /
# DataSourceStreamWriter plugin point, with the write-audit-publish
# discipline a real connector needs:
#
# - executors STAGE their task output (one file per task, never visible
#   to readers) and return a WriterCommitMessage with per-shard counts —
#   the PutRecords response shape;
# - the DRIVER publishes atomically on commit(): staged files are
#   os.replace()d into data/ and ONE manifest records the job's
#   per-shard totals. abort() deletes the staging files — a failed job
#   leaves nothing visible (two-phase commit, the same tmp→fsync→rename
#   discipline as the Engine's ledger, engine.py O13);
# - the streaming variant namespaces its manifest by batchId, so a
#   foreachBatch-style replay overwrites the same manifest instead of
#   double-publishing (idempotent per-microbatch publication).


import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceStreamWriter, DataSourceWriter, WriterCommitMessage


@dataclass
class _PutBatch(WriterCommitMessage):
    staged: str  # staged task file (relative to the sink root)
    n_rows: int
    by_shard: dict  # shard_id -> row count


def _shard_of(partition_key: str, n_shards: int) -> int:
    """Deterministic partition-key → shard hash (the PutRecords MD5 ring,
    spelled with the repo-standard sha256 prefix)."""
    import hashlib

    h = hashlib.sha256(str(partition_key).encode()).hexdigest()[:8]
    return int(h, 16) % n_shards


class _PutRecordsWriterBase:
    def __init__(self, schema, options: dict) -> None:
        self.path = options["path"]
        self.n_shards = int(options.get("numshards", 5))
        self.key_col = options.get("keycolumn", "partition_key")
        self.cols = schema.fieldNames()
        # job-unique token: created once on the driver, inherited by
        # every executor via serialization — stamps this job's staged
        # files so the janitor can tell its own debris from a CONCURRENT
        # append job's in-flight files (r9 advisory: the unscoped sweep
        # could delete a second append's staged files or tmp manifest
        # mid-publish, failing its os.replace)
        self.job_token = uuid.uuid4().hex[:12]
        # foreign debris (crashed jobs that never published) is swept
        # only once it is older than this TTL — long enough that no
        # live job's staging window plausibly spans it
        self.staging_ttl = float(options.get("stagingttl", 900))

    # -- executor side ------------------------------------------------------
    def write(self, iterator) -> _PutBatch:
        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
        name = os.path.join(
            "_staging", f"task-{self.job_token}-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        by_shard: dict[str, int] = {}
        full = os.path.join(self.path, name)
        with open(full, "w") as f:
            for row in iterator:
                d = {c: row[c] for c in self.cols}
                key = d.get(self.key_col, "")
                shard = f"shardId-{_shard_of(key, self.n_shards):012d}"
                by_shard[shard] = by_shard.get(shard, 0) + 1
                d["_shard"] = shard
                f.write(json.dumps(d, default=str) + "\n")
                n += 1
            f.flush()
            os.fsync(f.fileno())
        return _PutBatch(staged=name, n_rows=n, by_shard=by_shard)

    # -- driver side --------------------------------------------------------
    def _publish(self, messages, manifest_name: str, sweep=()) -> None:
        """Atomically publish staged task files under ``manifest_name``.

        ``sweep`` lists manifest filenames whose listed data files are
        removed BEFORE publishing (and the manifests themselves, unless
        the slot is being rewritten) — used for (a) same-slot streaming
        replay (a replayed microbatch stages fresh uuid-named files, so
        overwriting the manifest alone would orphan the previous
        attempt's data, r8 review) and (b) batch ``overwrite`` mode,
        which replaces every previously published manifest (r9
        advisory: append must NOT sweep — it was silently replace-all)."""
        data_dir = os.path.join(self.path, "data")
        os.makedirs(data_dir, exist_ok=True)
        for man in sweep:
            prev = os.path.join(self.path, man)
            if not os.path.exists(prev):
                continue
            try:
                with open(prev) as f:
                    listed = json.load(f).get("files", [])
            except ValueError:
                listed = []  # torn manifest: nothing reliable to sweep
            for fn in listed:
                p = os.path.join(data_dir, fn)
                if os.path.exists(p):
                    os.remove(p)
            if man != manifest_name:
                os.remove(prev)
        total = 0
        by_shard: dict[str, int] = {}
        files = []
        for m in messages:
            if m is None or m.n_rows == 0:
                if m is not None:
                    os.remove(os.path.join(self.path, m.staged))
                continue
            dst = os.path.basename(m.staged).replace("task-", "put-")
            os.replace(
                os.path.join(self.path, m.staged), os.path.join(data_dir, dst)
            )
            files.append(dst)
            total += m.n_rows
            for s, c in m.by_shard.items():
                by_shard[s] = by_shard.get(s, 0) + c
        tmp = os.path.join(self.path, f".{manifest_name}.tmp")
        with open(tmp, "w") as f:
            json.dump(
                {"files": sorted(files), "n_rows": total, "by_shard": by_shard},
                f,
                sort_keys=True,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.path, manifest_name))
        # janitor: a failed/cancelled job can orphan staged files that
        # never reached a commit message (Spark hands abort() None for
        # cancelled tasks) — they are invisible to readers (only
        # manifest-listed data/ files count) and swept here on the next
        # successful publish. Scope (r9 advisory): THIS job's staged
        # files (token-prefixed) are always swept — once we publish, any
        # leftover own-token file is a failed/cancelled task of ours —
        # but a CONCURRENT append job's in-flight files must survive, so
        # foreign staged files and stale .manifest-*.tmp are swept only
        # when older than staging_ttl (crashed-job debris, not live
        # staging).
        import time as _time

        own = f"task-{self.job_token}-"
        cutoff = _time.time() - self.staging_ttl

        def _sweep(entry, own_file: bool) -> None:
            # a CONCURRENT job can publish (os.replace away) or janitor
            # a foreign entry between our scandir and the stat/remove —
            # a vanished entry is someone else's successful cleanup,
            # never a reason to fail a commit whose manifest is already
            # visible (a retried "failed" job would duplicate rows)
            # broadened to OSError (r10 advisory): the manifest is
            # already published, so NO janitor failure may fail this
            # commit — a PermissionError here on a retried "failed"
            # append job would double-publish rows; the skipped entry
            # is re-swept by the next publish
            try:
                if own_file or entry.stat().st_mtime < cutoff:
                    os.remove(entry.path)
            except OSError:
                pass

        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging):
            for e in os.scandir(staging):
                if e.is_file():
                    _sweep(e, e.name.startswith(own))
        # a publish that crashed between fsync and rename leaves a stale
        # .manifest-*.json.tmp — never reader-visible (dot-prefixed,
        # excluded by _list_manifests) but accumulating; TTL-swept here
        # (own tmp was already renamed away above; a young foreign tmp
        # may be another append job's publish in flight)
        for e in os.scandir(self.path):
            if (
                e.is_file()
                and e.name.startswith(".manifest-")
                and e.name.endswith(".tmp")
            ):
                _sweep(e, False)

    def _discard(self, messages) -> None:
        for m in messages:
            if m is not None:
                p = os.path.join(self.path, m.staged)
                if os.path.exists(p):
                    os.remove(p)


def _list_manifests(path: str) -> list:
    """Published manifest filenames under a sink root, sorted (batch
    jobs publish ``manifest-batch*.json``, microbatches
    ``manifest-<batchId>.json``)."""
    if not os.path.isdir(path):
        return []
    return sorted(
        e.name
        for e in os.scandir(path)
        if e.is_file()
        and e.name.startswith("manifest-")
        and e.name.endswith(".json")
    )


def published_files(path: str) -> list:
    """Absolute paths of every data file the sink's manifests list —
    the reader contract: only manifest-listed files exist; staged or
    orphaned files are invisible. Append jobs each publish their own
    manifest, so readers union all of them (r9)."""
    out = []
    for man in _list_manifests(path):
        with open(os.path.join(path, man)) as f:
            for fn in json.load(f).get("files", []):
                out.append(os.path.join(path, "data", fn))
    return sorted(out)


class KinesumerPutRecordsWriter(_PutRecordsWriterBase, DataSourceWriter):
    def __init__(self, schema, options: dict, overwrite: bool) -> None:
        super().__init__(schema, options)
        self.overwrite = overwrite

    def commit(self, messages) -> None:
        if self.overwrite:
            # overwrite replaces the whole published dataset: sweep every
            # prior manifest (batch and streaming) and their data files
            self._publish(
                messages, "manifest-batch.json", sweep=_list_manifests(self.path)
            )
        else:
            # append: a job-unique manifest slot, nothing swept — two
            # appends coexist and readers union manifests (r9 advisory;
            # the fixed slot made append silently replace-all)
            self._publish(messages, f"manifest-batch-{uuid.uuid4().hex[:12]}.json")

    def abort(self, messages) -> None:
        self._discard(messages)


class KinesumerPutRecordsStreamWriter(_PutRecordsWriterBase, DataSourceStreamWriter):
    def commit(self, messages, batchId: int) -> None:
        # batchId-keyed manifest: a replayed microbatch re-publishes the
        # SAME slot, sweeping only its own previous attempt's files
        name = f"manifest-{batchId:020d}.json"
        self._publish(messages, name, sweep=(name,))

    def abort(self, messages, batchId: int) -> None:
        self._discard(messages)


class KinesumerSimSinkDataSource(DataSource):
    """``df.write.format("kinesumer_sim_sink").option("path", dir)`` /
    ``writeStream.format("kinesumer_sim_sink")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "kinesumer_sim_sink"

    def writer(self, schema: StructType, overwrite: bool):
        return KinesumerPutRecordsWriter(schema, self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        # streaming epochs are append-shaped regardless of outputMode;
        # replay idempotence is per-batchId (commit above)
        return KinesumerPutRecordsStreamWriter(schema, self.options)


def register_sim_sink(spark) -> None:
    spark.dataSource.register(KinesumerSimSinkDataSource)
