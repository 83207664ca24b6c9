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
        # driver-side reader state; after a WAL restart Spark replans
        # from its own recovered offsets, and the cursor re-advances
        # from zero — empty [start ≥ end) batches until it catches up,
        # then normal pacing (documented sim-source simplification).
        if not hasattr(self, "_cursor"):
            self._cursor = {str(s): 0 for s in range(self.n_shards)}
        self._cursor = {
            s: min(v + self.scan_limit, self.total)
            for s, v in self._cursor.items()
        }
        return dict(self._cursor)

    def partitions(self, start: dict, end: dict):
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
