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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
