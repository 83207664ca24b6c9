"""Kafka source adapter: the reference's Config shape → Spark's built-in
Kafka connector options, normalized into the same RECORD_SCHEMA envelope.

The reference is Kinesis-only, but its record envelope (kinesumer.go:
97-102) is transport-agnostic: (stream, shard, sequence, partition key,
opaque payload, arrival time). Kafka's native concepts map 1:1 —
topic→stream, partition→shard, offset→sequence number, key→partition
key, timestamp→arrival — so a user migrating off Kinesis (or running
the same pipeline against both transports) keeps one downstream schema.

Spark ships the Kafka connector in-tree (``format("kafka")``,
spark-sql-kafka-0-10); like the Kinesis jar it is not present in this
environment, so reader construction is gated and the option mapping +
envelope normalization are unit-tested against the connector's
documented output schema (key binary, value binary, topic string,
partition int, offset long, timestamp timestamp, timestampType int).

Scale notes: offsets are per-partition monotone longs, so the engine's
high-water-mark commit (numeric (length, string) ordering) is exact for
them; ``minPartitions`` splits hot Kafka partitions across Spark tasks
(the analog of Kinesis resharding for read parallelism); ``maxOffsets
PerTrigger`` is the backpressure knob mirroring scan_limit (O21).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_FORMAT = "kafka"


@dataclass
class KafkaConfig:
    """The reference's Config shape (kinesumer.go:46-74) re-keyed for
    Kafka: same knob intents, connector-native option names."""

    app: str
    topics: str  # comma-separated subscribe list (≙ multi-stream O4)
    bootstrap_servers: str = "localhost:9092"
    starting_position: str = "latest"  # ≙ defaultStartingPosition
    max_records_per_trigger: int | None = 2000  # ≙ scan_limit (O21)
    min_partitions: int | None = None  # split hot partitions (≙ resharding)
    fail_on_data_loss: bool = True

    def reader_options(self) -> dict[str, str]:
        """Public connector options equivalent to each reference knob."""
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topics,
            "startingOffsets": self.starting_position,
            # consumer group identity: the connector manages its own
            # group ids; the prefix keys them by app exactly as the
            # reference keys its state by app name (kinesumer.go:189-204)
            "groupIdPrefix": f"{self.app}-",
            "failOnDataLoss": "true" if self.fail_on_data_loss else "false",
        }
        if self.max_records_per_trigger is not None:
            opts["maxOffsetsPerTrigger"] = str(self.max_records_per_trigger)
        if self.min_partitions is not None:
            opts["minPartitions"] = str(self.min_partitions)
        return opts


def normalize_connector_output(df: DataFrame) -> DataFrame:
    """Kafka connector output schema → RECORD_SCHEMA (kinesumer.go:97-102).

    partition → zero-padded shard id string (the envelope's shard ids
    order lexicographically, statemodel.go:51); offset → zero-padded
    20-digit sequence number (max int64 is 19 digits, so padding keeps
    numeric == lexicographic order AND the engine's (length, string)
    numeric max remains exact either way)."""
    return df.select(
        F.col("topic").alias("stream"),
        F.concat(
            F.lit("shardId-"), F.lpad(F.col("partition").cast("string"), 12, "0")
        ).alias("shard_id"),
        F.lpad(F.col("offset").cast("string"), 20, "0").alias("sequence_number"),
        # Kafka keys are optional bytes; the reference's partition_key is
        # a required string — null keys become the empty string
        F.coalesce(F.col("key").cast("string"), F.lit("")).alias("partition_key"),
        F.col("value").alias("data"),
        F.col("timestamp").alias("arrival_ts"),
    )


def kafka_stream(spark: SparkSession, cfg: KafkaConfig) -> DataFrame:
    """Streaming DataFrame in RECORD_SCHEMA from Kafka topics.

    Requires the spark-sql-kafka jar on the classpath; ONLY the
    jar-absent case is rewrapped as a clear 'connector unavailable'
    error — genuine configuration mistakes (bad option values, schema
    errors) propagate unchanged so they are not misdiagnosed as a
    missing classpath."""
    try:
        reader = spark.readStream.format(KAFKA_FORMAT)
        for k, v in cfg.reader_options().items():
            reader = reader.option(k, v)
        return normalize_connector_output(reader.load())
    except Exception as exc:  # pragma: no cover - jar availability
        msg = str(exc)
        jar_absent = (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find data source" in msg
            or "ClassNotFoundException" in msg
        )
        if not jar_absent:
            raise
        raise RuntimeError(
            "Kafka connector unavailable (needs spark-sql-kafka-0-10 jar "
            "+ a reachable broker); use streaming.engine.StreamSource "
            "file streams for local runs"
        ) from exc
