"""The record envelope — the reference's canonical tuple.

``Record {Stream, ShardID, *kinesis.Record}`` (kinesumer.go:97-102)
carries: opaque payload bytes, producer partition key, per-shard
string sequence number, arrival timestamp. RECORD_SCHEMA is the 1:1
Spark mapping (SURVEY.md §1.1); every streaming source in this engine
emits it, and payload decoding stays schema-on-read (from_json over
``data``), exactly as the reference leaves parsing to the application
(README.md:67-70).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), False),
        T.StructField("shard_id", T.StringType(), False),
        T.StructField("sequence_number", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), True),
        T.StructField("data", T.BinaryType(), True),
        T.StructField("arrival_ts", T.TimestampType(), True),
    ]
)

# Logical schema of the events stream rows after ts normalization
# (catalog.normalize_event_ts). File-stream sources must pass the
# *physical* schema (catalog.events_raw_schema — readStream does no
# inference); the generator's physical ts encoding has changed between
# rounds (nanos-as-long vs TIMESTAMP_NTZ µs), so never hardcode it.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

N_SHARDS = 5  # the reference's test stream has 5 shards (tests/init.sh:22-27)


def shard_id_for(partition_key: Column, n_shards: int = N_SHARDS) -> Column:
    """partition_key → shard, mirroring Kinesis's key→shard hashing
    (deterministic stand-in: pmod over the numeric key, FIXTURES.md §2)."""
    return F.concat(
        F.lit("shardId-"),
        F.lpad(F.pmod(partition_key.cast("bigint"), F.lit(n_shards)).cast("string"), 12, "0"),
    )


def sequence_number_for(seq: Column) -> Column:
    """Zero-padded decimal string — orderable lexicographically per shard,
    like Kinesis sequence numbers (compared as strings, statemodel.go:51)."""
    return F.lpad(seq.cast("string"), 21, "0")


def events_to_envelope(raw: DataFrame, stream: str = "events") -> DataFrame:
    """Wrap raw events rows (any physical ts encoding) into
    RECORD_SCHEMA. The payload is the full row as JSON bytes."""
    from kinesumer_spark.catalog import normalize_event_ts

    raw = normalize_event_ts(raw)
    ts = F.col("ts")
    payload = F.to_json(
        F.struct(
            F.col("event_id"),
            ts.alias("ts"),
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.col("props"),
        )
    )
    return raw.select(
        F.lit(stream).alias("stream"),
        shard_id_for(F.col("user_id")).alias("shard_id"),
        sequence_number_for(F.col("event_id")).alias("sequence_number"),
        F.col("user_id").cast("string").alias("partition_key"),
        payload.cast("binary").alias("data"),
        ts.alias("arrival_ts"),
    )


def decode_payload(envelope: DataFrame, schema: T.StructType) -> DataFrame:
    """Schema-on-read decode: data bytes → typed columns (the application
    layer the reference leaves open; SURVEY.md §1.1 Spark mapping)."""
    return envelope.withColumn(
        "payload", F.from_json(F.col("data").cast("string"), schema)
    ).select("*", "payload.*")
