"""Testdata physical-schema contract canary.

The driver regenerates /root/testdata between rounds and has already
changed physical encodings once (r4→r5: events.ts TIMESTAMP(NANOS) →
TIMESTAMP_NTZ µs), which crashed the batch reader and SILENTLY collapsed
streaming windows. This test pins the currently-observed physical
schemas so any future drift fails HERE with a pointed message, instead
of surfacing as a cryptic analyzer error (or worse, silent wrong
answers) inside 30 downstream queries.

If this test fails: the generator changed an encoding again. Check
catalog.normalize_event_ts handles the new variant, re-run the full
oracle gate, then update the pinned schema below.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from .conftest import SF_SMALL

# table -> {column: arrow type string}. Only columns whose physical type
# the engine depends on are pinned (timestamps, binary/list layouts).
_PINNED = {
    # NOTE: raw "int64" is deliberately NOT accepted for events.ts — an
    # unannotated integer column carries no time unit, and
    # normalize_event_ts would assume nanos (the LongType branch exists
    # for the nanosAsLong READ of timestamp[ns], whose unit IS known).
    # If the generator ever writes raw int64, fail here and decide the
    # unit explicitly from the value range.
    "events": {"ts": ("timestamp[us]", "timestamp[ns]")},
    "orders": {"o_orderdate": ("timestamp[us]", "timestamp[ns]", "date32[day]")},
    "lineitem": {"l_shipdate": ("timestamp[us]", "timestamp[ns]", "date32[day]")},
    "embeddings": {"embedding": ("list<element: float>", "list<item: float>")},
}


@pytest.mark.parametrize("table", sorted(_PINNED))
def test_physical_schema_is_a_known_variant(table):
    schema = pq.read_schema(f"{SF_SMALL}/{table}.parquet")
    for col, accepted in _PINNED[table].items():
        actual = str(schema.field(col).type)
        assert actual in accepted, (
            f"TESTDATA DRIFT: {table}.{col} is now {actual!r}, not one of "
            f"{accepted} — the generator changed encodings again. Verify "
            f"catalog.normalize_event_ts (and any column-specific read "
            f"normalization) handles it, re-run the oracle gate, then add "
            f"the new variant here."
        )


def test_events_ts_normalizes_to_timestamp(spark):
    """Whatever the physical encoding, the engine-visible events.ts must
    be a (tz-aware) TimestampType — every window/date function keys off
    this."""
    from pyspark.sql import types as T

    from kinesumer_spark.catalog import read_table

    df = read_table(spark, SF_SMALL, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), df.schema

    # and the stream-source path must agree with the batch path
    from kinesumer_spark.catalog import events_raw_schema, normalize_event_ts

    raw_schema = events_raw_schema(spark, SF_SMALL)
    stream_like = spark.read.schema(raw_schema).parquet(
        f"{SF_SMALL}/events.parquet"
    )
    norm = normalize_event_ts(stream_like)
    assert isinstance(norm.schema["ts"].dataType, T.TimestampType)
    batch_min = df.agg({"ts": "min"}).collect()[0][0]
    stream_min = norm.agg({"ts": "min"}).collect()[0][0]
    assert batch_min == stream_min, (
        "batch and stream-source ts normalization diverge — the r4 "
        "silent-window-collapse failure mode"
    )
