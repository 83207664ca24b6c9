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


# -- property: the drift-tolerant ts adapter is encoding-invariant ----------

from hypothesis import given, settings, strategies as st

# epoch-micros in [1970, ~2100): the generator's domain; ns encoding must
# fit int64 (micros*1000 < 2^63). Sub-microsecond truncation semantics
# (nanos -> micros) are pinned by the explicit remainder cases below.
_epoch_us = st.integers(min_value=0, max_value=4_102_444_800_000_000)


@settings(max_examples=10, deadline=None)
@given(micros=st.lists(_epoch_us, min_size=1, max_size=20))
def test_normalize_event_ts_encoding_invariant(spark, micros):
    """PROPERTY (the r4 crash class): for any event-time set, reading a
    TIMESTAMP(NANOS) file (surfaces as LongType under nanosAsLong) and a
    TIMESTAMP(MICROS, NTZ) file through the production read path must
    yield the IDENTICAL µs instants — and both must equal the ground
    truth. Covers both normalize_event_ts branches on every example,
    including nanos with non-zero sub-µs remainders (truncation, the
    same semantics DuckDB's epoch_us applies)."""
    import datetime
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq_
    from kinesumer_spark.catalog import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # non-zero ns remainders on half the rows: truncation must discard
    nanos = [m * 1000 + (123 if i % 2 else 0) for i, m in enumerate(micros)]
    want = [
        datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        + datetime.timedelta(microseconds=m)
        for m in micros
    ]
    with tempfile.TemporaryDirectory() as td:
        p_ns, p_us = f"{td}/ns.parquet", f"{td}/us.parquet"
        pq_.write_table(
            pa.table({"ts": pa.array(nanos, type=pa.timestamp("ns"))}), p_ns
        )
        pq_.write_table(
            pa.table({"ts": pa.array(micros, type=pa.timestamp("us"))}), p_us
        )
        got = {}
        for name, path in (("ns", p_ns), ("us", p_us)):
            df = normalize_event_ts(spark.read.parquet(path))
            from pyspark.sql import types as T

            assert isinstance(df.schema["ts"].dataType, T.TimestampType)
            got[name] = sorted(
                r["ts"].replace(tzinfo=datetime.timezone.utc)
                for r in df.collect()
            )
        assert got["ns"] == got["us"] == sorted(want)
