"""Semantics tests for the warehouse shapes (operators/warehouse.py):
last-touch attribution edge cases, SCD2 interval integrity, and the
quality-audit counters on deliberately dirty data. The golden
cross-engine check lives in test_oracle_queries; these pin the business
rules on constructed corpora the synthetic tables cannot express."""

from __future__ import annotations

import datetime as dt

import pytest

from kinesumer_spark.operators.warehouse import (
    events_attribution,
    events_quality_audit,
    scd2_customer_priority,
)

from .conftest import SF_SMALL

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    path = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(path + "/events.parquet")
    return path


def test_attribution_rules(spark, tmp_path):
    """direct when no touch / touch outside lookback; last touch wins;
    same-timestamp ordering falls back to event_id (strictly preceding)."""
    d = dt.timedelta
    rows = [
        # user 1: view then purchase next day -> 'view'
        (1, _T0, 1, "view", 0.0, "{}"),
        (2, _T0 + d(days=1), 1, "purchase", 10.0, "{}"),
        # user 2: purchase with no touches -> 'direct'
        (3, _T0, 2, "purchase", 20.0, "{}"),
        # user 3: click 5 days before purchase (outside 3d) -> 'direct'
        (4, _T0, 3, "click", 0.0, "{}"),
        (5, _T0 + d(days=5), 3, "purchase", 30.0, "{}"),
        # user 4: click then view then purchase -> last touch 'view'
        (6, _T0, 4, "click", 0.0, "{}"),
        (7, _T0 + d(hours=1), 4, "view", 0.0, "{}"),
        (8, _T0 + d(hours=2), 4, "purchase", 40.0, "{}"),
        # user 5: click at the SAME timestamp as the purchase but with a
        # smaller event_id -> strictly preceding in (ts, event_id) order,
        # so it attributes
        (9, _T0, 5, "click", 0.0, "{}"),
        (10, _T0, 5, "purchase", 50.0, "{}"),
    ]
    path = _write_events(spark, tmp_path, rows)
    got = {
        r["channel"]: (r["n_conversions"], r["attributed_value"])
        for r in events_attribution(spark, path).collect()
    }
    assert got == {
        "direct": (2, 50.0),
        "view": (2, 50.0),
        "click": (1, 50.0),
    }


def test_scd2_intervals_tile(spark):
    """Per customer: versions are 1..n, consecutive valid_to == next
    valid_from, exactly one open (is_current) version, and no two
    consecutive versions share a priority (repeats collapse)."""
    rows = scd2_customer_priority(spark, SF_SMALL).collect()
    assert rows, "no SCD2 history produced"
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for cust, vs in by_cust.items():
        vs.sort(key=lambda r: r["version_no"])
        assert [v["version_no"] for v in vs] == list(range(1, len(vs) + 1))
        assert sum(v["is_current"] for v in vs) == 1
        assert vs[-1]["is_current"] and vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"], (cust, a, b)
            assert a["priority"] != b["priority"] or a["valid_from"] == b["valid_from"], (
                # same-day flips are legitimate distinct versions; only
                # a *consecutive-order* repeat must have been collapsed,
                # which the lag() filter guarantees unless the change
                # happened between two orders on one date
                cust
            )


def test_quality_audit_flags_dirty_data(spark, tmp_path):
    rows = [
        (1, _T0, 1, "view", 1.0, "{}"),
        (1, _T0, 2, "click", 1.0, "{}"),          # duplicate event_id
        (2, _T0, None, "view", 1.0, "{}"),         # null user
        (3, _T0, 3, "teleport", 1.0, "{}"),        # unknown type
        (4, _T0, 4, "purchase", -5.0, "{}"),       # negative value
        (5, _T0 + dt.timedelta(days=2), 5, "view", 1.0, None),  # empty props
    ]
    path = _write_events(spark, tmp_path, rows)
    r = events_quality_audit(spark, path).collect()[0]
    assert r["n_events"] == 6
    assert r["n_null_user"] == 1
    assert r["n_dup_event_id"] == 1
    assert r["n_unknown_type"] == 1
    assert r["n_neg_value"] == 1
    assert r["n_empty_props"] == 1
    assert r["ts_span_days"] == 2
    assert r["audit_pass"] is False


def test_quality_audit_clean_corpus_passes(spark):
    r = events_quality_audit(spark, SF_SMALL).collect()[0]
    assert r["audit_pass"] is True
    assert r["n_dup_event_id"] == 0


def test_snapshot_diff_reconciles(spark):
    """Conservation laws of the diff: |A| = removed + changed + unchanged
    and |B| = added + changed + unchanged — a misclassified row breaks
    one of them."""
    from kinesumer_spark.catalog import read_table
    from kinesumer_spark.registry import all_queries

    from .conftest import SF_SMALL

    d = {
        r["change_type"]: r["n_rows"]
        for r in all_queries()["warehouse_snapshot_diff"]
        .spark(spark, SF_SMALL)
        .collect()
    }
    a = read_table(spark, SF_SMALL, "customer").count()
    n_removed = d.get("removed", 0)
    n_added = d.get("added", 0)
    n_changed = d.get("changed", 0)
    n_same = d.get("unchanged", 0)
    assert a == n_removed + n_changed + n_same
    b = a - n_removed + n_added
    assert b == n_added + n_changed + n_same


def test_segment_rfm_survives_many_users(spark):
    """Regression: summing epoch-micros recencies as int64 overflows the
    long accumulator at ~5,400 users (caught in review; testdata tops
    out at 1,500 users so the oracle gate never exercised it). The
    decimal-element sum must survive a 6,000-user frame."""
    from pyspark.sql import functions as F

    from kinesumer_spark.operators.analytics import segment_rfm

    per_user = spark.range(6000).select(
        F.lit(1_700_000_000_000_000).alias("last_us"),
        (F.col("id") % 7 + 1).cast("bigint").alias("n_events"),
        (F.col("id") % 100).cast("decimal(18,6)").alias("monetary"),
    )
    rows = segment_rfm(per_user).collect()
    assert sum(r["n_users"] for r in rows) == 6000
