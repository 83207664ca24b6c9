"""Scale-path as-of (point-in-time) join.

Spark has no native ASOF JOIN (SURVEY.md §2.2 Joins). The relational
formulation in events_ops.events_asof_join (equi-join on the entity key
+ time predicate + row_number dedup) expands every (purchase ×
earlier-click) pair per user before deduplicating — fine when per-key
fan-out is bounded, quadratic for hot keys. This module is the promised
hot-path variant: one shuffle on the entity key, then a per-key sorted
merge via ``applyInPandas`` over a cogroup + ``pandas.merge_asof`` —
O(n log n) sort + O(n) merge per key, zero pair expansion.

Scale (100 TB): both sides shuffle once on user_id (the same layout the
sessionize/window ops use); per-key state is the key's own rows only.
Skewed users are bounded by their event count, never by the product of
purchase × click counts. Arrow batches carry the data into pandas — no
row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.operators.events_ops import _ASOF_ORACLE
from kinesumer_spark.registry import register

_OUT_SCHEMA = (
    "event_id bigint, user_id bigint, purchase_ts string, "
    "click_ts string, click_event_id bigint"
)

_TS_FMT_PD = "%Y-%m-%d %H:%M:%S"


def _merge_asof_key(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
    """Per-user merge: latest click at or before each purchase (backward
    inclusive — merge_asof's default — matching DuckDB ASOF's p.ts >= c.ts).
    Inner semantics: purchases with no qualifying click are dropped."""
    if purchases.empty or clicks.empty:
        return pd.DataFrame(
            columns=[
                "event_id",
                "user_id",
                "purchase_ts",
                "click_ts",
                "click_event_id",
            ]
        )
    p = purchases.sort_values("p_ts", kind="mergesort")
    c = clicks.sort_values("c_ts", kind="mergesort")
    m = pd.merge_asof(p, c, left_on="p_ts", right_on="c_ts", direction="backward")
    m = m.dropna(subset=["c_ts"])
    return pd.DataFrame(
        {
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["user_id_x"].astype("int64"),
            "purchase_ts": m["p_ts"].dt.strftime(_TS_FMT_PD),
            "click_ts": m["c_ts"].dt.strftime(_TS_FMT_PD),
            "click_event_id": m["click_event_id"].astype("int64"),
        }
    )


@register("events_asof_join_merge", oracle=_ASOF_ORACLE, tags=("events", "asof"))
def events_asof_join_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via per-key ``pandas.merge_asof`` (cogrouped
    applyInPandas) — same result (and oracle) as events_asof_join,
    linear per-key cost instead of pair expansion."""
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    # clicks pre-deduplicated per (user, ts) so the as-of pick is unique →
    # deterministic in both engines (same normalization the oracle applies)
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("c_ts"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    merged = (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(_merge_asof_key, schema=_OUT_SCHEMA)
    )
    return merged.orderBy("event_id")
