"""Custom stateful streaming operator via applyInPandasWithState —
the engine's answer for per-key logic Spark's built-in stateful ops
can't express (SURVEY.md §2.2 UDF row: "applyInPandasWithState for
custom stateful operators").

The demonstrator is a per-user running counter/sum: the microbatch-
spanning state the reference keeps per shard in its offsets sync.Map
(kinesumer.go:155-160), generalized to arbitrary keys. State is one
fixed-size row per key in Spark's state store — partitioned by key,
recoverable from the checkpoint like every other stateful op.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum) across microbatches.

    Emits the updated running totals for each user touched by a batch
    ("update" semantics downstream). NoTimeout: state lives for the
    query's life; production variants set ProcessingTimeTimeout to GC
    idle keys — the reference's 10 s staleness prune (O8/O9) analog.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
