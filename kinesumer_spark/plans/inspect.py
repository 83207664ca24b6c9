"""Physical-plan inspection helpers: the engine's performance contract
is asserted, not hoped for. Tests use these to require that filters
reach the parquet scan (PushedFilters), scans prune columns
(ReadSchema), dimension joins broadcast, and aggregations are
partial+final — the properties that decide whether a plan survives a
100× scale-up (brief: "iterate until it's the plan you'd want")."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (explain output, captured)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists appearing in the plan's scan nodes."""
    return [
        line.split(":", 1)[1].strip()
        for line in plan_string(df).splitlines()
        if line.strip().startswith("PushedFilters")
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries (the columns each scan actually reads)."""
    return [
        line.split(":", 1)[1].strip()
        for line in plan_string(df).splitlines()
        if line.strip().startswith("ReadSchema")
    ]


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = plan_string(df)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan missing {missing}:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = plan_string(df)
    present = [n for n in needles if n in plan]
    assert not present, f"plan unexpectedly contains {present}:\n{plan}"
