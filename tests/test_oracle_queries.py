"""The local replica of the driver's correctness gate: every registered
query with an oracle must match DuckDB exactly (columns sorted by name,
rows sorted, exact values) at sf0.001; oracle-less queries must at least
execute and return a stable schema.

Mirrors the reference's golden end-to-end test layer (SURVEY.md §5:
TestKinesumer_Consume asserts exact delivered payloads; here the
"payload" is the query result).
"""

from __future__ import annotations

import pytest

from kinesumer_spark.oracle import check_query
from kinesumer_spark.registry import all_queries

from .conftest import SF_SMALL

QUERY_NAMES = sorted(all_queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    problems = check_query(spark, name, SF_SMALL)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_registry_nonempty():
    qs = all_queries()
    assert len(qs) >= 1
    for q in qs.values():
        assert q.name and callable(q.spark)


def test_driver_evidence_current():
    """driver_evidence.json must be regenerated whenever a new
    CORRECTNESS_r*.json lands (tools/update_evidence.py) — the rotation
    is computed from it, so a stale artifact silently re-checks
    already-fresh queries instead of the stale tail."""
    import importlib.util
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "update_evidence", os.path.join(repo, "tools", "update_evidence.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(repo, "driver_evidence.json")) as f:
        committed = json.load(f)
    assert committed == mod.build_evidence(set(all_queries())), (
        "driver_evidence.json is stale — run: python tools/update_evidence.py"
    )
    # the fold is restricted to LIVE registry names (r7 verdict: a
    # deregistered query's stale row must not linger — it could jump the
    # rotation queue as "non-green" if the name were ever re-registered)
    assert set(committed) <= set(all_queries()), (
        "driver_evidence.json holds rows for deregistered queries — "
        "run: python tools/update_evidence.py"
    )


def test_rotation_policy_window():
    """The 50-name driver window must lead with non-green external
    records, then never-driver-checked queries, then oldest green rows —
    i.e. front_order is actually wired into all_queries()."""
    from kinesumer_spark.registry import _load_evidence

    evidence = _load_evidence()
    names = list(all_queries())
    window = names[:50]

    def bucket(n):
        ev = evidence.get(n)
        if ev is None:
            return 1
        return 0 if ev["status"] != "green" else 2

    # buckets must be non-decreasing over the whole ordering
    buckets = [bucket(n) for n in names]
    assert buckets == sorted(buckets)
    # within the green bucket, driver rounds must be non-decreasing
    green_rounds = [
        evidence[n]["round"] for n in names if bucket(n) == 2
    ]
    assert green_rounds == sorted(green_rounds)
    # every non-green and never-checked query fits in (or leads) the window
    backlog = [n for n in names if bucket(n) < 2]
    assert window[: len(backlog)] == backlog[:50]


def test_schema_lint_rejects_complex_columns():
    """The r2/r6 failure class (array-typed output columns crash the
    driver canonicalizer) is banned structurally: lint_output_schema is
    applied to every registered query inside check_query, so this test
    only needs to pin the lint itself."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    from kinesumer_spark.oracle import lint_output_schema

    bad = StructType(
        [
            StructField("ok", LongType()),
            StructField("arr", ArrayType(StringType())),
            StructField("mp", MapType(StringType(), LongType())),
            StructField(
                "st", StructType([StructField("x", LongType())])
            ),
        ]
    )
    problems = lint_output_schema(bad)
    assert len(problems) == 3
    assert all("serialize" in p for p in problems)
    good = StructType([StructField("ok", LongType()), StructField("s", StringType())])
    assert lint_output_schema(good) == []
