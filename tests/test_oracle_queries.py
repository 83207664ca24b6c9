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
