"""Golden assignment-vector tests — direct ports of the reference's
TestShardsRebalancing expectations (kinesumer_test.go:231-243 for
5 shards / 3 clients, :272-306 for the 8-shard rescale)."""

from __future__ import annotations

import pytest

from kinesumer_spark.streaming.assignment import (
    full_assignment,
    leader,
    split_shard_ids,
)


def _ids(lo: int, hi: int) -> list[str]:
    return [f"shardId-{i:012d}" for i in range(lo, hi)]


def test_golden_5_shards_3_clients():
    """kinesumer_test.go:231-243: expected [[s0,s1],[s2],[s3,s4]]."""
    shards = _ids(0, 5)
    clients = ["client-a", "client-b", "client-c"]
    assignment = full_assignment(shards, clients)
    assert assignment["client-a"] == _ids(0, 2)
    assert assignment["client-b"] == _ids(2, 3)
    assert assignment["client-c"] == _ids(3, 5)


def test_golden_8_shards_3_clients_after_rescale():
    """kinesumer_test.go:272-306: 8 open shards re-split as [3,2,3]."""
    shards = _ids(5, 13)  # shards 5..12, the post-rescale open set
    clients = ["client-a", "client-b", "client-c"]
    assignment = full_assignment(shards, clients)
    assert assignment["client-a"] == _ids(5, 8)
    assert assignment["client-b"] == _ids(8, 10)
    assert assignment["client-c"] == _ids(10, 13)


def test_split_covers_all_shards_without_overlap():
    for n_shards in (1, 2, 5, 8, 13, 100):
        for n_clients in (1, 2, 3, 7):
            shards = _ids(0, n_shards)
            parts = [
                split_shard_ids(shards, i, n_clients) for i in range(n_clients)
            ]
            flat = [s for p in parts for s in p]
            assert flat == shards, (n_shards, n_clients, parts)


def test_leader_is_smallest_client_id():
    assert leader(["zeta", "alpha", "mid"]) == "alpha"
    assert leader([]) is None


def test_split_rejects_bad_indices():
    with pytest.raises(ValueError):
        split_shard_ids(_ids(0, 5), 3, 3)
    with pytest.raises(ValueError):
        split_shard_ids(_ids(0, 5), 0, 0)
