"""Shard-assignment parity math (observability / compatibility only).

Spark's scheduler owns partition→task assignment, so the engine never
*uses* this — but the reference's contiguous range-split is part of its
observable behavior (golden vectors in kinesumer_test.go:231-243,
:272-306), and exposing the same function lets operators of the old
system predict/compare assignments during a migration.

Reference: syncShardInfoForStream, syncclient.go:97-172 — client *i* of
*n* (clients sorted ascending; leader is index 0, syncclient.go:79-86)
owns the shard slice [round(i·S/n), round((i+1)·S/n)) over the
lexicographically-ordered open shards.
"""

from __future__ import annotations


def split_shard_ids(shard_ids: list[str], client_index: int, num_clients: int) -> list[str]:
    """The reference's range split (syncclient.go:113-117):
    ``r := S/n; shards[round(i*r) : round((i+1)*r)]`` — the division
    happens FIRST, then the multiply, then the round, exactly as the
    reference associates it; a fused ``i*S/n`` can round differently at
    tie boundaries. Go's math.Round is half-away-from-zero, which for
    non-negative values equals ``int(x + 0.5)``."""
    if num_clients <= 0:
        raise ValueError("num_clients must be positive")
    if not 0 <= client_index < num_clients:
        raise ValueError("client_index out of range")
    r = len(shard_ids) / num_clients
    lo = int(client_index * r + 0.5)
    hi = int((client_index + 1) * r + 0.5)
    return list(shard_ids[lo:hi])


def full_assignment(shard_ids: list[str], client_ids: list[str]) -> dict[str, list[str]]:
    """Assignment table for all clients. Clients are sorted ascending
    first — the same order the state store returns them in
    (statestore.go:121, Order(Ascending)); index 0 is the leader."""
    ordered = sorted(client_ids)
    return {
        cid: split_shard_ids(shard_ids, i, len(ordered))
        for i, cid in enumerate(ordered)
    }


def leader(client_ids: list[str]) -> str | None:
    """Leader election parity: smallest client id (syncclient.go:86)."""
    return min(client_ids) if client_ids else None
