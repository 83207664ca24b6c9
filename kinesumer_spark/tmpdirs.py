"""Session-scoped temp directories for fixture/staging paths.

Registered queries stage arrival chunks, checkpoints, and scratch
sinks under ``tempfile.mkdtemp``; most protocol ops remove them in a
``finally``, but the simple staging paths historically leaked one
small directory per invocation (the class the r14 driver advice
flagged for the bucketed-gate files). ``session_mkdtemp`` is a drop-in
replacement that registers every directory it creates for best-effort
removal at interpreter exit, so a long bench or test session leaves
/tmp the way it found it while the directories stay alive for the
whole session (streaming sources may re-list them until the query
stops).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_DIRS: list[str] = []
_registered = False


def scratch_base() -> str | None:
    """Base directory for per-run scratch (staging chunks, streaming
    checkpoints, scratch sinks) — every path created here is ephemeral:
    born under ``mkdtemp`` for one query run and removed by the caller's
    ``finally`` or the atexit hook, never reused across runs.

    ``SPARK_GRAFT_SCRATCH`` (read per call so it can be A/B'd):
      - ``auto`` (default): prefer a RAM-backed ``/dev/shm`` when it is
        present and writable, else the ``tempfile`` default. Rationale
        (guide §5/§6): the RocksDB state-store commit zips + fsyncs every
        store snapshot to the checkpoint dir and the protocol rows stage
        arrival chunks through parquet; on a virtual disk those fsyncs
        measure the sandbox's disk, not the computation. Production
        equivalent: fast local volumes for scratch (``spark.local.dir``
        on NVMe/ramdisk) with DURABLE checkpoints on DFS + RocksDB
        changelog checkpointing — durability of bench scratch buys
        nothing because the run that would recover from it deletes it.
      - an explicit path: use it (cluster-side tuning hook).
      - ``0``/``off``/``disk``: force the ``tempfile`` default.
    """
    v = os.environ.get("SPARK_GRAFT_SCRATCH", "auto").strip()
    if v.lower() in ("0", "off", "disk", ""):
        return None
    if v.lower() == "auto":
        shm = "/dev/shm"
        return shm if os.path.isdir(shm) and os.access(shm, os.W_OK) else None
    return v if os.path.isdir(v) and os.access(v, os.W_OK) else None


def _cleanup() -> None:
    for d in _DIRS:
        shutil.rmtree(d, ignore_errors=True)


def register_tmpdir(path: str) -> str:
    """Register an existing (or deterministic, caller-created) path for
    atexit removal. Idempotent per path."""
    global _registered
    if path not in _DIRS:
        _DIRS.append(path)
    if not _registered:
        atexit.register(_cleanup)
        _registered = True
    return path


def session_mkdtemp(prefix: str, dir: str | None = None) -> str:
    """``tempfile.mkdtemp`` + atexit removal (idempotent with any
    explicit ``finally`` rmtree a caller already performs). Unless the
    caller pins ``dir``, scratch lands under :func:`scratch_base`."""
    if dir is None:
        dir = scratch_base()
    return register_tmpdir(tempfile.mkdtemp(prefix=prefix, dir=dir))
