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
import shutil
import tempfile

_DIRS: list[str] = []
_registered = False


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
    explicit ``finally`` rmtree a caller already performs)."""
    return register_tmpdir(tempfile.mkdtemp(prefix=prefix, dir=dir))
