"""Session-scoped scratch-directory lifecycle.

Every scratch tree the package materializes under the system tempdir —
ingest artifacts (bucketed/z-ordered/hive-partitioned copies, hub
logs) and streaming checkpoints — is allocated through
:func:`scratch_dir` so it is tracked and reclaimed:

- streaming checkpoints are :func:`release`-d the moment their drained
  query stops (a memory-sink drain with a fresh sink name never
  restarts from its checkpoint, so keeping it is pure leak);
- ingest artifacts are keyed by ``applicationId`` and therefore useless
  to any other process, so an ``atexit`` sweep removes whatever is
  still tracked when the interpreter exits.

Without this, a long-lived driver leaks one artifact tree per session
and one checkpoint directory per streaming drain — the operational-debt
class a 100 TB deployment cannot carry (each full-catalog run used to
strand ~300 MB of ``/tmp`` state; the round-7 advice flagged the same
leak in an example).

Opt-out: set ``SEH_KEEP_SCRATCH=1`` to keep everything (forensics).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading

_LOCK = threading.Lock()
_TRACKED: set[str] = set()


def _keep() -> bool:
    return bool(os.environ.get("SEH_KEEP_SCRATCH"))


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` plus end-of-process reclamation."""
    d = tempfile.mkdtemp(prefix=prefix)
    with _LOCK:
        _TRACKED.add(d)
    return d


def track(path: str) -> str:
    """Register an externally-created directory for the exit sweep."""
    with _LOCK:
        _TRACKED.add(path)
    return path


def release(path: str) -> None:
    """Remove a tracked directory now (drained-checkpoint path)."""
    with _LOCK:
        _TRACKED.discard(path)
    if not _keep():
        shutil.rmtree(path, ignore_errors=True)


def tracked() -> set[str]:
    with _LOCK:
        return set(_TRACKED)


def sweep() -> list[str]:
    """Remove every still-tracked directory; returns what was removed.

    Runs via ``atexit``; callable directly (tests, long-lived drivers
    that recycle SparkSessions and want the artifacts of the previous
    session gone without waiting for process exit). Mid-process sweeps
    are safe because every consumer of a tracked tree re-validates the
    directory before reuse and rebuilds at a fresh location
    (queries._validated_scratch_memo, bucketing._table_alive,
    layout's isdir-checked caches) — pinned by
    tests/test_workdirs.py::test_sweep_mid_session_self_heals.
    """
    with _LOCK:
        paths = list(_TRACKED)
        _TRACKED.clear()
    if _keep():
        return []
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    return paths


atexit.register(sweep)
