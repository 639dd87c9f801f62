"""Caller-scoped persist tracking for library operators.

Library operators persist intermediates that feed two plan branches
(e.g. shingles feeding both sides of a self-join, tf feeding both the
df aggregate and the ranking join). The persist must OUTLIVE the
operator function — queries return lazy DataFrames and the cache is
only useful during the caller's eventual action — so a try/finally
inside the operator would unpersist before the cache is ever hit.

Instead every library persist routes through :func:`tracked_persist`,
which registers the persisted DataFrame in a session-global list, and
callers release the whole scope after their action:

    result = some_query(spark, sf_dir)
    rows = result.collect()          # caches populated + used here
    release_caches()                 # drop them; storage back to zero

Without a release, repeated operator calls accumulate cached relations
until executor storage evicts under pressure (correct but wasteful —
eviction is LRU churn, not a leak of wrong data). ``bench.py`` and the
pipeline runner call :func:`release_caches` after every query action;
``tests/test_caching.py`` asserts the sweep leaves zero persistent RDDs.

THREAD SAFETY (r17, from the r16 advisory): store-protocol steps now
run on concurrent driver threads (``operators.concurrency.
run_concurrently``), so the registry is guarded by a lock, and
:func:`persist_scope` tracks the persists registered by the CURRENT
THREAD inside the scope (a ``threading.local`` stack) instead of
slicing the global list — a ``tracked_persist`` from another thread
landing inside the scope window is no longer swept by the scope exit.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_ACTIVE: list[DataFrame] = []
# per-thread stack of open persist_scope collectors; InheritableThread
# children get their own empty stack, which is exactly the isolation
# the scope semantics need
_SCOPES = threading.local()


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + register for a later :func:`release_caches`."""
    persisted = df.persist(storage_level) if storage_level else df.persist()
    with _LOCK:
        _ACTIVE.append(persisted)
    stack = getattr(_SCOPES, "stack", None)
    if stack:
        stack[-1].append(persisted)
    return persisted


@contextmanager
def persist_scope():
    """Release every :func:`tracked_persist` registered by THIS THREAD
    inside the scope when it exits — for protocol steps that fully
    materialize their result (collect / eager localCheckpoint) before
    returning.

    Why it exists: a library persist that outlives its action is
    normally just wasted storage (release_caches sweeps it after the
    query), but inside a MUTATING protocol it is a correctness hazard:
    a cached plan fragment over a store path pins that path's file
    listing, and when a later step compacts/swaps the store the
    CacheManager recache rebuilds the entry against the displaced
    listing — any later plan that canonically matches the fragment is
    then silently substituted with a scan of deleted files
    (FAILED_READ_FILE.FILE_NOT_EXIST; the near-dup ingest→compact→
    ingest replay hit exactly this once compactions ran concurrently).
    Scoping the persists to the step that materializes their consumer
    removes the stale entry before any mutation can race it — and
    keeps a long-running loop's cache footprint bounded per epoch
    instead of accumulating until release_caches.
    """
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = []
        _SCOPES.stack = stack
    scoped: list[DataFrame] = []
    stack.append(scoped)
    try:
        yield
    finally:
        stack.pop()
        ids = {id(df) for df in scoped}
        with _LOCK:
            _ACTIVE[:] = [d for d in _ACTIVE if id(d) not in ids]
        for df in scoped:
            try:
                df.unpersist()
            except Exception:  # session already stopped
                pass


def untrack(df: DataFrame) -> None:
    """Remove ``df`` from the registry without unpersisting (for
    operators that manage an intermediate's lifetime themselves, e.g.
    the per-round unpersist in connected_components)."""
    with _LOCK:
        _ACTIVE[:] = [d for d in _ACTIVE if d is not df]
    stack = getattr(_SCOPES, "stack", None)
    if stack:
        for lst in stack:
            lst[:] = [d for d in lst if d is not df]


def release_caches() -> int:
    """Unpersist every tracked DataFrame; returns how many were live.

    Safe to call at any point after the caller's action; blocking=False
    (Spark's default) so release is async on the executors.
    """
    n = 0
    while True:
        with _LOCK:
            if not _ACTIVE:
                break
            df = _ACTIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
