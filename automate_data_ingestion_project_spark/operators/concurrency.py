"""Concurrent driver-side job submission for independent actions.

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls
them sequentially. A store-protocol step that performs two or three
INDEPENDENT writes (the near-dup index's rows/bands appends, its
per-tree compactions) wastes the tail of each job — the last few
tasks leave most cores idle — and, worse locally, serializes each
job's fixed submit/commit overhead. Submitting the independent
actions from a small thread pool lets the next job's tasks backfill
the idle cores (FIFO scheduling gives exactly the backfill behavior),
which is the optimization guide's §2.6 pattern and is just as valid
on a 100-node cluster as on local[32].

``pyspark.InheritableThread`` is the documented way to run driver
threads under pinned-thread mode (JVM thread-local properties —
job group, description — are inherited and cleaned up).
"""

from __future__ import annotations

from typing import Callable

from pyspark import InheritableThread


def run_concurrently(*actions: Callable[[], None]) -> None:
    """Run the given zero-arg actions on concurrent driver threads and
    wait for ALL of them; if any raised, re-raise the first error
    (after every thread finished — no half-tracked state). Actions
    must be mutually independent: no ordering is preserved between
    them, only the barrier at the end."""
    if len(actions) == 1:
        actions[0]()
        return
    errors: list[BaseException] = []

    def _guard(fn: Callable[[], None]) -> Callable[[], None]:
        def run() -> None:
            try:
                fn()
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                errors.append(exc)

        return run

    threads = [InheritableThread(target=_guard(fn)) for fn in actions]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
