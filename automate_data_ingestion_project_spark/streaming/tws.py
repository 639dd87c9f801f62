"""transformWithState processors — the Spark 4 successor to
``applyInPandasWithState`` for custom stateful streaming operators.

RUNTIME-GATED in this container: the transformWithState state-server
protocol speaks protobuf between the JVM and the Python worker, and
``google.protobuf`` is not installed here (verified: the stream fails
in ``validateAndMaybeEvolveStateSchema`` with ``cannot import name
'descriptor' from 'google.protobuf'``). Same status as the Delta MERGE
body (``io/lakehouse.py``): the code is real and the PROCESSOR LOGIC is
unit-tested against a fake handle (``tests/test_tws.py``); only the
engine seam awaits an environment with protobuf. The production-path
twin that DOES execute here is ``user_running_totals``
(``streaming/events.py``, applyInPandasWithState), driver-checked by
``stream_stateful_totals``.

Why migrate at all: transformWithState adds composable typed state
(multiple ValueState/ListState/MapState per processor), timers, TTL,
and initial-state bootstrap — the features long-running 100 TB/day
stateful jobs end up hand-rolling on the old API.
"""

from __future__ import annotations

try:  # pragma: no cover - import surface differs when protobuf exists
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running event totals — the ``user_running_totals``
    semantics on the transformWithState API.

    State: one ValueState holding ``(count,)``. Emission contract
    (identical to the old-API twin, so the same oracle applies):
    update mode, one row per touched key per micro-batch carrying the
    post-batch total; totals only grow, so max(emission) == final
    total.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.count = handle.getValueState("count", "cnt long")

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        n = 0
        for pdf in rows:
            n += len(pdf)
        prior = self.count.get()[0] if self.count.exists() else 0
        total = prior + n
        self.count.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "total_events": [total]})

    def close(self) -> None:
        pass


def user_running_totals_tws(stream_df):
    """``user_running_totals`` via transformWithStateInPandas.

    Raises the underlying engine error in containers without
    ``google.protobuf``; see module docstring.
    """
    return stream_df.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType="user_id long, total_events long",
        outputMode="Update",
        timeMode="None",
    )
