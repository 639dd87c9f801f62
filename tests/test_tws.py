"""transformWithState processor logic, tested against a fake handle.

The engine seam is runtime-gated in this container (no
``google.protobuf`` — see ``streaming/tws.py``); these tests prove the
processor's state transitions and emission contract, which is the part
the engine does NOT own.
"""

import importlib.util

import pandas as pd
import pytest

from automate_data_ingestion_project_spark.streaming.tws import (
    RunningTotalsProcessor,
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())


def _run_batch(proc, key, sizes):
    out = list(proc.handleInputRows(key, (pd.DataFrame({"x": range(s)}) for s in sizes), None))
    assert len(out) == 1  # one emission per touched key per batch
    return out[0]


def test_totals_accumulate_across_batches():
    proc = RunningTotalsProcessor()
    proc.init(_FakeHandle())
    first = _run_batch(proc, (7,), [3, 2])
    assert first.to_dict("records") == [{"user_id": 7, "total_events": 5}]
    second = _run_batch(proc, (7,), [4])
    assert second.to_dict("records") == [{"user_id": 7, "total_events": 9}]


def test_state_is_per_processor_instance():
    a, b = RunningTotalsProcessor(), RunningTotalsProcessor()
    a.init(_FakeHandle())
    b.init(_FakeHandle())
    _run_batch(a, (1,), [10])
    out = _run_batch(b, (1,), [1])
    assert out.total_events.iloc[0] == 1  # b never saw a's batches


@pytest.mark.skipif(
    importlib.util.find_spec("google") is None,
    reason="transformWithState state server needs google.protobuf "
    "(absent in this container; logic covered by the fake-handle tests)",
)
def test_tws_end_to_end(spark, sf_dir, tmp_path):
    from automate_data_ingestion_project_spark.streaming.tws import (
        user_running_totals_tws,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3)], "user_id long, event_id long"
    ).write.parquet(src)
    stream = spark.readStream.schema("user_id long, event_id long").parquet(src)
    out = user_running_totals_tws(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_e2e")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.user_id: r.total_events for r in spark.table("tws_e2e").collect()}
    assert got == {1: 2, 2: 1}
