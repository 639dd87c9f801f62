"""Smoke-pin for scripts/scale_demo.py — the composed ingest →
near-dup filter → curate → pack run recorded in SCALE.md. Runs the
whole script at REP=2 over sf0.001 so the demo can't silently rot as
the operators underneath it evolve."""

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

def test_scale_demo_composes_end_to_end(spark, sf_dir, capsys):
    import scale_demo

    rc = scale_demo.main(["scale_demo.py", "2", sf_dir])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rep"] == 2
    assert out["rows_scaled"] == 2 * out["rows_in"]
    # the planted dup classes guarantee drops, the cipher guarantees
    # the corpus doesn't collapse to the originals
    assert 0 < out["rows_dropped"] < out["rows_in"]
    assert out["rows_curated"] + out["rows_dropped"] == out["rows_scaled"]
    assert out["packed_docs"] > 0 and out["total_tokens"] > 0
    assert set(out["stages"]) == {
        "scale_up_sec",
        "neardup_filter_sec",
        "curate_pack_sec",
    }
