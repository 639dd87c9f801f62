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
        "shard_export_sec",
    }
    # the terminal export materialized real files and read them back
    assert out["shards"] > 0
    assert out["shard_docs"] == out["rows_curated"]
    assert out["shard_files"] > 0 and out["shard_bytes"] > 0


def test_scale_demo_constant_density_mode(spark, sf_dir, capsys):
    """--class-size=K plants dup classes of EXACTLY K members keyed by
    (doc, rep div K): at REP=K every doc has one group, so selected
    classes span all replicas and the drop count equals
    (K-1)·(#selected docs) — and the drop RATIO must sit near the
    planted 15%·(K-1)/K, the density that stays constant as REP grows
    (the property the SCALE.md linearity measurement relies on)."""
    import scale_demo

    rc = scale_demo.main(["scale_demo.py", "4", sf_dir, "--class-size=4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["class_size"] == 4
    assert out["rows_scaled"] == 4 * out["rows_in"]
    ratio = out["rows_dropped"] / out["rows_scaled"]
    # planted: 15% of groups are dup classes, each dropping (K-1)/K of
    # its rows → expectation 0.15·3/4 ≈ 0.1125; selection is a crc32
    # bucket over ~rows_in docs, so allow sampling slack
    assert 0.07 < ratio < 0.16, ratio
