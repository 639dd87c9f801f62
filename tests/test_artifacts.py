"""build-once artifact store: fingerprint reuse, stale pruning, and the
concurrent-builder safety rule (never delete another process's
in-flight .build-* scratch)."""

from __future__ import annotations

import os

from automate_data_ingestion_project_spark.io.artifacts import (
    build_once,
    fixture_fingerprint,
)


def _touch_tree(d: str) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "data.txt"), "w") as fh:
        fh.write("x")


def test_build_once_builds_then_reuses(tmp_path):
    root = str(tmp_path / "art")
    calls = []

    def build(tmp):
        calls.append(tmp)
        _touch_tree(tmp)

    p1 = build_once(root, "fp1", build)
    p2 = build_once(root, "fp1", build)
    assert p1 == p2 == os.path.join(root, "fp1")
    assert calls == calls[:1], "second call must not rebuild"
    assert os.path.isfile(os.path.join(p1, "data.txt"))


def test_build_once_prunes_stale_fingerprints_only(tmp_path):
    root = str(tmp_path / "art")
    # a superseded generation and a (simulated) concurrent builder's
    # in-flight scratch
    _touch_tree(os.path.join(root, "oldfp"))
    _touch_tree(os.path.join(root, ".build-otherfp-99999"))

    build_once(root, "newfp", _touch_tree)

    remaining = sorted(os.listdir(root))
    assert "oldfp" not in remaining, "superseded generation must be pruned"
    assert ".build-otherfp-99999" in remaining, (
        "another builder's in-flight scratch must NOT be deleted"
    )
    assert "newfp" in remaining


def test_build_once_lost_race_uses_winner(tmp_path):
    root = str(tmp_path / "art")

    def build_and_race(tmp):
        _touch_tree(tmp)
        # winner publishes the fingerprint dir while we were building
        _touch_tree(os.path.join(root, "fp"))

    p = build_once(root, "fp", build_and_race)
    assert p == os.path.join(root, "fp")
    assert os.path.isdir(p)


def test_fixture_fingerprint_changes_on_rewrite(tmp_path):
    sf = str(tmp_path)
    f = os.path.join(sf, "documents.parquet")
    with open(f, "w") as fh:
        fh.write("aaa")
    fp1 = fixture_fingerprint(sf, "documents")
    # same size, later mtime — an in-place regeneration must change it
    os.utime(f, ns=(1, 2))
    fp2 = fixture_fingerprint(sf, "documents")
    assert fp1 != fp2


def test_fixture_artifact_keys_by_fixture_dir_and_content(tmp_path):
    """The consolidated idiom (key-sanitized fixture dir + content
    fingerprint + build_once): same fixture reuses the build, a
    rewritten fixture rebuilds, and two fixture dirs never share a
    cache entry even with identical content."""
    import os
    import time

    from automate_data_ingestion_project_spark.io.artifacts import (
        fixture_artifact,
    )

    builds = []

    def build(tmp):
        os.makedirs(tmp, exist_ok=True)
        builds.append(tmp)
        with open(os.path.join(tmp, "out"), "w") as fh:
            fh.write("x")

    sf_a = tmp_path / "sf0.5"
    sf_b = tmp_path / "other" / "sf0.5"
    for d in (sf_a, sf_b):
        os.makedirs(d)
        with open(d / "events.parquet", "w") as fh:
            fh.write("same bytes")

    r1 = fixture_artifact(str(sf_a), "t_fixture_artifact", ("events",), build)
    r2 = fixture_artifact(str(sf_a), "t_fixture_artifact", ("events",), build)
    assert r1 == r2 and len(builds) == 1  # cached on second call
    r3 = fixture_artifact(str(sf_b), "t_fixture_artifact", ("events",), build)
    assert r3 != r1 and len(builds) == 2  # dir is part of the key
    # in-place rewrite bumps mtime_ns → new fingerprint → rebuild
    time.sleep(0.01)
    with open(sf_a / "events.parquet", "w") as fh:
        fh.write("same bytes")
    r4 = fixture_artifact(str(sf_a), "t_fixture_artifact", ("events",), build)
    assert r4 != r1 and len(builds) == 3
