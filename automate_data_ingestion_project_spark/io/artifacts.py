"""Content-fingerprinted build-once artifact store.

Materialized derived tables (the near-dup corpus index, the verified
pair evidence) are built once per INPUT CONTENT and read from parquet
afterwards — the shape a production ingestion maintains as managed
tables. Two failure modes this module closes (both observed with the
name-keyed predecessor):

- **stale reads**: fixtures are regenerated IN PLACE between rounds
  (documented events.ts dtype drift), so a cache keyed by directory
  name alone silently serves the previous generation's artifact. Here
  the key is a fingerprint of the input files' (size, mtime_ns) — any
  regeneration changes the stamp and forces a rebuild.
- **partial builds**: "directory is non-empty" treats a crashed
  half-written Spark output (leftover ``_temporary``) as complete.
  Here builds land in a scratch dir and are atomically ``os.rename``d
  into the fingerprint path — the final path exists iff the build
  finished. (On a real deployment the same protocol is a commit to a
  transactional table format; rename-commit is the local-FS stand-in.)

Stale fingerprints of the same artifact are pruned after a successful
build so disk use stays bounded at one generation.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections.abc import Callable


def fixture_fingerprint(sf_dir: str, *tables: str) -> str:
    """Stamp of the named fixture tables' content identity.

    (file size, mtime_ns) per table folded through md5 — cheap (no data
    read) and regeneration-sensitive: rewriting a parquet in place
    bumps mtime_ns even at identical size. For multi-file tables the
    stamp folds every data file under the table path.
    """
    h = hashlib.md5()
    for t in sorted(tables):
        path = os.path.join(sf_dir, f"{t}.parquet")
        files = [path]
        if os.path.isdir(path):
            files = sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(path)
                for f in fs
                if not f.startswith((".", "_"))
            )
        for f in files:
            st = os.stat(f)
            h.update(f"{t}|{os.path.basename(f)}|{st.st_size}|{st.st_mtime_ns};".encode())
    return h.hexdigest()[:16]


def build_once(
    root: str, fingerprint: str, build: Callable[[str], None]
) -> str:
    """Return the artifact dir for ``fingerprint`` under ``root``,
    building it via ``build(tmp_dir)`` + atomic rename if absent.

    ``build`` writes everything under the tmp dir it is given; the
    rename publishes the whole tree at once, so readers never observe
    a partial artifact. A concurrent builder losing the rename race
    discards its tmp tree and uses the winner's.
    """
    os.makedirs(root, exist_ok=True)
    final = os.path.join(root, fingerprint)
    if os.path.isdir(final):
        return final
    tmp = os.path.join(root, f".build-{fingerprint}-{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        build(tmp)
        try:
            os.rename(tmp, final)
        except OSError:
            if not os.path.isdir(final):  # race lost to nobody — real error
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # Prune superseded generations. `.build-*` scratch dirs are skipped:
    # one may belong to a CONCURRENT builder mid-write (rmtree'ing it
    # would fail that builder's Spark job after the point where its
    # rename-race fallback could save it). Abandoned scratch from
    # crashed builders is reclaimed lazily — the next builder with the
    # same (fingerprint, pid) rmtree's its own path before building,
    # and superseded FINGERPRINT dirs (the unbounded-growth risk) are
    # still pruned every build.
    for d in os.listdir(root):
        if d != fingerprint and not d.startswith(".build-"):
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    return final


def fixture_artifact(
    sf_dir: str, name: str, tables: tuple[str, ...], build
) -> str:
    """The fixture-keyed artifact idiom in one place: sanitize the
    fixture dir into a cache key, fingerprint the input ``tables``
    (size + mtime_ns — regeneration-sensitive), and
    :func:`build_once` under ``cache_dir(f"{name}/{key}")``.

    Every materialized artifact (near-dup index, pair evidence, PQ
    codebook trail, IVF cell table, z-ordered copies, stream sources)
    routes through this, so the key-sanitization and cache layout have
    exactly one definition site."""
    import re

    from ..analytics.load import cache_dir  # lazy: load.py imports io.sink

    key = re.sub(r"[^A-Za-z0-9.]+", "_", sf_dir.strip("/"))
    return build_once(
        cache_dir(f"{name}/{key}"), fixture_fingerprint(sf_dir, *tables), build
    )
