#!/usr/bin/env python
"""Pipeline driver program (SURVEY.md §2.11 D4) — the engine's analog of
``python scripts/etl.py`` (``/root/reference/scripts/etl.py:69-70``).

Usage::

    python scripts/run_pipeline.py CONFIG_YAML WAREHOUSE_DIR

Fetches every (scope, code) in the config's work-list from the live
API, normalizes, and upserts into ``WAREHOUSE_DIR/src_<scope>``.
Exit code 0 if every code in every scope succeeded; 1 if any code
failed (failed codes are isolated, not fatal — see pipeline.py).
"""

from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automate_data_ingestion_project_spark.analytics.dv3f import METRICS
from automate_data_ingestion_project_spark.pipeline import (
    SCOPE_ID_VARS,
    load_pipeline_config,
    run_pipeline,
)
from automate_data_ingestion_project_spark.session import get_spark


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s"
    )
    with open(argv[1]) as fh:
        config = load_pipeline_config(fh.read())
    warehouse = argv[2]
    scopes = config.get("args", {}).get("scope", {})
    paths = {s: os.path.join(warehouse, f"src_{s}") for s in scopes}
    unknown = set(scopes) - set(SCOPE_ID_VARS)
    if unknown:
        print(f"unknown scopes in config: {sorted(unknown)}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="dv3f-pipeline")
    reports = run_pipeline(spark, config, paths, METRICS)
    failed = 0
    for r in reports:
        print(
            f"scope={r.scope} ok={len(r.codes_ok)} failed={len(r.codes_failed)} "
            f"rows={r.rows_upserted}"
        )
        failed += len(r.codes_failed)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
