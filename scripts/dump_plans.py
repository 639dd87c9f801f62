#!/usr/bin/env python
"""Dump ``explain("formatted")`` of registered queries to files.

Usage: python scripts/dump_plans.py <outdir> <suffix> <query> [...]
Writes ``<outdir>/<query>_<suffix>.txt`` for each named query. For the
imperative store-protocol queries the returned DataFrame's plan is the
decision/stats table only — the protocol's job structure is measured
separately by profile_jobs.py — but the plan still pins scan pruning,
join strategies, and exchange counts for the declarative tail.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.makedirs(outdir, exist_ok=True)

    from automate_data_ingestion_project_spark.session import get_spark
    from automate_data_ingestion_project_spark.analytics import QUERIES
    import __spark_entry__  # noqa: F401

    spark = get_spark(app_name="dump-plans")
    from automate_data_ingestion_project_spark.operators.caching import (
        release_caches,
    )

    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        release_caches()
    return 0


if __name__ == "__main__":
    sys.exit(main())
