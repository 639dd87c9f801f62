"""Simulate the driver: vanilla SparkSession, import __spark_entry__,
smoke entry(), run every query at sf0.01 vs duckdb oracle.

Uses tests.oracle.compare — the single dtype-sensitive comparison (the
r8 HUGEINT escape shipped because this script kept its own dtype-blind
copy of the check; it must never diverge from the pytest harness again).
"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

from tests.oracle import compare, duckdb_connection

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

# smoke
df = E.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={df.columns}")
assert len(rows) > 0

SF = "/root/testdata/sf0.01"
con = duckdb_connection(SF)

only = set(sys.argv[1:])  # optional: restrict to named queries
qs, oracles = E.queries(), E.oracle_sql()
unknown = only - set(qs)
if unknown:
    # a typo here would run ZERO comparisons and exit 0 — a fake green
    # on the exact gate this script exists to provide
    print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
    sys.exit(2)
fails = []
for name, fn in sorted(qs.items()):
    if only and name not in only:
        continue
    sdf = fn(spark, SF)
    if name not in oracles:
        print(f"{name}: rows-only, {sdf.count()} rows")
        continue
    rep = compare(sdf, con, oracles[name])
    status = "OK" if rep["ok"] else "MISMATCH"
    print(
        f"{name}: {status} spark={rep['spark_rows']} duck={rep['duck_rows']} "
        f"cols_ok={rep['cols_ok']} types_ok={rep['types_ok']} vals_ok={rep['values_ok']}"
    )
    if not rep["ok"]:
        fails.append(name)
        if rep["type_mismatches"]:
            print("   types:", rep["type_mismatches"])
        for a, b in rep.get("first_diffs", [])[:3]:
            print("   spark:", a, "\n   duck :", b)
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
