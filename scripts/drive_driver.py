"""Simulate the driver: vanilla SparkSession, import __spark_entry__,
smoke entry(), run every query at sf0.01 vs duckdb oracle."""
import sys, math, duckdb
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

# smoke
df = E.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={df.columns}")
assert len(rows) > 0

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v

qs, oracles = E.queries(), E.oracle_sql()
fails = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if name not in oracles:
        print(f"{name}: rows-only, {len(srows)} rows")
        continue
    rel = con.sql(oracles[name])
    drows = [tuple(r) for r in rel.fetchall()]
    dcols = list(rel.columns)
    ok_cols = sorted(scols) == sorted(dcols)
    ok_cnt = len(srows) == len(drows)
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sset = sorted([tuple(norm(r[i]) for i in so) for r in srows], key=str)
    dset = sorted([tuple(norm(r[i]) for i in do) for r in drows], key=str)
    ok_vals = sset == dset
    status = "OK" if (ok_cols and ok_cnt and ok_vals) else "MISMATCH"
    print(f"{name}: {status} spark={len(srows)} duck={len(drows)} cols_ok={ok_cols} vals_ok={ok_vals}")
    if status != "OK":
        fails.append(name)
        for a, b in list(zip(sset, dset))[:3]:
            if a != b: print("   spark:", a, "\n   duck :", b)
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
