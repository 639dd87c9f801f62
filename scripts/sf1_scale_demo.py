#!/usr/bin/env python
"""One-off sf1 scale demo of the 22 TPC-H join-tree shapes.

The fixtures top out at sf0.1 (~600k lineitem). This script builds an
sf1-EQUIVALENT dataset (~6M lineitem) by replicating sf0.1 tenfold
with consistent key shifting — every copy's primary keys AND the
foreign keys that reference them move together by ``copy * base``, so
referential integrity and join fan-outs are preserved exactly while
the scaled tables grow 10x (nation/region stay fixed, as TPC-H
specifies). It then times each of the 22 registered Q-shape analogs at
sf0.1 and at the synthetic sf1 in one warm session (best-of-2 per
scale) and prints a markdown table for SCALE.md: the check is that the
deep join trees HOLD THEIR PLANS when the data is 10x — a query whose
time grows far beyond the data growth has a plan that broke (lost
broadcast, new shuffle, spill), which is exactly what a 100 TB
deployment needs to know before it happens.

Usage: python scripts/sf1_scale_demo.py [--keep]
The synthetic dataset lands in per-PID scratch and is wiped at the end
unless --keep is passed. Demo evidence only — the correctness gate for
these 22 queries is their DuckDB value-hash oracle at sf0.01.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10
SRC = "/root/testdata/sf0.1"

# Q-number -> registered query name (COVERAGE.md maps these to the
# TPC-H shapes; Q13 has two analogs, the histogram form is the
# textbook one)
Q_SHAPES = {
    1: "pricing_summary",
    2: "cheapest_supplier_per_part",
    3: "shipping_priority_topk",
    4: "order_priority_exists",
    5: "local_supplier_revenue",
    6: "discount_revenue_delta",
    7: "volume_shipping_pairs",
    8: "nation_market_share",
    9: "nation_profit_by_year",
    10: "returned_item_losses",
    11: "important_revenue_nations",
    12: "late_lines_by_priority_class",
    13: "customer_order_histogram",
    14: "promo_revenue_share",
    15: "top_supplier_revenue",
    16: "part_supplier_variety",
    17: "small_qty_revenue_by_brand",
    18: "big_ticket_orders",
    19: "disjunctive_promo_revenue",
    20: "promotable_part_suppliers",
    21: "waiting_suppliers",
    22: "lapsed_customer_balance",
}

# (table, [(column, base_table)]) — keys shifted by copy * base(table)
_SHIFTS = {
    "customer": [("c_custkey", "customer")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "part": [("p_partkey", "part")],
    "supplier": [("s_suppkey", "supplier")],
}
_KEYS = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
}


def build_sf1(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    bases = {}
    for t, key in _KEYS.items():
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        bases[t] = int(df.agg(F.max(key)).first()[0]) + 1
    for t in ("nation", "region"):  # fixed tables, copied once
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )
    for t, shifts in _SHIFTS.items():
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        rep = df.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("_rep"))
        )
        for col, base_t in shifts:
            rep = rep.withColumn(
                col, F.col(col) + F.col("_rep") * F.lit(bases[base_t])
            )
        (
            rep.drop("_rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"{t}.parquet"))
        )


def timed(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn(spark, sf_dir).collect()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> int:
    keep = "--keep" in sys.argv
    from automate_data_ingestion_project_spark.session import get_spark
    from automate_data_ingestion_project_spark.analytics import QUERIES
    from automate_data_ingestion_project_spark.analytics.load import (
        scratch_dir,
    )
    import __spark_entry__  # noqa: F401  (populates the registry)

    spark = get_spark()
    out_dir = scratch_dir("sf1_scale_demo")
    print(f"building sf1-equivalent ({REPLICAS}x sf0.1) at {out_dir} ...")
    t0 = time.monotonic()
    build_sf1(spark, out_dir)
    n_li = spark.read.parquet(os.path.join(out_dir, "lineitem.parquet")).count()
    print(f"built in {time.monotonic() - t0:.1f}s; lineitem rows = {n_li}")

    # warm-up (JVM/codegen/footers) before any timing
    QUERIES["pricing_summary"].fn(spark, SRC).collect()

    rows = []
    for q in sorted(Q_SHAPES):
        name = Q_SHAPES[q]
        fn = QUERIES[name].fn
        t_small = timed(fn, spark, SRC)
        t_big = timed(fn, spark, out_dir)
        ratio = t_big / t_small if t_small > 0 else float("inf")
        rows.append((q, name, t_small, t_big, ratio))
        print(
            f"Q{q:<2} {name:<32} sf0.1 {t_small:6.2f}s  "
            f"sf1 {t_big:6.2f}s  x{ratio:5.2f}"
        )

    print("\n| Q | query | sf0.1 s | sf1 s | time ratio (10x data) |")
    print("|---|---|---|---|---|")
    for q, name, ts, tb, r in rows:
        print(f"| Q{q} | `{name}` | {ts:.2f} | {tb:.2f} | {r:.2f}x |")
    worst = max(rows, key=lambda x: x[4])
    tot_s = sum(r[2] for r in rows)
    tot_b = sum(r[3] for r in rows)
    print(
        f"\ntotals: sf0.1 {tot_s:.1f}s, sf1 {tot_b:.1f}s "
        f"({tot_b / tot_s:.2f}x on 10x data); worst ratio "
        f"Q{worst[0]} `{worst[1]}` {worst[4]:.2f}x"
    )
    if not keep:
        shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
