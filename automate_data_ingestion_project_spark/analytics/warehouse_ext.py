"""Extended warehouse SQL surface — shapes the reference lacks
(SURVEY.md §2.13 verified-absent list) that a complete engine ships:
ROLLUP hierarchies, set operations, exact interpolated percentiles.

All pure Spark SQL/DataFrame builtins; each oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum, dsum_expr
from ..io import load_table
from .registry import register


@register(
    "sales_rollup",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           {dsum_expr('o_totalprice')} AS sales
    FROM orders
    GROUP BY ROLLUP (CAST(year(o_orderdate) AS INTEGER), o_orderpriority)
    """,
    survey_ref="rollup hierarchy (engine extension; absent in reference §2.13)",
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year → priority → grand-total hierarchy in ONE pass (Expand +
    single shuffle — not one job per level)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
        )
        .rollup("order_year", "priority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sales"))
    )


@register(
    "repeat_customers_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    survey_ref="INTERSECT (engine extension; absent in reference §2.13)",
)
def repeat_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    return urgent.intersect(high)


@register(
    "nation_only_keys_except",
    oracle="""
    SELECT n_nationkey AS k FROM nation
    EXCEPT
    SELECT r_regionkey AS k FROM region
    """,
    survey_ref="EXCEPT (engine extension; absent in reference §2.13)",
)
def nation_only_keys_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference over the dimension key spaces (25 nation keys minus
    the 5 overlapping region keys — non-empty at every scale factor)."""
    nations = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k")
    )
    regions = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k")
    )
    return nations.subtract(regions)  # EXCEPT DISTINCT (set semantics)


@register(
    "price_quantiles",
    oracle="""
    SELECT o_orderpriority AS priority,
           quantile_cont(o_totalprice, 0.25) AS q25,
           quantile_cont(o_totalprice, 0.5) AS median,
           quantile_cont(o_totalprice, 0.75) AS q75
    FROM orders
    GROUP BY o_orderpriority
    """,
    survey_ref="A8 (exact interpolated quantiles — the *_q25/median/q75 columns "
    "the reference's API precomputes, config.yaml:44-61)",
)
def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (sort-based) — the oracle requires exactness;
    at 100 TB swap in percentile_approx and accept the documented error
    bound."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q25"),
        F.expr("percentile(o_totalprice, 0.5)").alias("median"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q75"),
    )


@register(
    "orders_rolling_revenue",
    oracle=f"""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS rev
        FROM orders GROUP BY 1
    )
    SELECT month, n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (
               ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS revenue_3m
    FROM monthly
    """,
    survey_ref="window frames: trailing 3-month revenue (engine extension)",
)
def orders_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-month revenue via a ROWS-frame window.

    Scale shape: the window runs over the POST-AGGREGATION monthly
    relation, whose row count is bounded by the calendar (|months|),
    not the data — a global ordered window there is O(100) rows at any
    corpus size. The frame sums DECIMAL-accumulated values (the `dsum`
    discipline) so the sliding-frame incremental add/remove the
    window executor performs stays exact — a double frame-sum would be
    order-sensitive and flap the oracle hash.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("rev"),
        )
    )
    frame = Window.orderBy("month").rowsBetween(-2, Window.currentRow)
    return monthly.select(
        "month",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(frame).cast("double").alias("revenue_3m"),
    )
