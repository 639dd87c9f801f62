"""SQL-scripting gate: both branches of the compound statement."""

from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.analytics.scripting import (
    _GATE_PREDICATE,
    _PUBLISH_SQL,
    scripted_quality_gate,
)


def _run_gate(spark, view):
    return spark.sql(f"""
    BEGIN
      DECLARE n_bad BIGINT DEFAULT 0;
      SET n_bad = (SELECT COUNT(*) FROM {view} WHERE {_GATE_PREDICATE});
      IF n_bad = 0 THEN
        {_PUBLISH_SQL.format(rel=view)};
      ELSE
        SELECT 'QUARANTINED' AS priority,
               CAST(0 AS BIGINT) AS n_orders,
               CAST(0.0 AS DOUBLE) AS total_value,
               CAST(n_bad AS INT) AS n_violations;
      END IF;
    END
    """)


def test_clean_input_publishes_aggregate(spark, sf_dir):
    out = scripted_quality_gate(spark, sf_dir)
    rows = out.collect()
    assert len(rows) >= 1
    assert all(r.n_violations == 0 for r in rows)
    assert all(r.priority != "QUARANTINED" for r in rows)


def test_planted_violations_quarantine(spark):
    bad = spark.createDataFrame(
        [("1-URGENT", 10.0, 1, "2024-01-01"), ("2-HIGH", -5.0, 2, "2024-01-02"),
         ("2-HIGH", 7.0, None, "2024-01-03")],
        "o_orderpriority string, o_totalprice double, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    bad.createOrReplaceTempView("bad_orders_for_gate")
    rows = _run_gate(spark, "bad_orders_for_gate").collect()
    assert len(rows) == 1
    assert rows[0].priority == "QUARANTINED"
    assert rows[0].n_violations == 2  # one negative price + one null custkey
    assert rows[0].n_orders == 0
