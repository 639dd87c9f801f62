"""Cross-surface equivalence: the same semantics through different
Spark-4 surfaces must agree with the canonical form — and, where the
claim is plan-level, produce the same plan shape."""

import __spark_entry__ as entrymod


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pipe_syntax_matches_nested_form(spark, sf_dir):
    qs = entrymod.queries()
    pipe = qs["pipe_syntax_revenue"](spark, sf_dir)
    nested = qs["revenue_by_nation"](spark, sf_dir).select(
        "nation", "region", "revenue", "n_orders"
    )
    assert _rows(pipe) == _rows(nested)
    # the pipe form desugars BEFORE optimization: same join strategy
    # (broadcast dims) and map-side partial aggregation as the nested form
    plan = pipe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "partial_" in plan


def test_udtf_sessions_match_window_form(spark, sf_dir):
    qs = entrymod.queries()
    udtf = qs["event_sessions_udtf"](spark, sf_dir)
    window = qs["event_sessions"](spark, sf_dir).select(udtf.columns)
    assert _rows(udtf) == _rows(window)


def test_pandas_api_matches_native_reshape(spark, sf_dir):
    qs = entrymod.queries()
    ps_form = qs["normalize_dv3f_pandas_api"](spark, sf_dir)
    native = qs["normalize_dv3f"](spark, sf_dir).select(ps_form.columns)
    assert _rows(ps_form) == _rows(native)


def test_variant_bucket_truncation_matches_duckdb_for_all_signs(spark):
    """events_variant_props buckets with ``(k / 25).cast('bigint')``;
    its oracle buckets with DuckDB ``k // 25``. Both truncate toward
    ZERO on BIGINT operands (DuckDB integer ``//`` is truncating
    division, NOT floor: ``-3 // 25 = 0``, ``-30 // 25 = -1``), so the
    engines agree for negative payloads too — switching the Spark side
    to ``F.floor`` would INTRODUCE a divergence. Pinned here over both
    signs so an engine-version semantics change surfaces as a test
    failure, not an oracle flap."""
    import duckdb
    from pyspark.sql import functions as F

    ks = [-51, -50, -49, -30, -25, -3, -1, 0, 1, 3, 24, 25, 49, 99]
    spark_buckets = [
        r.b
        for r in spark.createDataFrame([(k,) for k in ks], "k long")
        .select((F.col("k") / F.lit(25)).cast("bigint").alias("b"))
        .collect()
    ]
    duck_buckets = [
        duckdb.sql(f"SELECT CAST({k} AS BIGINT) // 25").fetchone()[0]
        for k in ks
    ]
    assert spark_buckets == duck_buckets
