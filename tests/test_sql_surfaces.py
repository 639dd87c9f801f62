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
