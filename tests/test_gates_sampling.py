"""Quality gates + deterministic sampling operators (round 4)."""

from __future__ import annotations

from automate_data_ingestion_project_spark.analytics.gates import quality_gates
from automate_data_ingestion_project_spark.analytics.sampling import (
    SAMPLE_K,
    customer_value_quartiles,
    stratified_sample_exact,
)


def test_every_gate_fires_and_keep_is_conjunction(spark, sf_dir):
    rows = quality_gates(spark, sf_dir).collect()
    flags = ["pass_len", "pass_word_len", "pass_stopword", "pass_repetition"]
    # thresholds are fixture-tuned: a gate that never rejects is untested
    fired = {f for f in flags if any(getattr(r, f) == 0 for r in rows)}
    assert "pass_len" in fired and "pass_repetition" in fired
    for r in rows:
        assert r.keep == min(getattr(r, f) for f in flags)
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)


def test_stratified_sample_exact_k_per_lang_and_stable(spark, sf_dir):
    s1 = stratified_sample_exact(spark, sf_dir)
    rows = s1.collect()
    per_lang: dict[str, list[int]] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.doc_id)
    for lang, ids in per_lang.items():
        assert len(ids) == SAMPLE_K, (lang, len(ids))
        assert len(set(ids)) == SAMPLE_K
    # deterministic: a rerun returns the identical membership
    again = {(r.lang, r.doc_id) for r in stratified_sample_exact(spark, sf_dir).collect()}
    assert again == {(r.lang, r.doc_id) for r in rows}


def test_quartiles_partition_all_customers(spark, sf_dir):
    from automate_data_ingestion_project_spark.io import load_table

    rows = {r.quartile: r for r in customer_value_quartiles(spark, sf_dir).collect()}
    assert set(rows) == {"q1", "q2", "q3", "q4"}
    n_customers = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows.values()) == n_customers
    # quartiles are balanced within rounding of ties
    sizes = [rows[q].n_customers for q in ("q1", "q2", "q3", "q4")]
    assert max(sizes) - min(sizes) <= max(4, n_customers // 10)


def test_leakage_safe_split_keeps_components_together(spark, sf_dir):
    """Every planted near-dup pair (doc, doc+100000) must land in the
    same split — the property independent hash-splitting violates."""
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.analytics.dedup import (
        _docs_with_variants,
        dedup_minhash_pairs,
    )
    from automate_data_ingestion_project_spark.analytics.splits import (
        leakage_safe_split,
        split_bucket,
    )
    from automate_data_ingestion_project_spark.textops.components import (
        connected_components,
    )

    # re-derive the per-doc assignment the aggregate query is built on
    docs = _docs_with_variants(spark, sf_dir).select("doc_id")
    pairs = dedup_minhash_pairs(spark, sf_dir).select("doc_id_a", "doc_id_b")
    comp = connected_components(pairs)
    canon = docs.join(comp, docs["doc_id"] == comp["node"], "left").select(
        "doc_id",
        F.coalesce("component_id", F.col("doc_id")).alias("canonical_id"),
    )
    b = split_bucket(F.col("canonical_id"))
    assigned = canon.withColumn(
        "split",
        F.when(b < 80, "train").when(b < 90, "validation").otherwise("test"),
    )
    by_doc = {r.doc_id: r.split for r in assigned.collect()}
    planted = [r for r in pairs.collect()]
    assert planted, "fixture must contain near-dup pairs"
    for p in planted:
        assert by_doc[p.doc_id_a] == by_doc[p.doc_id_b]
    # and the aggregate view partitions the full corpus
    agg = leakage_safe_split(spark, sf_dir).collect()
    assert sum(r.n_docs for r in agg) == len(by_doc)


def test_weighted_systematic_sample_matches_global_window_form(spark, sf_dir):
    """The two-phase prefix sum (bucket totals → broadcast offsets →
    partitioned within-bucket window) must equal the naive global
    ordered window row-for-row, and the plan's row-scale window must be
    PARTITIONED by the bucket — the global window exists only over the
    ~N/1000-row bucket relation. Selection rate ≈ total_weight/step."""
    import __spark_entry__ as entrymod
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.analytics.sampling import (
        _SYS_STEP,
    )
    from automate_data_ingestion_project_spark.io import load_table

    df = entrymod.queries()["weighted_systematic_sample"](spark, sf_dir)
    got = sorted(tuple(r) for r in df.collect())

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    gw = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = (
        w.withColumn("cum_weight", F.sum("n_tokens").over(gw))
        .filter(
            F.expr(f"(cum_weight - n_tokens) div {_SYS_STEP}")
            < F.expr(f"cum_weight div {_SYS_STEP}")
        )
        .select("doc_id", "n_tokens", "cum_weight")
    )
    want = sorted(tuple(r) for r in naive.collect())
    assert got == want and len(got) > 0
    # the row-scale window is partitioned (the scale claim): its spec
    # carries the bucket key
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(_bucket" in plan
    # selection count tracks total_weight/step within rounding
    total = w.agg(F.sum("n_tokens")).collect()[0][0]
    assert abs(len(got) - total / _SYS_STEP) <= 1
