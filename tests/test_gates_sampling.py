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
