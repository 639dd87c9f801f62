"""Blocked fuzzy join: recall guarantee and candidate discipline."""

import pytest
from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.analytics.fuzzy import (
    _MAX_DIST,
    _SHORT,
    fuzzy_pairs,
)


def _names(spark, values):
    return spark.createDataFrame([(v,) for v in values], "name string")


def test_finds_planted_near_pairs(spark):
    vals = ["cold bolt", "old bolt", "gold bolt", "red widget", "red widgets"]
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_pairs(_names(spark, vals), "name").collect()
    }
    assert ("cold bolt", "old bolt", 1) in got
    assert ("gold bolt", "old bolt", 1) in got
    assert ("cold bolt", "gold bolt", 1) in got
    assert ("red widget", "red widgets", 1) in got
    # far pair absent
    assert not any("widget" in a and "bolt" in b for a, b, _ in got)


def test_short_stratum_is_exact_where_bigram_bound_fails(spark):
    # "cat" vs "cub": distance 2, length 3 — NO shared bigram, so the
    # blocked stratum alone would miss it; the short-stratum cross must
    # recover it (both are < _SHORT chars).
    assert len("cat") < _SHORT
    got = {
        (r.name_a, r.name_b)
        for r in fuzzy_pairs(_names(spark, ["cat", "cub", "zebra fish"]), "name").collect()
    }
    assert ("cat", "cub") in got


def test_short_long_cross_pair_found(spark):
    # short name within distance 2 of a long name: the cross joins the
    # short stratum against ALL names, so mixed-length pairs survive.
    got = {
        (r.name_a, r.name_b)
        for r in fuzzy_pairs(_names(spark, ["planet", "planets!"]), "name").collect()
    }
    assert ("planet", "planets!") in got


def test_no_self_or_duplicate_pairs(spark):
    vals = ["old gear", "red gear", "old bolt", "red bolt"]
    rows = fuzzy_pairs(_names(spark, vals), "name").collect()
    pairs = [(r.name_a, r.name_b) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)
    assert all(r.dist <= _MAX_DIST for r in rows)


def test_blocked_equals_allpairs_on_fixture(spark, sf_dir):
    """The recall proof as a test: blocked result == brute-force result
    on the real part-name vocabulary."""
    from automate_data_ingestion_project_spark.io import load_table

    names = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").isNotNull())
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    blocked = {
        (r.name_a, r.name_b, r.dist) for r in fuzzy_pairs(names, "name").collect()
    }
    a, b = names.alias("a"), names.alias("b")
    brute = {
        (r.name_a, r.name_b, r.dist)
        for r in (
            a.join(b, F.col("a.name") < F.col("b.name"))
            .select(
                F.col("a.name").alias("name_a"),
                F.col("b.name").alias("name_b"),
                F.levenshtein("a.name", "b.name").cast("int").alias("dist"),
            )
            .filter(F.col("dist") <= _MAX_DIST)
        ).collect()
    }
    assert blocked == brute
    assert brute, "fixture should contain at least one near pair"
