"""Recursive-CTE traversal: contamination blast radius on the near-dup
graph.

Spark 4 executes ``WITH RECURSIVE`` natively (iterative union-loop
inside the engine); this module exercises it on owned semantics: given
a SEED set of known-bad documents (licensing strike, benchmark leak,
poisoned source), every document within k hops in the VERIFIED near-dup
pair graph is suspect — transitive contamination, the curation "blast
radius" question. BFS-with-hop-count is the natural recursive-CTE
shape: a frontier join per step, a final MIN(dist) rollup outside the
recursion (aggregation is not allowed in the recursive term in either
engine, and the rollup dedups the multi-path visits).

Scale notes: each recursion step is one equi-join frontier⋈edges —
hash-partitioned on the node key, exactly the iterative join
``textops.components`` runs by hand with checkpoints. Depth is CAPPED
(k=3): transitive closure without a bound is the classic recursive-CTE
scale trap (frontier can grow multiplicatively through dense
clusters); with the cap, work is Σ_seeds |k-hop neighborhood|, and the
dup-cluster degree bound from the upstream document-frequency cap
keeps neighborhoods small. For UNBOUNDED components use the
checkpointed min-label propagation (``dedup_components``) — that is
the production component-finder; this is the bounded-radius probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _minhash_oracle_sql, minhash_pairs_evidence
from .registry import register

_MAX_HOPS = 3
_SEED_MOD = 10  # seeds: endpoints with doc_id % 10 == 0


def _bfs_sql(edges_rel: str) -> str:
    """The engine-shared recursive BFS body over `edges_rel`(src,dst)."""
    return f"""
    seeds AS (
        SELECT DISTINCT src AS doc FROM {edges_rel} WHERE src % {_SEED_MOD} = 0
    ),
    bfs (doc, dist) AS (
        SELECT doc, 0 FROM seeds
        UNION ALL
        SELECT e.dst, b.dist + 1
        FROM bfs b JOIN {edges_rel} e ON e.src = b.doc
        WHERE b.dist < {_MAX_HOPS}
    )
    SELECT CAST(doc AS BIGINT) AS doc_id,
           CAST(MIN(dist) AS INTEGER) AS hops,
           COUNT(*) AS n_paths
    FROM bfs
    GROUP BY doc
    """


@register(
    "neardup_blast_radius",
    oracle=f"""
    WITH RECURSIVE pair_ev AS ({_minhash_oracle_sql()}),
    edges AS (
        SELECT doc_id_a AS src, doc_id_b AS dst FROM pair_ev
        UNION ALL
        SELECT doc_id_b AS src, doc_id_a AS dst FROM pair_ev
    ),
    {_bfs_sql("edges")}
    """,
    survey_ref="recursive CTE: bounded BFS reachability over near-dup pairs (engine ext)",
)
def neardup_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hops, n_paths) for every document within 3 hops of a
    seed (doc_id % 10 == 0) in the near-dup graph. ``hops`` is the BFS
    distance; ``n_paths`` counts bounded walks reaching the node — both
    engines run the same bag-semantics recursion, so even the walk
    count hash-matches. Edges come from the materialized pair-evidence
    artifact (build-once; the expensive shingle→signature→band stage is
    NOT re-run here)."""
    pairs = minhash_pairs_evidence(spark, sf_dir).select("doc_id_a", "doc_id_b")
    edges = pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst"))
    )
    view = "neardup_edges_for_bfs"
    edges.createOrReplaceTempView(view)
    return spark.sql(f"WITH RECURSIVE {_bfs_sql(view)}")
