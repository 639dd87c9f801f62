"""Iterative graph primitive: one PageRank power-iteration over the
verified near-dup pair graph — integer-exact, so it is hash-checkable.

Why this graph: the near-dup PAIR EVIDENCE (``minhash_pairs_evidence``,
the materialized artifact the component/split queries already consume)
is a real graph the curation pipeline owns, and per-node centrality in
a duplicate cluster is a real canonical-selection signal (the most-
connected variant is the best KEEP candidate — complementary to the
argmax-by-quality rule in ``dedup_canonical_keep``).

Why ONE iteration: same contract as ``kmeans_step`` — the update step
IS the distributed operator (join on src + aggregate on dst, both
shuffles keyed by node id); iterating is the checkpointed driver-loop
pattern of ``textops.components``, which this module deliberately does
not duplicate. One exactly-specified step is what an oracle can pin.

Cross-engine determinism: ranks are scaled integers (millionths).
The update ``r'(v) = 0.15·S + Σ_u (0.85·S) div deg(u)`` uses integer
floor division and integer sums only — order-independent partial
aggregation in both engines, no float until never. (A float PageRank
sums doubles per group: partial-agg order flaps low bits at any scale.)

100 TB shape: edges are a table, degree is one aggregate, the step is
one join + one aggregate — all hash-partitioned on node id; skew is
bounded by the max dup-cluster degree, which the upstream document-
frequency cap already bounds. Beyond-reference family (reference is
345 LoC of pandas/duckdb with no graph surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _minhash_oracle_sql, minhash_pairs_evidence
from .registry import register

_SCALE = 1_000_000  # ranks in millionths
_BASE = 150_000  # (1 - d) · SCALE, d = 0.85
_DAMP = 850_000  # d · SCALE


def _pagerank_oracle_sql() -> str:
    return f"""
    WITH pair_ev AS ({_minhash_oracle_sql()}),
    edges AS (
        SELECT doc_id_a AS src, doc_id_b AS dst FROM pair_ev
        UNION ALL
        SELECT doc_id_b AS src, doc_id_a AS dst FROM pair_ev
    ),
    deg AS (
        SELECT src, COUNT(*) AS degree FROM edges GROUP BY 1
    ),
    contrib AS (
        SELECT e.dst,
               CAST(SUM({_DAMP} // d.degree) AS BIGINT) AS inflow
        FROM edges e JOIN deg d USING (src)
        GROUP BY 1
    )
    SELECT d.src AS node, d.degree,
           {_BASE} + COALESCE(c.inflow, 0) AS rank_scaled
    FROM deg d LEFT JOIN contrib c ON d.src = c.dst
    """


@register(
    "pagerank_step",
    oracle=_pagerank_oracle_sql(),
    survey_ref="iterative graph primitive: one integer-exact PageRank power-iteration",
)
def pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, degree, rank_scaled) after one power-iteration from the
    uniform start r₀ = SCALE per node. See module docstring."""
    pairs = minhash_pairs_evidence(spark, sf_dir).select(
        "doc_id_a", "doc_id_b"
    )
    edges = pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst")
        )
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
    contrib = (
        edges.join(deg, "src")
        .groupBy("dst")
        .agg(
            F.sum(F.expr(f"{_DAMP} div degree")).cast("bigint").alias("inflow")
        )
    )
    return (
        deg.join(contrib, deg.src == contrib.dst, "left")
        .select(
            F.col("src").alias("node"),
            "degree",
            (F.lit(_BASE) + F.coalesce("inflow", F.lit(0))).alias(
                "rank_scaled"
            ),
        )
    )


_TRIANGLE_ORACLE = f"""
    WITH pair_ev AS ({{pair_sql}}),
    e AS (
        SELECT doc_id_a AS a, doc_id_b AS b FROM pair_ev GROUP BY 1, 2
    ),
    tri AS (
        SELECT w.a, w.b, w.c
        FROM (SELECT e1.a, e1.b, e2.b AS c
              FROM e e1 JOIN e e2 ON e1.b = e2.a) w
        JOIN e e3 ON e3.a = w.a AND e3.b = w.c
    ),
    nodes AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT node, COUNT(*) AS n_triangles FROM nodes GROUP BY node
"""


@register(
    "neardup_triangles",
    oracle=_TRIANGLE_ORACLE.format(pair_sql=_minhash_oracle_sql()),
    survey_ref="join-based graph analytics: per-node triangle counts (engine ext)",
)
def neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation in the near-dup graph — the
    clustering-coefficient numerator, a density signal that separates
    tight duplicate CLIQUES (template spam: keep one) from sparse
    similarity CHAINS (legitimate gradual revisions: keep several).

    The distributed-triangle discipline: orient every edge (the pair
    artifact already stores a < b, so each undirected edge exists
    once), build wedges a→b→c by joining oriented edges on the middle
    node, then close each wedge with ONE membership probe on (a, c).
    Each triangle is found exactly once. Two equi-join shuffles, both
    on node keys; wedge volume is Σ deg²(middle) — at 100 TB the
    orientation is by (degree, id) rather than raw id so the highest-
    degree node never sits in the middle, the standard bound; the id
    orientation here keeps the oracle's arithmetic identical.
    Integer counts — hash-exact in both engines.
    """
    pairs = (
        minhash_pairs_evidence(spark, sf_dir)
        .select(F.col("doc_id_a").alias("a"), F.col("doc_id_b").alias("b"))
        .distinct()
    )
    wedges = pairs.alias("e1").join(
        pairs.alias("e2"), F.col("e1.b") == F.col("e2.a")
    ).select(
        F.col("e1.a").alias("wa"), F.col("e1.b").alias("wb"), F.col("e2.b").alias("wc")
    )
    tri = wedges.join(
        pairs.alias("e3"),
        (F.col("e3.a") == F.col("wa")) & (F.col("e3.b") == F.col("wc")),
    ).select(
        F.col("wa").alias("a"), F.col("wb").alias("b"), F.col("wc").alias("c")
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))
