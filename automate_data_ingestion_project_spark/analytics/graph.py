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
