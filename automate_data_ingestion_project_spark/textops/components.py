"""Connected components over near-duplicate pairs — the clustering step
that turns pairwise dedup evidence into dedup ACTION (pick one canonical
doc per component, drop the rest).

Iterative min-label propagation (the simple alternating form of
large-star/small-star, cf. the map-reduce CC literature): every node
starts labeled with itself; each round it takes the min of its own and
its neighbors' labels; fixpoint in O(component diameter) rounds. This
is THE canonical Spark iterative-algorithm shape:

- per-round work is two equi-joins + an aggregation (all shuffles on
  node id — no broadcast of global state);
- each round's result is eagerly ``localCheckpoint``-ed: the blocks are
  materialized AND the logical plan is truncated, so both lineage and
  planning cost stay O(1) per round (a bare persist caches execution
  but the plan trees still compound and can exhaust the driver heap
  when the edge input carries a deep upstream pipeline);
- the driver only reads a per-round ``changed`` COUNT (the loop
  control — bounded scalar, not data).

Near-dup components are overwhelmingly tiny (pairs/triples), so rounds
≈ 2 in practice; the bound caps pathological chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def connected_components(
    edges: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """(node, component_id) for every node appearing in ``edges``;
    component_id = min node id in the component (deterministic).

    Lineage discipline: ``edges`` may carry an arbitrarily deep upstream
    plan (e.g. the full MinHash pipeline), and every round's plan would
    otherwise embed it twice (both join branches) compounded per round —
    a persist caches EXECUTION but not the logical plan, and the
    planning trees alone blew the driver heap when composed downstream
    (leakage_safe_split in a long bench session). ``localCheckpoint``
    truncates the plan to the materialized blocks, so round plans stay
    O(1) regardless of how the edge relation was produced — the standard
    iterative-algorithm pattern on Spark.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_rounds):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        # eager localCheckpoint materializes the round AND truncates its
        # plan, so the next round starts from an O(1) logical tree; the
        # previous round's blocks become unreferenced and the
        # ContextCleaner reclaims them
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                F.col("label").alias("_old"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels  # `_old` rides along; never re-selected
        if changed == 0:
            break
    if changed > 0:
        # Do not silently return a partial fixpoint: a component with
        # diameter > max_rounds would get wrong (split) labels.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"({changed} labels still changing); raise max_rounds"
        )
    result = labels.select(F.col("node"), F.col("label").alias("component_id"))
    return result
