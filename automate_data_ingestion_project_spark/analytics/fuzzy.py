"""Approximate string matching: blocked fuzzy joins.

Entity-resolution primitive for training-data curation (alias
detection, catalog reconciliation, near-identical source names). The
all-pairs form is n² and dead at scale; the scalable shape is the
classic q-gram BLOCKING join:

    names → explode character q-grams → self-join on the gram
          → distinct candidate pairs → verify edit distance

Cost is Σ|gram bucket|², never |names|² — the same Σ|bucket|²
discipline as the MinHash/SimHash band joins (``textops/dedup.py``).
Verification (``F.levenshtein``, codegen'd JVM) touches candidates
only.

Recall guarantee (why blocking loses nothing): one edit touches at
most q consecutive q-grams, so two strings within edit distance d
share at least (max_len − q + 1) − d·q positional q-grams. With q=2,
d=2 that bound is positive for names of length ≥ 7; SHORTER names are
handled exactly by a dedicated short-stratum pass (cross of the
sub-7-char name set — bounded by the alphabet, |Σ|^6 at worst, in
practice a few hundred strings even at 100 TB corpus scale, and
broadcast both sides). Union of the two candidate sets provably
contains every true pair — blocking is an execution strategy, not a
semantics change, which is exactly what the DuckDB all-pairs oracle
checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

_Q = 2  # bigram blocking: 2 edits destroy ≤ 4 bigrams
_MAX_DIST = 2
_SHORT = _Q * (_MAX_DIST + 1) + 1  # len < 7 → bigram bound can reach 0


def _bigrams(col: str) -> F.Column:
    """All character bigrams of `col` (interpreted HOF — runs over the
    DISTINCT-names relation, which is vocabulary-sized, not corpus-
    sized; the corpus-scale work stays in the codegen'd joins)."""
    return F.expr(
        f"transform(sequence(1, length({col}) - 1), i -> substring({col}, i, 2))"
    )


def fuzzy_pairs(names: DataFrame, col: str) -> DataFrame:
    """All unordered pairs of distinct `col` values within edit
    distance ``_MAX_DIST``, via bigram blocking + short-stratum union.

    `names` must be a 1-column relation of DISTINCT non-null strings.
    """
    d = names.select(F.col(col).alias("name"))
    # Blocked stratum: names long enough for the q-gram bound.
    grams = d.filter(F.length("name") >= _SHORT).select(
        "name", F.explode(F.array_distinct(_bigrams("name"))).alias("g")
    )
    a = grams.alias("a")
    b = grams.alias("b")
    blocked = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.name") < F.col("b.name")))
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        # Cheap pre-verify prune: |len(a)−len(b)| ≤ d is necessary.
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= F.lit(_MAX_DIST)
        )
        .distinct()
    )
    # Short stratum, exact: tiny by construction (alphabet-bounded), so
    # a broadcast cross against ALL names is both safe and cheap. Pairs
    # are emitted with the short name on either side exactly once via
    # the same name_a < name_b canonical order.
    short = d.filter(F.length("name") < _SHORT)
    cross = (
        F.broadcast(short.select(F.col("name").alias("s")))
        .join(d.select(F.col("name").alias("t")), F.col("s") != F.col("t"))
        .select(
            F.least("s", "t").alias("name_a"), F.greatest("s", "t").alias("name_b")
        )
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= F.lit(_MAX_DIST))
        .distinct()
    )
    candidates = blocked.unionByName(cross).distinct()
    return (
        candidates.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= F.lit(_MAX_DIST))
        .select("name_a", "name_b", F.col("dist").cast("int").alias("dist"))
    )


@register(
    "fuzzy_name_pairs",
    oracle=f"""
    WITH d AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
    FROM d a JOIN d b ON a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {_MAX_DIST}
    """,
    survey_ref="blocked fuzzy join: q-gram candidates + edit-distance verify (engine ext)",
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-name pairs within edit distance 2, found by bigram blocking
    — the oracle computes the same relation all-pairs, proving the
    blocking loses no true pair (the recall guarantee in the module
    docstring, checked rather than assumed).

    Scale shape: the gram self-join shuffles on the bigram key; bucket
    sizes are Σ over a ~|Σ|² keyspace of vocabulary frequencies — the
    skew ceiling is the most common bigram, and the length-difference
    prune runs INSIDE the join before the distinct. Verification is
    codegen'd ``levenshtein`` on candidates only. The n² form the
    oracle runs would be ~10¹² comparisons at a 10⁶-name vocabulary;
    the blocked form is linear in Σ|bucket|².
    """
    part = load_table(spark, sf_dir, "part")
    names = part.filter(F.col("p_name").isNotNull()).select("p_name").distinct()
    return fuzzy_pairs(names, "p_name")
