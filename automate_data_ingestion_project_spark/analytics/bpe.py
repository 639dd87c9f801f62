"""Registered BPE tokenizer-training queries over ``documents``.

Two driver-checked surfaces for :mod:`..textops.bpe` (the distributed
Sennrich-style trainer — see that module's docstring for the scale
narrative: train on the word-frequency table, merge with a narrow
fold):

* ``bpe_pair_counts`` — the training signal itself: the top weighted
  adjacent-symbol-pair counts at merge step 0.
* ``bpe_merge_step`` — one full training iteration: pick the winning
  pair, greedily merge it into every word, recount. The DuckDB oracle
  reimplements the greedy left-to-right merge with an INDEPENDENT
  formulation (candidate runs + odd-parity window ranks) so the two
  engines agreeing pins the fold's semantics, not just its totals.

Beyond-reference family (north star: LLM-pipeline text analysis);
the reference has no tokenizer surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.caching import tracked_persist
from ..textops.bpe import apply_merge, pair_counts, symbolize, top_pair, word_frequency
from ..textops.dedup import spread_for_compute
from .registry import register

TOP_PAIRS = 20
TOP_AFTER_MERGE = 10


@register(
    "bpe_pair_counts",
    oracle=f"""
    WITH w AS (
        SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
        SELECT word, COUNT(*) AS wn FROM w WHERE word <> '' GROUP BY 1
    ),
    p AS (
        SELECT substring(word, i, 1) || ' ' || substring(word, i + 1, 1)
                   AS pair,
               SUM(wn) AS n
        FROM wc, UNNEST(range(1, length(word))) AS t(i)
        GROUP BY 1
    )
    SELECT pair, CAST(n AS BIGINT) AS n
    FROM p ORDER BY n DESC, pair LIMIT {TOP_PAIRS}
    """,
    survey_ref="text analysis: BPE tokenizer training signal (north star)",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-step-0 training signal: top weighted adjacent-pair counts.

    Scale shape: ONE corpus-scale aggregation (the word-frequency
    table, map-side combined), then pairs come from ``zip_with`` over
    each word's char array — no posexplode+self-join — and the final
    ``groupBy(a, b)`` key space is |char-vocab|² bounded. Ranking ties
    break on the space-joined pair string, the convention the trainer,
    the oracle, and ``bpe_merge_step`` all share.
    """
    docs = spread_for_compute(load_table(spark, sf_dir, "documents"))
    sym = symbolize(word_frequency(docs))
    return (
        pair_counts(sym)
        .select("pair", "n")
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(TOP_PAIRS)
    )


@register(
    "bpe_merge_step",
    oracle=f"""
    WITH w AS (
        SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
        SELECT word, COUNT(*) AS wn FROM w WHERE word <> '' GROUP BY 1
    ),
    p1 AS (
        SELECT substring(word, i, 1) AS a,
               substring(word, i + 1, 1) AS b,
               SUM(wn) AS n
        FROM wc, UNNEST(range(1, length(word))) AS t(i)
        GROUP BY 1, 2
    ),
    top1 AS (
        SELECT a, b FROM p1 ORDER BY n DESC, a || ' ' || b LIMIT 1
    ),
    pos AS (
        SELECT word, wn, i, substring(word, i, 1) AS s
        FROM wc, UNNEST(range(1, length(word) + 1)) AS t(i)
    ),
    -- greedy left-to-right semantics via run parity: consecutive
    -- candidate positions (only possible when a = b) form runs; the
    -- 1st, 3rd, 5th... of each run merge, the rest are consumed
    cand AS (
        SELECT p.word, p.i
        FROM pos p, top1
        WHERE p.s = top1.a AND substring(p.word, p.i + 1, 1) = top1.b
              AND p.i < length(p.word)
    ),
    runs AS (
        SELECT word, i,
               i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS grp
        FROM cand
    ),
    starts AS (
        SELECT word, i
        FROM (SELECT word, i,
                     ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY i)
                         AS rn
              FROM runs)
        WHERE rn % 2 = 1
    ),
    kept AS (
        SELECT p.word, p.wn, p.i,
               CASE WHEN st.i IS NOT NULL THEN top1.a || top1.b
                    ELSE p.s END AS sym
        FROM pos p
        CROSS JOIN top1
        LEFT JOIN starts st ON st.word = p.word AND st.i = p.i
        LEFT JOIN starts pr ON pr.word = p.word AND pr.i = p.i - 1
        WHERE pr.i IS NULL
    ),
    seq AS (
        SELECT word, wn, sym,
               LEAD(sym) OVER (PARTITION BY word ORDER BY i) AS nxt
        FROM kept
    ),
    p2 AS (
        SELECT sym || ' ' || nxt AS pair, SUM(wn) AS n
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1
    )
    SELECT t.a || ' ' || t.b AS merge_pair, p2.pair, CAST(p2.n AS BIGINT) AS n
    FROM p2, top1 t ORDER BY n DESC, pair LIMIT {TOP_AFTER_MERGE}
    """,
    survey_ref="text analysis: BPE training iteration (north star)",
)
def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full BPE training iteration as a single plan.

    The winning pair is a 1-row relation cross-joined (broadcast) into
    the vocabulary — no eager ``collect`` — so pick + merge + recount
    stay one Catalyst plan. The merge itself is the shuffle-free
    higher-order fold from :func:`..textops.bpe.apply_merge`; the
    recount re-runs the vocabulary-scale pair aggregation. The symbol
    table is persisted because both the pick and the merge consume it.
    """
    docs = spread_for_compute(load_table(spark, sf_dir, "documents"))
    sym = tracked_persist(symbolize(word_frequency(docs)))
    t1 = top_pair(sym).select(
        F.col("a").alias("_ma"), F.col("b").alias("_mb")
    )
    merged = apply_merge(
        sym.join(F.broadcast(t1)), F.col("_ma"), F.col("_mb")
    )
    return (
        pair_counts(merged)
        .join(F.broadcast(t1))
        .select(
            F.concat_ws(" ", "_ma", "_mb").alias("merge_pair"),
            "pair",
            "n",
        )
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(TOP_AFTER_MERGE)
    )
