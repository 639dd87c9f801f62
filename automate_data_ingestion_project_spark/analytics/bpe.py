"""Registered BPE tokenizer-training queries over ``documents``.

Three driver-checked surfaces for :mod:`..textops.bpe` (the
distributed Sennrich-style trainer — see that module's docstring for
the scale narrative: train on the word-frequency table, merge with a
narrow fold):

* ``bpe_pair_counts`` — the training signal itself: the top weighted
  adjacent-symbol-pair counts at merge step 0.
* ``bpe_merge_step`` — one full training iteration: pick the winning
  pair, greedily merge it into every word, recount. The DuckDB oracle
  reimplements the greedy left-to-right merge with an INDEPENDENT
  formulation (candidate runs + odd-parity window ranks) so the two
  engines agreeing pins the fold's semantics, not just its totals.
* ``bpe_two_merge_steps`` — two chained iterations: round 2 operates
  on multi-char symbols at symbol (not char) positions, the part of
  the trainer the single-step query cannot reach.

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
    # the winning pair rides through the recount as constant group
    # keys — re-deriving it with a second broadcast join would re-run
    # the pick aggregation as that join's build side
    return (
        pair_counts(merged, carry=("_ma", "_mb"))
        .select(
            F.concat_ws(" ", "_ma", "_mb").alias("merge_pair"),
            "pair",
            "n",
        )
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(TOP_AFTER_MERGE)
    )


@register(
    "bpe_two_merge_steps",
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
    t1 AS (
        SELECT a, b FROM p1 ORDER BY n DESC, a || ' ' || b LIMIT 1
    ),
    pos AS (
        SELECT word, wn, i, substring(word, i, 1) AS s
        FROM wc, UNNEST(range(1, length(word) + 1)) AS t(i)
    ),
    cand1 AS (
        SELECT p.word, p.i
        FROM pos p, t1
        WHERE p.s = t1.a AND substring(p.word, p.i + 1, 1) = t1.b
              AND p.i < length(p.word)
    ),
    runs1 AS (
        SELECT word, i,
               i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS grp
        FROM cand1
    ),
    starts1 AS (
        SELECT word, i
        FROM (SELECT word, i,
                     ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY i)
                         AS rn
              FROM runs1)
        WHERE rn % 2 = 1
    ),
    kept1 AS (
        SELECT p.word, p.wn, p.i,
               CASE WHEN st.i IS NOT NULL THEN t1.a || t1.b
                    ELSE p.s END AS sym
        FROM pos p
        CROSS JOIN t1
        LEFT JOIN starts1 st ON st.word = p.word AND st.i = p.i
        LEFT JOIN starts1 pr ON pr.word = p.word AND pr.i = p.i - 1
        WHERE pr.i IS NULL
    ),
    -- round 2 runs over SYMBOL indices, not char positions: after a
    -- merge the sequence has multi-char symbols, so re-rank positions
    seq1 AS (
        SELECT word, wn, sym,
               ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS j
        FROM kept1
    ),
    adj1 AS (
        SELECT word, wn, j, sym,
               LEAD(sym) OVER (PARTITION BY word ORDER BY j) AS nxt
        FROM seq1
    ),
    p2 AS (
        SELECT sym AS a, nxt AS b, SUM(wn) AS n
        FROM adj1 WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    t2 AS (
        SELECT a, b FROM p2 ORDER BY n DESC, a || ' ' || b LIMIT 1
    ),
    cand2 AS (
        SELECT s.word, s.j FROM adj1 s, t2
        WHERE s.sym = t2.a AND s.nxt = t2.b
    ),
    runs2 AS (
        SELECT word, j,
               j - ROW_NUMBER() OVER (PARTITION BY word ORDER BY j) AS grp
        FROM cand2
    ),
    starts2 AS (
        SELECT word, j
        FROM (SELECT word, j,
                     ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY j)
                         AS rn
              FROM runs2)
        WHERE rn % 2 = 1
    ),
    kept2 AS (
        SELECT s.word, s.wn, s.j,
               CASE WHEN st.j IS NOT NULL THEN t2.a || t2.b
                    ELSE s.sym END AS sym
        FROM seq1 s
        CROSS JOIN t2
        LEFT JOIN starts2 st ON st.word = s.word AND st.j = s.j
        LEFT JOIN starts2 pr ON pr.word = s.word AND pr.j = s.j - 1
        WHERE pr.j IS NULL
    ),
    adj2 AS (
        SELECT word, wn, sym,
               LEAD(sym) OVER (PARTITION BY word ORDER BY j) AS nxt
        FROM kept2
    ),
    p3 AS (
        SELECT sym || ' ' || nxt AS pair, SUM(wn) AS n
        FROM adj2 WHERE nxt IS NOT NULL GROUP BY 1
    )
    SELECT t1.a || ' ' || t1.b AS merge1,
           t2.a || ' ' || t2.b AS merge2,
           p3.pair, CAST(p3.n AS BIGINT) AS n
    FROM p3, t1, t2 ORDER BY n DESC, pair LIMIT {TOP_AFTER_MERGE}
    """,
    survey_ref="text analysis: chained BPE iterations, multi-char symbols (north star)",
)
def bpe_two_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained BPE training iterations as one plan — the round
    that exercises MULTI-CHAR symbols end to end.

    After merge 1 the vocabulary's sequences contain two-char symbols,
    so merge 2's winning pair can have a multi-char side and round-2
    candidate positions are symbol indices, not char offsets. The
    Spark side simply chains two folds (each pick broadcast as a 1-row
    relation, each intermediate symbol table persisted since both its
    pick and its merge consume it); the oracle re-derives round 2 with
    the run-parity formulation over re-ranked symbol positions. Driver
    agreement here is what pins the multi-char path — the single-step
    query can't reach it.
    """
    docs = spread_for_compute(load_table(spark, sf_dir, "documents"))
    sym = tracked_persist(symbolize(word_frequency(docs)))
    t1 = top_pair(sym).select(
        F.col("a").alias("_m1a"), F.col("b").alias("_m1b")
    )
    sym1 = tracked_persist(
        apply_merge(
            sym.join(F.broadcast(t1)), F.col("_m1a"), F.col("_m1b")
        )
    )
    t2 = top_pair(sym1).select(
        F.col("a").alias("_m2a"), F.col("b").alias("_m2b")
    )
    sym2 = apply_merge(
        sym1.join(F.broadcast(t2)), F.col("_m2a"), F.col("_m2b")
    )
    # both winning pairs ride through the final recount as constant
    # group keys (sym1 kept round 1's, the t2 join added round 2's) —
    # two post-hoc broadcast joins here would re-run both pick
    # aggregations as build sides (measured: 7.6 s vs 2.1 s at sf0.1)
    return (
        pair_counts(sym2, carry=("_m1a", "_m1b", "_m2a", "_m2b"))
        .select(
            F.concat_ws(" ", "_m1a", "_m1b").alias("merge1"),
            F.concat_ws(" ", "_m2a", "_m2b").alias("merge2"),
            "pair",
            "n",
        )
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(TOP_AFTER_MERGE)
    )
