"""Distributed BPE (byte-pair-encoding) tokenizer training.

The classic Sennrich-style trainer: count adjacent symbol pairs over
the corpus, merge the most frequent pair everywhere, repeat. The
reference repo has no tokenizer trainer; this is part of the
LLM-pipeline extension family (BASELINE.json north star) alongside
``vocab_encode`` / ``bigram_counts`` in :mod:`..analytics.terms`.

Scale design — the two facts that make BPE trainable on a 100 TB
corpus:

1. **Train on the word-frequency table, not the corpus.** Pair counts
   are identical whether computed over every token occurrence or over
   ``(distinct word, count)`` rows with the count as a weight. The
   corpus has ~10^13 token occurrences; its distinct-word table has
   ~10^8 rows. One corpus-scale ``groupBy(word)`` up front (map-side
   partial aggregation does most of the work), then every training
   iteration touches only the vocabulary table.
2. **Merge application is a narrow per-row fold — zero shuffle.** The
   greedy left-to-right merge of one pair into a word's symbol
   sequence is a left fold over the symbol array, expressed with the
   native higher-order ``aggregate`` function (JVM-side, no Python).
   Each training iteration is therefore: one vocabulary-scale
   aggregation (the pair counts) + one narrow map (the merge) — the
   same shape as one k-means step.

Greedy semantics (pinned by tests against a pure-Python reference):
occurrences merge left-to-right without re-merging — for pair
``(a, a)`` the word ``aaaa`` becomes ``[aa, aa]``, ``aaa`` becomes
``[aa, a]``. The fold tracks a "last element was just merged" flag to
enforce this; the DuckDB oracle in :mod:`..analytics.bpe` pins the
same semantics with an independent run-parity window formulation.

Iteration state: each :func:`apply_merge` deepens the lineage by one
fold, so :func:`train_bpe` persists the symbolized vocabulary per
iteration and unpersists the previous one. On a real cluster a
long training run (10k+ merges) should additionally checkpoint every
few hundred iterations to truncate the logical plan; at the test
scale persist alone is enough.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_frequency",
    "symbolize",
    "pair_counts",
    "top_pair",
    "apply_merge",
    "train_bpe",
    "encode_with_merges",
]


def word_frequency(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → ``(word, wn)`` frequency table.

    The single corpus-scale pass: whitespace-tokenize and count. At
    100 TB this is the expensive step (one shuffle with map-side
    combine); everything after operates on the vocabulary table.
    """
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wn"))
    )


def symbolize(wc: DataFrame) -> DataFrame:
    """Add the initial symbol sequence: one single-character symbol
    per character (``split`` on the empty pattern yields the char
    array with no empty entries)."""
    return wc.withColumn("syms", F.split("word", ""))


def pair_counts(sym_df: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Weighted adjacent-pair counts over ``(word, wn, syms)``.

    ``zip_with(syms[:-1], syms[1:])`` forms the adjacent pairs without
    a posexplode+self-join; the only shuffle is the final
    ``groupBy(a, b)`` whose key space is |symbol-vocab|² bounded —
    in practice a few million rows regardless of corpus size.

    ``carry`` names constant annotation columns (e.g. the cross-joined
    winning pair of the merge that produced ``sym_df``) to thread
    through the aggregation as extra group keys. Constant keys cost
    nothing, and carrying them beats re-deriving the annotation with a
    post-hoc broadcast join whose build side re-runs the whole
    upstream aggregation (measured 7.6 s → 2.1 s on the chained
    two-merge query at sf0.1).
    """
    n = F.size("syms")
    pairs = sym_df.select(
        *carry,
        "wn",
        F.explode(
            F.zip_with(
                F.slice("syms", 1, n - 1),
                F.slice("syms", 2, n - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            *carry, F.col("p.a").alias("a"), F.col("p.b").alias("b")
        )
        .agg(F.sum("wn").alias("n"))
        .withColumn("pair", F.concat_ws(" ", "a", "b"))
    )


def top_pair(sym_df: DataFrame) -> DataFrame:
    """1-row DataFrame with the winning merge: highest weighted count,
    ties broken by the space-joined pair string ascending (the
    deterministic convention every consumer and oracle shares)."""
    return pair_counts(sym_df).orderBy(F.desc("n"), F.asc("pair")).limit(1)


def apply_merge(sym_df: DataFrame, a: Column, b: Column) -> DataFrame:
    """Greedy left-to-right merge of the pair ``(a, b)`` into every
    symbol sequence — a narrow per-row fold, no shuffle.

    The accumulator is ``struct<out: array<string>, m: boolean>``
    where ``m`` records whether the last output element was just
    formed by a merge (so ``aaa`` with pair ``(a, a)`` yields
    ``[aa, a]``, not ``[aa, a]`` twice merged). ``a`` / ``b`` are
    Columns so the caller can bind them either to literals (the
    driver-loop trainer) or to a cross-joined 1-row top-pair relation
    (the single-plan registered query).
    """
    merged = F.concat(a, b)

    def step(acc: Column, s: Column) -> Column:
        can_merge = (
            (F.size(acc["out"]) > 0)
            & ~acc["m"]
            & (F.element_at(acc["out"], -1) == a)
            & (s == b)
        )
        out_merged = F.concat(
            F.slice(acc["out"], 1, F.size(acc["out"]) - 1), F.array(merged)
        )
        out_append = F.concat(acc["out"], F.array(s))
        return F.when(
            can_merge,
            F.struct(out_merged.alias("out"), F.lit(True).alias("m")),
        ).otherwise(
            F.struct(out_append.alias("out"), F.lit(False).alias("m"))
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(False).alias("m"),
    )
    return sym_df.withColumn(
        "syms", F.aggregate("syms", init, step, lambda acc: acc["out"])
    )


def train_bpe(docs: DataFrame, n_merges: int, text_col: str = "text"):
    """Driver-loop trainer: returns the ordered merge list
    ``[(a, b, n), ...]``.

    Same iteration pattern as ``kmeans_step``: per round, one
    vocabulary-scale aggregation collapsed to a single collected row
    (the winning pair — the only driver-side data movement), then a
    narrow fold re-derives the symbol table. The symbol table is
    persisted per round and the previous round's cache released.
    """
    sym = symbolize(word_frequency(docs, text_col=text_col)).persist()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            row = top_pair(sym).collect()
            if not row or row[0]["n"] <= 0:
                break
            a, b, n = row[0]["a"], row[0]["b"], row[0]["n"]
            merges.append((a, b, int(n)))
            nxt = apply_merge(sym, F.lit(a), F.lit(b)).persist()
            nxt.count()  # materialize before dropping the parent cache
            sym.unpersist()
            sym = nxt
    finally:
        sym.unpersist()
    return merges


def encode_with_merges(
    docs: DataFrame, merges, text_col: str = "text"
) -> DataFrame:
    """Encode documents with a TRAINED merge list — the inference half
    of the tokenizer. Returns ``(doc_id, n_tokens, tokens)``.

    A 30k-entry merge table can't be applied as 30k chained folds (the
    expression tree alone would be unmanageable), so encoding drops to
    the Arrow path: ``mapInPandas`` with the merge ranks shipped in
    the closure (a merge table is a few hundred KB — broadcast-sized
    by construction). Per batch, each distinct word is encoded once
    and memoized — word frequency is Zipfian, so the cache hit rate
    approaches 1 and per-row work degenerates to a dict lookup. The
    operator is a narrow map: no shuffle, corpus-partition parallel.

    Encoding semantics: repeatedly merge the lowest-rank pair present
    in the word (all occurrences, greedy left-to-right) until none
    applies. This equals replaying the training merges in order: a
    merge can only create pairs of HIGHER rank than itself (a pair
    containing a merged symbol was necessarily formed later in
    training), so picking the minimum present rank never skips a
    merge that training would have applied earlier.
    """
    ranks = {(a, b): i for i, (a, b, *_rest) in enumerate(merges)}

    def _merge_all(syms: list, a: str, b: str) -> list:
        out: list = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    def _encode_word(word: str) -> list:
        syms = list(word)
        while len(syms) > 1:
            best = None
            for x, y in zip(syms, syms[1:]):
                r = ranks.get((x, y))
                if r is not None and (best is None or r < best):
                    best = r
                    pair = (x, y)
            if best is None:
                break
            syms = _merge_all(syms, *pair)
        return syms

    def _encode(batches):
        cache: dict = {}
        for pdf in batches:
            out_tokens = []
            for text in pdf[text_col]:
                toks: list = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w)
                        cache[w] = enc
                    toks.extend(enc)
                out_tokens.append(toks)
            yield pdf[["doc_id"]].assign(
                n_tokens=[len(t) for t in out_tokens],
                tokens=out_tokens,
            )

    return docs.mapInPandas(
        _encode, "doc_id long, n_tokens long, tokens array<string>"
    )
