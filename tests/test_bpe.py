"""BPE trainer semantics, pinned against a pure-Python reference.

Three independent implementations of the greedy merge exist: the
Spark higher-order fold (``textops.bpe.apply_merge``), the DuckDB
run-parity oracle (``analytics.bpe``), and the token-scan reference
here. The driver compares the first two; these tests compare the
fold and the full training loop against the third.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.textops.bpe import (
    apply_merge,
    pair_counts,
    symbolize,
    train_bpe,
    word_frequency,
)

# ---------------------------------------------------------------- reference


def _ref_word_counts(texts: list[str]) -> dict[str, int]:
    c: Counter[str] = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return dict(c)


def _ref_merge_word(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pc: Counter[tuple[str, str]] = Counter()
    for syms, wn in vocab.items():
        for x, y in zip(syms, syms[1:]):
            pc[(x, y)] += wn
    return pc


def _ref_train(texts: list[str], n_merges: int):
    vocab = {tuple(w): n for w, n in _ref_word_counts(texts).items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc = _ref_pair_counts(vocab)
        if not pc:
            break
        # the shared convention: count DESC, space-joined pair ASC
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        merges.append((a, b, n))
        vocab = {
            _ref_merge_word(s, a, b): wn for s, wn in vocab.items()
        }
    return merges


# ------------------------------------------------------------------- tests

EDGE_TEXTS = [
    "aaaa aaa aa a",  # same-char runs: greedy must not re-merge
    "banana bandana band",
    "x xyxyx yy",
    "aaaa aaaa banana",
]


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_pair_counts_match_reference(spark):
    texts = EDGE_TEXTS
    got = {
        (r["a"], r["b"]): r["n"]
        for r in pair_counts(symbolize(word_frequency(_docs(spark, texts))))
        .collect()
    }
    vocab = {tuple(w): n for w, n in _ref_word_counts(texts).items()}
    assert got == dict(_ref_pair_counts(vocab))


def test_apply_merge_is_greedy_left_to_right(spark):
    # pair (a, a): aaaa -> [aa, aa], aaa -> [aa, a] — the run-parity cases
    sym = symbolize(word_frequency(_docs(spark, EDGE_TEXTS)))
    merged = {
        r["word"]: tuple(r["syms"])
        for r in apply_merge(sym, F.lit("a"), F.lit("a")).collect()
    }
    vocab = _ref_word_counts(EDGE_TEXTS)
    for w in vocab:
        assert merged[w] == _ref_merge_word(tuple(w), "a", "a"), w


def test_apply_merge_multichar_symbols(spark):
    # after ("a","n")->"an", merging ("b","an") exercises multi-char
    # symbols on both sides of the pair
    sym = symbolize(word_frequency(_docs(spark, ["banana bandana nan"])))
    step1 = apply_merge(sym, F.lit("a"), F.lit("n"))
    step2 = {
        r["word"]: tuple(r["syms"])
        for r in apply_merge(step1, F.lit("b"), F.lit("an")).collect()
    }
    for w in ["banana", "bandana", "nan"]:
        expect = _ref_merge_word(
            _ref_merge_word(tuple(w), "a", "n"), "b", "an"
        )
        assert step2[w] == expect, w


def test_train_bpe_matches_reference_on_edge_corpus(spark):
    texts = EDGE_TEXTS
    assert train_bpe(_docs(spark, texts), 6) == _ref_train(texts, 6)


def test_train_bpe_matches_reference_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    assert train_bpe(docs, 8) == _ref_train(texts, 8)


def test_train_bpe_stops_when_no_pairs_remain(spark):
    # single-char words only: zero adjacent pairs, trainer returns []
    assert train_bpe(_docs(spark, ["a b c a"]), 4) == []


def test_encode_with_merges_equals_training_replay(spark):
    from automate_data_ingestion_project_spark.textops.bpe import (
        encode_with_merges,
    )

    texts = EDGE_TEXTS + ["banana band x"]
    merges = _ref_train(texts, 6)

    def replay_word(w):
        syms = tuple(w)
        for a, b, _n in merges:
            syms = _ref_merge_word(syms, a, b)
        return list(syms)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["tokens"])
        for r in encode_with_merges(docs, merges).collect()
    }
    for i, t in enumerate(texts):
        expect = [s for w in t.split(" ") if w for s in replay_word(w)]
        assert got[i] == (len(expect), expect), (i, t)


def test_encode_with_empty_merge_list_is_char_split(spark):
    from automate_data_ingestion_project_spark.textops.bpe import (
        encode_with_merges,
    )

    docs = spark.createDataFrame([(0, "ab c")], "doc_id long, text string")
    row = encode_with_merges(docs, []).collect()[0]
    assert row["tokens"] == ["a", "b", "c"] and row["n_tokens"] == 3
