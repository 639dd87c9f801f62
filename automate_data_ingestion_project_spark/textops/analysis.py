"""Text analysis for corpus curation: token stats, quality scoring,
language ID, document fingerprints.

Everything is a NARROW MAP over the documents table — native Spark
string/array expressions inside whole-stage codegen, zero Python, zero
shuffles (until a caller aggregates). At 100 TB these run at scan
speed; that is the entire design.

Each helper emits the same SQL fragment in two dialects (``spark`` /
``duckdb``) so the CORRECTNESS oracles execute the identical
computation — ratios and scores are bit-reproducible because both
engines evaluate the same operand tree in double.
"""

from __future__ import annotations

# marker stopwords per language for the n-gram/stopword-hit heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "los", "las", "y", "es", "un", "una"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
}

# BPE-ish tokenizer: letter runs, digit runs, or single non-space symbol
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: str, dialect: str = "spark") -> str:
    fn = "split" if dialect == "spark" else "string_split"
    return f"{fn}({text}, ' ')"


def _size(expr: str, dialect: str) -> str:
    return f"size({expr})" if dialect == "spark" else f"len({expr})"


def n_tokens(text: str, dialect: str = "spark") -> str:
    return f"cast({_size(tokens(text, dialect), dialect)} as bigint)"


def n_unique_tokens(text: str, dialect: str = "spark") -> str:
    distinct = "array_distinct" if dialect == "spark" else "list_distinct"
    return f"cast({_size(f'{distinct}({tokens(text, dialect)})', dialect)} as bigint)"


def regex_token_count(text: str, dialect: str = "spark") -> str:
    if dialect == "spark":
        return f"cast(size(regexp_extract_all({text}, '{TOKEN_REGEX}', 0)) as bigint)"
    return f"cast(len(regexp_extract_all({text}, '{TOKEN_REGEX}')) as bigint)"


def sum_token_lengths(text: str, dialect: str = "spark") -> str:
    """Closed form: single-space tokenization means the token lengths
    sum to ``length(text) − (n_tokens − 1)`` exactly (one separator per
    boundary; empty tokens from doubled spaces contribute 0 either
    way). The closed form replaces an ``aggregate`` lambda — Spark
    evaluates HOF lambdas interpreted, outside whole-stage codegen —
    with two codegen'd scalar ops; both dialects compute the identical
    integer."""
    w = tokens(text, dialect)
    return (
        f"cast(length({text}) - ({_size(w, dialect)} - 1) as bigint)"
    )


def avg_token_len(text: str, dialect: str = "spark") -> str:
    return (
        f"cast({sum_token_lengths(text, dialect)} as double) / "
        f"cast({n_tokens(text, dialect)} as double)"
    )


def marker_hits(text: str, lang: str, dialect: str = "spark") -> str:
    """MULTISET count of marker-stopword occurrences.

    Spark side avoids the interpreted ``filter`` lambda: removing every
    occurrence of each marker with a (codegen'd) ``array_remove`` chain
    and differencing sizes counts exactly the same multiset hits the
    DuckDB ``list_filter`` counts — integer-equal by construction, so
    the ratio/argmax trees built on top stay bit-identical across
    engines."""
    w = tokens(text, dialect)
    if dialect == "spark":
        removed = w
        for m in LANG_MARKERS[lang]:
            removed = f"array_remove({removed}, '{m}')"
        return f"cast(size({w}) - size({removed}) as bigint)"
    lst = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"cast(len(list_filter({w}, t -> t in ({lst}))) as bigint)"


def stopword_ratio(text: str, dialect: str = "spark") -> str:
    return (
        f"cast({marker_hits(text, 'en', dialect)} as double) / "
        f"cast({n_tokens(text, dialect)} as double)"
    )


def quality_score(text: str, dialect: str = "spark") -> str:
    """Composite [0,1] quality heuristic: length saturation × natural-
    language-ness (stopword presence). Same operand tree both dialects."""
    sat = f"least(cast({n_tokens(text, dialect)} as double) / 100.0, 1.0)"
    return f"{sat} * (0.5 + 0.5 * least({stopword_ratio(text, dialect)} * 10.0, 1.0))"


def predicted_lang(text: str, dialect: str = "spark") -> str:
    """Argmax of marker hits with alphabetical tie-break (deterministic)."""
    hits = {lang: marker_hits(text, lang, dialect) for lang in sorted(LANG_MARKERS)}
    m = "greatest(" + ", ".join(hits.values()) + ")"
    cases = " ".join(
        f"WHEN {h} = {m} THEN '{lang}'" for lang, h in list(hits.items())[:-1]
    )
    last = sorted(LANG_MARKERS)[-1]
    return f"(CASE {cases} ELSE '{last}' END)"


def fingerprint_sha(text: str, dialect: str = "spark") -> str:
    """Order-independent content fingerprint: sha256 over the sorted
    distinct token set — robust to token reordering (bag-of-words id)."""
    w = tokens(text, dialect)
    if dialect == "spark":
        return f"sha2(concat_ws('|', array_sort(array_distinct({w}))), 256)"
    return f"sha256(array_to_string(list_sort(list_distinct({w})), '|'))"


def fingerprint_minhash(text: str, dialect: str = "spark") -> str:
    """Near-dup-stable fingerprint: min md5-derived shingle hash (the
    k=1 MinHash — equal fingerprints ⇒ likely near-identical heads)."""
    from .dedup import P

    w = tokens(text, dialect)
    if dialect == "spark":
        sh = (
            f"transform(sequence(0, size({w}) - 3), "
            f"i -> concat_ws(' ', {w}[i], {w}[i+1], {w}[i+2]))"
        )
        h = f"transform({sh}, s -> cast(conv(substr(md5(s), 1, 14), 16, 10) as bigint) % {P})"
        return f"array_min({h})"
    sh = (
        f"list_transform(range(0, len({w}) - 2), "
        f"i -> concat_ws(' ', {w}[i+1], {w}[i+2], {w}[i+3]))"
    )
    h = (
        f"list_transform({sh}, "
        f"s -> CAST(concat('0x', substr(md5(s), 1, 14)) AS BIGINT) % {P})"
    )
    return f"list_min({h})"
