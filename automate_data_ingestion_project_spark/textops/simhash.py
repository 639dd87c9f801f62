"""SimHash near-dup detection (Charikar '02, the Google-crawl dedup bit
signature) + exact n-gram-Jaccard similarity join via an inverted index.

SimHash construction (32-bit, cross-engine deterministic):

1. token hash: the md5-derived 56-bit integer (same base hash as the
   MinHash pipeline);
2. per bit j ∈ [0,32): sum over the document's token MULTISET of
   ``+1 if bit j set else -1`` — computed as 32 codegen'd conditional
   SUM aggregates over exploded tokens (one shuffle, map-side partial);
3. fingerprint bit j = 1 iff the sum is positive.

Near-dup candidates come from 4 bands × 8 bits: two fingerprints within
Hamming distance 3 must agree exactly on ≥1 band (pigeonhole), so the
band equi-join finds all close pairs without an all-pairs scan; the
verifier is ``bit_count(xor)`` — one instruction per pair.

The inverted-index Jaccard join is the EXACT alternative to MinHash:
explode distinct shingles, self-join on the shingle (the inverted
index), count shared shingles per pair, Jaccard from set sizes. A
document-frequency cap drops ubiquitous shingles — the classic
hot-bucket guard: at 100 TB a stopword-shingle would otherwise create
one quadratic bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIM_BITS = 32
SIM_BANDS = 4
BAND_BITS = SIM_BITS // SIM_BANDS

_TOKEN_HASH = "cast(conv(substr(md5(t), 1, 14), 16, 10) as bigint)"


def simhash_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 32-bit fingerprint per document."""
    tok = df.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).withColumn("h", F.expr(_TOKEN_HASH))
    sums = [
        F.sum(
            F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"_b{j}")
        for j in range(SIM_BITS)
    ]
    fp = None
    for j in range(SIM_BITS):
        term = F.when(F.col(f"_b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return (
        tok.groupBy("doc_id")
        .agg(*sums)
        .select("doc_id", fp.cast("long").alias("simhash"))
    )


def simhash_near_pairs(
    fps: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming ≤ max_hamming) via band equi-join.

    Bands guarantee completeness for ``max_hamming < SIM_BANDS``
    (pigeonhole: ≤3 differing bits cannot touch all 4 bands)."""
    bands = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(j),
                        F.expr(
                            f"(simhash >> {j * BAND_BITS}) & {(1 << BAND_BITS) - 1}"
                        ),
                    )
                    for j in range(SIM_BANDS)
                ]
            )
        ).alias("band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.expr("cast(bit_count(a.simhash ^ b.simhash) as int)").alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def jaccard_index_join(
    shingle_rows: DataFrame,
    threshold: float = 0.5,
    max_doc_freq: int = 200,
) -> DataFrame:
    """Exact n-gram-Jaccard pairs from an inverted index on DISTINCT
    shingle rows (doc_id, s).

    shared(a,b) counts via self-join on the shingle; |A∪B| =
    |A|+|B|−shared. Shingles appearing in more than ``max_doc_freq``
    docs are dropped before the join (hot-bucket guard) — for
    threshold ≥ 0.5 a pair found ONLY through ubiquitous shingles
    cannot pass verification anyway when sizes differ meaningfully.
    """
    from ..operators.caching import tracked_persist

    sizes = shingle_rows.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    doc_freq = shingle_rows.groupBy("s").agg(F.count("*").alias("df_"))
    # persisted: rare feeds BOTH sides of the inverted-index self-join —
    # without it the doc_freq aggregate + filter join execute once per
    # branch (the recompute-per-plan-branch trap; see pair_jaccard_stats)
    rare = tracked_persist(
        shingle_rows.join(
            doc_freq.filter(F.col("df_") <= max_doc_freq).select("s"), "s"
        )
    )
    a = rare.select(F.col("doc_id").alias("doc_id_a"), "s")
    b = rare.select(F.col("doc_id").alias("doc_id_b"), "s")
    shared = (
        a.join(b, "s")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "n_shared", "jaccard")
    )
