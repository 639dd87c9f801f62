#!/usr/bin/env python
"""Composed-pipeline scale demo: ingest → near-dup filter → curate →
pack as ONE run at an sf1-equivalent corpus (REP× the sf0.1 fixture).

Per-query plans are already pinned by tests/test_plans.py; what this
script evidences is that the COMPOSED system — the chain a real
training-data build runs — holds when the corpus is 10× the bench
scale, and how the wall-time splits across stages. The recorded run
lives in SCALE.md ("Composed-pipeline scale demo").

Usage::

    python scripts/scale_demo.py [REP] [SF_DIR] [--class-size=K]

    REP     replication factor (default 10 → 50k docs from sf0.1's 5k,
            the sf1-equivalent corpus; supported up to 200 → 1M docs.
            Replicas 0-17 use the cipher cycle below — 17 distinct
            non-identity rotations, identical to the r7 runs so data
            points stay comparable; replicas ≥ 18 additionally insert a
            replica-keyed token after every 3rd word, so two replicas
            sharing a rotation still share almost no 3-shingles:
            token-free windows are ~1/3 of either side's shingle set,
            Jaccard ≈ 1/7 « the 0.5 dup threshold)
    SF_DIR  fixture dir (default /root/testdata/sf0.1)

    --class-size=K  constant-dup-density mode. The DEFAULT planting
            keys each dup class by doc alone, so class size grows with
            REP (~0.1·REP members) and pair count grows ~REP² — that is
            what the fixture plants, not what the operator costs, and
            it is why the recorded default-mode curve is superlinear.
            With --class-size=K the dup classes are keyed by
            (doc, rep div K): every class has K members — bounded by
            the CONSTANT K at any REP (each doc's final group holds
            REP mod K members when K doesn't divide REP; e.g. REP=10,
            K=11 → one 10-member group per doc) — dup FRACTION stays
            ~15%, and the number of classes grows linearly with the
            corpus: the realistic shape (a 2× corpus has 2× the dup
            classes, not 2×-bigger classes). Under it, Σ|class|² is
            linear in corpus size, so a ~linear near-dup stage time is
            the MEASURED form of SCALE.md's constant-density
            linearity claim.

Stages (each timed separately; one JSON line at the end):

1. ``scale_up`` — replicate ``documents`` REP× with deterministic,
   codegen'd perturbations and land the corpus as partitioned parquet
   (the "ingest" stage). One scan, rows multiply in-flight via
   ``explode(sequence(...))`` — the scale shape, not a per-replica
   re-read. Replica texts are made genuinely distinct via a
   per-replica letter-substitution cipher (``F.translate`` over an
   18-letter high-frequency cycle — nearly every word, hence every
   shingle, changes, so replicas are NOT near-dups of each other and
   dup density stays realistic instead of quadratic in REP), except
   for planted ground truth: ~10% of each replica keeps the original
   text verbatim (exact dups) and ~5% prepends a replica token to it
   (near-dups that survive exact dedup but fall to MinHash).
2. ``neardup_filter`` — the full MinHash chain over the scaled corpus
   (shingle_rows → signatures → banded candidates → exact-Jaccard
   verify → connected components), then drop every non-canonical
   member (node ≠ component_id ⇒ not the min-id/original copy) and
   land the filtered corpus. Same primitives as the
   ``dedup_minhash_pairs`` / ``dedup_components`` registered queries
   (``textops/dedup.py``, ``textops/components.py``): candidates come
   from the banded equi-join (Σ|bucket|², never n²), verification
   touches candidates only, and the drop-set join is left to AQE (its
   size is corpus-dependent — the no-forced-broadcast policy).
3. ``curate_pack`` — the registered ``corpus_curation_pipeline`` query
   (exact dedup → 5-gram decontamination → mixture sampling →
   sequence packing composed in one Catalyst lineage,
   ``analytics/curation.py``) pointed at the filtered corpus.
4. ``shard_export`` — the registered ``export_token_shards`` query
   (``analytics/mixing.py``) pointed at the filtered corpus: the
   pipeline's TERMINAL materialization (global scramble-order prefix
   sum → repartition(shard_id) → partitionBy write → stats read back
   from the written files). Recorded: shard count, written bytes/files,
   wall — the repartition-then-partitionBy write is the shape that
   misbehaves first at scale, so it is measured, not argued.

Everything stays in the engine's own operators — the demo adds no new
query surface, it composes the existing one.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REP_OFFSET = 10_000_000  # doc_id stride per replica; multiple of EVAL_MOD
# 18 distinct high-frequency letters; rotations 1..17 are distinct
# non-identity substitution ciphers, one per replica
CIPHER = "etaoinshrdlucmfwyp"


def _ciphered(key_sql: str):
    """Letter-substitution cipher keyed by the (SQL-fragment) integer
    key: rotate the 18-letter cycle by key % 17 + 1 — 17 distinct
    non-identity rotations. F.expr because ``translate`` needs a
    per-row `to` string, which the Column API only takes as a literal."""
    n = len(CIPHER) - 1
    return F.expr(
        f"translate(text, '{CIPHER}', concat("
        f"substring('{CIPHER}', ({key_sql}) % {n} + 2, {len(CIPHER)}), "
        f"substring('{CIPHER}', 1, ({key_sql}) % {n} + 1)))"
    )


def _perturbed(key_sql: str):
    """Key-distinct text perturbation: the cipher alone for keys < 18
    (distinct rotations), composed with a key-tagged token inserted
    after every 3rd word for keys ≥ 18 (keys sharing a rotation then
    share only the token-free ~1/3 of their shingle sets, Jaccard ≈
    1/7 « the 0.5 dup threshold). Still one codegen'd expression — the
    replacement group ref '$1' survives a per-row Column replacement."""
    inserted = F.regexp_replace(
        _ciphered(key_sql),
        r"((\S+\s+){3})",
        F.concat(
            F.lit("$1zq"),
            F.expr(f"CAST({key_sql} AS STRING)"),
            F.lit(" "),
        ),
    )
    return F.when(
        F.expr(key_sql) < len(CIPHER), _ciphered(key_sql)
    ).otherwise(inserted)


def main(argv: list[str]) -> int:
    class_size = None
    args = []
    for a in argv[1:]:
        if a.startswith("--class-size="):
            class_size = int(a.split("=", 1)[1])
        elif a.startswith("--"):
            # strict: a typo'd or space-separated flag silently running
            # the WRONG configuration would contaminate a recorded
            # measurement — refuse instead
            print(f"unknown flag {a!r} (did you mean --class-size=K?)",
                  file=sys.stderr)
            return 2
        else:
            args.append(a)
    rep = int(args[0]) if args else 10
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    if not 2 <= rep <= 200:
        print("REP must be in [2, 200]", file=sys.stderr)
        return 2
    if class_size is not None and class_size < 2:
        print("--class-size must be ≥ 2", file=sys.stderr)
        return 2

    # Size the single-JVM heap for the scaled corpus BEFORE the JVM
    # starts (spark.driver.memory is launch-time-only; the package's
    # get_spark cannot set it — session.py:57). The 1 GiB local-mode
    # default OOMs around REP≈18 (90k docs) in the MinHash verify
    # stage's persisted shingle arrays; the recorded REP=200 (1M docs)
    # run needed 12 GiB, which covers the full supported REP range with
    # the same plan shapes. On a real cluster this is executor sizing,
    # not a code concern. No-op when a session already exists (e.g.
    # under pytest at small REP).
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 12g pyspark-shell"
    )

    import __spark_entry__ as entrymod  # populates the query registry
    from automate_data_ingestion_project_spark.analytics import QUERIES
    from automate_data_ingestion_project_spark.analytics.load import scratch_dir
    from automate_data_ingestion_project_spark.io import load_table
    from automate_data_ingestion_project_spark.session import get_spark
    from automate_data_ingestion_project_spark.textops.components import (
        connected_components,
    )
    from automate_data_ingestion_project_spark.textops.dedup import (
        candidate_pairs,
        lsh_band_keys,
        minhash_signatures_rows,
        shingle_rows,
        verified_near_duplicates_rows,
    )

    assert "corpus_curation_pipeline" in entrymod.queries()
    spark = get_spark(app_name="scale-demo", shuffle_partitions=32)
    root = scratch_dir("scale_demo")
    raw_dir = os.path.join(root, "corpus")
    curated_dir = os.path.join(root, "curated")
    timings: dict[str, float] = {}
    stats: dict[str, int] = {}

    # ---- stage 1: scale-up ingest -------------------------------------
    t0 = time.monotonic()
    docs = load_table(spark, sf_dir, "documents")
    stats["rows_in"] = docs.count()
    r = F.col("rep")
    if class_size is None:
        # DEFAULT planting (identical to every recorded prior run):
        # dup classes keyed per doc, so ~10% of replicas join ONE
        # exact-dup class with the original (class size grows ~0.1·REP)
        # and ~5% join one near-dup class. Non-planted replicas get the
        # rep-keyed perturbation — far from everything.
        bucket = F.crc32(F.concat_ws("|", F.col("doc_id"), r)) % 100
        text = (
            F.when(r == 0, F.col("text"))
            .when(bucket < 10, F.col("text"))  # planted exact dup
            .when(  # planted near-dup: one novel token prepended
                bucket < 15,
                F.concat(
                    F.lit("xq"), r.cast("string"), F.lit(" "), F.col("text")
                ),
            )
            .otherwise(_perturbed("rep"))
        )
    else:
        # CONSTANT-DENSITY planting: classes keyed by (doc, rep div K),
        # so class size is bounded by the CONSTANT K at any REP (each
        # doc's final group is partial — REP mod K members — when K
        # doesn't divide REP). A selected group's members share the
        # GROUP-keyed perturbation as their class base (group 0 = the
        # original text); bases of different groups are far apart by
        # the same argument as default-mode replicas, so classes never
        # chain into super-components.
        # Member (non-planted) perturbations are keyed rep + 1000 —
        # disjoint from every group key (≤ 200/K), so a member text can
        # never coincide with a class base.
        grp_sql = f"CAST(rep / {class_size} AS INT)"
        grp = F.expr(grp_sql)
        gbucket = (
            F.crc32(F.concat_ws("|", F.col("doc_id"), F.lit("g"), grp)) % 100
        )
        group_base = F.when(grp == 0, F.col("text")).otherwise(
            _perturbed(grp_sql)
        )
        text = (
            F.when(gbucket < 10, group_base)  # exact-dup class, size K
            .when(  # near-dup class, size K: one member token prepended
                gbucket < 15,
                F.concat(F.lit("xq"), r.cast("string"), F.lit(" "), group_base),
            )
            .otherwise(_perturbed("rep + 1000"))
        )
    scaled = (
        docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
        .select(
            (F.col("doc_id") + r * REP_OFFSET).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("int"))
    )
    scaled.repartition(32).write.mode("overwrite").parquet(
        os.path.join(raw_dir, "documents.parquet")
    )
    timings["scale_up_sec"] = round(time.monotonic() - t0, 2)

    # ---- stage 2: near-dup filter ------------------------------------
    t0 = time.monotonic()
    corpus = load_table(spark, raw_dir, "documents")
    stats["rows_scaled"] = corpus.count()
    rows = shingle_rows(corpus.select("doc_id", "text"))
    sigs = minhash_signatures_rows(rows)
    pairs = candidate_pairs(lsh_band_keys(sigs))
    verified = verified_near_duplicates_rows(rows, pairs).select(
        "doc_id_a", "doc_id_b"
    )
    comp = connected_components(verified)
    # canonical member = component_id (min doc_id = the original copy
    # under the replica-offset id scheme); drop everything else
    drop = comp.filter(F.col("node") != F.col("component_id")).select(
        F.col("node").alias("doc_id")
    )
    curated = corpus.join(drop, "doc_id", "left_anti")
    curated.repartition(32).write.mode("overwrite").parquet(
        os.path.join(curated_dir, "documents.parquet")
    )
    timings["neardup_filter_sec"] = round(time.monotonic() - t0, 2)

    # bookkeeping, not pipeline work: count the filtered corpus BEFORE
    # the stage-3 timer so curate_pack_sec measures only curate+pack
    stats["rows_curated"] = load_table(spark, curated_dir, "documents").count()
    stats["rows_dropped"] = stats["rows_scaled"] - stats["rows_curated"]

    # ---- stage 3: curate + pack (registered composed query) ----------
    t0 = time.monotonic()
    result = QUERIES["corpus_curation_pipeline"].fn(spark, curated_dir).collect()
    timings["curate_pack_sec"] = round(time.monotonic() - t0, 2)
    stats["result_sources"] = len(result)
    stats["packed_docs"] = sum(row["n_docs"] for row in result)
    stats["packed_sequences"] = sum(row["n_sequences"] for row in result)
    stats["total_tokens"] = sum(row["total_tokens"] for row in result)

    # ---- stage 4: terminal shard export (registered query) -----------
    from automate_data_ingestion_project_spark.analytics.load import (
        scratch_path,
    )

    t0 = time.monotonic()
    shards = QUERIES["export_token_shards"].fn(spark, curated_dir).collect()
    timings["shard_export_sec"] = round(time.monotonic() - t0, 2)
    stats["shards"] = len(shards)
    stats["shard_docs"] = sum(row["n_docs"] for row in shards)
    stats["shard_tokens"] = sum(row["shard_tokens"] for row in shards)
    # written-layout accounting from the files themselves (the query
    # already read them back for its stats; this is the bytes/files
    # view SCALE.md records)
    shards_root = os.path.join(scratch_path("token_shards"), "shards")
    n_files = 0
    n_bytes = 0
    for dirpath, _dirs, files in os.walk(shards_root):
        for f in files:
            if f.endswith(".parquet"):
                n_files += 1
                n_bytes += os.path.getsize(os.path.join(dirpath, f))
    stats["shard_files"] = n_files
    stats["shard_bytes"] = n_bytes

    total = round(sum(timings.values()), 2)
    print(
        json.dumps(
            {
                "metric": "scale_demo_total_sec",
                "value": total,
                "unit": "sec",
                "rep": rep,
                "sf_dir": sf_dir,
                "class_size": class_size,
                "stages": timings,
                **stats,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
