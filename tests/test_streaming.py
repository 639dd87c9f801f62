"""Structured Streaming: replayed streams must EQUAL the batch
computation over the same files; stateful totals accumulate across
micro-batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.analytics.load import scratch_dir
from automate_data_ingestion_project_spark.io import load_table
from automate_data_ingestion_project_spark.streaming import (
    run_available_now,
    sessionized_counts,
    stream_events,
    user_running_totals,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    """Events fixture replayed as a 2-file streaming source (2 splits →
    multiple input files for AvailableNow)."""
    root = scratch_dir("test_streaming_src")
    d = os.path.join(root, "events")
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "user_id")
    ev.repartition(2).write.mode("overwrite").parquet(d)
    return d


def _batch_events(spark, events_dir):
    return spark.read.parquet(events_dir)


def test_windowed_counts_equal_batch(spark, events_dir):
    stream = windowed_event_counts(stream_events(spark, events_dir))
    got = run_available_now(stream, "win_counts", output_mode="complete")
    batch = (
        _batch_events(spark, events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_sessionized_counts_equal_batch(spark, events_dir):
    stream = sessionized_counts(stream_events(spark, events_dir), gap="30 minutes")
    got = run_available_now(stream, "sess_counts", output_mode="complete")
    batch = (
        _batch_events(spark, events_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    assert got.count() > 0


def test_stateful_running_totals_accumulate(spark, events_dir):
    ckpt = os.path.join(scratch_dir("test_streaming_ckpt"), "totals")
    stream = user_running_totals(stream_events(spark, events_dir))
    got = run_available_now(
        stream, "user_totals", output_mode="update", checkpoint_dir=ckpt
    )
    # update mode emits one row per (user, micro-batch); the LAST emission
    # per user must equal the batch count
    last = (
        got.groupBy("user_id").agg(F.max("total_events").alias("total")).collect()
    )
    batch = {
        r.user_id: r["count"]
        for r in _batch_events(spark, events_dir).groupBy("user_id").count().collect()
    }
    assert {r.user_id: r.total for r in last} == batch


def test_stream_upsert_is_idempotent_per_key(spark, events_dir):
    """foreachBatch keyed upsert: replaying the stream (fresh checkpoint)
    leaves the table unchanged — the reference's idempotent load, in
    streaming form."""
    from automate_data_ingestion_project_spark.streaming import stream_upsert

    # per-user latest aggregate keyed by user_id
    agg = (
        stream_events(spark, events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    root = scratch_dir("test_stream_upsert")
    path = os.path.join(root, "user_counts")

    def run(tag):
        # complete-mode aggregate into foreachBatch upsert
        from automate_data_ingestion_project_spark.io.sink import upsert_parquet

        def merge(batch_df, epoch_id):
            upsert_parquet(batch_df.sparkSession, batch_df, path, keys=["user_id"])

        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(merge)
            .option("checkpointLocation", os.path.join(root, f"ckpt_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(map(tuple, spark.read.parquet(path).collect()))

    first = run("a")
    second = run("b")  # full replay with fresh checkpoint
    assert first == second
    batch = sorted(
        map(tuple, _batch_events(spark, events_dir).groupBy("user_id").count().collect())
    )
    assert first == batch


def test_watermark_present_in_plan(spark, events_dir):
    stream = windowed_event_counts(stream_events(spark, events_dir))
    assert "EventTimeWatermark" in stream._jdf.queryExecution().analyzed().toString()


def test_kafka_decode_is_batch_testable(spark):
    """parse_kafka_events is pure DataFrame code: run it on a batch frame
    shaped like the Kafka source's output (value binary + metadata) and
    the full downstream operator chain composes onto the result."""
    from automate_data_ingestion_project_spark.streaming import (
        parse_kafka_events,
        windowed_event_counts,
    )

    payloads = [
        b'{"ts": "2024-01-01T00:10:00", "event_type": "click", "user_id": 7}',
        b'{"ts": "2024-01-01T00:20:00", "event_type": "click", "user_id": 8}',
        b'{"ts": "2024-01-01T01:05:00", "event_type": "view", "user_id": 7}',
        b"not json at all",  # dropped, not a poison row
        b'{"event_type": "view", "user_id": 9}',  # no ts -> dropped
    ]
    raw = spark.createDataFrame(
        [(None, v, "events", 0, i) for i, v in enumerate(payloads)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    parsed = parse_kafka_events(raw)
    assert parsed.schema.simpleString() == (
        "struct<ts:timestamp,event_type:string,user_id:bigint>"
    )
    rows = sorted(
        (r.event_type, r.user_id) for r in parsed.collect()
    )
    assert rows == [("click", 7), ("click", 8), ("view", 7)]
    # the watermarked windowed agg composes on the decoded frame (batch
    # groupBy-window here; identical code path streaming-side)
    counts = {
        (r.window_start.isoformat(), r.event_type): r.n_events
        for r in windowed_event_counts(parsed).collect()
    }
    assert counts == {
        ("2024-01-01T00:00:00", "click"): 2,
        ("2024-01-01T01:00:00", "view"): 1,
    }


def test_kafka_source_gated_on_classpath(spark):
    from automate_data_ingestion_project_spark.streaming import (
        kafka_available,
        stream_events_kafka,
    )

    if kafka_available(spark):
        df = stream_events_kafka(spark, "localhost:9092", "events")
        assert df.isStreaming
    else:
        with pytest.raises(RuntimeError, match="spark-sql-kafka"):
            stream_events_kafka(spark, "localhost:9092", "events")


def test_run_available_now_restores_shuffle_partitions(spark, events_dir):
    """The scoped state-store sizing must not leak: the session's
    shuffle-partition setting is restored after the replay (including
    its effect on subsequent BATCH queries)."""
    from automate_data_ingestion_project_spark.streaming import (
        run_available_now,
        stream_events,
        windowed_event_counts,
    )

    key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(key)
    got = run_available_now(
        windowed_event_counts(stream_events(spark, events_dir)),
        "restore_conf_probe",
        shuffle_partitions=3,
    )
    assert got.count() > 0
    assert spark.conf.get(key) == prior


def test_stream_neardup_ingest_cross_batch_detection(spark, tmp_path):
    """The streaming edition of the NearDupIndex loop: two document
    files drained as two micro-batches (maxFilesPerTrigger=1) must
    reproduce the batch loop's decisions — batch 2's doc is a near-dup
    of a doc ACCEPTED in batch 1's epoch, detectable only if the
    foreachBatch append really ran between micro-batches. The ledger
    carries the epoch ids; a replayed file must not double-append
    (ingest_batch's id guard)."""
    from automate_data_ingestion_project_spark.streaming.neardup import (
        stream_neardup_ingest,
    )
    from automate_data_ingestion_project_spark.textops.neardup_index import (
        NearDupIndex,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "pack my box with five dozen liquor jugs for shipping"),
        ],
        "doc_id long, text string",
    )
    index = NearDupIndex.build(spark, corpus, str(tmp_path / "idx"))

    src = tmp_path / "incoming"
    novel = "completely different words about distributed query engines here"
    b1 = spark.createDataFrame(
        [
            (10, "xq the quick brown fox jumps over the lazy dog today"),
            (11, novel),
        ],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(20, "zz " + novel)], "doc_id long, text string"
    )
    b1.coalesce(1).write.parquet(str(src / "batch1"))
    b2.coalesce(1).write.parquet(str(src / "batch2"))
    # file-source micro-batch order follows modification time: pin it
    # so batch1's append provably precedes batch2's probe
    t0 = os.stat(src / "batch1").st_mtime
    for sub, off in (("batch1", 0), ("batch2", 60)):
        for root, _, files in os.walk(src / sub):
            for f in files:
                p = os.path.join(root, f)
                os.utime(p, (t0 + off, t0 + off))

    ledger = stream_neardup_ingest(
        spark,
        f"{src}/*",
        index,
        str(tmp_path / "decisions"),
        str(tmp_path / "ckpt"),
    )
    rows = {r.batch_id: (r.is_near_dup, r.epoch_id) for r in ledger.collect()}
    assert rows[10][0] is True  # near-dup of corpus
    assert rows[11][0] is False  # novel, accepted + appended
    assert rows[20][0] is True  # near-dup of batch-1's ACCEPTED doc
    assert rows[11][1] < rows[20][1]  # distinct, ordered epochs
    # the accepted doc is in the index; the rejected ones are not
    assert index.bands().filter("doc_id = 11").count() > 0
    assert index.bands().filter("doc_id in (10, 20)").count() == 0


def test_stream_neardup_ingest_empty_drain_returns_empty_ledger(spark, tmp_path):
    """A drain with nothing pending is a normal state for a continuous
    loop: the ledger comes back empty with the full schema, not a
    read error on a never-created directory."""
    from automate_data_ingestion_project_spark.streaming.neardup import (
        stream_neardup_ingest,
    )
    from automate_data_ingestion_project_spark.textops.neardup_index import (
        NearDupIndex,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    index = NearDupIndex.build(spark, corpus, str(tmp_path / "idx"))
    src = tmp_path / "incoming"
    os.makedirs(src, exist_ok=True)
    ledger = stream_neardup_ingest(
        spark,
        f"{src}/*",
        index,
        str(tmp_path / "decisions"),
        str(tmp_path / "ckpt"),
    )
    assert ledger.count() == 0
    assert set(ledger.columns) == {
        "batch_id", "n_candidates", "n_verified_dups", "is_near_dup",
        "epoch_id",
    }


def test_stream_shard_export_epochs_fill_and_restart_resumes(spark, tmp_path):
    """The streaming shard exporter: two document files drained as two
    micro-batches must land as ledger batches {0, 1} with epoch 1's
    docs continuing from epoch 0's token offset (cross-epoch shard
    filling), and a RESTARTED drain over the same checkpoint must not
    re-export anything (the file source's checkpoint plus the append's
    committed-batch no-op)."""
    import os

    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.analytics.mixing import (
        shard_store_paths,
    )
    from automate_data_ingestion_project_spark.streaming.shards import (
        stream_shard_export,
    )

    src = tmp_path / "incoming"
    # 6-token docs, budget 10: doc 1 fills [0,6), doc 2 starts at 6 →
    # shard 0; epoch 1's doc 3 starts at 12 → shard 1, doc 4 at 18 →
    # shard 1 — a deterministic tiny fixture, scramble order irrelevant
    # within epochs because assignment is by running offset either way
    b1 = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "g h i j k l")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(3, "m n o p q r"), (4, "s t u v w x")], "doc_id long, text string"
    )
    b1.coalesce(1).write.parquet(str(src / "batch1"))
    b2.coalesce(1).write.parquet(str(src / "batch2"))
    t0 = os.stat(str(src / "batch1")).st_mtime
    for sub, off in (("batch1", 0), ("batch2", 60)):
        for walk_root, _, files in os.walk(str(src / sub)):
            for f in files:
                os.utime(os.path.join(walk_root, f), (t0 + off, t0 + off))

    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    exported = stream_shard_export(
        spark, f"{src}/*", root, ckpt, budget=10, shuffle_partitions=2
    )
    rows = {r.doc_id: (r.shard_id, r.batch_seq) for r in exported.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert {bs for _, bs in rows.values()} == {0, 1}
    # global starting offsets 0, 6, 12, 18 with budget 10 → shards
    # 0, 0, 1, 1: epoch 1 continued from epoch 0's total, not from 0
    assert [rows[i][0] for i in (1, 2, 3, 4)] == [0, 0, 1, 1]

    # restart over the same checkpoint: nothing pending → nothing new
    _, ledger_path = shard_store_paths(root)
    n_ledger = spark.read.parquet(ledger_path).count()
    again = stream_shard_export(
        spark, f"{src}/*", root, ckpt, budget=10, shuffle_partitions=2
    )
    assert again.count() == 4
    assert spark.read.parquet(ledger_path).count() == n_ledger


def test_stream_shard_export_empty_epoch_survives(spark, tmp_path):
    """An empty micro-batch (a zero-row input file — a real production
    shape for a continuous exporter) must not kill the stream on a
    fresh store: the empty epoch commits a (0, 0, 0) ledger row and the
    following real epoch lands its docs starting at token offset 0."""
    import os

    from automate_data_ingestion_project_spark.analytics.mixing import (
        shard_store_paths,
    )
    from automate_data_ingestion_project_spark.streaming.shards import (
        stream_shard_export,
    )

    src = tmp_path / "incoming"
    empty = spark.createDataFrame([], "doc_id long, text string")
    full = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "g h i j k l")], "doc_id long, text string"
    )
    empty.coalesce(1).write.parquet(str(src / "batch0"))
    full.coalesce(1).write.parquet(str(src / "batch1"))
    # order the file source's epochs: empty file strictly first
    t0 = os.stat(str(src / "batch0")).st_mtime
    for sub, off in (("batch0", 0), ("batch1", 60)):
        for walk_root, _, files in os.walk(str(src / sub)):
            for f in files:
                os.utime(os.path.join(walk_root, f), (t0 + off, t0 + off))

    root = str(tmp_path / "store")
    exported = stream_shard_export(
        spark,
        f"{src}/*",
        root,
        str(tmp_path / "ckpt"),
        budget=10,
        shuffle_partitions=2,
    )
    rows = {r.doc_id: (int(r.shard_id), r.batch_seq) for r in exported.collect()}
    # the real epoch's docs start at offset 0 — the empty epoch added none
    assert rows == {1: (0, 1), 2: (0, 1)}
    _, ledger_path = shard_store_paths(root)
    ledger = {
        r.batch_seq: (r.n_docs, r.n_tokens)
        for r in spark.read.parquet(ledger_path).collect()
    }
    assert ledger == {0: (0, 0), 1: (2, 12)}


def test_stream_shard_export_empty_drain_returns_empty(spark, tmp_path):
    import os

    from automate_data_ingestion_project_spark.streaming.shards import (
        stream_shard_export,
    )

    src = tmp_path / "incoming"
    os.makedirs(src, exist_ok=True)
    out = stream_shard_export(
        spark,
        f"{src}/*",
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "text", "n_tokens", "shard_id", "batch_seq",
    }


def test_stream_ivf_ingest_empty_epoch_and_restart(spark, sf_dir, tmp_path):
    """The streaming IVF indexer: an empty first epoch (zero-row
    embedding file) commits a (0, 0) ledger row and the store survives;
    the real epochs land their vectors; a restarted drain over the same
    checkpoint re-indexes nothing (checkpoint + committed-epoch no-op)."""
    import os

    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.analytics.ivf import (
        N_CELLS,
        ivf_store_paths,
    )
    from automate_data_ingestion_project_spark.io import load_table
    from automate_data_ingestion_project_spark.streaming.ivf import (
        stream_ivf_ingest,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    src = tmp_path / "incoming"
    empty = spark.createDataFrame([], emb.schema)
    empty.coalesce(1).write.parquet(str(src / "batch0"))
    emb.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(
        str(src / "batch1")
    )
    emb.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(
        str(src / "batch2")
    )
    t0 = os.stat(str(src / "batch0")).st_mtime
    for sub, off in (("batch0", 0), ("batch1", 60), ("batch2", 120)):
        for walk_root, _, files in os.walk(str(src / sub)):
            for f in files:
                os.utime(os.path.join(walk_root, f), (t0 + off, t0 + off))

    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    stored = stream_ivf_ingest(
        spark, f"{src}/*", centroids, root, ckpt, shuffle_partitions=2
    )
    assert stored.count() == emb.count()
    assert stored.select("vec_id").distinct().count() == emb.count()
    vectors_path, ledger_path = ivf_store_paths(root)
    ledger = {
        r.batch_seq: r.n_vectors
        for r in spark.read.parquet(ledger_path).collect()
    }
    assert set(ledger) == {0, 1, 2} and ledger[0] == 0
    assert ledger[1] + ledger[2] == emb.count()

    # restart over the same checkpoint: nothing pending → nothing new
    again = stream_ivf_ingest(
        spark, f"{src}/*", centroids, root, ckpt, shuffle_partitions=2
    )
    assert again.count() == emb.count()
    assert spark.read.parquet(ledger_path).count() == 3
