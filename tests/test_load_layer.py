"""Load layer (L1-L4): upsert idempotence on real data, by-name
reconciliation, YAML schema → StructType → DDL → catalog round-trip."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from automate_data_ingestion_project_spark.analytics.load import scratch_dir
from automate_data_ingestion_project_spark.io import load_table
from automate_data_ingestion_project_spark.io.sink import (
    align_to_schema,
    path_exists,
    read_parquet,
    upsert_parquet,
)
from automate_data_ingestion_project_spark.schemas import (
    create_table,
    schemas_from_yaml,
    table_exists,
)

_CFG_PATH = os.path.join(
    os.path.dirname(__file__),
    "..",
    "automate_data_ingestion_project_spark",
    "configs",
    "dv3f_schema.yaml",
)


def test_upsert_is_idempotent_and_replaces_on_key(spark, sf_dir):
    path = os.path.join(scratch_dir("test_upsert_orders"), "orders")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )

    batch1 = orders.filter(F.col("o_orderkey") % 3 != 0)
    upsert_parquet(spark, batch1, path, keys=["o_orderkey"])
    n1 = read_parquet(spark, path).count()
    assert n1 == batch1.count()

    # batch2 overlaps batch1 (keys % 5 == 0 ∩ % 3 != 0) and adds new keys
    batch2 = orders.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.lit(-1.0)
    )
    upsert_parquet(spark, batch2, path, keys=["o_orderkey"])
    after2 = read_parquet(spark, path)
    expected_keys = batch1.select("o_orderkey").union(
        batch2.select("o_orderkey")
    ).distinct()
    assert after2.count() == expected_keys.count()
    # every batch2 key now carries the replacement value
    assert (
        after2.join(batch2.select("o_orderkey"), "o_orderkey")
        .filter(F.col("o_totalprice") != -1.0)
        .count()
        == 0
    )

    # idempotence: re-running batch2 changes nothing (snapshot rows
    # first — the upsert swaps the directory under the old DataFrame)
    before = sorted(map(tuple, after2.collect()))
    upsert_parquet(spark, batch2, path, keys=["o_orderkey"])
    after3 = sorted(map(tuple, read_parquet(spark, path).collect()))
    assert after3 == before


def test_upsert_partitioned_rewrites_only_touched_partitions(spark):
    """Dynamic partition overwrite: a batch touching one partition must
    leave every other partition's files byte-identical on disk (same
    names, same mtimes) — the INSERT OR REPLACE narrowed to partitions."""
    path = os.path.join(scratch_dir("test_upsert_dpo"), "t")
    base = spark.createDataFrame(
        [(1, 2019, "a"), (2, 2019, "b"), (3, 2020, "c"), (4, 2021, "d")],
        "k int, year int, v string",
    )
    upsert_parquet(spark, base, path, keys=["k"], partition_by=["year"])

    def files_of(part):
        d = os.path.join(path, f"year={part}")
        return sorted(
            (f, os.stat(os.path.join(d, f)).st_mtime_ns)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    before_2019, before_2021 = files_of(2019), files_of(2021)

    # batch replaces k=3 (year 2020) and inserts k=5 into a NEW partition
    batch = spark.createDataFrame(
        [(3, 2020, "C2"), (5, 2022, "e")], "k int, year int, v string"
    )
    upsert_parquet(spark, batch, path, keys=["k"], partition_by=["year"])

    # untouched partitions: identical files, untouched mtimes
    assert files_of(2019) == before_2019
    assert files_of(2021) == before_2021
    out = {(r.k, r.year, r.v) for r in read_parquet(spark, path).collect()}
    assert out == {
        (1, 2019, "a"),
        (2, 2019, "b"),
        (3, 2020, "C2"),
        (4, 2021, "d"),
        (5, 2022, "e"),
    }

    # idempotence holds in the partitioned path too
    upsert_parquet(spark, batch, path, keys=["k"], partition_by=["year"])
    out2 = {(r.k, r.year, r.v) for r in read_parquet(spark, path).collect()}
    assert out2 == out


def test_upsert_partitioned_moves_key_across_partitions(spark):
    """A key whose partition value CHANGES in the batch must not survive
    in its old partition: both the old and new partitions are touched by
    the merge (the old one via the key anti-join)."""
    path = os.path.join(scratch_dir("test_upsert_dpo_move"), "t")
    base = spark.createDataFrame(
        [(1, 2019, "a"), (2, 2020, "b")], "k int, year int, v string"
    )
    upsert_parquet(spark, base, path, keys=["k"], partition_by=["year"])
    # k=1 moves from year 2019 to 2020
    batch = spark.createDataFrame([(1, 2020, "a2")], "k int, year int, v string")
    upsert_parquet(spark, batch, path, keys=["k"], partition_by=["year"])
    out = {(r.k, r.year, r.v) for r in read_parquet(spark, path).collect()}
    assert out == {(1, 2020, "a2"), (2, 2020, "b")}


def test_upsert_keys_overlapping_partition_by(spark):
    """keys and partition_by may share columns without either being a
    subset of the other (keys=[k,year], partition_by=[year,region]) —
    the moved-keys probe projects each column once, so the merge runs
    instead of raising an ambiguous-reference error."""
    path = os.path.join(scratch_dir("test_upsert_overlap"), "t")
    base = spark.createDataFrame(
        [(1, 2019, "eu", "a"), (2, 2019, "us", "b"), (1, 2020, "eu", "c")],
        "k int, year int, region string, v string",
    )
    upsert_parquet(
        spark, base, path, keys=["k", "year"], partition_by=["year", "region"]
    )
    batch = spark.createDataFrame(
        [(1, 2019, "eu", "A2"), (3, 2020, "us", "d")],
        "k int, year int, region string, v string",
    )
    upsert_parquet(
        spark, batch, path, keys=["k", "year"], partition_by=["year", "region"]
    )
    out = {(r.k, r.year, r.region, r.v) for r in read_parquet(spark, path).collect()}
    assert out == {
        (1, 2019, "eu", "A2"),
        (2, 2019, "us", "b"),
        (1, 2020, "eu", "c"),
        (3, 2020, "us", "d"),
    }


def test_stranded_swap_aside_dir_is_invisible_to_reads(spark):
    """A crash between _swap_dir's rename-aside and rmtree strands the
    old partition dir inside the table root. Its dot-prefixed name must
    make Spark's file index skip it: no duplicated rows, no corrupted
    partition-column inference."""
    path = os.path.join(scratch_dir("test_upsert_stranded"), "t")
    base = spark.createDataFrame(
        [(1, 2019, "a"), (2, 2020, "b")], "k int, year int, v string"
    )
    upsert_parquet(spark, base, path, keys=["k"], partition_by=["year"])
    # simulate the crash: copy the live partition dir to the aside name
    # _swap_dir would have used, as if rmtree never ran
    import shutil as _sh

    live = os.path.join(path, "year=2019")
    _sh.copytree(live, os.path.join(path, ".old-deadbeef-year=2019"))
    spark.catalog.refreshByPath(path)
    out = [(r.k, r.year, r.v) for r in read_parquet(spark, path).collect()]
    assert sorted(out) == [(1, 2019, "a"), (2, 2020, "b")]  # not duplicated
    assert read_parquet(spark, path).schema["year"].dataType.typeName() == "integer"


def test_upsert_dedupes_source_batch(spark):
    path = os.path.join(scratch_dir("test_upsert_dupes"), "t")
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    upsert_parquet(spark, df, path, keys=["k"])
    out = read_parquet(spark, path)
    assert out.count() == 2  # PK semantics: one row per key (Q4)


def test_align_to_schema_fills_casts_and_drops(spark):
    target = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("missing", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame([(1, 2, "extra")], "a int, b int, junk string")
    out = align_to_schema(df, target)
    assert out.columns == ["a", "b", "missing"]
    assert [f.dataType for f in out.schema.fields] == [
        T.LongType(),
        T.StringType(),
        T.DoubleType(),
    ]
    row = out.collect()[0]
    assert (row.a, row.b, row.missing) == (1, "2", None)


def test_yaml_schemas_struct_and_ddl():
    with open(_CFG_PATH) as fh:
        schemas = schemas_from_yaml(fh.read())
    assert set(schemas) == {"src_departement", "src_region"}
    dep = schemas["src_departement"]
    st = dep.to_struct_type()
    assert len(st.fields) == 15
    assert st["uid"].dataType == T.StringType()
    assert not st["uid"].nullable
    assert st["nbtrans"].dataType == T.LongType()
    assert dep.primary_key == ("uid",)
    ddl = dep.ddl()
    assert "CREATE TABLE IF NOT EXISTS dev.src_departement" in ddl
    assert "nbtrans BIGINT" in ddl
    assert "'primary_key' = 'uid'" in ddl
    # constraints carried for Q3
    annee = next(c for c in dep.columns if c.name == "annee")
    assert annee.max_length == 4


def test_create_table_and_exists_probe(spark):
    with open(_CFG_PATH) as fh:
        schemas = schemas_from_yaml(fh.read())
    dep = schemas["src_departement"]
    spark.sql("DROP TABLE IF EXISTS dev.src_departement")
    assert not table_exists(spark, "dev.src_departement")
    create_table(spark, dep)
    assert table_exists(spark, "dev.src_departement")
    assert spark.table("dev.src_departement").schema.fieldNames() == [
        c.name for c in dep.columns
    ]
    spark.sql("DROP TABLE dev.src_departement")


def test_path_exists_probe(tmp_path):
    d = str(tmp_path / "t")
    assert not path_exists(d)
    os.makedirs(d)
    assert not path_exists(d)  # empty dir is not a table
    (tmp_path / "t" / "part-0.parquet").write_bytes(b"x")
    assert path_exists(d)


def test_write_jsonl_roundtrip(spark, tmp_path):
    import gzip
    import json
    import os

    from automate_data_ingestion_project_spark.io.sink import write_jsonl

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour", "fr")],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "export")
    write_jsonl(df, path, partition_by=["lang"])
    # partitioned layout + gzip files
    assert os.path.isdir(os.path.join(path, "lang=en"))
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".json.gz")
    ]
    assert files
    rows = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            rows += [json.loads(ln) for ln in fh if ln.strip()]
    assert sorted(r["doc_id"] for r in rows) == [1, 2]
    # spark reads its own export back identically (minus partition col type)
    back = spark.read.json(path)
    assert back.count() == 2


def test_compact_parquet_uniform_files_and_atomic_swap(spark):
    """A fragmented directory (many tiny files) compacts to
    ceil(rows/target) uniform files with identical contents; the live
    path never holds a partial rewrite."""
    import glob

    from automate_data_ingestion_project_spark.io.sink import compact_parquet

    path = os.path.join(scratch_dir("compact_parquet"), "t")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    # fragment: 64 small files
    df.repartition(64).write.parquet(path)
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 64

    n_parts = compact_parquet(spark, path, target_rows_per_file=2_500)
    assert n_parts == 4
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) == 4
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(10_000))
    # no leftover temp dir from the atomic swap
    assert not glob.glob(path + ".tmp-*")


def test_range_clustered_write_gives_nonoverlapping_file_ranges(spark):
    """write_range_clustered must produce files whose [min,max] ranges
    on the cluster key do not overlap — the property parquet min/max
    skipping needs — and a point filter must prune to one file."""
    import glob

    import pyarrow.parquet as pq

    from automate_data_ingestion_project_spark.io.sink import write_range_clustered

    path = os.path.join(scratch_dir("range_clustered"), "t")
    df = spark.range(0, 100_000).select(
        (F.col("id") * 48271 % 100_000).alias("k"), F.col("id").alias("v")
    )
    write_range_clustered(df, path, ["k"], n_files=8)

    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 8
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)  # non-overlapping file ranges


def test_incremental_rollup_late_data_reupserts_closed_day(spark, sf_dir):
    """Late rows for an already-rolled-up day: recomputing THAT DAY's
    aggregate and upserting replaces the stale row, leaves every other
    day byte-identical, and the table equals the full recompute."""
    from automate_data_ingestion_project_spark.functions import dsum

    path = os.path.join(scratch_dir("rollup_late"), "rollup")
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type", "value"
    )
    late_day = "2024-01-10"
    on_time = ev.filter(F.col("day") != F.lit(late_day).cast("date"))
    late = ev.filter(F.col("day") == F.lit(late_day).cast("date"))

    def agg(df):
        return df.groupBy("day", "event_type").agg(
            F.count("*").alias("n_events"), dsum("value").alias("total_value")
        )

    upsert_parquet(spark, agg(on_time), path, keys=["day", "event_type"],
                   partition_by=["day"])
    # late batch arrives: recompute ONLY the affected day, upsert it
    upsert_parquet(spark, agg(late), path, keys=["day", "event_type"],
                   partition_by=["day"])

    got = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in read_parquet(spark, path).collect()
    }
    want = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in agg(ev).collect()
    }
    assert got == want


def test_compact_parquet_partitioned_one_file_per_value(spark):
    """Partitioned compaction must cluster rows on the partition cols
    before the write: one file per partition value — NOT n_files×values
    fragments (the round-robin failure mode)."""
    import glob

    from automate_data_ingestion_project_spark.io.sink import compact_parquet

    path = os.path.join(scratch_dir("compact_parted"), "t")
    df = spark.range(0, 10_000).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    )
    df.repartition(16).write.partitionBy("g").parquet(path)
    n_before = sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert n_before >= 5 * 16 * 0.5  # genuinely fragmented

    n_after = compact_parquet(
        spark, path, target_rows_per_file=2_500, partition_by=["g"]
    )
    assert n_after == 5  # one file per partition value
    for g in range(5):
        files = glob.glob(os.path.join(path, f"g={g}", "*.parquet"))
        assert len(files) == 1, (g, files)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(range(10_000))


def test_morton_code_matches_python_bit_interleave(spark):
    """morton_code's shift/mask spreading vs the literal Python bit
    interleave, across the 16-bit corners and a pseudo-random sweep."""
    from automate_data_ingestion_project_spark.io.sink import morton_code

    def reference(x: int, y: int) -> int:
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2)]
    pts += [((i * 48271) % 65536, (i * 16807) % 65536) for i in range(200)]
    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y", morton_code(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r.z == reference(r.x, r.y), (r.x, r.y)


def test_zorder_write_skips_files_on_both_dimensions(spark):
    """The Z-order claim, measured as what min/max stats actually do:
    count the files whose [min,max] box intersects a narrow range
    predicate on EACH dimension. The 1-D layout prunes only its leading
    column (the second column is full-width in every file, so a
    y-predicate reads ALL files); the Z-order layout prunes BOTH. A few
    z-range files straddle quadrant crossings of the curve and carry
    wide boxes — the property is aggregate file-count skipping, not a
    per-file span bound. Rows and values must be unaffected — layout is
    the only effect."""
    import glob

    import pyarrow.parquet as pq

    from automate_data_ingestion_project_spark.io.sink import (
        write_range_clustered,
        write_zorder_clustered,
    )

    n = 1 << 16
    grid = spark.range(n).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
        F.col("id").alias("v"),
    )
    zpath = os.path.join(scratch_dir("zorder"), "z")
    rpath = os.path.join(scratch_dir("zorder"), "r")
    write_zorder_clustered(grid, zpath, "x", "y", n_files=16)
    write_range_clustered(grid, rpath, ["x"], n_files=16)

    def file_boxes(path, col_idx):
        boxes = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            boxes.append((min(mins), max(maxs)))
        return boxes

    def n_hit(boxes, lo, hi):
        return sum(1 for (mn, mx) in boxes if mx >= lo and mn <= hi)

    zx, zy = file_boxes(zpath, 0), file_boxes(zpath, 1)
    rx, ry = file_boxes(rpath, 0), file_boxes(rpath, 1)
    assert len(zx) == len(rx) == 16
    # width-63 range predicate on each axis (1/4 of the domain; ideal
    # hit = 4 of 16 files, allow straddlers up to half)
    assert n_hit(zx, 0, 63) <= 8, zx
    assert n_hit(zy, 0, 63) <= 8, zy
    # 1-D layout: x prunes hard, y reads EVERY file — the gap z-order closes
    assert n_hit(rx, 0, 63) <= 8
    assert n_hit(ry, 0, 63) == 16
    # layout only: same rows back
    assert spark.read.parquet(zpath).agg(F.sum("v")).collect()[0][0] == sum(
        range(n)
    )


def test_morton_code_rejects_sign_bit_widths(spark):
    """bits=32 would put y's top bit in the BIGINT sign bit and make
    negative codes sort first — must be rejected, and the widest legal
    width must stay non-negative at the far corner."""
    import pytest

    from automate_data_ingestion_project_spark.io.sink import morton_code

    with pytest.raises(ValueError, match="31 bits"):
        morton_code(F.lit(0), F.lit(0), bits=32)
    top = (1 << 31) - 1
    row = (
        spark.range(1)
        .select(morton_code(F.lit(top), F.lit(top), bits=31).alias("z"))
        .collect()[0]
    )
    assert row.z == (1 << 62) - 1 and row.z > 0
