"""Tests for sources.io: format dispatch, writers, bucketed co-located joins."""

import pytest

from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.plans.inspect import plan_report
from feature_factory_spark.sources import io as ffio


def test_read_dispatch_and_write_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, k string")
    for fmt in ("parquet", "json", "orc", "csv"):
        p = str(tmp_path / f"t_{fmt}.{fmt}")
        ffio.write(df, p, fmt=fmt)
        back = ffio.read(spark, p)
        assert back.count() == 2
        assert set(back.columns) == {"id", "k"}


def test_read_jsonl_alias(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, k string")
    p = str(tmp_path / "corpus.jsonl")
    df.coalesce(1).write.json(p)
    back = ffio.read(spark, p)
    assert back.count() == 2
    assert set(back.columns) == {"id", "k"}


def test_read_raw_text(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("first line\nsecond line\nthird line\n")
    back = ffio.read(spark, str(p))
    assert back.columns == ["value"]
    assert back.count() == 3
    assert {r["value"] for r in back.collect()} == {
        "first line", "second line", "third line",
    }


def test_read_compressed_suffix_dispatches_on_inner_extension(spark, tmp_path):
    import gzip

    p = tmp_path / "corpus.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write('{"id": 1, "k": "a"}\n{"id": 2, "k": "b"}\n')
    back = ffio.read(spark, str(p))
    assert back.count() == 2
    assert set(back.columns) == {"id", "k"}

    t = tmp_path / "lines.txt.gz"
    with gzip.open(t, "wt") as f:
        f.write("x\ny\n")
    assert ffio.read(spark, str(t)).count() == 2


def test_read_unknown_extension_raises(spark):
    with pytest.raises(ff.UnsupportedFormatError):
        ffio.read(spark, "/tmp/file.xlsx")


def test_read_min_partitions_fans_out_small_scan(spark, tmp_path):
    # a table that fits one row group arrives as ONE split; min_partitions
    # must fan it out so per-row work parallelizes (and must not shrink a
    # scan that already has enough splits)
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2).coalesce(1)
    p = str(tmp_path / "small.parquet")
    ffio.write(df, p, fmt="parquet")
    base = ffio.read(spark, p).rdd.getNumPartitions()
    fanned = ffio.read(spark, p, min_partitions=base + 7)
    assert fanned.rdd.getNumPartitions() == base + 7
    assert fanned.count() == 1000
    # floor already met -> no repartition inserted
    assert ffio.read(spark, p, min_partitions=1).rdd.getNumPartitions() == base


def test_write_partitioned(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id bigint, k string")
    p = str(tmp_path / "part")
    ffio.write(df, p, partition_by=["k"])
    import os

    assert sorted(d for d in os.listdir(p) if d.startswith("k=")) == ["k=a", "k=b"]
    # partition filter prunes to one directory
    back = spark.read.parquet(p).where(F.col("k") == "a")
    assert back.count() == 2


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 1000).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("x")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("key"), (F.col("id") % 5).alias("y")
    )
    ffio.write_bucketed(left, "t_left", 4, ["key"], sort_cols=["key"])
    ffio.write_bucketed(right, "t_right", 4, ["key"], sort_cols=["key"])
    joined = spark.table("t_left").join(spark.table("t_right"), "key")
    # force sort-merge join path (no broadcast) to exercise co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        r = plan_report(joined)
        assert r["exchanges"] == 0, r["plan"]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")


def test_bare_or_columnar_compressed_files_raise_clearly(spark, tmp_path):
    import gzip

    for name in ("corpus.gz", "data.parquet.gz"):
        p = tmp_path / name
        with gzip.open(p, "wt") as f:
            f.write("not a table\n")
        with pytest.raises(ff.UnsupportedFormatError):
            ffio.read(spark, str(p))


def test_write_sort_within_partitions_tightens_row_group_stats(spark, tmp_path):
    import pyarrow.parquet as pq

    df = spark.range(0, 10000).selectExpr(
        "id", "cast(hash(id) % 1000 AS bigint) AS k"
    ).repartition(2)
    sorted_p = str(tmp_path / "sorted.parquet")
    ffio.write(df, sorted_p, sort_within_partitions=["k"])

    # rows inside each written file are ordered by k, so each file's
    # row-group k-min/max stats cover a tight, disjoint-ish range —
    # verify the written order directly (stats follow the data)
    import glob

    for f in glob.glob(f"{sorted_p}/*.parquet"):
        ks = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks), f
    back = ffio.read(spark, sorted_p)
    assert back.count() == 10000


def test_write_sorted_with_partition_by_keeps_key_order(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    df = spark.range(0, 8000).selectExpr(
        "id", "id % 4 AS part", "cast(hash(id) % 997 AS bigint) AS k"
    ).repartition(2)
    p = str(tmp_path / "part_sorted.parquet")
    ffio.write(df, p, partition_by=["part"], sort_within_partitions=["k"])
    files = glob.glob(f"{p}/part=*/**/*.parquet", recursive=True) + glob.glob(
        f"{p}/part=*/*.parquet"
    )
    assert files
    for f in set(files):
        ks = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks), f


def test_compact_to_reduces_file_count_and_preserves_rows(spark, tmp_path):
    import glob

    df = spark.range(0, 5000).selectExpr("id", "id % 3 AS part")
    frag = str(tmp_path / "fragmented.parquet")
    # simulate incremental-append fragmentation: 50 tiny files
    df.repartition(50).write.parquet(frag)
    assert len(glob.glob(f"{frag}/*.parquet")) == 50

    dest = str(tmp_path / "compacted.parquet")
    rows = ffio.compact_to(spark, frag, dest, target_records_per_file=2500)
    assert rows == 5000
    # 2 balanced tasks; hash imbalance may split one over the
    # maxRecordsPerFile cap — far fewer files than the 50 inputs, and
    # none above the target size
    import pyarrow.parquet as pq

    files = glob.glob(f"{dest}/*.parquet")
    assert 2 <= len(files) <= 4
    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= 2500
    assert ffio.read(spark, dest).count() == 5000


def test_compact_to_partitioned_writes_one_file_per_value(spark, tmp_path):
    import glob

    df = spark.range(0, 3000).selectExpr("id", "id % 3 AS part")
    frag = str(tmp_path / "frag2.parquet")
    df.repartition(30).write.parquet(frag)
    dest = str(tmp_path / "comp2.parquet")
    ffio.compact_to(
        spark, frag, dest, target_records_per_file=1000, partition_by=["part"]
    )
    for p in glob.glob(f"{dest}/part=*"):
        assert len(glob.glob(f"{p}/*.parquet")) <= 3, p
    assert ffio.read(spark, dest).count() == 3000


def test_compact_to_bounds_file_size_under_partition_skew(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    # one partition value holds ALL rows: hash-clustering on the
    # partition column gives one writer task, but maxRecordsPerFile
    # must still split its output into target-sized files
    df = spark.range(0, 4000).selectExpr("id", "0 AS part")
    frag = str(tmp_path / "skew.parquet")
    df.repartition(16).write.parquet(frag)
    dest = str(tmp_path / "skew_out.parquet")
    ffio.compact_to(
        spark, frag, dest, target_records_per_file=1000, partition_by=["part"]
    )
    files = glob.glob(f"{dest}/part=0/*.parquet")
    assert len(files) >= 4
    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= 1000, f


def test_compact_to_writer_options_reach_the_writer(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    frag = str(tmp_path / "wo.parquet")
    spark.range(100).repartition(4).write.parquet(frag)
    dest = str(tmp_path / "wo_out.parquet")
    ffio.compact_to(
        spark, frag, dest, target_records_per_file=100,
        writer_options={"compression": "gzip"},
    )
    f = glob.glob(f"{dest}/*.parquet")[0]
    assert pq.ParquetFile(f).metadata.row_group(0).column(0).compression == "GZIP"


def test_compact_to_rejects_unwritable_format_before_scanning(spark):
    with pytest.raises(ff.UnsupportedFormatError):
        ffio.compact_to(spark, "/nonexistent", "/tmp/x", 100, fmt="jsonl")


def test_read_binary_files_feed_multimodal_extractor(spark, tmp_path):
    media = tmp_path / "media"
    media.mkdir()
    (media / "a.png").write_bytes(b"\x89PNG fake image payload")
    (media / "b.png").write_bytes(b"\x89PNG other payload bytes!")
    (media / "skip.txt").write_text("not media")

    df = ffio.read(
        spark, str(media), fmt="binaryFile", pathGlobFilter="*.png"
    )
    assert df.count() == 2
    assert "content" in df.columns and "path" in df.columns

    out = ff.BinaryFeatureExtractor("content").transform(df)
    feats = {r["path"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert feats["a.png"]["content_payload_len"] == 23


class TestReadMedia:
    def test_image_audio_video_ingestion(self, spark, tmp_path):
        from feature_factory_spark.operators import constant_wav, solid_png, synth_mp4
        from feature_factory_spark.sources import read_media

        d = tmp_path / "media"
        d.mkdir()
        (d / "a.png").write_bytes(solid_png(4, 3, 77))
        (d / "b.png").write_bytes(solid_png(2, 2, 200))
        (d / "c.wav").write_bytes(constant_wav(80, 0.5))
        (d / "d.mp4").write_bytes(synth_mp4(2.0, 320, 240))

        imgs = read_media(spark, str(d), media="image", pathGlobFilter="*.png")
        got = {r["media_width"]: r["media_mean"] for r in imgs.collect()}
        assert got == {4: 77.0, 2: 200.0}

        wavs = read_media(spark, str(d), media="audio", pathGlobFilter="*.wav")
        row = wavs.collect()[0]
        assert row["media_n_frames"] == 80 and row["media_zero_crossing_rate"] == 0.0

        vids = read_media(spark, str(d), media="video", pathGlobFilter="*.mp4")
        row = vids.collect()[0]
        assert row["media_duration_s"] == 2.0 and row["media_width"] == 320.0

        # mixed directory without a glob: wrong-format files -> NULLs
        all_as_img = read_media(spark, str(d), media="image")
        assert all_as_img.where("media_format IS NULL").count() == 2

    def test_unknown_media_kind_rejected(self, spark, tmp_path):
        from feature_factory_spark.exceptions import UnsupportedFormatError
        from feature_factory_spark.sources import read_media

        with pytest.raises(UnsupportedFormatError, match="media kind"):
            read_media(spark, str(tmp_path), media="hologram")
