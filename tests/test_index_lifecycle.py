"""Index lifecycle (r9 brief item 6): compaction of accumulated
recrawl appends + the versions audit log — N appends -> compact ->
same survivors, numFiles drops, the physical pruning still works."""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff


def batch(spark, lo, hi, dup_of=None):
    rows = []
    for i in range(lo, hi):
        src = dup_of if dup_of is not None else i
        rows.append((i, f"doc body number {src} with shared words"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def appended_index(spark, tmp_path_factory):
    """An exact-dedup index built by one write + three appends."""
    path = str(tmp_path_factory.mktemp("idx") / "exact")
    op = ff.ExactDeduplicator(["text"], "doc_id", index_buckets=4)
    op.write_index(batch(spark, 0, 40), path)
    for lo in (40, 80, 120):
        op.write_index(batch(spark, lo, lo + 40), path, mode="append")
    return path, op


def test_versions_log_tracks_writes_and_appends(spark, appended_index):
    path, _ = appended_index
    vs = ff.index_versions(spark, path)
    assert [v["op"] for v in vs] == ["write", "append", "append", "append"]
    assert [v["version"] for v in vs] == [1, 2, 3, 4]


def test_compact_same_survivors_fewer_files(spark, appended_index, tmp_path):
    path, op = appended_index
    dest = str(tmp_path / "compacted")

    before = ff.audit_index(spark, path)
    written = ff.compact_index(spark, path, dest)
    after = ff.audit_index(spark, dest)

    # row counts preserved, file count drops (4 writes x 4 buckets ->
    # bounded files per bucket)
    assert written["hashes"] == before["datasets"]["hashes"]["n_rows"]
    assert (after["datasets"]["hashes"]["n_rows"]
            == before["datasets"]["hashes"]["n_rows"])
    assert (after["datasets"]["hashes"]["n_files"]
            < before["datasets"]["hashes"]["n_files"])
    # versions log restarts with a compact row carrying the row count
    assert [v["op"] for v in after["versions"]] == ["compact"]
    assert after["versions"][0]["n_rows"] == written["hashes"]

    # probes against source and compacted index agree exactly:
    # 10 dups of indexed docs + 10 new docs
    probe = batch(spark, 200, 210, dup_of=None).unionByName(
        batch(spark, 0, 10).select(
            (F.col("doc_id") + 500).alias("doc_id"), "text"
        )
    )
    a = {r["doc_id"] for r in op.dedupe_against(probe, path).collect()}
    b = {r["doc_id"] for r in op.dedupe_against(probe, dest).collect()}
    assert a == b == set(range(200, 210))


def test_compacted_index_still_prunes(spark, appended_index, tmp_path):
    path, op = appended_index
    dest = str(tmp_path / "compacted2")
    ff.compact_index(spark, path, dest)
    # parameter pinning survives the copy: a mismatched operator fails
    other = ff.ExactDeduplicator(["text"], "doc_id", index_buckets=16)
    with pytest.raises(Exception, match="n_buckets"):
        other.dedupe_against(batch(spark, 0, 5), dest).collect()


def test_compact_minhash_index_with_partition_discovery(spark, tmp_path):
    # minhash index has a two-level partition layout (band, bb) plus an
    # UNPARTITIONED shingles dataset: both must compact preserving shape
    base = " ".join(f"w{i}" for i in range(30))
    rows = [(i, base + f" tail{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    op = ff.MinHashDeduplicator("text", "doc_id", num_perm=16, bands=4,
                                index_buckets=2)
    src = str(tmp_path / "mh")
    op.write_index(df, src)
    op.write_index(
        df.select((F.col("doc_id") + 100).alias("doc_id"), "text"),
        src, mode="append",
    )
    dest = str(tmp_path / "mh_c")
    written = ff.compact_index(spark, src, dest)
    assert set(written) == {"bands", "shingles"}
    import os

    # partition dirs preserved
    assert any(d.startswith("band=") for d in os.listdir(
        os.path.join(dest, "bands")))
    # probe parity source vs compacted
    probe = spark.createDataFrame(
        [(999, base + " tail0")], "doc_id bigint, text string"
    )
    pa = {(r["a_id"], r["b_id"]) for r in
          op.pairs_against(probe, src).collect()}
    pb = {(r["a_id"], r["b_id"]) for r in
          op.pairs_against(probe, dest).collect()}
    assert pa == pb and pa


def test_audit_index_shape(spark, appended_index):
    path, _ = appended_index
    audit = ff.audit_index(spark, path)
    assert set(audit) == {"datasets", "versions"}
    assert audit["datasets"]["hashes"]["n_rows"] == 160
    assert audit["datasets"]["hashes"]["n_files"] >= 4


def test_legacy_index_without_versions_log(spark, tmp_path):
    # an index dir written before the log existed: versions -> []
    path = str(tmp_path / "legacy")
    op = ff.ExactDeduplicator(["text"], "doc_id", index_buckets=2)
    op.write_index(batch(spark, 0, 10), path)
    import shutil

    shutil.rmtree(path + "/versions")
    assert ff.index_versions(spark, path) == []
    audit = ff.audit_index(spark, path)
    assert audit["versions"] == []
    # an APPEND on the legacy index restarts the counter at 1 (the
    # one legitimate reset case) and keeps counting from there
    op.write_index(batch(spark, 10, 20), path, mode="append")
    assert [(v["version"], v["op"]) for v in
            ff.index_versions(spark, path)] == [(1, "append")]


def test_corrupt_versions_log_fails_loud_on_append(spark, tmp_path):
    # r10 verdict #1: a transient storage error / corrupt footer while
    # reading the current max version must PROPAGATE, not silently
    # restart the audit counter at 1 (which would corrupt the trail
    # compact_index/audit_index read). Only missing-path resets.
    import glob
    import os

    path = str(tmp_path / "corrupt")
    op = ff.ExactDeduplicator(["text"], "doc_id", index_buckets=2)
    op.write_index(batch(spark, 0, 10), path)
    for pq in glob.glob(os.path.join(path, "versions", "*.parquet")):
        with open(pq, "wb") as f:
            f.write(b"not a parquet footer")
    with pytest.raises(Exception) as ei:
        op.write_index(batch(spark, 10, 20), path, mode="append")
    assert "PATH_NOT_FOUND" not in str(ei.value)
    # index_versions stays loud on the same corruption
    with pytest.raises(Exception):
        ff.index_versions(spark, path)
