"""Round-9 hardening (ADVICE r8 + VERDICT r8 'what's wrong'):
hostile stsz bounds, pagerank lineage/checkpoint/mass-check,
decode_ids byte-mode U+FFFD, write_shards single-transform +
append-merged manifest."""

import json
import os
import struct

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.operators import videocodec as vc


# --- videocodec: hostile stsz sample counts must not allocate ----------

def _hostile_stsz_mp4(n_samples: int, uniform: int) -> bytes:
    """Structurally valid MP4 whose stsz declares an absurd sample
    count — the table data itself is absent/short."""
    base = vc.synth_mp4(1.0, 8, 8, frames=[b"x" * 4, b"y" * 4])
    # patch the stsz header in place: uniform size + sample count
    i = base.find(b"stsz")
    assert i > 0
    patched = (
        base[: i + 8]
        + struct.pack(">II", uniform, n_samples)
        + base[i + 16 :]
    )
    return patched


def test_mp4_samples_bounds_declared_count():
    # 50M uniform 4-byte samples in a <1KB payload: must raise, not
    # allocate a 50M-entry list
    bad = _hostile_stsz_mp4(50_000_000, 4)
    with pytest.raises(ValueError, match="exceeding payload"):
        vc.mp4_samples(bad)
    # per-sample-table mode with an absurd count: also bounded
    bad2 = _hostile_stsz_mp4(2_000_000_000, 0)
    with pytest.raises(ValueError, match="exceeding payload"):
        vc.mp4_samples(bad2)


def test_extract_frames_degrades_to_empty_on_hostile_stsz():
    from feature_factory_spark.operators.videohash import extract_frames

    assert extract_frames(_hostile_stsz_mp4(50_000_000, 4)) == []


def test_mp4_samples_still_roundtrips_good_fixture():
    frames = [b"frame-a", b"frame-bb", b"frame-ccc"]
    assert vc.mp4_samples(vc.synth_mp4(1.0, 8, 8, frames=frames)) == frames


# --- pagerank: reliable checkpoint + rank-mass self-check --------------

def _edges(spark):
    return spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )


def test_pagerank_rank_mass_helper(spark):
    from feature_factory_spark.functions.graph import pagerank, rank_mass

    ranks = pagerank(_edges(spark), iterations=5)
    assert rank_mass(ranks) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_skip_leaks_detectable_mass(spark):
    from feature_factory_spark.functions.graph import pagerank, rank_mass

    # 'd' is dangling: skipping the per-round collect must leave a
    # measurable deficit the helper surfaces
    ranks = pagerank(_edges(spark), iterations=5, handle_dangling=False)
    assert rank_mass(ranks) < 1.0 - 1e-6


def test_pagerank_reliable_checkpoint_matches_local(spark, tmp_path):
    from feature_factory_spark.functions.graph import pagerank

    a = {r["node"]: r["rank"]
         for r in pagerank(_edges(spark), iterations=4).collect()}
    b = {r["node"]: r["rank"]
         for r in pagerank(_edges(spark), iterations=4,
                           checkpoint_dir=str(tmp_path / "ckpt")).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-12)
    # the reliable checkpoint actually landed on disk
    assert any((tmp_path / "ckpt").rglob("*"))


# --- decode_ids byte mode: unknown ids decode to U+FFFD ----------------

def test_decode_ids_byte_level_unknown_id_is_fffd(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    bpe = ff.BpeVocabBuilder(
        "text", "doc_id", num_merges=4, byte_level=True
    ).fit(df)
    withids = bpe.encode_ids(df).withColumn(
        "mangled", F.concat(F.col("text_bpe_ids"), F.array(F.lit(-1)))
    )
    dec = bpe.decode_ids(withids, ids_col="mangled", output_col="back")
    back = dec.collect()[0]["back"]
    assert back.endswith("�"), repr(back)
    assert "?" not in back


# --- write_shards: one transform, append-merged manifest ---------------

def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [(i, 10 + (i * 7) % 40) for i in range(lo, hi)],
        "doc_id bigint, n_tokens int",
    )


def _read_manifest(path):
    with open(os.path.join(path, "_manifest.json")) as f:
        return [json.loads(l) for l in f.read().splitlines() if l.strip()]


def test_write_shards_append_merges_manifest(spark, tmp_path):
    path = str(tmp_path / "shards")
    op = ff.CorpusShuffler("doc_id", docs_per_shard=64)
    op.write_shards(_docs(spark, 0, 100), path)
    first = {m["shard_id"]: m for m in _read_manifest(path)}
    op.write_shards(_docs(spark, 100, 150), path, mode="append")
    merged = {m["shard_id"]: m for m in _read_manifest(path)}
    # n_docs per shard accumulates across both batches
    assert sum(m["n_docs"] for m in merged.values()) == 150
    # every shard dir on disk is described by the merged manifest
    dirs = {
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith(f"{op.shard_col}=")
    }
    assert dirs == set(merged)
    # fingerprints merged by xor: a shard present in both batches
    # differs from its first-batch value
    both = [s for s in first if merged[s]["n_docs"] > first[s]["n_docs"]]
    assert both
    for s in both:
        assert merged[s]["id_fingerprint"] != first[s]["id_fingerprint"]
    # merged fingerprint == xor over ALL ids routed to that shard
    # across batches == first ^ (second batch's own manifest value)
    second_only = {
        m["shard_id"]: m
        for m in (
            op._manifest_from(op.transform(_docs(spark, 100, 150)))
            .collect()
        )
    }
    for s in both:
        assert merged[s]["id_fingerprint"] == (
            first[s]["id_fingerprint"] ^ second_only[s]["id_fingerprint"]
        )


def test_write_shards_overwrite_manifest_not_merged(spark, tmp_path):
    path = str(tmp_path / "shards")
    op = ff.CorpusShuffler("doc_id", docs_per_shard=64)
    op.write_shards(_docs(spark, 0, 100), path)
    op.write_shards(_docs(spark, 0, 50), path, mode="overwrite")
    assert sum(m["n_docs"] for m in _read_manifest(path)) == 50
