"""Perceptual image hashing + near-dup image detection
(operators/imagehash.py) — hash math, the Spark seam, and the planted
near-dup pair oracle design the entry member uses."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.operators.imagecodec import encode_png, solid_png
from feature_factory_spark.operators.imagehash import (
    area_resize,
    decode_pixels,
    dhash_bits,
    pack_bits,
    pattern_png,
    phash_bits,
    to_gray,
)
from feature_factory_spark.operators.jpegcodec import solid_jpeg


def test_area_resize_exact_block_means():
    g = np.repeat(np.repeat(np.arange(72).reshape(8, 9), 2, 0), 2, 1)
    assert np.allclose(area_resize(g.astype(float), 9, 8),
                       np.arange(72).reshape(8, 9))


def test_area_resize_fractional_preserves_mean():
    g = np.random.RandomState(0).rand(17, 13)
    assert abs(area_resize(g, 5, 7).mean() - g.mean()) < 1e-9


def test_pack_bits_signed_convention():
    bits = np.zeros(64, dtype=bool)
    bits[63] = True
    assert pack_bits(bits) == -(1 << 63)
    bits[0] = True
    assert pack_bits(bits) == -(1 << 63) + 1


@pytest.mark.parametrize("pattern", [
    0, 0xFFFFFFFFFFFFFFFF, 0xDEADBEEFCAFEF00D, 0x8000000000000001,
])
def test_dhash_recovers_planted_pattern(pattern):
    # pattern_png is constructed so the decode -> area-resize ->
    # gradient-sign chain yields EXACTLY the pattern
    px = decode_pixels(pattern_png(pattern))
    assert px.shape == (16, 18, 1)
    expected = pattern - (1 << 64) if pattern >= (1 << 63) else pattern
    assert dhash_bits(px) == expected


def test_dhash_brightness_invariant():
    px = decode_pixels(pattern_png(0x123456789ABCDEF0))
    shifted = np.clip(px.astype(int) + 30, 0, 255).astype(np.uint8)
    assert dhash_bits(px) == dhash_bits(shifted)


def test_phash_deterministic_and_brightness_robust():
    px = decode_pixels(pattern_png(0xDEADBEEFCAFEF00D))
    p1 = phash_bits(px)
    assert p1 == phash_bits(px)
    brighter = np.clip(px.astype(int) + 40, 0, 255).astype(np.uint8)
    assert p1 == phash_bits(brighter)
    # a different structure hashes differently
    assert p1 != phash_bits(decode_pixels(pattern_png(0x0F0F0F0F0F0F0F0F)))


def test_decode_pixels_formats_and_leniency():
    assert decode_pixels(solid_png(4, 3, 200)).shape == (3, 4, 1)
    jp = decode_pixels(solid_jpeg(8, 8, 100))
    assert jp is not None and jp.shape == (8, 8, 1)
    assert decode_pixels(b"not an image") is None
    assert decode_pixels(b"") is None


def test_to_gray_luma():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[..., 0] = 255  # pure red
    assert np.allclose(to_gray(rgb), 255 * 0.299)
    gray2 = np.full((2, 2), 7, dtype=np.uint8)
    assert np.allclose(to_gray(gray2), 7.0)


# --- the planted-group fixture the entry member (image_dedup) uses ----

def group_patterns(g: int):
    """Base pattern + nested flip positions for group g, from md5 —
    deterministic in any engine. Members 0/1/2 are within hamming 2 of
    each other; member 3 (all bits flipped) is >= 62 from all."""
    hx = hashlib.md5(f"ffimg-{g}".encode()).hexdigest()
    p = int(hx[:16], 16)
    q0 = int(hx[16:18], 16) % 64
    q1 = (q0 + 1 + int(hx[18:20], 16) % 63) % 64
    return [
        p,
        p ^ (1 << q0),
        p ^ (1 << q0) ^ (1 << q1),
        p ^ 0xFFFFFFFFFFFFFFFF,
    ]


def planted_rows(n_docs: int):
    return [
        (i, pattern_png(group_patterns(i // 4)[i % 4]))
        for i in range(n_docs)
    ]


def expected_pairs(n_docs: int):
    out = set()
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            if a // 4 == b // 4 and a % 4 <= 2 and b % 4 <= 2:
                out.add((a, b, b % 4 - a % 4))
    return out


def test_image_hasher_spark(spark):
    rows = planted_rows(8) + [(100, None), (101, b"not an image")]
    df = spark.createDataFrame(rows, "doc_id bigint, img binary")
    out = ff.ImageHasher("img", methods=["dhash", "phash"]).transform(df)
    got = {r["doc_id"]: (r["img_dhash"], r["img_phash"]) for r in out.collect()}
    for i in range(8):
        pat = group_patterns(i // 4)[i % 4]
        exp = pat - (1 << 64) if pat >= (1 << 63) else pat
        assert got[i][0] == exp
        assert got[i][1] is not None
    # NULL payload and undecodable bytes -> NULL hashes, rows survive
    assert got[100] == (None, None) and got[101] == (None, None)
    # narrow plan: no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_image_dedup_pairs_match_planted(spark):
    n = 24
    df = spark.createDataFrame(planted_rows(n), "doc_id bigint, img binary")
    op = ff.ImageDeduplicator("doc_id", binary_col="img", hamming_threshold=2)
    got = {(r["a_id"], r["b_id"], r["hamming"])
           for r in op.candidate_pairs(df).collect()}
    assert got == expected_pairs(n)
    # greedy transform keeps the min member of each near-dup trio, the
    # outlier member 3, and the undecodable rows
    survivors = {r["doc_id"] for r in op.transform(df).collect()}
    assert survivors == {i for i in range(n) if i % 4 in (0, 3)}


def test_image_dedup_hash_col_reuse_matches_binary_path(spark):
    n = 12
    df = spark.createDataFrame(planted_rows(n), "doc_id bigint, img binary")
    hashed = ff.ImageHasher("img").transform(df)
    via_hash = ff.ImageDeduplicator(
        "doc_id", hash_col="img_dhash", hamming_threshold=2
    ).candidate_pairs(hashed)
    via_bytes = ff.ImageDeduplicator(
        "doc_id", binary_col="img", hamming_threshold=2
    ).candidate_pairs(df)
    assert {tuple(r) for r in via_hash.collect()} == \
           {tuple(r) for r in via_bytes.collect()}


def test_image_dedup_components_policy(spark):
    n = 8
    df = spark.createDataFrame(planted_rows(n), "doc_id bigint, img binary")
    op = ff.ImageDeduplicator(
        "doc_id", binary_col="img", hamming_threshold=2, policy="components"
    )
    survivors = {r["doc_id"] for r in op.transform(df).collect()}
    assert survivors == {0, 3, 4, 7}


def test_image_dedup_param_validation():
    with pytest.raises(Exception):
        ff.ImageDeduplicator("id")  # neither column
    with pytest.raises(Exception):
        ff.ImageDeduplicator("id", binary_col="b", hash_col="h")  # both
    with pytest.raises(Exception):
        ff.ImageHasher("img", methods=["nope"])


def test_image_incremental_index(spark, tmp_path):
    # images get the same recrawl surface as text (HammingIndexMixin):
    # index the old snapshot's hashes, dedupe a new snapshot against it
    old = spark.createDataFrame(planted_rows(8), "doc_id bigint, img binary")
    # new snapshot: 100+101 re-encode old images 0 and 5 (same pattern
    # -> hamming 0), 102 is a fresh group's image
    new = spark.createDataFrame(
        [(100, pattern_png(group_patterns(0)[0])),
         (101, pattern_png(group_patterns(1)[1])),
         (102, pattern_png(group_patterns(50)[0]))],
        "doc_id bigint, img binary",
    )
    op = ff.ImageDeduplicator("doc_id", binary_col="img",
                              hamming_threshold=2, index_buckets=4)
    path = str(tmp_path / "imgidx")
    op.write_index(old, path)
    survivors = {r["doc_id"]
                 for r in op.dedupe_against(new, path).collect()}
    assert survivors == {102}
    pairs = {(r["a_id"], r["b_id"]): r["hamming"]
             for r in op.pairs_against(new, path).collect()}
    assert pairs[(0, 100)] == 0 and pairs[(5, 101)] == 0
    # param pinning across kinds: a simhash op cannot probe an image index
    with pytest.raises(Exception, match="kind"):
        ff.SimHashDeduplicator("t", "doc_id").pairs_against(
            spark.createDataFrame([(1, "x")], "doc_id bigint, t string"),
            path,
        ).collect()
