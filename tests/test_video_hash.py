"""Perceptual video fingerprinting + near-dup video detection
(operators/videohash.py) — sample-table demux, temporal majority
pooling, the Spark seam, and the planted near-dup pair oracle design
the entry member uses (the test_{image,audio}_hash.py triplet)."""

import hashlib

import pytest

import feature_factory_spark as ff
from feature_factory_spark.operators.imagehash import (
    decode_pixels,
    dhash_bits,
    pattern_png,
)
from feature_factory_spark.operators.videocodec import mp4_samples, synth_mp4
from feature_factory_spark.operators.videohash import (
    extract_frames,
    pattern_mp4,
    sample_evenly,
    video_fingerprint_bits,
)


def _signed(p: int) -> int:
    return p - (1 << 64) if p >= (1 << 63) else p


def test_mp4_samples_round_trip():
    frames = [b"f%d" % i * (i + 2) for i in range(6)]
    mp4 = synth_mp4(3.0, 32, 24, n_audio_tracks=1, frames=frames)
    assert mp4_samples(mp4) == frames
    # metadata-only fixtures carry no sample tables
    assert mp4_samples(synth_mp4(1.0, 8, 8)) == []
    # the audio track of this fixture has no sample tables either
    assert mp4_samples(mp4, handler=b"soun") == []
    with pytest.raises(ValueError):
        mp4_samples(b"not an mp4 at all")


def test_extract_frames_lenient():
    assert extract_frames(b"") == []
    assert extract_frames(b"garbage bytes") == []
    assert len(extract_frames(pattern_mp4(7, n_frames=4))) == 4


@pytest.mark.parametrize("pattern", [
    0, 0xFFFFFFFFFFFFFFFF, 0xDEADBEEFCAFEF00D, 0x8000000000000001,
])
def test_pattern_mp4_recovers_planted_pattern(pattern):
    # demux -> PNG decode -> dHash -> majority fold == pattern
    frames = extract_frames(pattern_mp4(pattern))
    hs = [dhash_bits(decode_pixels(f)) for f in frames]
    assert video_fingerprint_bits(hs) == _signed(pattern)


def test_majority_fold_semantics():
    a, b = 0x00FF00FF00FF00FF, 0x0F0F0F0F0F0F0F0F
    # strict majority wins; one divergent frame cannot flip the fold
    assert video_fingerprint_bits([a, a, b]) == a
    # even split: disagreeing bits -> 0 (deterministic tie rule)
    assert video_fingerprint_bits([a, b]) == _signed(a & b)
    assert video_fingerprint_bits([]) is None
    # None frame hashes are skipped, not counted
    assert video_fingerprint_bits([None, a]) == a


def test_sample_evenly():
    assert sample_evenly(list(range(10)), 4) == [0, 2, 5, 7]
    assert sample_evenly([1, 2], 4) == [1, 2]
    assert sample_evenly([], 4) == []


# --- the planted-group fixture the entry member (video_dedup) uses ----

def group_patterns(g: int):
    """Base pattern + nested flip positions for group g, from md5 —
    deterministic in any engine (the imagehash/audiohash twin,
    distinct salt 'ffvid-')."""
    hx = hashlib.md5(f"ffvid-{g}".encode()).hexdigest()
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
        (i, pattern_mp4(group_patterns(i // 4)[i % 4]))
        for i in range(n_docs)
    ]


def expected_pairs(n_docs: int):
    out = set()
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            if a // 4 == b // 4 and a % 4 <= 2 and b % 4 <= 2:
                out.add((a, b, b % 4 - a % 4))
    return out


def test_video_hasher_spark(spark):
    rows = planted_rows(8) + [(100, None), (101, b"not a video"),
                              (102, synth_mp4(1.0, 8, 8))]  # no samples
    df = spark.createDataFrame(rows, "doc_id bigint, vid binary")
    out = ff.VideoHasher("vid").transform(df)
    got = {r["doc_id"]: r["vid_vhash"] for r in out.collect()}
    for i in range(8):
        assert got[i] == _signed(group_patterns(i // 4)[i % 4])
    # NULL / undecodable / sample-table-free -> NULL hash, rows survive
    assert got[100] is None and got[101] is None and got[102] is None
    # narrow plan: no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_video_dedup_pairs_match_planted(spark):
    n = 16
    df = spark.createDataFrame(planted_rows(n), "doc_id bigint, vid binary")
    op = ff.VideoDeduplicator("doc_id", binary_col="vid", hamming_threshold=2)
    got = {(r["a_id"], r["b_id"], r["hamming"])
           for r in op.candidate_pairs(df).collect()}
    assert got == expected_pairs(n)
    survivors = {r["doc_id"] for r in op.transform(df).collect()}
    assert survivors == {i for i in range(n) if i % 4 in (0, 3)}


def test_video_dedup_divergent_frame_still_pairs(spark):
    # a video that re-encodes another but diverges in ONE of its three
    # frames keeps its majority signature -> hamming 0 pair
    p = group_patterns(9)[0]
    from feature_factory_spark.operators.videocodec import synth_mp4 as sm
    base = pattern_mp4(p)
    frames = [pattern_png(p), pattern_png(p),
              pattern_png(p ^ 0xFFFFFFFFFFFFFFFF)]
    variant = sm(3.0, 18, 16, frames=frames)
    df = spark.createDataFrame(
        [(1, base), (2, variant)], "doc_id bigint, vid binary"
    )
    op = ff.VideoDeduplicator("doc_id", binary_col="vid", hamming_threshold=2)
    pairs = [(r["a_id"], r["b_id"], r["hamming"])
             for r in op.candidate_pairs(df).collect()]
    assert pairs == [(1, 2, 0)]


def test_video_dedup_hash_col_reuse_matches_binary_path(spark):
    n = 8
    df = spark.createDataFrame(planted_rows(n), "doc_id bigint, vid binary")
    hashed = ff.VideoHasher("vid").transform(df)
    via_hash = ff.VideoDeduplicator(
        "doc_id", hash_col="vid_vhash", hamming_threshold=2
    ).candidate_pairs(hashed)
    via_bytes = ff.VideoDeduplicator(
        "doc_id", binary_col="vid", hamming_threshold=2
    ).candidate_pairs(df)
    assert {tuple(r) for r in via_hash.collect()} == \
           {tuple(r) for r in via_bytes.collect()}


def test_video_dedup_param_validation():
    with pytest.raises(Exception):
        ff.VideoDeduplicator("id")  # neither column
    with pytest.raises(Exception):
        ff.VideoDeduplicator("id", binary_col="b", hash_col="h")  # both
    with pytest.raises(Exception):
        ff.VideoHasher("vid", n_frames=0)
    with pytest.raises(Exception):
        ff.VideoHasher("vid", method="nope")


def test_video_incremental_index(spark, tmp_path):
    # video gets the same recrawl surface as text/images/audio
    old = spark.createDataFrame(planted_rows(8), "doc_id bigint, vid binary")
    new = spark.createDataFrame(
        [(100, pattern_mp4(group_patterns(0)[0])),
         (101, pattern_mp4(group_patterns(50)[0]))],
        "doc_id bigint, vid binary",
    )
    op = ff.VideoDeduplicator("doc_id", binary_col="vid",
                              hamming_threshold=2, index_buckets=4)
    path = str(tmp_path / "vididx")
    op.write_index(old, path)
    survivors = {r["doc_id"] for r in op.dedupe_against(new, path).collect()}
    assert survivors == {101}
    # param pinning across kinds: an audio op cannot probe a video index
    with pytest.raises(Exception, match="kind"):
        ff.AudioDeduplicator("doc_id", hash_col="h").pairs_against(
            spark.createDataFrame([(1, 5)], "doc_id bigint, h bigint"), path
        ).collect()
