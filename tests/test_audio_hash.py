"""Perceptual audio fingerprinting + near-dup audio detection
(operators/audiohash.py) — fingerprint math, robustness, the Spark
seam, and the planted near-dup pair oracle design the entry member
uses (the test_image_hash.py twin)."""

import hashlib

import numpy as np
import pytest

import feature_factory_spark as ff
from feature_factory_spark.operators.audiocodec import constant_wav, encode_wav
from feature_factory_spark.operators.audiohash import (
    audio_fingerprint_bits,
    band_energies,
    decode_samples,
    pattern_wav,
)


def _signed(p: int) -> int:
    return p - (1 << 64) if p >= (1 << 63) else p


@pytest.mark.parametrize("pattern", [
    0, 0xFFFFFFFFFFFFFFFF, 0xDEADBEEFCAFEF00D, 0x8000000000000001,
])
def test_fingerprint_recovers_planted_pattern(pattern):
    # pattern_wav is constructed so decode -> frame -> rFFT -> band
    # energy -> sign chain yields EXACTLY the pattern
    mono, sr = decode_samples(pattern_wav(pattern))
    assert audio_fingerprint_bits(mono, sr) == _signed(pattern)


def test_fingerprint_gain_invariant():
    mono, sr = decode_samples(pattern_wav(0x123456789ABCDEF0))
    ref = audio_fingerprint_bits(mono, sr)
    for gain in (0.25, 0.5, 2.0):
        m2, _ = decode_samples(encode_wav(np.clip(mono * gain, -1, 1), sr))
        assert audio_fingerprint_bits(m2, sr) == ref


def test_fingerprint_requantization_invariant():
    mono, sr = decode_samples(pattern_wav(0xCAFEF00DDEADBEEF))
    ref = audio_fingerprint_bits(mono, sr)
    for bits in (8, 32):
        m2, _ = decode_samples(encode_wav(mono, sr, bits=bits))
        assert audio_fingerprint_bits(m2, sr) == ref


def test_fingerprint_frame_length_scales_with_rate():
    # same tones-at-band-fraction content at a twice-as-long frame
    # length keeps the band layout (bins scale with frame_len)
    p = 0x0F0F0F0F0F0F0F0F
    mono, sr = decode_samples(pattern_wav(p, frame_len=512))
    assert audio_fingerprint_bits(mono, sr) == _signed(p)


def test_fingerprint_edges():
    # too short to frame -> None; silence -> all-ties -> 0
    assert audio_fingerprint_bits(np.zeros(10), 8000) is None
    assert audio_fingerprint_bits(np.zeros(17 * 256), 8000) == 0
    # constant nonzero DC still hashes (DC band excluded, ties -> 0)
    mono, sr = decode_samples(constant_wav(17 * 256, 0.5))
    assert audio_fingerprint_bits(mono, sr) == 0


def test_band_energies_shape_and_none():
    mono, sr = decode_samples(pattern_wav(0))
    e = band_energies(mono, sr)
    assert e.shape == (17, 4)
    assert band_energies(np.zeros(20), 8000) is None


def test_decode_samples_leniency():
    assert decode_samples(b"") is None
    assert decode_samples(b"not audio at all") is None
    assert decode_samples(b"RIFF\x00\x00\x00\x00WAVEjunk") is None
    mono, sr = decode_samples(constant_wav(160, 0.25, sample_rate=16000))
    assert sr == 16000 and mono.shape == (160,)


# --- the planted-group fixture the entry member (audio_dedup) uses ----

def group_patterns(g: int):
    """Base pattern + nested flip positions for group g, from md5 —
    deterministic in any engine (the imagehash group_patterns twin,
    distinct salt). Members 0/1/2 are within hamming 2 of each other;
    member 3 (all bits flipped) is >= 62 from all."""
    hx = hashlib.md5(f"ffaud-{g}".encode()).hexdigest()
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
        (i, pattern_wav(group_patterns(i // 4)[i % 4]))
        for i in range(n_docs)
    ]


def expected_pairs(n_docs: int):
    out = set()
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            if a // 4 == b // 4 and a % 4 <= 2 and b % 4 <= 2:
                out.add((a, b, b % 4 - a % 4))
    return out


def test_audio_hasher_spark(spark):
    rows = planted_rows(8) + [(100, None), (101, b"not audio")]
    df = spark.createDataFrame(rows, "doc_id bigint, wav binary")
    out = ff.AudioHasher("wav").transform(df)
    got = {r["doc_id"]: r["wav_afp"] for r in out.collect()}
    for i in range(8):
        assert got[i] == _signed(group_patterns(i // 4)[i % 4])
    # NULL payload and undecodable bytes -> NULL hash, rows survive
    assert got[100] is None and got[101] is None
    # narrow plan: no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_audio_dedup_pairs_match_planted(spark):
    n = 16
    df = spark.createDataFrame(planted_rows(n), "doc_id bigint, wav binary")
    op = ff.AudioDeduplicator("doc_id", binary_col="wav", hamming_threshold=2)
    got = {(r["a_id"], r["b_id"], r["hamming"])
           for r in op.candidate_pairs(df).collect()}
    assert got == expected_pairs(n)
    survivors = {r["doc_id"] for r in op.transform(df).collect()}
    assert survivors == {i for i in range(n) if i % 4 in (0, 3)}


def test_audio_dedup_hash_col_reuse_matches_binary_path(spark):
    n = 8
    df = spark.createDataFrame(planted_rows(n), "doc_id bigint, wav binary")
    hashed = ff.AudioHasher("wav").transform(df)
    via_hash = ff.AudioDeduplicator(
        "doc_id", hash_col="wav_afp", hamming_threshold=2
    ).candidate_pairs(hashed)
    via_bytes = ff.AudioDeduplicator(
        "doc_id", binary_col="wav", hamming_threshold=2
    ).candidate_pairs(df)
    assert {tuple(r) for r in via_hash.collect()} == \
           {tuple(r) for r in via_bytes.collect()}


def test_audio_dedup_param_validation():
    with pytest.raises(Exception):
        ff.AudioDeduplicator("id")  # neither column
    with pytest.raises(Exception):
        ff.AudioDeduplicator("id", binary_col="b", hash_col="h")  # both
    with pytest.raises(Exception):
        ff.AudioHasher("wav", n_frames=1)
    with pytest.raises(Exception):
        ff.AudioHasher("wav", n_frames=18)  # 17*4 > 68 bits


def test_audio_incremental_index(spark, tmp_path):
    # audio gets the same recrawl surface as text/images
    # (HammingIndexMixin): index the old snapshot, dedupe a new one
    old = spark.createDataFrame(planted_rows(8), "doc_id bigint, wav binary")
    new = spark.createDataFrame(
        [(100, pattern_wav(group_patterns(0)[0])),
         (101, pattern_wav(group_patterns(1)[1])),
         (102, pattern_wav(group_patterns(50)[0]))],
        "doc_id bigint, wav binary",
    )
    op = ff.AudioDeduplicator("doc_id", binary_col="wav",
                              hamming_threshold=2, index_buckets=4)
    path = str(tmp_path / "audidx")
    op.write_index(old, path)
    survivors = {r["doc_id"] for r in op.dedupe_against(new, path).collect()}
    assert survivors == {102}
    pairs = {(r["a_id"], r["b_id"]): r["hamming"]
             for r in op.pairs_against(new, path).collect()}
    assert pairs[(0, 100)] == 0 and pairs[(5, 101)] == 0
    # param pinning across kinds: an image op cannot probe an audio index
    with pytest.raises(Exception, match="kind"):
        ff.ImageDeduplicator(
            "doc_id", hash_col="h"
        ).pairs_against(
            spark.createDataFrame([(1, 5)], "doc_id bigint, h bigint"), path
        ).collect()
