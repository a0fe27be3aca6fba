"""AudioQualityFilter (r9 brief item 8): clipping / silence / crest
quality gate over the real WAV decode seam — closed-form fixtures."""

import math

import numpy as np
import pytest

import feature_factory_spark as ff
from feature_factory_spark.operators.audiocodec import (
    audio_quality,
    audio_quality_decoder,
    encode_wav,
)

MID = 16384.0 / 32767.0  # how 0.5 decodes through the 16-bit quantizer


def block_wav(n_sil, n_clip, n_mid, sr=8000):
    samples = np.concatenate([
        np.zeros(n_sil), np.ones(n_clip), np.full(n_mid, 0.5)
    ])
    return encode_wav(samples, sr, 1, 16)


def test_metrics_closed_form():
    q = audio_quality(block_wav(100, 50, 200))
    n = 350
    assert q["n_samples"] == n
    assert q["silence_ratio"] == 100 / n
    assert q["clipping_ratio"] == 50 / n
    assert q["peak"] == 1.0
    expect_rms = math.sqrt((50 * 1.0 + 200 * MID * MID) / n)
    assert abs(q["rms"] - expect_rms) < 1e-12
    assert abs(q["crest_factor"] - 1.0 / expect_rms) < 1e-12
    assert q["duration_s"] == n / 8000


def test_all_silence_crest_zero():
    q = audio_quality(block_wav(300, 0, 0))
    assert q["silence_ratio"] == 1.0
    assert q["rms"] == 0.0 and q["crest_factor"] == 0.0


def test_decoder_lenient():
    assert audio_quality_decoder(b"not a wav at all") == {}
    with pytest.raises(ValueError):
        audio_quality(b"nope")


def test_thresholds_configurable():
    # clip threshold below 0.5: the mid block counts as clipped too
    q = audio_quality(block_wav(100, 50, 200), clip_threshold=0.4)
    assert q["clipping_ratio"] == 250 / 350


def test_spark_filter_keep_rule(spark):
    rows = [
        (1, block_wav(100, 0, 6000)),     # clean long audio: keep
        (2, block_wav(100, 200, 6000)),   # clipped: drop
        (3, block_wav(7000, 0, 1000)),    # mostly silence: drop
        (4, block_wav(10, 0, 100)),       # too short (<0.5 s): drop
        (5, b"corrupt bytes"),            # undecodable: drop, NULLs
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, audio binary")
    out = ff.AudioQualityFilter("audio").transform(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["audio_keep"] is True
    assert got[2]["audio_keep"] is False
    assert got[3]["audio_keep"] is False
    assert got[4]["audio_keep"] is False
    assert got[5]["audio_keep"] is False
    assert got[5]["audio_aq_rms"] is None
    assert abs(got[1]["audio_aq_silence_ratio"] - 100 / 6100) < 1e-12
    # the keep column is filterable end-to-end
    assert out.where("audio_keep").count() == 1


def test_validation():
    with pytest.raises(Exception, match="max_clipping_ratio"):
        ff.AudioQualityFilter("a", max_clipping_ratio=2.0)
    with pytest.raises(Exception, match="max_duration_s"):
        ff.AudioQualityFilter("a", min_duration_s=5, max_duration_s=1)
