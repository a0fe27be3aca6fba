"""Video-container probing (operators/videocodec.py): ISO BMFF box
walking recovers duration/dims/track shape exactly; lenient seam; Spark
integration — completing the image/audio/video multimodal triad."""

import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import feature_factory_spark as ff
from feature_factory_spark.operators import videocodec as vc


def test_probe_recovers_fixture_exactly():
    d = vc.probe_mp4(vc.synth_mp4(12.5, 640, 360, n_audio_tracks=1))
    assert d["duration_s"] == 12.5
    assert (d["width"], d["height"]) == (640.0, 360.0)
    assert d["n_tracks"] == 2 and d["has_video"] and d["has_audio"]
    assert d["brand"] == "isom"
    assert "avc1" in d["codecs"] and "mp4a" in d["codecs"]


def test_video_only_and_mvhd_v1():
    d = vc.probe_mp4(vc.synth_mp4(3.25, 1920, 1080))
    assert d["n_tracks"] == 1 and d["has_video"] and not d["has_audio"]

    # handmade mvhd version 1 (64-bit duration)
    mvhd1 = vc._full(
        b"mvhd", 1,
        struct.pack(">QQ", 0, 0) + struct.pack(">IQ", 1000, 4500)
        + b"\x00" * 80,
    )
    payload = (
        vc._box(b"ftyp", b"isom" + struct.pack(">I", 512))
        + vc._box(b"moov", mvhd1)
    )
    d1 = vc.probe_mp4(payload)
    assert d1["duration_s"] == 4.5 and d1["n_tracks"] == 0


def test_malformed_payloads_fail_clean():
    good = vc.synth_mp4(1.0, 64, 64)
    # corrupt the moov SIZE field (ftyp is 24 bytes; moov size at 24:28)
    bad = good[:24] + b"\xff\xff\xff\xff" + good[28:]
    with pytest.raises(ValueError):
        vc.probe_mp4(bad)
    assert vc.mp4_decoder(bad) == {}
    assert vc.mp4_decoder(b"not video") == {}
    assert vc.mp4_decoder(b"") == {}
    with pytest.raises(ValueError, match="ftyp"):
        vc.probe_mp4(b"\x00" * 64)


@given(
    dur_ticks=st.integers(1, 10_000_000),
    w=st.integers(1, 8192),
    h=st.integers(1, 8192),
    n_audio=st.integers(0, 3),
)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_probe_roundtrip_property(dur_ticks, w, h, n_audio):
    d = vc.probe_mp4(vc.synth_mp4(dur_ticks / 1000.0, w, h, n_audio))
    assert d["duration_s"] == dur_ticks / 1000.0
    assert (d["width"], d["height"]) == (float(w), float(h))
    assert d["n_tracks"] == 1 + n_audio
    assert d["has_audio"] == (n_audio > 0)


def test_spark_binary_feature_extractor_with_mp4_decoder(spark):
    rows = [
        (1, vc.synth_mp4(10.0, 1280, 720, n_audio_tracks=1)),
        (2, vc.synth_mp4(0.5, 64, 64)),
        (3, b"not a video"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id int, mp4 binary")
    out = ff.BinaryFeatureExtractor(
        "mp4", decoder=vc.mp4_decoder, feature_schema=vc.video_schema()
    ).transform(df)
    got = {r["id"]: r.asDict() for r in out.collect()}
    assert got[1]["mp4_duration_s"] == 10.0 and got[1]["mp4_has_audio"]
    assert got[2]["mp4_width"] == 64.0 and not got[2]["mp4_has_audio"]
    assert got[3]["mp4_format"] is None
    assert got[4]["mp4_format"] is None
