"""Image/VideoQualityFilter (r9): the media-quality gate matrix
completed — tracking pixels / blank images / banner strips and
zero-duration / audio-only / sub-resolution containers drop before any
expensive decode."""

import pytest

import feature_factory_spark as ff
from feature_factory_spark.operators.imagecodec import solid_png
from feature_factory_spark.operators.videocodec import synth_mp4


def checkerboard_png(w, h):
    # alternating pixels: nonzero entropy
    from feature_factory_spark.operators.imagecodec import encode_png

    rows = [[(255 if (x + y) % 2 else 0) for x in range(w)]
            for y in range(h)]
    return encode_png(rows)


def test_image_quality_gate(spark):
    rows = [
        (1, checkerboard_png(64, 64)),   # clean: keep
        (2, solid_png(64, 64, 128)),     # blank (entropy 0): drop
        (3, checkerboard_png(8, 64)),    # too narrow + aspect 8: drop
        (4, checkerboard_png(400, 40)),  # aspect 10: drop
        (5, b"not an image"),            # undecodable: drop, NULLs
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, img binary")
    out = ff.ImageQualityFilter("img", min_width=32, min_height=32,
                                max_aspect_ratio=5.0).transform(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["img_keep"] is True
    assert got[2]["img_keep"] is False
    assert got[3]["img_keep"] is False
    assert got[4]["img_keep"] is False
    assert got[5]["img_keep"] is False and got[5]["img_iq_width"] is None
    assert out.where("img_keep").count() == 1


def test_image_quality_format_allowlist(spark):
    df = spark.createDataFrame(
        [(1, checkerboard_png(64, 64))], "doc_id bigint, img binary"
    )
    op = ff.ImageQualityFilter("img", formats=("bmp",), min_entropy=0.0)
    assert op.transform(df).collect()[0]["img_keep"] is False
    op2 = ff.ImageQualityFilter("img", formats=("png", "jpeg"))
    assert op2.transform(df).collect()[0]["img_keep"] is True


def test_image_quality_validation():
    with pytest.raises(Exception, match="max_aspect_ratio"):
        ff.ImageQualityFilter("img", max_aspect_ratio=0.5)


def test_video_quality_gate(spark):
    rows = [
        (1, synth_mp4(30.0, 640, 360)),                   # keep
        (2, synth_mp4(0.2, 640, 360)),                    # too short
        (3, synth_mp4(30.0, 32, 32)),                     # sub-res
        (4, synth_mp4(30.0, 640, 360, n_audio_tracks=1)), # keep
        (5, b"junk bytes"),                               # undecodable
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, vid binary")
    out = ff.VideoQualityFilter("vid", min_duration_s=1.0,
                                min_width=64, min_height=64).transform(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["vid_keep"] is True
    assert got[2]["vid_keep"] is False
    assert got[3]["vid_keep"] is False
    assert got[4]["vid_keep"] is True
    assert got[5]["vid_keep"] is False
    assert got[5]["vid_vq_duration_s"] is None


def test_video_quality_require_audio(spark):
    rows = [
        (1, synth_mp4(30.0, 640, 360)),
        (2, synth_mp4(30.0, 640, 360, n_audio_tracks=1)),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, vid binary")
    out = ff.VideoQualityFilter(
        "vid", min_duration_s=1.0, require_audio=True
    ).transform(df)
    got = {r["doc_id"]: r["vid_keep"] for r in out.collect()}
    assert got == {1: False, 2: True}


def test_video_quality_validation():
    with pytest.raises(Exception, match="max_duration_s"):
        ff.VideoQualityFilter("vid", min_duration_s=10, max_duration_s=1)
