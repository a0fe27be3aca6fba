"""Fuzz the lenient decoder seams: random, truncated, and
magic-prefixed garbage must yield NULL features ({}), never an
exception — one corrupt blob cannot be allowed to fail a 100 TB scan
task (the contract every BinaryFeatureExtractor decoder relies on)."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feature_factory_spark.operators.audiocodec import audio_decoder, wav_decoder
from feature_factory_spark.operators.imagecodec import image_decoder
from feature_factory_spark.operators.audiocodec import audio_quality_decoder
from feature_factory_spark.operators.pdfcodec import (
    pdf_decoder,
    pdf_full_decoder,
    pdf_text_decoder,
)
from feature_factory_spark.operators.videocodec import mp4_decoder

MAGICS = [
    b"", b"\x89PNG\r\n\x1a\n", b"BM", b"P5", b"P6", b"\xff\xd8\xff",
    b"GIF89a", b"GIF87a", b"RIFF", b"RIFF\x00\x00\x00\x00WEBP",
    b"RIFF\x00\x00\x00\x00WAVE", b"fLaC", b"ID3", b"\xff\xfb",
    b"\x00\x00\x00\x18ftyp", b"%PDF-", b"%PDF-1.4\n",
]


@given(
    prefix=st.sampled_from(MAGICS),
    body=st.binary(min_size=0, max_size=200),
)
@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_lenient_seams_never_raise(prefix, body):
    payload = prefix + body
    for seam in (image_decoder, audio_decoder, wav_decoder, mp4_decoder,
                 pdf_decoder, pdf_text_decoder, pdf_full_decoder,
                 audio_quality_decoder):
        out = seam(payload)
        assert isinstance(out, dict)


@given(seed=st.integers(0, 2**31 - 1), n=st.integers(0, 400))
@settings(max_examples=100, deadline=None)
def test_truncations_of_valid_payloads_never_raise(seed, n):
    # every prefix of a VALID artifact must degrade to {} or a dict,
    # never an exception (truncated uploads are the common corruption)
    from feature_factory_spark.operators.audiocodec import constant_wav, make_mp3
    from feature_factory_spark.operators.imagecodec import solid_png
    from feature_factory_spark.operators.jpegcodec import solid_jpeg

    r = np.random.RandomState(seed)
    artifacts = [
        solid_png(6, 4, int(r.randint(256))),
        solid_jpeg(9, 7, int(r.randint(256))),
        constant_wav(50, float(r.rand())),
        make_mp3(3, id3_size=int(r.randint(0, 200))),
    ]
    from feature_factory_spark.operators.pdfcodec import make_pdf

    artifacts.append(make_pdf(int(r.randint(1, 9))))
    artifacts.append(make_pdf(
        2, page_texts=["alpha (x)", "beta \\ y"],
        compress=bool(r.randint(2)),
    ))
    for a in artifacts:
        cut = a[: min(n, len(a))]
        for seam in (image_decoder, audio_decoder, pdf_decoder,
                     pdf_text_decoder, pdf_full_decoder,
                     audio_quality_decoder):
            assert isinstance(seam(cut), dict)


@given(
    prefix=st.sampled_from(MAGICS),
    body=st.binary(min_size=0, max_size=200),
)
@settings(max_examples=200, deadline=None)
def test_hash_seams_never_raise(prefix, body):
    # the r8 perceptual-hash seams share the contract: garbage in ->
    # None out (NULL signature), never an exception
    from feature_factory_spark.operators.audiohash import decode_samples
    from feature_factory_spark.operators.imagehash import decode_pixels
    from feature_factory_spark.operators.videohash import extract_frames

    payload = prefix + body
    px = decode_pixels(payload)
    assert px is None or px.ndim == 3
    pcm = decode_samples(payload)
    assert pcm is None or len(pcm) == 2
    frames = extract_frames(payload)
    assert isinstance(frames, list)


@given(seed=st.integers(0, 2**31 - 1), n=st.integers(0, 600))
@settings(max_examples=100, deadline=None)
def test_truncated_fixture_media_never_raise_hash_seams(seed, n):
    from feature_factory_spark.operators.audiohash import (
        decode_samples, pattern_wav,
    )
    from feature_factory_spark.operators.imagehash import (
        decode_pixels, pattern_png,
    )
    from feature_factory_spark.operators.videohash import (
        extract_frames, pattern_mp4,
    )

    r = np.random.RandomState(seed)
    pat = int(r.randint(0, 2**31))
    for a, seam in (
        (pattern_png(pat), decode_pixels),
        (pattern_wav(pat, frame_len=128), decode_samples),
        (pattern_mp4(pat), extract_frames),
    ):
        out = seam(a[: min(n, len(a))])
        assert out is None or isinstance(out, (list, tuple, np.ndarray)) or out
