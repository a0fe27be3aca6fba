"""Real audio decoding (operators/audiocodec.py): RIFF/WAVE PCM parsing
with sample-exact statistics, the lenient decoder seam, and the
Spark-side BinaryFeatureExtractor integration — the audio counterpart
of tests/test_image_codec.py."""

import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import feature_factory_spark as ff
from feature_factory_spark.operators import audiocodec as ac


def test_roundtrip_16bit_stereo():
    rng = np.random.RandomState(3)
    x = rng.uniform(-0.9, 0.9, 400)
    d = ac.decode_wav(ac.encode_wav(x, 16000, channels=2, bits=16))
    assert (d["channels"], d["sample_rate"], d["n_frames"]) == (2, 16000, 200)
    q = np.floor(x * 32767 + 0.5) / 32767.0
    assert abs(d["rms"] - float(np.sqrt(np.mean(q * q)))) < 1e-12
    assert abs(d["peak"] - float(np.max(np.abs(q)))) < 1e-12
    assert d["duration_s"] == 200 / 16000


def test_constant_fixture_closed_form():
    d = ac.decode_wav(ac.constant_wav(150, 0.25))
    a = np.floor(0.25 * 32767 + 0.5) / 32767.0
    assert d["rms"] == a == d["peak"]
    assert d["zero_crossing_rate"] == 0.0
    assert d["duration_s"] == 150 / 8000


def test_bit_depths_and_zcr():
    d8 = ac.decode_wav(ac.encode_wav(np.array([0.0, 0.5, -0.5, 1.0]), 8000, 1, 8))
    assert d8["bit_depth"] == 8 and d8["n_frames"] == 4
    d32 = ac.decode_wav(ac.encode_wav(np.array([0.1, -0.1]), 8000, 1, 32))
    assert d32["bit_depth"] == 32
    alt = np.tile([0.5, -0.5], 50)
    assert ac.decode_wav(ac.encode_wav(alt, 8000))["zero_crossing_rate"] == 1.0


def test_float_format_and_word_alignment():
    # IEEE-float WAV (format 3) with an odd-sized extra chunk before data
    x = np.array([0.5, -0.25, 0.125], dtype="<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # word-aligned
    data = x.tobytes()
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + extra + b"data" + struct.pack("<I", len(data)) + data)
    d = ac.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert d["bit_depth"] == 32 and d["n_frames"] == 3
    assert abs(d["peak"] - 0.5) < 1e-12


def test_strict_and_lenient_failure_paths():
    with pytest.raises(ValueError, match="RIFF"):
        ac.decode_wav(b"not audio at all")
    assert ac.wav_decoder(b"junk") == {}
    assert ac.wav_decoder(b"RIFF\x00\x00\x00\x00WAVEfmt ") == {}
    # compressed formats rejected loudly, not mis-decoded
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # MP3-in-WAV
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 2) + b"\x00\x00")
    with pytest.raises(ValueError, match="format 85"):
        ac.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


@given(
    n=st.integers(1, 200),
    channels=st.integers(1, 2),
    bits=st.sampled_from([8, 16, 32]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_wav_roundtrip_property(n, channels, bits, seed):
    r = np.random.RandomState(seed)
    x = r.uniform(-1.0, 1.0, n * channels)
    d = ac.decode_wav(ac.encode_wav(x, 22050, channels, bits))
    assert d["n_frames"] == n
    assert d["channels"] == channels
    assert d["bit_depth"] == bits
    assert 0.0 <= d["rms"] <= d["peak"] + 1e-12 <= 1.0 + 1e-9
    assert 0.0 <= d["zero_crossing_rate"] <= 1.0


def test_spark_binary_feature_extractor_with_wav_decoder(spark):
    rows = [
        (1, ac.constant_wav(100, 0.5)),
        (2, ac.encode_wav(np.tile([0.4, -0.4], 80), 16000)),
        (3, b"not audio"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id int, wav binary")
    out = ff.BinaryFeatureExtractor(
        "wav", decoder=ac.wav_decoder, feature_schema=ac.audio_schema()
    ).transform(df)
    got = {r["id"]: r.asDict() for r in out.collect()}
    assert got[1]["wav_format"] == "wav" and got[1]["wav_zero_crossing_rate"] == 0.0
    assert got[2]["wav_sample_rate"] == 16000 and got[2]["wav_n_frames"] == 160
    assert got[3]["wav_format"] is None
    assert got[4]["wav_format"] is None


# -- MP3 probe (r7): ID3v2 skip + frame-header walk ---------------------

from feature_factory_spark.operators.audiocodec import (
    audio_decoder, decode_audio, make_mp3, probe_mp3,
)


def test_mp3_probe_basic_fields():
    d = probe_mp3(make_mp3(38, 128, 44100, 2))
    assert d["format"] == "mp3"
    assert d["channels"] == 2 and d["sample_rate"] == 44100
    assert d["n_frames"] == 38 * 1152
    assert abs(d["duration_s"] - 38 * 1152 / 44100) < 1e-12
    # probe contract: PCM statistics NULL without a decode
    assert d["rms"] is None and d["peak"] is None
    assert d["zero_crossing_rate"] is None and d["bit_depth"] is None


@pytest.mark.parametrize("nf,br,sr,ch,id3", [
    (5, 320, 48000, 1, 0),
    (12, 32, 32000, 2, 777),
    (1, 128, 44100, 1, 130000),   # ID3 size crossing the 7-bit boundary
])
def test_mp3_probe_variants(nf, br, sr, ch, id3):
    d = probe_mp3(make_mp3(nf, br, sr, ch, id3_size=id3))
    assert (d["sample_rate"], d["channels"], d["n_frames"]) == (sr, ch, nf * 1152)


def test_mp3_trailing_tag_and_errors():
    # APEv2-style trailing bytes after the last frame are tolerated
    assert probe_mp3(make_mp3(4) + b"APETAGEX" + b"\x00" * 24)["n_frames"] == 4 * 1152
    # r8 (ADVICE): sync-looking trailing garbage (0xFF 0xEx) and a
    # free-format/bad-index header after valid frames end the walk
    # instead of raising — the accumulated metadata survives
    # 0xFF 0xE8 = sync + RESERVED version bits: the reserved-branch
    # leniency specifically
    assert probe_mp3(make_mp3(4) + b"\xff\xe8junk")["n_frames"] == 4 * 1152
    free_fmt = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1, 0x00, 0x00])
    assert probe_mp3(make_mp3(2) + free_fmt + bytes(8))["n_frames"] == 2 * 1152
    with pytest.raises(ValueError):
        probe_mp3(b"ID3" + bytes([3, 0, 0, 0, 0, 0, 10]) + bytes(10))  # tag only
    with pytest.raises(ValueError):
        probe_mp3(b"\xff\xe0garbage")
    assert audio_decoder(b"\x00junk") == {}


def test_decode_audio_dispatch():
    assert decode_audio(make_mp3(3))["format"] == "mp3"
    assert decode_audio(ac.constant_wav(10, 0.5))["format"] == "wav"
    with pytest.raises(ValueError, match="unrecognized"):
        decode_audio(b"MThd\x00\x00")  # MIDI: genuinely undispatched
    # OggS now dispatches to the probe (r7); truncated -> ValueError too
    with pytest.raises(ValueError, match="truncated"):
        decode_audio(b"OggS\x00\x00")


def test_flac_probe():
    sr, ch, bps, tot = 44100, 2, 16, 44100 * 7
    si = bytearray(34)
    si[10] = (sr >> 12) & 0xFF
    si[11] = (sr >> 4) & 0xFF
    si[12] = ((sr & 0xF) << 4) | ((ch - 1) << 1) | (((bps - 1) >> 4) & 1)
    si[13] = (((bps - 1) & 0xF) << 4) | ((tot >> 32) & 0xF)
    si[14:18] = (tot & 0xFFFFFFFF).to_bytes(4, "big")
    flac = b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si)
    d = decode_audio(flac)
    assert (d["format"], d["sample_rate"], d["channels"],
            d["bit_depth"], d["n_frames"]) == ("flac", sr, ch, bps, tot)
    assert abs(d["duration_s"] - 7.0) < 1e-12
    assert d["rms"] is None and d["peak"] is None
    with pytest.raises(ValueError):
        from feature_factory_spark.operators.audiocodec import probe_flac
        probe_flac(b"fLaC" + bytes([0x84, 0, 0, 10]) + bytes(10))  # wrong first block
    assert audio_decoder(b"fLaC") == {}   # truncated -> NULL features


def _ogg_page(body, granule, first=False):
    segs = []
    n = len(body)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    return (b"OggS" + bytes([0, 2 if first else 0])
            + granule.to_bytes(8, "little") + bytes(12)
            + bytes([len(segs)]) + bytes(segs) + body)


def test_ogg_opus_probe():
    head = (b"OpusHead" + bytes([1, 2]) + (312).to_bytes(2, "little")
            + (48000).to_bytes(4, "little") + bytes(3))
    data = (_ogg_page(head, 0, first=True)
            + _ogg_page(b"\x00" * 100, 48000 * 3 + 312))
    d = decode_audio(data)
    assert (d["format"], d["channels"], d["sample_rate"]) == ("opus", 2, 48000)
    assert d["n_frames"] == 48000 * 3 and abs(d["duration_s"] - 3.0) < 1e-9
    assert d["rms"] is None


def test_ogg_vorbis_probe_and_errors():
    vorb = (b"\x01vorbis" + bytes(4) + bytes([1])
            + (44100).to_bytes(4, "little") + bytes(8))
    data = _ogg_page(vorb, 0, first=True) + _ogg_page(b"\x00" * 60, 88200)
    d = decode_audio(data)
    assert (d["format"], d["channels"], d["sample_rate"],
            d["n_frames"]) == ("vorbis", 1, 44100, 88200)
    with pytest.raises(ValueError):
        from feature_factory_spark.operators.audiocodec import probe_ogg
        probe_ogg(_ogg_page(b"FLACBODY", 0, first=True))  # unknown codec
    assert audio_decoder(b"OggS\x00") == {}
