"""Pure-stdlib audio decoding for the multimodal operators.

The audio sibling of ``imagecodec``: RIFF/WAVE PCM parsing from raw
bytes with stdlib ``struct`` + numpy — no external codec library. WAV
PCM is the interchange format audio training corpora actually carry
(compressed formats are transcoded to PCM at ingestion); decoding it for
real makes the audio features (duration, channels, sample rate, RMS
energy, peak, zero-crossing rate) curation-grade rather than byte-level
stand-ins.

Runs inside the same Arrow-batched ``mapInPandas`` seam as the image
decoder: ``BinaryFeatureExtractor(decoder=wav_decoder,
feature_schema=audio_schema())`` — a narrow map, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

_SUPPORTED_BITS = {8, 16, 32}


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE bytes -> decoded features. PCM (format 1: 8-bit
    unsigned / 16-bit / 32-bit signed LE) and IEEE float (format 3:
    32-bit). Raises ValueError on malformed or non-PCM payloads.

    >>> d = decode_wav(constant_wav(160, 0.0, sample_rate=8000))
    >>> (d["format"], d["channels"], d["duration_s"], d["rms"])
    ('wav', 1, 0.02, 0.0)
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("WAV: bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV: truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("WAV: truncated data chunk")
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format not in (1, 3):
        raise ValueError(f"WAV: audio format {audio_format} not supported (PCM/float only)")
    if bits not in _SUPPORTED_BITS:
        raise ValueError(f"WAV: {bits}-bit samples not supported")
    if channels < 1 or sample_rate < 1:
        raise ValueError("WAV: invalid channel count or sample rate")
    if audio_format == 3:
        if bits != 32:
            raise ValueError("WAV: float format requires 32-bit samples")
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif bits == 8:
        # 8-bit WAV is unsigned, midpoint 128
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    else:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483647.0
    n_frames = x.size // channels
    x = x[: n_frames * channels]
    if n_frames == 0:
        raise ValueError("WAV: empty data chunk")
    mono = x.reshape(n_frames, channels).mean(axis=1)
    # zero-crossing rate over the channel-mean signal: fraction of
    # consecutive sample pairs whose signs differ (exact zeros break a
    # run — standard librosa-style definition on signbit)
    signs = np.signbit(mono)
    zcr = float(np.mean(signs[1:] != signs[:-1])) if n_frames > 1 else 0.0
    return {
        "format": "wav",
        "channels": int(channels),
        "sample_rate": int(sample_rate),
        "bit_depth": int(bits),
        "n_frames": int(n_frames),
        "duration_s": float(n_frames / sample_rate),
        "rms": float(np.sqrt(np.mean(x * x))),
        "peak": float(np.max(np.abs(x))),
        "zero_crossing_rate": zcr,
    }


def wav_decoder(payload: bytes) -> dict:
    """Lenient seam for BinaryFeatureExtractor: NULL features (empty
    dict) on anything that is not a well-formed PCM WAV — one corrupt
    blob must not fail a scan task."""
    try:
        return decode_wav(payload)
    except (ValueError, struct.error, IndexError):
        return {}


def audio_schema() -> list:
    """feature_schema for BinaryFeatureExtractor(decoder=wav_decoder)."""
    from pyspark.sql import types as T

    return [
        ("format", T.StringType()),
        ("channels", T.IntegerType()),
        ("sample_rate", T.IntegerType()),
        ("bit_depth", T.IntegerType()),
        ("n_frames", T.IntegerType()),
        ("duration_s", T.DoubleType()),
        ("rms", T.DoubleType()),
        ("peak", T.DoubleType()),
        ("zero_crossing_rate", T.DoubleType()),
    ]


def encode_wav(
    samples, sample_rate: int, channels: int = 1, bits: int = 16
) -> bytes:
    """Minimal PCM WAV encoder (8/16/32-bit int). ``samples`` is a 1-D
    float array-like in [-1, 1], interleaved when channels > 1 (length
    must be a multiple of channels). Deterministic fixtures + a real
    writable artifact, like imagecodec.encode_png."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim != 1 or x.size % max(channels, 1):
        raise ValueError("samples must be 1-D interleaved, length % channels == 0")
    if bits == 8:
        data = (np.floor(x * 127.0 + 0.5) + 128.0).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        data = np.floor(x * 32767.0 + 0.5).clip(-32768, 32767).astype("<i2").tobytes()
    elif bits == 32:
        data = (
            np.floor(x * 2147483647.0 + 0.5)
            .clip(-2147483648, 2147483647)
            .astype("<i4")
            .tobytes()
        )
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def constant_wav(
    n_frames: int, amplitude: float, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Deterministic constant-amplitude 16-bit WAV — the closed-form
    fixture (rms == peak == floor(a*32767+0.5)/32767, zcr == 0)."""
    return encode_wav(
        np.full(n_frames * channels, amplitude), sample_rate, channels, 16
    )
