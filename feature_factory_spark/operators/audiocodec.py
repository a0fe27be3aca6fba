"""Pure-stdlib audio decoding for the multimodal operators.

The audio sibling of ``imagecodec``: RIFF/WAVE PCM parsing from raw
bytes with stdlib ``struct`` + numpy — no external codec library. WAV
PCM is the interchange format audio training corpora actually carry
(compressed formats are transcoded to PCM at ingestion); decoding it for
real makes the audio features (duration, channels, sample rate, RMS
energy, peak, zero-crossing rate) curation-grade rather than byte-level
stand-ins. MP3 — the format raw web crawls actually carry — gets an
ID3v2-aware frame-header PROBE (r7): sample rate, channels, sample
count, duration from the ISO 11172-3 header tables, PCM statistics
NULL, mirroring the JPEG-progressive probe contract.

Runs inside the same Arrow-batched ``mapInPandas`` seam as the image
decoder: ``BinaryFeatureExtractor(decoder=wav_decoder,
feature_schema=audio_schema())`` — a narrow map, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

from ..pipeline import Transformer

_SUPPORTED_BITS = {8, 16, 32}


def _parse_wav(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """RIFF/WAVE bytes -> (interleaved float64 samples in [-1, 1],
    channels, sample_rate, bit_depth). The shared parse under
    :func:`decode_wav` (statistics) and :func:`decode_wav_samples`
    (PCM for the fingerprint path). Raises ValueError on malformed or
    non-PCM payloads."""
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
    return x, int(channels), int(sample_rate), int(bits)


def decode_wav_samples(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (mono float64 samples in [-1, 1],
    sample_rate) — channel-mean downmix, the PCM entry point for
    perceptual fingerprinting (operators/audiohash.py). Raises
    ValueError on malformed or non-PCM payloads."""
    x, channels, sample_rate, _bits = _parse_wav(payload)
    return x.reshape(x.size // channels, channels).mean(axis=1), sample_rate


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE bytes -> decoded features. PCM (format 1: 8-bit
    unsigned / 16-bit / 32-bit signed LE) and IEEE float (format 3:
    32-bit). Raises ValueError on malformed or non-PCM payloads.

    >>> d = decode_wav(constant_wav(160, 0.0, sample_rate=8000))
    >>> (d["format"], d["channels"], d["duration_s"], d["rms"])
    ('wav', 1, 0.02, 0.0)
    """
    x, channels, sample_rate, bits = _parse_wav(payload)
    n_frames = x.size // channels
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


# -- MP3 (r7): ID3v2 skip + MPEG audio frame-header walk -----------------
#
# All tables are the public ISO/IEC 11172-3 / 13818-3 header constants.
# Indexed [version_group][layer]: version_group 0 = MPEG1, 1 = MPEG2/2.5.

_MP3_BITRATES = {
    (0, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (0, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (0, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (1, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (1, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (1, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {
    3: [44100, 48000, 32000],   # MPEG1
    2: [22050, 24000, 16000],   # MPEG2
    0: [11025, 12000, 8000],    # MPEG2.5
}


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 when absent)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    b = payload[6:10]
    if any(x & 0x80 for x in b):  # syncsafe bytes must have bit 7 clear
        raise ValueError("MP3: malformed ID3v2 syncsafe size")
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
    footer = 10 if (payload[5] & 0x10) else 0
    return 10 + size + footer


def probe_mp3(payload: bytes) -> dict:
    """MPEG audio (MP3) header probe: skip a leading ID3v2 tag, walk
    the frame headers (sync, version, layer, bitrate/sample-rate
    indices, padding, channel mode), and derive sample rate, channels,
    total sample-frame count and duration — the metadata features a
    curation filter needs, without a PCM decode (the JPEG-progressive
    precedent: rms/peak/zcr stay NULL). Raises ValueError when no
    valid frame sequence is found."""
    pos = _id3v2_size(payload)
    n = len(payload)
    frames = 0
    samples = 0
    sample_rate = None
    channels = None
    audio_bytes = 0
    while pos + 4 <= n:
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if frames:
                break  # trailing garbage / APEv2 tag after last frame
            raise ValueError("MP3: no frame sync where expected")
        version_bits = (b1 >> 3) & 0x03   # 0=2.5, 2=MPEG2, 3=MPEG1
        layer_bits = (b1 >> 1) & 0x03     # 3=Layer I, 2=II, 1=III
        if version_bits == 1 or layer_bits == 0:
            if frames:
                break  # sync-looking garbage (0xFF 0xEx) after last frame
            raise ValueError("MP3: reserved version/layer bits")
        layer = 4 - layer_bits            # 1, 2, 3
        vgroup = 0 if version_bits == 3 else 1
        br_ix = (b2 >> 4) & 0x0F
        sr_ix = (b2 >> 2) & 0x03
        padding = (b2 >> 1) & 0x01
        if br_ix in (0, 15) or sr_ix == 3:
            # mid-stream free-format frame or trailing bytes that begin
            # 0xFF 0xEx: once real frames were accumulated, stop the walk
            # (as the sync-mismatch branch does) instead of raising —
            # the lenient seam would otherwise lose the whole probe
            if frames:
                break
            raise ValueError("MP3: free/bad bitrate or bad sample rate")
        bitrate = _MP3_BITRATES[(vgroup, layer)][br_ix] * 1000
        rate = _MP3_RATES[version_bits][sr_ix]
        mode = (b3 >> 6) & 0x03
        ch = 1 if mode == 3 else 2
        if sample_rate is None:
            sample_rate, channels = rate, ch
        if layer == 1:
            frame_len = (12 * bitrate // rate + padding) * 4
            spf = 384
        else:
            if layer == 3 and vgroup == 1:
                frame_len = 72 * bitrate // rate + padding
                spf = 576
            else:
                frame_len = 144 * bitrate // rate + padding
                spf = 1152
        if frame_len <= 4:
            if frames:
                break
            raise ValueError("MP3: degenerate frame length")
        frames += 1
        samples += spf
        audio_bytes += frame_len
        pos += frame_len
    if not frames or sample_rate is None:
        raise ValueError("MP3: no audio frames found")
    duration = samples / sample_rate
    return {
        "format": "mp3",
        "channels": int(channels),
        "sample_rate": int(sample_rate),
        "bit_depth": None,            # no PCM depth without a decode
        "n_frames": int(samples),     # sample frames, same unit as WAV
        "duration_s": float(duration),
        "rms": None,
        "peak": None,
        "zero_crossing_rate": None,
    }


def probe_flac(payload: bytes) -> dict:
    """FLAC metadata probe from the mandatory STREAMINFO block (public
    bitstream spec): sample rate (20 bits), channels (3 bits + 1), bits
    per sample (5 bits + 1), total samples (36 bits) at fixed offsets.
    PCM statistics NULL — no frame decode."""
    if payload[:4] != b"fLaC":
        raise ValueError("FLAC: bad signature")
    # first metadata block must be STREAMINFO (type 0), 34 bytes
    if len(payload) < 8 + 34 or (payload[4] & 0x7F) != 0:
        raise ValueError("FLAC: missing STREAMINFO block")
    si = payload[8 : 8 + 34]
    sample_rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    channels = ((si[12] >> 1) & 0x07) + 1
    bits = (((si[12] & 0x01) << 4) | (si[13] >> 4)) + 1
    total = ((si[13] & 0x0F) << 32) | int.from_bytes(si[14:18], "big")
    if sample_rate < 1:
        raise ValueError("FLAC: invalid sample rate")
    return {
        "format": "flac",
        "channels": int(channels),
        "sample_rate": int(sample_rate),
        "bit_depth": int(bits),
        "n_frames": int(total),
        "duration_s": float(total / sample_rate) if total else None,
        "rms": None,
        "peak": None,
        "zero_crossing_rate": None,
    }


def probe_ogg(payload: bytes) -> dict:
    """Ogg container probe (RFC 3533 page layout): identifies an Opus
    (RFC 7845 OpusHead) or Vorbis identification header in the first
    page, then walks page headers to the final granule position for
    duration. PCM statistics NULL."""
    if payload[:4] != b"OggS":
        raise ValueError("Ogg: bad capture pattern")
    # first page: header 27 bytes + segment table, then the id header
    if len(payload) < 28:
        raise ValueError("Ogg: truncated first page")
    nseg0 = payload[26]
    body0 = 27 + nseg0
    ident = payload[body0 : body0 + 64]
    if ident[:8] == b"OpusHead":
        codec = "opus"
        channels = ident[9]
        pre_skip = int.from_bytes(ident[10:12], "little")
        sample_rate = 48000  # Opus granules are always 48 kHz
    elif ident[:7] == b"\x01vorbis":
        codec = "vorbis"
        channels = ident[11]
        sample_rate = int.from_bytes(ident[12:16], "little")
        pre_skip = 0
    else:
        raise ValueError("Ogg: not an Opus/Vorbis stream")
    if channels < 1 or sample_rate < 1:
        raise ValueError("Ogg: invalid id header")
    # walk pages for the last granule position
    pos = 0
    last_granule = 0
    n = len(payload)
    while pos + 27 <= n and payload[pos : pos + 4] == b"OggS":
        granule = int.from_bytes(payload[pos + 6 : pos + 14], "little")
        if granule not in (0xFFFFFFFFFFFFFFFF,):  # -1 = no packet ends here
            last_granule = max(last_granule, granule)
        nseg = payload[pos + 26]
        seg_table = payload[pos + 27 : pos + 27 + nseg]
        if len(seg_table) < nseg:
            break
        pos += 27 + nseg + sum(seg_table)
    samples = max(0, last_granule - pre_skip)
    return {
        "format": codec,
        "channels": int(channels),
        "sample_rate": int(sample_rate),
        "bit_depth": None,
        "n_frames": int(samples),
        "duration_s": float(samples / sample_rate) if samples else None,
        "rms": None,
        "peak": None,
        "zero_crossing_rate": None,
    }


def decode_audio(payload: bytes) -> dict:
    """Magic-byte dispatch: RIFF/WAVE -> full PCM decode, fLaC ->
    STREAMINFO probe, OggS -> Opus/Vorbis probe, ID3v2 or bare MPEG
    sync -> MP3 header probe. Raises ValueError on anything else."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:4] == b"fLaC":
        return probe_flac(payload)
    if payload[:4] == b"OggS":
        return probe_ogg(payload)
    if payload[:3] == b"ID3" or (
        len(payload) >= 2
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    ):
        return probe_mp3(payload)
    raise ValueError(
        f"unrecognized audio format (header {payload[:8].hex()})"
    )


def audio_decoder(payload: bytes) -> dict:
    """Lenient multi-format seam for BinaryFeatureExtractor (WAV decode
    + MP3 probe); NULL features on undecodable blobs."""
    try:
        return decode_audio(payload)
    except (ValueError, struct.error, IndexError):
        return {}


def make_mp3(
    n_mpeg_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    id3_size: int = 0,
) -> bytes:
    """Deterministic MP3 fixture: a valid ID3v2 tag (optional) followed
    by ``n_mpeg_frames`` MPEG1 Layer III frame headers with zeroed
    payloads — exactly the structure ``probe_mp3`` parses, the
    ``make_warc``/``solid_jpeg`` fixture precedent (the probe reads
    headers, so fixtures need valid headers, not valid audio)."""
    br_table = _MP3_BITRATES[(0, 3)]
    if bitrate_kbps not in br_table:
        raise ValueError(f"bitrate {bitrate_kbps} not in the MPEG1-III table")
    if sample_rate not in _MP3_RATES[3]:
        raise ValueError(f"sample rate {sample_rate} not valid for MPEG1")
    br_ix = br_table.index(bitrate_kbps)
    sr_ix = _MP3_RATES[3].index(sample_rate)
    mode = 3 if channels == 1 else 0
    hdr = bytes([
        0xFF,
        0xE0 | (3 << 3) | (1 << 1) | 1,          # MPEG1, Layer III, no CRC
        (br_ix << 4) | (sr_ix << 2),             # no padding
        (mode << 6),
    ])
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = hdr + b"\x00" * (frame_len - 4)
    out = bytearray()
    if id3_size:
        body = bytes(id3_size)
        ss = [
            (id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
            (id3_size >> 7) & 0x7F, id3_size & 0x7F,
        ]
        out += b"ID3" + bytes([3, 0, 0]) + bytes(ss) + body
    out += frame * n_mpeg_frames
    return bytes(out)


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


def audio_quality(
    payload: bytes,
    clip_threshold: float = 0.99,
    silence_threshold: float = 1e-3,
) -> dict:
    """Audio quality metrics from the channel-mean PCM signal — the
    Gopher-analogue for speech/audio corpora. Public-heuristic lineage:
    speech-corpus curation (e.g. the filtering described for public
    ASR corpus builds) drops clipped recordings, near-silent segments,
    and degenerate dynamics; these are the standard signal statistics
    that decide that:

    - ``clipping_ratio``: fraction of samples at or beyond
      ``clip_threshold`` of full scale (hard-limited recordings)
    - ``silence_ratio``: fraction below ``silence_threshold``
      (dead air / failed capture)
    - ``rms`` and ``peak`` of the mono signal
    - ``crest_factor``: peak / rms (0.0 for all-silence) — low crest
      means brickwalled/compressed audio, implausibly high means
      isolated pops in silence
    - ``duration_s``, ``n_samples``

    Raises ValueError on malformed/non-PCM payloads (the decode_wav
    contract); use :func:`audio_quality_decoder` for the lenient seam.
    """
    mono, sample_rate = decode_wav_samples(payload)
    n = int(mono.size)
    if n == 0:
        raise ValueError("WAV: empty data chunk")
    absx = np.abs(mono)
    peak = float(absx.max())
    rms = float(np.sqrt(np.mean(mono * mono)))
    return {
        "clipping_ratio": float(np.mean(absx >= clip_threshold)),
        "silence_ratio": float(np.mean(absx < silence_threshold)),
        "rms": rms,
        "peak": peak,
        "crest_factor": peak / rms if rms > 0 else 0.0,
        "duration_s": float(n / sample_rate),
        "n_samples": n,
    }


def audio_quality_decoder(payload: bytes) -> dict:
    """Lenient seam for BinaryFeatureExtractor: NULL features on
    non-WAV/corrupt bytes."""
    try:
        return audio_quality(payload)
    except (ValueError, struct.error, IndexError):
        return {}


def audio_quality_schema() -> list:
    """feature_schema for BinaryFeatureExtractor(
    decoder=audio_quality_decoder)."""
    from pyspark.sql import types as T

    return [
        ("clipping_ratio", T.DoubleType()),
        ("silence_ratio", T.DoubleType()),
        ("rms", T.DoubleType()),
        ("peak", T.DoubleType()),
        ("crest_factor", T.DoubleType()),
        ("duration_s", T.DoubleType()),
        ("n_samples", T.IntegerType()),
    ]


class AudioQualityFilter(Transformer):
    """Quality gate for an audio-bytes column: decodes per blob (one
    narrow Arrow-batched map — the BinaryFeatureExtractor seam),
    appends the :func:`audio_quality` metrics as ``{c}_aq_*`` columns
    plus a ``{c}_keep`` boolean:

    keep = decodable
         AND clipping_ratio <= max_clipping_ratio
         AND silence_ratio  <= max_silence_ratio
         AND rms            >= min_rms
         AND min_duration_s <= duration_s <= max_duration_s

    Undecodable blobs get NULL metrics and keep = false (a filter on
    keep drops them, matching every lenient decoder here). Stateless:
    thresholds are configuration, not fitted state — the keep rule is
    a pure-JVM expression over the decoded metric columns, so 10x
    audio is 10x task work with no shuffle and no plan change.
    Stateless Transformer (fit is a no-op), so it composes in a
    Pipeline alongside the text gates."""

    def __init__(
        self,
        column: str,
        max_clipping_ratio: float = 0.01,
        max_silence_ratio: float = 0.5,
        min_rms: float = 1e-3,
        min_duration_s: float = 0.5,
        max_duration_s: float = float("inf"),
        clip_threshold: float = 0.99,
        silence_threshold: float = 1e-3,
    ):
        from ..validation import ensure

        ensure(0.0 <= max_clipping_ratio <= 1.0,
               "max_clipping_ratio must be in [0,1]")
        ensure(0.0 <= max_silence_ratio <= 1.0,
               "max_silence_ratio must be in [0,1]")
        ensure(min_duration_s >= 0.0, "min_duration_s must be >= 0")
        ensure(max_duration_s >= min_duration_s,
               "max_duration_s must be >= min_duration_s")
        self.column = column
        self.max_clipping_ratio = max_clipping_ratio
        self.max_silence_ratio = max_silence_ratio
        self.min_rms = min_rms
        self.min_duration_s = min_duration_s
        self.max_duration_s = max_duration_s
        self.clip_threshold = clip_threshold
        self.silence_threshold = silence_threshold

    def _check_input(self, df) -> None:
        from ..validation import validate_columns

        validate_columns(df, [self.column])

    def _transform(self, df):
        from pyspark.sql import functions as F

        from .multimodal import BinaryFeatureExtractor

        clip_t, sil_t = self.clip_threshold, self.silence_threshold

        def decoder(payload: bytes) -> dict:
            try:
                return audio_quality(payload, clip_t, sil_t)
            except (ValueError, struct.error, IndexError):
                return {}

        c = self.column
        out = BinaryFeatureExtractor(
            c, decoder=decoder, feature_schema=audio_quality_schema(),
            prefix=f"{c}_aq_",
        ).transform(df)
        keep = (
            F.col(f"{c}_aq_clipping_ratio").isNotNull()
            & (F.col(f"{c}_aq_clipping_ratio")
               <= F.lit(self.max_clipping_ratio))
            & (F.col(f"{c}_aq_silence_ratio")
               <= F.lit(self.max_silence_ratio))
            & (F.col(f"{c}_aq_rms") >= F.lit(self.min_rms))
            & (F.col(f"{c}_aq_duration_s") >= F.lit(self.min_duration_s))
            & (F.col(f"{c}_aq_duration_s") <= F.lit(self.max_duration_s))
        )
        return out.withColumn(
            f"{c}_keep", F.coalesce(keep, F.lit(False))
        )


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
