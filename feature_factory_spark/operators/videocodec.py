"""Pure-stdlib video-container probing for the multimodal operators.

The video sibling of ``imagecodec``/``audiocodec``. Full video DECODING
needs codec libraries this environment doesn't ship (the FrameSampler
byte-slicer seam stays the plug point for those), but the container
METADATA — what corpus curation actually filters on before paying for
decode — is plain ISO BMFF (MP4/MOV) box structure, parseable with
stdlib ``struct``:

- brand (``ftyp``), movie timescale + duration (``mvhd`` v0/v1),
- track count and per-track handler types (``hdlr``: vide/soun/...),
- video frame dimensions (``tkhd`` 16.16 fixed-point width/height),
- sample-entry codec fourccs (``stsd``).

Duration/resolution/track-shape filters prune a 100 TB video corpus to
the slice worth decoding — the same role entropy/dims play for images.
Runs in the same Arrow-batched ``mapInPandas`` seam:
``BinaryFeatureExtractor(decoder=mp4_decoder, feature_schema=
video_schema())`` — narrow map, no shuffle.
"""

from __future__ import annotations

import struct

# containers whose payload is itself a box sequence
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(payload: bytes, start: int, end: int, depth: int = 0):
    """Yield (box_type, body_start, body_end) over a box sequence."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("MP4: truncated largesize box header")
            (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"MP4: invalid box size {size} for {btype!r}")
        yield btype, body, pos + size
        if btype in _CONTAINERS and depth < 8:
            yield from _walk(payload, body, pos + size, depth + 1)
        pos += size


def probe_mp4(payload: bytes) -> dict:
    """ISO BMFF (MP4/MOV/M4A) container metadata. Raises ValueError on
    anything that is not a well-formed box structure with ftyp+moov.

    >>> d = probe_mp4(synth_mp4(12.5, 640, 360, n_audio_tracks=1))
    >>> (d["duration_s"], d["width"], d["height"], d["n_tracks"])
    (12.5, 640.0, 360.0, 2)
    """
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("MP4: no ftyp box at start")
    brand = None
    timescale = duration = None
    n_tracks = 0
    width = height = None
    handlers: list[str] = []
    codecs: list[str] = []
    for btype, body, bend in _walk(payload, 0, len(payload)):
        if btype == b"ftyp":
            brand = payload[body : body + 4].decode("ascii", "replace").strip()
        elif btype == b"mvhd":
            version = payload[body]
            if version == 1:
                timescale, duration = struct.unpack(
                    ">IQ", payload[body + 20 : body + 32]
                )
            else:
                timescale, duration = struct.unpack(
                    ">II", payload[body + 12 : body + 20]
                )
        elif btype == b"trak":
            n_tracks += 1
        elif btype == b"tkhd":
            version = payload[body]
            # v0 layout: ver/flags(4) c(4) m(4) id(4) res(4) dur(4)
            # res(8) layer(2) group(2) vol(2) res(2) matrix(36) w(4) h(4)
            # -> width at +76; v1 widens c/m/dur to 8 bytes -> +88
            off = body + (88 if version == 1 else 76)
            w, h = struct.unpack(">II", payload[off : off + 8])
            if w and h:  # video tracks carry nonzero 16.16 dims
                width, height = w / 65536.0, h / 65536.0
        elif btype == b"hdlr":
            handlers.append(
                payload[body + 8 : body + 12].decode("ascii", "replace")
            )
        elif btype == b"stsd":
            (n_entries,) = struct.unpack(">I", payload[body + 4 : body + 8])
            pos = body + 8
            for _ in range(min(n_entries, 8)):
                if pos + 8 > bend:
                    break
                (esize,) = struct.unpack(">I", payload[pos : pos + 4])
                codecs.append(
                    payload[pos + 4 : pos + 8].decode("ascii", "replace")
                )
                pos += max(esize, 8)
    if timescale is None or not timescale:
        raise ValueError("MP4: missing or invalid mvhd")
    return {
        "format": "mp4",
        "brand": brand,
        "duration_s": float(duration) / float(timescale),
        "n_tracks": int(n_tracks),
        "width": float(width) if width else None,
        "height": float(height) if height else None,
        "has_video": "vide" in handlers,
        "has_audio": "soun" in handlers,
        "codecs": ",".join(codecs) if codecs else None,
    }


def mp4_decoder(payload: bytes) -> dict:
    """Lenient seam for BinaryFeatureExtractor: NULL features on
    non-MP4/corrupt payloads."""
    try:
        return probe_mp4(payload)
    except (ValueError, struct.error, IndexError):
        return {}


def video_schema() -> list:
    from pyspark.sql import types as T

    return [
        ("format", T.StringType()),
        ("brand", T.StringType()),
        ("duration_s", T.DoubleType()),
        ("n_tracks", T.IntegerType()),
        ("width", T.DoubleType()),
        ("height", T.DoubleType()),
        ("has_video", T.BooleanType()),
        ("has_audio", T.BooleanType()),
        ("codecs", T.StringType()),
    ]


# -- encoder (deterministic fixtures) -----------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, body: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + body)


def synth_mp4(
    duration_s: float,
    width: int,
    height: int,
    n_audio_tracks: int = 0,
    timescale: int = 1000,
    video_codec: bytes = b"avc1",
) -> bytes:
    """Minimal deterministic ISO BMFF fixture: ftyp + moov{mvhd,
    trak{tkhd, mdia{hdlr, minf{stbl{stsd}}}} x (1 video + N audio)}."""
    dur = int(round(duration_s * timescale))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">II", 0, 0) + struct.pack(">II", timescale, dur)
        + b"\x00" * 80,
    )

    def trak(handler: bytes, w: int, h: int, codec: bytes) -> bytes:
        tkhd = _full(
            b"tkhd", 0,
            struct.pack(">III", 0, 0, 1) + b"\x00" * 4
            + struct.pack(">I", dur) + b"\x00" * 16 + b"\x00" * 36
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = _full(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12)
        stsd = _full(
            b"stsd", 0,
            struct.pack(">I", 1) + _box(codec, b"\x00" * 8),
        )
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    traks = trak(b"vide", width, height, video_codec)
    for _ in range(n_audio_tracks):
        traks += trak(b"soun", 0, 0, b"mp4a")
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov
