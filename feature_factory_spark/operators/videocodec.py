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

from ..pipeline import Transformer

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


def mp4_samples(payload: bytes, handler: bytes = b"vide") -> list[bytes]:
    """Extract the raw sample (frame) payloads of the first track with
    the given handler type, by walking the REAL ISO BMFF sample tables:
    ``stsc`` (sample-to-chunk runs) x ``stsz`` (sample sizes) x
    ``stco``/``co64`` (chunk offsets) locate each sample's byte range
    inside ``mdat``. This is container-level demuxing — the sample
    bytes themselves stay codec-opaque (for MJPEG/PNG-in-MP4 layouts
    they are directly decodable images; for avc1 they are NAL units a
    codec library would take over). Returns [] when the track carries
    no sample tables (metadata-only fixtures). Raises ValueError on
    malformed box structure."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("MP4: no ftyp box at start")
    # trak body ranges, in file order
    traks = [
        (body, bend)
        for btype, body, bend in _walk(payload, 0, len(payload))
        if btype == b"trak"
    ]
    for t0, t1 in traks:
        boxes = {
            btype: (body, bend)
            for btype, body, bend in _walk(payload, t0, t1)
            if btype in (b"hdlr", b"stsz", b"stco", b"co64", b"stsc")
        }
        if b"hdlr" not in boxes:
            continue
        hb, _ = boxes[b"hdlr"]
        if payload[hb + 8 : hb + 12] != handler:
            continue
        if not {b"stsz", b"stsc"} <= set(boxes) or not (
            {b"stco", b"co64"} & set(boxes)
        ):
            return []
        # stsz: uniform size or per-sample table
        zb, _ = boxes[b"stsz"]
        uniform, n_samples = struct.unpack(">II", payload[zb + 4 : zb + 12])
        # A corrupt/hostile stsz can declare ~2^32 samples; bound the declared
        # count against the payload before materializing the size list so a
        # bad blob degrades to ValueError ([] upstream), never an executor OOM.
        if n_samples > len(payload) or (uniform and uniform * n_samples > len(payload)):
            raise ValueError(
                f"MP4: stsz declares {n_samples} samples"
                f" (uniform size {uniform}) exceeding payload {len(payload)}B"
            )
        sizes = (
            [uniform] * n_samples
            if uniform
            else list(
                struct.unpack(
                    f">{n_samples}I", payload[zb + 12 : zb + 12 + 4 * n_samples]
                )
            )
        )
        # chunk offsets (stco 32-bit / co64 64-bit)
        if b"stco" in boxes:
            cb, _ = boxes[b"stco"]
            (n_chunks,) = struct.unpack(">I", payload[cb + 4 : cb + 8])
            offsets = struct.unpack(
                f">{n_chunks}I", payload[cb + 8 : cb + 8 + 4 * n_chunks]
            )
        else:
            cb, _ = boxes[b"co64"]
            (n_chunks,) = struct.unpack(">I", payload[cb + 4 : cb + 8])
            offsets = struct.unpack(
                f">{n_chunks}Q", payload[cb + 8 : cb + 8 + 8 * n_chunks]
            )
        # stsc runs: (first_chunk, samples_per_chunk, sample_desc_index)
        sb, _ = boxes[b"stsc"]
        (n_runs,) = struct.unpack(">I", payload[sb + 4 : sb + 8])
        runs = [
            struct.unpack(">III", payload[sb + 8 + 12 * i : sb + 20 + 12 * i])
            for i in range(n_runs)
        ]
        # expand: samples_per_chunk for chunk c = the run covering it
        out: list[bytes] = []
        si = 0
        for ci in range(n_chunks):
            spc = 0
            for first, per, _sdi in runs:
                if first <= ci + 1:  # first_chunk is 1-based
                    spc = per
            pos = offsets[ci]
            for _ in range(spc):
                if si >= n_samples:
                    break
                size = sizes[si]
                if pos + size > len(payload):
                    raise ValueError("MP4: sample range beyond payload")
                out.append(payload[pos : pos + size])
                pos += size
                si += 1
        return out
    return []


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
    frames: list[bytes] | None = None,
) -> bytes:
    """Minimal deterministic ISO BMFF fixture: ftyp + moov{mvhd,
    trak{tkhd, mdia{hdlr, minf{stbl{stsd ...}}}} x (1 video + N
    audio)}. With ``frames``, the video track gains REAL sample tables
    (stts/stsc/stsz/stco, one sample per chunk) and the payloads land
    in a trailing ``mdat`` — an MJPEG/PNG-in-MP4-style layout that
    :func:`mp4_samples` demuxes back byte-for-byte. stco offsets are
    absolute, so the moov is built twice: once with zero offsets to fix
    the layout, once with the real mdat positions (table sizes don't
    change between passes)."""
    dur = int(round(duration_s * timescale))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">II", 0, 0) + struct.pack(">II", timescale, dur)
        + b"\x00" * 80,
    )

    def trak(
        handler: bytes, w: int, h: int, codec: bytes,
        offsets: list[int] | None = None,
    ) -> bytes:
        tkhd = _full(
            b"tkhd", 0,
            struct.pack(">III", 0, 0, 1) + b"\x00" * 4
            + struct.pack(">I", dur) + b"\x00" * 16 + b"\x00" * 36
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = _full(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12)
        stbl_body = _full(
            b"stsd", 0,
            struct.pack(">I", 1) + _box(codec, b"\x00" * 8),
        )
        if offsets is not None:
            n = len(offsets)
            stbl_body += _full(  # stts: n samples, 1 tick each
                b"stts", 0, struct.pack(">III", 1, n, 1)
            )
            stbl_body += _full(  # stsc: one sample per chunk throughout
                b"stsc", 0, struct.pack(">IIII", 1, 1, 1, 1)
            )
            stbl_body += _full(  # stsz: per-sample size table
                b"stsz", 0,
                struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", len(f)) for f in frames),
            )
            stbl_body += _full(  # stco: absolute chunk offsets
                b"stco", 0,
                struct.pack(">I", n)
                + b"".join(struct.pack(">I", o) for o in offsets),
            )
        stbl = _box(b"stbl", stbl_body)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    def build(offsets: list[int] | None) -> bytes:
        traks = trak(b"vide", width, height, video_codec, offsets)
        for _ in range(n_audio_tracks):
            traks += trak(b"soun", 0, 0, b"mp4a")
        return _box(b"moov", mvhd + traks)

    if frames is None:
        return ftyp + build(None)
    moov = build([0] * len(frames))
    base = len(ftyp) + len(moov) + 8  # first sample starts after mdat hdr
    offsets, pos = [], base
    for f in frames:
        offsets.append(pos)
        pos += len(f)
    moov = build(offsets)
    return ftyp + moov + _box(b"mdat", b"".join(frames))


class VideoQualityFilter(Transformer):
    """Quality gate for a video-bytes column — the container-probe tier
    of the media quality matrix (Audio/ImageQualityFilter siblings): a
    curation pass drops zero-duration stubs, audio-only containers and
    sub-resolution clips BEFORE paying for any frame decode, using only
    the ISO-BMFF metadata ``probe_mp4`` reads.

    Appends the probe features as ``{c}_vq_*`` plus ``{c}_keep``:

    keep = probeable
         AND min_duration_s <= duration_s <= max_duration_s
         AND width >= min_width AND height >= min_height
         AND (not require_video OR has_video)
         AND (not require_audio OR has_audio)

    Undecodable blobs get NULL features and keep = false. Stateless
    Transformer (fit is a no-op), so it composes in a Pipeline
    alongside the text gates."""

    def __init__(
        self,
        column: str,
        min_duration_s: float = 1.0,
        max_duration_s: float = float("inf"),
        min_width: int = 64,
        min_height: int = 64,
        require_video: bool = True,
        require_audio: bool = False,
    ):
        from ..validation import ensure

        ensure(min_duration_s >= 0.0, "min_duration_s must be >= 0")
        ensure(max_duration_s >= min_duration_s,
               "max_duration_s must be >= min_duration_s")
        ensure(min_width >= 0 and min_height >= 0,
               "min_width/min_height must be >= 0")
        self.column = column
        self.min_duration_s = min_duration_s
        self.max_duration_s = max_duration_s
        self.min_width = min_width
        self.min_height = min_height
        self.require_video = require_video
        self.require_audio = require_audio

    def _check_input(self, df) -> None:
        from ..validation import validate_columns

        validate_columns(df, [self.column])

    def _transform(self, df):
        from pyspark.sql import functions as F

        from .multimodal import BinaryFeatureExtractor

        c = self.column
        out = BinaryFeatureExtractor(
            c, decoder=mp4_decoder, feature_schema=video_schema(),
            prefix=f"{c}_vq_",
        ).transform(df)
        keep = (
            F.col(f"{c}_vq_duration_s").isNotNull()
            & (F.col(f"{c}_vq_duration_s") >= F.lit(self.min_duration_s))
            & (F.col(f"{c}_vq_duration_s") <= F.lit(self.max_duration_s))
            & (F.coalesce(F.col(f"{c}_vq_width"), F.lit(0.0))
               >= F.lit(float(self.min_width)))
            & (F.coalesce(F.col(f"{c}_vq_height"), F.lit(0.0))
               >= F.lit(float(self.min_height)))
        )
        if self.require_video:
            keep = keep & F.col(f"{c}_vq_has_video")
        if self.require_audio:
            keep = keep & F.col(f"{c}_vq_has_audio")
        return out.withColumn(f"{c}_keep", F.coalesce(keep, F.lit(False)))
