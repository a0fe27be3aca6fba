"""Pure-stdlib baseline JPEG codec (ITU-T T.81) for the multimodal
operators.

JPEG is the dominant web image format — the majority of any crawled
image corpus — so the default decoder seam must handle it without
Pillow (the r6 review's top capability gap). This module implements:

- ``decode_jpeg``: a real baseline-sequential decoder (marker parse,
  DQT/DHT table load, interleaved-MCU Huffman decode with restart
  markers, dequantize + zigzag, float IDCT, chroma upsampling for
  4:4:4 / 4:2:2 / 4:2:0, JFIF YCbCr->RGB) for SOF0/SOF1 streams, and
  a metadata PROBE (dimensions, components, progressive flag) for
  progressive (SOF2) and other SOF variants — a progressive scan still
  yields the width/height/channels features a curation filter needs.
- ``encode_jpeg`` / ``solid_jpeg``: a minimal baseline encoder
  (grayscale or 4:4:4 YCbCr, Annex K tables scaled by quality) — the
  deterministic fixture generator, following the ``make_warc`` /
  ``solid_png`` precedent so tests and the DuckDB oracle can state
  expected decodes in closed form.

All algorithm constants (Annex K quantization matrices, the canonical
DC/AC Huffman table specs, zigzag order, the JFIF color matrices) are
published in ITU-T T.81; no code is derived from any decoder library.

Determinism: every rounding step is floor(x + 0.5) (half-up) and
quantization is round-half-away-from-zero, so a solid-gray fixture
decodes to a value expressible in ANSI SQL:

    dc   = 8 * (g - 128)                      # DCT DC of a constant block
    qdc  = sign(dc) * floor(|dc| / Q00 + 0.5) * Q00
    gray = clip(floor(qdc / 8 + 128.5), 0, 255)

Scale note: like the PNG path, this runs inside Arrow-batched
``mapInPandas`` (narrow map, no shuffle). The bit-by-bit Huffman loop
is pure Python — correctness and zero dependencies over throughput;
``pillow_decoder`` remains the SIMD path where Pillow is installed.
"""

from __future__ import annotations

import numpy as np

# -- Annex K tables (ITU-T T.81) ----------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# zigzag index k -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Huffman table specs: (BITS[1..16], HUFFVAL) — T.81 Annex K.3
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II matrix: IDCT is M.T @ S @ M, FDCT is M @ s @ M.T
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _x, _c


# Half-up/half-away boundaries (x = k + 0.5) occur at exact-arithmetic
# values (e.g. the DC of a solid block is exactly 8*(g-128)); the float
# DCT lands ~1e-13 off. The epsilon absorbs that error so the codec
# matches the exact-arithmetic closed form the oracle SQL states, and is
# far too small to move any non-boundary value.
_EPS = 1e-9


def _round_half_up(x):
    """floor(x + 0.5): the single rounding convention used everywhere in
    this codec so the oracle SQL can reproduce it exactly."""
    return np.floor(np.asarray(x, dtype=np.float64) + (0.5 + _EPS))


def _quantize(coeff: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero quantization (T.81 leaves the rule to
    the encoder; half-away is what the SQL twin states)."""
    ratio = coeff / q
    return (np.sign(ratio) * np.floor(np.abs(ratio) + (0.5 + _EPS))).astype(
        np.int64
    )


def scaled_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg jcparam formula): 50 keeps
    Annex K as-is; entries clamp to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


# -- Huffman (decode: T.81 F.16; encode: canonical code assignment) ------


class _HuffTable:
    def __init__(self, bits: list[int], values: list[int]):
        if len(bits) != 16 or sum(bits) != len(values):
            raise ValueError("JPEG: malformed Huffman table spec")
        self.bits = list(bits)
        self.values = list(values)
        # canonical codes in spec order
        codes, code = [], 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes.append((length, code))
                code += 1
            code <<= 1
        self.codes = codes  # parallel to values
        self.lookup = {c: v for c, v in zip(codes, values)}
        self.enc = {v: c for c, v in zip(codes, values)}


class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # pending marker (e.g. RSTn, EOI)

    def _fill(self):
        if self.marker is not None:
            raise ValueError("JPEG: entropy data exhausted at marker")
        if self.pos >= len(self.data):
            raise ValueError("JPEG: truncated entropy-coded data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed FF
            else:
                self.marker = nxt
                self.pos += 1
                raise ValueError("JPEG: entropy data exhausted at marker")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        length, code = 0, 0
        lookup = table.lookup
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            v = lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("JPEG: invalid Huffman code")

    def align_and_expect_rst(self, n: int):
        """Discard bits to the byte boundary and consume restart n."""
        self.nbits = 0
        self.acc = 0
        if self.marker is None:
            # marker not yet hit while filling: scan forward for it
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
        if self.marker != 0xD0 + (n % 8):
            raise ValueError(
                f"JPEG: expected RST{n % 8}, got marker {self.marker!r}"
            )
        self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# -- decoder ------------------------------------------------------------


def decode_jpeg(payload: bytes, return_pixels: bool = False) -> dict:
    """JPEG bytes -> feature dict (imagecodec ``IMAGE_SCHEMA`` shape).

    Baseline / extended-sequential Huffman streams (SOF0/SOF1) are
    fully decoded to pixels (full statistics). Progressive (SOF2) and
    the other SOF variants are PROBED: real width/height/channels from
    the frame header, ``progressive`` flagged, pixel statistics NULL —
    a curation filter still gets the metadata features. Raises
    ValueError on malformed streams.

    ``return_pixels=True`` returns the decoded HxWxC uint8 array
    instead of the statistics dict (the perceptual-hash seam,
    operators/imagehash.py); probe-only variants raise since they
    carry no pixels."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("JPEG: bad signature")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (progressive, precision, h, w, comps)
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: no length
            continue
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG: truncated segment")
        body_start = pos + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    )
                    p += 128
                if tbl.size != 64:
                    raise ValueError("JPEG: truncated DQT")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl.astype(np.int64)
                qt[tid] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                cnt = sum(bits)
                vals = list(seg[p : p + cnt])
                p += cnt
                table = _HuffTable(bits, vals)
                (huff_dc if cls == 0 else huff_ac)[tid] = table
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):  # SOFn
            precision = seg[0]
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq,
                })
            frame = (marker == 0xC2, precision, h, w, comps)
            if marker not in (0xC0, 0xC1):
                if return_pixels:
                    raise ValueError(
                        "JPEG: probe-only stream (progressive/arithmetic/"
                        "lossless) has no decoded pixels"
                    )
                # progressive / arithmetic / lossless: probe only
                return _probe_dict(h, w, nc, precision, marker == 0xC2)
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            px = _decode_scan(
                payload, body_start, seg, frame, qt, huff_dc, huff_ac,
                restart_interval,
            )
            if return_pixels:
                return px
            from .imagecodec import _stats

            out = _stats(px, "jpeg", frame[1])
            out["progressive"] = 0
            return out
        pos = body_start
    raise ValueError("JPEG: no scan data found")


def _probe_dict(h: int, w: int, nc: int, precision: int,
                progressive: bool) -> dict:
    return {
        "format": "jpeg", "width": int(w), "height": int(h),
        "channels": int(nc), "bit_depth": int(precision),
        "n_pixels": int(h * w), "mean": None, "std": None,
        "entropy": None, "progressive": 1 if progressive else 0,
    }


def _decode_scan(payload, data_start, sos_seg, frame, qt, huff_dc, huff_ac,
                 restart_interval):
    _, precision, h, w, comps = frame
    if precision != 8:
        raise ValueError(f"JPEG: {precision}-bit precision not supported")
    ns = sos_seg[0]
    scan_comps = []
    comp_by_id = {c["id"]: c for c in comps}
    for i in range(ns):
        cid = sos_seg[1 + 2 * i]
        tdta = sos_seg[2 + 2 * i]
        c = comp_by_id.get(cid)
        if c is None:
            raise ValueError("JPEG: scan references unknown component")
        scan_comps.append((c, tdta >> 4, tdta & 0x0F))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4):
            raise ValueError("JPEG: unsupported sampling factor")
    # per-component pixel planes, allocated at the MCU grid (an
    # interleaved scan writes ceil-to-MCU blocks, which can exceed the
    # component's own ceil(cw/8) block count when dims aren't multiples
    # of 8*hmax)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        cw = -(-w * c["h"] // hmax)  # ceil
        ch = -(-h * c["v"] // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        planes[c["id"]] = np.zeros(
            (max(bh, mcuy * c["v"]) * 8, max(bw, mcux * c["h"]) * 8),
            dtype=np.float64,
        )
        c["_cw"], c["_ch"], c["_bw"], c["_bh"] = cw, ch, bw, bh
    reader = _BitReader(payload, data_start)
    pred = {c["id"]: 0 for c in comps}

    def decode_block(c, td, ta, bx, by):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("JPEG: missing quantization table")
        dct = huff_dc.get(td)
        act = huff_ac.get(ta)
        if dct is None or act is None:
            raise ValueError("JPEG: missing Huffman table")
        zz = np.zeros(64, dtype=np.int64)
        t = reader.decode(dct)
        diff = _extend(reader.receive(t), t) if t else 0
        pred[c["id"]] += diff
        zz[0] = pred[c["id"]]
        k = 1
        while k < 64:
            rs = reader.decode(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG: AC index out of range")
            zz[k] = _extend(reader.receive(s), s)
            k += 1
        coeff = np.zeros(64, dtype=np.int64)
        coeff[ZIGZAG] = zz
        block = (_M.T @ (coeff.reshape(8, 8) * q) @ _M)
        plane = planes[c["id"]]
        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block

    if ns == 1:
        c, td, ta = scan_comps[0]
        total = c["_bw"] * c["_bh"]
        done = 0
        for by in range(c["_bh"]):
            for bx in range(c["_bw"]):
                decode_block(c, td, ta, bx, by)
                done += 1
                if restart_interval and done % restart_interval == 0 and done < total:
                    reader.align_and_expect_rst(done // restart_interval - 1)
                    for k in pred:
                        pred[k] = 0
    else:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        total = mcus_x * mcus_y
        done = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for c, td, ta in scan_comps:
                    for v in range(c["v"]):
                        for u in range(c["h"]):
                            decode_block(
                                c, td, ta, mx * c["h"] + u, my * c["v"] + v
                            )
                done += 1
                if restart_interval and done % restart_interval == 0 and done < total:
                    reader.align_and_expect_rst(done // restart_interval - 1)
                    for k in pred:
                        pred[k] = 0

    # level shift, round, clip, crop to component dims
    for cid, plane in planes.items():
        planes[cid] = np.clip(_round_half_up(plane + 128.0), 0, 255)
    if len(comps) == 1:
        c = comps[0]
        y = planes[c["id"]][: c["_ch"], : c["_cw"]]
        return y.astype(np.uint8)[:, :, None]
    if len(comps) != 3:
        raise ValueError(f"JPEG: {len(comps)}-component images not supported")
    # upsample chroma to the luma grid by sample replication, then JFIF
    # YCbCr -> RGB
    cy, ccb, ccr = comps[0], comps[1], comps[2]
    yp = planes[cy["id"]][:h, :w]
    full = []
    for c in (ccb, ccr):
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    cb, cr = full
    r = yp + 1.402 * (cr - 128.0)
    g = yp - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = yp + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(rgb), 0, 255).astype(np.uint8)


def probe_jpeg(payload: bytes) -> dict:
    """Metadata-only SOF probe (no entropy decode): dimensions,
    components, precision, progressive flag. Cheap path for
    inventory-style scans that do not need pixel statistics."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("JPEG: bad signature")
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seglen]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return _probe_dict(
                int.from_bytes(seg[1:3], "big"),
                int.from_bytes(seg[3:5], "big"),
                seg[5], seg[0], marker == 0xC2,
            )
        if marker == 0xDA:
            break
        pos += seglen
    raise ValueError("JPEG: no frame header found")


# -- encoder ------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (T.81 F.1.2.3)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(writer, zz, pred, dct, act):
    diff = int(zz[0]) - pred
    t = _category(diff)
    length, code = dct.enc[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = act.enc[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        length, code = act.enc[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        length, code = act.enc[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(
    pixels,
    quality: int = 50,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline-sequential JPEG encoder: 8-bit grayscale
    ((h, w) or (h, w, 1)) or RGB ((h, w, 3), converted to YCbCr with
    4:4:4 or 4:2:0 chroma subsampling); Annex K tables scaled by
    ``quality`` (50 = tables as published); optional DRI/RSTn restart
    markers every ``restart_interval`` MCUs. Deterministic — the
    fixture generator for tests and the correctness oracle, and the
    counterpart that exercises the decoder's interleaved-MCU,
    upsampling, and restart paths."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError("encode_jpeg: bad dimensions")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling: '444' or '420'")
    ql = scaled_quant_table(QUANT_LUMA, quality)
    qc = scaled_quant_table(QUANT_CHROMA, quality)
    if nc == 3:
        f = px.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(_round_half_up(p), 0, 255) for p in (y, cb, cr)]
        if subsampling == "420":
            # downsample chroma 2x2 by mean (pad to even first)
            ds = []
            for p in planes[1:]:
                pp = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                q4 = (pp[0::2, 0::2] + pp[0::2, 1::2]
                      + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
                ds.append(np.clip(_round_half_up(q4), 0, 255))
            planes = [planes[0]] + ds
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        comp_q = [(ql.reshape(8, 8), 0), (qc.reshape(8, 8), 1),
                  (qc.reshape(8, 8), 1)]
    else:
        planes = [px[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        comp_q = [(ql.reshape(8, 8), 0)]

    dc_l = _HuffTable(*DC_LUMA_SPEC)
    ac_l = _HuffTable(*AC_LUMA_SPEC)
    dc_c = _HuffTable(*DC_CHROMA_SPEC)
    ac_c = _HuffTable(*AC_CHROMA_SPEC)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT in zigzag order
    out += seg(0xDB, bytes([0x00]) + bytes(int(ql[z]) for z in ZIGZAG))
    if nc == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(int(qc[z]) for z in ZIGZAG))
    # SOF0
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for i in range(nc):
        hi, vi = samp[i]
        sof += bytes([i + 1, (hi << 4) | vi, comp_q[i][1]])
    out += seg(0xC0, sof)

    def dht(cls, tid, table):
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(table.bits)
                   + bytes(table.values))

    out += dht(0, 0, dc_l) + dht(1, 0, ac_l)
    if nc == 3:
        out += dht(0, 1, dc_c) + dht(1, 1, ac_c)
    if restart_interval:
        out += seg(0xDD, int(restart_interval).to_bytes(2, "big"))
    # SOS
    sos = bytes([nc])
    for i in range(nc):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad each component plane to its MCU-grid size by edge replication
    padded = []
    for (hi, vi), p in zip(samp, planes):
        ph, pw = p.shape
        padded.append(np.pad(
            p, ((0, mcus_y * vi * 8 - ph), (0, mcus_x * hi * 8 - pw)),
            mode="edge",
        ))
    writer = _BitWriter()
    preds = [0] * nc
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (nc - 1)
    total = mcus_x * mcus_y
    done = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                hi, vi = samp[ci]
                for v in range(vi):
                    for u in range(hi):
                        by, bx = my * vi + v, mx * hi + u
                        block = padded[ci][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ]
                        coeff = _M @ (block - 128.0) @ _M.T
                        q = _quantize(coeff, comp_q[ci][0])
                        zz = q.reshape(-1)[ZIGZAG]  # zz[k]=q.flat[ZIGZAG[k]]
                        preds[ci] = _encode_block(
                            writer, zz, preds[ci], *tables[ci]
                        )
            done += 1
            if restart_interval and done % restart_interval == 0 and done < total:
                writer.flush()
                out += writer.out
                out += bytes([0xFF, 0xD0 + (done // restart_interval - 1) % 8])
                writer = _BitWriter()
                preds = [0] * nc
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def solid_jpeg(width: int, height: int, gray: int, quality: int = 50) -> bytes:
    """Deterministic solid-gray baseline JPEG — the oracle-expressible
    fixture: a constant block has DC = 8*(gray-128) and zero AC, so the
    decoded constant is clip(floor(round_away(8*(gray-128)/Q00)*Q00/8
    + 128.5)) with Q00 = scaled Annex K [0,0] (16 at quality=50)."""
    return encode_jpeg(
        np.full((height, width), gray, dtype=np.uint8), quality=quality
    )


def expected_solid_gray(gray: int, quality: int = 50) -> int:
    """The closed-form decoded value of a ``solid_jpeg`` fixture —
    mirrors the SQL the oracle states (docstring of solid_jpeg)."""
    q00 = int(scaled_quant_table(QUANT_LUMA, quality)[0])
    dc = 8 * (gray - 128)
    qdc = int(np.sign(dc) * np.floor(abs(dc) / q00 + 0.5)) * q00
    return int(np.clip(np.floor(qdc / 8.0 + 128.5), 0, 255))
