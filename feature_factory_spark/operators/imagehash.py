"""Perceptual image hashing + near-duplicate image detection.

The reference has no image operators at all (SURVEY.md §2.3); this is
the beyond-reference multimodal surface (VERDICT r7 item 1): decoded
images (operators/imagecodec.py, jpegcodec.py) get the same dedup
treatment the text side has had since r3.

- :func:`dhash_bits` / :func:`phash_bits`: the two standard perceptual
  hashes from their public descriptions (difference hash: adjacent-
  column gradient signs on a (hash_size+1) x hash_size area-downscale;
  perceptual hash: sign-vs-median of the top-left DCT-II block of a
  32x32 downscale). Pure numpy, deterministic — no PIL dependency, so
  signatures are reproducible bit-for-bit anywhere.
- :class:`ImageHasher`: Arrow-batched ``mapInPandas`` over a binary
  image column -> int64 hash column(s). A narrow map: partitioning
  preserved, no shuffle, the per-batch Python confined to byte
  decoding exactly like BinaryFeatureExtractor (multimodal.py).
- :class:`ImageDeduplicator`: hash column -> candidate pairs via the
  SAME pigeonhole chunk blocking SimHashDeduplicator uses
  (dedup.hamming_blocked_pairs — hamming_threshold+1 chunks, exact
  recall at the threshold), verified with exact ``bit_count(XOR)``.
  Never all-pairs: at 100 TB the blocking join touches only rows
  sharing a chunk value, and the drop policies are the shared
  greedy/components pair consumers.

Scale notes: the hash is 8 bytes per image — the pair stage never
touches pixels. A corpus-wide run is one narrow decode pass plus one
chunk-blocked self-join on an int key. Lower
``spark.sql.execution.arrow.maxRecordsPerBatch`` for very large
payloads (see multimodal.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pipeline import Transformer
from ..validation import ensure, validate_columns
from .dedup import HammingIndexMixin, _drop_by_policy, hamming_blocked_pairs

# ITU-R BT.601 luma weights — the standard RGB->gray reduction every
# perceptual-hash implementation documents
_LUMA = np.array([0.299, 0.587, 0.114])


def decode_pixels(payload: bytes) -> np.ndarray | None:
    """Decoded HxWxC uint8 pixels for any fully-decodable stdlib format
    (PNG/BMP/PGM/PPM/baseline-JPEG), None for probe-only or
    unrecognized/corrupt payloads — the lenient per-row contract of the
    decoder seams (one bad blob must not fail a scan task)."""
    import struct
    import zlib

    from .imagecodec import _DECODERS

    try:
        if payload[:3] == b"\xff\xd8\xff":
            from .jpegcodec import decode_jpeg

            return decode_jpeg(payload, return_pixels=True)
        for magic, _fmt, fn in _DECODERS:
            if payload[: len(magic)] == magic:
                px, _bit_depth = fn(payload)
                return px
        return None
    except (ValueError, struct.error, zlib.error, IndexError):
        return None


def to_gray(px: np.ndarray) -> np.ndarray:
    """HxWxC -> HxW float64 luma (BT.601; alpha ignored; gray and
    gray+alpha pass the first channel through)."""
    if px.ndim == 2:
        return px.astype(np.float64)
    c = px.shape[2]
    if c >= 3:
        return px[:, :, :3].astype(np.float64) @ _LUMA
    return px[:, :, 0].astype(np.float64)


def area_resize(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Exact box-filter (area-average) downscale to (out_h, out_w):
    each output cell is the overlap-weighted mean of the source pixels
    its box covers — PIL's BOX filter semantics, implemented as two 1-D
    weight matrices so integer-ratio resizes are exact block means."""

    def weights(n_in: int, n_out: int) -> np.ndarray:
        w = np.zeros((n_out, n_in))
        scale = n_in / n_out
        for o in range(n_out):
            start, end = o * scale, (o + 1) * scale
            i0, i1 = int(np.floor(start)), min(int(np.ceil(end)), n_in)
            for i in range(i0, i1):
                w[o, i] = min(i + 1.0, end) - max(float(i), start)
            w[o] /= w[o].sum()
        return w

    h, w = gray.shape
    return weights(h, out_h) @ gray.astype(np.float64) @ weights(w, out_w).T


def pack_bits(bits: np.ndarray) -> int:
    """Boolean array (length <= 64, bit k = element k) -> SIGNED 64-bit
    int (bit 63 carries -2^63), the same representation SimHash
    signatures use so hamming_blocked_pairs / bit_count(XOR) apply
    unchanged."""
    v = 0
    for k in np.nonzero(bits.ravel())[0]:
        v |= 1 << int(k)
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash_bits(px: np.ndarray, hash_size: int = 8) -> int:
    """Difference hash: area-downscale the luma to
    (hash_size+1) x hash_size, bit r*hash_size+c = 1 iff
    g[r, c+1] > g[r, c] (horizontal gradient sign). Robust to
    re-encoding, scaling, and global brightness shifts (gradients are
    translation-invariant in intensity)."""
    g = area_resize(to_gray(px), hash_size + 1, hash_size)
    return pack_bits((g[:, 1:] > g[:, :-1]))


def phash_bits(px: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4) -> int:
    """Perceptual hash: 2-D DCT-II of the luma downscaled to
    (hash_size*highfreq_factor)^2, keep the top-left hash_size^2
    low-frequency block, bit = coefficient > median of the block
    excluding the DC term (DC excluded from the median, per the
    published algorithm, so global brightness cannot flip half the
    bits)."""
    n = hash_size * highfreq_factor
    g = area_resize(to_gray(px), n, n)
    k = np.arange(n)
    # DCT-II basis (unnormalized — threshold-vs-median is scale-free)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    d = m @ g @ m.T
    block = d[:hash_size, :hash_size].ravel()
    med = np.median(block[1:])
    bits = block > med
    bits[0] = False  # DC term carries no structure; keep it stable
    return pack_bits(bits)


_HASHERS: dict[str, Callable[[np.ndarray], int]] = {
    "dhash": dhash_bits,
    "phash": phash_bits,
}


def pattern_png(pattern: int, block: int = 2) -> bytes:
    """Deterministic grayscale PNG whose dHash equals ``pattern``
    EXACTLY — the oracle fixture for the image-dedup pipeline (the
    solid_png/make_mp3 fixture precedent).

    Construction: a 9x8 grid of gray values where each row walks
    +2/-2 from 128 according to the pattern's bits (bit r*8+c set
    means column c+1 is brighter than column c), upscaled by
    ``block`` so the decode -> area-resize -> gradient-sign chain is
    exercised with exact integer block means. Values stay in
    [112, 144], so the +-2 steps survive the resize unambiguously."""
    p = pattern & 0xFFFFFFFFFFFFFFFF
    px = np.zeros((8, 9), dtype=np.int64)
    for r in range(8):
        v = 128
        px[r, 0] = v
        for c in range(8):
            v = v + (2 if (p >> (r * 8 + c)) & 1 else -2)
            px[r, c + 1] = v
    from .imagecodec import encode_png

    big = np.repeat(np.repeat(px, block, 0), block, 1).astype(np.uint8)
    return encode_png(big, color_type=0)


class ImageHasher(Transformer):
    """Append perceptual-hash column(s) computed from a binary image
    column: ``{prefix}{method}`` (int64) per requested method.

    ``methods`` is a subset of {'dhash', 'phash'}; undecodable or
    probe-only payloads (and NULL payloads) yield NULL hashes. The
    decode runs once per row regardless of how many hashes are
    requested. ``decoder=`` swaps the pixel source (e.g. a
    PIL/turbojpeg-backed ``bytes -> HxWxC uint8`` for production
    throughput) without touching the hash math — the same pluggable
    seam as BinaryFeatureExtractor.

    Narrow Arrow-batched map — no shuffle, partitioning preserved."""

    def __init__(
        self,
        binary_col: str,
        methods: list[str] | None = None,
        hash_size: int = 8,
        prefix: str | None = None,
        decoder: Callable[[bytes], np.ndarray | None] | None = None,
    ):
        methods = list(methods) if methods is not None else ["dhash"]
        ensure(bool(methods), "at least one hash method is required")
        bad = [m for m in methods if m not in _HASHERS]
        ensure(not bad, f"unknown hash method(s) {bad}; pick from "
                        f"{sorted(_HASHERS)}")
        ensure(hash_size >= 2, "hash_size must be >= 2")
        ensure(
            hash_size * hash_size <= 64,
            "hash_size^2 must fit the 64-bit signature",
        )
        self.binary_col = binary_col
        self.methods = methods
        self.hash_size = hash_size
        self.prefix = prefix if prefix is not None else f"{binary_col}_"
        self.decoder = decoder or decode_pixels

    def _out_cols(self) -> list[str]:
        return [f"{self.prefix}{m}" for m in self.methods]

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.binary_col])
        if not isinstance(df.schema[self.binary_col].dataType, T.BinaryType):
            raise ValueError(
                f"column '{self.binary_col}' must be binary, got "
                f"{df.schema[self.binary_col].dataType.simpleString()}"
            )
        clash = [c for c in self._out_cols() if c in df.columns]
        ensure(not clash, f"hash column(s) {clash} already exist; pass a "
                          "different prefix")

    def _transform(self, df: DataFrame) -> DataFrame:
        out_schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField(c, T.LongType(), True) for c in self._out_cols()]
        )
        bin_col = self.binary_col
        decoder = self.decoder
        hash_size = self.hash_size
        methods = list(self.methods)
        out_cols = self._out_cols()

        def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals: dict[str, list] = {c: [] for c in out_cols}
                for payload in pdf[bin_col]:
                    px = (
                        decoder(bytes(payload))
                        if payload is not None
                        else None
                    )
                    for m, c in zip(methods, out_cols):
                        vals[c].append(
                            _HASHERS[m](px, hash_size)
                            if px is not None
                            else None
                        )
                for c in out_cols:
                    pdf[c] = pd.array(vals[c], dtype="Int64")
                yield pdf

        return df.mapInPandas(hash_batches, schema=out_schema)


class ImageDeduplicator(HammingIndexMixin, Transformer):
    """Near-duplicate image removal: perceptual hash + pigeonhole
    Hamming blocking + exact ``bit_count(XOR)`` verification — the
    image twin of SimHashDeduplicator, sharing its candidate machinery
    (dedup.hamming_blocked_pairs) and drop policies.

    The recrawl surface comes with it (``HammingIndexMixin``):
    ``write_index(df, path)`` persists the corpus's hash chunks
    partitioned by (chunk, bucket); ``dedupe_against(new_df, path)``
    dedups an image snapshot against the accumulated corpus with a
    file-pruned probe — hash once, dedupe every snapshot.

    ``hash_col=None`` (default) decodes+hashes ``binary_col`` with
    :class:`ImageHasher` (``method``/``hash_size``/``decoder``);
    passing ``hash_col`` reuses a precomputed int64 hash column and
    skips the decode entirely — the shape an iterative pipeline wants
    (hash once, dedup each snapshot). Images that fail to decode (NULL
    hash) are never candidates and always survive.

    transform() drops rows per ``policy`` ('greedy': pairs with a
    smaller id; 'components': exact transitive clusters);
    candidate_pairs() exposes the verified (a_id, b_id, hamming)
    frame."""

    N_BITS = 64

    def __init__(
        self,
        id_col: str,
        binary_col: str | None = None,
        hash_col: str | None = None,
        hamming_threshold: int = 2,
        method: str = "dhash",
        hash_size: int = 8,
        decoder: Callable[[bytes], np.ndarray | None] | None = None,
        policy: str = "greedy",
        index_buckets: int = 64,
    ):
        ensure(
            (binary_col is None) != (hash_col is None),
            "exactly one of binary_col / hash_col is required",
        )
        ensure(
            0 <= hamming_threshold <= 63,
            "hamming_threshold in [0,63]",
        )
        ensure(method in _HASHERS, f"method must be one of {sorted(_HASHERS)}")
        ensure(index_buckets >= 1, "index_buckets must be >= 1")
        self.id_col = id_col
        self.binary_col = binary_col
        self.hash_col = hash_col
        self.hamming_threshold = hamming_threshold
        self.n_chunks = hamming_threshold + 1
        self.method = method
        self.hash_size = hash_size
        self.decoder = decoder
        self.policy = policy
        self.index_buckets = index_buckets

    @property
    def n_bits(self) -> int:
        return self.N_BITS

    def _index_meta(self) -> dict:
        return {
            "kind": "imagehash",
            "method": self.method,
            "hash_size": self.hash_size,
            "hamming_threshold": self.hamming_threshold,
            "n_buckets": self.index_buckets,
        }

    def _check_input(self, df: DataFrame) -> None:
        cols = [self.id_col]
        if self.hash_col is not None:
            cols.append(self.hash_col)
        validate_columns(df, cols)

    def _sig_frame(self, df: DataFrame) -> DataFrame:
        if self.hash_col is not None:
            sig = df.select(
                F.col(self.id_col).alias("id"),
                F.col(self.hash_col).cast("bigint").alias("sig"),
            )
        else:
            hasher = ImageHasher(
                self.binary_col,
                methods=[self.method],
                hash_size=self.hash_size,
                prefix="__ff_ih_",
                decoder=self.decoder,
            )
            sig = hasher.transform(
                df.select(F.col(self.id_col).alias("id"), self.binary_col)
            ).select("id", F.col(f"__ff_ih_{self.method}").alias("sig"))
        return sig.where(F.col("sig").isNotNull())

    def candidate_pairs(self, df: DataFrame) -> DataFrame:
        """Verified pairs (a_id, b_id, hamming), a_id < b_id."""
        self._check_input(df)
        return hamming_blocked_pairs(
            self._sig_frame(df), self.N_BITS, self.hamming_threshold
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return _drop_by_policy(
            df, self.id_col, self.candidate_pairs(df), self.policy
        )
