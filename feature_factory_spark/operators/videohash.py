"""Perceptual video fingerprinting + near-duplicate video detection.

The reference has no video operators at all (SURVEY.md §2.3); this is
the last cell of the modality matrix — text, images
(operators/imagehash.py), and audio (operators/audiohash.py) already
have near-dup paths; video gets one built from the pieces that exist:

- :func:`videocodec.mp4_samples` demuxes frame payloads out of the
  REAL ISO BMFF sample tables (stsc x stsz x stco) — container-level,
  codec-opaque. For MJPEG/PNG-in-MP4 layouts the samples are directly
  decodable images; for compressed codecs, ``frame_decoder=`` swaps in
  a library-backed ``bytes -> HxWxC uint8`` exactly like the other
  decoder seams.
- :func:`video_fingerprint_bits` temporally pools per-frame perceptual
  hashes (imagehash.dhash_bits/phash_bits) into one 64-bit signature
  by strict per-bit majority vote — the standard temporal pooling of
  frame-level hashes: stable under dropped/inserted frames as long as
  most sampled frames agree, and a re-encode that preserves most frame
  content preserves the majority.
- :class:`VideoHasher`: Arrow-batched ``mapInPandas`` over a binary
  video column -> int64 signature. Narrow map, no shuffle; the
  per-batch Python is confined to demux + frame decode.
- :class:`VideoDeduplicator`: the same pigeonhole Hamming blocking +
  exact ``bit_count(XOR)`` verification and persisted-index recrawl
  surface (``write_index`` / ``dedupe_against``) as SimHash / image /
  audio dedup (dedup.HammingIndexMixin). Never all-pairs; the
  signature is 8 bytes per video, so the pair stage never touches
  frames.
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
from .imagehash import _HASHERS, decode_pixels, pack_bits


def video_fingerprint_bits(frame_hashes: list[int]) -> int | None:
    """Temporal pooling: bit k of the video signature = 1 iff a STRICT
    majority of frame hashes have bit k set (ties -> 0, so the fold is
    deterministic for even frame counts). None for an empty list —
    the NULL-hash contract."""
    hs = [h for h in frame_hashes if h is not None]
    if not hs:
        return None
    u = np.array([h & 0xFFFFFFFFFFFFFFFF for h in hs], dtype=np.uint64)
    counts = np.zeros(64, dtype=np.int64)
    for k in range(64):
        counts[k] = int(((u >> np.uint64(k)) & np.uint64(1)).sum())
    return pack_bits(counts * 2 > len(hs))


def sample_evenly(items: list, k: int) -> list:
    """At most k items, evenly spaced across the list (first sample at
    index 0) — the deterministic frame-subsample rule."""
    n = len(items)
    if n <= k:
        return list(items)
    return [items[(i * n) // k] for i in range(k)]


def extract_frames(payload: bytes) -> list[bytes]:
    """Lenient demux: frame payloads of the first video track, [] on
    non-MP4/corrupt/sample-table-free input (one bad blob must not
    fail a scan task)."""
    import struct

    from .videocodec import mp4_samples

    try:
        return mp4_samples(payload)
    except (ValueError, struct.error, IndexError):
        return []


def pattern_mp4(pattern: int, n_frames: int = 3) -> bytes:
    """Deterministic MP4 whose video fingerprint equals ``pattern``
    EXACTLY: ``n_frames`` identical gradient-pattern PNGs
    (imagehash.pattern_png) carried in real sample tables — every
    frame dHash equals the pattern, so the majority fold does too.
    The oracle fixture for the video-dedup pipeline."""
    from .imagehash import pattern_png
    from .videocodec import synth_mp4

    frame = pattern_png(pattern)
    return synth_mp4(
        float(n_frames), 18, 16, frames=[frame] * n_frames
    )


class VideoHasher(Transformer):
    """Append a perceptual video-signature column (int64) computed
    from a binary video column: ``{prefix}vhash``.

    Per video: demux frame payloads from the container's sample tables
    (``extract_frames``), subsample at most ``n_frames`` evenly, decode
    each frame (``frame_decoder=``, default the stdlib image decoders
    — swap in a codec-library ``bytes -> HxWxC uint8`` for compressed
    streams), hash each with ``method`` (dhash/phash), and fold by
    per-bit majority. Videos with no extractable/decodable frames (and
    NULL payloads) yield NULL signatures.

    Narrow Arrow-batched map — no shuffle, partitioning preserved."""

    def __init__(
        self,
        binary_col: str,
        n_frames: int = 4,
        method: str = "dhash",
        hash_size: int = 8,
        prefix: str | None = None,
        frame_decoder: Callable[[bytes], np.ndarray | None] | None = None,
    ):
        ensure(n_frames >= 1, "n_frames must be >= 1")
        ensure(method in _HASHERS, f"method must be one of {sorted(_HASHERS)}")
        ensure(hash_size * hash_size <= 64,
               "hash_size^2 must fit the 64-bit signature")
        self.binary_col = binary_col
        self.n_frames = n_frames
        self.method = method
        self.hash_size = hash_size
        self.prefix = prefix if prefix is not None else f"{binary_col}_"
        self.frame_decoder = frame_decoder or decode_pixels

    def _out_col(self) -> str:
        return f"{self.prefix}vhash"

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.binary_col])
        if not isinstance(df.schema[self.binary_col].dataType, T.BinaryType):
            raise ValueError(
                f"column '{self.binary_col}' must be binary, got "
                f"{df.schema[self.binary_col].dataType.simpleString()}"
            )
        ensure(
            self._out_col() not in df.columns,
            f"signature column '{self._out_col()}' already exists; pass a "
            "different prefix",
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        out_col = self._out_col()
        out_schema = T.StructType(
            list(df.schema.fields) + [T.StructField(out_col, T.LongType(), True)]
        )
        bin_col = self.binary_col
        n_frames = self.n_frames
        hasher = _HASHERS[self.method]
        hash_size = self.hash_size
        frame_decoder = self.frame_decoder

        def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals: list[int | None] = []
                for payload in pdf[bin_col]:
                    if payload is None:
                        vals.append(None)
                        continue
                    frames = sample_evenly(
                        extract_frames(bytes(payload)), n_frames
                    )
                    hs = []
                    for fb in frames:
                        px = frame_decoder(fb)
                        if px is not None:
                            hs.append(hasher(px, hash_size))
                    vals.append(video_fingerprint_bits(hs))
                pdf[out_col] = pd.array(vals, dtype="Int64")
                yield pdf

        return df.mapInPandas(hash_batches, schema=out_schema)


class VideoDeduplicator(HammingIndexMixin, Transformer):
    """Near-duplicate video removal: temporally-pooled perceptual
    signature + pigeonhole Hamming blocking + exact ``bit_count(XOR)``
    verification — the video member of the SimHash/image/audio dedup
    family, sharing their candidate machinery
    (dedup.hamming_blocked_pairs), drop policies, and the
    persisted-index recrawl surface (``write_index(df, path)`` /
    ``dedupe_against(new_df, path)``, HammingIndexMixin).

    ``hash_col=None`` (default) demuxes+hashes ``binary_col`` with
    :class:`VideoHasher`; passing ``hash_col`` reuses a precomputed
    int64 signature column and skips demux/decode entirely — hash
    once, dedup every snapshot. Videos that yield no frames (NULL
    signature) are never candidates and always survive.

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
        n_frames: int = 4,
        method: str = "dhash",
        hash_size: int = 8,
        frame_decoder: Callable[[bytes], np.ndarray | None] | None = None,
        policy: str = "greedy",
        index_buckets: int = 64,
    ):
        ensure(
            (binary_col is None) != (hash_col is None),
            "exactly one of binary_col / hash_col is required",
        )
        ensure(0 <= hamming_threshold <= 63, "hamming_threshold in [0,63]")
        ensure(method in _HASHERS, f"method must be one of {sorted(_HASHERS)}")
        ensure(index_buckets >= 1, "index_buckets must be >= 1")
        self.id_col = id_col
        self.binary_col = binary_col
        self.hash_col = hash_col
        self.hamming_threshold = hamming_threshold
        self.n_chunks = hamming_threshold + 1
        self.n_frames = n_frames
        self.method = method
        self.hash_size = hash_size
        self.frame_decoder = frame_decoder
        self.policy = policy
        self.index_buckets = index_buckets

    @property
    def n_bits(self) -> int:
        return self.N_BITS

    def _index_meta(self) -> dict:
        return {
            "kind": "videohash",
            "method": self.method,
            "n_frames": self.n_frames,
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
            hasher = VideoHasher(
                self.binary_col,
                n_frames=self.n_frames,
                method=self.method,
                hash_size=self.hash_size,
                prefix="__ff_vh_",
                frame_decoder=self.frame_decoder,
            )
            sig = hasher.transform(
                df.select(F.col(self.id_col).alias("id"), self.binary_col)
            ).select("id", F.col("__ff_vh_vhash").alias("sig"))
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
