"""Perceptual audio fingerprinting + near-duplicate audio detection.

The reference has no audio operators at all (SURVEY.md §2.3); this
completes the modality matrix of the beyond-reference dedup surface —
text (six families), images (operators/imagehash.py, r8), and now
decoded audio (operators/audiocodec.py) get the same near-dup
treatment.

- :func:`audio_fingerprint_bits`: a 64-bit simplification of the
  published sign-of-band-energy-difference scheme (Haitsma & Kalker
  2002, "A Highly Robust Audio Fingerprinting System"): split the mono
  signal into ``N_FRAMES`` equal time frames, measure spectral energy
  in ``N_BANDS`` fixed Nyquist-fraction bands per frame (rFFT), and
  set bit ``t * N_BANDS + b`` iff band ``b``'s energy RISES from frame
  ``t`` to ``t + 1``. Sixteen time deltas x four bands = 64 bits, the
  same signed-int64 signature representation SimHash and the image
  hashes use. Energy-difference signs are invariant to global gain
  (scaling every energy by g^2 preserves order) and robust to
  re-quantization; time frames are fractions of the clip so the
  fingerprint survives resampling that preserves duration.
- :class:`AudioHasher`: Arrow-batched ``mapInPandas`` over a binary
  audio column -> int64 fingerprint column. Narrow map: partitioning
  preserved, no shuffle, the per-batch Python confined to byte
  decoding exactly like BinaryFeatureExtractor (multimodal.py).
- :class:`AudioDeduplicator`: fingerprint -> candidate pairs via the
  SAME pigeonhole chunk blocking SimHash/ImageDeduplicator use
  (dedup.hamming_blocked_pairs), verified with exact
  ``bit_count(XOR)``, plus the persisted-index recrawl surface
  (``write_index`` / ``dedupe_against``) from HammingIndexMixin.
  Never all-pairs: at 100 TB the blocking join touches only rows
  sharing a chunk value, and the fingerprint is 8 bytes per clip —
  the pair stage never touches PCM.
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
from .imagehash import pack_bits

N_FRAMES = 17  # 16 time deltas
N_BANDS = 4
# band edges as fractions of Nyquist: a DC-excluding low band plus
# octave-ish steps, so a sample-rate change with preserved content maps
# the same spectral mass into the same bands
BAND_EDGES = (0.03125, 0.125, 0.3125, 0.625, 1.0)


def decode_samples(payload: bytes) -> tuple[np.ndarray, int] | None:
    """(mono float64 samples, sample_rate) for fully-decodable payloads
    (WAV PCM/float), None for probe-only formats (MP3/FLAC/Ogg) or
    unrecognized/corrupt bytes — the lenient per-row contract of the
    decoder seams (one bad blob must not fail a scan task)."""
    import struct

    from .audiocodec import decode_wav_samples

    if payload[:4] != b"RIFF":
        return None
    try:
        return decode_wav_samples(payload)
    except (ValueError, struct.error):
        return None


def band_energies(
    mono: np.ndarray, sample_rate: int, n_frames: int = N_FRAMES
) -> np.ndarray | None:
    """(n_frames, N_BANDS) spectral energy matrix: the signal is cut
    into ``n_frames`` equal non-overlapping frames, each rFFT'd, and
    |X[k]|^2 summed over the bins of each Nyquist-fraction band. None
    when the clip is too short to resolve the lowest band (every band
    must own at least one bin: frame_len >= 2 / BAND_EDGES[0])."""
    n = int(mono.size)
    flen = n // n_frames
    if flen < 2:
        return None
    frames = mono[: flen * n_frames].reshape(n_frames, flen)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    freqs = np.fft.rfftfreq(flen, d=1.0 / sample_rate)
    nyq = sample_rate / 2.0
    e = np.empty((n_frames, N_BANDS))
    for b in range(N_BANDS):
        m = (freqs >= BAND_EDGES[b] * nyq) & (freqs < BAND_EDGES[b + 1] * nyq)
        if not m.any():
            return None
        e[:, b] = spec[:, m].sum(axis=1)
    return e


def audio_fingerprint_bits(
    mono: np.ndarray, sample_rate: int, n_frames: int = N_FRAMES
) -> int | None:
    """64-bit perceptual audio fingerprint: bit ``t * N_BANDS + b`` = 1
    iff band ``b``'s energy strictly rises from frame ``t`` to ``t+1``
    (ties -> 0, so silence hashes to 0 deterministically). None for
    clips too short to frame/band (the NULL-hash contract)."""
    e = band_energies(np.asarray(mono, dtype=np.float64), sample_rate, n_frames)
    if e is None:
        return None
    return pack_bits((e[1:] > e[:-1]).ravel())


def pattern_wav(
    pattern: int, sample_rate: int = 8000, frame_len: int = 256
) -> bytes:
    """Deterministic 16-bit WAV whose audio fingerprint equals
    ``pattern`` EXACTLY — the oracle fixture for the audio-dedup
    pipeline (the pattern_png / constant_wav fixture precedent).

    Construction: 17 frames of ``frame_len`` samples; each frame is a
    sum of four pure tones placed at exact rFFT bin centers inside the
    four bands (bins scale with frame_len so band membership is exact
    at any power-of-two length >= 128). Tone amplitudes walk a
    multiplicative +-5% step per frame according to the pattern's bits
    (bit t*4+b set means band b is louder in frame t+1 than in frame
    t), so each band's energy ordering is controlled exactly. The
    amplitude envelope stays within [0.045, 0.22] per tone (sum < 0.9),
    and adjacent frame energies differ by ~10% — orders of magnitude
    above 16-bit quantization noise, so the decode -> frame -> rFFT ->
    band-energy -> sign chain reproduces the pattern bit-for-bit."""
    ensure(frame_len >= 128 and frame_len & (frame_len - 1) == 0,
           "frame_len must be a power of two >= 128")
    # bins at band centers, as fractions of frame_len (nyquist bin =
    # frame_len // 2): bands cover bins [4,16) [16,40) [40,80) [80,128)
    # when frame_len == 256
    tone_bins = [frame_len // 32, 3 * frame_len // 32,
                 7 * frame_len // 32, 3 * frame_len // 8]
    p = pattern & 0xFFFFFFFFFFFFFFFF
    walk = np.zeros((N_FRAMES, N_BANDS))
    for t in range(N_FRAMES - 1):
        for b in range(N_BANDS):
            step = 1.0 if (p >> (t * N_BANDS + b)) & 1 else -1.0
            walk[t + 1, b] = walk[t, b] + step
    amps = 0.1 * 1.05 ** walk
    k = np.arange(frame_len)
    tones = np.stack(
        [np.sin(2.0 * np.pi * j * k / frame_len) for j in tone_bins]
    )  # (N_BANDS, frame_len)
    sig = (amps @ tones).ravel()  # (N_FRAMES * frame_len,)
    from .audiocodec import encode_wav

    return encode_wav(sig, sample_rate, channels=1, bits=16)


class AudioHasher(Transformer):
    """Append a perceptual audio-fingerprint column (int64) computed
    from a binary audio column: ``{prefix}afp``.

    Undecodable, probe-only, or too-short payloads (and NULL payloads)
    yield NULL fingerprints. ``decoder=`` swaps the PCM source (e.g. a
    soundfile/ffmpeg-backed ``bytes -> (mono, sample_rate)`` for
    compressed formats) without touching the fingerprint math — the
    same pluggable seam as ImageHasher/BinaryFeatureExtractor.

    Narrow Arrow-batched map — no shuffle, partitioning preserved."""

    def __init__(
        self,
        binary_col: str,
        prefix: str | None = None,
        n_frames: int = N_FRAMES,
        decoder: Callable[[bytes], tuple[np.ndarray, int] | None] | None = None,
    ):
        ensure(
            2 <= n_frames and (n_frames - 1) * N_BANDS <= 64,
            "n_frames must satisfy 2 <= n_frames <= 17 (64-bit signature)",
        )
        self.binary_col = binary_col
        self.prefix = prefix if prefix is not None else f"{binary_col}_"
        self.n_frames = n_frames
        self.decoder = decoder or decode_samples

    def _out_col(self) -> str:
        return f"{self.prefix}afp"

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.binary_col])
        if not isinstance(df.schema[self.binary_col].dataType, T.BinaryType):
            raise ValueError(
                f"column '{self.binary_col}' must be binary, got "
                f"{df.schema[self.binary_col].dataType.simpleString()}"
            )
        ensure(
            self._out_col() not in df.columns,
            f"fingerprint column '{self._out_col()}' already exists; pass "
            "a different prefix",
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        out_col = self._out_col()
        out_schema = T.StructType(
            list(df.schema.fields) + [T.StructField(out_col, T.LongType(), True)]
        )
        bin_col = self.binary_col
        decoder = self.decoder
        n_frames = self.n_frames

        def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals: list[int | None] = []
                for payload in pdf[bin_col]:
                    decoded = (
                        decoder(bytes(payload)) if payload is not None else None
                    )
                    vals.append(
                        audio_fingerprint_bits(decoded[0], decoded[1], n_frames)
                        if decoded is not None
                        else None
                    )
                pdf[out_col] = pd.array(vals, dtype="Int64")
                yield pdf

        return df.mapInPandas(hash_batches, schema=out_schema)


class AudioDeduplicator(HammingIndexMixin, Transformer):
    """Near-duplicate audio removal: perceptual fingerprint +
    pigeonhole Hamming blocking + exact ``bit_count(XOR)``
    verification — the audio twin of SimHash/ImageDeduplicator,
    sharing their candidate machinery (dedup.hamming_blocked_pairs),
    drop policies, and the persisted-index recrawl surface
    (``write_index(df, path)`` / ``dedupe_against(new_df, path)``,
    HammingIndexMixin).

    ``hash_col=None`` (default) decodes+fingerprints ``binary_col``
    with :class:`AudioHasher` (``decoder=`` for non-WAV codecs);
    passing ``hash_col`` reuses a precomputed int64 fingerprint column
    and skips the decode entirely — hash once, dedup every snapshot.
    Clips that fail to decode (NULL fingerprint) are never candidates
    and always survive.

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
        n_frames: int = N_FRAMES,
        decoder: Callable[[bytes], tuple[np.ndarray, int] | None] | None = None,
        policy: str = "greedy",
        index_buckets: int = 64,
    ):
        ensure(
            (binary_col is None) != (hash_col is None),
            "exactly one of binary_col / hash_col is required",
        )
        ensure(0 <= hamming_threshold <= 63, "hamming_threshold in [0,63]")
        ensure(index_buckets >= 1, "index_buckets must be >= 1")
        self.id_col = id_col
        self.binary_col = binary_col
        self.hash_col = hash_col
        self.hamming_threshold = hamming_threshold
        self.n_chunks = hamming_threshold + 1
        self.n_frames = n_frames
        self.decoder = decoder
        self.policy = policy
        self.index_buckets = index_buckets

    @property
    def n_bits(self) -> int:
        return self.N_BITS

    def _index_meta(self) -> dict:
        return {
            "kind": "audiohash",
            "n_frames": self.n_frames,
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
            hasher = AudioHasher(
                self.binary_col,
                prefix="__ff_ah_",
                n_frames=self.n_frames,
                decoder=self.decoder,
            )
            sig = hasher.transform(
                df.select(F.col(self.id_col).alias("id"), self.binary_col)
            ).select("id", F.col("__ff_ah_afp").alias("sig"))
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
