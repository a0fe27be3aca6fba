"""Multimodal (binary) column operators.

Images/audio/video are carried as opaque ``binary`` columns plus typed
metadata, the standard lakehouse layout for multimodal training data.
The Spark-side plumbing — schema contract, Arrow-batched ``mapInPandas``,
partition-preserving projection — is real and tested, and so is the
default decoding: REAL pure-stdlib codecs live in
``operators/imagecodec.py`` (PNG/BMP/PPM pixels), ``audiocodec.py``
(WAV-PCM samples), and ``videocodec.py`` (ISO-BMFF container probe),
wired in by ``sources.io.read_media``. The ``decoder=`` seam stays
pluggable so a native decoder (PIL / torchaudio / decord ...) can slot
into the identical contract; ``stub_decoder`` remains as the byte-level
fallback for formats none of the built-in codecs recognize.

This is the one place in the engine where Python executes per batch: by
design it uses ``mapInPandas`` (Arrow columnar transfer, vectorized
pandas ops) rather than row-at-a-time UDFs. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``; binary payloads make
batches wide, so pipelines at 100 TB should lower it (e.g. 1k rows) to
bound executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exceptions import InvalidParameterError
from ..pipeline import Transformer
from ..validation import ensure, validate_columns


def stub_decoder(payload: bytes) -> dict:
    """Deterministic fake 'decode' used where real media libs are absent.

    Returns byte-level features only — it does NOT decode media. Swap in a
    real decoder (PIL / torchaudio / decord ...) via
    ``BinaryFeatureExtractor(decoder=...)``; the Spark-side contract is
    identical."""
    return {
        "payload_len": len(payload),
        "payload_md5": hashlib.md5(payload).hexdigest(),
        "header_hex": payload[:8].hex(),
    }


_STUB_SCHEMA = [
    ("payload_len", T.IntegerType()),
    ("payload_md5", T.StringType()),
    ("header_hex", T.StringType()),
]


class BinaryFeatureExtractor(Transformer):
    """Extract per-row features from a binary payload column via
    Arrow-batched ``mapInPandas``.

    ``decoder(payload: bytes) -> dict`` supplies the features;
    ``feature_schema`` declares their Spark types (list of (name,
    DataType)). The default is the byte-level stub; REAL image/audio/
    video decoders from ``imagecodec.py`` / ``audiocodec.py`` /
    ``videocodec.py`` plug into this same seam (see
    ``sources.io.read_media``, which wires them in by default).

    Output schema = input columns + prefixed feature columns. The
    operation is a narrow map — no shuffle, partitioning preserved."""

    def __init__(
        self,
        binary_col: str,
        decoder: Callable[[bytes], dict] | None = None,
        feature_schema: list[tuple[str, T.DataType]] | None = None,
        prefix: str | None = None,
    ):
        if (decoder is None) != (feature_schema is None):
            raise InvalidParameterError(
                "decoder and feature_schema must be given together"
            )
        self.binary_col = binary_col
        self.decoder = decoder or stub_decoder
        self.feature_schema = feature_schema or _STUB_SCHEMA
        self.prefix = prefix if prefix is not None else f"{binary_col}_"

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.binary_col])
        if not isinstance(df.schema[self.binary_col].dataType, T.BinaryType):
            raise InvalidParameterError(
                f"column '{self.binary_col}' must be binary, got "
                f"{df.schema[self.binary_col].dataType.simpleString()}"
            )
        clash = [
            f"{self.prefix}{n}"
            for n, _ in self.feature_schema
            if f"{self.prefix}{n}" in df.columns
        ]
        ensure(
            not clash,
            f"feature column(s) {clash} already exist in the input; "
            "pass a different prefix",
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        out_schema = T.StructType(
            list(df.schema.fields)
            + [
                T.StructField(f"{self.prefix}{name}", dtype, True)
                for name, dtype in self.feature_schema
            ]
        )
        bin_col = self.binary_col
        decoder = self.decoder
        feat_names = [name for name, _ in self.feature_schema]
        prefix = self.prefix

        def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                feats = {f"{prefix}{n}": [] for n in feat_names}
                for payload in pdf[bin_col]:
                    if payload is None:
                        # missing media stays distinguishable from a
                        # zero-byte payload: every feature is NULL
                        d = {}
                    else:
                        d = decoder(bytes(payload))
                    for n in feat_names:
                        feats[f"{prefix}{n}"].append(d.get(n))
                for k, v in feats.items():
                    pdf[k] = v
                yield pdf

        return df.mapInPandas(extract, schema=out_schema)


class FrameSampler(Transformer):
    """Deterministically sample byte-range 'frames' from a binary payload
    (the plumbing for video frame-sampling: real codecs would replace the
    byte-slicer via ``slicer=``).

    Emits one row per sampled frame: input columns + (frame_index,
    frame_bytes). Uses ``mapInPandas`` with an exploding generator —
    narrow, no shuffle. Rows whose payload is NULL or empty produce ZERO
    output rows (there is nothing to sample) — keep the original frame
    and join back if those records must survive."""

    def __init__(
        self,
        binary_col: str,
        n_frames: int = 4,
        frame_size: int = 16,
        slicer: Callable[[bytes, int, int], list[bytes]] | None = None,
    ):
        ensure(n_frames >= 1, "n_frames must be >= 1")
        ensure(frame_size >= 1, "frame_size must be >= 1")
        self.binary_col = binary_col
        self.n_frames = n_frames
        self.frame_size = frame_size
        self.slicer = slicer or self._stub_slicer

    @staticmethod
    def _stub_slicer(payload: bytes, n_frames: int, frame_size: int) -> list[bytes]:
        """Evenly spaced byte windows — a deterministic stand-in for codec
        frame extraction (NOT a real decoder)."""
        if not payload:
            return []
        step = max(len(payload) // n_frames, 1)
        return [payload[i * step : i * step + frame_size] for i in range(n_frames)]

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.binary_col])
        if not isinstance(df.schema[self.binary_col].dataType, T.BinaryType):
            raise InvalidParameterError(
                f"column '{self.binary_col}' must be binary"
            )
        clash = [c for c in ("frame_index", "frame_bytes") if c in df.columns]
        ensure(
            not clash,
            f"output column(s) {clash} already exist in the input frame",
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        out_schema = T.StructType(
            list(df.schema.fields)
            + [
                T.StructField("frame_index", T.IntegerType(), True),
                T.StructField("frame_bytes", T.BinaryType(), True),
            ]
        )
        bin_col, slicer = self.binary_col, self.slicer
        n_frames, frame_size = self.n_frames, self.frame_size
        cols = [f.name for f in out_schema.fields]

        def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                # to_dict('records') builds plain dicts once per row —
                # no per-row Series allocation (iterrows) on the hot path
                for rec in pdf.to_dict("records"):
                    payload = rec[bin_col]
                    if payload is None:
                        continue
                    for i, frame in enumerate(
                        slicer(bytes(payload), n_frames, frame_size)
                    ):
                        rows.append({**rec, "frame_index": i, "frame_bytes": frame})
                yield pd.DataFrame(rows, columns=cols)

        return df.mapInPandas(sample, schema=out_schema)
