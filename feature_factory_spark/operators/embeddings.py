"""Embedding-column operators (beyond the reference, which has no vector
types at all — SURVEY.md §1.3 'Not supported anywhere: ... arrays').

Both operators are stateless projections over an ``array<float>`` column:
JVM-side higher-order functions (zip_with/aggregate folds from
functions/expressions) — no shuffle, no UDF, whole-stage codegen,
embarrassingly parallel at any scale.

- L2Normalizer: unit-norm vectors. Normalizing once up front turns every
  downstream cosine into a plain dot product (CosineTopK, dedup LSH,
  KMeansClusterer all get cheaper) and is idempotent.
- RandomProjection: Johnson-Lindenstrauss dimensionality reduction via a
  deterministic seeded hyperplane matrix (same generator as the
  embedding-LSH dedup planes — reproducible across runs, engines, and
  partitionings; no model file to ship). 64 -> 8/16 dims cuts every
  downstream vector op's cost ~8/4x at bounded distortion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import dot_expr, norm_expr
from ..pipeline import Transformer
from ..validation import ensure, validate_columns
from .dedup import _hyperplanes


class L2Normalizer(Transformer):
    """Replace ``vec_col`` (or write ``out_col``) with the L2-normalized
    vector, as array<double>. Zero vectors stay zero (no NaN/ANSI
    division error).

    >>> df = spark.createDataFrame([(1, [3.0, 4.0])], ["id", "embedding"])
    >>> out = L2Normalizer("embedding").transform(df)
    >>> [round(x, 4) for x in out.collect()[0]["embedding"]]
    [0.6, 0.8]
    """

    def __init__(self, vec_col: str, out_col: str | None = None):
        self.vec_col = vec_col
        self.out_col = out_col or vec_col

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col])

    def _transform(self, df: DataFrame) -> DataFrame:
        vec = F.col(self.vec_col)
        nrm = norm_expr(vec)
        # nrm must NOT appear inside a transform lambda: Catalyst
        # inlines outer expressions at every lambda evaluation site, so
        # `x / nrm` would recompute the O(d) norm fold per ELEMENT —
        # O(d^2) per row. array_repeat evaluates nrm ONCE as an operand
        # and the zip_with lambda touches only its own variables; the
        # zero-vector guard rides along element-wise for free.
        normalized = F.zip_with(
            vec,
            F.array_repeat(nrm, F.size(vec)),
            lambda x, m: F.when(m == 0.0, F.lit(0.0)).otherwise(
                x.cast("double") / m
            ),
        )
        if self.out_col == self.vec_col:
            cols = [
                normalized.alias(c) if c == self.vec_col else F.col(c)
                for c in df.columns
            ]
            return df.select(*cols)
        return df.select("*", normalized.alias(self.out_col))


class RandomProjection(Transformer):
    """Project ``vec_col`` (dim ``in_dim``) onto ``out_dim`` seeded
    hyperplanes: out[j] = dot(vec, plane_j), as array<double>.

    The plane matrix is a deterministic function of (seed, out_dim,
    in_dim) — fitted state is the three integers, not the matrix, so
    save/load round-trips trivially and two clusters given the same seed
    project identically. The matrix rides into the plan as ONE nested
    array literal scanned with a single transform (the same codegen-width
    trick as the IVF centroid scan)."""

    def __init__(
        self,
        vec_col: str,
        out_dim: int,
        in_dim: int,
        seed: int = 13,
        out_col: str | None = None,
    ):
        ensure(out_dim >= 1, "out_dim must be >= 1")
        ensure(in_dim >= 1, "in_dim must be >= 1")
        self.vec_col = vec_col
        self.out_dim = out_dim
        self.in_dim = in_dim
        self.seed = seed
        self.out_col = out_col or vec_col

    def planes(self) -> list[list[float]]:
        return _hyperplanes(self.out_dim, self.in_dim, self.seed)

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col])

    def _transform(self, df: DataFrame) -> DataFrame:
        vec = F.col(self.vec_col)
        # one nested-array Literal (out_dim x in_dim values in a single
        # node), not out_dim x in_dim Literal nodes: plan analysis and
        # codegen stay O(1) in the projection size
        planes_lit = F.lit([[float(x) for x in p] for p in self.planes()])
        projected = F.transform(planes_lit, lambda p: dot_expr(vec, p))
        if self.out_col == self.vec_col:
            cols = [
                projected.alias(c) if c == self.vec_col else F.col(c)
                for c in df.columns
            ]
            return df.select(*cols)
        return df.select("*", projected.alias(self.out_col))


class EmbeddingQuantizer(Transformer):
    """Symmetric per-vector int8 quantization: appends

    - ``{c}_q8``        array<tinyint> codes, code = floor(x/scale + 0.5)
    - ``{c}_q8_scale``  double, scale = max(|x|)/127 (0 for a zero
      vector, whose codes are all 0)

    and ``dequantize_expr(codes, scale)`` reconstructs array<double>
    (max elementwise error = scale/2). This is the standard 4x memory /
    IO lever for embedding tables and ANN indexes at corpus scale: a
    100 TB float32 embedding column becomes ~25 TB of codes + one
    double per vector, and cosine on dequantized vectors stays within
    ~1e-3 of exact for typical embedding distributions (pinned by unit
    test). Write the codes with ``write_index``-style partitioning and
    dequantize inside the probe — the scan reads a quarter of the
    bytes.

    Stateless pure-expression projection (floor/abs/array_max inside
    whole-stage codegen — no UDF, no shuffle); floor(x + 0.5) rather
    than a round() call so Spark and the SQL oracle round identically
    at halfway points."""

    def __init__(self, vec_col: str, prefix: str | None = None):
        self.vec_col = vec_col
        self.prefix = prefix if prefix is not None else vec_col

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col])

    @staticmethod
    def dequantize_expr(codes: Column, scale: Column) -> Column:
        return F.transform(codes, lambda c: c.cast("double") * scale)

    def _transform(self, df: DataFrame) -> DataFrame:
        vec = F.col(self.vec_col)
        scale_col = f"{self.prefix}_q8_scale"
        # two projections, NOT one: higher-order-function lambdas
        # re-evaluate embedded row-level subtrees per ELEMENT, so an
        # array_max(...) scale inside the transform lambda makes codes
        # O(d^2) per row (measured 4.3-4.8x per dim doubling). Computing
        # the scale as its own column first keeps the whole thing O(d).
        scale = (
            F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
            / F.lit(127.0)
        )
        with_scale = df.select("*", scale.alias(scale_col))
        s = F.col(scale_col)
        codes = F.when(
            s == 0.0,
            F.transform(vec, lambda x: F.lit(0).cast("tinyint")),
        ).otherwise(
            F.transform(
                vec,
                lambda x: F.floor(x.cast("double") / s + F.lit(0.5)).cast(
                    "tinyint"
                ),
            )
        )
        out = with_scale.select("*", codes.alias(f"{self.prefix}_q8"))
        # keep the documented column order (codes, then scale)
        return out.select(
            *df.columns, f"{self.prefix}_q8", scale_col
        )
