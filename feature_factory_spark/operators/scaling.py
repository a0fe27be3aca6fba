"""Feature scaling operators (beyond the reference inventory — the
reference's 41 transformers include no scalers, SURVEY.md §2.2; these
round out the numerical family the way feature-engine pairs with
scikit-learn's preprocessing scalers).

All three follow the package's fit rules (SURVEY.md §4.3):
- fit is ONE aggregate job for ALL columns and ALL statistics;
- transform is a pure projection (literal arithmetic baked into the
  plan — whole-stage codegen, no shuffle, no UDF);
- division is ANSI-safe: a constant column (zero range / zero std / zero
  IQR) scales to 0.0 instead of raising DIVIDE_BY_ZERO.
- RobustScaler's quantile fit takes the shared ``approx=True`` /
  FF_APPROX_QUANTILES t-digest path at scale (functions/stats.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.stats import agg_single_pass, column_min_max, column_quantiles
from ..pipeline import Transformer
from ..validation import ensure, require_nonempty_columns, validate_numeric_columns


def _safe_scale_expr(col: Column, center: float, scale: float) -> Column:
    """(col - center) / scale, with a zero/NULL scale collapsing to 0.0
    (the scikit-learn convention for constant features)."""
    if scale is None or scale == 0.0:
        return F.lit(0.0)
    return (col.cast("double") - F.lit(float(center))) / F.lit(float(scale))


class MinMaxScaler(Transformer):
    """fit: per-column min/max (one job, functions/stats.column_min_max);
    transform: x -> (x - min) / (max - min) scaled into ``feature_range``.
    Constant columns map to the range lower bound.

    >>> df = spark.createDataFrame([(10.0,), (20.0,), (30.0,)], "x double")
    >>> sc = MinMaxScaler(["x"]).fit(df)
    >>> sorted(r["x"] for r in sc.transform(df).collect())
    [0.0, 0.5, 1.0]
    """

    def __init__(
        self, columns: list[str], feature_range: tuple[float, float] = (0.0, 1.0)
    ):
        lo, hi = feature_range
        ensure(lo < hi, "feature_range must satisfy lo < hi")
        self.columns = require_nonempty_columns(columns)
        self.feature_range = (float(lo), float(hi))
        self.bounds: dict[str, tuple[float, float]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        mm = column_min_max(df, self.columns)
        self.bounds = {
            c: (float(v[0]), float(v[1]))
            for c, v in mm.items()
            if v[0] is not None and v[1] is not None
        }

    def _transform(self, df: DataFrame) -> DataFrame:
        lo, hi = self.feature_range
        out = df
        for c, (mn, mx) in self.bounds.items():
            unit = _safe_scale_expr(F.col(c), mn, mx - mn)
            out = out.withColumn(c, unit * F.lit(hi - lo) + F.lit(lo))
        return out


class StandardScaler(Transformer):
    """fit: per-column mean and population standard deviation in one
    aggregate job; transform: x -> (x - mean) / std (z-score).
    ``with_mean`` / ``with_std`` toggle centering and scaling
    independently (scikit-learn semantics). Zero-variance columns map
    to 0.0."""

    def __init__(
        self, columns: list[str], with_mean: bool = True, with_std: bool = True
    ):
        ensure(with_mean or with_std, "at least one of with_mean/with_std")
        self.columns = require_nonempty_columns(columns)
        self.with_mean = with_mean
        self.with_std = with_std
        self.stats: dict[str, tuple[float, float]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        exprs = []
        for c in self.columns:
            exprs.append(F.avg(F.col(c).cast("double")).alias(f"__m_{c}"))
            exprs.append(F.stddev_pop(F.col(c).cast("double")).alias(f"__s_{c}"))
        out = agg_single_pass(df, exprs)
        self.stats = {
            c: (out[f"__m_{c}"], out[f"__s_{c}"])
            for c in self.columns
            if out[f"__m_{c}"] is not None
        }

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c, (mean, std) in self.stats.items():
            center = mean if self.with_mean else 0.0
            if self.with_std:
                expr = _safe_scale_expr(F.col(c), center, std)
            else:
                expr = F.col(c).cast("double") - F.lit(float(center))
            out = out.withColumn(c, expr)
        return out


class RobustScaler(Transformer):
    """fit: per-column median and quantile range (default IQR: p25..p75)
    in ONE quantile job for all columns; transform:
    x -> (x - median) / (q_hi - q_lo). Outlier-resistant scaling — the
    right default when Winsorization hasn't run upstream. Zero-IQR
    columns map to 0.0.

    ``approx=True`` (or FF_APPROX_QUANTILES=1) switches the fit to the
    single-pass mergeable t-digest — the 100 TB path; exact `percentile`
    is the oracle-matching default."""

    def __init__(
        self,
        columns: list[str],
        quantile_range: tuple[float, float] = (0.25, 0.75),
        approx: bool = False,
    ):
        lo, hi = quantile_range
        ensure(0.0 <= lo < hi <= 1.0, "quantile_range must satisfy 0 <= lo < hi <= 1")
        self.columns = require_nonempty_columns(columns)
        self.quantile_range = (float(lo), float(hi))
        self.approx = approx
        self.stats: dict[str, tuple[float, float]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        lo, hi = self.quantile_range
        qs = column_quantiles(
            df, self.columns, [lo, 0.5, hi], approx=self.approx
        )
        self.stats = {
            c: (v[1], v[2] - v[0]) for c, v in qs.items() if v is not None
        }

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c, (median, iqr) in self.stats.items():
            out = out.withColumn(c, _safe_scale_expr(F.col(c), median, iqr))
        return out
