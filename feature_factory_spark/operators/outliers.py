"""Outlier handling operators (reference: src/transformers/outliers.rs)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import cap_expr
from ..functions.stats import column_quantiles
from ..pipeline import Transformer
from ..validation import ensure, require_nonempty_columns, validate_numeric_columns


class ArbitraryOutlierCapper(Transformer):
    """Cap values at user-supplied lower/upper caps per column
    (outliers.rs:164-213)."""

    def __init__(
        self,
        lower_caps: dict[str, float] | None = None,
        upper_caps: dict[str, float] | None = None,
    ):
        self.lower_caps = dict(lower_caps or {})
        self.upper_caps = dict(upper_caps or {})
        cols = set(self.lower_caps) | set(self.upper_caps)
        ensure(bool(cols), "at least one cap is required")
        for c in set(self.lower_caps) & set(self.upper_caps):
            ensure(
                self.lower_caps[c] <= self.upper_caps[c],
                f"lower cap > upper cap for '{c}'",
            )
        self.columns = sorted(cols)

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns)

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c in self.columns:
            out = out.withColumn(
                c, cap_expr(c, self.lower_caps.get(c), self.upper_caps.get(c))
            )
        return out


class Winsorizer(Transformer):
    """fit: learn [p_lo, p_hi] percentiles per column; transform: cap
    (outliers.rs:216-300). Validation: each p in [0,1], lo < hi
    (outliers.rs:238-255). One quantile job for all columns and both tails
    (vs two jobs per column in the reference, outliers.rs:59-161).

    >>> df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    >>> w = Winsorizer(["x"], 0.05, 0.95).fit(df)
    >>> out = w.transform(df)
    >>> out.agg({"x": "max"}).collect()[0][0] <= 96.0
    True
    """

    def __init__(
        self,
        columns: list[str],
        lower_percentile: float = 0.05,
        upper_percentile: float = 0.95,
        approx: bool = False,
    ):
        ensure(0.0 <= lower_percentile <= 1.0, "lower_percentile must be in [0,1]")
        ensure(0.0 <= upper_percentile <= 1.0, "upper_percentile must be in [0,1]")
        ensure(lower_percentile < upper_percentile, "lower must be < upper percentile")
        self.columns = require_nonempty_columns(columns)
        self.lower_percentile = lower_percentile
        self.upper_percentile = upper_percentile
        self.approx = approx
        self.bounds: dict[str, tuple[float, float]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        qs = column_quantiles(
            df,
            self.columns,
            [self.lower_percentile, self.upper_percentile],
            approx=self.approx,
        )
        self.bounds = {c: (qs[c][0], qs[c][1]) for c in self.columns if qs[c]}

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c, (lo, hi) in self.bounds.items():
            out = out.withColumn(c, cap_expr(c, lo, hi))
        return out


class OutlierTrimmer(Transformer):
    """fit: same percentile thresholds; transform: FILTER rows where every
    target column is within [lo, hi] (outliers.rs:303-398). The conjunctive
    filter is push-down-able by Catalyst."""

    def __init__(
        self,
        columns: list[str],
        lower_percentile: float = 0.05,
        upper_percentile: float = 0.95,
        approx: bool = False,
    ):
        ensure(0.0 <= lower_percentile <= 1.0, "lower_percentile must be in [0,1]")
        ensure(0.0 <= upper_percentile <= 1.0, "upper_percentile must be in [0,1]")
        ensure(lower_percentile < upper_percentile, "lower must be < upper percentile")
        self.columns = require_nonempty_columns(columns)
        self.lower_percentile = lower_percentile
        self.upper_percentile = upper_percentile
        self.approx = approx
        self.bounds: dict[str, tuple[float, float]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        qs = column_quantiles(
            df,
            self.columns,
            [self.lower_percentile, self.upper_percentile],
            approx=self.approx,
        )
        self.bounds = {c: (qs[c][0], qs[c][1]) for c in self.columns if qs[c]}

    def _transform(self, df: DataFrame) -> DataFrame:
        pred = None
        for c, (lo, hi) in self.bounds.items():
            p = (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))
            pred = p if pred is None else (pred & p)
        return df.filter(pred) if pred is not None else df
