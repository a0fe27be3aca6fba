"""Imputation operators (reference: src/transformers/imputation.rs).

All transforms are lazy projections/filters; stateful fits run ONE Spark
aggregate job across all target columns (the reference loops one job per
column, imputation.rs:108-140).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import InvalidParameterError
from ..functions.stats import column_means, column_modes, column_quantiles
from ..pipeline import Transformer
from ..validation import (
    ensure,
    require_nonempty_columns,
    validate_columns,
    validate_numeric_columns,
    validate_string_columns,
)


def _impute_projection(df: DataFrame, values: dict[str, float]) -> DataFrame:
    """COALESCE(col::double, fill) projection for numeric imputers.

    The imputed columns are promoted to double, matching the reference's
    coalesce-with-Float64-literal output (imputation.rs:42-48). A plain
    ``fillna`` would instead cast the fill value DOWN to the column type,
    silently truncating e.g. mean 7/3 -> 2 on a bigint column.
    """
    cols = [
        F.coalesce(F.col(c).cast("double"), F.lit(float(values[c]))).alias(c)
        if c in values and values[c] is not None
        else F.col(c)
        for c in df.columns
    ]
    return df.select(cols)


class MeanMedianImputer(Transformer):
    """Replace NULLs with the column mean or median (imputation.rs:82-160).

    The reference stubs the median variant with NotImplemented
    (imputation.rs:134-138); we implement it with Spark's exact
    ``percentile(col, 0.5)`` (oracle twin: DuckDB ``quantile_cont(col, 0.5)``),
    or t-digest ``approx_percentile`` when ``approx=True``.

    >>> df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    >>> imp = MeanMedianImputer(["x"]).fit(df)
    >>> imp.impute_values
    {'x': 2.0}
    >>> imp.transform(df).where("x IS NULL").count()
    0
    """

    def __init__(self, columns: list[str], strategy: str = "mean", approx: bool = False):
        ensure(strategy in ("mean", "median"), f"unknown strategy '{strategy}'")
        self.columns = require_nonempty_columns(columns)
        self.strategy = strategy
        self.approx = approx
        self.impute_values: dict[str, float] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        if self.strategy == "mean":
            self.impute_values = column_means(df, self.columns)
        else:
            qs = column_quantiles(df, self.columns, [0.5], approx=self.approx)
            self.impute_values = {c: qs[c][0] if qs[c] else None for c in self.columns}

    def _transform(self, df: DataFrame) -> DataFrame:
        return _impute_projection(df, self.impute_values)


class ArbitraryNumberImputer(Transformer):
    """Replace NULLs with a fixed finite number (imputation.rs:163-194)."""

    def __init__(self, columns: list[str], number: float):
        if not isinstance(number, (int, float)) or not math.isfinite(number):
            raise InvalidParameterError(f"impute number must be finite, got {number}")
        self.columns = require_nonempty_columns(columns)
        self.number = float(number)

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns)

    def _transform(self, df: DataFrame) -> DataFrame:
        return _impute_projection(df, {c: self.number for c in self.columns})


class EndTailImputer(Transformer):
    """Replace NULLs with a per-column percentile value
    (imputation.rs:197-270). percentile must be in [0, 1]."""

    def __init__(self, columns: list[str], percentile: float = 0.75, approx: bool = False):
        ensure(0.0 <= percentile <= 1.0, f"percentile must be in [0,1], got {percentile}")
        self.columns = require_nonempty_columns(columns)
        self.percentile = percentile
        self.approx = approx
        self.impute_values: dict[str, float] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        qs = column_quantiles(df, self.columns, [self.percentile], approx=self.approx)
        self.impute_values = {c: qs[c][0] if qs[c] else None for c in self.columns}

    def _transform(self, df: DataFrame) -> DataFrame:
        return _impute_projection(df, self.impute_values)


class CategoricalImputer(Transformer):
    """Replace NULLs with the mode (or a user default) of a string column
    (imputation.rs:273-348). fit is skipped when a default is given
    (imputation.rs:293-296). Mode tie-break: highest count, then smallest
    value (deterministic; the reference's LIMIT 1 is tie-unstable)."""

    def __init__(self, columns: list[str], default: str | None = None):
        self.columns = require_nonempty_columns(columns)
        self.default = default
        self.impute_values: dict[str, str] = {}
        if default is not None:
            self.impute_values = {c: default for c in self.columns}
            self._fitted = True

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        if self.default is not None:
            return
        modes = column_modes(df, self.columns)
        self.impute_values = {c: m for c, m in modes.items() if m is not None}

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.fillna(self.impute_values)


class AddMissingIndicator(Transformer):
    """Append ``<col><suffix>`` boolean = col IS NULL; suffix defaults to
    "_missing" (imputation.rs:351-391)."""

    def __init__(self, columns: list[str], suffix: str = "_missing"):
        self.columns = require_nonempty_columns(columns)
        ensure(bool(suffix), "suffix must be non-empty")
        self.suffix = suffix

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, self.columns)

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.select(
            "*",
            *[F.col(c).isNull().alias(f"{c}{self.suffix}") for c in self.columns],
        )


class DropMissingData(Transformer):
    """Filter out rows with NULL in any of the chosen columns (or any column
    at all when none given) (imputation.rs:394-449). Pure filter — pushes
    down to the scan under Catalyst."""

    def __init__(self, columns: list[str] | None = None):
        self.columns = list(columns) if columns else None

    def _check_input(self, df: DataFrame) -> None:
        if self.columns:
            validate_columns(df, self.columns)

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.na.drop(subset=self.columns) if self.columns else df.na.drop()
