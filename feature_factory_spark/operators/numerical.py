"""Numerical transforms (reference: src/transformers/numerical.rs).

All stateless, all pure JVM-side column expressions (whole-stage codegen;
zero Python UDFs).

Divergence from the reference, by design (SURVEY.md §3.3): the reference
eagerly runs min/max validation queries INSIDE transform via block_on
(numerical.rs:136, 199, 261-262, 375, 518-519), breaking laziness. Here
data-range validation is opt-in via ``strict=True`` (runs one aggregate job
in transform); schema validation is always on (free).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..exceptions import InvalidParameterError
from ..functions.stats import column_min_max
from ..pipeline import Transformer
from ..validation import ensure, require_nonempty_columns, validate_numeric_columns


class _ElementwiseTransformer(Transformer):
    """Shared shell: replace each target column with expr(col)."""

    strict: bool = False
    columns: list[str]

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns)

    def _expr(self, c: Column) -> Column:
        raise NotImplementedError

    def _validate_range(self, mn: float, mx: float, col: str) -> None:
        """Override to enforce domain constraints when strict."""

    def _transform(self, df: DataFrame) -> DataFrame:
        if self.strict:
            for c, (mn, mx) in column_min_max(df, self.columns).items():
                if mn is not None:
                    self._validate_range(mn, mx, c)
        out = df
        for c in self.columns:
            out = out.withColumn(c, self._expr(F.col(c).cast("double")))
        return out


class LogTransformer(_ElementwiseTransformer):
    """ln(x); domain x > 0 (numerical.rs:109-168)."""

    def __init__(self, columns: list[str], strict: bool = False):
        self.columns = require_nonempty_columns(columns)
        self.strict = strict

    def _expr(self, c: Column) -> Column:
        return F.log(c)

    def _validate_range(self, mn, mx, col):
        ensure(mn > 0, f"LogTransformer requires min > 0 on '{col}', got {mn}")


class LogCpTransformer(_ElementwiseTransformer):
    """ln(x + C); domain x + C > 0 (numerical.rs:172-231)."""

    def __init__(self, columns: list[str], c: float = 1.0, strict: bool = False):
        self.columns = require_nonempty_columns(columns)
        self.c = float(c)
        self.strict = strict

    def _expr(self, c: Column) -> Column:
        return F.log(c + F.lit(self.c))

    def _validate_range(self, mn, mx, col):
        ensure(mn + self.c > 0, f"LogCpTransformer requires min + C > 0 on '{col}'")


class ReciprocalTransformer(_ElementwiseTransformer):
    """1/x; rejected when the column range spans 0 (numerical.rs:235-294)."""

    def __init__(self, columns: list[str], strict: bool = False):
        self.columns = require_nonempty_columns(columns)
        self.strict = strict

    def _expr(self, c: Column) -> Column:
        return F.lit(1.0) / c

    def _validate_range(self, mn, mx, col):
        ensure(
            not (mn <= 0.0 <= mx),
            f"ReciprocalTransformer range spans zero on '{col}' [{mn}, {mx}]",
        )


class PowerTransformer(_ElementwiseTransformer):
    """x^p (numerical.rs:297-343)."""

    def __init__(self, columns: list[str], power: float = 2.0, strict: bool = False):
        if not math.isfinite(power):
            raise InvalidParameterError("power must be finite")
        self.columns = require_nonempty_columns(columns)
        self.power = float(power)
        self.strict = strict

    def _expr(self, c: Column) -> Column:
        return F.pow(c, F.lit(self.power))


class BoxCoxTransformer(_ElementwiseTransformer):
    """(x^λ − 1)/λ when |λ| > 1e-6, else ln(x); fixed user λ, no MLE fit;
    domain x > 0 (numerical.rs:348-414)."""

    def __init__(self, columns: list[str], lmbda: float, strict: bool = False):
        if not math.isfinite(lmbda):
            raise InvalidParameterError("lambda must be finite")
        self.columns = require_nonempty_columns(columns)
        self.lmbda = float(lmbda)
        self.strict = strict

    def _expr(self, c: Column) -> Column:
        if abs(self.lmbda) > 1e-6:
            return (F.pow(c, F.lit(self.lmbda)) - F.lit(1.0)) / F.lit(self.lmbda)
        return F.log(c)

    def _validate_range(self, mn, mx, col):
        ensure(mn > 0, f"BoxCoxTransformer requires min > 0 on '{col}', got {mn}")


class YeoJohnsonTransformer(_ElementwiseTransformer):
    """Yeo-Johnson with fixed λ (numerical.rs:419-488):
    x >= 0: ((x+1)^λ − 1)/λ   (λ != 0)  else ln(x+1)
    x <  0: −((1−x)^(2−λ) − 1)/(2−λ)  (λ != 2)  else −ln(1−x)
    """

    def __init__(self, columns: list[str], lmbda: float, strict: bool = False):
        if not math.isfinite(lmbda):
            raise InvalidParameterError("lambda must be finite")
        self.columns = require_nonempty_columns(columns)
        self.lmbda = float(lmbda)
        self.strict = strict

    def _expr(self, c: Column) -> Column:
        lam = self.lmbda
        if abs(lam) > 1e-6:
            pos = (F.pow(c + F.lit(1.0), F.lit(lam)) - F.lit(1.0)) / F.lit(lam)
        else:
            pos = F.log(c + F.lit(1.0))
        if abs(lam - 2.0) > 1e-6:
            neg = -(F.pow(F.lit(1.0) - c, F.lit(2.0 - lam)) - F.lit(1.0)) / F.lit(
                2.0 - lam
            )
        else:
            neg = -F.log(F.lit(1.0) - c)
        return F.when(c >= F.lit(0.0), pos).otherwise(neg)


class ArcsinTransformer(_ElementwiseTransformer):
    """asin(sqrt(x)); domain x in [0, 1] (numerical.rs:492-551)."""

    def __init__(self, columns: list[str], strict: bool = False):
        self.columns = require_nonempty_columns(columns)
        self.strict = strict

    def _expr(self, c: Column) -> Column:
        return F.asin(F.sqrt(c))

    def _validate_range(self, mn, mx, col):
        ensure(
            mn >= 0.0 and mx <= 1.0,
            f"ArcsinTransformer requires values in [0,1] on '{col}' [{mn}, {mx}]",
        )
