"""Feature creation operators (reference: src/transformers/feature_creation.rs)."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..pipeline import Transformer
from ..validation import ensure, validate_columns, validate_numeric_columns


class MathFeatures(Transformer):
    """Append named arbitrary expression columns (feature_creation.rs:23-56).

    This is the engine's open expression surface: ``features`` is a list of
    (name, pyspark.sql.Column) pairs — the Spark analogue of the reference
    accepting arbitrary DataFusion Expr. Empty names rejected
    (feature_creation.rs:29-34)."""

    def __init__(self, features: list[tuple[str, Column]]):
        ensure(bool(features), "at least one feature is required")
        for name, _ in features:
            ensure(bool(name), "feature name must be non-empty")
        self.features = list(features)

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.select("*", *[expr.alias(name) for name, expr in self.features])


class RelativeFeatures(Transformer):
    """Append target⊕reference combinations (feature_creation.rs:59-128):
    Ratio t/r, Difference t−r, PercentChange (t−r)/r. Output columns are
    named ``{target}_{op}_{reference}``."""

    OPS = ("ratio", "difference", "percent_change")

    def __init__(self, targets: list[str], references: list[str], operations: list[str]):
        ensure(bool(targets) and bool(references), "targets and references required")
        for op in operations:
            ensure(op in self.OPS, f"unknown operation '{op}' (valid: {self.OPS})")
        self.targets = list(targets)
        self.references = list(references)
        self.operations = list(operations)

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.targets + self.references)

    def _transform(self, df: DataFrame) -> DataFrame:
        new_cols = []
        for t in self.targets:
            for r in self.references:
                tc, rc = F.col(t).cast("double"), F.col(r).cast("double")
                for op in self.operations:
                    if op == "ratio":
                        e = tc / rc
                    elif op == "difference":
                        e = tc - rc
                    else:
                        e = (tc - rc) / rc
                    new_cols.append(e.alias(f"{t}_{op}_{r}"))
        return df.select("*", *new_cols)


class JsonFeatures(Transformer):
    """Extract JSON-path fields from a JSON-string column as typed columns
    (beyond the reference, which has no JSON functions — SURVEY.md §2.3).

    ``fields`` maps output name -> (json_path, spark_type_ddl), e.g.
    {"k": ("$.k", "int")}. Extraction uses get_json_object (JVM-side,
    no schema inference pass — at 100 TB, from_json with an explicit
    schema or this path beat schema inference by an entire scan).

    Casting uses try_cast by default: under Spark's ANSI mode a plain
    cast on one malformed value ('{"k": "abc"}' -> int) would kill the
    whole job — the opposite of what a corpus-cleaning operator should
    do on messy JSON. Malformed values become NULL; ``strict=True``
    restores the erroring cast."""

    def __init__(
        self, column: str, fields: dict[str, tuple[str, str]], strict: bool = False
    ):
        ensure(bool(fields), "at least one field is required")
        self.column = column
        self.fields = dict(fields)
        self.strict = strict

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.column])

    def _transform(self, df: DataFrame) -> DataFrame:
        def _cast(c: F.Column, dtype: str) -> F.Column:
            return c.cast(dtype) if self.strict else c.try_cast(dtype)

        new_cols = [
            _cast(F.get_json_object(F.col(self.column), path), dtype).alias(name)
            for name, (path, dtype) in self.fields.items()
        ]
        return df.select("*", *new_cols)


class CyclicalFeatures(Transformer):
    """sin(2πx/period) / cos(2πx/period) per column
    (feature_creation.rs:139-202); period > 0 validated. Appends
    ``{col}_sin`` / ``{col}_cos``."""

    def __init__(self, columns_periods: dict[str, float], functions: list[str] = ("sin", "cos")):
        ensure(bool(columns_periods), "at least one column is required")
        for c, p in columns_periods.items():
            ensure(p > 0, f"period for '{c}' must be > 0, got {p}")
        for f in functions:
            ensure(f in ("sin", "cos"), f"unknown function '{f}'")
        self.columns_periods = dict(columns_periods)
        self.functions = list(functions)

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, list(self.columns_periods))

    def _transform(self, df: DataFrame) -> DataFrame:
        new_cols = []
        for c, period in self.columns_periods.items():
            angle = F.lit(2.0 * math.pi) * F.col(c).cast("double") / F.lit(float(period))
            if "sin" in self.functions:
                new_cols.append(F.sin(angle).alias(f"{c}_sin"))
            if "cos" in self.functions:
                new_cols.append(F.cos(angle).alias(f"{c}_cos"))
        return df.select("*", *new_cols)
