"""Schema validation helpers.

Mirrors the reference's validation helpers (validate_columns /
validate_string_column / validate_numeric_column / validate_datetime_column —
reference: src/transformers/imputation.rs:27-38, categorical.rs:27-61,
discretization.rs:24-36, datetime.rs:22-33) against the Spark schema. These
checks are driver-side and free: they never trigger a Spark job.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .exceptions import InvalidParameterError, MissingColumnError

# "numeric" in the reference means Float64 | Int64 (categorical.rs:50-61,
# discretization.rs:24-36). We accept the full Spark numeric lattice since
# Spark will widen; strict double-only checks use NUMERIC_STRICT.
NUMERIC_TYPES = (
    T.DoubleType,
    T.FloatType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DecimalType,
)
DATETIME_TYPES = (T.TimestampType, T.TimestampNTZType, T.DateType)


def validate_columns(df: DataFrame, columns: Iterable[str]) -> None:
    """Every column must exist in the schema (imputation.rs:27-38)."""
    names = set(df.columns)
    for c in columns:
        if c not in names:
            raise MissingColumnError(c, sorted(names))


def _field_type(df: DataFrame, column: str) -> T.DataType:
    validate_columns(df, [column])
    return df.schema[column].dataType


def validate_numeric_columns(df: DataFrame, columns: Iterable[str]) -> None:
    """Columns must exist and be numeric (categorical.rs:50-61)."""
    for c in columns:
        dt = _field_type(df, c)
        if not isinstance(dt, NUMERIC_TYPES):
            raise InvalidParameterError(
                f"Column '{c}' must be numeric, got {dt.simpleString()}"
            )


def validate_string_columns(df: DataFrame, columns: Iterable[str]) -> None:
    """Columns must exist and be string-typed (categorical.rs:27-39)."""
    for c in columns:
        dt = _field_type(df, c)
        if not isinstance(dt, T.StringType):
            raise InvalidParameterError(
                f"Column '{c}' must be a string column, got {dt.simpleString()}"
            )


def validate_datetime_columns(df: DataFrame, columns: Iterable[str]) -> None:
    """Columns must exist and be timestamp/date-typed (datetime.rs:26-33)."""
    for c in columns:
        dt = _field_type(df, c)
        if not isinstance(dt, DATETIME_TYPES):
            raise InvalidParameterError(
                f"Column '{c}' must be a datetime column, got {dt.simpleString()}"
            )


def ensure(condition: bool, message: str) -> None:
    """Raise InvalidParameterError unless condition holds."""
    if not condition:
        raise InvalidParameterError(message)


def require_nonempty_columns(columns) -> list[str]:
    cols = list(columns)
    ensure(len(cols) > 0, "at least one column is required")
    return cols
