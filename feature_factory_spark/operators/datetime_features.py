"""Datetime operators (reference: src/transformers/datetime.rs)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline import Transformer
from ..validation import ensure, validate_datetime_columns


class DatetimeFeatures(Transformer):
    """Append per-column calendar parts (datetime.rs:39-102):
    _year _month _day _hour _minute _second _weekday.

    Parity trap (SURVEY.md §2.4-D): weekday is Postgres `dow` with
    Sunday=0..Saturday=6 (datetime.rs:83-85); Spark's dayofweek is Sunday=1,
    so we subtract 1."""

    PARTS = ("year", "month", "day", "hour", "minute", "second", "weekday")

    def __init__(self, columns: list[str], parts: list[str] | None = None):
        ensure(bool(columns), "at least one column is required")
        self.columns = list(columns)
        parts = list(parts) if parts else list(self.PARTS)
        for p in parts:
            ensure(p in self.PARTS, f"unknown datetime part '{p}'")
        self.parts = parts

    def _check_input(self, df: DataFrame) -> None:
        validate_datetime_columns(df, self.columns)

    def _transform(self, df: DataFrame) -> DataFrame:
        extractors = {
            "year": F.year,
            "month": F.month,
            "day": F.dayofmonth,
            "hour": F.hour,
            "minute": F.minute,
            "second": F.second,
            "weekday": lambda c: F.dayofweek(c) - F.lit(1),
        }
        new_cols = [
            extractors[p](F.col(c)).cast("int").alias(f"{c}_{p}")
            for c in self.columns
            for p in self.parts
        ]
        return df.select("*", *new_cols)


class DatetimeSubtraction(Transformer):
    """Append ``{left}_minus_{right}`` = (epoch(left) − epoch(right)) / unit
    with unit in {second:1, minute:60, hour:3600, day:86400}
    (datetime.rs:104-137). Float division as in the reference
    (datetime.rs:132); epoch seconds via timestamp→double cast (keeps
    sub-second precision, matching DuckDB's epoch())."""

    UNITS = {"second": 1.0, "minute": 60.0, "hour": 3600.0, "day": 86400.0}

    def __init__(self, pairs: list[tuple[str, str]], unit: str = "second"):
        ensure(bool(pairs), "at least one (left, right) pair is required")
        ensure(unit in self.UNITS, f"unknown unit '{unit}' (valid: {list(self.UNITS)})")
        self.pairs = list(pairs)
        self.unit = unit

    def _check_input(self, df: DataFrame) -> None:
        cols = [c for pair in self.pairs for c in pair]
        validate_datetime_columns(df, cols)

    def _transform(self, df: DataFrame) -> DataFrame:
        divisor = F.lit(self.UNITS[self.unit])
        new_cols = [
            (
                (
                    F.col(l).cast("timestamp").cast("double")
                    - F.col(r).cast("timestamp").cast("double")
                )
                / divisor
            ).alias(f"{l}_minus_{r}")
            for l, r in self.pairs
        ]
        return df.select("*", *new_cols)
