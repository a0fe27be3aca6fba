"""Categorical encoding operators (reference: src/transformers/categorical.rs).

Parity traps honored (SURVEY.md §2.4-B/E):
- unseen-category defaults: count/ordinal -> 0, mean/WoE -> 0.0,
  rare-label -> pass-through unchanged.
- WoE uses RAW counts (not rates) with +1e-6 smoothing
  (categorical.rs:578).

Scale strategy: mappings are literal when()-chains below 64 categories and
broadcast-join mapping tables above (identical results; no fact-side
shuffle either way) — functions/expressions.apply_value_mapping.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import apply_value_mapping, sanitize_category
from ..pipeline import Transformer
from ..validation import (
    ensure,
    require_nonempty_columns,
    validate_numeric_columns,
    validate_string_columns,
)


def _distinct_values(df: DataFrame, column: str) -> list[str]:
    """SELECT DISTINCT col, nulls skipped, sorted for determinism
    (categorical.rs:95-124; reference order is engine-dependent, we pin
    alphabetical)."""
    rows = (
        df.select(column)
        .where(F.col(column).isNotNull())
        .distinct()
        .orderBy(column)
        .collect()
    )
    return [r[0] for r in rows]


class OneHotEncoder(Transformer):
    """fit: distinct categories per column; transform: KEEPS the original
    column and appends one int 0/1 column per category named
    ``{col}_{sanitized_cat}`` (categorical.rs:197-259). Deliberately NOT
    pyspark.ml's sparse-vector OneHotEncoder — the reference emits flat
    int columns."""

    def __init__(self, columns: list[str]):
        self.columns = require_nonempty_columns(columns)
        self.categories_: dict[str, list[str]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        self.categories_ = {c: _distinct_values(df, c) for c in self.columns}

    def _transform(self, df: DataFrame) -> DataFrame:
        new_cols = [
            F.when(F.col(c) == F.lit(cat), 1)
            .otherwise(0)
            .cast("int")
            .alias(f"{c}_{sanitize_category(cat)}")
            for c in self.columns
            for cat in self.categories_[c]
        ]
        return df.select("*", *new_cols)


class CountFrequencyEncoder(Transformer):
    """fit: category -> count map; transform: category replaced by its
    bigint count, unseen -> 0 (categorical.rs:262-313)."""

    def __init__(self, columns: list[str]):
        self.columns = require_nonempty_columns(columns)
        self.mappings_: dict[str, dict[str, int]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        self.mappings_ = {}
        for c in self.columns:
            rows = (
                df.where(F.col(c).isNotNull()).groupBy(c).count().collect()
            )
            self.mappings_[c] = {r[0]: r[1] for r in rows}

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c in self.columns:
            out = apply_value_mapping(
                out, c, self.mappings_[c], F.lit(0), cast_to="bigint"
            )
        return out


class OrdinalEncoder(Transformer):
    """fit: distinct categories sorted alphabetically, enumerated from 0
    (categorical.rs:335-349); transform: category -> bigint ordinal,
    unseen -> 0 (categorical.rs:366)."""

    def __init__(self, columns: list[str]):
        self.columns = require_nonempty_columns(columns)
        self.mappings_: dict[str, dict[str, int]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        self.mappings_ = {
            c: {cat: i for i, cat in enumerate(_distinct_values(df, c))}
            for c in self.columns
        }

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c in self.columns:
            out = apply_value_mapping(
                out, c, self.mappings_[c], F.lit(0), cast_to="bigint"
            )
        return out


class MeanEncoder(Transformer):
    """fit: GROUP BY col AVG(target) (categorical.rs:401-407); transform:
    category -> mean (double), unseen -> 0.0 (categorical.rs:461)."""

    def __init__(self, columns: list[str], target: str):
        self.columns = require_nonempty_columns(columns)
        self.target = target
        self.mappings_: dict[str, dict[str, float]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)
        if self.target in df.columns:
            validate_numeric_columns(df, [self.target])

    def _fit(self, df: DataFrame) -> None:
        validate_numeric_columns(df, [self.target])
        self.mappings_ = {}
        for c in self.columns:
            rows = (
                df.where(F.col(c).isNotNull())
                .groupBy(c)
                .agg(F.avg(self.target).alias("m"))
                .collect()
            )
            self.mappings_[c] = {r[0]: r["m"] for r in rows}

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c in self.columns:
            out = apply_value_mapping(
                out, c, self.mappings_[c], F.lit(0.0), cast_to="double"
            )
        return out


class WoEEncoder(Transformer):
    """Weight-of-evidence against a binary 0/1 target
    (categorical.rs:473-610): per category,
    woe = ln((good + 1e-6) / (bad + 1e-6)) where good = count(target==1),
    bad = count(target!=1) — RAW counts, not rates (categorical.rs:578).
    Unseen -> 0.0 (categorical.rs:602). One groupBy per column with
    conditional aggregation (vs the reference's (col, target) group +
    driver-side regroup)."""

    EPS = 1e-6

    def __init__(self, columns: list[str], target: str):
        self.columns = require_nonempty_columns(columns)
        self.target = target
        self.mappings_: dict[str, dict[str, float]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        validate_numeric_columns(df, [self.target])
        tgt = F.col(self.target)
        self.mappings_ = {}
        for c in self.columns:
            rows = (
                df.where(F.col(c).isNotNull() & tgt.isNotNull())
                .groupBy(c)
                .agg(
                    F.sum(F.when(tgt == 1, 1).otherwise(0)).alias("good"),
                    F.sum(F.when(tgt == 1, 0).otherwise(1)).alias("bad"),
                )
                .collect()
            )
            self.mappings_[c] = {
                r[0]: math.log((r["good"] + self.EPS) / (r["bad"] + self.EPS))
                for r in rows
            }

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c in self.columns:
            out = apply_value_mapping(
                out, c, self.mappings_[c], F.lit(0.0), cast_to="double"
            )
        return out


class RareLabelEncoder(Transformer):
    """fit: category kept if its relative frequency >= threshold, else
    mapped to ``rare_label`` (default "rare"); threshold in [0,1]
    (categorical.rs:613-738). transform: unseen categories PASS THROUGH
    unchanged (ELSE = original column, categorical.rs:730)."""

    def __init__(self, columns: list[str], threshold: float, rare_label: str = "rare"):
        ensure(0.0 <= threshold <= 1.0, f"threshold must be in [0,1], got {threshold}")
        self.columns = require_nonempty_columns(columns)
        self.threshold = threshold
        self.rare_label = rare_label
        self.rare_categories_: dict[str, list[str]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        self.rare_categories_ = {}
        for c in self.columns:
            counts = df.where(F.col(c).isNotNull()).groupBy(c).count().collect()
            total = sum(r["count"] for r in counts)
            self.rare_categories_[c] = sorted(
                r[0] for r in counts if total > 0 and r["count"] / total < self.threshold
            )

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c in self.columns:
            rare = self.rare_categories_[c]
            if not rare:
                continue
            if len(rare) <= 64:
                out = out.withColumn(
                    c,
                    F.when(F.col(c).isin(rare), F.lit(self.rare_label)).otherwise(
                        F.col(c)
                    ),
                )
            else:
                out = apply_value_mapping(
                    out,
                    c,
                    {cat: self.rare_label for cat in rare},
                    F.col(c),
                    cast_to="string",
                )
        return out
