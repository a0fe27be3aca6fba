"""Categorical encoding operators (reference: src/transformers/categorical.rs).

Parity traps honored (SURVEY.md §2.4-B/E):
- unseen-category defaults: count/ordinal -> 0, mean/WoE -> 0.0,
  rare-label -> pass-through unchanged.
- WoE uses RAW counts (not rates) with +1e-6 smoothing
  (categorical.rs:578); rows with NULL target count as bad, matching the
  reference's GROUP BY (col, target) accounting (categorical.rs:565-573).

Scale strategy:
- every multi-column fit is ONE melted groupBy job
  (functions/stats.category_group_stats), not a per-column loop;
- mappings are literal when()-chains below 64 categories and
  broadcast-join mapping tables above (identical results; no fact-side
  shuffle either way) — functions/expressions.apply_value_mapping;
- OneHotEncoder refuses unbounded vocabularies (``max_categories``): an
  uncapped distinct-collect on a high-cardinality column at 100x scale
  means driver OOM plus a 100k-column projection.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import InvalidParameterError
from ..functions.expressions import apply_value_mapping, sanitize_category
from ..functions.stats import category_group_stats
from ..pipeline import Transformer
from ..validation import (
    ensure,
    require_nonempty_columns,
    validate_columns,
    validate_numeric_columns,
    validate_string_columns,
)


def _category_counts(
    df: DataFrame, columns: list[str]
) -> dict[str, dict[str, int]]:
    """Per-column category -> count, one Spark job for all columns."""
    stats = category_group_stats(df, columns, [F.count("*").alias("n")])
    return {c: {k: v[0] for k, v in m.items()} for c, m in stats.items()}


class OneHotEncoder(Transformer):
    """fit: distinct categories per column; transform: KEEPS the original
    column and appends one int 0/1 column per category named
    ``{col}_{sanitized_cat}`` (categorical.rs:197-259). Deliberately NOT
    pyspark.ml's sparse-vector OneHotEncoder — the reference emits flat
    int columns.

    ``max_categories`` (default 1000) guards against unbounded fit-time
    vocabulary collection: beyond it the fit errors instead of building a
    driver-OOM-sized mapping and a 100k-column projection."""

    def __init__(self, columns: list[str], max_categories: int = 1000):
        ensure(max_categories >= 1, "max_categories must be >= 1")
        self.columns = require_nonempty_columns(columns)
        self.max_categories = max_categories
        self.categories_: dict[str, list[str]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        counts = _category_counts(df, self.columns)
        for c, m in counts.items():
            if len(m) > self.max_categories:
                raise InvalidParameterError(
                    f"OneHotEncoder: column '{c}' has {len(m)} categories, "
                    f"exceeding max_categories={self.max_categories}"
                )
        self.categories_ = {c: sorted(counts[c]) for c in self.columns}

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
    """fit: category -> count map (one melted job for all columns);
    transform: category replaced by its bigint count, unseen -> 0
    (categorical.rs:262-313).

    >>> df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    >>> enc = CountFrequencyEncoder(["k"]).fit(df)
    >>> new = spark.createDataFrame([("a",), ("zzz",)], "k string")
    >>> sorted(r["k"] for r in enc.transform(new).collect())
    [0, 2]
    """

    def __init__(self, columns: list[str]):
        self.columns = require_nonempty_columns(columns)
        self.mappings_: dict[str, dict[str, int]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        self.mappings_ = _category_counts(df, self.columns)

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
    unseen -> 0 (categorical.rs:366). One fit job for all columns."""

    def __init__(self, columns: list[str]):
        self.columns = require_nonempty_columns(columns)
        self.mappings_: dict[str, dict[str, int]] = {}

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def _fit(self, df: DataFrame) -> None:
        counts = _category_counts(df, self.columns)
        self.mappings_ = {
            c: {cat: i for i, cat in enumerate(sorted(counts[c]))}
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
    category -> mean (double), unseen -> 0.0 (categorical.rs:461).
    One melted fit job for all columns."""

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
        stats = category_group_stats(
            df, self.columns, [F.avg(self.target).alias("m")], [self.target]
        )
        self.mappings_ = {c: {k: v[0] for k, v in m.items()} for c, m in stats.items()}

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
    bad = all other rows of that category INCLUDING NULL targets — the
    reference's GROUP BY (col, target) counts a NULL-target group as bad
    (categorical.rs:565-573). RAW counts, not rates (categorical.rs:578).
    Unseen -> 0.0 (categorical.rs:602). One melted fit job for all
    columns."""

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
        stats = category_group_stats(
            df,
            self.columns,
            [
                F.sum(F.when(tgt == 1, 1).otherwise(0)).alias("good"),
                F.count("*").alias("n"),
            ],
            [self.target],
        )
        self.mappings_ = {
            c: {
                k: math.log((good + self.EPS) / ((n - good) + self.EPS))
                for k, (good, n) in m.items()
            }
            for c, m in stats.items()
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
    unchanged (ELSE = original column, categorical.rs:730). One melted
    fit job for all columns."""

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
        counts = _category_counts(df, self.columns)
        self.rare_categories_ = {}
        for c in self.columns:
            total = sum(counts[c].values())
            self.rare_categories_[c] = sorted(
                k for k, n in counts[c].items() if total > 0 and n / total < self.threshold
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


class OutOfFoldMeanEncoder(Transformer):
    """Leakage-safe target (mean) encoding: each row's category is
    replaced by the target mean computed from the OTHER folds, so no row
    contributes to its own encoding — the cross-fitting scheme production
    target encoders use (naive MeanEncoder leaks the row's own label,
    which inflates high-cardinality categories into memorized features).

    Folds are deterministic md5-hash buckets of ``id_col`` (the same
    cross-engine-stable rule as HashSampler/HashSplitter) — fold
    assignment survives reruns, partitioning changes, and engine moves,
    so the encoding is reproducible and SQL-verifiable.

    out-of-fold mean for (category g, fold f):
        (sum_g - sum_{g,f}) / (cnt_g - cnt_{g,f})
    i.e. one groupBy(category, fold) aggregate plus window totals over
    the category — TWO exchanges on a skew-free composite key, however
    many folds. Categories seen in only one fold fall back to the GLOBAL
    out-of-fold mean for that fold (same formula, category dropped);
    ``smoothing`` (>= 0 pseudo-observations of the global mean) shrinks
    rare categories toward it.

    Stateless-per-frame like the reference's selection operators: the
    encoding is a pure plan over the input (fit is a no-op hook). Use
    plain MeanEncoder fit on train for serving unseen data.
    """

    def __init__(
        self,
        columns: list[str],
        target: str,
        id_col: str,
        n_folds: int = 5,
        smoothing: float = 0.0,
        salt: str = "ff-oof",
    ):
        ensure(n_folds >= 2, "n_folds must be >= 2")
        ensure(smoothing >= 0.0, "smoothing must be >= 0")
        self.columns = require_nonempty_columns(columns)
        self.target = target
        self.id_col = id_col
        self.n_folds = n_folds
        self.smoothing = smoothing
        self.salt = salt

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)
        validate_columns(df, [self.id_col])
        validate_numeric_columns(df, [self.target])

    def _fold_expr(self) -> Column:
        from .sampling import hash_fraction_expr

        return F.floor(
            hash_fraction_expr(F.col(self.id_col), self.salt)
            * F.lit(float(self.n_folds))
        ).cast("int")

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        # Scale shape: NEVER a window over the raw frame — a global
        # (lit-partitioned) window serializes the corpus through one
        # task, and a per-category window makes every hot category a
        # straggler. Instead every statistic reduces through groupBy
        # (map-side partial aggregation eats the skew) down to
        # cats x folds rows, windows run over THOSE tiny frames, and the
        # results broadcast-join back onto the corpus.
        out = df.withColumn("__ff_fold", self._fold_expr())
        t = F.col(self.target).cast("double")

        # per-fold totals -> global out-of-fold mean per fold (n_folds rows)
        ft = out.groupBy("__ff_fold").agg(
            F.sum(t).alias("__ff_fs"), F.count(t).alias("__ff_fn")
        )
        w_all = Window.partitionBy(F.lit(1))  # over n_folds rows — trivial
        ft = ft.select(
            "__ff_fold",
            (
                (F.sum("__ff_fs").over(w_all) - F.col("__ff_fs"))
                / (F.sum("__ff_fn").over(w_all) - F.col("__ff_fn"))
            ).alias("__ff_gmean"),
        )
        out = out.join(F.broadcast(ft), on="__ff_fold", how="left")

        for c in self.columns:
            cf = out.groupBy(F.col(c).alias("__ff_cat"), "__ff_fold").agg(
                F.sum(t).alias("__ff_s"), F.count(t).alias("__ff_n")
            )
            w_cat = Window.partitionBy("__ff_cat")  # over cats x folds rows
            cf = cf.select(
                "__ff_cat",
                "__ff_fold",
                (F.sum("__ff_s").over(w_cat) - F.col("__ff_s")).alias("__ff_os"),
                (F.sum("__ff_n").over(w_cat) - F.col("__ff_n")).alias("__ff_on"),
            )
            out = out.join(
                F.broadcast(cf),
                on=[out[c].eqNullSafe(cf["__ff_cat"]),
                    out["__ff_fold"] == cf["__ff_fold"]],
                how="left",
            ).drop(cf["__ff_fold"]).drop("__ff_cat")
            smoothed = F.try_divide(
                F.col("__ff_os") + F.lit(self.smoothing) * F.col("__ff_gmean"),
                F.col("__ff_on") + F.lit(self.smoothing),
            )
            out = out.withColumn(
                c, F.coalesce(smoothed, F.col("__ff_gmean")).cast("double")
            ).drop("__ff_os", "__ff_on")
        return out.drop("__ff_fold", "__ff_gmean")
