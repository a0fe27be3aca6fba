"""Discretization operators (reference: src/transformers/discretization.rs).

Output contract (SURVEY.md §2.4-C): string labels "[l, u)" with 2-decimal
bounds; bins half-open [l,u) except the last, which is [l,u] but still
labeled with ")"; values outside all bins -> NULL (discretization.rs:45-68,
262-270).

Scale notes: every fit computes ALL bin edges in ONE aggregate job
(the reference loops bins+1 jobs, discretization.rs:228-253); the
transform is a pure CASE projection (whole-stage codegen, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..exceptions import InvalidParameterError
from ..functions.expressions import interval_case_expr, interval_label
from ..functions.stats import column_min_max, column_quantiles
from ..pipeline import Transformer
from ..validation import ensure, require_nonempty_columns, validate_numeric_columns


def _edges_to_intervals(edges: list[float]) -> list[tuple[float, float, str]]:
    """Adjacent boundary pairs -> labeled intervals (discretization.rs:262-270)."""
    return [
        (lo, hi, interval_label(lo, hi))
        for lo, hi in zip(edges[:-1], edges[1:])
    ]


class ArbitraryDiscretizer(Transformer):
    """User-supplied (lower, upper, label) intervals per column
    (discretization.rs:160-198); validates lower < upper."""

    def __init__(self, intervals: dict[str, list[tuple[float, float, str]]]):
        ensure(bool(intervals), "at least one column is required")
        for c, ivs in intervals.items():
            ensure(bool(ivs), f"no intervals given for '{c}'")
            for lo, hi, _label in ivs:
                ensure(lo < hi, f"interval lower >= upper for '{c}': [{lo}, {hi})")
        self.intervals = {c: list(ivs) for c, ivs in intervals.items()}

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, list(self.intervals))

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c, ivs in self.intervals.items():
            out = out.withColumn(c, interval_case_expr(c, ivs))
        return out


class _FittedDiscretizer(Transformer):
    """Shared shell for discretizers that learn bin edges at fit time."""

    columns: list[str]
    bins: int
    intervals_: dict[str, list[tuple[float, float, str]]]

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns)

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c, ivs in self.intervals_.items():
            out = out.withColumn(c, interval_case_expr(c, ivs))
        return out


class EqualFrequencyDiscretizer(_FittedDiscretizer):
    """bins+1 quantile boundaries -> intervals (discretization.rs:201-289).
    Errors on a constant column (discretization.rs:254-261).

    Edges are exact interpolated percentiles by default (oracle twin:
    DuckDB quantile_cont); ``approx=True`` uses t-digest for scale."""

    def __init__(self, columns: list[str], bins: int, approx: bool = False):
        ensure(bins >= 1, f"bins must be >= 1, got {bins}")
        self.columns = require_nonempty_columns(columns)
        self.bins = bins
        self.approx = approx
        self.intervals_ = {}

    def _fit(self, df: DataFrame) -> None:
        probs = [i / self.bins for i in range(self.bins + 1)]
        qs = column_quantiles(df, self.columns, probs, approx=self.approx)
        self.intervals_ = {}
        for c in self.columns:
            edges = qs[c]
            if edges is None:
                raise InvalidParameterError(f"column '{c}' has no non-null values")
            if edges[0] == edges[-1]:
                raise InvalidParameterError(
                    f"column '{c}' is constant; cannot discretize"
                )
            self.intervals_[c] = _edges_to_intervals(edges)


class EqualWidthDiscretizer(_FittedDiscretizer):
    """min/max -> ``bins`` equal widths; last upper = max
    (discretization.rs:292-356); constant column -> error."""

    def __init__(self, columns: list[str], bins: int):
        ensure(bins >= 1, f"bins must be >= 1, got {bins}")
        self.columns = require_nonempty_columns(columns)
        self.bins = bins
        self.intervals_ = {}

    def _fit(self, df: DataFrame) -> None:
        mm = column_min_max(df, self.columns)
        self.intervals_ = {}
        for c in self.columns:
            mn, mx = mm[c]
            if mn is None:
                raise InvalidParameterError(f"column '{c}' has no non-null values")
            mn, mx = float(mn), float(mx)
            if mn == mx:
                raise InvalidParameterError(
                    f"column '{c}' is constant; cannot discretize"
                )
            width = (mx - mn) / self.bins
            edges = [mn + i * width for i in range(self.bins)] + [mx]
            self.intervals_[c] = _edges_to_intervals(edges)


class GeometricWidthDiscretizer(_FittedDiscretizer):
    """Geometric bins: ratio = (max/min)^(1/bins), boundaries min·ratio^i;
    requires min > 0 (discretization.rs:359-426)."""

    def __init__(self, columns: list[str], bins: int):
        ensure(bins >= 1, f"bins must be >= 1, got {bins}")
        self.columns = require_nonempty_columns(columns)
        self.bins = bins
        self.intervals_ = {}

    def _fit(self, df: DataFrame) -> None:
        mm = column_min_max(df, self.columns)
        self.intervals_ = {}
        for c in self.columns:
            mn, mx = mm[c]
            if mn is None:
                raise InvalidParameterError(f"column '{c}' has no non-null values")
            mn, mx = float(mn), float(mx)
            if mn <= 0:
                raise InvalidParameterError(
                    f"GeometricWidthDiscretizer requires min > 0 on '{c}', got {mn}"
                )
            if mn == mx:
                raise InvalidParameterError(
                    f"column '{c}' is constant; cannot discretize"
                )
            ratio = (mx / mn) ** (1.0 / self.bins)
            edges = [mn * ratio**i for i in range(self.bins)] + [mx]
            self.intervals_[c] = _edges_to_intervals(edges)


class DecisionTreeDiscretiser(_FittedDiscretizer):
    """Supervised (target-guided) binning: per column, fit a shallow
    ``pyspark.ml`` DecisionTreeRegressor of the target on that single
    feature and use the tree's split thresholds as bin edges (the
    feature-engine DecisionTreeDiscretiser, which the reference's 41-op
    inventory lacks — model-based operators are the one feature-engine
    category it skipped).

    The tree fit is Spark's distributed implementation — histogram-based
    split search over partitioned data, no driver materialization; depth
    ``max_depth`` caps the edge count at 2^depth - 1. Output keeps the
    package's interval-label contract ("[l, u)", §2.4-C) so downstream
    encoders treat tree bins exactly like quantile bins.

    Not SQL-expressible (oracle gets a rows-only check); determinism is
    seed-and-data bound like any distributed tree fit. A column the tree
    refuses to split (constant / no signal) becomes one [min, max] bin.
    """

    def __init__(
        self,
        columns: list[str],
        target_col: str,
        max_depth: int = 3,
        seed: int = 42,
    ):
        ensure(max_depth >= 1, "max_depth must be >= 1")
        self.columns = require_nonempty_columns(columns)
        self.target_col = target_col
        self.max_depth = max_depth
        self.seed = seed
        self.intervals_ = {}

    def _check_input(self, df: DataFrame) -> None:
        validate_numeric_columns(df, self.columns + [self.target_col])

    @staticmethod
    def _tree_thresholds(model) -> list[float]:
        """Collect continuous-split thresholds by walking the fitted
        tree's java node graph (no public python traversal API)."""
        out: list[float] = []

        def walk(node) -> None:
            if node.getClass().getSimpleName() != "InternalNode":
                return
            out.append(float(node.split().threshold()))
            walk(node.leftChild())
            walk(node.rightChild())

        walk(model._call_java("rootNode"))
        return out

    def _fit(self, df: DataFrame) -> None:
        from pyspark.ml.feature import VectorAssembler
        from pyspark.ml.regression import DecisionTreeRegressor

        mm = column_min_max(df, self.columns)
        self.intervals_ = {}
        for c in self.columns:
            lo, hi = mm[c]
            if lo is None:
                raise InvalidParameterError(f"column '{c}' has no non-null values")
            lo, hi = float(lo), float(hi)
            assembled = VectorAssembler(
                inputCols=[c], outputCol="__ff_vec", handleInvalid="skip"
            ).transform(df.select(c, self.target_col))
            tree = DecisionTreeRegressor(
                featuresCol="__ff_vec",
                labelCol=self.target_col,
                maxDepth=self.max_depth,
                seed=self.seed,
            ).fit(assembled)
            cuts = sorted(
                {t for t in self._tree_thresholds(tree) if lo < t < hi}
            )
            edges = [lo, *cuts, hi] if hi > lo else [lo, lo + 1.0]
            self.intervals_[c] = _edges_to_intervals(edges)
