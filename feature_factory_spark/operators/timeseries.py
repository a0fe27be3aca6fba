"""Time-series feature operators: lag, rolling-window, and expanding-
window features (modeled on feature-engine's timeseries module — the
reference's upstream inspiration ships LagFeatures / WindowFeatures /
ExpandingWindowFeatures, but the reference itself has none; SURVEY.md
§2.2 note on datetime being its only time-aware family).

All three are stateless projections over Spark window frames — pure
plan rewrites, no fit jobs, whole-stage codegen.

Leakage safety: like feature-engine, rolling and expanding windows END
AT THE PREVIOUS ROW (``ROWS BETWEEN ... AND 1 PRECEDING``): the feature
for row t summarizes strictly earlier rows, so a model trained on it
never peeks at the label row's own value. Lag is leakage-safe by
construction.

Scale shape: one exchange on ``partition_by`` serves every lag/window/
expanding column in the same operator (identical window spec -> Spark
reuses the sort). ``partition_by=None`` means ONE global ordering — a
single-task sort at scale; always partition by an entity key (user,
series id) on big data. Determinism: pass tie-breaking columns in
``sort_cols`` (e.g. [ts, event_id]) when the primary sort key can
repeat.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from ..logging_config import get_logger
from ..pipeline import Transformer
from ..validation import ensure, require_nonempty_columns, validate_columns

_LOGGER = get_logger()


def warn_global_window(operator: str, param: str) -> None:
    """Loud warning for the silent-scale-killer default: a window spec
    with no partition columns funnels the ENTIRE dataset through one
    task's sort at scale. Fine for a single small series; catastrophic
    on a 1000-executor cluster. Warn (stacklevel points at the caller's
    transform call) rather than raise — single-series use is legitimate."""
    msg = (
        f"{operator}: no {param} given — the window is GLOBAL, so the whole "
        "dataset sorts on a single task. Pass an entity/shard key in "
        f"{param} for any data that does not fit one executor."
    )
    _LOGGER.warning(msg)
    warnings.warn(msg, UserWarning, stacklevel=3)

_WINDOW_FUNCTIONS = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "std": F.stddev_samp,
}


class _TimeSeriesBase(Transformer):
    def __init__(
        self,
        columns: list[str],
        sort_cols: list[str],
        partition_by: list[str] | None = None,
    ):
        self.columns = require_nonempty_columns(columns)
        self.sort_cols = require_nonempty_columns(sort_cols)
        self.partition_by = list(partition_by) if partition_by else []

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(
            df, self.columns + self.sort_cols + self.partition_by
        )

    def _window(self) -> WindowSpec:
        cols = [F.col(c) for c in self.sort_cols]
        if self.partition_by:
            return Window.partitionBy(*self.partition_by).orderBy(*cols)
        warn_global_window(type(self).__name__, "partition_by")
        return Window.orderBy(*cols)


class LagFeatures(_TimeSeriesBase):
    """Append ``{col}_lag_{p}`` for every column and every period in
    ``periods`` (feature-engine LagFeatures). Rows without ``p``
    predecessors get NULL.

    >>> df = spark.createDataFrame(
    ...     [("u", 1, 10.0), ("u", 2, 20.0)], "k string, t int, v double")
    >>> out = LagFeatures(["v"], ["t"], partition_by=["k"]).transform(df)
    >>> [r["v_lag_1"] for r in out.orderBy("t").collect()]
    [None, 10.0]
    """

    def __init__(
        self,
        columns: list[str],
        sort_cols: list[str],
        periods: list[int] | None = None,
        partition_by: list[str] | None = None,
    ):
        super().__init__(columns, sort_cols, partition_by)
        self.periods = list(periods) if periods else [1]
        ensure(
            all(p >= 1 for p in self.periods),
            "every lag period must be >= 1",
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        w = self._window()
        new_cols = [
            F.lag(F.col(c), p).over(w).alias(f"{c}_lag_{p}")
            for c in self.columns
            for p in self.periods
        ]
        return df.select("*", *new_cols)


class WindowFeatures(_TimeSeriesBase):
    """Append ``{col}_window_{w}_{fn}``: rolling aggregates over the
    ``window`` rows STRICTLY BEFORE each row (rows -window..-1 — the
    feature-engine shift-by-1 leakage guard). Functions: mean, sum, min,
    max, count, std."""

    def __init__(
        self,
        columns: list[str],
        sort_cols: list[str],
        window: int = 3,
        functions: list[str] | None = None,
        partition_by: list[str] | None = None,
    ):
        super().__init__(columns, sort_cols, partition_by)
        ensure(window >= 1, "window must be >= 1")
        self.window = window
        self.functions = list(functions) if functions else ["mean"]
        for fn in self.functions:
            ensure(
                fn in _WINDOW_FUNCTIONS,
                f"unknown window function '{fn}' "
                f"(supported: {sorted(_WINDOW_FUNCTIONS)})",
            )

    def _transform(self, df: DataFrame) -> DataFrame:
        w = self._window().rowsBetween(-self.window, -1)
        new_cols = [
            _WINDOW_FUNCTIONS[fn](F.col(c))
            .over(w)
            .alias(f"{c}_window_{self.window}_{fn}")
            for c in self.columns
            for fn in self.functions
        ]
        return df.select("*", *new_cols)


class ExpandingWindowFeatures(_TimeSeriesBase):
    """Append ``{col}_expanding_{fn}``: aggregates over ALL rows strictly
    before each row (running history, leakage-safe). The first row of
    each partition gets NULL (count gets 0)."""

    def __init__(
        self,
        columns: list[str],
        sort_cols: list[str],
        functions: list[str] | None = None,
        partition_by: list[str] | None = None,
    ):
        super().__init__(columns, sort_cols, partition_by)
        self.functions = list(functions) if functions else ["mean"]
        for fn in self.functions:
            ensure(
                fn in _WINDOW_FUNCTIONS,
                f"unknown window function '{fn}' "
                f"(supported: {sorted(_WINDOW_FUNCTIONS)})",
            )

    def _transform(self, df: DataFrame) -> DataFrame:
        w = self._window().rowsBetween(Window.unboundedPreceding, -1)
        new_cols = [
            _WINDOW_FUNCTIONS[fn](F.col(c))
            .over(w)
            .alias(f"{c}_expanding_{fn}")
            for c in self.columns
            for fn in self.functions
        ]
        return df.select("*", *new_cols)
