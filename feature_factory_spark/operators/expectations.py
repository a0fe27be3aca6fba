"""Declarative data-quality expectations — the stage-boundary gate of
a production pipeline.

Between every two stages of a 100 TB build (ingest -> clean -> dedup ->
mix -> shard) something must assert the output still looks like a
corpus: row counts in range, key uniqueness, null ratios bounded,
values in their domains. :class:`ExpectationValidator` declares those
checks as data and evaluates ALL of them in ONE aggregate job —
the Great-Expectations-style contract re-expressed as a single Spark
aggregation (no per-check actions, no driver loops over data).

Checks (each a tuple; ``name`` is the reporting key):

- ``("row_count_between", name, lo, hi)``
- ``("not_null_ratio_at_least", name, col, ratio)``
- ``("unique", name, col)``               count(DISTINCT col) == count(col)
- ``("values_between", name, col, lo, hi)``   observed min/max inside
- ``("values_in_set", name, col, values)``    no value outside the set
- ``("mean_between", name, col, lo, hi)``

``validate(df)`` returns a small REPORT DataFrame (check, passed,
observed, bound) built from the single collected aggregate row — one
row per check, bounded by the check list, never by the data.
``enforce(df)`` raises ``ValidationFailedError`` listing every failed
check — the fail-loud pipeline gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..exceptions import FeatureFactoryError
from ..functions.frames import local_frame
from ..validation import ensure, validate_columns


class ValidationFailedError(FeatureFactoryError):
    """One or more data-quality expectations failed."""


_KINDS = (
    "row_count_between",
    "not_null_ratio_at_least",
    "unique",
    "values_between",
    "values_in_set",
    "mean_between",
)


class ExpectationValidator:
    """Evaluate a declared list of data-quality checks in one
    aggregate pass; see the module docstring for the check grammar."""

    def __init__(self, checks: list[tuple]):
        ensure(bool(checks), "at least one check is required")
        names = [c[1] for c in checks]
        ensure(len(set(names)) == len(names), "check names must be unique")
        for c in checks:
            ensure(c[0] in _KINDS, f"unknown check kind '{c[0]}'; "
                                   f"pick from {_KINDS}")
        self.checks = list(checks)

    def _cols(self) -> list[str]:
        return sorted({
            c[2] for c in self.checks if c[0] != "row_count_between"
        })

    def _aggs(self) -> list[Column]:
        aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
        for kind, name, *args in self.checks:
            if kind == "row_count_between":
                continue
            col = F.col(args[0])
            if kind == "not_null_ratio_at_least":
                aggs.append(F.count(col).alias(f"__nn_{name}"))
            elif kind == "unique":
                aggs.append(F.count_distinct(col).alias(f"__d_{name}"))
                aggs.append(F.count(col).alias(f"__c_{name}"))
            elif kind == "values_between":
                aggs.append(F.min(col).alias(f"__min_{name}"))
                aggs.append(F.max(col).alias(f"__max_{name}"))
            elif kind == "values_in_set":
                aggs.append(
                    F.sum(
                        (~col.isin(*args[1]) & col.isNotNull()).cast("long")
                    ).alias(f"__out_{name}")
                )
            elif kind == "mean_between":
                aggs.append(F.avg(col).alias(f"__avg_{name}"))
        return aggs

    def _evaluate(self, df: DataFrame) -> list[tuple]:
        validate_columns(df, self._cols())
        row = df.agg(*self._aggs()).collect()[0]
        n = row["__n"]
        out: list[tuple] = []
        for kind, name, *args in self.checks:
            if kind == "row_count_between":
                lo, hi = args
                out.append((name, lo <= n <= hi, float(n), f"[{lo},{hi}]"))
            elif kind == "not_null_ratio_at_least":
                _, ratio = args
                observed = (row[f"__nn_{name}"] / n) if n else 1.0
                out.append((name, observed >= ratio, float(observed),
                            f">={ratio}"))
            elif kind == "unique":
                d, c = row[f"__d_{name}"], row[f"__c_{name}"]
                out.append((name, d == c, float(c - d), "0 dupes"))
            elif kind == "values_between":
                _, lo, hi = args
                mn, mx = row[f"__min_{name}"], row[f"__max_{name}"]
                ok = mn is None or (mn >= lo and mx <= hi)
                obs = float(mx) if mx is not None else float("nan")
                out.append((name, bool(ok), obs, f"[{lo},{hi}]"))
            elif kind == "values_in_set":
                bad = row[f"__out_{name}"] or 0
                out.append((name, bad == 0, float(bad), "0 outside"))
            elif kind == "mean_between":
                _, lo, hi = args
                avg = row[f"__avg_{name}"]
                ok = avg is not None and lo <= avg <= hi
                obs = float(avg) if avg is not None else float("nan")
                out.append((name, bool(ok), obs, f"[{lo},{hi}]"))
        return out

    def validate(self, df: DataFrame) -> DataFrame:
        """(check, passed, observed, bound) — one row per check."""
        rows = self._evaluate(df)
        return local_frame(
            df.sparkSession,
            rows, "check string, passed boolean, observed double, bound string"
        )

    def enforce(self, df: DataFrame) -> DataFrame:
        """Raise :class:`ValidationFailedError` naming every failed
        check; return ``df`` unchanged when all pass (so the gate
        composes inside a pipeline)."""
        failures = [
            f"{name} (observed {obs}, want {bound})"
            for name, ok, obs, bound in self._evaluate(df)
            if not ok
        ]
        if failures:
            raise ValidationFailedError(
                "expectations failed: " + "; ".join(failures)
            )
        return df
