"""Fit-time statistics helpers.

Design rule (SURVEY.md §4.3): every multi-column / multi-statistic fit runs
as ONE Spark aggregate job, never a per-column or per-statistic loop (the
reference issues bins+1 jobs for quantiles, discretization.rs:228-253, and
two jobs for min/max, discretization.rs:100-157 — we deliberately don't).

Exactness rule (SURVEY.md §2.4-A): exact statistics by default so results
match the DuckDB oracle; ``approx=True`` switches quantiles to Spark's
t-digest ``approx_percentile`` for the 100 TB scale path (single pass,
bounded memory, no global sort).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_single_pass(df: DataFrame, exprs: list) -> dict[str, object]:
    """Run all aggregate expressions in one job; return alias -> value."""
    row = df.agg(*exprs).collect()[0]
    return row.asDict()


def column_means(df: DataFrame, columns: list[str]) -> dict[str, float]:
    out = agg_single_pass(df, [F.avg(c).alias(c) for c in columns])
    return {c: out[c] for c in columns}


def column_quantiles(
    df: DataFrame,
    columns: list[str],
    probs: list[float],
    approx: bool = False,
    accuracy: int = 10000,
) -> dict[str, list[float]]:
    """Per-column quantiles at the given probabilities, one aggregate job
    for ALL columns and ALL probabilities.

    exact: Spark `percentile` (interpolated order statistic — identical
    semantics to DuckDB `quantile_cont`, which is the oracle twin).
    approx: `approx_percentile` (t-digest; mergeable, single-pass — the
    scale path).

    Setting env FF_APPROX_QUANTILES=1 flips every quantile fit that did
    not explicitly ask for exact onto the approx path — the one-switch
    way to run a pipeline written against the exact default at 100 TB
    (exact `percentile` is a sort-based aggregate; t-digest is a
    single-pass mergeable sketch). Callers that pass approx=True are
    unaffected; there is deliberately no env to force exact back on."""
    if not approx and os.environ.get("FF_APPROX_QUANTILES") == "1":
        approx = True
    probs_arr = F.array(*[F.lit(p) for p in probs])
    if approx:
        exprs = [
            F.percentile_approx(F.col(c).cast("double"), probs_arr, accuracy).alias(c)
            for c in columns
        ]
    else:
        exprs = [
            F.percentile(F.col(c).cast("double"), probs_arr).alias(c) for c in columns
        ]
    out = agg_single_pass(df, exprs)
    return {c: list(out[c]) if out[c] is not None else None for c in columns}


def column_min_max(
    df: DataFrame, columns: list[str]
) -> dict[str, tuple[float, float]]:
    """One job for min+max of every column (vs two jobs per column in the
    reference, discretization.rs:100-157)."""
    exprs = []
    for c in columns:
        exprs.append(F.min(c).alias(f"__min_{c}"))
        exprs.append(F.max(c).alias(f"__max_{c}"))
    out = agg_single_pass(df, exprs)
    return {c: (out[f"__min_{c}"], out[f"__max_{c}"]) for c in columns}


def category_group_stats(
    df: DataFrame,
    columns: list[str],
    agg_exprs: list,
    extra_cols: list[str] | None = None,
) -> dict[str, dict[str, tuple]]:
    """Per-(column, category) aggregates for ALL columns in ONE Spark job.

    Melts the target string columns into (col, value) pairs with explode,
    carries ``extra_cols`` (e.g. a target column) alongside, and runs a
    single groupBy — replacing the one-job-per-column loop the reference
    uses for every categorical fit (categorical.rs:127-164). Map-side
    partial aggregation shrinks the exploded rows back to the category
    count before the shuffle, so the explode does not inflate the exchange.

    Returns {column: {category: (agg1, agg2, ...)}} with NULL categories
    skipped (the reference skips them too, categorical.rs:101-124).
    """
    extra_cols = extra_cols or []
    # internal names are prefixed so user columns named 'col'/'value'
    # cannot collide with the melt machinery
    kv = F.explode(
        F.array(*[
            F.struct(F.lit(c).alias("__ff_col"), F.col(c).alias("__ff_val"))
            for c in columns
        ])
    ).alias("kv")
    melted = (
        df.select(kv, *[F.col(c) for c in extra_cols])
        .select("kv.__ff_col", "kv.__ff_val", *extra_cols)
        .where(F.col("__ff_val").isNotNull())
    )
    rows = melted.groupBy("__ff_col", "__ff_val").agg(*agg_exprs).collect()
    out: dict[str, dict[str, tuple]] = {c: {} for c in columns}
    for r in rows:
        out[r["__ff_col"]][r["__ff_val"]] = tuple(r[2:])
    return out


def column_modes(
    df: DataFrame, columns: list[str]
) -> dict[str, object]:
    """Per-column mode for STRING columns. Tie-break: highest count, then
    smallest value — deterministic (the reference's `ORDER BY cnt DESC
    LIMIT 1`, imputation.rs:297-305, is tie-unstable; we document the
    determinism).

    String-only by contract, enforced here: the one-job melt casts every
    value to string to share a single aggregate, so a numeric column
    would silently get a string-typed mode with a LEXICOGRAPHIC
    tie-break ('10' < '9'). Numeric modes need a per-type path; fail
    loudly instead of returning a wrong-typed answer.

    One job total: melt columns into (col, value) pairs via a stack/explode
    and aggregate once, instead of one job per column."""
    from ..validation import validate_string_columns

    validate_string_columns(df, columns)
    pairs = F.explode(
        F.array(*[
            F.struct(F.lit(c).alias("col"), F.col(c).cast("string").alias("value"))
            for c in columns
        ])
    ).alias("kv")
    melted = df.select(pairs).select("kv.col", "kv.value").where(F.col("value").isNotNull())
    counts = melted.groupBy("col", "value").count()
    # min_by over (-count, value): largest count first, then smallest
    # value — the documented tie-break — in ONE aggregate instead of a
    # second groupBy + join (struct comparison is lexicographic, and the
    # ordering key contains the value itself, so it is total: no
    # nondeterminism on count ties)
    best = counts.groupBy("col").agg(
        F.min_by(
            "value", F.struct((-F.col("count")).alias("nc"), F.col("value").alias("v"))
        ).alias("mode")
    )
    return {r["col"]: r["mode"] for r in best.collect()}
