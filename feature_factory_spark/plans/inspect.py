"""Plan inspection helpers — the scale-review feedback loop.

Used in tests and during development to assert that the physical plans we
ship are the plans we want at 100 TB: filters pushed to the parquet scan,
columns pruned, whole-stage codegen covering the hot expressions, and no
unexpected shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """df.explain output as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def plan_report(df: DataFrame) -> dict[str, object]:
    """Quick structural summary of the physical plan."""
    plan = explain_str(df, "formatted")
    return {
        "exchanges": plan.count("Exchange"),
        "wholestage_codegen": "codegen id" in plan or "WholeStageCodegen" in plan,
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "batch_scan": "Scan parquet" in plan,
        "plan": plan,
    }
