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


def plan_audit(df: DataFrame, fail: bool = False) -> list[dict]:
    """Lint a frame's PHYSICAL plan for the shapes that break at
    100 TB — the codified version of the scale review every operator
    in this package went through. Returns a list of findings
    ``{severity, kind, detail}`` (empty = clean); ``fail=True`` raises
    ``PlanAuditError`` on any ``error``-severity finding, the CI guard
    form ("this pipeline must never ship a cartesian product").

    Checks (string-level over ``explain('formatted')`` — cheap, no
    job):

    - **cartesian** (error): ``CartesianProduct`` /
      ``BroadcastNestedLoopJoin`` — O(n*m) pair blowup; bucket or
      block the join instead.
    - **single_partition** (error): an ``Exchange SinglePartition`` —
      a global window / global sort / coalesce(1) funnels the whole
      dataset through ONE task; partition the window or use the
      distributed prefix-sum pattern (CorpusShuffler).
    - **row_python_udf** (error): ``BatchEvalPython`` — row-at-a-time
      Python in the hot path, 10-100x slower than JVM expressions or
      Arrow-batched pandas UDFs.
    - **arrow_python_udf** (info): ``ArrowEvalPython`` / pandas UDF —
      legitimate at the decode seam, but worth knowing it is there.
    - **unpushed_filter** (warning): a ``Filter`` node in a plan whose
      parquet scans all report ``PushedFilters: []`` — the predicate
      may be re-expressible so the scan skips row groups (false
      positives possible: HOF predicates and post-shuffle filters are
      legitimately unpushable).

    The auditor reads only the final plan string, so it works on any
    frame — including one produced by code outside this package."""
    plan = explain_str(df, "formatted")
    findings: list[dict] = []

    def add(severity: str, kind: str, detail: str) -> None:
        findings.append(
            {"severity": severity, "kind": kind, "detail": detail}
        )

    if "CartesianProduct" in plan:
        add("error", "cartesian",
            "CartesianProduct join: O(n*m) pair blowup — add an "
            "equi-join key, LSH/cluster blocking, or broadcast a "
            "provably tiny side")
    if "BroadcastNestedLoopJoin" in plan:
        add("error", "cartesian",
            "BroadcastNestedLoopJoin: non-equi join re-scans the "
            "broadcast side per row — add an equi key or banded "
            "range buckets")
    if "Arguments: SinglePartition" in plan:
        add("error", "single_partition",
            "Exchange SinglePartition: a global window/sort/"
            "coalesce(1) funnels the dataset through one task — "
            "partition the window by an entity key or use a "
            "distributed prefix-sum")
    if "BatchEvalPython" in plan:
        add("error", "row_python_udf",
            "BatchEvalPython: row-at-a-time Python UDF in the plan — "
            "use built-in expressions or an Arrow-batched pandas UDF")
    if "ArrowEvalPython" in plan or "MapInPandas" in plan:
        add("info", "arrow_python_udf",
            "Arrow-batched Python stage present (legitimate at the "
            "decode seam; keep it off the hot row path)")
    if ("Scan parquet" in plan
            and ") Filter" in plan
            and plan.count("PushedFilters: [")
            == plan.count("PushedFilters: []")):
        add("warning", "unpushed_filter",
            "Filter node present but no parquet scan reports pushed "
            "filters — check whether the predicate can reach the scan")
    if fail and any(f["severity"] == "error" for f in findings):
        from ..exceptions import FeatureFactoryError

        raise FeatureFactoryError(
            "plan audit failed: "
            + "; ".join(
                f"{f['kind']}: {f['detail']}"
                for f in findings if f["severity"] == "error"
            )
        )
    return findings
