"""corpus_diff (operators/diff.py): snapshot bookkeeping — status
classification, NULL-sentinel fingerprint hygiene, multi-column
content comparison."""

import pytest

import feature_factory_spark as ff
from feature_factory_spark.operators.diff import corpus_diff


def test_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new, "doc_id", ["text"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_null_vs_sentinel_text_not_equal(spark):
    # a NULL column must not fingerprint-collide with any literal —
    # not the empty string and not text spelling a would-be sentinel
    old = spark.createDataFrame(
        [(1, None), (2, ""), (3, "N")], "doc_id bigint, t string"
    )
    new = spark.createDataFrame(
        [(1, ""), (2, None), (3, None)], "doc_id bigint, t string"
    )
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new, "doc_id", ["t"]).collect()}
    assert got == {1: "changed", 2: "changed", 3: "changed"}
    same = spark.createDataFrame([(1, None)], "doc_id bigint, t string")
    assert corpus_diff(same, same, "doc_id", ["t"]).collect()[0][
        "status"
    ] == "unchanged"


def test_multi_column_and_column_shift(spark):
    # ('x', NULL) vs (NULL, 'x') must differ (unit-separated sentinel)
    old = spark.createDataFrame([(1, "x", None)], "id bigint, a string, b string")
    new = spark.createDataFrame([(1, None, "x")], "id bigint, a string, b string")
    assert corpus_diff(old, new, "id", ["a", "b"]).collect()[0][
        "status"
    ] == "changed"
    # non-string content columns compare via their string form
    o2 = spark.createDataFrame([(1, 5)], "id bigint, v int")
    n2 = spark.createDataFrame([(1, 6)], "id bigint, v int")
    assert corpus_diff(o2, n2, "id", ["v"]).collect()[0]["status"] == "changed"


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id bigint, t string")
    with pytest.raises(Exception):
        corpus_diff(df, df, "id", [])
    with pytest.raises(Exception):
        corpus_diff(df, df, "id", ["missing"])


def test_plan_single_join_no_collect(spark):
    old = spark.createDataFrame([(i, f"t{i}") for i in range(50)],
                                "doc_id bigint, text string")
    new = spark.createDataFrame([(i, f"t{i + 1}") for i in range(50)],
                                "doc_id bigint, text string")
    out = corpus_diff(old, new, "doc_id", ["text"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan and "CartesianProduct" not in plan
