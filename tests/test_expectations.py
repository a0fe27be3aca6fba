"""ExpectationValidator (operators/expectations.py): the declarative
stage-boundary data-quality gate — one aggregate job for the whole
check list, fail-loud enforce()."""

import pytest

import feature_factory_spark as ff


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(i, float(i % 10), "a" if i % 2 else "b",
          None if i % 5 == 0 else "t")
         for i in range(100)],
        "id bigint, v double, cat string, t string",
    )


def test_all_checks_pass_and_report_shape(frame):
    v = ff.ExpectationValidator([
        ("row_count_between", "rows", 50, 200),
        ("unique", "id_unique", "id"),
        ("not_null_ratio_at_least", "t_nn", "t", 0.7),
        ("values_between", "v_range", "v", 0.0, 9.0),
        ("values_in_set", "cat_domain", "cat", ["a", "b"]),
        ("mean_between", "v_mean", "v", 4.0, 5.0),
    ])
    rep = {r["check"]: r for r in v.validate(frame).collect()}
    assert all(r["passed"] for r in rep.values())
    assert rep["rows"]["observed"] == 100.0
    assert rep["t_nn"]["observed"] == 0.8
    assert rep["v_mean"]["observed"] == 4.5
    # enforce passes through unchanged for composition
    assert v.enforce(frame) is frame


def test_failures_detected_and_enforced(frame):
    v = ff.ExpectationValidator([
        ("row_count_between", "rows", 1, 10),
        ("unique", "cat_unique", "cat"),
        ("values_between", "v_tight", "v", 0.0, 5.0),
        ("values_in_set", "cat_small", "cat", ["a"]),
        ("mean_between", "v_off", "v", 9.0, 10.0),
        ("not_null_ratio_at_least", "t_strict", "t", 0.95),
    ])
    rep = {r["check"]: r["passed"] for r in v.validate(frame).collect()}
    assert not any(rep.values())
    with pytest.raises(ff.ValidationFailedError, match="v_tight"):
        v.enforce(frame)


def test_null_and_empty_edges(spark):
    empty = spark.createDataFrame([], "id bigint, v double")
    v = ff.ExpectationValidator([
        ("row_count_between", "rows", 0, 5),
        ("values_between", "v_range", "v", 0.0, 1.0),  # vacuous on empty
        ("not_null_ratio_at_least", "v_nn", "v", 0.5),  # vacuous on empty
    ])
    rep = {r["check"]: r["passed"] for r in v.validate(empty).collect()}
    assert rep == {"rows": True, "v_range": True, "v_nn": True}
    # all-null column: mean check fails loud, not silently passes
    nulls = spark.createDataFrame([(1, None), (2, None)], "id bigint, v double")
    m = ff.ExpectationValidator([("mean_between", "m", "v", 0.0, 1.0)])
    assert m.validate(nulls).collect()[0]["passed"] is False


def test_validation_of_specs(frame):
    with pytest.raises(Exception):
        ff.ExpectationValidator([])
    with pytest.raises(Exception, match="unknown check"):
        ff.ExpectationValidator([("nope", "x", "v")])
    with pytest.raises(Exception, match="unique"):
        ff.ExpectationValidator([
            ("unique", "same", "v"), ("unique", "same", "id"),
        ])
    with pytest.raises(Exception):
        ff.ExpectationValidator(
            [("unique", "u", "missing_col")]
        ).validate(frame)


def test_single_job(frame):
    # the whole check list is ONE aggregate: no per-check actions
    v = ff.ExpectationValidator([
        ("unique", "id_unique", "id"),
        ("mean_between", "v_mean", "v", 0.0, 10.0),
        ("values_in_set", "cat_domain", "cat", ["a", "b"]),
    ])
    sc = frame.sparkSession.sparkContext
    before = sc.statusTracker().getJobIdsForGroup(None)
    v.validate(frame).collect()  # report build collects once more
    # can't easily count jobs portably; assert via plan instead:
    plan = frame.agg(*v._aggs())._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 4  # one agg chain, no joins
    assert "Join" not in plan
