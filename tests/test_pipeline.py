"""Pipeline semantics tests (reference: src/pipeline.rs:118-192,
tests/test_core_pipeline.rs)."""

import math

import pytest

import feature_factory_spark as ff


@pytest.fixture()
def df(spark):
    # tests/test_core_pipeline.rs:22-31 fixture: x=[1,2,3], y=[0.25,0.5,0.75]
    return spark.createDataFrame(
        [(1.0, 0.25), (2.0, 0.5), (3.0, 0.75)], "x double, y double"
    )


def test_empty_pipeline_rejected():
    with pytest.raises(ff.InvalidParameterError):
        ff.Pipeline([])


def test_non_transformer_rejected():
    with pytest.raises(ff.InvalidParameterError):
        ff.Pipeline([("bad", object())])


def test_fit_transform_chain(df):
    # ln(x) then asin(sqrt(y)) (tests/test_core_pipeline.rs:84-109)
    pipe = ff.make_pipeline(
        ("log", ff.LogTransformer(["x"])),
        ("arcsin", ff.ArcsinTransformer(["y"])),
    )
    out = pipe.fit(df)
    rows = out.orderBy("x").collect()
    assert [r["x"] for r in rows] == pytest.approx(
        [0.0, math.log(2), math.log(3)], abs=1e-5
    )
    assert [r["y"] for r in rows] == pytest.approx(
        [math.asin(0.5), math.asin(math.sqrt(0.5)), math.asin(math.sqrt(0.75))],
        abs=1e-5,
    )


def test_error_wrapped_with_step_name(df):
    pipe = ff.make_pipeline(("broken", ff.MeanMedianImputer(["nope"])))
    with pytest.raises(ff.MissingColumnError, match="broken"):
        pipe.fit(df)


def test_transform_requires_prefitted(df):
    pipe = ff.make_pipeline(("imp", ff.MeanMedianImputer(["x"])))
    with pytest.raises(ff.FitNotCalledError):
        pipe.transform(df)


def test_prefitted_transform_only(df, spark):
    imp = ff.MeanMedianImputer(["x"]).fit(df)
    pipe = ff.make_pipeline(("imp", imp))
    fresh = spark.createDataFrame([(None, 0.5)], "x double, y double")
    assert pipe.transform(fresh).first()["x"] == pytest.approx(2.0)


def test_cache_intermediate(df):
    pipe = ff.Pipeline(
        [
            ("imp", ff.MeanMedianImputer(["x"])),
            ("win", ff.Winsorizer(["x"], 0.1, 0.9)),
        ],
        cache_intermediate=True,
    )
    out = pipe.fit(df)
    assert out.count() == 3


def test_stateless_fit_is_noop(df):
    t = ff.LogTransformer(["x"])
    assert not t.is_stateful()
    t.fit(df)  # must not raise or run jobs


def test_fitted_state_json(df):
    t = ff.MeanMedianImputer(["x"]).fit(df)
    state = t.get_fitted_state()
    assert state["impute_values"]["x"] == pytest.approx(2.0)
