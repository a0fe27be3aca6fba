"""Golden tests for imputation operators (reference fixture F1:
tests/test_transformers_imputation.rs:18-42)."""

import pytest

import feature_factory_spark as ff


@pytest.fixture()
def f1(spark):
    return spark.createDataFrame(
        [(1.0, "x"), (2.0, None), (None, "x"), (4.0, "y")], "a double, b string"
    )


def vals(df, col):
    return [r[col] for r in df.collect()]


def test_mean_impute(f1):
    t = ff.MeanMedianImputer(["a"])
    out = t.fit_transform(f1)
    assert t.impute_values["a"] == pytest.approx(7.0 / 3.0, abs=1e-6)
    assert sorted(vals(out, "a")) == pytest.approx([1.0, 2.0, 7.0 / 3.0, 4.0])


def test_median_impute(f1):
    # reference stubs median with NotImplemented; we implement it —
    # median of [1,2,4] = 2.0 (exact interpolated)
    t = ff.MeanMedianImputer(["a"], "median")
    t.fit(f1)
    assert t.impute_values["a"] == pytest.approx(2.0)


def test_endtail_p50(f1):
    t = ff.EndTailImputer(["a"], 0.5)
    t.fit(f1)
    assert t.impute_values["a"] == pytest.approx(2.0)


def test_endtail_invalid_percentile():
    with pytest.raises(ff.InvalidParameterError):
        ff.EndTailImputer(["a"], 1.5)


def test_arbitrary_impute(f1):
    out = ff.ArbitraryNumberImputer(["a"], -1.0).transform(f1)
    assert sorted(vals(out, "a")) == [-1.0, 1.0, 2.0, 4.0]


def test_arbitrary_impute_nonfinite():
    with pytest.raises(ff.InvalidParameterError):
        ff.ArbitraryNumberImputer(["a"], float("nan"))


def test_categorical_impute_mode(f1):
    t = ff.CategoricalImputer(["b"])
    out = t.fit_transform(f1)
    assert t.impute_values["b"] == "x"
    assert sorted(vals(out, "b")) == ["x", "x", "x", "y"]


def test_categorical_impute_default(f1):
    t = ff.CategoricalImputer(["b"], default="zz")
    out = t.transform(f1)  # no fit needed when default given
    assert sorted(vals(out, "b")) == ["x", "x", "y", "zz"]


def test_missing_indicator(f1):
    out = ff.AddMissingIndicator(["a"]).transform(f1)
    assert "a_missing" in out.columns
    assert out.schema["a_missing"].dataType.simpleString() == "boolean"
    assert [r["a_missing"] for r in out.orderBy("b", "a").collect()].count(True) == 1


def test_drop_missing_all(f1):
    assert ff.DropMissingData().transform(f1).count() == 2


def test_drop_missing_subset(f1):
    assert ff.DropMissingData(["a"]).transform(f1).count() == 3


def test_missing_column_error(f1):
    with pytest.raises(ff.MissingColumnError):
        ff.MeanMedianImputer(["nope"]).fit(f1)


def test_fit_not_called(f1):
    with pytest.raises(ff.FitNotCalledError):
        ff.MeanMedianImputer(["a"]).transform(f1)


def test_wrong_type(f1):
    with pytest.raises(ff.InvalidParameterError):
        ff.MeanMedianImputer(["b"]).fit(f1)


def test_non_null_values_untouched(f1):
    out = ff.MeanMedianImputer(["a"]).fit_transform(f1)
    untouched = {1.0, 2.0, 4.0}
    assert untouched <= set(vals(out, "a"))
