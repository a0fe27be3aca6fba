"""Golden tests for discretization + outliers (reference fixture F6:
tests/test_transformers_discretization.rs, tests/test_transformers_outliers.rs)."""

import pytest

import feature_factory_spark as ff


def vals(df):
    return [r["value"] for r in df.orderBy("__id").collect()]


def mk(spark, values):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "__id int, value double"
    )


def test_arbitrary_disc(spark):
    df = mk(spark, [2, 6, 11])
    out = ff.ArbitraryDiscretizer(
        {"value": [(0, 5, "low"), (5, 10, "medium"), (10, 15, "high")]}
    ).transform(df)
    assert vals(out) == ["low", "medium", "high"]


def test_arbitrary_disc_outside_null(spark):
    df = mk(spark, [-1, 99])
    out = ff.ArbitraryDiscretizer({"value": [(0, 5, "low")]}).transform(df)
    assert vals(out) == [None, None]


def test_arbitrary_disc_invalid_interval():
    with pytest.raises(ff.InvalidParameterError):
        ff.ArbitraryDiscretizer({"value": [(5, 5, "x")]})


def test_equal_frequency(spark):
    df = mk(spark, range(1, 11))
    t = ff.EqualFrequencyDiscretizer(["value"], 3)
    out = t.fit_transform(df)
    # exact interpolated terciles of 1..10: [1, 4, 7, 10]
    assert vals(out) == (
        ["[1.00, 4.00)"] * 3 + ["[4.00, 7.00)"] * 3 + ["[7.00, 10.00)"] * 4
    )


def test_equal_width(spark):
    df = mk(spark, [0, 5, 10, 15, 20])
    out = ff.EqualWidthDiscretizer(["value"], 4).fit_transform(df)
    # last bin [15,20] inclusive but labeled ")"
    assert vals(out) == [
        "[0.00, 5.00)",
        "[5.00, 10.00)",
        "[10.00, 15.00)",
        "[15.00, 20.00)",
        "[15.00, 20.00)",
    ]


def test_geometric_width(spark):
    df = mk(spark, [1, 2, 4, 8, 16])
    t = ff.GeometricWidthDiscretizer(["value"], 3)
    out = t.fit_transform(df)
    # ratio = 16^(1/3) ≈ 2.5198: edges [1, 2.52, 6.35, 16]
    labels = vals(out)
    assert labels[0] == labels[1] == "[1.00, 2.52)"
    assert labels[-1].startswith("[6.35, 16.00")


def test_constant_column_error(spark):
    df = mk(spark, [5, 5, 5])
    for t in (
        ff.EqualFrequencyDiscretizer(["value"], 3),
        ff.EqualWidthDiscretizer(["value"], 3),
        ff.GeometricWidthDiscretizer(["value"], 3),
    ):
        with pytest.raises(ff.InvalidParameterError):
            t.fit(df)


def test_geometric_nonpositive_error(spark):
    df = mk(spark, [0, 1, 2])
    with pytest.raises(ff.InvalidParameterError):
        ff.GeometricWidthDiscretizer(["value"], 3).fit(df)


def test_capper(spark):
    df = mk(spark, [1, 5, 10, 20])
    out = ff.ArbitraryOutlierCapper({"value": 2.0}, {"value": 15.0}).transform(df)
    assert vals(out) == [2.0, 5.0, 10.0, 15.0]


def test_capper_invalid():
    with pytest.raises(ff.InvalidParameterError):
        ff.ArbitraryOutlierCapper({"value": 10.0}, {"value": 2.0})


def test_winsorizer_bounds_respected(spark):
    df = mk(spark, range(1, 11))
    t = ff.Winsorizer(["value"], 0.2, 0.8)
    out = t.fit_transform(df)
    lo, hi = t.bounds["value"]
    assert all(lo <= v <= hi for v in vals(out))
    # non-extreme values untouched
    assert 5.0 in vals(out)


def test_trimmer(spark):
    df = mk(spark, range(1, 11))
    t = ff.OutlierTrimmer(["value"], 0.3, 0.7)
    out = t.fit_transform(df)
    # p30 of 1..10 = 3.7, p70 = 7.3 → keeps 4..7
    assert sorted(vals(out)) == [4.0, 5.0, 6.0, 7.0]


def test_winsorizer_invalid_percentiles():
    with pytest.raises(ff.InvalidParameterError):
        ff.Winsorizer(["value"], 0.8, 0.2)
    with pytest.raises(ff.InvalidParameterError):
        ff.Winsorizer(["value"], -0.1, 0.5)


class TestDecisionTreeDiscretiser:
    def test_finds_step_boundary(self, spark):
        rows = [(float(i), 0.0 if i < 50 else 100.0) for i in range(100)]
        df = spark.createDataFrame(rows, "x double, y double")
        dt = ff.DecisionTreeDiscretiser(["x"], "y", max_depth=1).fit(df)
        ivs = dt.intervals_["x"]
        assert len(ivs) == 2
        # the single split lands between the two target plateaus
        assert 49.0 <= ivs[0][1] <= 50.0
        out = dt.transform(df)
        assert out.select("x").distinct().count() == 2

    def test_no_signal_yields_single_bin(self, spark):
        df = spark.createDataFrame(
            [(float(i), 5.0) for i in range(10)], "x double, y double"
        )
        dt = ff.DecisionTreeDiscretiser(["x"], "y").fit(df)
        assert len(dt.intervals_["x"]) == 1
        out = dt.transform(df)
        # last bin is closed: every value (incl. max) gets the one label
        assert out.where("x IS NULL").count() == 0

    def test_label_contract_matches_other_discretizers(self, spark):
        rows = [(float(i), float(i > 5)) for i in range(10)]
        df = spark.createDataFrame(rows, "x double, y double")
        dt = ff.DecisionTreeDiscretiser(["x"], "y", max_depth=1).fit(df)
        label = dt.intervals_["x"][0][2]
        assert label.startswith("[") and label.endswith(")")

    def test_requires_fit(self, spark):
        from feature_factory_spark.exceptions import FitNotCalledError

        df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
        with pytest.raises(FitNotCalledError):
            ff.DecisionTreeDiscretiser(["x"], "y").transform(df)
