"""Golden tests for numerical transforms, feature creation, datetime
(reference fixtures F4/F5/F7/F8)."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff


@pytest.fixture()
def f7(spark):
    return spark.createDataFrame(
        [(1.0, 0.5, 2.0), (2.0, 1.5, 3.0), (10.0, 2.5, 4.0)],
        "a double, b double, c double",
    )


def vals(df, col):
    return [r[col] for r in df.collect()]


def test_log(f7):
    out = ff.LogTransformer(["a"]).transform(f7)
    assert vals(out, "a") == pytest.approx([0.0, math.log(2), math.log(10)], abs=1e-9)


def test_log_strict_rejects_nonpositive(spark):
    df = spark.createDataFrame([(0.0,), (1.0,)], "a double")
    with pytest.raises(ff.InvalidParameterError):
        ff.LogTransformer(["a"], strict=True).transform(df)


def test_logcp(f7):
    out = ff.LogCpTransformer(["b"], 1.0).transform(f7)
    assert vals(out, "b") == pytest.approx(
        [math.log(1.5), math.log(2.5), math.log(3.5)], abs=1e-9
    )


def test_reciprocal(f7):
    out = ff.ReciprocalTransformer(["c"]).transform(f7)
    assert vals(out, "c") == pytest.approx([0.5, 1 / 3, 0.25], abs=1e-9)


def test_reciprocal_strict_rejects_zero_span(spark):
    df = spark.createDataFrame([(-1.0,), (1.0,)], "a double")
    with pytest.raises(ff.InvalidParameterError):
        ff.ReciprocalTransformer(["a"], strict=True).transform(df)


def test_power(f7):
    out = ff.PowerTransformer(["a"], 2.0).transform(f7)
    assert vals(out, "a") == pytest.approx([1.0, 4.0, 100.0])


def test_boxcox(f7):
    out = ff.BoxCoxTransformer(["a"], 2.0).transform(f7)
    assert vals(out, "a") == pytest.approx([0.0, 1.5, 49.5])


def test_boxcox_lambda_zero_is_log(f7):
    out = ff.BoxCoxTransformer(["a"], 0.0).transform(f7)
    assert vals(out, "a") == pytest.approx([0.0, math.log(2), math.log(10)], abs=1e-9)


def test_yeojohnson_negative_branch(spark):
    df = spark.createDataFrame([(-1.0,), (0.0,), (1.0,)], "a double")
    lam = 0.5
    out = ff.YeoJohnsonTransformer(["a"], lam).transform(df)
    expected = [
        -(((1 - (-1.0)) ** (2 - lam) - 1) / (2 - lam)),
        0.0,
        ((1 + 1.0) ** lam - 1) / lam,
    ]
    assert vals(out, "a") == pytest.approx(expected, abs=1e-9)


def test_arcsin(spark):
    df = spark.createDataFrame([(0.25,), (0.5,), (0.75,)], "b double")
    out = ff.ArcsinTransformer(["b"]).transform(df)
    assert vals(out, "b") == pytest.approx(
        [math.asin(0.5), math.asin(math.sqrt(0.5)), math.asin(math.sqrt(0.75))],
        abs=1e-9,
    )


def test_math_features(f7):
    out = ff.MathFeatures(
        [("s", F.col("a") + F.col("c")), ("p", F.col("a") * F.col("c"))]
    ).transform(f7)
    assert vals(out, "s") == pytest.approx([3.0, 5.0, 14.0])
    assert vals(out, "p") == pytest.approx([2.0, 6.0, 40.0])


def test_math_features_empty_name():
    with pytest.raises(ff.InvalidParameterError):
        ff.MathFeatures([("", F.lit(1))])


def test_relative_features(spark):
    df = spark.createDataFrame(
        [(10.0, 2.0), (20.0, 4.0), (30.0, 5.0)], "t double, r double"
    )
    out = ff.RelativeFeatures(["t"], ["r"], ["ratio", "difference", "percent_change"]).transform(df)
    assert vals(out, "t_ratio_r") == pytest.approx([5.0, 5.0, 6.0])
    assert vals(out, "t_difference_r") == pytest.approx([8.0, 16.0, 25.0])
    assert vals(out, "t_percent_change_r") == pytest.approx([4.0, 4.0, 5.0])


def test_cyclical(spark):
    df = spark.createDataFrame([(0.0,), (6.0,), (12.0,), (18.0,)], "time double")
    out = ff.CyclicalFeatures({"time": 24.0}).transform(df)
    assert vals(out, "time_sin") == pytest.approx([0.0, 1.0, 0.0, -1.0], abs=1e-9)
    assert vals(out, "time_cos") == pytest.approx([1.0, 0.0, -1.0, 0.0], abs=1e-9)


def test_cyclical_invalid_period():
    with pytest.raises(ff.InvalidParameterError):
        ff.CyclicalFeatures({"time": 0.0})


@pytest.fixture()
def f4(spark):
    return spark.createDataFrame(
        [
            (datetime.datetime(2023, 3, 1, 12, 34, 56),),
            (datetime.datetime(2022, 12, 31, 23, 59, 59),),
            (datetime.datetime(2021, 1, 1, 0, 0, 0),),
        ],
        "ts timestamp",
    )


def test_datetime_features(f4):
    out = ff.DatetimeFeatures(["ts"]).transform(f4)
    rows = out.orderBy(F.desc("ts")).collect()
    assert [r["ts_year"] for r in rows] == [2023, 2022, 2021]
    assert [r["ts_month"] for r in rows] == [3, 12, 1]
    assert [r["ts_day"] for r in rows] == [1, 31, 1]
    assert [r["ts_hour"] for r in rows] == [12, 23, 0]
    assert [r["ts_minute"] for r in rows] == [34, 59, 0]
    assert [r["ts_second"] for r in rows] == [56, 59, 0]
    # Postgres dow semantics: Sunday=0 → Wed=3, Sat=6, Fri=5 (F4 golden)
    assert [r["ts_weekday"] for r in rows] == [3, 6, 5]


def test_datetime_requires_datetime_type(spark):
    df = spark.createDataFrame([(1.0,)], "ts double")
    with pytest.raises(ff.InvalidParameterError):
        ff.DatetimeFeatures(["ts"]).transform(df)


def test_datetime_subtraction(spark):
    # F5 golden: diffs in minutes = [296/60, 60.0]
    df = spark.createDataFrame(
        [
            (
                datetime.datetime(2023, 3, 1, 12, 34, 56),
                datetime.datetime(2023, 3, 1, 12, 30, 0),
            ),
            (
                datetime.datetime(2023, 3, 1, 0, 0, 0),
                datetime.datetime(2023, 2, 28, 23, 0, 0),
            ),
        ],
        "ts1 timestamp, ts2 timestamp",
    )
    out = ff.DatetimeSubtraction([("ts1", "ts2")], "minute").transform(df)
    assert sorted(vals(out, "ts1_minus_ts2")) == pytest.approx([296 / 60, 60.0])
