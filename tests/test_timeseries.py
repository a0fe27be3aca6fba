"""LagFeatures / WindowFeatures / ExpandingWindowFeatures (round 3)."""

import pytest

import feature_factory_spark as ff
from feature_factory_spark.exceptions import InvalidParameterError


@pytest.fixture()
def ts_df(spark):
    # two series; values 1..4 per series in time order
    rows = []
    for uid in ("a", "b"):
        for t in range(1, 5):
            rows.append((uid, t, float(t)))
    return spark.createDataFrame(rows, ["uid", "t", "v"])


class TestLagFeatures:
    def test_lag_values(self, ts_df):
        out = ff.LagFeatures(
            ["v"], ["t"], periods=[1, 2], partition_by=["uid"]
        ).transform(ts_df)
        rows = {(r["uid"], r["t"]): r for r in out.collect()}
        assert rows[("a", 1)]["v_lag_1"] is None
        assert rows[("a", 2)]["v_lag_1"] == 1.0
        assert rows[("a", 4)]["v_lag_2"] == 2.0
        # partitions do not leak into each other
        assert rows[("b", 1)]["v_lag_1"] is None

    def test_invalid_period(self):
        with pytest.raises(InvalidParameterError):
            ff.LagFeatures(["v"], ["t"], periods=[0])


class TestWindowFeatures:
    def test_rolling_mean_excludes_current_row(self, ts_df):
        out = ff.WindowFeatures(
            ["v"], ["t"], window=2, functions=["mean"], partition_by=["uid"]
        ).transform(ts_df)
        rows = {(r["uid"], r["t"]): r for r in out.collect()}
        # row t=3 sees rows t=1,2 only -> mean 1.5 (never its own 3.0)
        assert rows[("a", 3)]["v_window_2_mean"] == pytest.approx(1.5)
        assert rows[("a", 1)]["v_window_2_mean"] is None
        assert rows[("a", 2)]["v_window_2_mean"] == 1.0

    def test_multiple_functions(self, ts_df):
        out = ff.WindowFeatures(
            ["v"], ["t"], window=3, functions=["min", "max"],
            partition_by=["uid"],
        ).transform(ts_df)
        r = {(x["uid"], x["t"]): x for x in out.collect()}[("a", 4)]
        assert r["v_window_3_min"] == 1.0 and r["v_window_3_max"] == 3.0

    def test_unknown_function_rejected(self):
        with pytest.raises(InvalidParameterError):
            ff.WindowFeatures(["v"], ["t"], functions=["median"])


class TestExpandingWindowFeatures:
    def test_running_history_excludes_current(self, ts_df):
        out = ff.ExpandingWindowFeatures(
            ["v"], ["t"], functions=["sum", "count"], partition_by=["uid"]
        ).transform(ts_df)
        rows = {(r["uid"], r["t"]): r for r in out.collect()}
        assert rows[("a", 1)]["v_expanding_sum"] is None
        assert rows[("a", 4)]["v_expanding_sum"] == 6.0  # 1+2+3
        assert rows[("a", 4)]["v_expanding_count"] == 3

    def test_global_ordering_without_partition(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], ["t", "v"]
        )
        out = ff.ExpandingWindowFeatures(["v"], ["t"], functions=["mean"]).transform(df)
        rows = {r["t"]: r for r in out.collect()}
        assert rows[3]["v_expanding_mean"] == pytest.approx(15.0)
