"""MinMaxScaler / StandardScaler / RobustScaler and
L2Normalizer / RandomProjection (round 3 additions)."""

import math

import pytest

from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.exceptions import FitNotCalledError, InvalidParameterError


@pytest.fixture()
def num_df(spark):
    return spark.createDataFrame(
        [(1, 10.0, 5.0), (2, 20.0, 5.0), (3, 30.0, 5.0), (4, 40.0, 5.0)],
        ["id", "x", "const"],
    )


class TestMinMaxScaler:
    def test_scales_to_unit_range(self, num_df):
        out = ff.MinMaxScaler(["x"]).fit(num_df).transform(num_df)
        vals = {r["id"]: r["x"] for r in out.collect()}
        assert vals[1] == 0.0 and vals[4] == 1.0
        assert vals[2] == pytest.approx(1 / 3)

    def test_custom_feature_range(self, num_df):
        out = (
            ff.MinMaxScaler(["x"], feature_range=(-1.0, 1.0))
            .fit(num_df)
            .transform(num_df)
        )
        vals = {r["id"]: r["x"] for r in out.collect()}
        assert vals[1] == -1.0 and vals[4] == 1.0

    def test_constant_column_maps_to_lower_bound(self, num_df):
        out = (
            ff.MinMaxScaler(["const"], feature_range=(2.0, 3.0))
            .fit(num_df)
            .transform(num_df)
        )
        assert all(r["const"] == 2.0 for r in out.collect())

    def test_requires_fit_and_valid_range(self, num_df):
        with pytest.raises(FitNotCalledError):
            ff.MinMaxScaler(["x"]).transform(num_df)
        with pytest.raises(InvalidParameterError):
            ff.MinMaxScaler(["x"], feature_range=(1.0, 1.0))


class TestStandardScaler:
    def test_zscore(self, num_df):
        out = ff.StandardScaler(["x"]).fit(num_df).transform(num_df)
        vals = [r["x"] for r in out.collect()]
        assert sum(vals) == pytest.approx(0.0)
        # population std of 10,20,30,40 = sqrt(125)
        assert min(vals) == pytest.approx(-15.0 / math.sqrt(125))

    def test_no_center(self, num_df):
        out = (
            ff.StandardScaler(["x"], with_mean=False).fit(num_df).transform(num_df)
        )
        vals = {r["id"]: r["x"] for r in out.collect()}
        assert vals[1] == pytest.approx(10.0 / math.sqrt(125))

    def test_no_std(self, num_df):
        out = (
            ff.StandardScaler(["x"], with_std=False).fit(num_df).transform(num_df)
        )
        vals = {r["id"]: r["x"] for r in out.collect()}
        assert vals[1] == -15.0 and vals[4] == 15.0

    def test_zero_variance_maps_to_zero(self, num_df):
        out = ff.StandardScaler(["const"]).fit(num_df).transform(num_df)
        assert all(r["const"] == 0.0 for r in out.collect())


class TestRobustScaler:
    def test_iqr_scaling(self, spark):
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 101)] + [(999, 10000.0)],
            ["id", "x"],
        )
        out = ff.RobustScaler(["x"]).fit(df).transform(df)
        vals = {r["id"]: r["x"] for r in out.collect()}
        # median of 1..100 + outlier is 51; IQR ~= 50; outlier stays large
        # but the bulk lands in roughly [-1, 1]
        assert abs(vals[51]) < 0.05
        assert -1.2 < vals[1] < 0 and 0 < vals[100] < 1.2
        assert vals[999] > 100

    def test_zero_iqr_maps_to_zero(self, num_df):
        out = ff.RobustScaler(["const"]).fit(num_df).transform(num_df)
        assert all(r["const"] == 0.0 for r in out.collect())

    def test_quantile_range_validation(self):
        with pytest.raises(InvalidParameterError):
            ff.RobustScaler(["x"], quantile_range=(0.75, 0.25))


@pytest.fixture()
def vec_df(spark):
    return spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        ["vec_id", "embedding"],
    )


class TestL2Normalizer:
    def test_unit_norm(self, vec_df):
        out = ff.L2Normalizer("embedding").transform(vec_df)
        rows = {r["vec_id"]: list(r["embedding"]) for r in out.collect()}
        assert rows[1] == pytest.approx([0.6, 0.8])
        assert rows[3] == pytest.approx([1.0, 0.0])

    def test_zero_vector_stays_zero(self, vec_df):
        out = ff.L2Normalizer("embedding").transform(vec_df)
        rows = {r["vec_id"]: list(r["embedding"]) for r in out.collect()}
        assert rows[2] == [0.0, 0.0]

    def test_out_col(self, vec_df):
        out = ff.L2Normalizer("embedding", out_col="unit").transform(vec_df)
        assert "unit" in out.columns and "embedding" in out.columns


class TestRandomProjection:
    def test_projection_matches_numpy(self, vec_df):
        op = ff.RandomProjection("embedding", out_dim=3, in_dim=2, seed=7)
        planes = op.planes()
        out = op.transform(vec_df)
        rows = {r["vec_id"]: list(r["embedding"]) for r in out.collect()}
        expected = [3.0 * p[0] + 4.0 * p[1] for p in planes]
        assert rows[1] == pytest.approx(expected)

    def test_deterministic_given_seed(self, vec_df):
        a = ff.RandomProjection("embedding", 4, 2, seed=3).transform(vec_df)
        b = ff.RandomProjection("embedding", 4, 2, seed=3).transform(vec_df)
        assert [list(r["embedding"]) for r in a.collect()] == [
            list(r["embedding"]) for r in b.collect()
        ]

    def test_different_seed_differs(self, vec_df):
        a = ff.RandomProjection("embedding", 4, 2, seed=3).transform(vec_df)
        b = ff.RandomProjection("embedding", 4, 2, seed=4).transform(vec_df)
        assert [list(r["embedding"]) for r in a.collect()] != [
            list(r["embedding"]) for r in b.collect()
        ]


class TestEmbeddingQuantizer:
    def test_codes_and_scale(self, spark):
        df = spark.createDataFrame(
            [(1, [12.7, -6.35, 0.0, 1.0]), (2, [0.0, 0.0, 0.0, 0.0])],
            "id bigint, embedding array<double>",
        )
        out = {r["id"]: r for r in
               ff.EmbeddingQuantizer("embedding").transform(df).collect()}
        assert out[1]["embedding_q8_scale"] == pytest.approx(0.1)
        assert list(out[1]["embedding_q8"]) == [127, -63, 0, 10]
        # zero vector: scale 0, codes all 0 (no NaN / division error)
        assert out[2]["embedding_q8_scale"] == 0.0
        assert list(out[2]["embedding_q8"]) == [0, 0, 0, 0]
        # tinyint storage type
        assert dict(out[1].asDict())  # schema materialized
        typ = dict(ff.EmbeddingQuantizer("embedding").transform(df).dtypes)
        assert typ["embedding_q8"] == "array<tinyint>"

    def test_dequantize_preserves_cosine(self, spark):
        import math
        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "id bigint, embedding array<double>")
        q = ff.EmbeddingQuantizer("embedding")
        out = q.transform(df).withColumn(
            "deq",
            q.dequantize_expr(F.col("embedding_q8"), F.col("embedding_q8_scale")),
        ).collect()

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return d / (na * nb)

        for r in out:
            c = cos(r["embedding"], r["deq"])
            assert c >= 0.999, c
            # elementwise error bound: scale/2
            s = r["embedding_q8_scale"]
            assert all(
                abs(x - y) <= s / 2 + 1e-12
                for x, y in zip(r["embedding"], r["deq"])
            )

    def test_quantize_plan_is_narrow(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "id bigint, embedding array<double>"
        )
        out = ff.EmbeddingQuantizer("embedding").transform(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "Exchange" not in plan
