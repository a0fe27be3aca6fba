"""pyspark.ml interop adapter: ff operators as MLlib pipeline stages."""

import pytest

from pyspark.ml import Pipeline as MLPipeline
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.validation import InvalidParameterError


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (i, None if i % 5 == 0 else float(i % 7), f"c{i % 3}")
        for i in range(50)
    ]
    return spark.createDataFrame(rows, "id bigint, x double, cat string")


def test_stateless_op_becomes_transformer(df):
    stage = ff.as_ml_stage(ff.ArbitraryNumberImputer(["x"], -1.0))
    assert isinstance(stage, ff.FFTransformer)
    out = stage.transform(df)
    assert out.where(F.col("x").isNull()).count() == 0
    assert out.where(F.col("x") == -1.0).count() == df.where(
        F.col("id") % 5 == 0
    ).count()


def test_stateful_op_becomes_estimator_and_fits(df):
    stage = ff.as_ml_stage(ff.MeanMedianImputer(["x"]))
    assert isinstance(stage, ff.FFEstimator)
    model = stage.fit(df)
    assert isinstance(model, ff.FFModel)
    assert out_has_no_nulls(model.transform(df))
    # the estimator stays unfitted and reusable: its wrapped op never
    # received the fitted state
    with pytest.raises(Exception, match="fit"):
        stage.op.transform(df)


def out_has_no_nulls(out):
    return out.where(F.col("x").isNull()).count() == 0


def test_mllib_pipeline_of_ff_stages(df):
    pipe = MLPipeline(stages=[
        ff.as_ml_stage(ff.MeanMedianImputer(["x"])),
        ff.as_ml_stage(ff.OneHotEncoder(["cat"])),
    ])
    model = pipe.fit(df)
    out = model.transform(df)
    assert out_has_no_nulls(out)
    assert {"cat_c0", "cat_c1", "cat_c2"} <= set(out.columns)


def test_mllib_pipeline_mixes_ff_and_mllib_stages(df):
    from pyspark.ml.feature import VectorAssembler

    pipe = MLPipeline(stages=[
        ff.as_ml_stage(ff.MeanMedianImputer(["x"])),
        VectorAssembler(inputCols=["x"], outputCol="features"),
    ])
    out = pipe.fit(df).transform(df)
    assert "features" in out.columns
    assert out.count() == 50


def test_model_copy_is_independent(df):
    model = ff.as_ml_stage(ff.MeanMedianImputer(["x"])).fit(df)
    clone = model.copy()
    assert clone is not model and clone.op is not model.op
    assert out_has_no_nulls(clone.transform(df))


def test_as_ml_stage_rejects_non_ff_objects():
    with pytest.raises(InvalidParameterError):
        ff.as_ml_stage(object())
