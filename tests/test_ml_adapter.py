"""Deeper pyspark.ml interop coverage (adapters live in interop.py;
basic estimator/transformer round-trips are in test_streaming_interop)."""

import pytest

from pyspark.ml import Pipeline as MLPipeline
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.exceptions import FitNotCalledError


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (i, None if i % 5 == 0 else float(i % 7), f"c{i % 3}")
        for i in range(50)
    ]
    return spark.createDataFrame(rows, "id bigint, x double, cat string")


def out_has_no_nulls(out):
    return out.where(F.col("x").isNull()).count() == 0


def test_estimator_leaves_wrapped_op_unfitted(df):
    stage = ff.as_ml_stage(ff.MeanMedianImputer(["x"]))
    assert isinstance(stage, ff.MLEstimatorAdapter)
    model = stage.fit(df)
    assert isinstance(model, ff.MLTransformerAdapter)
    assert out_has_no_nulls(model.transform(df))
    # fit() deep-copied: the estimator's own op is still unfitted and
    # the estimator stays reusable per the MLlib contract
    with pytest.raises(FitNotCalledError):
        stage.op.transform(df)


def test_prefitted_stateful_op_becomes_transformer(df):
    op = ff.MeanMedianImputer(["x"]).fit(df)
    stage = ff.as_ml_stage(op)
    assert isinstance(stage, ff.MLTransformerAdapter)
    assert out_has_no_nulls(stage.transform(df))


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
