"""Execute the runnable docstring examples (reference parity:
pipeline.rs:61-89 ships doc-tests; ours run against a live session)."""

import doctest

import pytest

MODULES = [
    "feature_factory_spark.pipeline",
    "feature_factory_spark.operators.imputation",
    "feature_factory_spark.operators.categorical",
    "feature_factory_spark.operators.outliers",
    "feature_factory_spark.operators.sampling",
    "feature_factory_spark.operators.scaling",
    "feature_factory_spark.operators.timeseries",
    "feature_factory_spark.operators.dedup",
    "feature_factory_spark.operators.embeddings",
    "feature_factory_spark.operators.imagecodec",
    "feature_factory_spark.operators.audiocodec",
    "feature_factory_spark.operators.videocodec",
]


@pytest.mark.parametrize("modname", MODULES)
def test_module_doctests(spark, modname):
    import importlib

    mod = importlib.import_module(modname)
    results = doctest.testmod(
        mod,
        extraglobs={"spark": spark},
        optionflags=doctest.NORMALIZE_WHITESPACE,
    )
    assert results.attempted > 0, f"{modname} has no doctests"
    assert results.failed == 0
