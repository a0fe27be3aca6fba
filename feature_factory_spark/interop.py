"""pyspark.ml interoperability adapters (SURVEY.md §7.0 item 1).

Wrap any feature_factory_spark Transformer as a pyspark.ml stage so it
composes with MLlib pipelines (VectorAssembler, estimators, CrossValidator):

- stateless / pre-fitted ops -> `MLTransformerAdapter` (an ml Transformer)
- stateful ops -> `MLEstimatorAdapter` (an ml Estimator whose fit() runs
  the wrapped operator's fit and returns an MLTransformerAdapter)

The primary API remains the sklearn/feature-engine shape (like the
reference, README.md:27-31); these adapters are a bridge, not the core.
"""

from __future__ import annotations

import copy

from pyspark.ml import Estimator, Transformer as MLTransformer
from pyspark.ml.param.shared import Params
from pyspark.sql import DataFrame

from .pipeline import Transformer


class MLTransformerAdapter(MLTransformer):
    """pyspark.ml Transformer wrapping a (stateless or fitted) operator."""

    def __init__(self, op: Transformer):
        super().__init__()
        self.op = op

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self.op.transform(dataset)

    def copy(self, extra=None) -> "MLTransformerAdapter":
        return MLTransformerAdapter(copy.deepcopy(self.op))


class MLEstimatorAdapter(Estimator):
    """pyspark.ml Estimator wrapping a stateful operator; fit() learns the
    operator's parameters and returns an MLTransformerAdapter model."""

    def __init__(self, op: Transformer):
        super().__init__()
        self.op = op

    def _fit(self, dataset: DataFrame) -> MLTransformerAdapter:
        fitted = copy.deepcopy(self.op)
        fitted.fit(dataset)
        return MLTransformerAdapter(fitted)

    def copy(self, extra=None) -> "MLEstimatorAdapter":
        return MLEstimatorAdapter(copy.deepcopy(self.op))


def as_ml_stage(op: Transformer) -> Params:
    """The natural ml stage for an operator: Estimator when a fit is still
    needed, Transformer otherwise."""
    if op.is_stateful() and not op._fitted:  # noqa: SLF001
        return MLEstimatorAdapter(op)
    return MLTransformerAdapter(op)
