"""pyspark.ml interop: wrap any feature_factory_spark Transformer as an
MLlib stage so it composes with ``pyspark.ml.Pipeline``, MLlib models,
and tooling that expects the Estimator/Transformer contract.

The reference is sklearn/feature-engine-shaped (fit/transform on the
operator object itself, src/pipeline.rs:24-50); this adapter is the
bridge SURVEY §7.0 deferred: ``as_ml_stage(op)`` returns

- an ``FFEstimator`` for stateful operators — ``fit(df)`` runs the ff
  fit and yields an ``FFModel`` holding the fitted operator;
- an ``FFTransformer`` for stateless ones.

The ff operator remains the source of truth: no logic is duplicated,
the MLlib stage delegates ``_transform``/``_fit`` straight through, so
every plan-shape guarantee (expression-only transforms, single-job
fits) carries over unchanged.
"""

from __future__ import annotations

import copy as _copy

from pyspark.ml import Estimator, Model, Transformer as MLTransformer
from pyspark.sql import DataFrame

from .pipeline import Transformer as FFTransformerBase
from .validation import ensure


class FFTransformer(MLTransformer):
    """MLlib Transformer delegating to a stateless ff operator (or an
    already-fitted stateful one)."""

    def __init__(self, op: FFTransformerBase):
        super().__init__()
        self.op = op

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self.op.transform(dataset)

    def copy(self, extra=None):
        return FFTransformer(_copy.deepcopy(self.op))


class FFModel(Model):
    """Fitted stage produced by FFEstimator.fit; exposes the fitted ff
    operator as ``.op`` (fitted state lives in its ``*_`` attributes)."""

    def __init__(self, op: FFTransformerBase):
        super().__init__()
        self.op = op

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self.op.transform(dataset)

    def copy(self, extra=None):
        return FFModel(_copy.deepcopy(self.op))


class FFEstimator(Estimator):
    """MLlib Estimator delegating to a stateful ff operator. ``fit``
    deep-copies the operator first, matching MLlib's contract that an
    Estimator is reusable and each fit yields an independent Model."""

    def __init__(self, op: FFTransformerBase):
        super().__init__()
        self.op = op

    def _fit(self, dataset: DataFrame) -> FFModel:
        fitted = _copy.deepcopy(self.op)
        fitted.fit(dataset)
        return FFModel(fitted)

    def copy(self, extra=None):
        return FFEstimator(_copy.deepcopy(self.op))


def as_ml_stage(op: FFTransformerBase):
    """The one entry point: stateful ff operators become Estimators,
    stateless ones Transformers — exactly how MLlib Pipeline wants
    them."""
    ensure(
        isinstance(op, FFTransformerBase),
        "as_ml_stage expects a feature_factory_spark Transformer",
    )
    return FFEstimator(op) if op.is_stateful() else FFTransformer(op)
