"""Exception hierarchy for feature_factory_spark.

Mirrors the reference error taxonomy (reference: src/exceptions.rs:24-61 —
MissingColumn, InvalidParameter, FitNotCalled, NotImplemented,
UnsupportedFormat) as a Python exception hierarchy.
"""

from __future__ import annotations


class FeatureFactoryError(Exception):
    """Base class for all feature_factory_spark errors."""


class MissingColumnError(FeatureFactoryError):
    """A required column is absent from the DataFrame schema."""

    def __init__(self, column: str, available: list[str] | None = None):
        msg = f"Column '{column}' not found in DataFrame"
        if available:
            msg += f" (available: {', '.join(available)})"
        super().__init__(msg)
        self.column = column


class InvalidParameterError(FeatureFactoryError):
    """A hyperparameter or input value is out of its valid domain."""


class FitNotCalledError(FeatureFactoryError):
    """transform() was invoked on a stateful transformer before fit().

    Reference: src/exceptions.rs:58-60 (FitNotCalled).
    """

    def __init__(self, transformer: str = ""):
        super().__init__(
            f"fit() must be called before transform() on {transformer or 'this transformer'}"
        )


class NotImplementedFeatureError(FeatureFactoryError):
    """A declared-but-unimplemented feature was requested."""


class UnsupportedFormatError(FeatureFactoryError):
    """An input file format is not supported by the source readers."""


class StatePersistenceError(FeatureFactoryError):
    """save_state/load_state cannot round-trip a transformer's fitted
    state — e.g. an undeclared non-serializable fitted attribute would
    be silently dropped, or frame-held state needs a SparkSession to
    load. Failing loud here is the difference between a pipeline that
    restarts cleanly and one whose restored transformers raise (or
    silently no-op) at transform time."""
