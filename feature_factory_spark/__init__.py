"""feature_factory_spark — a PySpark-native feature-engineering engine.

From-scratch rebuild of the capabilities of habedi/feature-factory
(reference: a Rust library on Apache DataFusion) re-expressed Spark-first:
every operator is a lazy DataFrame plan rewrite optimized by Catalyst;
stateful fits are small distributed aggregate jobs; zero Python UDFs on any
hot path.
"""

from .exceptions import (
    FeatureFactoryError,
    FitNotCalledError,
    InvalidParameterError,
    MissingColumnError,
    NotImplementedFeatureError,
    UnsupportedFormatError,
)
from .interop import MLEstimatorAdapter, MLTransformerAdapter, as_ml_stage
from .logging_config import configure_logging
from .operators import *  # noqa: F401,F403
from .operators import __all__ as _op_all
from .pipeline import Pipeline, Transformer, make_pipeline
from . import plans, presets
from .plans import plan_audit
from .presets import curation_funnel, curation_ledger

__version__ = "0.1.0"

# reference parity (src/logging.rs): logging auto-configures at import
# from DEBUG_FEATURE_FACTORY; a no-op unless the env var enables it
configure_logging()

__all__ = [
    "FeatureFactoryError", "MissingColumnError", "InvalidParameterError",
    "FitNotCalledError", "NotImplementedFeatureError", "UnsupportedFormatError",
    "Transformer", "Pipeline", "make_pipeline", "configure_logging",
    "as_ml_stage", "MLEstimatorAdapter", "MLTransformerAdapter",
    "presets", "curation_ledger", "curation_funnel",
    "plans", "plan_audit",
    *_op_all,
]
