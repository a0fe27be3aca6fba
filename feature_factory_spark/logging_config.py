"""Env-driven logging setup (reference: src/logging.rs:1-31).

The reference initializes tracing at program startup from the
DEBUG_FEATURE_FACTORY environment variable: unset / empty / "0" /
"false" disables logging entirely, any other value enables DEBUG-level
output. This module mirrors that contract on the stdlib logging module
and is invoked from the package __init__ (the Python analogue of the
reference's ctor startup hook), so `export DEBUG_FEATURE_FACTORY=true`
is all a user needs — same as the reference.

`configure_logging(level=...)` can also be called explicitly to pick a
level programmatically; per-step pipeline timings are emitted at INFO
through the package logger (pipeline.py), so enabling logging surfaces
them without the Pipeline(verbose=True) flag.
"""

from __future__ import annotations

import logging
import os

LOGGER_NAME = "feature_factory_spark"


def _env_enabled() -> bool:
    v = os.environ.get("DEBUG_FEATURE_FACTORY", "")
    return v not in ("", "0", "false")


def configure_logging(level: int | None = None) -> logging.Logger:
    """Configure the package logger; returns it.

    level=None reads DEBUG_FEATURE_FACTORY (reference semantics: any
    value other than unset/empty/"0"/"false" enables DEBUG). An explicit
    level always wins. When disabled, a NullHandler keeps the package
    silent regardless of the root logger's configuration.
    """
    logger = logging.getLogger(LOGGER_NAME)
    if level is None:
        if not _env_enabled():
            if not logger.handlers:
                logger.addHandler(logging.NullHandler())
            return logger
        level = logging.DEBUG
    # replace any previous configuration (idempotent under re-calls)
    for h in list(logger.handlers):
        logger.removeHandler(h)
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    )
    logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger


def get_logger() -> logging.Logger:
    return logging.getLogger(LOGGER_NAME)
