"""Transformer base class and Pipeline.

Re-expresses the reference's `Transformer` trait (fit / transform /
is_stateful — reference: src/pipeline.rs:24-50) and `Pipeline` struct
(sequential fit-then-transform fold with per-step naming, verbose timing,
error wrapping, >=1-step validation — reference: src/pipeline.rs:118-192)
as an sklearn/feature-engine-style Python API over Spark DataFrames.

Spark-first notes:
- `transform` is a pure lazy logical-plan rewrite (select/filter/withColumn);
  Catalyst optimizes the accumulated plan at action time — same laziness
  contract as the reference (pipeline.rs:114-117).
- `fit` on stateful transformers runs small aggregate Spark jobs and stores
  the learned parameters as plain Python dicts on the driver; never a full
  materialization of the data (the reference's feature-selection collect()
  pattern is deliberately NOT copied — see operators/feature_selection.py).
- Because each stateful fit re-executes the accumulated upstream plan, long
  pipelines get O(n^2) recomputation in the reference (pipeline.rs:135-164).
  `Pipeline(cache_intermediate=True)` persists the intermediate DataFrame
  before each stateful fit — an improvement the reference has no equivalent
  of.
"""

from __future__ import annotations

import json
import os
import time
from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import DataFrame

from .exceptions import (
    FeatureFactoryError,
    FitNotCalledError,
    InvalidParameterError,
    StatePersistenceError,
)
from .logging_config import get_logger

_LOGGER = get_logger()


class Transformer(ABC):
    """Base class for all operators.

    Contract (reference: src/pipeline.rs:24-50):
    - ``fit(df) -> self``: learn parameters (no-op for stateless operators;
      runs Spark aggregate jobs for stateful ones).
    - ``transform(df) -> DataFrame``: lazy plan rewrite; raises
      FitNotCalledError if stateful and unfitted.
    - ``fit_transform(df)``: fit then transform.
    - ``is_stateful()``: whether fit learns parameters.
    """

    _fitted: bool = False

    def fit(self, df: DataFrame) -> "Transformer":
        self._check_input(df)
        self._fit(df)
        self._fitted = True
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self.is_stateful() and not self._fitted:
            raise FitNotCalledError(type(self).__name__)
        self._check_input(df)
        return self._transform(df)

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)

    def is_stateful(self) -> bool:
        return False

    # -- subclass hooks -------------------------------------------------
    def _check_input(self, df: DataFrame) -> None:
        """Driver-side schema validation; must not trigger Spark jobs."""

    def _fit(self, df: DataFrame) -> None:
        """Learn parameters. Default: stateless no-op."""

    @abstractmethod
    def _transform(self, df: DataFrame) -> DataFrame: ...

    # -- fitted-state persistence (improvement over the reference, which
    # -- has no save/load; SURVEY.md §7.0 item 5) ------------------------
    def get_fitted_state(self) -> dict[str, Any]:
        """JSON-serializable fitted parameters.

        Scalar-bearing containers are CONVERTED (Decimal -> float,
        tuple/set -> list) rather than silently dropped: dropping a
        fitted mapping would let load_state mark the transformer fitted
        while transform() becomes a silent no-op."""
        out = {}
        for k, v in vars(self).items():
            if k.startswith("__") or k == "_ff_owned_frames":
                # frame-ownership bookkeeping is per-instance, not fitted
                # state: a restored instance owns exactly the frames
                # load_state itself persists
                continue
            converted = _to_json_value(v)
            if converted is not _UNSERIALIZABLE:
                out[k] = converted
        return out

    def _frame_state_attrs(self) -> list[str]:
        """Names of fitted attributes that hold DataFrames (distributed
        fitted state too large for the driver — e.g. a 100 TB corpus's
        vocabulary). Declared per-operator so save_state can persist
        them to parquet instead of silently dropping them."""
        return []

    def _derived_state_attrs(self) -> list[str]:
        """Names of fitted attributes that are DERIVED from other fitted
        state (rebuilt lazily on first use, e.g. a broadcast-side pivot
        of a saved frame). Intentionally excluded from persistence AND
        exempt from save_state's drop guard — the canonical state they
        derive from is what round-trips."""
        return []

    def save_state(self, path: str) -> None:
        """Persist fitted state.

        Scalar parameters always go to JSON. Operators whose fitted
        state is a DataFrame (declared via ``_frame_state_attrs``) write
        a DIRECTORY at ``path``: ``state.json`` plus one parquet dataset
        per fitted frame — the only layout that scales, because
        frame-held state (a vocabulary over a 100 TB corpus) never fits
        in a driver-side JSON file. Frameless operators keep writing a
        single JSON file at ``path``.

        Fails LOUD (StatePersistenceError) when a fitted ``*_``
        attribute is neither JSON-serializable nor a declared frame:
        silently dropping it would let load_state mark the instance
        fitted while transform raises (or no-ops) later.
        """
        if self.is_stateful() and not self._fitted:
            # an unfitted save would round-trip into an instance MARKED
            # fitted whose transform silently uses empty learned state
            raise StatePersistenceError(
                f"{type(self).__name__}.save_state called before fit(): "
                "the state file would restore an unfitted instance as "
                "fitted"
            )
        frame_attrs = self._frame_state_attrs()
        derived_attrs = self._derived_state_attrs()
        dropped = [
            k
            for k, v in vars(self).items()
            if k.endswith("_")
            and not k.startswith("__")
            and k not in frame_attrs
            and k not in derived_attrs
            and _to_json_value(v) is _UNSERIALIZABLE
        ]
        if dropped:
            raise StatePersistenceError(
                f"{type(self).__name__}.save_state would drop fitted "
                f"attribute(s) {dropped}: not JSON-serializable and not "
                "declared in _frame_state_attrs(). Declare them (DataFrame "
                "state) or convert them to plain scalars/containers."
            )
        state = self.get_fitted_state()
        frames = {
            a: getattr(self, a, None)
            for a in frame_attrs
            if getattr(self, a, None) is not None
        }
        if not frames:
            if os.path.isdir(path):
                # layout migration: a frame-holding save previously wrote
                # a DIRECTORY here; open() would raise a bare
                # IsADirectoryError that escapes the package's error
                # contract (Pipeline.save_state only wraps
                # FeatureFactoryError with the step name)
                raise StatePersistenceError(
                    f"'{path}' is a directory (written by a frame-holding "
                    f"operator) but {type(self).__name__} saves a single "
                    "JSON file; remove the stale directory or save to a "
                    "different path"
                )
            with open(path, "w") as f:
                json.dump(state, f, indent=2, default=str)
            return
        if os.path.isfile(path):
            # inverse migration: a frameless save previously wrote a JSON
            # FILE here; os.makedirs would raise a bare FileExistsError
            raise StatePersistenceError(
                f"'{path}' is a file (written by a frameless operator) but "
                f"{type(self).__name__} saves a directory of parquet "
                "frames; remove the stale file or save to a different path"
            )
        os.makedirs(path, exist_ok=True)
        for attr, frame in frames.items():
            frame.write.mode("overwrite").parquet(
                os.path.join(path, f"frame_{attr}")
            )
        with open(os.path.join(path, "state.json"), "w") as f:
            json.dump(
                {
                    "class": type(self).__name__,
                    "state": state,
                    "frames": sorted(frames),
                },
                f,
                indent=2,
                default=str,
            )

    def set_fitted_state(self, state: dict[str, Any]) -> "Transformer":
        """Restore fitted parameters (inverse of get_fitted_state).

        JSON round-trips tuples to lists; every consumer of fitted state in
        this package accepts either. Marks the transformer fitted."""
        for k, v in state.items():
            setattr(self, k, v)
        self._fitted = True
        return self

    def load_state(self, path: str, spark=None) -> "Transformer":
        """fit -> save_state -> load_state -> transform round-trip
        (SURVEY.md §7.0 item 5; the reference has no persistence at all).

        A directory written by a frame-holding operator restores both
        the scalar JSON state and each parquet-backed fitted frame
        (persisted MEMORY_AND_DISK, matching fit-time behavior).
        ``spark`` defaults to the active session."""
        if not os.path.isdir(path):
            with open(path) as f:
                return self.set_fitted_state(json.load(f))
        with open(os.path.join(path, "state.json")) as f:
            payload = json.load(f)
        saved_cls = payload.get("class")
        if saved_cls and saved_cls != type(self).__name__:
            raise StatePersistenceError(
                f"state at '{path}' was saved by {saved_cls}, not "
                f"{type(self).__name__}"
            )
        self.set_fitted_state(payload["state"])
        frame_names = payload.get("frames", [])
        if frame_names:
            from pyspark import StorageLevel
            from pyspark.sql import SparkSession

            spark = spark or SparkSession.getActiveSession()
            if spark is None:
                raise StatePersistenceError(
                    "load_state needs a SparkSession to read frame-held "
                    "state; pass spark= or create a session first"
                )
            for attr in frame_names:
                prev = getattr(self, attr, None)
                if isinstance(prev, DataFrame):
                    # reload over a fitted instance: release the frame it
                    # pinned, same as the refit path
                    prev.unpersist()
                frame = spark.read.parquet(
                    os.path.join(path, f"frame_{attr}")
                ).persist(StorageLevel.MEMORY_AND_DISK)
                setattr(self, attr, frame)
                self._own_frame(attr)
        return self

    def _own_frame(self, attr: str) -> None:
        """Record that THIS operator persisted the frame held by ``attr``
        (called from the fit/load paths that persist). release() only
        unpersists owned frames: a declared frame the operator merely
        references (e.g. CosineTopK's fitted query frame, which is the
        CALLER's DataFrame) must never be evicted out from under the
        caller's own cache."""
        if not hasattr(self, "_ff_owned_frames"):
            self._ff_owned_frames: set[str] = set()
        self._ff_owned_frames.add(attr)

    def release(self) -> None:
        """Unpersist every fitted frame THIS operator persisted (no-op
        for frameless operators and for declared frames it doesn't own —
        see _own_frame). Call when a fitted instance is retired;
        otherwise each fit/load pins a cache entry for the session's
        lifetime."""
        owned = getattr(self, "_ff_owned_frames", set())
        # iterate the OWNED set, not _frame_state_attrs(): a state dir
        # saved by an older version may list frames the current code no
        # longer declares (e.g. a since-derived pivot) — load_state
        # still restores and owns them, so release() must still
        # unpersist them or they pin cache entries forever
        for attr in list(owned):
            frame = getattr(self, attr, None)
            if isinstance(frame, DataFrame):
                frame.unpersist()
        owned.clear()


_UNSERIALIZABLE = object()


def _to_json_value(v: Any) -> Any:
    """v converted to a JSON-representable value, or _UNSERIALIZABLE for
    genuinely non-state objects (DataFrames, callables, ...). Numeric
    scalars Spark hands back for exotic column types (decimal.Decimal
    from DecimalType aggregates, numpy scalars from pandas paths) become
    plain floats/ints so fitted mappings survive the round-trip."""
    import decimal

    if v is None or isinstance(v, (bool, int, str)):
        return v
    if isinstance(v, float):
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if hasattr(v, "item") and not isinstance(v, (list, tuple, set, dict)):
        try:  # numpy scalar
            return _to_json_value(v.item())
        except Exception:
            return _UNSERIALIZABLE
    if isinstance(v, (list, tuple, set)):
        items = [_to_json_value(x) for x in v]
        if any(x is _UNSERIALIZABLE for x in items):
            return _UNSERIALIZABLE
        return items
    if isinstance(v, dict):
        out = {}
        for k, x in v.items():
            cx = _to_json_value(x)
            if cx is _UNSERIALIZABLE or not isinstance(k, (str, int, float, bool)):
                return _UNSERIALIZABLE
            out[k] = cx
        return out
    return _UNSERIALIZABLE


class Pipeline:
    """Ordered chain of (name, transformer) steps.

    Semantics mirror the reference (src/pipeline.rs:118-192): sequential
    fit-then-transform fold; errors wrapped with the failing step's name;
    per-step timing when verbose; empty pipeline rejected.

    ``cache_intermediate=True`` persists the running DataFrame before each
    stateful fit to avoid O(n^2) upstream recomputation (SURVEY.md §3.3).

    Example (mirrors the reference's doc example, pipeline.rs:61-89):

    >>> import feature_factory_spark as ff
    >>> df = spark.createDataFrame(
    ...     [(1.0, "a"), (None, "b"), (3.0, "a")], "x double, k string")
    >>> pipe = ff.make_pipeline(
    ...     ("impute", ff.MeanMedianImputer(["x"])),
    ...     ("encode", ff.CountFrequencyEncoder(["k"])),
    ... )
    >>> out = pipe.fit(df)          # fit-then-transform fold over steps
    >>> sorted(out.columns)
    ['k', 'x']
    >>> out.where(out.x.isNull()).count()
    0
    >>> pipe.transform(df).count()  # pre-fitted re-apply, no re-fit
    3
    """

    def __init__(
        self,
        steps: list[tuple[str, Transformer]],
        verbose: bool = False,
        cache_intermediate: bool = False,
    ):
        if not steps:
            raise InvalidParameterError("Pipeline requires at least one step")
        for name, t in steps:
            if not isinstance(t, Transformer):
                raise InvalidParameterError(
                    f"step '{name}' is not a Transformer: {type(t).__name__}"
                )
        self.steps = list(steps)
        self.verbose = verbose
        self.cache_intermediate = cache_intermediate
        self._fitted = False
        self._persisted: list[DataFrame] = []

    @staticmethod
    def _reraise_with_step(e: FeatureFactoryError, name: str) -> None:
        """Prefix the step name onto the exception message IN PLACE and
        re-raise the original exception — reconstructing via type(e)(msg)
        would misroute the message into subclass-specific constructor args
        (e.g. MissingColumnError's ``column``)."""
        e.args = (f"[step '{name}'] {e}",)
        raise e

    def fit(self, df: DataFrame) -> DataFrame:
        """Fit each step on the accumulated frame, then transform through it.

        Returns the fully transformed DataFrame (reference fit returns the
        final frame too, pipeline.rs:135-164).
        """
        current = df
        cached: list[DataFrame] = []
        try:
            for name, transformer in self.steps:
                t0 = time.perf_counter()
                if self.cache_intermediate and transformer.is_stateful():
                    current = current.persist()
                    cached.append(current)
                try:
                    transformer.fit(current)
                    current = transformer.transform(current)
                except FeatureFactoryError as e:
                    self._reraise_with_step(e, name)
                dt = time.perf_counter() - t0
                _LOGGER.info("step '%s' fitted in %.3fs", name, dt)
                if self.verbose:
                    print(f"[pipeline] step '{name}' fitted in {dt:.3f}s")
            self._fitted = True
            return current
        finally:
            for c in cached[:-1]:  # keep the last persisted frame hot for the caller
                c.unpersist()
            # release whatever a PREVIOUS fit left pinned before taking
            # ownership of this fit's frame (refit would otherwise leak
            # executor storage); the caller releases the new one via
            # Pipeline.unpersist()
            for c in self._persisted:
                c.unpersist()
            self._persisted = cached[-1:]

    def unpersist(self) -> None:
        """Release any DataFrame still persisted by cache_intermediate
        (the last fit-time persist is kept hot for the caller's first
        action; call this when done with the result)."""
        for c in self._persisted:
            c.unpersist()
        self._persisted = []

    def transform(self, df: DataFrame) -> DataFrame:
        """Transform-only fold; steps must already be fitted
        (pipeline.rs:167-186; README.md:122-123)."""
        current = df
        for name, transformer in self.steps:
            try:
                current = transformer.transform(current)
            except FeatureFactoryError as e:
                self._reraise_with_step(e, name)
        return current

    def fit_transform(self, df: DataFrame) -> DataFrame:
        """Alias for fit (pipeline.rs:189-191)."""
        return self.fit(df)

    def save_state(self, path: str) -> None:
        """Persist every step's fitted state under directory ``path``
        (``pipeline.json`` manifest + one entry per step). This is what
        a scheduled incremental pipeline (run_incremental) needs across
        driver restarts: fit once on a batch snapshot, save, and every
        later invocation loads instead of re-fitting the corpus."""
        os.makedirs(path, exist_ok=True)
        manifest = {
            "fitted": self._fitted,
            "steps": [
                {"name": name, "class": type(t).__name__}
                for name, t in self.steps
            ],
        }
        with open(os.path.join(path, "pipeline.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        for i, (name, t) in enumerate(self.steps):
            try:
                t.save_state(os.path.join(path, f"step_{i:02d}_{name}"))
            except FeatureFactoryError as e:
                self._reraise_with_step(e, name)

    def load_state(self, path: str, spark=None) -> "Pipeline":
        """Restore step states saved by save_state into THIS pipeline
        (same steps, constructed with the same parameters). Validates
        step names/classes against the manifest."""
        with open(os.path.join(path, "pipeline.json")) as f:
            manifest = json.load(f)
        expected = [
            {"name": name, "class": type(t).__name__} for name, t in self.steps
        ]
        if manifest["steps"] != expected:
            raise StatePersistenceError(
                f"pipeline state at '{path}' was saved from steps "
                f"{manifest['steps']}, but this pipeline has {expected}"
            )
        for i, (name, t) in enumerate(self.steps):
            try:
                t.load_state(os.path.join(path, f"step_{i:02d}_{name}"), spark)
            except FeatureFactoryError as e:
                self._reraise_with_step(e, name)
        self._fitted = bool(manifest.get("fitted", True))
        return self

    def release(self) -> None:
        """unpersist() plus every step's fitted-frame release."""
        self.unpersist()
        for _, t in self.steps:
            t.release()


def make_pipeline(*steps: tuple[str, Transformer], **kwargs) -> Pipeline:
    """Sugar mirroring the reference's make_pipeline! macro
    (pipeline.rs:207-219)."""
    return Pipeline(list(steps), **kwargs)
