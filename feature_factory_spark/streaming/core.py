"""Streaming core: watermarked windowed aggregation + pipeline bridging.

Batch/stream duality: `WindowedAggregator` and `SessionWindowAggregator`
produce identical results on a batch frame and on a stream of the same
rows (modulo late-data dropping governed by the watermark) — the batch
path is what the DuckDB oracle checks, the stream path reuses the same
expression tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exceptions import FeatureFactoryError
from ..logging_config import get_logger
from ..pipeline import Pipeline, Transformer
from ..validation import ensure, validate_columns, validate_datetime_columns

LOG = get_logger()


class StreamingNotSupportedError(FeatureFactoryError):
    """Raised when an unfitted stateful transformer meets a stream."""


def read_stream(
    spark: SparkSession, path: str, schema, fmt: str = "parquet", **options
) -> DataFrame:
    """File-source stream over a path/glob. Schema must be supplied —
    streaming sources cannot infer it. ``jsonl`` is accepted as an
    alias for ``json`` (mirroring the batch reader's dispatch)."""
    from ..exceptions import UnsupportedFormatError

    fmt = {"jsonl": "json", "txt": "text"}.get(fmt, fmt)
    supported = ("parquet", "json", "csv", "orc", "text")
    if fmt not in supported:
        raise UnsupportedFormatError(
            f"unsupported stream source format '{fmt}' "
            f"(supported: {', '.join(supported)})"
        )
    reader = spark.readStream.schema(schema).options(**options)
    return getattr(reader, fmt)(path)


def apply_pipeline_to_stream(pipeline: Pipeline, stream_df: DataFrame) -> DataFrame:
    """Apply a pipeline's transform fold to a streaming DataFrame.

    Stateless operators stream as-is (pure projections/filters).
    Stateful operators must be PRE-FITTED on batch data — fitting requires
    aggregate actions, which a stream cannot run mid-plan. This mirrors
    the train-batch / serve-stream split of production feature pipelines.
    """
    for name, t in pipeline.steps:
        if t.is_stateful() and not t._fitted:  # noqa: SLF001
            raise StreamingNotSupportedError(
                f"step '{name}' is stateful and unfitted; fit it on a batch "
                "frame first (streams cannot run fit-time aggregates)"
            )
    return pipeline.transform(stream_df)


class StreamingDeduplicator(Transformer):
    """Content deduplication that runs on unbounded streams with BOUNDED
    state (batch/stream duality like the window aggregators).

    ``key`` selects the dedup granularity:

    - ``'md5'`` (default): exact content key over the content columns —
      the same skew-free hash key as ``ExactDeduplicator``.
    - ``'simhash'``: the 64-bit SimHash sketch of the (single) text
      column — SKETCH-EXACT near-dedup: documents whose word multisets
      collapse to the same sketch (whitespace/formatting/ordering
      variants) dedup as one, with exactly the same bounded-state
      mechanics as the exact key. A hamming-BALL match (distance <= t,
      not just 0) needs cross-bucket pair state that Structured
      Streaming's dropDuplicates cannot express — run the batch
      ``SimHashDeduplicator`` over closed partitions for that.

    Batch: keeps the smallest ``id_col`` row per key (identical frame to
    ExactDeduplicator, so the DuckDB oracle can verify this path).

    Stream: ``withWatermark(ts_col, watermark)`` +
    ``dropDuplicatesWithinWatermark`` on the key — per-key state is
    evicted once the watermark passes its event time, so memory is
    bounded by (arrival rate x watermark delay) instead of growing with
    the whole history. The documented trade: two duplicates farther apart
    in event time than the delay can both survive; exact forever-dedup on
    an infinite stream would need unbounded state. Which row of a
    duplicate set survives is arrival-order dependent on a stream (no
    min-id guarantee there)."""

    def __init__(
        self,
        columns: list[str],
        id_col: str,
        ts_col: str | None = None,
        watermark: str | None = None,
        normalize: bool = False,
        key: str = "md5",
    ):
        ensure(bool(columns), "at least one content column is required")
        ensure(key in ("md5", "simhash"), "key must be 'md5' or 'simhash'")
        ensure(
            key != "simhash" or len(columns) == 1,
            "simhash key takes exactly one text column",
        )
        self.columns = list(columns)
        self.id_col = id_col
        self.ts_col = ts_col
        self.watermark = watermark
        self.normalize = normalize
        self.key = key

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, self.columns + [self.id_col])
        if self.ts_col is not None:
            validate_datetime_columns(df, [self.ts_col])

    def _key_expr(self) -> Column:
        # ONE definition of the exact content key, shared with the batch
        # operator, so the documented "same hash key as ExactDeduplicator"
        # equivalence cannot drift
        from ..operators.dedup import ExactDeduplicator

        return ExactDeduplicator(
            self.columns, self.id_col, normalize=self.normalize
        )._key_expr()

    def _keyed(self, df: DataFrame) -> DataFrame:
        """df + '__ff_key': one projection for md5; the simhash sketch
        needs the word-hash -> bit-sums -> signature projection chain
        (each stage multi-references the previous, so they must stay in
        separate projections — see SimHashDeduplicator.sig_expr)."""
        if self.key == "md5":
            return df.withColumn("__ff_key", self._key_expr())
        from ..functions.text import normalized_text_expr
        from ..operators.dedup import SimHashDeduplicator, words_expr

        sh = SimHashDeduplicator(self.columns[0], self.id_col)
        text = F.col(self.columns[0])
        if self.normalize:
            text = normalized_text_expr(text)
        return (
            df.withColumn("__ff_hs", F.transform(words_expr(text), sh._word_hash))
            .withColumn("__ff_bsums", sh.bit_sums_expr("__ff_hs"))
            .withColumn("__ff_key", sh.sig_expr(F.col("__ff_bsums")))
            .drop("__ff_hs", "__ff_bsums")
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        if df.isStreaming:
            ensure(
                self.ts_col is not None and self.watermark is not None,
                "streaming dedup requires ts_col and watermark (state must "
                "be bounded on an unbounded input)",
            )
            keyed = self._keyed(df.withWatermark(self.ts_col, self.watermark))
            return keyed.dropDuplicatesWithinWatermark(["__ff_key"]).drop("__ff_key")
        from pyspark.sql import Window

        w = Window.partitionBy("__ff_key").orderBy(F.col(self.id_col))
        return (
            self._keyed(df)
            .withColumn("__ff_rn", F.row_number().over(w))
            .where(F.col("__ff_rn") == 1)
            .drop("__ff_rn", "__ff_key")
        )


class WindowedAggregator(Transformer):
    """Tumbling/sliding event-time window aggregation with optional
    watermark (used only when the input is a stream).

    Output columns: window_start, window_end, the group keys, and the
    aliased aggregates. ``aggs`` maps output name -> aggregate Column.
    On a 100 TB stream the state store is bounded by the watermark delay;
    on batch the same plan is one hash aggregate."""

    def __init__(
        self,
        ts_col: str,
        window: str,
        aggs: dict[str, Column],
        keys: list[str] | None = None,
        slide: str | None = None,
        watermark: str | None = None,
    ):
        ensure(bool(aggs), "at least one aggregate is required")
        self.ts_col = ts_col
        self.window = window
        self.slide = slide
        self.keys = list(keys or [])
        self.aggs = dict(aggs)
        self.watermark = watermark

    def _check_input(self, df: DataFrame) -> None:
        validate_datetime_columns(df, [self.ts_col])
        if self.keys:
            validate_columns(df, self.keys)

    def _transform(self, df: DataFrame) -> DataFrame:
        if df.isStreaming and self.watermark:
            df = df.withWatermark(self.ts_col, self.watermark)
        win = (
            F.window(self.ts_col, self.window, self.slide)
            if self.slide
            else F.window(self.ts_col, self.window)
        )
        grouped = df.groupBy(win.alias("w"), *self.keys)
        out = grouped.agg(*[c.alias(n) for n, c in self.aggs.items()])
        return out.select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *self.keys,
            *self.aggs.keys(),
        )


class SessionWindowAggregator(Transformer):
    """Session-window aggregation (gap-based): rows closer than ``gap``
    in event time merge into one session per key set. Streaming requires
    a watermark (Spark's session-window state needs one)."""

    def __init__(
        self,
        ts_col: str,
        gap: str,
        aggs: dict[str, Column],
        keys: list[str] | None = None,
        watermark: str | None = None,
    ):
        ensure(bool(aggs), "at least one aggregate is required")
        self.ts_col = ts_col
        self.gap = gap
        self.keys = list(keys or [])
        self.aggs = dict(aggs)
        self.watermark = watermark

    def _check_input(self, df: DataFrame) -> None:
        validate_datetime_columns(df, [self.ts_col])
        if self.keys:
            validate_columns(df, self.keys)

    def _transform(self, df: DataFrame) -> DataFrame:
        if df.isStreaming:
            ensure(
                self.watermark is not None,
                "streaming session windows require a watermark",
            )
            df = df.withWatermark(self.ts_col, self.watermark)
        grouped = df.groupBy(
            F.session_window(self.ts_col, self.gap).alias("w"), *self.keys
        )
        out = grouped.agg(*[c.alias(n) for n, c in self.aggs.items()])
        return out.select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *self.keys,
            *self.aggs.keys(),
        )


class RunningAggregator(Transformer):
    """Per-key running count/sum/mean maintained across micro-batches
    with EXPLICIT keyed state — the custom-stateful-operator pattern
    (``applyInPandasWithState``) for semantics the built-in windowed
    aggregations can't express: an all-history cumulative statistic per
    key, updated and re-emitted every micro-batch.

    Batch: collapses to one ``groupBy(keys).agg(count/sum/avg)`` — the
    final running value of a finite input IS its total aggregate, which
    is what the DuckDB oracle verifies (batch==stream duality, same
    contract as the window aggregators).

    Stream: state per key is two numbers (count, sum) — O(distinct keys)
    memory, independent of stream length. The update function receives
    Arrow-batched pandas frames (vectorized, not row-at-a-time) and
    re-emits the key's updated row each batch (output mode 'update').
    ``ttl`` (processing-time timeout, e.g. '1 hour') evicts idle keys so
    unbounded key spaces (user ids over months) can't grow state without
    bound; an evicted key that reappears restarts from zero — the
    standard trade, documented rather than hidden.
    """

    _TTL_UNIT_MS = {
        "millisecond": 1, "second": 1000, "minute": 60_000,
        "hour": 3_600_000, "day": 86_400_000,
    }

    def __init__(
        self,
        keys: list[str],
        value_col: str,
        ttl: str | None = None,
    ):
        ensure(bool(keys), "at least one key column is required")
        self.keys = list(keys)
        self.value_col = value_col
        self.ttl = ttl
        # parse at construction so a malformed ttl fails HERE with the
        # package's error type, not as a raw ValueError/KeyError deep
        # inside the streaming query
        self._ttl_ms: int | None = None
        if ttl is not None:
            parts = ttl.strip().lower().split()
            ensure(
                len(parts) == 2 and parts[0].lstrip("-").isdigit(),
                f"ttl must look like '<n> <unit>', got {ttl!r}",
            )
            unit = parts[1].rstrip("s")
            ensure(
                unit in self._TTL_UNIT_MS,
                f"ttl unit must be one of {sorted(self._TTL_UNIT_MS)}, "
                f"got {parts[1]!r}",
            )
            ms = int(parts[0]) * self._TTL_UNIT_MS[unit]
            ensure(ms > 0, "ttl must be positive")
            self._ttl_ms = ms

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, self.keys + [self.value_col])

    def _out_schema(self, df: DataFrame):
        from pyspark.sql import types as T

        key_fields = [df.schema[k] for k in self.keys]
        return T.StructType(
            [*key_fields,
             T.StructField("n", T.LongType()),
             T.StructField("total", T.DoubleType()),
             T.StructField("mean_value", T.DoubleType())]
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        if not df.isStreaming:
            # batch mirrors the stream's pd.to_numeric(errors='coerce')
            # exactly: values that don't cast to a finite double (bad
            # strings under try_cast, NaN) are excluded from ALL three
            # statistics, so n/total/mean share one denominator and the
            # batch==stream duality holds for dirty inputs too
            v = F.col(self.value_col).try_cast("double")
            v = F.when(~F.isnan(v), v)
            return df.groupBy(*self.keys).agg(
                F.count(v).alias("n"),
                F.coalesce(F.sum(v), F.lit(0.0)).alias("total"),
                F.avg(v).alias("mean_value"),
            )

        from pyspark.sql.streaming.state import GroupStateTimeout

        value_col = self.value_col
        keys = self.keys
        ttl_ms = self._ttl_ms

        def update(key, pdfs, state):
            import pandas as pd

            if state.hasTimedOut:
                state.remove()
                return
            cnt, tot = state.get if state.exists else (0, 0.0)
            for pdf in pdfs:
                vals = pd.to_numeric(pdf[value_col], errors="coerce")
                cnt += int(vals.notna().sum())
                tot += float(vals.sum(skipna=True))
            state.update((cnt, tot))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                {
                    **{k: [key[i]] for i, k in enumerate(keys)},
                    "n": [cnt],
                    "total": [tot],
                    "mean_value": [tot / cnt if cnt else None],
                }
            )

        timeout = (
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        )
        return df.groupBy(*self.keys).applyInPandasWithState(
            update,
            outputStructType=self._out_schema(df),
            stateStructType="cnt long, tot double",
            outputMode="update",
            timeoutConf=timeout,
        )


def run_incremental(
    pipeline: Pipeline,
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
    schema,
    source_fmt: str = "parquet",
    sink_fmt: str = "parquet",
    partition_by: list[str] | None = None,
    timeout_seconds: int | None = None,
    sink_options: dict | None = None,
    **source_options,
) -> None:
    """One incremental batch run: apply ``pipeline`` to files that
    arrived in ``source_path`` since the last run, append the results to
    ``sink_path``, and stop.

    This is the standard Spark recipe for a scheduled (e.g. daily)
    pipeline over a growing 100 TB corpus directory — Structured
    Streaming's ``availableNow`` trigger with a durable checkpoint:

    - the checkpoint's file-source log records which input files every
      previous run already processed, so each invocation reads ONLY the
      delta — no bookkeeping tables, no manual partition arithmetic;
    - the sink's commit log makes the append exactly-once: a run that
      dies mid-write is redone from the checkpoint on the next
      invocation without duplicating output files;
    - ``availableNow`` processes everything currently available and
      then terminates, so the job is a bounded batch, not a resident
      stream.

    Stateful pipeline steps must be pre-fitted (same contract as
    apply_pipeline_to_stream): fit on a batch snapshot, serve
    incrementally. ``timeout_seconds`` bounds the wait (None = until
    the delta is fully processed); on timeout the query is stopped and
    the NEXT run resumes from the checkpoint — nothing is lost.

    ``sink_options`` go to the stream writer. A csv sink defaults to
    header=True, symmetric with sources.io.read()/write(): without it
    the sink is written headerless while the package's own reader
    defaults header=True, which would silently consume the first data
    row of every file as a header on read-back.
    """
    from ..exceptions import UnsupportedFormatError

    ensure(
        timeout_seconds is None or timeout_seconds > 0,
        "timeout_seconds must be a positive number of seconds or None "
        "(None = wait until the delta is fully processed)",
    )
    # same alias + validation treatment as the source side: fail with
    # the package's clear error before any stream is constructed,
    # instead of Spark's data-source-lookup failure at start()
    sink_fmt = {"jsonl": "json", "txt": "text"}.get(sink_fmt, sink_fmt)
    supported_sinks = ("parquet", "json", "csv", "orc", "text")
    if sink_fmt not in supported_sinks:
        raise UnsupportedFormatError(
            f"unsupported stream sink format '{sink_fmt}' "
            f"(supported: {', '.join(supported_sinks)})"
        )
    sink_options = dict(sink_options or {})
    if sink_fmt == "csv":
        sink_options.setdefault("header", True)
    stream = read_stream(spark, source_path, schema, source_fmt, **source_options)
    out = apply_pipeline_to_stream(pipeline, stream)
    writer = (
        out.writeStream.format(sink_fmt)
        .options(**sink_options)
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        # date-partitioned sinks give downstream readers partition
        # pruning on every incremental slice
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    try:
        if timeout_seconds is None:
            q.awaitTermination()
            finished = True
        else:
            finished = q.awaitTermination(timeout_seconds)
    finally:
        if q.isActive:
            q.stop()
    if not finished:
        LOG.warning(
            "run_incremental timed out after %ss; processed prefix is "
            "committed, next run resumes from the checkpoint",
            timeout_seconds,
        )
