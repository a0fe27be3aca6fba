"""Corpus profiling: one-pass column statistics and heavy hitters
(beyond the reference, SURVEY.md §2.3). At 100 TB you profile BEFORE you
transform — null rates, cardinalities, and dominant values decide which
operators to run at all.

Both operators return DataFrames (melted long format), never driver-side
dicts: profiles of a 10^5-column feature store stay distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pipeline import Transformer
from ..validation import ensure, validate_columns

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


class ColumnProfiler(Transformer):
    """Per-column statistics in ONE aggregate job, melted to
    ``(column, metric, value_num, value_str)``.

    Metrics: ``count`` (non-null), ``nulls``, ``distinct``; numerics add
    ``min / max / mean / stddev`` (as value_num); strings add lexical
    ``min / max`` and ``avg_len`` (min/max as value_str).

    Scale design: every statistic is an aggregate with a map-side partial
    (count / min / max / sum-based mean+stddev), so the job is one scan +
    one tiny shuffle of per-partition partials regardless of row count.
    ``distinct`` defaults to ``approx_count_distinct`` (HyperLogLog++,
    mergeable, one pass for ALL columns together); ``exact_distinct=True``
    switches to exact ``count(distinct)``, which Spark executes via
    expand — one extra shuffle, only sane for bounded-cardinality
    columns or oracle comparison.

    The melt runs on the single 1-row aggregate result — driver-scale,
    not data-scale.
    """

    def __init__(
        self,
        columns: list[str] | None = None,
        exact_distinct: bool = False,
        rsd: float = 0.05,
    ):
        ensure(0.0 < rsd < 1.0, "rsd must be in (0,1)")
        # None means "profile every numeric/string column"; an EXPLICIT
        # empty list is almost certainly a caller bug — fail fast rather
        # than silently scanning the whole (possibly very wide) frame
        ensure(
            columns is None or len(list(columns)) > 0,
            "columns must be None (profile all) or a non-empty list",
        )
        self.columns = list(columns) if columns is not None else None
        self.exact_distinct = exact_distinct
        self.rsd = rsd

    def _check_input(self, df: DataFrame) -> None:
        if self.columns:
            validate_columns(df, self.columns)

    def _metric_exprs(self, df: DataFrame, c: str) -> list[tuple[str, Column, bool]]:
        """(metric, aggregate expr, is_numeric_output) triples for col c."""
        dt = df.schema[c].dataType
        col = F.col(c)
        distinct = (
            F.count_distinct(col)
            if self.exact_distinct
            else F.approx_count_distinct(col, self.rsd)
        )
        out: list[tuple[str, Column, bool]] = [
            ("count", F.count(col), True),
            ("nulls", F.count(F.lit(1)) - F.count(col), True),
            ("distinct", distinct, True),
        ]
        if isinstance(dt, _NUMERIC):
            out += [
                ("min", F.min(col).cast("double"), True),
                ("max", F.max(col).cast("double"), True),
                ("mean", F.avg(col.cast("double")), True),
                ("stddev", F.stddev_samp(col.cast("double")), True),
            ]
        elif isinstance(dt, T.StringType):
            out += [
                ("min", F.min(col), False),
                ("max", F.max(col), False),
                ("avg_len", F.avg(F.length(col).cast("double")), True),
            ]
        return out

    def profile(self, df: DataFrame) -> DataFrame:
        self._check_input(df)
        cols = self.columns or [
            c
            for c in df.columns
            if isinstance(df.schema[c].dataType, _NUMERIC + (T.StringType,))
        ]
        ensure(bool(cols), "no profilable (numeric or string) columns")
        aggs, meta = [], []
        for c in cols:
            for metric, expr, is_num in self._metric_exprs(df, c):
                slot = f"__{len(aggs)}"
                aggs.append(expr.alias(slot))
                meta.append((c, metric, slot, is_num))
        wide = df.agg(*aggs)  # 1 row; partial-aggregated scan
        rows = F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(metric).alias("metric"),
                (F.col(slot).cast("double") if is_num else F.lit(None).cast("double")).alias("value_num"),
                (F.lit(None).cast("string") if is_num else F.col(slot).cast("string")).alias("value_str"),
            )
            for c, metric, slot, is_num in meta
        ])
        return wide.select(F.explode(rows).alias("r")).select("r.*")

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.profile(df)


class FrequentItems(Transformer):
    """Exact heavy hitters per column: values occurring at least
    ``min_count`` times (and/or the ``top_k`` most frequent), melted to
    ``(column, value, cnt)``.

    Plan: the probed columns are exploded to (column, value) pairs —
    a narrow ×C row multiply, no shuffle — then ONE
    ``groupBy(column, value).count()``. Spark's hash aggregate applies
    map-side partial counting, so the shuffle carries at most
    (partitions × distinct values) partial rows, not the corpus: the
    same two-phase structure Misra-Gries/count-min approximations
    exist to emulate, but exact, because the post-combine volume is
    bounded by cardinality rather than row count. ``top_k`` adds a
    per-column row_number window over the (tiny) distinct-value frame.
    """

    def __init__(
        self,
        columns: list[str],
        min_count: int = 2,
        top_k: int | None = None,
    ):
        ensure(bool(columns), "at least one column is required")
        ensure(min_count >= 1, "min_count must be >= 1")
        ensure(top_k is None or top_k >= 1, "top_k must be >= 1")
        self.columns = list(columns)
        self.min_count = min_count
        self.top_k = top_k

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, self.columns)

    def frequent(self, df: DataFrame) -> DataFrame:
        self._check_input(df)
        pairs = df.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in self.columns
                ])
            ).alias("p")
        ).select("p.*")
        counts = (
            pairs.filter(F.col("value").isNotNull())
            .groupBy("column", "value")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= self.min_count)
        )
        if self.top_k is not None:
            from pyspark.sql import Window

            w = Window.partitionBy("column").orderBy(
                F.col("cnt").desc(), F.col("value").asc()
            )
            counts = (
                counts.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= self.top_k)
                .drop("__rn")
            )
        return counts

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.frequent(df)


def corpus_report(
    df: DataFrame,
    group_cols: list[str],
    metric_cols: list[str] | None = None,
    quantiles: str = "approx",
    percentiles: list[float] | None = None,
) -> DataFrame:
    """Per-slice data card: ``(group..., metric, value)`` — the
    composition summary a corpus release ships (per source x lang: how
    many documents, how much text, how it is distributed). The
    reporting twin of :class:`ColumnProfiler` (per-COLUMN stats);
    this is per-GROUP.

    Metrics per group: ``n_docs``; for each ``metric_col``:
    ``{c}_sum / {c}_mean / {c}_min / {c}_max`` and one
    ``{c}_p{NN}`` row per entry of ``percentiles`` (default
    ``[0.5]`` -> ``p50``; pass e.g. ``[0.1, 0.5, 0.9]`` for the tail
    shape a length-distribution card shows), plus ``share`` — the
    group's fraction of total rows (sums to 1.0 over the report, the
    number a mixture table quotes).

    Scale shape: ONE groupBy(group_cols) aggregate with map-side
    partials (sum/count/min/max), melted to long form on the
    group-count-sized result; the share divisor is a window SUM over
    the aggregated (group-count-sized) frame, not a second corpus
    scan. ``quantiles='approx'`` uses ``percentile_approx`` (mergeable
    sketch — the 100 TB path; ALL requested percentiles come from one
    sketch per column); ``'exact'`` uses ``percentile``
    (Spark's interpolated exact quantile, matching DuckDB
    ``quantile_cont`` — the oracle-comparison path); ``'none'`` skips
    the percentile rows."""
    ensure(bool(group_cols), "group_cols must name at least one column")
    ensure(
        quantiles in ("approx", "exact", "none"),
        "quantiles: 'approx', 'exact' or 'none'",
    )
    percentiles = [0.5] if percentiles is None else list(percentiles)
    for q in percentiles:
        ensure(0.0 < q < 1.0, "percentiles must be in (0, 1)")
    metric_cols = list(metric_cols or [])
    validate_columns(df, list(group_cols) + metric_cols)

    def pname(q: float) -> str:
        return f"p{q * 100:g}".replace(".", "_")

    aggs = [F.count(F.lit(1)).alias("__n")]
    per_metric: list[tuple[str, str]] = []
    for c in metric_cols:
        aggs += [
            F.sum(F.col(c).cast("double")).alias(f"__{c}_sum"),
            F.avg(F.col(c).cast("double")).alias(f"__{c}_mean"),
            F.min(F.col(c).cast("double")).alias(f"__{c}_min"),
            F.max(F.col(c).cast("double")).alias(f"__{c}_max"),
        ]
        per_metric += [(c, m) for m in ("sum", "mean", "min", "max")]
        if quantiles != "none" and percentiles:
            fn = (
                F.percentile_approx
                if quantiles == "approx"
                else F.percentile
            )
            # one aggregate expression computes EVERY percentile
            # (array form), unpacked into named columns
            arr = fn(
                F.col(c).cast("double"),
                F.array(*[F.lit(q) for q in percentiles]),
            )
            for j, q in enumerate(percentiles):
                aggs.append(
                    F.element_at(arr, j + 1).alias(f"__{c}_{pname(q)}")
                )
                per_metric.append((c, pname(q)))
    agg = df.groupBy(*group_cols).agg(*aggs)

    from pyspark.sql import Window

    total = F.sum("__n").over(Window.partitionBy())
    agg = agg.withColumn("__share", F.col("__n") / total)

    pairs = [
        F.struct(F.lit("n_docs").alias("metric"),
                 F.col("__n").cast("double").alias("value")),
        F.struct(F.lit("share").alias("metric"),
                 F.col("__share").alias("value")),
    ] + [
        F.struct(F.lit(f"{c}_{m}").alias("metric"),
                 F.col(f"__{c}_{m}").alias("value"))
        for c, m in per_metric
    ]
    return agg.select(
        *group_cols, F.explode(F.array(*pairs)).alias("kv")
    ).select(*group_cols, "kv.metric", "kv.value")


def tokenizer_report(
    df: DataFrame,
    tokens_col: str,
    text_col: str,
    group_cols: list[str] | None = None,
    oov_id: int | None = -1,
) -> DataFrame:
    """Tokenizer audit card: ``(group..., metric, value)`` over a
    tokenized corpus (the ``encode_ids``/``encode`` output of the BPE /
    Unigram builders, or any array token column) — the numbers a
    tokenizer evaluation quotes before a model trains on the shards:

    - ``n_docs``, ``n_tokens``, ``n_words``, ``n_chars``
    - ``tokens_per_doc``   mean sequence length (budget planning)
    - ``fertility``        tokens per whitespace word — the standard
      cross-lingual tokenizer-quality metric (Rust et al. 2021): a
      fertility far above ~1.3 on a language slice means the vocab
      under-serves that language
    - ``chars_per_token``  compression rate (bytes-ish per token)
    - ``oov_rate``         fraction of tokens equal to ``oov_id``
      (the builders emit -1 for unknown ids; pass ``oov_id=None``
      for token-string columns where OOV does not apply)

    Group by language / source (``group_cols``) to see which slices
    the vocabulary under-serves. Scale shape: ONE
    groupBy(group_cols) aggregate with map-side partials, melted on
    the group-count-sized result — the corpus_report discipline, zero
    extra scans."""
    validate_columns(df, [tokens_col, text_col] + list(group_cols or []))
    g = list(group_cols or [])
    toks = F.col(tokens_col)
    n_tok = F.coalesce(F.size(toks).cast("bigint"), F.lit(0))
    n_words = F.coalesce(
        F.size(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))),
                        r"\s+"),
                lambda w: w != "",
            )
        ).cast("bigint"),
        F.lit(0),
    )
    n_chars = F.coalesce(
        F.length(F.col(text_col)).cast("bigint"), F.lit(0)
    )
    aggs = [
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(n_tok).cast("double").alias("n_tokens"),
        F.sum(n_words).cast("double").alias("n_words"),
        F.sum(n_chars).cast("double").alias("n_chars"),
    ]
    if oov_id is not None:
        n_oov = F.coalesce(
            F.size(
                F.filter(toks, lambda t: t == F.lit(oov_id))
            ).cast("bigint"),
            F.lit(0),
        )
        aggs.append(F.sum(n_oov).cast("double").alias("n_oov"))
    agg = df.groupBy(*g).agg(*aggs)
    metrics = [
        ("n_docs", F.col("n_docs")),
        ("n_tokens", F.col("n_tokens")),
        ("n_words", F.col("n_words")),
        ("n_chars", F.col("n_chars")),
        ("tokens_per_doc", F.try_divide(F.col("n_tokens"),
                                        F.col("n_docs"))),
        ("fertility", F.try_divide(F.col("n_tokens"),
                                   F.col("n_words"))),
        ("chars_per_token", F.try_divide(F.col("n_chars"),
                                         F.col("n_tokens"))),
    ]
    if oov_id is not None:
        metrics.append(
            ("oov_rate", F.try_divide(F.col("n_oov"),
                                      F.col("n_tokens")))
        )
    stacked = agg.select(
        *g,
        F.explode(
            F.array(*[
                F.struct(F.lit(name).alias("metric"),
                         expr.cast("double").alias("value"))
                for name, expr in metrics
            ])
        ).alias("__m"),
    )
    return stacked.select(
        *g, F.col("__m.metric").alias("metric"),
        F.col("__m.value").alias("value"),
    )


def dedup_report(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    n_total: int | None = None,
    max_iterations: int = 15,
) -> DataFrame:
    """Duplicate-cluster data card from a ``candidate_pairs`` frame —
    the audit a dedup run ships next to its survivors: how much of the
    corpus is duplicated, and in what cluster shapes. Works on any of
    the near-dup operators' pair output (MinHash/SimHash/NGram/
    Embedding/image/audio/video/CrossModal), so the SAME card covers
    every tier.

    Rows ``(metric, value)``:

    - ``n_pairs``             candidate pairs in
    - ``n_clusters``          transitive duplicate families
    - ``n_clustered_docs``    documents in any family
    - ``n_excess_docs``       documents a keep-one dedup would drop
      (``sum(size - 1)`` — the corpus-shrink number)
    - ``max_cluster_size`` / ``mean_cluster_size``
    - ``cluster_size_{s}``    one row per observed family size s
      (count of families of that size — the histogram that separates
      "many twins" from "one 10k-copy boilerplate family")
    - ``dup_share``           ``n_excess_docs / n_total`` when
      ``n_total`` is given (the headline percentage)

    Scale shape: the transitive closure is the package's distributed
    connected components (one join + one aggregate per iteration over
    the edge-sized frame); everything after is two groupBys on the
    cluster-count-sized result. The card is edge-sized work, never
    corpus-sized."""
    from ..functions.graph import connected_components

    comp = connected_components(
        pairs, a_col=a_col, b_col=b_col, max_iterations=max_iterations
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("double").alias("size")
    )
    hist = sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    totals = sizes.agg(
        F.count(F.lit(1)).cast("double").alias("n_clusters"),
        F.sum("size").alias("n_clustered_docs"),
        F.sum(F.col("size") - 1).alias("n_excess_docs"),
        F.max("size").alias("max_cluster_size"),
        F.avg("size").alias("mean_cluster_size"),
    )
    n_pairs = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n_pairs")
    )
    melted = totals.crossJoin(n_pairs).selectExpr(
        "stack(6, 'n_pairs', n_pairs, 'n_clusters', n_clusters, "
        "'n_clustered_docs', n_clustered_docs, "
        "'n_excess_docs', n_excess_docs, "
        "'max_cluster_size', max_cluster_size, "
        "'mean_cluster_size', mean_cluster_size) AS (metric, value)"
    )
    hist_rows = hist.select(
        F.concat(
            F.lit("cluster_size_"), F.col("size").cast("bigint")
        ).alias("metric"),
        F.col("n").alias("value"),
    )
    out = melted.unionByName(hist_rows)
    if n_total is not None:
        share = totals.select(
            F.lit("dup_share").alias("metric"),
            (F.col("n_excess_docs") / F.lit(float(n_total))).alias(
                "value"
            ),
        )
        out = out.unionByName(share)
    return out
