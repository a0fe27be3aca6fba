"""Feature selection operators (reference: src/transformers/feature_selection.rs).

The reference materializes the WHOLE DataFrame with collect() and computes
statistics in Rust on batches[0] only (feature_selection.rs:104-110 etc.) —
a single-batch, single-node pattern we deliberately do NOT copy
(SURVEY.md §2.4-F). Every statistic here is a distributed Spark aggregate:

- variances / distinct counts: one multi-column agg job.
- correlation matrices: pairwise-complete Pearson aggregate expressions,
  batched into bounded-size agg jobs (same semantics at every feature
  count — see _corr_matrix).
- PSI / IV bin counts: conditional-sum aggregation, one job per frame.
- duplicate detection: two-phase — per-column fingerprint agg to find
  candidate groups, then ONE exact pairwise-equality agg job on candidates
  (vs in-memory array equality, feature_selection.rs:217-232).

Statistics semantics (documented where they diverge from reference quirks):
- variance = population variance (var_pop), computed over non-null values
  (the reference divides by a length that includes nulls,
  feature_selection.rs:119-123 — a bug we don't replicate).
- medians/deciles = exact interpolated percentiles (the reference uses the
  upper-middle order statistic, feature_selection.rs:870-871).
"""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exceptions import InvalidParameterError
from ..functions.stats import column_quantiles
from ..pipeline import Transformer
from ..validation import ensure, validate_columns

CLAMP = 0.0001  # proportion clamp for PSI / IV (feature_selection.rs:517-518)


def _numeric_columns(df: DataFrame, exclude: set[str] = frozenset()) -> list[str]:
    """Numeric feature columns. The reference treats only Float64 as numeric
    (feature_selection.rs:38-40); we accept the numeric lattice."""
    num = (
        T.DoubleType, T.FloatType, T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    )
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, num) and f.name not in exclude
    ]


def _string_columns(df: DataFrame, exclude: set[str] = frozenset()) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType) and f.name not in exclude
    ]


def _corr_expr(a: str, b: str):
    """Pearson correlation over pairwise-complete rows, ANSI-safe: NULL
    (not an error) for zero-variance inputs — Spark 4 runs ANSI mode by
    default, where F.corr raises DIVIDE_BY_ZERO on constant columns.

    All three aggregates (covariance and both stddevs) are restricted to
    rows where BOTH columns are non-null; mixing covar over complete rows
    with stddev over each column's own rows is not Pearson correlation
    when NULLs are asymmetric."""
    ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
    both = ca.isNotNull() & cb.isNotNull()
    ca2, cb2 = F.when(both, ca), F.when(both, cb)
    return F.try_divide(
        F.covar_samp(ca2, cb2), F.stddev_samp(ca2) * F.stddev_samp(cb2)
    )


def _corr_matrix(
    df: DataFrame, cols: list[str], batch_pairs: int = 400
) -> dict[tuple[str, str], float]:
    """Pairwise Pearson correlations, symmetric, pairwise-complete at
    EVERY width.

    C(d,2) `_corr_expr` aggregate expressions, batched into jobs of
    ``batch_pairs`` pairs so codegen and the aggregation buffer stay
    bounded; each batch is one partial+final hash aggregate — one pass
    over the data. When more than one batch is needed the projected
    input is persisted across batches so the scan isn't repeated.

    Earlier rounds routed d > 40 through pyspark.ml.stat.Correlation
    over a VectorAssembler(handleInvalid="skip") vector — that is
    LISTWISE deletion (a NULL in any feature drops the whole row), so
    with asymmetric NULLs the matrix silently changed semantics with
    feature count. Now both regimes share the pairwise-complete
    `_corr_expr` formula (tests/test_feature_selection.py pins a
    45-column asymmetric-NULL fixture against a driver-side reference)."""
    out: dict[tuple[str, str], float] = {}
    pairs = list(combinations(cols, 2))
    if not pairs:
        return out
    sub = df.select(*cols)
    persisted = len(pairs) > batch_pairs
    if persisted:
        sub = sub.persist()
    try:
        for start in range(0, len(pairs), batch_pairs):
            chunk = pairs[start:start + batch_pairs]
            exprs = [
                _corr_expr(a, b).alias(f"{i}") for i, (a, b) in enumerate(chunk)
            ]
            row = sub.agg(*exprs).collect()[0]
            for i, (a, b) in enumerate(chunk):
                r = row[f"{i}"]
                out[(a, b)] = out[(b, a)] = float(r) if r is not None else 0.0
    finally:
        if persisted:
            sub.unpersist()
    return out


def _variances(df: DataFrame, cols: list[str]) -> dict[str, float]:
    if not cols:
        return {}
    row = df.agg(*[F.var_pop(F.col(c).cast("double")).alias(c) for c in cols]).collect()[0]
    return {c: (row[c] if row[c] is not None else 0.0) for c in cols}


class _KeepColumnsTransformer(Transformer):
    """Shared shell: fit computes self.kept_ (ordered like df.columns);
    transform projects onto it."""

    kept_: list[str]

    def is_stateful(self) -> bool:
        return True

    def _transform(self, df: DataFrame) -> DataFrame:
        kept = [c for c in df.columns if c in set(self.kept_)]
        if not kept:
            raise InvalidParameterError("selection would drop every column")
        return df.select(*kept)


class DropFeatures(Transformer):
    """Drop listed columns; error if nothing would remain
    (feature_selection.rs:43-82). Stateless."""

    def __init__(self, columns: list[str]):
        ensure(bool(columns), "at least one column to drop is required")
        self.columns = list(columns)

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, self.columns)
        if not [c for c in df.columns if c not in set(self.columns)]:
            raise InvalidParameterError("DropFeatures would drop every column")

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.drop(*self.columns)


class DropConstantFeatures(_KeepColumnsTransformer):
    """Drop numeric columns with population variance < tolerance and string
    columns with <= 1 distinct value (feature_selection.rs:85-186). One
    aggregate job for all columns."""

    def __init__(self, tolerance: float = 1e-8):
        ensure(tolerance >= 0, "tolerance must be >= 0")
        self.tolerance = tolerance
        self.kept_ = []

    def _fit(self, df: DataFrame) -> None:
        num = _numeric_columns(df)
        cat = _string_columns(df)
        exprs = [F.var_pop(F.col(c).cast("double")).alias(f"v_{c}") for c in num]
        exprs += [F.countDistinct(c).alias(f"d_{c}") for c in cat]
        dropped: set[str] = set()
        if exprs:
            row = df.agg(*exprs).collect()[0]
            for c in num:
                v = row[f"v_{c}"]
                if v is None or v < self.tolerance:
                    dropped.add(c)
            for c in cat:
                if row[f"d_{c}"] <= 1:
                    dropped.add(c)
        self.kept_ = [c for c in df.columns if c not in dropped]


class DropDuplicateFeatures(_KeepColumnsTransformer):
    """Drop exact-duplicate columns, keeping the first occurrence
    (feature_selection.rs:189-264). Two-phase distributed design:
    (1) one agg computing a fingerprint per column (sum of per-row hashes +
    null count); (2) one agg doing exact null-safe pairwise comparison on
    fingerprint-collision candidates only."""

    def _fit(self, df: DataFrame) -> None:
        cols = list(df.columns)
        fp_exprs = []
        for c in cols:
            h = F.hash(F.col(c).cast("string"))
            fp_exprs.append(F.sum(h.cast("bigint")).alias(f"h_{c}"))
            fp_exprs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"n_{c}"))
        row = df.agg(*fp_exprs).collect()[0]
        groups: dict[tuple, list[str]] = {}
        for c in cols:
            dt = df.schema[c].dataType.simpleString()
            groups.setdefault((dt, row[f"h_{c}"], row[f"n_{c}"]), []).append(c)
        candidates = [
            (a, b)
            for g in groups.values()
            if len(g) > 1
            for a, b in combinations(g, 2)
        ]
        dropped: set[str] = set()
        if candidates:
            cmp_exprs = [
                F.sum((~F.col(a).eqNullSafe(F.col(b))).cast("bigint")).alias(f"{i}")
                for i, (a, b) in enumerate(candidates)
            ]
            crow = df.agg(*cmp_exprs).collect()[0]
            for i, (a, b) in enumerate(candidates):
                if crow[f"{i}"] == 0 and a not in dropped:
                    dropped.add(b)
        self.kept_ = [c for c in cols if c not in dropped]


class DropCorrelatedFeatures(_KeepColumnsTransformer):
    """Pairwise Pearson scan over numeric columns in schema order; when
    |r| > threshold between two still-kept columns, drop the lower-variance
    member (feature_selection.rs:267-367). Non-numeric columns always kept."""

    def __init__(self, threshold: float = 0.8):
        ensure(0.0 <= threshold <= 1.0, "threshold must be in [0,1]")
        self.threshold = threshold
        self.kept_ = []

    def _fit(self, df: DataFrame) -> None:
        num = _numeric_columns(df)
        corr = _corr_matrix(df, num)
        var = _variances(df, num)
        dropped: set[str] = set()
        for a, b in combinations(num, 2):
            if a in dropped or b in dropped:
                continue
            if abs(corr.get((a, b), 0.0)) > self.threshold:
                dropped.add(a if var[a] <= var[b] else b)
        self.kept_ = [c for c in df.columns if c not in dropped]


class SmartCorrelatedSelection(_KeepColumnsTransformer):
    """Same pairwise scan, but greedily keeps the highest-variance member of
    each correlated group (feature_selection.rs:370-482); non-numeric columns
    always kept in transform."""

    def __init__(self, threshold: float = 0.8):
        ensure(0.0 <= threshold <= 1.0, "threshold must be in [0,1]")
        self.threshold = threshold
        self.kept_ = []

    def _fit(self, df: DataFrame) -> None:
        num = _numeric_columns(df)
        corr = _corr_matrix(df, num)
        var = _variances(df, num)
        # scan candidates highest-variance first; a feature survives unless
        # it correlates above threshold with an already-kept feature
        order = sorted(num, key=lambda c: (-var[c], num.index(c)))
        kept_num: list[str] = []
        for c in order:
            if all(abs(corr.get((c, k), 0.0)) <= self.threshold for k in kept_num):
                kept_num.append(c)
        kept = set(kept_num) | {c for c in df.columns if c not in set(num)}
        self.kept_ = [c for c in df.columns if c in kept]


def _bin_index_expr(column: str, edges: list[float], bins: int):
    """1-based bin index from decile edges: count of edges <= x, clamped to
    [1, bins]. Values below the first edge fall into bin 1, above the last
    into bin `bins`. Arithmetic-only — reproducible in the SQL oracle.

    Documented divergence: the reference bins with v >= lower && v < upper
    for EVERY bin (feature_selection.rs:650-665), so rows equal to the
    column max fall outside all bins and are silently excluded from IV/PSI.
    We clamp max-valued rows into the top bin instead — the intended
    statistic (same family of single-batch quirks as §2.4-F)."""
    x = F.col(column).cast("double")
    cnt = None
    for e in edges:
        term = (x >= F.lit(float(e))).cast("int")
        cnt = term if cnt is None else (cnt + term)
    return F.least(F.lit(bins), F.greatest(F.lit(1), cnt))


def _bin_proportions(
    df: DataFrame,
    columns: list[str],
    edges: dict[str, list[float]],
    bins: int,
    frame_col: str | None = None,
) -> dict:
    """Per-column per-bin proportions (non-null rows), ONE aggregate job for
    all columns x bins via conditional sums.

    Without ``frame_col``: returns {col: [p_1..p_bins]}.
    With ``frame_col`` (an int 0/1 tag): both tagged sub-frames are
    aggregated in the same single job; returns {col: {tag: [p...]}}.

    Shape: bin indexes are projected once per column, melted with
    ``stack`` to (column, bin) rows, and reduced by ONE map-side-combined
    groupBy — the per-map-task shuffle is at most columns x bins x 2
    rows. The previous columns x bins grid of conditional-sum aggregate
    expressions generated a single huge update method that HotSpot
    refused to JIT (interpreted execution, ~4x slower) and whose Janino
    compile alone cost seconds at wide column counts."""
    frames = (0, 1) if frame_col else (None,)
    proj = [
        (F.col(frame_col) if frame_col else F.lit(0)).alias("__frame")
    ]
    # index-based internal aliases + Column-API melt: column names with
    # spaces/quotes/operators never enter generated SQL text
    for i, c in enumerate(columns):
        proj.append(_bin_index_expr(c, edges[c], bins).alias(f"__bin_{i}"))
        proj.append(F.col(c).isNotNull().alias(f"__nn_{i}"))
    base = df.select(*proj)
    entries = F.array(*[
        F.struct(
            F.lit(c).alias("__col"),
            F.col(f"__bin_{i}").alias("__bin"),
            F.col(f"__nn_{i}").alias("__nn"),
        )
        for i, c in enumerate(columns)
    ])
    melted = base.select("__frame", F.explode(entries).alias("__e")).select(
        "__frame", "__e.__col", "__e.__bin", "__e.__nn"
    )
    cells = (
        melted.where("__nn").groupBy("__col", "__bin", "__frame").count().collect()
    )
    cell = {(r["__col"], r["__bin"], r["__frame"]): r["count"] for r in cells}

    def props(c, f):
        f = 0 if f is None else f
        by_bin = [cell.get((c, i, f), 0) for i in range(1, bins + 1)]
        total = sum(by_bin)
        return [(n / total) if total else 0.0 for n in by_bin]

    if frame_col is None:
        return {c: props(c, None) for c in columns}
    return {c: {f: props(c, f) for f in frames} for c in columns}


class DropHighPSIFeatures(_KeepColumnsTransformer):
    """Population-stability-index drift filter against a held reference
    DataFrame (constructor arg, mirroring feature_selection.rs:485-592).

    Per numeric column: 11 decile edges from the REFERENCE frame (exact
    interpolated percentiles), 10 bins, proportions clamped to >= 0.0001,
    PSI = sum (p_ref - p_cur) * ln(p_ref / p_cur); drop when PSI > threshold.
    """

    BINS = 10

    def __init__(self, reference_df: DataFrame, threshold: float = 0.25,
                 approx: bool = False):
        ensure(threshold >= 0, "threshold must be >= 0")
        self.reference_df = reference_df
        self.threshold = threshold
        self.approx = approx
        self.psi_values_: dict[str, float] = {}
        self.kept_ = []

    def _fit(self, df: DataFrame) -> None:
        num = [
            c
            for c in _numeric_columns(df)
            if c in set(_numeric_columns(self.reference_df))
        ]
        self.psi_values_ = {}
        dropped: set[str] = set()
        if num:
            probs = [i / self.BINS for i in range(self.BINS + 1)]
            edges = column_quantiles(self.reference_df, num, probs, approx=self.approx)
            edges = {c: e for c, e in edges.items() if e is not None}
            cols = list(edges)
            # ONE aggregate over the tagged union of both frames (two full
            # passes folded into a single job — at 100 TB every extra fit
            # job is another full scan)
            tagged = self.reference_df.select(
                *cols, F.lit(0).alias("__ff_frame")
            ).unionByName(df.select(*cols, F.lit(1).alias("__ff_frame")))
            both = _bin_proportions(
                tagged, cols, edges, self.BINS, frame_col="__ff_frame"
            )
            p_ref = {c: both[c][0] for c in cols}
            p_cur = {c: both[c][1] for c in cols}
            for c in cols:
                psi = 0.0
                for pr, pc in zip(p_ref[c], p_cur[c]):
                    pr, pc = max(pr, CLAMP), max(pc, CLAMP)
                    psi += (pr - pc) * math.log(pr / pc)
                self.psi_values_[c] = psi
                if psi > self.threshold:
                    dropped.add(c)
        self.kept_ = [c for c in df.columns if c not in dropped]


class SelectByInformationValue(_KeepColumnsTransformer):
    """Keep features whose information value against a binary 0/1 target is
    >= threshold (feature_selection.rs:595-736). Numeric features are decile-
    binned (11 edges -> 10 bins); categorical features use raw categories.
    pct_good/pct_bad clamped to >= 0.0001;
    IV = sum (pct_good - pct_bad) * ln(pct_good / pct_bad). Target always
    kept (feature_selection.rs:718)."""

    BINS = 10

    def __init__(self, target: str, threshold: float, approx: bool = False):
        ensure(threshold >= 0, "threshold must be >= 0")
        self.target = target
        self.threshold = threshold
        self.approx = approx
        self.iv_values_: dict[str, float] = {}
        self.kept_ = []

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.target])

    def _iv_from_counts(self, counts: list[tuple[int, int]], tg: int, tb: int) -> float:
        iv = 0.0
        for good, bad in counts:
            pg = max(good / tg if tg else 0.0, CLAMP)
            pb = max(bad / tb if tb else 0.0, CLAMP)
            iv += (pg - pb) * math.log(pg / pb)
        return iv

    def _fit(self, df: DataFrame) -> None:
        tgt = F.col(self.target).cast("double")
        num = _numeric_columns(df, exclude={self.target})
        cat = _string_columns(df, exclude={self.target})
        self.iv_values_ = {}

        # job 1 (numeric only): all decile edges in one quantile aggregate
        edges = {}
        if num:
            probs = [i / self.BINS for i in range(self.BINS + 1)]
            edges = column_quantiles(df, num, probs, approx=self.approx)

        # job 2: grand totals + every numeric column's per-bin conditional
        # counts in ONE map-side-combined groupBy over the melted
        # (column, bin) pairs — a '__total' sentinel row per input row
        # carries the grand totals through the same job. The per-map-task
        # shuffle is at most (columns*bins + 1) x 2 rows. (A conditional-
        # sum grid of 2*bins aggregate expressions per column generated a
        # huge update method HotSpot refused to JIT.)
        binned = [c for c in num if edges.get(c) is not None]
        proj = [(tgt == 1).alias("__is_good")]
        # index-based internal aliases + Column-API melt keep arbitrary
        # column names out of generated SQL text
        for i, c in enumerate(binned):
            proj.append(_bin_index_expr(c, edges[c], self.BINS).alias(f"__bin_{i}"))
            proj.append(F.col(c).isNotNull().alias(f"__nn_{i}"))
        base = df.select(*proj)
        entries = F.array(
            F.struct(
                F.lit("__total").alias("__col"),
                F.lit(0).alias("__bin"),
                F.lit(True).alias("__nn"),
            ),
            *[
                F.struct(
                    F.lit(c).alias("__col"),
                    F.col(f"__bin_{i}").alias("__bin"),
                    F.col(f"__nn_{i}").alias("__nn"),
                )
                for i, c in enumerate(binned)
            ],
        )
        melted = base.select("__is_good", F.explode(entries).alias("__e")).select(
            "__is_good", "__e.__col", "__e.__bin", "__e.__nn"
        )
        cells = (
            melted.where("__nn")
            .groupBy("__col", "__bin", "__is_good")
            .count()
            .collect()
        )
        cell = {(r["__col"], r["__bin"], r["__is_good"]): r["count"] for r in cells}
        tg = cell.get(("__total", 0, True), 0)
        tb = cell.get(("__total", 0, False), 0)
        for c in binned:
            counts = [
                (cell.get((c, i, True), 0), cell.get((c, i, False), 0))
                for i in range(1, self.BINS + 1)
            ]
            self.iv_values_[c] = self._iv_from_counts(counts, tg, tb)

        # job 3 (categorical only): one melted groupBy for ALL columns
        if cat:
            from ..functions.stats import category_group_stats

            stats = category_group_stats(
                df,
                cat,
                [
                    F.sum((tgt == 1).cast("bigint")).alias("g"),
                    F.sum((tgt != 1).cast("bigint")).alias("b"),
                ],
                [self.target],
            )
            for c in cat:
                counts = [(g or 0, b or 0) for g, b in stats[c].values()]
                self.iv_values_[c] = self._iv_from_counts(counts, tg, tb)

        kept = {
            c for c, iv in self.iv_values_.items() if iv >= self.threshold
        } | {self.target}
        other = set(df.columns) - set(num) - set(cat) - {self.target}
        self.kept_ = [c for c in df.columns if c in (kept | other)]


class SelectBySingleFeaturePerformance(_KeepColumnsTransformer):
    """Keep numeric features with |Pearson corr(feature, target)| >= threshold
    (feature_selection.rs:740-826). One agg job for all features; target and
    non-numeric columns always kept.

    Documented divergence (applies to SelectByInformationValue and
    SelectByTargetMeanPerformance too): the reference's transform keeps ONLY
    target + selected features, silently dropping non-numeric columns
    (feature_selection.rs:713-724, 809-815); we pass non-scored columns
    through — selection operators should not destroy unrelated data."""

    def __init__(self, target: str, threshold: float):
        ensure(0.0 <= threshold <= 1.0, "threshold must be in [0,1]")
        self.target = target
        self.threshold = threshold
        self.performance_: dict[str, float] = {}
        self.kept_ = []

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.target])

    def _fit(self, df: DataFrame) -> None:
        num = _numeric_columns(df, exclude={self.target})
        self.performance_ = {}
        dropped: set[str] = set()
        if num:
            row = df.agg(
                *[_corr_expr(c, self.target).alias(c) for c in num]
            ).collect()[0]
            for c in num:
                r = row[c]
                self.performance_[c] = abs(float(r)) if r is not None else 0.0
                if self.performance_[c] < self.threshold:
                    dropped.add(c)
        self.kept_ = [c for c in df.columns if c not in dropped]


class SelectByTargetMeanPerformance(_KeepColumnsTransformer):
    """Split rows at the feature median; keep the feature when
    |mean(target | x < med) - mean(target | x >= med)| >= threshold
    (feature_selection.rs:829-923).

    Median semantic: exact interpolated percentile(0.5) (documented
    divergence: the reference takes the upper-middle order statistic,
    feature_selection.rs:870-871). One quantile job + one conditional-agg
    job for all features."""

    def __init__(self, target: str, threshold: float, approx: bool = False):
        ensure(threshold >= 0, "threshold must be >= 0")
        self.target = target
        self.threshold = threshold
        self.approx = approx
        self.performance_: dict[str, float] = {}
        self.kept_ = []

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.target])

    def _fit(self, df: DataFrame) -> None:
        num = _numeric_columns(df, exclude={self.target})
        self.performance_ = {}
        dropped: set[str] = set()
        if num:
            med = column_quantiles(df, num, [0.5], approx=self.approx)
            tgt = F.col(self.target).cast("double")
            exprs = []
            for c in num:
                m = F.lit(med[c][0] if med[c] else None)
                x = F.col(c).cast("double")
                exprs.append(F.avg(F.when(x < m, tgt)).alias(f"lo_{c}"))
                exprs.append(F.avg(F.when(x >= m, tgt)).alias(f"hi_{c}"))
            row = df.agg(*exprs).collect()[0]
            for c in num:
                lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
                perf = abs((lo or 0.0) - (hi or 0.0))
                self.performance_[c] = perf
                if perf < self.threshold:
                    dropped.add(c)
        self.kept_ = [c for c in df.columns if c not in dropped]


class MRMR(_KeepColumnsTransformer):
    """Maximum-relevance minimum-redundancy greedy selection
    (feature_selection.rs:926-1051): relevance = |corr(f, target)|,
    candidates with relevance >= relevance_threshold sorted descending
    (ties: schema order); accept unless |corr(f, any accepted)| >
    redundancy_threshold. Target always kept. Correlation matrix computed
    once (single job); the greedy loop is O(k^2) driver-side on a tiny
    matrix."""

    def __init__(
        self,
        target: str,
        relevance_threshold: float = 0.1,
        redundancy_threshold: float = 0.9,
    ):
        ensure(0.0 <= relevance_threshold <= 1.0, "relevance_threshold in [0,1]")
        ensure(0.0 <= redundancy_threshold <= 1.0, "redundancy_threshold in [0,1]")
        self.target = target
        self.relevance_threshold = relevance_threshold
        self.redundancy_threshold = redundancy_threshold
        self.relevance_: dict[str, float] = {}
        self.kept_ = []

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.target])

    def _fit(self, df: DataFrame) -> None:
        num = _numeric_columns(df, exclude={self.target})
        corr = _corr_matrix(df, num + [self.target])
        self.relevance_ = {
            c: abs(corr.get((c, self.target), 0.0)) for c in num
        }
        candidates = [
            c for c in num if self.relevance_[c] >= self.relevance_threshold
        ]
        candidates.sort(key=lambda c: (-self.relevance_[c], num.index(c)))
        accepted: list[str] = []
        for c in candidates:
            if all(
                abs(corr.get((c, a), 0.0)) <= self.redundancy_threshold
                for a in accepted
            ):
                accepted.append(c)
        kept = set(accepted) | {self.target} | (set(df.columns) - set(num))
        self.kept_ = [c for c in df.columns if c in kept]
