"""Shared expression builders — the relational core.

Re-expresses the reference's helper layer (build_case_expr /
apply_mapping / build_interval_case_expr / cap_expr_for /
sanitize_category — reference: src/transformers/categorical.rs:63-194,
discretization.rs:45-68, outliers.rs:31-54) as Spark Column builders,
plus the scale strategy the reference lacks: above a cardinality cutoff,
category mappings are applied via a broadcast-join mapping table instead of
a literal CASE chain (identical results; the CASE chain would bloat the
Catalyst plan and analysis time at high cardinality — SURVEY.md §4.2).
"""

from __future__ import annotations

import math
import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .frames import local_frame

# Above this many distinct categories, mapping application switches from a
# literal when()-chain to a broadcast-join mapping table.
WHEN_CHAIN_MAX_CATEGORIES = 64

# Conservative bound on a from_json literal's JSON payload: Jackson's
# default max-string limit is 20M chars (2.15+); past this the literal
# would fail at runtime and from_json resolves to NULL silently, so the
# builders bail to their F.lit / join fallbacks well before it.
_JSON_LITERAL_MAX_CHARS = 16_000_000


def string_array_literal(values: list) -> Column | None:
    """ONE-plan-node ``array<string>`` literal for model-sized tables:
    ``from_json`` of a JSON string literal constant-folds to a single
    ``Literal(ArrayData)`` during optimization. ``F.lit(list)`` plans
    one expression node PER ELEMENT (``array('a','b',...)``) — measured
    18 s of analysis for a 30k-entry vocabulary vs 1.4 s for this form.
    Returns ``None`` when a value cannot ride JSON exactly (lone
    surrogates), when the dumped JSON approaches Jackson's max-string
    limit, or when a Python-side round-trip disagrees — a failed
    ``from_json`` at runtime resolves to NULL (silent corruption), so
    any doubt falls back to the callers' join path."""
    import json as _json

    for v in values:
        if v is not None and any(0xD800 <= ord(ch) <= 0xDFFF for ch in v):
            return None
    dumped = _json.dumps(values)
    if len(dumped) > _JSON_LITERAL_MAX_CHARS:
        return None
    if _json.loads(dumped) != values:
        return None
    return F.from_json(F.lit(dumped), "array<string>")


def double_array_literal(values: list) -> Column:
    """ONE-plan-node ``array<double>`` literal — the
    :func:`string_array_literal` discipline for numeric model tables.
    ``F.lit(list)`` builds one Literal node per element at PLAN-BUILD
    time (measured ~4 s of driver time for a 10k-entry log-ratio
    table, before any job runs); ``from_json`` of a JSON string literal
    is one call and constant-folds to a single ``Literal(ArrayData)``.
    JSON round-trips IEEE doubles exactly (shortest-repr emit,
    correctly-rounded parse). Falls back to ``F.lit`` when a value is
    non-finite or missing (JSON cannot carry NaN/Inf)."""
    import json as _json
    import math as _math

    def _depth_ok(vs, d):
        # returns (depth, all_finite) over a uniformly nested list
        if all(isinstance(v, list) for v in vs):
            sub = [_depth_ok(v, d + 1) for v in vs]
            if not sub:
                return d + 1, True
            depths = {s[0] for s in sub}
            if len(depths) != 1:
                return None, False
            return depths.pop(), all(s[1] for s in sub)
        if any(isinstance(v, list) for v in vs):
            return None, False
        return d, all(
            v is not None and _math.isfinite(v) for v in vs
        )

    depth, finite = _depth_ok(values, 1)
    if depth is None or not finite:
        return F.lit(values)
    dumped = _json.dumps(values)
    if len(dumped) > _JSON_LITERAL_MAX_CHARS:
        return F.lit(values)
    schema = "array<" * depth + "double" + ">" * depth
    return F.from_json(F.lit(dumped), schema)


def int_array_literal(values: list) -> Column:
    """ONE-plan-node integer array literal (the
    :func:`double_array_literal` twin for integer model tables —
    JSON carries int64 exactly). Element type matches what
    ``F.lit(values)`` would infer (``int`` when every value fits
    int32, else ``bigint``) so swapping the literal form never
    changes a downstream schema. ``values`` must be ints (None
    allowed: JSON null)."""
    import json as _json

    fits32 = all(
        v is None or -(2**31) <= v < 2**31 for v in values
    )
    elem = "int" if fits32 else "bigint"
    dumped = _json.dumps(values)
    if len(dumped) > _JSON_LITERAL_MAX_CHARS:
        return F.lit(values)
    return F.from_json(F.lit(dumped), f"array<{elem}>")


def sanitize_category(cat: str) -> str:
    """Non-alphanumeric chars -> '_' in derived column names
    (categorical.rs:63-67)."""
    return re.sub(r"[^0-9a-zA-Z]", "_", cat)


def mapping_case_expr(
    column: str, mapping: dict[Any, Any], default: Column
) -> Column:
    """CASE WHEN col = k THEN v ... ELSE default END (categorical.rs:73-92)."""
    expr = None
    for k, v in mapping.items():
        cond = F.col(column) == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return default if expr is None else expr.otherwise(default)


def apply_value_mapping(
    df: DataFrame,
    column: str,
    mapping: dict[Any, Any],
    default: Column,
    cast_to: str | None = None,
) -> DataFrame:
    """Replace ``column`` with its mapped value, preserving column order
    (categorical.rs:170-194).

    Strategy: literal when()-chain for small vocabularies; broadcast-join
    mapping table above WHEN_CHAIN_MAX_CATEGORIES. Both produce identical
    results; the join path scales to arbitrary cardinality (the mapping
    table is tiny relative to the data, so the join is always broadcast —
    no shuffle of the fact side).
    """
    if len(mapping) <= WHEN_CHAIN_MAX_CATEGORIES:
        new_col = mapping_case_expr(column, mapping, default)
        if cast_to:
            new_col = new_col.cast(cast_to)
        return df.withColumn(column, new_col)

    spark = df.sparkSession
    key_field = "__ff_key"
    val_field = "__ff_val"
    rows = [(k, v) for k, v in mapping.items()]
    # infer the schema LOCALLY first (same inference as
    # createDataFrame(rows, names) — no job), then build the one-slice
    # frame with it: an RDD-backed createDataFrame with only column
    # names would sample the RDD to infer types, i.e. run a job per
    # mapping
    inferred = spark.createDataFrame(rows, [key_field, val_field]).schema
    map_df = local_frame(spark, rows, inferred)
    joined = df.join(
        F.broadcast(map_df), on=df[column] == map_df[key_field], how="left"
    )
    # NULL keys never match in the join; the reference's CASE chains also
    # fall through to the default for NULL input.
    mapped = F.when(F.col(key_field).isNotNull(), F.col(val_field)).otherwise(default)
    if cast_to:
        mapped = mapped.cast(cast_to)
    out_cols = [
        mapped.alias(c) if c == column else F.col(c) for c in df.columns
    ]
    return joined.select(out_cols)


def cap_expr(column: str, lower: float | None, upper: float | None) -> Column:
    """CASE WHEN col < l THEN l WHEN col > u THEN u ELSE col END
    (outliers.rs:31-54). NULLs pass through unchanged."""
    c = F.col(column)
    expr = c
    if upper is not None:
        expr = F.when(c > F.lit(upper), F.lit(upper)).otherwise(expr)
    if lower is not None:
        expr = F.when(c < F.lit(lower), F.lit(lower)).otherwise(expr)
    return expr


def format_2dp(x: float) -> str:
    """Deterministic 2-decimal formatting used in interval labels.

    Semantic: round-half-up at 2 decimals via floor(x*100 + 0.5) integer
    arithmetic. This matches the reference's `format!("{:.2}")`
    (discretization.rs:267) on all non-boundary values, and — unlike libc
    printf — is reproducible bit-for-bit in ANSI SQL, which the DuckDB
    correctness oracle requires (oracle twin: floor(x*100 + 0.5)).
    """
    if x != x or x in (float("inf"), float("-inf")):
        return str(x)
    scaled = math.floor(x * 100.0 + 0.5)
    sign = "-" if scaled < 0 else ""
    scaled = abs(scaled)
    return f"{sign}{scaled // 100}.{scaled % 100:02d}"


def interval_label(lower: float, upper: float) -> str:
    """Label format "[l, u)" with 2-decimal bounds; the last (inclusive) bin
    is still labeled with ")" (discretization.rs:262-270 vs 51-59)."""
    return f"[{format_2dp(lower)}, {format_2dp(upper)})"


def interval_case_expr(
    column: str, intervals: list[tuple[float, float, str]]
) -> Column:
    """Half-open bins [l,u) except the last, which is [l,u]; values outside
    all bins -> NULL (discretization.rs:45-68)."""
    c = F.col(column)
    expr = None
    last = len(intervals) - 1
    for i, (lo, hi, label) in enumerate(intervals):
        cond = (c >= F.lit(lo)) & ((c <= F.lit(hi)) if i == last else (c < F.lit(hi)))
        expr = (
            F.when(cond, F.lit(label))
            if expr is None
            else expr.when(cond, F.lit(label))
        )
    return expr.otherwise(F.lit(None).cast("string"))


# ---------------------------------------------------------------------------
# Vector expressions (array<float/double> embedding columns)
# ---------------------------------------------------------------------------


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two array columns, JVM-side (no Python UDF):
    sum over zip_with products via a sequential fold — deterministic
    evaluation order, which keeps results bit-comparable with the DuckDB
    oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity; degenerate inputs (zero-norm, NULL, or
    length-mismatched vectors) yield NULL instead of an ANSI
    DIVIDE_BY_ZERO crash — the NULL is a real signal consumers keep:
    threshold filters (`cosine >= t`) drop such pairs naturally, and the
    top-k rankers exclude NULL-scored candidates explicitly. Only
    k-means assignment, which needs a total order, substitutes its own
    -1.0 fallback (see nearest_centroids_expr). The synthetic oracle
    tables contain no degenerate vectors, so the DuckDB twins never
    exercise this branch."""
    return F.try_divide(dot_expr(a, b), norm_expr(a) * norm_expr(b))
