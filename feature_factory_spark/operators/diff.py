"""Corpus snapshot diffing — the bookkeeping step of a recrawl
lifecycle.

The incremental-dedup tier (write_index / dedupe_against) answers
"which NEW documents are duplicates of the corpus"; :func:`corpus_diff`
answers the sibling question every snapshot hand-off asks first: which
ids were added, which disappeared, and which changed content between
snapshot N and snapshot N+1. Downstream stages key off the status —
only 'added'/'changed' rows need re-decoding, re-hashing, re-scoring.

Semantics (by ``id_col``, content compared over ``content_cols``):
- ``added``      id present only in ``new``
- ``removed``    id present only in ``old``
- ``changed``    id in both, content fingerprint differs
- ``unchanged``  id in both, content fingerprint equal

The fingerprint is ``md5`` over the content columns' string forms,
each prefixed with a one-character null flag ('N' for NULL with an
empty body, 'V' for a value) and joined with the \\x1f unit separator —
so NULL can never collide with ANY literal (including one that spells
a sentinel) and (NULL, 'x') never collides with ('x', NULL).
Deterministic and reproducible in any engine.

Scale shape: one full outer join on the id key — both sides shuffle
once on ``id_col``, the comparison is a projected expression. No
collect, no window. Duplicate ids within a snapshot are rejected
nowhere (the join is many-to-many by SQL semantics); callers with
non-unique ids should dedupe first — documented rather than silently
aggregated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..validation import ensure, validate_columns

_SEP = "\x1f"


def content_fingerprint(cols: list[str]) -> Column:
    """md5 fingerprint over the null-flagged, unit-separated string
    forms of ``cols`` — the cross-engine content-equality key. Each
    column contributes 'N' when NULL, else 'V' + its string form, so
    no literal value can impersonate NULL."""
    parts = [
        F.when(F.col(c).isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.col(c).cast("string"))
        )
        for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """(id_col, status) for every id in either snapshot — status in
    {'added', 'removed', 'changed', 'unchanged'}."""
    ensure(bool(content_cols), "at least one content column is required")
    for df in (old, new):
        validate_columns(df, [id_col] + list(content_cols))
    o = old.select(
        F.col(id_col).alias("__ff_id"),
        content_fingerprint(list(content_cols)).alias("__ff_old_fp"),
    )
    n = new.select(
        F.col(id_col).alias("__ff_id"),
        content_fingerprint(list(content_cols)).alias("__ff_new_fp"),
    )
    joined = o.join(n, on="__ff_id", how="full_outer")
    status = (
        F.when(F.col("__ff_old_fp").isNull(), F.lit("added"))
        .when(F.col("__ff_new_fp").isNull(), F.lit("removed"))
        .when(F.col("__ff_old_fp") == F.col("__ff_new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("__ff_id").alias(id_col), status.alias("status")
    )
