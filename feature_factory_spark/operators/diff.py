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


def corpus_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    n: int = 3,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-grain n-gram overlap report between two corpora — the
    release-note complement of :class:`~.text.ContaminationChecker`
    (which flags individual documents): "what fraction of corpus A's
    distinct n-grams also appear in corpus B" is the number a
    train/eval split audit, a recrawl-vs-snapshot comparison, or a
    vendor-data acquisition quotes.

    Returns ONE lazy frame of ``(metric, value)`` rows:
    ``distinct_grams_a / distinct_grams_b / shared_grams /
    overlap_a_in_b / overlap_b_in_a`` (fractions of each side's
    distinct grams found on the other). Grams follow the package
    shingle clamp (a <n-word document contributes its whole text as
    one gram).

    Scale shape: each side is one explode + DISTINCT (shuffle on the
    gram key — corpus-scale but the standard dedup exchange);
    ``shared`` is one equi-join of the two distinct sets; the three
    counts land in single-row frames combined with 1x1 cross joins.
    Exact by construction so the report is oracle-comparable; at the
    100 TB grain run it on :class:`~.sampling.HashSampler` slices of
    both sides (hash sampling preserves overlap fractions in
    expectation)."""
    from ..functions.text import ngrams_expr, words_expr

    ensure(n >= 1, "n must be >= 1")

    def grams(df: DataFrame) -> DataFrame:
        validate_columns(df, [text_col])
        text = F.col(text_col)
        if lowercase:
            text = F.lower(text)
        return (
            df.select(F.explode(ngrams_expr(words_expr(text), n)).alias("gram"))
            .where(F.col("gram").isNotNull())
            .distinct()
        )

    ga, gb = grams(df_a), grams(df_b)
    a_cnt = ga.agg(F.count(F.lit(1)).alias("na"))
    b_cnt = gb.agg(F.count(F.lit(1)).alias("nb"))
    s_cnt = ga.join(gb, "gram").agg(F.count(F.lit(1)).alias("ns"))
    row = a_cnt.crossJoin(b_cnt).crossJoin(s_cnt)
    pairs = [
        ("distinct_grams_a", F.col("na").cast("double")),
        ("distinct_grams_b", F.col("nb").cast("double")),
        ("shared_grams", F.col("ns").cast("double")),
        ("overlap_a_in_b",
         F.when(F.col("na") > 0,
                F.col("ns").cast("double") / F.col("na").cast("double"))
         .otherwise(F.lit(0.0))),
        ("overlap_b_in_a",
         F.when(F.col("nb") > 0,
                F.col("ns").cast("double") / F.col("nb").cast("double"))
         .otherwise(F.lit(0.0))),
    ]
    return row.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(name).alias("metric"), v.alias("value"))
                for name, v in pairs
            ])
        ).alias("kv")
    ).select("kv.metric", "kv.value")
