"""Temporal joins for event/feature alignment (beyond the reference,
SURVEY.md §2.3): the as-of join is the standard way to attach "the most
recent observation at or before time t" (quotes to trades, feature
snapshots to label events) without leaking future data.

Spark-first design — the naive formulation is a range join
(``l.ts >= r.ts`` equi-join on key) whose inner inequality makes Catalyst
fall back to a per-key cross product: O(L×R) per key, a scale killer when
a hot key holds millions of rows on both sides. Instead the two sides are
UNIONed and resolved with ONE window pass:

1. tag rows (right=0 / left=1), pack the right side's carried columns
   into a single struct;
2. one window per key ordered by (ts, tag): ``last(struct, ignorenulls)``
   over ``unboundedPreceding..currentRow`` gives every left row the most
   recent right row at-or-before it (the tag tie-break makes the match
   inclusive); ``first(...)`` over the mirrored frame gives the forward
   variant;
3. keep left rows, unpack the struct, null it out when outside
   ``tolerance``.

Cost: one shuffle of L+R rows on the key — the same price as the
equi-join Spark would run anyway, with no range-explosion term. Running
state per partition is a single struct, so a 100 TB sorted-merge window
never materializes a per-key buffer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..pipeline import Transformer
from ..validation import ensure, validate_columns


class AsOfJoiner(Transformer):
    """Join each left row to the nearest right row at-or-before
    (``direction='backward'``, the default) or at-or-after
    (``'forward'``) its timestamp, per key.

    Parameters
    ----------
    right : DataFrame
        The lookup side. Its ``value_cols`` are appended to every left
        row (with ``suffix`` on name collisions) plus a
        ``<ts_col><suffix>`` column holding the matched timestamp.
    on : list[str]
        Equality key columns (present on both sides).
    ts_col : str
        Event-time column name (both sides; cast-compatible with
        timestamp ordering).
    value_cols : list[str] | None
        Right columns to carry (default: all non-key, non-ts columns).
    tolerance_seconds : float | None
        Maximum |left.ts - right.ts|; matches farther away are nulled
        (the row is kept — this is a left join).
    direction : 'backward' | 'forward'

    At equal timestamps the right row is eligible (inclusive, matching
    DuckDB/pandas ``merge_asof`` semantics). Ties among right rows with
    an identical (key, ts) resolve to an arbitrary-but-deterministic one
    (max by the packed struct's ordering) — supply unique (key, ts) on
    the right for fully specified output.

    Scale note (hot keys): the default union+window plan shuffles once
    on the join keys and never builds a range-join cross product, but
    the window partitions by key ONLY — one pathologically hot key (a
    single device/user holding a large fraction of all rows) serializes
    onto one reducer. An as-of window cannot be salted by rows alone (a
    salt bucket's first row still needs the last right row of the
    previous bucket), so the skew-safe mode is TIME bucketing with a
    carry-in pass: set ``time_bucket_seconds`` and the plan becomes

    1. in-bucket window partitioned by (key, floor(ts/bucket)) — reducer
       work bounded by rows per key per bucket;
    2. one tiny per-(key, bucket) aggregate of the boundary payload
       (last right row for backward, first for forward);
    3. a second window over that per-bucket frame (rows = number of
       buckets per key, not number of events) computing the carry-in;
    4. rows with no in-bucket match take their bucket's carry-in.

    Output is identical to the default plan (boundary ties inherit the
    same packed-struct ordering). Pick the bucket so a hot key's rows
    per bucket AND its bucket count are both comfortable — e.g. hours
    for a key logging millions of events per day over a year.
    """

    def __init__(
        self,
        right: DataFrame,
        on: list[str],
        ts_col: str,
        value_cols: list[str] | None = None,
        tolerance_seconds: float | None = None,
        direction: str = "backward",
        suffix: str = "_right",
        time_bucket_seconds: float | None = None,
    ):
        ensure(direction in ("backward", "forward"), "direction must be backward|forward")
        ensure(bool(on), "at least one key column is required")
        ensure(
            tolerance_seconds is None or tolerance_seconds >= 0,
            "tolerance_seconds must be >= 0",
        )
        ensure(
            time_bucket_seconds is None or time_bucket_seconds > 0,
            "time_bucket_seconds must be > 0",
        )
        self.right = right
        self.on = list(on)
        self.ts_col = ts_col
        if value_cols is None:
            value_cols = [
                c for c in right.columns if c not in set(on) | {ts_col}
            ]
        ensure(bool(value_cols), "right side carries no value columns")
        self.value_cols = list(value_cols)
        self.tolerance_seconds = tolerance_seconds
        self.direction = direction
        self.suffix = suffix
        self.time_bucket_seconds = time_bucket_seconds
        validate_columns(right, self.on + [ts_col] + self.value_cols)

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, self.on + [self.ts_col])

    def _out_name(self, c: str, left_cols: set[str]) -> str:
        return c + self.suffix if c in left_cols else c

    def _transform(self, df: DataFrame) -> DataFrame:
        ts, on = self.ts_col, self.on
        left_cols = df.columns
        # right rows carry their payload in one struct (ts first, so the
        # arbitrary-tie max is by timestamp then payload — deterministic);
        # left rows carry NULL so ignorenulls skips them.
        payload = F.struct(
            F.col(ts).alias("__ats"), *[F.col(c).alias(c) for c in self.value_cols]
        )
        r = self.right.select(
            *on,
            F.col(ts).alias("__ts"),
            F.lit(0).alias("__tag"),
            payload.alias("__p"),
            *[F.lit(None).cast(df.schema[c].dataType).alias(f"__l_{c}") for c in left_cols],
        )
        l = df.select(
            *on,
            F.col(ts).alias("__ts"),
            F.lit(1).alias("__tag"),
            F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
            *[F.col(c).alias(f"__l_{c}") for c in left_cols],
        )
        u = l.unionByName(r)
        bucket = self.time_bucket_seconds
        if bucket is not None:
            u = u.withColumn(
                "__bkt",
                F.floor(
                    F.col("__ts").cast("double") / F.lit(float(bucket))
                ).cast("long"),
            )
        part = [*on, "__bkt"] if bucket is not None else on
        if self.direction == "backward":
            # right (tag 0) sorts before left (tag 1) at equal ts ->
            # inclusive; frame looks back.
            w = (
                Window.partitionBy(*part)
                .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            matched = F.last(F.col("__p"), ignorenulls=True).over(w)
        else:
            # left first at equal ts, frame looks forward.
            w = (
                Window.partitionBy(*part)
                .orderBy(F.col("__ts").asc(), F.col("__tag").desc())
                .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
            matched = F.first(F.col("__p"), ignorenulls=True).over(w)
        if bucket is not None:
            # carry-in pass: rows whose bucket-local window found nothing
            # take the boundary payload of the nearest earlier (backward)
            # or later (forward) bucket. The carry window runs over ONE
            # row per (key, bucket) — bucket counts, not event counts —
            # so a hot key's reducer work stays bounded. The payload
            # struct leads with __ats, so max/min == last/first by ts.
            buckets = u.select(*on, "__bkt").distinct()
            rb = u.where(F.col("__tag") == 0).groupBy(*on, "__bkt")
            if self.direction == "backward":
                pb = rb.agg(F.max("__p").alias("__bp"))
                w_carry = (
                    Window.partitionBy(*on)
                    .orderBy(F.col("__bkt").asc())
                    .rowsBetween(Window.unboundedPreceding, -1)
                )
                carry_expr = F.last(F.col("__bp"), ignorenulls=True).over(w_carry)
            else:
                pb = rb.agg(F.min("__p").alias("__bp"))
                w_carry = (
                    Window.partitionBy(*on)
                    .orderBy(F.col("__bkt").asc())
                    .rowsBetween(1, Window.unboundedFollowing)
                )
                carry_expr = F.first(F.col("__bp"), ignorenulls=True).over(w_carry)
            # null-safe equality throughout: the default plan's window
            # groups NULL keys (and the NULL bucket from a NULL ts) into
            # their own partition, so the bucket/carry joins must match
            # them too — plain equi-joins would silently drop their
            # carry-in matches
            bb, bp2 = buckets.alias("__b"), pb.alias("__p")
            bcond = [
                F.col(f"__b.{k}").eqNullSafe(F.col(f"__p.{k}")) for k in on
            ] + [F.col("__b.__bkt").eqNullSafe(F.col("__p.__bkt"))]
            carry = (
                bb.join(bp2, on=bcond, how="left")
                .select("__b.*", F.col("__p.__bp").alias("__bp"))
                .select(*on, "__bkt", carry_expr.alias("__carry"))
            )
            cu, cc = u.alias("__u"), carry.alias("__c")
            cond = [
                F.col(f"__u.{k}").eqNullSafe(F.col(f"__c.{k}")) for k in on
            ] + [F.col("__u.__bkt").eqNullSafe(F.col("__c.__bkt"))]
            u = cu.join(cc, on=cond, how="left").select(
                "__u.*", F.col("__c.__carry").alias("__carry")
            )
            matched = F.coalesce(matched, F.col("__carry"))
        out = u.select(
            *[F.col(f"__l_{c}").alias(c) for c in left_cols],
            F.col("__tag"),
            matched.alias("__m"),
        ).filter(F.col("__tag") == 1)
        if self.tolerance_seconds is not None:
            gap = F.abs(
                F.col(ts).cast("double") - F.col("__m.__ats").cast("double")
            )
            out = out.withColumn(
                "__m",
                F.when(gap <= F.lit(float(self.tolerance_seconds)), F.col("__m")),
            )
        lset = set(left_cols)
        return out.select(
            *left_cols,
            F.col("__m.__ats").alias(ts + self.suffix),
            *[
                F.col(f"__m.{c}").alias(self._out_name(c, lset))
                for c in self.value_cols
            ],
        )


class IntervalJoiner(Transformer):
    """Join left point rows to right interval rows containing them:
    ``l.key = r.key AND r.start <= l.point < r.end`` — event-to-session,
    trade-to-auction-window, reading-to-maintenance-window attachment.

    Spark executes a naive equi+range join as a sort-merge on the key
    alone and cross-products each key's rows before applying the range
    filter — O(|L_k| x |R_k|) per key, unusable when one key holds
    millions of rows. This operator bin-blocks instead:

    1. each interval row explodes to the ``bin_width_seconds``-wide epoch
       bins it overlaps (fan-out = ceil(len/width)+1; intervals spanning
       more than ``max_bins_per_interval`` bins are excluded from the
       join — size the bin width to the longest legitimate interval);
    2. each point row computes its single containing bin;
    3. equi-join on (key, bin) — a plain hash/sort-merge join with
       pushdown-able keys — then the exact range predicate filters.

    A point has exactly ONE bin, so every (point, interval) pair meets at
    most once: no post-join dedup. Pick ``bin_width_seconds`` near the
    typical interval length — fan-out stays ~2 and the join carries no
    cross-product term at any key skew.

    ``how='left'`` keeps unmatched points with null right columns (one
    extra anti-join branch over the same bin-blocked plan).
    """

    def __init__(
        self,
        right: DataFrame,
        on: list[str],
        point_col: str,
        start_col: str,
        end_col: str,
        bin_width_seconds: int = 3600,
        value_cols: list[str] | None = None,
        how: str = "inner",
        suffix: str = "_right",
        max_bins_per_interval: int = 10_000,
    ):
        ensure(bool(on), "at least one key column is required")
        ensure(bin_width_seconds >= 1, "bin_width_seconds must be >= 1")
        ensure(how in ("inner", "left"), "how must be inner|left")
        self.right = right
        self.on = list(on)
        self.point_col = point_col
        self.start_col = start_col
        self.end_col = end_col
        self.bin_width = int(bin_width_seconds)
        if value_cols is None:
            value_cols = [
                c
                for c in right.columns
                if c not in set(on) | {start_col, end_col}
            ]
        self.value_cols = list(value_cols)
        self.how = how
        self.suffix = suffix
        self.max_bins = max_bins_per_interval
        validate_columns(right, self.on + [start_col, end_col] + self.value_cols)

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, self.on + [self.point_col])

    def _bin(self, c: Column) -> Column:
        return F.floor(c.cast("double") / F.lit(float(self.bin_width))).cast("bigint")

    def _transform(self, df: DataFrame) -> DataFrame:
        on = self.on
        sb, eb = self._bin(F.col(self.start_col)), self._bin(
            F.col(self.end_col)
        )
        # guard against adversarial fan-out: an interval spanning more
        # than max_bins_per_interval bins is EXCLUDED from the join (a
        # 10-year interval at 1s bins would explode to 3e8 rows). Size
        # bin_width to the longest legitimate interval instead.
        r = (
            self.right.filter((eb - sb) <= F.lit(self.max_bins))
            .select(
                *[F.col(c).alias(f"__r_{c}") for c in on],
                F.col(self.start_col).alias("__start"),
                F.col(self.end_col).alias("__end"),
                F.explode(F.sequence(sb, eb)).alias("__bin"),
                *[F.col(c).alias(f"__v_{c}") for c in self.value_cols],
            )
        )
        pt_bin = self._bin(F.col(self.point_col))
        l = df.withColumn("__bin", pt_bin)
        cond = (
            (F.col("__start") <= F.col(self.point_col))
            & (F.col(self.point_col) < F.col("__end"))
        )
        for c in on:
            cond = cond & (F.col(c) == F.col(f"__r_{c}"))
        joined = l.join(r, on=(l["__bin"] == r["__bin"]) & cond, how="inner")
        lset = set(df.columns)

        def out_name(c: str) -> str:
            return c + self.suffix if c in lset else c

        matched = joined.select(
            *[l[c] for c in df.columns],
            F.col("__start").alias(out_name(self.start_col)),
            F.col("__end").alias(out_name(self.end_col)),
            *[F.col(f"__v_{c}").alias(out_name(c)) for c in self.value_cols],
        )
        if self.how == "inner":
            return matched
        unmatched = l.join(
            r, on=(l["__bin"] == r["__bin"]) & cond, how="left_anti"
        ).select(
            *df.columns,
            F.lit(None).cast(self.right.schema[self.start_col].dataType).alias(
                out_name(self.start_col)
            ),
            F.lit(None).cast(self.right.schema[self.end_col].dataType).alias(
                out_name(self.end_col)
            ),
            *[
                F.lit(None)
                .cast(self.right.schema[c].dataType)
                .alias(out_name(c))
                for c in self.value_cols
            ],
        )
        return matched.unionByName(unmatched)


class GroupedTopK(Transformer):
    """Keep the top ``k`` rows per group by ``order_col`` — the
    "best-k documents per domain/source by quality score" selection
    primitive.

    Default plan: one hash shuffle on the group key + in-partition sort,
    ``row_number() <= k`` (no full sort, no global limit). With
    ``skew_safe=True`` a salted pre-pass first takes top-k per
    (input-partition, group) — that window shuffles on the salted key, so
    a pathological group with 10^9 rows spreads across every reducer and
    ships at most k×num_partitions survivors into the final per-group
    sort instead of all 10^9. Two shuffles total, no single-reducer
    hotspot — the standard salted two-phase top-k at 100 TB.

    Ties beyond position k are broken by ``tiebreak_cols`` (required for
    deterministic output when scores repeat).
    """

    def __init__(
        self,
        group_cols: list[str],
        order_col: str,
        k: int,
        ascending: bool = False,
        tiebreak_cols: list[str] | None = None,
        skew_safe: bool = False,
    ):
        ensure(k >= 1, "k must be >= 1")
        ensure(bool(group_cols), "at least one group column is required")
        self.group_cols = list(group_cols)
        self.order_col = order_col
        self.k = k
        self.ascending = ascending
        self.tiebreak_cols = list(tiebreak_cols or [])
        self.skew_safe = skew_safe

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, self.group_cols + [self.order_col] + self.tiebreak_cols)

    def _order(self) -> list[Column]:
        main = F.col(self.order_col).asc() if self.ascending else F.col(self.order_col).desc()
        return [main] + [F.col(c).asc() for c in self.tiebreak_cols]

    def _transform(self, df: DataFrame) -> DataFrame:
        if self.skew_safe:
            # salt = input partition id, materialized as a column BEFORE
            # the window shuffle (nondeterministic exprs aren't allowed
            # inside partitionBy itself)
            pre = Window.partitionBy("__salt", *self.group_cols).orderBy(*self._order())
            df = (
                df.withColumn("__salt", F.spark_partition_id())
                .withColumn("__rn0", F.row_number().over(pre))
                .filter(F.col("__rn0") <= self.k)
                .drop("__rn0", "__salt")
            )
        w = Window.partitionBy(*self.group_cols).orderBy(*self._order())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= self.k)
            .drop("__rn")
        )
