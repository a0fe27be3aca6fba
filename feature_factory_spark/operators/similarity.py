"""Similarity-search operators over embedding columns (array<float>).

The reference has no vector operators (SURVEY.md §2.3). Design:

- CosineTopK: exact brute-force top-k — the query side is broadcast (it
  is small by construction: a handful of probe vectors), so the corpus
  never shuffles; per-partition cosine + a single top-k window on the
  (small) query-id key. This is the correctness baseline and is already
  the right plan for <=10^3 queries over any corpus size.
- BucketedCosineTopK: the scale path — random-hyperplane LSH buckets
  prune the corpus to candidates sharing a signature chunk with the
  query, then exact cosine re-ranks. Trades bounded recall for a
  corpus-side scan that touches only matching buckets (bucket key is a
  shuffle-free broadcast-join probe).

Vector math is the JVM-side fold from functions/expressions (dot/cosine
via zip_with + aggregate) — deterministic evaluation order, bit-stable
against the ANSI-SQL oracle, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.expressions import cosine_expr
from ..pipeline import Transformer
from ..validation import ensure, validate_columns
from .dedup import _hyperplanes


class CosineTopK(Transformer):
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors by cosine similarity.

    ``transform(corpus_df)`` uses the fitted query frame;
    ``search(corpus_df, query_df)`` is the explicit form. Output:
    (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken by
    neighbor id ascending (deterministic). Self-matches excluded when ids
    collide."""

    def __init__(self, vec_col: str, id_col: str, k: int = 10):
        ensure(k >= 1, "k must be >= 1")
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k
        self.query_df: DataFrame | None = None

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col, self.id_col])

    def _fit(self, df: DataFrame) -> None:
        # "fit" pins the query set: the fitted state is the (small) query
        # frame itself, broadcast at search time.
        self.query_df = df

    def search(self, corpus_df: DataFrame, query_df: DataFrame) -> DataFrame:
        validate_columns(corpus_df, [self.vec_col, self.id_col])
        validate_columns(query_df, [self.vec_col, self.id_col])
        q = query_df.select(
            F.col(self.id_col).alias("query_id"), F.col(self.vec_col).alias("q_vec")
        )
        c = corpus_df.select(
            F.col(self.id_col).alias("neighbor_id"), F.col(self.vec_col).alias("c_vec")
        )
        scored = (
            c.join(F.broadcast(q), on=F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                cosine_expr(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= self.k)
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.search(df, self.query_df)


class BucketedCosineTopK(CosineTopK):
    """Approximate cosine top-k via random-hyperplane LSH bucketing.

    Corpus rows are assigned ``n_chunks`` signature chunks (from
    ``n_planes`` seeded hyperplanes); a query probes only corpus rows
    sharing at least one chunk value. Exact cosine re-ranks the
    candidates. Recall rises with n_chunks (multi-probe) and falls with
    chunk width; defaults (16 planes, 2 chunks) give near-total recall
    for cosine >= 0.8 neighborhoods while pruning unrelated buckets.

    At cluster scale the corpus signature frame is computed once and can
    be written bucketed-by-chunk (sources.io.write), making the probe a
    pruned scan instead of a shuffle."""

    def __init__(
        self,
        vec_col: str,
        id_col: str,
        k: int = 10,
        dim: int | None = None,
        n_planes: int = 16,
        n_chunks: int = 2,
        seed: int = 42,
    ):
        super().__init__(vec_col, id_col, k)
        ensure(dim is not None, "dim is required for LSH bucketing")
        ensure(n_planes % n_chunks == 0, "n_planes must divide into n_chunks")
        self.dim = dim
        self.n_planes = n_planes
        self.n_chunks = n_chunks
        self.seed = seed

    def _chunks_expr(self, vec: Column) -> Column:
        planes = _hyperplanes(self.n_planes, self.dim, self.seed)
        width = self.n_planes // self.n_chunks
        sig = F.lit(0)
        for i, plane in enumerate(planes):
            plane_col = F.array(*[F.lit(float(x)) for x in plane])
            dot = F.aggregate(
                F.zip_with(vec, plane_col, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sig = sig + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        return F.array(*[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftrightunsigned(sig.cast("bigint"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("cv"),
            )
            for i in range(self.n_chunks)
        ])

    def search(self, corpus_df: DataFrame, query_df: DataFrame) -> DataFrame:
        validate_columns(corpus_df, [self.vec_col, self.id_col])
        validate_columns(query_df, [self.vec_col, self.id_col])
        c = corpus_df.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col).alias("c_vec"),
            F.explode(self._chunks_expr(F.col(self.vec_col))).alias("ch"),
        ).select("neighbor_id", "c_vec", "ch.ci", "ch.cv")
        q = query_df.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).alias("q_vec"),
            F.explode(self._chunks_expr(F.col(self.vec_col))).alias("ch"),
        ).select("query_id", "q_vec", "ch.ci", "ch.cv")
        cand = (
            c.join(F.broadcast(q), on=["ci", "cv"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        scored = cand.select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= self.k)
        )
