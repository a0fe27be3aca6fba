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

from ..functions.expressions import (
    cosine_expr,
    double_array_literal,
    norm_expr,
)
from ..functions.frames import one_slice_frame
from ..pipeline import Transformer
from ..validation import ensure, validate_columns
from .dedup import _hyperplanes, hyperplane_sig_expr


def _quantize_vec_col(frame: DataFrame, vec_alias: str) -> DataFrame:
    """The shared quantized-index write layout: replace ``vec_alias``
    with int8 codes + per-vector scale columns ``c_q8``/``c_q8_scale``
    (the names ``_dequantize_if_needed`` detects on read). ONE place
    defines the layout for both index families."""
    from .embeddings import EmbeddingQuantizer

    return (
        EmbeddingQuantizer(vec_alias, prefix="c")
        .transform(frame)
        .drop(vec_alias)
    )


def _dequantize_if_needed(frame: DataFrame) -> DataFrame:
    """Inverse of ``_quantize_vec_col`` on the index-read path: when the
    stored corpus carries codes, reconstruct ``c_vec`` inside the
    (pruned) scan so the scoring path is identical either way."""
    if "c_q8" not in frame.columns:
        return frame
    from .embeddings import EmbeddingQuantizer

    return frame.withColumn(
        "c_vec",
        EmbeddingQuantizer.dequantize_expr(
            F.col("c_q8"), F.col("c_q8_scale")
        ),
    ).drop("c_q8", "c_q8_scale")


def _load_pq_model(spark, path: str):
    """Rebuild a ProductQuantizer from an index's stored codebook
    table at ``<path>/pq`` (model-sized: m x k rows) — shared by the
    IVF and LSH index layouts."""
    import os

    from .embeddings import ProductQuantizer

    rows = spark.read.parquet(os.path.join(path, "pq")).collect()
    ensure(
        bool(rows),
        f"no PQ codebooks found at {path}/pq — was the index "
        "written with quantize='pq'?",
    )
    m = max(r["sub"] for r in rows) + 1
    k = max(r["idx"] for r in rows) + 1
    dsub = len(rows[0]["centroid"])
    books: list[list[list[float]]] = [
        [None] * k for _ in range(m)  # type: ignore[list-item]
    ]
    for r in rows:
        books[r["sub"]][r["idx"]] = [float(x) for x in r["centroid"]]
    pq = ProductQuantizer("c_vec", dim=m * dsub, m=m, k=k)
    pq.codebooks_ = books
    return pq


def _write_pq_books(spark, path: str, pq, mode: str) -> None:
    """Persist a fitted ProductQuantizer's codebooks as the index's
    ``<path>/pq`` table (the inverse of :func:`_load_pq_model`)."""
    import os

    books = one_slice_frame(
        spark,
        [
            (s, i, list(c))
            for s, book in enumerate(pq.codebooks_)
            for i, c in enumerate(book)
        ],
        "sub int, idx int, centroid array<double>",
    )
    books.write.mode(mode).parquet(os.path.join(path, "pq"))


def nearest_centroids_expr(
    vec: Column, centroids: list[list[float]], n: int = 1
) -> Column:
    """Indices (0-based) of the n centroids nearest to vec by cosine,
    best first.

    The centroid matrix is ONE nested-array literal scanned with a
    single transform — not k independent dim-term folds — which keeps
    the generated code small enough to JIT quickly even at k=256.
    F.lit on the nested list yields a single Literal node (k x dim
    values in one object) instead of k x dim Literal nodes: plan
    analysis and codegen stay O(1) in index size."""
    cents = double_array_literal([[float(x) for x in c] for c in centroids])
    # assignment needs a TOTAL order: a degenerate vector's NULL cosine
    # becomes -1.0 ("far from every centroid") so argmax stays defined
    sims = F.transform(
        cents, lambda c: F.coalesce(cosine_expr(vec, c), F.lit(-1.0))
    )
    pairs = F.zip_with(
        sims,
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda s, i: F.named_struct(F.lit("s"), s, F.lit("i"), i),
    )
    ordered = F.reverse(F.array_sort(pairs))
    return F.slice(F.transform(ordered, lambda x: x["i"]), 1, n)


def cluster_sums_frame(assigned: DataFrame) -> DataFrame:
    """(cluster, pos, s, n) element sums per cluster, dim-independent.

    The vector is melted with posexplode and reduced by
    groupBy(cluster, pos) — the aggregate carries exactly TWO aggregate
    expressions (sum, count) no matter the embedding dimension, where
    the previous shape built ``dim`` separate F.sum columns (thousands
    of aggregate expressions at dim 768-4096, multi-MB plans). Hash
    partial aggregation (map-side combine) caps the shuffle at
    k*dim rows per map task regardless of corpus size.

    `assigned` must already project (cluster, vec): the cluster
    expression lives in the projection BELOW the Generate node, so it is
    evaluated once per row, not once per exploded element."""
    return (
        assigned.select("cluster", F.posexplode("vec").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
    )


def lloyd_fit(
    corpus_df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iterations: int,
) -> list[list[float]]:
    """Distributed spherical-ish k-means: deterministic seeds (smallest
    murmur3(id) — pseudo-random but reproducible across runs, engines,
    and partitionings), refined by ``iterations`` Lloyd steps. Each step
    is one aggregate job (assign via argmax cosine against the single
    nested-array centroid literal — shuffle-free; new centroid =
    per-cluster element-wise mean via cluster_sums_frame); only k x dim
    (cluster, pos, sum, n) cells ever reach the driver. Empty clusters
    keep their previous centroid."""
    validate_columns(corpus_df, [vec_col, id_col])
    seeds = (
        corpus_df.select(
            F.col(vec_col).alias("vec"),
            F.hash(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r["vec"]] for r in seeds]
    ensure(len(centroids) >= 2, "corpus has fewer rows than 2 seeds")
    dim = len(centroids[0])
    prev: list[list[float]] | None = None
    for _ in range(iterations):
        if prev == centroids:
            # exact fixed point: identical centroids reproduce identical
            # assignments, cells and means bit-for-bit, so every
            # remaining iteration would be one full no-op aggregate job.
            # `iterations` becomes an upper bound; results are unchanged.
            break
        prev = centroids
        # NULL vectors carry no position cells and must not participate;
        # the mean divisor is PER CELL (cluster, pos) so ragged vectors
        # (longer or shorter than the seed dim) cannot skew other
        # positions, and positions beyond the seed dim are ignored.
        assigned = corpus_df.where(F.col(vec_col).isNotNull()).select(
            F.element_at(
                nearest_centroids_expr(F.col(vec_col), centroids, 1), 1
            ).alias("cluster"),
            F.col(vec_col).alias("vec"),
        )
        cells = cluster_sums_frame(assigned).collect()
        sums: dict[int, list[float]] = {}
        ns: dict[int, list[int]] = {}
        for r in cells:
            if r["pos"] >= dim:
                continue
            sums.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = r["s"]
            ns.setdefault(r["cluster"], [0] * dim)[r["pos"]] = r["n"]
        new = {
            c: [s / n if n else 0.0 for s, n in zip(v, ns[c])]
            for c, v in sums.items()
        }
        centroids = [new.get(ci, centroids[ci]) for ci in range(len(centroids))]
    return centroids


class CosineTopK(Transformer):
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors by cosine similarity.

    ``transform(corpus_df)`` uses the fitted query frame;
    ``search(corpus_df, query_df)`` is the explicit form. Output:
    (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken by
    neighbor id ascending (deterministic). Self-matches excluded when ids
    collide.

    The plan is a broadcast nested-loop producing |corpus| x |queries|
    rows — intended for a SMALL probe set over an arbitrarily large
    corpus. ``max_queries`` (default 1000) is enforced with a cheap
    limit+count probe before the join, so two 100 TB frames can't be
    silently cross-joined; raise it deliberately if you mean it."""

    def __init__(
        self, vec_col: str, id_col: str, k: int = 10, max_queries: int = 1000
    ):
        ensure(k >= 1, "k must be >= 1")
        ensure(max_queries >= 1, "max_queries must be >= 1")
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k
        self.max_queries = max_queries
        self.query_df: DataFrame | None = None

    def is_stateful(self) -> bool:
        return True

    def _frame_state_attrs(self) -> list[str]:
        # the fitted state IS the query frame: declared so save_state
        # persists it to parquet instead of silently dropping it (the
        # restored instance would otherwise crash at transform)
        return ["query_df"]

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col, self.id_col])

    def _fit(self, df: DataFrame) -> None:
        # "fit" pins the query set: the fitted state is the (small) query
        # frame itself, broadcast at search time.
        self.query_df = df

    def _guard_query_side(self, query_df: DataFrame) -> None:
        # limit(n+1).count() touches at most max_queries+1 rows — O(cap),
        # not O(|query_df|) — before the broadcast NLJ is committed to
        n = query_df.limit(self.max_queries + 1).count()
        ensure(
            n <= self.max_queries,
            f"query side has >{self.max_queries} rows; exact CosineTopK "
            "broadcasts the query set and scores |corpus| x |queries| pairs. "
            "Use IVFCosineTopK/BucketedCosineTopK for large probe sets, or "
            "raise max_queries explicitly.",
        )

    def search(self, corpus_df: DataFrame, query_df: DataFrame) -> DataFrame:
        validate_columns(corpus_df, [self.vec_col, self.id_col])
        validate_columns(query_df, [self.vec_col, self.id_col])
        self._guard_query_side(query_df)
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
            # degenerate vectors score NULL cosine (see cosine_expr) and
            # are excluded from the ranking rather than surfacing with a
            # fabricated similarity
            scored.where(F.col("cosine").isNotNull())
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= self.k)
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.search(df, self.query_df)


class IVFCosineTopK(CosineTopK):
    """Approximate cosine top-k via an IVF (inverted-file) index.

    fit(corpus): pick ``n_centroids`` deterministic seed vectors (smallest
    murmur3(id) — pseudo-random but reproducible), then refine them with
    ``iterations`` distributed Lloyd steps (assign via argmax cosine, new
    centroid = per-cluster mean; one shuffle per iteration, centroids
    collected to the driver — k x dim floats, tiny).

    search(): corpus rows are assigned to their nearest centroid; each
    query probes only the ``n_probe`` clusters whose centroids are
    nearest to it, and exact cosine re-ranks the candidates. At cluster
    scale the assigned corpus is written partitioned by cluster id, so a
    probe is a pruned scan of n_probe/k of the data instead of a full
    pass."""

    def __init__(
        self,
        vec_col: str,
        id_col: str,
        k: int = 10,
        n_centroids: int = 16,
        n_probe: int = 4,
        iterations: int = 2,
        max_queries: int = 100_000,
    ):
        # the probe side is still broadcast (n_probe rows per query), but
        # cluster pruning makes large probe sets viable — the cap is 100x
        # the exact path's (100k x 64 floats ~ 50 MB broadcast)
        super().__init__(vec_col, id_col, k, max_queries=max_queries)
        ensure(n_centroids >= 2, "n_centroids must be >= 2")
        ensure(1 <= n_probe <= n_centroids, "n_probe in [1, n_centroids]")
        self.n_centroids = n_centroids
        self.n_probe = n_probe
        self.iterations = iterations
        self.centroids_: list[list[float]] = []

    def _nearest_expr(self, vec: Column, n: int = 1) -> Column:
        return nearest_centroids_expr(vec, self.centroids_, n)

    def _fit(self, df: DataFrame) -> None:
        super()._fit(df)

    def fit_index(self, corpus_df: DataFrame) -> "IVFCosineTopK":
        """Learn centroids from the corpus (separate from fit(), which
        pins the query set)."""
        self.centroids_ = lloyd_fit(
            corpus_df, self.vec_col, self.id_col, self.n_centroids, self.iterations
        )
        return self

    def search(self, corpus_df: DataFrame, query_df: DataFrame) -> DataFrame:
        self._guard_query_side(query_df)
        if not self.centroids_:
            self.fit_index(corpus_df)
        return self._search_assigned(self._assign(corpus_df), query_df)

    def _assign(self, corpus_df: DataFrame) -> DataFrame:
        """(neighbor_id, c_vec, cluster) — each corpus row labeled with
        its nearest centroid."""
        return corpus_df.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col).alias("c_vec"),
            F.element_at(self._nearest_expr(F.col(self.vec_col), 1), 1).alias(
                "cluster"
            ),
        )

    def write_index(
        self,
        corpus_df: DataFrame,
        path: str,
        mode: str = "error",
        quantize: bool | str = False,
        pq=None,
    ) -> None:
        """Materialize the IVF index at ``path``: the assigned corpus
        written PARTITIONED BY cluster id (``<path>/corpus``) plus the
        centroid table (``<path>/centroids``, one row per centroid).

        This is the 100 TB shape the class docstring promises: once the
        corpus is laid out by cluster, a probe reads only the n_probe
        partitions each query maps to — a pruned scan of ~n_probe/k of
        the data — instead of re-assigning the full corpus per search.
        Fits centroids first if ``fit_index`` was not called.

        ``mode='append'`` is the recrawl path: new vectors are assigned
        to the EXISTING centroids loaded from the index (a narrow
        projection against the centroid literal — no refit, no shuffle)
        and appended into the cluster partition dirs, so a probe after N
        appends is still one pruned scan of the union corpus. The
        centroid table is left untouched (re-fitting it would silently
        re-shuffle the meaning of every already-written partition), the
        ``versions`` log gains an ``append`` row (the
        :func:`~.dedup.compact_index` scheduling signal), and the
        append must match the index's stored vector layout
        (quantized vs raw) — a mixed-layout corpus dir would break the
        read path's layout detection.

        ``quantize=True`` stores int8 codes + a per-vector scale
        (:class:`~.embeddings.EmbeddingQuantizer`) instead of the raw
        doubles — ~4-8x less index IO; ``search_index`` detects the
        layout and dequantizes inside the pruned scan, ranking by
        cosine over the reconstructed vectors (approximation bounded by
        scale/2 per element).

        ``quantize='pq'`` (r11) stores PRODUCT-quantized codes
        (:class:`~.embeddings.ProductQuantizer`, m tinyints per
        vector — 64x less vector IO at dim=64/m=8, the billion-vector
        index layout) plus the model-sized codebook table at
        ``<path>/pq``; ``search_index`` reconstructs each candidate
        from its subspace centroids inside the pruned scan. Pass a
        (fitted or unfitted) ``pq=`` instance to control m/k; by
        default an m=8, k=16 quantizer is fitted on the assigned
        corpus. Appends encode against the STORED codebooks (frozen,
        like the centroids) so the layout stays consistent."""
        import os

        from .dedup import _log_index_version

        ensure(
            quantize in (False, True, "pq"),
            "quantize: False (raw), True (int8), or 'pq'",
        )
        spark = corpus_df.sparkSession
        if mode == "append":
            self._load_centroids(spark, path)
            cols = spark.read.parquet(
                os.path.join(path, "corpus")
            ).columns
            stored_q: bool | str = (
                "pq" if "c_pq" in cols else "c_q8" in cols
            )
            ensure(
                quantize == stored_q,
                f"index at '{path}' stores layout {stored_q!r} but "
                f"this append has quantize={quantize!r}; a mixed-"
                "layout corpus dir would break reconstruction on read "
                f"— pass quantize={stored_q!r}",
            )
        elif not self.centroids_:
            self.fit_index(corpus_df)
        assigned = self._assign(corpus_df)
        if quantize == "pq":
            if mode == "append":
                pq = self._load_pq(spark, path)
            else:
                if pq is None:
                    from .embeddings import ProductQuantizer

                    dim = len(self.centroids_[0])
                    ensure(
                        dim % 8 == 0,
                        f"dim {dim} is not divisible by the default "
                        "m=8 — pass pq=ProductQuantizer(...) with an "
                        "m that divides it",
                    )
                    pq = ProductQuantizer("c_vec", dim=dim, m=8, k=16)
                if pq.codebooks_ is None:
                    pq.fit(
                        assigned.select(
                            F.col("c_vec").alias(pq.vec_col)
                        )
                    )
            assigned = assigned.withColumn(
                "c_pq", pq.codes_expr(F.col("c_vec"))
            ).drop("c_vec")
        elif quantize:
            assigned = _quantize_vec_col(assigned, "c_vec")
        assigned.write.mode(mode).partitionBy("cluster").parquet(
            os.path.join(path, "corpus")
        )
        if mode != "append":
            centroids = one_slice_frame(
                spark,
                [(i, list(v)) for i, v in enumerate(self.centroids_)],
                "cluster int, centroid array<double>",
            )
            centroids.write.mode(mode).parquet(
                os.path.join(path, "centroids")
            )
            if quantize == "pq":
                _write_pq_books(spark, path, pq, mode)
        _log_index_version(
            spark, path, "append" if mode == "append" else "write"
        )

    def _load_pq(self, spark, path: str):
        """Rebuild a ProductQuantizer from the index's stored codebook
        table (model-sized: m x k rows)."""
        return _load_pq_model(spark, path)

    def rebuild_index(
        self,
        spark,
        src_path: str,
        dest_path: str,
        quantize: bool | str | None = None,
        pq=None,
    ) -> None:
        """Full centroid refresh for an append-accumulated index — the
        remedy when :func:`recall_at_k` shows drift after many
        ``mode='append'`` recrawls (appends assign against FROZEN
        centroids, so a corpus whose distribution moved away from the
        original fit degrades probe recall). Reads the stored corpus
        (dequantizing if needed), refits centroids with this
        instance's ``n_centroids``/``iterations`` Lloyd recipe, and
        writes a NEW index at ``dest_path`` — side-write like
        :func:`~.dedup.compact_index`, never in place; validate, then
        repoint the recrawl loop. ``quantize=None`` preserves the
        source layout (raw / int8 / pq — a pq rebuild also refits the
        codebooks on the reconstructed corpus, REUSING the source
        index's m/k so the rebuild never silently changes the
        quantization geometry; pass ``pq=`` to override it)."""
        import os

        stored = spark.read.parquet(os.path.join(src_path, "corpus"))
        if "c_pq" in stored.columns:
            src_pq = self._load_pq(spark, src_path)
            src = stored.withColumn(
                "c_vec", src_pq.decode_expr(F.col("c_pq"))
            ).drop("c_pq")
            if pq is None:
                # fresh UNFITTED quantizer with the source layout —
                # write_index refits its codebooks on the rebuilt
                # corpus but keeps the same m/k (an index written at
                # m=16/k=64 must not come back as the default m=8/k=16)
                from .embeddings import ProductQuantizer

                pq = ProductQuantizer(
                    "c_vec", dim=src_pq.dim, m=src_pq.m, k=src_pq.k
                )
            stored_layout: bool | str = "pq"
        else:
            src = _dequantize_if_needed(stored)
            stored_layout = "c_q8" in stored.columns
        if quantize is None:
            quantize = stored_layout
        corpus = src.select(
            F.col("neighbor_id").alias(self.id_col),
            F.col("c_vec").alias(self.vec_col),
        )
        self.centroids_ = []  # force a fresh Lloyd fit in write_index
        self.write_index(corpus, dest_path, quantize=quantize, pq=pq)

    def _load_centroids(self, spark, path: str) -> None:
        """Pin this instance's centroids to the index's stored table —
        the append/probe contract: the partition layout on disk was
        produced by THOSE centroids, so any in-memory fit is discarded
        in their favor."""
        import os

        from pyspark.errors import AnalysisException

        try:
            rows = (
                spark.read.parquet(os.path.join(path, "centroids"))
                .orderBy("cluster")
                .collect()
            )
        except AnalysisException as e:
            # Only the MISSING-PATH case means "index not written
            # yet"; a transient storage error or corrupt footer must
            # propagate with its real cause instead of being
            # misdiagnosed as "write the index first" (same narrowing
            # as dedup._log_index_version).
            msg = str(e)
            if not ("PATH_NOT_FOUND" in msg
                    or "Path does not exist" in msg):
                raise
            rows = []  # missing path — same remedy as an empty table
        ensure(
            bool(rows),
            f"no centroids found at {path} — write the index with "
            "mode='error'/'overwrite' before appending to it",
        )
        self.centroids_ = [list(r["centroid"]) for r in rows]

    def search_index(
        self,
        spark,
        path: str,
        query_df: DataFrame,
        adc: bool = True,
    ) -> DataFrame:
        """Probe an index written by ``write_index``. Loads centroids
        (k x dim — tiny), then joins the broadcast probe set against the
        cluster-partitioned corpus: Spark's dynamic partition pruning
        limits the scan to the clusters the queries actually probe.

        On a PQ-layout index the probe defaults to ASYMMETRIC DISTANCE
        (Jégou 2011): each query row computes an m x k partial-dot
        lookup table once, and every candidate scores its cosine in
        O(m) table lookups against its stored codes — ~dim/m x less
        arithmetic per candidate than ``adc=False``, which
        reconstructs each candidate via ``decode_expr`` and runs the
        full O(dim) dot. Both rank the same reconstructed vectors
        (identical up to float association), so recall is unchanged —
        ``adc=False`` exists as the parity/debug path."""
        import os

        self._load_centroids(spark, path)
        # deliberately NOT marking fitted: no query frame was pinned, so
        # a later transform() must still raise FitNotCalledError instead
        # of crashing on query_df=None inside the plan builder
        corpus = spark.read.parquet(os.path.join(path, "corpus"))
        if "c_pq" in corpus.columns:
            pq = self._load_pq(spark, path)
            self._guard_query_side(query_df)
            if adc:
                return self._search_assigned_pq(corpus, query_df, pq)
            c = corpus.withColumn(
                "c_vec", pq.decode_expr(F.col("c_pq"))
            ).drop("c_pq")
        else:
            c = _dequantize_if_needed(corpus)
            self._guard_query_side(query_df)
        return self._search_assigned(c, query_df)

    def _search_assigned_pq(
        self, corpus: DataFrame, query_df: DataFrame, pq
    ) -> DataFrame:
        """ADC probe plan: identical join/prune/rank shape to
        :func:`_search_assigned`, but candidates stay as m tinyint
        codes — cosine = lut-dot / (|q| x recon-norm), all O(m) per
        candidate (the per-query O(k x dim) LUT and the query norm are
        computed in the broadcast projection, once per query row)."""
        q = query_df.select(
            F.col(self.id_col).alias("query_id"),
            pq.adc_lut_expr(F.col(self.vec_col)).alias("q_lut"),
            norm_expr(F.col(self.vec_col)).alias("q_norm"),
            F.explode(
                self._nearest_expr(F.col(self.vec_col), self.n_probe)
            ).alias("cluster"),
        )
        cand = corpus.join(F.broadcast(q), on="cluster").where(
            F.col("query_id") != F.col("neighbor_id")
        )
        codes = F.col("c_pq")
        scored = cand.select(
            "query_id",
            "neighbor_id",
            # try_divide mirrors cosine_expr: zero-norm / NULL inputs
            # yield NULL, excluded from the ranking below
            F.try_divide(
                pq.adc_dot_expr(codes, F.col("q_lut")),
                F.col("q_norm") * pq.adc_norm_expr(codes),
            ).alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            scored.where(F.col("cosine").isNotNull())
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= self.k)
        )

    def _search_assigned(self, c: DataFrame, query_df: DataFrame) -> DataFrame:
        q = query_df.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).alias("q_vec"),
            F.explode(
                self._nearest_expr(F.col(self.vec_col), self.n_probe)
            ).alias("cluster"),
        )
        cand = c.join(F.broadcast(q), on="cluster").where(
            F.col("query_id") != F.col("neighbor_id")
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
            # degenerate vectors score NULL cosine (see cosine_expr) and
            # are excluded from the ranking rather than surfacing with a
            # fabricated similarity
            scored.where(F.col("cosine").isNotNull())
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= self.k)
        )


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
        max_queries: int = 100_000,
    ):
        super().__init__(vec_col, id_col, k, max_queries=max_queries)
        ensure(dim is not None, "dim is required for LSH bucketing")
        ensure(n_planes % n_chunks == 0, "n_planes must divide into n_chunks")
        self.dim = dim
        self.n_planes = n_planes
        self.n_chunks = n_chunks
        self.seed = seed

    def _sig_expr(self, vec: Column) -> Column:
        return hyperplane_sig_expr(
            vec, _hyperplanes(self.n_planes, self.dim, self.seed)
        )

    def _chunks_from_sig(self, sig: Column) -> Column:
        width = self.n_planes // self.n_chunks
        return F.array(*[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftrightunsigned(sig.cast("bigint"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("cv"),
            )
            for i in range(self.n_chunks)
        ])

    def _chunks_expr(self, vec: Column) -> Column:
        return self._chunks_from_sig(self._sig_expr(vec))

    def _chunked(
        self,
        df: DataFrame,
        id_alias: str,
        vec_alias: str,
        quantize: bool = False,
        pq=None,
    ) -> DataFrame:
        # materialize the signature in its own projection so the chunk
        # extractors reference ONE sig computation instead of inlining
        # the hyperplane fold n_chunks times; quantization likewise runs
        # BEFORE the chunk explode, once per vector instead of once per
        # (ci, cv) replica
        base = df.select(
            F.col(self.id_col).alias(id_alias),
            F.col(self.vec_col).alias(vec_alias),
            self._sig_expr(F.col(self.vec_col)).alias("__sig"),
        )
        if pq is not None:
            base = base.withColumn(
                "c_pq", pq.codes_expr(F.col(vec_alias))
            ).drop(vec_alias)
        elif quantize:
            base = _quantize_vec_col(base, vec_alias)
        payload = [c for c in base.columns if c != "__sig"]
        return (
            base.select(
                *payload,
                F.explode(self._chunks_from_sig(F.col("__sig"))).alias("ch"),
            )
            .select(*payload, "ch.ci", "ch.cv")
        )

    def search(self, corpus_df: DataFrame, query_df: DataFrame) -> DataFrame:
        validate_columns(corpus_df, [self.vec_col, self.id_col])
        validate_columns(query_df, [self.vec_col, self.id_col])
        self._guard_query_side(query_df)
        return self._search_chunked(
            self._chunked(corpus_df, "neighbor_id", "c_vec"), query_df
        )

    def write_index(
        self,
        corpus_df: DataFrame,
        path: str,
        mode: str = "error",
        quantize: bool | str = False,
        pq=None,
    ) -> None:
        """Materialize the LSH index at ``path``: the chunked corpus
        signature frame written PARTITIONED BY (ci, cv) plus the LSH
        parameters (``<path>/meta``). A probe then reads only the chunk
        partitions the queries hash into (dynamic partition pruning) —
        the 'bucketed-by-chunk pruned scan' the class docstring
        promises, without recomputing corpus signatures per search.
        ``quantize=True`` stores int8 codes + a per-vector scale,
        ``quantize='pq'`` (r12) stores product-quantized codes + the
        model-sized codebook table at ``<path>/pq`` — the same layouts
        and tradeoffs as :meth:`IVFCosineTopK.write_index` (pass a
        ``pq=`` instance to control m/k; appends encode against the
        STORED codebooks; a PQ probe scores by asymmetric distance).

        ``mode='append'`` is the recrawl path: the stored LSH
        parameters are validated against this instance first (hashing
        a new batch with a different seed/plane count would scatter it
        into buckets the probe never reads), the new batch's signature
        chunks are appended into the (ci, cv) partition dirs, and the
        ``versions`` log gains an ``append`` row. Because signatures
        are a pure deterministic function of (vector, parameters),
        append + probe is EXACTLY equal to a full rebuild over the
        union corpus — no approximation drift, unlike IVF where the
        centroids are frozen at first write (the PQ codebooks are the
        one frozen piece of a PQ-layout LSH index)."""
        import os

        from .dedup import _log_index_version

        ensure(
            quantize in (False, True, "pq"),
            "quantize: False (raw), True (int8), or 'pq'",
        )
        spark = corpus_df.sparkSession
        if mode == "append":
            self._check_stored_params(spark, path)
            cols = spark.read.parquet(
                os.path.join(path, "corpus")
            ).columns
            stored_q: bool | str = (
                "pq" if "c_pq" in cols else "c_q8" in cols
            )
            ensure(
                quantize == stored_q,
                f"index at '{path}' stores layout {stored_q!r} but "
                f"this append has quantize={quantize!r}; pass "
                f"quantize={stored_q!r}",
            )
        width = self.n_planes // self.n_chunks
        ensure(
            width <= 10,
            f"chunk width {width} bits would create "
            f"{self.n_chunks} x 2^{width} partition values; lower "
            "n_planes (or raise n_chunks) before writing an index",
        )
        if quantize == "pq":
            if mode == "append":
                pq = _load_pq_model(spark, path)
            else:
                if pq is None:
                    from .embeddings import ProductQuantizer

                    ensure(
                        self.dim % 8 == 0,
                        f"dim {self.dim} is not divisible by the "
                        "default m=8 — pass pq=ProductQuantizer(...) "
                        "with an m that divides it",
                    )
                    pq = ProductQuantizer(
                        "c_vec", dim=self.dim, m=8, k=16
                    )
                if pq.codebooks_ is None:
                    pq.fit(
                        corpus_df.select(
                            F.col(self.vec_col).alias(pq.vec_col)
                        )
                    )
        else:
            pq = None
        self._chunked(
            corpus_df, "neighbor_id", "c_vec",
            quantize=quantize is True, pq=pq,
        ).write.mode(
            mode
        ).partitionBy("ci", "cv").parquet(os.path.join(path, "corpus"))
        if mode != "append":
            meta = one_slice_frame(
                spark,
                [(self.dim, self.n_planes, self.n_chunks, self.seed)],
                "dim int, n_planes int, n_chunks int, seed int",
            )
            meta.write.mode(mode).parquet(os.path.join(path, "meta"))
            if pq is not None:
                _write_pq_books(spark, path, pq, mode)
        _log_index_version(
            spark, path, "append" if mode == "append" else "write"
        )

    def _check_stored_params(self, spark, path: str) -> None:
        """Fail-loud LSH parameter pinning shared by append and probe."""
        import os

        from pyspark.errors import AnalysisException

        try:
            rows = spark.read.parquet(os.path.join(path, "meta")).collect()
        except AnalysisException as e:
            # Only the MISSING-PATH case means "index not written
            # yet"; a corrupt meta footer or transient storage error
            # must propagate with its real cause — the "re-run
            # write_index" remedy below would be WRONG advice for it
            # (same narrowing as _load_centroids above).
            msg = str(e)
            if not ("PATH_NOT_FOUND" in msg
                    or "Path does not exist" in msg):
                raise
            rows = []  # missing path — same remedy as an empty table
        ensure(
            bool(rows),
            f"no LSH meta found at '{path}' — the index is empty or "
            "partially written; re-run write_index",
        )
        m = rows[0]
        stored = (m["dim"], m["n_planes"], m["n_chunks"], m["seed"])
        mine = (self.dim, self.n_planes, self.n_chunks, self.seed)
        ensure(
            stored == mine,
            f"index at '{path}' was written with LSH parameters "
            f"(dim, n_planes, n_chunks, seed)={stored}, this instance "
            f"has {mine} — queries would hash into the wrong buckets",
        )

    def search_index(
        self,
        spark,
        path: str,
        query_df: DataFrame,
        adc: bool = True,
    ) -> DataFrame:
        """Probe an index written by ``write_index``. Validates the
        stored LSH parameters match this instance (a mismatched seed or
        plane count would silently hash queries into the wrong buckets),
        then probes the chunk-partitioned corpus. A PQ-layout index
        defaults to asymmetric-distance scoring (``adc=False`` keeps
        the decode-reconstruct parity path) — the same contract as
        :meth:`IVFCosineTopK.search_index`."""
        import os

        self._check_stored_params(spark, path)
        corpus = spark.read.parquet(os.path.join(path, "corpus"))
        self._guard_query_side(query_df)
        if "c_pq" in corpus.columns:
            pq = _load_pq_model(spark, path)
            if adc:
                return self._search_chunked_pq(corpus, query_df, pq)
            c = corpus.withColumn(
                "c_vec", pq.decode_expr(F.col("c_pq"))
            ).drop("c_pq")
        else:
            c = _dequantize_if_needed(corpus)
        return self._search_chunked(c, query_df)

    def _search_chunked_pq(
        self, corpus: DataFrame, query_df: DataFrame, pq
    ) -> DataFrame:
        """ADC probe over the chunk-partitioned PQ corpus: identical
        join/dedup/rank shape to :func:`_search_chunked`, candidates
        stay as m tinyint codes (per-query LUT + query norm computed
        once in the broadcast projection)."""
        base = query_df.select(
            F.col(self.id_col).alias("query_id"),
            pq.adc_lut_expr(F.col(self.vec_col)).alias("q_lut"),
            norm_expr(F.col(self.vec_col)).alias("q_norm"),
            self._sig_expr(F.col(self.vec_col)).alias("__sig"),
        )
        q = base.select(
            "query_id", "q_lut", "q_norm",
            F.explode(self._chunks_from_sig(F.col("__sig"))).alias("ch"),
        ).select("query_id", "q_lut", "q_norm", "ch.ci", "ch.cv")
        cand = (
            corpus.join(F.broadcast(q), on=["ci", "cv"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        codes = F.col("c_pq")
        scored = cand.select(
            "query_id",
            "neighbor_id",
            F.try_divide(
                pq.adc_dot_expr(codes, F.col("q_lut")),
                F.col("q_norm") * pq.adc_norm_expr(codes),
            ).alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            scored.where(F.col("cosine").isNotNull())
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= self.k)
        )

    def _search_chunked(self, c: DataFrame, query_df: DataFrame) -> DataFrame:
        q = self._chunked(query_df, "query_id", "q_vec")
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
            # degenerate vectors score NULL cosine (see cosine_expr) and
            # are excluded from the ranking rather than surfacing with a
            # fabricated similarity
            scored.where(F.col("cosine").isNotNull())
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= self.k)
        )


class KMeansClusterer(Transformer):
    """Document clustering over an embedding column: ``fit`` learns ``k``
    centroids (deterministic seeds + distributed Lloyd refinement, see
    :func:`lloyd_fit`), ``transform`` appends a ``cluster`` id column
    (0..k-1, nearest centroid by cosine).

    This is the topic-bucketing primitive of a training-data pipeline:
    cluster ids feed source-mixing (WeightedSampler on the cluster
    column), per-topic dedup, and stratified eval splits. It is also the
    IVF index's coarse quantizer exposed standalone.

    Scale shape: fit runs ``iterations`` aggregate jobs (k x dim floats
    to the driver — tiny); transform is a stateless projection against a
    centroid literal — no shuffle, no UDF, embarrassingly parallel.
    """

    def __init__(
        self,
        vec_col: str,
        id_col: str,
        k: int = 8,
        iterations: int = 2,
        out_col: str = "cluster",
    ):
        ensure(k >= 2, "k must be >= 2")
        ensure(iterations >= 0, "iterations must be >= 0")
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k
        self.iterations = iterations
        self.out_col = out_col
        self.centroids_: list[list[float]] = []

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col, self.id_col])

    def _fit(self, df: DataFrame) -> None:
        self.centroids_ = lloyd_fit(
            df, self.vec_col, self.id_col, self.k, self.iterations
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.select(
            "*",
            F.element_at(
                nearest_centroids_expr(F.col(self.vec_col), self.centroids_, 1), 1
            ).alias(self.out_col),
        )


class SemanticDeduplicator(Transformer):
    """SemDeDup-style semantic near-dup removal (Abbas et al. 2023,
    'SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication' — public paper): cluster the embedding space with
    k-means, then find cosine-threshold near-dup pairs WITHIN each
    cluster only, never across the whole corpus.

    Composition of two existing primitives, packaged as one operator:
    :class:`KMeansClusterer` (the coarse quantizer; ``fit`` learns the
    centroids) and the hyperplane-LSH blocking of
    :class:`~.dedup.EmbeddingDeduplicator`. Candidates must share BOTH
    the cluster id and an LSH signature half, so the pair join is
    bucketed twice: cluster membership bounds the candidate space to
    ~|corpus|/k per cluster (the paper's semantics), and the LSH chunk
    keeps even a giant cluster from going all-pairs. Exact cosine
    verifies every candidate; ``transform`` drops by the shared policy
    ('greedy' = larger id of each pair, 'components' = connected
    components keep-smallest).

    Scale shape: fit = ``iterations`` aggregate jobs (k x dim floats to
    the driver); pair generation = one narrow projection (cluster id +
    signature are centroid/hyperplane literals — no UDF, no shuffle) +
    one self-join on (cluster, chunk id, chunk value) + exact-cosine
    filter. No all-pairs term anywhere.
    """

    def __init__(
        self,
        vec_col: str,
        id_col: str,
        threshold: float = 0.95,
        k: int = 8,
        iterations: int = 2,
        dim: int | None = None,
        n_planes: int = 16,
        seed: int = 42,
        policy: str = "greedy",
    ):
        ensure(-1.0 <= threshold <= 1.0, "threshold must be in [-1,1]")
        ensure(dim is not None, "dim is required (hyperplane literals)")
        ensure(n_planes % 2 == 0, "n_planes must be even")
        self.vec_col = vec_col
        self.id_col = id_col
        self.threshold = threshold
        self.k = k
        self.iterations = iterations
        self.dim = dim
        self.n_planes = n_planes
        self.seed = seed
        self.policy = policy
        self.centroids_: list[list[float]] = []
        self.clusterer = KMeansClusterer(
            vec_col, id_col, k=k, iterations=iterations, out_col="__ff_sem_c"
        )

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col, self.id_col])

    def _fit(self, df: DataFrame) -> None:
        self.clusterer.fit(df)
        self.centroids_ = self.clusterer.centroids_

    def candidate_pairs(self, df: DataFrame) -> DataFrame:
        """Verified within-cluster pairs (a_id, b_id, cluster, cosine),
        a_id < b_id."""
        self._check_input(df)
        # restore the composed clusterer on a load_state()d instance
        # (scalar centroid lists round-trip through JSON)
        self.clusterer.centroids_ = self.centroids_
        self.clusterer._fitted = True
        planes = _hyperplanes(self.n_planes, self.dim, self.seed)
        half = self.n_planes // 2
        base = self.clusterer.transform(df).select(
            F.col(self.id_col).alias("id"),
            F.col(self.vec_col).alias("vec"),
            F.col("__ff_sem_c").alias("c"),
            hyperplane_sig_expr(F.col(self.vec_col), planes).alias("sig"),
        )
        chunks = base.select(
            "id", "vec", "c",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).alias("ci"),
                        F.col("sig").bitwiseAND(F.lit((1 << half) - 1)).alias("cv"),
                    ),
                    F.struct(
                        F.lit(1).alias("ci"),
                        F.shiftrightunsigned(
                            F.col("sig").cast("bigint"), half
                        ).alias("cv"),
                    ),
                )
            ).alias("ch"),
        ).select("id", "vec", "c", "ch.ci", "ch.cv")
        a, b = chunks.alias("a"), chunks.alias("b")
        cand = (
            a.join(
                b,
                on=[
                    F.col("a.c") == F.col("b.c"),
                    F.col("a.ci") == F.col("b.ci"),
                    F.col("a.cv") == F.col("b.cv"),
                    F.col("a.id") < F.col("b.id"),
                ],
            )
            .select(
                F.col("a.id").alias("a_id"),
                F.col("a.vec").alias("a_vec"),
                F.col("b.id").alias("b_id"),
                F.col("b.vec").alias("b_vec"),
                F.col("a.c").alias("cluster"),
            )
            .distinct()
        )
        return cand.select(
            "a_id",
            "b_id",
            "cluster",
            cosine_expr(F.col("a_vec"), F.col("b_vec")).alias("cosine"),
        ).where(F.col("cosine") >= F.lit(self.threshold))

    def _transform(self, df: DataFrame) -> DataFrame:
        from .dedup import _drop_by_policy

        return _drop_by_policy(
            df, self.id_col, self.candidate_pairs(df), self.policy
        )


def recall_at_k(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Recall@k audit for the ANN tiers: given the EXACT top-k frame
    (:class:`CosineTopK` output) and an approximate one
    (:class:`IVFCosineTopK` / :class:`BucketedCosineTopK`, same
    (query_id, neighbor_id, ...) shape), return per-query
    ``(query_id, n_exact, n_hit, recall)`` — the number a tuned index
    trades against probe cost. One left join on
    (query_id, neighbor_id) + one groupBy(query_id) — both frames are
    k x |queries| sized, never corpus-sized, so the audit is free at
    any corpus scale.

    Macro recall = ``result.agg(avg('recall'))``. Ranking order is
    deliberately ignored (set recall, the standard ANN metric). Both
    sides are deduplicated on (query_id, neighbor_id) first — the
    tiers emit unique pairs, but an arbitrary caller frame with
    duplicates would otherwise fan the join out and inflate both
    n_exact and n_hit."""
    for frame, name in ((exact, "exact"), (approx, "approx")):
        validate_columns(frame, ["query_id", "neighbor_id"])
    e = exact.select("query_id", "neighbor_id").dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    a = approx.select("query_id", "neighbor_id").dropDuplicates(
        ["query_id", "neighbor_id"]
    ).withColumn("__ff_hit", F.lit(1))
    joined = e.join(a, ["query_id", "neighbor_id"], "left")
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.coalesce(F.col("__ff_hit"), F.lit(0))).alias("n_hit"),
        (
            F.sum(F.coalesce(F.col("__ff_hit"), F.lit(0)))
            / F.count(F.lit(1))
        ).alias("recall"),
    )
