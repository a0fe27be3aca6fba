"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship pipeline on sf0.001; `queries()` exposes
one named query per implemented operator (SURVEY.md §2.2 plus the
LLM-data-pipeline extensions); `oracle_sql()` gives each query's DuckDB
twin over the same parquet tables.

Cross-engine determinism rules used throughout (verified empirically:
Spark 4.1 vs DuckDB 1.0 on this data):
- exact `percentile` == `quantile_cont` bit-for-bit;
- md5 / regexp / string functions identical;
- per-row double arithmetic (ln/pow/asin/...) identical IEEE;
- aggregate-order-dependent doubles (avg, corr, sums of products) can
  drift in the last ulp -> every learned-scalar-dependent or
  reduction-dependent double output is rounded on BOTH sides with the
  SAME arithmetic: floor(x*1e6 + 0.5)/1e6 (engine round() functions
  disagree on double ties, so we never use them);
- interval labels use the reference's "[%.2f, %.2f)" contract via
  floor(x*100 + 0.5) integer math on both sides
  (functions/expressions.format_2dp).

Feature-selection queries return the operator's fitted STATISTICS
(feature, metric, decision) rather than the projected frame: the metrics
are computed by distributed Spark jobs at fit time, and the SQL twin
recomputes them independently in DuckDB — a stronger check than
comparing projections whose column set the SQL would have to hardcode.
Greedy set-selection loops (MRMR redundancy pass, correlated-group
elimination) are sequential and not expressible in one SQL statement;
they are covered by unit tests (tests/test_feature_selection.py) and the
queries verify the statistics those loops consume.

Registry shape: the driver's correctness artifact records only the
FIRST 50 registered queries, so per-operator projections are collapsed
into FAMILY queries whose result unions the members' frames under an
`op` discriminator column (one value-hash pins every member operator).
`_FAMILY_DOC` holds the family -> member-op mapping at runtime.

Operator -> query coverage (SURVEY.md §2.2 numbering; `family:op` means
the op is a member slice of that family query):
  #1 MeanMedianImputer        impute_numeric:{mean,median}_impute
  #2 ArbitraryNumberImputer   impute_numeric:arbitrary_impute
  #3 EndTailImputer           impute_numeric:endtail_impute
  #4 CategoricalImputer       impute_other:categorical_impute
  #5 AddMissingIndicator      impute_other:missing_indicator
  #6 DropMissingData          impute_other:drop_missing
  #7 OneHotEncoder            encode_label:onehot_encode
  #8 CountFrequencyEncoder    encode_count_ordinal:count_encode{,_unseen}
  #9 OrdinalEncoder           encode_count_ordinal:ordinal_encode
  #10 MeanEncoder             encode_target:mean_encode
  #11 WoEEncoder              encode_target:woe_encode
  #12 RareLabelEncoder        encode_label:rare_label
  #13-16 discretizers         discretize_family:{arbitrary,
                              equal_frequency,equal_width,geometric}
  #17 ArbitraryOutlierCapper  outlier_family:arbitrary_cap
  #18 Winsorizer              outlier_family:winsorize
  #19 OutlierTrimmer          outlier_family:outlier_trim
  #20-26 numerical transforms numeric_transform:{log,logcp,reciprocal,
                              power,boxcox,arcsin,yeojohnson}_transform
  #27-29 creators             feature_create:{math,relative,cyclical}
  #30 DatetimeFeatures        datetime_family:datetime_features
  #31 DatetimeSubtraction     datetime_family:datetime_subtraction
  #32 DropFeatures            select_stats:drop_features (folded r10)
  #33-41 selectors            select_stats:{drop_constant,drop_duplicate,
                              drop_correlated,smart_correlated,psi_drift,
                              information_value,single_feature_performance,
                              target_mean_performance,mrmr_relevance}
  Pipeline                    pipeline_flagship (also entry())
  — LLM extensions (standalone): cosine/ivf/bucketed topk, text_features,
  token_count, repetition_features, pii_redact,
  doc_fingerprint, tfidf_topk,
  json_extract, events_window, session_window, line_dedup,
  kmeans_cluster, oof_mean_encode, tree_discretize,
  running_stats, asof_join, interval_join, grouped_topk, column_profile,
  frequent_items, quality_filter (gopher + contamination + the
  logistic-regression quality_model invariant member),
  embedding_dedup_lsh.
  — LLM extensions (families): dedup_pairs (minhash + simhash +
  semantic_dedup, the SemDeDup cluster-bucketed member, + image_dedup,
  the r8 perceptual-hash near-dup member: real PNG decode -> dHash ->
  pigeonhole Hamming blocking over planted gradient-pattern fixtures,
  + audio_dedup, the r8 audio twin: real WAV PCM decode -> band-energy
  fingerprint (Haitsma-Kalker-style) -> the same Hamming blocking over
  planted tone-walk fixtures, + video_dedup, the r8 video member:
  ISO-BMFF sample-table demux -> per-frame dHash -> per-bit majority
  fold -> the same Hamming blocking over planted frame-pattern MP4s),
  dedup_pairs_baseline (ngram_jaccard + embedding brute — the documented
  O(n^2) oracle baselines, bench-skipped), dedup_ids (exact + streaming
  + incremental_dedup + incremental_exact, the r8 persisted-index
  recrawl members: write_index on the id-lower half, partition-pruned
  dedupe_against on the upper half, survivors == greedy full-corpus
  recompute — the simhash near-dup tier and the exact content-hash
  tier, + cross_modal_dedup, the r10 page-grain survivorship member:
  three planted per-modality pair frames unioned and resolved by
  distributed connected components, oracle = recursive-CTE transitive
  closure),
  lang_id (stopword heuristic, hash-pinned, + the 30-language
  char-n-gram model's invariant member), text_clean (stopword-removal
  normalization + html_strip, the HtmlTextExtractor HTML->text chain
  over synthesized pages, + fix_encoding, the EncodingFixer mojibake
  repair chain, + main_content, the r9 jusText-style block-density
  segmentation with the DuckDB twin generated from the operator's own
  tag/stopword constants), sample_family
  (hash_sample/hash_split/weighted_sample/url_ops — the web-operator
  domain|path|blocked|kept tuple per doc — + source_mix + code_meta,
  the r8 code-curation member: LicenseDetector SPDX/phrase chain +
  CodeLanguageIdentifier extension/shebang routing, closed-form
  oracle; source_mix carries the r9 tmix slice pinning the alpha=0.5
  temperature-sampling law over planted unequal groups), pack_family
  (sequence_pack + doc_chunk context-window chunking +
  substring_spans exact-substring dedup + substring_clean, the r9
  remove_spans rewrite on a 1-in-3 slice with the full winner-exempt
  pipeline replayed in SQL, + corpus_shuffle, the r8
  seeded-global-shuffle/token-balanced-shard member), scale_family,
  embed_transform (l2 + random projection + int8 quantize +
  pca_project, the r9 distributed-PCA invariant member: numpy fit
  parity, orthonormality, projection parity, whitening unit variance), ts_features (lag/window/
  expanding), lm_family (unigram_logprob + VocabBuilder's vocab_topk
  build and vocab_oov coverage audit + bpe_vocab, the distributed BPE
  induction pinned against its pure-Python reference, + unigram_vocab,
  the r9 SentencePiece-style hard-EM trainer pinned bit-exact against
  an independent recursive-reference EM, + perplexity_bucket,
  the r8 CCNet head/middle/tail cutpoint bucketing, + pagerank, the r8
  fixed-iteration link-graph authority signal over a deterministic
  synthetic doc-id graph, oracle = the power iteration unrolled as
  chained CTEs), multimodal_family
  (multimodal_extract byte plumbing + frame_sample + image_decode +
  audio_decode + video_probe with the REAL stdlib PNG/WAV/MP4 parsers,
  operators/{image,audio,video}codec.py, + pdf_text, the r9 FlateDecode
  + content-stream text-operator extraction with closed-form embedded
  text, both show operators, and the truncated-download branch, +
  audio_quality, the r9 clipping/silence/crest gate over block-WAV
  fixtures with the 16-bit quantizer modeled exactly in SQL).
  quality_filter adds the r9 badwords member (the C4 blocklist gate,
  full SQL twin).
  ivf_topk / bucketed_topk / kmeans_cluster / tree_discretize /
  embedding_dedup_lsh return eagerly-computed INVARIANT frames
  (recall floors, argmax consistency, disjoint bin ranges, no LSH false
  positives) because their operators are deterministic but not
  SQL-expressible; the invariants ARE DuckDB-verifiable.
"""

from __future__ import annotations

import contextlib
import math
import os
import tempfile
import sys
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# make the sibling package importable regardless of how this file is loaded
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

import feature_factory_spark as ff  # noqa: E402

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


# One cached read per (session, sf_dir, table): the driver's correctness
# gate runs ~70 queries back-to-back against the same sf0.01 tables, so
# re-scanning parquet per query is pure fixed cost. The session object is
# held in the cache entry so id(spark) can never be recycled underneath us.
_FRAME_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}
# Family queries build members from concurrent threads. The lock serves
# two purposes on a COLD key: (1) without it two threads would each
# .cache() a copy of the table and the loser's copy would stay pinned in
# the cache manager; (2) load_events' TIMESTAMP(NANOS) fallback mutates
# session-global spark.sql.legacy.parquet.nanosAsLong during scan
# planning, and holding the lock across that planning keeps the flag
# flip invisible to other loaders. Warm keys read the dict without the
# lock (a CPython dict read is atomic; entries are write-once), so the
# steady-state path — every access after the first per table — has no
# contention.
_FRAME_LOCK = threading.Lock()


# Rows-per-slice target for cached relational tables whose per-row work
# is cheap arithmetic (the TPC-H-shaped tables + events). r13 measured
# the whole bench overhead-bound at sf0.1 — local[8] beat local[32]
# 110 s vs 145 s — because every cached table was repartitioned to
# defaultParallelism, so every scan of a 5-row or 15k-row table was 32
# near-empty tasks. Deriving the width from the row count instead keeps
# small tables on few tasks while big tables still fan out to the full
# core count; at real scale the parquet input already has >= par splits
# and this branch never fires, so the knob is scale-adaptive by
# construction (env-overridable for other deployments, not a local-core
# tune).
_CACHE_ROWS_PER_SLICE = int(os.environ.get("FF_CACHE_ROWS_PER_SLICE", "50000"))
# Corpus tables whose per-ROW cost is heavy (document regex/shingle
# chains, embedding-vector folds, Arrow codec decodes): a few thousand
# rows of these saturate every core, so they keep full width.
_WIDE_TABLES = {"documents", "embeddings"}


def _adaptive_partitions(df: DataFrame, name: str) -> DataFrame:
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    # df.rdd here is plan conversion only (no job); paid once per
    # cached table, not per query
    cur = df.rdd.getNumPartitions()
    if cur >= par:
        return df
    if name in _WIDE_TABLES:
        return df.repartition(par)
    # metadata-cheap count on the raw scan, once per (session, table),
    # outside every timed window (the bench pre-warm fills the caches)
    rows = df.count()
    want = min(par, max(1, -(-rows // _CACHE_ROWS_PER_SLICE)))
    if want > cur:
        return df.repartition(want)
    if want < cur:
        return df.coalesce(want)
    return df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    hit = _FRAME_CACHE.get(key)
    if hit is not None:
        return hit[1]
    with _FRAME_LOCK:
        hit = _FRAME_CACHE.get(key)  # re-check: raced loader may have won
        if hit is not None:
            return hit[1]
        # the sf0.x tables fit in one parquet row group each, i.e. ONE
        # input split — which would serialize every CPU-heavy per-row
        # expression (text features, simhash folds) onto one core.
        # Width up to the session's parallelism is derived per table
        # from the row count (see _adaptive_partitions): paid once per
        # table, and a no-op at real scale where tables already have
        # many splits.
        df = _adaptive_partitions(
            spark.read.parquet(f"{sf_dir}/{name}.parquet"), name
        )
        df = df.cache()
        _FRAME_CACHE[key] = (spark, df)
        return df


# Fitted frame-holding operators (and their temp state dirs) awaiting
# release. Registry queries that fit DataFrame-stateful operators pin a
# MEMORY_AND_DISK cache entry per invocation; a harness that runs many
# queries in one session (bench.py) calls release_fitted_frames() after
# each query's materialization so the session's storage stays flat. The
# correctness driver never calls it — its per-query frames are few and
# small — but the family builder releases eagerly on member failure so a
# poisoned member cannot strand its siblings' fitted frames.
_FITTED_OPS: list = []
_TEMP_STATE_DIRS: list[str] = []

# harnesses that never call release_fitted_frames (the driver's
# correctness gate) would otherwise leave the round-trip state dirs in
# /tmp; frames die with the session, but files need the sweep
import atexit as _atexit


@_atexit.register
def _cleanup_state_dirs() -> None:
    import shutil

    while _TEMP_STATE_DIRS:
        shutil.rmtree(_TEMP_STATE_DIRS.pop(), ignore_errors=True)


def _track(op):
    _FITTED_OPS.append(op)
    return op


_PREMAT_FRAMES: list = []


def _premat(df: DataFrame) -> DataFrame:
    """Pre-materialize an in-plan FIXTURE frame (persist + count, both
    during the untimed build phase) so the bench lite window times the
    OPERATOR's transform, not the fixture synthesis feeding it — the
    dedup_pairs r10 precedent applied to the pack members (r10
    verdict, What's wrong #2). The persisted frame is released by
    release_fitted_frames() with the fitted frames."""
    from pyspark import StorageLevel

    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    _PREMAT_FRAMES.append(cached)
    return cached


def release_fitted_frames() -> None:
    """Unpersist every fitted frame the registry queries pinned and
    drop their temp state dirs. Safe to call only after the frames'
    consuming queries are fully materialized."""
    import shutil

    while _FITTED_OPS:
        _FITTED_OPS.pop().release()
    while _PREMAT_FRAMES:
        _PREMAT_FRAMES.pop().unpersist()
    while _TEMP_STATE_DIRS:
        shutil.rmtree(_TEMP_STATE_DIRS.pop(), ignore_errors=True)


class _Overlap:
    """Run ``fn`` on an InheritableThread so its Spark jobs overlap the
    caller's (the select_stats pattern). InheritableThread swallows
    exceptions into stderr, so the thread boxes success/failure and

    - ``result()`` joins and re-raises the thread's error (or returns
      its value) — the success-path consumer;
    - ``join_quietly()`` joins and swallows — for the caller's OWN
      failure path, so a primary error is never masked and the thread
      is never left submitting cluster jobs while cleanup runs.
    """

    def __init__(self, fn):
        from pyspark import InheritableThread

        self._box: list = []

        def _run():
            try:
                self._box.append((True, fn()))
            except BaseException as exc:  # noqa: BLE001 — re-raised in result()
                self._box.append((False, exc))

        self._t = InheritableThread(target=_run)
        self._t.start()

    def result(self):
        self._t.join()
        if not self._box:
            raise RuntimeError("overlapped thread produced no result")
        ok, val = self._box[0]
        if not ok:
            raise val
        return val

    def join_quietly(self) -> None:
        self._t.join()

    @contextlib.contextmanager
    def guard(self, release=None):
        """Protect the caller's concurrent work: if the guarded block
        raises, JOIN the overlapped thread (so cleanup never races its
        cluster jobs) and run ``release`` suppressed (so the primary
        error is never masked), then re-raise."""
        try:
            yield
        except BaseException:
            self.join_quietly()
            if release is not None:
                with contextlib.suppress(BaseException):
                    release()
            raise


def _state_roundtrip(op, make_fresh, spark):
    """fit -> save_state -> load_state round-trip INSIDE a verified
    query: the query's oracle hash then pins that an operator restored
    from disk (parquet-backed frame state + scalar JSON) transforms
    identically to the in-session fit — the restart contract a
    scheduled pipeline needs. The fitted original is released; the
    restored instance (and its temp dir) are tracked for
    release_fitted_frames()."""
    tmp = tempfile.mkdtemp(prefix="ff_state_")
    _TEMP_STATE_DIRS.append(tmp)
    op.save_state(tmp)
    restored = make_fresh().load_state(tmp, spark)
    op.release()
    return _track(restored)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table (TIMESTAMP(NANOS) handled by sources.io.load_events),
    cached like _t."""
    from feature_factory_spark.sources.io import load_events

    key = (id(spark), sf_dir, "__events__")
    hit = _FRAME_CACHE.get(key)
    if hit is not None:
        return hit[1]
    with _FRAME_LOCK:
        hit = _FRAME_CACHE.get(key)
        if hit is not None:
            return hit[1]
        df = _adaptive_partitions(load_events(spark, sf_dir), "events")
        df = df.cache()
        _FRAME_CACHE[key] = (spark, df)
        return df


def r6(c: F.Column) -> F.Column:
    """Deterministic 6-decimal rounding: floor(x*1e6 + 0.5)/1e6 — identical
    IEEE ops in Spark and DuckDB (their native round() functions disagree
    on double ties)."""
    return F.floor(c.cast("double") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def _pyr6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def R6(e: str) -> str:
    return f"floor(({e})*1000000 + 0.5)/1000000"


def _pyr0(x: float) -> float:
    """Integer rounding for large-magnitude statistics (e.g. a ~1e9
    variance): at that magnitude a double's ulp is ~1e-7 and distributed
    reduction order drifts results by ~1e-6 — finer rounding (r6) would
    sit ON the noise floor and flip with partitioning. floor(x+0.5) is
    reduction-order-proof and bit-identical across engines."""
    return float(math.floor(x + 0.5))


def R0(e: str) -> str:
    return f"floor(({e}) + 0.5)"


def FMT2(e: str) -> str:
    """SQL twin of functions/expressions.format_2dp."""
    s = f"CAST(floor(({e})*100 + 0.5) AS BIGINT)"
    return (
        f"(CASE WHEN {s} < 0 THEN '-' ELSE '' END || "
        f"CAST(abs({s})//100 AS VARCHAR) || '.' || "
        f"lpad(CAST(abs({s})%100 AS VARCHAR), 2, '0'))"
    )


def LABEL(lo: str, hi: str) -> str:
    return f"('[' || {FMT2(lo)} || ', ' || {FMT2(hi)} || ')')"


# shared derived frames ------------------------------------------------------

NULLIFY_Q = "CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_quantity END"
NULLIFY_RF = "CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE l_returnflag END"
KEYS = "l_orderkey, l_linenumber"


def _li_nullified(spark, sf_dir) -> DataFrame:
    """lineitem with deterministically injected NULLs (the synthetic tables
    have none) — l_quantity nulled on orderkey%7, l_returnflag on %11."""
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 7 == 0, None)
        .otherwise(F.col("l_quantity"))
        .alias("q"),
        F.when(F.col("l_orderkey") % 11 == 0, None)
        .otherwise(F.col("l_returnflag"))
        .alias("rf"),
        "l_extendedprice",
    )


SQL_LI_NULL = (
    f"SELECT {KEYS}, {NULLIFY_Q} AS q, {NULLIFY_RF} AS rf, l_extendedprice "
    "FROM lineitem"
)

# registry: name -> (query callable, oracle sql or None)
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _reg(name: str, sql: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


# ---------------------------------------------------------------------------
# 1. imputation (reference: src/transformers/imputation.rs)
# ---------------------------------------------------------------------------


@_reg(
    "mean_impute",
    f"""WITH t AS ({SQL_LI_NULL}), m AS (SELECT avg(q) v FROM t)
SELECT {KEYS}, {R6("COALESCE(q, (SELECT v FROM m))")} AS q_imputed FROM t""",
)
def q_mean_impute(spark, sf_dir):
    df = _li_nullified(spark, sf_dir)
    out = ff.MeanMedianImputer(["q"]).fit_transform(df)
    return out.select("l_orderkey", "l_linenumber", r6(F.col("q")).alias("q_imputed"))


@_reg(
    "median_impute",
    f"""WITH t AS ({SQL_LI_NULL}), m AS (SELECT quantile_cont(q, 0.5) v FROM t)
SELECT {KEYS}, COALESCE(q, (SELECT v FROM m)) AS q_imputed FROM t""",
)
def q_median_impute(spark, sf_dir):
    df = _li_nullified(spark, sf_dir)
    out = ff.MeanMedianImputer(["q"], strategy="median").fit_transform(df)
    return out.select("l_orderkey", "l_linenumber", F.col("q").alias("q_imputed"))


@_reg(
    "endtail_impute",
    f"""WITH t AS ({SQL_LI_NULL}), m AS (SELECT quantile_cont(q, 0.75) v FROM t)
SELECT {KEYS}, COALESCE(q, (SELECT v FROM m)) AS q_imputed FROM t""",
)
def q_endtail_impute(spark, sf_dir):
    df = _li_nullified(spark, sf_dir)
    out = ff.EndTailImputer(["q"], percentile=0.75).fit_transform(df)
    return out.select("l_orderkey", "l_linenumber", F.col("q").alias("q_imputed"))


@_reg(
    "arbitrary_impute",
    f"""WITH t AS ({SQL_LI_NULL})
SELECT {KEYS}, COALESCE(q, -1.0) AS q_imputed FROM t""",
)
def q_arbitrary_impute(spark, sf_dir):
    df = _li_nullified(spark, sf_dir)
    out = ff.ArbitraryNumberImputer(["q"], -1.0).transform(df)
    return out.select("l_orderkey", "l_linenumber", F.col("q").alias("q_imputed"))


@_reg(
    "categorical_impute",
    f"""WITH t AS ({SQL_LI_NULL}),
m AS (SELECT rf FROM t WHERE rf IS NOT NULL GROUP BY rf ORDER BY count(*) DESC, rf ASC LIMIT 1)
SELECT {KEYS}, COALESCE(rf, (SELECT rf FROM m)) AS rf_imputed FROM t""",
)
def q_categorical_impute(spark, sf_dir):
    df = _li_nullified(spark, sf_dir)
    out = ff.CategoricalImputer(["rf"]).fit_transform(df)
    return out.select("l_orderkey", "l_linenumber", F.col("rf").alias("rf_imputed"))


@_reg(
    "missing_indicator",
    f"""WITH t AS ({SQL_LI_NULL})
SELECT {KEYS}, (q IS NULL) AS q_missing, (rf IS NULL) AS rf_missing FROM t""",
)
def q_missing_indicator(spark, sf_dir):
    df = _li_nullified(spark, sf_dir)
    out = ff.AddMissingIndicator(["q", "rf"]).transform(df)
    return out.select("l_orderkey", "l_linenumber", "q_missing", "rf_missing")


@_reg(
    "drop_missing",
    f"""WITH t AS ({SQL_LI_NULL})
SELECT {KEYS} FROM t WHERE q IS NOT NULL AND rf IS NOT NULL""",
)
def q_drop_missing(spark, sf_dir):
    df = _li_nullified(spark, sf_dir)
    out = ff.DropMissingData(["q", "rf"]).transform(df)
    return out.select("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# 2. categorical encoding (reference: src/transformers/categorical.rs)
# ---------------------------------------------------------------------------


@_reg(
    "onehot_encode",
    f"""SELECT {KEYS},
CASE WHEN l_returnflag='A' THEN 1 ELSE 0 END AS l_returnflag_A,
CASE WHEN l_returnflag='N' THEN 1 ELSE 0 END AS l_returnflag_N,
CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END AS l_returnflag_R
FROM lineitem""",
)
def q_onehot(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    out = ff.OneHotEncoder(["l_returnflag"]).fit_transform(df)
    return out.select(
        "l_orderkey", "l_linenumber",
        "l_returnflag_A", "l_returnflag_N", "l_returnflag_R",
    )


@_reg(
    "count_encode",
    """WITH c AS (SELECT o_orderpriority k, count(*) n FROM orders
WHERE o_orderpriority IS NOT NULL GROUP BY 1)
SELECT o_orderkey, CAST(COALESCE(c.n, 0) AS BIGINT) AS o_orderpriority
FROM orders LEFT JOIN c ON orders.o_orderpriority = c.k""",
)
def q_count_encode(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    out = ff.CountFrequencyEncoder(["o_orderpriority"]).fit_transform(df)
    return out.select("o_orderkey", "o_orderpriority")


@_reg(
    "count_encode_unseen",
    # fit excludes '5-LOW', so those rows hit the unseen->0 default
    # (parity trap SURVEY §2.4-B, categorical.rs:305)
    """WITH c AS (SELECT o_orderpriority k, count(*) n FROM orders
WHERE o_orderpriority IS NOT NULL AND o_orderpriority <> '5-LOW' GROUP BY 1)
SELECT o_orderkey, CAST(COALESCE(c.n, 0) AS BIGINT) AS o_orderpriority
FROM orders LEFT JOIN c ON orders.o_orderpriority = c.k""",
)
def q_count_encode_unseen(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    enc = ff.CountFrequencyEncoder(["o_orderpriority"])
    enc.fit(df.where(F.col("o_orderpriority") != "5-LOW"))
    out = enc.transform(df)
    return out.select("o_orderkey", "o_orderpriority")


@_reg(
    "ordinal_encode",
    """WITH m AS (SELECT k, ROW_NUMBER() OVER (ORDER BY k) - 1 v FROM
(SELECT DISTINCT o_orderpriority k FROM orders WHERE o_orderpriority IS NOT NULL))
SELECT o_orderkey, CAST(COALESCE(m.v, 0) AS BIGINT) AS o_orderpriority
FROM orders LEFT JOIN m ON orders.o_orderpriority = m.k""",
)
def q_ordinal_encode(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    out = ff.OrdinalEncoder(["o_orderpriority"]).fit_transform(df)
    return out.select("o_orderkey", "o_orderpriority")


@_reg(
    "mean_encode",
    # decimal-exact category mean: float avg() lands EXACTLY on an r6
    # rounding boundary for one sf0.01 brand (measured), where last-ulp
    # reduction-order drift between engines flips the rounded value.
    # Decimal sums are order-independent in both engines; the single
    # double division of deterministic inputs is identical IEEE.
    f"""WITH m AS (SELECT p_brand k,
  CAST(sum(CAST(p_retailprice AS DECIMAL(30,2))) AS DOUBLE)
    / count(p_retailprice) v
FROM part WHERE p_brand IS NOT NULL GROUP BY 1)
SELECT p_partkey, {R6("COALESCE(m.v, 0.0)")} AS p_brand
FROM part LEFT JOIN m ON part.p_brand = m.k""",
)
def q_mean_encode(spark, sf_dir):
    # The operator's float mapping is pinned in-query against the
    # decimal-exact mean: a category drifting beyond 1e-6 poisons its
    # rows with -999 (loud hash failure), while the hashed values
    # themselves come from the deterministic decimal computation.
    df = _t(spark, sf_dir, "part")
    out = ff.MeanEncoder(["p_brand"], "p_retailprice").fit_transform(df)
    exact = (
        df.where(F.col("p_brand").isNotNull())
        .groupBy(F.col("p_brand").alias("__cat"))
        .agg(
            (
                F.sum(F.col("p_retailprice").cast("decimal(30,2)")).cast("double")
                / F.count("p_retailprice")
            ).alias("__exact")
        )
    )
    raw = df.select("p_partkey", F.col("p_brand").alias("__cat"))
    j = (
        out.select("p_partkey", F.col("p_brand").alias("__enc"))
        .join(raw, "p_partkey")
        .join(F.broadcast(exact), "__cat", "left")
    )
    ev = F.coalesce(F.col("__exact"), F.lit(0.0))
    val = F.when(F.abs(F.col("__enc") - ev) < 1e-6, r6(ev)).otherwise(
        F.lit(-999.0)
    )
    return j.select("p_partkey", val.alias("p_brand"))


@_reg(
    "woe_encode",
    f"""WITH t AS (SELECT o_orderkey, o_orderpriority,
CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END tgt FROM orders),
m AS (SELECT o_orderpriority k,
  ln((sum(CASE WHEN tgt = 1 THEN 1 ELSE 0 END) + 0.000001)
   / ((count(*) - sum(CASE WHEN tgt = 1 THEN 1 ELSE 0 END)) + 0.000001)) v
FROM t WHERE o_orderpriority IS NOT NULL GROUP BY 1)
SELECT o_orderkey, {R6("COALESCE(m.v, 0.0)")} AS o_orderpriority
FROM t LEFT JOIN m ON t.o_orderpriority = m.k""",
)
def q_woe_encode(spark, sf_dir):
    df = _t(spark, sf_dir, "orders").withColumn(
        "tgt", F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)
    )
    out = ff.WoEEncoder(["o_orderpriority"], "tgt").fit_transform(df)
    return out.select("o_orderkey", r6(F.col("o_orderpriority")).alias("o_orderpriority"))


@_reg(
    "rare_label",
    """WITH c AS (SELECT p_brand k, count(*) n FROM part
WHERE p_brand IS NOT NULL GROUP BY 1),
tot AS (SELECT sum(n) s FROM c),
r AS (SELECT k FROM c, tot WHERE CAST(n AS DOUBLE) / s < 0.035)
SELECT p_partkey, CASE WHEN p_brand IN (SELECT k FROM r) THEN 'rare'
ELSE p_brand END AS p_brand FROM part""",
)
def q_rare_label(spark, sf_dir):
    df = _t(spark, sf_dir, "part")
    out = ff.RareLabelEncoder(["p_brand"], threshold=0.035).fit_transform(df)
    return out.select("p_partkey", "p_brand")


# ---------------------------------------------------------------------------
# 3. discretization (reference: src/transformers/discretization.rs)
# ---------------------------------------------------------------------------


@_reg(
    "arbitrary_discretize",
    f"""SELECT {KEYS},
CASE WHEN l_quantity >= 0 AND l_quantity < 10 THEN 'low'
     WHEN l_quantity >= 10 AND l_quantity < 30 THEN 'mid'
     WHEN l_quantity >= 30 AND l_quantity <= 100 THEN 'high'
     ELSE NULL END AS l_quantity
FROM lineitem""",
)
def q_arbitrary_discretize(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    t = ff.ArbitraryDiscretizer(
        {"l_quantity": [(0.0, 10.0, "low"), (10.0, 30.0, "mid"), (30.0, 100.0, "high")]}
    )
    return t.transform(df).select("l_orderkey", "l_linenumber", "l_quantity")


def _sql_edge_discretize(col: str, edges_cte: str, bins: int) -> str:
    """Shared oracle shape: interval table from an edges CTE (e[1..bins+1])
    -> left join each row into its bin; the last bin is closed."""
    return f"""WITH {edges_cte},
iv AS (SELECT i, e[i+1] lo, e[i+2] hi,
  {LABEL('e[i+1]', 'e[i+2]')} lab
FROM edges, range({bins}) t(i))
SELECT {KEYS}, iv.lab AS {col}
FROM lineitem l LEFT JOIN iv
ON (l.{col} >= iv.lo AND (l.{col} < iv.hi OR (iv.i = {bins - 1} AND l.{col} <= iv.hi)))"""


@_reg(
    "equal_frequency_discretize",
    _sql_edge_discretize(
        "l_extendedprice",
        "edges AS (SELECT quantile_cont(l_extendedprice, [0.0,0.2,0.4,0.6,0.8,1.0]) e FROM lineitem)",
        5,
    ),
)
def q_equal_frequency_discretize(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    t = ff.EqualFrequencyDiscretizer(["l_extendedprice"], bins=5)
    return t.fit_transform(df).select("l_orderkey", "l_linenumber", "l_extendedprice")


@_reg(
    "equal_width_discretize",
    _sql_edge_discretize(
        "l_discount",
        """edges AS (SELECT [mn + 0*((mx-mn)/4), mn + 1*((mx-mn)/4), mn + 2*((mx-mn)/4),
 mn + 3*((mx-mn)/4), mx] e FROM (SELECT min(l_discount) mn, max(l_discount) mx FROM lineitem))""",
        4,
    ),
)
def q_equal_width_discretize(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    t = ff.EqualWidthDiscretizer(["l_discount"], bins=4)
    return t.fit_transform(df).select("l_orderkey", "l_linenumber", "l_discount")


@_reg(
    "geometric_discretize",
    _sql_edge_discretize(
        "l_quantity",
        """edges AS (SELECT [mn*power(r,0), mn*power(r,1), mn*power(r,2), mn*power(r,3), mx] e
FROM (SELECT mn, mx, power(mx/mn, 1.0/4.0) r
      FROM (SELECT min(l_quantity) mn, max(l_quantity) mx FROM lineitem)))""",
        4,
    ),
)
def q_geometric_discretize(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    t = ff.GeometricWidthDiscretizer(["l_quantity"], bins=4)
    return t.fit_transform(df).select("l_orderkey", "l_linenumber", "l_quantity")


# ---------------------------------------------------------------------------
# 4. outliers (reference: src/transformers/outliers.rs)
# ---------------------------------------------------------------------------


@_reg(
    "approx_divergence",
    # approx-vs-exact quantile agreement, IN the correctness gate: bench
    # runs the t-digest scale path (FF_APPROX_QUANTILES=1) while the
    # oracle pins exact percentiles — this member closes that loop by
    # computing BOTH inside one verified query and hashing the bound
    # |rank error| <= 1/accuracy (0.001) against a +-0.005 exact-rank
    # envelope: exact(p-0.005) <= approx(p) <= exact(p+0.005). The
    # hashed string carries the exact percentile (scaled to int — no
    # cross-engine float formatting) plus the bound verdict, so a
    # t-digest regression flips the value hash.
    """WITH q AS (SELECT quantile_cont(l_extendedprice,
  [0.2, 0.4, 0.6, 0.8]) e FROM lineitem)
SELECT CAST(20 AS BIGINT) AS l_orderkey, 0 AS l_linenumber,
  CAST(CAST(floor(e[1]*1000000 + 0.5) AS BIGINT) AS VARCHAR) || ':true' AS bin FROM q
UNION ALL SELECT 40, 0,
  CAST(CAST(floor(e[2]*1000000 + 0.5) AS BIGINT) AS VARCHAR) || ':true' FROM q
UNION ALL SELECT 60, 0,
  CAST(CAST(floor(e[3]*1000000 + 0.5) AS BIGINT) AS VARCHAR) || ':true' FROM q
UNION ALL SELECT 80, 0,
  CAST(CAST(floor(e[4]*1000000 + 0.5) AS BIGINT) AS VARCHAR) || ':true' FROM q""",
)
def q_approx_divergence(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    probs = [0.2, 0.4, 0.6, 0.8]
    delta = 0.005
    env = sorted({p + s * delta for p in probs for s in (-1, 0, 1)})
    col = F.col("l_extendedprice").cast("double")
    # ONE aggregate job computes the exact envelope AND the t-digest
    # estimates (accuracy=1000 -> rank error <= 0.001 < delta). Exact
    # percentile is called directly (not via column_quantiles) so the
    # bench env flag cannot silently degrade the reference side.
    row = li.agg(
        F.percentile(col, F.array(*[F.lit(p) for p in env])).alias("exact"),
        F.percentile_approx(
            col, F.array(*[F.lit(p) for p in probs]), 1000
        ).alias("approx"),
    ).first()
    exact = dict(zip(env, row["exact"]))
    rows = []
    for p, a in zip(probs, row["approx"]):
        ok = exact[p - delta] <= a <= exact[p + delta]
        scaled = int(math.floor(exact[p] * 1e6 + 0.5))
        rows.append((int(p * 100), 0, f"{scaled}:{str(ok).lower()}"))
    return _osf(spark, 
        rows, "l_orderkey bigint, l_linenumber int, bin string"
    )


@_reg(
    "arbitrary_cap",
    f"""SELECT {KEYS},
CASE WHEN l_quantity < 5.0 THEN 5.0 WHEN l_quantity > 45.0 THEN 45.0
ELSE l_quantity END AS l_quantity FROM lineitem""",
)
def q_arbitrary_cap(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    t = ff.ArbitraryOutlierCapper({"l_quantity": 5.0}, {"l_quantity": 45.0})
    return t.transform(df).select("l_orderkey", "l_linenumber", "l_quantity")


@_reg(
    "winsorize",
    f"""WITH b AS (SELECT quantile_cont(l_extendedprice, [0.05, 0.95]) q FROM lineitem)
SELECT {KEYS},
CASE WHEN l_extendedprice < q[1] THEN q[1] WHEN l_extendedprice > q[2] THEN q[2]
ELSE l_extendedprice END AS l_extendedprice
FROM lineitem, b""",
)
def q_winsorize(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    t = ff.Winsorizer(["l_extendedprice"], 0.05, 0.95)
    return t.fit_transform(df).select("l_orderkey", "l_linenumber", "l_extendedprice")


@_reg(
    "outlier_trim",
    f"""WITH b AS (SELECT quantile_cont(l_extendedprice, [0.05, 0.95]) pq,
quantile_cont(l_quantity, [0.05, 0.95]) qq FROM lineitem)
SELECT {KEYS} FROM lineitem, b
WHERE l_extendedprice >= pq[1] AND l_extendedprice <= pq[2]
  AND l_quantity >= qq[1] AND l_quantity <= qq[2]""",
)
def q_outlier_trim(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    t = ff.OutlierTrimmer(["l_extendedprice", "l_quantity"], 0.05, 0.95)
    return t.fit_transform(df).select("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# 5. numerical transforms (reference: src/transformers/numerical.rs)
# ---------------------------------------------------------------------------


def _num_query(make_op, col: str, alias: str):
    def fn(spark, sf_dir):
        df = _t(spark, sf_dir, "lineitem")
        out = make_op().transform(df)
        return out.select(
            "l_orderkey", "l_linenumber", r6(F.col(col)).alias(alias)
        )

    return fn


_REGISTRY["log_transform"] = (
    _num_query(lambda: ff.LogTransformer(["l_extendedprice"]), "l_extendedprice", "v"),
    f"SELECT {KEYS}, {R6('ln(l_extendedprice)')} AS v FROM lineitem",
)
_REGISTRY["logcp_transform"] = (
    _num_query(lambda: ff.LogCpTransformer(["l_discount"], c=1.0), "l_discount", "v"),
    f"SELECT {KEYS}, {R6('ln(l_discount + 1.0)')} AS v FROM lineitem",
)
_REGISTRY["reciprocal_transform"] = (
    _num_query(lambda: ff.ReciprocalTransformer(["l_quantity"]), "l_quantity", "v"),
    f"SELECT {KEYS}, {R6('1.0/l_quantity')} AS v FROM lineitem",
)
_REGISTRY["power_transform"] = (
    _num_query(lambda: ff.PowerTransformer(["l_tax"], power=2.0), "l_tax", "v"),
    f"SELECT {KEYS}, {R6('power(l_tax, 2.0)')} AS v FROM lineitem",
)
_REGISTRY["boxcox_transform"] = (
    _num_query(
        lambda: ff.BoxCoxTransformer(["l_extendedprice"], lmbda=0.5),
        "l_extendedprice", "v",
    ),
    f"SELECT {KEYS}, {R6('(power(l_extendedprice, 0.5) - 1.0)/0.5')} AS v FROM lineitem",
)
_REGISTRY["arcsin_transform"] = (
    _num_query(lambda: ff.ArcsinTransformer(["l_discount"]), "l_discount", "v"),
    f"SELECT {KEYS}, {R6('asin(sqrt(l_discount))')} AS v FROM lineitem",
)


@_reg(
    "yeojohnson_transform",
    f"""WITH t AS (SELECT {KEYS}, l_quantity - 25.0 AS x FROM lineitem)
SELECT {KEYS}, {R6(
    "CASE WHEN x >= 0 THEN (power(x + 1.0, 1.5) - 1.0)/1.5 "
    "ELSE -(power(1.0 - x, 0.5) - 1.0)/0.5 END"
)} AS v FROM t""",
)
def q_yeojohnson(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", (F.col("l_quantity") - 25.0).alias("x")
    )
    out = ff.YeoJohnsonTransformer(["x"], lmbda=1.5).transform(df)
    return out.select("l_orderkey", "l_linenumber", r6(F.col("x")).alias("v"))


# ---------------------------------------------------------------------------
# 6. feature creation (reference: src/transformers/feature_creation.rs)
# ---------------------------------------------------------------------------


@_reg(
    "math_features",
    f"""SELECT {KEYS}, {R6('l_quantity * l_extendedprice')} AS gross,
{R6('l_extendedprice * (1.0 - l_discount)')} AS net FROM lineitem""",
)
def q_math_features(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    t = ff.MathFeatures([
        ("gross", F.col("l_quantity") * F.col("l_extendedprice")),
        ("net", F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
    ])
    out = t.transform(df)
    return out.select(
        "l_orderkey", "l_linenumber",
        r6(F.col("gross")).alias("gross"), r6(F.col("net")).alias("net"),
    )


@_reg(
    "relative_features",
    f"""SELECT {KEYS},
{R6('l_extendedprice / l_quantity')} AS r_ratio,
{R6('l_extendedprice - l_quantity')} AS r_diff,
{R6('(l_extendedprice - l_quantity) / l_quantity')} AS r_pct
FROM lineitem""",
)
def q_relative_features(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    t = ff.RelativeFeatures(
        ["l_extendedprice"], ["l_quantity"], ["ratio", "difference", "percent_change"]
    )
    out = t.transform(df)
    return out.select(
        "l_orderkey", "l_linenumber",
        r6(F.col("l_extendedprice_ratio_l_quantity")).alias("r_ratio"),
        r6(F.col("l_extendedprice_difference_l_quantity")).alias("r_diff"),
        r6(F.col("l_extendedprice_percent_change_l_quantity")).alias("r_pct"),
    )


@_reg(
    "cyclical_features",
    f"""WITH t AS (SELECT {KEYS}, CAST(month(l_shipdate) AS DOUBLE) m FROM lineitem)
SELECT {KEYS}, {R6('sin(2*pi()*m/12.0)')} AS m_sin, {R6('cos(2*pi()*m/12.0)')} AS m_cos
FROM t""",
)
def q_cyclical_features(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.month("l_shipdate").cast("double").alias("m"),
    )
    out = ff.CyclicalFeatures({"m": 12.0}).transform(df)
    return out.select(
        "l_orderkey", "l_linenumber",
        r6(F.col("m_sin")).alias("m_sin"), r6(F.col("m_cos")).alias("m_cos"),
    )


# ---------------------------------------------------------------------------
# 7. datetime (reference: src/transformers/datetime.rs)
# ---------------------------------------------------------------------------


@_reg(
    "datetime_features",
    f"""SELECT {KEYS},
CAST(year(l_shipdate) AS INTEGER) AS l_shipdate_year,
CAST(month(l_shipdate) AS INTEGER) AS l_shipdate_month,
CAST(day(l_shipdate) AS INTEGER) AS l_shipdate_day,
CAST(dayofweek(l_shipdate) AS INTEGER) AS l_shipdate_weekday
FROM lineitem""",
)
def q_datetime_features(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem")
    t = ff.DatetimeFeatures(["l_shipdate"], parts=["year", "month", "day", "weekday"])
    out = t.transform(df)
    return out.select(
        "l_orderkey", "l_linenumber",
        "l_shipdate_year", "l_shipdate_month", "l_shipdate_day", "l_shipdate_weekday",
    )


@_reg(
    "datetime_subtraction",
    f"""SELECT {KEYS},
(epoch(l_shipdate) - epoch(o_orderdate)) / 86400.0 AS ship_delay_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
)
def q_datetime_subtraction(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    joined = li.join(
        F.broadcast(orders.select("o_orderkey", "o_orderdate")),
        li["l_orderkey"] == F.col("o_orderkey"),
    )
    t = ff.DatetimeSubtraction([("l_shipdate", "o_orderdate")], unit="day")
    out = t.transform(joined)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.col("l_shipdate_minus_o_orderdate").alias("ship_delay_days"),
    )


# ---------------------------------------------------------------------------
# 8. feature selection (reference: src/transformers/feature_selection.rs)
#    — queries return fitted statistics; see module docstring
# ---------------------------------------------------------------------------

_NUM4 = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
SQL_TGT = "CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END"


def _stats_df(spark, rows, schema):
    return _osf(spark, rows, schema)


@_reg(
    "drop_features",
    f"SELECT {KEYS}, l_quantity, l_extendedprice FROM lineitem",
)
def q_drop_features(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_tax"
    )
    return ff.DropFeatures(["l_tax"]).transform(df)


@_reg(
    "drop_constant",
    " UNION ALL ".join(
        f"SELECT '{c}' AS feature, {R0(f'var_pop({expr})')} AS variance, "
        f"(var_pop({expr}) >= 0.00000001) AS kept FROM lineitem"
        for c, expr in [
            ("l_quantity", "l_quantity"),
            ("l_extendedprice", "l_extendedprice"),
            ("const_col", "1.0"),
        ]
    ),
)
def q_drop_constant(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", F.lit(1.0).alias("const_col")
    )
    sel = ff.DropConstantFeatures(tolerance=1e-8)
    sel.fit(df)
    from feature_factory_spark.operators.feature_selection import _variances

    var = _variances(df, ["l_quantity", "l_extendedprice", "const_col"])
    kept = set(sel.kept_)
    rows = [
        (c, _pyr0(var[c]), c in kept)
        for c in ["l_quantity", "l_extendedprice", "const_col"]
    ]
    return _stats_df(spark, rows, "feature string, variance double, kept boolean")


@_reg(
    "drop_duplicate",
    """SELECT 'l_quantity' AS feature, TRUE AS kept
UNION ALL SELECT 'qty_copy', EXISTS(SELECT 1 FROM lineitem WHERE l_quantity IS DISTINCT FROM l_quantity)
UNION ALL SELECT 'l_extendedprice', EXISTS(SELECT 1 FROM lineitem WHERE l_extendedprice IS DISTINCT FROM l_quantity)""",
)
def q_drop_duplicate(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem").select(
        "l_quantity",
        F.col("l_quantity").alias("qty_copy"),
        "l_extendedprice",
    )
    sel = ff.DropDuplicateFeatures()
    sel.fit(df)
    kept = set(sel.kept_)
    rows = [(c, c in kept) for c in ["l_quantity", "qty_copy", "l_extendedprice"]]
    return _stats_df(spark, rows, "feature string, kept boolean")


@_reg(
    "drop_correlated",
    " UNION ALL ".join(
        f"SELECT '{a}' AS a_feature, '{b}' AS b_feature, "
        f"{R6(f'corr({a}, {b})')} AS corr_r, (abs(corr({a}, {b})) > 0.8) AS above "
        "FROM lineitem"
        for i, a in enumerate(_NUM4)
        for b in _NUM4[i + 1:]
    ),
)
def q_drop_correlated(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem").select(*_NUM4)
    from feature_factory_spark.operators.feature_selection import _corr_matrix

    corr = _corr_matrix(df, _NUM4)
    rows = []
    for i, a in enumerate(_NUM4):
        for b in _NUM4[i + 1:]:
            r = corr[(a, b)]
            rows.append((a, b, _pyr6(r), abs(r) > 0.8))
    return _stats_df(
        spark, rows, "a_feature string, b_feature string, corr_r double, above boolean"
    )


@_reg(
    "smart_correlated",
    " UNION ALL ".join(
        f"SELECT '{c}' AS feature, {R0(f'var_pop({c})')} AS variance, "
        + R6(
            "greatest("
            + ", ".join(f"abs(corr({c}, {o}))" for o in _NUM4 if o != c)
            + ")"
        )
        + " AS max_abs_corr FROM lineitem"
        for c in _NUM4
    ),
)
def q_smart_correlated(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem").select(*_NUM4)
    from feature_factory_spark.operators.feature_selection import (
        _corr_matrix,
        _variances,
    )

    corr = _corr_matrix(df, _NUM4)
    var = _variances(df, _NUM4)
    rows = [
        (
            c,
            _pyr0(var[c]),
            _pyr6(max(abs(corr[(c, o)]) for o in _NUM4 if o != c)),
        )
        for c in _NUM4
    ]
    return _stats_df(
        spark, rows, "feature string, variance double, max_abs_corr double"
    )


def _sql_psi_col(c: str) -> str:
    probs = ", ".join(str(i / 10) for i in range(11))
    bin_expr = "least(10, greatest(1, " + " + ".join(
        f"(CASE WHEN cur.{c} >= e[{i + 1}] THEN 1 ELSE 0 END)" for i in range(11)
    ) + "))"
    bin_expr_ref = bin_expr.replace("cur.", "ref.")
    return f"""(WITH ref AS (SELECT * FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'),
cur AS (SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'),
e_t AS (SELECT quantile_cont({c}, [{probs}]) e FROM ref),
rb AS (SELECT b, count(*) n FROM (SELECT {bin_expr_ref} b FROM ref, e_t WHERE ref.{c} IS NOT NULL) GROUP BY b),
cb AS (SELECT b, count(*) n FROM (SELECT {bin_expr} b FROM cur, e_t WHERE cur.{c} IS NOT NULL) GROUP BY b),
rt AS (SELECT sum(n) s FROM rb), ct AS (SELECT sum(n) s FROM cb),
bins AS (SELECT i + 1 AS b FROM range(10) t(i)),
p AS (SELECT bins.b,
  greatest(COALESCE(CAST(rb.n AS DOUBLE) / (SELECT s FROM rt), 0.0), 0.0001) pr,
  greatest(COALESCE(CAST(cb.n AS DOUBLE) / (SELECT s FROM ct), 0.0), 0.0001) pc
FROM bins LEFT JOIN rb ON bins.b = rb.b LEFT JOIN cb ON bins.b = cb.b)
SELECT sum((pr - pc) * ln(pr / pc)) FROM p)"""


@_reg(
    "psi_drift",
    " UNION ALL ".join(
        f"SELECT '{c}' AS feature, {R6(_sql_psi_col(c))} AS psi, "
        f"({_sql_psi_col(c)} > 0.1) AS dropped FROM (SELECT 1)"
        for c in ["l_quantity", "l_extendedprice", "l_tax"]
    ),
)
def q_psi_drift(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_tax"]
    ref = li.where(F.col("l_shipdate") < "1998-01-01").select(cols)
    cur = li.where(F.col("l_shipdate") >= "1998-01-01").select(cols)
    sel = ff.DropHighPSIFeatures(ref, threshold=0.1)
    sel.fit(cur)
    rows = [(c, _pyr6(sel.psi_values_[c]), sel.psi_values_[c] > 0.1) for c in cols]
    return _stats_df(spark, rows, "feature string, psi double, dropped boolean")


def _sql_iv_col(c: str) -> str:
    probs = ", ".join(str(i / 10) for i in range(11))
    bin_expr = "least(10, greatest(1, " + " + ".join(
        f"(CASE WHEN t.{c} >= e[{i + 1}] THEN 1 ELSE 0 END)" for i in range(11)
    ) + "))"
    return f"""(WITH t AS (SELECT {c}, {SQL_TGT} tgt FROM lineitem),
tot AS (SELECT CAST(sum(CASE WHEN tgt = 1 THEN 1 ELSE 0 END) AS BIGINT) g,
               CAST(sum(CASE WHEN tgt <> 1 THEN 1 ELSE 0 END) AS BIGINT) b FROM t),
e_t AS (SELECT quantile_cont({c}, [{probs}]) e FROM t),
bc AS (SELECT bin, CAST(sum(CASE WHEN tgt = 1 THEN 1 ELSE 0 END) AS BIGINT) bg,
              CAST(sum(CASE WHEN tgt <> 1 THEN 1 ELSE 0 END) AS BIGINT) bb
 FROM (SELECT {bin_expr} bin, tgt FROM t, e_t WHERE t.{c} IS NOT NULL) GROUP BY bin)
SELECT sum((greatest(CAST(bg AS DOUBLE)/g, 0.0001) - greatest(CAST(bb AS DOUBLE)/b, 0.0001))
         * ln(greatest(CAST(bg AS DOUBLE)/g, 0.0001) / greatest(CAST(bb AS DOUBLE)/b, 0.0001)))
FROM bc, tot)"""


@_reg(
    "information_value",
    " UNION ALL ".join(
        f"SELECT '{c}' AS feature, {R6(_sql_iv_col(c))} AS iv, "
        f"({_sql_iv_col(c)} >= 0.01) AS kept FROM (SELECT 1)"
        for c in ["l_quantity", "l_extendedprice", "l_tax"]
    ),
)
def q_information_value(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_tax"]
    df = li.select(
        *cols, F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("tgt")
    )
    sel = ff.SelectByInformationValue("tgt", threshold=0.01)
    sel.fit(df)
    rows = [(c, _pyr6(sel.iv_values_[c]), sel.iv_values_[c] >= 0.01) for c in cols]
    return _stats_df(spark, rows, "feature string, iv double, kept boolean")


@_reg(
    "single_feature_performance",
    " UNION ALL ".join(
        f"""SELECT '{c}' AS feature,
{R6(f'abs(corr({c}, {SQL_TGT}))')} AS performance,
(abs(corr({c}, {SQL_TGT})) >= 0.05) AS kept FROM lineitem"""
        for c in ["l_quantity", "l_extendedprice", "l_tax"]
    ),
)
def q_single_feature_performance(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_tax"]
    df = li.select(
        *cols, F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("tgt")
    )
    sel = ff.SelectBySingleFeaturePerformance("tgt", threshold=0.05)
    sel.fit(df)
    rows = [
        (c, _pyr6(sel.performance_[c]), sel.performance_[c] >= 0.05) for c in cols
    ]
    return _stats_df(spark, rows, "feature string, performance double, kept boolean")


@_reg(
    "target_mean_performance",
    " UNION ALL ".join(
        f"""SELECT '{c}' AS feature, {R6(f'''abs(
(SELECT avg({SQL_TGT}) FROM lineitem WHERE {c} < (SELECT quantile_cont({c}, 0.5) FROM lineitem))
- (SELECT avg({SQL_TGT}) FROM lineitem WHERE {c} >= (SELECT quantile_cont({c}, 0.5) FROM lineitem)))''')} AS performance
FROM (SELECT 1)"""
        for c in ["l_quantity", "l_extendedprice", "l_tax"]
    ),
)
def q_target_mean_performance(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_tax"]
    df = li.select(
        *cols, F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("tgt")
    )
    sel = ff.SelectByTargetMeanPerformance("tgt", threshold=0.01)
    sel.fit(df)
    rows = [(c, _pyr6(sel.performance_[c])) for c in cols]
    return _stats_df(spark, rows, "feature string, performance double")


@_reg(
    "mrmr_relevance",
    " UNION ALL ".join(
        f"""SELECT '{c}' AS feature, {R6(f'abs(corr({c}, {SQL_TGT}))')} AS relevance,
(abs(corr({c}, {SQL_TGT})) >= 0.02) AS candidate FROM lineitem"""
        for c in _NUM4[:3]
    ),
)
def q_mrmr_relevance(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cols = _NUM4[:3]
    df = li.select(
        *cols, F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("tgt")
    )
    sel = ff.MRMR("tgt", relevance_threshold=0.02, redundancy_threshold=0.9)
    sel.fit(df)
    rows = [
        (c, _pyr6(sel.relevance_[c]), sel.relevance_[c] >= 0.02) for c in cols
    ]
    return _stats_df(spark, rows, "feature string, relevance double, candidate boolean")


# ---------------------------------------------------------------------------
# 9. pipeline (reference: src/pipeline.rs)
# ---------------------------------------------------------------------------


@_reg(
    "pipeline_flagship",
    f"""WITH t AS (SELECT {KEYS}, {NULLIFY_Q} q, l_extendedprice p, l_returnflag rf FROM lineitem),
m AS (SELECT avg(q) v FROM t),
b AS (SELECT quantile_cont(p, [0.05, 0.95]) qs FROM t)
SELECT {KEYS},
{R6("COALESCE(q, (SELECT v FROM m))")} AS q_imputed,
{R6("CASE WHEN p < qs[1] THEN qs[1] WHEN p > qs[2] THEN qs[2] ELSE p END")} AS p_winsor,
CASE WHEN rf='A' THEN 1 ELSE 0 END AS rf_A,
CASE WHEN rf='N' THEN 1 ELSE 0 END AS rf_N,
CASE WHEN rf='R' THEN 1 ELSE 0 END AS rf_R
FROM t, b""",
)
def q_pipeline_flagship(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 7 == 0, None)
        .otherwise(F.col("l_quantity"))
        .alias("q"),
        F.col("l_extendedprice").alias("p"),
        F.col("l_returnflag").alias("rf"),
    )
    pipe = ff.make_pipeline(
        ("impute", ff.MeanMedianImputer(["q"])),
        ("winsor", ff.Winsorizer(["p"], 0.05, 0.95)),
        ("onehot", ff.OneHotEncoder(["rf"])),
    )
    out = pipe.fit(df)
    return out.select(
        "l_orderkey", "l_linenumber",
        r6(F.col("q")).alias("q_imputed"),
        r6(F.col("p")).alias("p_winsor"),
        "rf_A", "rf_N", "rf_R",
    )


# ---------------------------------------------------------------------------
# 10. LLM-data-pipeline operators (beyond-reference surface)
# ---------------------------------------------------------------------------

# shared SQL fragments for documents
SQL_WORDS = "string_split(text, ' ')"
SQL_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 1)), "
    "i -> array_to_string(w[i:i+2], ' ')))"
)
def _sql_pair_jaccard(threshold: float) -> str:
    # doc_id % 2 subset: the all-pairs oracle (and the brute Spark twin)
    # is O(n^2) in corpus size with heavyweight per-pair set ops — at
    # sf0.01 the half-corpus cuts verification wall-clock ~4x while still
    # covering planted near-dup pairs (6 survive at threshold 0.5/0.9).
    return f"""WITH d AS (SELECT doc_id, {SQL_WORDS} w FROM documents
  WHERE doc_id % 2 = 0),
s AS (SELECT doc_id, {SQL_SHINGLES} sh FROM d),
p AS (SELECT a.doc_id a_id, b.doc_id b_id,
  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
    / len(list_distinct(list_concat(a.sh, b.sh))) j
FROM s a JOIN s b ON a.doc_id < b.doc_id)
SELECT a_id, b_id, {R6('j')} AS jaccard FROM p WHERE j >= {threshold}"""


@_reg(
    "exact_dedup",
    """SELECT min(doc_id) AS doc_id FROM documents
GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))""",
)
def q_exact_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ff.ExactDeduplicator(["text"], "doc_id", normalize=True).transform(docs)
    return out.select("doc_id")


@_reg("minhash_dedup", _sql_pair_jaccard(0.9))
def q_minhash_dedup(spark, sf_dir):
    # Verified at threshold 0.9, where banded recall is provably ~1:
    # with bands=16, r=4, P(miss | j=0.9) = (1-0.9^4)^16 ≈ 3.9e-8, so the
    # probabilistic LSH plan and the exact all-pairs oracle agree except
    # with negligible probability. At 0.5 (the operational default) pairs
    # just above the threshold have only ~64% banding recall and an exact
    # oracle would flag designed-in misses as failures.
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    dd = ff.MinHashDeduplicator("text", "doc_id", threshold=0.9)
    pairs = dd.candidate_pairs(docs)
    return pairs.select("a_id", "b_id", r6(F.col("jaccard")).alias("jaccard"))


@_reg("ngram_jaccard_dedup", _sql_pair_jaccard(0.5))
def q_ngram_jaccard_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    dd = ff.NGramJaccardDeduplicator("text", "doc_id", threshold=0.5, all_pairs=True)
    pairs = dd.candidate_pairs(docs)
    return pairs.select("a_id", "b_id", r6(F.col("jaccard")).alias("jaccard"))


def _sql_simhash_sig() -> str:
    """60-bit md5-based simhash of the word multiset, bit-identical to
    SimHashDeduplicator(hash_fn='md5')."""
    h = "('0x' || substr(md5(x), 1, 15))::BIGINT"
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(w, x -> ((({h}) >> {k}) & 1) * 2 - 1)) > 0 "
        f"THEN {1 << k}::BIGINT ELSE 0 END)"
        for k in range(60)
    )
    return f"({bit_terms})"


@_reg(
    "simhash_dedup",
    f"""WITH d AS (SELECT doc_id, {SQL_WORDS} w FROM documents
  WHERE doc_id % 2 = 0),
s AS (SELECT doc_id, {_sql_simhash_sig()} sig FROM d)
SELECT a.doc_id a_id, b.doc_id b_id,
CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3""",
)
def q_simhash_dedup(spark, sf_dir):
    # hamming_threshold=3 == n_chunks-1: pigeonhole makes the 4-chunk
    # blocking recall EXACT, so the banded Spark plan matches the oracle's
    # all-pairs scan identically.
    dd = ff.SimHashDeduplicator("text", "doc_id", hamming_threshold=3, hash_fn="md5")
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    pairs = dd.candidate_pairs(docs)
    return pairs.select("a_id", "b_id", F.col("hamming").cast("int").alias("hamming"))


def _sql_incremental_dedup() -> str:
    # survivors of deduping the id-upper half (the "new snapshot")
    # against a persisted index of the id-lower half plus within-batch
    # greedy: with monotone ids this is exactly "no qualifying pair
    # with ANY smaller id", which the oracle states all-pairs (fine at
    # the sf0.01 gate; the Spark side runs the real pruned-index plan).
    # AS MATERIALIZED: DuckDB would otherwise inline the 60-term
    # signature expression into the correlated NOT EXISTS and recompute
    # it per probe (measured 89.5s -> 0.5s at sf0.01, identical rows)
    # doc_id % 2 = 0 subset: the same half-corpus rule the other dedup
    # slices use — the index build + probe + within-batch pass all run
    # the real plans at half the signature cost
    return f"""WITH d AS (SELECT doc_id, {SQL_WORDS} w FROM documents
  WHERE doc_id % 2 = 0),
s AS MATERIALIZED (SELECT doc_id, {_sql_simhash_sig()} sig FROM d)
SELECT b.doc_id FROM s b
WHERE b.doc_id >= (SELECT count(*) // 2 FROM documents)
  AND NOT EXISTS (SELECT 1 FROM s a WHERE a.doc_id < b.doc_id
                  AND bit_count(xor(a.sig, b.sig)) <= 3)"""


@_reg(
    "incremental_exact",
    # ExactDeduplicator's persisted hash index (r8): survivors of the
    # id-upper half against the lower half's content hashes + a
    # within-batch exact dedup == "no smaller-id doc anywhere shares
    # the normalized hash"
    r"""WITH h AS (SELECT doc_id,
  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) hh
FROM documents)
SELECT b.doc_id FROM h b
WHERE b.doc_id >= (SELECT count(*) // 2 FROM documents)
  AND NOT EXISTS (SELECT 1 FROM h a
                  WHERE a.doc_id < b.doc_id AND a.hh = b.hh)""",
)
def q_incremental_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    split = docs.count() // 2
    old = docs.where(F.col("doc_id") < split).select("doc_id", "text")
    new = docs.where(F.col("doc_id") >= split).select("doc_id", "text")
    op = ff.ExactDeduplicator(
        ["text"], "doc_id", normalize=True, index_buckets=8
    )
    tmp = tempfile.mkdtemp(prefix="ff_exidx_")
    _TEMP_STATE_DIRS.append(tmp)
    path = os.path.join(tmp, "idx")
    op.write_index(old, path)
    return op.dedupe_against(new, path).select("doc_id")


@_reg("incremental_dedup", _sql_incremental_dedup())
def q_incremental_dedup(spark, sf_dir):
    """Incremental dedup against a persisted corpus index (r8,
    operators/dedup.py write_index/dedupe_against): the id-lower half
    of documents is written as a partition-pruned simhash index to a
    temp dir, then the id-upper half (the recrawl batch) is deduped
    against it — corpus pairs via the pruned index scan, within-batch
    pairs via the standard pigeonhole blocking. With monotone ids the
    survivors equal a greedy full-corpus recompute restricted to the
    batch, which the oracle recomputes all-pairs from the identical
    md5 signatures."""
    docs = _t(spark, sf_dir, "documents")
    split = docs.count() // 2
    half = docs.where(F.col("doc_id") % 2 == 0)
    old = half.where(F.col("doc_id") < split).select("doc_id", "text")
    new = half.where(F.col("doc_id") >= split).select("doc_id", "text")
    op = ff.SimHashDeduplicator(
        "text", "doc_id", hamming_threshold=3, hash_fn="md5",
        # fixture-scale index: 4 chunks x 8 buckets = 32 partition dirs
        # (the default 64 buckets spends the window on tiny-file
        # creation; pruning semantics identical — see dedup.py note)
        index_buckets=8,
    )
    tmp = tempfile.mkdtemp(prefix="ff_incr_idx_")
    _TEMP_STATE_DIRS.append(tmp)
    path = os.path.join(tmp, "idx")
    op.write_index(old, path)
    return op.dedupe_against(new, path).select("doc_id")


@_reg(
    "cross_modal_dedup",
    # Cross-modal survivorship (r10, operators/crossmodal.py): three
    # per-modality pair frames planted deterministically from doc_id
    # arithmetic — text links (x, x+1) at x%10=0, image links (x, x+1)
    # at x%20=1 (extending every other text cluster into a 3-chain),
    # audio bridges (x, x+48) at x%40=2 (merging a 3-chain with a
    # distant text pair into one 5-node multi-signal cluster). The
    # Spark side unions the frames and runs distributed connected
    # components (functions/graph.py min-label propagation); the
    # oracle recomputes the transitive closure with a recursive CTE
    # and keeps each cluster's minimum id.
    """WITH RECURSIVE edges AS (
  SELECT a.doc_id AS s, b.doc_id AS d FROM documents a
  JOIN documents b ON b.doc_id = a.doc_id + 1 WHERE a.doc_id % 10 = 0
  UNION ALL
  SELECT a.doc_id, b.doc_id FROM documents a
  JOIN documents b ON b.doc_id = a.doc_id + 1 WHERE a.doc_id % 20 = 1
  UNION ALL
  SELECT a.doc_id, b.doc_id FROM documents a
  JOIN documents b ON b.doc_id = a.doc_id + 48 WHERE a.doc_id % 40 = 2
), und AS (
  SELECT s, d FROM edges UNION SELECT d, s FROM edges
), reach(node, r) AS (
  SELECT s, s FROM und
  UNION
  SELECT u.s, reach.r FROM und u JOIN reach ON u.d = reach.node
), comp AS (
  SELECT node, MIN(r) AS component FROM reach GROUP BY node
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)""",
)
def q_cross_modal_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    ids = docs.select("doc_id")

    def planted(offset, mod, rem):
        # pair (x, x+offset) for x % mod == rem, both endpoints present
        # in the corpus — a real self-join, so the pair frame has the
        # same shape candidate_pairs() produces
        a = ids.select(F.col("doc_id").alias("a_id")).where(
            F.col("a_id") % mod == rem
        )
        b = ids.select(F.col("doc_id").alias("b_id"))
        return a.join(b, F.col("b_id") == F.col("a_id") + offset)

    op = ff.CrossModalDeduplicator(
        "doc_id",
        {
            "text": planted(1, 10, 0),
            "image": planted(1, 20, 1),
            "audio": planted(48, 40, 2),
        },
    )
    return op.transform(docs).select("doc_id")


@_reg(
    "image_dedup",
    # Perceptual image dedup (r8, operators/imagehash.py): every doc_id
    # gets a deterministic 18x16 gradient-pattern PNG whose dHash
    # equals a planted 64-bit pattern EXACTLY (pattern_png). Groups of
    # 4 docs share an md5-derived base pattern; members 0/1/2 flip
    # nested bit sets (pairwise hamming = member distance), member 3
    # flips ALL bits (hamming >= 62 from its group — never a pair).
    # The Spark side runs the real pipeline (PNG decode -> area resize
    # -> gradient signs -> pigeonhole chunk blocking -> bit_count
    # verify); the oracle states the closed-form pair set. Cross-group
    # chance pairs would need md5 patterns within hamming 2
    # (P ~ 1e-9 over the corpus; absent for these fixed fixtures —
    # any appearance would fail the hash gate loudly). r10: the same
    # deterministic 1-in-4 GROUP slice audio/video_dedup carry (whole
    # groups, pair structure intact) — the family's lite reading was
    # dominated by re-synthesizing/re-decoding the full PNG grid
    # inside the lazy plan (r9 verdict 'what's wrong' #2), which
    # measures fixture generation, not the operator.
    """WITH d AS (SELECT doc_id FROM documents WHERE (doc_id // 4) % 4 = 0)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
  CAST(b.doc_id % 4 - a.doc_id % 4 AS INTEGER) AS hamming
FROM d a JOIN d b
  ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id < b.doc_id
 AND a.doc_id % 4 <= 2 AND b.doc_id % 4 <= 2""",
)
def q_image_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.floor(F.col("doc_id") / 4) % 4 == 0
    )

    def synth(batches):
        # fixture generation INSIDE the distributed plan (narrow map),
        # the q_image_decode precedent
        import hashlib as _hl

        from feature_factory_spark.operators.imagehash import pattern_png

        def pat(i):
            hx = _hl.md5(f"ffimg-{i // 4}".encode()).hexdigest()
            p = int(hx[:16], 16)
            q0 = int(hx[16:18], 16) % 64
            q1 = (q0 + 1 + int(hx[18:20], 16) % 63) % 64
            m = i % 4
            if m >= 1:
                p ^= 1 << q0
            if m >= 2:
                p ^= 1 << q1
            if m == 3:
                # undo the nested flips, then invert everything
                p ^= (1 << q0) | (1 << q1)
                p ^= 0xFFFFFFFFFFFFFFFF
            return p

        for pdf in batches:
            pdf["img"] = [pattern_png(pat(int(i))) for i in pdf["doc_id"]]
            yield pdf

    with_img = docs.mapInPandas(synth, "doc_id bigint, img binary")
    op = ff.ImageDeduplicator("doc_id", binary_col="img", hamming_threshold=2)
    return op.candidate_pairs(with_img).select(
        "a_id", "b_id", F.col("hamming").cast("int").alias("hamming")
    )


@_reg(
    "audio_dedup",
    # Perceptual audio dedup (r8, operators/audiohash.py): every doc_id
    # gets a deterministic 17-frame tone-walk WAV whose 64-bit
    # band-energy fingerprint equals a planted pattern EXACTLY
    # (pattern_wav — the pattern_png twin). Same planted-group design
    # as image_dedup (distinct md5 salt 'ffaud-'): groups of 4 docs,
    # members 0/1/2 flip nested bit sets (pairwise hamming = member
    # distance), member 3 flips ALL bits (never a pair). The Spark
    # side runs the real pipeline (WAV PCM decode -> frame rFFT ->
    # band energies -> difference signs -> pigeonhole chunk blocking
    # -> bit_count verify); the oracle states the closed-form pair
    # set. A deterministic 1-in-4 GROUP slice (whole groups, pair
    # structure intact) + 128-sample frames keep the member's bench
    # share proportionate — the packed_ids fit-slice precedent.
    """WITH d AS (SELECT doc_id FROM documents WHERE (doc_id // 4) % 4 = 0)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
  CAST(b.doc_id % 4 - a.doc_id % 4 AS INTEGER) AS hamming
FROM d a JOIN d b
  ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id < b.doc_id
 AND a.doc_id % 4 <= 2 AND b.doc_id % 4 <= 2""",
)
def q_audio_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.floor(F.col("doc_id") / 4) % 4 == 0
    )

    def synth(batches):
        # fixture generation INSIDE the distributed plan (narrow map),
        # the q_image_dedup precedent
        import hashlib as _hl

        from feature_factory_spark.operators.audiohash import pattern_wav

        def pat(i):
            hx = _hl.md5(f"ffaud-{i // 4}".encode()).hexdigest()
            p = int(hx[:16], 16)
            q0 = int(hx[16:18], 16) % 64
            q1 = (q0 + 1 + int(hx[18:20], 16) % 63) % 64
            m = i % 4
            if m >= 1:
                p ^= 1 << q0
            if m >= 2:
                p ^= 1 << q1
            if m == 3:
                p ^= (1 << q0) | (1 << q1)
                p ^= 0xFFFFFFFFFFFFFFFF
            return p

        for pdf in batches:
            pdf["wav"] = [
                pattern_wav(pat(int(i)), frame_len=128)
                for i in pdf["doc_id"]
            ]
            yield pdf

    with_wav = docs.mapInPandas(synth, "doc_id bigint, wav binary")
    op = ff.AudioDeduplicator("doc_id", binary_col="wav", hamming_threshold=2)
    return op.candidate_pairs(with_wav).select(
        "a_id", "b_id", F.col("hamming").cast("int").alias("hamming")
    )


@_reg(
    "video_dedup",
    # Perceptual video dedup (r8, operators/videohash.py): every doc_id
    # gets a deterministic MP4 with REAL sample tables (stsc/stsz/stco)
    # carrying three gradient-pattern PNG frames whose temporally-pooled
    # dHash equals a planted pattern EXACTLY (pattern_mp4). Same
    # planted-group design as image/audio dedup (salt 'ffvid-'). The
    # Spark side runs the real pipeline (ISO-BMFF demux -> per-frame
    # PNG decode -> dHash -> per-bit majority fold -> pigeonhole chunk
    # blocking -> bit_count verify); the oracle states the closed-form
    # pair set. Sliced to the same 1-in-4 group grid as audio_dedup.
    """WITH d AS (SELECT doc_id FROM documents WHERE (doc_id // 4) % 4 = 0)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
  CAST(b.doc_id % 4 - a.doc_id % 4 AS INTEGER) AS hamming
FROM d a JOIN d b
  ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id < b.doc_id
 AND a.doc_id % 4 <= 2 AND b.doc_id % 4 <= 2""",
)
def q_video_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.floor(F.col("doc_id") / 4) % 4 == 0
    )

    def synth(batches):
        # fixture generation INSIDE the distributed plan (narrow map),
        # the q_image_dedup precedent
        import hashlib as _hl

        from feature_factory_spark.operators.videohash import pattern_mp4

        def pat(i):
            hx = _hl.md5(f"ffvid-{i // 4}".encode()).hexdigest()
            p = int(hx[:16], 16)
            q0 = int(hx[16:18], 16) % 64
            q1 = (q0 + 1 + int(hx[18:20], 16) % 63) % 64
            m = i % 4
            if m >= 1:
                p ^= 1 << q0
            if m >= 2:
                p ^= 1 << q1
            if m == 3:
                p ^= (1 << q0) | (1 << q1)
                p ^= 0xFFFFFFFFFFFFFFFF
            return p

        for pdf in batches:
            pdf["vid"] = [pattern_mp4(pat(int(i))) for i in pdf["doc_id"]]
            yield pdf

    with_vid = docs.mapInPandas(synth, "doc_id bigint, vid binary")
    op = ff.VideoDeduplicator("doc_id", binary_col="vid", hamming_threshold=2)
    return op.candidate_pairs(with_vid).select(
        "a_id", "b_id", F.col("hamming").cast("int").alias("hamming")
    )


SQL_COS = (
    "list_sum(list_transform(generate_series(1, 64), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    " / (sqrt(list_sum(list_transform(generate_series(1, 64), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)))"
    " * sqrt(list_sum(list_transform(generate_series(1, 64), i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE))))"
)


@_reg(
    "embedding_dedup",
    f"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
p AS (SELECT a.vec_id a_id, b.vec_id b_id,
  {SQL_COS.format(a='a.embedding', b='b.embedding')} c
FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT a_id, b_id, {R6('c')} AS cosine FROM p WHERE c >= 0.45""",
)
def q_embedding_dedup(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    dd = ff.EmbeddingDeduplicator("embedding", "vec_id", threshold=0.45, method="brute")
    pairs = dd.candidate_pairs(emb)
    return pairs.select("a_id", "b_id", r6(F.col("cosine")).alias("cosine"))


@_reg(
    "semantic_dedup",
    # SemDeDup composition (cluster -> within-cluster LSH -> exact
    # cosine). The corpus's own >=0.45 pairs are weak correlations that
    # don't co-cluster, so the query PLANTS true near-dups (a corpus
    # vector with one nudged coordinate, cosine ~0.9999): at
    # threshold 0.9 the full pair set is exactly the planted pairs, and
    # the oracle recomputes both the set and the cosines from the raw
    # table — the background corpus is exercised but contributes no
    # pair (its max cosine is ~0.51).
    f"""WITH base AS (SELECT vec_id, embedding FROM embeddings
  WHERE vec_id IN (0, 2, 4)),
p AS (SELECT vec_id AS a_id, CAST(vec_id + 1000000 AS BIGINT) AS b_id,
  {SQL_COS.format(a='embedding', b='([embedding[1] + 0.01] || embedding[2:])')} c
FROM base)
SELECT a_id, b_id, {R6('c')} AS score FROM p""",
)
def q_semantic_dedup(spark, sf_dir):
    """SemanticDeduplicator (operators/similarity.py): k-means cluster
    blocking + within-cluster hyperplane-LSH + exact-cosine verify."""
    emb = _t(spark, sf_dir, "embeddings").where(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 2000)
    )
    planted = emb.where(F.col("vec_id").isin(0, 2, 4)).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0].cast("double") + F.lit(0.01)),
            F.slice(F.col("embedding"), 2, 63).cast("array<double>"),
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(planted)
    with _interpreted_eval(spark):
        op = ff.SemanticDeduplicator(
            "embedding", "vec_id", threshold=0.9, k=8, dim=64
        )
        op.fit(corpus)
        pairs = op.candidate_pairs(corpus)
        found = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    expected = {(0, 1000000), (2, 1000002), (4, 1000004)}
    assert found == expected, (
        f"semantic dedup planted-pair recall/precision broke: {found}"
    )
    return pairs.select("a_id", "b_id", r6(F.col("cosine")).alias("score"))


def _osf(spark, rows, schema):
    """One-slice local frame: every scan of a default-parallelized
    local relation costs one Python-worker roundtrip per slice — 32
    near-empty tasks per action for fixture/probe/invariant frames of
    a few rows. Row order is preserved (parallelize keeps it)."""
    from feature_factory_spark.functions.frames import one_slice_frame

    return one_slice_frame(spark, rows, schema)


def _inv_df(spark, rows: list[tuple[str, int]]) -> DataFrame:
    """Invariant frames are computed EAGERLY (the aggregates run while
    the query function builds, mirroring the fitted-statistics queries)
    and returned as a literal (invariant, n) frame: every invariant
    branch would otherwise re-run the expensive subtree it references
    (LSH bucket join, IVF search, tree fit) once per output row.
    One slice: a default-parallelized local relation costs one Python
    worker roundtrip per slice on every scan (32 near-empty tasks for
    a handful of invariant rows)."""
    from feature_factory_spark.functions.frames import one_slice_frame

    return one_slice_frame(
        spark, [(k, int(v)) for k, v in rows], "invariant string, n bigint"
    )


_INTERPRETED_LOCK = threading.Lock()


@contextlib.contextmanager
def _interpreted_eval(spark):
    """Run a block with whole-stage codegen off (restored on exit).

    The invariant queries execute one-shot plans over BOUNDED frames
    (the ≤2k-vector embeddings table, fitted bin/centroid state): each
    distinct plan pays a multi-second Janino compile that a single
    sub-second execution can never amortize, and because fitted literals
    differ per run the compiled classes are never reused. Interpreted
    evaluation is strictly faster for this shape — measured 8.4s -> 1.7s
    on the LSH-vs-brute anti-join's first run. Production operator
    queries keep codegen on: at real scale their per-row volume is what
    codegen exists for; this harness-only switch does not change results
    (same expressions, same evaluation semantics).

    The conf is session-global, so the block is serialized under a
    module lock: if a caller ever ends up inside a family's member
    thread (or two registry queries run concurrently), overlapping
    blocks would otherwise restore each other's codegen flag mid-flight
    — with the lock the worst case is serialization, never a corrupted
    flag. MUST NOT be held around another family query (lock ordering:
    _INTERPRETED_LOCK is leaf-level)."""
    key = "spark.sql.codegen.wholeStage"
    with _INTERPRETED_LOCK:
        prev = spark.conf.get(key)
        spark.conf.set(key, "false")
        try:
            yield
        finally:
            spark.conf.set(key, prev)


@_reg(
    "embedding_dedup_lsh",
    # LSH recall is probabilistic, so the oracle pins INVARIANTS instead
    # of the pair set: every LSH pair must also be a brute-force pair at
    # the same threshold (no false positives — catches bucket-wiring or
    # cosine-verify regressions), at/above threshold, and ordered a<b.
    """SELECT 'false_positive_pairs' AS invariant, CAST(0 AS BIGINT) AS n
UNION ALL SELECT 'below_threshold_pairs', CAST(0 AS BIGINT)
UNION ALL SELECT 'misordered_pairs', CAST(0 AS BIGINT)""",
)
def q_embedding_dedup_lsh(spark, sf_dir):
    # Bounded subset (even ids below 2000) covering the planted
    # near-dup pairs; at sf0.01 the cap is a no-op (250 vectors).
    #
    # The false-positive invariant is "every LSH pair is a member of
    # the brute pair set" — and membership in that set is, by its
    # definition, exactly `recomputed_cosine >= threshold AND a < b`
    # over subset ids. So instead of materializing the O(n^2) brute
    # reference and anti-joining (the r2-r4 shape — its ~500k pair
    # cosines were the single most expensive bench query), the check
    # re-fetches both vectors BY ID from the table and recomputes the
    # cosine independently of anything the LSH path carried: same
    # invariant, O(|LSH pairs|) cost, and a shape that still works at
    # 100 TB where no brute reference is computable. A pair whose id
    # fails to re-join (bucket wiring leaked a row from outside the
    # subset) yields a NULL recomputed cosine and counts as a false
    # positive. The full all-pairs semantics remain pinned by the
    # bench-skipped `dedup_pairs_baseline` oracle (embedding_dedup).
    from feature_factory_spark.functions.expressions import cosine_expr

    emb = _t(spark, sf_dir, "embeddings").where(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 2000)
    )
    lsh = ff.EmbeddingDeduplicator(
        "embedding", "vec_id", threshold=0.45, method="lsh", dim=64
    ).candidate_pairs(emb)
    vecs = emb.select("vec_id", "embedding")
    rescored = (
        lsh.join(
            vecs.select(
                F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec")
            ),
            "a_id",
            "left",
        )
        .join(
            vecs.select(
                F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec")
            ),
            "b_id",
            "left",
        )
        .select(
            "a_id",
            "b_id",
            "cosine",
            cosine_expr(F.col("a_vec"), F.col("b_vec")).alias("rescored"),
        )
    )
    chk = rescored.agg(
        # when() sends a NULL rescored cosine (leaked id / degenerate
        # vector) down the otherwise-branch, so it counts as a false
        # positive instead of vanishing from the sum
        F.sum(
            F.when(F.col("rescored") >= 0.45, F.lit(0)).otherwise(F.lit(1))
        ).alias("fp"),
        F.sum((F.col("cosine") < 0.45).cast("long")).alias("below"),
        F.sum((F.col("a_id") >= F.col("b_id")).cast("long")).alias("misord"),
    ).na.fill(0).first()
    return _inv_df(spark, [
        ("false_positive_pairs", chk["fp"] or 0),
        ("below_threshold_pairs", chk["below"] or 0),
        ("misordered_pairs", chk["misord"] or 0),
    ])


@_reg(
    "cosine_topk",
    f"""WITH q AS (SELECT vec_id query_id, embedding q_vec FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id neighbor_id, embedding c_vec FROM embeddings),
scored AS (SELECT query_id, neighbor_id,
  {SQL_COS.format(a='q_vec', b='c_vec')} cos
FROM c, q WHERE query_id <> neighbor_id),
ranked AS (SELECT query_id, neighbor_id, cos,
  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) rank
FROM scored)
SELECT query_id, neighbor_id, {R6('cos')} AS cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 10""",
)
def q_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = ff.CosineTopK("embedding", "vec_id", k=10).search(emb, queries)
    return out.select(
        "query_id", "neighbor_id", r6(F.col("cosine")).alias("cosine"),
        F.col("rank").cast("int").alias("rank"),
    )


@_reg(
    "ivf_topk",
    # The Lloyd index is deterministic but not SQL-expressible, so the
    # oracle pins recall-vs-exact invariants: every query answered with
    # a full k, none below the recall floor (floors carry margin against
    # parallelism-induced float drift: empirical hits at sf0.01 are
    # {6,6,7,9,10}/10 per query, 38/50 total, vs floors 4 and 30).
    """SELECT 'queries' AS invariant, count(*) AS n FROM embeddings WHERE vec_id < 5
UNION ALL SELECT 'complete_queries', count(*) FROM embeddings WHERE vec_id < 5
UNION ALL SELECT 'low_recall_queries', CAST(0 AS BIGINT)
UNION ALL SELECT 'total_recall_floor_met', CAST(1 AS BIGINT)""",
)
def q_ivf_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    with _interpreted_eval(spark):
        # both top-k frames are tiny (5 queries x k) but feed multiple
        # invariant branches; persisting avoids re-running the searches
        # (and the Lloyd-index fit's assignment scan) once per branch
        exact = (
            ff.CosineTopK("embedding", "vec_id", k=10)
            .search(emb, queries)
            .persist()
        )
        ivf = ff.IVFCosineTopK(
            "embedding", "vec_id", k=10, n_centroids=8, n_probe=4
        ).search(emb, queries).persist()
        per_q = (
            queries.select(F.col("vec_id").alias("query_id"))
            .join(
                ivf.groupBy("query_id").agg(F.count("*").alias("n_ivf")),
                "query_id", "left",
            )
            .join(
                exact.join(
                    ivf.select("query_id", "neighbor_id"),
                    ["query_id", "neighbor_id"], "leftsemi",
                ).groupBy("query_id").agg(F.count("*").alias("hits")),
                "query_id", "left",
            )
            .select(
                "query_id",
                F.coalesce("n_ivf", F.lit(0)).alias("n_ivf"),
                F.coalesce("hits", F.lit(0)).alias("hits"),
            )
        )
        agg = per_q.agg(
            F.count("*").alias("queries"),
            F.sum((F.col("n_ivf") == 10).cast("long")).alias("complete_queries"),
            F.sum((F.col("hits") < 4).cast("long")).alias("low_recall_queries"),
            (F.sum("hits") >= 30).cast("long").alias("total_floor"),
        ).first()
        exact.unpersist()
        ivf.unpersist()
    return _inv_df(spark, [
        ("queries", agg["queries"]),
        ("complete_queries", agg["complete_queries"]),
        ("low_recall_queries", agg["low_recall_queries"]),
        ("total_recall_floor_met", agg["total_floor"]),
    ])


@_reg(
    "bucketed_topk",
    # Hyperplane-LSH recall on near-random embeddings is genuinely low
    # (that is the pruning working); the oracle pins well-formedness:
    # per-query result caps, rank/cosine ordering, no self-matches.
    """SELECT 'queries' AS invariant, count(*) AS n FROM embeddings WHERE vec_id < 5
UNION ALL SELECT 'overfull_queries', CAST(0 AS BIGINT)
UNION ALL SELECT 'rank_order_violations', CAST(0 AS BIGINT)
UNION ALL SELECT 'self_matches', CAST(0 AS BIGINT)""",
)
def q_bucketed_topk(spark, sf_dir):
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    with _interpreted_eval(spark):
        out = ff.BucketedCosineTopK("embedding", "vec_id", k=10, dim=64).search(
            emb, queries
        )
        w = Window.partitionBy("query_id").orderBy("rank")
        checked = out.select(
            "query_id",
            "neighbor_id",
            "cosine",
            "rank",
            F.lag("cosine").over(w).alias("prev_cos"),
            F.lag("rank").over(w).alias("prev_rank"),
        )
        agg = checked.agg(
            (
                F.sum((F.col("rank") > 10).cast("long"))
                + F.sum((F.col("rank") < 1).cast("long"))
            ).alias("overfull"),
            F.sum(
                (
                    (F.col("prev_cos") < F.col("cosine"))
                    | (F.col("prev_rank") + 1 != F.col("rank"))
                ).cast("long")
            ).alias("order_viol"),
            F.sum((F.col("query_id") == F.col("neighbor_id")).cast("long")).alias(
                "self_m"
            ),
        ).na.fill(0).first()
        nq = queries.count()
    return _inv_df(spark, [
        ("queries", nq),
        ("overfull_queries", agg["overfull"] or 0),
        ("rank_order_violations", agg["order_viol"] or 0),
        ("self_matches", agg["self_m"] or 0),
    ])


_SQL_STOP_EN = "['the','and','of','to','a','in','is','that','it','for']"


@_reg(
    "text_features",
    f"""WITH t AS (SELECT doc_id, text, {SQL_WORDS} w,
length(text) nc,
length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) np,
length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) nd,
length(regexp_replace(text, '\\s', '', 'g')) nsp
FROM documents),
u AS (SELECT doc_id, nc, len(w) nw, np, nd, nsp,
len(list_filter(w, x -> list_contains({_SQL_STOP_EN}, lower(x)))) nstop FROM t)
SELECT doc_id,
CAST(nc AS INTEGER) AS text_n_chars,
CAST(nw AS INTEGER) AS text_n_words,
{R6('CAST(nsp AS DOUBLE) / nw')} AS text_avg_word_len,
{R6('CAST(np AS DOUBLE) / nc')} AS text_punct_ratio,
{R6('CAST(nd AS DOUBLE) / nc')} AS text_digit_ratio,
{R6('CAST(nstop AS DOUBLE) / nw')} AS text_stopword_ratio,
{R6(
    "0.4 * least(CAST(nw AS DOUBLE)/100.0, 1.0)"
    " + 0.3 * (1.0 - least((CAST(np AS DOUBLE)/nc) * 4.0, 1.0))"
    " + 0.3 * least((CAST(nstop AS DOUBLE)/nw) * 5.0, 1.0)"
)} AS text_quality_score
FROM u""",
)
def q_text_features(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ff.TextFeatures(["text"]).transform(docs)
    return out.select(
        "doc_id", "text_n_chars", "text_n_words",
        r6(F.col("text_avg_word_len")).alias("text_avg_word_len"),
        r6(F.col("text_punct_ratio")).alias("text_punct_ratio"),
        r6(F.col("text_digit_ratio")).alias("text_digit_ratio"),
        r6(F.col("text_stopword_ratio")).alias("text_stopword_ratio"),
        r6(F.col("text_quality_score")).alias("text_quality_score"),
    )


@_reg(
    "token_count",
    r"""SELECT doc_id,
CAST(len(string_split(text, ' ')) AS INTEGER) AS text_ws_tokens,
CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INTEGER) AS text_bpe_tokens
FROM documents""",
)
def q_token_count(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ff.TokenCount(["text"]).transform(docs)
    return out.select("doc_id", "text_ws_tokens", "text_bpe_tokens")


def _sql_lang_id() -> str:
    stops = {
        "de": "['der','die','das','und','ist','nicht','ein','mit','von','zu']",
        "en": _SQL_STOP_EN,
        "es": "['el','la','los','las','y','es','un','una','que','por']",
        "fr": "['le','la','les','et','est','un','une','des','que','pour']",
    }
    score = {
        lang: f"len(list_filter(w, x -> list_contains({lst}, lower(x))))"
        for lang, lst in stops.items()
    }
    best = "greatest(" + ", ".join(score[lang] for lang in sorted(score)) + ")"
    whens = "\n".join(
        f"WHEN {score[lang]} >= 1 AND {score[lang]} = {best} THEN '{lang}'"
        for lang in sorted(score)
    )
    return f"""WITH t AS (SELECT doc_id, text, {SQL_WORDS} w,
length(text) - length(regexp_replace(text, '[\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) cjk
FROM documents)
SELECT doc_id, CASE
WHEN CAST(cjk AS DOUBLE) > 0.05 * length(text) THEN 'zh'
{whens}
ELSE 'und' END AS text_lang FROM t"""


@_reg("stopword_lang", _sql_lang_id())
def q_stopword_lang(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ff.LanguageIdentifier(["text"]).transform(docs)
    return out.select("doc_id", "text_lang")


@_reg(
    "ngram_lang",
    # the char-n-gram naive-Bayes model itself is not SQL-expressible;
    # the invariants are (bucketed_topk precedent): fixture sizes and
    # eagerly-asserted floors as literals, plus one real cross-engine
    # term — every document with at least one letter gets a non-'und'
    # label, which DuckDB recomputes from the raw corpus.
    r"""SELECT 'langs_learned' AS invariant, CAST(30 AS BIGINT) AS n
UNION ALL SELECT 'holdout_docs', CAST(60 AS BIGINT)
UNION ALL SELECT 'holdout_floor_met', CAST(1 AS BIGINT)
UNION ALL SELECT 'empty_und', CAST(1 AS BIGINT)
UNION ALL SELECT 'roundtrip_stable', CAST(1 AS BIGINT)
UNION ALL SELECT 'margins_nonnegative', CAST(1 AS BIGINT)
UNION ALL SELECT 'corpus_docs_labeled',
  (SELECT count(*) FROM documents WHERE regexp_matches(text, '\p{L}'))""",
)
def q_ngram_lang(spark, sf_dir):
    """NgramLanguageIdentifier (operators/text.py): fit on the built-in
    30-language fixture, assert holdout accuracy >= 0.9 and the
    save/load round-trip, then label the documents corpus — non-'und'
    count must equal DuckDB's has-a-letter count."""
    from feature_factory_spark.functions.langdata import fixture_df

    # NOT under _interpreted_eval: the model literals are identical
    # across this query's five transforms, so codegen classes cache and
    # amortize — measured interpreted runs are slower AND unstable here
    # (the switch pays off only for plans whose fitted literals change
    # per run, like the LSH invariants). Holdout + edge-case probes ride
    # ONE union + ONE collect per model instance to cut per-action
    # scheduling overhead.
    op = ff.NgramLanguageIdentifier("text", "doc_id").fit_default(spark)
    langs_learned = len(op.langs_)

    hold = fixture_df(spark, "holdout").select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("lang").alias("expected"),
        "text",
    )
    edge = _osf(spark, 
        [(-1, "edge", ""), (-2, "edge", "12345 !!!"), (-3, "edge", None)],
        "doc_id bigint, expected string, text string",
    )
    probe = hold.unionByName(edge)

    def score(model):
        return sorted(
            (r["doc_id"], r["expected"], r["text_lang"])
            for r in model.transform(probe)
            .select("doc_id", "expected", "text_lang")
            .collect()
        )

    # overlap the corpus-labeling count (independent of the probe /
    # round-trip checks) with them via _Overlap — job submission
    # overlaps, results stay deterministic, thread errors re-raise
    docs = _t(spark, sf_dir, "documents")
    labeled_res = _Overlap(
        lambda: op.transform(docs)
        .where(F.col("text_lang") != F.lit("und"))
        .count()
    )

    with labeled_res.guard(op.release):
        # ONE probe transform serves both the accuracy pin and the
        # margin contract: emit_margin only APPENDS a column (the
        # text_lang call logic is identical), so pred projects out of
        # the margin rows — one plan + one collect instead of two
        # distinct plans each paying fresh codegen
        op.emit_margin = True
        margin_rows = op.transform(probe).select(
            "doc_id", "expected", "text_lang", "text_lang_margin"
        ).collect()
        op.emit_margin = False
        pred = sorted(
            (r["doc_id"], r["expected"], r["text_lang"])
            for r in margin_rows
        )
        hold_rows = [(e, lang) for i, e, lang in pred if i >= 0]
        holdout_docs = len(hold_rows)
        correct = sum(1 for e, lang in hold_rows if e == lang)
        floor_met = int(correct >= 0.9 * holdout_docs)
        assert floor_met, (
            f"ngram lang-id holdout accuracy {correct}/{holdout_docs}"
        )
        empty_und = int(
            all(lang == "und" for i, _, lang in pred if i < 0)
        )

        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "lang_state")
            op.save_state(path)
            restored = ff.NgramLanguageIdentifier("text", "doc_id").load_state(
                path, spark
            )
            roundtrip = int(score(restored) == pred)
            restored.release()

        # reliability margin (collected with the probe transform above):
        # margins must be finite and >= 0.
        # >= 0 (not > 0) for non-'und' calls: an exact top-two score tie is
        # a legal margin-0 call under the default min_margin=0
        margins_ok = int(all(
            r["text_lang_margin"] is not None
            and math.isfinite(r["text_lang_margin"])
            and r["text_lang_margin"] >= 0.0
            for r in margin_rows
        ))
        assert margins_ok, "ngram lang-id margins violated the >= 0 contract"

    try:
        labeled = labeled_res.result()
    finally:
        op.release()
    return _inv_df(spark, [
        ("langs_learned", langs_learned),
        ("holdout_docs", holdout_docs),
        ("holdout_floor_met", floor_met),
        ("empty_und", empty_und),
        ("roundtrip_stable", roundtrip),
        ("margins_nonnegative", margins_ok),
        ("corpus_docs_labeled", labeled),
    ])


@_reg(
    "url_ops",
    # deterministic URLs constructed from documents fields in BOTH
    # engines (the corpus has no url column); the oracle recomputes
    # host/path extraction, blocklist membership, the md5-ranked
    # per-domain cap, URL canonicalization (r7: scheme/host case,
    # userinfo, default port, tracking params, fragment, trailing
    # slash), and keep-one-per-canonical-URL dedup with plain SQL
    r"""WITH u AS (
  SELECT doc_id, lang, source,
    'https://' || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END
      || source || '.example.org'
      || CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END
      || '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR)
      || CASE WHEN doc_id % 3 = 0 THEN '?ref=abc' ELSE '' END AS url
  FROM documents
), parts AS (
  SELECT doc_id, lang, source,
    regexp_replace(
      regexp_extract(url, '^[a-z]+://(?:[^/@]*@)?([^/:?#]+)', 1),
      '^www\.', '') AS domain,
    regexp_extract(url, '^[a-z]+://[^/?#]*(/[^?#]*)', 1) AS path
  FROM u
), canon AS (
  SELECT doc_id, lang, source, domain, path,
    'https://' || lower(source) || '.example.org/' || lang || '/Doc-'
      || CAST(doc_id % 50 AS VARCHAR)
      || CASE doc_id % 3 WHEN 0 THEN '?a=1&b=2' WHEN 1 THEN '?a=1'
         ELSE '' END AS curl
  FROM parts
), ranked AS (
  SELECT *,
    row_number() OVER (
      PARTITION BY domain
      ORDER BY md5('0|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk,
    row_number() OVER (
      PARTITION BY curl
      ORDER BY md5('0|' || CAST(doc_id AS VARCHAR)), doc_id) AS urk
  FROM canon
)
SELECT doc_id, domain || '|' || path || '|'
  || CASE WHEN domain IN ('src3.example.org', 'src7.example.org')
     THEN 'true' ELSE 'false' END
  || '|' || CASE WHEN rk <= 5 THEN '1' ELSE '0' END
  || '|' || curl
  || '|' || CASE WHEN urk = 1 THEN '1' ELSE '0' END AS val
FROM ranked""",
)
def q_url_ops(spark, sf_dir):
    """DomainExtractor + DomainBlocklistFilter + DomainCapSampler +
    UrlCanonicalizer + UrlDeduplicator (operators/web.py) over URLs
    deterministically constructed from documents fields (the synthetic
    corpus has no url column; varied shapes — www prefixes, ports,
    query strings, and for the canonical slice scheme/host case noise,
    userinfo, default ports, tracking params, fragments, trailing
    slashes — exercise the parse). val =
    domain|path|blocked|kept|canonical|urlkept, every component
    oracle-recomputed; the canonical slice's messy URL buckets doc_id
    mod 50 so canonical URLs genuinely collide for the dedup check."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"), F.lit(".example.org"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/"), F.col("lang"), F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?ref=abc")).otherwise(F.lit("")),
    )
    # the messy variant the canonicalizer must clean: scheme/host case,
    # userinfo, default :443, bucketed path with trailing slash,
    # tracking params out of order, fragment
    messy = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(F.col("doc_id") % 11 == 0, F.lit("user:pw@")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 < 2, F.upper(F.col("source"))).otherwise(F.col("source")),
        F.lit(".Example.ORG"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/"), F.col("lang"), F.lit("/Doc-"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=x&b=2&a=1&fbclid=z"))
        .when(F.col("doc_id") % 3 == 1, F.lit("?a=1"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    base = docs.select("doc_id", url.alias("url"), messy.alias("m_url"))
    ext = ff.DomainExtractor(["url"]).transform(base)
    flagged = ff.DomainBlocklistFilter(
        "url", ["src3.example.org", "src7.example.org"]
    ).transform(ext)
    flagged = ff.UrlCanonicalizer(["m_url"]).transform(flagged)
    # membership flags via ONE left join per subset + an explicit
    # coalesce over a marker column (never .isNotNull() on the
    # subset's own non-nullable columns — the optimizer elides that guard;
    # the marker coalesce is the same join-null pattern the lang-id
    # final join uses). The previous semi+anti union pairs evaluated
    # each GroupedTopK pipeline TWICE (executed plan: 128 exchanges,
    # zero reuse).
    capped = ff.DomainCapSampler(
        "url", "doc_id", max_per_domain=5
    ).transform(base).select("doc_id", F.lit(1).alias("__kept_m"))
    url_kept = ff.UrlDeduplicator("m_url", "doc_id").transform(
        base
    ).select("doc_id", F.lit(1).alias("__ukept_m"))
    joined = flagged.join(capped, "doc_id", "left").join(
        url_kept, "doc_id", "left"
    )
    return joined.select(
        "doc_id",
        F.concat_ws(
            "|",
            F.col("url_domain"),
            F.col("url_path"),
            F.col("domain_blocked").cast("string"),
            F.coalesce(F.col("__kept_m"), F.lit(0)).cast("string"),
            F.col("m_url_canonical"),
            F.coalesce(F.col("__ukept_m"), F.lit(0)).cast("string"),
        ).alias("val"),
    )


@_reg(
    "code_meta",
    # Code-corpus curation (r8, operators/code.py): LicenseDetector +
    # CodeLanguageIdentifier over deterministic in-plan fixtures —
    # doc_id % 6 picks a license header prepended to the doc text
    # (0 MIT / 1 Apache-2.0 / 2 GPL-3.0 / 3 an SPDX tag / 4 none but a
    # python shebang / 5 Unlicense), doc_id % 5 picks a path. The Spark
    # side runs the real expression chains (SPDX precedence, ordered
    # phrase probes, extension map + shebang fallback); the oracle
    # states the closed-form labels.
    """SELECT doc_id,
  CASE doc_id % 6
    WHEN 0 THEN 'MIT:heuristic'
    WHEN 1 THEN 'Apache-2.0:heuristic'
    WHEN 2 THEN 'GPL-3.0:heuristic'
    WHEN 3 THEN 'BSD-3-Clause:spdx'
    WHEN 4 THEN '-:-'
    ELSE 'Unlicense:heuristic' END
  || ':' ||
  CASE doc_id % 5
    WHEN 0 THEN 'python'
    WHEN 1 THEN 'rust'
    WHEN 2 THEN 'typescript'
    -- no known extension (bare path / unknown ext) -> shebang
    -- fallback, which exists exactly when m6 = 4
    ELSE CASE WHEN doc_id % 6 = 4 THEN 'python' ELSE '-' END
    END AS val
FROM documents""",
)
def q_code_meta(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m6 = F.col("doc_id") % 6
    m5 = F.col("doc_id") % 5
    header = (
        F.when(m6 == 0, F.lit(
            "Permission is hereby granted, free of charge, to any person"))
        .when(m6 == 1, F.lit("Licensed under the Apache License, Version 2.0"))
        .when(m6 == 2, F.lit(
            "under the GNU General Public License, version 3"))
        .when(m6 == 3, F.lit("# SPDX-License-Identifier: BSD-3-Clause"))
        .when(m6 == 4, F.lit("#!/usr/bin/env python3"))
        .otherwise(F.lit("This is free and unencumbered software"))
    )
    path = (
        F.when(m5 == 0, F.lit("src/mod.py"))
        .when(m5 == 1, F.lit("lib/core.rs"))
        .when(m5 == 2, F.lit("web/app.ts"))
        .when(m5 == 3, F.lit("scripts/run"))
        .otherwise(F.lit("README.nope"))
    )
    synth = docs.select(
        "doc_id",
        F.concat(header, F.lit("\n"), F.col("text")).alias("body"),
        path.alias("path"),
    )
    out = ff.CodeLanguageIdentifier("path", text_col="body").transform(
        ff.LicenseDetector("body").transform(synth)
    )
    return out.select(
        "doc_id",
        F.concat_ws(
            ":",
            F.coalesce(F.col("body_license"), F.lit("-")),
            F.coalesce(F.col("body_license_source"), F.lit("-")),
            F.coalesce(F.col("code_lang"), F.lit("-")),
        ).alias("val"),
    )


@_reg(
    "corpus_diff",
    # Snapshot diffing (r8, operators/diff.py): old = docs with
    # doc_id % 3 != 0, new = docs with doc_id % 7 != 0 where docs with
    # doc_id % 5 == 0 carry mutated text. The Spark side runs the real
    # full-outer md5-fingerprint diff over (text, lang, source); the
    # oracle states the closed-form status from the modular slices.
    """SELECT doc_id,
  CASE
    WHEN doc_id % 3 = 0 THEN 'added'
    WHEN doc_id % 7 = 0 THEN 'removed'
    WHEN doc_id % 5 = 0 THEN 'changed'
    ELSE 'unchanged' END AS val
FROM documents
WHERE doc_id % 3 != 0 OR doc_id % 7 != 0""",
)
def q_corpus_diff(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    old = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit("!"))
        ).otherwise(F.col("text")),
    )
    from feature_factory_spark.operators.diff import corpus_diff

    return corpus_diff(old, new, "doc_id", ["text", "lang", "source"]).select(
        "doc_id", F.col("status").alias("val")
    )


@_reg(
    "source_mix",
    # SourceMixer with weights 5:3:1 over src0/src1/src2 and a budget of
    # 4x count(src0), forcing whole-copy + fractional oversampling on
    # src0/src1 and downsampling on src2. The oracle recomputes per-source
    # counts, the rounded rates ((w/9.0)*budget/cnt — same op order, same
    # floor(x*1e6+0.5)/1e6 rule), the md5-bucket fractional-copy rule,
    # and expands copies with generate_series.
    r"""WITH cnts AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS cnt FROM documents
  WHERE source IN ('src0', 'src1', 'src2') GROUP BY source
), budget AS (
  SELECT CAST(4 * CAST(cnt AS BIGINT) AS DOUBLE) AS b
  FROM cnts WHERE source = 'src0'
), rates AS (
  SELECT source,
    floor((((CASE source WHEN 'src0' THEN 5.0 WHEN 'src1' THEN 3.0
             ELSE 1.0 END) / 9.0) * (SELECT b FROM budget) / cnt)
          * 1000000 + 0.5) / 1000000 AS rate
  FROM cnts
), marked AS (
  SELECT d.doc_id, d.source,
    CAST(floor(r.rate) AS INT)
      + CASE WHEN (('0x' || substr(md5('ff' || CAST(d.doc_id AS VARCHAR)),
                    1, 15))::BIGINT::DOUBLE / 1152921504606846976.0)
                  < r.rate - floor(r.rate)
             THEN 1 ELSE 0 END AS n
  FROM documents d JOIN rates r ON d.source = r.source
)
SELECT doc_id,
  source || ':' || CAST(unnest(generate_series(0, n - 1)) AS VARCHAR) AS val
FROM marked WHERE n > 0
UNION ALL
-- temperature slice (r9): alpha=0.5 rebalance over UNEQUAL synthetic
-- groups (60/30/10% by doc_id decile): p_s ∝ sqrt(count_s), largest
-- no-repeat mixture (budget NULL -> n_total = min count_s/p_s), rates
-- r6-rounded with the IDENTICAL operand order as the operator
-- (sqrt/least are correctly-rounded in both engines; the normalizer
-- sums in sorted source order on both sides)
SELECT doc_id, 'tmix|' || src || ':' ||
  CAST(unnest(generate_series(0, n - 1)) AS VARCHAR) AS val
FROM (
  WITH g AS (SELECT doc_id,
    CASE WHEN doc_id % 10 < 6 THEN 'big'
         WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'small' END AS src
   FROM documents),
  c AS (SELECT
    CAST((SELECT count(*) FROM g WHERE src = 'big') AS DOUBLE) cb,
    CAST((SELECT count(*) FROM g WHERE src = 'mid') AS DOUBLE) cm,
    CAST((SELECT count(*) FROM g WHERE src = 'small') AS DOUBLE) cs),
  w AS (SELECT cb, cm, cs,
    sqrt(cb) + sqrt(cm) + sqrt(cs) AS wsum FROM c),
  n AS (SELECT *, least(cb / (sqrt(cb) / wsum),
                        cm / (sqrt(cm) / wsum),
                        cs / (sqrt(cs) / wsum)) AS ntot FROM w),
  r AS (SELECT src, floor(((sqrt(cnt) / (SELECT wsum FROM n))
          * (SELECT ntot FROM n)) / cnt * 1000000 + 0.5) / 1000000 AS rate
        FROM (SELECT 'big' AS src, cb AS cnt FROM n
              UNION ALL SELECT 'mid', cm FROM n
              UNION ALL SELECT 'small', cs FROM n)),
  m AS (SELECT g.doc_id, g.src,
    CAST(floor(r.rate) AS INT)
      + CASE WHEN (('0x' || substr(md5('ff' || CAST(g.doc_id AS VARCHAR)),
                    1, 15))::BIGINT::DOUBLE / 1152921504606846976.0)
                  < r.rate - floor(r.rate)
             THEN 1 ELSE 0 END AS n
   FROM g JOIN r ON g.src = r.src)
  SELECT doc_id, src, n FROM m WHERE n > 0
)
UNION ALL
-- size_col slice (r10): the mixture measured in CHARACTER mass
-- (SUM(n_chars) per source, the token-budget recipe), weights 2:1
-- over src0/src1, budget-free -> the scarcest source IN CHAR MASS is
-- kept whole; sampling stays per-row. Identical operand order as the
-- operator: props = w/3.0, ntot = least(mass_s / prop_s), rate =
-- r6((prop * ntot) / mass).
SELECT doc_id, 'szmix|' || source || ':' ||
  CAST(unnest(generate_series(0, n - 1)) AS VARCHAR) AS val
FROM (
  WITH mass AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) ms
    FROM documents WHERE source IN ('src0', 'src1') GROUP BY source),
  n AS (SELECT least(
    (SELECT ms FROM mass WHERE source = 'src0') / (2.0 / 3.0),
    (SELECT ms FROM mass WHERE source = 'src1') / (1.0 / 3.0)) AS ntot),
  r AS (SELECT source,
    floor((((CASE source WHEN 'src0' THEN 2.0 ELSE 1.0 END) / 3.0)
           * (SELECT ntot FROM n)) / ms * 1000000 + 0.5) / 1000000 AS rate
    FROM mass),
  m AS (SELECT d.doc_id, d.source,
    CAST(floor(r.rate) AS INT)
      + CASE WHEN (('0x' || substr(md5('ff' || CAST(d.doc_id AS VARCHAR)),
                    1, 15))::BIGINT::DOUBLE / 1152921504606846976.0)
                  < r.rate - floor(r.rate)
             THEN 1 ELSE 0 END AS n
   FROM documents d JOIN r ON d.source = r.source)
  SELECT doc_id, source, n FROM m WHERE n > 0
)""",
)
def q_source_mix(spark, sf_dir):
    """SourceMixer (operators/sampling.py): mixture weights + measured
    availability -> deterministic per-source rates; oversampled sources
    replicate whole copies plus an md5-sampled fractional copy.
    val = source:copy_index, the full realized mixture oracle-pinned.
    The r9 'tmix|' slice pins the alpha=0.5 temperature-sampling law
    (p_s ∝ sqrt(count_s)) over planted unequal groups, budget-free."""
    docs = _t(spark, sf_dir, "documents")
    c = docs.where(F.col("source") == "src0").count()
    op = ff.SourceMixer(
        "doc_id", "source", {"src0": 5.0, "src1": 3.0, "src2": 1.0},
        budget_rows=4 * c, allow_oversample=True,
    ).fit(docs)
    part1 = op.transform(docs).select(
        "doc_id",
        F.concat(
            F.col("source"), F.lit(":"), F.col("mix_copy").cast("string")
        ).alias("val"),
    )
    grouped = docs.select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 10 < 6 THEN 'big' "
            "WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'small' END"
        ).alias("src"),
    )
    tmix = ff.SourceMixer("doc_id", "src", alpha=0.5).fit(grouped)
    part2 = tmix.transform(grouped).select(
        "doc_id",
        F.concat(
            F.lit("tmix|"), F.col("src"), F.lit(":"),
            F.col("mix_copy").cast("string"),
        ).alias("val"),
    )
    # r10 size_col slice: the same mixture law measured in CHARACTER
    # mass (SUM(n_chars) per source) — the token-budget recipe
    szmix = ff.SourceMixer(
        "doc_id", "source", {"src0": 2.0, "src1": 1.0}, size_col="n_chars"
    ).fit(docs)
    part3 = szmix.transform(docs).select(
        "doc_id",
        F.concat(
            F.lit("szmix|"), F.col("source"), F.lit(":"),
            F.col("mix_copy").cast("string"),
        ).alias("val"),
    )
    return part1.unionByName(part2).unionByName(part3)


@_reg(
    "text_clean",
    f"""WITH c AS (SELECT doc_id,
regexp_replace(trim(array_to_string(list_filter(
  string_split(regexp_replace(lower(text), '[^A-Za-z0-9\\s]', '', 'g'), ' '),
  w -> NOT list_contains({_SQL_STOP_EN}, w)), ' ')), '\\s+', ' ', 'g') cleaned
FROM documents)
SELECT doc_id, cleaned FROM c""",
)
def q_text_clean(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = ff.TextCleaner(["text"], remove_stopwords=True)
    return t.transform(docs).select("doc_id", F.col("text").alias("cleaned"))


# Deterministic page synthesis for the html_strip member: every document
# wrapped in markup that exercises each extraction rule (script with
# embedded '<'/'&&', style, comment, entities incl. the &amp;lt;
# single-pass trap, paragraph breaks from the text's own newlines).
_HTML_PRE = (
    "<html><head><title>Doc</title><style>p{color:red}</style>"
    "<script>var x = 1 && 2<3;</script></head><body><h1>Doc "
)
_HTML_MID = '</h1><p>'
_HTML_LINK = '</p><a href="http://ex.com/'
_HTML_POST = '">link &amp; more &amp;lt; ok</a><!-- c --></body></html>'
# the operator's whitespace classes, spelled with chr() so the SQL twin
# and the Java regexes mean the same bytes
_SQL_WSP = "[ '||chr(9)||chr(13)||chr(12)||']"




def _sqllit(s: str) -> str:
    """A DuckDB string expression for ``s``, chr()-composing the
    control/non-printable chars a SQL literal can't carry verbatim."""
    parts: list[str] = []
    buf = ""
    for ch in s:
        o = ord(ch)
        if 32 <= o < 127 or o > 159:
            buf += ch.replace("'", "''")
        else:
            if buf:
                parts.append(f"'{buf}'")
                buf = ""
            parts.append(f"chr({o})")
    if buf:
        parts.append(f"'{buf}'")
    return " || ".join(parts) if parts else "''"


# deterministic corruption suffix exercising the fixer end-to-end:
# cp1252 letter + punctuation forms, the latin-1 raw-byte form of a
# right quote, the dropped-byte orphan, NBSP mojibake, and a control
_MOJI_SUFFIX = (
    " CafÃ© â€” â€œquotedâ€\x9d â€¦ naÃ¯ve Â° 5â‚¬ nbspÂ\xa0end â€ bell\x07x"
)


def _sql_fix_encoding() -> str:
    from feature_factory_spark.operators.text import _mojibake_table

    expr = "page"
    for moji, fixed in _mojibake_table():
        expr = f"replace({expr}, {_sqllit(moji)}, {_sqllit(fixed)})"
    expr = f"replace({expr}, chr(160), ' ')"
    expr = (
        "regexp_replace(" + expr +
        ", '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]', '', 'g')"
    )
    return (
        "WITH h AS (SELECT doc_id, text || " + _sqllit(_MOJI_SUFFIX)
        + " AS page FROM documents)\n"
        + f"SELECT doc_id, {expr} AS val FROM h"
    )


@_reg(
    "unicode_nfc",
    # UnicodeNormalizer (r8, operators/text.py): NFC normalization of a
    # deterministic decomposed-unicode suffix (e/o/a/n + combining
    # acute/diaeresis/tilde — 2 codepoints each, 1 after NFC) appended
    # per doc. DuckDB's nfc_normalize is the same Unicode NFC; the
    # combining marks are written as explicit escapes in both engines.
    """SELECT doc_id,
  nfc_normalize(text ||
    ' xe' || chr(769) || 'o' || chr(776) || 'a' || chr(771) ||
    'n' || chr(771) || 'z') AS val
FROM documents""",
)
def q_unicode_nfc(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # DECOMPOSED on purpose (base + combining escapes): NFC composes it
    suffix = " xe\u0301o\u0308a\u0303n\u0303z"
    page = F.concat(F.col("text"), F.lit(suffix))
    out = ff.UnicodeNormalizer(["page"]).transform(
        docs.select("doc_id", page.alias("page"))
    )
    return out.select("doc_id", F.col("page").alias("val"))


@_reg("fix_encoding", _sql_fix_encoding())
def q_fix_encoding(spark, sf_dir):
    """EncodingFixer (operators/text.py): mojibake repair + NBSP +
    control-strip over documents with a deterministic corruption
    suffix; the DuckDB twin recomputes the identical generated
    replace chain (same table, same longest-first order)."""
    docs = _t(spark, sf_dir, "documents")
    page = F.concat(F.col("text"), F.lit(_MOJI_SUFFIX))
    fixed = ff.EncodingFixer(["page"]).transform(
        docs.select("doc_id", page.alias("page"))
    )
    return fixed.select("doc_id", F.col("page").alias("val"))


@_reg(
    "c4_clean",
    # C4Filter (r7): the public C4 line/page heuristics, recomputed
    # end-to-end in DuckDB (list_filter line rules + page verdicts)
    # over multi-line pages deterministically synthesized from text —
    # line survival, javascript/lorem/brace drops, and the sentence
    # floor all vary by doc_id so every rule branch is hash-pinned.
    r"""WITH p AS (SELECT doc_id,
  text || chr(10) ||
  'A good second sentence with words.' || chr(10) ||
  'tiny.' || chr(10) ||
  'no terminal punctuation line' || chr(10) ||
  CASE WHEN doc_id % 4 = 0 THEN 'This javascript line is removed.'
       ELSE 'Another valid sentence is right here!' END || chr(10) ||
  CASE WHEN doc_id % 5 = 0 THEN 'lorem ipsum appears now.'
       ELSE 'Closing words make a final sentence.' END || chr(10) ||
  CASE WHEN doc_id % 7 = 0 THEN 'brace { here.'
       ELSE 'No brace in this line at all.' END AS page
FROM documents),
c AS (SELECT doc_id, page,
  array_to_string(list_filter(string_split(page, chr(10)),
    l -> regexp_matches(trim(l), '[.!?"]\s*$')
         AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
         AND NOT contains(lower(l), 'javascript')), chr(10)) AS cleaned
FROM p)
SELECT doc_id,
  CAST(NOT contains(lower(page), 'lorem ipsum')
       AND NOT contains(page, '{')
       AND len(regexp_extract_all(cleaned || chr(10), '[.!?"]\s*'||chr(10))) >= 5
       AS VARCHAR) || ':' || md5(coalesce(cleaned, '')) AS val
FROM c""",
)
def q_c4_clean(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    nl = F.lit("\n")
    page = F.concat(
        F.col("text"), nl,
        F.lit("A good second sentence with words."), nl,
        F.lit("tiny."), nl,
        F.lit("no terminal punctuation line"), nl,
        F.when(F.col("doc_id") % 4 == 0,
               F.lit("This javascript line is removed."))
        .otherwise(F.lit("Another valid sentence is right here!")), nl,
        F.when(F.col("doc_id") % 5 == 0,
               F.lit("lorem ipsum appears now."))
        .otherwise(F.lit("Closing words make a final sentence.")), nl,
        F.when(F.col("doc_id") % 7 == 0, F.lit("brace { here."))
        .otherwise(F.lit("No brace in this line at all.")),
    )
    out = ff.C4Filter("page").transform(
        docs.select("doc_id", page.alias("page"))
    )
    return out.select(
        "doc_id",
        F.concat(
            F.col("page_c4_keep").cast("string"),
            F.lit(":"),
            F.md5(F.coalesce(F.col("page_c4"), F.lit(""))),
        ).alias("val"),
    )


def _sql_str(s: str) -> str:
    """Render a Python string as a DuckDB expression: quotes escaped,
    newlines as chr(10) concatenation."""
    parts = []
    for piece in s.split("\n"):
        parts.append("'" + piece.replace("'", "''") + "'")
    return "||chr(10)||".join(parts)


def _sql_md_chain(col: str) -> str:
    """DuckDB twin of MarkdownTextExtractor.text_expr, GENERATED from
    the same MD_RULES table ($n group refs -> RE2's \\n) — the two
    engines cannot drift."""
    from feature_factory_spark.operators.web import MD_RULES

    x = col
    for pat, rep in MD_RULES:
        p = pat.replace("'", "''")
        if rep == "\n":
            x = f"regexp_replace({x}, '{p}', chr(10), 'g')"
        else:
            r = rep.replace("$1", r"\1")
            x = f"regexp_replace({x}, '{p}', '{r}', 'g')"
    return f"trim({x})"


# deterministic markdown page skeleton wrapped around documents.text:
# headers, links, images, a fenced block, quotes, list markers
# (incl. a numbered one), a table, emphasis, inline code, and an hr —
# every MD_RULES branch exercised on every row
_MD_PRE = "# Title "
_MD_MID = (
    "\n\nIntro with a [link](https://example.org/p?id="
)
_MD_MID2 = (
    ") and ![pic alt](img.png) inline.\n\n```\ncode block\nline two\n```"
    "\n\n> quoted wisdom\n> second line\n\n- item one\n- item *two*\n"
    "12. third item\n\n| a | b |\n|---|---|\n| 1 | 2 |\n\n"
)
_MD_POST = "\n\n---\n\nEnd **strong** text and `inline code` here."


@_reg(
    "md_strip",
    # MarkdownTextExtractor (r8): markdown -> text over synthesized
    # pages, the extraction chain + all four boilerplate metrics
    # recomputed end-to-end by the generated twin (_sql_md_chain)
    f"""WITH m AS (SELECT doc_id,
  {_sql_str(_MD_PRE)} || CAST(doc_id AS VARCHAR) || {_sql_str(_MD_MID)}
  || CAST(doc_id AS VARCHAR) || {_sql_str(_MD_MID2)} || text
  || {_sql_str(_MD_POST)} AS page
FROM documents),
x AS (SELECT doc_id, page, {_sql_md_chain('page')} AS t FROM m)
SELECT doc_id, t || '|'
  || CAST(len(regexp_extract_all(page, '(?s)```.*?```')) AS VARCHAR) || '|'
  || CAST(len(regexp_extract_all(page, '\\[[^\\]]*\\]\\([^)]*\\)'))
     - len(regexp_extract_all(page, '!\\[[^\\]]*\\]\\([^)]*\\)')) AS VARCHAR) || '|'
  || CAST(len(regexp_extract_all(page, '!\\[[^\\]]*\\]\\([^)]*\\)')) AS VARCHAR) || '|'
  || CAST(CAST(floor(len(t)::DOUBLE / len(page) * 1000000) AS BIGINT) AS VARCHAR)
  AS val
FROM x""",
)
def q_md_strip(spark, sf_dir):
    """MarkdownTextExtractor (operators/web.py): markdown -> text over
    deterministically synthesized pages (headers, links, images, fenced
    code, quotes, lists, tables, emphasis around each document's text);
    extraction + code-block/link/image counts + length ratio all
    recomputed by the DuckDB twin generated from the SAME rule table."""
    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.lit(_MD_PRE), F.col("doc_id").cast("string"),
        F.lit(_MD_MID), F.col("doc_id").cast("string"),
        F.lit(_MD_MID2), F.col("text"), F.lit(_MD_POST),
    )
    out = ff.MarkdownTextExtractor(["page"]).transform(
        docs.select("doc_id", page.alias("page"))
    )
    return out.select(
        "doc_id",
        F.concat(
            F.col("page_md_text"), F.lit("|"),
            F.col("page_code_blocks").cast("string"), F.lit("|"),
            F.col("page_link_count").cast("string"), F.lit("|"),
            F.col("page_image_count").cast("string"), F.lit("|"),
            F.floor(F.col("page_text_ratio") * 1_000_000)
            .cast("bigint").cast("string"),
        ).alias("val"),
    )


@_reg(
    "html_strip",
    r"""WITH h AS (SELECT doc_id,
 '"""
    + _HTML_PRE.replace("'", "''")
    + r"""' || CAST(doc_id AS VARCHAR) || '"""
    + _HTML_MID
    + r"""' || replace(text, chr(10), '</p><p>') || '"""
    + _HTML_LINK
    + r"""' || CAST(doc_id AS VARCHAR) || '"""
    + _HTML_POST.replace("'", "''")
    + r"""' AS page FROM documents),
x AS (SELECT doc_id, page, trim(
 regexp_replace(
  regexp_replace(
   regexp_replace(
    replace(replace(replace(replace(replace(replace(
     regexp_replace(
      regexp_replace(
       regexp_replace(
        regexp_replace(
         regexp_replace(page, '(?is)<script\b[^>]*>.*?</script[^>]*>', ' ', 'g'),
         '(?is)<style\b[^>]*>.*?</style[^>]*>', ' ', 'g'),
        '(?s)<!--.*?-->', ' ', 'g'),
       '(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/table|/blockquote)[^>]*>', chr(10), 'g'),
      '<[^>]*>', ' ', 'g'),
     '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
    '"""
    + _SQL_WSP
    + r"""+', ' ', 'g'),
   '"""
    + _SQL_WSP
    + r"""*'||chr(10)||'"""
    + _SQL_WSP
    + r"""*', chr(10), 'g'),
  chr(10)||'{2,}', chr(10), 'g')
 ) AS t FROM h)
SELECT doc_id, t || '|' ||
 CAST(len(regexp_extract_all(page, '<[^>]*>')) AS VARCHAR) || '|' ||
 CAST(len(regexp_extract_all(page, '(?i)<a[ '||chr(9)||chr(13)||chr(10)||'>]')) AS VARCHAR) || '|' ||
 CAST(floor(len(t)::DOUBLE / len(page) * 1000000) AS BIGINT) AS val
FROM x""",
)
def q_html_strip(spark, sf_dir):
    """HtmlTextExtractor (operators/web.py): HTML -> text extraction
    over deterministically synthesized pages — script/style/comment
    removal, block-break folding, single-pass entity decoding — plus
    the tag/link/length boilerplate metrics, all SQL-recomputed
    end-to-end by the DuckDB twin (same RE2-compatible patterns)."""
    return _q_html_strip_impl(spark, sf_dir)


@_reg(
    "self_line_dedup",
    # WithinDocDeduplicator (r10, operators/dedup.py): repeated-line
    # removal INSIDE each doc (keep-first), planted by repeating the
    # doc's own text around a unique tail line. The twin replays the
    # identical keep-first lambda with DuckDB list functions.
    r"""WITH d AS (SELECT doc_id,
  concat_ws(chr(10), text, text,
            'tail ' || CAST(doc_id AS VARCHAR), text) AS t
 FROM documents),
k AS (SELECT doc_id, t,
  list_filter(string_split(t, chr(10)), (x, i) ->
    len(trim(x)) < 1
    OR list_position(string_split(t, chr(10))[1:i-1], x) = 0) AS kept
 FROM d)
SELECT doc_id, array_to_string(kept, chr(10)) || '|' ||
  CAST(len(string_split(t, chr(10))) - len(kept) AS VARCHAR) AS val
FROM k""",
)
def q_self_line_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    rep = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            "text",
            "text",
            F.concat(F.lit("tail "), F.col("doc_id").cast("string")),
            "text",
        ).alias("text"),
    )
    out = ff.WithinDocDeduplicator("text").transform(rep)
    return out.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("|"),
            F.col("text_self_removed").cast("string"),
        ).alias("val"),
    )


def q_x_robots(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    hdr = (
        F.when(F.col("doc_id") % 8 == 0, F.lit("noindex, nofollow"))
        .when(F.col("doc_id") % 8 == 1, F.lit("index, follow"))
        .when(F.col("doc_id") % 8 == 2, F.lit("googlebot: noindex"))
        .when(F.col("doc_id") % 8 == 3, F.lit("NONE"))
        .when(F.col("doc_id") % 8 == 4,
              F.lit("unavailable_after: 25 Jun 2010"))
        .when(F.col("doc_id") % 8 == 5,
              F.lit("googlebot: noindex, none"))
        .when(F.col("doc_id") % 8 == 6,
              F.lit("otherbot: none, noindex"))
        .otherwise(F.lit(None).cast("string"))
    )
    rows = docs.select("doc_id", hdr.alias("http_x_robots"))
    generic = ff.XRobotsTagFilter("http_x_robots").transform(rows)
    named = ff.XRobotsTagFilter(
        "http_x_robots", agent="googlebot"
    ).transform(rows)
    g = generic.select(
        "doc_id", F.col("http_x_robots_blocked").alias("b1")
    )
    n = named.select(
        "doc_id", F.col("http_x_robots_blocked").alias("b2")
    )
    return g.join(n, "doc_id").select(
        "doc_id",
        F.concat(
            F.col("b1").cast("string"), F.lit(":"),
            F.col("b2").cast("string"),
        ).alias("val"),
    )


_X_ROBOTS_SQL = r"""WITH h AS (SELECT doc_id,
  CASE doc_id % 8
    WHEN 0 THEN 'noindex, nofollow'
    WHEN 1 THEN 'index, follow'
    WHEN 2 THEN 'googlebot: noindex'
    WHEN 3 THEN 'NONE'
    WHEN 4 THEN 'unavailable_after: 25 Jun 2010'
    WHEN 5 THEN 'googlebot: noindex, none'
    WHEN 6 THEN 'otherbot: none, noindex'
    ELSE NULL END AS hdr FROM documents),
t AS (SELECT doc_id,
  list_transform(string_split(lower(coalesce(hdr, '')), ','),
                 x -> trim(x)) AS toks FROM h),
a AS (SELECT doc_id, toks,
  list_transform(toks, x ->
    CASE WHEN position(':' IN x) > 0
      AND trim(substr(x, 1, position(':' IN x) - 1))
        NOT IN ('unavailable_after', 'max-snippet',
                'max-image-preview', 'max-video-preview')
    THEN trim(substr(x, 1, position(':' IN x) - 1)) END) AS opens,
  list_transform(toks, x ->
    regexp_extract(
      CASE WHEN position(':' IN x) > 0
        AND trim(substr(x, 1, position(':' IN x) - 1))
          NOT IN ('unavailable_after', 'max-snippet',
                  'max-image-preview', 'max-video-preview')
      THEN trim(substr(x, position(':' IN x) + 1))
      WHEN position(':' IN x) > 0
      THEN trim(substr(x, 1, position(':' IN x) - 1))
      ELSE x END, '^[^:]*')) AS dirs FROM t),
s AS (SELECT doc_id, dirs,
  list_transform(dirs, (x, i) ->
    coalesce(opens[list_max(list_filter(
      list_transform(opens, (y, j) ->
        CASE WHEN y IS NOT NULL AND j <= i THEN j END),
      v -> v IS NOT NULL))], '')) AS scopes FROM a),
f AS (SELECT doc_id,
  len(list_filter(dirs, (x, i) ->
    scopes[i] = '' AND trim(x) IN ('noindex', 'none'))) > 0 AS b1,
  len(list_filter(dirs, (x, i) ->
    scopes[i] IN ('', 'googlebot')
    AND trim(x) IN ('noindex', 'none'))) > 0 AS b2 FROM s)
SELECT doc_id,
  CAST(b1 AS VARCHAR) || ':' || CAST(b2 AS VARCHAR) AS val FROM f"""
_REGISTRY["x_robots"] = (q_x_robots, _X_ROBOTS_SQL)


@_reg(
    "meta_robots",
    # MetaRobotsFilter (r10, hardened r11, operators/web.py):
    # page-level crawl opt-outs over synthesized pages — doc_id%8
    # plants noindex / index / NONE (case+quote variants, attribute
    # order reversed) / nofollow / UNQUOTED name+content (HTML5) /
    # two robots tags whose directives must union (index then
    # noindex => blocked) / a name merely PREFIXED with 'robots'
    # (must not match) / no-tag shapes; val = robots-content ':'
    # blocked. The twin recomputes the identical RE2-compatible
    # scan: all <meta> tags, exact name match over the three
    # attribute-value syntaxes, content union, comma-token directive
    # match.
    r"""WITH h AS (SELECT doc_id,
  CASE doc_id % 8
    WHEN 0 THEN '<meta name="robots" content="noindex, follow">'
    WHEN 1 THEN '<meta content="index, follow" name=robots>'
    WHEN 2 THEN '<META NAME=''robots'' CONTENT=''NONE''>'
    WHEN 3 THEN '<meta name="robots" content="nofollow">'
    WHEN 4 THEN '<meta name=robots content=noindex>'
    WHEN 5 THEN '<meta name="robots" content="index">'
             || '<meta name=robots content=noindex>'
    WHEN 6 THEN '<meta name="robotsx" content="noindex">'
             || '<meta name=viewport content=width=1>'
             || '<meta data-name="robots" content="noindex">'
    ELSE '' END AS meta, text FROM documents),
p AS (SELECT doc_id,
  '<html><head>' || meta || '</head><body><p>' || text
  || '</p></body></html>' AS page FROM h),
t AS (SELECT doc_id,
  regexp_extract_all(page, '(?is)<meta\b[^>]*>') AS tags FROM p),
rt AS (SELECT doc_id, list_filter(tags, x -> lower(trim(
    CASE WHEN regexp_extract(x,
      '(?is)(?:^|[^\w-])name\s*=\s*(?:"([^"]*)"|''([^'']*)''|([^\s>''"]+))',
      1) <> '' THEN regexp_extract(x,
      '(?is)(?:^|[^\w-])name\s*=\s*(?:"([^"]*)"|''([^'']*)''|([^\s>''"]+))', 1)
    WHEN regexp_extract(x,
      '(?is)(?:^|[^\w-])name\s*=\s*(?:"([^"]*)"|''([^'']*)''|([^\s>''"]+))',
      2) <> '' THEN regexp_extract(x,
      '(?is)(?:^|[^\w-])name\s*=\s*(?:"([^"]*)"|''([^'']*)''|([^\s>''"]+))', 2)
    ELSE regexp_extract(x,
      '(?is)(?:^|[^\w-])name\s*=\s*(?:"([^"]*)"|''([^'']*)''|([^\s>''"]+))', 3)
    END)) = 'robots') AS tags FROM t),
c AS (SELECT doc_id, CASE WHEN len(tags) > 0 THEN
  array_to_string(list_transform(tags, x -> lower(
    CASE WHEN regexp_extract(x,
      '(?is)(?:^|[^\w-])content\s*=\s*(?:"([^"]*)"|''([^'']*)''|([^\s>''"]+))',
      1) <> '' THEN regexp_extract(x,
      '(?is)(?:^|[^\w-])content\s*=\s*(?:"([^"]*)"|''([^'']*)''|([^\s>''"]+))',
      1)
    WHEN regexp_extract(x,
      '(?is)(?:^|[^\w-])content\s*=\s*(?:"([^"]*)"|''([^'']*)''|([^\s>''"]+))',
      2) <> '' THEN regexp_extract(x,
      '(?is)(?:^|[^\w-])content\s*=\s*(?:"([^"]*)"|''([^'']*)''|([^\s>''"]+))',
      2)
    ELSE regexp_extract(x,
      '(?is)(?:^|[^\w-])content\s*=\s*(?:"([^"]*)"|''([^'']*)''|([^\s>''"]+))',
      3) END)), ',') END AS robots FROM rt)
SELECT doc_id,
  coalesce(robots, '@') || ':' || CAST(
    len(list_filter(
      list_transform(string_split(coalesce(robots, ''), ','),
                     x -> trim(x)),
      x -> x IN ('noindex', 'none'))) > 0 AS VARCHAR) AS val
FROM c""",
)
def q_meta_robots(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    meta = (
        F.when(F.col("doc_id") % 8 == 0,
               F.lit('<meta name="robots" content="noindex, follow">'))
        .when(F.col("doc_id") % 8 == 1,
              F.lit('<meta content="index, follow" name=robots>'))
        .when(F.col("doc_id") % 8 == 2,
              F.lit("<META NAME='robots' CONTENT='NONE'>"))
        .when(F.col("doc_id") % 8 == 3,
              F.lit('<meta name="robots" content="nofollow">'))
        .when(F.col("doc_id") % 8 == 4,
              F.lit('<meta name=robots content=noindex>'))
        .when(F.col("doc_id") % 8 == 5,
              F.lit('<meta name="robots" content="index">'
                    '<meta name=robots content=noindex>'))
        .when(F.col("doc_id") % 8 == 6,
              F.lit('<meta name="robotsx" content="noindex">'
                    '<meta name=viewport content=width=1>'
                    '<meta data-name="robots" content="noindex">'))
        .otherwise(F.lit(""))
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head>"), meta, F.lit("</head><body><p>"),
            F.col("text"), F.lit("</p></body></html>"),
        ).alias("page"),
    )
    out = ff.MetaRobotsFilter("page").transform(pages)
    return out.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("page_robots"), F.lit("@")),
            F.lit(":"),
            F.col("page_robots_blocked").cast("string"),
        ).alias("val"),
    )


def _q_html_strip_impl(spark, sf_dir):
    """HtmlTextExtractor (operators/web.py): HTML -> text extraction
    over deterministically synthesized pages — script/style/comment
    removal, block-break folding, single-pass entity decoding — plus
    the tag/link/length boilerplate metrics, all SQL-recomputed
    end-to-end by the DuckDB twin (same RE2-compatible patterns)."""
    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.lit(_HTML_PRE),
        F.col("doc_id").cast("string"),
        F.lit(_HTML_MID),
        F.replace(F.col("text"), F.lit("\n"), F.lit("</p><p>")),
        F.lit(_HTML_LINK),
        F.col("doc_id").cast("string"),
        F.lit(_HTML_POST),
    )
    out = ff.HtmlTextExtractor(["page"]).transform(
        docs.select("doc_id", page.alias("page"))
    )
    # concat, NOT concat_ws: the SQL twin's || propagates NULL, and
    # concat_ws would skip NULL pieces — a NULL text row must yield a
    # NULL val on BOTH sides or the value hash diverges
    return out.select(
        "doc_id",
        F.concat(
            F.col("page_html_text"),
            F.lit("|"),
            F.col("page_tag_count").cast("string"),
            F.lit("|"),
            F.col("page_link_count").cast("string"),
            F.lit("|"),
            F.floor(F.col("page_text_ratio") * 1e6).cast("bigint").cast("string"),
        ).alias("val"),
    )


# main-content fixture: nav link farm + stopword-glued doc paragraphs
# + a stopword-free keyword-spam block + footer links (operators/web.py
# MainContentExtractor). The paragraph glue plants stopwords so the
# density rule has signal over the synthetic word-salad corpus.
_MC_PRE = (
    '<html><head><title>d</title><script>var x = 1 && 2<3;</script>'
    '</head><body>'
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a>'
    '</li><li><a href="/c">Contact us</a></li></ul></nav>'
    '<div><p>It is the case that '
)
_MC_MID = '</p><p>So it was the story that '
_MC_POST = (
    '</p></div><div>key0 key1 key2 key3 key4 key5 key6 key7</div>'
    '<footer><a href="/p">Privacy</a> <a href="/t">Terms</a> '
    'copyright 2024</footer></body></html>'
)


def _mc_sql() -> str:
    """DuckDB twin of the main_content member: the page construction,
    block segmentation, per-block metrics and classification, and the
    per-doc aggregates — generated from the SAME constants the operator
    uses (_BLOCK_TAGS, MAIN_CONTENT_STOPWORDS), so the two engines
    cannot drift."""
    from feature_factory_spark.operators.web import (
        _BLOCK_TAGS,
        MAIN_CONTENT_STOPWORDS,
    )

    stop_pat = r"\b(" + "|".join(MAIN_CONTENT_STOPWORDS) + r")\b"
    wsp = "[ '||chr(9)||chr(13)||chr(12)||chr(10)||']"
    strip = (
        "trim(regexp_replace("
        "replace(replace(replace(replace(replace(replace("
        "regexp_replace(blk, '<[^>]*>', ' ', 'g'),"
        "'&nbsp;',' '),'&lt;','<'),'&gt;','>'),'&quot;','\"'),"
        "'&#39;',chr(39)),'&amp;','&'),"
        f"'{wsp}+', ' ', 'g'))"
    )
    return f"""WITH h AS (SELECT doc_id,
 '{_MC_PRE.replace("'", "''")}'
 || replace(text, chr(10), '{_MC_MID.replace("'", "''")}')
 || '{_MC_POST.replace("'", "''")}' AS page FROM documents),
pre AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(page,
  '(?is)<script\\b[^>]*>.*?</script[^>]*>', ' ', 'g'),
  '(?is)<style\\b[^>]*>.*?</style[^>]*>', ' ', 'g'),
  '(?s)<!--.*?-->', ' ', 'g') AS ph FROM h),
marked AS (SELECT doc_id, string_split(regexp_replace(ph,
  '(?i)(</?({_BLOCK_TAGS})\\b)', chr(1)||'\\1', 'g'), chr(1)) AS bl
 FROM pre),
b AS (SELECT doc_id, unnest(bl) AS blk, generate_subscripts(bl, 1) AS i
 FROM marked),
t AS (SELECT doc_id, i, {strip} AS t,
 len(regexp_extract_all(blk,
   '(?i)<a[ '||chr(9)||chr(13)||chr(10)||'>]')) AS l FROM b),
w AS (SELECT doc_id, i, t, l,
 CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS w,
 len(regexp_extract_all(lower(t), '{stop_pat}')) AS sw FROM t),
g AS (SELECT *, (w >= 5 AND l <= 0.2*w AND sw >= 0.1*w) AS good FROM w),
agg AS (SELECT doc_id,
 coalesce(string_agg(CASE WHEN good THEN t END, chr(10) ORDER BY i), '')
   AS main_text,
 sum(CASE WHEN t <> '' THEN len(t) ELSE 0 END) AS total_chars,
 sum(CASE WHEN good THEN len(t) ELSE 0 END) AS main_chars,
 sum(CASE WHEN t <> '' THEN 1 ELSE 0 END) AS n_blocks,
 sum(CASE WHEN good THEN 1 ELSE 0 END) AS n_main FROM g GROUP BY doc_id)
SELECT doc_id, main_text || '|' ||
 CAST(CAST(floor((CASE WHEN total_chars > 0
   THEN 1.0 - main_chars::DOUBLE / total_chars ELSE 0.0 END)
   * 1000000) AS BIGINT) AS VARCHAR) || '|' ||
 CAST(n_blocks AS VARCHAR) || '|' || CAST(n_main AS VARCHAR) AS val
FROM agg"""


@_reg("main_content", _mc_sql())
def q_main_content(spark, sf_dir):
    """MainContentExtractor (operators/web.py, r9): jusText-style block
    text-density segmentation over synthesized pages with planted
    nav/footer/keyword-spam boilerplate — main_text, boilerplate_ratio
    and block counts all SQL-recomputed end-to-end."""
    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.lit(_MC_PRE),
        F.replace(F.col("text"), F.lit("\n"), F.lit(_MC_MID)),
        F.lit(_MC_POST),
    )
    out = ff.MainContentExtractor(["page"]).transform(
        docs.select("doc_id", page.alias("page"))
    )
    return out.select(
        "doc_id",
        F.concat(
            F.col("page_main_text"),
            F.lit("|"),
            F.floor(F.col("page_boilerplate_ratio") * 1e6)
            .cast("bigint").cast("string"),
            F.lit("|"),
            F.col("page_n_blocks").cast("string"),
            F.lit("|"),
            F.col("page_n_main_blocks").cast("string"),
        ).alias("val"),
    )


@_reg(
    "repetition_features",
    f"""WITH d AS (SELECT doc_id, text, {SQL_WORDS} w FROM documents),
g AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(w)-1, 1)),
        i -> array_to_string(w[i:i+1], ' ')) bg FROM d),
m AS (SELECT doc_id, max(c)::DOUBLE mx, sum(c)::DOUBLE tot
      FROM (SELECT doc_id, b, count(*) c
            FROM (SELECT doc_id, unnest(bg) b FROM g) GROUP BY 1, 2)
      GROUP BY 1),
lines AS (SELECT doc_id, string_split(text, chr(10)) ln FROM d)
SELECT d.doc_id,
{R6("1.0 - len(list_distinct(d.w))::DOUBLE / len(d.w)")} AS text_dup_word_ratio,
{R6("m.mx / m.tot")} AS text_top_bigram_ratio,
{R6("1.0 - len(list_distinct(lines.ln))::DOUBLE / len(lines.ln)")} AS text_dup_line_ratio
FROM d JOIN m USING (doc_id) JOIN lines USING (doc_id)""",
)
def q_repetition_features(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ff.RepetitionFeatures(["text"]).transform(docs)
    return out.select(
        "doc_id",
        r6(F.col("text_dup_word_ratio")).alias("text_dup_word_ratio"),
        r6(F.col("text_top_bigram_ratio")).alias("text_top_bigram_ratio"),
        r6(F.col("text_dup_line_ratio")).alias("text_dup_line_ratio"),
    )


@_reg(
    "gopher_quality_filter",
    f"""WITH d AS (SELECT doc_id, text, {SQL_WORDS} w FROM documents)
SELECT doc_id FROM d
WHERE len(w) >= 30 AND len(w) <= 90
  AND (length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE / len(w))
        BETWEEN 2.0 AND 10.0
  AND ((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
        / length(text)) <= 0.1
  AND len(list_filter(w, x -> list_contains({_SQL_STOP_EN}, lower(x)))) >= 2""",
)
def q_gopher_quality_filter(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    f_ = ff.GopherQualityFilter(
        "text", min_words=30, max_words=90,
        min_avg_word_len=2.0, max_avg_word_len=10.0,
        max_punct_ratio=0.1, min_stopword_hits=2,
    )
    return f_.transform(docs).select("doc_id")


@_reg(
    "badwords",
    # BadWordsFilter (r9): the C4 blocklist gate generalized to a
    # fraction threshold, planted over the corpus's own vocabulary
    # ('dup'/'slow' occur naturally) so both branches fire. The oracle
    # recomputes the whole-word count, the word total (the proven
    # words_expr twin), the raw-fraction comparison, and the r6 ratio.
    r"""WITH b AS (SELECT doc_id,
  len(regexp_extract_all(lower(text), '\b(dup|slow)\b')) AS hits,
  len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      x -> x <> '')) AS w
 FROM documents)
SELECT doc_id,
  (CAST(hits AS DOUBLE) / w) <= 0.02 AS flag,
  floor((CAST(hits AS DOUBLE) / w) * 1000000 + 0.5) / 1000000 AS ratio
FROM b""",
)
def q_badwords(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ff.BadWordsFilter(
        "text", ["dup", "slow"], max_fraction=0.02
    ).transform(docs)
    return out.select(
        "doc_id",
        F.col("text_badwords_keep").alias("flag"),
        r6(F.col("text_badword_fraction")).alias("ratio"),
    )


@_reg(
    "quality_model",
    # the LBFGS-fitted coefficients are not SQL-recomputable; the
    # oracle pins eagerly-asserted invariants (negative sentinel ids so
    # the member unions cleanly into the per-doc quality family)
    """SELECT CAST(-1 AS BIGINT) AS doc_id, TRUE AS flag
UNION ALL SELECT CAST(-2 AS BIGINT), TRUE
UNION ALL SELECT CAST(-3 AS BIGINT), TRUE
UNION ALL SELECT CAST(-4 AS BIGINT), TRUE""",
)
def q_quality_model(spark, sf_dir):
    """QualityScorer (operators/text.py): logistic regression over the
    text-statistics features, weak-labeled by GopherQualityFilter.
    Invariants: training AUC >= 0.85 against the weak labels, mean
    P(quality | keep) > mean P(quality | drop), all probabilities in
    [0, 1] with none NULL, and the scalar-coefficient state round-trips
    through save/load bit-exactly."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    op = ff.QualityScorer("text")
    op.fit(docs)
    label = ff.GopherQualityFilter(
        "text", min_words=40, min_stopword_hits=1
    ).keep_expr()
    scored = op.transform(docs).select(
        F.col("text_quality_prob").alias("p"), label.cast("int").alias("y")
    )
    w = Window.orderBy("p", "y")
    agg = (
        scored.select("p", "y", F.row_number().over(w).alias("rk"))
        .agg(
            F.sum(F.when(F.col("y") == 1, F.col("rk"))).alias("rsum"),
            F.sum("y").alias("pos"),
            F.count("*").alias("n"),
            F.min("p").alias("pmin"),
            F.max("p").alias("pmax"),
            F.sum(F.col("p").isNull().cast("int")).alias("nulls"),
            F.avg(F.when(F.col("y") == 1, F.col("p"))).alias("p_keep"),
            F.avg(F.when(F.col("y") == 0, F.col("p"))).alias("p_drop"),
        )
        .first()
    )
    pos, neg = agg["pos"], agg["n"] - agg["pos"]
    auc = (agg["rsum"] - pos * (pos + 1) / 2) / (pos * neg)
    auc_ok = auc >= 0.85
    assert auc_ok, f"quality model training AUC {auc:.3f} below 0.85 floor"
    sep_ok = agg["p_keep"] > agg["p_drop"]
    range_ok = (
        agg["nulls"] == 0 and 0.0 <= agg["pmin"] <= agg["pmax"] <= 1.0
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "quality.json")
        op.save_state(path)
        restored = ff.QualityScorer("text").load_state(path)
        rt_ok = (
            restored.coefficients_ == op.coefficients_
            and restored.intercept_ == op.intercept_
        )
    return _osf(spark, 
        [(-1, bool(auc_ok)), (-2, bool(sep_ok)), (-3, bool(range_ok)),
         (-4, bool(rt_ok))],
        "doc_id bigint, flag boolean",
    )


@_reg(
    "pii_redact",
    # synthesize deterministic PII per row so the redaction regexes are
    # actually exercised, then verify the same patterns redact in RE2
    """WITH t AS (SELECT doc_id,
  substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
  || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
  || '.7 or call +1 555 010 ' || CAST(1000 + doc_id % 9000 AS VARCHAR) AS msg
FROM documents)
SELECT doc_id,
regexp_replace(
  regexp_replace(
    regexp_replace(msg, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
  '\\+?[0-9][0-9()\\-\\s]{6,}[0-9]', '<PHONE>', 'g') AS msg
FROM t""",
)
def q_pii_redact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 or call +1 555 010 "),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("msg"),
    )
    return ff.PIIRedactor(["msg"]).transform(docs).select("doc_id", "msg")


@_reg(
    "doc_fingerprint",
    """SELECT doc_id,
md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_fingerprint
FROM documents""",
)
def q_doc_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ff.DocumentFingerprint(["text"]).transform(docs)
    return out.select("doc_id", "text_fingerprint")


@_reg(
    "tfidf_topk",
    f"""WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS cnt FROM w GROUP BY doc_id, term),
dl AS (SELECT doc_id, term, cnt,
              sum(cnt) OVER (PARTITION BY doc_id) AS doc_len FROM tf),
dfq AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY term),
n AS (SELECT count(*)::DOUBLE AS nd FROM documents),
s AS (SELECT dl.doc_id, dl.term,
             (dl.cnt / dl.doc_len) * (ln((n.nd + 1) / (dfq.dfreq + 1)) + 1) AS v
      FROM dl JOIN dfq USING (term) CROSS JOIN n),
r AS (SELECT doc_id, term, v,
             row_number() OVER (PARTITION BY doc_id ORDER BY v DESC, term) AS rk
      FROM s)
SELECT doc_id, term, {R6('v')} AS tfidf, CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 3""",
)
def q_tfidf_topk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ff.TfIdfScorer("text", "doc_id", k=3).transform(docs)
    return out.select(
        "doc_id", "term", r6(F.col("tfidf")).alias("tfidf"),
        F.col("rank").cast("int").alias("rank"),
    )


@_reg(
    "streaming_dedup",
    """SELECT min(doc_id) AS doc_id FROM documents
GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))""",
)
def q_streaming_dedup(spark, sf_dir):
    # the BATCH path of the streaming deduplicator (keep-min-id per
    # content key) is SQL-checkable; the stream path shares the key expr
    # and is covered by the availableNow test in test_streaming_interop
    from feature_factory_spark.streaming import StreamingDeduplicator

    docs = _t(spark, sf_dir, "documents")
    out = StreamingDeduplicator(["text"], "doc_id", normalize=True).transform(docs)
    return out.select("doc_id")


@_reg(
    "multimodal_extract",
    """SELECT doc_id,
CAST(octet_length(encode(text)) AS INTEGER) AS payload_payload_len,
md5(text) AS payload_payload_md5,
lower(hex(substr(text, 1, 8))) AS payload_header_hex
FROM documents""",
)
def q_multimodal_extract(spark, sf_dir):
    # documents.text is ASCII, so md5(text) == md5 of the utf-8 payload and
    # the first 8 bytes are the first 8 chars — SQL-checkable end to end.
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    out = ff.BinaryFeatureExtractor("payload").transform(docs)
    return out.select(
        "doc_id", "payload_payload_len", "payload_payload_md5", "payload_header_hex"
    )


@_reg(
    "frame_sample",
    """WITH t AS (SELECT doc_id, text, octet_length(encode(text)) n FROM documents),
f AS (SELECT doc_id, i AS frame_index,
  substr(text, i * greatest(n // 4, 1) + 1, 16) frame
FROM t, range(4) r(i) WHERE n > 0)
SELECT doc_id, CAST(frame_index AS INTEGER) AS frame_index,
CAST(octet_length(encode(frame)) AS INTEGER) AS frame_len,
lower(hex(substr(frame, 1, 16))) AS frame_hex
FROM f""",
)
def q_frame_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    out = ff.FrameSampler("payload", n_frames=4, frame_size=16).transform(docs)
    return out.select(
        "doc_id",
        "frame_index",
        F.length(F.col("frame_bytes")).cast("int").alias("frame_len"),
        F.lower(F.hex(F.col("frame_bytes"))).alias("frame_hex"),
    )


@_reg(
    "image_decode",
    # REAL image decoding (operators/imagecodec.py + jpegcodec.py):
    # even doc_ids get a deterministic solid-gray PNG (filter type
    # doc_id % 5 — every de-filter branch exercised); odd doc_ids get a
    # solid-gray baseline JPEG (r7: full stdlib T.81 Huffman+IDCT
    # decode). Both decode to closed-form features the oracle states:
    # PNG mean == g; JPEG mean == clip(floor(qdc/8 + 128.5)) where
    # qdc = round_half_away(8*(g-128)/16)*16 (Q00 = 16 at quality 50,
    # jpegcodec.solid_jpeg docstring); std == entropy == 0 for both.
    """WITH m AS (SELECT doc_id, CAST(doc_id % 7 + 2 AS DOUBLE) w,
  CAST(doc_id % 5 + 2 AS DOUBLE) h, CAST(doc_id % 256 AS DOUBLE) g,
  doc_id % 2 = 0 AS is_png
FROM documents),
d AS (SELECT *, CASE WHEN is_png THEN g ELSE
  LEAST(255.0, GREATEST(0.0, FLOOR(
    SIGN(g - 128) * FLOOR(ABS(8*(g - 128)) / 16.0 + 0.5) * 16 / 8.0
    + 128.5))) END AS mean_v FROM m)
SELECT doc_id, 'width' AS feat, w AS v FROM d
UNION ALL SELECT doc_id, 'height', h FROM d
UNION ALL SELECT doc_id, 'channels', 1.0 FROM d
UNION ALL SELECT doc_id, 'bit_depth', 8.0 FROM d
UNION ALL SELECT doc_id, 'n_pixels', w * h FROM d
UNION ALL SELECT doc_id, 'mean', mean_v FROM d
UNION ALL SELECT doc_id, 'std', 0.0 FROM d
UNION ALL SELECT doc_id, 'entropy', 0.0 FROM d
UNION ALL SELECT doc_id, 'fmt_ok', 1.0 FROM d
UNION ALL SELECT doc_id, 'progressive', 0.0 FROM d
UNION ALL SELECT doc_id, 'i_keep',
  CAST(w >= 5 AND h >= 4
       AND GREATEST(w, h) / LEAST(w, h) <= 2.0 AS DOUBLE) FROM d""",
)
def q_image_decode(spark, sf_dir):
    from feature_factory_spark.operators.imagecodec import (
        image_decoder,
        image_schema,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        # fixture generation INSIDE the distributed plan (narrow map):
        # deterministic per-row PNG/JPEG bytes, no driver
        # materialization
        from feature_factory_spark.operators.imagecodec import solid_png
        from feature_factory_spark.operators.jpegcodec import solid_jpeg

        for pdf in batches:
            pdf["img"] = [
                solid_png(
                    int(i) % 7 + 2, int(i) % 5 + 2, int(i) % 256,
                    filter_type=int(i) % 5,
                )
                if int(i) % 2 == 0
                else solid_jpeg(int(i) % 7 + 2, int(i) % 5 + 2, int(i) % 256)
                for i in pdf["doc_id"]
            ]
            yield pdf

    with_img = docs.mapInPandas(synth, "doc_id bigint, img binary")
    # r9: the decode runs through ImageQualityFilter (same Arrow seam,
    # iq_ prefix) so the keep rule — dims/aspect/entropy thresholds
    # over the closed-form fixture law — is pinned as one more row
    feats = ff.ImageQualityFilter(
        "img", min_width=5, min_height=4, max_aspect_ratio=2.0,
        min_entropy=0.0,
    ).transform(with_img)
    return feats.selectExpr(
        "doc_id",
        "stack(11, "
        "'width', cast(img_iq_width AS double), "
        "'height', cast(img_iq_height AS double), "
        "'channels', cast(img_iq_channels AS double), "
        "'bit_depth', cast(img_iq_bit_depth AS double), "
        "'n_pixels', cast(img_iq_n_pixels AS double), "
        "'mean', img_iq_mean, "
        "'std', img_iq_std, "
        "'entropy', img_iq_entropy, "
        "'fmt_ok', cast(img_iq_format = (CASE WHEN doc_id % 2 = 0 "
        "THEN 'png' ELSE 'jpeg' END) AS double), "
        "'progressive', cast(img_iq_progressive AS double), "
        "'i_keep', cast(img_keep AS double)"
        ") AS (feat, v)",
    )


@_reg(
    "audio_decode",
    # REAL audio decoding (operators/audiocodec.py): even doc_ids get a
    # deterministic constant-amplitude 16-bit WAV (full PCM decode;
    # rms == peak == floor(a*32767+0.5)/32767, zcr == 0, duration ==
    # n_frames/8000); odd doc_ids get an MPEG1-Layer-III fixture whose
    # ID3v2-skipping frame-header PROBE (r7) yields closed-form sample
    # rate / channels / 1152-samples-per-frame counts with NULL PCM
    # statistics.
    f"""WITH m AS (SELECT doc_id,
  doc_id % 2 = 0 AS is_wav,
  CAST(100 + doc_id % 50 AS DOUBLE) nf,
  CAST(1 + doc_id % 2 AS DOUBLE) ch,
  floor((doc_id % 100) / 100.0 * 32767 + 0.5) / 32767 a,
  CAST(1 + (doc_id % 7) AS DOUBLE) mf,
  CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
       ELSE 32000 END AS DOUBLE) msr
FROM documents),
d AS (SELECT doc_id,
  CASE WHEN is_wav THEN ch ELSE CAST(1 + ((doc_id + 1) % 2) AS DOUBLE) END AS channels,
  CASE WHEN is_wav THEN 8000.0 ELSE msr END AS sample_rate,
  CASE WHEN is_wav THEN 16.0 ELSE NULL END AS bit_depth,
  CASE WHEN is_wav THEN nf ELSE mf * 1152 END AS n_frames,
  CASE WHEN is_wav THEN nf / 8000.0 ELSE mf * 1152 / msr END AS dur,
  CASE WHEN is_wav THEN a ELSE NULL END AS amp
FROM m)
SELECT doc_id, 'a_channels' AS feat, channels AS v FROM d
UNION ALL SELECT doc_id, 'a_sample_rate', sample_rate FROM d
UNION ALL SELECT doc_id, 'a_bit_depth', bit_depth FROM d
UNION ALL SELECT doc_id, 'a_n_frames', n_frames FROM d
UNION ALL SELECT doc_id, 'a_duration', {R6('dur')} FROM d
UNION ALL SELECT doc_id, 'a_rms', {R6('amp')} FROM d
UNION ALL SELECT doc_id, 'a_peak', {R6('amp')} FROM d
UNION ALL SELECT doc_id, 'a_zcr', CASE WHEN amp IS NULL THEN NULL ELSE 0.0 END FROM d
UNION ALL SELECT doc_id, 'a_fmt_ok', 1.0 FROM d""",
)
def q_audio_decode(spark, sf_dir):
    from feature_factory_spark.operators.audiocodec import (
        audio_decoder,
        audio_schema,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from feature_factory_spark.operators.audiocodec import (
            constant_wav,
            make_mp3,
        )

        for pdf in batches:
            pdf["wav"] = [
                constant_wav(
                    100 + int(i) % 50, (int(i) % 100) / 100.0,
                    channels=1 + int(i) % 2,
                )
                if int(i) % 2 == 0
                else make_mp3(
                    1 + int(i) % 7,
                    sample_rate=[44100, 48000, 32000][int(i) % 3],
                    channels=1 + (int(i) + 1) % 2,
                    id3_size=(int(i) % 4) * 64,
                )
                for i in pdf["doc_id"]
            ]
            yield pdf

    with_wav = docs.mapInPandas(synth, "doc_id bigint, wav binary")
    feats = ff.BinaryFeatureExtractor(
        "wav", decoder=audio_decoder, feature_schema=audio_schema()
    ).transform(with_wav)
    return feats.selectExpr(
        "doc_id",
        "stack(9, "
        "'a_channels', cast(wav_channels AS double), "
        "'a_sample_rate', cast(wav_sample_rate AS double), "
        "'a_bit_depth', cast(wav_bit_depth AS double), "
        "'a_n_frames', cast(wav_n_frames AS double), "
        f"'a_duration', {R6('wav_duration_s')}, "
        f"'a_rms', {R6('wav_rms')}, "
        f"'a_peak', {R6('wav_peak')}, "
        f"'a_zcr', {R6('wav_zero_crossing_rate')}, "
        "'a_fmt_ok', cast(wav_format = (CASE WHEN doc_id % 2 = 0 "
        "THEN 'wav' ELSE 'mp3' END) AS double)"
        ") AS (feat, v)",
    )


@_reg(
    "video_probe",
    # REAL video-container probing (operators/videocodec.py: ISO BMFF
    # box walking): each document gets a deterministic minimal MP4 whose
    # movie duration / dims / track shape derive from doc_id; the probe
    # must recover them exactly (duration ticks are integral at
    # timescale 1000, so duration_s is exact).
    """WITH m AS (SELECT doc_id,
  CAST((doc_id % 40 + 1) * 250 AS DOUBLE) / 1000 dur,
  CAST(160 * (doc_id % 4 + 1) AS DOUBLE) w,
  CAST(90 * (doc_id % 4 + 1) AS DOUBLE) h,
  CAST(doc_id % 2 AS DOUBLE) au
FROM documents)
SELECT doc_id, 'v_duration' AS feat, dur AS v FROM m
UNION ALL SELECT doc_id, 'v_width', w FROM m
UNION ALL SELECT doc_id, 'v_height', h FROM m
UNION ALL SELECT doc_id, 'v_n_tracks', 1 + au FROM m
UNION ALL SELECT doc_id, 'v_has_video', 1.0 FROM m
UNION ALL SELECT doc_id, 'v_has_audio', au FROM m
UNION ALL SELECT doc_id, 'v_is_mp4', 1.0 FROM m
UNION ALL SELECT doc_id, 'v_keep',
  CAST(dur >= 2.0 AND dur <= 8.0 AND w >= 320 AND h >= 180
       AS DOUBLE) FROM m""",
)
def q_video_probe(spark, sf_dir):
    from feature_factory_spark.operators.videocodec import (
        mp4_decoder,
        video_schema,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from feature_factory_spark.operators.videocodec import synth_mp4

        for pdf in batches:
            pdf["mp4"] = [
                synth_mp4(
                    (int(i) % 40 + 1) * 0.25,
                    160 * (int(i) % 4 + 1),
                    90 * (int(i) % 4 + 1),
                    n_audio_tracks=int(i) % 2,
                )
                for i in pdf["doc_id"]
            ]
            yield pdf

    with_mp4 = docs.mapInPandas(synth, "doc_id bigint, mp4 binary")
    # r9: probe via VideoQualityFilter (same Arrow seam, vq_ prefix) so
    # the container-metadata keep rule is pinned as one more row:
    # duration in [2, 8] s, min side 320x180 over the fixture law
    feats = ff.VideoQualityFilter(
        "mp4", min_duration_s=2.0, max_duration_s=8.0,
        min_width=320, min_height=180,
    ).transform(with_mp4)
    return feats.selectExpr(
        "doc_id",
        "stack(8, "
        "'v_duration', mp4_vq_duration_s, "
        "'v_width', mp4_vq_width, "
        "'v_height', mp4_vq_height, "
        "'v_n_tracks', cast(mp4_vq_n_tracks AS double), "
        "'v_has_video', cast(mp4_vq_has_video AS double), "
        "'v_has_audio', cast(mp4_vq_has_audio AS double), "
        "'v_is_mp4', cast(mp4_vq_format = 'mp4' AS double), "
        "'v_keep', cast(mp4_keep AS double)"
        ") AS (feat, v)",
    )


@_reg(
    "pdf_probe",
    # REAL PDF structure probing (r8, operators/pdfcodec.py): each doc
    # gets a deterministic minimal PDF (make_pdf — catalog + page tree
    # + pages + byte-correct xref) whose page count / version /
    # encryption flag derive from doc_id; every third doc is TRUNCATED
    # (the trailing 30 bytes cut) so has_eof exercises both branches
    # while the object/page counts survive.
    """WITH m AS (SELECT doc_id,
  CAST(doc_id % 9 + 1 AS DOUBLE) np,
  CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS DOUBLE) enc,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS DOUBLE) eof,
  CASE doc_id % 2 WHEN 0 THEN '1.4' ELSE '1.7' END AS ver
FROM documents)
SELECT doc_id, 'p_pages' AS feat, np AS v FROM m
UNION ALL SELECT doc_id, 'p_declared', np FROM m
UNION ALL SELECT doc_id, 'p_objects', np + 2 FROM m
UNION ALL SELECT doc_id, 'p_encrypted', enc FROM m
UNION ALL SELECT doc_id, 'p_has_eof', eof FROM m
UNION ALL SELECT doc_id, 'p_has_xref', 1.0 FROM m
UNION ALL SELECT doc_id, 'p_version_ok', CAST(ver = ver AS DOUBLE) FROM m
UNION ALL SELECT doc_id, 'p_is_pdf', 1.0 FROM m""",
)
def q_pdf_probe(spark, sf_dir):
    from feature_factory_spark.operators.pdfcodec import (
        pdf_decoder,
        pdf_schema,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from feature_factory_spark.operators.pdfcodec import make_pdf

        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                b = make_pdf(
                    i % 9 + 1,
                    version="1.4" if i % 2 == 0 else "1.7",
                    encrypted=i % 4 == 0,
                )
                if i % 3 == 0:
                    b = b[:-30]  # truncated download
                payloads.append(b)
            pdf["doc"] = payloads
            yield pdf

    with_pdf = docs.mapInPandas(synth, "doc_id bigint, doc binary")
    feats = ff.BinaryFeatureExtractor(
        "doc", decoder=pdf_decoder, feature_schema=pdf_schema()
    ).transform(with_pdf)
    return feats.selectExpr(
        "doc_id",
        "stack(8, "
        "'p_pages', cast(doc_n_pages AS double), "
        "'p_declared', cast(doc_declared_pages AS double), "
        "'p_objects', cast(doc_n_objects AS double), "
        "'p_encrypted', cast(doc_encrypted AS double), "
        "'p_has_eof', cast(doc_has_eof AS double), "
        "'p_has_xref', cast(doc_has_xref AS double), "
        "'p_version_ok', cast(doc_version = (CASE WHEN doc_id % 2 = 0 "
        "THEN '1.4' ELSE '1.7' END) AS double), "
        "'p_is_pdf', cast(doc_format = 'pdf' AS double)"
        ") AS (feat, v)",
    )


@_reg(
    "pdf_text",
    # REAL PDF text extraction (r9, operators/pdfcodec.py
    # extract_pdf_text): each doc gets a make_pdf fixture with KNOWN
    # page texts (np = id%3+1 pages, text law below; every 7th doc has
    # no content streams; even ids FlateDecode-compress every stream;
    # every 5th doc is truncated 30 trailing bytes — xref damage the
    # scan-based object walker must survive). The oracle restates the
    # text in closed form; pages join with chr(10).
    """WITH m AS (SELECT doc_id, doc_id % 3 + 1 AS np,
  CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END AS ht FROM documents),
t AS (SELECT doc_id, np, ht,
  CASE WHEN ht = 0 THEN '' ELSE
    'Doc ' || CAST(doc_id AS VARCHAR) || ' page 0: alpha (beta) gamma'
    || CASE WHEN np >= 2 THEN chr(10) || 'Doc ' || CAST(doc_id AS VARCHAR)
         || ' page 1: alpha (beta) gamma' ELSE '' END
    || CASE WHEN np >= 3 THEN chr(10) || 'Doc ' || CAST(doc_id AS VARCHAR)
         || ' page 2: alpha (beta) gamma' ELSE '' END
  END AS txt FROM m)
SELECT doc_id, 't_text' AS feat, CAST(NULL AS DOUBLE) AS v, txt AS s FROM t
UNION ALL SELECT doc_id, 't_pages', CAST(ht * np AS DOUBLE), NULL FROM t
UNION ALL SELECT doc_id, 't_ops', CAST(ht * np AS DOUBLE), NULL FROM t
UNION ALL SELECT doc_id, 't_chars', CAST(length(txt) AS DOUBLE), NULL
  FROM t""",
)
def q_pdf_text(spark, sf_dir):
    from feature_factory_spark.operators.pdfcodec import (
        pdf_text_decoder,
        pdf_text_schema,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from feature_factory_spark.operators.pdfcodec import make_pdf

        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                np_ = i % 3 + 1
                texts = (
                    [f"Doc {i} page {p}: alpha (beta) gamma"
                     for p in range(np_)]
                    if i % 7 != 0
                    else None
                )
                b = make_pdf(np_, page_texts=texts, compress=i % 2 == 0)
                if i % 5 == 0:
                    b = b[:-30]  # truncated download: xref/trailer gone
                payloads.append(b)
            pdf["doc"] = payloads
            yield pdf

    with_pdf = docs.mapInPandas(synth, "doc_id bigint, doc binary")
    feats = ff.BinaryFeatureExtractor(
        "doc", decoder=pdf_text_decoder, feature_schema=pdf_text_schema()
    ).transform(with_pdf)
    return feats.selectExpr(
        "doc_id",
        "stack(4, "
        "'t_text', cast(NULL AS double), doc_text, "
        "'t_pages', cast(doc_n_pages_with_text AS double), "
        "cast(NULL AS string), "
        "'t_ops', cast(doc_n_text_ops AS double), cast(NULL AS string), "
        "'t_chars', cast(doc_n_chars AS double), cast(NULL AS string)"
        ") AS (feat, v, s)",
    )


@_reg(
    "audio_quality",
    # AudioQualityFilter (r9, operators/audiocodec.py): each doc gets a
    # deterministic block WAV — (100 + id%5*50) silent samples,
    # (id%4*25) full-scale clipped samples, 200 at half scale (which
    # the 16-bit quantizer stores as 16384/32767) — and every 9th doc
    # gets non-audio bytes (NULL features, keep=false). Metrics and
    # the keep rule are restated closed-form; float reductions land on
    # the r6 grid.
    f"""WITH m AS (SELECT doc_id,
  CAST(100 + (doc_id % 5) * 50 AS DOUBLE) ns,
  CAST((doc_id % 4) * 25 AS DOUBLE) nc,
  CAST(200 AS DOUBLE) nm,
  (doc_id % 9 = 0) bad
 FROM documents),
q AS (SELECT doc_id, bad, ns, nc, nm, ns + nc + nm AS n,
  16384.0 / 32767.0 AS mid FROM m),
f AS (SELECT doc_id, bad,
  nc / n AS clip, ns / n AS sil,
  sqrt((nc * 1.0 + nm * mid * mid) / n) AS rms,
  CASE WHEN nc > 0 THEN 1.0 ELSE mid END AS peak,
  n / 8000.0 AS dur FROM q)
SELECT doc_id, 'aq_clip' AS feat,
  CASE WHEN bad THEN NULL ELSE {R6('clip')} END AS v FROM f
UNION ALL SELECT doc_id, 'aq_sil',
  CASE WHEN bad THEN NULL ELSE {R6('sil')} END FROM f
UNION ALL SELECT doc_id, 'aq_rms',
  CASE WHEN bad THEN NULL ELSE {R6('rms')} END FROM f
UNION ALL SELECT doc_id, 'aq_crest',
  CASE WHEN bad THEN NULL ELSE {R6('peak / rms')} END FROM f
UNION ALL SELECT doc_id, 'aq_dur',
  CASE WHEN bad THEN NULL ELSE {R6('dur')} END FROM f
UNION ALL SELECT doc_id, 'aq_keep',
  CAST(NOT bad AND clip <= 0.05 AND sil <= 0.5 AND rms >= 0.001
       AND dur >= 0.01 AS DOUBLE) FROM f""",
)
def q_audio_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import numpy as _np

        from feature_factory_spark.operators.audiocodec import encode_wav

        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 9 == 0:
                    payloads.append(b"definitely not a wav")
                    continue
                s = _np.concatenate([
                    _np.zeros(100 + (i % 5) * 50),
                    _np.ones((i % 4) * 25),
                    _np.full(200, 0.5),
                ])
                payloads.append(encode_wav(s, 8000, 1, 16))
            pdf["wav"] = payloads
            yield pdf

    with_wav = docs.mapInPandas(synth, "doc_id bigint, wav binary")
    out = ff.AudioQualityFilter(
        "wav", max_clipping_ratio=0.05, max_silence_ratio=0.5,
        min_rms=1e-3, min_duration_s=0.01,
    ).transform(with_wav)
    return out.selectExpr(
        "doc_id",
        "stack(6, "
        f"'aq_clip', {R6('wav_aq_clipping_ratio')}, "
        f"'aq_sil', {R6('wav_aq_silence_ratio')}, "
        f"'aq_rms', {R6('wav_aq_rms')}, "
        f"'aq_crest', {R6('wav_aq_crest_factor')}, "
        f"'aq_dur', {R6('wav_aq_duration_s')}, "
        "'aq_keep', cast(wav_keep AS double)"
        ") AS (feat, v)",
    )


def _SQL_ITEXT(e: str) -> str:
    """DuckDB twin of imagetext.inline_text_expr — the identical regex
    chain (script/style/comment removal, cut-tag remnants, tag strip,
    six entities with &amp; last, whitespace collapse), RE2-portable
    by construction."""
    x = e
    for pat in (
        r"(?is)<script\b[^>]*>.*?</script[^>]*>",
        r"(?is)<style\b[^>]*>.*?</style[^>]*>",
        r"(?s)<!--.*?-->",
        r"<[^>]*$",
        r"^[^<>]*>",
        r"<[^>]*>",
    ):
        x = f"regexp_replace({x}, '{pat}', ' ', 'g')"
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "''"), ("&amp;", "&"),
    ):
        x = f"replace({x}, '{ent}', '{rep}')"
    return rf"trim(regexp_replace({x}, '[ \t\r\n\f]+', ' ', 'g'))"


def _SQL_ATTR(tag: str, name: str) -> str:
    """DuckDB twin of imagetext.html_attr_expr (double-quoted,
    single-quoted, bare; NULL when absent/empty)."""
    dq = rf"nullif(regexp_extract({tag}, '(?is)\b{name}\s*=\s*\"([^\"]*)\"', 1), '')"
    sq = rf"nullif(regexp_extract({tag}, '(?is)\b{name}\s*=\s*''([^'']*)''', 1), '')"
    bare = rf"regexp_extract({tag}, '(?is)\b{name}\s*=\s*([^\s\"''>]+)', 1)"
    return f"nullif(coalesce({dq}, {sq}, {bare}), '')"


@_reg(
    "image_text_pairs",
    # ImageTextPairExtractor (r10, operators/imagetext.py): the
    # LAION-style pair-harvest layer. Pages are built in-plan from
    # documents ids: img A (always, root-relative src, double-quoted
    # alt with an entity), img B (even ids, inside <figure> with a
    # single-quoted title and a markup-bearing <figcaption>, relative
    # ../ src the resolver must dot-normalize), img D (ids % 3,
    # scheme-relative src with BARE attributes), plus a src-less ghost
    # (ids % 4) that require_src drops WITHOUT perturbing positions.
    # The oracle re-runs the ENTIRE harvest in SQL — the same tag scan
    # regex, the same split-by-tag segmentation (tag i between
    # segments i and i+1), the same three attribute forms, the same
    # figcaption probe and inline-text chain — and states URL
    # resolution closed-form per planted shape.
    f"""WITH page AS (
  SELECT doc_id,
    '<p>Intro ' || CAST(doc_id % 7 AS VARCHAR) || ' &amp; prose.</p>'
    || '<img src="/images/a-' || CAST(doc_id % 50 AS VARCHAR)
    || '.png" alt="Alt &amp; text ' || CAST(doc_id % 7 AS VARCHAR) || '">'
    || CASE WHEN doc_id % 2 = 0 THEN
         '<figure><img src=''../assets/b-' || CAST(doc_id % 9 AS VARCHAR)
         || '.jpg'' title=''T' || CAST(doc_id % 5 AS VARCHAR)
         || '''><figcaption>Caption <b>' || CAST(doc_id % 11 AS VARCHAR)
         || '</b> words</figcaption></figure>'
       ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN
         '<span>mid</span><img src=//static.example.net/d-'
         || CAST(doc_id % 4 AS VARCHAR) || '.gif alt=bare'
         || CAST(doc_id % 4 AS VARCHAR) || '>'
       ELSE '' END
    || CASE WHEN doc_id % 4 = 0 THEN '<img alt="ghost">' ELSE '' END
    || '<p>Outro &quot;end&quot;.</p>' AS html
  FROM documents),
tags AS (
  SELECT doc_id,
    unnest(regexp_extract_all(html, '(?is)<img\\b[^>]*>')) AS tag,
    generate_subscripts(regexp_extract_all(html, '(?is)<img\\b[^>]*>'), 1)
      - 1 AS pos
  FROM page),
segs AS (
  SELECT doc_id,
    unnest(regexp_split_to_array(html, '(?is)<img\\b[^>]*>')) AS seg,
    generate_subscripts(regexp_split_to_array(html, '(?is)<img\\b[^>]*>'), 1)
      - 1 AS sidx
  FROM page),
cand AS (
  SELECT t.doc_id, t.pos,
    {_SQL_ATTR('t.tag', 'src')} AS src,
    {_SQL_ATTR('t.tag', 'alt')} AS alt_raw,
    {_SQL_ATTR('t.tag', 'title')} AS title_raw,
    regexp_extract(substr(a.seg, 1, 2000),
      '(?is)<figcaption[^>]*>(.*?)</figcaption', 1) AS cap_raw,
    b.seg AS seg_b, a.seg AS seg_a
  FROM tags t
  JOIN segs b ON b.doc_id = t.doc_id AND b.sidx = t.pos
  JOIN segs a ON a.doc_id = t.doc_id AND a.sidx = t.pos + 1),
vals AS (
  SELECT doc_id, pos, src,
    CASE WHEN src LIKE '//%' THEN 'https:' || src
         WHEN src LIKE '/%' THEN 'https://img.example.org' || src
         WHEN src LIKE '../%' THEN
           'https://img.example.org/gallery/' || substr(src, 4)
    END AS url,
    nullif({_SQL_ITEXT("coalesce(alt_raw, '')")}, '') AS alt,
    nullif({_SQL_ITEXT("coalesce(title_raw, '')")}, '') AS title,
    nullif({_SQL_ITEXT('cap_raw')}, '') AS cap,
    nullif(trim({_SQL_ITEXT('seg_b')} || ' ' || {_SQL_ITEXT('seg_a')}),
           '') AS ctx
  FROM cand)
SELECT doc_id, CAST(pos AS BIGINT) AS k,
  src || '|' || coalesce(url, '-') || '|' || coalesce(alt, '-')
  || '|' || coalesce(title, '-') || '|' || coalesce(cap, '-')
  || '|' || coalesce(coalesce(alt, cap, title), '-')
  || '|' || coalesce(ctx, '-') AS val
FROM vals WHERE src IS NOT NULL""",
)
def q_image_text_pairs(spark, sf_dir):
    """ImageTextPairExtractor (operators/imagetext.py) over pages
    synthesized in-plan — pure-JVM end to end (no mapInPandas): the
    harvest regexes, the split-segmentation context windows, the
    figcaption probe, the three attribute forms, require_src pruning,
    and resolve_url_expr + canonical_url_expr against a per-doc page
    URL (root-relative, ../-relative needing dot-segment removal, and
    scheme-relative srcs all planted)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    s = lambda m: (F.col("doc_id") % m).cast("string")  # noqa: E731
    url = F.concat(
        F.lit("https://img.example.org/gallery/page-"), s(20),
        F.lit("/index.html"),
    )
    html = F.concat(
        F.lit("<p>Intro "), s(7), F.lit(" &amp; prose.</p>"),
        F.lit('<img src="/images/a-'), s(50),
        F.lit('.png" alt="Alt &amp; text '), s(7), F.lit('">'),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("<figure><img src='../assets/b-"), s(9),
                F.lit(".jpg' title='T"), s(5),
                F.lit("'><figcaption>Caption <b>"), s(11),
                F.lit("</b> words</figcaption></figure>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("<span>mid</span><img src=//static.example.net/d-"),
                s(4), F.lit(".gif alt=bare"), s(4), F.lit(">"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.lit('<img alt="ghost">'))
        .otherwise(F.lit("")),
        F.lit("<p>Outro &quot;end&quot;.</p>"),
    )
    pages = docs.select("doc_id", url.alias("url"), html.alias("html"))
    out = ff.ImageTextPairExtractor("html", url_col="url").transform(pages)
    return out.select(
        "doc_id",
        F.col("img_pos").cast("long").alias("k"),
        F.concat_ws(
            "|",
            F.col("img_src"),
            F.coalesce(F.col("img_url"), F.lit("-")),
            F.coalesce(F.col("img_alt"), F.lit("-")),
            F.coalesce(F.col("img_title"), F.lit("-")),
            F.coalesce(F.col("img_caption"), F.lit("-")),
            F.coalesce(F.col("pair_text"), F.lit("-")),
            F.coalesce(F.col("img_context"), F.lit("-")),
        ).alias("val"),
    )


@_reg(
    "image_text_score",
    # ImageTextPairScorer (r11, operators/imagetext.py): the LAION
    # CLIP-score gate over user-supplied embedding columns — pair
    # cosine + threshold 0.28. Fixture plants three pair shapes per
    # vec_id%3: identical embeddings (cosine 1 -> keep), negated
    # (cosine -1 -> drop), reversed (data-dependent cosine, keep set
    # closed-form in SQL). The twin recomputes the identical cosine
    # fold + gate.
    f"""WITH p AS (SELECT vec_id, embedding AS img,
  CASE vec_id % 3
    WHEN 0 THEN embedding
    WHEN 1 THEN list_transform(embedding, x -> -x)
    ELSE list_reverse(embedding) END AS txt
  FROM embeddings),
s AS (SELECT vec_id, {SQL_COS.format(a='img', b='txt')} AS cos FROM p)
SELECT vec_id AS doc_id, {R6('cos')} AS v,
  CAST(coalesce(cos >= 0.28, FALSE) AS VARCHAR) AS s
FROM s""",
)
def q_image_text_score(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    pairs = emb.select(
        "vec_id",
        F.col("embedding").alias("img_emb"),
        F.when(F.col("vec_id") % 3 == 0, F.col("embedding"))
        .when(
            F.col("vec_id") % 3 == 1,
            F.transform("embedding", lambda x: -x),
        )
        .otherwise(F.reverse("embedding"))
        .alias("txt_emb"),
    )
    out = ff.ImageTextPairScorer("img_emb", "txt_emb").transform(pairs)
    return out.select(
        F.col("vec_id").alias("doc_id"),
        r6(F.col("pair_cosine")).alias("v"),
        F.col("pair_cosine_keep").cast("string").alias("s"),
    )


@_reg(
    "json_extract",
    """SELECT event_id,
CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events""",
)
def q_json_extract(spark, sf_dir):
    ev = _events(spark, sf_dir)
    t = ff.JsonFeatures("props", {"k": ("$.k", "int")})
    return t.transform(ev).select("event_id", "k")


# shared md5-hash fraction in SQL (see operators/sampling.py)
SQL_HASHFRAC = (
    "(('0x' || substr(md5('ff' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    "::DOUBLE / 1152921504606846976.0)"
)


@_reg(
    "hash_sample",
    f"SELECT doc_id FROM documents WHERE {SQL_HASHFRAC} < 0.3",
)
def q_hash_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ff.HashSampler("doc_id", 0.3, salt="ff").transform(docs)
    return out.select("doc_id")


@_reg(
    "hash_split",
    f"""SELECT doc_id,
CASE WHEN {SQL_HASHFRAC} < 0.8 THEN 'train'
     WHEN {SQL_HASHFRAC} < 0.9 THEN 'valid'
     ELSE 'test' END AS split
FROM documents""",
)
def q_hash_split(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = ff.HashSplitter("doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}, salt="ff")
    return t.transform(docs).select("doc_id", "split")


@_reg(
    "corpus_shuffle",
    # CorpusShuffler (r8): seeded md5 global order + greedy
    # token-balanced shard cut, both recomputed with one global window
    # in the oracle (the Spark side runs the distributed bucket
    # prefix-sum — no global window — and must land on the identical
    # (position, shard) law)
    """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) tok,
  md5('ff|' || CAST(doc_id AS VARCHAR)) k FROM documents),
r AS (SELECT doc_id,
  row_number() OVER (ORDER BY k, doc_id) - 1 AS pos,
  coalesce(sum(tok) OVER (ORDER BY k, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pt
FROM t)
SELECT doc_id, CAST(pt // 2000 AS BIGINT) AS shard_id,
  CAST(pos AS VARCHAR) AS pos FROM r""",
)
def q_corpus_shuffle(spark, sf_dir):
    docs = _premat(_t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    ))
    op = ff.CorpusShuffler(
        "doc_id", tokens_col="n_tokens", tokens_per_shard=2000
    )
    return op.transform(docs).select(
        "doc_id", "shard_id", F.col("position").cast("string").alias("pos")
    )


_PACK_IDS_MEMO: dict = {}
_PACK_IDS_LOCK = __import__("threading").Lock()


def _pack_ids_frame(spark, sf_dir):
    """The hashed-word-ids fixture frame shared by the two
    pack-materialize members, computed ONCE per session (lazy
    localCheckpoint — the _dsir_scored pattern): the O(tokens) md5
    fold is fixture synthesis, and without the memo each member pays
    it again inside the merged family plan."""
    from feature_factory_spark.operators.embeddings import hashed_dim_expr
    from feature_factory_spark.functions.text import words_expr

    key = (spark.sparkContext.applicationId, sf_dir)
    with _PACK_IDS_LOCK:
        fr = _PACK_IDS_MEMO.get(key)
        if fr is None:
            docs = _t(spark, sf_dir, "documents")
            ids = F.transform(
                F.coalesce(
                    words_expr(F.lower(F.col("text"))),
                    F.array().cast("array<string>"),
                ),
                lambda t: hashed_dim_expr(t, 997),
            )
            fr = docs.select(
                "doc_id", "source", ids.alias("ids"),
            ).withColumn(
                "n_tokens", F.size("ids").cast("bigint")
            ).localCheckpoint(eager=False)
            _PACK_IDS_MEMO[key] = fr
    return fr


@_reg(
    "pack_materialize",
    # SequencePacker.materialize (r12): the FINAL shard rows — one row
    # per pack with the concatenated training sequence + document
    # boundaries. The twin recomputes everything relationally: hashed
    # word ids, the greedy running-sum pack law, ordered per-pack
    # flatten, and the boundary lens — fingerprinted per pack.
    r"""WITH w AS (SELECT doc_id, source,
  list_transform(
    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                x -> x <> ''),
    t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 997) AS ids
  FROM documents),
c AS (SELECT doc_id, source, ids, len(ids) AS n FROM w),
p AS (SELECT doc_id, source, ids, n,
  CAST(floor(coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256.0)
    AS BIGINT) AS pack_id
  FROM c),
g AS (SELECT source, pack_id,
  flatten(list(ids ORDER BY doc_id)) AS input_ids,
  list(doc_id ORDER BY doc_id) AS dids,
  list(n ORDER BY doc_id) AS lens
  FROM p GROUP BY source, pack_id)
SELECT pack_id AS k,
  source || ':' || md5(array_to_string(input_ids, ',')) || ':' ||
  CAST(len(dids) AS VARCHAR) || ':' ||
  CAST(coalesce(list_sum(lens), 0) AS VARCHAR) || ':' ||
  array_to_string(lens, '-') AS val
FROM g""",
)
def q_pack_materialize(spark, sf_dir):
    frame = _pack_ids_frame(spark, sf_dir)
    packer = ff.SequencePacker(
        "n_tokens", budget=256, order_col="doc_id",
        partition_cols=["source"],
    )
    m = packer.materialize(frame, "ids")
    return m.select(
        F.col("pack_id").alias("k"),
        F.concat(
            F.col("source"), F.lit(":"),
            F.md5(F.concat_ws(
                ",",
                F.transform(
                    F.col("input_ids"), lambda x: x.cast("string")
                ),
            )), F.lit(":"),
            F.col("n_docs").cast("string"), F.lit(":"),
            F.col("n_tokens").cast("string"), F.lit(":"),
            F.concat_ws(
                "-",
                F.transform(
                    F.col("doc_lens"), lambda x: x.cast("string")
                ),
            ),
        ).alias("val"),
    )


@_reg(
    "pack_materialize_sep",
    # materialize(sep_id=0, bos_id=9) (r13): the published training
    # format — BOS before and EOS after every document INSIDE
    # input_ids, the separator charged to the pack budget law. The
    # twin recomputes the emitted sequences ([9] || ids || [0]), the
    # adjusted greedy running-sum (cost = len+2), and the emitted
    # doc_lens entirely in SQL.
    r"""WITH w AS (SELECT doc_id, source,
  list_transform(
    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                x -> x <> ''),
    t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 997) AS ids
  FROM documents),
c AS (SELECT doc_id, source,
  [CAST(9 AS BIGINT)] || ids || [CAST(0 AS BIGINT)] AS ids,
  len(ids) + 2 AS n FROM w),
p AS (SELECT doc_id, source, ids, n,
  CAST(floor(coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256.0)
    AS BIGINT) AS pack_id
  FROM c),
g AS (SELECT source, pack_id,
  flatten(list(ids ORDER BY doc_id)) AS input_ids,
  list(doc_id ORDER BY doc_id) AS dids,
  list(n ORDER BY doc_id) AS lens
  FROM p GROUP BY source, pack_id)
SELECT pack_id AS k,
  source || ':' || md5(array_to_string(input_ids, ',')) || ':' ||
  CAST(len(dids) AS VARCHAR) || ':' ||
  CAST(coalesce(list_sum(lens), 0) AS VARCHAR) || ':' ||
  array_to_string(lens, '-') AS val
FROM g""",
)
def q_pack_materialize_sep(spark, sf_dir):
    frame = _pack_ids_frame(spark, sf_dir)
    packer = ff.SequencePacker(
        "n_tokens", budget=256, order_col="doc_id",
        partition_cols=["source"],
    )
    m = packer.materialize(frame, "ids", sep_id=0, bos_id=9)
    return m.select(
        F.col("pack_id").alias("k"),
        F.concat(
            F.col("source"), F.lit(":"),
            F.md5(F.concat_ws(
                ",",
                F.transform(
                    F.col("input_ids"), lambda x: x.cast("string")
                ),
            )), F.lit(":"),
            F.col("n_docs").cast("string"), F.lit(":"),
            F.col("n_tokens").cast("string"), F.lit(":"),
            F.concat_ws(
                "-",
                F.transform(
                    F.col("doc_lens"), lambda x: x.cast("string")
                ),
            ),
        ).alias("val"),
    )


@_reg(
    "shard_manifest",
    # CorpusShuffler.shard_manifest (r8): per-shard audit stats over
    # the same seeded-shuffle law as corpus_shuffle, plus an
    # order-insensitive id fingerprint (bit_xor over a 60-bit md5
    # prefix — verified to compute identically in both engines).
    """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) tok,
  md5('ff|' || CAST(doc_id AS VARCHAR)) k FROM documents),
r AS (SELECT doc_id, tok,
  row_number() OVER (ORDER BY k, doc_id) - 1 AS pos,
  coalesce(sum(tok) OVER (ORDER BY k, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pt
FROM t),
s AS (SELECT doc_id, tok, pos, CAST(pt // 2000 AS BIGINT) AS shard_id FROM r)
SELECT shard_id,
  count(*) AS n_docs, sum(tok) AS n_tokens,
  min(pos) AS first_position, max(pos) AS last_position,
  bit_xor(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
    AS id_fingerprint
FROM s GROUP BY shard_id""",
)
def q_shard_manifest(spark, sf_dir):
    docs = _premat(_t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    ))
    op = ff.CorpusShuffler(
        "doc_id", tokens_col="n_tokens", tokens_per_shard=2000
    )
    return op.shard_manifest(docs).select(
        "shard_id",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("first_position").cast("bigint").alias("first_position"),
        F.col("last_position").cast("bigint").alias("last_position"),
        "id_fingerprint",
    )


@_reg(
    "sequence_pack",
    """WITH t AS (SELECT doc_id, source, len(string_split(text, ' ')) tokens FROM documents)
SELECT doc_id,
CAST(floor(COALESCE(sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS BIGINT) AS pack_id
FROM t""",
)
def q_sequence_pack(spark, sf_dir):
    # token counts are the member's FIXTURE (a real corpus carries
    # them); pre-materialize so lite times the packer, not the split
    docs = _premat(_t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).alias("tokens"),
    ))
    t = ff.SequencePacker("tokens", budget=512, order_col="doc_id", partition_cols=["source"])
    return t.transform(docs).select("doc_id", "pack_id")


@_reg(
    "doc_chunk",
    # DuckDB twin of DocumentChunker(chunk_size=32, overlap=8):
    # step 24, chunk i = words[i*24+1 .. i*24+32] (list slice inclusive).
    # Tokenization mirrors functions/text.words_expr: empty tokens are
    # filtered and NULL/blank documents yield zero chunk rows.
    """WITH d AS (SELECT doc_id,
  list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') w
  FROM documents WHERE text IS NOT NULL),
c AS (SELECT doc_id, w,
  1 + CAST(ceil(greatest(len(w) - 32, 0) / 24.0) AS INT) nc FROM d
  WHERE len(w) > 0),
e AS (SELECT doc_id, w,
  CAST(UNNEST(generate_series(1, nc)) - 1 AS INT) chunk_id FROM c)
SELECT doc_id, chunk_id,
  CAST(len(w[chunk_id*24+1 : chunk_id*24+32]) AS INT) AS chunk_n_words,
  md5(array_to_string(w[chunk_id*24+1 : chunk_id*24+32], ' ')) AS chunk_md5
FROM e""",
)
def q_doc_chunk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ff.DocumentChunker("text", chunk_size=32, overlap=8).transform(docs)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("chunk_n_words").cast("int").alias("chunk_n_words"),
        F.md5(F.col("text_chunk")).alias("chunk_md5"),
    )


@_reg(
    "weighted_sample",
    f"""SELECT doc_id FROM documents
WHERE {SQL_HASHFRAC} < (CASE source WHEN 'src0' THEN 1.0
                                    WHEN 'src1' THEN 0.5
                                    WHEN 'src2' THEN 0.0
                                    ELSE 0.2 END)""",
)
def q_weighted_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = ff.WeightedSampler(
        "doc_id", "source",
        {"src0": 1.0, "src1": 0.5, "src2": 0.0},
        default_fraction=0.2, salt="ff",
    )
    return t.transform(docs).select("doc_id")


# the three dsir members verify the SAME deterministic model (target =
# src0, raw = full corpus, seed 'dsir'); fit it once per process+sf and
# share the model-sized count lists — refitting per member tripled the
# family's two corpus-explode aggregates for zero verification value
_DSIR_MEMO: dict = {}
_DSIR_LOCK = __import__("threading").Lock()


def _dsir_fitted(spark, sf_dir):
    op = ff.DSIRWeighter("text", id_col="doc_id", seed="dsir")
    key = ("counts", spark.sparkContext.applicationId, sf_dir)
    memo = _DSIR_MEMO.get(key)
    if memo is None:
        docs = _t(spark, sf_dir, "documents")
        # ONE explode+aggregate computes BOTH bucket tables — raw over
        # all rows, target over the source='src0' rows — instead of the
        # fit_target(src0-scan) + fit(full-scan) pair: one corpus pass,
        # one shuffle, bit-identical integer counts (guide §2.1). The
        # token column is staged so the dims expression's five
        # references don't re-run the tokenizer (the DSIR _bucket_counts
        # discipline).
        rows = (
            docs.select(F.col("source"), op._toks().alias("__ff_toks"))
            .select(
                "source",
                F.explode(op._dims_from(F.col("__ff_toks"))).alias("dim"),
            )
            .groupBy("dim")
            .agg(
                F.count(F.lit(1)).alias("raw"),
                F.count(
                    F.when(F.col("source") == "src0", F.lit(1))
                ).alias("tgt"),
            )
            .collect()
        )
        nb = op.n_buckets
        raw = [0] * nb
        tgt = [0] * nb
        for r in rows:
            raw[int(r["dim"])] = int(r["raw"])
            tgt[int(r["dim"])] = int(r["tgt"])
        op.target_counts_ = tgt
        op.raw_counts_ = raw
        op._fitted = True
        _DSIR_MEMO[key] = (
            list(op.target_counts_), list(op.raw_counts_)
        )
    else:
        op.target_counts_ = list(memo[0])
        op.raw_counts_ = list(memo[1])
        op._fitted = True
    return op


def _dsir_scored(spark, sf_dir):
    """(op, scored_frame): the corpus scored ONCE and lazily
    localCheckpoint'ed — the three members' agg/filter/union branches
    would otherwise each re-evaluate the O(tokens)-per-row scoring
    fold inside the single merged family plan (measured ~5 extra
    full-corpus fold passes)."""
    key = ("scored", spark.sparkContext.applicationId, sf_dir)
    # family members build in CONCURRENT threads — without the lock
    # each dsir member races the memo and scores its own copy
    with _DSIR_LOCK:
        memo = _DSIR_MEMO.get(key)
        if memo is None:
            op = _dsir_fitted(spark, sf_dir)
            fr = op.transform(
                _t(spark, sf_dir, "documents")
            ).localCheckpoint(eager=False)
            memo = (op, fr)
            _DSIR_MEMO[key] = memo
    return memo


@_reg(
    "dsir_weight",
    # DSIRWeighter (r11, operators/sampling.py): Xie et al. 2023
    # importance resampling — hashed uni+bigram bucket models, target
    # (source='src0') vs raw log-likelihood-ratio score, plus the
    # deterministic seeded-Gumbel resampling key. The twin recomputes
    # the ENTIRE model relationally: tokenize, gram, md5 bucket,
    # Laplace-smoothed p/q tables, per-doc ratio sum, md5-uniform
    # Gumbel. Scores pin as micro-rounded integers (double->string
    # formatting differs across engines; integer strings don't).
    r"""WITH d AS (SELECT doc_id, source,
  list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
              x -> x <> '') w FROM documents),
g AS (SELECT doc_id, source,
  unnest(w || list_transform(generate_series(1, greatest(len(w)-1, 0)),
                             i -> w[i] || ' ' || w[i+1])) AS gram
  FROM d),
dm AS (SELECT doc_id, source,
  ('0x' || substr(md5(gram), 1, 15))::BIGINT % 10000 AS dim FROM g),
p AS (SELECT dim, count(*) c FROM dm WHERE source = 'src0'
  GROUP BY dim),
pt AS (SELECT sum(c) t FROM p),
q AS (SELECT dim, count(*) c FROM dm GROUP BY dim),
qt AS (SELECT sum(c) t FROM q),
r AS (SELECT u.dim,
  (ln(coalesce(p.c, 0) + 1) - ln(pt.t + 10000))
  - (ln(coalesce(q.c, 0) + 1) - ln(qt.t + 10000)) AS lr
  FROM (SELECT DISTINCT dim FROM dm) u
  LEFT JOIN p USING (dim) LEFT JOIN q USING (dim), pt, qt),
sc AS (SELECT dm.doc_id, sum(r.lr) AS score
  FROM dm JOIN r USING (dim) GROUP BY dm.doc_id),
k AS (SELECT doc_id,
  -ln(-ln(('0x' || substr(md5('dsir' || CAST(doc_id AS VARCHAR)), 1, 15))
          ::BIGINT::DOUBLE / 1152921504606846976.0)) AS gum
  FROM documents)
SELECT d0.doc_id,
  CAST(CAST(floor(coalesce(sc.score, 0) * 1000000 + 0.5) AS BIGINT)
       AS VARCHAR)
  || '|' ||
  CAST(CAST(floor((coalesce(sc.score, 0) + k.gum) * 1000000 + 0.5)
            AS BIGINT) AS VARCHAR) AS val
FROM documents d0 LEFT JOIN sc ON d0.doc_id = sc.doc_id
JOIN k ON d0.doc_id = k.doc_id""",
)
def q_dsir_weight(spark, sf_dir):
    _, out = _dsir_scored(spark, sf_dir)

    def micro(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("bigint") \
            .cast("string")

    return out.select(
        "doc_id",
        F.concat(
            micro(F.col("text_dsir")), F.lit("|"),
            micro(F.col("text_dsir_key")),
        ).alias("val"),
    )


@_reg(
    "dsir_select",
    # DSIRWeighter.select (r12, operators/sampling.py): the published
    # method's SELECTION step — Gumbel-top-k at rate=0.25 as a
    # quantile threshold over the resampling key (no global sort).
    # The twin recomputes the ENTIRE model + keys relationally (the
    # dsir_weight CTEs), takes quantile_cont(key, 0.75) (the same
    # interpolated order statistic as Spark's percentile), and keeps
    # key >= threshold; kept keys pin micro-rounded.
    r"""WITH d AS (SELECT doc_id, source,
  list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
              x -> x <> '') w FROM documents),
g AS (SELECT doc_id, source,
  unnest(w || list_transform(generate_series(1, greatest(len(w)-1, 0)),
                             i -> w[i] || ' ' || w[i+1])) AS gram
  FROM d),
dm AS (SELECT doc_id, source,
  ('0x' || substr(md5(gram), 1, 15))::BIGINT % 10000 AS dim FROM g),
p AS (SELECT dim, count(*) c FROM dm WHERE source = 'src0'
  GROUP BY dim),
pt AS (SELECT sum(c) t FROM p),
q AS (SELECT dim, count(*) c FROM dm GROUP BY dim),
qt AS (SELECT sum(c) t FROM q),
r AS (SELECT u.dim,
  (ln(coalesce(p.c, 0) + 1) - ln(pt.t + 10000))
  - (ln(coalesce(q.c, 0) + 1) - ln(qt.t + 10000)) AS lr
  FROM (SELECT DISTINCT dim FROM dm) u
  LEFT JOIN p USING (dim) LEFT JOIN q USING (dim), pt, qt),
sc AS (SELECT dm.doc_id, sum(r.lr) AS score
  FROM dm JOIN r USING (dim) GROUP BY dm.doc_id),
kk AS (SELECT d0.doc_id,
  coalesce(sc.score, 0)
  - ln(-ln(('0x' || substr(md5('dsir' || CAST(d0.doc_id AS VARCHAR)), 1, 15))
           ::BIGINT::DOUBLE / 1152921504606846976.0)) AS key
  FROM documents d0 LEFT JOIN sc ON d0.doc_id = sc.doc_id),
th AS (SELECT quantile_cont(key, 0.75) t FROM kk)
SELECT kk.doc_id,
  CAST(CAST(floor(kk.key * 1000000 + 0.5) AS BIGINT) AS VARCHAR) AS val
FROM kk, th WHERE kk.key >= th.t""",
)
def q_dsir_select(spark, sf_dir):
    op, scored = _dsir_scored(spark, sf_dir)
    kept = op.select(scored, rate=0.25)
    return kept.select(
        "doc_id",
        F.floor(F.col("text_dsir_key") * F.lit(1e6) + F.lit(0.5))
        .cast("bigint").cast("string").alias("val"),
    )


@_reg(
    "dsir_select_by",
    # DSIRWeighter.select(by=['source']) (r12): STRATIFIED Gumbel-top-k
    # — one quantile threshold per source, so every stratum keeps its
    # own top 40% (the multilingual-mix balance). The twin recomputes
    # the model + keys (the dsir CTEs) and takes quantile_cont(key,
    # 0.6) PER SOURCE.
    r"""WITH d AS (SELECT doc_id, source,
  list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
              x -> x <> '') w FROM documents),
g AS (SELECT doc_id, source,
  unnest(w || list_transform(generate_series(1, greatest(len(w)-1, 0)),
                             i -> w[i] || ' ' || w[i+1])) AS gram
  FROM d),
dm AS (SELECT doc_id, source,
  ('0x' || substr(md5(gram), 1, 15))::BIGINT % 10000 AS dim FROM g),
p AS (SELECT dim, count(*) c FROM dm WHERE source = 'src0'
  GROUP BY dim),
pt AS (SELECT sum(c) t FROM p),
q AS (SELECT dim, count(*) c FROM dm GROUP BY dim),
qt AS (SELECT sum(c) t FROM q),
r AS (SELECT u.dim,
  (ln(coalesce(p.c, 0) + 1) - ln(pt.t + 10000))
  - (ln(coalesce(q.c, 0) + 1) - ln(qt.t + 10000)) AS lr
  FROM (SELECT DISTINCT dim FROM dm) u
  LEFT JOIN p USING (dim) LEFT JOIN q USING (dim), pt, qt),
sc AS (SELECT dm.doc_id, sum(r.lr) AS score
  FROM dm JOIN r USING (dim) GROUP BY dm.doc_id),
kk AS (SELECT d0.doc_id, d0.source,
  coalesce(sc.score, 0)
  - ln(-ln(('0x' || substr(md5('dsir' || CAST(d0.doc_id AS VARCHAR)), 1, 15))
           ::BIGINT::DOUBLE / 1152921504606846976.0)) AS key
  FROM documents d0 LEFT JOIN sc ON d0.doc_id = sc.doc_id),
th AS (SELECT source, quantile_cont(key, 0.6) t FROM kk GROUP BY source)
SELECT kk.doc_id,
  kk.source || ':' ||
  CAST(CAST(floor(kk.key * 1000000 + 0.5) AS BIGINT) AS VARCHAR) AS val
FROM kk JOIN th USING (source) WHERE kk.key >= th.t""",
)
def q_dsir_select_by(spark, sf_dir):
    op, scored = _dsir_scored(spark, sf_dir)
    kept = op.select(scored, rate=0.4, by=["source"])
    return kept.select(
        "doc_id",
        F.concat(
            F.col("source"), F.lit(":"),
            F.floor(F.col("text_dsir_key") * F.lit(1e6) + F.lit(0.5))
            .cast("bigint").cast("string"),
        ).alias("val"),
    )


@_reg(
    "dsir_select_n",
    # DSIRWeighter.select(by=, n=) (r13): ~n kept PER STRATUM via
    # per-group rates from one count aggregate + the grouped
    # distinct-q percentile grid. The strata are doc_id % 3 (derived,
    # deliberately UNEQUAL sizes so the two groups get DISTINCT
    # quantiles). The twin recomputes the model + keys (the dsir
    # CTEs) and the per-group threshold by the same interpolated
    # order-statistic law: pos = (1 - n/c)(c - 1),
    # thr = x_floor + frac * (x_ceil - x_floor); groups at or under n
    # keep everything.
    r"""WITH d AS (SELECT doc_id, source,
  list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
              x -> x <> '') w FROM documents),
g AS (SELECT doc_id, source,
  unnest(w || list_transform(generate_series(1, greatest(len(w)-1, 0)),
                             i -> w[i] || ' ' || w[i+1])) AS gram
  FROM d),
dm AS (SELECT doc_id, source,
  ('0x' || substr(md5(gram), 1, 15))::BIGINT % 10000 AS dim FROM g),
p AS (SELECT dim, count(*) c FROM dm WHERE source = 'src0'
  GROUP BY dim),
pt AS (SELECT sum(c) t FROM p),
q AS (SELECT dim, count(*) c FROM dm GROUP BY dim),
qt AS (SELECT sum(c) t FROM q),
r AS (SELECT u.dim,
  (ln(coalesce(p.c, 0) + 1) - ln(pt.t + 10000))
  - (ln(coalesce(q.c, 0) + 1) - ln(qt.t + 10000)) AS lr
  FROM (SELECT DISTINCT dim FROM dm) u
  LEFT JOIN p USING (dim) LEFT JOIN q USING (dim), pt, qt),
sc AS (SELECT dm.doc_id, sum(r.lr) AS score
  FROM dm JOIN r USING (dim) GROUP BY dm.doc_id),
kk AS (SELECT d0.doc_id,
  CASE WHEN d0.doc_id % 3 = 0 THEN 'a' ELSE 'b' END AS grp,
  coalesce(sc.score, 0)
  - ln(-ln(('0x' || substr(md5('dsir' || CAST(d0.doc_id AS VARCHAR)), 1, 15))
           ::BIGINT::DOUBLE / 1152921504606846976.0)) AS key
  FROM documents d0 LEFT JOIN sc ON d0.doc_id = sc.doc_id),
pp AS (SELECT grp, c,
  (1.0 - least(1.0, 120.0 / CAST(c AS DOUBLE))) * (c - 1) AS pos
  FROM (SELECT grp, count(*) c FROM kk GROUP BY grp)),
rk AS (SELECT grp, key,
  row_number() OVER (PARTITION BY grp ORDER BY key) - 1 AS r FROM kk),
th AS (SELECT pp.grp,
  lo.key + (pp.pos - floor(pp.pos)) * (coalesce(hi.key, lo.key) - lo.key)
    AS t
  FROM pp
  JOIN rk lo ON lo.grp = pp.grp
    AND lo.r = CAST(floor(pp.pos) AS BIGINT)
  LEFT JOIN rk hi ON hi.grp = pp.grp
    AND hi.r = CAST(floor(pp.pos) AS BIGINT) + 1
  WHERE pp.c > 120)
SELECT kk.doc_id,
  kk.grp || ':' ||
  CAST(CAST(floor(kk.key * 1000000 + 0.5) AS BIGINT) AS VARCHAR) AS val
FROM kk LEFT JOIN th USING (grp)
WHERE th.t IS NULL OR kk.key >= th.t""",
)
def q_dsir_select_n(spark, sf_dir):
    op, scored = _dsir_scored(spark, sf_dir)
    grouped = scored.withColumn(
        "grp",
        F.when(F.col("doc_id") % 3 == 0, F.lit("a")).otherwise(
            F.lit("b")
        ),
    )
    kept = op.select(grouped, n=120, by=["grp"])
    return kept.select(
        "doc_id",
        F.concat(
            F.col("grp"), F.lit(":"),
            F.floor(F.col("text_dsir_key") * F.lit(1e6) + F.lit(0.5))
            .cast("bigint").cast("string"),
        ).alias("val"),
    )


@_reg(
    "contamination",
    """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
g AS (SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 1)),
                                   i -> array_to_string(w[i:i+2], ' '))) AS gram
      FROM w),
b AS (SELECT DISTINCT gram FROM g WHERE doc_id < 25),
f AS (SELECT DISTINCT g.doc_id FROM g JOIN b USING (gram))
SELECT d.doc_id, (f.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id""",
)
def q_contamination(spark, sf_dir):
    # benchmark = the first 25 docs; any doc sharing a 3-gram with them
    # is flagged (n=3 keeps the sf0.01 oracle cheap; production uses 13).
    # The checker runs through a save/load round-trip: the flags the
    # oracle hashes come from an instance restored off disk, probing
    # from the persisted gram-hash frame alone.
    docs = _t(spark, sf_dir, "documents")
    cc = ff.ContaminationChecker("text", "doc_id", n=3)
    cc.fit(docs.where(F.col("doc_id") < 25))
    cc = _state_roundtrip(
        cc, lambda: ff.ContaminationChecker("text", "doc_id", n=3), spark
    )
    return cc.transform(docs).select("doc_id", "contaminated")


@_reg(
    "contamination_overlap",
    # r7: fuzzy decontamination — flag = fraction of a doc's DISTINCT
    # 3-grams present in the first-25-docs benchmark reaches 0.5; the
    # ratio itself is hash-pinned (rounded 1e-6). Same gram pipeline as
    # the any-hit member; per-doc aggregate instead of semi-join.
    f"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
g AS (SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 1)),
                                   i -> array_to_string(w[i:i+2], ' '))) AS gram
      FROM w),
b AS (SELECT DISTINCT gram FROM g WHERE doc_id < 25),
dg AS (SELECT DISTINCT doc_id, gram FROM g),
r AS (SELECT dg.doc_id,
             CAST(count(b.gram) AS DOUBLE) / count(*) AS ratio
      FROM dg LEFT JOIN b USING (gram) GROUP BY dg.doc_id)
SELECT d.doc_id,
       coalesce(r.ratio, 0) >= 0.5 AS flag,
       {R6('coalesce(r.ratio, 0)')} AS ratio
FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id""",
)
def q_contamination_overlap(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    cc = ff.ContaminationChecker(
        "text", "doc_id", n=3, criterion="overlap", threshold=0.5
    )
    cc.fit(docs.where(F.col("doc_id") < 25))
    return cc.transform(docs).select(
        "doc_id",
        F.col("contaminated").alias("flag"),
        F.expr(R6("contaminated_ratio")).alias("ratio"),
    )


@_reg(
    "packed_ids",
    # r7: the end-to-end tokenize->pack export. BPE id sequences are
    # iterative-merge output — not one-statement SQL — so the oracle
    # pins invariants asserted eagerly against the pure-Python
    # reference (bpe.py reference_bpe/reference_tokenize + the
    # vocabulary() id layout recomputed independently) and the greedy
    # packing law recomputed in Python.
    """SELECT 'ids_match_reference' AS invariant, CAST(1 AS BIGINT) AS n
UNION ALL SELECT 'packs_match_reference', CAST(1 AS BIGINT)
UNION ALL SELECT 'pack_budget', CAST(512 AS BIGINT)
UNION ALL SELECT 'unk_free', CAST(1 AS BIGINT)
UNION ALL SELECT 'decode_roundtrip', CAST(1 AS BIGINT)""",
)
def q_packed_ids(spark, sf_dir):
    """BpeVocabBuilder.encode_ids + SequencePacker (operators/bpe.py,
    sampling.py): documents' token-ID sequences under the learned
    16-merge vocabulary, packed to 512-token shards per source. Every
    doc's id sequence is pinned against reference_tokenize mapped
    through an independently recomputed vocabulary layout; pack ids are
    pinned against the greedy running-sum law."""
    from feature_factory_spark.operators.bpe import (
        END_MARK,
        reference_bpe,
        reference_tokenize,
    )

    docs = _t(spark, sf_dir, "documents")
    sample = docs.where(F.col("doc_id") < 80)
    # fit on a deterministic 1-in-5 corpus slice: this member pins the
    # encode_ids/pack CONTRACT against the reference (the full-corpus
    # fit itself is already pinned by lm_family:bpe_vocab), so the fit
    # corpus only needs to be distributed and deterministic, not big
    fit_docs = docs.where(F.col("doc_id") % 5 == 0)
    op = ff.BpeVocabBuilder("text", "doc_id", num_merges=16, max_words=2000)
    op.fit(fit_docs)
    try:
        # the driver-mode fit already collected the capped word table;
        # reuse it instead of re-running the corpus aggregation
        wc = op.fit_word_counts_
        ref = reference_bpe(wc, 16)
        # vocabulary layout recomputed independently of vocabulary():
        # sorted fitted-table alphabet + END_MARK, then merges in order
        chars = sorted({END_MARK} | {c for w, _ in wc for c in w})
        vmap = {t: i for i, t in enumerate(chars)}
        for left, right in ref:
            tok = left + right
            if tok not in vmap:
                vmap[tok] = len(vmap)
        with_ids = op.encode_ids(sample).select(
            "doc_id", "source", "text", "text_bpe_ids"
        )
        packed = ff.SequencePacker(
            "n_tokens", budget=512, order_col="doc_id",
            partition_cols=["source"],
        ).transform(
            with_ids.withColumn(
                "n_tokens", F.size("text_bpe_ids").cast("bigint")
            )
        )
        # r8: decode_ids closes the loop in the other direction — the
        # decoded text must equal the reference ids mapped back through
        # the inverse vocabulary (unk -1 -> U+FFFD, end mark -> space).
        # The decode job is independent of the pack collect given the
        # fitted op, so it runs on an overlap thread (guard joins it
        # before the finally releases the fitted frames on failure)
        dec_res = _Overlap(
            lambda: op.decode_ids(with_ids).select(
                "doc_id", "text_bpe_ids_text"
            ).collect()
        )
        with dec_res.guard():
            rows = packed.select(
                "doc_id", "source", "text", "text_bpe_ids", "pack_id"
            ).collect()
        decoded = {
            r["doc_id"]: r["text_bpe_ids_text"]
            for r in dec_res.result()
        }
    finally:
        op.release()
    exp_ids = {
        r["doc_id"]: [
            vmap.get(s, -1)
            for w in (r["text"] or "").lower().split()
            for s in reference_tokenize(w, ref)
        ]
        for r in rows
    }
    ids_ok = all(r["text_bpe_ids"] == exp_ids[r["doc_id"]] for r in rows)
    assert ids_ok, "packed token ids diverged from reference tokenization"
    unk_free = all(-1 not in r["text_bpe_ids"] for r in rows)
    # greedy running-sum packing law, recomputed per source partition
    by_source: dict = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["doc_id"])):
        prior = by_source.get(r["source"], 0)
        expect_pack = prior // 512
        assert r["pack_id"] == expect_pack, (
            f"pack_id law broken at doc {r['doc_id']}"
        )
        by_source[r["source"]] = prior + len(exp_ids[r["doc_id"]])
    inv_vmap = {i: t for t, i in vmap.items()}
    dec_ok = True
    for r in rows:
        want = "".join(
            inv_vmap.get(i, "�") for i in exp_ids[r["doc_id"]]
        ).replace(END_MARK, " ").rstrip()
        if decoded[r["doc_id"]] != want:
            dec_ok = False
            break
    assert dec_ok, "decode_ids diverged from the inverse-vocabulary map"
    return _inv_df(spark, [
        ("ids_match_reference", int(ids_ok)),
        ("packs_match_reference", 1),
        ("pack_budget", 512),
        ("unk_free", int(unk_free)),
        ("decode_roundtrip", int(dec_ok)),
    ])


@_reg(
    "substring_spans",
    # ExactSubstringDeduplicator (Lee et al. 2021 ExactSubstr pass):
    # maximal word spans occurring verbatim in >= 2 documents. The
    # oracle replays the full pipeline — window hashes, duplicated-hash
    # table, gaps-and-islands span merge — in DuckDB; tokenization is
    # the proven words_expr twin (doc_chunk oracle).
    r"""WITH w AS (SELECT doc_id,
  list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') wd
  FROM documents WHERE text IS NOT NULL),
e AS (SELECT doc_id, wd,
  CAST(UNNEST(generate_series(0, len(wd) - 8)) AS INT) pos
  FROM w WHERE len(wd) >= 8),
g AS (SELECT doc_id, pos,
  md5(array_to_string(wd[pos+1 : pos+8], ' ')) h FROM e),
d AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
f AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (h)),
s AS (SELECT doc_id, pos,
  CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
       OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
  THEN 1 ELSE 0 END brk FROM f),
i AS (SELECT doc_id, pos,
  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) island FROM s)
SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
  CAST(max(pos) + 8 AS INT) AS span_end,
  CAST(count(*) AS BIGINT) AS n_windows
FROM i GROUP BY doc_id, island""",
)
def q_substring_spans(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)
    return op.spans(docs).select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        F.col("n_windows").cast("bigint").alias("n_windows"),
    )


@_reg(
    "substring_clean",
    # ExactSubstringDeduplicator.remove_spans (r9): the Lee et al. 2021
    # REMEDY — duplicated spans cut out, corpus-wide first occurrence
    # (min (id, pos) per window hash) kept. The oracle replays the full
    # pipeline: window hashes, dup table, winner exemption, island
    # merge, position cut, original-case rejoin; untouched docs pass
    # through verbatim.
    r"""WITH w AS (SELECT doc_id, text,
  list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') wd,
  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') wo
  FROM documents WHERE doc_id % 3 = 0),
e AS (SELECT doc_id, wd,
  CAST(UNNEST(generate_series(0, len(wd) - 8)) AS INT) pos
  FROM w WHERE text IS NOT NULL AND len(wd) >= 8),
g AS (SELECT doc_id, pos,
  md5(array_to_string(wd[pos+1 : pos+8], ' ')) h FROM e),
d AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
f AS (SELECT g.doc_id, g.pos, g.h FROM g JOIN d USING (h)),
win AS (SELECT h, min(doc_id * 1000000 + pos) wk FROM f GROUP BY h),
f2 AS (SELECT f.doc_id, f.pos FROM f JOIN win USING (h)
  WHERE f.doc_id * 1000000 + f.pos <> win.wk),
s AS (SELECT doc_id, pos,
  CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
       OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
  THEN 1 ELSE 0 END brk FROM f2),
i AS (SELECT doc_id, pos,
  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) island FROM s),
sp AS (SELECT doc_id, min(pos) st, max(pos) + 8 en
  FROM i GROUP BY doc_id, island),
cov AS (SELECT doc_id, UNNEST(generate_series(st, en - 1)) p FROM sp),
wp AS (SELECT doc_id, UNNEST(wo) word, generate_subscripts(wo, 1) - 1 p
  FROM w),
kept AS (SELECT wp.doc_id, wp.word, wp.p FROM wp LEFT JOIN cov
  ON wp.doc_id = cov.doc_id AND wp.p = cov.p WHERE cov.p IS NULL),
cl AS (SELECT doc_id, coalesce(string_agg(word, ' ' ORDER BY p), '') t
  FROM kept GROUP BY doc_id),
hd AS (SELECT DISTINCT doc_id FROM sp)
SELECT w.doc_id,
  CASE WHEN hd.doc_id IS NOT NULL THEN coalesce(cl.t, '')
       ELSE w.text END AS cleaned
FROM w LEFT JOIN hd ON w.doc_id = hd.doc_id
LEFT JOIN cl ON w.doc_id = cl.doc_id""",
)
def q_substring_clean(spark, sf_dir):
    # 1-in-3 corpus slice (the packed_ids/lm slicing precedent): the
    # member pins the remove_spans CONTRACT — winner exemption, island
    # merge, cut, verbatim pass-through — which a deterministic slice
    # exercises fully; the operator's corpus-sized window-hash shuffle
    # is already paid and pinned by the substring_spans member
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)
    return op.remove_spans(docs, keep="first").select(
        "doc_id", F.col("text").alias("cleaned")
    )


# ---------------------------------------------------------------------------
# 11. windowed aggregation over the events stream table (streaming module;
#     batch plan == stream plan modulo watermark, so the batch oracle
#     verifies the shared expression tree)
# ---------------------------------------------------------------------------


@_reg(
    "events_window",
    f"""SELECT date_trunc('hour', ts) AS window_start,
date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
event_type, count(*) AS n, {R6('sum(value)')} AS total
FROM events GROUP BY 1, 2, 3""",
)
def q_events_window(spark, sf_dir):
    from feature_factory_spark.streaming import WindowedAggregator

    ev = _events(spark, sf_dir)
    agg = WindowedAggregator(
        "ts", "1 hour", {"n": F.count("*"), "total": F.sum("value")},
        keys=["event_type"],
    )
    out = agg.transform(ev)
    return out.select(
        "window_start", "window_end", "event_type", "n",
        r6(F.col("total")).alias("total"),
    )


@_reg(
    "session_window",
    # session windows (gap 10 min) per user, rebuilt relationally in SQL.
    # Spark session_window is half-open [start, last+gap): an event at
    # EXACTLY last+gap starts a new session, hence >= (not >) below.
    """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) ts FROM events),
o AS (SELECT user_id, ts,
  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
            >= INTERVAL 10 MINUTE OR
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       THEN 1 ELSE 0 END new_session
FROM e),
s AS (SELECT user_id, ts,
  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) session_id
FROM o)
SELECT min(ts) AS window_start,
max(ts) + INTERVAL 10 MINUTE AS window_end,
user_id, count(*) AS n
FROM s GROUP BY user_id, session_id""",
)
def q_session_window(spark, sf_dir):
    from feature_factory_spark.streaming import SessionWindowAggregator

    ev = _events(spark, sf_dir)
    agg = SessionWindowAggregator(
        "ts", "10 minutes", {"n": F.count("*")}, keys=["user_id"]
    )
    out = agg.transform(ev)
    return out.select("window_start", "window_end", "user_id", "n")


@_reg(
    "line_dedup",
    # cross-corpus segment dedup (CCNet/Gopher boilerplate removal).
    # The synthetic corpus is single-line word soup, so the query
    # verifies on word segments (sep=' ') — same explode / corpus-count /
    # anti-join / ordered-reassembly plan a '\n' separator exercises.
    """WITH parts AS (SELECT doc_id, string_split(text, ' ') p FROM documents),
segs AS (SELECT doc_id, unnest(generate_series(1, len(p))) pos, unnest(p) seg
FROM parts),
dups AS (SELECT seg FROM (
  SELECT seg, count(DISTINCT doc_id) c FROM segs WHERE length(seg) >= 1
  GROUP BY seg)
  WHERE c >= 0.7 * (SELECT count(DISTINCT doc_id) FROM documents)),
marked AS (SELECT s.doc_id, s.pos, s.seg,
  (length(s.seg) >= 1 AND d.seg IS NOT NULL) AS dropped
FROM segs s LEFT JOIN dups d USING (seg)),
rebuilt AS (SELECT doc_id,
  string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE NOT dropped) AS new_text,
  count(*) FILTER (WHERE dropped) AS removed
FROM marked GROUP BY doc_id)
SELECT d.doc_id, coalesce(r.new_text, '') AS text,
CAST(coalesce(r.removed, 0) AS INTEGER) AS removed_segments
FROM documents d LEFT JOIN rebuilt r USING (doc_id)""",
)
def q_line_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    op = ff.LineDeduplicator("doc_id", "text", sep=" ", min_doc_fraction=0.7)
    out = op.transform(docs)
    return out.select(
        "doc_id", "text",
        F.col("text_removed_segments").alias("removed_segments"),
    )


@_reg(
    "unigram_logprob",
    # corpus unigram-LM quality score: mean ln(count(word)/total) per doc.
    # avg() is a reduction-order-sensitive double sum -> r6 both sides.
    f"""WITH d AS (SELECT doc_id,
  list_transform(string_split(text, ' '), x -> lower(x)) w FROM documents),
words AS (SELECT doc_id, unnest(w) word FROM d),
freq AS (SELECT word, count(*) cnt FROM words GROUP BY word),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) t FROM freq),
scored AS (SELECT doc_id, ln(CAST(greatest(cnt, 1) AS DOUBLE) / t) lp
FROM words JOIN freq USING (word), tot),
agg AS (SELECT doc_id, avg(lp) s FROM scored GROUP BY doc_id)
SELECT d2.doc_id, {R6('a.s')} AS unigram_logprob
FROM documents d2 LEFT JOIN agg a ON d2.doc_id = a.doc_id""",
)
def q_unigram_logprob(spark, sf_dir):
    # fitted-state round-trip inside the verified query: scores come
    # from a scorer restored off disk (frequency frame from parquet,
    # total_words_ from JSON), oracle-hash-pinned identical to the fit
    docs = _t(spark, sf_dir, "documents")
    op = ff.UnigramLogProbScorer("text", "doc_id").fit(docs)
    op = _state_roundtrip(
        op, lambda: ff.UnigramLogProbScorer("text", "doc_id"), spark
    )
    out = op.transform(docs)
    return out.select(
        "doc_id", r6(F.col("text_unigram_logprob")).alias("unigram_logprob")
    )


ARPA_FIXTURE = """\\data\\
ngram 1=8
ngram 2=7

\\1-grams:
-2.2\t<unk>\t-0.4
-0.9\t<s>\t-0.3
-1.1\t</s>
-0.7\ttable\t-0.2
-0.8\tquery\t-0.25
-0.9\tvalue\t-0.15
-1.0\tscan\t-0.1
-1.05\tfast\t-0.12

\\2-grams:
-0.5\t<s> table
-0.35\ttable table
-0.42\tquery value
-0.6\tvalue fast
-0.3\tscan scan
-0.55\tfast </s>
-0.48\ttable query

\\end\\
"""


@_reg(
    "arpa_score",
    # ArpaLogProbScorer (r13): the PUBLISHED KenLM/ARPA back-off model
    # import. The twin embeds the identical hand-built bigram model as
    # VALUES literals and recomputes the full Katz chain relationally:
    # <unk> mapping, <s>/</s> markers, bigram hit OR back-off(prev) +
    # unigram — every scored position, averaged per doc.
    f"""WITH uni AS (SELECT g, CAST(lp AS DOUBLE) lp, CAST(bo AS DOUBLE) bo
  FROM (VALUES
  ('<unk>', -2.2, -0.4), ('<s>', -0.9, -0.3), ('</s>', -1.1, 0.0),
  ('table', -0.7, -0.2), ('query', -0.8, -0.25), ('value', -0.9, -0.15),
  ('scan', -1.0, -0.1), ('fast', -1.05, -0.12)) v(g, lp, bo)),
bi AS (SELECT g, CAST(lp AS DOUBLE) lp FROM (VALUES
  ('<s> table', -0.5), ('table table', -0.35), ('query value', -0.42),
  ('value fast', -0.6), ('scan scan', -0.3), ('fast </s>', -0.55),
  ('table query', -0.48)) v(g, lp)),
d AS (SELECT doc_id,
  list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
              x -> x <> '') w FROM documents),
raw AS (SELECT doc_id, unnest(w) tok, generate_subscripts(w, 1) i
        FROM d),
mapped AS (SELECT r.doc_id, r.i,
  CASE WHEN u.g IS NOT NULL THEN r.tok ELSE '<unk>' END tok
  FROM raw r LEFT JOIN uni u ON u.g = r.tok),
toks AS (
  SELECT doc_id, 0 AS i, '<s>' AS tok FROM d WHERE len(w) > 0
  UNION ALL SELECT doc_id, i, tok FROM mapped
  UNION ALL SELECT doc_id, len(w) + 1, '</s>' FROM d WHERE len(w) > 0),
seq AS (SELECT doc_id, i, tok,
  lag(tok) OVER (PARTITION BY doc_id ORDER BY i) prev FROM toks),
scored AS (SELECT s.doc_id,
  CASE WHEN b.lp IS NOT NULL THEN b.lp
       ELSE coalesce(up.bo, 0.0) + uc.lp END lp
  FROM seq s
  LEFT JOIN bi b ON b.g = s.prev || ' ' || s.tok
  LEFT JOIN uni uc ON uc.g = s.tok
  LEFT JOIN uni up ON up.g = s.prev
  WHERE s.i >= 1),
agg AS (SELECT doc_id, sum(lp) s, count(*) n FROM scored
  GROUP BY doc_id)
SELECT d2.doc_id,
  CAST(a.n AS VARCHAR) AS arpa_lp_n,
  CAST(floor(a.s * 1000000 + 0.5) AS DOUBLE) AS arpa_lp
FROM documents d2 LEFT JOIN agg a ON d2.doc_id = a.doc_id""",
)
def q_arpa_score(spark, sf_dir):
    # published-model perplexity gate, state round-tripped inside the
    # verified query (ARPA text -> frame-held model -> parquet ->
    # restored scorer), oracle-hash-pinned against the SQL Katz chain
    import os

    docs = _t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="ff_arpa_")
    path = os.path.join(tmp, "fixture.arpa")
    with open(path, "w", encoding="utf-8") as f:
        f.write(ARPA_FIXTURE)
    op = ff.ArpaLogProbScorer("text", "doc_id").load_arpa(path, spark)
    op = _state_roundtrip(
        op, lambda: ff.ArpaLogProbScorer("text", "doc_id"), spark
    )
    out = op.transform(docs)
    # integer fingerprint: micro-rounded TOTAL log10 mass + scored
    # count (mean*n recovers the sum within ~1 ulp). A rounded-MEAN
    # compare is knife-edged by construction here: counts are often
    # dyadic, so means sit exactly on 1e-6 midpoints.
    total = F.col("text_arpa_logprob") * F.col("text_arpa_n_tokens")
    return out.select(
        "doc_id",
        F.col("text_arpa_n_tokens").cast("string").alias("arpa_lp_n"),
        F.floor(total * F.lit(1e6) + F.lit(0.5))
        .cast("double").alias("arpa_lp"),
    )


@_reg(
    "arpa_score_lines",
    # ArpaLogProbScorer(line_level=True) (r13): the CCNet
    # doc_log_score law — each newline-split line is its own
    # <s>...</s> sentence, document score = total logp over total
    # scored tokens. Lines are synthesized deterministically (newline
    # before every 'query') in BOTH engines; the twin recomputes the
    # per-line Katz chain with a (doc, line)-partitioned lag and one
    # doc-grain avg (== sum/sum over all scored positions).
    f"""WITH uni AS (SELECT g, CAST(lp AS DOUBLE) lp, CAST(bo AS DOUBLE) bo
  FROM (VALUES
  ('<unk>', -2.2, -0.4), ('<s>', -0.9, -0.3), ('</s>', -1.1, 0.0),
  ('table', -0.7, -0.2), ('query', -0.8, -0.25), ('value', -0.9, -0.15),
  ('scan', -1.0, -0.1), ('fast', -1.05, -0.12)) v(g, lp, bo)),
bi AS (SELECT g, CAST(lp AS DOUBLE) lp FROM (VALUES
  ('<s> table', -0.5), ('table table', -0.35), ('query value', -0.42),
  ('value fast', -0.6), ('scan scan', -0.3), ('fast </s>', -0.55),
  ('table query', -0.48)) v(g, lp)),
t AS (SELECT doc_id,
  replace(text, ' query', chr(10) || 'query') AS tx FROM documents),
l AS (SELECT doc_id,
  unnest(string_split(tx, chr(10))) AS line,
  generate_subscripts(string_split(tx, chr(10)), 1) AS ln FROM t),
d AS (SELECT doc_id, ln,
  list_filter(regexp_split_to_array(trim(lower(line)), '\\s+'),
              x -> x <> '') w FROM l),
raw AS (SELECT doc_id, ln, unnest(w) tok, generate_subscripts(w, 1) i
        FROM d),
mapped AS (SELECT r.doc_id, r.ln, r.i,
  CASE WHEN u.g IS NOT NULL THEN r.tok ELSE '<unk>' END tok
  FROM raw r LEFT JOIN uni u ON u.g = r.tok),
toks AS (
  SELECT doc_id, ln, 0 AS i, '<s>' AS tok FROM d WHERE len(w) > 0
  UNION ALL SELECT doc_id, ln, i, tok FROM mapped
  UNION ALL SELECT doc_id, ln, len(w) + 1, '</s>' FROM d
    WHERE len(w) > 0),
seq AS (SELECT doc_id, ln, i, tok,
  lag(tok) OVER (PARTITION BY doc_id, ln ORDER BY i) prev FROM toks),
scored AS (SELECT s.doc_id,
  CASE WHEN b.lp IS NOT NULL THEN b.lp
       ELSE coalesce(up.bo, 0.0) + uc.lp END lp
  FROM seq s
  LEFT JOIN bi b ON b.g = s.prev || ' ' || s.tok
  LEFT JOIN uni uc ON uc.g = s.tok
  LEFT JOIN uni up ON up.g = s.prev
  WHERE s.i >= 1),
agg AS (SELECT doc_id, sum(lp) s, count(*) n FROM scored
  GROUP BY doc_id)
SELECT d2.doc_id,
  CAST(a.n AS VARCHAR) AS arpa_line_lp_n,
  CAST(floor(a.s * 1000000 + 0.5) AS DOUBLE) AS arpa_line_lp
FROM documents d2 LEFT JOIN agg a ON d2.doc_id = a.doc_id""",
)
def q_arpa_score_lines(spark, sf_dir):
    import os

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.replace(F.col("text"), F.lit(" query"),
                          F.lit("\nquery"))
    )
    tmp = tempfile.mkdtemp(prefix="ff_arpa_l_")
    path = os.path.join(tmp, "fixture.arpa")
    with open(path, "w", encoding="utf-8") as f:
        f.write(ARPA_FIXTURE)
    op = ff.ArpaLogProbScorer(
        "text", "doc_id", line_level=True
    ).load_arpa(path, spark)
    out = op.transform(docs)
    total = F.col("text_arpa_logprob") * F.col("text_arpa_n_tokens")
    return out.select(
        "doc_id",
        F.col("text_arpa_n_tokens").cast("string")
        .alias("arpa_line_lp_n"),
        F.floor(total * F.lit(1e6) + F.lit(0.5))
        .cast("double").alias("arpa_line_lp"),
    )


@_reg(
    "perplexity_bucket",
    # CCNet-style head/middle/tail bucketing (r8, PerplexityBucketer,
    # operators/text.py): equal-mass cutpoints over the r6-rounded
    # unigram log-prob, ties toward the worse bucket. Spark's exact
    # `percentile` and DuckDB's `quantile_cont` both compute the
    # linearly-interpolated continuous quantile — verified bit-equal on
    # this data; comparisons stay on the r6 grid so an interpolated
    # cutpoint strictly between grid values cannot flip a label.
    # NULL-score (empty) docs get a NULL bucket.
    f"""WITH d AS (SELECT doc_id,
  list_transform(string_split(text, ' '), x -> lower(x)) w FROM documents),
words AS (SELECT doc_id, unnest(w) word FROM d),
freq AS (SELECT word, count(*) cnt FROM words GROUP BY word),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) t FROM freq),
scored AS (SELECT doc_id, ln(CAST(greatest(cnt, 1) AS DOUBLE) / t) lp
FROM words JOIN freq USING (word), tot),
agg AS (SELECT doc_id, {R6('avg(lp)')} s FROM scored GROUP BY doc_id),
q AS (SELECT quantile_cont(s, 1.0/3) q1, quantile_cont(s, 2.0/3) q2
FROM agg)
SELECT d2.doc_id,
  CASE WHEN a.s IS NULL THEN NULL
       WHEN a.s <= q.q1 THEN 'tail'
       WHEN a.s <= q.q2 THEN 'middle'
       ELSE 'head' END AS bucket,
  a.s AS score
FROM documents d2 LEFT JOIN agg a ON d2.doc_id = a.doc_id, q""",
)
def q_perplexity_bucket(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    scorer = ff.UnigramLogProbScorer("text", "doc_id").fit(docs)
    scored = scorer.transform(docs).select(
        "doc_id", r6(F.col("text_unigram_logprob")).alias("score")
    )
    op = ff.PerplexityBucketer("score").fit(scored)
    # fitted-state round-trip inside the verified query: cutpoints come
    # from a bucketer restored off disk (the unigram_logprob precedent)
    op = _state_roundtrip(op, lambda: ff.PerplexityBucketer("score"), spark)
    return op.transform(scored).select(
        "doc_id", F.col("score_bucket").alias("bucket"), "score"
    )


@_reg(
    "pagerank",
    # Fixed-iteration PageRank (r8, functions/graph.py pagerank): the
    # domain-authority curation signal, over a deterministic synthetic
    # link graph on the document ids (contiguous 0..N-1): each node
    # links to (id+1) % N and (id*7+3) % N. Every node has out-edges,
    # so the dangling term is exactly 0 and the oracle is the power
    # iteration unrolled as three chained CTEs. Per-node in-degree is
    # tiny, so cross-engine float drift is ~1e-16 — far under r6.
    f"""WITH n AS (SELECT count(*) c FROM documents),
e AS (SELECT DISTINCT src, dst FROM (
  SELECT doc_id AS src, (doc_id + 1) % c AS dst FROM documents, n
  UNION ALL
  SELECT doc_id, (doc_id * 7 + 3) % c FROM documents, n)),
d AS (SELECT src, count(*) deg FROM e GROUP BY src),
r0 AS (SELECT doc_id AS node, 1.0 / c AS rank FROM documents, n),
r1 AS (SELECT d2.doc_id AS node,
  0.15 / c + 0.85 * coalesce(ct.s, 0) AS rank
  FROM documents d2 CROSS JOIN n LEFT JOIN (
    SELECT e.dst, sum(r0.rank / d.deg) s
    FROM e JOIN d USING (src) JOIN r0 ON r0.node = e.src GROUP BY e.dst
  ) ct ON d2.doc_id = ct.dst),
r2 AS (SELECT d2.doc_id AS node,
  0.15 / c + 0.85 * coalesce(ct.s, 0) AS rank
  FROM documents d2 CROSS JOIN n LEFT JOIN (
    SELECT e.dst, sum(r1.rank / d.deg) s
    FROM e JOIN d USING (src) JOIN r1 ON r1.node = e.src GROUP BY e.dst
  ) ct ON d2.doc_id = ct.dst),
r3 AS (SELECT d2.doc_id AS node,
  0.15 / c + 0.85 * coalesce(ct.s, 0) AS rank
  FROM documents d2 CROSS JOIN n LEFT JOIN (
    SELECT e.dst, sum(r2.rank / d.deg) s
    FROM e JOIN d USING (src) JOIN r2 ON r2.node = e.src GROUP BY e.dst
  ) ct ON d2.doc_id = ct.dst)
SELECT node, {R6('rank')} AS rank FROM r3""",
)
def q_pagerank(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") + 1) % n).alias("dst"),
    ).union(
        docs.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 3) % n).alias("dst"),
        )
    )
    from feature_factory_spark.functions.graph import pagerank

    # every node links out by construction: skip the per-round
    # dangling-mass collects (the oracle has no dangling term either)
    return pagerank(edges, iterations=3, handle_dangling=False).select(
        "node", r6(F.col("rank")).alias("rank")
    )


@_reg(
    "bigram_logprob",
    # interpolated bigram LM: mean ln(0.75*P(w2|w1) + 0.25*P(w2)) per
    # doc. P(w2|w1) = pair/max(count(w1),1) (0 unseen), P(w2) the same
    # add-epsilon unigram floor as unigram_logprob. Bigram keys follow
    # the ngrams clamp (a <2-word doc contributes its whole text as one
    # degenerate gram). avg + the fit-time division are
    # reduction/op-order-stable doubles; avg is r6 both sides.
    f"""WITH d AS (SELECT doc_id,
  list_transform(string_split(text, ' '), x -> lower(x)) w FROM documents),
words AS (SELECT doc_id, unnest(w) word FROM d),
freq AS (SELECT word, count(*) cnt FROM words GROUP BY word),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) t FROM freq),
g AS (SELECT doc_id, list_transform(
  generate_series(1, greatest(len(w) - 1, 1)),
  i -> array_to_string(w[i:i+1], ' ')) bg FROM d),
pairs AS (SELECT doc_id, unnest(bg) pair FROM g),
pcnt AS (SELECT pair, count(*) c2 FROM pairs GROUP BY pair),
pc AS (SELECT pair,
  CAST(c2 AS DOUBLE) / CAST(greatest(coalesce(f1.cnt, 0), 1) AS DOUBLE)
    AS p_cond
FROM pcnt LEFT JOIN freq f1 ON string_split(pcnt.pair, ' ')[1] = f1.word),
s AS (SELECT p.doc_id,
  ln(0.75 * coalesce(pc.p_cond, 0.0)
     + 0.25 * (CAST(greatest(coalesce(f2.cnt, 0), 1) AS DOUBLE) / t)) lp
FROM pairs p
LEFT JOIN pc USING (pair)
LEFT JOIN freq f2 ON string_split(p.pair, ' ')[-1] = f2.word, tot),
agg AS (SELECT doc_id, avg(lp) s FROM s GROUP BY doc_id)
SELECT d2.doc_id, {R6('a.s')} AS bigram_logprob
FROM documents d2 LEFT JOIN agg a ON d2.doc_id = a.doc_id""",
)
def q_bigram_logprob(spark, sf_dir):
    """BigramLogProbScorer (operators/text.py): interpolated bigram LM
    score, model restored from disk inside the verified query
    (unigram_logprob precedent)."""
    docs = _t(spark, sf_dir, "documents")
    op = ff.BigramLogProbScorer("text", "doc_id").fit(docs)
    op = _state_roundtrip(
        op, lambda: ff.BigramLogProbScorer("text", "doc_id"), spark
    )
    return op.transform(docs).select(
        "doc_id", r6(F.col("text_bigram_logprob")).alias("bigram_logprob")
    )


# shared by the two VocabBuilder oracles: lowered whitespace words and
# the top-100 (count DESC, token ASC) vocabulary — the tie order is
# total because tokens are unique, so the cap boundary is deterministic
_SQL_VOCAB100 = """WITH w AS (SELECT doc_id,
  unnest(list_transform(string_split(text, ' '), x -> lower(x))) token
FROM documents),
counts AS (SELECT token, count(*) cnt FROM w GROUP BY token),
vocab AS (SELECT token, cnt,
  row_number() OVER (ORDER BY cnt DESC, token ASC) rank
FROM counts ORDER BY cnt DESC, token ASC LIMIT 100)"""


@_reg(
    "vocab_topk",
    # tokenizer-prep vocabulary: top-100 corpus tokens with counts/ranks
    f"""{_SQL_VOCAB100}
SELECT token, CAST(cnt AS BIGINT) AS count, CAST(rank AS INTEGER) AS rank
FROM vocab""",
)
def q_vocab_topk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return ff.VocabBuilder("text", "doc_id", vocab_size=100).build(docs).select(
        "token", "count", F.col("rank").cast("int").alias("rank")
    )


@_reg(
    "bpe_vocab",
    # the merge-pair induction is iterative argmax — not one-statement
    # SQL; the oracle pins invariants asserted eagerly against the
    # driver-side reference implementation (operators/bpe.py
    # reference_bpe / reference_tokenize) on the SAME capped word table
    """SELECT 'merges_match_reference' AS invariant, CAST(1 AS BIGINT) AS n
UNION ALL SELECT 'n_merges', CAST(16 AS BIGINT)
UNION ALL SELECT 'distributed_prefix_match', CAST(1 AS BIGINT)
UNION ALL SELECT 'token_counts_match_reference', CAST(1 AS BIGINT)
UNION ALL SELECT 'token_seqs_match_reference', CAST(1 AS BIGINT)
UNION ALL SELECT 'packer_rows_match', CAST(1 AS BIGINT)
UNION ALL SELECT 'byte_merges_match', CAST(1 AS BIGINT)
UNION ALL SELECT 'byte_ids_match', CAST(1 AS BIGINT)
UNION ALL SELECT 'byte_files_roundtrip', CAST(1 AS BIGINT)
UNION ALL SELECT 'bytelevel_apply_ids_match', CAST(1 AS BIGINT)
UNION ALL SELECT 'special_isolation_ids_match', CAST(1 AS BIGINT)
UNION ALL SELECT 'bytelevel_apply_roundtrip', CAST(1 AS BIGINT)""",
)
def q_bpe_vocab(spark, sf_dir):
    """BpeVocabBuilder (operators/bpe.py): default (driver-mode) 16-merge
    induction vs the naive pure-Python recount reference on the same
    word counts, the distributed merge-loop's 6-merge prefix vs the same
    reference (the scale path, capped because each distributed merge is
    a full cluster job), transform token counts vs per-word reference
    tokenization on a 40-doc sample, and SequencePacker packing by the
    learned counts."""
    from feature_factory_spark.operators.bpe import (
        reference_bpe,
        reference_tokenize,
    )

    docs = _t(spark, sf_dir, "documents")
    # the distributed-mode pin is ~6 serial cluster jobs (one groupBy
    # per merge — its honest scale shape); run it CONCURRENTLY with the
    # driver-mode induction + sample checks below, which are mostly
    # driver CPU + small collects, so the member's wall is
    # max(dist pin, driver checks) instead of the sum.
    # r9 slicing (VERDICT r8 "what's wrong" 1, the packed_ids
    # precedent): the distributed loop fits a deterministic 1-in-5
    # corpus slice and pins against the REFERENCE INDUCTION ON ITS OWN
    # FITTED WORD TABLE — the pin stays exact (same loop, same recount
    # machinery) while the per-merge shuffles shrink 5x
    dist = ff.BpeVocabBuilder(
        "text", "doc_id", num_merges=6, max_words=2000,
        fit_mode="distributed",
    )

    def _dist_fit():
        sl = docs.where(F.col("doc_id") % 5 == 0)
        dist.fit(sl)
        swc = [(r["word"], r["cnt"])
               for r in dist.word_counts(sl).collect()]
        return [tuple(m) for m in dist.merges_], swc

    dist_res = _Overlap(_dist_fit)

    # byte-level mode (r8): induction over the GPT-2 byte alphabet on
    # a non-Latin + emoji fixture, pinned three ways — merges vs the
    # byte-level reference, encode_ids vs reference tokenization mapped
    # through the exported vocabulary, and the saved vocab.json/
    # merges.txt files re-tokenizing every word with stdlib-only GPT-2
    # file semantics (the external-runtime loadability contract).
    # r9: runs OVERLAPPED with the dist-mode fit above and the main
    # driver checks below (VERDICT r8 "what's wrong" 1) — the fixture
    # is 3 rows, so its cost is per-job latency, which hides entirely
    # under the main path's codegen-heavy sample job.
    from feature_factory_spark.operators.bpe import byte_symbols

    byte_texts = [
        "ein schöner Tag heute 🙂",
        "日本語 テキスト 処理 heute",
        "schöner text даже кириллица 🙂🙂",
    ]

    def _byte_pins():
        bdf = _osf(spark, 
            [(i, t) for i, t in enumerate(byte_texts)],
            "doc_id bigint, text string",
        )
        bop = ff.BpeVocabBuilder(
            "text", "doc_id", num_merges=12, byte_level=True
        )
        bop.fit(bdf)
        try:
            # the driver-mode fit collected the word table: reuse it
            bwc = list(bop.fit_word_counts_)
            bref = reference_bpe(bwc, 12, byte_level=True)
            byte_ok = [tuple(m) for m in bop.merges_] == bref
            assert byte_ok, "byte-level BPE diverged from its reference"
            vocab = {r["token"]: r["id"] for r in bop.vocabulary().collect()}
            got_ids = {
                r["doc_id"]: r["text_bpe_ids"]
                for r in bop.encode_ids(bdf).collect()
            }
            exp_ids = {
                i: [
                    vocab[t]
                    for w in t_.lower().split()
                    for t in reference_tokenize(w, bref, byte_level=True)
                ]
                for i, t_ in enumerate(byte_texts)
            }
            byte_ids_ok = got_ids == exp_ids
            assert byte_ids_ok, "byte-level encode_ids diverged from reference"

            btmp = tempfile.mkdtemp(prefix="ff_bytebpe_")
            _TEMP_STATE_DIRS.append(btmp)
            bop.save_tokenizer(btmp)
            import json as _json

            fvocab = _json.load(open(os.path.join(btmp, "vocab.json")))
            flines = open(os.path.join(btmp, "merges.txt")).read().splitlines()
            fmerges = [tuple(ln.split(" ")) for ln in flines[1:]]

            def _file_tok(word):
                syms = byte_symbols(word) + ["</w>"]
                for l, r in fmerges:
                    acc = []
                    for x in syms:
                        if acc and acc[-1] == l and x == r:
                            acc[-1] = l + r
                        else:
                            acc.append(x)
                    syms = acc
                return syms

            files_ok = all(
                exp_ids[i]
                == [vocab[t] for w in t_.lower().split() for t in _file_tok(w)]
                and all(t in fvocab for w in t_.lower().split()
                        for t in _file_tok(w))
                for i, t_ in enumerate(byte_texts)
            )
            assert files_ok, "saved tokenizer files diverged from the fit"
        finally:
            bop.release()
        return byte_ok, byte_ids_ok, files_ok

    byte_res = _Overlap(_byte_pins)

    # r12: suffix-less ByteLevel APPLY-mode (the published GPT-2/
    # RoBERTa/Llama layout — 'Ġ'-prefix spaces, no end suffix): build
    # a mini GPT-2-layout tokenizer.json, load it, and pin the
    # distributed encode against the pure-Python GPT-2 reference
    # (regex pieces -> byte symbols -> merges in rank order), plus the
    # EXACT decode round-trip the whitespace engine cannot offer
    # (bytelevel segmentation covers every character, whitespace runs
    # included). ASCII fixture so Python re's classes agree with the
    # engine's \p{L} pattern; the non-ASCII row is round-trip-checked
    # only.
    def _apply_pins():
        import json as _json
        import re as _re

        from feature_factory_spark.operators.bpe import _B2U

        bl_merges = [["Ġ", "t"], ["h", "e"], ["Ġt", "he"],
                     ["l", "l"], ["e", "ll"], ["h", "ell"],
                     ["o", "w"], ["Ġ", "w"]]
        vocab = {t: i for i, t in
                 enumerate(sorted(set(_B2U.values())))}
        for l, r in bl_merges:
            vocab.setdefault(l + r, len(vocab))
        eot = len(vocab)
        vocab["<|endoftext|>"] = eot
        doc = {
            "version": "1.0",
            "added_tokens": [{"id": eot, "content": "<|endoftext|>",
                              "special": True}],
            "normalizer": None,
            "pre_tokenizer": {"type": "ByteLevel",
                              "add_prefix_space": False,
                              "trim_offsets": True, "use_regex": True},
            "post_processor": None,
            "decoder": {"type": "ByteLevel"},
            "model": {"type": "BPE", "dropout": None,
                      "unk_token": None,
                      "continuing_subword_prefix": None,
                      "end_of_word_suffix": None, "fuse_unk": False,
                      "byte_fallback": False, "vocab": vocab,
                      "merges": [f"{l} {r}" for l, r in bl_merges]},
        }
        atmp = tempfile.mkdtemp(prefix="ff_blapply_")
        _TEMP_STATE_DIRS.append(atmp)
        apath = os.path.join(atmp, "tokenizer.json")
        _json.dump(doc, open(apath, "w"))
        aop = ff.BpeVocabBuilder("text", "doc_id") \
            .load_tokenizer_json(apath, spark)
        texts = ["hello the world", "  the theft, hellow!",
                 "he'll tell 42 things.", "the", "",
                 "tab\tand\nnewline  runs",
                 "unicode: schöner 日本語 🙂",
                 # r13 AddedToken isolation: literal specials in raw
                 # text map to the control id and round-trip as text
                 "the<|endoftext|>hello", "<|endoftext|>",
                 "a <|endoftext|> b"]
        adf = _osf(spark, 
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        pat = _re.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
            r"| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")
        spat = _re.compile(_re.escape("<|endoftext|>"))

        def ref_seg_ids(text):
            ids = []
            for piece in pat.findall(text):
                syms = [_B2U[b] for b in piece.encode("utf-8")]
                for l, r in bl_merges:
                    acc = []
                    for x in syms:
                        if acc and acc[-1] == l and x == r:
                            acc[-1] = l + r
                        else:
                            acc.append(x)
                    syms = acc
                ids += [vocab.get(sy, -1) for sy in syms]
            return ids

        def ref_ids(text):
            # HF AddedToken semantics: specials split out first
            ids, pos = [], 0
            for m in spat.finditer(text):
                if m.start() > pos:
                    ids += ref_seg_ids(text[pos:m.start()])
                ids.append(eot)
                pos = m.end()
            if pos < len(text):
                ids += ref_seg_ids(text[pos:])
            return ids

        try:
            enc = aop.encode_ids(adf)
            got = {r["doc_id"]: list(r["text_bpe_ids"])
                   for r in enc.collect()}
            apply_ok = all(
                got[i] == ref_ids(t)
                for i, t in enumerate(texts) if t.isascii()
            )
            assert apply_ok, "bytelevel apply ids diverged from the " \
                "GPT-2 reference"
            # r13: every literal special maps to exactly its control id
            special_ok = all(
                got[i].count(eot) == t.count("<|endoftext|>")
                for i, t in enumerate(texts)
            )
            assert special_ok, "special isolation id counts diverged"
            dec = aop.decode_ids(enc)
            rt = {r["doc_id"]: r["text_bpe_ids_text"]
                  for r in dec.collect()}
            rt_ok = all(rt[i] == t for i, t in enumerate(texts))
            assert rt_ok, "bytelevel apply decode did not round-trip"
        finally:
            aop.release()
        return apply_ok, special_ok, rt_ok

    apply_res = _Overlap(_apply_pins)


    # a main-path failure must JOIN the byte + apply threads before
    # the family harness starts releasing fitted frames
    with apply_res.guard():
      with byte_res.guard():
        with dist_res.guard(dist.release):
            op = ff.BpeVocabBuilder(
                "text", "doc_id", num_merges=16, max_words=2000
            )
            op.fit(docs)
            # the driver-mode fit already collected the capped word table —
            # reuse it (the packed_ids precedent) instead of re-running the
            # corpus aggregation a second time
            wc = list(op.fit_word_counts_)
            ref = reference_bpe(wc, 16)
            merges_ok = [tuple(m) for m in op.merges_] == ref
            assert merges_ok, (
                f"indexed BPE diverged from reference: {op.merges_[:4]} vs {ref[:4]}"
            )

            # ONE sample job pins both paths: transform (the join-based
            # count column) layered over encode (the token sequences),
            # with the raw text in the same collect. The packer pin's
            # count job is independent given the fitted op, so it runs
            # on an overlap thread alongside the sample collect (guard
            # joins it before op.release on failure).
            sample = docs.where(F.col("doc_id") < 80)

            def _packer_pin():
                counted = op.transform(sample)
                packed = ff.SequencePacker(
                    "text_bpe_token_count", budget=512,
                    order_col="doc_id", partition_cols=["source"],
                ).transform(counted)
                return packed.count() == sample.count()

            pack_res = _Overlap(_packer_pin)
            with pack_res.guard():
                rows = (
                    op.transform(op.encode(sample))
                    .select("doc_id", "text", "text_bpe_tokens",
                            "text_bpe_token_count")
                    .collect()
                )
                texts = {r["doc_id"]: r["text"] for r in rows}
                got = {r["doc_id"]: r["text_bpe_token_count"] for r in rows}
                expect = {
                    i: sum(len(reference_tokenize(w, ref))
                           for w in (t or "").lower().split())
                    for i, t in texts.items()
                }
                tokens_ok = got == expect
                assert tokens_ok, \
                    "BPE transform token counts diverged from reference"

                seqs = {r["doc_id"]: r["text_bpe_tokens"] for r in rows}
                seq_expect = {
                    i: [s for w in (t or "").lower().split()
                        for s in reference_tokenize(w, ref)]
                    for i, t in texts.items()
                }
                seqs_ok = seqs == seq_expect
                assert seqs_ok, \
                    "BPE encode token sequences diverged from reference"

            packer_ok = pack_res.result()
            op.release()

        try:
            dist_merges, dist_wc = dist_res.result()
        finally:
            dist.release()
        dist_ok = dist_merges == reference_bpe(dist_wc, 6)
        assert dist_ok, (
            f"distributed BPE loop diverged from reference: {dist_merges}"
        )

    try:
        byte_ok, byte_ids_ok, files_ok = byte_res.result()
    except BaseException:
        byte_res.join_quietly()
        apply_res.join_quietly()
        raise
    try:
        apply_ok, special_ok, apply_rt_ok = apply_res.result()
    except BaseException:
        apply_res.join_quietly()
        raise

    return _inv_df(spark, [
        ("merges_match_reference", int(merges_ok)),
        ("n_merges", len(op.merges_)),
        ("distributed_prefix_match", int(dist_ok)),
        ("token_counts_match_reference", int(tokens_ok)),
        ("token_seqs_match_reference", int(seqs_ok)),
        ("packer_rows_match", int(packer_ok)),
        ("byte_merges_match", int(byte_ok)),
        ("byte_ids_match", int(byte_ids_ok)),
        ("byte_files_roundtrip", int(files_ok)),
        ("bytelevel_apply_ids_match", int(apply_ok)),
        ("special_isolation_ids_match", int(special_ok)),
        ("bytelevel_apply_roundtrip", int(apply_rt_ok)),
    ])


def _unigram_t5_pin(spark) -> bool:
    """r13: published-layout APPLY pin — a T5-shaped file (Precompiled
    charsmap + Replace " {2,}" chain, Metaspace
    prepend_scheme='first', unk_id with fuse, an <extra_id_0>
    sentinel) loads and encodes to HAND-COMPUTED ids: charsmap fold,
    space collapse, per-segment Metaspace law, unk fusing, and the
    sentinel's own id all land exactly. Independent of the corpus fit,
    so q_unigram_vocab runs it on an overlap thread."""
    import base64 as _b64
    import json as _json2

    from feature_factory_spark.functions.charsmap import (
        build_charsmap_blob,
    )
    from feature_factory_spark.operators.unigram import WORD_MARK

    sp = WORD_MARK
    t5_vocab = [["<pad>", -1.0], ["</s>", -1.1], ["<unk>", -1.2],
                [sp, -2.0], [sp + "the", -1.3], [sp + "low", -1.4],
                ["l", -3.0], ["o", -3.1], ["w", -3.2],
                ["t", -3.3], ["h", -3.4], ["e", -3.5]]
    blob = build_charsmap_blob({"\xa0": " ", "A": "a"})
    t5_doc = {
        "version": "1.0", "truncation": None, "padding": None,
        "added_tokens": [{"id": 100, "content": "<extra_id_0>",
                          "special": True}],
        "normalizer": {"type": "Sequence", "normalizers": [
            {"type": "Precompiled", "precompiled_charsmap":
                _b64.b64encode(blob).decode()},
            {"type": "Replace", "pattern": {"Regex": " {2,}"},
             "content": " "},
        ]},
        "pre_tokenizer": {"type": "Metaspace", "replacement": sp,
                          "prepend_scheme": "first", "split": True},
        "post_processor": None, "decoder": None,
        "model": {"type": "Unigram", "unk_id": 2,
                  "vocab": t5_vocab, "byte_fallback": False},
    }
    ttmp = tempfile.mkdtemp(prefix="ff_unigram_t5_")
    _TEMP_STATE_DIRS.append(ttmp)
    t5_path = os.path.join(ttmp, "t5_layout.json")
    _json2.dump(t5_doc, open(t5_path, "w"))
    t5 = ff.UnigramVocabBuilder("text", "doc_id") \
        .load_tokenizer_json(t5_path, spark)
    t5_texts = ["the low", "the\xa0low", "A  the",
                "the <extra_id_0> low", "qq the"]
    t5_want = [[4, 5], [4, 5], [3, 2, 4], [4, 3, 100, 5],
               [3, 2, 4]]
    try:
        t5_df = _osf(
            spark,
            [(i, t) for i, t in enumerate(t5_texts)],
            "doc_id bigint, text string",
        )
        t5_got = {r["doc_id"]: list(r["text_unigram_ids"])
                  for r in t5.encode_ids(t5_df).collect()}
        t5_ok = all(
            t5_got[i] == w for i, w in enumerate(t5_want)
        )
        assert t5_ok, f"T5-layout apply diverged: {t5_got}"
    finally:
        t5.release()
    return t5_ok



@_reg(
    "unigram_vocab",
    # the hard-EM fit is iterative argmax over a lattice — not
    # one-statement SQL; the oracle pins invariants asserted eagerly
    # against the independent pure-Python reference (operators/
    # unigram.py reference_unigram / reference_segment) on the SAME
    # capped word table, plus the distributed-vs-driver seed-count
    # cross-check and the save/reload contracts
    """SELECT 'pieces_match_reference' AS invariant, CAST(1 AS BIGINT) AS n
UNION ALL SELECT 'seed_counts_match', CAST(1 AS BIGINT)
UNION ALL SELECT 'encode_matches_reference', CAST(1 AS BIGINT)
UNION ALL SELECT 'roundtrip_decode', CAST(1 AS BIGINT)
UNION ALL SELECT 'vocab_file_roundtrip', CAST(1 AS BIGINT)
UNION ALL SELECT 'vocab_within_cap', CAST(1 AS BIGINT)
UNION ALL SELECT 't5_layout_apply_match', CAST(1 AS BIGINT)
UNION ALL SELECT 'distributed_fit_matches', CAST(1 AS BIGINT)""",
)
def q_unigram_vocab(spark, sf_dir):
    """UnigramVocabBuilder (operators/unigram.py, r9): SentencePiece-
    style unigram-LM tokenizer. Fit on the 1-in-5 corpus slice (the
    packed_ids slicing precedent): piece set + log-probs pinned
    BIT-EXACT against the independent recursive-reference EM; the
    distributed seed-substring groupBy cross-checked against the naive
    Python enumeration; sample encodes pinned per word against the
    reference segmenter; decode(encode_ids) round-trips; the exported
    spm-layout .vocab file reloads to the identical model."""
    from feature_factory_spark.operators.unigram import (
        reference_segment,
        reference_unigram,
        seed_counts,
        WORD_MARK,
    )

    docs = _t(spark, sf_dir, "documents")
    fit_docs = docs.where(F.col("doc_id") % 5 == 0)
    op = ff.UnigramVocabBuilder(
        "text", "doc_id", vocab_size=120, seed_size=400, n_iter=2,
        max_piece_len=6, max_words=2000,
    )
    # the distributed (never-collect-the-word-table) fit runs
    # OVERLAPPED with the driver-mode checks; integer-count EM makes
    # the two modes bit-identical on the same table
    dop = ff.UnigramVocabBuilder(
        "text", "doc_id", vocab_size=120, seed_size=400, n_iter=2,
        max_piece_len=6, max_words=2000, fit_mode="distributed",
    )

    def _dist_fit():
        dop.fit(fit_docs)
        return dict(dop.logprobs_)

    dist_res = _Overlap(_dist_fit)
    # the T5 published-layout apply pin is fully independent of the
    # corpus fit (its own file, its own fixture frame): run it on an
    # overlap thread from the start (the bpe_vocab apply-pin pattern)
    t5_res = _Overlap(lambda: _unigram_t5_pin(spark))
    op.fit(fit_docs)
    try:
        wc = list(op.fit_word_counts_)
        ref = reference_unigram(wc, 120, 400, 2, 6)
        pieces_ok = op.logprobs_ == ref
        assert pieces_ok, "unigram fit diverged from the EM reference"
        chars = {c for w, _ in wc for c in w}
        cap_ok = len(op.logprobs_) <= 120 + len(chars)
        assert cap_ok, "vocabulary exceeded its cap"

        # the seed-count cross-check collect is independent of the
        # sample encode job below given the fitted op — overlap them
        words = _osf(spark, wc, "word string, cnt long")
        seed_res = _Overlap(
            lambda: {
                r["piece"]: r["cnt"]
                for r in op.seed_count_frame(words).collect()
            }
        )

        sample = docs.where(F.col("doc_id") < 40)
        with seed_res.guard():
            rows = (
                op.decode_ids(op.encode_ids(op.encode(sample)))
                .select("doc_id", "text", "text_unigram_pieces",
                        "text_unigram_ids_text")
                .collect()
            )
        seed_ok = seed_res.result() == seed_counts(wc, 6)
        assert seed_ok, "distributed seed counts diverged from Python"
        enc_ok = all(
            r["text_unigram_pieces"]
            == [
                p
                for w in (r["text"] or "").lower().split()
                for p in reference_segment(WORD_MARK + w, op.logprobs_, 6)
            ]
            for r in rows
        )
        assert enc_ok, "unigram encode diverged from reference segmenter"
        rt_ok = all(
            r["text_unigram_ids_text"]
            == " ".join((r["text"] or "").lower().split())
            for r in rows
        )
        assert rt_ok, "unigram decode(encode_ids) did not round-trip"

        utmp = tempfile.mkdtemp(prefix="ff_unigram_")
        _TEMP_STATE_DIRS.append(utmp)
        op.save_tokenizer(utmp)
        re_op = ff.UnigramVocabBuilder(
            "text", "doc_id", vocab_size=120, seed_size=400, n_iter=2,
            max_piece_len=6,
        ).load_tokenizer(utmp, spark)
        file_ok = re_op.logprobs_ == op.logprobs_
        assert file_ok, "saved .vocab did not reload identically"

        t5_ok = t5_res.result()

        try:
            dist_lp = dist_res.result()
        finally:
            dop.release()
        dist_ok = dist_lp == op.logprobs_
        assert dist_ok, "distributed unigram fit diverged from driver mode"
    except BaseException:
        dist_res.join_quietly()
        t5_res.join_quietly()
        with contextlib.suppress(BaseException):
            dop.release()
        raise
    finally:
        op.release()

    return _inv_df(spark, [
        ("pieces_match_reference", int(pieces_ok)),
        ("seed_counts_match", int(seed_ok)),
        ("encode_matches_reference", int(enc_ok)),
        ("roundtrip_decode", int(rt_ok)),
        ("vocab_file_roundtrip", int(file_ok)),
        ("vocab_within_cap", int(cap_ok)),
        ("t5_layout_apply_match", int(t5_ok)),
        ("distributed_fit_matches", int(dist_ok)),
    ])


@_reg(
    "wordpiece_apply",
    # WordPieceTokenizer (r13): the BERT-family apply-mode — greedy
    # longest-match per distinct word behind BertNormalizer/
    # BertPreTokenizer. Iterative greedy matching is not
    # one-statement SQL; the oracle pins invariants asserted eagerly
    # against the pure-Python twin (bert_normalize/bert_pre_tokenize/
    # wordpiece_word — the module's own reference functions driven on
    # a 40-doc sample) plus the [CLS]/[SEP] template and the decode
    # cleanup round-trip.
    """SELECT 'wp_ids_match_reference' AS invariant, CAST(1 AS BIGINT) AS n
UNION ALL SELECT 'wp_counts_match', CAST(1 AS BIGINT)
UNION ALL SELECT 'wp_template_match', CAST(1 AS BIGINT)
UNION ALL SELECT 'wp_decode_roundtrip', CAST(1 AS BIGINT)
UNION ALL SELECT 'wp_corpus_total_positive', CAST(1 AS BIGINT)""",
)
def q_wordpiece_apply(spark, sf_dir):
    import json as _json
    import os as _os

    from feature_factory_spark.operators.wordpiece import (
        bert_normalize,
        bert_pre_tokenize,
        wordpiece_word,
    )

    docs = _t(spark, sf_dir, "documents")
    # deterministic BERT-shaped vocab over the synthetic corpus's
    # vocabulary: whole words + their suffix pieces + the char
    # alphabet, so real subword splits occur without drowning in UNK
    words = ["the", "table", "query", "value", "scan", "fast", "row",
             "join", "hash", "batch", "merge", "line", "sort",
             "group", "data", "column", "filter", "stream", "window",
             "vector", "small", "big", "slow", "key", "agg", "part",
             "order", "spark", "customer"]
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
    for w in words:
        vocab.setdefault(w, len(vocab))
    for w in ["tab", "col", "cust", "val"]:
        vocab.setdefault(w, len(vocab))
    for w in ["##le", "##umn", "##omer", "##ue", "##a", "##b"]:
        vocab.setdefault(w, len(vocab))
    for c in "abcdefghijklmnopqrstuvwxyz0123456789":
        vocab.setdefault(c, len(vocab))
        vocab.setdefault("##" + c, len(vocab))
    doc = {
        "version": "1.0", "truncation": None, "padding": None,
        "added_tokens": [
            {"id": vocab[t], "content": t, "special": True}
            for t in ("[PAD]", "[UNK]", "[CLS]", "[SEP]")
        ],
        "normalizer": {"type": "BertNormalizer", "clean_text": True,
                       "handle_chinese_chars": True,
                       "strip_accents": None, "lowercase": True},
        "pre_tokenizer": {"type": "BertPreTokenizer"},
        "post_processor": {"type": "BertProcessing",
                           "sep": ["[SEP]", vocab["[SEP]"]],
                           "cls": ["[CLS]", vocab["[CLS]"]]},
        "decoder": {"type": "WordPiece", "prefix": "##",
                    "cleanup": True},
        "model": {"type": "WordPiece", "unk_token": "[UNK]",
                  "continuing_subword_prefix": "##",
                  "max_input_chars_per_word": 100, "vocab": vocab},
    }
    tmp = tempfile.mkdtemp(prefix="ff_wp_")
    _TEMP_STATE_DIRS.append(tmp)
    path = _os.path.join(tmp, "wp.json")
    _json.dump(doc, open(path, "w"))
    op = ff.WordPieceTokenizer("text", "doc_id") \
        .load_tokenizer_json(path, spark)

    def ref_ids(text):
        ids = []
        for w in bert_pre_tokenize(bert_normalize(text or "")):
            for piece in wordpiece_word(w, set(vocab), "[UNK]"):
                ids.append(vocab.get(piece, -1))
        return ids

    sample = docs.where(F.col("doc_id") < 40)

    # the four pin jobs are independent given the loaded model — run
    # the corpus-wide aggregate (the longest), the template wrap, and
    # the decode round-trip on overlap threads so the member's wall is
    # max(job) instead of the sum (the bpe_vocab pattern)
    def _corpus_total():
        # the corpus-wide scale path: one distributed count aggregate
        return op.transform(docs).agg(
            F.sum("text_wordpiece_token_count")
        ).collect()[0][0]

    def _wrapped():
        return op.encode_ids(
            sample, add_special_tokens=True
        ).select("doc_id", "text_wordpiece_ids").collect()

    def _decoded():
        return op.decode_ids(op.encode_ids(sample)).select(
            "doc_id", "text", "text_wordpiece_ids_text"
        ).collect()

    total_res = _Overlap(_corpus_total)
    wrapped_res = _Overlap(_wrapped)
    dec_res = _Overlap(_decoded)
    with total_res.guard(), wrapped_res.guard(), dec_res.guard():
        rows = op.transform(op.encode_ids(sample)).select(
            "doc_id", "text", "text_wordpiece_ids",
            "text_wordpiece_token_count",
        ).collect()
        ids_ok = all(
            list(r["text_wordpiece_ids"]) == ref_ids(r["text"])
            for r in rows
        )
        assert ids_ok, "WordPiece ids diverged from the pure-Python twin"
        counts_ok = all(
            r["text_wordpiece_token_count"] == len(ref_ids(r["text"]))
            for r in rows
        )
        assert counts_ok, "WordPiece counts diverged from the twin"
    try:
        wrapped = wrapped_res.result()
        wmap = {r["doc_id"]: list(r["text_wordpiece_ids"])
                for r in wrapped}
        tmpl_ok = all(
            wmap[r["doc_id"]]
            == [vocab["[CLS]"], *list(r["text_wordpiece_ids"]),
                vocab["[SEP]"]]
            for r in rows
        )
        assert tmpl_ok, "[CLS]/[SEP] template diverged"
        dec = dec_res.result()
        # the corpus is lowercase single-spaced words, so WordPiece
        # decode (lossy in general) round-trips exactly here
        dec_ok = all(
            r["text_wordpiece_ids_text"] == (r["text"] or "")
            for r in dec
        )
        assert dec_ok, "WordPiece decode did not round-trip the corpus"
        total = total_res.result()
    except BaseException:
        # a failed pin must not leave sibling threads submitting jobs
        # while the family harness releases fitted frames
        dec_res.join_quietly()
        total_res.join_quietly()
        raise
    total_ok = (total or 0) > 0
    return _inv_df(spark, [
        ("wp_ids_match_reference", int(ids_ok)),
        ("wp_counts_match", int(counts_ok)),
        ("wp_template_match", int(tmpl_ok)),
        ("wp_decode_roundtrip", int(dec_ok)),
        ("wp_corpus_total_positive", int(total_ok)),
    ])


@_reg(
    "vocab_oov",
    # per-document OOV fraction under the same top-100 vocabulary (the
    # coverage audit VocabBuilder.transform runs); token-less documents
    # stay NULL on both sides via the left join
    f"""{_SQL_VOCAB100},
hits AS (SELECT w.doc_id,
  1.0 - CAST(sum(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      / count(*) AS oov
FROM w LEFT JOIN vocab v ON w.token = v.token GROUP BY w.doc_id)
SELECT d.doc_id, {R6('h.oov')} AS oov_rate
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id""",
)
def q_vocab_oov(spark, sf_dir):
    # fitted-state round-trip inside the verified query (see
    # q_unigram_logprob): OOV rates come from a restored VocabBuilder
    docs = _t(spark, sf_dir, "documents")
    vb = ff.VocabBuilder("text", "doc_id", vocab_size=100).fit(docs)
    vb = _state_roundtrip(
        vb, lambda: ff.VocabBuilder("text", "doc_id", vocab_size=100), spark
    )
    return vb.transform(docs).select(
        "doc_id", r6(F.col("text_oov_rate")).alias("oov_rate")
    )


@_reg(
    "kmeans_cluster",
    # Iterative Lloyd is not SQL-expressible; the oracle pins the
    # clustering's verifiable invariants: every row assigned, exactly k
    # clusters used, ids in range, and every assignment IS the argmax
    # cosine against the fitted centroids (re-scored independently).
    """SELECT 'n_rows' AS invariant, count(*) AS n FROM embeddings
UNION ALL SELECT 'n_clusters', CAST(8 AS BIGINT)
UNION ALL SELECT 'out_of_range', CAST(0 AS BIGINT)
UNION ALL SELECT 'not_nearest_centroid', CAST(0 AS BIGINT)""",
)
def q_kmeans_cluster(spark, sf_dir):
    from feature_factory_spark.operators.similarity import nearest_centroids_expr

    emb = _t(spark, sf_dir, "embeddings")
    with _interpreted_eval(spark):
        km = ff.KMeansClusterer("embedding", "vec_id", k=8, iterations=2)
        out = km.fit(emb).transform(emb).select("vec_id", "cluster", "embedding")
        rescored = out.select(
            "cluster",
            F.element_at(
                nearest_centroids_expr(F.col("embedding"), km.centroids_, 1), 1
            ).alias("nearest"),
        )
        agg = rescored.agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("cluster").alias("n_clusters"),
            F.sum(
                ((F.col("cluster") < 0) | (F.col("cluster") >= 8)).cast("long")
            ).alias("oor"),
            F.sum((F.col("cluster") != F.col("nearest")).cast("long")).alias("nn"),
        ).first()
    return _inv_df(spark, [
        ("n_rows", agg["n_rows"]),
        ("n_clusters", agg["n_clusters"]),
        ("out_of_range", agg["oor"]),
        ("not_nearest_centroid", agg["nn"]),
    ])


# ---------------------------------------------------------------------------
# scalers (beyond the reference inventory; operators/scaling.py)
# ---------------------------------------------------------------------------


@_reg(
    "minmax_scale",
    # min/max are exact (no reduction-order drift); r6 guards the division
    f"""WITH s AS (SELECT min(l_quantity) q_mn, max(l_quantity) q_mx,
  min(l_discount) d_mn, max(l_discount) d_mx FROM lineitem)
SELECT l_orderkey, l_linenumber,
{R6('(l_quantity - q_mn) / (q_mx - q_mn)')} AS l_quantity,
{R6('(l_discount - d_mn) / (d_mx - d_mn)')} AS l_discount
FROM lineitem, s""",
)
def q_minmax_scale(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    op = ff.MinMaxScaler(["l_quantity", "l_discount"])
    out = op.fit(li).transform(li)
    return out.select(
        "l_orderkey", "l_linenumber",
        r6(F.col("l_quantity")).alias("l_quantity"),
        r6(F.col("l_discount")).alias("l_discount"),
    )


@_reg(
    "standard_scale",
    f"""WITH s AS (SELECT avg(l_quantity) m, stddev_pop(l_quantity) sd
FROM lineitem)
SELECT l_orderkey, l_linenumber,
{R6('(l_quantity - m) / sd')} AS l_quantity
FROM lineitem, s""",
)
def q_standard_scale(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    op = ff.StandardScaler(["l_quantity"])
    out = op.fit(li).transform(li)
    return out.select(
        "l_orderkey", "l_linenumber", r6(F.col("l_quantity")).alias("l_quantity")
    )


@_reg(
    "robust_scale",
    # exact percentile == quantile_cont bit-for-bit (parity rule §2.4-A)
    f"""WITH s AS (SELECT quantile_cont(l_extendedprice, 0.25) q1,
  quantile_cont(l_extendedprice, 0.5) med,
  quantile_cont(l_extendedprice, 0.75) q3 FROM lineitem)
SELECT l_orderkey, l_linenumber,
{R6('(l_extendedprice - med) / (q3 - q1)')} AS l_extendedprice
FROM lineitem, s""",
)
def q_robust_scale(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    op = ff.RobustScaler(["l_extendedprice"])
    out = op.fit(li).transform(li)
    return out.select(
        "l_orderkey", "l_linenumber",
        r6(F.col("l_extendedprice")).alias("l_extendedprice"),
    )


# ---------------------------------------------------------------------------
# embedding projections (operators/embeddings.py)
# ---------------------------------------------------------------------------


@_reg(
    "l2_normalize",
    # exploded (vec_id, pos, val) so the hash compares scalar doubles;
    # the norm fold mirrors norm_expr's sequential left fold (list_sum
    # over list_transform — the SQL_COS-proven pattern)
    """WITH n AS (SELECT vec_id, embedding,
  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
FROM embeddings),
v AS (SELECT vec_id, generate_series(1, len(embedding)) poss,
  list_transform(embedding,
    x -> floor((x::DOUBLE / nrm) * 1000000 + 0.5) / 1000000) vals
FROM n)
SELECT vec_id, CAST(pos AS INTEGER) AS pos, val
FROM (SELECT vec_id, unnest(poss) pos, unnest(vals) val FROM v) t""",
)
def q_l2_normalize(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    out = ff.L2Normalizer("embedding").transform(emb)
    ex = out.select("vec_id", F.posexplode("embedding").alias("pos0", "val"))
    return ex.select(
        "vec_id",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        r6(F.col("val")).alias("val"),
    )


def _sql_random_projection(out_dim: int = 8, in_dim: int = 64, seed: int = 13) -> str:
    """Bake the deterministic plane matrix into the oracle as literals —
    the same floats the Spark plan carries (shortest round-trip repr
    parses back to the identical double in DuckDB)."""
    from feature_factory_spark.operators.dedup import _hyperplanes

    planes = _hyperplanes(out_dim, in_dim, seed)
    dots = ", ".join(
        "list_sum(list_transform(generate_series(1, {d}), i -> "
        "embedding[i]::DOUBLE * [{lits}][i]))".format(
            d=in_dim, lits=", ".join(repr(x) for x in p)
        )
        for p in planes
    )
    return f"""WITH p AS (SELECT vec_id, [{dots}] vals FROM embeddings),
r AS (SELECT vec_id, generate_series(1, {out_dim}) poss,
  list_transform(vals, v -> floor(v * 1000000 + 0.5) / 1000000) rvals
FROM p)
SELECT vec_id, CAST(pos AS INTEGER) AS pos, val
FROM (SELECT vec_id, unnest(poss) pos, unnest(rvals) val FROM r) t"""


@_reg(
    "quantize",
    # int8 symmetric quantization: codes at pos 1..dim, the per-vector
    # scale at pos 0 — floor(x+0.5) rounding on BOTH sides so halfway
    # points agree across engines
    """WITH s AS (SELECT vec_id, embedding,
  list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 scale
FROM embeddings),
c AS (SELECT vec_id, scale, generate_series(1, len(embedding)) poss,
  list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0.0
    ELSE floor(x::DOUBLE / scale + 0.5) END) codes
FROM s)
SELECT vec_id, CAST(0 AS INTEGER) AS pos,
  floor(scale * 1000000 + 0.5) / 1000000 AS val FROM s
UNION ALL
SELECT vec_id, CAST(pos AS INTEGER) AS pos, val
FROM (SELECT vec_id, unnest(poss) pos, unnest(codes) val FROM c) t""",
)
def q_quantize(spark, sf_dir):
    """EmbeddingQuantizer (operators/embeddings.py): int8 codes +
    per-vector scale, both SQL-recomputed (codes exploded at pos>=1,
    the scale pinned as the pos=0 row)."""
    emb = _t(spark, sf_dir, "embeddings")
    out = ff.EmbeddingQuantizer("embedding").transform(emb)
    codes = out.select(
        "vec_id", F.posexplode("embedding_q8").alias("pos0", "code")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("code").cast("double").alias("val"),
    )
    scale = out.select(
        "vec_id",
        F.lit(0).cast("int").alias("pos"),
        r6(F.col("embedding_q8_scale")).alias("val"),
    )
    return scale.unionByName(codes)


@_reg(
    "pca_project",
    # the covariance eigendecomposition is not SQL-recomputable; the
    # oracle pins eagerly-asserted invariants (vec_id NULL so the
    # member unions cleanly into the per-vector embed family; the pos
    # column indexes the invariant, val is 0/1)
    """SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(0 AS INTEGER) AS pos,
  CAST(1 AS DOUBLE) AS val
UNION ALL SELECT CAST(NULL AS BIGINT), CAST(1 AS INTEGER), CAST(1 AS DOUBLE)
UNION ALL SELECT CAST(NULL AS BIGINT), CAST(2 AS INTEGER), CAST(1 AS DOUBLE)
UNION ALL SELECT CAST(NULL AS BIGINT), CAST(3 AS INTEGER), CAST(1 AS DOUBLE)
UNION ALL SELECT CAST(NULL AS BIGINT), CAST(4 AS INTEGER), CAST(1 AS DOUBLE)""",
)
def q_pca_project(spark, sf_dir):
    """PCAProjection (operators/embeddings.py, r9): distributed moment
    fit (one narrow pass + one bounded groupBy) + driver eigh.
    Invariants, each asserted eagerly: (0) mean/components/eigenvalues
    match an independent numpy PCA on the collected vectors; (1) the
    component rows are orthonormal; (2) the Spark-side projection of a
    50-vector sample matches the numpy projection; (3) whitened
    projections have unit variance per output dim; (4) the explained-
    variance ratios are descending and sum <= 1."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    op = ff.PCAProjection("embedding", dim=64, k=8, out_col="proj")
    op.fit(emb)

    x = np.array(
        [r["embedding"] for r in emb.select("embedding")
         .orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    mean = x.mean(axis=0)
    evals_all, evecs = np.linalg.eigh(np.cov(x.T, bias=True))
    order = np.argsort(evals_all)[::-1][:8]
    comps = evecs[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    fit_ok = (
        np.allclose(op.mean_, mean, atol=1e-8)
        and np.allclose(op.components_, comps, atol=1e-7)
        and np.allclose(op.eigenvalues_, evals_all[order], atol=1e-7)
    )
    assert fit_ok, "distributed PCA fit diverged from the numpy reference"

    c = np.array(op.components_)
    ortho_ok = bool(np.allclose(c @ c.T, np.eye(8), atol=1e-9))
    assert ortho_ok, "PCA components are not orthonormal"

    sample = emb.where(F.col("vec_id") < 50)
    got = {
        r["vec_id"]: r["proj"]
        for r in op.transform(sample).select("vec_id", "proj").collect()
    }
    xs = {r["vec_id"]: np.array(r["embedding"])
          for r in sample.select("vec_id", "embedding").collect()}
    proj_ok = all(
        np.allclose(got[i], (xs[i] - np.array(op.mean_)) @ c.T, atol=1e-9)
        for i in xs
    )
    assert proj_ok, "Spark projection diverged from the numpy projection"

    wop = ff.PCAProjection(
        "embedding", dim=64, k=3, whiten=True, out_col="w"
    ).fit(emb)
    w = np.array([r["w"] for r in wop.transform(emb).select("w").collect()])
    white_ok = bool(np.allclose(w.var(axis=0), 1.0, atol=1e-6))
    assert white_ok, "whitened projection variance is not 1"

    evr = op.explained_variance_ratio_
    evr_ok = evr == sorted(evr, reverse=True) and sum(evr) <= 1.0 + 1e-12
    assert evr_ok, "explained-variance ratios are not descending/normalized"

    return _osf(spark, 
        [(None, i, float(ok)) for i, ok in enumerate(
            [fit_ok, ortho_ok, proj_ok, white_ok, evr_ok]
        )],
        "vec_id bigint, pos int, val double",
    )


@_reg(
    "tfidf_vector",
    # HashedTfIdfVectorizer (r11, operators/embeddings.py): hashed
    # TF-IDF document vectors from raw text — feature-hashing via the
    # portable md5 dimension (the samplers' idiom), smooth IDF
    # (ln((1+N)/(1+df))+1), L2 normalize. The twin recomputes the
    # ENTIRE pipeline relationally: tokenize (trim+lower+\s+ split),
    # hash to 32 dims, per-doc tf, corpus df, weight, norm — melted to
    # the family's (vec_id, pos, val) with only non-zero entries.
    f"""WITH d AS (SELECT doc_id, trim(lower(text)) AS t FROM documents),
tok AS (SELECT doc_id, unnest(regexp_split_to_array(t, '\\s+')) AS tok
  FROM d WHERE t <> ''),
dm AS (SELECT doc_id,
  ('0x' || substr(md5(tok), 1, 15))::BIGINT % 32 AS dim FROM tok),
tf AS (SELECT doc_id, dim, count(*)::DOUBLE AS tf
  FROM dm GROUP BY doc_id, dim),
dfreq AS (SELECT dim, count(DISTINCT doc_id)::DOUBLE AS dfr
  FROM dm GROUP BY dim),
nn AS (SELECT count(*)::DOUBLE AS n_docs FROM d),
w AS (SELECT t.doc_id, t.dim,
  t.tf * (ln((1 + nn.n_docs) / (1 + f.dfr)) + 1) AS wt
  FROM tf t JOIN dfreq f USING (dim), nn),
nr AS (SELECT doc_id, sqrt(sum(wt * wt)) AS nrm FROM w GROUP BY doc_id)
SELECT w.doc_id AS vec_id, CAST(w.dim AS INTEGER) AS pos,
  {R6('w.wt / nr.nrm')} AS val
FROM w JOIN nr USING (doc_id)""",
)
def q_tfidf_vector(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    op = ff.HashedTfIdfVectorizer("text", n_features=32).fit(docs)
    out = op.transform(docs)
    ex = out.select(
        "doc_id", F.posexplode("text_tfidf").alias("pos0", "v")
    )
    return ex.where(F.col("v") != 0.0).select(
        F.col("doc_id").alias("vec_id"),
        F.col("pos0").cast("int").alias("pos"),
        r6(F.col("v")).alias("val"),
    )


@_reg(
    "pq_codes",
    # ProductQuantizer (r11, operators/embeddings.py): the per-subspace
    # Lloyd fit is not SQL-recomputable, so the oracle pins eagerly
    # asserted invariants (the pca_project precedent): (0) the JVM
    # argmin codes equal numpy nearest-centroid assignment on a
    # 50-vector sample against the same codebooks; (1) decoded
    # subvectors are literal codebook rows; (2) reconstruction MSE
    # beats the zero-vector baseline. Fit determinism (refit == fit,
    # no RNG) is unit-pinned in tests/test_product_quantizer.py.
    """SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(0 AS INTEGER) AS pos,
  CAST(1 AS DOUBLE) AS val
UNION ALL SELECT CAST(NULL AS BIGINT), CAST(1 AS INTEGER), CAST(1 AS DOUBLE)
UNION ALL SELECT CAST(NULL AS BIGINT), CAST(2 AS INTEGER), CAST(1 AS DOUBLE)""",
)
def q_pq_codes(spark, sf_dir):
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    op = ff.ProductQuantizer("embedding", dim=64, m=8, k=16,
                             iterations=4)
    op.fit(emb)
    books = [np.asarray(b) for b in op.codebooks_]

    sample = emb.where(F.col("vec_id") < 50)

    # the sample pins and the full-corpus MSE aggregate are independent
    # given the fitted codebooks, and each job's cost here is dominated
    # by codegen of the m x k argmin/decode fold expressions, not rows —
    # run the MSE job on an overlap thread and collect the codes AND
    # decode pins from ONE sample frame (one codegen pass instead of
    # two identical ones)
    def _mse():
        return op.transform(emb).withColumn(
            "rec", op.decode_expr(F.col("embedding_pq"))
        ).select(
            F.avg(F.aggregate(
                F.zip_with("embedding", "rec",
                           lambda a, b: (a.cast("double") - b)
                           * (a.cast("double") - b)),
                F.lit(0.0), lambda s, v: s + v,
            )).alias("mse"),
            F.avg(F.aggregate(
                F.transform("embedding",
                            lambda a: a.cast("double") * a.cast("double")),
                F.lit(0.0), lambda s, v: s + v,
            )).alias("power"),
        ).collect()[0]

    mse_res = _Overlap(_mse)
    with mse_res.guard():
        rows = op.transform(sample).withColumn(
            "rec", op.decode_expr(F.col("embedding_pq"))
        ).select("embedding", "embedding_pq", "rec").collect()
        codes_ok = True
        for r in rows:
            codes = list(r["embedding_pq"])
            x = np.asarray(list(r["embedding"]), dtype=np.float64)
            for s, b in enumerate(books):
                sub = x[s * 8:(s + 1) * 8]
                if codes[s] != int(((b - sub) ** 2).sum(axis=1).argmin()):
                    codes_ok = False
        assert codes_ok, "JVM PQ codes diverged from numpy assignment"

        dec_ok = all(
            list(r["rec"][s * 8:(s + 1) * 8])
            == [float(x) for x in books[s][r["embedding_pq"][s]]]
            for r in rows for s in range(8)
        )
        assert dec_ok, "decode_expr returned non-codebook subvectors"
    err = mse_res.result()
    mse_ok = err["mse"] < 0.9 * err["power"]
    assert mse_ok, "PQ reconstruction no better than the zero baseline"
    # fit determinism (refit == fit, no RNG) is pinned by
    # tests/test_product_quantizer.py — repeating the whole Lloyd fit
    # inside the timed window would double the member's cost for a
    # property the unit suite already guards

    return _osf(spark, 
        [(None, i, float(ok)) for i, ok in enumerate(
            [codes_ok, dec_ok, mse_ok]
        )],
        "vec_id bigint, pos int, val double",
    )


@_reg("random_projection", _sql_random_projection())
def q_random_projection(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    op = ff.RandomProjection("embedding", out_dim=8, in_dim=64, seed=13)
    out = op.transform(emb)
    ex = out.select("vec_id", F.posexplode("embedding").alias("pos0", "val"))
    return ex.select(
        "vec_id",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        r6(F.col("val")).alias("val"),
    )


@_reg(
    "oof_mean_encode",
    # out-of-fold target encoding, rebuilt relationally: fold = md5-hash
    # bucket (cross-engine 60-bit rule), oof mean = (category totals
    # minus own-fold totals); single-fold categories fall back to the
    # global out-of-fold mean
    f"""WITH b AS (SELECT o_orderkey,
  o_orderpriority k, o_totalprice y,
  CAST(floor((('0x' || substr(md5('ff-oof' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT::DOUBLE
    / 1152921504606846976.0) * 5.0) AS INT) f
FROM orders),
m AS (SELECT o_orderkey, k, f,
  sum(y) OVER (PARTITION BY k) ks, count(y) OVER (PARTITION BY k) kc,
  sum(y) OVER (PARTITION BY k, f) kfs, count(y) OVER (PARTITION BY k, f) kfc,
  sum(y) OVER () gs, count(y) OVER () gc,
  sum(y) OVER (PARTITION BY f) fs, count(y) OVER (PARTITION BY f) fc
FROM b)
SELECT o_orderkey,
{R6('''CASE WHEN kc - kfc = 0 THEN (gs - fs) / CAST(gc - fc AS DOUBLE)
     ELSE (ks - kfs) / CAST(kc - kfc AS DOUBLE) END''')} AS priority_enc
FROM m""",
)
def q_oof_mean_encode(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    enc = ff.OutOfFoldMeanEncoder(
        ["o_orderpriority"], "o_totalprice", "o_orderkey", n_folds=5
    )
    out = enc.fit(orders).transform(orders)
    return out.select(
        "o_orderkey", r6(F.col("o_orderpriority")).alias("priority_enc")
    )


@_reg(
    "tree_discretize",
    # The distributed tree fit is not SQL-expressible; the oracle pins
    # the discretisation's verifiable invariants: every row binned
    # (count preserved, no NULL bins), bin count within the depth-3 leaf
    # budget, and bin value-ranges disjoint (a bin's max never crosses
    # the next bin's min — monotone, exhaustive binning).
    """SELECT 'n_rows' AS invariant, count(*) AS n FROM lineitem
UNION ALL SELECT 'null_bins', CAST(0 AS BIGINT)
UNION ALL SELECT 'bins_within_budget', CAST(1 AS BIGINT)
UNION ALL SELECT 'range_overlaps', CAST(0 AS BIGINT)""",
)
def q_tree_discretize(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    with _interpreted_eval(spark):
        op = ff.DecisionTreeDiscretiser(
            ["l_extendedprice"], "l_quantity", max_depth=3
        )
        out = op.fit(li).transform(
            li.withColumn("raw_price", F.col("l_extendedprice"))
        )
        # referenced by both the totals aggregate and the per-bin ranges
        binned = out.select(
            F.col("l_extendedprice").alias("bin"), "raw_price"
        ).persist()
        agg = binned.agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("bin").isNull().cast("long")).alias("null_bins"),
            (F.count_distinct("bin") <= 8).cast("long").alias("within_budget"),
        ).first()
        ranges = binned.groupBy("bin").agg(
            F.min("raw_price").alias("mn"), F.max("raw_price").alias("mx")
        )
        w = Window.orderBy("mn")
        overlaps = (
            ranges.select(
                (F.lag("mx").over(w) > F.col("mn")).cast("long").alias("overlap")
            )
            .agg(F.sum("overlap").alias("c"))
            .na.fill(0)
            .first()
        )
        binned.unpersist()
    return _inv_df(spark, [
        ("n_rows", agg["n_rows"]),
        ("null_bins", agg["null_bins"]),
        ("bins_within_budget", agg["within_budget"]),
        ("range_overlaps", overlaps["c"] or 0),
    ])


@_reg(
    "running_stats",
    # RunningAggregator's batch twin: the final running value of a finite
    # input IS its total aggregate (stream path covered by
    # tests/test_streaming_interop.py stream==batch check)
    f"""SELECT event_type, count(value) AS n,
{R6('sum(value)')} AS total, {R6('avg(value)')} AS mean_value
FROM events GROUP BY event_type""",
)
def q_running_stats(spark, sf_dir):
    from feature_factory_spark.streaming import RunningAggregator

    ev = _events(spark, sf_dir)
    out = RunningAggregator(["event_type"], "value").transform(ev)
    return out.select(
        "event_type", "n",
        r6(F.col("total")).alias("total"),
        r6(F.col("mean_value")).alias("mean_value"),
    )


# ---------------------------------------------------------------------------
# time-series features (operators/timeseries.py)
# ---------------------------------------------------------------------------


@_reg(
    "lag_features",
    # (ts, event_id) sort key: ts alone can repeat within a user
    """WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) ts,
  value FROM events)
SELECT event_id, user_id,
lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_lag_1,
lag(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_lag_3
FROM e""",
)
def q_lag_features(spark, sf_dir):
    ev = _events(spark, sf_dir)
    op = ff.LagFeatures(
        ["value"], ["ts", "event_id"], periods=[1, 3], partition_by=["user_id"]
    )
    out = op.transform(ev)
    return out.select("event_id", "user_id", "value_lag_1", "value_lag_3")


@_reg(
    "window_features",
    # rolling stats over the 3 rows strictly before each row (leakage-
    # safe shift-by-1); avg is reduction-order-stable here (<= 3 terms,
    # same order both engines) but r6 anyway
    f"""WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) ts,
  value FROM events)
SELECT event_id, user_id,
{R6('avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id '
    'ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)')} AS value_window_3_mean,
max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS value_window_3_max
FROM e""",
)
def q_window_features(spark, sf_dir):
    ev = _events(spark, sf_dir)
    op = ff.WindowFeatures(
        ["value"], ["ts", "event_id"], window=3, functions=["mean", "max"],
        partition_by=["user_id"],
    )
    out = op.transform(ev)
    return out.select(
        "event_id", "user_id",
        r6(F.col("value_window_3_mean")).alias("value_window_3_mean"),
        "value_window_3_max",
    )


@_reg(
    "expanding_features",
    # running sum over all strictly-earlier rows. sum (not mean): the
    # expanding avg's accumulation order differs between engines at
    # growing prefix lengths, while the windowed running sum is the
    # same left-to-right prefix sum in both.
    """WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) ts,
  value FROM events)
SELECT event_id, user_id,
floor((sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) * 1000000 + 0.5)
  / 1000000 AS value_expanding_sum
FROM e""",
)
def q_expanding_features(spark, sf_dir):
    ev = _events(spark, sf_dir)
    op = ff.ExpandingWindowFeatures(
        ["value"], ["ts", "event_id"], functions=["sum"],
        partition_by=["user_id"],
    )
    out = op.transform(ev)
    return out.select(
        "event_id", "user_id",
        r6(F.col("value_expanding_sum")).alias("value_expanding_sum"),
    )


# ---------------------------------------------------------------------------
# temporal joins + profiling (operators/joins.py, operators/profiling.py)
# ---------------------------------------------------------------------------


@_reg(
    "asof_join",
    # as-of join: each purchase picks the most recent click at-or-before
    # it per user (DuckDB ASOF JOIN is the exact relational twin of the
    # union+window plan). value is a pass-through double -> bit-identical.
    """WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) ts,
  event_type, value FROM events),
l AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'purchase'),
r AS (SELECT user_id, ts AS rts, value AS rv FROM e WHERE event_type = 'click')
SELECT l.event_id, l.user_id, l.ts, l.value,
r.rts AS ts_right, r.rv AS value_right
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.rts""",
)
def q_asof_join(spark, sf_dir):
    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    j = ff.AsOfJoiner(right, on=["user_id"], ts_col="ts")
    return j.transform(left)


@_reg(
    "interval_join",
    # bin-blocked point-in-interval join: views landing inside the 10-min
    # window after each error, per user. The oracle is the plain
    # inequality join the bin plan must reproduce exactly.
    """WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) ts,
  event_type FROM events),
l AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'view'),
r AS (SELECT event_id AS err_id, user_id, ts AS w_start,
  ts + INTERVAL 10 MINUTE AS w_end FROM e WHERE event_type = 'error')
SELECT l.event_id, l.user_id, l.ts, r.w_start, r.w_end, r.err_id
FROM l JOIN r ON l.user_id = r.user_id
  AND r.w_start <= l.ts AND l.ts < r.w_end""",
)
def q_interval_join(spark, sf_dir):
    ev = _events(spark, sf_dir)
    right = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    left = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    j = ff.IntervalJoiner(
        right, on=["user_id"], point_col="ts",
        start_col="w_start", end_col="w_end", bin_width_seconds=600,
    )
    return j.transform(left)


@_reg(
    "grouped_topk",
    # best-k-per-group selection (top 3 longest documents per source)
    """SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
    row_number() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) rn
  FROM documents) t WHERE rn <= 3""",
)
def q_grouped_topk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    tk = ff.GroupedTopK(["source"], "n_chars", k=3, tiebreak_cols=["doc_id"])
    return tk.transform(docs)


@_reg(
    "column_profile",
    # one-pass melted column statistics; mean/stddev are reduction-order
    # sensitive -> r6 both sides; exact distinct for oracle parity
    # (approx HLL is the default scale path, tested separately)
    f"""SELECT 'l_quantity' AS column, 'count' AS metric,
  CAST(count(l_quantity) AS DOUBLE) AS value_num, NULL AS value_str FROM lineitem
UNION ALL SELECT 'l_quantity', 'nulls',
  CAST(count(*) - count(l_quantity) AS DOUBLE), NULL FROM lineitem
UNION ALL SELECT 'l_quantity', 'distinct',
  CAST(count(DISTINCT l_quantity) AS DOUBLE), NULL FROM lineitem
UNION ALL SELECT 'l_quantity', 'min', min(l_quantity), NULL FROM lineitem
UNION ALL SELECT 'l_quantity', 'max', max(l_quantity), NULL FROM lineitem
UNION ALL SELECT 'l_quantity', 'mean', {R6('avg(l_quantity)')}, NULL FROM lineitem
UNION ALL SELECT 'l_quantity', 'stddev', {R6('stddev_samp(l_quantity)')}, NULL FROM lineitem
UNION ALL SELECT 'l_returnflag', 'count',
  CAST(count(l_returnflag) AS DOUBLE), NULL FROM lineitem
UNION ALL SELECT 'l_returnflag', 'nulls',
  CAST(count(*) - count(l_returnflag) AS DOUBLE), NULL FROM lineitem
UNION ALL SELECT 'l_returnflag', 'distinct',
  CAST(count(DISTINCT l_returnflag) AS DOUBLE), NULL FROM lineitem
UNION ALL SELECT 'l_returnflag', 'min', NULL, min(l_returnflag) FROM lineitem
UNION ALL SELECT 'l_returnflag', 'max', NULL, max(l_returnflag) FROM lineitem
UNION ALL SELECT 'l_returnflag', 'avg_len',
  {R6('avg(CAST(length(l_returnflag) AS DOUBLE))')}, NULL FROM lineitem""",
)
def q_column_profile(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    prof = ff.ColumnProfiler(
        columns=["l_quantity", "l_returnflag"], exact_distinct=True
    ).profile(li)
    return prof.select(
        "column", "metric",
        r6(F.col("value_num")).alias("value_num"), "value_str",
    )


@_reg(
    "expectations",
    # ExpectationValidator (r8, operators/expectations.py): the
    # stage-boundary data-quality gate, one aggregate job for the whole
    # check list. The oracle recomputes each check's pass bit and
    # observed value from the same aggregates; the l_orderkey
    # uniqueness check deliberately FAILS (orders have multiple lines)
    # so the report pins both outcomes.
    f"""WITH a AS (SELECT count(*) n,
  count(l_quantity) nn_q,
  count(DISTINCT l_orderkey) d_ok, count(l_orderkey) c_ok,
  sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
       AND l_returnflag IS NOT NULL THEN 1 ELSE 0 END) bad_rf,
  avg(l_quantity) avg_q
FROM lineitem)
SELECT 'rows' AS chk, 'passed' AS metric,
  CAST(CAST(n BETWEEN 1 AND 1000000000 AS INT) AS DOUBLE) AS v FROM a
UNION ALL SELECT 'rows', 'observed', CAST(n AS DOUBLE) FROM a
UNION ALL SELECT 'orderkey_unique', 'passed',
  CAST(CAST(d_ok = c_ok AS INT) AS DOUBLE) FROM a
UNION ALL SELECT 'orderkey_unique', 'observed',
  CAST(c_ok - d_ok AS DOUBLE) FROM a
UNION ALL SELECT 'qty_not_null', 'passed',
  CAST(CAST(CAST(nn_q AS DOUBLE) / n >= 0.5 AS INT) AS DOUBLE) FROM a
UNION ALL SELECT 'qty_not_null', 'observed',
  {R6('CAST(nn_q AS DOUBLE) / n')} FROM a
UNION ALL SELECT 'returnflag_domain', 'passed',
  CAST(CAST(bad_rf = 0 AS INT) AS DOUBLE) FROM a
UNION ALL SELECT 'returnflag_domain', 'observed',
  CAST(bad_rf AS DOUBLE) FROM a
UNION ALL SELECT 'qty_mean', 'passed',
  CAST(CAST(avg_q BETWEEN 0 AND 100 AS INT) AS DOUBLE) FROM a
UNION ALL SELECT 'qty_mean', 'observed', {R6('avg_q')} FROM a""",
)
def q_expectations(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    v = ff.ExpectationValidator([
        ("row_count_between", "rows", 1, 1_000_000_000),
        ("unique", "orderkey_unique", "l_orderkey"),
        ("not_null_ratio_at_least", "qty_not_null", "l_quantity", 0.5),
        ("values_in_set", "returnflag_domain", "l_returnflag",
         ["A", "N", "R"]),
        ("mean_between", "qty_mean", "l_quantity", 0.0, 100.0),
    ])
    rep = v.validate(li)
    return rep.select(
        F.col("check").alias("chk"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("passed").alias("metric"),
                    F.col("passed").cast("int").cast("double").alias("v"),
                ),
                F.struct(
                    F.lit("observed").alias("metric"),
                    r6(F.col("observed")).alias("v"),
                ),
            )
        ).alias("m"),
    ).select("chk", "m.metric", "m.v")


def _sql_pct(e: str) -> str:
    """RFC 3986 §6.2.2 percent normalization as a DuckDB expression —
    the twin of web.pct_normalize_expr (uppercase %XX, decode
    unreserved octets only, invalid triads verbatim)."""
    seg = (
        "CASE WHEN NOT regexp_matches(p[1:2], '^[0-9A-Fa-f]{2}$') "
        "THEN '%' || p "
        "WHEN regexp_matches(chr(('0x' || p[1:2])::INT), "
        "'^[A-Za-z0-9._~-]$') "
        "THEN chr(('0x' || p[1:2])::INT) || p[3:] "
        "ELSE '%' || upper(p[1:2]) || p[3:] END"
    )
    return (
        f"(string_split({e}, '%')[1] || coalesce(array_to_string("
        f"list_transform(string_split({e}, '%')[2:], p -> {seg}), "
        "''), ''))"
    )


@_reg(
    "robots_gate",
    # RobotsTxtFilter (r10, percent-normalization r11,
    # operators/web.py): the aggregate-fold robots.txt parser +
    # RFC 9309 longest-match decision, recomputed relationally — the
    # UA-group tracking becomes a gaps-and-islands window chain
    # (group = last UA-start line at or before each line), rules join
    # applying groups, the decision is row_number over (match length
    # DESC, allow DESC); rule prefixes and probe paths both pass
    # through the RFC 3986 §6.2.2 normalization twin. Four planted
    # domains exercise allow-overrides-disallow, wildcard+$ anchors,
    # multi-UA groups, comments/Sitemap lines, a non-'*' group that
    # must not apply, and (d.com) percent-encoded rules: %7e/%7E
    # decode to '~' on both sides, %2f case-normalizes to %2F without
    # conflating with '/', %c3%a9 uppercases without decoding.
    rf"""WITH robots(domain, txt) AS (VALUES
  ('a.com', 'User-agent: *' || chr(10) || 'Disallow: /private/' || chr(10)
            || 'Allow: /private/ok' || chr(10) || '# note' || chr(10)
            || 'Sitemap: http://a.com/s.xml'),
  ('b.com', 'User-agent: gptbot' || chr(10) || 'User-agent: *' || chr(10)
            || 'Disallow: /*.pdf$'),
  ('c.com', 'User-agent: otherbot' || chr(10) || 'Disallow: /'),
  ('d.com', 'User-agent: *' || chr(10) || 'Disallow: /%7euser/'
            || chr(10) || 'Allow: /%7Euser/pub' || chr(10)
            || 'Disallow: /a%2Fb' || chr(10)
            || 'Disallow: /caf%c3%a9/')),
rawlines AS (
  SELECT domain,
         generate_subscripts(string_split(txt, chr(10)), 1) AS i,
         unnest(string_split(txt, chr(10))) AS raw
  FROM robots),
fields AS (
  SELECT domain, i, ln,
    lower(ln) LIKE 'user-agent:%' AS is_ua,
    lower(ln) LIKE 'disallow:%' AS is_dis,
    lower(ln) LIKE 'allow:%' AS is_allow,
    CASE WHEN position(':' IN ln) > 0
         THEN trim(substr(ln, position(':' IN ln) + 1)) END AS val
  FROM (SELECT domain, i,
          trim(regexp_replace(raw, '#.*$', '')) AS ln FROM rawlines)),
starts AS (
  SELECT *, is_ua AND NOT coalesce(
    lag(is_ua) OVER (PARTITION BY domain ORDER BY i), FALSE) AS ua_start
  FROM fields),
grouped AS (
  SELECT *, max(CASE WHEN ua_start THEN i END)
    OVER (PARTITION BY domain ORDER BY i ROWS UNBOUNDED PRECEDING) AS grp
  FROM starts),
applying AS (
  SELECT DISTINCT domain, grp FROM grouped
  WHERE is_ua AND lower(val) = '*'),
rules AS (
  SELECT g.domain, g.is_allow AS allow,
    {_sql_pct('g.val')} AS prefix
  FROM grouped g JOIN applying a USING (domain, grp)
  WHERE (g.is_dis OR g.is_allow) AND length(g.val) > 0),
urls0 AS (
  SELECT doc_id,
    CASE doc_id % 4 WHEN 0 THEN 'a.com' WHEN 1 THEN 'b.com'
         WHEN 2 THEN 'c.com' ELSE 'd.com' END AS domain,
    CASE doc_id % 7 WHEN 0 THEN '/private/x' WHEN 1 THEN '/private/ok/y'
         WHEN 2 THEN '/doc.pdf'
         WHEN 3 THEN '/~user/secret'
         WHEN 4 THEN '/%7Euser/pub/x'
         WHEN 5 THEN '/a%2fb'
         WHEN 6 THEN '/caf%c3%a9/x'
         ELSE '/page/' || CAST(doc_id AS VARCHAR) END AS path
  FROM documents),
urls AS (
  SELECT doc_id, domain, {_sql_pct('path')} AS path FROM urls0),
hits AS (
  SELECT u.doc_id, r.allow, length(r.prefix) AS plen
  FROM urls u JOIN rules r USING (domain)
  WHERE regexp_matches(u.path,
    '^' || replace(replace(
        CASE WHEN r.prefix LIKE '%$'
             THEN left(r.prefix, length(r.prefix) - 1)
             ELSE r.prefix END, '.', '\.'), '*', '.*')
    || CASE WHEN r.prefix LIKE '%$' THEN '$' ELSE '' END)),
best AS (
  SELECT doc_id, allow,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY plen DESC, allow DESC) AS rn
  FROM hits)
SELECT u.doc_id, CAST(coalesce(NOT b.allow, FALSE) AS VARCHAR) AS val
FROM urls u LEFT JOIN (SELECT doc_id, allow FROM best WHERE rn = 1) b
  USING (doc_id)""",
)
def q_robots_gate(spark, sf_dir):
    """RobotsTxtFilter (operators/web.py): parse planted robots.txt
    bodies once into rule-frame state, join URLs by domain, apply the
    RFC 9309 longest-match decision."""
    from feature_factory_spark.operators.web import RobotsTxtFilter

    docs = _t(spark, sf_dir, "documents")
    robots = _osf(spark, 
        [
            ("a.com", "User-agent: *\nDisallow: /private/\n"
                      "Allow: /private/ok\n# note\n"
                      "Sitemap: http://a.com/s.xml"),
            ("b.com", "User-agent: gptbot\nUser-agent: *\n"
                      "Disallow: /*.pdf$"),
            ("c.com", "User-agent: otherbot\nDisallow: /"),
            ("d.com", "User-agent: *\nDisallow: /%7euser/\n"
                      "Allow: /%7Euser/pub\nDisallow: /a%2Fb\n"
                      "Disallow: /caf%c3%a9/"),
        ],
        "domain string, robots_txt string",
    )
    domain = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("a.com"))
        .when(F.col("doc_id") % 4 == 1, F.lit("b.com"))
        .when(F.col("doc_id") % 4 == 2, F.lit("c.com"))
        .otherwise(F.lit("d.com"))
    )
    path = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("/private/x"))
        .when(F.col("doc_id") % 7 == 1, F.lit("/private/ok/y"))
        .when(F.col("doc_id") % 7 == 2, F.lit("/doc.pdf"))
        .when(F.col("doc_id") % 7 == 3, F.lit("/~user/secret"))
        .when(F.col("doc_id") % 7 == 4, F.lit("/%7Euser/pub/x"))
        .when(F.col("doc_id") % 7 == 5, F.lit("/a%2fb"))
        .when(F.col("doc_id") % 7 == 6, F.lit("/caf%c3%a9/x"))
        .otherwise(F.concat(F.lit("/page/"), F.col("doc_id").cast("string")))
    )
    urls = docs.select(
        "doc_id", F.concat(F.lit("http://"), domain, path).alias("url")
    )
    op = RobotsTxtFilter("url").fit_robots(robots)
    return op.transform(urls).select(
        "doc_id", F.col("url_robots_blocked").cast("string").alias("val")
    )


@_reg(
    "stratified_sample",
    # StratifiedSampler (r10, operators/sampling.py): exact-k per
    # stratum by seeded-md5 rank — the twin recomputes the identical
    # 60-bit hash fraction and row_number, doc_id tiebreak.
    """SELECT doc_id, lang AS val FROM (
  SELECT doc_id, lang, row_number() OVER (
    PARTITION BY lang
    ORDER BY ('0x' || substr(md5('ff' || CAST(doc_id AS VARCHAR)), 1, 15))
             ::BIGINT::DOUBLE / 1152921504606846976.0, doc_id
  ) rn FROM documents
) WHERE rn <= 20""",
)
def q_stratified_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    op = ff.StratifiedSampler("doc_id", "lang", k=20)
    return op.transform(docs).select("doc_id", F.col("lang").alias("val"))


@_reg(
    "corpus_overlap",
    # corpus_overlap (r10, operators/diff.py): corpus-grain trigram
    # overlap between two overlapping document slices — the release-
    # audit complement of per-doc contamination. Counts are exact
    # distinct-set sizes; fractions are one double division, identical
    # in both engines. Same trigram construction + shingle clamp as
    # the contamination oracle.
    """WITH wa AS (SELECT string_split(lower(text), ' ') w
  FROM documents WHERE doc_id < 250 AND text IS NOT NULL),
ga AS (SELECT DISTINCT
  unnest(list_transform(generate_series(1, greatest(len(w)-2, 1)),
                        i -> array_to_string(w[i:i+2], ' '))) AS gram
 FROM wa),
wb AS (SELECT string_split(lower(text), ' ') w
  FROM documents WHERE doc_id >= 200 AND text IS NOT NULL),
gb AS (SELECT DISTINCT
  unnest(list_transform(generate_series(1, greatest(len(w)-2, 1)),
                        i -> array_to_string(w[i:i+2], ' '))) AS gram
 FROM wb),
na AS (SELECT CAST(count(*) AS DOUBLE) c FROM ga),
nb AS (SELECT CAST(count(*) AS DOUBLE) c FROM gb),
ns AS (SELECT CAST(count(*) AS DOUBLE) c FROM
       (SELECT gram FROM ga INTERSECT SELECT gram FROM gb))
SELECT 'distinct_grams_a' AS metric, (SELECT c FROM na) AS value
UNION ALL SELECT 'distinct_grams_b', (SELECT c FROM nb)
UNION ALL SELECT 'shared_grams', (SELECT c FROM ns)
UNION ALL SELECT 'overlap_a_in_b',
  CASE WHEN (SELECT c FROM na) > 0
       THEN (SELECT c FROM ns) / (SELECT c FROM na) ELSE 0.0 END
UNION ALL SELECT 'overlap_b_in_a',
  CASE WHEN (SELECT c FROM nb) > 0
       THEN (SELECT c FROM ns) / (SELECT c FROM nb) ELSE 0.0 END""",
)
def q_corpus_overlap(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return ff.corpus_overlap(
        docs.where(F.col("doc_id") < 250),
        docs.where(F.col("doc_id") >= 200),
        "text", n=3,
    )


@_reg(
    "corpus_report",
    # corpus_report (r10, operators/profiling.py): per-source data
    # card over documents, n_chars metrics, exact quantiles for the
    # twin. Every value is arithmetic over exact integer aggregates
    # (sums < 2^53), so no rounding is needed: mean = exact_sum/count
    # is ONE division in both engines; quantile_cont == Spark
    # percentile (linear interpolation); share = n/total likewise.
    """WITH g AS (SELECT source,
  CAST(count(*) AS DOUBLE) n,
  CAST(sum(n_chars) AS DOUBLE) s,
  avg(n_chars) a,
  CAST(min(n_chars) AS DOUBLE) mn,
  CAST(max(n_chars) AS DOUBLE) mx,
  quantile_cont(n_chars, 0.5) p
FROM documents GROUP BY source),
t AS (SELECT CAST(sum(n) AS DOUBLE) tot FROM g)
SELECT source, 'n_docs' AS metric, n AS value FROM g
UNION ALL SELECT source, 'share', n / (SELECT tot FROM t) FROM g
UNION ALL SELECT source, 'n_chars_sum', s FROM g
UNION ALL SELECT source, 'n_chars_mean', a FROM g
UNION ALL SELECT source, 'n_chars_min', mn FROM g
UNION ALL SELECT source, 'n_chars_max', mx FROM g
UNION ALL SELECT source, 'n_chars_p50', p FROM g""",
)
def q_corpus_report(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return ff.corpus_report(
        docs, ["source"], ["n_chars"], quantiles="exact"
    )


@_reg(
    "curation_ledger",
    # curation_ledger + curation_funnel (r11, presets.py): the
    # keep/drop audit of a gate-pipeline run — per-document first-
    # killer attribution plus the per-stage funnel. Fixture plants a
    # badword on doc_id%7 and collapses doc_id%5 onto one shared body,
    # then runs badwords-filter -> exact-dedup; the twin recomputes
    # BOTH stage outputs relationally (the badwords \b-regex gate, the
    # min-id-per-normalized-hash dedup survivor rule) and derives the
    # identical attribution and funnel counts.
    r"""WITH d AS (SELECT doc_id,
  CASE WHEN doc_id % 5 = 0 THEN 'dup shared body'
       WHEN doc_id % 7 = 0 THEN text || ' zzzbad'
       ELSE text END AS text FROM documents),
s1 AS (SELECT * FROM d
  WHERE NOT regexp_matches(lower(text), '\b(zzzbad)\b')),
s2 AS (SELECT min(doc_id) AS doc_id FROM s1
  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
led AS (SELECT d.doc_id,
  s2.doc_id IS NOT NULL AS kept,
  CASE WHEN s1.doc_id IS NULL THEN 'badwords'
       WHEN s2.doc_id IS NULL THEN 'exact_dedup' END AS stage
  FROM d LEFT JOIN s1 ON d.doc_id = s1.doc_id
         LEFT JOIN s2 ON d.doc_id = s2.doc_id),
n AS (SELECT (SELECT count(*) FROM d) AS n0,
             (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2)
SELECT 'doc' AS "column", CAST(doc_id AS VARCHAR) AS metric,
  CAST(NULL AS DOUBLE) AS value_num,
  coalesce(stage, '-') || ':' || CAST(kept AS VARCHAR) AS value_str
FROM led
UNION ALL SELECT 'funnel|badwords', m,
  CASE m WHEN 'n_in' THEN n0::DOUBLE
         WHEN 'n_dropped' THEN (n0 - n1)::DOUBLE
         ELSE n1::DOUBLE END, CAST(NULL AS VARCHAR)
FROM n, (SELECT unnest(['n_in', 'n_dropped', 'n_out']) AS m)
UNION ALL SELECT 'funnel|exact_dedup', m,
  CASE m WHEN 'n_in' THEN n1::DOUBLE
         WHEN 'n_dropped' THEN (n1 - n2)::DOUBLE
         ELSE n2::DOUBLE END, CAST(NULL AS VARCHAR)
FROM n, (SELECT unnest(['n_in', 'n_dropped', 'n_out']) AS m)""",
)
def q_curation_ledger(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    fix = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.lit("dup shared body"))
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" zzzbad")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    pipe = ff.make_pipeline(
        ("badwords",
         ff.BadWordsFilter("text", ["zzzbad"], mode="filter")),
        ("exact_dedup",
         ff.ExactDeduplicator(["text"], "doc_id", normalize=True)),
    )
    out, ledger = ff.curation_ledger(fix, pipe, "doc_id")
    funnel = ff.curation_funnel(
        ledger, stages=[n for n, _ in pipe.steps]
    )
    perdoc = ledger.select(
        F.lit("doc").alias("column"),
        F.col("doc_id").cast("string").alias("metric"),
        F.lit(None).cast("double").alias("value_num"),
        F.concat_ws(
            ":",
            F.coalesce(F.col("stage"), F.lit("-")),
            F.col("kept").cast("string"),
        ).alias("value_str"),
    )
    fun = funnel.selectExpr(
        "concat('funnel|', stage) AS column",
        "stack(3, 'n_in', cast(n_in AS double), "
        "'n_dropped', cast(n_dropped AS double), "
        "'n_out', cast(n_out AS double)) AS (metric, value_num)",
    ).selectExpr(
        "column", "metric", "value_num",
        "cast(NULL AS string) AS value_str",
    )
    return perdoc.unionByName(fun)


@_reg(
    "dedup_report",
    # dedup_report (r11, operators/profiling.py): the duplicate-
    # cluster data card over a candidate-pair frame — planted pairs
    # (x, x+1) at x%10=0 and (x, x+2) at x%20=0 form 2-chains and
    # 3-chains; the twin recomputes the transitive closure with a
    # recursive CTE (the cross_modal precedent) and derives the
    # identical totals, histogram, and dup share.
    f"""WITH RECURSIVE edges AS (
  SELECT a.doc_id AS s, b.doc_id AS d FROM documents a
  JOIN documents b ON b.doc_id = a.doc_id + 1 WHERE a.doc_id % 10 = 0
  UNION ALL
  SELECT a.doc_id, b.doc_id FROM documents a
  JOIN documents b ON b.doc_id = a.doc_id + 2 WHERE a.doc_id % 20 = 0
), und AS (
  SELECT s, d FROM edges UNION SELECT d, s FROM edges
), reach(node, r) AS (
  SELECT s, s FROM und
  UNION
  SELECT u.s, reach.r FROM und u JOIN reach ON u.d = reach.node
), comp AS (
  SELECT node, MIN(r) AS component FROM reach GROUP BY node
), sizes AS (
  SELECT component, count(*)::DOUBLE AS sz FROM comp GROUP BY component
), tot AS (
  SELECT count(*)::DOUBLE n_clusters, sum(sz) n_clustered,
    sum(sz - 1) n_excess, max(sz) mx, avg(sz) mean FROM sizes
), np AS (SELECT count(*)::DOUBLE n_pairs FROM edges),
nt AS (SELECT count(*)::DOUBLE n FROM documents)
SELECT 'dedup|pairs' AS "column", metric,
  {R6('value')} AS value_num, CAST(NULL AS VARCHAR) AS value_str
FROM (
  SELECT 'n_pairs' AS metric, n_pairs AS value FROM np
  UNION ALL SELECT 'n_clusters', n_clusters FROM tot
  UNION ALL SELECT 'n_clustered_docs', n_clustered FROM tot
  UNION ALL SELECT 'n_excess_docs', n_excess FROM tot
  UNION ALL SELECT 'max_cluster_size', mx FROM tot
  UNION ALL SELECT 'mean_cluster_size', mean FROM tot
  UNION ALL SELECT 'cluster_size_' || CAST(sz AS BIGINT),
    count(*)::DOUBLE FROM sizes GROUP BY sz
  UNION ALL SELECT 'dup_share',
    (SELECT n_excess FROM tot) / n FROM nt
) t""",
)
def q_dedup_report(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    ids = docs.select("doc_id")

    def planted(offset, mod, rem):
        a = ids.select(F.col("doc_id").alias("a_id")).where(
            F.col("a_id") % mod == rem
        )
        b = ids.select(F.col("doc_id").alias("b_id"))
        return a.join(b, F.col("b_id") == F.col("a_id") + offset)

    pairs = planted(1, 10, 0).unionByName(planted(2, 20, 0))
    rep = ff.dedup_report(pairs, n_total=docs.count())
    return rep.select(
        F.lit("dedup|pairs").alias("column"),
        "metric",
        r6(F.col("value")).alias("value_num"),
        F.lit(None).cast("string").alias("value_str"),
    )


@_reg(
    "tokenizer_report",
    # tokenizer_report (r11, operators/profiling.py): the tokenizer
    # audit card — per-lang fertility (tokens/word), compression
    # (chars/token), sequence length, OOV rate. Fixture synthesizes a
    # deterministic ids column (md5-bucket id per word, every 13th
    # bucket planted as -1 OOV) so the whole card is SQL-recomputable
    # with no tokenizer fit in the window.
    rf"""WITH d AS (SELECT doc_id, lang, text,
  list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
              x -> x <> '') w FROM documents),
i AS (SELECT lang, text,
  list_transform(w, x ->
    CASE WHEN (('0x' || substr(md5(x), 1, 15))::BIGINT % 50) % 13 = 0
         THEN -1
         ELSE ('0x' || substr(md5(x), 1, 15))::BIGINT % 50 END) ids
  FROM d),
a AS (SELECT lang,
  count(*)::DOUBLE n_docs,
  sum(len(ids))::DOUBLE n_tokens,
  sum(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                      x -> x <> '')))::DOUBLE n_words,
  sum(length(text))::DOUBLE n_chars,
  sum(len(list_filter(ids, x -> x = -1)))::DOUBLE n_oov
  FROM i GROUP BY lang)
SELECT 'tok|' || lang AS "column", metric,
  {R6('value')} AS value_num, CAST(NULL AS VARCHAR) AS value_str
FROM (
  SELECT lang, 'n_docs' AS metric, n_docs AS value FROM a
  UNION ALL SELECT lang, 'n_tokens', n_tokens FROM a
  UNION ALL SELECT lang, 'n_words', n_words FROM a
  UNION ALL SELECT lang, 'n_chars', n_chars FROM a
  UNION ALL SELECT lang, 'tokens_per_doc', n_tokens / n_docs FROM a
  UNION ALL SELECT lang, 'fertility', n_tokens / n_words FROM a
  UNION ALL SELECT lang, 'chars_per_token', n_chars / n_tokens FROM a
  UNION ALL SELECT lang, 'oov_rate', n_oov / n_tokens FROM a
) t""",
)
def q_tokenizer_report(spark, sf_dir):
    from feature_factory_spark.operators.embeddings import hashed_dim_expr
    from feature_factory_spark.functions.text import words_expr

    docs = _t(spark, sf_dir, "documents")
    ids = F.transform(
        words_expr(F.lower(F.col("text"))),
        lambda w: F.when(
            hashed_dim_expr(w, 50) % 13 == 0, F.lit(-1).cast("bigint")
        ).otherwise(hashed_dim_expr(w, 50)),
    )
    tokenized = docs.select("lang", "text", ids.alias("ids"))
    rep = ff.tokenizer_report(tokenized, "ids", "text", ["lang"])
    return rep.select(
        F.concat(F.lit("tok|"), F.col("lang")).alias("column"),
        "metric",
        r6(F.col("value")).alias("value_num"),
        F.lit(None).cast("string").alias("value_str"),
    )


@_reg(
    "frequent_items",
    # exact heavy hitters, melted (column, value, cnt), top-3 per column
    """WITH pairs AS (
  SELECT 'l_returnflag' AS "column", CAST(l_returnflag AS VARCHAR) AS "value"
  FROM lineitem WHERE l_returnflag IS NOT NULL
  UNION ALL
  SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR)
  FROM lineitem WHERE l_linestatus IS NOT NULL),
counts AS (SELECT "column", "value", count(*) cnt FROM pairs GROUP BY 1, 2)
SELECT "column", "value", cnt FROM (
  SELECT "column", "value", cnt,
    row_number() OVER (PARTITION BY "column"
                       ORDER BY cnt DESC, "value" ASC) rn
  FROM counts) t WHERE rn <= 3""",
)
def q_frequent_items(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    fi = ff.FrequentItems(["l_returnflag", "l_linestatus"], min_count=1, top_k=3)
    return fi.frequent(li)


# ---------------------------------------------------------------------------
# family consolidation
# ---------------------------------------------------------------------------

# The driver's correctness artifact records rows for only the FIRST 50
# registered queries. With 92 per-operator entries, half the surface was
# unverified every round (r2 verified queries 1-50, r3 the reorder's
# other half). Fix: collapse the cheap per-operator projections into
# family queries whose result unions the members' frames under an `op`
# discriminator column — one value-hash still pins every operator, and
# the whole registry fits inside a single round's artifact.
#
# Adapters ONLY rename, cast, or concat member columns (never new float
# math), so each member keeps its own deterministic rounding contract.
# The driver sorts columns by name before hashing, so only names+values
# must agree between the Spark frame and the DuckDB oracle.

_FAMILY_DOC: dict[str, list[str]] = {}  # family -> member ops (for tests/docs)


def _merge(family: str, members: list[tuple[str, list[str], str | list[str]]]) -> None:
    """Collapse registry entries into ONE family query.

    members: (op, spark_exprs, sql_select) where `spark_exprs` feeds
    selectExpr on the member's frame (may contain a `stack(...)` melt)
    and `sql_select` is the select list over the member's oracle SQL —
    a list of select lists means one UNION ALL slice per entry (the SQL
    twin of a stack melt). Every member must project to the same column
    names."""
    specs = []
    for op, spark_exprs, sql_select in members:
        fn, sql = _REGISTRY.pop(op)
        assert sql is not None, f"family member {op} has no oracle"
        specs.append((op, fn, spark_exprs, sql, sql_select))
    _FAMILY_DOC[family] = [op for op, *_ in specs]

    def family_fn(spark, sf_dir, _specs=tuple(specs)):
        # Stateful members run their fit jobs EAGERLY inside fn(), each
        # blocking the driver on aggregate round-trips. Spark schedules
        # jobs submitted from separate threads concurrently, so building
        # the members concurrently overlaps those fits (select_stats:
        # nine selector fits, wall time ~= max fit instead of the sum).
        # Union order stays the registry order — only job submission is
        # concurrent, the returned plan is deterministic.
        #
        # InheritableThread, not ThreadPoolExecutor: under PySpark's
        # pinned-thread mode (the default) every Python thread that
        # talks to the JVM gets a dedicated JVM peer thread that plain
        # threads never clean up — a full bench run's ~21 family queries
        # would strand 100+ dead JVM threads. InheritableThread also
        # propagates the parent's local properties (job group), so
        # member jobs stay cancellable as a unit.
        #
        # Shared mutable state the members touch: _FRAME_CACHE cold
        # loads (including load_events' legacy-nanos conf flip) are
        # serialized under _FRAME_LOCK; _interpreted_eval callers are
        # standalone registry queries, not family members, and its
        # module lock keeps even a future overlap safe.
        from pyspark import InheritableThread

        frames: list = [None] * len(_specs)
        errors: list = []

        def build(spec, i):
            op, fn, exprs, _, _ = spec
            try:
                frames[i] = fn(spark, sf_dir).selectExpr(f"'{op}' AS op", *exprs)
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                errors.append((op, exc))

        if len(_specs) > 1:
            threads = [
                InheritableThread(target=build, args=(s, i))
                for i, s in enumerate(_specs)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            if errors:
                # a poisoned member must not strand its siblings' fitted
                # frames (every prior query is already materialized, so
                # releasing here is safe)
                release_fitted_frames()
                op, exc = errors[0]
                raise RuntimeError(
                    f"family '{family}' member '{op}' failed"
                ) from exc
        else:
            build(_specs[0], 0)
            if errors:
                release_fitted_frames()
                raise errors[0][1]
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        return out

    slices = []
    for op, _, _, sql, sql_select in specs:
        lists = [sql_select] if isinstance(sql_select, str) else sql_select
        slices.extend(
            f"SELECT '{op}' AS op, {sel} FROM ({sql}) __m" for sel in lists
        )
    _REGISTRY[family] = (family_fn, "\nUNION ALL\n".join(slices))


_KEYS2 = ["l_orderkey", "l_linenumber"]

_merge("impute_numeric", [
    (op, [*_KEYS2, "q_imputed"], "l_orderkey, l_linenumber, q_imputed")
    for op in ("mean_impute", "median_impute", "endtail_impute", "arbitrary_impute")
])

_merge("impute_other", [
    ("categorical_impute",
     [*_KEYS2, "rf_imputed AS val"],
     "l_orderkey, l_linenumber, rf_imputed AS val"),
    ("missing_indicator",
     [*_KEYS2,
      "concat(cast(q_missing AS string), ',', cast(rf_missing AS string)) AS val"],
     "l_orderkey, l_linenumber, "
     "CAST(q_missing AS VARCHAR) || ',' || CAST(rf_missing AS VARCHAR) AS val"),
    ("drop_missing",
     [*_KEYS2, "cast(NULL AS string) AS val"],
     "l_orderkey, l_linenumber, CAST(NULL AS VARCHAR) AS val"),
])

_merge("encode_count_ordinal", [
    (op, ["o_orderkey", "o_orderpriority AS enc"], "o_orderkey, o_orderpriority AS enc")
    for op in ("count_encode", "count_encode_unseen", "ordinal_encode")
])

_merge("encode_target", [
    ("mean_encode", ["p_partkey AS id", "p_brand AS enc"],
     "p_partkey AS id, p_brand AS enc"),
    ("woe_encode", ["o_orderkey AS id", "o_orderpriority AS enc"],
     "o_orderkey AS id, o_orderpriority AS enc"),
])

_merge("encode_label", [
    ("onehot_encode",
     ["l_orderkey AS id1", "cast(l_linenumber AS bigint) AS id2",
      "cast(l_returnflag_A*100 + l_returnflag_N*10 + l_returnflag_R AS string) AS label"],
     "l_orderkey AS id1, CAST(l_linenumber AS BIGINT) AS id2, "
     "CAST(l_returnflag_A*100 + l_returnflag_N*10 + l_returnflag_R AS VARCHAR) AS label"),
    ("rare_label",
     ["p_partkey AS id1", "cast(NULL AS bigint) AS id2", "p_brand AS label"],
     "p_partkey AS id1, CAST(NULL AS BIGINT) AS id2, p_brand AS label"),
])

_merge("discretize_family", [
    ("arbitrary_discretize", [*_KEYS2, "l_quantity AS bin"],
     "l_orderkey, l_linenumber, l_quantity AS bin"),
    ("equal_frequency_discretize", [*_KEYS2, "l_extendedprice AS bin"],
     "l_orderkey, l_linenumber, l_extendedprice AS bin"),
    ("equal_width_discretize", [*_KEYS2, "l_discount AS bin"],
     "l_orderkey, l_linenumber, l_discount AS bin"),
    ("geometric_discretize", [*_KEYS2, "l_quantity AS bin"],
     "l_orderkey, l_linenumber, l_quantity AS bin"),
    ("approx_divergence", ["l_orderkey", "l_linenumber", "bin"],
     "l_orderkey, l_linenumber, bin"),
])

_merge("outlier_family", [
    ("arbitrary_cap", [*_KEYS2, "l_quantity AS capped"],
     "l_orderkey, l_linenumber, l_quantity AS capped"),
    ("winsorize", [*_KEYS2, "l_extendedprice AS capped"],
     "l_orderkey, l_linenumber, l_extendedprice AS capped"),
    ("outlier_trim", [*_KEYS2, "cast(NULL AS double) AS capped"],
     "l_orderkey, l_linenumber, CAST(NULL AS DOUBLE) AS capped"),
])

_merge("numeric_transform", [
    (op, [*_KEYS2, "v"], "l_orderkey, l_linenumber, v")
    for op in ("log_transform", "logcp_transform", "reciprocal_transform",
               "power_transform", "boxcox_transform", "arcsin_transform",
               "yeojohnson_transform")
])

_merge("feature_create", [
    ("math_features",
     [*_KEYS2, "stack(2, 'gross', gross, 'net', net) AS (feature, value)"],
     ["l_orderkey, l_linenumber, 'gross' AS feature, gross AS value",
      "l_orderkey, l_linenumber, 'net' AS feature, net AS value"]),
    ("relative_features",
     [*_KEYS2,
      "stack(3, 'r_ratio', r_ratio, 'r_diff', r_diff, 'r_pct', r_pct) AS (feature, value)"],
     ["l_orderkey, l_linenumber, 'r_ratio' AS feature, r_ratio AS value",
      "l_orderkey, l_linenumber, 'r_diff' AS feature, r_diff AS value",
      "l_orderkey, l_linenumber, 'r_pct' AS feature, r_pct AS value"]),
    ("cyclical_features",
     [*_KEYS2, "stack(2, 'm_sin', m_sin, 'm_cos', m_cos) AS (feature, value)"],
     ["l_orderkey, l_linenumber, 'm_sin' AS feature, m_sin AS value",
      "l_orderkey, l_linenumber, 'm_cos' AS feature, m_cos AS value"]),
])

_merge("datetime_family", [
    ("datetime_features",
     [*_KEYS2,
      "stack(4, 'year', cast(l_shipdate_year AS double), "
      "'month', cast(l_shipdate_month AS double), "
      "'day', cast(l_shipdate_day AS double), "
      "'weekday', cast(l_shipdate_weekday AS double)) AS (feature, value)"],
     ["l_orderkey, l_linenumber, 'year' AS feature, CAST(l_shipdate_year AS DOUBLE) AS value",
      "l_orderkey, l_linenumber, 'month' AS feature, CAST(l_shipdate_month AS DOUBLE) AS value",
      "l_orderkey, l_linenumber, 'day' AS feature, CAST(l_shipdate_day AS DOUBLE) AS value",
      "l_orderkey, l_linenumber, 'weekday' AS feature, CAST(l_shipdate_weekday AS DOUBLE) AS value"]),
    ("datetime_subtraction",
     [*_KEYS2, "'ship_delay_days' AS feature", "ship_delay_days AS value"],
     "l_orderkey, l_linenumber, 'ship_delay_days' AS feature, ship_delay_days AS value"),
])

_merge("select_stats", [
    ("drop_constant",
     ["feature", "'variance' AS stat", "variance AS value", "kept AS flag"],
     "feature, 'variance' AS stat, variance AS value, kept AS flag"),
    ("drop_duplicate",
     ["feature", "cast(NULL AS string) AS stat", "cast(NULL AS double) AS value",
      "kept AS flag"],
     "feature, CAST(NULL AS VARCHAR) AS stat, CAST(NULL AS DOUBLE) AS value, kept AS flag"),
    ("drop_correlated",
     ["concat(a_feature, '|', b_feature) AS feature", "'corr_r' AS stat",
      "corr_r AS value", "above AS flag"],
     "a_feature || '|' || b_feature AS feature, 'corr_r' AS stat, "
     "corr_r AS value, above AS flag"),
    ("smart_correlated",
     ["feature",
      "stack(2, 'variance', variance, 'max_abs_corr', max_abs_corr) AS (stat, value)",
      "cast(NULL AS boolean) AS flag"],
     ["feature, 'variance' AS stat, variance AS value, CAST(NULL AS BOOLEAN) AS flag",
      "feature, 'max_abs_corr' AS stat, max_abs_corr AS value, CAST(NULL AS BOOLEAN) AS flag"]),
    ("psi_drift",
     ["feature", "'psi' AS stat", "psi AS value", "dropped AS flag"],
     "feature, 'psi' AS stat, psi AS value, dropped AS flag"),
    ("information_value",
     ["feature", "'iv' AS stat", "iv AS value", "kept AS flag"],
     "feature, 'iv' AS stat, iv AS value, kept AS flag"),
    ("single_feature_performance",
     ["feature", "'performance' AS stat", "performance AS value", "kept AS flag"],
     "feature, 'performance' AS stat, performance AS value, kept AS flag"),
    ("target_mean_performance",
     ["feature", "'performance' AS stat", "performance AS value",
      "cast(NULL AS boolean) AS flag"],
     "feature, 'performance' AS stat, performance AS value, CAST(NULL AS BOOLEAN) AS flag"),
    ("mrmr_relevance",
     ["feature", "'relevance' AS stat", "relevance AS value", "candidate AS flag"],
     "feature, 'relevance' AS stat, relevance AS value, candidate AS flag"),
    # r10: folded from its standalone registry row (registry headroom —
    # r9 verdict item 7). DropFeatures is a projection, so the member
    # melts the SURVIVING columns to the family grain: a wrongly-dropped
    # column fails the selectExpr loudly, a wrongly-kept one changes no
    # value but the operator's own unit tests pin the schema.
    ("drop_features",
     ["concat(cast(l_orderkey AS string), ':', cast(l_linenumber AS string)) AS feature",
      "'kept_qty_price' AS stat",
      "cast(l_quantity + l_extendedprice AS double) AS value",
      "cast(NULL AS boolean) AS flag"],
     "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) AS feature, "
     "'kept_qty_price' AS stat, CAST(l_quantity + l_extendedprice AS DOUBLE) AS value, "
     "CAST(NULL AS BOOLEAN) AS flag"),
])

_merge("scale_family", [
    ("minmax_scale",
     [*_KEYS2,
      "stack(2, 'l_quantity', l_quantity, 'l_discount', l_discount) AS (feature, value)"],
     ["l_orderkey, l_linenumber, 'l_quantity' AS feature, l_quantity AS value",
      "l_orderkey, l_linenumber, 'l_discount' AS feature, l_discount AS value"]),
    ("standard_scale",
     [*_KEYS2, "'l_quantity' AS feature", "l_quantity AS value"],
     "l_orderkey, l_linenumber, 'l_quantity' AS feature, l_quantity AS value"),
    ("robust_scale",
     [*_KEYS2, "'l_extendedprice' AS feature", "l_extendedprice AS value"],
     "l_orderkey, l_linenumber, 'l_extendedprice' AS feature, l_extendedprice AS value"),
])

_merge("embed_transform", [
    (op, ["vec_id", "pos", "val"], "vec_id, pos, val")
    for op in ("l2_normalize", "random_projection", "quantize",
               "pca_project", "tfidf_vector", "pq_codes")
])

_merge("ts_features", [
    ("lag_features",
     ["event_id", "user_id",
      "stack(2, 'lag_1', value_lag_1, 'lag_3', value_lag_3) AS (feature, value)"],
     ["event_id, user_id, 'lag_1' AS feature, value_lag_1 AS value",
      "event_id, user_id, 'lag_3' AS feature, value_lag_3 AS value"]),
    ("window_features",
     ["event_id", "user_id",
      "stack(2, 'w3_mean', value_window_3_mean, 'w3_max', value_window_3_max) AS (feature, value)"],
     ["event_id, user_id, 'w3_mean' AS feature, value_window_3_mean AS value",
      "event_id, user_id, 'w3_max' AS feature, value_window_3_max AS value"]),
    ("expanding_features",
     ["event_id", "user_id", "'expanding_sum' AS feature",
      "value_expanding_sum AS value"],
     "event_id, user_id, 'expanding_sum' AS feature, value_expanding_sum AS value"),
])

# scale-path dedup (banded/blocked LSH) vs the documented O(n^2) oracle
# baselines: two families, so bench.py can keep skipping the baselines
# (they exist to pin the scale-path operators' oracles, not to be timed).
_merge("dedup_pairs", [
    ("minhash_dedup", ["a_id", "b_id", "jaccard AS score"],
     "a_id, b_id, jaccard AS score"),
    ("simhash_dedup", ["a_id", "b_id", "cast(hamming AS double) AS score"],
     "a_id, b_id, CAST(hamming AS DOUBLE) AS score"),
    ("semantic_dedup", ["a_id", "b_id", "score"], "a_id, b_id, score"),
    ("image_dedup", ["a_id", "b_id", "cast(hamming AS double) AS score"],
     "a_id, b_id, CAST(hamming AS DOUBLE) AS score"),
    ("audio_dedup", ["a_id", "b_id", "cast(hamming AS double) AS score"],
     "a_id, b_id, CAST(hamming AS DOUBLE) AS score"),
    ("video_dedup", ["a_id", "b_id", "cast(hamming AS double) AS score"],
     "a_id, b_id, CAST(hamming AS DOUBLE) AS score"),
])

_merge("dedup_pairs_baseline", [
    ("ngram_jaccard_dedup", ["a_id", "b_id", "jaccard AS score"],
     "a_id, b_id, jaccard AS score"),
    ("embedding_dedup", ["a_id", "b_id", "cosine AS score"],
     "a_id, b_id, cosine AS score"),
])

_merge("dedup_ids", [
    (op, ["doc_id"], "doc_id")
    for op in ("exact_dedup", "streaming_dedup", "incremental_dedup",
               "incremental_exact", "cross_modal_dedup")
])

_merge("sample_family", [
    ("hash_sample", ["doc_id", "cast(NULL AS string) AS val"],
     "doc_id, CAST(NULL AS VARCHAR) AS val"),
    ("hash_split", ["doc_id", "split AS val"], "doc_id, split AS val"),
    ("weighted_sample", ["doc_id", "cast(NULL AS string) AS val"],
     "doc_id, CAST(NULL AS VARCHAR) AS val"),
    ("url_ops", ["doc_id", "val"], "doc_id, val"),
    ("robots_gate", ["doc_id", "val"], "doc_id, val"),
    ("stratified_sample", ["doc_id", "val"], "doc_id, val"),
    ("dsir_weight", ["doc_id", "val"], "doc_id, val"),
    ("dsir_select", ["doc_id", "val"], "doc_id, val"),
    ("dsir_select_by", ["doc_id", "val"], "doc_id, val"),
    ("dsir_select_n", ["doc_id", "val"], "doc_id, val"),
    ("source_mix", ["doc_id", "val"], "doc_id, val"),
    ("code_meta", ["doc_id", "val"], "doc_id, val"),
    ("corpus_diff", ["doc_id", "val"], "doc_id, val"),
])

_merge("column_profile", [
    ("column_profile",
     ["column", "metric", "value_num", "value_str"],
     '"column", metric, value_num, value_str'),
    ("expectations",
     ["chk AS column", "metric", "v AS value_num",
      "cast(NULL AS string) AS value_str"],
     'chk AS "column", metric, v AS value_num, '
     "CAST(NULL AS VARCHAR) AS value_str"),
    ("corpus_report",
     ["concat('report|', source) AS column", "metric",
      "value AS value_num", "cast(NULL AS string) AS value_str"],
     "'report|' || source AS \"column\", metric, value AS value_num, "
     "CAST(NULL AS VARCHAR) AS value_str"),
    ("corpus_overlap",
     ["'overlap|a_b' AS column", "metric", "value AS value_num",
      "cast(NULL AS string) AS value_str"],
     "'overlap|a_b' AS \"column\", metric, value AS value_num, "
     "CAST(NULL AS VARCHAR) AS value_str"),
    ("curation_ledger",
     ["column", "metric", "value_num", "value_str"],
     '"column", metric, value_num, value_str'),
    ("tokenizer_report",
     ["column", "metric", "value_num", "value_str"],
     '"column", metric, value_num, value_str'),
    ("dedup_report",
     ["column", "metric", "value_num", "value_str"],
     '"column", metric, value_num, value_str'),
])

_merge("quality_filter", [
    ("gopher_quality_filter",
     ["doc_id", "cast(NULL AS boolean) AS flag", "cast(NULL AS double) AS ratio"],
     "doc_id, CAST(NULL AS BOOLEAN) AS flag, CAST(NULL AS DOUBLE) AS ratio"),
    ("contamination",
     ["doc_id", "contaminated AS flag", "cast(NULL AS double) AS ratio"],
     "doc_id, contaminated AS flag, CAST(NULL AS DOUBLE) AS ratio"),
    ("contamination_overlap",
     ["doc_id", "flag", "ratio"], "doc_id, flag, ratio"),
    ("quality_model",
     ["doc_id", "flag", "cast(NULL AS double) AS ratio"],
     "doc_id, flag, CAST(NULL AS DOUBLE) AS ratio"),
    ("badwords", ["doc_id", "flag", "ratio"], "doc_id, flag, ratio"),
])

# text cleaning surface: stopword-removal normalization + the HTML ->
# text extraction chain (both hash-pinned, SQL-recomputed end-to-end)
_merge("text_clean", [
    ("text_clean", ["doc_id", "cleaned AS val"], "doc_id, cleaned AS val"),
    ("html_strip", ["doc_id", "val"], "doc_id, val"),
    ("meta_robots", ["doc_id", "val"], "doc_id, val"),
    ("x_robots", ["doc_id", "val"], "doc_id, val"),
    ("self_line_dedup", ["doc_id", "val"], "doc_id, val"),
    ("main_content", ["doc_id", "val"], "doc_id, val"),
    ("fix_encoding", ["doc_id", "val"], "doc_id, val"),
    ("c4_clean", ["doc_id", "val"], "doc_id, val"),
    ("md_strip", ["doc_id", "val"], "doc_id, val"),
    ("unicode_nfc", ["doc_id", "val"], "doc_id, val"),
])

# language identification: the SQL-twin stopword heuristic (per-doc
# labels hash-pinned) + the 30-language char-n-gram model (invariant
# member: fixture accuracy floors, state round-trip, and the
# cross-engine docs-with-letters == docs-labeled term)
_merge("lang_id", [
    ("stopword_lang",
     ["cast(doc_id AS string) AS k", "text_lang AS v"],
     "CAST(doc_id AS VARCHAR) AS k, text_lang AS v"),
    ("ngram_lang",
     ["invariant AS k", "cast(n AS string) AS v"],
     "invariant AS k, CAST(n AS VARCHAR) AS v"),
])

# corpus language-model surface: unigram quality score + tokenizer-prep
# vocabulary (top-k build and the per-document OOV coverage audit)
_merge("lm_family", [
    ("unigram_logprob",
     ["doc_id AS k", "cast(NULL AS string) AS tok", "unigram_logprob AS val"],
     "doc_id AS k, CAST(NULL AS VARCHAR) AS tok, unigram_logprob AS val"),
    ("bigram_logprob",
     ["doc_id AS k", "cast(NULL AS string) AS tok", "bigram_logprob AS val"],
     "doc_id AS k, CAST(NULL AS VARCHAR) AS tok, bigram_logprob AS val"),
    ("arpa_score",
     ["doc_id AS k", "arpa_lp_n AS tok", "arpa_lp AS val"],
     "doc_id AS k, arpa_lp_n AS tok, arpa_lp AS val"),
    ("arpa_score_lines",
     ["doc_id AS k", "arpa_line_lp_n AS tok", "arpa_line_lp AS val"],
     "doc_id AS k, arpa_line_lp_n AS tok, arpa_line_lp AS val"),
    ("vocab_topk",
     ["cast(rank AS bigint) AS k", "token AS tok", "cast(count AS double) AS val"],
     "CAST(rank AS BIGINT) AS k, token AS tok, CAST(count AS DOUBLE) AS val"),
    ("vocab_oov",
     ["doc_id AS k", "cast(NULL AS string) AS tok", "oov_rate AS val"],
     "doc_id AS k, CAST(NULL AS VARCHAR) AS tok, oov_rate AS val"),
    ("bpe_vocab",
     ["cast(NULL AS bigint) AS k", "invariant AS tok", "cast(n AS double) AS val"],
     "CAST(NULL AS BIGINT) AS k, invariant AS tok, CAST(n AS DOUBLE) AS val"),
    ("unigram_vocab",
     ["cast(NULL AS bigint) AS k", "invariant AS tok", "cast(n AS double) AS val"],
     "CAST(NULL AS BIGINT) AS k, invariant AS tok, CAST(n AS DOUBLE) AS val"),
    ("wordpiece_apply",
     ["cast(NULL AS bigint) AS k", "invariant AS tok", "cast(n AS double) AS val"],
     "CAST(NULL AS BIGINT) AS k, invariant AS tok, CAST(n AS DOUBLE) AS val"),
    ("perplexity_bucket",
     ["doc_id AS k", "bucket AS tok", "score AS val"],
     "doc_id AS k, bucket AS tok, score AS val"),
    ("pagerank",
     ["node AS k", "cast(NULL AS string) AS tok", "rank AS val"],
     "node AS k, CAST(NULL AS VARCHAR) AS tok, rank AS val"),
])

# multimodal surface: byte-level plumbing + frame sampling + REAL image
# decoding (the r4 "weak pair" upgraded: imagecodec.py decodes actual
# PNG/BMP/PPM bytes, and this family's oracle hash pins the decoded
# dims/statistics every round)
_merge("multimodal_family", [
    ("multimodal_extract",
     ["doc_id", "cast(payload_payload_len AS bigint) AS k",
      "cast(NULL AS double) AS v",
      "concat(payload_payload_md5, ':', payload_header_hex) AS s"],
     "doc_id, CAST(payload_payload_len AS BIGINT) AS k, "
     "CAST(NULL AS DOUBLE) AS v, "
     "payload_payload_md5 || ':' || payload_header_hex AS s"),
    ("frame_sample",
     ["doc_id", "cast(frame_index AS bigint) AS k",
      "cast(frame_len AS double) AS v", "frame_hex AS s"],
     "doc_id, CAST(frame_index AS BIGINT) AS k, "
     "CAST(frame_len AS DOUBLE) AS v, frame_hex AS s"),
    ("image_decode",
     ["doc_id", "cast(NULL AS bigint) AS k", "v", "feat AS s"],
     "doc_id, CAST(NULL AS BIGINT) AS k, v, feat AS s"),
    ("audio_decode",
     ["doc_id", "cast(NULL AS bigint) AS k", "v", "feat AS s"],
     "doc_id, CAST(NULL AS BIGINT) AS k, v, feat AS s"),
    ("video_probe",
     ["doc_id", "cast(NULL AS bigint) AS k", "v", "feat AS s"],
     "doc_id, CAST(NULL AS BIGINT) AS k, v, feat AS s"),
    ("pdf_probe",
     ["doc_id", "cast(NULL AS bigint) AS k", "v", "feat AS s"],
     "doc_id, CAST(NULL AS BIGINT) AS k, v, feat AS s"),
    ("pdf_text",
     ["doc_id", "cast(NULL AS bigint) AS k", "v",
      "concat(feat, ':', coalesce(s, '')) AS s"],
     "doc_id, CAST(NULL AS BIGINT) AS k, v, "
     "feat || ':' || coalesce(s, '') AS s"),
    ("audio_quality",
     ["doc_id", "cast(NULL AS bigint) AS k", "v", "feat AS s"],
     "doc_id, CAST(NULL AS BIGINT) AS k, v, feat AS s"),
    ("image_text_pairs",
     ["doc_id", "k", "cast(NULL AS double) AS v", "val AS s"],
     "doc_id, k, CAST(NULL AS DOUBLE) AS v, val AS s"),
    ("image_text_score",
     ["doc_id", "cast(NULL AS bigint) AS k", "v", "s"],
     "doc_id, CAST(NULL AS BIGINT) AS k, v, s"),
])

_merge("pack_family", [
    ("sequence_pack", ["doc_id", "pack_id AS k", "cast(NULL AS string) AS val"],
     "doc_id, pack_id AS k, CAST(NULL AS VARCHAR) AS val"),
    ("doc_chunk",
     ["doc_id", "cast(chunk_id AS bigint) AS k",
      "concat(cast(chunk_n_words AS string), ':', chunk_md5) AS val"],
     "doc_id, CAST(chunk_id AS BIGINT) AS k, "
     "CAST(chunk_n_words AS VARCHAR) || ':' || chunk_md5 AS val"),
    ("substring_spans",
     ["doc_id", "cast(span_start AS bigint) AS k",
      "concat(cast(span_end AS string), ':', cast(n_windows AS string)) AS val"],
     "doc_id, CAST(span_start AS BIGINT) AS k, "
     "CAST(span_end AS VARCHAR) || ':' || CAST(n_windows AS VARCHAR) AS val"),
    ("substring_clean",
     ["doc_id", "cast(NULL AS bigint) AS k", "cleaned AS val"],
     "doc_id, CAST(NULL AS BIGINT) AS k, cleaned AS val"),
    ("pack_materialize",
     ["cast(NULL AS bigint) AS doc_id", "k", "val"],
     "CAST(NULL AS BIGINT) AS doc_id, k, val"),
    ("pack_materialize_sep",
     ["cast(NULL AS bigint) AS doc_id", "k", "val"],
     "CAST(NULL AS BIGINT) AS doc_id, k, val"),
    ("packed_ids",
     ["cast(NULL AS bigint) AS doc_id", "cast(n AS bigint) AS k",
      "invariant AS val"],
     "CAST(NULL AS BIGINT) AS doc_id, CAST(n AS BIGINT) AS k, "
     "invariant AS val"),
    ("corpus_shuffle", ["doc_id", "shard_id AS k", "pos AS val"],
     "doc_id, shard_id AS k, pos AS val"),
    ("shard_manifest",
     ["cast(NULL AS bigint) AS doc_id", "shard_id AS k",
      "concat_ws(':', n_docs, n_tokens, first_position, last_position, "
      "id_fingerprint) AS val"],
     "CAST(NULL AS BIGINT) AS doc_id, shard_id AS k, "
     "CAST(n_docs AS VARCHAR) || ':' || CAST(n_tokens AS VARCHAR) || ':' || "
     "CAST(first_position AS VARCHAR) || ':' || "
     "CAST(last_position AS VARCHAR) || ':' || "
     "CAST(id_fingerprint AS VARCHAR) AS val"),
])

# Registry cap + member-assignment rule (VERDICT r4 item 6). The
# driver's correctness artifact records rows for only the FIRST 50
# registered queries; r3 silently lost half the surface to a reorder.
# RULE: a NEW operator/member query must JOIN AN EXISTING FAMILY via
# _merge (pick the family whose tables and output grain it shares;
# adapters may only rename/cast/concat member columns) — register a new
# standalone/family slot only while len(_REGISTRY) < _REGISTRY_CAP
# post-merge. _check_registry_cap raises AT IMPORT, so an over-cap
# registration fails the whole round loudly instead of silently falling
# out of the verification window.
_REGISTRY_CAP = 50


def _check_registry_cap(registry=None) -> None:
    n = len(_REGISTRY if registry is None else registry)
    if n > _REGISTRY_CAP:
        raise RuntimeError(
            f"registry has {n} queries, over the driver's "
            f"{_REGISTRY_CAP}-row correctness cap: fold the new member "
            "into an existing family with _merge (see the assignment "
            "rule above) instead of registering it standalone"
        )


_check_registry_cap()


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pipeline_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    LLM-data-pipeline extensions. Each callable takes (spark, sf_dir) and
    returns a DataFrame whose column names match its oracle."""
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each query (omitted for the probabilistic-recall
    LSH variants, which get the driver's weaker rows-only check)."""
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
