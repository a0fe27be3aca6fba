"""Preset curation pipelines — the published cleaning stacks as
one-call recipes.

The reference ships individual transformers and a Pipeline combinator
(src/pipeline.rs); real corpus work runs the same few stacks over and
over. Each preset returns an UNFITTED :class:`~.pipeline.Pipeline`
composing this package's gates with the literature's defaults — call
``.fit(df)`` (which also transforms) exactly like a hand-built
pipeline, or ``save_state``/``load_state`` it for scheduled runs.

Presets only sequence existing operators; every step keeps its own
scale shape (stateless narrow filters push toward the scan, dedup
stays LSH-blocked), so the composed plan is the one you would have
written by hand.
"""

from __future__ import annotations

from .operators import (
    BadWordsFilter,
    MetaRobotsFilter,
    RobotsTxtFilter,
    XRobotsTagFilter,
    WithinDocDeduplicator,
    C4Filter,
    DomainBlocklistFilter,
    EncodingFixer,
    ExactDeduplicator,
    GopherQualityFilter,
    HtmlTextExtractor,
    LineDeduplicator,
    MainContentExtractor,
    MinHashDeduplicator,
    PIIRedactor,
    UrlCanonicalizer,
    UrlDeduplicator,
)
from .functions.frames import local_frame
from .pipeline import Pipeline, Transformer, make_pipeline


def c4_pipeline(
    text_col: str = "text",
    id_col: str = "doc_id",
    badwords: list[str] | None = None,
    redact_pii: bool = False,
) -> Pipeline:
    """The C4 cleaning recipe (Raffel et al. 2020, §2.2): fix
    encodings, apply the C4 line/sentence heuristics, optionally gate
    on a blocklist and redact PII, deduplicate repeated lines across
    documents, then drop exact-duplicate documents.

    C4's own order is preserved: line rules before dedup, so a page
    reduced to boilerplate by the rules dedups against its twins."""
    steps: list[tuple] = [
        ("encoding_fix", EncodingFixer([text_col])),
        ("c4_rules", C4Filter(text_col, mode="filter")),
    ]
    if badwords:
        steps.append(
            ("badwords", BadWordsFilter(text_col, badwords, mode="filter"))
        )
    if redact_pii:
        steps.append(("pii", PIIRedactor([text_col])))
    steps += [
        # repeated lines INSIDE a page first (cheap narrow projection),
        # then C4's cross-corpus rule: a line repeated anywhere else
        ("self_dedup", WithinDocDeduplicator(text_col)),
        ("line_dedup", LineDeduplicator(id_col, text_col, min_docs=2)),
        ("exact_dedup", ExactDeduplicator([text_col], id_col, normalize=True)),
    ]
    return make_pipeline(*steps)


def gopher_pipeline(
    text_col: str = "text",
    id_col: str = "doc_id",
    minhash_threshold: float = 0.8,
) -> Pipeline:
    """The Gopher/MassiveText recipe (Rae et al. 2021, §A.1.1):
    quality heuristics (word counts, word lengths, punctuation and
    stopword gates) followed by exact then near (MinHash) document
    deduplication at the paper's 0.8 Jaccard neighborhood."""
    return make_pipeline(
        ("encoding_fix", EncodingFixer([text_col])),
        ("gopher_quality", GopherQualityFilter(text_col)),
        ("exact_dedup", ExactDeduplicator([text_col], id_col, normalize=True)),
        ("near_dedup",
         MinHashDeduplicator(text_col, id_col, threshold=minhash_threshold)),
    )


def dedup_cascade(
    text_col: str = "text",
    id_col: str = "doc_id",
    minhash_threshold: float = 0.7,
    line_level: bool = True,
) -> Pipeline:
    """The standard dedup ladder, cheapest tier first so each tier
    shrinks the next one's input: exact content hash -> banded MinHash
    near-dup -> (optionally) cross-document line dedup. Span-level
    exact-substring removal (Lee et al. 2021) stays a separate
    explicit step (:class:`~.operators.dedup.ExactSubstringDeduplicator`
    ``remove_spans``) because it rewrites text rather than dropping
    rows."""
    steps: list[tuple] = [
        ("exact_dedup", ExactDeduplicator([text_col], id_col, normalize=True)),
        ("near_dedup",
         MinHashDeduplicator(text_col, id_col, threshold=minhash_threshold)),
    ]
    if line_level:
        steps.append(
            ("line_dedup", LineDeduplicator(id_col, text_col, min_docs=2))
        )
    return make_pipeline(*steps)


class LanguageGate(Transformer):
    """Keep rows a pre-fitted :class:`~.operators.text
    .NgramLanguageIdentifier` labels ``keep_lang`` — the filter form of
    the identifier for monolingual corpus builds. Stateless from the
    Pipeline's view (the wrapped model is fitted at construction); the
    intermediate ``{text_col}_lang`` column is dropped after the
    gate."""

    def __init__(self, ident, keep_lang: str):
        self.ident = ident
        self.keep_lang = keep_lang

    def is_stateful(self) -> bool:
        return False

    def _transform(self, df):
        from pyspark.sql import functions as F

        out_col = f"{self.ident.text_col}_lang"
        out = self.ident.transform(df)
        return out.where(F.col(out_col) == self.keep_lang).drop(out_col)


def fineweb_pipeline(
    spark,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_margin: float = 0.0,
    minhash_threshold: float = 0.75,
    include_c4: bool = False,
    redact_pii: bool = True,
) -> Pipeline:
    """A FineWeb-style monolingual stack (Penedo et al. 2024 ordering):
    language filter first (keep documents the bundled 30-language
    n-gram model calls ``lang``; ``min_margin`` demotes unreliable
    calls to 'und', which the gate drops), then the Gopher quality
    heuristics, optionally the C4 line rules, MinHash near-dedup at
    the paper's ~0.75 neighborhood, and PII redaction last (redacting
    before dedup would perturb the shingles).

    Needs ``spark`` to pre-fit the bundled language model
    (``fit_default``), so the returned Pipeline fits directly on
    UNLABELED corpora; reconstruct the preset (same deterministic
    model) rather than relying on save_state for the gate."""
    from .operators.text import NgramLanguageIdentifier

    ident = NgramLanguageIdentifier(
        text_col, id_col, min_margin=min_margin
    ).fit_default(spark)
    steps: list[tuple] = [
        ("encoding_fix", EncodingFixer([text_col])),
        ("lang_gate", LanguageGate(ident, lang)),
        ("gopher_quality", GopherQualityFilter(text_col)),
    ]
    if include_c4:
        steps.append(("c4_rules", C4Filter(text_col, mode="filter")))
    steps.append(
        ("near_dedup",
         MinHashDeduplicator(text_col, id_col, threshold=minhash_threshold))
    )
    if redact_pii:
        steps.append(("pii", PIIRedactor([text_col])))
    return make_pipeline(*steps)


def ccnet_pipeline(
    spark,
    arpa_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str | None = None,
    min_margin: float = 0.0,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    group_col: str | None = None,
    exact: bool = True,
) -> Pipeline:
    """The CCNet stack (Wenzek et al. 2020) runnable VERBATIM against
    a published model (r13): fix encodings, optionally gate on
    language (the bundled n-gram identifier), score every document
    under the PUBLISHED KenLM/ARPA model at ``arpa_path`` — exact
    Katz back-off, not the corpus-fitted approximation — and bucket
    head/middle/tail by per-group score quantiles (the paper samples
    training data bucket-aware; downstream keeps 'head', or mixes).

    ``group_col`` (e.g. a language column) reproduces the paper's
    per-language cutpoints; ``exact=False`` switches the bucketer to
    the constant-memory ``approx_percentile`` sketch for 100 TB runs.
    The scorer loads the model at preset construction (driver-parsed
    once, frame-held after), so the returned Pipeline fits directly
    on unlabeled corpora."""
    from .operators.arpa import ArpaLogProbScorer
    from .operators.text import (
        NgramLanguageIdentifier,
        PerplexityBucketer,
    )

    steps: list[tuple] = [("encoding_fix", EncodingFixer([text_col]))]
    if lang is not None:
        ident = NgramLanguageIdentifier(
            text_col, id_col, min_margin=min_margin
        ).fit_default(spark)
        steps.append(("lang_gate", LanguageGate(ident, lang)))
    steps.append(
        ("arpa_score",
         ArpaLogProbScorer(text_col, id_col).load_arpa(arpa_path, spark))
    )
    steps.append(
        ("ppl_bucket",
         PerplexityBucketer(
             f"{text_col}_arpa_logprob", labels=labels,
             group_col=group_col, exact=exact,
         ))
    )
    return make_pipeline(*steps)


def web_extraction_pipeline(
    html_col: str = "page",
    url_col: str = "url",
    id_col: str = "doc_id",
    blocked_domains: list[str] | None = None,
    respect_robots: bool = True,
    robots_df=None,
    x_robots_col: str | None = None,
) -> Pipeline:
    """Crawl-to-text front end: canonicalize URLs, drop URL duplicates
    (one page per canonical URL), optionally gate on a domain
    blocklist, then extract main-content text (jusText-style block
    density over the raw-HTML strip). Output keeps the original
    columns plus ``{html_col}_html_text`` and
    ``{html_col}_main_text`` — feed the latter into
    :func:`c4_pipeline` / :func:`gopher_pipeline`."""
    steps: list[tuple] = [
        ("canonical_url", UrlCanonicalizer([url_col])),
        ("url_dedup", UrlDeduplicator(url_col, id_col)),
    ]
    if blocked_domains:
        steps.append(
            ("domain_blocklist",
             DomainBlocklistFilter(url_col, blocked_domains, mode="filter"))
        )
    if robots_df is not None:
        # site-level opt-outs first: robots.txt rules per domain,
        # parsed once at preset construction into held frame state
        steps.append(
            ("robots_txt",
             RobotsTxtFilter(url_col, mode="filter").fit_robots(robots_df))
        )
    if x_robots_col is not None:
        # the header leg of the opt-out triad (read_warc's
        # http_x_robots column) — cheapest gate, runs first
        steps.append(
            ("robots_header",
             XRobotsTagFilter(x_robots_col, mode="filter"))
        )
    if respect_robots:
        # honor page-level opt-outs BEFORE spending extraction work
        steps.append(
            ("robots_meta", MetaRobotsFilter(html_col, mode="filter"))
        )
    steps += [
        ("html_text", HtmlTextExtractor([html_col])),
        ("main_content", MainContentExtractor([html_col])),
    ]
    return make_pipeline(*steps)


def curation_ledger(
    df, pipeline, id_col, cache_stages=True, enforce_gates=True
):
    """Unified keep/drop audit of a curation run — the artifact a
    100 TB build is judged by: for EVERY input document, which stage
    killed it (or that it survived). Runs ``pipeline`` step by step
    (fit-then-transform fold, identical semantics to
    :meth:`Pipeline.fit`) and attributes each disappearing ``id_col``
    to the first stage whose output no longer contains it — so it
    works uniformly across flag-gates run in filter mode AND the
    anti-join deduplicators, which have no flag column to melt.

    Returns ``(out, ledger)``: ``out`` is the fully transformed frame
    (exactly what ``pipeline.fit(df)`` returns) and ``ledger`` has one
    row per input document — ``(id_col, kept boolean, stage string,
    stage_index int)`` with ``stage`` NULL for survivors. Feed it to
    :func:`curation_funnel` for the per-stage counts, or join it back
    to the corpus for spot-checks ("show me documents the quality
    gate killed").

    Scale shape: one id-grain left-anti join per stage — the audit's
    own cost, proportional to the id column only, never the payload.
    ``cache_stages`` persists each stage boundary (MEMORY_AND_DISK,
    the ``cache_intermediate`` discipline) so stage N+1's transform
    and stage N's anti-join don't recompute the upstream chain twice;
    materialize/write the returned frames, then release with
    ``ledger.sparkSession.catalog.clearCache()`` or by unpersisting.
    Documents must be uniquely keyed by ``id_col``; stages that ADD
    rows (exploders) are out of scope — this is a gate auditor, and
    with ``enforce_gates=True`` (default) it FAILS LOUD on the first
    stage whose output ids are not a subset of its input ids (an
    exploder would otherwise silently mis-attribute every downstream
    kill). The check is one take-1 anti-join per stage against the
    already-cached boundary — id-grain, bounded, no full count."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from .exceptions import FeatureFactoryError, InvalidParameterError

    cur = df
    dropped_frames = []
    for i, (name, op) in enumerate(pipeline.steps):
        if cache_stages:
            cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
        prev_ids = cur.select(id_col)
        try:
            op.fit(cur)
            nxt = op.transform(cur)
        except FeatureFactoryError as e:
            Pipeline._reraise_with_step(e, name)
        if enforce_gates:
            foreign = nxt.select(id_col).join(
                prev_ids, id_col, "left_anti"
            )
            if not foreign.isEmpty():
                raise InvalidParameterError(
                    f"curation_ledger: stage '{name}' (index {i}) "
                    f"emitted {id_col} values absent from its input — "
                    "it adds rows (an exploder), so first-killer "
                    "attribution would be silently wrong. Audit gate "
                    "stages only, or pass enforce_gates=False if the "
                    "stage merely REWRITES ids and you accept the "
                    "attribution caveat."
                )
        dropped_frames.append(
            prev_ids.join(nxt.select(id_col), id_col, "left_anti").select(
                F.col(id_col),
                F.lit(False).alias("kept"),
                F.lit(name).alias("stage"),
                F.lit(i).cast("int").alias("stage_index"),
            )
        )
        cur = nxt
    survivors = cur.select(
        F.col(id_col),
        F.lit(True).alias("kept"),
        F.lit(None).cast("string").alias("stage"),
        F.lit(None).cast("int").alias("stage_index"),
    )
    ledger = survivors
    for frame in dropped_frames:
        ledger = ledger.unionByName(frame)
    pipeline._fitted = True
    return cur, ledger


def curation_funnel(ledger, stages=None):
    """Per-stage survival funnel from a :func:`curation_ledger` frame:
    ``(stage_index, stage, n_in, n_dropped, n_out)``, one row per
    stage in pipeline order. ``stages`` (the pipeline's step names, in
    order) zero-fills stages that dropped nothing — without it only
    stages with at least one kill appear.

    ONE count aggregate over the ledger plus stage-count-sized frames
    after it; the running-total window orders a frame with one row per
    STAGE, never per document, so the global window is free at any
    corpus scale (the corpus_report share-window precedent)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    drops = (
        ledger.where(~F.col("kept"))
        .groupBy("stage_index", "stage")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    if stages is not None:
        spark = ledger.sparkSession
        all_stages = local_frame(
            spark,
            [(i, s) for i, s in enumerate(stages)],
            "stage_index int, stage string",
        )
        drops = (
            all_stages.join(drops, ["stage_index", "stage"], "left")
            .withColumn(
                "n_dropped",
                F.coalesce(F.col("n_dropped"), F.lit(0).cast("long")),
            )
        )
    total = ledger.agg(F.count(F.lit(1)).alias("__n_total"))
    w = (
        Window.orderBy("stage_index")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        drops.crossJoin(total)
        .withColumn(
            "n_in",
            F.col("__n_total")
            - F.coalesce(F.sum("n_dropped").over(w), F.lit(0)),
        )
        .withColumn("n_out", F.col("n_in") - F.col("n_dropped"))
        .select("stage_index", "stage", "n_in", "n_dropped", "n_out")
    )
