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


def web_extraction_pipeline(
    html_col: str = "page",
    url_col: str = "url",
    id_col: str = "doc_id",
    blocked_domains: list[str] | None = None,
    respect_robots: bool = True,
    robots_df=None,
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
