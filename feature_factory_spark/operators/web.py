"""URL / domain operators for web-corpus curation.

The reference has no web operators (SURVEY.md §2.3); these are part of
the beyond-reference LLM-pipeline surface: domain extraction for
provenance columns, blocklist filtering, and per-domain caps (the
standard anti-SEO-spam measure — no single domain should dominate a
training mix).

Design rules match the text operators: pure JVM expressions
(``parse_url`` + regexps) for extraction, broadcast joins for
frame-held blocklists, and the salted two-phase top-k (GroupedTopK)
for per-domain caps — domain frequency is zipfian at corpus scale, so
the cap path defaults to skew_safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..exceptions import InvalidParameterError
from ..pipeline import Transformer
from ..validation import ensure, validate_columns, validate_string_columns
from .joins import GroupedTopK


def host_expr(url: Column) -> Column:
    """Hostname (no scheme, userinfo, port, path). try_parse_url, not
    parse_url: ANSI mode (Spark 4 default) makes parse_url RAISE on the
    malformed URLs a crawled corpus is full of — the operator contract
    is NULL components instead."""
    return F.try_parse_url(url, F.lit("HOST"))


def registered_domain_expr(url: Column) -> Column:
    """Host with a leading ``www.`` stripped — the grouping key for
    caps/blocklists. (A full public-suffix-list reduction needs the PSL
    data file; ``www.``-stripping is the deterministic, dependency-free
    default and the seam where a PSL join would slot in.)"""
    return F.regexp_replace(host_expr(url), r"^www\.", "")


def path_expr(url: Column) -> Column:
    return F.try_parse_url(url, F.lit("PATH"))


class DomainExtractor(Transformer):
    """Append URL components per url column:

    - ``{c}_host``    hostname (userinfo/port stripped)
    - ``{c}_domain``  host minus a leading ``www.``
    - ``{c}_path``    path component ('' when absent)

    Stateless projection, pure JVM ``parse_url`` expressions; malformed
    URLs yield NULL components rather than errors."""

    def __init__(self, columns: list[str]):
        ensure(bool(columns), "at least one url column is required")
        self.columns = list(columns)

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def _transform(self, df: DataFrame) -> DataFrame:
        new_cols = []
        for c in self.columns:
            u = F.col(c)
            new_cols += [
                host_expr(u).alias(f"{c}_host"),
                registered_domain_expr(u).alias(f"{c}_domain"),
                path_expr(u).alias(f"{c}_path"),
            ]
        return df.select("*", *new_cols)


class DomainBlocklistFilter(Transformer):
    """Flag (or drop) rows whose URL's domain is on a blocklist.

    A domain matches when it EQUALS a blocked entry or is a subdomain
    of one (``ads.tracker.example`` matches blocked ``tracker.example``)
    — suffix matching on dot boundaries, never substring matching
    (``nottracker.example`` does not match).

    ``blocked``: a Python list (inlined as a literal array — fine for
    curated lists of up to a few thousand entries) or a single-column
    DataFrame (scale path: the corpus left-joins the broadcast
    blocklist on the candidate-suffix key — a URL has at most
    ``label-count`` candidate suffixes, so the explode factor is ~3-5).

    ``mode='flag'`` appends boolean ``output_col``; ``mode='filter'``
    drops matching rows. NULL/malformed URLs are never flagged."""

    def __init__(
        self,
        url_col: str,
        blocked: list[str] | DataFrame,
        mode: str = "flag",
        output_col: str = "domain_blocked",
    ):
        ensure(mode in ("flag", "filter"), "mode: 'flag' or 'filter'")
        if isinstance(blocked, list):
            ensure(bool(blocked), "blocklist is empty")
        self.url_col = url_col
        self.blocked = blocked
        self.mode = mode
        self.output_col = output_col

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, [self.url_col])

    @staticmethod
    def _suffixes_expr(domain: Column) -> Column:
        """All dot-boundary suffixes of a domain:
        'a.b.example.org' -> ['a.b.example.org', 'b.example.org',
        'example.org', 'org']."""
        parts = F.split(domain, r"\.")
        n = F.size(parts)
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(parts, i, n), "."),
        )

    def _flag_expr_or_frame(self, df: DataFrame):
        domain = registered_domain_expr(F.col(self.url_col))
        suffixes = self._suffixes_expr(domain)
        if isinstance(self.blocked, list):
            blocked_arr = F.array(*[F.lit(d) for d in sorted(set(self.blocked))])
            return F.coalesce(
                F.arrays_overlap(suffixes, blocked_arr), F.lit(False)
            )
        # frame blocklist handled in _transform (needs a join)
        return None

    def _transform(self, df: DataFrame) -> DataFrame:
        if isinstance(self.blocked, list):
            flag = self._flag_expr_or_frame(df)
            out = df.select("*", flag.alias(self.output_col))
        else:
            # Row-multiplicity-preserving flag: key every row by a
            # unique surrogate id, explode the candidate suffixes,
            # broadcast-left-join the blocklist, and re-aggregate BY THE
            # ID ONLY (first() per payload column). Unique ids mean
            # fully-duplicate rows survive, and map-typed payload
            # columns are fine as first() inputs though they are not
            # groupable keys. One linear plan — the id is evaluated in
            # a single subtree, so monotonically_increasing_id's
            # per-evaluation nondeterminism cannot desynchronize.
            # STABLE-INPUT ASSUMPTION: on a stage retry / speculative
            # recompute the surrogate id is correct only if upstream
            # partitions replay identically, which holds for file scans
            # and deterministic transforms (every in-repo source). If a
            # nondeterministic frame (e.g. a fractional sample without a
            # seed, or a shuffled stream) feeds this path, checkpoint or
            # materialize it first so the ids are minted over stable rows.
            bl_col = self.blocked.columns[0]
            blocklist = self.blocked.select(
                F.col(bl_col).alias("__ff_blocked_domain")
            ).distinct()
            domain = registered_domain_expr(F.col(self.url_col))
            keyed = df.select(
                "*",
                F.monotonically_increasing_id().alias("__ff_rid"),
                F.coalesce(
                    self._suffixes_expr(domain),
                    F.array().cast("array<string>"),
                ).alias("__ff_sfx"),
            )
            exploded = keyed.select(
                *df.columns,
                "__ff_rid",
                F.explode_outer("__ff_sfx").alias("__ff_one_sfx"),
            )
            hit = exploded.join(
                F.broadcast(blocklist),
                exploded["__ff_one_sfx"] == blocklist["__ff_blocked_domain"],
                "left",
            )
            out = (
                hit.groupBy("__ff_rid")
                .agg(
                    *[F.first(c).alias(c) for c in df.columns],
                    (F.count("__ff_blocked_domain") > 0).alias(self.output_col),
                )
                .drop("__ff_rid")
                .select(*df.columns, self.output_col)
            )
        if self.mode == "filter":
            return out.where(~F.col(self.output_col)).drop(self.output_col)
        return out


class DomainCapSampler(Transformer):
    """Keep at most ``max_per_domain`` rows per registered domain —
    deterministic (hash-ordered) per-domain downsampling, the standard
    guard against any one domain dominating a training mix.

    Within a domain, survivors are the ``max_per_domain`` smallest
    md5(id) values (seeded) — a reproducible uniform choice independent
    of input order/partitioning. The cap itself is GroupedTopK's salted
    two-phase top-k (``skew_safe=True`` by default): domain frequency
    is zipfian, so the biggest domain would otherwise serialize onto
    one reducer.

    Rows whose URL yields a NULL domain (malformed/NULL URLs) belong to
    no real domain, so they are EXEMPT from the cap and pass through
    unchanged — pooling them into one NULL group and capping it would
    silently drop unrelated rows."""

    def __init__(
        self,
        url_col: str,
        id_col: str,
        max_per_domain: int,
        seed: int = 0,
        skew_safe: bool = True,
        domain_col: str | None = None,
    ):
        ensure(max_per_domain >= 1, "max_per_domain must be >= 1")
        self.url_col = url_col
        self.id_col = id_col
        self.max_per_domain = max_per_domain
        self.seed = seed
        self.skew_safe = skew_safe
        # pre-extracted domain column (skips parse_url when the pipeline
        # already ran DomainExtractor)
        self.domain_col = domain_col

    def _check_input(self, df: DataFrame) -> None:
        cols = [self.id_col]
        if self.domain_col is None:
            cols.append(self.url_col)
        else:
            cols.append(self.domain_col)
        validate_columns(df, cols)

    def _transform(self, df: DataFrame) -> DataFrame:
        domain = (
            F.col(self.domain_col)
            if self.domain_col is not None
            else registered_domain_expr(F.col(self.url_col))
        )
        rank_key = F.md5(
            F.concat_ws("|", F.lit(str(self.seed)), F.col(self.id_col).cast("string"))
        )
        keyed = df.select(
            "*", domain.alias("__ff_domain"), rank_key.alias("__ff_rk")
        )
        # NULL domains are exempt from the cap (see class docstring)
        exempt = keyed.where(F.col("__ff_domain").isNull())
        capped = GroupedTopK(
            ["__ff_domain"],
            "__ff_rk",
            self.max_per_domain,
            ascending=True,
            tiebreak_cols=[self.id_col],
            skew_safe=self.skew_safe,
        ).transform(keyed.where(F.col("__ff_domain").isNotNull()))
        return capped.unionByName(exempt).drop("__ff_domain", "__ff_rk")


# tracking-parameter keys stripped by canonicalization: the
# ubiquitous cross-site analytics/click identifiers (utm_* plus the
# Google/Facebook/Microsoft/Mailchimp click ids). Keys only — a
# key=value is dropped whole. Bare 'ref'/'ref_src' are deliberately
# NOT in the default list: 'ref' is a functional parameter on many
# sites (e.g. GitHub ?ref=<branch> selects content), so stripping it
# would merge genuinely distinct pages under UrlDeduplicator — opt in
# with TRACKING_PARAM_RE_AGGRESSIVE when the corpus is known safe.
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid)="
)

# opt-in variant that also strips the social-referrer tags; only for
# corpora where '?ref=' is known to never select content
TRACKING_PARAM_RE_AGGRESSIVE = (
    r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid"
    r"|ref|ref_src)="
)


def canonical_url_expr(
    url: Column,
    sort_query: bool = True,
    tracking_re: str = TRACKING_PARAM_RE,
) -> Column:
    """Canonical form of a URL, NULL when the URL has no parseable
    scheme+host:

    - scheme and host lowercased; userinfo and fragment stripped
    - default ports dropped (``:80`` for http, ``:443`` for https)
    - tracking parameters (``tracking_re``, matched against the
      lowercased ``key=`` prefix) removed; remaining query params
      sorted when ``sort_query`` (byte order — canonical keys compare
      stably) and rejoined; an emptied query drops its ``?``
    - trailing slashes folded (``/a/`` -> ``/a``, root ``/`` -> '')

    Pure JVM expressions (try_parse_url + regexps + array HOFs); path
    and query VALUE case, percent-encoding, and IDN/punycode are
    preserved as-is (normalizing those needs per-site knowledge a
    generic canonicalizer should not guess at)."""
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    auth = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((proto == "http") & (port == "80"))
        | ((proto == "https") & (port == "443"))
    )
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    canon_path = F.regexp_replace(path, r"/+$", "")
    query = F.try_parse_url(url, F.lit("QUERY"))
    kept = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(tracking_re),
    )
    if sort_query:
        kept = F.array_sort(kept)
    qs = F.array_join(kept, "&")
    return F.when(
        proto.isNotNull() & host.isNotNull(),
        F.concat(
            proto,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            canon_path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        ),
    )


class UrlCanonicalizer(Transformer):
    """Append ``{c}_canonical`` per url column — the canonical form
    (``canonical_url_expr``): lowercased scheme/host, userinfo /
    fragment / default-port / tracking-param stripping, sorted query,
    folded trailing slash; NULL for unparseable URLs.

    Crawls carry heavy URL-level duplication (session ids, tracking
    params, scheme/case variants of the same page) BEFORE any content
    dedup; this is the key extractor for ``UrlDeduplicator`` and any
    per-URL provenance join. Stateless narrow projection — no shuffle,
    no UDF, at any corpus size."""

    def __init__(self, columns: list[str], sort_query: bool = True):
        ensure(bool(columns), "at least one url column is required")
        self.columns = list(columns)
        self.sort_query = sort_query

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.select(
            "*",
            *[
                canonical_url_expr(F.col(c), self.sort_query).alias(
                    f"{c}_canonical"
                )
                for c in self.columns
            ],
        )


class UrlDeduplicator(Transformer):
    """Keep one row per canonical URL — crawl-level dedup that runs
    BEFORE content dedup (the same page fetched under tracking-param /
    case / port variants collapses to one candidate).

    The survivor per canonical URL is either the highest ``score_col``
    (ties -> smallest ``id_col``) or, without a score, the smallest
    seeded md5(id) — the same reproducible uniform choice as
    DomainCapSampler. Rows whose URL does not canonicalize (NULL) have
    no URL identity and pass through unchanged.

    Scale shape: canonicalization is a narrow projection; the keep-one
    is GroupedTopK's salted two-phase top-k (``skew_safe`` default on —
    a crawl's hottest URL is exactly the skewed key case)."""

    def __init__(
        self,
        url_col: str,
        id_col: str,
        score_col: str | None = None,
        seed: int = 0,
        skew_safe: bool = True,
        canonicalize: bool = True,
    ):
        self.url_col = url_col
        self.id_col = id_col
        self.score_col = score_col
        self.seed = seed
        self.skew_safe = skew_safe
        self.canonicalize = canonicalize

    def _check_input(self, df: DataFrame) -> None:
        cols = [self.url_col, self.id_col]
        if self.score_col is not None:
            cols.append(self.score_col)
        validate_columns(df, cols)

    def _transform(self, df: DataFrame) -> DataFrame:
        key = (
            canonical_url_expr(F.col(self.url_col))
            if self.canonicalize
            else F.col(self.url_col)
        )
        if self.score_col is not None:
            rank_col, ascending = self.score_col, False
            keyed = df.select("*", key.alias("__ff_curl"))
        else:
            rank = F.md5(
                F.concat_ws(
                    "|", F.lit(str(self.seed)),
                    F.col(self.id_col).cast("string"),
                )
            )
            rank_col, ascending = "__ff_rk", True
            keyed = df.select(
                "*", key.alias("__ff_curl"), rank.alias("__ff_rk")
            )
        exempt = keyed.where(F.col("__ff_curl").isNull())
        deduped = GroupedTopK(
            ["__ff_curl"],
            rank_col,
            1,
            ascending=ascending,
            tiebreak_cols=[self.id_col],
            skew_safe=self.skew_safe,
        ).transform(keyed.where(F.col("__ff_curl").isNotNull()))
        out = deduped.unionByName(exempt)
        drop = ["__ff_curl"] + ([] if self.score_col else ["__ff_rk"])
        return out.drop(*drop)


class HtmlTextExtractor(Transformer):
    """HTML -> text extraction for crawled web pages — the step between
    a raw crawl and every text operator in this package (the reference
    has no web surface at all, SURVEY.md §2.3).

    Appends per column:

    - ``{c}_html_text``   extracted visible text: script/style blocks
      and comments removed, block-level closers folded to newlines, all
      remaining tags stripped, the six ubiquitous named entities
      (``&nbsp; &lt; &gt; &quot; &#39; &amp;``) decoded, whitespace
      runs collapsed
    - ``{c}_tag_count``   markup tag count in the raw HTML
    - ``{c}_link_count``  anchor (``<a``) tag count — with tag_count
      and the length ratio these are the standard boilerplate /
      link-farm signals
    - ``{c}_text_ratio``  extracted-to-raw length ratio (0 for empty
      input)

    Stateless pure-JVM regexp chain — no parser object, no UDF, no
    shuffle; one narrow projection at any corpus size. A DOM-accurate
    extractor (trafilatura-class) would slot in behind the same output
    columns as a mapInPandas seam, but the regexp chain is the
    dependency-free default and is exactly SQL-expressible, so the
    correctness oracle recomputes it end-to-end.

    Determinism notes: entity decoding runs ``&amp;`` LAST so
    ``&amp;lt;`` decodes to the literal ``&lt;`` (single pass, the
    HTML5 reference behavior), and the whitespace classes are spelled
    ``[ \\t\\r\\f]`` explicitly because Java's ``\\s`` and RE2's
    ``\\s`` disagree on vertical tab — the patterns must mean the same
    thing in Spark and in the DuckDB twin."""

    def __init__(self, columns: list[str], keep_newlines: bool = True):
        ensure(bool(columns), "at least one html column is required")
        self.columns = list(columns)
        self.keep_newlines = keep_newlines

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    @staticmethod
    def text_expr(html: Column, keep_newlines: bool = True) -> Column:
        """The extraction chain as a composable expression."""
        x = F.regexp_replace(html, r"(?is)<script\b[^>]*>.*?</script[^>]*>", " ")
        x = F.regexp_replace(x, r"(?is)<style\b[^>]*>.*?</style[^>]*>", " ")
        x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
        # block-level closers/voids become line breaks so paragraphs
        # survive tag stripping
        x = F.regexp_replace(
            x, r"(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/table|/blockquote)[^>]*>",
            "\n",
        )
        x = F.regexp_replace(x, r"<[^>]*>", " ")
        for ent, rep in [
            ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
            ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
        ]:
            x = F.replace(x, F.lit(ent), F.lit(rep))
        x = F.regexp_replace(x, r"[ \t\r\f]+", " ")
        if keep_newlines:
            x = F.regexp_replace(x, r"[ \t\r\f]*\n[ \t\r\f]*", "\n")
            x = F.regexp_replace(x, r"\n{2,}", "\n")
        else:
            x = F.regexp_replace(x, r"[ \t\r\f]*\n[ \t\r\f]*", " ")
        return F.trim(x)

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c in self.columns:
            raw = F.col(c)
            text = self.text_expr(raw, self.keep_newlines)
            out = (
                out.withColumn(f"{c}_html_text", text)
                .withColumn(
                    f"{c}_tag_count", F.regexp_count(raw, F.lit(r"<[^>]*>"))
                )
                .withColumn(
                    f"{c}_link_count",
                    F.regexp_count(raw, F.lit(r"(?i)<a[ \t\r\n>]")),
                )
                .withColumn(
                    f"{c}_text_ratio",
                    F.when(F.length(raw) > 0,
                           F.length(F.col(f"{c}_html_text"))
                           / F.length(raw).cast("double"))
                    .otherwise(F.lit(0.0)),
                )
            )
        return out


# The jusText-style default English stopword set used by the
# block-density classifier below. Deliberately SMALL and frozen: the
# classifier needs "does this block read like prose" — the top function
# words carry that signal; a larger list only shifts the threshold.
MAIN_CONTENT_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "a", "in", "that", "have", "it",
    "is", "was", "for", "on", "are", "with", "as", "at", "this", "but",
    "by", "from", "or", "an", "not", "we", "you", "they", "his", "her",
)

# block-level tags that open a new text block (jusText's segmentation
# grain); both the opening and closing form split
_BLOCK_TAGS = (
    "p|div|h[1-6]|li|td|th|ul|ol|table|tr|nav|footer|header|aside|"
    "section|article|main|blockquote|br|dd|dt|dl|pre|form"
)


class MainContentExtractor(Transformer):
    """Main-content extraction for crawled pages — the block/line
    text-density segmentation production curation runs between raw
    tag-stripping (:class:`HtmlTextExtractor`) and quality filtering
    (C4Filter/Gopher): navigation, footers, sidebars and link farms are
    boilerplate that survives a plain tag strip and poisons every
    downstream text statistic.

    Public-heuristic lineage: jusText (Pomikálek 2011) and
    readability-class extractors classify BLOCKS (segments between
    block-level tags) by link density, stopword density, and length;
    this operator implements that family's deterministic core:

    a block is MAIN CONTENT iff
      - it has at least ``min_words`` words, and
      - ``links <= max_link_density * words`` (anchor tags counted on
        the block's raw HTML before stripping), and
      - ``stopwords >= min_stopword_density * words`` (case-folded
        whole-word matches against ``stopwords``)

    Appends per column:

    - ``{c}_main_text``          newline-joined text of main blocks,
      in document order
    - ``{c}_boilerplate_ratio``  1 - main_chars / text_chars over
      non-empty blocks (0.0 for pages with no text at all)
    - ``{c}_n_blocks``           non-empty text blocks
    - ``{c}_n_main_blocks``      blocks classified main

    Scale shape: ONE narrow projection — script/style/comment removal,
    a block-boundary split, then higher-order array functions
    (transform/filter/aggregate) per row. No shuffle, no UDF, no
    collect; whole-stage codegen end to end, so 10x pages is 10x task
    work with zero plan change. Every rule is plain-SQL expressible,
    so the correctness oracle recomputes the whole chain.
    """

    def __init__(
        self,
        columns: list[str],
        min_words: int = 5,
        max_link_density: float = 0.2,
        min_stopword_density: float = 0.1,
        stopwords: tuple[str, ...] | None = None,
    ):
        ensure(bool(columns), "at least one html column is required")
        ensure(min_words >= 1, "min_words must be >= 1")
        ensure(0.0 <= max_link_density <= 1.0,
               "max_link_density must be in [0,1]")
        ensure(0.0 <= min_stopword_density <= 1.0,
               "min_stopword_density must be in [0,1]")
        self.columns = list(columns)
        self.min_words = min_words
        self.max_link_density = max_link_density
        self.min_stopword_density = min_stopword_density
        self.stopwords = tuple(stopwords or MAIN_CONTENT_STOPWORDS)
        ensure(all(w and w.isalpha() for w in self.stopwords),
               "stopwords must be plain alphabetic words")

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    def stopword_pattern(self) -> str:
        """The whole-word stopword-count regex (Java and RE2 agree on
        ``\\b`` and alternation, so the oracle reuses it verbatim)."""
        return r"\b(" + "|".join(self.stopwords) + r")\b"

    @staticmethod
    def block_text_expr(block: Column) -> Column:
        """Visible single-line text of one raw-HTML block: tags
        stripped, the six ubiquitous entities decoded (``&amp;`` last,
        the HtmlTextExtractor single-pass rule), whitespace collapsed."""
        x = F.regexp_replace(block, r"<[^>]*>", " ")
        for ent, rep in [
            ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
            ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
        ]:
            x = F.replace(x, F.lit(ent), F.lit(rep))
        return F.trim(F.regexp_replace(x, r"[ \t\r\f\n]+", " "))

    def _transform(self, df: DataFrame) -> DataFrame:
        sep = "\x01"
        stop_pat = self.stopword_pattern()
        out = df
        for c in self.columns:
            x = F.regexp_replace(
                F.col(c), r"(?is)<script\b[^>]*>.*?</script[^>]*>", " "
            )
            x = F.regexp_replace(x, r"(?is)<style\b[^>]*>.*?</style[^>]*>", " ")
            x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
            x = F.regexp_replace(
                x, r"(?i)(</?(" + _BLOCK_TAGS + r")\b)", sep + "$1"
            )
            blocks = F.split(x, sep)
            feats_expr = F.transform(
                blocks,
                lambda b: F.struct(
                    self.block_text_expr(b).alias("t"),
                    F.regexp_count(b, F.lit(r"(?i)<a[ \t\r\n>]")).alias("l"),
                ),
            )
            feats_expr = F.transform(
                feats_expr,
                lambda s: F.struct(
                    s["t"].alias("t"),
                    s["l"].alias("l"),
                    F.when(s["t"] == "", F.lit(0))
                    .otherwise(F.size(F.split(s["t"], " ")))
                    .alias("w"),
                    F.size(
                        F.regexp_extract_all(
                            F.lower(s["t"]), F.lit(stop_pat), F.lit(0)
                        )
                    ).alias("sw"),
                ),
            )
            # STAGE the per-block feature array as a real column: it is
            # referenced five times below (total/main chars, main text,
            # two sizes), the whole chain is higher-order (interpreted,
            # no codegen common-subexpression elimination), and the
            # multi-reference keeps CollapseProject from re-inlining the
            # regexp passes at every site (the DSIRWeighter discipline)
            feats_tmp = f"__ff_mc_feats_{c}"
            out = out.withColumn(feats_tmp, feats_expr)
            feats = F.col(feats_tmp)

            def good(s):
                return (
                    (s["w"] >= F.lit(self.min_words))
                    & (s["l"].cast("double")
                       <= F.lit(self.max_link_density) * s["w"])
                    & (s["sw"].cast("double")
                       >= F.lit(self.min_stopword_density) * s["w"])
                )

            nonempty = F.filter(feats, lambda s: s["t"] != "")
            main = F.filter(feats, good)
            total_chars = F.aggregate(
                nonempty, F.lit(0),
                lambda acc, s: acc + F.length(s["t"]),
            )
            main_chars = F.aggregate(
                main, F.lit(0), lambda acc, s: acc + F.length(s["t"])
            )
            out = (
                out.withColumn(
                    f"{c}_main_text",
                    F.array_join(
                        F.transform(main, lambda s: s["t"]), "\n"
                    ),
                )
                .withColumn(
                    f"{c}_boilerplate_ratio",
                    F.when(F.col(c).isNull(), F.lit(None).cast("double"))
                    .when(
                        total_chars > 0,
                        F.lit(1.0)
                        - main_chars.cast("double") / total_chars,
                    ).otherwise(F.lit(0.0)),
                )
                .withColumn(f"{c}_n_blocks", F.size(nonempty))
                .withColumn(f"{c}_n_main_blocks", F.size(main))
                .drop(feats_tmp)
            )
        return out


# Markdown -> text rules, applied IN ORDER. Each entry is
# (pattern, replacement) with Java-style $1 group references; the
# DuckDB oracle twin is GENERATED from this same table (with $n
# translated to RE2's \n), so the two engines cannot drift. Patterns
# use only syntax Java regex and RE2 agree on: embedded (?s)/(?m)
# flags, non-greedy quantifiers, character classes — no lookbehind.
MD_RULES: list[tuple[str, str]] = [
    # fenced code blocks are code, not prose
    (r"(?s)```.*?```", " "),
    # images keep their alt text; links keep their anchor text
    (r"!\[([^\]]*)\]\([^)]*\)", "$1"),
    (r"\[([^\]]*)\]\([^)]*\)", "$1"),
    (r"\[([^\]]*)\]\[[^\]]*\]", "$1"),
    # inline code keeps its content
    (r"`+([^`\n]*)`+", "$1"),
    # ATX headers, setext underlines / horizontal rules
    (r"(?m)^[ \t]{0,3}#{1,6}[ \t]+", ""),
    (r"(?m)^[ \t]{0,3}(={3,}|-{3,}|\*{3,}|_{3,})[ \t]*$", ""),
    # blockquote markers (nested) and list markers
    (r"(?m)^[ \t]*(>[ \t]?)+", ""),
    (r"(?m)^[ \t]*([-*+]|[0-9]{1,3}[.)])[ \t]+", ""),
    # emphasis/table syntax: strip remaining asterisks, backticks and
    # pipes (underscores survive — snake_case identifiers are content)
    (r"[*`|]+", " "),
    # whitespace normalization (explicit classes — Java \s and RE2 \s
    # disagree on vertical tab, the HtmlTextExtractor rule)
    (r"[ \t\r\f]+", " "),
    (r"[ \t\r\f]*\n[ \t\r\f]*", "\n"),
    (r"\n{2,}", "\n"),
]

# metric patterns, counted on the RAW markdown (before any stripping)
MD_IMAGE_RE = r"!\[[^\]]*\]\([^)]*\)"
MD_LINK_RE = r"\[[^\]]*\]\([^)]*\)"   # matches inside images too: subtract
MD_FENCE_RE = r"(?s)```.*?```"


class MarkdownTextExtractor(Transformer):
    """Markdown -> text extraction — the README/docs/forum-dump twin of
    :class:`HtmlTextExtractor` (GitHub, StackExchange, and wiki dumps
    arrive as Markdown; the curation chain needs prose, not syntax).

    Appends per column:

    - ``{c}_md_text``      extracted prose: fenced code blocks removed,
      image/link syntax reduced to alt/anchor text, inline-code
      markers, headers, blockquote/list markers, emphasis asterisks,
      backticks and table pipes stripped, whitespace collapsed
      (``MD_RULES``, applied in order)
    - ``{c}_code_blocks``  fenced-block count in the raw markdown
    - ``{c}_link_count``   link count (images excluded)
    - ``{c}_image_count``  image count
    - ``{c}_text_ratio``   extracted-to-raw length ratio (0 for empty)

    Stateless pure-JVM regexp chain, one narrow projection, no UDF —
    and because the rule table drives BOTH engines, the DuckDB oracle
    recomputes the extraction end-to-end (the EncodingFixer generated-
    table pattern)."""

    def __init__(self, columns: list[str]):
        ensure(bool(columns), "at least one markdown column is required")
        self.columns = list(columns)

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, self.columns)

    @staticmethod
    def text_expr(md: Column) -> Column:
        """The extraction chain as a composable expression."""
        x = md
        for pat, rep in MD_RULES:
            x = F.regexp_replace(x, pat, rep)
        return F.trim(x)

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        for c in self.columns:
            raw = F.col(c)
            n_img = F.regexp_count(raw, F.lit(MD_IMAGE_RE))
            out = (
                out.withColumn(f"{c}_md_text", self.text_expr(raw))
                .withColumn(
                    f"{c}_code_blocks",
                    F.regexp_count(raw, F.lit(MD_FENCE_RE)),
                )
                .withColumn(
                    f"{c}_link_count",
                    F.regexp_count(raw, F.lit(MD_LINK_RE)) - n_img,
                )
                .withColumn(f"{c}_image_count", n_img)
                .withColumn(
                    f"{c}_text_ratio",
                    F.when(
                        F.length(raw) > 0,
                        F.length(F.col(f"{c}_md_text")).cast("double")
                        / F.length(raw).cast("double"),
                    ).otherwise(F.lit(0.0)),
                )
            )
        return out


# All <meta ...> tags are scanned; the name/content attributes may
# appear in either order and may be double-quoted, single-quoted, or
# unquoted (all three are valid HTML5 attribute syntaxes). Directive
# matching is on the content value, comma-separated, case-insensitive,
# whitespace-tolerant (the Google/Bing documented grammar). (?s) lets
# a tag span newlines. The name value is matched EXACTLY ('robots',
# not a 'robots*' prefix), and directives are unioned across every
# robots meta tag on the page — a page carrying 'index' then
# 'noindex' is blocked, matching how search engines apply the most
# restrictive directive. RE2-compatible (no lookarounds/backrefs) so
# the oracle twin replays the identical patterns.
META_TAG_RE = r"(?is)<meta\b[^>]*>"
# The attribute name is anchored on a NON-word, non-hyphen leading
# character ((?:^|[^\w-]) — RE2-safe, no lookbehind) so hyphenated
# attributes like data-name= / data-content= never match: '\bname'
# alone would treat '-' as a word boundary and read
# '<meta data-name="robots" ...>' as a robots tag (a false-positive
# block contradicting the exact-name contract).
_NAME_ATTR_RE = (
    r"(?is)(?:^|[^\w-])name\s*=\s*"
    r"(?:\"([^\"]*)\"|'([^']*)'|([^\s>'\"]+))"
)
_CONTENT_ATTR_RE = (
    r"(?is)(?:^|[^\w-])content\s*=\s*"
    r"(?:\"([^\"]*)\"|'([^']*)'|([^\s>'\"]+))"
)


def _attr_expr(tag: Column, pattern: str) -> Column:
    """First non-empty alternation group (double-quoted,
    single-quoted, unquoted) of an attribute pattern."""
    g1 = F.regexp_extract(tag, pattern, 1)
    g2 = F.regexp_extract(tag, pattern, 2)
    g3 = F.regexp_extract(tag, pattern, 3)
    return F.when(g1 != "", g1).when(g2 != "", g2).otherwise(g3)


class MetaRobotsFilter(Transformer):
    """Respect page-level crawl opt-outs: drop (or flag) pages whose
    HTML carries a ``<meta name="robots">`` directive in ``blocked``
    (default ``noindex`` / ``none`` — the two directives that mean "do
    not use this page's content"). Training-corpus builds that honor
    publisher opt-outs run this right after extraction, before any
    content work is spent on excluded pages.

    Appends ``{html_col}_robots`` (the lowercased content values of
    ALL robots meta tags on the page, comma-joined — directives are
    unioned so an ``index`` tag followed by a ``noindex`` tag still
    blocks; NULL when the page has none) and, in
    ``mode='flag'``, ``{html_col}_robots_blocked``; ``mode='filter'``
    drops blocked pages. Matching is token-grain on the comma-split
    directive list (``noindex, follow`` blocks; ``nofollow`` alone
    does not — link policy is not content policy).

    Stateless pure-JVM regexp chain — one narrow projection, exactly
    SQL-expressible like the rest of the web surface. X-Robots-Tag
    HTTP headers live in the WARC envelope, not the HTML; filter those
    at ingestion from ``read_warc``'s header columns."""

    def __init__(
        self,
        html_col: str,
        blocked: tuple[str, ...] = ("noindex", "none"),
        mode: str = "flag",
    ):
        ensure(mode in ("flag", "filter"), "mode: 'flag' or 'filter'")
        ensure(bool(blocked), "at least one blocked directive is required")
        self.html_col = html_col
        self.blocked = tuple(d.lower() for d in blocked)
        self.mode = mode

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, [self.html_col])

    def robots_expr(self) -> Column:
        """Comma-joined lowercased content values of every robots meta
        tag on the page (NULL when the page has none). Scans all
        ``<meta>`` tags, keeps those whose name attribute is EXACTLY
        ``robots`` (quoted or unquoted, case-insensitive — a name
        merely prefixed with 'robots' does not match), and unions
        their content values so later tags cannot be shadowed by an
        earlier permissive one."""
        tags = F.regexp_extract_all(
            F.coalesce(F.col(self.html_col), F.lit("")),
            F.lit(META_TAG_RE), F.lit(0),
        )
        robots_tags = F.filter(
            tags,
            lambda t: F.lower(F.trim(_attr_expr(t, _NAME_ATTR_RE)))
            == F.lit("robots"),
        )
        contents = F.transform(
            robots_tags,
            lambda t: F.lower(_attr_expr(t, _CONTENT_ATTR_RE)),
        )
        return F.when(
            F.size(robots_tags) > 0, F.array_join(contents, ",")
        )

    def blocked_expr(self, robots: Column) -> Column:
        # NOTE: lambda, not bare F.trim — in PySpark 4 trim has an
        # optional second parameter, so transform() would pass the
        # element INDEX as the trim character set (stripping digits
        # instead of whitespace).
        toks = F.transform(
            F.split(F.coalesce(robots, F.lit("")), ","),
            lambda x: F.trim(x),
        )
        return F.arrays_overlap(
            toks, F.array(*[F.lit(d) for d in self.blocked])
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        rcol = f"{self.html_col}_robots"
        out = df.withColumn(rcol, self.robots_expr())
        blocked = self.blocked_expr(F.col(rcol))
        if self.mode == "filter":
            return out.where(~blocked)
        return out.withColumn(f"{rcol}_blocked", blocked)


def pct_normalize_expr(s: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, pure JVM: every
    valid ``%XX`` triad is uppercased, and triads encoding UNRESERVED
    characters (ALPHA / DIGIT / ``-._~``) are decoded. Reserved octets
    (``%2F`` etc.) keep their encoded form — decoding those would
    change URL structure (RFC 3986 §2.2), and decoding ``%2A``/``%24``
    would conjure robots wildcard metacharacters out of literals. A
    ``%`` not followed by two hex digits passes through verbatim.

    Applying the SAME normalization to robots rule prefixes and probed
    paths makes ``/%7euser/`` match ``/~user/x`` and ``/a%2fb`` match
    ``Disallow: /a%2Fb`` — the equivalence RFC 9309 §2.2.2 expects —
    without conflating ``/a%2Fb`` with ``/a/b``. One split + one fold
    over the percent segments; no UDF, replayed identically by the
    DuckDB oracle twin and the pure-Python property reference."""
    parts = F.split(s, "%", -1)
    head = F.element_at(parts, 1)
    tail = F.slice(
        parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))
    )

    def seg(p: Column) -> Column:
        hex2 = F.substring(p, 1, 2)
        valid = hex2.rlike("^[0-9A-Fa-f]{2}$")
        ch = F.char(F.conv(hex2, 16, 10).cast("bigint"))
        unreserved = ch.rlike("^[A-Za-z0-9._~-]$")
        rest = F.substring(p, 3, 2147483647)
        return (
            F.when(~valid, F.concat(F.lit("%"), p))
            .when(unreserved, F.concat(ch, rest))
            .otherwise(F.concat(F.lit("%"), F.upper(hex2), rest))
        )

    return F.concat(
        head,
        F.aggregate(
            tail, F.lit(""), lambda acc, x: F.concat(acc, seg(x))
        ),
    )


# X-Robots-Tag directives that carry a ':'-separated VALUE — these
# never open an agent scope ('unavailable_after: 25 Jun 2010' is a
# directive, not a crawler named 'unavailable_after').
X_ROBOTS_VALUE_DIRECTIVES = (
    "unavailable_after",
    "max-snippet",
    "max-image-preview",
    "max-video-preview",
)


class XRobotsTagFilter(Transformer):
    """Header-level crawl opt-outs: drop (or flag) pages whose
    ``X-Robots-Tag`` HTTP header carries a directive in ``blocked``
    (default ``noindex`` / ``none``) — the third leg of the opt-out
    triad as a first-class operator (``read_warc`` surfaces the header
    as the ``http_x_robots`` column; :class:`MetaRobotsFilter` covers
    the page level, :class:`RobotsTxtFilter` the site level).

    Directive grammar (the Google-documented form): a comma-separated
    list where a ``useragent:`` prefix SCOPES every directive that
    follows it until the next prefix — in ``googlebot: noindex,
    nofollow`` BOTH directives are googlebot-only (the comma tokens
    inherit the last-seen agent, not just the token carrying the
    prefix). Directives before any prefix are global. With
    ``agent=None`` (default) only global directives apply; pass your
    crawler name to also honor its scoped directives. Value-carrying
    directives (``unavailable_after: 25 Jun 2010``, ``max-snippet:
    20``, ...) are recognized by name and never open an agent scope
    nor false-positive the blocked set.

    Appends ``{header_col}_blocked``; ``mode='filter'`` drops blocked
    rows (NULL headers are never blocked). Stateless pure-JVM token
    fold — one narrow projection."""

    def __init__(
        self,
        header_col: str,
        blocked: tuple[str, ...] = ("noindex", "none"),
        agent: str | None = None,
        mode: str = "flag",
    ):
        ensure(mode in ("flag", "filter"), "mode: 'flag' or 'filter'")
        ensure(bool(blocked), "at least one blocked directive is required")
        self.header_col = header_col
        self.blocked = tuple(d.lower() for d in blocked)
        self.agent = agent.lower() if agent else None
        self.mode = mode

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, [self.header_col])

    def blocked_expr(self) -> Column:
        # lambda, not bare F.trim — see blocked_expr note above
        toks = F.transform(
            F.split(
                F.lower(F.coalesce(F.col(self.header_col), F.lit(""))),
                ",",
            ),
            lambda x: F.trim(x),
        )
        blocked_lits = F.array(*[F.lit(d) for d in self.blocked])
        value_lits = F.array(
            *[F.lit(d) for d in X_ROBOTS_VALUE_DIRECTIVES]
        )
        # ONE aggregate fold carrying (scope, hit): a 'prefix:' token
        # whose prefix is not a value-carrying directive opens an
        # agent scope that every following comma token inherits until
        # the next prefix (the Google grammar — the previous
        # exists()-per-token parse treated 'nofollow' in
        # 'googlebot: noindex, nofollow' as global, over-blocking
        # generic crawlers).
        zero = F.struct(
            F.lit("").alias("scope"), F.lit(False).alias("hit")
        )

        def step(acc: Column, t: Column) -> Column:
            has = t.contains(":")
            head = F.trim(F.regexp_extract(t, "^([^:]*):", 1))
            tail = F.trim(F.regexp_extract(t, "^[^:]*:(.*)$", 1))
            is_agent = has & ~F.array_contains(value_lits, head)
            scope = F.when(is_agent, head).otherwise(acc["scope"])
            d0 = (
                F.when(is_agent, tail).when(has, head).otherwise(t)
            )
            # a scoped value directive ('googlebot: unavailable_after:
            # ...') matches on its NAME only
            directive = F.when(
                d0.contains(":"),
                F.trim(F.regexp_extract(d0, "^([^:]*):", 1)),
            ).otherwise(d0)
            if self.agent is None:
                applies = scope == F.lit("")
            else:
                applies = (scope == F.lit("")) | (
                    scope == F.lit(self.agent)
                )
            hit = acc["hit"] | (
                applies & F.array_contains(blocked_lits, directive)
            )
            return F.struct(scope.alias("scope"), hit.alias("hit"))

        return F.aggregate(toks, zero, step)["hit"]

    def _transform(self, df: DataFrame) -> DataFrame:
        out_col = f"{self.header_col}_blocked"
        out = df.withColumn(out_col, self.blocked_expr())
        if self.mode == "filter":
            return out.where(~F.col(out_col)).drop(out_col)
        return out


def robots_rules_expr(txt: Column, agent: str = "*") -> Column:
    """Parse a robots.txt body into the rule list applying to
    ``agent``: ``array<struct<allow boolean, prefix string>>`` under
    the RFC 9309 grammar subset — ``User-agent`` groups (consecutive
    UA lines share one group; a group applies when any of its agents
    is ``*`` or equals ``agent`` case-insensitively), ``Disallow`` /
    ``Allow`` rules from applying groups, ``#`` comments stripped,
    unknown fields (Sitemap, Crawl-delay) ignored without ending the
    group. An empty Disallow value means "no restriction" and is
    skipped. Rule prefixes are percent-normalized
    (:func:`pct_normalize_expr`, RFC 3986 §6.2.2: uppercase ``%XX``,
    decode unreserved octets only) so they compare consistently with
    the normalized probe paths in :func:`robots_blocked_expr`;
    reserved octets like ``%2F`` stay encoded, so ``/a%2Fb`` never
    conflates with ``/a/b``.

    One ``aggregate`` fold over the split lines — pure JVM, no UDF;
    robots bodies are KB-sized so the per-row fold is trivial."""
    lines = F.split(F.coalesce(txt, F.lit("")), "\r?\n")
    # strip comments + whitespace once, lowercase a copy for field tests
    cleaned = F.transform(
        lines, lambda ln: F.trim(F.regexp_replace(ln, "#.*$", ""))
    )
    agent_lc = agent.lower()
    zero = F.struct(
        F.lit(False).alias("applies"),
        F.lit(False).alias("last_ua"),
        F.array().cast(
            "array<struct<allow boolean, prefix string>>"
        ).alias("rules"),
    )

    def step(acc, ln):
        low = F.lower(ln)
        # value = everything after the FIRST colon (paths may contain
        # ':'); regexp_extract returns '' when there is no colon
        val = F.trim(F.regexp_extract(ln, "^[^:]*:(.*)$", 1))
        is_ua = low.startswith("user-agent:")
        ua_val = F.lower(val)
        ua_match = (ua_val == F.lit("*")) | (ua_val == F.lit(agent_lc))
        # consecutive UA lines OR into the group; a UA after rules
        # starts a fresh group
        applies_ua = F.when(
            acc["last_ua"], acc["applies"] | ua_match
        ).otherwise(ua_match)
        is_dis = low.startswith("disallow:")
        is_allow = low.startswith("allow:")
        add = (
            acc["applies"]
            & (is_dis | is_allow)
            & (F.length(val) > 0)
        )
        rules = F.when(
            add,
            F.concat(
                acc["rules"],
                F.array(
                    F.struct(
                        is_allow.alias("allow"), val.alias("prefix")
                    )
                ),
            ),
        ).otherwise(acc["rules"])
        return F.struct(
            F.when(is_ua, applies_ua)
            .otherwise(acc["applies"])
            .alias("applies"),
            is_ua.alias("last_ua"),
            rules.alias("rules"),
        )

    folded = F.aggregate(cleaned, zero, step)["rules"]
    return F.transform(
        folded,
        lambda r: F.struct(
            r["allow"].alias("allow"),
            pct_normalize_expr(r["prefix"]).alias("prefix"),
        ),
    )


def robots_sitemaps_expr(txt: Column) -> Column:
    """``Sitemap:`` URLs from a robots.txt body (array<string>, empty
    when none) — the crawl-discovery complement of the rule parser.
    Per RFC 9309 §2.3 sitemap lines are group-INDEPENDENT, so no UA
    tracking is needed: one filter + transform over the split lines,
    comments stripped, case-insensitive field name, values kept
    verbatim (sitemap URLs are absolute by spec)."""
    lines = F.split(F.coalesce(txt, F.lit("")), "\r?\n")
    cleaned = F.transform(
        lines, lambda ln: F.trim(F.regexp_replace(ln, "#.*$", ""))
    )
    hits = F.filter(
        cleaned,
        lambda ln: F.lower(ln).startswith("sitemap:"),
    )
    return F.filter(
        F.transform(
            hits,
            lambda ln: F.trim(F.regexp_extract(ln, "^[^:]*:(.*)$", 1)),
        ),
        lambda v: v != "",
    )


def robots_crawl_delay_expr(txt: Column, agent: str = "*") -> Column:
    """``Crawl-delay`` (seconds, double) for the groups applying to
    ``agent`` — the non-RFC extension Bing/Yandex honor; NULL when no
    applying group sets one. Multiple applying groups take the MINIMUM
    (the conservative reading). Same group-tracking fold as
    :func:`robots_rules_expr`; malformed values are ignored
    (``try_cast``)."""
    lines = F.split(F.coalesce(txt, F.lit("")), "\r?\n")
    cleaned = F.transform(
        lines, lambda ln: F.trim(F.regexp_replace(ln, "#.*$", ""))
    )
    agent_lc = agent.lower()
    zero = F.struct(
        F.lit(False).alias("applies"),
        F.lit(False).alias("last_ua"),
        F.lit(None).cast("double").alias("delay"),
    )

    def step(acc, ln):
        low = F.lower(ln)
        val = F.trim(F.regexp_extract(ln, "^[^:]*:(.*)$", 1))
        is_ua = low.startswith("user-agent:")
        ua_val = F.lower(val)
        ua_match = (ua_val == F.lit("*")) | (ua_val == F.lit(agent_lc))
        applies_ua = F.when(
            acc["last_ua"], acc["applies"] | ua_match
        ).otherwise(ua_match)
        is_delay = low.startswith("crawl-delay:")
        secs = val.try_cast("double")
        take = acc["applies"] & is_delay & secs.isNotNull() & (secs >= 0)
        delay = F.when(
            take, F.least(F.coalesce(acc["delay"], secs), secs)
        ).otherwise(acc["delay"])
        return F.struct(
            F.when(is_ua, applies_ua)
            .otherwise(acc["applies"])
            .alias("applies"),
            is_ua.alias("last_ua"),
            delay.alias("delay"),
        )

    return F.aggregate(cleaned, zero, step)["delay"]


def robots_blocked_expr(path: Column, rules: Column) -> Column:
    """RFC 9309 decision for a URL path against ``robots_rules_expr``
    output: the LONGEST matching rule wins; ties prefer Allow; no
    matching rule (or no rules at all) allows. ``*`` matches any run,
    a trailing ``$`` anchors the end (the de-facto wildcard grammar);
    regex metacharacters in prefixes are neutralized before the
    pattern is built. The probed path is percent-normalized
    (:func:`pct_normalize_expr`) to the same RFC 3986 §6.2.2 form the
    rule prefixes carry, so encoded/decoded spellings of unreserved
    characters and hex-case variants match; longest-match lengths
    compare in the normalized space on both sides. Pure JVM fold — no
    UDF."""
    p = pct_normalize_expr(F.coalesce(path, F.lit("/")))

    def pattern(prefix: Column) -> Column:
        esc = F.regexp_replace(
            prefix, r"([\\.\[\]\{\}\(\)\+\?\^\$\|])", r"\\$1"
        )
        starred = F.regexp_replace(esc, r"\*", ".*")
        # a literal '$' was escaped above; a TRAILING one was meant as
        # the end anchor — restore it
        return F.concat(
            F.lit("^"),
            # Java replacement strings treat $ as a group ref — escape
            F.regexp_replace(starred, r"\\\$$", "\\$"),
        )

    zero = F.struct(
        F.lit(-1).alias("best_len"), F.lit(False).alias("blocked")
    )

    def step(acc, r):
        hit = F.regexp_like(p, pattern(r["prefix"]))
        plen = F.length(r["prefix"])
        better = hit & (
            (plen > acc["best_len"])
            # tie prefers Allow (RFC 9309 §2.3.2)
            | ((plen == acc["best_len"]) & r["allow"] & acc["blocked"])
        )
        return F.struct(
            F.when(better, plen).otherwise(acc["best_len"]).alias(
                "best_len"
            ),
            F.when(better, ~r["allow"])
            .otherwise(acc["blocked"])
            .alias("blocked"),
        )

    return F.aggregate(
        F.coalesce(
            rules,
            F.array().cast("array<struct<allow boolean, prefix string>>"),
        ),
        zero,
        step,
    )["blocked"]


class RobotsTxtFilter(Transformer):
    """Site-level crawl opt-outs: drop (or flag) URLs a domain's
    robots.txt disallows for ``agent`` — the third leg of the opt-out
    triad (page-level :class:`MetaRobotsFilter`, header-level
    ``http_x_robots`` from ``read_warc``).

    ``robots_df`` holds one row per domain: ``(domain_col,
    robots_col)`` with the raw robots.txt body (crawls fetch these
    once per host). fit() parses every body ONCE into the rule-list
    frame (:func:`robots_rules_expr`) and holds it as DataFrame state;
    transform extracts each URL's host and path, joins the rule frame
    on the domain key (domain-count-sized — AQE broadcasts it), and
    applies the RFC 9309 longest-match decision
    (:func:`robots_blocked_expr`). URLs from domains with no
    robots.txt row are allowed.

    Appends ``{url_col}_robots_blocked``; ``mode='filter'`` drops
    blocked rows."""

    def __init__(
        self,
        url_col: str,
        domain_col: str = "domain",
        robots_col: str = "robots_txt",
        agent: str = "*",
        mode: str = "flag",
        with_crawl_delay: bool = False,
    ):
        ensure(mode in ("flag", "filter"), "mode: 'flag' or 'filter'")
        self.url_col = url_col
        self.domain_col = domain_col
        self.robots_col = robots_col
        self.agent = agent
        self.mode = mode
        # with_crawl_delay additionally appends {url_col}_crawl_delay
        # (seconds from the applying groups' Crawl-delay, NULL when
        # unset — the Bing/Yandex extension a POLITE recrawl scheduler
        # reads; it never affects the blocked decision)
        self.with_crawl_delay = with_crawl_delay
        self.rules_df_: DataFrame | None = None

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, [self.url_col])

    def fit_robots(self, robots_df: DataFrame) -> "RobotsTxtFilter":
        """Parse the (domain, robots.txt) frame into held rule state.

        Domains are deduplicated first (one body per lowercased
        domain, deterministic ``max`` of the bodies) — a real crawl
        easily carries redundant robots fetches for the same domain,
        and without the dedup the transform-side join would fan out
        and DUPLICATE every URL row of that domain in the output, a
        cardinality change beyond filtering (r11 ADVICE)."""
        from pyspark import StorageLevel

        validate_columns(robots_df, [self.domain_col, self.robots_col])
        if self.rules_df_ is not None:
            self.rules_df_.unpersist()
        one_body = (
            robots_df.groupBy(
                F.lower(F.col(self.domain_col)).alias("__ff_rb_domain")
            )
            .agg(F.max(self.robots_col).alias("__ff_rb_body"))
        )
        self.rules_df_ = (
            one_body.select(
                "__ff_rb_domain",
                robots_rules_expr(
                    F.col("__ff_rb_body"), self.agent
                ).alias("__ff_rb_rules"),
                robots_crawl_delay_expr(
                    F.col("__ff_rb_body"), self.agent
                ).alias("__ff_rb_delay"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._own_frame("rules_df_")
        self._fitted = True
        return self

    def _frame_state_attrs(self) -> list[str]:
        return ["rules_df_"]

    def _fit(self, df: DataFrame) -> None:
        # Pipeline.fit calls fit(step_input) on every step; an instance
        # already fitted from its robots frame treats that as a no-op
        # (the URL frame is NOT the fit input here)
        if self.rules_df_ is None:
            raise InvalidParameterError(
                "RobotsTxtFilter is fitted from the (domain, robots.txt) "
                "frame, not the URL frame: call fit_robots(robots_df)"
            )

    def _transform(self, df: DataFrame) -> DataFrame:
        from .text import _require_frame_state

        rules = _require_frame_state(
            self.rules_df_, "RobotsTxtFilter", "rules_df_"
        )
        host = F.lower(F.try_parse_url(F.col(self.url_col), F.lit("HOST")))
        path = F.coalesce(
            F.try_parse_url(F.col(self.url_col), F.lit("PATH")),
            F.lit("/"),
        )
        joined = df.withColumn("__ff_rb_host", host).join(
            rules, on=F.col("__ff_rb_host") == F.col("__ff_rb_domain"),
            how="left",
        )
        blocked = F.coalesce(
            robots_blocked_expr(path, F.col("__ff_rb_rules")),
            F.lit(False),
        )
        out_col = f"{self.url_col}_robots_blocked"
        out = joined.withColumn(out_col, blocked)
        if self.with_crawl_delay:
            ensure(
                "__ff_rb_delay" in joined.columns,
                "this rules state predates crawl-delay support: refit "
                "with fit_robots (save_state files from r10 and earlier "
                "carry no delay column)",
            )
            out = out.withColumn(
                f"{self.url_col}_crawl_delay", F.col("__ff_rb_delay")
            )
        drop = ["__ff_rb_host", "__ff_rb_domain", "__ff_rb_rules"]
        if "__ff_rb_delay" in out.columns:
            drop.append("__ff_rb_delay")
        out = out.drop(*drop)
        if self.mode == "filter":
            return out.where(~F.col(out_col)).drop(out_col)
        return out
