"""Image-text pair extraction — the LAION-style training-pair layer.

Multimodal corpora get curated so that (image, text) PAIRS can be
trained on: the text lives in the page markup (``alt`` attributes,
``<figcaption>`` blocks, surrounding prose) and the pixels live in a
separately crawled image-bytes frame keyed by URL. Everything below
that layer already exists in this package (HtmlTextExtractor /
MainContentExtractor for page text, ImageHasher/ImageDeduplicator/
ImageQualityFilter for the pixels); this module adds the two missing
pieces:

- :class:`ImageTextPairExtractor` — harvest one row per ``<img>`` tag
  from raw HTML (src/alt/title attributes, the nearest following
  ``<figcaption>``, and a surrounding visible-text context window),
  resolving relative ``src`` values against the page URL.
- :func:`join_image_text_pairs` — join the harvested candidates
  against a crawled image-bytes frame by canonical URL and optionally
  gate with :class:`~.imagecodec.ImageQualityFilter`.

The reference (habedi/feature-factory) has no web or multimodal
surface at all (SURVEY.md §2.3); the public lineage here is the
LAION-400M/5B harvesting recipe (Schuhmann et al. 2021/2022: pairs =
``<img>`` src + alt-text from Common Crawl pages, then CLIP/quality
gating) re-expressed as pure-JVM Spark expressions.

Scale shape: harvesting is ONE narrow projection per page (regexp tag
scan + array HOFs + one explode) — no shuffle, no UDF, no collect, so
10x pages is 10x task work with zero plan change. The pair join is a
single equi-join on canonical URL (AQE picks broadcast when the image
batch is small); the quality gate is the Arrow decode seam plus a
JVM keep expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..pipeline import Transformer
from ..validation import ensure, validate_columns, validate_string_columns
from .web import canonical_url_expr

# one <img ...> tag, case-insensitive, attributes included. The same
# pattern drives both the tag harvest (regexp_extract_all) and the
# page segmentation (split), so tag i always sits between segments i
# and i+1. No lookaround / backreferences: Java regex and RE2 (the
# DuckDB oracle) read it identically.
IMG_TAG_RE = r"(?is)<img\b[^>]*>"


def html_attr_expr(tag: Column, name: str) -> Column:
    """Value of attribute ``name`` inside one raw tag string — tries
    double-quoted, single-quoted, then bare (unquoted) forms; NULL when
    the attribute is absent or empty. No backreferences (RE2-portable:
    the oracle recomputes this with the identical three patterns)."""
    dq = F.regexp_extract(tag, rf'(?is)\b{name}\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract(tag, rf"(?is)\b{name}\s*=\s*'([^']*)'", 1)
    bare = F.regexp_extract(tag, rf"""(?is)\b{name}\s*=\s*([^\s"'>]+)""", 1)
    return F.nullif(
        F.coalesce(
            F.nullif(dq, F.lit("")), F.nullif(sq, F.lit("")), bare
        ),
        F.lit(""),
    )


def inline_text_expr(fragment: Column) -> Column:
    """Visible single-line text of an HTML fragment that may be CUT at
    either end (a context window): drops a trailing half-open tag and
    a leading tag remnant, strips whole tags, decodes the six
    ubiquitous entities (``&amp;`` last — the HtmlTextExtractor
    single-pass rule), collapses all whitespace to single spaces."""
    x = F.regexp_replace(fragment, r"(?is)<script\b[^>]*>.*?</script[^>]*>", " ")
    x = F.regexp_replace(x, r"(?is)<style\b[^>]*>.*?</style[^>]*>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, r"<[^>]*$", " ")   # cut-open trailing tag
    x = F.regexp_replace(x, r"^[^<>]*>", " ")  # cut-open leading tag
    x = F.regexp_replace(x, r"<[^>]*>", " ")
    for ent, rep in [
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
    ]:
        x = F.replace(x, F.lit(ent), F.lit(rep))
    x = F.regexp_replace(x, r"[ \t\r\n\f]+", " ")
    return F.trim(x)


def resolve_url_expr(base: Column, rel: Column) -> Column:
    """Resolve a (possibly relative) reference against a base URL —
    the RFC 3986 §5 cases a crawler actually meets, as pure JVM
    expressions (try_parse_url + regexps + one array-aggregate
    dot-segment pass):

    - absolute (``scheme:...``) — returned as-is (covers ``data:``)
    - scheme-relative ``//host/...`` — base scheme prepended
    - root-relative ``/...`` — base origin prepended
    - query-only ``?...`` — base origin + base path + ref
    - fragment-only ``#...`` — NULL (names no fetchable resource)
    - relative path — joined to the base path's directory, then
      ``.``/``..`` dot-segments removed exactly (one
      ``F.aggregate`` stack pass over the split path, ``..`` clamped
      at the root like browsers do)

    NULL when the ref is NULL/empty or the base has no parseable
    scheme+host. The base's authority (host:port) is kept verbatim."""
    proto = F.lower(F.try_parse_url(base, F.lit("PROTOCOL")))
    auth = F.try_parse_url(base, F.lit("AUTHORITY"))
    origin = F.concat(proto, F.lit("://"), auth)
    bpath = F.coalesce(F.try_parse_url(base, F.lit("PATH")), F.lit(""))
    bdir = F.regexp_replace(bpath, r"/[^/]*$", "")
    joined = F.concat(
        F.when(bdir == "", F.lit("")).otherwise(bdir), F.lit("/"), rel
    )
    # exact dot-segment removal: fold the split path through an array
    # stack — '.' drops, '..' pops (clamped at the root marker), any
    # other segment pushes. One pass at any nesting depth, stays in
    # whole-stage codegen.
    stack = F.aggregate(
        F.split(joined, "/"),
        F.array(F.lit("")).cast("array<string>"),
        lambda acc, s: (
            F.when(s == F.lit("."), acc)
            .when(
                s == F.lit(".."),
                F.when(F.size(acc) <= 1, acc).otherwise(
                    F.slice(acc, 1, F.size(acc) - 1)
                ),
            )
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    # the initial [''] root marker doubles with joined's own leading
    # empty segment; fold the pair back to a single root
    norm_path = F.regexp_replace(F.array_join(stack, "/"), r"^//", "/")
    resolved = (
        F.when(rel.rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:"), rel)
        .when(rel.startswith("//"), F.concat(proto, F.lit(":"), rel))
        .when(rel.startswith("/"), F.concat(origin, rel))
        .when(rel.startswith("?"), F.concat(origin, bpath, rel))
        .when(rel.startswith("#"), F.lit(None).cast("string"))
        .otherwise(F.concat(origin, norm_path))
    )
    return F.when(
        rel.isNotNull() & (rel != "") & proto.isNotNull()
        & auth.isNotNull(),
        resolved,
    )


class ImageTextPairExtractor(Transformer):
    """Harvest (image URL, paired text) candidates from raw HTML — one
    output row per ``<img>`` tag, in document order.

    Appended columns (page columns are kept; pages without any
    ``<img>`` produce no rows):

    - ``img_pos``      0-based index of the tag within the page
    - ``img_src``      raw ``src`` attribute (NULL when absent/empty)
    - ``img_url``      ``src`` resolved against ``url_col``
      (:func:`resolve_url_expr`) and, with ``canonicalize``,
      canonicalized (:func:`~.web.canonical_url_expr`) — the join key
      against a crawled image frame. Without ``url_col`` the raw src
      is used verbatim (already-absolute corpora).
    - ``img_alt``      ``alt`` attribute text (entity-decoded,
      whitespace-collapsed; NULL when absent/empty)
    - ``img_title``    ``title`` attribute, same treatment
    - ``img_caption``  visible text of the first ``<figcaption>``
      within ``caption_window`` raw chars AFTER the tag (the
      figure-caption association without a DOM; NULL when none)
    - ``img_context``  visible text of the ``context_chars`` raw chars
      around the tag (before + after, tag remnants stripped) — the
      prose window LAION-style harvesting falls back to
    - ``pair_text``    first non-NULL of alt, caption, title — the
      training-text convention (alt is the author's image description;
      captions beat incidental titles)

    ``require_src`` (default True) drops tags with no usable ``src``.

    Scale shape: ONE narrow projection — a regexp tag scan, a split on
    the same pattern (tag i sits between segments i and i+1 by
    construction), per-tag struct building in an array ``transform``,
    and one ``posexplode``. No shuffle, no UDF, no collect; every rule
    is plain-SQL expressible, so the correctness oracle recomputes the
    harvest end to end."""

    def __init__(
        self,
        html_col: str,
        url_col: str | None = None,
        context_chars: int = 240,
        caption_window: int = 2000,
        canonicalize: bool = True,
        require_src: bool = True,
    ):
        ensure(context_chars >= 0, "context_chars must be >= 0")
        ensure(caption_window >= 0, "caption_window must be >= 0")
        self.html_col = html_col
        self.url_col = url_col
        self.context_chars = context_chars
        self.caption_window = caption_window
        self.canonicalize = canonicalize
        self.require_src = require_src

    def _check_input(self, df: DataFrame) -> None:
        cols = [self.html_col]
        if self.url_col is not None:
            cols.append(self.url_col)
        validate_string_columns(df, cols)

    def _transform(self, df: DataFrame) -> DataFrame:
        html = F.col(self.html_col)
        tags = F.regexp_extract_all(html, F.lit(IMG_TAG_RE), 0)
        segs = F.split(html, IMG_TAG_RE)
        w = self.context_chars

        def member(tag: Column, i: Column) -> Column:
            before = F.element_at(segs, i + 1)
            after = F.element_at(segs, i + 2)
            src = html_attr_expr(tag, "src")
            cap_raw = F.regexp_extract(
                F.substring(after, 1, self.caption_window),
                r"(?is)<figcaption[^>]*>(.*?)</figcaption", 1,
            )
            ctx_before = F.substr(
                before,
                F.greatest(F.length(before) - F.lit(w - 1), F.lit(1)),
            ) if w else F.lit("")
            ctx_after = F.substring(after, 1, w) if w else F.lit("")
            return F.struct(
                src.alias("img_src"),
                F.nullif(inline_text_expr(F.coalesce(
                    html_attr_expr(tag, "alt"), F.lit("")
                )), F.lit("")).alias("img_alt"),
                F.nullif(inline_text_expr(F.coalesce(
                    html_attr_expr(tag, "title"), F.lit("")
                )), F.lit("")).alias("img_title"),
                F.nullif(
                    inline_text_expr(cap_raw), F.lit("")
                ).alias("img_caption"),
                F.nullif(
                    F.trim(F.concat_ws(
                        " ",
                        inline_text_expr(ctx_before),
                        inline_text_expr(ctx_after),
                    )),
                    F.lit(""),
                ).alias("img_context"),
            )

        exploded = df.select(
            "*", F.posexplode(F.transform(tags, member)).alias("img_pos", "__p")
        )
        if self.url_col is not None:
            resolved = resolve_url_expr(
                F.col(self.url_col), F.col("__p.img_src")
            )
        else:
            resolved = F.col("__p.img_src")
        if self.canonicalize:
            resolved = canonical_url_expr(resolved)
        out = exploded.select(
            *df.columns,
            "img_pos",
            F.col("__p.img_src").alias("img_src"),
            resolved.alias("img_url"),
            F.col("__p.img_alt").alias("img_alt"),
            F.col("__p.img_title").alias("img_title"),
            F.col("__p.img_caption").alias("img_caption"),
            F.col("__p.img_context").alias("img_context"),
            F.coalesce(
                F.col("__p.img_alt"),
                F.col("__p.img_caption"),
                F.col("__p.img_title"),
            ).alias("pair_text"),
        )
        if self.require_src:
            out = out.where(F.col("img_src").isNotNull())
        return out


class ImageTextPairScorer(Transformer):
    """Pair-grain similarity gate — the decisive LAION filter
    (Schuhmann et al. 2021: keep pairs with CLIP image-text cosine
    >= 0.28) expressed over user-supplied embedding columns, closing
    the harvest -> join -> quality -> SIMILARITY -> dedup curation
    loop. The embeddings come from any encoder the user ran upstream
    (the model inference itself is out of scope for a SQL engine —
    this package's convention for external-model columns); given
    them, the gate is one pure-JVM cosine expression + threshold.

    Appends ``{out_col}`` (the pair cosine, NULL for degenerate /
    NULL / length-mismatched vectors — see
    :func:`~.functions.expressions.cosine_expr`) and, in
    ``mode='flag'``, ``{out_col}_keep``; ``mode='filter'`` drops
    below-threshold pairs. NULL cosines never pass the gate — an
    unscorable pair is not a trainable pair.

    Scale shape: ONE narrow projection, no shuffle/UDF/collect; the
    fold-based cosine keeps results bit-comparable with the DuckDB
    oracle twin."""

    def __init__(
        self,
        image_emb_col: str,
        text_emb_col: str,
        threshold: float = 0.28,
        mode: str = "flag",
        out_col: str = "pair_cosine",
    ):
        ensure(mode in ("flag", "filter"), "mode: 'flag' or 'filter'")
        ensure(-1.0 <= threshold <= 1.0,
               "threshold must be a cosine in [-1, 1]")
        self.image_emb_col = image_emb_col
        self.text_emb_col = text_emb_col
        self.threshold = float(threshold)
        self.mode = mode
        self.out_col = out_col

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.image_emb_col, self.text_emb_col])

    def cosine(self) -> Column:
        from ..functions.expressions import cosine_expr

        return cosine_expr(
            F.col(self.image_emb_col), F.col(self.text_emb_col)
        )

    def keep_expr(self) -> Column:
        return F.coalesce(
            F.col(self.out_col) >= F.lit(self.threshold), F.lit(False)
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df.withColumn(self.out_col, self.cosine())
        if self.mode == "filter":
            return out.where(self.keep_expr())
        return out.withColumn(f"{self.out_col}_keep", self.keep_expr())


def join_image_text_pairs(
    pairs: DataFrame,
    images: DataFrame,
    url_col: str,
    bytes_col: str,
    pair_url_col: str = "img_url",
    canonicalize: bool = True,
    quality=None,
    how: str = "inner",
) -> DataFrame:
    """Join harvested pair candidates against a crawled image-bytes
    frame by canonical URL — the step that turns (page, alt-text)
    candidates into trainable (image, text) pairs.

    ``images`` rows are first deduplicated per canonical URL (the same
    URL is fetched many times in a crawl): the survivor is the
    deterministic md5-minimal payload, ONE map-side-combinable
    ``min_by`` aggregate. The join is a single equi-join on the
    canonical URL (AQE picks a broadcast when the image batch is
    small — a recrawl increment usually is). With ``quality`` (an
    :class:`~.imagecodec.ImageQualityFilter` instance) the joined
    frame is gated and only ``keep`` rows survive, decode features
    retained.

    ``how='left'`` keeps text-only candidates (NULL bytes) for
    harvest-recall audits; the default inner join is the training
    path."""
    ensure(how in ("inner", "left"), "how: 'inner' or 'left'")
    validate_columns(pairs, [pair_url_col])
    validate_columns(images, [url_col, bytes_col])
    key = (
        canonical_url_expr(F.col(url_col))
        if canonicalize
        else F.col(url_col)
    )
    img = (
        images.select(key.alias("__ff_iurl"), F.col(bytes_col))
        .where(F.col("__ff_iurl").isNotNull())
        .groupBy("__ff_iurl")
        .agg(F.min_by(bytes_col, F.md5(F.col(bytes_col))).alias(bytes_col))
    )
    out = pairs.join(
        img, pairs[pair_url_col] == img["__ff_iurl"], how
    ).drop("__ff_iurl")
    if quality is not None:
        out = quality.transform(out)
        out = out.where(F.col(f"{quality.column}_keep"))
    return out
