"""WordPiece (BERT-family) published-tokenizer application.

The third published tokenizer family after BPE (:mod:`.bpe`) and
Unigram (:mod:`.unigram`): BERT / DistilBERT / ELECTRA / MiniLM ship a
``tokenizer.json`` with ``model.type == "WordPiece"`` — a greedy
longest-match-first subword model over a ``##``-continuation
vocabulary, behind the BertNormalizer + BertPreTokenizer text
treatment. ``BpeVocabBuilder.load_tokenizer_json`` deliberately
rejects these (a ``continuing_subword_prefix`` is not reproducible by
an end-of-word-suffix engine); this operator APPLIES them at corpus
scale instead. There is no trainer here on purpose: WordPiece training
is BPE-style pair induction with a likelihood objective, and the use
case this engine serves — "tokenize the curated corpus with the actual
model tokenizer" — always starts from a PUBLISHED file.

Semantics reproduced exactly (the public HF ``tokenizers`` behavior,
pinned by the offline-skippable parity test):

- **BertNormalizer**: ``clean_text`` (drop NUL/U+FFFD/control chars,
  fold every whitespace to ' '), ``handle_chinese_chars`` (space-pad
  CJK ideographs), ``strip_accents`` (NFD then drop combining marks;
  defaults to the ``lowercase`` flag when null), ``lowercase``.
- **BertPreTokenizer**: whitespace split, then every punctuation
  code point (Unicode P* plus the ASCII symbol ranges BERT treats as
  punctuation) isolated as its own word.
- **WordPiece**: per word — longer than ``max_input_chars_per_word``
  maps to ``unk_token``; otherwise greedy longest-match from the left,
  continuation pieces carrying the ``##`` prefix; any unmatched
  position collapses the WHOLE word to ``unk_token``.
- **added_tokens**: HF AddedToken isolation by default (the r13 BPE
  law — specials split out of raw text before normalization).
- **post_processor**: BertProcessing / TemplateProcessing via the
  shared parser — ``encode(add_special_tokens=True)`` wraps with
  [CLS]/[SEP]; the default contract stays the raw sequence.
- **decoder**: WordPiece (join on spaces, strip the continuation
  prefix, the fixed HF ``cleanup`` rule set).

Scale shape (the BpeVocabBuilder apply-mode plan): normalization +
pre-tokenization run in ONE Arrow-batched words UDF (the documented
Python seam — accent stripping needs NFD, which the JVM cannot
express); the greedy match runs once per DISTINCT word in a
``mapInPandas`` with the model-sized vocab set riding the closure; the
corpus-sized plan is a broadcast word-table join + per-doc ordered
reassembly — identical to the BPE/Unigram encode family. No
driver-side data, no per-row Python on the corpus grain.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..exceptions import InvalidParameterError
from ..functions.expressions import string_array_literal
from ..functions.frames import local_frame
from ..pipeline import Transformer
from ..validation import (
    ensure,
    validate_columns,
    validate_string_columns,
)


def bert_normalize(
    text: str,
    clean_text: bool = True,
    handle_chinese_chars: bool = True,
    strip_accents: bool | None = None,
    lowercase: bool = True,
) -> str:
    """Driver/executor-side BertNormalizer twin (public semantics)."""
    import unicodedata

    if clean_text:
        out = []
        for ch in text:
            if ch in ("\x00", "�"):
                continue
            if ch in ("\t", "\n", "\r"):
                out.append(" ")
                continue
            cat = unicodedata.category(ch)
            if cat in ("Cc", "Cf"):
                continue
            out.append(" " if cat == "Zs" or ch == " " else ch)
        text = "".join(out)
    if handle_chinese_chars:
        out = []
        for ch in text:
            cp = ord(ch)
            if (
                0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
                or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
                or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
                or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
            ):
                out.append(f" {ch} ")
            else:
                out.append(ch)
        text = "".join(out)
    do_strip = lowercase if strip_accents is None else strip_accents
    if do_strip:
        text = "".join(
            ch
            for ch in unicodedata.normalize("NFD", text)
            if unicodedata.category(ch) != "Mn"
        )
    if lowercase:
        text = text.lower()
    return text


def _is_punct(ch: str) -> bool:
    import unicodedata

    cp = ord(ch)
    # the BERT rule: ASCII symbol ranges count as punctuation even
    # when Unicode classes them S* (e.g. '$', '`', '^')
    if (33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96
            or 123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def bert_pre_tokenize(text: str) -> list[str]:
    """Whitespace split + punctuation isolation (BertPreTokenizer)."""
    words: list[str] = []
    for chunk in text.split():
        cur = ""
        for ch in chunk:
            if _is_punct(ch):
                if cur:
                    words.append(cur)
                    cur = ""
                words.append(ch)
            else:
                cur += ch
        if cur:
            words.append(cur)
    return words


def wordpiece_word(
    word: str,
    vocab: frozenset | set,
    unk: str,
    prefix: str = "##",
    max_chars: int = 100,
) -> list[str]:
    """Greedy longest-match-first (the public WordPiece algorithm)."""
    if len(word) > max_chars:
        return [unk]
    pieces: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = prefix + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk]
        pieces.append(cur)
        start = end
    return pieces


# Per-task word-cache bound for the doc-grain encodes: the replaced
# word-table plan deduplicated words globally, so an unbounded per-task
# dict could hold every distinct word of a pathological partition
# (IDs/hashes in text). Past this many entries the cache resets —
# correctness is unaffected (it is a pure memo).
_WORD_CACHE_CAP = 1 << 18


# HF decoders::wordpiece cleanup — the fixed rule set
_CLEANUP = [
    (" .", "."), (" ?", "?"), (" !", "!"), (" ,", ","),
    (" ' ", "'"), (" n't", "n't"), (" 'm", "'m"), (" 's", "'s"),
    (" 've", "'ve"), (" 're", "'re"),
]


def _arrow_exact(dt) -> bool:
    """True when a column of this type round-trips the Arrow boundary
    exactly (mapInArrow never converts to pandas dtypes, so atomic and
    nested-atomic types are bit-exact both ways). Gates the
    pass-through encode: frames carrying anything else (decimals,
    UDTs, maps) keep the join-back plan."""
    from pyspark.sql import types as T

    if isinstance(dt, (
        T.StringType, T.BooleanType, T.BinaryType, T.ByteType,
        T.ShortType, T.IntegerType, T.LongType, T.FloatType,
        T.DoubleType, T.DateType, T.TimestampType, T.TimestampNTZType,
    )):
        return True
    if isinstance(dt, T.ArrayType):
        return _arrow_exact(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_arrow_exact(f.dataType) for f in dt.fields)
    return False


def _pre_tokenize_with_specials(s, pat, clean, cjk, strip_acc, lower):
    """Special isolation + BertNormalizer + BertPreTokenizer for ONE
    text value — the single definition both the words UDF and the
    doc-grain Arrow pass run, so the two plans cannot diverge."""
    if s is None or s == "":
        return []
    if pat is None:
        segs = [(False, s)]
    else:
        segs, pos = [], 0
        for m in pat.finditer(s):
            if m.start() > pos:
                segs.append((False, s[pos:m.start()]))
            segs.append((True, m.group(0)))
            pos = m.end()
        if pos < len(s):
            segs.append((False, s[pos:]))
    out = []
    for is_sp, seg in segs:
        if is_sp:
            out.append(seg)
            continue
        out.extend(
            bert_pre_tokenize(
                bert_normalize(seg, clean, cjk, strip_acc, lower)
            )
        )
    return out


class WordPieceTokenizer(Transformer):
    """Apply a published WordPiece ``tokenizer.json`` (or a BERT
    ``vocab.txt``) at corpus scale — see module docstring. Load-only:
    :meth:`load_tokenizer_json` / :meth:`load_vocab_txt` (calling
    ``fit`` raises). ``transform`` appends
    ``{text_col}_wordpiece_token_count``; ``encode`` /
    ``encode_ids`` / ``decode_ids`` mirror the BPE surface."""

    def __init__(
        self,
        text_col: str,
        id_col: str,
        max_unseen_words: int | None = None,
    ):
        ensure(
            max_unseen_words is None or max_unseen_words >= 0,
            "max_unseen_words must be None or >= 0",
        )
        self.text_col = text_col
        self.id_col = id_col
        self.max_unseen_words = max_unseen_words
        self.vocab_json_: dict[str, int] | None = None
        self.unk_token_: str = "[UNK]"
        self.prefix_: str = "##"
        self.max_chars_: int = 100
        self._clean_text = True
        self._handle_chinese = True
        self._strip_accents: bool | None = None
        self._lowercase = True
        self._special_tokens: list[str] = []
        self._tmpl: tuple | list | None = ([], [], {})
        self._trunc: dict | None = None
        self._loaded_doc: dict | None = None

    def is_stateful(self) -> bool:
        return True

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.id_col])
        validate_string_columns(df, [self.text_col])

    def _fit(self, df: DataFrame) -> None:
        # Pipeline.fit calls fit(step_input); a loaded instance treats
        # that as a no-op (the ArpaLogProbScorer contract)
        if self.vocab_json_ is None:
            raise InvalidParameterError(
                "WordPieceTokenizer applies a PUBLISHED model — load "
                "one with load_tokenizer_json(path, spark) or "
                "load_vocab_txt(path, spark); this engine does not "
                "train WordPiece (use BpeVocabBuilder/"
                "UnigramVocabBuilder to train)"
            )

    # -- loaders ---------------------------------------------------------

    def load_tokenizer_json(
        self, path: str, spark, split_specials: bool = True
    ) -> "WordPieceTokenizer":
        """Load a HF ``tokenizer.json`` WordPiece model (BERT family).
        Accepted sections: BertNormalizer (or None/Lowercase),
        BertPreTokenizer (or Whitespace — both whitespace+punct for
        BERT vocabularies), WordPiece model, Bert/Template
        post_processors (via the shared parser), added_tokens with the
        r13 isolation law. Anything else rejects loudly."""
        from ..functions.charsmap import parse_post_processor

        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
        model = doc.get("model") or {}
        ensure(
            model.get("type") == "WordPiece",
            f"tokenizer.json at '{path}' has model.type="
            f"{model.get('type')!r}; this loader reads WordPiece "
            "models (BPE/Unigram have their own loaders)",
        )
        vocab = model.get("vocab") or {}
        ensure(bool(vocab), f"tokenizer.json at '{path}' has no vocab")
        norm = doc.get("normalizer")
        if norm is None:
            self._clean_text = False
            self._handle_chinese = False
            self._strip_accents = False
            self._lowercase = False
        elif norm == {"type": "Lowercase"}:
            self._clean_text = False
            self._handle_chinese = False
            self._strip_accents = False
            self._lowercase = True
        elif isinstance(norm, dict) and norm.get("type") == "BertNormalizer":
            self._clean_text = bool(norm.get("clean_text", True))
            self._handle_chinese = bool(
                norm.get("handle_chinese_chars", True)
            )
            sa = norm.get("strip_accents")
            self._strip_accents = None if sa is None else bool(sa)
            self._lowercase = bool(norm.get("lowercase", True))
        else:
            raise InvalidParameterError(
                f"unsupported normalizer {norm!r} in '{path}': this "
                "engine reproduces BertNormalizer, Lowercase, or None "
                "for WordPiece files"
            )
        pre = doc.get("pre_tokenizer") or {}
        ensure(
            pre.get("type") in ("BertPreTokenizer", "Whitespace"),
            f"unsupported pre_tokenizer {pre!r} in '{path}': "
            "WordPiece files are reproduced with BertPreTokenizer "
            "(or Whitespace) only",
        )
        unk = model.get("unk_token")
        ensure(
            isinstance(unk, str) and unk in vocab,
            f"tokenizer.json at '{path}' has no unk_token in its "
            "vocab — WordPiece needs one (unmatched words collapse "
            "to it)",
        )
        self.vocab_json_ = {str(t): int(i) for t, i in vocab.items()}
        self.unk_token_ = unk
        self.prefix_ = str(
            model.get("continuing_subword_prefix") or "##"
        )
        self.max_chars_ = int(
            model.get("max_input_chars_per_word") or 100
        )
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
                    f"{'/'.join(flags)}: plain-literal matching only "
                    "(load with split_specials=False to skip "
                    "isolation)",
                )
                specials.append(str(tok))
        self._special_tokens = sorted(
            set(specials), key=lambda t: (-len(t), t)
        )
        self._tmpl = parse_post_processor(doc.get("post_processor"))
        from ..functions.charsmap import parse_truncation

        self._trunc = parse_truncation(doc.get("truncation"), path)
        self._loaded_doc = doc
        self._fitted = True
        return self

    def load_vocab_txt(
        self, path: str, spark, lowercase: bool = True
    ) -> "WordPieceTokenizer":
        """Load the classic BERT ``vocab.txt`` interchange (one token
        per line, line number == id) with the standard uncased/cased
        BertNormalizer defaults; [CLS]/[SEP]/[PAD]/[MASK]/[UNK]
        isolate as specials."""
        vocab: dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                tok = line.rstrip("\n")
                if tok:
                    vocab.setdefault(tok, i)
        ensure(bool(vocab), f"'{path}' contains no tokens")
        ensure(
            "[UNK]" in vocab,
            f"'{path}' has no [UNK] token — WordPiece needs one",
        )
        self.vocab_json_ = vocab
        self.unk_token_ = "[UNK]"
        self._lowercase = lowercase
        self._strip_accents = None
        self._clean_text = True
        self._handle_chinese = True
        self._special_tokens = sorted(
            {t for t in ("[CLS]", "[SEP]", "[PAD]", "[MASK]", "[UNK]")
             if t in vocab},
            key=lambda t: (-len(t), t),
        )
        cls_sep = [t for t in ("[CLS]", "[SEP]") if t in vocab]
        self._tmpl = (
            (["[CLS]"], ["[SEP]"], {})
            if len(cls_sep) == 2
            else ([], [], {})
        )
        self._loaded_doc = None
        self._fitted = True
        return self

    def export_tokenizer_json(self, path: str) -> None:
        """Re-emit the imported tokenizer.json verbatim (the loaded
        document IS the model — re-deriving could drop fields)."""
        import os

        ensure(
            self._loaded_doc is not None,
            "export_tokenizer_json re-emits an imported tokenizer.json "
            "verbatim; this instance was loaded from vocab.txt",
        )
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self._loaded_doc, f, ensure_ascii=False, indent=2)

    # -- plan ------------------------------------------------------------

    def _require_model(self) -> dict[str, int]:
        if self.vocab_json_ is None:
            raise InvalidParameterError(
                "WordPieceTokenizer is not loaded: call "
                "load_tokenizer_json() or load_vocab_txt() first"
            )
        return self.vocab_json_

    def _words_udf(self):
        """text -> array<string> of pre-tokenized words: special
        isolation, BertNormalizer, BertPreTokenizer — one Arrow
        batch pass (accent stripping needs NFD; no JVM expression)."""
        import re as _re

        from pyspark.sql.functions import pandas_udf

        specials = list(self._special_tokens)
        spat = (
            _re.compile("|".join(_re.escape(t) for t in specials))
            if specials
            else None
        )
        clean, cjk = self._clean_text, self._handle_chinese
        strip_acc, lower = self._strip_accents, self._lowercase

        @pandas_udf("array<string>")
        def words(col):
            return col.map(
                lambda s: _pre_tokenize_with_specials(
                    s, spat, clean, cjk, strip_acc, lower
                )
            )

        return words

    def _word_expr(self) -> Column:
        return self._words_udf()(F.col(self.text_col))

    def _doc_token_table(self, df: DataFrame, mode: str) -> DataFrame:
        """``(__ff_id, __ff_tokens | __ff_total)`` at the DOC grain in
        ONE Arrow pass: special isolation + BertNormalizer +
        BertPreTokenizer + the greedy match, with a per-task word cache
        amortizing repeated words and the model riding the closure
        (guide §4.5 heavyweight-init shape). ZERO corpus shuffles —
        replaces the explode → distinct → tokenize → join → ordered
        reassembly plan (3 exchanges of the exploded corpus) whenever
        no ``max_unseen_words`` guard is requested; the guard needs the
        global distinct-word frame, so guarded encodes keep the
        word-table plan. NULL-id rows are dropped here because the
        caller's join-back on id equality can never match them — the
        word-table plan leaves those rows NULL the same way."""
        import re as _re

        idmap = self._require_model()
        vocab = frozenset(idmap)
        unk, prefix = self.unk_token_, self.prefix_
        max_chars = self.max_chars_
        special = frozenset(self._special_tokens)
        spat_src = (
            "|".join(_re.escape(t) for t in self._special_tokens)
            if self._special_tokens
            else None
        )
        clean, cjk = self._clean_text, self._handle_chinese
        strip_acc, lower = self._strip_accents, self._lowercase
        id_col, text_col = self.id_col, self.text_col
        want = mode

        def batches(it):
            import re as _re2

            import pandas as pd

            pat = _re2.compile(spat_src) if spat_src else None
            cache: dict = {}

            def tok(w):
                s = cache.get(w)
                if s is None:
                    s = (
                        [w]
                        if w in special
                        else wordpiece_word(w, vocab, unk, prefix, max_chars)
                    )
                    if len(cache) >= _WORD_CACHE_CAP:
                        cache.clear()
                    cache[w] = s
                return s

            for pdf in it:
                seqs = []
                for s in pdf[text_col]:
                    pieces: list[str] = []
                    for w in _pre_tokenize_with_specials(
                        s, pat, clean, cjk, strip_acc, lower
                    ):
                        pieces.extend(tok(w))
                    seqs.append(pieces)
                cols = {"__ff_id": pdf[id_col]}
                if want == "count":
                    cols["__ff_total"] = [len(x) for x in seqs]
                elif want == "ids":
                    cols["__ff_tokens"] = [
                        [idmap.get(p, -1) for p in x] for x in seqs
                    ]
                else:
                    cols["__ff_tokens"] = seqs
                yield pd.DataFrame(cols)

        id_type = df.schema[id_col].dataType.simpleString()
        if want == "count":
            schema = f"__ff_id {id_type}, __ff_total bigint"
        else:
            elem = "int" if want == "ids" else "string"
            schema = f"__ff_id {id_type}, __ff_tokens array<{elem}>"
        return (
            df.select(F.col(id_col), F.col(text_col))
            .where(F.col(id_col).isNotNull())
            .mapInPandas(batches, schema)
        )

    def _doc_token_passthrough(
        self, df: DataFrame, mode: str, out_name: str
    ) -> DataFrame:
        """``df``'s columns plus ``out_name`` computed in the SAME
        Arrow pass — the join-back-free twin of
        :meth:`_doc_token_table`. The guard-free doc-grain encode used
        to join its (id, tokens) table back onto the input, an id-grain
        exchange pair that at corpus scale shuffles the corpus twice
        for a column computable in place (guide §8: move big rows
        once). ``mapInArrow`` (not pandas) so carried columns never
        round-trip pandas dtypes — int64-with-nulls stays int64.
        NULL-id rows yield a NULL output column, exactly what the
        join-back's unmatched left rows produced."""
        import re as _re

        idmap = self._require_model()
        vocab = frozenset(idmap)
        unk, prefix = self.unk_token_, self.prefix_
        max_chars = self.max_chars_
        special = frozenset(self._special_tokens)
        spat_src = (
            "|".join(_re.escape(t) for t in self._special_tokens)
            if self._special_tokens
            else None
        )
        clean, cjk = self._clean_text, self._handle_chinese
        strip_acc, lower = self._strip_accents, self._lowercase
        id_col, text_col = self.id_col, self.text_col
        want = mode
        id_idx = df.columns.index(id_col)
        text_idx = df.columns.index(text_col)

        def batches(it):
            import re as _re2

            import pyarrow as pa

            pat = _re2.compile(spat_src) if spat_src else None
            cache: dict = {}

            def tok(w):
                s = cache.get(w)
                if s is None:
                    s = (
                        [w]
                        if w in special
                        else wordpiece_word(w, vocab, unk, prefix, max_chars)
                    )
                    if len(cache) >= _WORD_CACHE_CAP:
                        cache.clear()
                    cache[w] = s
                return s

            if want == "count":
                out_type = pa.int64()
            elif want == "ids":
                out_type = pa.list_(pa.int32())
            else:
                out_type = pa.list_(pa.string())
            for batch in it:
                ids = batch.column(id_idx).to_pylist()
                texts = batch.column(text_idx).to_pylist()
                vals = []
                for rid, s in zip(ids, texts):
                    if rid is None:
                        vals.append(None)
                        continue
                    pieces: list[str] = []
                    for w in _pre_tokenize_with_specials(
                        s, pat, clean, cjk, strip_acc, lower
                    ):
                        pieces.extend(tok(w))
                    if want == "count":
                        vals.append(len(pieces))
                    elif want == "ids":
                        vals.append([idmap.get(p, -1) for p in pieces])
                    else:
                        vals.append(pieces)
                yield batch.append_column(
                    out_name, pa.array(vals, type=out_type)
                )

        from pyspark.sql.types import (
            ArrayType, IntegerType, LongType, StringType, StructField,
            StructType,
        )

        if want == "count":
            out_dt = LongType()
        elif want == "ids":
            out_dt = ArrayType(IntegerType())
        else:
            out_dt = ArrayType(StringType())
        schema = StructType(
            list(df.schema.fields) + [StructField(out_name, out_dt)]
        )
        return df.mapInArrow(batches, schema)

    def tokenize_words(
        self, words: DataFrame, word_col: str = "word",
        with_ids: bool = False,
    ) -> DataFrame:
        """(word, n_tokens, syms) at the DISTINCT-word grain: the
        greedy longest-match per word in one Arrow map, the vocab set
        riding the closure (the BPE rank-dict pattern).

        ``with_ids=True`` appends ``ids array<int>`` mapped through the
        model's explicit id layout IN THE SAME PASS — the id map already
        rides the closure, so encode_ids needs no piece-grain explode /
        vocabulary join / re-assembly shuffle afterwards (same -1
        fallback for a piece missing from the map)."""
        idmap = self._require_model()
        vocab = frozenset(idmap)
        unk, prefix = self.unk_token_, self.prefix_
        max_chars = self.max_chars_
        special = frozenset(self._special_tokens)

        def batches(it):
            import pandas as pd

            for pdf in it:
                syms = [
                    [w] if w in special
                    else wordpiece_word(w, vocab, unk, prefix, max_chars)
                    if w is not None
                    else []
                    for w in pdf[word_col]
                ]
                cols = {
                    "word": pdf[word_col],
                    "n_tokens": [len(s) for s in syms],
                    "syms": syms,
                }
                if with_ids:
                    cols["ids"] = [
                        [idmap.get(p, -1) for p in s] for s in syms
                    ]
                yield pd.DataFrame(cols)

        schema = "word string, n_tokens int, syms array<string>"
        if with_ids:
            schema += ", ids array<int>"
        return words.select(F.col(word_col)).mapInPandas(batches, schema)

    def vocabulary(self, spark=None) -> DataFrame:
        """(token, id): the file's explicit map, verbatim. ``spark``
        optional — internal callers pass the session of the frame at
        hand (getActiveSession is None inside builder threads)."""
        vocab = self._require_model()
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            ensure(
                spark is not None,
                "vocabulary() needs an active SparkSession — pass one "
                "explicitly (vocabulary(spark)) from worker threads",
            )
        return local_frame(
            spark,
            sorted(vocab.items(), key=lambda kv: kv[1]),
            "token string, id int",
        )

    def _guard_unseen(self, unseen: DataFrame) -> None:
        if self.max_unseen_words is None:
            return
        cap = self.max_unseen_words
        n = unseen.limit(cap + 1).count()
        if n > cap:
            raise InvalidParameterError(
                f"more than max_unseen_words={cap} distinct words in "
                "the corpus — raise the cap or pre-clean unique tokens"
            )

    def _template_seqs(self, as_ids: bool) -> tuple[list, list]:
        ensure(
            self._tmpl is not None,
            "this tokenizer.json's post_processor shape is not "
            "reproduced — encode with add_special_tokens=False or "
            "strip the processor from the file",
        )
        pre, suf, hints = (
            list(self._tmpl[0]), list(self._tmpl[1]), dict(self._tmpl[2])
        )
        if not as_ids:
            return pre, suf
        idmap = self._require_model()

        def rid(tok: str) -> int:
            if tok in idmap:
                return int(idmap[tok])
            if tok in hints:
                return int(hints[tok])
            raise InvalidParameterError(
                f"post_processor special {tok!r} has no id anywhere — "
                "the file is inconsistent"
            )

        return [rid(t) for t in pre], [rid(t) for t in suf]

    def _encode(
        self,
        df: DataFrame,
        as_ids: bool,
        add_special_tokens: bool = False,
    ) -> DataFrame:
        self._check_input(df)
        self._require_model()
        elem = "int" if as_ids else "string"
        base = None
        if self.max_unseen_words is None:
            # doc-grain Arrow pass: zero corpus shuffles (see
            # _doc_token_table); the guard-free default. When every
            # input column rides Arrow exactly, the tokens column is
            # computed IN PLACE (no id-grain join-back — two corpus
            # shuffles at scale); otherwise the (id, tokens) table
            # joins back as before.
            if _arrow_exact(df.schema):
                base = self._doc_token_passthrough(
                    df, "ids" if as_ids else "syms", "__ff_tokens"
                )
            else:
                per_doc = self._doc_token_table(
                    df, "ids" if as_ids else "syms"
                )
        else:
            doc_words = df.select(
                F.col(self.id_col).alias("__ff_id"),
                F.posexplode(
                    F.concat(
                        self._word_expr(),
                        F.array(F.lit(None).cast("string")),
                    )
                ).alias("__ff_pos", "word"),
            )
            distinct = doc_words.where(
                F.col("word").isNotNull()
            ).select("word").distinct()
            self._guard_unseen(distinct)
            # ids are mapped inside the tokenize pass (the id map rides
            # the mapInPandas closure) — no piece-grain explode / vocab
            # join / collect_list re-assembly, one fewer shuffle per
            # encode
            seq_col = "ids" if as_ids else "syms"
            seq_table = self.tokenize_words(
                distinct, with_ids=as_ids
            ).select("word", F.col(seq_col).alias("__ff_seq"))
            resolved = doc_words.join(seq_table, "word", "left").select(
                "__ff_id",
                "__ff_pos",
                F.when(
                    F.col("word").isNull(),
                    F.array().cast(f"array<{elem}>"),
                )
                .otherwise(F.col("__ff_seq"))
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
        out_col = (
            f"{self.text_col}_wordpiece_{'ids' if as_ids else 'tokens'}"
        )
        tokens = F.col("__ff_tokens")
        pre: list = []
        suf: list = []
        if add_special_tokens:
            pre, suf = self._template_seqs(as_ids)
        trunc = self._trunc
        if trunc:
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
        if base is None:
            base = df.join(
                per_doc, on=df[self.id_col] == per_doc["__ff_id"],
                how="left",
            )
        return base.select(
            *[F.col(c) for c in df.columns],
            tokens.alias(out_col),
        )

    def encode(
        self, df: DataFrame, add_special_tokens: bool = False
    ) -> DataFrame:
        """Append ``{text_col}_wordpiece_tokens`` (array<string>)."""
        return self._encode(
            df, as_ids=False, add_special_tokens=add_special_tokens
        )

    def encode_ids(
        self, df: DataFrame, add_special_tokens: bool = False
    ) -> DataFrame:
        """Append ``{text_col}_wordpiece_ids`` (array<int>) under the
        file's id layout; ``add_special_tokens=True`` wraps with the
        post_processor template ([CLS]/[SEP])."""
        return self._encode(
            df, as_ids=True, add_special_tokens=add_special_tokens
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        self._require_model()
        base = None
        if self.max_unseen_words is None:
            # doc-grain Arrow pass (see _doc_token_table): the count
            # rides the same single stage, zero corpus shuffles — and
            # in place when the schema rides Arrow exactly (no id-grain
            # join-back)
            if _arrow_exact(df.schema):
                base = self._doc_token_passthrough(
                    df, "count", "__ff_total"
                )
            else:
                per_doc = self._doc_token_table(df, "count")
        else:
            doc_words = df.select(
                F.col(self.id_col).alias("__ff_id"),
                F.explode(
                    F.concat(
                        self._word_expr(),
                        F.array(F.lit(None).cast("string")),
                    )
                ).alias("word"),
            )
            distinct = doc_words.where(
                F.col("word").isNotNull()
            ).select("word").distinct()
            self._guard_unseen(distinct)
            counts = self.tokenize_words(distinct).select(
                "word", F.col("n_tokens").alias("__ff_nt")
            )
            counted = doc_words.join(counts, "word", "left").select(
                "__ff_id",
                F.when(F.col("word").isNull(), F.lit(0))
                .otherwise(F.col("__ff_nt"))
                .alias("__ff_nt"),
            )
            per_doc = counted.groupBy("__ff_id").agg(
                F.sum("__ff_nt").cast("bigint").alias("__ff_total")
            )
        out_col = f"{self.text_col}_wordpiece_token_count"
        if base is None:
            base = df.join(
                per_doc, on=df[self.id_col] == per_doc["__ff_id"],
                how="left",
            )
        return base.select(
            *[F.col(c) for c in df.columns],
            F.col("__ff_total").alias(out_col),
        )

    def decode_ids(
        self,
        df: DataFrame,
        ids_col: str | None = None,
        output_col: str | None = None,
        cleanup: bool = True,
    ) -> DataFrame:
        """Append the text decoded from an id-array column: id->token
        broadcast join, space-join, strip the ``##`` continuation
        prefix, then the fixed HF WordPiece ``cleanup`` rule set
        (space-before-punctuation and contraction rejoins). Unknown
        ids decode to U+FFFD; WordPiece decode is lossy by design
        (case/accents/whitespace were normalized away)."""
        from ..validation import validate_columns as _vc

        ids_col = ids_col or f"{self.text_col}_wordpiece_ids"
        output_col = output_col or f"{ids_col}_text"
        _vc(df, [self.id_col, ids_col])
        ensure(output_col not in df.columns,
               f"output column '{output_col}' already exists")
        idmap = self._require_model()
        max_id = max(idmap.values(), default=-1)
        if 0 <= max_id < max(65536, 2 * len(idmap)):
            # published WordPiece layouts are DENSE 0..n id spaces: the
            # id→token map rides the plan as ONE array literal indexed
            # in place (try_element_at is O(1) on an array literal) —
            # no posexplode, no join, no collect_list reassembly, zero
            # shuffles. Sparse or unbounded id spaces (a malformed /
            # exotic file) keep the broadcast-join path below.
            toks_by_id: list[str | None] = [None] * (max_id + 1)
            for t, i in sorted(idmap.items()):
                if 0 <= i <= max_id:
                    toks_by_id[i] = t
            arr = string_array_literal(toks_by_id)
        else:
            arr = None
        if arr is not None:
            cat = F.concat_ws(
                " ",
                F.transform(
                    F.col(ids_col),
                    lambda i: F.coalesce(
                        F.when(
                            (i >= 0) & (i <= F.lit(max_id)),
                            F.try_element_at(arr, i + F.lit(1)),
                        ),
                        F.lit("�"),
                    ),
                ),
            )
            txt = F.replace(cat, F.lit(" " + self.prefix_), F.lit(""))
            if cleanup:
                for a, b in _CLEANUP:
                    txt = F.replace(txt, F.lit(a), F.lit(b))
            return df.select(
                *[F.col(c) for c in df.columns],
                F.when(F.col(ids_col).isNull(), F.lit(None).cast("string"))
                .otherwise(txt)
                .alias(output_col),
            )
        vocab = self.vocabulary(df.sparkSession).select(
            F.col("id").alias("__ff_tid"),
            F.col("token").alias("__ff_tok"),
        )
        toks = df.select(
            F.col(self.id_col).alias("__ff_id"),
            F.posexplode(F.col(ids_col)).alias("__ff_p", "__ff_tid"),
        ).join(F.broadcast(vocab), "__ff_tid", "left")
        assembled = toks.groupBy("__ff_id").agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__ff_p", "__ff_tok"))
                    ),
                    lambda s: F.coalesce(s["__ff_tok"], F.lit("�")),
                ),
            ).alias("__ff_cat")
        )
        txt = F.replace(
            F.col("__ff_cat"), F.lit(" " + self.prefix_), F.lit("")
        )
        if cleanup:
            for a, b in _CLEANUP:
                txt = F.replace(txt, F.lit(a), F.lit(b))
        decoded = assembled.select("__ff_id", txt.alias("__ff_txt"))
        return df.join(
            decoded, on=df[self.id_col] == decoded["__ff_id"], how="left"
        ).select(
            *[F.col(c) for c in df.columns],
            F.when(F.col(ids_col).isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce("__ff_txt", F.lit("")))
            .alias(output_col),
        )
