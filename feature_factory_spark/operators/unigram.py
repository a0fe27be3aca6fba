"""Unigram-LM (SentencePiece-style) tokenizer trainer — the second
tokenizer family real LLM pipelines fit, next to BPE (operators/bpe.py).

Public-algorithm lineage: Kudo 2018 ("Subword Regularization") defines
the unigram language model tokenizer SentencePiece implements: a seed
vocabulary of frequent substrings, EM re-estimation of piece
probabilities against the corpus, pruning to the target vocabulary, and
Viterbi segmentation at encode time. This module implements the
deterministic core of that recipe:

- **seed**: every substring of the aggregated word table up to
  ``max_piece_len`` chars, weighted by word frequency x occurrences;
  the top ``seed_size`` multi-char pieces plus the full single-char
  alphabet.
- **EM** (``n_iter`` rounds of hard/Viterbi EM): E-step segments every
  word of the table by Viterbi under the current piece log-probs;
  M-step recounts pieces from the segmentations and re-normalizes.
  Hard EM (the argmax lattice path, not forward-backward marginals) is
  chosen because it is exactly reproducible in pure Python — the
  correctness pin recomputes the whole fit (``reference_unigram``) and
  the piece set AND log-probs must match bit-for-bit.
- **prune**: keep the ``vocab_size`` best pieces by (count desc, piece
  asc), always retaining the single-char alphabet (so any word of
  known chars remains segmentable), then renormalize.

Spark fit shape (the BPE dual pattern, bpe.py:383): the corpus-sized
work — word aggregation and seed-substring counting — runs as
distributed jobs in every mode. ``fit_mode='driver'`` (default) then
iterates the EM loop over the AGGREGATED, CAPPED word table on the
driver, which is how production tokenizer trainers run (SentencePiece
counts a corpus, trains in memory; ``max_words`` bounds the table by
construction). ``fit_mode='distributed'`` never collects the word
table: the seed comes from the distributed substring groupBy
(ordered-limit to seed_size), each EM round segments the persisted
word table in an Arrow-batched word-grain map under the broadcast
model and re-counts pieces with one map-side-combined groupBy, and
only MODEL-sized count tables reach the driver — piece counts are
integer sums, so the two modes produce BIT-IDENTICAL models on the
same word table.

Encode/decode are frame joins at the distinct-word grain, identical to
BPE's: the fitted (word -> pieces) table broadcast-joins exploded
document words; UNSEEN words collect (capped, fail-loud via
``max_unseen_words``) and Viterbi-segment on the driver with the same
fitted model — deterministic and bounded, never a per-row Python UDF.

``save_tokenizer`` writes the public SentencePiece text interchange:
``unigram.vocab`` — one ``piece<TAB>logprob`` line per id, the exact
layout ``spm_export_vocab`` emits — plus ``meta.json`` with the
training parameters (stdlib only; the binary .model protobuf is out of
scope, the .vocab text twin is the documented exchange format).

The reference repo has no tokenizer surface at all (SURVEY.md §2.3);
this is part of the beyond-reference LLM-pipeline layer.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.frames import local_frame
from ..functions.text import words_expr
from ..pipeline import Transformer
from ..validation import (
    InvalidParameterError,
    ensure,
    validate_columns,
    validate_string_columns,
)

#: log-prob assigned to an unknown single char at segmentation time:
#: worse than every real piece, so it is only used when forced.
UNK_PENALTY = -100.0

#: SentencePiece's word-boundary marker (U+2581 LOWER ONE EIGHTH
#: BLOCK): every word is prefixed with it before segmentation, so piece
#: sequences carry their word boundaries and decode is concat +
#: replace(marker, ' ') — the public convention every SentencePiece
#: consumer assumes.
WORD_MARK = "▁"


def seed_counts(word_counts: list[tuple[str, int]], max_piece_len: int
                ) -> dict[str, int]:
    """Substring seed counts: every substring of length 1..max_piece_len
    of every word, weighted by the word's corpus count (one count per
    OCCURRENCE, so 'aa' contributes 'a' twice)."""
    out: dict[str, int] = {}
    for w, c in word_counts:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                s = w[i:j]
                out[s] = out.get(s, 0) + c
    return out


def viterbi_segment(word: str, logprobs: dict[str, float],
                    max_piece_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: maximizes
    the summed log-prob; ties prefer the LONGER last piece (smaller
    split point). Chars absent from the vocabulary segment as
    single-char pieces at ``UNK_PENALTY`` (so every word segments).
    Pure deterministic float DP — the reference and the operator share
    this exact function."""
    n = len(word)
    best = [0.0] + [float("-inf")] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        lo = max(0, i - max_piece_len)
        for j in range(lo, i):
            piece = word[j:i]
            lp = logprobs.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = UNK_PENALTY
            score = best[j] + lp
            # strict > with ascending j: the SMALLEST j (longest last
            # piece) wins exact ties
            if score > best[i]:
                best[i] = score
                back[i] = j
    pieces: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    return pieces


def train_unigram(
    word_counts: list[tuple[str, int]],
    vocab_size: int,
    seed_size: int = 1000,
    n_iter: int = 2,
    max_piece_len: int = 8,
) -> dict[str, float]:
    """The full deterministic fit on an aggregated word table: seed ->
    hard-EM rounds -> prune -> renormalize. Returns piece -> logprob.

    Both the operator (driver mode on the capped Spark-aggregated
    table) and ``reference_unigram`` (the correctness twin) call this
    same function on the same table, so the pin is on the TABLE
    AGGREGATION + plumbing; the trainer itself is shared, exact code."""
    chars = sorted({c for w, _ in word_counts for c in w})
    seeds = seed_counts(word_counts, max_piece_len)
    multi = sorted(
        ((s, c) for s, c in seeds.items() if len(s) > 1),
        key=lambda sc: (-sc[1], sc[0]),
    )[: max(0, seed_size - len(chars))]
    counts = {c: seeds.get(c, 1) for c in chars}
    counts.update(dict(multi))
    total = sum(counts.values())
    logprobs = {p: math.log(c / total) for p, c in counts.items()}

    for _ in range(n_iter):
        new: dict[str, int] = {}
        for w, c in word_counts:
            for piece in viterbi_segment(w, logprobs, max_piece_len):
                new[piece] = new.get(piece, 0) + c
        # single chars always survive (floor 1) so the model can
        # segment any word over the fitted alphabet; unused multi-char
        # pieces drop
        counts = {p: c for p, c in new.items() if len(p) > 1}
        counts.update({c: max(new.get(c, 0), 1) for c in chars})
        total = sum(counts.values())
        logprobs = {p: math.log(c / total) for p, c in counts.items()}

    kept_multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, vocab_size - len(chars))]
    counts = {c: counts[c] for c in chars}
    counts.update(dict(kept_multi))
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items()}


def reference_segment(word: str, logprobs: dict[str, float],
                      max_piece_len: int) -> list[str]:
    """Independent naive segmenter (the ``reference_tokenize``
    pattern): memoized recursion over PREFIXES instead of the trainer's
    iterative forward DP. The canonical tie rule — among max-score
    segmentations, the longest LAST piece wins, resolved right-to-left
    — is implemented here by trying last-piece lengths descending and
    keeping the first maximum; the trainer implements it by scanning
    split points ascending under strict improvement. Same rule, two
    mechanizations, so agreement is a check, not an identity."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def best(k: int) -> tuple[float, tuple[str, ...]]:
        if k == 0:
            return 0.0, ()
        top: tuple[float, tuple[str, ...]] | None = None
        for ln in range(min(k, max_piece_len), 0, -1):
            piece = word[k - ln:k]
            lp = logprobs.get(piece)
            if lp is None:
                if ln > 1:
                    continue
                lp = UNK_PENALTY
            sub_score, sub_pieces = best(k - ln)
            # NOTE operand order: sub_score + lp mirrors the trainer's
            # best[j] + lp so float addition is bit-identical
            cand = (sub_score + lp, sub_pieces + (piece,))
            if top is None or cand[0] > top[0]:
                top = cand
        assert top is not None
        return top

    return list(best(len(word))[1])


def reference_unigram(
    word_counts: list[tuple[str, int]],
    vocab_size: int,
    seed_size: int = 1000,
    n_iter: int = 2,
    max_piece_len: int = 8,
) -> dict[str, float]:
    """Independent pure-Python recount reference of the whole fit (the
    ``reference_bpe`` pattern): naive substring enumeration, the
    recursive segmenter above, and a from-scratch EM/prune loop —
    written against the ALGORITHM'S SPEC, not by calling the trainer,
    so a bug in ``train_unigram`` cannot self-certify."""
    alphabet = sorted({c for w, _ in word_counts for c in w})
    # naive seed: enumerate substrings per word via double slice loops
    seed: dict[str, int] = {}
    for w, c in word_counts:
        for i in range(len(w)):
            for ln in range(1, max_piece_len + 1):
                if i + ln > len(w):
                    break
                seed[w[i:i + ln]] = seed.get(w[i:i + ln], 0) + c
    ranked = sorted(
        [(s, c) for s, c in seed.items() if len(s) > 1],
        key=lambda sc: (-sc[1], sc[0]),
    )
    counts: dict[str, int] = {}
    for ch in alphabet:
        counts[ch] = seed[ch] if ch in seed else 1
    for s, c in ranked[: max(0, seed_size - len(alphabet))]:
        counts[s] = c
    for _ in range(n_iter):
        total = float(sum(counts.values()))
        lps = {p: math.log(c / total) for p, c in counts.items()}
        tally: dict[str, int] = {}
        for w, c in word_counts:
            for piece in reference_segment(w, lps, max_piece_len):
                tally[piece] = tally.get(piece, 0) + c
        counts = {}
        for ch in alphabet:
            counts[ch] = max(tally.get(ch, 0), 1)
        for p, c in tally.items():
            if len(p) > 1:
                counts[p] = c
    final = sorted(
        [(p, c) for p, c in counts.items() if len(p) > 1],
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, vocab_size - len(alphabet))]
    kept = {ch: counts[ch] for ch in alphabet}
    kept.update(dict(final))
    total = float(sum(kept.values()))
    return {p: math.log(c / total) for p, c in kept.items()}


class UnigramVocabBuilder(Transformer):
    """SentencePiece-style unigram-LM tokenizer: fit learns a piece
    vocabulary with log-probs from the corpus word table; ``encode``
    appends per-document piece sequences (Viterbi segmentation),
    ``encode_ids`` the id sequences, ``decode_ids`` inverts them, and
    ``transform`` appends ``{text_col}_unigram_token_count``.

    Ids are assigned by (logprob desc, piece asc) — most probable piece
    is id 0 — the layout ``save_tokenizer`` exports. Unknown ids decode
    to U+FFFD; word boundaries rejoin with single spaces (the BPE
    decode contract).

    Scale shape: one explode+groupBy word aggregation + one substring
    explode+groupBy seed job (both corpus-sized, map-side combined);
    the EM loop is driver-side over the capped table; encode/transform
    are broadcast joins at the distinct-word grain with per-doc ordered
    reassembly — the exact plan family BpeVocabBuilder ships."""

    def __init__(
        self,
        text_col: str,
        id_col: str,
        vocab_size: int = 8000,
        seed_size: int = 20000,
        n_iter: int = 2,
        max_piece_len: int = 8,
        min_count: int = 1,
        max_words: int = 100_000,
        lowercase: bool = True,
        max_unseen_words: int | None = 100_000,
        fit_mode: str = "driver",
    ):
        ensure(fit_mode in ("driver", "distributed"),
               "fit_mode must be 'driver' or 'distributed'")
        ensure(vocab_size >= 2, "vocab_size must be >= 2")
        ensure(seed_size >= vocab_size,
               "seed_size must be >= vocab_size")
        ensure(n_iter >= 1, "n_iter must be >= 1")
        ensure(2 <= max_piece_len <= 32,
               "max_piece_len must be in [2, 32]")
        ensure(min_count >= 1, "min_count must be >= 1")
        ensure(max_words >= 1, "max_words must be >= 1")
        ensure(max_unseen_words is None or max_unseen_words >= 0,
               "max_unseen_words must be None or >= 0")
        self.text_col = text_col
        self.id_col = id_col
        self.vocab_size = vocab_size
        self.seed_size = seed_size
        self.n_iter = n_iter
        self.max_piece_len = max_piece_len
        self.min_count = min_count
        self.max_words = max_words
        self.lowercase = lowercase
        self.max_unseen_words = max_unseen_words
        self.fit_mode = fit_mode
        self.logprobs_: dict[str, float] | None = None
        self.word_pieces_: DataFrame | None = None
        self.fit_word_counts_: list[tuple[str, int]] | None = None
        # piece order adopted from an imported tokenizer.json (HF
        # Unigram: index == id). None for fitted instances, whose ids
        # derive from the (logprob desc, piece asc) sort.
        self.vocab_order_: list[str] | None = None
        # --- imported-model surfaces (set ONLY by load_tokenizer_json;
        # every fit resets them) --------------------------------------
        # added_tokens content -> id (T5's <extra_id_*> sentinels live
        # here, outside model.vocab)
        self.added_ids_: dict[str, int] = {}
        # added-token contents isolated from corpus text before
        # normalization (HF AddedToken semantics, the BPE r13 law)
        self._special_tokens: list[str] = []
        # unknown-piece semantics of the source file: byte_fallback
        # expands to <0xXX> ids, else unk_id (fuse_unk collapses runs)
        self._byte_fallback: bool = False
        self._unk_id: int | None = None
        self._fuse_unk: bool = False
        # Metaspace prepend: scheme 'always'/'first' vs 'never' —
        # identical at document grain; 'first' differs only for the
        # non-first segments special isolation produces
        self._prepend: bool = True
        self._prepend_scheme: str = "always"
        # imported normalizer ATOM chain (Sequence files: Precompiled
        # charsmap, Replace, Lowercase, Strip, NF*) — non-empty chain
        # routes text through the exact Python normalizer (the
        # UnicodeNormalizer slow-path exception); empty chain keeps
        # the pure-JVM path
        self._norm_chain: list[dict] = []
        # verbatim source document — export re-emits it untouched
        self._loaded_doc: dict | None = None
        # post_processor single-sequence template (see BpeVocabBuilder
        # — consulted only by encode(add_special_tokens=True))
        self._tmpl: tuple | list | None = ([], [], {})
        # the file's stored truncation (applied on EVERY encode)
        self._trunc: dict | None = None

    def is_stateful(self) -> bool:
        return True

    def _frame_state_attrs(self) -> list[str]:
        return ["word_pieces_"]

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.id_col])
        validate_string_columns(df, [self.text_col])

    def _word_expr(self) -> Column:
        """Document text -> array of pieces to segment.

        Fitted instances: whitespace words, each prefixed with
        :data:`WORD_MARK` (the SentencePiece convention the trainer
        fits on). IMPORTED models (``vocab_order_`` set) reproduce the
        file's Metaspace law exactly instead: only ' ' becomes the
        mark (runs of spaces yield bare-mark pieces, tabs/newlines
        stay inside pieces), the mark is prepended per
        ``prepend_scheme``, and pieces split at EVERY mark — the
        published pre-tokenizer semantics, pure JVM. Files carrying a
        normalizer CHAIN (Precompiled charsmap, Replace, NF*...) or
        isolated added_tokens route through one Arrow-batched Python
        words UDF applying the exact chain (the UnicodeNormalizer
        slow-path exception: the JVM cannot evaluate a charsmap)."""
        if self._norm_chain or self._special_tokens:
            return self._python_words_udf()(F.col(self.text_col))
        text = F.col(self.text_col)
        if self.lowercase:
            text = F.lower(text)
        if self.vocab_order_ is not None:
            marked = F.regexp_replace(text, " ", WORD_MARK)
            if self._prepend:
                marked = F.concat(F.lit(WORD_MARK), marked)
            pat = f"{WORD_MARK}[^{WORD_MARK}]*|[^{WORD_MARK}]+"
            pieces = F.coalesce(
                F.regexp_extract_all(marked, F.lit(pat), 0),
                F.array().cast("array<string>"),
            )
            # the source runtimes emit NO pieces for empty input
            return F.when(
                F.col(self.text_col).isNull()
                | (F.col(self.text_col) == ""),
                F.array().cast("array<string>"),
            ).otherwise(pieces)
        words = F.coalesce(
            words_expr(text), F.array().cast("array<string>")
        )
        return F.transform(
            words, lambda w: F.concat(F.lit(WORD_MARK), w)
        )

    def _python_words_udf(self):
        """Exact-chain words UDF for imported files with a normalizer
        chain and/or isolated specials: special split (leftmost-
        longest) -> per-segment normalizer chain -> per-segment
        Metaspace law. Arrow-batched; the model-sized chain rides the
        closure."""
        import re as _re

        from pyspark.sql.functions import pandas_udf

        from ..functions.charsmap import chain_fn

        chain = [dict(a) for a in self._norm_chain]
        specials = list(self._special_tokens)
        lowercase = self.lowercase
        scheme = self._prepend_scheme
        prepend = self._prepend
        mark = WORD_MARK
        fn = chain_fn(chain) if chain else None
        spat = (
            _re.compile("|".join(_re.escape(t) for t in specials))
            if specials
            else None
        )
        meta_re = _re.compile(f"{mark}[^{mark}]*|[^{mark}]+")

        @pandas_udf("array<string>")
        def words(col):
            def one(s):
                if s is None or s == "":
                    return []
                if spat is None:
                    segs = [(False, s)]
                else:
                    segs, pos = [], 0
                    for m in spat.finditer(s):
                        if m.start() > pos:
                            segs.append((False, s[pos:m.start()]))
                        segs.append((True, m.group(0)))
                        pos = m.end()
                    if pos < len(s):
                        segs.append((False, s[pos:]))
                out = []
                for i, (is_sp, seg) in enumerate(segs):
                    if is_sp:
                        out.append(seg)
                        continue
                    if fn is not None:
                        seg = fn(seg)
                    if lowercase:
                        seg = seg.lower()
                    if not seg:
                        continue
                    marked = seg.replace(" ", mark)
                    if prepend and (scheme == "always" or i == 0):
                        marked = mark + marked
                    out.extend(meta_re.findall(marked))
                return out

            return col.map(one)

        return words

    def word_counts(self, df: DataFrame) -> DataFrame:
        """(word, cnt) aggregated corpus word frequencies, min_count
        filtered and capped to the top max_words deterministically
        (the BpeVocabBuilder contract)."""
        counts = (
            df.select(F.explode(self._word_expr()).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
        )
        if self.min_count > 1:
            counts = counts.where(F.col("cnt") >= self.min_count)
        return counts.orderBy(
            F.desc("cnt"), F.asc("word")
        ).limit(self.max_words)

    def seed_count_frame(self, words: DataFrame) -> DataFrame:
        """(piece, cnt) distributed substring seed counts over a
        (word, cnt) frame — the corpus-sized half of the fit as ONE
        explode + map-side-combined groupBy, for auditing the driver
        seed against the cluster computation."""
        k = self.max_piece_len
        subs = F.expr(
            "flatten(transform(sequence(1, length(word)), i -> "
            f"transform(sequence(i, least(i + {k} - 1, length(word))), "
            "j -> substring(word, i, j - i + 1))))"
        )
        return (
            words.select(F.col("cnt"), F.explode(subs).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def _fit(self, df: DataFrame) -> None:
        # refitting an instance that previously imported a tokenizer
        # must shed the imported id layout (ids derive from the new
        # model's logprob sort again) AND the imported mode switches
        self.vocab_order_ = None
        self.added_ids_ = {}
        self._special_tokens = []
        self._byte_fallback = False
        self._unk_id = None
        self._fuse_unk = False
        self._prepend = True
        self._prepend_scheme = "always"
        self._norm_chain = []
        self._loaded_doc = None
        self._tmpl = ([], [], {})
        self._trunc = None
        if self.fit_mode == "distributed":
            self._fit_distributed(df)
            return
        wc = [
            (r["word"], r["cnt"]) for r in self.word_counts(df).collect()
        ]
        ensure(bool(wc), "fit corpus produced an empty word table")
        self.fit_word_counts_ = wc
        self.logprobs_ = train_unigram(
            wc, self.vocab_size, self.seed_size, self.n_iter,
            self.max_piece_len,
        )
        self.release()
        self.word_pieces_ = local_frame(
            df.sparkSession,
            [
                (w, viterbi_segment(w, self.logprobs_, self.max_piece_len))
                for w, _ in sorted(wc)
            ],
            "word string, pieces array<string>",
        )

    def _fit_distributed(self, df: DataFrame) -> None:
        """The uncapped-vocabulary fit (the BpeVocabBuilder dual-mode
        contract): the word table NEVER collects to the driver. Per
        step, only MODEL-sized frames do —

        - seed: the distributed substring groupBy
          (:meth:`seed_count_frame`), ordered-limit to ``seed_size``
          multi-char pieces plus the full alphabet (one more tiny
          aggregate);
        - each EM round: one Arrow-batched word-grain map segments the
          persisted word table under the broadcast model, one
          map-side-combined explode+groupBy re-counts pieces, and the
          (<= seed_size + alphabet)-row count table collects;
        - M-step/prune/normalize are the SAME integer-count Python as
          driver mode, so the two modes produce BIT-IDENTICAL models on
          the same word table (piece counts are integer sums — no
          reduction-order float drift anywhere before the final log).
        """
        from pyspark import StorageLevel

        words = self.word_counts(df).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n_words = words.count()
            ensure(n_words > 0, "fit corpus produced an empty word table")
            seeds = self.seed_count_frame(words)
            # every corpus char IS a length-1 substring: the seed frame
            # carries the full alphabet with its exact counts
            char_rows = seeds.where(F.length("piece") == 1).collect()
            char_counts = {r["piece"]: int(r["cnt"]) for r in char_rows}
            chars = sorted(char_counts)
            multi = [
                (r["piece"], int(r["cnt"]))
                for r in seeds.where(F.length("piece") > 1)
                .orderBy(F.desc("cnt"), F.asc("piece"))
                .limit(max(0, self.seed_size - len(chars)))
                .collect()
            ]
            counts: dict[str, int] = {
                c: char_counts.get(c, 1) for c in chars
            }
            counts.update(dict(multi))
            total = sum(counts.values())
            logprobs = {p: math.log(c / total) for p, c in counts.items()}

            for _ in range(self.n_iter):
                tally = self._distributed_tally(words, logprobs)
                counts = {p: c for p, c in tally.items() if len(p) > 1}
                counts.update({c: max(tally.get(c, 0), 1) for c in chars})
                total = sum(counts.values())
                logprobs = {
                    p: math.log(c / total) for p, c in counts.items()
                }

            kept_multi = sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )[: max(0, self.vocab_size - len(chars))]
            counts = {c: counts[c] for c in chars}
            counts.update(dict(kept_multi))
            total = sum(counts.values())
            self.logprobs_ = {
                p: math.log(c / total) for p, c in counts.items()
            }
            self.fit_word_counts_ = None  # never collected, by design
            self.release()
            lp = self.logprobs_
            self.word_pieces_ = self._segment_frame(words, lp)
            # materialize the fitted table before the word frame
            # unpersists (it feeds every later encode/transform)
            self.word_pieces_ = self.word_pieces_.localCheckpoint(
                eager=True
            )
        finally:
            words.unpersist()

    def _segment_frame(self, words: DataFrame, lp: dict) -> DataFrame:
        """(word, pieces) via an Arrow-batched word-grain map under a
        broadcast model — the distributed Viterbi seam."""
        k = self.max_piece_len
        bc = words.sparkSession.sparkContext.broadcast(lp)

        def seg(batches):
            import pandas as pd

            model = bc.value
            for pdf in batches:
                yield pd.DataFrame({
                    "word": pdf["word"],
                    "pieces": [
                        viterbi_segment(w, model, k) for w in pdf["word"]
                    ],
                })

        return words.select("word").mapInPandas(
            seg, "word string, pieces array<string>"
        )

    def _distributed_tally(
        self, words: DataFrame, lp: dict
    ) -> dict[str, int]:
        """E-step piece counts: segment the word table (word grain),
        explode, ONE map-side-combined groupBy; the collect is bounded
        by the active piece set (<= seed_size + alphabet)."""
        k = self.max_piece_len
        bc = words.sparkSession.sparkContext.broadcast(lp)

        def seg(batches):
            import pandas as pd

            model = bc.value
            for pdf in batches:
                yield pd.DataFrame({
                    "cnt": pdf["cnt"],
                    "pieces": [
                        viterbi_segment(w, model, k) for w in pdf["word"]
                    ],
                })

        rows = (
            words.mapInPandas(seg, "cnt long, pieces array<string>")
            .select("cnt", F.explode("pieces").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("cnt").alias("n"))
            .collect()
        )
        return {r["piece"]: int(r["n"]) for r in rows}

    def _id_map(self) -> dict[str, int]:
        """piece -> id under the active layout: an imported file's
        verbatim order (+ its added_tokens) or the fitted
        (logprob desc, piece asc) sort."""
        lp = self._require_fit()
        if self.vocab_order_ is not None:
            m = {p: i for i, p in enumerate(self.vocab_order_)}
        else:
            m = {
                p: i
                for i, (p, _) in enumerate(
                    sorted(lp.items(), key=lambda pv: (-pv[1], pv[0]))
                )
            }
        for p, i in self.added_ids_.items():
            m.setdefault(p, i)
        return m

    def vocabulary(self) -> DataFrame:
        """(piece, id, logprob): ids by (logprob desc, piece asc) —
        id 0 is the most probable piece, the save_tokenizer layout.
        Imported models keep their file's index==id order verbatim;
        added_tokens join with a NULL logprob (they carry no LM
        mass)."""
        from .text import _require_frame_state

        lp = self._require_fit()
        rows = [(p, i, lp.get(p)) for p, i in self._vocab_id_rows()]
        frame = _require_frame_state(
            self.word_pieces_, "UnigramVocabBuilder", "word_pieces_"
        )
        return local_frame(
            frame.sparkSession, rows, "piece string, id int, logprob double"
        )

    def _vocab_id_rows(self) -> list[tuple[str, int]]:
        """Driver-side (piece, id) rows — the id layout both
        :meth:`vocabulary` and the decode literal index by."""
        lp = self._require_fit()
        if self.vocab_order_ is not None:
            # imported model: the file's piece order IS the id layout
            # (HF Unigram: index == id); re-sorting could renumber a
            # foreign vocabulary and shift every encoded id
            rows = [(p, i) for i, p in enumerate(self.vocab_order_)]
            seen = set(self.vocab_order_)
            rows += [
                (p, i)
                for p, i in sorted(
                    self.added_ids_.items(), key=lambda kv: kv[1]
                )
                if p not in seen
            ]
            return rows
        return [
            (p, i)
            for i, (p, _) in enumerate(
                sorted(lp.items(), key=lambda pv: (-pv[1], pv[0]))
            )
        ]

    def _require_fit(self) -> dict[str, float]:
        if self.logprobs_ is None:
            raise InvalidParameterError(
                "UnigramVocabBuilder is not fitted: call fit() or "
                "load_state() first"
            )
        return self.logprobs_

    def _guard_unseen(self, n: int) -> None:
        cap = self.max_unseen_words
        if cap is not None and n > cap:
            raise InvalidParameterError(
                f"more than max_unseen_words={cap} distinct words are "
                "absent from the fitted word table; refit with a larger "
                "max_words, pre-clean unique tokens, or raise "
                "max_unseen_words"
            )

    def _piece_table(self, df: DataFrame) -> DataFrame:
        """(word, pieces) covering every distinct word of ``df``: the
        fitted table, plus unseen words Viterbi-segmented in a
        distributed Arrow pass under the same model (capped +
        fail-loud; the capped collect is bounded by max_unseen_words).
        At corpus scale the fitted table already covers the head, so
        the unseen tail is the long-tail typo/ID vocabulary the cap
        exists to surface."""
        from .text import _require_frame_state

        lp = self._require_fit()
        fitted = _require_frame_state(
            self.word_pieces_, "UnigramVocabBuilder", "word_pieces_"
        )
        words = df.select(F.explode(self._word_expr()).alias("word"))
        unseen = (
            words.join(fitted.select("word"), "word", "left_anti")
            .distinct()
        )
        special = frozenset(self._special_tokens)
        max_len = self.max_piece_len
        cap = self.max_unseen_words
        if cap is not None:
            # ONE bounded evaluation of the anti-join (cap bounds the
            # word list, a few MB of driver memory at the 100k
            # default): the guard and the segmentation must see the
            # same word set — the former separate count() job followed
            # by a distributed re-evaluation computed the anti-join
            # twice and could diverge on a nondeterministic source.
            # The collected words feed back into the SAME distributed
            # Arrow segmentation below (the driver holds words, never
            # does the Viterbi work).
            rows = unseen.limit(cap + 1).collect()
            self._guard_unseen(len(rows))
            if not rows:
                return fitted
            unseen = df.sparkSession.createDataFrame(
                rows, "word string"
            )
        elif unseen.isEmpty():
            # the fitted-corpus common case: zero unseen words — skip
            # the segmentation branch outright
            return fitted
        # unseen words Viterbi-segment in a DISTRIBUTED Arrow pass at
        # the distinct-word grain, the model riding the closure (the
        # tokenize_words shape) — the former driver collect + local
        # loop was uncapped for max_unseen_words=None, i.e. applying a
        # published model to a fresh corpus pulled EVERY distinct
        # corpus word to the driver (guide §5: the driver does no data
        # work). Same viterbi_segment function, bit-identical pieces.

        def seg_batches(it):
            import pandas as pd

            for pdf in it:
                # isolated added tokens are ONE piece — their own
                # content, so the id join lands on the added id
                yield pd.DataFrame({
                    "word": pdf["word"],
                    "pieces": [
                        [w] if w in special
                        else viterbi_segment(w, lp, max_len)
                        for w in pdf["word"]
                    ],
                })

        extra = unseen.mapInPandas(
            seg_batches, "word string, pieces array<string>"
        )
        return fitted.unionByName(extra)

    def _ids_seq_table(self, table: DataFrame) -> DataFrame:
        """(word, pieces:int array): piece strings -> vocabulary ids
        via ONE broadcast join at the (word, piece) grain — honors an
        imported file's id layout verbatim (``vocab_order_`` + its
        added_tokens; the r13 fix: the former driver-dict path
        silently renumbered foreign layouts by the fitted sort) and
        reproduces the published unknown-piece semantics:
        ``byte_fallback`` expands an uncovered piece to its UTF-8
        bytes' ``<0xXX>`` ids (the Gemma/Llama convention, same
        expression as the BPE path), else ``unk_id`` when the file
        declares one (``fuse_unk`` collapsing consecutive unknowns to
        ONE id, the SentencePiece default), else the -1 sentinel."""
        vocab = self.vocabulary().select(
            F.col("piece").alias("__ff_tok"),
            F.col("id").alias("__ff_tid"),
        )
        exploded = table.select(
            "word", F.posexplode("pieces").alias("__ff_p", "__ff_tok")
        ).join(F.broadcast(vocab), "__ff_tok", "left")
        if self._byte_fallback:
            id_map = self._id_map()
            miss = -1 if self._unk_id is None else int(self._unk_id)
            byte_ids = [
                int(id_map.get("<0x%02X>" % b, miss))
                for b in range(256)
            ]
            blit = F.lit(byte_ids)
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
            miss = -1 if self._unk_id is None else int(self._unk_id)
            ids = F.array(
                F.coalesce(F.col("__ff_tid"), F.lit(int(miss)))
            )
        out = (
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
                ).alias("pieces")
            )
        )
        if (
            self._fuse_unk
            and self._unk_id is not None
            and not self._byte_fallback
        ):
            unk = int(self._unk_id)
            out = out.select(
                "word",
                F.aggregate(
                    F.col("pieces"),
                    F.array().cast("array<int>"),
                    lambda acc, x: F.when(
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == F.lit(unk))
                        & (x == F.lit(unk)),
                        acc,
                    ).otherwise(F.concat(acc, F.array(x))),
                ).alias("pieces"),
            )
        return out

    def _template_seqs(self, as_ids: bool) -> tuple[list, list]:
        """post_processor template (prefix, suffix) — tokens or ids;
        fail-loud on unrecognized processor shapes or id-less
        specials (the BpeVocabBuilder contract)."""
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
        idmap = self._id_map()

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

    def _encode(
        self,
        df: DataFrame,
        as_ids: bool,
        add_special_tokens: bool = False,
    ) -> DataFrame:
        self._check_input(df)
        table = self._piece_table(df)
        if as_ids:
            table = self._ids_seq_table(table)
            elem = "int"
        else:
            elem = "string"
        doc_words = df.select(
            F.col(self.id_col).alias("__ff_id"),
            F.posexplode(
                F.concat(
                    self._word_expr(), F.array(F.lit(None).cast("string"))
                )
            ).alias("__ff_pos", "word"),
        )
        joined = doc_words.join(F.broadcast(table), "word", "left").select(
            "__ff_id",
            "__ff_pos",
            F.when(
                F.col("word").isNull(), F.array().cast(f"array<{elem}>")
            )
            .otherwise(F.col("pieces"))
            .alias("__ff_seq"),
        )
        per_doc = joined.groupBy("__ff_id").agg(
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
            f"{self.text_col}_unigram_{'ids' if as_ids else 'pieces'}"
        )
        ensure(out_col not in df.columns,
               f"output column '{out_col}' already exists")
        tokens = F.col("__ff_tokens")
        pre: list = []
        suf: list = []
        if add_special_tokens:
            pre, suf = self._template_seqs(as_ids)
        trunc = getattr(self, "_trunc", None)
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
        return df.join(
            per_doc, on=df[self.id_col] == per_doc["__ff_id"], how="left"
        ).select(
            *[F.col(c) for c in df.columns],
            tokens.alias(out_col),
        )

    def encode(
        self, df: DataFrame, add_special_tokens: bool = False
    ) -> DataFrame:
        """Append ``{text_col}_unigram_pieces``: per-document Viterbi
        piece sequences, word-by-word in document order.
        ``add_special_tokens=True`` wraps each document with the
        loaded post_processor template (T5's terminal ``</s>``,
        Llama-style BOS...) — see BpeVocabBuilder.encode."""
        return self._encode(
            df, as_ids=False, add_special_tokens=add_special_tokens
        )

    def encode_ids(
        self, df: DataFrame, add_special_tokens: bool = False
    ) -> DataFrame:
        """Append ``{text_col}_unigram_ids``: the id sequences under
        the (logprob desc, piece asc) vocabulary layout (imported
        files keep their own index==id layout verbatim).
        ``add_special_tokens=True`` wraps each document with the
        loaded post_processor template's control ids."""
        return self._encode(
            df, as_ids=True, add_special_tokens=add_special_tokens
        )

    def _decode_ids_literal(
        self,
        df: DataFrame,
        ids_col: str,
        output_col: str,
        id_rows: list[tuple[str, int]],
        max_id: int,
    ) -> DataFrame:
        """Shuffle-free decode for dense id layouts (the BPE
        ``_decode_ids_literal`` law): each id resolves through ONE
        id→piece array literal inside a per-element ``transform``;
        the byte-fallback hex-accumulate inversion is expression-
        identical to the join plan. Returns ``None`` (caller keeps the
        join plan) when piece content cannot ride a JSON literal."""
        from ..functions.expressions import string_array_literal

        pieces_by_id: list[str | None] = [None] * (max_id + 1)
        for p, i in sorted(id_rows):
            if 0 <= i <= max_id:
                pieces_by_id[i] = p
        arr = string_array_literal(pieces_by_id)
        if arr is None:
            return None  # type: ignore[return-value]

        def tok_bytes_elem(i: Column) -> Column:
            t = F.coalesce(
                F.when(
                    (i >= 0) & (i <= F.lit(max_id)),
                    F.try_element_at(arr, i + F.lit(1)),
                ),
                F.lit("�"),
            )
            is_byte = t.rlike("^<0x[0-9A-Fa-f]{2}>$")
            plain = F.hex(
                F.encode(
                    F.regexp_replace(t, WORD_MARK, " "), "UTF-8"
                )
            )
            return F.when(
                is_byte, F.upper(F.substring(t, 4, 2))
            ).otherwise(plain)

        cat = F.concat_ws(
            "", F.transform(F.col(ids_col), tok_bytes_elem)
        )
        txt = F.ltrim(F.decode(F.unhex(cat), "UTF-8"))
        return df.select(
            *[F.col(c) for c in df.columns],
            F.when(F.col(ids_col).isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce(txt, F.lit("")))
            .alias(output_col),
        )

    def decode_ids(
        self,
        df: DataFrame,
        ids_col: str | None = None,
        output_col: str | None = None,
    ) -> DataFrame:
        """Append the text decoded from an id-array column — inverse of
        :meth:`encode_ids` up to whitespace normalization: pieces
        concatenate, every :data:`WORD_MARK` becomes a space (the
        SentencePiece decode rule), and the leading space trims.
        Unknown ids decode to U+FFFD."""
        from ..validation import validate_columns as _vc

        ids_col = ids_col or f"{self.text_col}_unigram_ids"
        output_col = output_col or f"{ids_col}_text"
        _vc(df, [self.id_col, ids_col])
        ensure(output_col not in df.columns,
               f"output column '{output_col}' already exists")
        self._require_fit()
        # dense id layouts (every fitted AND published Unigram table)
        # decode through ONE from_json array literal indexed per
        # element — no posexplode, no join, no reassembly (the BPE
        # _decode_ids_literal law; from_json constant-folds to a single
        # Literal node, so the old one-node-per-entry objection no
        # longer applies, and indexing BY ID preserves foreign
        # layouts verbatim). Sparse id spaces keep the join plan.
        id_rows = self._vocab_id_rows()
        max_id = max((i for _, i in id_rows), default=-1)
        if 0 <= max_id < max(65536, 2 * len(id_rows)):
            out = self._decode_ids_literal(
                df, ids_col, output_col, id_rows, max_id
            )
            if out is not None:
                return out
        # id -> piece via one broadcast frame join (honors imported
        # layouts + added tokens). Byte-fallback pieces (<0xXX>) fuse
        # through the hex-accumulate inversion (the BPE metaspace
        # decode law), so multi-byte UTF-8 split across byte tokens
        # reassembles.
        vocab = self.vocabulary().select(
            F.col("id").alias("__ff_tid"),
            F.col("piece").alias("__ff_tok"),
        )
        toks = df.select(
            F.col(self.id_col).alias("__ff_id"),
            F.posexplode(F.col(ids_col)).alias("__ff_p", "__ff_tid"),
        ).join(F.broadcast(vocab), "__ff_tid", "left")

        def tok_bytes(s: Column) -> Column:
            t = F.coalesce(s["__ff_tok"], F.lit("�"))
            is_byte = t.rlike("^<0x[0-9A-Fa-f]{2}>$")
            plain = F.hex(
                F.encode(
                    F.regexp_replace(t, WORD_MARK, " "), "UTF-8"
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
                        F.collect_list(F.struct("__ff_p", "__ff_tok"))
                    ),
                    tok_bytes,
                ),
            ).alias("__ff_cat")
        )
        decoded_txt = F.ltrim(
            F.decode(F.unhex(F.col("__ff_cat")), "UTF-8")
        )
        decoded = assembled.select(
            "__ff_id", decoded_txt.alias("__ff_txt")
        )
        return df.join(
            decoded, on=df[self.id_col] == decoded["__ff_id"], how="left"
        ).select(
            *[F.col(c) for c in df.columns],
            F.when(F.col(ids_col).isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce("__ff_txt", F.lit("")))
            .alias(output_col),
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        table = self._piece_table(df).select(
            "word", F.size("pieces").alias("__ff_nt")
        )
        doc_words = df.select(
            F.col(self.id_col).alias("__ff_id"),
            F.explode(
                F.concat(
                    self._word_expr(), F.array(F.lit(None).cast("string"))
                )
            ).alias("word"),
        )
        per_doc = (
            doc_words.join(F.broadcast(table), "word", "left")
            .groupBy("__ff_id")
            .agg(
                F.sum(F.coalesce("__ff_nt", F.lit(0))).alias("__ff_cnt")
            )
        )
        out_col = f"{self.text_col}_unigram_token_count"
        ensure(out_col not in df.columns,
               f"output column '{out_col}' already exists")
        return df.join(
            per_doc, on=df[self.id_col] == per_doc["__ff_id"], how="left"
        ).select(
            *[F.col(c) for c in df.columns],
            F.col("__ff_cnt").cast("bigint").alias(out_col),
        )

    def save_tokenizer(self, path: str) -> None:
        """Write the SentencePiece TEXT interchange: ``unigram.vocab``
        (``piece<TAB>logprob`` per line, line order = id order — the
        ``spm_export_vocab`` layout) + ``meta.json`` (params). Stdlib
        only; reload with :meth:`load_tokenizer`."""
        import os

        lp = self._require_fit()
        os.makedirs(path, exist_ok=True)
        ordered = sorted(lp.items(), key=lambda pv: (-pv[1], pv[0]))
        with open(os.path.join(path, "unigram.vocab"), "w",
                  encoding="utf-8") as f:
            for p, v in ordered:
                f.write(f"{p}\t{v!r}\n")
        with open(os.path.join(path, "meta.json"), "w",
                  encoding="utf-8") as f:
            json.dump(
                {
                    "type": "unigram",
                    "vocab_size": self.vocab_size,
                    "seed_size": self.seed_size,
                    "n_iter": self.n_iter,
                    "max_piece_len": self.max_piece_len,
                    "lowercase": self.lowercase,
                },
                f,
                sort_keys=True,
            )

    def export_tokenizer_json(self, path: str) -> None:
        """Write the single-file HuggingFace ``tokenizer.json``
        interchange for the unigram model — ``model.vocab`` is the
        ``[[piece, logprob], ...]`` list in :meth:`vocabulary` id
        order (index == id, the HF Unigram layout), ``unk_id`` null
        (this trainer segments unknown single chars with a fixed
        penalty rather than an unk piece); the pre_tokenizer records
        the SentencePiece word treatment (Metaspace with the ``▁``
        mark this trainer prefixes). Stdlib json, driver-side,
        model-sized. ``path`` is the FILE path.

        An instance that IMPORTED a tokenizer.json re-exports its
        source document verbatim (re-deriving a foreign layout from
        this engine's sections could silently drop fields — the
        BpeVocabBuilder contract)."""
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
        lp = self._require_fit()
        ordered = sorted(lp.items(), key=lambda pv: (-pv[1], pv[0]))
        doc = {
            "version": "1.0",
            "truncation": None,
            "padding": None,
            "added_tokens": [],
            "normalizer": (
                {"type": "Lowercase"} if self.lowercase else None
            ),
            "pre_tokenizer": {
                "type": "Metaspace",
                "replacement": WORD_MARK,
                "prepend_scheme": "always",
                "split": True,
            },
            "post_processor": None,
            "decoder": {
                "type": "Metaspace",
                "replacement": WORD_MARK,
                "prepend_scheme": "always",
                "split": True,
            },
            "model": {
                "type": "Unigram",
                "unk_id": None,
                "vocab": [[p, v] for p, v in ordered],
                "byte_fallback": False,
            },
        }
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(doc, f, ensure_ascii=False, indent=2)

    def load_tokenizer(self, path: str, spark) -> "UnigramVocabBuilder":
        """Restore log-probs from a :meth:`save_tokenizer` dir; the
        fitted word-piece table rebuilds lazily from the model (every
        word re-segments identically under the same log-probs). The
        ``repr``-formatted floats round-trip exactly."""
        import os

        lp: dict[str, float] = {}
        with open(os.path.join(path, "unigram.vocab"),
                  encoding="utf-8") as f:
            for line in f:
                if not line.rstrip("\n"):
                    continue
                piece, val = line.rstrip("\n").split("\t")
                lp[piece] = float(val)
        self.logprobs_ = lp
        self.vocab_order_ = None  # .vocab ids re-derive from the sort
        self.word_pieces_ = spark.createDataFrame(
            [], "word string, pieces array<string>"
        )
        self._fitted = True
        return self

    def load_tokenizer_json(
        self, path: str, spark, split_specials: bool = True
    ) -> "UnigramVocabBuilder":
        """Load a HuggingFace ``tokenizer.json`` Unigram model and make
        this instance encode/decode with it at corpus scale — the
        inverse of :meth:`export_tokenizer_json`, so a tokenizer
        trained elsewhere (or exported by this class) can be APPLIED by
        the distributed encode path without refitting.

        ``model.vocab`` ([[piece, logprob], ...]) supplies both the
        log-probs and the id layout (HF Unigram: index == id —
        preserved verbatim, never re-sorted). The word-piece table
        starts EMPTY, so every corpus word re-segments under the
        loaded model (identical results — segmentation is a pure
        function of the log-probs), and ``max_unseen_words`` is
        cleared.

        r13 — the published-file matrix (T5/XLNet-style layouts):

        - **Metaspace**, any ``prepend_scheme`` (always/first/never)
          and the legacy ``add_prefix_space`` key; imported models
          segment by the FILE's law exactly — only ' ' becomes the
          mark, pieces split at every mark (runs of spaces produce
          bare-mark pieces).
        - **normalizer chains**: None, solo Lowercase (pure-JVM), or
          a Sequence of Precompiled (the SentencePiece charsmap,
          parsed by :mod:`..functions.charsmap` from the public
          darts-clone format), Replace (String/Regex), Lowercase,
          Strip, and NFC/NFD/NFKC/NFKD — applied EXACTLY in one
          Arrow-batched Python pass (the documented slow-path
          exception; grapheme approximation caveat in the charsmap
          module docstring). Anything else rejects loudly.
        - **unknown-piece semantics**: ``model.unk_id`` maps uncovered
          pieces to the unk id (consecutive unknowns FUSE to one id,
          the SentencePiece default — override with an explicit
          ``fuse_unk`` key); ``byte_fallback`` expands them to
          ``<0xXX>`` ids instead. Without either, the -1 sentinel.
        - **added_tokens** (T5's ``<extra_id_*>`` sentinels) join the
          id map, and — HF AddedToken semantics, default on — their
          contents are isolated from corpus text before normalization
          so a literal sentinel encodes to its own id
          (``split_specials=False`` restores plain behavior; lstrip/
          rstrip/single_word matching flags reject loudly)."""
        from ..functions.charsmap import parse_norm_chain

        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
        model = doc.get("model") or {}
        ensure(
            model.get("type") == "Unigram",
            f"tokenizer.json at '{path}' has model.type="
            f"{model.get('type')!r}; this loader reads Unigram models "
            "(use BpeVocabBuilder.load_tokenizer_json for BPE)",
        )
        vocab = model.get("vocab") or []
        ensure(bool(vocab), f"tokenizer.json at '{path}' has no vocab")
        lowercase, chain = parse_norm_chain(
            doc.get("normalizer"), path
        )
        pre = doc.get("pre_tokenizer") or {}
        scheme = pre.get("prepend_scheme")
        if scheme is None:
            # legacy key
            scheme = (
                "always" if pre.get("add_prefix_space", True)
                else "never"
            )
        ensure(
            pre.get("type") == "Metaspace"
            and pre.get("replacement") == WORD_MARK
            and scheme in ("always", "first", "never")
            and pre.get("split", True) is not False,
            f"unsupported pre_tokenizer {pre!r}: this engine "
            f"reproduces Metaspace with replacement '{WORD_MARK}' "
            "and split=true only — other shapes segment differently, "
            "a silent id mismatch",
        )
        pieces = [str(p) for p, _ in vocab]
        ensure(
            len(set(pieces)) == len(pieces),
            f"tokenizer.json at '{path}' has duplicate vocab pieces",
        )
        unk_id = model.get("unk_id")
        if unk_id is not None:
            unk_id = int(unk_id)
            ensure(
                0 <= unk_id < len(pieces),
                f"unk_id {unk_id} is outside the vocab of '{path}'",
            )
        added: dict[str, int] = {}
        specials: list[str] = []
        piece_set = set(pieces)
        for at in doc.get("added_tokens") or []:
            tok, tid = at.get("content"), at.get("id")
            if tok is None or tid is None:
                continue
            tok = str(tok)
            if tok not in piece_set:
                added[tok] = int(tid)
            if split_specials and tok:
                flags = [
                    f for f in ("lstrip", "rstrip", "single_word")
                    if at.get(f)
                ]
                ensure(
                    not flags,
                    f"added token {tok!r} in '{path}' sets "
                    f"{'/'.join(flags)}: this engine matches specials "
                    "as plain literals only (load with "
                    "split_specials=False to skip isolation)",
                )
                specials.append(tok)
        self.lowercase = lowercase
        self.logprobs_ = {str(p): float(v) for p, v in vocab}
        self.vocab_order_ = pieces
        self.added_ids_ = added
        self._special_tokens = sorted(
            set(specials), key=lambda t: (-len(t), t)
        )
        self._byte_fallback = bool(model.get("byte_fallback"))
        self._unk_id = unk_id
        self._fuse_unk = bool(model.get("fuse_unk", unk_id is not None))
        self._prepend = scheme in ("always", "first")
        self._prepend_scheme = scheme
        self._norm_chain = chain
        self._loaded_doc = doc
        from ..functions.charsmap import (
            parse_post_processor,
            parse_truncation,
        )

        self._tmpl = parse_post_processor(doc.get("post_processor"))
        self._trunc = parse_truncation(doc.get("truncation"), path)
        # the segmenter only proposes candidates up to max_piece_len:
        # a published file's longest piece must stay reachable or its
        # ids silently never appear (the trainer default is 8; real
        # models carry much longer pieces)
        self.max_piece_len = max(
            self.max_piece_len, max(len(p) for p in pieces)
        )
        self.max_unseen_words = None
        self.word_pieces_ = spark.createDataFrame(
            [], "word string, pieces array<string>"
        )
        self._fitted = True
        return self
