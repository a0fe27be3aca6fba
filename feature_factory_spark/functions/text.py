"""Text expression builders — words, shingles, hashes.

All JVM-side Column expressions (split / transform / filter / aggregate
higher-order functions); zero Python UDFs. These are the shared primitives
under the text-analysis and dedup operators.

The reference implements no text operators at all (SURVEY.md §2.3); this
module is part of the beyond-reference LLM-data-pipeline surface the
engine targets at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword lists for the language-ID heuristic and the
# stopword-ratio feature. Deliberately tiny and hard-coded: the heuristic
# must be reproducible in the ANSI-SQL oracle.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"),
}

# BPE-ish pre-tokenization: letter runs, single digits, single punctuation
# marks — the GPT-2 pre-tokenizer family, simplified so the same pattern
# behaves identically under Java regex (Spark) and RE2 (DuckDB).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def words_expr(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array (a plain
    split would yield [''])."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def word_count_expr(text: Column) -> Column:
    return F.size(words_expr(text))


def ngrams_expr(words: Column, n: int) -> Column:
    """All n-word grams (multiset, order preserved) joined with spaces.
    Documents with fewer than n words contribute the whole text as one
    gram (matching the previous index-clamp behavior, including the
    single empty-string gram for an empty word array).

    Extraction is ONE ``regexp_extract_all`` over the space-joined
    words: ``(?<!\\S)`` anchors each match at a word start and the
    zero-width lookahead captures the next n words, so every
    overlapping gram comes out of a single regex pass. The previous
    formulation (``transform(idx, i -> array_join(slice(words, i, n)))``)
    referenced ``words`` from inside the lambda, and Catalyst inlines
    outer expressions at every lambda evaluation site — callers passing
    ``words_expr(text)`` re-ran the trim+split chain once PER GRAM
    (the same plan pathology fixed in NgramLanguageIdentifier, r7).

    The single-space join assumes array elements contain no whitespace.
    Empty-string elements (which would collapse into double delimiters
    and silently drop grams) are filtered out first — a no-op for
    ``words_expr`` output, which never yields them. Tokens with INTERNAL
    whitespace remain unsupported: they would split into multiple words
    at the join, so pre-tokenize such input before calling."""
    words = F.when(
        words.isNotNull(), F.filter(words, lambda w: w != "")
    )
    joined = F.array_join(words, " ")
    pattern = r"(?<!\S)(?=((?:\S+ ){%d}\S+))" % (n - 1)
    return F.when(
        # NULL words: the index-clamp form yielded one NULL gram; keep
        # that contract (downstream hash/explode behavior depends on a
        # row surviving)
        words.isNull(), F.array(F.lit(None).cast("string"))
    ).when(
        F.size(words) < n, F.array(joined)
    ).otherwise(F.regexp_extract_all(joined, F.lit(pattern), 1))


def shingles_expr(words: Column, n: int) -> Column:
    """Distinct n-word shingles joined with spaces. Documents with fewer
    than n words contribute the whole text as one shingle (index sequence
    clamps at 1), matching ``words[i : i+n-1]`` slicing in the oracle."""
    return F.array_distinct(ngrams_expr(words, n))


def max_run_expr(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a SORTED
    array — i.e. the count of the most frequent element — via one
    aggregate fold (struct accumulator: previous value, current run,
    best run)."""
    init = F.named_struct(
        F.lit("prev"), F.lit(None).cast("string"),
        F.lit("run"), F.lit(0),
        F.lit("best"), F.lit(0),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.named_struct(
            F.lit("prev"), x,
            F.lit("run"), run,
            F.lit("best"), F.greatest(acc["best"], run),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def jaccard_expr(a: Column, b: Column) -> Column:
    """Jaccard similarity of two distinct-element array columns."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.try_divide(inter, union)


def normalized_text_expr(text: Column) -> Column:
    """lowercase + collapse whitespace runs — the canonical form used by
    fingerprints and exact dedup."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def stopword_hits_expr(words: Column, stopwords: tuple[str, ...]) -> Column:
    """Number of tokens (multiset, not distinct) that are stopwords."""
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(
        F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w)))
    )


# ---------------------------------------------------------------------------
# Hashing primitives for MinHash / SimHash
# ---------------------------------------------------------------------------

MERSENNE_P31 = (1 << 31) - 1  # universal-hash modulus


def base_hash_expr(s: Column) -> Column:
    """32-bit murmur3 hash of a string, lifted to non-negative bigint mod
    p = 2^31 - 1. Kept in 31 bits so the (a*h + b) universal re-hash never
    overflows a signed 64-bit product (Spark 4 runs ANSI mode: bigint
    overflow is an error, not a wrap)."""
    return F.pmod(F.hash(s).cast("bigint"), F.lit(MERSENNE_P31))


def universal_rehash_expr(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod p — one MinHash permutation. a, b < 2^31 and h < 2^31,
    so a*h < 2^62 stays inside signed-64 range."""
    return F.pmod(F.lit(a) * h + F.lit(b), F.lit(MERSENNE_P31))
