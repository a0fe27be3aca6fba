"""Property tests for the r12 imported-tokenizer paths: the byte-level
and metaspace apply-modes must round-trip ARBITRARY text exactly
(their segmentations cover every character), the engine's GPT-2 regex
segmentation must agree with the pure-Python reference on ASCII, and
the rank-dict merge path must equal the fold chain on random words.

Driver-side hypothesis generates the corpus; ONE Spark job per case
batch keeps the suite fast."""

import json

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from feature_factory_spark.operators.bpe import (
    _B2U,
    BpeVocabBuilder,
)

_SP = "▁"


def _byte_vocab(merges):
    vocab = {t: i for i, t in enumerate(sorted(set(_B2U.values())))}
    for l, r in merges:
        vocab.setdefault(l + r, len(vocab))
    return vocab


_BL_MERGES = [["Ġ", "t"], ["h", "e"], ["Ġt", "he"], ["l", "l"],
              ["e", "ll"], ["a", "n"], ["an", "d"], ["i", "n"]]


@pytest.fixture(scope="module")
def bytelevel_op(spark, tmp_path_factory):
    doc = {
        "normalizer": None,
        "pre_tokenizer": {"type": "ByteLevel",
                          "add_prefix_space": False, "use_regex": True},
        "model": {"type": "BPE", "continuing_subword_prefix": None,
                  "end_of_word_suffix": None,
                  "vocab": _byte_vocab(_BL_MERGES),
                  "merges": [f"{l} {r}" for l, r in _BL_MERGES]},
    }
    p = str(tmp_path_factory.mktemp("blprop") / "t.json")
    json.dump(doc, open(p, "w"))
    return BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
        p, spark
    )


@pytest.fixture(scope="module")
def metaspace_op(spark, tmp_path_factory):
    merges = [[_SP, "t"], ["h", "e"], [_SP + "t", "he"],
              [_SP, _SP], [_SP + _SP, _SP + _SP]]
    vocab = {"<unk>": 0}
    for b in range(256):
        vocab["<0x%02X>" % b] = len(vocab)
    for ch in list("abcdefghijklmnopqrstuvwxyz0123456789 .,!?'") + [_SP]:
        if ch != " ":
            vocab.setdefault(ch, len(vocab))
    for l, r in merges:
        vocab.setdefault(l + r, len(vocab))
    doc = {
        "normalizer": {"type": "Sequence", "normalizers": [
            {"type": "Prepend", "prepend": _SP},
            {"type": "Replace", "pattern": {"String": " "},
             "content": _SP}]},
        "pre_tokenizer": None,
        "model": {"type": "BPE", "continuing_subword_prefix": None,
                  "end_of_word_suffix": None, "byte_fallback": True,
                  "vocab": vocab,
                  "merges": [f"{l} {r}" for l, r in merges]},
    }
    p = str(tmp_path_factory.mktemp("spprop") / "t.json")
    json.dump(doc, open(p, "w"))
    return BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
        p, spark
    )


# text WITHOUT the mark char itself (a literal '▁' in source text is
# indistinguishable from an encoded space — the published layout's own
# documented lossiness, not this engine's)
_text_no_mark = st.text(
    st.characters(blacklist_characters=[_SP], blacklist_categories=("Cs",)),
    max_size=40,
)
_any_text = st.text(
    st.characters(blacklist_categories=("Cs",)), max_size=40
)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_any_text, min_size=1, max_size=12))
def test_bytelevel_roundtrip_any_text(spark, bytelevel_op, texts):
    # the GPT-2 segmentation covers every character and the byte
    # alphabet covers every byte: decode(encode(x)) == x for ALL text
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )
    out = bytelevel_op.decode_ids(bytelevel_op.encode_ids(df))
    got = {r["doc_id"]: r["text_bpe_ids_text"] for r in out.collect()}
    for i, t in enumerate(texts):
        assert got[i] == t, repr(t)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_text_no_mark, min_size=1, max_size=12))
def test_metaspace_roundtrip(spark, metaspace_op, texts):
    # byte_fallback covers every out-of-vocab char, the mark carries
    # the spaces: decode(encode(x)) == x for any mark-free text
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )
    out = metaspace_op.decode_ids(metaspace_op.encode_ids(df))
    got = {r["doc_id"]: r["text_bpe_ids_text"] for r in out.collect()}
    for i, t in enumerate(texts):
        assert got[i] == t, repr(t)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=st.lists(
    st.text(st.characters(blacklist_categories=("Cs",)), max_size=16),
    min_size=1, max_size=16,
))
def test_rank_path_equals_chain_path_random_words(
        spark, bytelevel_op, words):
    # the Arrow rank-dict path (real published tables) and the
    # pure-JVM fold chain are the same function
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    cutoff = bytelevel_op._CHAIN_MERGE_CUTOFF
    try:
        bytelevel_op._CHAIN_MERGE_CUTOFF = 10_000
        chain = sorted(
            map(tuple, bytelevel_op.tokenize_words(wdf).collect())
        )
        bytelevel_op._CHAIN_MERGE_CUTOFF = 0
        ranked = sorted(
            map(tuple, bytelevel_op.tokenize_words(wdf).collect())
        )
    finally:
        bytelevel_op._CHAIN_MERGE_CUTOFF = cutoff
    assert chain == ranked


def _have_regex():
    try:
        import regex  # noqa: F401
        return True
    except ImportError:
        return False


# Segmentation parity is checked over VERSION-STABLE codepoints: the
# JVM (Java 17 = Unicode 13) and the Python `regex` module ship
# different Unicode tables, so a codepoint assigned in a newer version
# (hypothesis found U+18D80, a letter to `regex` but unassigned to the
# JVM) flips \p{L} membership between engines — a table-version
# artifact, not a pattern divergence. The alphabet below exercises
# every class the pattern distinguishes (letters across scripts incl.
# astral CJK-ext-B, digits incl. non-ASCII, marks, punctuation,
# symbols/emoji, ASCII + Unicode whitespace, controls) using blocks
# stable since well before Unicode 13.
_STABLE_ALPHABET = st.sampled_from(
    list(
        "abXZ09.,!?':;()[]#@%&*+=/\\\"-_ \t\n\r"
        "éßüñÆøçЖщДλΩθאבابت中文日本語한글ไทย"
        "١٢٣০৯①½"
        "   　"   # unicode whitespace
        "่́"               # combining marks
        "€£¥©®™°±×÷§¶"
        "🙂🚀✨"
    )
    + ["\U00020000", "\U0002A700", "\x00", "\x1b", "​"]
)


@pytest.mark.skipif(not _have_regex(), reason="'regex' module absent")
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(
    st.text(_STABLE_ALPHABET, max_size=48),
    min_size=1, max_size=16,
))
def test_java_gpt2_segmentation_matches_regex_module(spark, texts):
    # the engine's (?U) Java pattern must segment EXACTLY like the
    # original GPT-2 encoder.py pattern under the Python `regex`
    # module's full-Unicode semantics (\p{L}/\p{N}/Unicode \s) — the
    # property that makes the apply-mode's piece grain faithful on
    # any text, not just ASCII
    import regex

    from pyspark.sql import functions as F

    from feature_factory_spark.operators.bpe import GPT2_SPLIT_RE

    pat = regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"""
        r"""| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i bigint, t string"
    )
    got = {
        r["i"]: list(r["p"])
        for r in df.select(
            "i",
            F.regexp_extract_all(
                "t", F.lit(GPT2_SPLIT_RE), 0
            ).alias("p"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == pat.findall(t), repr(t)


# the REAL Llama-3 / tiktoken-style split pattern (public: shipped in
# the model's tokenizer.json pre_tokenizer Split entry)
_LLAMA3_PAT = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+"
    r"|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+"
    r"|\s+(?!\S)|\s+"
)


@pytest.mark.skipif(not _have_regex(), reason="'regex' module absent")
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(
    st.text(_STABLE_ALPHABET, max_size=48),
    min_size=1, max_size=16,
))
def test_llama3_split_pattern_runs_and_matches(spark, texts):
    # the published Llama-3 Split regex must run under Java with the
    # loader's (?U) prefix and segment exactly like the Unicode
    # `regex` engine the source runtime uses
    import regex

    from pyspark.sql import functions as F

    pat = regex.compile(_LLAMA3_PAT)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i bigint, t string"
    )
    got = {
        r["i"]: list(r["p"])
        for r in df.select(
            "i",
            F.regexp_extract_all(
                "t", F.lit("(?U)" + _LLAMA3_PAT), 0
            ).alias("p"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == pat.findall(t), repr(t)


def test_llama3_layout_with_real_pattern_loads(spark, tmp_path):
    # a Llama-3-shaped file carrying the REAL split pattern loads and
    # encodes (ignore_merges on, added specials in the id map)
    doc = {
        "normalizer": None,
        "pre_tokenizer": {"type": "Sequence", "pretokenizers": [
            {"type": "Split", "pattern": {"Regex": _LLAMA3_PAT},
             "behavior": "Isolated", "invert": False},
            {"type": "ByteLevel", "add_prefix_space": False,
             "trim_offsets": True, "use_regex": False}]},
        "added_tokens": [{"id": 999, "content": "<|eot|>",
                          "special": True}],
        "model": {"type": "BPE", "continuing_subword_prefix": None,
                  "end_of_word_suffix": None, "ignore_merges": True,
                  "vocab": _byte_vocab(_BL_MERGES),
                  "merges": [f"{l} {r}" for l, r in _BL_MERGES]},
    }
    p = str(tmp_path / "l3.json")
    json.dump(doc, open(p, "w"))
    op = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(p, spark)
    assert op._ignore_merges and op._split_pattern == _LLAMA3_PAT
    assert op.vocab_json_["<|eot|>"] == 999
    df = spark.createDataFrame(
        [(0, "the and in 12345 hello")], "doc_id bigint, text string"
    )
    ids = list(op.encode_ids(df).collect()[0]["text_bpe_ids"])
    assert len(ids) > 0 and all(isinstance(v, int) for v in ids)
    # round-trip stays exact through the real pattern
    rt = op.decode_ids(op.encode_ids(df)).collect()[0]
    assert rt["text_bpe_ids_text"] == "the and in 12345 hello"
