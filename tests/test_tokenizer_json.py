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


def test_export_requires_fit(spark, tmp_path):
    with pytest.raises(Exception):
        BpeVocabBuilder("text", "doc_id").export_tokenizer_json(
            str(tmp_path / "t.json")
        )
    with pytest.raises(Exception):
        UnigramVocabBuilder("text", "doc_id").export_tokenizer_json(
            str(tmp_path / "t.json")
        )
