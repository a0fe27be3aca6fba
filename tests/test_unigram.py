"""UnigramVocabBuilder (r9 brief item 4): SentencePiece-style
unigram-LM tokenizer — trainer vs the independent pure-Python EM
reference, Viterbi vs the recursive reference segmenter, encode/decode
round-trips, state + tokenizer-file persistence."""

import math

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.operators.unigram import (
    UNK_PENALTY,
    WORD_MARK,
    reference_segment,
    reference_unigram,
    seed_counts,
    train_unigram,
    viterbi_segment,
)

CORPUS = [
    (1, "internationalization and internal nation nations"),
    (2, "the nation of internal national internationalization"),
    (3, "intern at the national internal station"),
    (4, "stations nations internationalization the the the"),
]


def wc_of(rows):
    out = {}
    for _, t in rows:
        for w in t.lower().split():
            out[w] = out.get(w, 0) + 1
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


# --- pure-python trainer vs the independent reference ------------------

def test_trainer_matches_reference_exactly():
    wc = wc_of(CORPUS)
    got = train_unigram(wc, vocab_size=40, seed_size=120, n_iter=2,
                        max_piece_len=6)
    ref = reference_unigram(wc, vocab_size=40, seed_size=120, n_iter=2,
                            max_piece_len=6)
    assert set(got) == set(ref)
    for p in got:
        assert got[p] == ref[p], p  # bit-exact logprobs
    # probs normalize (piece distribution sums to 1)
    assert math.isclose(sum(math.exp(v) for v in got.values()), 1.0,
                        rel_tol=1e-9)


def test_trainer_keeps_alphabet_and_caps_vocab():
    wc = wc_of(CORPUS)
    lp = train_unigram(wc, vocab_size=12, seed_size=120, n_iter=1,
                       max_piece_len=6)
    chars = {c for w, _ in wc for c in w}
    assert chars <= set(lp)
    assert len(lp) <= 12 + len(chars)  # alphabet always survives


def test_viterbi_matches_recursive_reference_on_every_word():
    wc = wc_of(CORPUS)
    lp = train_unigram(wc, vocab_size=40, seed_size=120, n_iter=2,
                       max_piece_len=6)
    for w, _ in wc:
        assert viterbi_segment(w, lp, 6) == reference_segment(w, lp, 6), w
    # unknown chars segment as single-char unk pieces
    assert viterbi_segment("qqz", lp, 6) == ["q", "q", "z"]
    assert reference_segment("qqz", lp, 6) == ["q", "q", "z"]


def test_seed_counts_weighted_by_occurrences():
    sc = seed_counts([("aa", 3)], 2)
    assert sc == {"a": 6, "aa": 3}


def test_segmentation_prefers_high_probability_pieces():
    lp = {"na": math.log(0.4), "tion": math.log(0.4),
          "n": math.log(0.05), "a": math.log(0.05),
          "t": math.log(0.03), "i": math.log(0.03), "o": math.log(0.04)}
    assert viterbi_segment("nation", lp, 8) == ["na", "tion"]


# --- Spark operator ----------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def fitted(docs):
    return ff.UnigramVocabBuilder(
        "text", "doc_id", vocab_size=40, seed_size=120, n_iter=2,
        max_piece_len=6,
    ).fit(docs)


def test_fit_matches_reference_on_spark_word_table(fitted):
    ref = reference_unigram(fitted.fit_word_counts_, 40, 120, 2, 6)
    assert fitted.logprobs_ == ref


def test_seed_count_frame_matches_python(fitted, docs, spark):
    words = spark.createDataFrame(
        fitted.fit_word_counts_, "word string, cnt long"
    )
    got = {r["piece"]: r["cnt"]
           for r in fitted.seed_count_frame(words).collect()}
    assert got == seed_counts(fitted.fit_word_counts_, 6)


def test_encode_matches_reference_segmentation(fitted, docs):
    segs = {r["doc_id"]: r["text_unigram_pieces"]
            for r in fitted.encode(docs).collect()}
    for i, t in CORPUS:
        expect = [p for w in t.lower().split()
                  for p in reference_segment(WORD_MARK + w,
                                             fitted.logprobs_, 6)]
        assert segs[i] == expect, i


def test_encode_ids_decode_roundtrip(fitted, docs, spark):
    ids = fitted.encode_ids(docs)
    dec = fitted.decode_ids(ids)
    got = {r["doc_id"]: r["text_unigram_ids_text"] for r in dec.collect()}
    for i, t in CORPUS:
        assert got[i] == " ".join(t.lower().split()), i
    # unknown id -> U+FFFD
    mangled = ids.withColumn(
        "bad", F.concat("text_unigram_ids", F.array(F.lit(99999)))
    )
    out = fitted.decode_ids(mangled, ids_col="bad").collect()[0]["bad_text"]
    assert out.endswith("�")


def test_transform_token_count(fitted, docs):
    got = {r["doc_id"]: r["text_unigram_token_count"]
           for r in fitted.transform(docs).collect()}
    for i, t in CORPUS:
        expect = sum(len(reference_segment(WORD_MARK + w,
                                           fitted.logprobs_, 6))
                     for w in t.lower().split())
        assert got[i] == expect


def test_unseen_words_segment_with_fitted_model(fitted, spark):
    # words absent from the fit corpus still segment (driver-side
    # Viterbi over the capped unseen set)
    new = spark.createDataFrame(
        [(9, "internality interns the")], "doc_id bigint, text string"
    )
    segs = fitted.encode(new).collect()[0]["text_unigram_pieces"]
    expect = [p for w in "internality interns the".split()
              for p in reference_segment(WORD_MARK + w,
                                         fitted.logprobs_, 6)]
    assert segs == expect


def test_unseen_cap_fail_loud(docs, spark):
    op = ff.UnigramVocabBuilder(
        "text", "doc_id", vocab_size=40, seed_size=120,
        max_unseen_words=2,
    ).fit(docs)
    many = spark.createDataFrame(
        [(1, "zz1 zz2 zz3 zz4 zz5")], "doc_id bigint, text string"
    )
    with pytest.raises(Exception, match="max_unseen_words"):
        op.encode(many).collect()


def test_null_and_empty_text(fitted, spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "the")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r for r in
            fitted.decode_ids(fitted.encode_ids(df)).collect()}
    assert rows[1]["text_unigram_ids"] == []
    assert rows[2]["text_unigram_ids"] == []
    assert rows[3]["text_unigram_ids_text"] == "the"


def test_state_roundtrip(fitted, docs, spark, tmp_path):
    fitted.save_state(str(tmp_path / "state"))
    restored = ff.UnigramVocabBuilder(
        "text", "doc_id", vocab_size=40, seed_size=120, n_iter=2,
        max_piece_len=6,
    ).load_state(str(tmp_path / "state"), spark)
    assert restored.logprobs_ == fitted.logprobs_
    a = {r["doc_id"]: r["text_unigram_pieces"]
         for r in fitted.encode(docs).collect()}
    b = {r["doc_id"]: r["text_unigram_pieces"]
         for r in restored.encode(docs).collect()}
    assert a == b


def test_tokenizer_file_roundtrip(fitted, docs, spark, tmp_path):
    import os

    path = str(tmp_path / "tok")
    fitted.save_tokenizer(path)
    lines = open(os.path.join(path, "unigram.vocab"),
                 encoding="utf-8").read().splitlines()
    # spm_export_vocab layout: piece<TAB>logprob, line order = id order
    assert all("\t" in ln for ln in lines)
    assert len(lines) == len(fitted.logprobs_)
    restored = ff.UnigramVocabBuilder(
        "text", "doc_id", vocab_size=40, seed_size=120, n_iter=2,
        max_piece_len=6,
    ).load_tokenizer(path, spark)
    assert restored.logprobs_ == fitted.logprobs_  # repr round-trips
    a = {r["doc_id"]: r["text_unigram_ids"]
         for r in fitted.encode_ids(docs).collect()}
    b = {r["doc_id"]: r["text_unigram_ids"]
         for r in restored.encode_ids(docs).collect()}
    assert a == b


def test_vocabulary_id_layout(fitted):
    rows = fitted.vocabulary().orderBy("id").collect()
    lps = [r["logprob"] for r in rows]
    assert lps == sorted(lps, reverse=True)
    assert rows[0]["id"] == 0
    assert len(rows) == len(fitted.logprobs_)


def test_validation():
    with pytest.raises(Exception, match="seed_size"):
        ff.UnigramVocabBuilder("t", "i", vocab_size=100, seed_size=10)
    with pytest.raises(Exception, match="vocab_size"):
        ff.UnigramVocabBuilder("t", "i", vocab_size=1)


# --- fit_mode='distributed': the uncapped-vocabulary path ---------------

def test_distributed_fit_is_bit_identical_to_driver(docs, fitted):
    dist = ff.UnigramVocabBuilder(
        "text", "doc_id", vocab_size=40, seed_size=120, n_iter=2,
        max_piece_len=6, fit_mode="distributed",
    ).fit(docs)
    # integer-count EM on the same word table: models match EXACTLY
    assert dist.logprobs_ == fitted.logprobs_
    # the word table was never collected, by design
    assert dist.fit_word_counts_ is None
    a = {r["doc_id"]: r["text_unigram_pieces"]
         for r in fitted.encode(docs).collect()}
    b = {r["doc_id"]: r["text_unigram_pieces"]
         for r in dist.encode(docs).collect()}
    assert a == b


def test_distributed_fit_mode_validation():
    with pytest.raises(Exception, match="fit_mode"):
        ff.UnigramVocabBuilder("t", "i", vocab_size=10, seed_size=20,
                               fit_mode="cluster")
