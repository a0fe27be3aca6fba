"""Distributed BPE induction (operators/bpe.py) vs the pure-Python
reference implementation."""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.operators.bpe import (
    END_MARK,
    induce_bpe,
    reference_bpe,
    reference_tokenize,
)

TEXTS = [
    "the lowest lower low lowering lowered",
    "newer newest new news newly",
    "the widest wider wide widely the",
    "slower slowest slow slowly the lowest newest",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    )


@pytest.fixture(scope="module")
def fitted(docs):
    op = ff.BpeVocabBuilder("text", "doc_id", num_merges=20)
    op.fit(docs)
    yield op
    op.release()


def test_merges_match_reference(fitted, docs):
    wc = [(r["word"], r["cnt"]) for r in fitted.word_counts(docs).collect()]
    ref = reference_bpe(wc, 20)
    assert [tuple(m) for m in fitted.merges_] == ref
    assert len(ref) == 20  # corpus supports all requested merges


def test_token_counts_match_reference(fitted, docs):
    ref = [tuple(m) for m in fitted.merges_]
    got = {
        r["doc_id"]: r["text_bpe_token_count"]
        for r in fitted.transform(docs).collect()
    }
    expect = {
        i: sum(len(reference_tokenize(w, ref)) for w in t.lower().split())
        for i, t in enumerate(TEXTS)
    }
    assert got == expect


def test_unseen_words_tokenized_exactly(fitted, spark):
    ref = [tuple(m) for m in fitted.merges_]
    u = spark.createDataFrame(
        [(20, "unseen lowering zebra")], "doc_id bigint, text string"
    )
    expected = sum(
        len(reference_tokenize(w, ref)) for w in "unseen lowering zebra".split()
    )
    assert fitted.transform(u).collect()[0]["text_bpe_token_count"] == expected


def test_max_unseen_words_guard(docs, spark):
    # r8 (VERDICT r7 item 6): a corpus with a unique token per document
    # would silently turn the cheap table join into a corpus-distinct
    # merge-chain job; the opt-in cap fails loudly instead.
    from feature_factory_spark.exceptions import InvalidParameterError

    op = ff.BpeVocabBuilder(
        "text", "doc_id", num_merges=8, max_unseen_words=3
    )
    op.fit(docs)
    try:
        degenerate = spark.createDataFrame(
            [(i, f"id{i}x{i * 7} the") for i in range(10)],
            "doc_id bigint, text string",
        )
        with pytest.raises(InvalidParameterError, match="max_unseen_words"):
            op.transform(degenerate).collect()
        with pytest.raises(InvalidParameterError, match="max_unseen_words"):
            op.encode_ids(degenerate).collect()
        # at-or-under the cap passes and still tokenizes exactly
        ok = spark.createDataFrame(
            [(0, "zebra quartz the")], "doc_id bigint, text string"
        )
        ref = [tuple(m) for m in op.merges_]
        expected = sum(
            len(reference_tokenize(w, ref)) for w in "zebra quartz the".split()
        )
        assert op.transform(ok).collect()[0]["text_bpe_token_count"] == expected
    finally:
        op.release()


def test_empty_and_null_text_count_zero(fitted, spark):
    e = spark.createDataFrame(
        [(10, ""), (11, None), (12, "   ")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["text_bpe_token_count"]
           for r in fitted.transform(e).collect()}
    assert got == {10: 0, 11: 0, 12: 0}


def test_greedy_overlap_semantics():
    # 'aaa' + (a,a) -> [aa, a]; 'aaaa' -> [aa, aa]
    assert reference_tokenize("aaa", [("a", "a")]) == ["aa", "a", END_MARK]
    assert reference_tokenize("aaaa", [("a", "a")]) == ["aa", "aa", END_MARK]


def test_deterministic_across_partitionings(docs):
    a = ff.BpeVocabBuilder("text", "doc_id", num_merges=8)
    a.fit(docs)
    b = ff.BpeVocabBuilder("text", "doc_id", num_merges=8)
    b.fit(docs.repartition(7))
    assert a.merges_ == b.merges_
    a.release()
    b.release()


def test_min_pair_count_stops_induction(spark):
    # every word unique, every pair count 1 -> no merges at the default
    # min_pair_count=2
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id bigint, text string")
    op = ff.BpeVocabBuilder("text", "doc_id", num_merges=5)
    op.fit(df)
    assert op.merges_ == []
    op.release()


def test_indexed_trainer_matches_naive_recount():
    # induce_bpe maintains pair counts incrementally; these fixtures
    # stress exactly what incremental updates can get wrong — greedy
    # overlap runs, count ties, and stale pair->word index entries
    # (words rewritten by earlier merges re-selected by later ones)
    fixtures = [
        [("aaaa", 3), ("aaab", 2), ("baaa", 1)],
        [("ab", 5), ("cd", 5), ("abcd", 5), ("dcba", 5)],
        [(w, c) for c, w in enumerate(
            ["lowest", "lower", "low", "newest", "newer", "wide",
             "widest", "slowly", "slowest", "aaa", "aab", "abb"], 2)],
        [("xy", 2)],
        [("q", 9)],
    ]
    for wc in fixtures:
        for n in (1, 3, 8, 40):
            merges, tok, syms = induce_bpe(wc, n)
            assert merges == reference_bpe(wc, n), (wc, n)
            assert tok == {
                w: len(reference_tokenize(w, merges)) for w, _ in wc
            }, (wc, n)
            assert syms == {
                w: reference_tokenize(w, merges) for w, _ in wc
            }, (wc, n)


def test_distributed_loop_matches_driver_mode(docs):
    a = ff.BpeVocabBuilder("text", "doc_id", num_merges=8)
    a.fit(docs)
    b = ff.BpeVocabBuilder(
        "text", "doc_id", num_merges=8, fit_mode="distributed"
    )
    b.fit(docs)
    assert a.merges_ == b.merges_
    ta = {r["word"]: r["n_tokens"] for r in a.word_tokens_.collect()}
    tb = {r["word"]: r["n_tokens"] for r in b.word_tokens_.collect()}
    assert ta == tb
    a.release()
    b.release()


def test_state_roundtrip(fitted, docs, spark, tmp_path):
    path = str(tmp_path / "bpe_state")
    fitted.save_state(path)
    restored = ff.BpeVocabBuilder("text", "doc_id", num_merges=20).load_state(
        path, spark
    )
    assert [tuple(m) for m in restored.merges_] == [
        tuple(m) for m in fitted.merges_
    ]
    a = {r["doc_id"]: r["text_bpe_token_count"]
         for r in fitted.transform(docs).collect()}
    b = {r["doc_id"]: r["text_bpe_token_count"]
         for r in restored.transform(docs).collect()}
    assert a == b
    restored.release()


def test_vocabulary_layout(fitted):
    rows = fitted.vocabulary().collect()
    vocab = {r["token"]: r["id"] for r in rows}
    assert len(vocab) == len(rows)  # token strings are unique
    assert sorted(vocab.values()) == list(range(len(rows)))  # dense ids
    # base alphabet ids first (sorted), then merges in merge order
    # (first occurrence wins when merges concatenate to the same string)
    chars = sorted(t for t in vocab if t == END_MARK or len(t) == 1)
    assert [vocab[c] for c in chars] == list(range(len(chars)))
    merge_toks = []
    for m in fitted.merges_:
        t = m[0] + m[1]
        if t not in merge_toks and t not in chars:
            merge_toks.append(t)
    assert [vocab[t] for t in merge_toks] == [
        len(chars) + i for i in range(len(merge_toks))
    ]
    # every fitted word's tokens are in the vocabulary
    for r in fitted.word_tokens_.collect():
        for s in r["syms"]:
            assert s in vocab, s


def test_vocabulary_dedupes_colliding_merge_strings(spark):
    # distinct merges can concatenate to the same string — ('a','bc')
    # vs ('ab','c') — and a merge can equal a base char; vocabulary()
    # must keep first occurrence so token strings stay unique
    op = ff.BpeVocabBuilder("text", "doc_id")
    op.merges_ = [["a", "b"], ["b", "c"], ["a", "bc"], ["ab", "c"]]
    op.word_tokens_ = spark.createDataFrame(
        [("abc", 1, ["abc"])], "word string, n_tokens int, syms array<string>"
    )
    op._fitted = True
    rows = op.vocabulary().collect()
    toks = [r["token"] for r in rows]
    assert len(toks) == len(set(toks))
    vocab = {r["token"]: r["id"] for r in rows}
    assert sorted(vocab.values()) == list(range(len(rows)))
    assert "abc" in vocab  # first occurrence kept, second skipped


def test_encode_matches_reference_sequences(fitted, docs, spark):
    ref = [tuple(m) for m in fitted.merges_]
    got = {
        r["doc_id"]: r["text_bpe_tokens"]
        for r in fitted.encode(docs).collect()
    }
    expect = {
        i: [s for w in t.lower().split() for s in reference_tokenize(w, ref)]
        for i, t in enumerate(TEXTS)
    }
    assert got == expect
    # unseen words tokenize exactly; empty/NULL text -> empty sequence
    probe = spark.createDataFrame(
        [(50, "zebra unseen"), (51, ""), (52, None)],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r["text_bpe_tokens"]
            for r in fitted.encode(probe).collect()}
    assert rows[50] == [
        s for w in "zebra unseen".split() for s in reference_tokenize(w, ref)
    ]
    assert rows[51] == [] and rows[52] == []


def test_packs_by_true_token_length(fitted, docs):
    counted = fitted.transform(docs)
    packed = ff.SequencePacker(
        "text_bpe_token_count", budget=20, order_col="doc_id",
        partition_cols=[],
    )
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = packed.transform(counted).orderBy("doc_id").collect()
    # doc token counts are 14, 11, 11, 14 -> exclusive running sums
    # 0, 14, 25, 36 -> packs 0, 0, 1, 1 at budget 20
    assert [r["pack_id"] for r in out] == [0, 0, 1, 1]


def test_encode_ids_matches_reference_through_vocabulary(fitted, docs, spark):
    # r7: the token-ID export — reference tokenization mapped through
    # the vocabulary() id layout, unseen/empty/NULL docs included
    ref = [tuple(m) for m in fitted.merges_]
    vmap = {r["token"]: r["id"] for r in fitted.vocabulary().collect()}
    got = {r["doc_id"]: r["text_bpe_ids"]
           for r in fitted.encode_ids(docs).collect()}
    expect = {
        i: [vmap[s] for w in t.lower().split()
            for s in reference_tokenize(w, ref)]
        for i, t in enumerate(TEXTS)
    }
    assert got == expect
    probe = spark.createDataFrame(
        [(50, "zebra unseen"), (51, ""), (52, None)],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r["text_bpe_ids"]
            for r in fitted.encode_ids(probe).collect()}
    # unseen words: known symbols get real ids, out-of-alphabet
    # characters ('z'/'b'/'a' never appear in TEXTS) get the -1 unk
    assert rows[50] == [
        vmap.get(s, -1) for w in "zebra unseen".split()
        for s in reference_tokenize(w, ref)
    ]
    assert -1 in rows[50] and any(i >= 0 for i in rows[50])
    assert rows[51] == [] and rows[52] == []
    # a character absent from the alphabet maps to the -1 unk sentinel
    odd = spark.createDataFrame([(60, "café")], "doc_id bigint, text string")
    ids = fitted.encode_ids(odd).collect()[0]["text_bpe_ids"]
    assert -1 in ids
    assert all(i == -1 or i in vmap.values() for i in ids)


def test_encode_ids_pack_roundtrip(fitted, docs):
    # packing by size(ids) reproduces the token-count packing
    with_ids = fitted.encode_ids(docs).withColumn(
        "n", F.size("text_bpe_ids").cast("bigint")
    )
    counted = fitted.transform(docs)
    a = {r["doc_id"]: r["n"] for r in with_ids.collect()}
    b = {r["doc_id"]: r["text_bpe_token_count"] for r in counted.collect()}
    assert a == b


def test_save_tokenizer_gpt2_layout(fitted, tmp_path):
    # r7: vocab.json + merges.txt interchange export
    import json
    out = str(tmp_path / "tok")
    fitted.save_tokenizer(out)
    vocab = json.load(open(f"{out}/vocab.json"))
    assert vocab == {r["token"]: r["id"]
                     for r in fitted.vocabulary().collect()}
    lines = open(f"{out}/merges.txt").read().splitlines()
    assert lines[0].startswith("#version")
    assert [tuple(ln.split(" ")) for ln in lines[1:]] == [
        tuple(m) for m in fitted.merges_
    ]


# --- byte-level mode (r8, VERDICT r7 item 4) --------------------------

BYTE_TEXTS = [
    "ein schöner Tag heute",
    "日本語 テキスト 処理",
    "emoji 🙂 mixed schöner text 🙂🙂",
    "даже кириллица встречается",
    "plain ascii words too schöner",
]


@pytest.fixture(scope="module")
def byte_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(BYTE_TEXTS)], "doc_id bigint, text string"
    )


@pytest.fixture(scope="module")
def byte_fitted(byte_docs):
    op = ff.BpeVocabBuilder("text", "doc_id", num_merges=24, byte_level=True)
    op.fit(byte_docs)
    yield op
    op.release()


def test_byte_syms_expr_matches_python_twin(spark):
    from feature_factory_spark.operators.bpe import byte_symbols, byte_syms_expr

    words = ["schöner", "日本語", "🙂🙂", "a", "", "даже", "naïve"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["s"] for r in df.select(
        "w", byte_syms_expr(F.col("w")).alias("s")).collect()}
    for w in words:
        assert got[w] == byte_symbols(w) + [END_MARK], w


def test_byte_merges_match_reference(byte_fitted, byte_docs):
    from feature_factory_spark.operators.bpe import reference_bpe

    wc = [(r["word"], r["cnt"])
          for r in byte_fitted.word_counts(byte_docs).collect()]
    ref = reference_bpe(wc, 24, byte_level=True)
    assert [tuple(m) for m in byte_fitted.merges_] == ref


def test_byte_distributed_fit_matches_driver(byte_docs):
    op = ff.BpeVocabBuilder("text", "doc_id", num_merges=12,
                            byte_level=True, fit_mode="distributed")
    op.fit(byte_docs)
    try:
        drv = ff.BpeVocabBuilder("text", "doc_id", num_merges=12,
                                 byte_level=True)
        drv.fit(byte_docs)
        try:
            assert op.merges_ == drv.merges_
        finally:
            drv.release()
    finally:
        op.release()


def test_byte_token_counts_match_reference(byte_fitted, byte_docs, spark):
    ref = [tuple(m) for m in byte_fitted.merges_]
    got = {r["doc_id"]: r["text_bpe_token_count"]
           for r in byte_fitted.transform(byte_docs).collect()}
    for i, t in enumerate(BYTE_TEXTS):
        expected = sum(
            len(reference_tokenize(w, ref, byte_level=True))
            for w in t.lower().split()
        )
        assert got[i] == expected, t


def test_byte_vocabulary_holds_full_alphabet_and_no_unks(byte_fitted, spark):
    from feature_factory_spark.operators.bpe import _B2U_LIST

    vocab = {r["token"]: r["id"] for r in byte_fitted.vocabulary().collect()}
    assert set(_B2U_LIST) <= set(vocab)
    assert END_MARK in vocab
    # UNSEEN non-Latin words encode with zero -1 sentinels: every
    # byte symbol is in the alphabet by construction
    u = spark.createDataFrame(
        [(99, "нечто совсем новое 🚀 未知語")], "doc_id bigint, text string"
    )
    ids = byte_fitted.encode_ids(u).collect()[0]["text_bpe_ids"]
    assert ids and -1 not in ids


def test_byte_save_tokenizer_external_runtime_semantics(
    byte_fitted, byte_docs, tmp_path
):
    """Load vocab.json/merges.txt the way a GPT-2-format runtime does
    (pure stdlib) and re-tokenize: files alone must reproduce the
    operator's tokens and ids for every corpus word — the universal
    round-trip byte_level exists to provide."""
    import json

    from feature_factory_spark.operators.bpe import byte_symbols

    path = str(tmp_path / "tok")
    byte_fitted.save_tokenizer(path)
    vocab = json.load(open(f"{path}/vocab.json"))
    lines = open(f"{path}/merges.txt").read().splitlines()
    assert lines[0].startswith("#version")
    merges = [tuple(ln.split(" ")) for ln in lines[1:]]

    def file_tokenize(word):
        syms = byte_symbols(word) + [END_MARK]
        for l, r in merges:
            acc = []
            for x in syms:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            syms = acc
        return syms

    enc = byte_fitted.encode(byte_docs).collect()
    ids = {r["doc_id"]: r["text_bpe_ids"]
           for r in byte_fitted.encode_ids(byte_docs).collect()}
    for r in enc:
        words = BYTE_TEXTS[r["doc_id"]].lower().split()
        file_toks = [t for w in words for t in file_tokenize(w)]
        assert r["text_bpe_tokens"] == file_toks
        assert ids[r["doc_id"]] == [vocab[t] for t in file_toks]


# --- decode_ids: the inverse of encode_ids (r8) -----------------------

def test_decode_ids_roundtrip_char_level(spark):
    rows = [(1, "the cat sat on the mat"), (2, "cats    eat  fish"),
            (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    bpe = ff.BpeVocabBuilder("text", "doc_id", num_merges=20).fit(
        df.where("doc_id <= 2")
    )
    dec = bpe.decode_ids(bpe.encode_ids(df))
    got = {r["doc_id"]: r["text_bpe_ids_text"] for r in dec.collect()}
    # whitespace normalizes to single spaces; empty/NULL text -> ''
    # (encode emits an empty id array for both, by the NULL-sentinel
    # word design)
    assert got == {1: "the cat sat on the mat", 2: "cats eat fish",
                   3: "", 4: ""}


def test_decode_ids_roundtrip_byte_level_full_unicode(spark):
    rows = [(1, "héllo wörld émoji \U0001F40D bytes"), (2, "plain ascii")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # fit on DIFFERENT text: byte mode's full 256-symbol alphabet
    # decodes anything, fitted or not
    fit = spark.createDataFrame([(9, "unrelated corpus")],
                                "doc_id bigint, text string")
    bpe = ff.BpeVocabBuilder("text", "doc_id", num_merges=8,
                             byte_level=True).fit(fit)
    dec = bpe.decode_ids(bpe.encode_ids(df))
    got = {r["doc_id"]: r["text_bpe_ids_text"] for r in dec.collect()}
    assert got == {1: "héllo wörld émoji \U0001F40D bytes", 2: "plain ascii"}


def test_decode_ids_byte_level_control_bytes_lossless(spark):
    # r10 (r9 advisor): raw control bytes (0x01, 0x02) and a genuine
    # U+FFFD in the source must round-trip losslessly in byte mode —
    # the old \x01 placeholder shield collided with a real 0x01 byte
    rows = [(1, "ctl\x01byte and \x02tail"), (2, "real � char")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fit = spark.createDataFrame([(9, "unrelated corpus")],
                                "doc_id bigint, text string")
    bpe = ff.BpeVocabBuilder("text", "doc_id", num_merges=4,
                             byte_level=True).fit(fit)
    dec = bpe.decode_ids(bpe.encode_ids(df))
    got = {r["doc_id"]: r["text_bpe_ids_text"] for r in dec.collect()}
    assert got == dict(rows)


def test_decode_ids_unknown_id_byte_level(spark):
    # the unknown-id sentinel still decodes to U+FFFD in byte mode
    # (emitted in symbol space as U+FFFD's own UTF-8 bytes)
    df = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    bpe = ff.BpeVocabBuilder("text", "doc_id", num_merges=4,
                             byte_level=True).fit(df)
    from pyspark.sql import functions as F

    withids = bpe.encode_ids(df).withColumn(
        "mangled", F.concat(F.col("text_bpe_ids"), F.array(F.lit(-1)))
    )
    dec = bpe.decode_ids(withids, ids_col="mangled", output_col="back")
    assert dec.collect()[0]["back"].endswith("�")


def test_decode_ids_unknown_id_and_custom_cols(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    bpe = ff.BpeVocabBuilder("text", "doc_id", num_merges=4).fit(df)
    from pyspark.sql import functions as F

    withids = bpe.encode_ids(df).withColumn(
        "mangled", F.concat(F.col("text_bpe_ids"), F.array(F.lit(-1)))
    )
    dec = bpe.decode_ids(withids, ids_col="mangled", output_col="back")
    assert dec.collect()[0]["back"].endswith("�")
    with pytest.raises(Exception, match="already exists"):
        bpe.decode_ids(withids, ids_col="mangled", output_col="mangled")
