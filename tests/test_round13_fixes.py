"""Round-13 (VERDICT r12 brief items 1-2): HF AddedToken special
isolation on encode, the rank-dict piece-length cap, and
SequencePacker.materialize sep_id/bos_id separator insertion."""

import json

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.operators.bpe import BpeVocabBuilder, _B2U

from test_tokenizer_json import (  # noqa: E402 - shared fixtures
    _SP,
    _bl_doc,
    _bl_ref_ids,
    _have_tokenizers,
    _sp_doc,
    _sp_ref_ids,
)


# --- HF AddedToken semantics: specials split out of corpus text ----------

def _split_on_specials(text, specials):
    """(is_special, segment) pairs — the leftmost-longest literal split
    the engine's regex performs."""
    import re

    if not text:
        return []
    alt = "|".join(
        re.escape(s) for s in sorted(specials, key=lambda t: (-len(t), t))
    )
    out, pos = [], 0
    for m in re.finditer(alt, text):
        if m.start() > pos:
            out.append((False, text[pos:m.start()]))
        out.append((True, m.group(0)))
        pos = m.end()
    if pos < len(text):
        out.append((False, text[pos:]))
    return out


def _bl_ref_ids_specials(text, vocab, specials):
    ids = []
    for is_sp, seg in _split_on_specials(text, specials):
        ids += [vocab[seg]] if is_sp else _bl_ref_ids(seg, vocab)
    return ids


SPECIAL_TEXTS = [
    "foo <|endoftext|> bar",
    "x<|endoftext|>y",
    "<|endoftext|>",
    "a<|endoftext|><|endoftext|>b",
    "plain text, no control tokens at all",
    "",
]


class TestSpecialTokenIsolation:
    def _load(self, spark, tmp_path, doc=None, name="st.json", **kw):
        doc = doc or _bl_doc()
        p = str(tmp_path / name)
        json.dump(doc, open(p, "w"))
        op = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
            p, spark, **kw
        )
        return op, doc

    def test_bytelevel_special_encodes_to_its_id(self, spark, tmp_path):
        op, doc = self._load(spark, tmp_path)
        assert op._special_tokens == ["<|endoftext|>"]
        vocab = doc["model"]["vocab"]
        eot = vocab["<|endoftext|>"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(SPECIAL_TEXTS)],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: list(r["text_bpe_ids"])
               for r in op.encode_ids(df).collect()}
        for i, t in enumerate(SPECIAL_TEXTS):
            want = _bl_ref_ids_specials(t, vocab, ["<|endoftext|>"])
            assert got[i] == want, repr(t)
            assert got[i].count(eot) == t.count("<|endoftext|>")

    def test_bytelevel_special_round_trips_as_text(self, spark,
                                                   tmp_path):
        # the VERDICT r12 done-criterion: a literal special in raw
        # text survives encode -> decode as the same text
        op, _ = self._load(spark, tmp_path)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(SPECIAL_TEXTS)],
            "doc_id bigint, text string",
        )
        out = op.decode_ids(op.encode_ids(df))
        got = {r["doc_id"]: r["text_bpe_ids_text"]
               for r in out.collect()}
        for i, t in enumerate(SPECIAL_TEXTS):
            assert got[i] == t, repr(t)

    def test_split_specials_false_keeps_r12_behavior(self, spark,
                                                     tmp_path):
        op, doc = self._load(spark, tmp_path, name="nost.json",
                             split_specials=False)
        assert op._special_tokens == []
        vocab = doc["model"]["vocab"]
        eot = vocab["<|endoftext|>"]
        df = spark.createDataFrame(
            [(0, "x<|endoftext|>y")], "doc_id bigint, text string"
        )
        ids = list(op.encode_ids(df).collect()[0]["text_bpe_ids"])
        # shredded by the piece regex, never the control id
        assert eot not in ids
        assert ids == _bl_ref_ids("x<|endoftext|>y", vocab)
        # the id still joins the map for packer-inserted control ids
        assert op.vocab_json_["<|endoftext|>"] == eot

    def test_matching_flags_reject_loudly(self, spark, tmp_path):
        doc = _bl_doc()
        doc["added_tokens"][0]["lstrip"] = True
        p = str(tmp_path / "flags.json")
        json.dump(doc, open(p, "w"))
        with pytest.raises(ff.InvalidParameterError, match="lstrip"):
            BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
                p, spark
            )
        # opting out of isolation skips the flag validation entirely
        op = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
            p, spark, split_specials=False
        )
        assert op._special_tokens == []

    def test_metaspace_special_isolated(self, spark, tmp_path):
        # Llama-2 layout: '<s>' in raw text maps to its own id; each
        # NON-special segment is normalized independently (prepend per
        # segment — the per-segment normalizer semantics)
        doc = _sp_doc()
        vocab = doc["model"]["vocab"]
        bos = max(vocab.values()) + 1
        doc["added_tokens"] = [
            {"id": bos, "content": "<s>", "special": True}
        ]
        op, _ = self._load(spark, tmp_path, doc=doc, name="sp_st.json")
        assert op._special_tokens == ["<s>"]
        text = "hello <s> the world"
        df = spark.createDataFrame(
            [(0, text)], "doc_id bigint, text string"
        )
        ids = list(op.encode_ids(df).collect()[0]["text_bpe_ids"])
        want = []
        for is_sp, seg in _split_on_specials(text, ["<s>"]):
            want += [bos] if is_sp else _sp_ref_ids(seg, vocab)
        assert ids == want
        assert ids.count(bos) == 1

    def test_overlapping_specials_leftmost_longest(self, spark,
                                                   tmp_path):
        doc = _bl_doc()
        vocab = doc["model"]["vocab"]
        a, b = len(vocab) + 10, len(vocab) + 11
        doc["model"]["vocab"]["<s>"] = a
        doc["model"]["vocab"]["<ss>"] = b
        doc["added_tokens"] = [
            {"id": a, "content": "<s>", "special": True},
            {"id": b, "content": "<ss>", "special": True},
        ]
        op, _ = self._load(spark, tmp_path, doc=doc, name="ovl.json")
        # longest-first ordering in the alternation
        assert op._special_tokens == ["<ss>", "<s>"]
        df = spark.createDataFrame(
            [(0, "<ss><s>")], "doc_id bigint, text string"
        )
        ids = list(op.encode_ids(df).collect()[0]["text_bpe_ids"])
        assert ids == [b, a]

    def test_refit_clears_specials(self, spark, tmp_path):
        op, _ = self._load(spark, tmp_path)
        op.num_merges = 2
        op.fit(spark.createDataFrame(
            [(0, "aa ab aa")], "doc_id bigint, text string"
        ))
        assert op._special_tokens == []

    def test_token_count_counts_special_as_one(self, spark, tmp_path):
        op, _ = self._load(spark, tmp_path)
        df = spark.createDataFrame(
            [(0, "the<|endoftext|>the")], "doc_id bigint, text string"
        )
        n = op.transform(df).collect()[0]["text_bpe_token_count"]
        # 'the' (no leading space) = t+he or the-ish pieces; exact
        # count: reference length
        vocab = _bl_doc()["model"]["vocab"]
        want = len(_bl_ref_ids_specials(
            "the<|endoftext|>the", vocab, ["<|endoftext|>"]
        ))
        assert n == want


@pytest.mark.skipif(
    not _have_tokenizers(),
    reason="HuggingFace 'tokenizers' wheel not installed (offline "
    "container) — the pure-Python split reference above covers the "
    "semantics; this pins special isolation against the REAL library",
)
def test_special_isolation_matches_hf_tokenizers(spark, tmp_path):
    from tokenizers import Tokenizer

    doc = _bl_doc()
    p = str(tmp_path / "hf_st.json")
    json.dump(doc, open(p, "w"))
    tok = Tokenizer.from_file(p)
    op = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(p, spark)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SPECIAL_TEXTS)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: list(r["text_bpe_ids"])
           for r in op.encode_ids(df).collect()}
    for i, t in enumerate(SPECIAL_TEXTS):
        assert got[i] == tok.encode(t).ids, repr(t)


def test_bpe_roberta_post_processor_template(spark, tmp_path):
    # RobertaProcessing: cls prefix + sep suffix on opt-in; the
    # default raw-sequence contract is untouched
    doc = _bl_doc()
    v = doc["model"]["vocab"]
    cls_id, sep_id = len(v) + 20, len(v) + 21
    v["<s>"] = cls_id
    v["</s>"] = sep_id
    doc["post_processor"] = {
        "type": "RobertaProcessing", "sep": ["</s>", sep_id],
        "cls": ["<s>", cls_id], "trim_offsets": True,
        "add_prefix_space": False,
    }
    p = str(tmp_path / "rob.json")
    json.dump(doc, open(p, "w"))
    op = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(p, spark)
    df = spark.createDataFrame(
        [(0, "hello the world"), (1, "")], "doc_id bigint, text string"
    )
    plain = {r["doc_id"]: list(r["text_bpe_ids"])
             for r in op.encode_ids(df).collect()}
    wrapped = {r["doc_id"]: list(r["text_bpe_ids"])
               for r in op.encode_ids(
                   df, add_special_tokens=True).collect()}
    for i in (0, 1):
        assert wrapped[i] == [cls_id] + plain[i] + [sep_id], i
    # a Sequence[ByteLevel, Roberta] processor parses the same way
    doc["post_processor"] = {"type": "Sequence", "processors": [
        {"type": "ByteLevel", "trim_offsets": True},
        {"type": "RobertaProcessing", "sep": ["</s>", sep_id],
         "cls": ["<s>", cls_id]},
    ]}
    p2 = str(tmp_path / "rob2.json")
    json.dump(doc, open(p2, "w"))
    op2 = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
        p2, spark
    )
    w2 = list(op2.encode_ids(df.where("doc_id = 0"),
                             add_special_tokens=True)
              .collect()[0]["text_bpe_ids"])
    assert w2 == wrapped[0]


def test_bpe_template_default_and_fitted_noop(spark, tmp_path):
    # GPT-2's ByteLevel post_processor = no specials: opt-in is a
    # no-op rather than an error; a FITTED instance likewise
    doc = _bl_doc()
    doc["post_processor"] = {"type": "ByteLevel", "trim_offsets": True}
    p = str(tmp_path / "gpt2pp.json")
    json.dump(doc, open(p, "w"))
    op = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(p, spark)
    df = spark.createDataFrame(
        [(0, "hello the world")], "doc_id bigint, text string"
    )
    a = list(op.encode_ids(df).collect()[0]["text_bpe_ids"])
    b = list(op.encode_ids(df, add_special_tokens=True)
             .collect()[0]["text_bpe_ids"])
    assert a == b
    fit = BpeVocabBuilder("text", "doc_id", num_merges=2).fit(df)
    c = list(fit.encode_ids(df, add_special_tokens=True)
             .collect()[0]["text_bpe_ids"])
    assert c == list(fit.encode_ids(df).collect()[0]["text_bpe_ids"])


def test_stored_truncation_applies_on_encode(spark, tmp_path):
    # the HF law: a tokenizer.json carrying a truncation section
    # truncates EVERY encode; direction Right keeps the head, Left
    # the tail; short docs pass through; template specials reserve
    # their room inside max_length
    doc = _bl_doc()
    doc["truncation"] = {"max_length": 5, "strategy": "LongestFirst",
                         "direction": "Right", "stride": 0}
    p = str(tmp_path / "tr.json")
    json.dump(doc, open(p, "w"))
    op = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(p, spark)
    df = spark.createDataFrame(
        [(0, "hello the world and more words here"), (1, "the")],
        "doc_id bigint, text string",
    )
    doc0 = _bl_doc()
    p0 = str(tmp_path / "tr0.json")
    json.dump(doc0, open(p0, "w"))
    op0 = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
        p0, spark
    )
    want = {r["doc_id"]: list(r["text_bpe_ids"])
            for r in op0.encode_ids(df).collect()}
    got = {r["doc_id"]: list(r["text_bpe_ids"])
           for r in op.encode_ids(df).collect()}
    assert got[0] == want[0][:5]      # head kept
    assert got[1] == want[1]          # short doc untouched
    # direction Left keeps the tail
    doc["truncation"]["direction"] = "Left"
    p2 = str(tmp_path / "tr2.json")
    json.dump(doc, open(p2, "w"))
    op2 = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
        p2, spark
    )
    got2 = {r["doc_id"]: list(r["text_bpe_ids"])
            for r in op2.encode_ids(df).collect()}
    assert got2[0] == want[0][-5:]
    # unsupported shape rejects at load
    doc["truncation"] = {"direction": "Right"}  # no max_length
    p3 = str(tmp_path / "tr3.json")
    json.dump(doc, open(p3, "w"))
    with pytest.raises(ff.InvalidParameterError, match="truncation"):
        BpeVocabBuilder("text", "doc_id").load_tokenizer_json(p3, spark)


def test_truncation_reserves_template_room(spark, tmp_path):
    from feature_factory_spark.operators.wordpiece import (
        WordPieceTokenizer,
    )
    from test_wordpiece import VOCAB, _doc

    doc = _doc()
    doc["truncation"] = {"max_length": 4, "direction": "Right"}
    p = str(tmp_path / "wp_tr.json")
    json.dump(doc, open(p, "w"))
    op = WordPieceTokenizer("text", "doc_id").load_tokenizer_json(
        p, spark
    )
    df = spark.createDataFrame(
        [(0, "the lower lowest hello world")],
        "doc_id bigint, text string",
    )
    ids = list(op.encode_ids(df, add_special_tokens=True)
               .collect()[0]["text_wordpiece_ids"])
    # [CLS] + 2 sequence ids + [SEP] == max_length
    assert len(ids) == 4
    assert ids[0] == VOCAB["[CLS]"] and ids[-1] == VOCAB["[SEP]"]
    assert ids[1:3] == [VOCAB["the"], VOCAB["low"]]


# --- rank-dict apply: piece-length cap -----------------------------------

def _doubling_doc(max_pow=10):
    """ByteLevel doc whose merges double 'a' runs: a+a, aa+aa, ... up
    to 2**max_pow — the benign pathological case (one huge piece that
    merges a lot)."""
    vocab = {t: i for i, t in enumerate(sorted(set(_B2U.values())))}
    merges = []
    for p in range(max_pow):
        l = "a" * (2 ** p)
        merges.append([l, l])
        vocab.setdefault(l + l, len(vocab))
    doc = _bl_doc()
    doc["model"]["vocab"] = vocab
    doc["model"]["merges"] = [f"{l} {r}" for l, r in merges]
    doc["added_tokens"] = []
    return doc


def _load_rank(spark, tmp_path, doc, name):
    p = str(tmp_path / name)
    json.dump(doc, open(p, "w"))
    op = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(p, spark)
    op._CHAIN_MERGE_CUTOFF = -1  # force the rank-dict apply path
    return op


def test_piece_cap_chunk_semantics(spark, tmp_path):
    # symbols above the cap are chunked at the cap boundary; each
    # chunk merges independently (the documented divergence from
    # whole-piece BPE). cap=3 on 'aaaa': chunks 'aaa'->[aa,a] and
    # 'a'->[a], vs whole-piece [aaaa].
    op = _load_rank(spark, tmp_path, _doubling_doc(3), "cap.json")
    op._PIECE_SYM_CAP = 3
    words = spark.createDataFrame([("aaaa",)], "word string")
    out = op.tokenize_words(words).collect()[0]
    assert list(out["syms"]) == ["aa", "a", "a"]
    assert out["n_tokens"] == 3
    # at-or-below the cap is untouched whole-piece BPE
    op._PIECE_SYM_CAP = 4
    out = op.tokenize_words(words).collect()[0]
    assert list(out["syms"]) == ["aaaa"]


def test_megabyte_single_piece_bounded(spark, tmp_path):
    # VERDICT r12 "what's wrong" #2: one adversarial document whose
    # GPT-2 segmentation is a SINGLE megabyte piece must complete in
    # bounded time (the uncapped loop is O(len^2) in one task). The
    # doubling merges make every chunk merge down ~log2(cap) times.
    op = _load_rank(spark, tmp_path, _doubling_doc(10), "mb.json")
    n = 1_000_000
    df = spark.createDataFrame(
        [(0, "a" * n)], "doc_id bigint, text string"
    )
    row = op.encode_ids(df).collect()[0]
    ids = list(row["text_bpe_ids"])
    cap = BpeVocabBuilder._PIECE_SYM_CAP
    # each full cap-chunk (cap = 2**14, merges to 2**10-runs) yields
    # cap/1024 tokens; the remainder chunk merges greedily
    full, rem = divmod(n, cap)
    want_len = full * (cap // 1024)
    r = rem
    for p in range(10, -1, -1):
        want_len += r // (2 ** p)
        r %= 2 ** p
    assert len(ids) == want_len
    assert all(v >= 0 for v in ids)


# --- LSH _check_stored_params: corrupt meta propagates -------------------

def test_lsh_meta_corrupt_footer_propagates(spark, tmp_path):
    # VERDICT r12 "what's wrong" #1: a corrupt LSH meta table must
    # surface its real cause, not the "re-run write_index" remedy
    # (mirror of test_load_centroids_corrupt_footer_propagates)
    idx = tmp_path / "lsh_idx"
    (idx / "meta").mkdir(parents=True)
    (idx / "meta" / "part-00000.parquet").write_bytes(
        b"definitely not a parquet footer..........."
    )
    ann = ff.BucketedCosineTopK("embedding", "vec_id", dim=8)
    with pytest.raises(Exception) as ei:
        ann._check_stored_params(spark, str(idx))
    assert "re-run write_index" not in str(ei.value)


def test_lsh_meta_missing_path_still_friendly(spark, tmp_path):
    from feature_factory_spark.exceptions import FeatureFactoryError

    ann = ff.BucketedCosineTopK("embedding", "vec_id", dim=8)
    with pytest.raises(FeatureFactoryError, match="re-run write_index"):
        ann._check_stored_params(spark, str(tmp_path / "nope"))


# --- SequencePacker.materialize: sep_id / bos_id -------------------------

def _pack_frame(spark):
    rows = [(1, "s", [1, 2]), (2, "s", [3]), (3, "s", [4, 5, 6])]
    df = spark.createDataFrame(
        rows, "doc_id bigint, src string, ids array<int>"
    )
    return df.withColumn("n", F.size("ids").cast("bigint"))


def test_materialize_sep_and_bos(spark):
    p = ff.SequencePacker(
        "n", budget=5, order_col="doc_id", partition_cols=["src"]
    )
    out = {
        r["pack_id"]: r
        for r in p.materialize(
            _pack_frame(spark), "ids", sep_id=0, bos_id=9
        ).collect()
    }
    # emitted costs 4,3,5: doc1 prior 0 -> pack0; doc2 prior 4 ->
    # pack0; doc3 prior 7 -> pack1 — the separator is charged to the
    # budget law
    assert list(out[0]["input_ids"]) == [9, 1, 2, 0, 9, 3, 0]
    assert list(out[0]["doc_lens"]) == [4, 3]
    assert list(out[0]["doc_ids"]) == [1, 2]
    assert out[0]["n_docs"] == 2 and out[0]["n_tokens"] == 7
    assert list(out[1]["input_ids"]) == [9, 4, 5, 6, 0]
    assert list(out[1]["doc_lens"]) == [5]
    assert out[1]["n_tokens"] == 5


def test_materialize_sep_only_and_default_unchanged(spark):
    df = _pack_frame(spark)
    p = ff.SequencePacker(
        "n", budget=6, order_col="doc_id", partition_cols=["src"]
    )
    out = {r["pack_id"]: r
           for r in p.materialize(df, "ids", sep_id=0).collect()}
    # costs 3,2,4: priors 0,3,5 -> packs 0,0,0 (budget 6 -> 5//6=0)
    assert list(out[0]["input_ids"]) == [1, 2, 0, 3, 0, 4, 5, 6, 0]
    assert list(out[0]["doc_lens"]) == [3, 2, 4]
    # default materialize is byte-for-byte the r12 law
    plain = {r["pack_id"]: r for r in p.materialize(df, "ids").collect()}
    assert list(plain[0]["input_ids"]) == [1, 2, 3, 4, 5, 6]
    assert list(plain[0]["doc_lens"]) == [2, 1, 3]


def test_materialize_rejects_non_array_ids_col(spark):
    df = _pack_frame(spark)
    p = ff.SequencePacker(
        "n", budget=5, order_col="doc_id", partition_cols=["src"]
    )
    with pytest.raises(ff.FeatureFactoryError, match="array column"):
        p.materialize(df, "n", sep_id=0)


def test_parse_post_processor_tolerates_list_special_tokens():
    from feature_factory_spark.functions.charsmap import (
        parse_post_processor,
    )

    pre, suf, hints = parse_post_processor({
        "type": "TemplateProcessing",
        "single": [{"Sequence": {"id": "A"}},
                   {"SpecialToken": {"id": "</s>"}}],
        "special_tokens": [["</s>", 1]],  # non-map serialization
    })
    assert (pre, suf, hints) == ([], ["</s>"], {})


def test_materialize_respects_precomputed_packing(spark):
    # a frame that already carries the pack column is grouped as-is —
    # the caller owns the packing law
    df = _pack_frame(spark).withColumn(
        "pack_id", (F.col("doc_id") % 2).cast("bigint")
    )
    p = ff.SequencePacker(
        "n", budget=5, order_col="doc_id", partition_cols=["src"]
    )
    out = {r["pack_id"]: r
           for r in p.materialize(df, "ids", sep_id=0).collect()}
    assert list(out[0]["input_ids"]) == [3, 0]
    assert list(out[1]["input_ids"]) == [1, 2, 0, 4, 5, 6, 0]


# --- r13 optimization: BPE dense-id array-literal decode ----------------
# decode_ids for dense id layouts rides ONE from_json array literal
# (zero shuffles) instead of posexplode + broadcast join + reassembly;
# sparse layouts keep the join plan. Parity pinned across all four
# model modes on round-trips and edge ids.

def _force_join_decode(op):
    import copy

    rows = op._vocab_rows()
    op2 = copy.copy(op)
    # one far id pushes max_id over the density gate -> join plan; the
    # far token is never referenced by any probe id
    op2._vocab_rows = lambda: rows + [("__far__", 10**7)]
    return op2


@pytest.mark.parametrize("mode", ["fitted-char", "fitted-byte",
                                  "imported-bytelevel",
                                  "imported-metaspace"])
def test_bpe_decode_literal_matches_join_plan(spark, tmp_path, mode):
    import json as _json

    from pyspark.sql import functions as F

    from feature_factory_spark.operators.bpe import BpeVocabBuilder
    from test_tokenizer_json import _bl_doc, _sp_doc

    texts = [(0, "hello the world"), (1, "schöner Tag 🙂 даже"),
             (2, ""), (3, None), (4, "he'll tell 42 things."),
             (5, "the  the   the")]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    if mode == "fitted-char":
        op = BpeVocabBuilder("text", "doc_id", num_merges=8)
        op.fit(df.where(F.col("text").isNotNull()))
    elif mode == "fitted-byte":
        op = BpeVocabBuilder("text", "doc_id", num_merges=8,
                             byte_level=True)
        op.fit(df.where(F.col("text").isNotNull()))
    else:
        doc = _bl_doc() if mode == "imported-bytelevel" else _sp_doc()
        p = str(tmp_path / "tok.json")
        _json.dump(doc, open(p, "w"))
        op = BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
            p, spark
        )
    try:
        enc = op.encode_ids(df)
        col = "text_bpe_ids_text"
        a = {r["doc_id"]: r[col] for r in op.decode_ids(enc).collect()}
        b = {r["doc_id"]: r[col]
             for r in _force_join_decode(op).decode_ids(enc).collect()}
        assert a == b
        edge = spark.createDataFrame(
            [(0, [1, -1, None, 999999]), (1, []), (2, None)],
            "doc_id bigint, text_bpe_ids array<int>",
        )
        ae = {r["doc_id"]: r[col] for r in op.decode_ids(edge).collect()}
        be = {r["doc_id"]: r[col]
              for r in _force_join_decode(op).decode_ids(edge).collect()}
        assert ae == be
        assert ae[1] == "" and ae[2] is None
    finally:
        op.release()


@pytest.mark.parametrize("mode", ["fitted", "imported"])
def test_unigram_decode_literal_matches_join_plan(spark, tmp_path, mode):
    import copy
    import json as _json

    from pyspark.sql import functions as F

    from feature_factory_spark.operators.unigram import UnigramVocabBuilder

    texts = [(0, "hello the world"), (1, "schöner Tag 🙂"), (2, ""),
             (3, None), (4, "the  the   the"), (5, "unknownzzz word")]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    if mode == "fitted":
        op = UnigramVocabBuilder("text", "doc_id", vocab_size=40)
        op.fit(df.where(F.col("text").isNotNull()))
    else:
        pieces = (
            [["<unk>", -5.0], ["▁", -2.0], ["▁the", -1.0],
             ["▁hello", -1.5], ["▁world", -1.6], ["he", -2.5],
             ["llo", -2.6], ["o", -3.0], ["w", -3.1], ["r", -3.2],
             ["l", -3.3], ["d", -3.4], ["t", -3.5], ["e", -3.6],
             ["h", -3.7]]
            + [["<0x%02X>" % b, -8.0] for b in range(256)]
        )
        doc = {"version": "1.0", "truncation": None, "padding": None,
               "added_tokens": [{"id": 0, "content": "<unk>",
                                 "special": True}],
               "normalizer": None,
               "pre_tokenizer": {"type": "Metaspace",
                                 "replacement": "▁",
                                 "prepend_scheme": "first"},
               "post_processor": None, "decoder": None,
               "model": {"type": "Unigram", "unk_id": 0,
                         "vocab": pieces, "byte_fallback": True}}
        p = str(tmp_path / "uni.json")
        _json.dump(doc, open(p, "w"))
        op = UnigramVocabBuilder("text", "doc_id").load_tokenizer_json(
            p, spark
        )

    def force_join(o):
        rows = o._vocab_id_rows()
        o2 = copy.copy(o)
        o2._vocab_id_rows = lambda: rows + [("__far__", 10**7)]
        return o2

    try:
        enc = op.encode_ids(df)
        col = "text_unigram_ids_text"
        a = {r["doc_id"]: r[col] for r in op.decode_ids(enc).collect()}
        b = {r["doc_id"]: r[col]
             for r in force_join(op).decode_ids(enc).collect()}
        assert a == b
        edge = spark.createDataFrame(
            [(0, [1, -1, None, 999999]), (1, []), (2, None)],
            "doc_id bigint, text_unigram_ids array<int>",
        )
        ae = {r["doc_id"]: r[col] for r in op.decode_ids(edge).collect()}
        be = {r["doc_id"]: r[col]
              for r in force_join(op).decode_ids(edge).collect()}
        assert ae == be
        assert ae[1] == "" and ae[2] is None
    finally:
        op.release()


def test_unigram_unseen_words_segment_distributed(spark):
    """The unseen-word tail of _piece_table segments in a mapInPandas
    pass (the former path collected EVERY unseen distinct word to the
    driver when max_unseen_words=None); pieces are pinned identical to
    driver-side viterbi_segment, and the guard cap still fails loud."""
    from pyspark.sql import functions as F

    from feature_factory_spark.exceptions import InvalidParameterError
    from feature_factory_spark.operators.unigram import (
        UnigramVocabBuilder,
        viterbi_segment,
    )

    fit_df = spark.createDataFrame(
        [(0, "hello world hello"), (1, "the world")],
        "doc_id bigint, text string",
    )
    op = UnigramVocabBuilder("text", "doc_id", vocab_size=30)
    op.fit(fit_df)
    try:
        fresh = spark.createDataFrame(
            [(0, "hello zzznew worldly the")],
            "doc_id bigint, text string",
        )
        table = {r["word"]: list(r["pieces"])
                 for r in op._piece_table(fresh).collect()}
        plan = op._piece_table(fresh)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "MapInPandas" in plan  # distributed, not a driver loop
        for w in table:
            if w.startswith("▁zzznew") or w.startswith("▁worldly"):
                assert table[w] == viterbi_segment(
                    w, op.logprobs_, op.max_piece_len
                )
        capped = UnigramVocabBuilder(
            "text", "doc_id", vocab_size=30, max_unseen_words=0
        )
        capped.fit(fit_df)
        try:
            with pytest.raises(InvalidParameterError):
                capped._piece_table(fresh).collect()
        finally:
            capped.release()
    finally:
        op.release()
