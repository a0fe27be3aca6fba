"""WordPieceTokenizer (r13): the BERT-family published-tokenizer
apply-mode — BertNormalizer/BertPreTokenizer/greedy longest-match
pinned against hand-computed values and a pure-Python twin, plus the
[CLS]/[SEP] template, vocab.txt loading, decode cleanup, and the
(offline-skippable) HF parity pin."""

import json

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.operators.wordpiece import (
    WordPieceTokenizer,
    bert_normalize,
    bert_pre_tokenize,
    wordpiece_word,
)

from test_tokenizer_json import _have_tokenizers  # noqa: E402

VOCAB = {
    "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4,
    "the": 5, "low": 6, "##er": 7, "##est": 8, "un": 9, "##aff": 10,
    "##able": 11, "hello": 12, "world": 13, ",": 14, ".": 15, "!": 16,
    "l": 17, "##o": 18, "##w": 19, "he": 20, "##llo": 21, "好": 22,
}


def _doc(norm="bert", post="bert", added=True):
    d = {
        "version": "1.0", "truncation": None, "padding": None,
        "added_tokens": (
            [{"id": VOCAB[t], "content": t, "special": True}
             for t in ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")]
            if added else []
        ),
        "normalizer": {
            "type": "BertNormalizer", "clean_text": True,
            "handle_chinese_chars": True, "strip_accents": None,
            "lowercase": True,
        } if norm == "bert" else norm,
        "pre_tokenizer": {"type": "BertPreTokenizer"},
        "post_processor": {
            "type": "BertProcessing",
            "sep": ["[SEP]", VOCAB["[SEP]"]],
            "cls": ["[CLS]", VOCAB["[CLS]"]],
        } if post == "bert" else post,
        "decoder": {"type": "WordPiece", "prefix": "##",
                    "cleanup": True},
        "model": {
            "type": "WordPiece", "unk_token": "[UNK]",
            "continuing_subword_prefix": "##",
            "max_input_chars_per_word": 100, "vocab": dict(VOCAB),
        },
    }
    return d


def _load(spark, tmp_path, doc=None, name="wp.json", **kw):
    doc = doc or _doc()
    p = str(tmp_path / name)
    json.dump(doc, open(p, "w"))
    return WordPieceTokenizer("text", "doc_id").load_tokenizer_json(
        p, spark, **kw
    ), p


def _ref_ids(text, specials=("[CLS]", "[SEP]", "[PAD]", "[MASK]",
                             "[UNK]")):
    import re

    if not text:
        return []
    pat = re.compile("|".join(
        re.escape(t)
        for t in sorted(specials, key=lambda t: (-len(t), t))
    ))
    out, pos = [], 0

    def seg_ids(seg):
        ids = []
        for w in bert_pre_tokenize(bert_normalize(seg)):
            for piece in wordpiece_word(w, set(VOCAB), "[UNK]"):
                ids.append(VOCAB.get(piece, -1))
        return ids

    for m in pat.finditer(text):
        if m.start() > pos:
            out += seg_ids(text[pos:m.start()])
        out.append(VOCAB[m.group(0)])
        pos = m.end()
    if pos < len(text):
        out += seg_ids(text[pos:])
    return out


# --- pure-function units -------------------------------------------------

def test_bert_normalize_hand_computed():
    # accents strip via NFD+Mn-drop, lowercase, control chars out,
    # whitespace folds, CJK space-padded
    assert bert_normalize("Héllo\tWörld") == "hello world"
    assert bert_normalize("a\x00b\x7fc") == "abc"
    assert bert_normalize("中文ab") == " 中  文 ab"
    assert bert_normalize(
        "Héllo", lowercase=False, strip_accents=None
    ) == "Héllo"  # strip_accents defaults to the lowercase flag
    assert bert_normalize(
        "Héllo", lowercase=False, strip_accents=True
    ) == "Hello"


def test_bert_pre_tokenize_punct_isolation():
    assert bert_pre_tokenize("hello, world!") == [
        "hello", ",", "world", "!"
    ]
    assert bert_pre_tokenize("don't$stop") == [
        "don", "'", "t", "$", "stop"
    ]
    assert bert_pre_tokenize("  a  b  ") == ["a", "b"]


def test_wordpiece_word_greedy():
    v = set(VOCAB)
    assert wordpiece_word("lower", v, "[UNK]") == ["low", "##er"]
    assert wordpiece_word("lowest", v, "[UNK]") == ["low", "##est"]
    assert wordpiece_word("unaffable", v, "[UNK]") == [
        "un", "##aff", "##able"
    ]
    assert wordpiece_word("hello", v, "[UNK]") == ["hello"]
    # longest-match-first: 'he'+'##llo' loses to whole-word 'hello'
    assert wordpiece_word("qqq", v, "[UNK]") == ["[UNK]"]
    assert wordpiece_word("x" * 101, v, "[UNK]") == ["[UNK]"]


# --- the operator --------------------------------------------------------

TEXTS = [
    "the lower, lowest!",
    "Héllo Wörld.",
    "unaffable hello world",
    "gibberishzz the",
    "the 好 low",
    "",
    "[CLS] manual special [SEP]",
]


class TestWordPieceApply:
    def test_encode_ids_matches_reference(self, spark, tmp_path):
        op, _ = _load(spark, tmp_path)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: list(r["text_wordpiece_ids"])
               for r in op.encode_ids(df).collect()}
        for i, t in enumerate(TEXTS):
            assert got[i] == _ref_ids(t), repr(t)
        # sanity: the hand-expected sequence for doc 0
        assert got[0] == [VOCAB["the"], VOCAB["low"], VOCAB["##er"],
                          VOCAB[","], VOCAB["low"], VOCAB["##est"],
                          VOCAB["!"]]
        # specials in raw text isolate to their own ids
        assert got[6][0] == VOCAB["[CLS]"]
        assert got[6][-1] == VOCAB["[SEP]"]

    def test_add_special_tokens_template(self, spark, tmp_path):
        op, _ = _load(spark, tmp_path)
        df = spark.createDataFrame(
            [(0, "the low"), (1, "")], "doc_id bigint, text string"
        )
        plain = {r["doc_id"]: list(r["text_wordpiece_ids"])
                 for r in op.encode_ids(df).collect()}
        wrapped = {r["doc_id"]: list(r["text_wordpiece_ids"])
                   for r in op.encode_ids(
                       df, add_special_tokens=True).collect()}
        for i in (0, 1):
            assert wrapped[i] == [VOCAB["[CLS]"]] + plain[i] + [
                VOCAB["[SEP]"]
            ]

    def test_transform_counts(self, spark, tmp_path):
        op, _ = _load(spark, tmp_path)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: r["text_wordpiece_token_count"]
               for r in op.transform(df).collect()}
        for i, t in enumerate(TEXTS):
            assert got[i] == len(_ref_ids(t)), repr(t)

    def test_decode_cleanup(self, spark, tmp_path):
        op, _ = _load(spark, tmp_path)
        df = spark.createDataFrame(
            [(0, "the lower, lowest!")], "doc_id bigint, text string"
        )
        out = op.decode_ids(op.encode_ids(df))
        assert out.collect()[0]["text_wordpiece_ids_text"] == \
            "the lower, lowest!"
        # unknown id -> U+FFFD
        bad = spark.createDataFrame(
            [(0, [5, 9999])], "doc_id bigint, ids array<int>"
        )
        assert op.decode_ids(bad, ids_col="ids") \
            .collect()[0]["ids_text"] == "the �"

    def test_vocab_txt_loader(self, spark, tmp_path):
        p = str(tmp_path / "vocab.txt")
        ordered = sorted(VOCAB.items(), key=lambda kv: kv[1])
        open(p, "w").write("\n".join(t for t, _ in ordered) + "\n")
        op = WordPieceTokenizer("text", "doc_id").load_vocab_txt(
            p, spark
        )
        df = spark.createDataFrame(
            [(0, "the lower")], "doc_id bigint, text string"
        )
        ids = list(op.encode_ids(df).collect()[0]["text_wordpiece_ids"])
        assert ids == [VOCAB["the"], VOCAB["low"], VOCAB["##er"]]
        # [CLS]/[SEP] template inferred from the vocab
        w = list(op.encode_ids(df, add_special_tokens=True)
                 .collect()[0]["text_wordpiece_ids"])
        assert w == [VOCAB["[CLS]"], *ids, VOCAB["[SEP]"]]

    def test_fail_loud_shapes(self, spark, tmp_path):
        doc = _doc()
        doc["normalizer"] = {"type": "Nmt"}
        p = str(tmp_path / "badn.json")
        json.dump(doc, open(p, "w"))
        with pytest.raises(ff.InvalidParameterError, match="normalizer"):
            WordPieceTokenizer("text", "doc_id").load_tokenizer_json(
                p, spark
            )
        doc = _doc()
        del doc["model"]["vocab"]["[UNK]"]
        doc["added_tokens"] = []
        p = str(tmp_path / "badu.json")
        json.dump(doc, open(p, "w"))
        with pytest.raises(ff.InvalidParameterError, match="unk_token"):
            WordPieceTokenizer("text", "doc_id").load_tokenizer_json(
                p, spark
            )
        # the BPE loader still rejects WordPiece files loudly
        p2 = str(tmp_path / "wp_for_bpe.json")
        json.dump(_doc(), open(p2, "w"))
        with pytest.raises(ff.FeatureFactoryError, match="BPE"):
            ff.BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
                p2, spark
            )
        # fit() on an unloaded instance demands a loader
        with pytest.raises(ff.InvalidParameterError, match="PUBLISHED"):
            WordPieceTokenizer("text", "doc_id").fit(
                spark.createDataFrame(
                    [(0, "x")], "doc_id bigint, text string"
                )
            )

    def test_state_roundtrip_and_export(self, spark, tmp_path):
        op, _ = _load(spark, tmp_path)
        sp = str(tmp_path / "state")
        op.save_state(sp)
        back = WordPieceTokenizer("text", "doc_id").load_state(
            sp, spark
        )
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)],
            "doc_id bigint, text string",
        )
        a = {r["doc_id"]: list(r["text_wordpiece_ids"])
             for r in op.encode_ids(df).collect()}
        b = {r["doc_id"]: list(r["text_wordpiece_ids"])
             for r in back.encode_ids(df).collect()}
        assert a == b
        out = str(tmp_path / "re.json")
        op.export_tokenizer_json(out)
        assert json.load(open(out)) == op._loaded_doc

    def test_pipeline_step_and_plan(self, spark, tmp_path):
        op, _ = _load(spark, tmp_path)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)],
            "doc_id bigint, text string",
        )
        pipe = ff.make_pipeline(("wp", op))
        out = pipe.fit(df)
        assert "text_wordpiece_token_count" in out.columns
        errs = [f for f in ff.plan_audit(op.encode_ids(df))
                if f["severity"] == "error"]
        assert errs == []


@pytest.mark.skipif(
    not _have_tokenizers(),
    reason="HuggingFace 'tokenizers' wheel not installed (offline "
    "container) — the pure-Python twin above covers the laws; this "
    "pins the WordPiece apply-mode against the REAL library",
)
def test_wordpiece_matches_hf_tokenizers(spark, tmp_path):
    from tokenizers import Tokenizer

    p = str(tmp_path / "hf_wp.json")
    json.dump(_doc(), open(p, "w"))
    tok = Tokenizer.from_file(p)
    op = WordPieceTokenizer("text", "doc_id").load_tokenizer_json(
        p, spark
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: list(r["text_wordpiece_ids"])
           for r in op.encode_ids(df, add_special_tokens=True)
           .collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == tok.encode(t).ids, repr(t)


# --- r13 optimization: doc-grain Arrow pass and array-literal decode ----
# The guard-free default now encodes/counts in ONE mapInPandas at the
# doc grain (zero corpus shuffles) and decodes through an id→token
# array literal; a max_unseen_words guard keeps the word-table plan.
# These pin the two plans value-identical on the edge inventory.

EDGE_TEXTS = [
    (0, "hello the world"),
    (1, "the LOWER, lowest!"),
    (2, ""),
    (3, None),
    (4, "zzzq unknownword [SEP] hello"),
    (5, "  multiple   spaces\tand\nnewlines "),
    (6, "好 hello 好"),
]


def _edge_df(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id bigint, text string")


def _by_id(df, col):
    return {
        r["doc_id"]: (list(r[col]) if r[col] is not None and
                      not isinstance(r[col], (str, int)) else r[col])
        for r in df.collect()
    }


def test_doc_grain_encode_matches_word_table_plan(spark, tmp_path):
    op_fused, p = _load(spark, tmp_path)
    op_table = WordPieceTokenizer(
        "text", "doc_id", max_unseen_words=10**9
    ).load_tokenizer_json(p, spark)
    df = _edge_df(spark)
    for call in (
        lambda op: op.encode_ids(df),
        lambda op: op.encode_ids(df, add_special_tokens=True),
        lambda op: op.encode(df),
    ):
        a = call(op_fused)
        b = call(op_table)
        col = [c for c in a.columns if c.startswith("text_wordpiece")][0]
        assert _by_id(a, col) == _by_id(b, col)


def test_doc_grain_transform_matches_word_table_plan(spark, tmp_path):
    op_fused, p = _load(spark, tmp_path)
    op_table = WordPieceTokenizer(
        "text", "doc_id", max_unseen_words=10**9
    ).load_tokenizer_json(p, spark)
    df = _edge_df(spark)
    col = "text_wordpiece_token_count"
    assert _by_id(op_fused.transform(df), col) == _by_id(
        op_table.transform(df), col
    )


def test_decode_array_literal_matches_join_plan(spark, tmp_path):
    op, p = _load(spark, tmp_path)
    # sparse clone: one far id pushes max_id over the density gate, so
    # the same decode runs the broadcast-join plan — the far token is
    # never referenced by the probe ids
    op_sparse, _ = _load(spark, tmp_path)
    op_sparse.vocab_json_ = dict(op.vocab_json_)
    op_sparse.vocab_json_["__far_token__"] = 10**7
    ids = spark.createDataFrame(
        [
            (0, [12, 5, -1, None, 9999]),  # unknown / NULL / out-of-range
            (1, []),
            (2, None),
            (3, [VOCAB["##er"], VOCAB["low"]]),  # leading continuation
            (4, [VOCAB["hello"], VOCAB[","], VOCAB["world"], VOCAB["."]]),
        ],
        "doc_id bigint, text_wordpiece_ids array<int>",
    )
    col = "text_wordpiece_ids_text"
    got = _by_id(op.decode_ids(ids), col)
    want = _by_id(op_sparse.decode_ids(ids), col)
    assert got == want
    assert got[0].count("�") == 3
    assert got[1] == "" and got[2] is None


def test_doc_grain_roundtrip_via_both_decode_plans(spark, tmp_path):
    op, p = _load(spark, tmp_path)
    df = _edge_df(spark)
    enc = op.encode_ids(df)
    dec = op.decode_ids(enc)
    out = {r["doc_id"]: r["text_wordpiece_ids_text"] for r in dec.collect()}
    assert out[0] == "hello the world"
    # NULL text encodes to [] (not NULL), which decodes to ""
    assert out[3] == ""


def test_passthrough_encode_matches_joinback_and_gates(spark, tmp_path):
    # r14: the guard-free encode computes the tokens column IN PLACE
    # (mapInArrow pass-through) when every input column rides Arrow
    # exactly; a non-exact column (decimal) must fall back to the
    # (id, tokens) join-back plan with identical values — including
    # the NULL-id row, which the join-back leaves NULL
    from pyspark.sql import functions as F

    op, p = _load(spark, tmp_path)
    rows = EDGE_TEXTS + [(None, "hello world")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def plan(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    pt = op.encode_ids(df)
    assert "MapInArrow" in plan(pt)
    dec = df.withColumn("dcol", F.lit("1.5").cast("decimal(5,2)"))
    jb = op.encode_ids(dec)
    assert "MapInArrow" not in plan(jb)

    def key(r):
        return (r["doc_id"] is None, r["doc_id"], r["text"])

    a = [(r["doc_id"], r["text"],
          None if r["text_wordpiece_ids"] is None
          else list(r["text_wordpiece_ids"]))
         for r in sorted(pt.collect(), key=key)]
    b = [(r["doc_id"], r["text"],
          None if r["text_wordpiece_ids"] is None
          else list(r["text_wordpiece_ids"]))
         for r in sorted(jb.collect(), key=key)]
    assert a == b
    none_row = [t for t in a if t[0] is None]
    assert none_row and none_row[0][2] is None

    # transform (count mode) takes the same two paths
    ct_pt = op.transform(df)
    assert "MapInArrow" in plan(ct_pt)
    ct_jb = op.transform(dec)
    assert "MapInArrow" not in plan(ct_jb)
    ca = {(r["doc_id"] is None, r["doc_id"]): r["text_wordpiece_token_count"]
          for r in ct_pt.collect()}
    cb = {(r["doc_id"] is None, r["doc_id"]): r["text_wordpiece_token_count"]
          for r in ct_jb.collect()}
    assert ca == cb
