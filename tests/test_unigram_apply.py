"""Unigram tokenizer.json published-layout breadth (r13, VERDICT r12
item 6): T5/XLNet-shaped files — Precompiled charsmap + Replace/NF*/
Lowercase/Strip normalizer chains, faithful Metaspace law, unk_id /
fuse_unk / byte_fallback unknown-piece semantics, added_tokens
(sentinel) isolation, and verbatim foreign id layouts. Encode parity
is pinned against a pure-Python reference built on the independent
``reference_segment`` twin."""

import json

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.functions.charsmap import (
    PrecompiledCharsmap,
    build_charsmap_blob,
    chain_fn,
    parse_norm_chain,
)
from feature_factory_spark.operators.unigram import (
    WORD_MARK as _SP,
    UnigramVocabBuilder,
    reference_segment,
)

from test_tokenizer_json import _have_tokenizers  # noqa: E402


# --- charsmap reader/builder ---------------------------------------------

def test_charsmap_round_trip_and_hf_prefix_law():
    m = {"\xa0": " ", "ﬁ": "fi", "é": "é", "—": "-", "A": "a"}
    pc = PrecompiledCharsmap(build_charsmap_blob(m))
    for k, v in m.items():
        assert pc.transform(k) == v, k
    assert pc.transform("z") is None
    # whole-grapheme replacement (base+combining under 6 bytes)
    assert pc.normalize("café ﬁne—A\xa0x") == "café fine-a x"
    # deletion (empty replacement)
    pc2 = PrecompiledCharsmap(build_charsmap_blob({"​": ""}))
    assert pc2.normalize("a​b") == "ab"
    # the HF prefix law: transform takes the FIRST (shortest) trie hit
    pc3 = PrecompiledCharsmap(
        build_charsmap_blob({"ab": "X", "abc": "Y", "b": "Z"})
    )
    assert pc3.transform("abc") == "X"


def test_charsmap_corrupt_blob_rejects():
    with pytest.raises(ff.InvalidParameterError, match="header"):
        PrecompiledCharsmap(b"ab")
    with pytest.raises(ff.InvalidParameterError, match="corrupt"):
        PrecompiledCharsmap(b"\xff\xff\xff\x0f123")


def test_parse_norm_chain_shapes():
    assert parse_norm_chain(None, "p") == (False, [])
    assert parse_norm_chain({"type": "Lowercase"}, "p") == (True, [])
    low, chain = parse_norm_chain(
        {"type": "Sequence", "normalizers": [
            {"type": "Replace", "pattern": {"Regex": " {2,}"},
             "content": " "},
            {"type": "Lowercase"},
        ]}, "p",
    )
    assert not low and [a["type"] for a in chain] == [
        "Replace", "Lowercase"
    ]
    assert chain_fn(chain)("A  B   C") == "a b c"
    with pytest.raises(ff.InvalidParameterError, match="Nmt"):
        parse_norm_chain(
            {"type": "Sequence", "normalizers": [{"type": "Nmt"}]}, "p"
        )


# --- fixture files -------------------------------------------------------

_PIECES = [
    "<pad>", "</s>", "<unk>",
    _SP, _SP + "the", _SP + "low", _SP + "lower", "low", "er",
    "the", _SP + "t", "h", "e", "t", "l", "o", "w", "r", "s",
    _SP + "wide", "wide", _SP + "new",
]


def _uni_vocab():
    # logprobs descending-ish but NOT sorted by id — the T5 shape
    # (control pieces first, then pieces in trainer order)
    return [[p, -1.0 - 0.05 * i] for i, p in enumerate(_PIECES)]


def _t5_doc(charsmap_blob=None, scheme="always", unk_id=2,
            byte_fallback=False, extra_vocab=(), added=()):
    import base64

    norm_atoms = []
    if charsmap_blob is not None:
        norm_atoms.append({
            "type": "Precompiled",
            "precompiled_charsmap":
                base64.b64encode(charsmap_blob).decode(),
        })
        norm_atoms.append({
            "type": "Replace", "pattern": {"Regex": " {2,}"},
            "content": " ",
        })
    vocab = _uni_vocab() + [list(x) for x in extra_vocab]
    return {
        "version": "1.0", "truncation": None, "padding": None,
        "added_tokens": [dict(a) for a in added],
        "normalizer": (
            {"type": "Sequence", "normalizers": norm_atoms}
            if norm_atoms else None
        ),
        "pre_tokenizer": {
            "type": "Metaspace", "replacement": _SP,
            "prepend_scheme": scheme, "split": True,
        },
        "post_processor": None,
        "decoder": {"type": "Metaspace", "replacement": _SP,
                    "prepend_scheme": scheme, "split": True},
        "model": {"type": "Unigram", "unk_id": unk_id,
                  "vocab": vocab, "byte_fallback": byte_fallback},
    }


def _load(spark, tmp_path, doc, name="uni.json", **kw):
    p = str(tmp_path / name)
    json.dump(doc, open(p, "w", encoding="utf-8"))
    return UnigramVocabBuilder("text", "doc_id").load_tokenizer_json(
        p, spark, **kw
    ), p


def _ref_ids(text, doc, max_piece_len):
    """Pure-Python twin: chain -> special split -> Metaspace law ->
    reference_segment -> id/unk/byte/fuse laws."""
    import re

    model = doc["model"]
    lp = {p: v for p, v in model["vocab"]}
    ids = {p: i for i, (p, _) in enumerate(model["vocab"])}
    for at in doc.get("added_tokens") or []:
        ids.setdefault(at["content"], at["id"])
    specials = sorted(
        {at["content"] for at in doc.get("added_tokens") or []},
        key=lambda t: (-len(t), t),
    )
    low, atoms = parse_norm_chain(doc.get("normalizer"), "ref")
    fn = chain_fn(atoms) if atoms else None
    scheme = doc["pre_tokenizer"].get("prepend_scheme", "always")
    unk_id = model.get("unk_id")
    fuse = model.get("fuse_unk", unk_id is not None)
    byte_fb = model.get("byte_fallback")
    if not text:
        return []
    if specials:
        pat = re.compile("|".join(re.escape(t) for t in specials))
        segs, pos = [], 0
        for m in pat.finditer(text):
            if m.start() > pos:
                segs.append((False, text[pos:m.start()]))
            segs.append((True, m.group(0)))
            pos = m.end()
        if pos < len(text):
            segs.append((False, text[pos:]))
    else:
        segs = [(False, text)]
    meta = re.compile(f"{_SP}[^{_SP}]*|[^{_SP}]+")
    out = []
    for i, (is_sp, seg) in enumerate(segs):
        if is_sp:
            out.append(ids[seg])
            continue
        if fn:
            seg = fn(seg)
        if low:
            seg = seg.lower()
        if not seg:
            continue
        marked = seg.replace(" ", _SP)
        if scheme == "always" or (scheme == "first" and i == 0):
            marked = _SP + marked
        for piece_text in meta.findall(marked):
            for piece in reference_segment(piece_text, lp,
                                           max_piece_len):
                if piece in ids:
                    out.append(ids[piece])
                elif byte_fb:
                    out.extend(
                        ids.get("<0x%02X>" % b,
                                -1 if unk_id is None else unk_id)
                        for b in piece.encode("utf-8")
                    )
                elif unk_id is not None:
                    if fuse and out and out[-1] == unk_id:
                        continue
                    out.append(unk_id)
                else:
                    out.append(-1)
    return out


TEXTS = [
    "the low lower", "  the  low", "lower the", "", "low q low",
    "qq the", "wide new",
]


# --- layouts -------------------------------------------------------------

class TestPublishedLayouts:
    def test_t5_shape_with_charsmap(self, spark, tmp_path):
        # T5-shaped: Sequence[Precompiled, Replace " {2,}"->" "],
        # Metaspace, unk_id — charsmap folds NBSP->space + A->a
        blob = build_charsmap_blob({"\xa0": " ", "A": "a", "ﬁ": "fi"})
        doc = _t5_doc(charsmap_blob=blob)
        op, _ = _load(spark, tmp_path, doc)
        assert [a["type"] for a in op._norm_chain] == [
            "Precompiled", "Replace"
        ]
        texts = TEXTS + ["the\xa0low", "A  the", "wideﬁ"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: list(r["text_unigram_ids"])
               for r in op.encode_ids(df).collect()}
        for i, t in enumerate(texts):
            assert got[i] == _ref_ids(t, doc, op.max_piece_len), repr(t)

    def test_xlnet_shape_chain(self, spark, tmp_path):
        # XLNet-style: Replace ``->" + ''->" + NFKC + Lowercase chain
        doc = _t5_doc()
        doc["normalizer"] = {"type": "Sequence", "normalizers": [
            {"type": "Replace", "pattern": {"String": "``"},
             "content": '"'},
            {"type": "Replace", "pattern": {"String": "''"},
             "content": '"'},
            {"type": "NFKC"},
            {"type": "Lowercase"},
        ]}
        # '"' must be coverable: add it to the vocab
        doc["model"]["vocab"].append(['"', -4.0])
        op, _ = _load(spark, tmp_path, doc, name="xlnet.json")
        texts = ["``The Low''", "THE ﬁne low"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: list(r["text_unigram_ids"])
               for r in op.encode_ids(df).collect()}
        for i, t in enumerate(texts):
            assert got[i] == _ref_ids(t, doc, op.max_piece_len), repr(t)

    def test_faithful_metaspace_law(self, spark, tmp_path):
        # runs of spaces become bare-mark pieces (the file's law) —
        # NOT collapsed like the fitted whitespace path
        op, _ = _load(spark, tmp_path, _t5_doc())
        df = spark.createDataFrame(
            [(0, "the  low")], "doc_id bigint, text string"
        )
        pieces = list(op.encode(df).collect()[0]["text_unigram_pieces"])
        assert pieces[:1] == [_SP + "the"] or pieces[0] == _SP + "t"
        assert _SP in pieces  # the bare-mark piece from the double space
        ids = list(op.encode_ids(df).collect()[0]["text_unigram_ids"])
        assert ids == _ref_ids("the  low", _t5_doc(), op.max_piece_len)

    def test_foreign_id_layout_respected(self, spark, tmp_path):
        # the r13 fix: encode_ids/decode_ids honor the file's
        # index==id layout (the former path renumbered by logprob)
        doc = _t5_doc()
        op, _ = _load(spark, tmp_path, doc, name="foreign.json")
        df = spark.createDataFrame(
            [(0, "the low")], "doc_id bigint, text string"
        )
        ids = list(op.encode_ids(df).collect()[0]["text_unigram_ids"])
        index_of = {p: i for i, (p, _) in enumerate(doc["model"]["vocab"])}
        assert ids == [index_of[_SP + "the"], index_of[_SP + "low"]]
        out = op.decode_ids(
            spark.createDataFrame(
                [(0, ids)], "doc_id bigint, ids array<int>"
            ),
            ids_col="ids",
        )
        assert out.collect()[0]["ids_text"] == "the low"

    def test_unk_id_and_fuse(self, spark, tmp_path):
        doc = _t5_doc()
        op, _ = _load(spark, tmp_path, doc, name="unk.json")
        assert op._unk_id == 2 and op._fuse_unk
        df = spark.createDataFrame(
            [(0, "qq the"), (1, "low q low")],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: list(r["text_unigram_ids"])
               for r in op.encode_ids(df).collect()}
        # 'qq' -> consecutive unknown chars FUSE to one unk id
        assert got[0] == _ref_ids("qq the", doc, op.max_piece_len)
        assert got[0].count(2) == 1
        assert got[1] == _ref_ids("low q low", doc, op.max_piece_len)
        # explicit fuse_unk=false keeps one unk per unknown piece
        doc2 = _t5_doc()
        doc2["model"]["fuse_unk"] = False
        op2, _ = _load(spark, tmp_path, doc2, name="unk2.json")
        ids2 = list(op2.encode_ids(df.where("doc_id = 0"))
                    .collect()[0]["text_unigram_ids"])
        assert ids2.count(2) == 2

    def test_byte_fallback(self, spark, tmp_path):
        extra = [["<0x%02X>" % b, -9.0] for b in range(256)]
        doc = _t5_doc(byte_fallback=True, extra_vocab=extra)
        op, _ = _load(spark, tmp_path, doc, name="bf.json")
        assert op._byte_fallback
        df = spark.createDataFrame(
            [(0, "the é low")], "doc_id bigint, text string"
        )
        ids = list(op.encode_ids(df).collect()[0]["text_unigram_ids"])
        assert ids == _ref_ids("the é low", doc, op.max_piece_len)
        assert all(v >= 0 for v in ids)
        # decode fuses the <0xXX> pair back into the multi-byte char
        out = op.decode_ids(
            spark.createDataFrame(
                [(0, ids)], "doc_id bigint, ids array<int>"
            ),
            ids_col="ids",
        )
        assert out.collect()[0]["ids_text"] == "the é low"

    def test_sentinel_added_tokens_isolated(self, spark, tmp_path):
        added = [
            {"id": 100 + i, "content": "<extra_id_%d>" % i,
             "special": True}
            for i in range(3)
        ]
        doc = _t5_doc(added=added)
        op, _ = _load(spark, tmp_path, doc, name="sent.json")
        assert op._special_tokens[0].startswith("<extra_id_")
        text = "the <extra_id_0> low<extra_id_1>"
        df = spark.createDataFrame(
            [(0, text)], "doc_id bigint, text string"
        )
        ids = list(op.encode_ids(df).collect()[0]["text_unigram_ids"])
        assert ids == _ref_ids(text, doc, op.max_piece_len)
        assert 100 in ids and 101 in ids
        # split_specials=False: the sentinel is shredded, never id 100
        op2, _ = _load(spark, tmp_path, doc, name="sent2.json",
                       split_specials=False)
        ids2 = list(op2.encode_ids(df).collect()[0]["text_unigram_ids"])
        assert 100 not in ids2
        # matching flags reject
        doc3 = _t5_doc(added=[{"id": 100, "content": "<x>",
                               "special": True, "lstrip": True}])
        with pytest.raises(ff.InvalidParameterError, match="lstrip"):
            _load(spark, tmp_path, doc3, name="sent3.json")

    def test_long_pieces_raise_piece_len(self, spark, tmp_path):
        # a file piece longer than the trainer default (8) must still
        # be reachable by the segmenter
        doc = _t5_doc(extra_vocab=[[_SP + "encyclopedias", -0.5]])
        op, _ = _load(spark, tmp_path, doc, name="long.json")
        assert op.max_piece_len >= len(_SP + "encyclopedias")
        df = spark.createDataFrame(
            [(0, "encyclopedias")], "doc_id bigint, text string"
        )
        pieces = list(op.encode(df).collect()[0]["text_unigram_pieces"])
        assert pieces == [_SP + "encyclopedias"]

    def test_export_passthrough_and_state_roundtrip(self, spark,
                                                    tmp_path):
        blob = build_charsmap_blob({"\xa0": " "})
        doc = _t5_doc(charsmap_blob=blob)
        op, _ = _load(spark, tmp_path, doc, name="rt.json")
        out_path = str(tmp_path / "re_export.json")
        op.export_tokenizer_json(out_path)
        assert json.load(open(out_path)) == doc
        sp = str(tmp_path / "state")
        op.save_state(sp)
        back = UnigramVocabBuilder("text", "doc_id").load_state(
            sp, spark
        )
        assert back._norm_chain == op._norm_chain
        assert back._unk_id == 2 and back._prepend is True
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)],
            "doc_id bigint, text string",
        )
        a = {r["doc_id"]: list(r["text_unigram_ids"])
             for r in op.encode_ids(df).collect()}
        b = {r["doc_id"]: list(r["text_unigram_ids"])
             for r in back.encode_ids(df).collect()}
        assert a == b


# --- post_processor templates (add_special_tokens, r13) ------------------

class TestPostProcessorTemplates:
    def test_t5_template_processing(self, spark, tmp_path):
        # the real T5 shape: single = [A, </s>], pair ignored
        doc = _t5_doc()
        doc["post_processor"] = {
            "type": "TemplateProcessing",
            "single": [{"Sequence": {"id": "A", "type_id": 0}},
                       {"SpecialToken": {"id": "</s>", "type_id": 0}}],
            "pair": [{"Sequence": {"id": "A", "type_id": 0}},
                     {"SpecialToken": {"id": "</s>", "type_id": 0}},
                     {"Sequence": {"id": "B", "type_id": 0}},
                     {"SpecialToken": {"id": "</s>", "type_id": 0}}],
            "special_tokens": {"</s>": {"id": "</s>", "ids": [1],
                                        "tokens": ["</s>"]}},
        }
        op, _ = _load(spark, tmp_path, doc, name="tmpl.json")
        df = spark.createDataFrame(
            [(0, "the low"), (1, "")], "doc_id bigint, text string"
        )
        plain = {r["doc_id"]: list(r["text_unigram_ids"])
                 for r in op.encode_ids(df).collect()}
        wrapped = {r["doc_id"]: list(r["text_unigram_ids"])
                   for r in op.encode_ids(
                       df, add_special_tokens=True).collect()}
        for i in (0, 1):
            assert wrapped[i] == plain[i] + [1], i
        # token-string surface gets the token, not the id
        toks = op.encode(df, add_special_tokens=True).collect()[0]
        assert list(toks["text_unigram_pieces"])[-1] == "</s>"

    def test_llama_style_bos_prefix(self, spark, tmp_path):
        doc = _t5_doc()
        doc["added_tokens"] = [{"id": 300, "content": "<s>",
                                "special": True}]
        doc["post_processor"] = {
            "type": "TemplateProcessing",
            "single": [{"SpecialToken": {"id": "<s>", "type_id": 0}},
                       {"Sequence": {"id": "A", "type_id": 0}}],
            "pair": [], "special_tokens": {},
        }
        op, _ = _load(spark, tmp_path, doc, name="bos.json")
        df = spark.createDataFrame(
            [(0, "the low")], "doc_id bigint, text string"
        )
        ids = list(op.encode_ids(df, add_special_tokens=True)
                   .collect()[0]["text_unigram_ids"])
        # the added-token id wins (300), prefix position
        assert ids[0] == 300 and 300 not in ids[1:]

    def test_unknown_processor_fails_only_on_opt_in(self, spark,
                                                    tmp_path):
        doc = _t5_doc()
        doc["post_processor"] = {"type": "SomethingExotic"}
        op, _ = _load(spark, tmp_path, doc, name="weird.json")
        df = spark.createDataFrame(
            [(0, "the low")], "doc_id bigint, text string"
        )
        # the default raw-sequence contract never consults the template
        assert op.encode_ids(df).count() == 1
        with pytest.raises(ff.InvalidParameterError,
                           match="post_processor"):
            op.encode_ids(df, add_special_tokens=True).count()


@pytest.mark.skipif(
    not _have_tokenizers(),
    reason="HuggingFace 'tokenizers' wheel not installed (offline "
    "container) — the pure-Python reference above covers the laws; "
    "this pins the unigram apply-mode against the REAL library",
)
def test_unigram_apply_matches_hf_tokenizers(spark, tmp_path):
    from tokenizers import Tokenizer

    blob = build_charsmap_blob({"\xa0": " ", "A": "a"})
    added = [{"id": 100, "content": "<extra_id_0>", "special": True}]
    doc = _t5_doc(charsmap_blob=blob, added=added)
    p = str(tmp_path / "hf_uni.json")
    json.dump(doc, open(p, "w"))
    tok = Tokenizer.from_file(p)
    op = UnigramVocabBuilder("text", "doc_id").load_tokenizer_json(
        p, spark
    )
    texts = TEXTS + ["the\xa0low", "A the", "the <extra_id_0> low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: list(r["text_unigram_ids"])
           for r in op.encode_ids(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == tok.encode(t).ids, repr(t)
