"""Property tests for the r13 pure functions: the darts charsmap
builder/reader pair, WordPiece greedy matching, BertNormalizer
contracts, and ARPA serialization round-trips. Driver-side only (no
Spark jobs) — the distributed paths are pinned by the oracle members
and the operator test files."""

from hypothesis import given, settings, strategies as st

from feature_factory_spark.functions.charsmap import (
    PrecompiledCharsmap,
    build_charsmap_blob,
)
from feature_factory_spark.operators.arpa import parse_arpa
from feature_factory_spark.operators.wordpiece import (
    bert_normalize,
    bert_pre_tokenize,
    wordpiece_word,
)

# NUL-free printable-ish keys (the charsmap contract)
_key = st.text(
    st.characters(min_codepoint=1, max_codepoint=0x2FF,
                  blacklist_categories=("Cs",)),
    min_size=1, max_size=4,
)
_val = st.text(
    st.characters(min_codepoint=32, max_codepoint=0x2FF,
                  blacklist_categories=("Cs",)),
    min_size=0, max_size=4,
)


@settings(max_examples=60, deadline=None)
@given(mapping=st.dictionaries(_key, _val, min_size=1, max_size=40))
def test_charsmap_builder_reader_roundtrip(mapping):
    pc = PrecompiledCharsmap(build_charsmap_blob(mapping))
    for k, v in mapping.items():
        # the reader returns the SHORTEST prefix leaf (the HF law) —
        # exact equality holds whenever no other key is a proper
        # prefix of k
        if any(k.startswith(o) and o != k for o in mapping):
            got = pc.transform(k)
            assert got in {mapping[o] for o in mapping
                           if k.startswith(o)}
        else:
            assert pc.transform(k) == v, k
    # non-keys with no key prefix stay unmapped
    probe = "\uE000nope"
    if not any(probe.startswith(o) for o in mapping):
        assert pc.transform(probe) is None


@settings(max_examples=60, deadline=None)
@given(
    text=st.text(
        st.characters(min_codepoint=1, max_codepoint=0x2FF,
                      blacklist_categories=("Cs",)),
        max_size=60,
    ),
    mapping=st.dictionaries(
        st.text(st.characters(min_codepoint=0x20, max_codepoint=0xFF),
                min_size=1, max_size=1),
        _val, min_size=1, max_size=20,
    ),
)
def test_charsmap_normalize_matches_dict_reference(text, mapping):
    # single-char keys: normalize must equal the plain per-cluster
    # dict substitution under the module's grapheme rule
    import unicodedata

    pc = PrecompiledCharsmap(build_charsmap_blob(mapping))
    out, cluster = [], ""

    def flush(g):
        if not g:
            return
        if len(g.encode("utf-8")) < 6 and g in mapping:
            out.append(mapping[g])
            return
        for ch in g:
            out.append(mapping.get(ch, ch))

    for ch in text:
        if cluster and (unicodedata.combining(ch)
                        or (cluster[-1] == "\r" and ch == "\n")):
            cluster += ch
        else:
            flush(cluster)
            cluster = ch
    flush(cluster)
    assert pc.normalize(text) == "".join(out)


_word = st.text(
    st.characters(min_codepoint=0x61, max_codepoint=0x7A),
    min_size=1, max_size=12,
)


@settings(max_examples=80, deadline=None)
@given(
    word=_word,
    vocab_words=st.lists(_word, min_size=1, max_size=30),
)
def test_wordpiece_greedy_laws(word, vocab_words):
    vocab = set(vocab_words) | {
        "##" + w for w in vocab_words
    } | {"[UNK]"}
    pieces = wordpiece_word(word, vocab, "[UNK]")
    assert pieces  # never empty for a non-empty word
    if pieces == ["[UNK]"]:
        return
    # reassembly law: stripping the continuation prefix rebuilds the
    # word; every piece is a vocab member; first piece is the LONGEST
    # vocab prefix (greedy law)
    assert "".join(
        p[2:] if i and p.startswith("##") else p
        for i, p in enumerate(pieces)
    ) == word
    assert all(p in vocab for p in pieces)
    longest = max(
        (k for k in range(1, len(word) + 1)
         if word[:k] in vocab),
        default=0,
    )
    assert len(pieces[0]) == longest


@settings(max_examples=60, deadline=None)
@given(text=st.text(max_size=80))
def test_bert_normalize_contracts(text):
    import unicodedata

    out = bert_normalize(text)
    assert "\x00" not in out and "�" not in out
    assert out == out.lower()
    for ch in out:
        assert unicodedata.category(ch) not in ("Cc", "Cf"), repr(ch)
        assert unicodedata.combining(ch) == 0, repr(ch)
    # pre-tokenization covers every non-space char of its input
    words = bert_pre_tokenize(out)
    assert "".join(words) == out.replace(" ", "")


_gram_word = st.text(
    st.characters(min_codepoint=0x61, max_codepoint=0x7A),
    min_size=1, max_size=5,
)


@settings(max_examples=40, deadline=None)
@given(
    uni=st.dictionaries(
        _gram_word,
        st.tuples(
            st.floats(-9, -0.01, allow_nan=False),
            st.floats(-2, 0, allow_nan=False),
        ),
        min_size=1, max_size=15,
    ),
    bi=st.lists(
        st.tuples(_gram_word, _gram_word,
                  st.floats(-9, -0.01, allow_nan=False)),
        max_size=15, unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_arpa_serialize_parse_roundtrip(tmp_path_factory, uni, bi):
    p = tmp_path_factory.mktemp("arpa") / "m.arpa"
    l1 = [f"{lp!r}\t{w}\t{bo!r}" for w, (lp, bo) in sorted(uni.items())]
    l2 = [f"{lp!r}\t{a} {b}" for a, b, lp in bi]
    body = (
        "\\data\\\n"
        f"ngram 1={len(l1)}\nngram 2={len(l2)}\n\n"
        "\\1-grams:\n" + "\n".join(l1) + "\n\n"
        "\\2-grams:\n" + "\n".join(l2) + "\n\n\\end\\\n"
    )
    p.write_text(body)
    back1, back2 = {}, {}
    for order, gram, lp, bo in parse_arpa(str(p)):
        (back1 if order == 1 else back2)[gram] = (lp, bo)
    assert back1 == {w: (lp, bo) for w, (lp, bo) in uni.items()}
    assert back2 == {f"{a} {b}": (lp, 0.0) for a, b, lp in bi}
