"""ArpaLogProbScorer (r13, VERDICT r12 'what's missing' #3): the
published KenLM/ARPA back-off model import. Scoring is pinned against
a pure-Python Katz back-off reference on a hand-built trigram fixture,
plus one fully hand-computed position."""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.operators.arpa import (
    BOS,
    EOS,
    UNK,
    ArpaLogProbScorer,
    parse_arpa,
)

ARPA = """\\data\\
ngram 1=6
ngram 2=4
ngram 3=2

\\1-grams:
-1.2\t<unk>\t-0.3
-0.5\t<s>\t-0.4
-0.9\t</s>
-0.6\tthe\t-0.2
-1.0\tcat\t-0.25
-1.1\tsat\t-0.15

\\2-grams:
-0.4\t<s> the\t-0.1
-0.45\tthe cat\t-0.2
-0.7\tcat sat\t-0.12
-0.8\tsat </s>

\\3-grams:
-0.2\t<s> the cat
-0.3\tthe cat sat

\\end\\
"""

TEXTS = [
    (0, "the cat sat"),
    (1, "the dog sat"),      # dog -> <unk>
    (2, "sat sat sat"),
    (3, ""),
    (4, "cat"),
]


def _model():
    m: dict[int, dict[str, tuple[float, float]]] = {}
    import tempfile, os

    p = os.path.join(tempfile.mkdtemp(), "m.arpa")
    open(p, "w").write(ARPA)
    for order, gram, lp, bo in parse_arpa(p):
        m.setdefault(order, {})[gram] = (lp, bo)
    return p, m


def _ref_pos(toks, i, n, model, oov=-7.0):
    """Katz back-off, log10 — the kenlm::Model::Score recursion."""
    gram = " ".join(toks[i - n + 1:i + 1])
    if n == 1:
        return model[1][gram][0] if gram in model[1] else oov
    if gram in model.get(n, {}):
        return model[n][gram][0]
    ctx = " ".join(toks[i - n + 1:i])
    bo = model.get(n - 1, {}).get(ctx, (0.0, 0.0))[1]
    return bo + _ref_pos(toks, i, n - 1, model, oov)


def _ref_score(text, model, order, markers=True, oov=-7.0):
    words = [w for w in text.lower().split() if w]
    if not words:
        return None  # package convention: empty docs score NULL
    vocab = set(model[1])
    if UNK in vocab:
        words = [w if w in vocab else UNK for w in words]
    toks = [BOS, *words, EOS] if markers else words
    start = 1 if markers else 0
    lps = [
        _ref_pos(toks, i, min(order, i + 1), model, oov)
        for i in range(start, len(toks))
    ]
    return sum(lps) / len(lps) if lps else None


@pytest.fixture(scope="module")
def loaded(spark):
    p, m = _model()
    op = ArpaLogProbScorer("text", "doc_id").load_arpa(p, spark)
    return op, m


@pytest.fixture(scope="module")
def texts_df(spark):
    return spark.createDataFrame(TEXTS, "doc_id bigint, text string")


def test_parse_and_load(loaded):
    op, m = loaded
    assert op.order_ == 3 and op.has_unk_
    assert m[2]["sat </s>"] == (-0.8, 0.0)  # omitted backoff -> 0.0
    assert op.ngram_df_.count() == 12


def test_scores_match_katz_reference(loaded, texts_df):
    op, m = loaded
    got = {r["doc_id"]: r["text_arpa_logprob"]
           for r in op.transform(texts_df).collect()}
    for doc_id, text in TEXTS:
        want = _ref_score(text, m, 3)
        if want is None:
            assert got[doc_id] is None, text
        else:
            assert got[doc_id] == pytest.approx(want, abs=1e-12), text


def test_one_position_by_hand(loaded, texts_df):
    # doc 0 = "the cat sat": position 'sat' has trigram 'the cat sat'
    # (-0.3); position '</s>' lacks 'cat sat </s>' -> bo('cat sat')
    # (-0.12) + p(</s>|sat): bigram 'sat </s>' (-0.8) => -0.92; full
    # doc: [<s> the]=-0.4, [<s> the cat]=-0.2, -0.3, -0.92 -> avg
    op, _ = loaded
    got = {r["doc_id"]: r["text_arpa_logprob"]
           for r in op.transform(texts_df).collect()}
    want = (-0.4 + -0.2 + -0.3 + (-0.12 + -0.8)) / 4
    assert got[0] == pytest.approx(want, abs=1e-12)
    # perplexity column = 10**(-mean)
    ppl = {r["doc_id"]: r["text_arpa_ppl"]
           for r in op.transform(texts_df).collect()}
    assert ppl[0] == pytest.approx(10 ** (-want), rel=1e-12)


def test_unk_mapping(loaded, texts_df):
    # 'dog' maps to <unk> BEFORE key building: 'the dog' is scored as
    # the (absent) bigram 'the <unk>' -> bo('the') + p(<unk>)
    op, m = loaded
    got = {r["doc_id"]: r["text_arpa_logprob"]
           for r in op.transform(texts_df).collect()}
    assert got[1] == pytest.approx(_ref_score("the dog sat", m, 3),
                                   abs=1e-12)


def test_no_markers(spark, texts_df):
    p, m = _model()
    op = ArpaLogProbScorer(
        "text", "doc_id", sentence_markers=False
    ).load_arpa(p, spark)
    got = {r["doc_id"]: r["text_arpa_logprob"]
           for r in op.transform(texts_df).collect()}
    for doc_id, text in TEXTS:
        want = _ref_score(text, m, 3, markers=False)
        if want is None:
            assert got[doc_id] is None
        else:
            assert got[doc_id] == pytest.approx(want, abs=1e-12), text


def test_no_unk_model_uses_floor(spark, tmp_path):
    arpa = ARPA.replace("-1.2\t<unk>\t-0.3\n", "").replace(
        "ngram 1=6", "ngram 1=5"
    )
    p = str(tmp_path / "nounk.arpa")
    open(p, "w").write(arpa)
    op = ArpaLogProbScorer("text", "doc_id", oov_logprob=-9.0)
    op.load_arpa(p, spark)
    assert not op.has_unk_
    df = spark.createDataFrame([(0, "zzz")], "doc_id bigint, text string")
    row = op.transform(df).collect()[0]
    # [<s> zzz] -> bo(<s>) + floor; [zzz </s>] -> bo(zzz)=0 + p(</s>)
    want = ((-0.4 + -9.0) + (0.0 + -0.9)) / 2
    assert row["text_arpa_logprob"] == pytest.approx(want, abs=1e-12)


def test_truncated_file_rejects(spark, tmp_path):
    bad = ARPA.replace("-0.3\tthe cat sat\n", "")
    p = str(tmp_path / "trunc.arpa")
    open(p, "w").write(bad)
    with pytest.raises(ff.FeatureFactoryError, match="declares 2"):
        ArpaLogProbScorer("text", "doc_id").load_arpa(p, spark)


def test_fit_rejects(spark, texts_df):
    with pytest.raises(ff.InvalidParameterError, match="load_arpa"):
        ArpaLogProbScorer("text", "doc_id").fit(texts_df)


def test_state_roundtrip(spark, texts_df, tmp_path, loaded):
    op, _ = loaded
    sp = str(tmp_path / "state")
    op.save_state(sp)
    back = ArpaLogProbScorer("text", "doc_id").load_state(sp, spark)
    assert back.order_ == 3 and back.has_unk_
    a = {r["doc_id"]: r["text_arpa_logprob"]
         for r in op.transform(texts_df).collect()}
    b = {r["doc_id"]: r["text_arpa_logprob"]
         for r in back.transform(texts_df).collect()}
    assert a == b


def _ref_score_lines(text, model, order, oov=-7.0):
    """CCNet doc_log_score twin: per-line <s>..</s>, sum/sum."""
    total, cnt = 0.0, 0
    vocab = set(model[1])
    for line in (text or "").split("\n"):
        words = [w for w in line.lower().split() if w]
        if not words:
            continue
        if UNK in vocab:
            words = [w if w in vocab else UNK for w in words]
        toks = [BOS, *words, EOS]
        for i in range(1, len(toks)):
            total += _ref_pos(toks, i, min(order, i + 1), model, oov)
            cnt += 1
    return total / cnt if cnt else None


def test_line_level_ccnet_law(spark):
    p, m = _model()
    op = ArpaLogProbScorer(
        "text", "doc_id", line_level=True
    ).load_arpa(p, spark)
    texts = [
        (0, "the cat\nsat"),          # two sentences
        (1, "the cat sat"),           # one line == doc-level
        (2, "\n\nthe\n"),             # empty lines skipped
        (3, ""),                      # NULL
        (4, "cat\nthe dog\ncat sat"),
    ]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = {r["doc_id"]: r["text_arpa_logprob"]
           for r in op.transform(df).collect()}
    for doc_id, text in texts:
        want = _ref_score_lines(text, m, 3)
        if want is None:
            assert got[doc_id] is None, text
        else:
            assert got[doc_id] == pytest.approx(want, abs=1e-12), text
    # a single-line doc scores identically to the doc-level mode
    doc_mode = ArpaLogProbScorer("text", "doc_id").load_arpa(p, spark)
    one = doc_mode.transform(df.where("doc_id = 1")).collect()[0]
    assert got[1] == pytest.approx(
        one["text_arpa_logprob"], abs=1e-12
    )
    # per-line markers vs one long sequence genuinely differ
    assert got[0] != pytest.approx(
        _ref_score("the cat sat", m, 3), abs=1e-9
    )


def test_ccnet_preset(spark):
    # the published-method preset: encode fix -> ARPA score -> CCNet
    # head/middle/tail bucketing on the published-model score
    p, m = _model()
    rows = [(i, t) for i, (_, t) in enumerate(TEXTS * 3) if t]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pipe = ff.presets.ccnet_pipeline(spark, p)
    out = pipe.fit(df)
    assert "text_arpa_logprob" in out.columns
    assert "text_arpa_logprob_bucket" in out.columns
    buckets = {r["text_arpa_logprob_bucket"] for r in out.collect()}
    assert buckets <= {"head", "middle", "tail"}
    # best-scoring docs land in 'head' (higher_is_better convention)
    top = out.orderBy(F.desc("text_arpa_logprob")).first()
    assert top["text_arpa_logprob_bucket"] == "head"


def test_plan_clean(loaded, texts_df):
    op, _ = loaded
    errs = [f for f in ff.plan_audit(op.transform(texts_df))
            if f["severity"] == "error"]
    assert errs == []
