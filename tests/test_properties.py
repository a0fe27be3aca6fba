"""Property-based tests (hypothesis) for algebraic invariants the
reference only spot-checks (SURVEY.md §5.2): capping bounds, discretizer
label coverage, imputer non-interference, winsorizer idempotence.

Examples are kept small (Spark round-trip per example is the cost)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import feature_factory_spark as ff

FINITE = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "x double")


@given(vals=st.lists(FINITE, min_size=1, max_size=30), lo=FINITE, hi=FINITE)
@settings(**SETTINGS)
def test_capper_output_within_bounds(spark, vals, lo, hi):
    lo, hi = min(lo, hi), max(lo, hi)
    out = ff.ArbitraryOutlierCapper({"x": lo}, {"x": hi}).transform(_df(spark, vals))
    got = [r["x"] for r in out.collect()]
    assert all(lo <= v <= hi for v in got)
    # capping is idempotent
    again = ff.ArbitraryOutlierCapper({"x": lo}, {"x": hi}).transform(
        _df(spark, got)
    )
    assert [r["x"] for r in again.collect()] == got


@given(vals=st.lists(FINITE, min_size=4, max_size=30, unique=True))
@settings(**SETTINGS)
def test_equal_width_labels_cover_all_values(spark, vals):
    df = _df(spark, vals)
    t = ff.EqualWidthDiscretizer(["x"], bins=3)
    out = t.fit_transform(df)
    labels = [r["x"] for r in out.collect()]
    # every in-range value gets a label; the fit range IS the data range
    assert all(lab is not None for lab in labels)
    assert all(lab.startswith("[") and lab.endswith(")") for lab in labels)


@given(
    vals=st.lists(st.one_of(FINITE, st.none()), min_size=2, max_size=30),
    fill=FINITE,
)
@settings(**SETTINGS)
def test_imputer_leaves_non_nulls_untouched(spark, vals, fill):
    df = _df(spark, vals)
    out = ff.ArbitraryNumberImputer(["x"], fill).transform(df)
    got = [r["x"] for r in out.collect()]
    non_null = [v for v in vals if v is not None]
    assert sorted(v for v in got if v not in (fill,)) == sorted(
        v for v in non_null if v != fill
    )
    assert all(v is not None for v in got)


@given(vals=st.lists(FINITE, min_size=5, max_size=40))
@settings(**SETTINGS)
def test_fitted_winsorizer_is_idempotent(spark, vals):
    # applying the SAME fitted winsorizer twice changes nothing (re-FITTING
    # on capped data is a different distribution and may legitimately move)
    df = _df(spark, vals)
    w = ff.Winsorizer(["x"], 0.1, 0.9).fit(df)
    once = [r["x"] for r in w.transform(df).collect()]
    twice = [r["x"] for r in w.transform(_df(spark, once)).collect()]
    assert sorted(once) == sorted(twice)
    lo, hi = w.bounds["x"]
    assert all(lo <= v <= hi for v in once)


@given(vals=st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_ordinal_encoding_is_order_isomorphic(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    enc = ff.OrdinalEncoder(["x"]).fit(df)
    m = enc.mappings_["x"]
    cats = sorted(m)
    # alphabetical order maps to consecutive ordinals from 0
    assert [m[c] for c in cats] == list(range(len(cats)))


@given(vals=st.lists(FINITE, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_missing_indicator_marks_exactly_nulls(spark, vals):
    rows = [(v if i % 3 else None,) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "x double")
    out = ff.AddMissingIndicator(["x"]).transform(df).collect()
    for r in out:
        assert r["x_missing"] == (r["x"] is None)


@pytest.mark.parametrize("x", [0.0, 0.004999, 0.005, 1.5, -1.5, 123.456789])
def test_format_2dp_matches_sql_formula(x):
    from feature_factory_spark.functions.expressions import format_2dp

    scaled = math.floor(x * 100 + 0.5)
    sign = "-" if scaled < 0 else ""
    expect = f"{sign}{abs(scaled) // 100}.{abs(scaled) % 100:02d}"
    assert format_2dp(x) == expect


WORD = st.text(alphabet="abcxyz", min_size=1, max_size=5)


@given(
    docs=st.lists(
        st.lists(WORD, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_line_dedup_high_threshold_is_identity(spark, docs):
    # with a threshold above the corpus size nothing can be removed, and
    # the reassembly must round-trip every document byte-for-byte
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    out = ff.LineDeduplicator(
        "doc_id", "text", min_docs=len(docs) + 1, sep=" "
    ).transform(df)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == {i: d for i, d in enumerate(docs)}
    assert all(r["text_removed_segments"] == 0 for r in out.collect())


@given(
    vals=st.lists(FINITE, min_size=2, max_size=30),
)
@settings(**SETTINGS)
def test_minmax_scaler_output_in_feature_range(spark, vals):
    df = _df(spark, vals)
    out = ff.MinMaxScaler(["x"]).fit(df).transform(df)
    got = [r["x"] for r in out.collect()]
    assert all(-1e-9 <= v <= 1 + 1e-9 for v in got)


@given(seq=st.lists(FINITE, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_lag_shifts_exactly(spark, seq):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(seq)], "t int, v double"
    )
    out = ff.LagFeatures(["v"], ["t"]).transform(df).orderBy("t")
    lags = [r["v_lag_1"] for r in out.collect()]
    assert lags == [None] + seq[:-1]


@given(
    xs=st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_r6_rounding_identical_across_python_spark_duckdb(spark, xs):
    """The whole oracle layer hangs on floor(x*1e6 + 0.5)/1e6 evaluating
    bit-identically in Python, Spark, and DuckDB — pin it on arbitrary
    doubles (native round() functions disagree on ties; this formula
    must not)."""
    import duckdb
    import math as m

    from pyspark.sql import functions as F

    py = [m.floor(x * 1e6 + 0.5) / 1e6 for x in xs]
    sdf = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, x double")
    sp = [
        r["y"]
        for r in sdf.select(
            "i", (F.floor(F.col("x") * 1e6 + 0.5) / 1e6).alias("y")
        ).orderBy("i").collect()
    ]
    con = duckdb.connect()
    dk = [
        con.execute(
            "SELECT floor(CAST(? AS DOUBLE)*1000000 + 0.5)/1000000", [x]
        ).fetchone()[0]
        for x in xs
    ]
    assert py == sp == dk


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=10,
    ),
    cap=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_vocab_builder_rank_contiguous_counts_monotone(spark, docs, cap):
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id bigint, text string",
    )
    rows = (
        ff.VocabBuilder("text", "doc_id", vocab_size=cap)
        .build(df)
        .orderBy("rank")
        .collect()
    )
    # ranks are 1..n contiguous, counts non-increasing, cap respected,
    # ties broken by token ascending
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= cap
    for a, b in zip(rows, rows[1:]):
        assert a["count"] > b["count"] or (
            a["count"] == b["count"] and a["token"] < b["token"]
        )


# --- r8 perceptual-hash / diff math (pure Python, no Spark round-trip:
# max_examples can be generous) ----------------------------------------

@given(
    sig=st.integers(min_value=0, max_value=(1 << 64) - 1),
    gain=st.floats(min_value=0.05, max_value=0.95),
)
@settings(max_examples=25, deadline=None)
def test_audio_fingerprint_gain_invariant_property(sig, gain):
    from feature_factory_spark.operators.audiohash import (
        audio_fingerprint_bits, decode_samples, pattern_wav,
    )

    mono, sr = decode_samples(pattern_wav(sig, frame_len=128))
    ref = audio_fingerprint_bits(mono, sr)
    assert audio_fingerprint_bits(mono * gain, sr) == ref


@given(
    hashes=st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        min_size=1, max_size=9,
    )
)
@settings(max_examples=50, deadline=None)
def test_video_majority_fold_properties(hashes):
    from feature_factory_spark.operators.videohash import (
        video_fingerprint_bits,
    )

    fold = video_fingerprint_bits(hashes)
    # permutation-invariant
    assert video_fingerprint_bits(list(reversed(hashes))) == fold
    # duplicating the whole list never changes a strict majority
    assert video_fingerprint_bits(hashes * 2) == fold
    # unanimous input is a fixed point
    assert video_fingerprint_bits([hashes[0]] * len(hashes)) == hashes[0]


@given(
    a=st.lists(st.one_of(st.none(), st.text(max_size=6)), min_size=1,
               max_size=4),
    b=st.lists(st.one_of(st.none(), st.text(max_size=6)), min_size=1,
               max_size=4),
)
@settings(max_examples=40, deadline=None)
def test_content_fingerprint_separates_distinct_tuples(spark, a, b):
    # the null-flagged fingerprint collides only for identical tuples
    from feature_factory_spark.operators.diff import content_fingerprint
    from pyspark.sql import functions as F

    n = max(len(a), len(b))
    a = a + [None] * (n - len(a))
    b = b + [None] * (n - len(b))
    cols = [f"c{i}" for i in range(n)]
    schema = ", ".join(f"{c} string" for c in cols)
    df = spark.createDataFrame([tuple(a), tuple(b)], schema)
    fps = [r["fp"] for r in
           df.select(content_fingerprint(cols).alias("fp")).collect()]
    assert (fps[0] == fps[1]) == (a == b)


# --- r9: PDF string parsing + unigram segmentation ----------------------

@given(s=st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=60,
))
@settings(max_examples=60, deadline=None)
def test_pdf_literal_string_roundtrip(s):
    # any latin-range text survives escape -> parse exactly
    from feature_factory_spark.operators.pdfcodec import (
        _escape_pdf_string,
        _parse_literal_string,
    )

    try:
        raw = _escape_pdf_string(s)
    except UnicodeEncodeError:
        return  # beyond latin-1: the encoder's documented domain
    data = b"(" + raw + b")"
    got, end = _parse_literal_string(data, 0)
    assert got == s
    assert end == len(data)


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=10),
        min_size=1, max_size=12,
    ),
    probe=st.text(alphabet="abcde", min_size=1, max_size=12),
)
@settings(max_examples=60, deadline=None)
def test_unigram_segmenters_always_agree(words, probe):
    # the forward-DP trainer segmenter and the recursive reference
    # implement the same canonical tie rule: they must agree on EVERY
    # input, including unseen chars, under any fitted model
    from feature_factory_spark.operators.unigram import (
        reference_segment,
        train_unigram,
        viterbi_segment,
    )

    wc = [(w, i + 1) for i, w in enumerate(sorted(set(words)))]
    lp = train_unigram(wc, vocab_size=20, seed_size=40, n_iter=1,
                       max_piece_len=4)
    a = viterbi_segment(probe, lp, 4)
    b = reference_segment(probe, lp, 4)
    assert a == b
    assert "".join(a) == probe  # segmentation is a partition
