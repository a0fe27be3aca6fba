"""PerplexityBucketer (operators/text.py) — CCNet-style head/middle/
tail bucketing by LM-score percentiles: orientation, ties, NULLs,
per-group cutpoints, state round-trip, and the scale-path approx
mode."""

import pytest

import feature_factory_spark as ff


def _rows():
    # 12 docs, scores 0..11 (higher = better), plus a NULL-score doc
    rows = [(i, float(i), "en" if i % 2 == 0 else "fr") for i in range(12)]
    rows.append((100, None, "en"))
    return rows


@pytest.fixture(scope="module")
def scored(spark):
    return spark.createDataFrame(_rows(), "doc_id bigint, s double, lang string")


def test_thirds_and_null(scored):
    b = ff.PerplexityBucketer("s").fit(scored)
    got = {r.doc_id: r.s_bucket for r in b.transform(scored).collect()}
    assert [got[i] for i in range(12)] == (
        ["tail"] * 4 + ["middle"] * 4 + ["head"] * 4
    )
    assert got[100] is None


def test_lower_is_better_flips(scored):
    b = ff.PerplexityBucketer("s", higher_is_better=False).fit(scored)
    got = {r.doc_id: r.s_bucket for r in b.transform(scored).collect()}
    assert [got[i] for i in range(12)] == (
        ["head"] * 4 + ["middle"] * 4 + ["tail"] * 4
    )


def test_per_group_cutpoints(scored):
    # en docs score 0,2,..,10; fr docs 1,3,..,11 — each language gets
    # its own thirds, so en's 10 is head even though 10 < fr's 11
    b = ff.PerplexityBucketer("s", group_col="lang").fit(scored)
    got = {r.doc_id: r.s_bucket for r in b.transform(scored).collect()}
    assert got[10] == "head" and got[11] == "head"
    assert got[0] == "tail" and got[1] == "tail"


def test_ties_fall_to_worse_bucket(spark):
    # all scores equal: every cutpoint equals the score, so <= sends
    # everything to the worst label deterministically
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(9)], "doc_id bigint, s double"
    )
    b = ff.PerplexityBucketer("s").fit(df)
    got = {r.s_bucket for r in b.transform(df).collect()}
    assert got == {"tail"}


def test_two_and_four_buckets(scored):
    b2 = ff.PerplexityBucketer("s", labels=("keep", "drop")).fit(scored)
    got = {r.doc_id: r.s_bucket for r in b2.transform(scored).collect()}
    assert [got[i] for i in range(12)] == ["drop"] * 6 + ["keep"] * 6
    b4 = ff.PerplexityBucketer(
        "s", labels=("q1", "q2", "q3", "q4")
    ).fit(scored)
    got4 = {r.doc_id: r.s_bucket for r in b4.transform(scored).collect()}
    assert [got4[i] for i in range(12)] == (
        ["q4"] * 3 + ["q3"] * 3 + ["q2"] * 3 + ["q1"] * 3
    )


def test_state_roundtrip(scored, tmp_path):
    b = ff.PerplexityBucketer("s").fit(scored)
    path = str(tmp_path / "bucketer")
    b.save_state(path)
    fresh = ff.PerplexityBucketer("s")
    fresh.load_state(path, scored.sparkSession)
    a = sorted((r.doc_id, r.s_bucket) for r in b.transform(scored).collect())
    c = sorted(
        (r.doc_id, r.s_bucket) for r in fresh.transform(scored).collect()
    )
    assert a == c


def test_approx_mode_matches_exact_here(scored):
    # at this size the sketch is exact; the contract at scale is the
    # documented 1/accuracy mass bound
    exact = ff.PerplexityBucketer("s").fit(scored)
    approx = ff.PerplexityBucketer("s", exact=False).fit(scored)
    a = {(r.doc_id, r.s_bucket) for r in exact.transform(scored).collect()}
    b = {(r.doc_id, r.s_bucket) for r in approx.transform(scored).collect()}
    assert a == b


def test_fit_validation(spark):
    df = spark.createDataFrame([(1, None)], "doc_id bigint, s double")
    with pytest.raises(Exception, match="no non-NULL"):
        ff.PerplexityBucketer("s").fit(df)
    with pytest.raises(Exception):
        ff.PerplexityBucketer("s", labels=("one",))
    with pytest.raises(Exception):
        ff.PerplexityBucketer("s", labels=("a", "a"))
    with pytest.raises(Exception):
        ff.PerplexityBucketer("s").transform(df)  # not fit


def test_transform_plan_is_broadcast_no_corpus_shuffle(scored):
    b = ff.PerplexityBucketer("s").fit(scored)
    plan = (
        b.transform(scored)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
