"""DSIRWeighter (r11): importance resampling scores (Xie et al. 2023)
— hashed uni+bigram bucket models, target-vs-raw log-likelihood ratio,
deterministic Gumbel-top-k key. The full model is oracle-pinned
(sample_family:dsir_weight recomputes it relationally at 10k buckets);
these tests cover the operator contract and the selection loop."""

import math

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.exceptions import FeatureFactoryError


@pytest.fixture(scope="module")
def target(spark):
    rows = [(i, "careful encyclopedic prose about science and history "
                "with citations and measured claims")
            for i in range(8)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        (1, "encyclopedic prose about science with citations"),
        (2, "click here buy now free casino bonus deals win"),
        (3, "measured claims about history and science prose"),
        (4, "free free casino casino win win now now"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def fitted(target, raw):
    op = ff.DSIRWeighter("text", id_col="doc_id", n_buckets=512)
    return op.fit_target(target).fit(raw)


def test_target_like_docs_outscore_spam(spark, fitted, raw):
    got = {r["doc_id"]: r["text_dsir"]
           for r in fitted.transform(raw).collect()}
    assert got[1] > got[2] and got[3] > got[4]
    assert got[1] > 0 and got[4] < 0
    assert got[5] == 0.0  # empty doc: no grams, zero score


def test_gumbel_key_is_deterministic_and_additive(spark, fitted, raw):
    a = {r["doc_id"]: r["text_dsir_key"]
         for r in fitted.transform(raw).collect()}
    b = {r["doc_id"]: r["text_dsir_key"]
         for r in fitted.transform(raw).collect()}
    assert a == b  # md5-seeded, not RNG
    scores = {r["doc_id"]: r["text_dsir"]
              for r in fitted.transform(raw).collect()}
    # key = score + gumbel; gumbel differs per doc
    gumbels = {k: a[k] - scores[k] for k in a}
    assert len(set(round(g, 9) for g in gumbels.values())) == len(gumbels)


def test_fit_order_and_unfitted_guards(spark, target, raw):
    with pytest.raises(FeatureFactoryError, match="fit_target"):
        ff.DSIRWeighter("text").fit(raw)
    with pytest.raises(FeatureFactoryError):
        ff.DSIRWeighter("text").fit_target(target).transform(raw)


def test_state_roundtrip(spark, fitted, raw, tmp_path):
    path = str(tmp_path / "dsir_state")
    fitted.save_state(path)
    restored = ff.DSIRWeighter("text", id_col="doc_id",
                               n_buckets=512).load_state(path, spark)
    a = sorted(map(tuple, fitted.transform(raw).collect()))
    b = sorted(map(tuple, restored.transform(raw).collect()))
    assert a == b


def test_narrow_plan(spark, fitted, raw):
    plan = (fitted.transform(raw)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan


def test_selection_loop_with_grouped_topk(spark, fitted, raw):
    # the paper's resampling: take the k largest (score + gumbel) keys
    scored = fitted.transform(raw).withColumn("g", F.lit(1))
    top = ff.GroupedTopK(["g"], "text_dsir_key", k=2).transform(scored)
    picked = sorted(r["doc_id"] for r in top.collect())
    # the two target-like docs dominate the spam at this score gap
    assert picked == [1, 3]


def test_pipeline_step(spark, target, raw):
    # fit_target at construction, then the preset/pipeline fold calls
    # fit(raw) like any stateful step
    pipe = ff.make_pipeline(
        ("dsir", ff.DSIRWeighter("text", n_buckets=512)
         .fit_target(target)),
    )
    out = pipe.fit(raw)
    assert "text_dsir" in out.columns


def test_fit_more_equals_union_refit(spark, target, raw):
    old = raw.where("doc_id <= 2")
    batch = raw.where("doc_id > 2")
    inc = ff.DSIRWeighter("text", n_buckets=512).fit_target(target)
    inc.fit(old)
    inc.fit_more(batch)
    full = ff.DSIRWeighter("text", n_buckets=512).fit_target(target)
    full.fit(old.unionByName(batch))
    assert inc.raw_counts_ == full.raw_counts_
    a = sorted(map(tuple, inc.transform(raw).collect()))
    b = sorted(map(tuple, full.transform(raw).collect()))
    assert a == b
    with pytest.raises(FeatureFactoryError, match="fit_more"):
        ff.DSIRWeighter("text", n_buckets=512).fit_target(target) \
            .fit_more(batch)


def test_select_rate_quantile_threshold(spark, fitted, raw):
    # r12: the selection step — keep the Gumbel-top-k at rate WITHOUT
    # a global sort. rate=0.4 of 5 docs -> threshold at the 0.6
    # quantile; the kept set must be exactly the top-2 by key.
    kept = fitted.select(raw, rate=0.4)
    keys = {r["doc_id"]: r["text_dsir_key"]
            for r in fitted.transform(raw).collect()}
    want = sorted(keys, key=keys.get, reverse=True)[:2]
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(want)
    # score/key columns ride along for downstream audits
    assert {"text_dsir", "text_dsir_key"} <= set(kept.columns)


def test_select_n_and_pretransformed_and_guards(spark, fitted, raw):
    # n= converts to a rate via one count; a pre-transformed frame is
    # not re-scored (the key column is reused)
    kept = fitted.select(fitted.transform(raw), n=3)
    assert kept.count() == 3
    # rate=1.0 keeps everything
    assert fitted.select(raw, rate=1.0).count() == raw.count()
    with pytest.raises(FeatureFactoryError, match="exactly one"):
        fitted.select(raw)
    with pytest.raises(FeatureFactoryError, match="exactly one"):
        fitted.select(raw, rate=0.5, n=2)
    no_id = ff.DSIRWeighter("text", n_buckets=512)
    with pytest.raises(FeatureFactoryError, match="id_col"):
        no_id.select(raw, rate=0.5)


def test_select_approx_path(spark, fitted, raw):
    # the t-digest threshold lands on a real key (no interpolation),
    # so the kept count may differ by one at tiny scale — but the
    # kept set is always threshold-consistent: a superset of the
    # exact keep containing the top keys in order
    a = set(r["doc_id"]
            for r in fitted.select(raw, rate=0.4).collect())
    b = set(r["doc_id"]
            for r in fitted.select(raw, rate=0.4, approx=True)
            .collect())
    assert a <= b and len(b) <= len(a) + 1


def test_select_favors_target_like_docs(spark, fitted, raw):
    # Gumbel-top-k at rate 0.4: with this score gap the two
    # target-like docs (1, 3) win over the spam
    kept = sorted(r["doc_id"]
                  for r in fitted.select(raw, rate=0.4).collect())
    assert kept == [1, 3]


def test_select_stratified_by_group(spark, target):
    # by= keeps each stratum's own top rate: a target-similar group
    # must not crowd out the other stratum (which a global threshold
    # would allow)
    rows = [
        (1, "encyclopedic prose about science with citations", "good"),
        (2, "measured claims about history and science prose", "good"),
        (3, "careful encyclopedic science history citations", "good"),
        (4, "science prose with measured encyclopedic claims", "good"),
        (5, "click here buy now free casino bonus deals win", "spam"),
        (6, "free free casino casino win win now now deals", "spam"),
        (7, "buy now win free bonus casino click here deals", "spam"),
        (8, "casino deals bonus free win buy click now here", "spam"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, grp string")
    op = ff.DSIRWeighter("text", id_col="doc_id", n_buckets=512)
    op.fit_target(target).fit(df)
    kept = op.select(df, rate=0.5, by=["grp"])
    got = {r["grp"]: sorted(r2["doc_id"] for r2 in kept.collect()
                            if r2["grp"] == r["grp"])
           for r in kept.select("grp").distinct().collect()}
    # each stratum keeps exactly its top half by key
    keys = {r["doc_id"]: r["text_dsir_key"]
            for r in op.transform(df).collect()}
    for grp, ids in (("good", [1, 2, 3, 4]), ("spam", [5, 6, 7, 8])):
        want = sorted(sorted(ids, key=keys.get, reverse=True)[:2])
        assert got[grp] == want, grp
    # global threshold at the same rate keeps mostly target-like docs
    global_kept = sorted(r["doc_id"]
                         for r in op.select(df, rate=0.5).collect())
    assert set(global_kept) != set(got["good"] + got["spam"])


def test_select_stratified_n_per_group(spark, target):
    # r13 (VERDICT r12 item 5): by= + n= keeps ~n documents PER
    # STRATUM with per-group rates from one count aggregate — the
    # "exactly k docs per language" ask. Strata of UNEQUAL size get
    # DISTINCT per-group quantiles; a stratum smaller than n keeps
    # everything.
    rows = [
        (1, "encyclopedic prose about science with citations", "big"),
        (2, "measured claims about history and science prose", "big"),
        (3, "careful encyclopedic science history citations", "big"),
        (4, "science prose with measured encyclopedic claims", "big"),
        (5, "click here buy now free casino bonus deals win", "big"),
        (6, "free free casino casino win win now now deals", "big"),
        (7, "buy now win free bonus casino click here deals", "mid"),
        (8, "casino deals bonus free win buy click now here", "mid"),
        (9, "measured encyclopedic science citations prose", "mid"),
        (10, "history science measured claims with citations", "tiny"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, grp string"
    )
    op = ff.DSIRWeighter("text", id_col="doc_id", n_buckets=512)
    op.fit_target(target).fit(df)
    kept = op.select(df, n=2, by=["grp"])
    keys = {r["doc_id"]: r["text_dsir_key"]
            for r in op.transform(df).collect()}
    got = {}
    for r in kept.collect():
        got.setdefault(r["grp"], []).append(r["doc_id"])
    # big (6 docs) and mid (3 docs) keep exactly their top 2 by key;
    # tiny (1 doc < n) keeps everything
    for grp, ids in (("big", [1, 2, 3, 4, 5, 6]), ("mid", [7, 8, 9])):
        want = sorted(sorted(ids, key=keys.get, reverse=True)[:2])
        assert sorted(got[grp]) == want, grp
    assert got["tiny"] == [10]
    # n >= every stratum: keep-all short-circuit
    assert op.select(df, n=50, by=["grp"]).count() == 10
    # key/score columns ride along, threshold helper column dropped
    assert "__ff_dsir_thr" not in kept.columns
    assert {"text_dsir", "text_dsir_key"} <= set(kept.columns)
