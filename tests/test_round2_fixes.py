"""Regression tests for the round-1 verdict/advice findings."""

import pytest

import feature_factory_spark as ff


def test_mean_impute_promotes_int_column(spark):
    # VERDICT wrong-item #1: fillna on a bigint column truncated mean 7/3 -> 2.
    df = spark.createDataFrame([(1,), (2,), (None,), (4,)], "a bigint")
    t = ff.MeanMedianImputer(["a"])
    out = t.fit_transform(df)
    assert out.schema["a"].dataType.simpleString() == "double"
    vals = sorted(r["a"] for r in out.collect())
    assert vals == pytest.approx([1.0, 2.0, 7.0 / 3.0, 4.0])


def test_arbitrary_impute_promotes_int_column(spark):
    df = spark.createDataFrame([(1,), (None,)], "a int")
    out = ff.ArbitraryNumberImputer(["a"], -1.5).transform(df)
    assert sorted(r["a"] for r in out.collect()) == [-1.5, 1.0]


def test_corr_pairwise_complete(spark):
    # ADVICE high: stddev must be restricted to pairwise-complete rows.
    # Construct a ~perfectly correlated pair plus an asymmetric-null row
    # whose a-value would inflate stddev(a) if counted.
    rows = [(float(i), 2.0 * i) for i in range(10)] + [(1000.0, None)]
    df = spark.createDataFrame(rows, "a double, b double")
    sel = ff.DropCorrelatedFeatures(threshold=0.95)
    sel.fit(df)
    # corr over complete rows is exactly 1.0 -> one of a/b must be dropped
    assert len(sel.kept_) == 1


def test_save_load_round_trip(tmp_path, spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (None,), (4.0,)], "a double")
    t = ff.MeanMedianImputer(["a"]).fit(df)
    p = str(tmp_path / "state.json")
    t.save_state(p)
    t2 = ff.MeanMedianImputer(["a"]).load_state(p)
    a = sorted(r["a"] for r in t.transform(df).collect())
    b = sorted(r["a"] for r in t2.transform(df).collect())
    assert a == b


def test_save_load_discretizer_round_trip(tmp_path, spark):
    df = spark.createDataFrame([(float(i),) for i in range(20)], "a double")
    t = ff.EqualWidthDiscretizer(["a"], bins=4).fit(df)
    p = str(tmp_path / "state.json")
    t.save_state(p)
    t2 = ff.EqualWidthDiscretizer(["a"], bins=4).load_state(p)
    assert [r["a"] for r in t.transform(df).collect()] == [
        r["a"] for r in t2.transform(df).collect()
    ]


def test_onehot_max_categories_guard(spark):
    df = spark.createDataFrame([(f"c{i}",) for i in range(20)], "k string")
    with pytest.raises(ff.InvalidParameterError):
        ff.OneHotEncoder(["k"], max_categories=10).fit(df)


def test_pipeline_unpersist_releases_cache(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "a double")
    p = ff.Pipeline(
        [("imp", ff.MeanMedianImputer(["a"]))], cache_intermediate=True
    )
    p.fit(df)
    assert len(p._persisted) == 1
    p.unpersist()
    assert p._persisted == []


def test_pipeline_error_message_not_garbled(spark):
    # ADVICE low: re-wrapping MissingColumnError must not double-template.
    df = spark.createDataFrame([(1.0,)], "a double")
    p = ff.Pipeline([("imp", ff.MeanMedianImputer(["nope"]))])
    with pytest.raises(ff.MissingColumnError) as ei:
        p.fit(df)
    msg = str(ei.value)
    assert msg.startswith("[step 'imp']")
    assert msg.count("not found") == 1


def test_woe_null_target_counts_as_bad(spark):
    # Reference GROUP BY (col, target) counts NULL-target rows as bad
    # (categorical.rs:565-573).
    import math

    df = spark.createDataFrame(
        [("r", 1), ("r", None), ("r", None)], "k string, t bigint"
    )
    enc = ff.WoEEncoder(["k"], "t").fit(df)
    # good=1, bad=2 (both null-target rows)
    assert enc.mappings_["k"]["r"] == pytest.approx(
        math.log((1 + 1e-6) / (2 + 1e-6)), abs=1e-9
    )


def test_read_extensionless_directory(tmp_path, spark):
    # ADVICE low: parquet dataset directory without .parquet suffix.
    from feature_factory_spark.sources import io as ffio

    path = str(tmp_path / "dataset")
    spark.createDataFrame([(1,)], "a bigint").write.parquet(path)
    assert ffio.read(spark, path).count() == 1
    assert ffio.read(spark, path, fmt="parquet").count() == 1
