"""Golden tests for categorical encoders (reference fixtures F2/F3:
tests/test_transformers_categorical.rs:16-60, 176-195)."""

import math

import pytest

import feature_factory_spark as ff


@pytest.fixture()
def f2(spark):
    return spark.createDataFrame(
        [
            ("red", 10.0, 1),
            ("blue", 20.0, 0),
            ("red", 10.0, 1),
            ("green", 30.0, 0),
            ("blue", 20.0, 0),
            ("red", 10.0, 1),
        ],
        "color string, target double, bt bigint",
    )


def col_vals(df, col):
    return [r[col] for r in df.collect()]


def test_onehot(f2):
    out = ff.OneHotEncoder(["color"]).fit_transform(f2)
    # original column kept; int 0/1 columns appended, sanitized names
    assert "color" in out.columns
    for c in ("color_red", "color_blue", "color_green"):
        assert c in out.columns
        assert out.schema[c].dataType.simpleString() == "int"
    assert col_vals(out, "color_red") == [1, 0, 1, 0, 0, 1]


def test_onehot_sanitized_name(spark):
    df = spark.createDataFrame([("a-b c!",)], "k string")
    out = ff.OneHotEncoder(["k"]).fit_transform(df)
    assert "k_a_b_c_" in out.columns


def test_count_encode(f2):
    out = ff.CountFrequencyEncoder(["color"]).fit_transform(f2)
    assert col_vals(out, "color") == [3, 2, 3, 1, 2, 3]
    assert out.schema["color"].dataType.simpleString() == "bigint"


def test_count_encode_unseen_zero(f2, spark):
    enc = ff.CountFrequencyEncoder(["color"]).fit(f2)
    fresh = spark.createDataFrame([("violet",)], "color string")
    assert col_vals(enc.transform(fresh), "color") == [0]


def test_ordinal_encode(f2):
    # alphabetical: blue=0, green=1, red=2
    out = ff.OrdinalEncoder(["color"]).fit_transform(f2)
    assert col_vals(out, "color") == [2, 0, 2, 1, 0, 2]


def test_mean_encode(f2):
    out = ff.MeanEncoder(["color"], "target").fit_transform(f2)
    assert col_vals(out, "color") == pytest.approx([10.0, 20.0, 10.0, 30.0, 20.0, 10.0])


def test_mean_encode_unseen_zero(f2, spark):
    enc = ff.MeanEncoder(["color"], "target").fit(f2)
    fresh = spark.createDataFrame([("violet", 1.0)], "color string, target double")
    assert col_vals(enc.transform(fresh), "color") == [0.0]


def test_woe_raw_counts(f2):
    # F3: target [1,0,1,0,0,1] → red good=3 bad=0; blue good=0 bad=2;
    # green good=0 bad=1; woe = ln((good+1e-6)/(bad+1e-6)) on RAW counts
    enc = ff.WoEEncoder(["color"], "bt").fit(f2)
    m = enc.mappings_["color"]
    assert m["red"] == pytest.approx(math.log((3 + 1e-6) / 1e-6), abs=1e-6)
    assert m["blue"] == pytest.approx(math.log(1e-6 / (2 + 1e-6)), abs=1e-6)
    assert m["green"] == pytest.approx(math.log(1e-6 / (1 + 1e-6)), abs=1e-6)


def test_rare_label(f2):
    # threshold 0.5: red freq 0.5 kept; blue 1/3, green 1/6 → rare
    out = ff.RareLabelEncoder(["color"], 0.5).fit_transform(f2)
    assert col_vals(out, "color") == ["red", "rare", "red", "rare", "rare", "red"]


def test_rare_label_unseen_passthrough(f2, spark):
    enc = ff.RareLabelEncoder(["color"], 0.5).fit(f2)
    fresh = spark.createDataFrame([("violet",)], "color string")
    assert col_vals(enc.transform(fresh), "color") == ["violet"]


def test_rare_label_invalid_threshold():
    with pytest.raises(ff.InvalidParameterError):
        ff.RareLabelEncoder(["color"], 1.5)


def test_encoder_requires_string_column(f2):
    with pytest.raises(ff.InvalidParameterError):
        ff.OneHotEncoder(["target"]).fit(f2)


def test_broadcast_join_path_matches_when_chain(spark):
    # >64 categories forces the broadcast-join mapping strategy; results
    # must be identical to the when-chain path
    rows = [(f"cat{i:03d}",) for i in range(100) for _ in range(i % 3 + 1)]
    df = spark.createDataFrame(rows, "k string")
    enc = ff.CountFrequencyEncoder(["k"]).fit(df)
    assert len(enc.mappings_["k"]) == 100
    out = enc.transform(df)
    got = {r["k"] for r in out.collect()}
    assert got == {1, 2, 3}


class TestOutOfFoldMeanEncoder:
    def test_no_row_sees_its_own_label(self, spark):
        # one category; fold f's encoding must equal the mean of the
        # OTHER folds' targets, never the global mean
        rows = [(i, "a", float(i)) for i in range(40)]
        df = spark.createDataFrame(rows, "id bigint, k string, y double")
        enc = ff.OutOfFoldMeanEncoder(["k"], "y", "id", n_folds=4)
        out = enc.fit(df).transform(df).collect()
        global_mean = sum(float(i) for i in range(40)) / 40
        # with a non-constant target, at least one fold's oof mean must
        # differ from the global mean (its own rows were excluded)
        assert any(abs(r["k"] - global_mean) > 1e-9 for r in out)

    def test_matches_hand_computation(self, spark):
        import collections
        import hashlib

        rows = [(i, "a" if i % 2 == 0 else "b", float(i % 4)) for i in range(20)]
        df = spark.createDataFrame(rows, "id bigint, k string, y double")
        out = (
            ff.OutOfFoldMeanEncoder(["k"], "y", "id", n_folds=4)
            .fit(df).transform(df).collect()
        )

        def fold(i):
            h = int(hashlib.md5(f"ff-oof{i}".encode()).hexdigest()[:15], 16)
            return int(h / float(1 << 60) * 4)

        sums = collections.defaultdict(float)
        cnts = collections.defaultdict(int)
        for i, k, y in rows:
            sums[(k, fold(i))] += y
            cnts[(k, fold(i))] += 1
        for r in out:
            i = r["id"]
            k = "a" if i % 2 == 0 else "b"
            s = sum(sums[(k, g)] for g in range(4) if g != fold(i))
            c = sum(cnts[(k, g)] for g in range(4) if g != fold(i))
            assert r["k"] == pytest.approx(s / c)

    def test_single_fold_category_falls_back_to_global(self, spark):
        # category "z" has one row -> its fold's oof count is 0 ->
        # global out-of-fold mean fallback (not NULL, not 0)
        rows = [(i, "a", 10.0) for i in range(30)] + [(100, "z", 99.0)]
        df = spark.createDataFrame(rows, "id bigint, k string, y double")
        out = ff.OutOfFoldMeanEncoder(["k"], "y", "id", n_folds=5).fit(df).transform(df)
        z = [r for r in out.collect() if r["id"] == 100][0]
        assert z["k"] is not None
        assert 9.0 < z["k"] < 11.0  # global oof mean of mostly-10 corpus

    def test_smoothing_shrinks_toward_global(self, spark):
        rows = [(i, "rare" if i == 0 else "base", 100.0 if i == 0 else 0.0, )
                for i in range(50)]
        df = spark.createDataFrame(rows, "id bigint, k string, y double")
        plain = ff.OutOfFoldMeanEncoder(["k"], "y", "id", n_folds=5)
        smooth = ff.OutOfFoldMeanEncoder(["k"], "y", "id", n_folds=5, smoothing=10.0)
        p = {r["id"]: r["k"] for r in plain.fit(df).transform(df).collect()}
        s = {r["id"]: r["k"] for r in smooth.fit(df).transform(df).collect()}
        # base-category rows: smoothing pulls encodings toward the global
        # mean (which includes the rare 100.0) -> strictly larger values
        base_ids = [i for i in range(1, 50)]
        assert all(s[i] >= p[i] for i in base_ids)

    def test_fold_count_validated(self):
        with pytest.raises(ff.InvalidParameterError):
            ff.OutOfFoldMeanEncoder(["k"], "y", "id", n_folds=1)
