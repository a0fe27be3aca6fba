"""PCAProjection (distributed moment fit + driver eigh + pure-JVM
projection) and BadWordsFilter (the C4 blocklist page gate)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff

DIM = 8
N = 400


def _data():
    rng = np.random.RandomState(7)
    # anisotropic gaussian: distinct eigenvalues so components are
    # well-defined up to sign
    scales = np.array([8.0, 5.0, 3.0, 2.0, 1.0, 0.5, 0.25, 0.1])
    basis = np.linalg.qr(rng.randn(DIM, DIM))[0]
    x = rng.randn(N, DIM) * scales @ basis.T + rng.randn(DIM)
    return x


@pytest.fixture(scope="module")
def xdata():
    return _data()


@pytest.fixture(scope="module")
def vecs(spark, xdata):
    rows = [(i, [float(v) for v in xdata[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


@pytest.fixture(scope="module")
def fitted(vecs):
    return ff.PCAProjection("embedding", dim=DIM, k=4).fit(vecs)


def _np_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return mean, comps, evals[order]


def test_fit_matches_numpy_reference(fitted, xdata):
    mean, comps, evals = _np_pca(xdata, 4)
    assert np.allclose(fitted.mean_, mean, atol=1e-9)
    assert np.allclose(fitted.components_, comps, atol=1e-8)
    assert np.allclose(fitted.eigenvalues_, evals, atol=1e-8)
    # explained variance ratio sums below 1 and is descending
    evr = fitted.explained_variance_ratio_
    assert evr == sorted(evr, reverse=True)
    assert 0.9 < sum(evr) <= 1.0 + 1e-12


def test_components_orthonormal(fitted):
    c = np.array(fitted.components_)
    assert np.allclose(c @ c.T, np.eye(4), atol=1e-9)


def test_transform_matches_numpy_projection(vecs, xdata):
    op = ff.PCAProjection("embedding", dim=DIM, k=4, out_col="proj").fit(vecs)
    out = {r["vec_id"]: r["proj"] for r in
           op.transform(vecs).select("vec_id", "proj").collect()}
    mean = np.array(op.mean_)
    comps = np.array(op.components_)
    expect = (xdata - mean) @ comps.T
    got = np.array([out[i] for i in range(N)])
    assert np.allclose(got, expect, atol=1e-9)


def test_whiten_unit_variance(vecs, xdata):
    op = ff.PCAProjection("embedding", dim=DIM, k=3, whiten=True,
                          out_col="w").fit(vecs)
    got = np.array(
        [r["w"] for r in op.transform(vecs).select("w").collect()]
    )
    var = got.var(axis=0)
    assert np.allclose(var, 1.0, atol=1e-6)


def test_full_rank_roundtrip(vecs, xdata, spark):
    op = ff.PCAProjection("embedding", dim=DIM, k=DIM,
                          out_col="proj").fit(vecs)
    proj = op.transform(vecs)
    back = proj.select(
        "vec_id", op.inverse_expr(F.col("proj")).alias("rec")
    )
    got = {r["vec_id"]: r["rec"] for r in back.collect()}
    for i in (0, 17, N - 1):
        assert np.allclose(got[i], xdata[i], atol=1e-8), i


def test_partitioning_invariance(vecs):
    a = ff.PCAProjection("embedding", dim=DIM, k=4).fit(vecs.repartition(1))
    b = ff.PCAProjection("embedding", dim=DIM, k=4).fit(vecs.repartition(13))
    assert np.allclose(a.components_, b.components_, atol=1e-9)
    assert np.allclose(a.eigenvalues_, b.eigenvalues_, atol=1e-9)


def test_state_roundtrip(fitted, vecs, tmp_path, spark):
    fitted.save_state(str(tmp_path / "pca"))
    restored = ff.PCAProjection("embedding", dim=DIM, k=4).load_state(
        str(tmp_path / "pca"), spark
    )
    assert restored.components_ == fitted.components_
    assert restored.mean_ == fitted.mean_


def test_wrong_dim_fails_loud(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(Exception, match="dim"):
        ff.PCAProjection("embedding", dim=5, k=2).fit(df)


def test_validation():
    with pytest.raises(Exception, match="k must"):
        ff.PCAProjection("v", dim=4, k=5)


# --- BadWordsFilter -----------------------------------------------------

@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        (1, "a perfectly clean page about spark joins"),
        (2, "this page mentions badword once among ten words here ok"),
        (3, "BADWORD badword badword spam spam spam"),
        (4, "substring embedding like notbadword or badwording is fine"),
        (5, None),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_c4_rule_any_hit_drops(pages):
    out = ff.BadWordsFilter("text", ["badword", "slur2"]).transform(pages)
    got = {r["doc_id"]: (r["text_badword_count"], r["text_badwords_keep"])
           for r in out.collect()}
    assert got[1] == (0, True)
    assert got[2] == (1, False)
    assert got[3] == (3, False)
    assert got[4] == (0, True)   # whole-word: substrings don't match
    assert got[5][0] is None and got[5][1] is None
    assert got[6] == (0, True)   # empty text: zero hits, NULL fraction


def test_fraction_threshold(pages):
    out = ff.BadWordsFilter(
        "text", ["badword"], max_fraction=0.15
    ).transform(pages)
    got = {r["doc_id"]: r["text_badwords_keep"] for r in out.collect()}
    assert got[2] is True    # 1/10 words = 0.1 <= 0.15
    assert got[3] is False   # 3/6 = 0.5


def test_filter_mode_and_validation(pages):
    kept = ff.BadWordsFilter(
        "text", ["badword"], mode="filter"
    ).transform(pages)
    assert {r["doc_id"] for r in kept.collect()} == {1, 4, 6}
    with pytest.raises(Exception, match="blocklist"):
        ff.BadWordsFilter("text", [])
    with pytest.raises(Exception, match="mode"):
        ff.BadWordsFilter("text", ["x"], mode="drop")


def test_regex_metacharacters_escaped(spark):
    df = spark.createDataFrame(
        [(1, "mentions a.b here"), (2, "mentions axb here")],
        "doc_id bigint, text string",
    )
    out = ff.BadWordsFilter("text", ["a.b"]).transform(df)
    got = {r["doc_id"]: r["text_badword_count"] for r in out.collect()}
    assert got == {1: 1, 2: 0}  # '.' is literal, not any-char


def test_fit_more_matches_full_refit(spark):
    # r10: moment-merge incremental fit == from-scratch fit on the
    # union (up to FP reduction order), old corpus never re-scanned
    def batch(lo, hi):
        return spark.createDataFrame(
            [(i, [float((i * 13 + j * 5) % 11) - 5.0 for j in range(8)])
             for i in range(lo, hi)],
            "vec_id bigint, embedding array<double>",
        )

    a, b = batch(0, 200), batch(200, 300)
    inc = ff.PCAProjection("embedding", dim=8, k=4,
                           keep_moments=True).fit(a)
    inc.fit_more(b)
    full = ff.PCAProjection("embedding", dim=8, k=4).fit(a.unionByName(b))
    assert np.allclose(inc.mean_, full.mean_)
    assert np.allclose(inc.eigenvalues_, full.eigenvalues_)
    assert np.allclose(inc.components_, full.components_)
    pa = [r["embedding"] for r in inc.transform(b.limit(5)).collect()]
    pb = [r["embedding"] for r in full.transform(b.limit(5)).collect()]
    assert all(np.allclose(x, y) for x, y in zip(pa, pb))
    # a second merge keeps extending the same moments
    c = batch(300, 350)
    inc.fit_more(c)
    full2 = ff.PCAProjection("embedding", dim=8, k=4).fit(
        a.unionByName(b).unionByName(c)
    )
    assert np.allclose(inc.components_, full2.components_)


def test_fit_more_requires_keep_moments(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id bigint, embedding array<double>",
    )
    op = ff.PCAProjection("embedding", dim=2, k=1).fit(df)
    with pytest.raises(ff.InvalidParameterError, match="keep_moments"):
        op.fit_more(df)
    kept = ff.PCAProjection("embedding", dim=2, k=1,
                            keep_moments=True).fit(df)
    with pytest.raises(ff.InvalidParameterError, match="empty batch"):
        kept.fit_more(df.where(F.col("vec_id") < 0))


def test_fit_more_state_roundtrip(spark, tmp_path):
    # the stored moments survive save_state/load_state, so a later
    # scheduled run can extend a restored model
    def batch(lo, hi):
        return spark.createDataFrame(
            [(i, [float((i * 7 + j) % 5), float(j)] ) for i in range(lo, hi)
             for j in [0]],
            "vec_id bigint, embedding array<double>",
        )

    a = spark.createDataFrame(
        [(i, [float((i * 7) % 5), float(i % 3)]) for i in range(50)],
        "vec_id bigint, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(i, [float((i * 11) % 7), float(i % 4)]) for i in range(50, 80)],
        "vec_id bigint, embedding array<double>",
    )
    op = ff.PCAProjection("embedding", dim=2, k=2, keep_moments=True).fit(a)
    path = str(tmp_path / "pca_state")
    op.save_state(path)
    restored = ff.PCAProjection(
        "embedding", dim=2, k=2, keep_moments=True
    ).load_state(path, spark)
    restored.fit_more(b)
    full = ff.PCAProjection("embedding", dim=2, k=2).fit(a.unionByName(b))
    assert np.allclose(restored.components_, full.components_)
