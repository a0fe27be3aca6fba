"""Round-12 hardening (ADVICE r11 + VERDICT r11 'what's wrong' /
'what's missing'): ProductQuantizer NULL-vector fit/transform,
rebuild_index PQ m/k preservation, X-Robots-Tag agent-scope
inheritance, meta-robots hyphenated-attribute false positive,
curation_ledger exploder guard, _load_centroids narrowed except."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.exceptions import FeatureFactoryError


# --- ProductQuantizer: NULL / malformed vectors --------------------------

def _clustered(n=120, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    cents = rng.randn(4, dim) * 5
    return [
        (i, [float(x) for x in cents[i % 4] + rng.randn(dim) * 0.2])
        for i in range(n)
    ]


def test_pq_fit_ignores_null_and_wrong_dim_vectors(spark):
    # md5(NULL) is NULL and sorts FIRST ascending: without the filter
    # the fit sample fills with NULLs and np.asarray raises an opaque
    # ValueError. NULL and wrong-length vectors must be excluded from
    # the sample, not crash the fit.
    rows = _clustered()
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    polluted = df.unionByName(
        spark.createDataFrame(
            [(1000, None), (1001, [1.0, 2.0])],
            "vec_id bigint, embedding array<double>",
        )
    )
    pq = ff.ProductQuantizer(
        "embedding", dim=8, m=2, k=4, max_fit_rows=50
    ).fit(polluted)
    clean = ff.ProductQuantizer(
        "embedding", dim=8, m=2, k=4, max_fit_rows=50
    ).fit(df)
    # the polluted fit sees exactly the clean sample
    assert pq.codebooks_ == clean.codebooks_


def test_pq_null_vector_encodes_as_null_codes(spark):
    rows = _clustered()
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    pq = ff.ProductQuantizer("embedding", dim=8, m=2, k=4).fit(df)
    with_null = df.unionByName(
        spark.createDataFrame(
            [(1000, None)], "vec_id bigint, embedding array<double>"
        )
    )
    got = {r["vec_id"]: r["embedding_pq"]
           for r in pq.transform(with_null).collect()}
    # NULL vector -> NULL codes, never the all-zero code word
    assert got[1000] is None
    assert got[0] is not None and len(got[0]) == 2


# --- rebuild_index: PQ layout (m/k) preserved -----------------------------

def test_rebuild_index_preserves_pq_geometry(spark, tmp_path):
    dim = 8
    rows = _clustered(n=150, dim=dim)
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    ann = ff.IVFCosineTopK(
        "embedding", "vec_id", n_centroids=4, n_probe=2, iterations=4
    )
    src = str(tmp_path / "idx")
    dst = str(tmp_path / "idx_rebuilt")
    pq = ff.ProductQuantizer("c_vec", dim=dim, m=4, k=8)
    ann.write_index(corpus, src, quantize="pq", pq=pq)
    ann2 = ff.IVFCosineTopK(
        "embedding", "vec_id", n_centroids=4, n_probe=2, iterations=4
    )
    ann2.rebuild_index(spark, src, dst)
    rebuilt = ann2._load_pq(spark, dst)
    # the rebuild must keep the source m=4/k=8, not refit the
    # default m=8/k=16 (which would also crash here: dim=8 < m*1)
    assert (rebuilt.m, rebuilt.k, rebuilt.dim) == (4, 8, dim)
    codes = spark.read.parquet(dst + "/corpus").select("c_pq").first()
    assert len(codes["c_pq"]) == 4


# --- XRobotsTagFilter: agent scope inherits across comma tokens ----------

def test_x_robots_scope_inheritance(spark):
    hdrs = spark.createDataFrame(
        [
            (1, "googlebot: noindex, nofollow"),
            (2, "googlebot: noindex, none"),
            (3, "otherbot: none, noindex"),
            (4, "nofollow, googlebot: noindex"),
            (5, "unavailable_after: 25 Jun 2010, noindex"),
            (6, "googlebot: unavailable_after: 25 Jun 2010"),
        ],
        "doc_id bigint, http_x_robots string",
    )
    generic = {
        r["doc_id"]: r["http_x_robots_blocked"]
        for r in ff.XRobotsTagFilter("http_x_robots")
        .transform(hdrs).collect()
    }
    # every directive after 'googlebot:' is googlebot-scoped — the
    # generic crawler is NOT blocked by 'none' in doc 2 (the r11
    # over-blocking bug) nor by anything in docs 1/3/6
    assert generic == {1: False, 2: False, 3: False, 4: False,
                       5: True, 6: False}
    named = {
        r["doc_id"]: r["http_x_robots_blocked"]
        for r in ff.XRobotsTagFilter("http_x_robots", agent="googlebot")
        .transform(hdrs).collect()
    }
    # googlebot honors its scoped directives; otherbot's scope (doc 3)
    # never applies; a value directive never opens a scope (doc 5's
    # trailing noindex stays GLOBAL) nor blocks when scoped (doc 6)
    assert named == {1: True, 2: True, 3: False, 4: True,
                     5: True, 6: False}


# --- MetaRobotsFilter: hyphenated attributes are not 'name' --------------

def test_meta_robots_data_name_not_matched(spark):
    pages = spark.createDataFrame(
        [
            (1, '<html><head><meta data-name="robots" '
                'content="noindex"></head><body>x</body></html>'),
            (2, '<html><head><meta name="robots" '
                'content="noindex"></head><body>x</body></html>'),
            (3, '<html><head><meta name="robots" '
                'data-content="noindex" content="index">'
                '</head><body>x</body></html>'),
        ],
        "doc_id bigint, page string",
    )
    out = {r["doc_id"]: r["page_robots_blocked"]
           for r in ff.MetaRobotsFilter("page")
           .transform(pages).collect()}
    # data-name= must not read as a robots tag; data-content= must
    # not read as the directive payload
    assert out == {1: False, 2: True, 3: False}


# --- curation_ledger: exploder stages fail loud ---------------------------

class _Exploder(ff.Transformer):
    """A fake stage that ADDS rows — first-killer attribution would be
    silently wrong downstream of it."""

    def _transform(self, df):
        return df.unionByName(
            df.limit(1).withColumn(
                "doc_id", F.col("doc_id") + F.lit(10_000)
            )
        )


def test_curation_ledger_rejects_exploder(spark):
    corpus = spark.createDataFrame(
        [(i, "text %d" % i) for i in range(6)],
        "doc_id bigint, text string",
    )
    pipe = ff.make_pipeline(("explode", _Exploder()))
    with pytest.raises(FeatureFactoryError, match="exploder"):
        ff.curation_ledger(corpus, pipe, "doc_id")
    # opt-out still runs (documented caveat)
    out, ledger = ff.curation_ledger(
        corpus, pipe, "doc_id", enforce_gates=False
    )
    assert ledger.where(F.col("kept")).count() == 7


# --- _load_centroids: corrupt footer propagates ---------------------------

def test_load_centroids_corrupt_footer_propagates(spark, tmp_path):
    import os

    idx = tmp_path / "idx"
    (idx / "centroids").mkdir(parents=True)
    bad = idx / "centroids" / "part-00000.parquet"
    bad.write_bytes(b"this is not a parquet file at all.........")
    ann = ff.IVFCosineTopK("embedding", "vec_id")
    with pytest.raises(Exception) as ei:
        ann._load_centroids(spark, str(idx))
    # the real cause must surface, NOT the "write the index first"
    # misdiagnosis
    assert "write the index" not in str(ei.value)


def test_load_centroids_missing_path_still_friendly(spark, tmp_path):
    ann = ff.IVFCosineTopK("embedding", "vec_id")
    with pytest.raises(FeatureFactoryError, match="write the index"):
        ann._load_centroids(spark, str(tmp_path / "nope"))


# --- plan_audit over the r12 plans --------------------------------------

def test_r12_plans_pass_plan_audit(spark):
    # grouped TF-IDF transform, DSIR select, and the ADC probe must
    # carry none of the 100 TB smells (cartesian, single-partition
    # exchange, row-at-a-time Python)
    docs = spark.createDataFrame(
        [(i, "some words here repeated words %d" % i, i % 3)
         for i in range(60)],
        "doc_id bigint, text string, grp int",
    )
    tfidf = ff.HashedTfIdfVectorizer(
        "text", n_features=256, transform_path="grouped"
    ).fit(docs)
    errs = [f for f in ff.plan_audit(tfidf.transform(docs))
            if f["severity"] == "error"]
    assert errs == []

    dsir = ff.DSIRWeighter("text", id_col="doc_id", n_buckets=128)
    dsir.fit_target(docs.where("grp = 0")).fit(docs)
    errs = [f for f in ff.plan_audit(dsir.select(docs, rate=0.5))
            if f["severity"] == "error"]
    assert errs == []


def test_adc_probe_plan_clean(spark, tmp_path):
    rows = _clustered(n=150, dim=8)
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    ivf = ff.IVFCosineTopK(
        "embedding", "vec_id", k=3, n_centroids=4, n_probe=2,
        iterations=2,
    )
    path = str(tmp_path / "idx")
    ivf.write_index(
        corpus, path, quantize="pq",
        pq=ff.ProductQuantizer("c_vec", dim=8, m=2, k=4),
    )
    out = ivf.search_index(
        spark, path, corpus.where("vec_id < 5")
    )
    errs = [f for f in ff.plan_audit(out)
            if f["severity"] == "error"]
    assert errs == []


# --- LSH index PQ layout (r12: parity with the IVF layout) ----------------

def test_lsh_pq_index_lifecycle(spark, tmp_path):
    dim = 16
    rows = _clustered(n=300, dim=dim, seed=9)
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    lsh = ff.BucketedCosineTopK("embedding", "vec_id", k=5, dim=dim)
    raw_path = str(tmp_path / "raw")
    pq_path = str(tmp_path / "pq")
    lsh.write_index(corpus, raw_path)
    lsh.write_index(
        corpus, pq_path, quantize="pq",
        pq=ff.ProductQuantizer("c_vec", dim=dim, m=4, k=16),
    )
    queries = corpus.where(F.col("vec_id") < 8)

    def ids(df):
        return sorted((r["query_id"], r["rank"], r["neighbor_id"])
                      for r in df.collect())

    # ADC and decode paths agree exactly on the PQ index
    a = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"],
         round(r["cosine"], 9))
        for r in lsh.search_index(spark, pq_path, queries).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"],
         round(r["cosine"], 9))
        for r in lsh.search_index(spark, pq_path, queries, adc=False)
        .collect()
    )
    assert a == b and len(a) > 0
    # candidate sets come from the SAME signature buckets, so the PQ
    # probe recalls the same NEIGHBORHOOD as the raw index (ranking
    # reorders within quantization error — near-identical in-cluster
    # cosines collapse to equal codes); every returned neighbor must
    # share the query's planted cluster (vec_id % 4)
    raw = ids(lsh.search_index(spark, raw_path, queries))
    assert len(raw) > 0
    for q, r, n, _ in a:
        assert n % 4 == q % 4, (q, n)

    # append encodes against the FROZEN codebooks
    extra = spark.createDataFrame(
        [(1000 + i, v) for i, v in
         [(j, r[1]) for j, r in enumerate(_clustered(n=40, dim=dim,
                                                     seed=10))]],
        "vec_id bigint, embedding array<double>",
    )
    from feature_factory_spark.operators.similarity import _load_pq_model
    books_before = _load_pq_model(spark, pq_path).codebooks_
    lsh.write_index(extra, pq_path, mode="append", quantize="pq")
    assert _load_pq_model(spark, pq_path).codebooks_ == books_before
    got = lsh.search_index(spark, pq_path, queries)
    assert got.count() > 0

    # layout mismatch fails loud
    with pytest.raises(FeatureFactoryError, match="layout"):
        lsh.write_index(extra, pq_path, mode="append", quantize=False)
    with pytest.raises(FeatureFactoryError, match="layout"):
        lsh.write_index(extra, raw_path, mode="append", quantize="pq")
