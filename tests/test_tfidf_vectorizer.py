"""HashedTfIdfVectorizer (r11): self-contained document embeddings —
hashed TF-IDF from raw text feeding every embedding consumer without
an external model. The vector math itself is oracle-pinned
(embed_transform:tfidf_vector recomputes tokenize->hash->tf->df->
weight->normalize relationally); these tests cover the operator
contract, edge shapes, state round-trip, plan shape, and the
end-to-end semantic-dedup-on-raw-text loop the operator exists for."""

import math

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.exceptions import FeatureFactoryError


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text about spark and parquet"),
        (4, "the quick brown fox jumps over the lazy dog"),  # dup of 1
        (5, ""),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def fitted(corpus):
    return ff.HashedTfIdfVectorizer("text", n_features=64).fit(
        corpus.where("text IS NOT NULL")
    )


def test_unit_norm_and_edge_shapes(spark, corpus, fitted):
    out = {r["doc_id"]: r["text_tfidf"]
           for r in fitted.transform(corpus).collect()}
    for did in (1, 2, 3, 4):
        assert len(out[did]) == 64
        assert math.isclose(
            sum(x * x for x in out[did]), 1.0, rel_tol=1e-9
        )
    # empty text -> zero vector; NULL text -> NULL vector
    assert out[5] == [0.0] * 64
    assert out[6] is None


def test_identical_docs_identical_vectors(spark, corpus, fitted):
    out = {r["doc_id"]: r["text_tfidf"]
           for r in fitted.transform(corpus).collect()}
    assert out[1] == out[4]
    # near-dup (one word differs) is close but not identical; the
    # unrelated doc is far from both
    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))
    assert cos(out[1], out[2]) > 0.8
    assert cos(out[1], out[3]) < 0.3


def test_idf_downweights_common_tokens(spark, fitted):
    # 'the' appears in 3/4 fitted docs, 'parquet' in 1/4: the smooth
    # idf must order them
    n = fitted.n_features
    from feature_factory_spark.operators.embeddings import hashed_dim_expr
    spark_sess = fitted  # noqa: F841 — keep signature uniform
    import hashlib

    def dim(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n

    assert fitted.idf_[dim("the")] < fitted.idf_[dim("parquet")]
    # smooth idf floor: every never-seen dimension reads ln(1+N)+1
    unseen = math.log(1.0 + fitted.n_docs_) + 1.0
    assert max(fitted.idf_) == pytest.approx(unseen)


def test_hashed_dim_matches_python_md5(spark):
    # the JVM dimension is the md5 idiom, bit-identical to python's
    from feature_factory_spark.operators.embeddings import hashed_dim_expr
    import hashlib

    toks = ["the", "Ünïcode", "a b", "x" * 100, "123"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {r["tok"]: r["dim"] for r in df.select(
        "tok", hashed_dim_expr(F.col("tok"), 256).alias("dim")
    ).collect()}
    for t in toks:
        want = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 256
        assert got[t] == want


def test_state_roundtrip(spark, corpus, fitted, tmp_path):
    path = str(tmp_path / "tfidf_state")
    fitted.save_state(path)
    restored = ff.HashedTfIdfVectorizer(
        "text", n_features=64
    ).load_state(path, spark)
    assert restored.idf_ == fitted.idf_
    assert restored.n_docs_ == fitted.n_docs_
    a = {r["doc_id"]: r["text_tfidf"]
         for r in fitted.transform(corpus).collect()}
    b = {r["doc_id"]: r["text_tfidf"]
         for r in restored.transform(corpus).collect()}
    assert a == b


def test_narrow_transform_plan(spark, corpus, fitted):
    plan = (fitted.transform(corpus)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan


def test_unfitted_and_bad_params(spark, corpus):
    with pytest.raises(FeatureFactoryError, match="fit"):
        ff.HashedTfIdfVectorizer("text").transform(corpus)
    with pytest.raises(FeatureFactoryError):
        ff.HashedTfIdfVectorizer("text", n_features=0)


def test_semantic_dedup_on_raw_text(spark, corpus):
    # the loop the operator exists for: raw text -> vectors ->
    # SemanticDeduplicator with NO external embedding model. Docs 1
    # and 4 are exact duplicates (cosine 1.0) — one must die; the
    # unrelated doc 3 must survive.
    docs = corpus.where("text IS NOT NULL AND text <> ''")
    vec = ff.HashedTfIdfVectorizer("text", n_features=64).fit(docs)
    embedded = vec.transform(docs)
    dedup = ff.SemanticDeduplicator(
        "text_tfidf", "doc_id", threshold=0.95, k=2, dim=64,
    )
    survivors = sorted(
        r["doc_id"] for r in dedup.fit(embedded).transform(embedded)
        .select("doc_id").collect()
    )
    assert 3 in survivors
    assert sorted({1, 4} & set(survivors)) in ([1], [4])
    assert len(survivors) == 3


def test_topk_on_raw_text(spark, corpus):
    # ANN loop: nearest neighbor of doc 1 by hashed TF-IDF is its
    # exact duplicate doc 4
    docs = corpus.where("text IS NOT NULL AND text <> ''")
    vec = ff.HashedTfIdfVectorizer("text", n_features=64).fit(docs)
    embedded = vec.transform(docs)
    top = ff.CosineTopK("text_tfidf", "doc_id", k=1).search(
        embedded, embedded.where("doc_id = 1")
    )
    row = top.collect()[0]
    assert row["neighbor_id"] == 4
    assert row["cosine"] == pytest.approx(1.0)


def test_fit_more_equals_union_refit(spark, corpus):
    # PCAProjection.fit_more discipline: merging a recrawl batch into
    # the fitted df counts must equal refitting on the union exactly
    # (integer-count construction)
    old = corpus.where("doc_id <= 3 AND text IS NOT NULL")
    batch = corpus.where("doc_id > 3 AND text IS NOT NULL")
    inc = ff.HashedTfIdfVectorizer("text", n_features=64).fit(old)
    inc.fit_more(batch)
    full = ff.HashedTfIdfVectorizer("text", n_features=64).fit(
        old.unionByName(batch)
    )
    assert inc.n_docs_ == full.n_docs_
    assert inc.doc_freq_ == full.doc_freq_
    assert inc.idf_ == full.idf_
    with pytest.raises(FeatureFactoryError, match="fit_more"):
        ff.HashedTfIdfVectorizer("text").fit_more(batch)


def test_bigram_features_separate_word_order(spark):
    # ngrams=(1,2): same bag of words, different order -> different
    # vectors; plain unigrams cannot tell them apart
    df = spark.createDataFrame(
        [(1, "new york city hall"), (2, "city hall new york"),
         (3, "new york city hall")],
        "doc_id bigint, text string",
    )
    uni = ff.HashedTfIdfVectorizer("text", n_features=64).fit(df)
    u = {r["doc_id"]: r["text_tfidf"]
         for r in uni.transform(df).collect()}
    assert u[1] == u[2] == u[3]
    bi = ff.HashedTfIdfVectorizer(
        "text", n_features=64, ngrams=(1, 2)
    ).fit(df)
    b = {r["doc_id"]: r["text_tfidf"]
         for r in bi.transform(df).collect()}
    assert b[1] == b[3]
    assert b[1] != b[2]
    import math
    assert math.isclose(sum(x * x for x in b[1]), 1.0, rel_tol=1e-9)
    with pytest.raises(FeatureFactoryError):
        ff.HashedTfIdfVectorizer("text", ngrams=(3,))


def test_grouped_path_bit_identical_to_fold(spark, corpus):
    # r12: the O(tokens) grouped path (explode -> groupBy -> map
    # lookup) must produce BIT-identical vectors to the fold path —
    # same tf counts, same idf literal, same normalization expression
    base = corpus.where("text IS NOT NULL")
    fold = ff.HashedTfIdfVectorizer(
        "text", n_features=128, ngrams=(1, 2), transform_path="fold"
    ).fit(base)
    grouped = ff.HashedTfIdfVectorizer(
        "text", n_features=128, ngrams=(1, 2),
        transform_path="grouped",
    ).fit(base)
    a = {r["doc_id"]: r["text_tfidf"]
         for r in fold.transform(corpus).collect()}
    b = {r["doc_id"]: r["text_tfidf"]
         for r in grouped.transform(corpus).collect()}
    assert a == b
    # edge rows survive the join path too
    assert b[5] == [0.0] * 128 and b[6] is None
    # 'auto' picks grouped above the cutoff, fold at-or-below it
    assert ff.HashedTfIdfVectorizer("text", n_features=256) \
        .transform_path == "auto"
    big = ff.HashedTfIdfVectorizer("text", n_features=256).fit(base)
    small = ff.HashedTfIdfVectorizer("text", n_features=16).fit(base)
    assert "__ff_tfidf_rid" not in small.transform(corpus).columns
    assert big.transform(corpus).columns == corpus.columns + ["text_tfidf"]


def test_grouped_path_preserves_row_multiplicity(spark):
    # fully-duplicate rows must survive the surrogate-id join
    rows = spark.createDataFrame(
        [("same text here",)] * 5, "text string"
    )
    v = ff.HashedTfIdfVectorizer(
        "text", n_features=512, transform_path="grouped"
    ).fit(rows)
    out = v.transform(rows)
    assert out.count() == 5
