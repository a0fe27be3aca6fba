"""Join-shape contracts for the dedup/similarity operators.

At 100 TB the difference between a bucketed/broadcast join and an
accidental cartesian product is the whole ballgame; these tests pin the
physical join strategies so a refactor can't silently regress them.
"""

import pytest

from pyspark.sql import functions as F

import feature_factory_spark as ff


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"document number {i} with some shared boilerplate text tokens {i % 7}")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (i, [float((i * 13 + j * 5) % 11) - 5.0 for j in range(16)])
        for i in range(80)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_candidates_never_cartesian(docs):
    for pairing in ("star", "all"):
        dd = ff.MinHashDeduplicator(
            "text", "doc_id", threshold=0.5, bucket_pairing=pairing
        )
        plan = _phys(dd.candidate_pairs(docs))
        assert "CartesianProduct" not in plan, pairing
        assert "BroadcastNestedLoopJoin" not in plan, pairing


def test_simhash_candidates_never_cartesian(docs):
    dd = ff.SimHashDeduplicator("text", "doc_id", hamming_threshold=4)
    plan = _phys(dd.candidate_pairs(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_lsh_candidates_never_cartesian(vecs):
    dd = ff.EmbeddingDeduplicator(
        "embedding", "vec_id", threshold=0.8, method="lsh", dim=16
    )
    plan = _phys(dd.candidate_pairs(vecs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_topk_broadcasts_query_side_only(vecs):
    queries = vecs.where(F.col("vec_id") < 3)
    out = ff.CosineTopK("embedding", "vec_id", k=5).search(vecs, queries)
    plan = _phys(out)
    # the deliberate broadcast NLJ: |queries| rows broadcast, corpus
    # streamed in place — the corpus side must never shuffle for the join
    assert "BroadcastNestedLoopJoin" in plan


def test_bucketed_topk_uses_broadcast_hash_join(vecs):
    queries = vecs.where(F.col("vec_id") < 3)
    out = ff.BucketedCosineTopK("embedding", "vec_id", k=5, dim=16).search(
        vecs, queries
    )
    plan = _phys(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_search_join_is_broadcast_on_cluster(vecs):
    ivf = ff.IVFCosineTopK(
        "embedding", "vec_id", k=5, n_centroids=4, n_probe=2, iterations=1
    )
    queries = vecs.where(F.col("vec_id") < 3)
    out = ivf.search(vecs, queries)
    plan = _phys(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_vocab_build_is_single_aggregation_no_cartesian(docs):
    # corpus counting must be ONE map-side-combined aggregation chain:
    # partial hash-agg before the exchange, final after — never a join
    plan = _phys(ff.VocabBuilder("text", "doc_id", vocab_size=10).build(docs))
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_vocab_oov_join_never_cartesian(docs):
    vb = ff.VocabBuilder("text", "doc_id", vocab_size=10).fit(docs)
    plan = _phys(vb.transform(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_binary_decode_paths_are_narrow_maps(spark):
    """Image/audio decoding is mapInPandas over the scan — appending
    decoded features must introduce NO exchange (r5: real codecs must
    not change the narrow plumbing the r4 audit signed off on)."""
    from feature_factory_spark.operators import (
        audio_schema, image_decoder, image_schema, solid_png, wav_decoder,
        constant_wav,
    )

    rows = [(i, solid_png(4, 3, i % 256), constant_wav(50, (i % 10) / 10))
            for i in range(20)]
    df = spark.createDataFrame(rows, "id bigint, img binary, wav binary")
    out = ff.BinaryFeatureExtractor(
        "img", decoder=image_decoder, feature_schema=image_schema()
    ).transform(df)
    out = ff.BinaryFeatureExtractor(
        "wav", decoder=wav_decoder, feature_schema=audio_schema()
    ).transform(out)
    plan = _phys(out.select("id", "img_mean", "wav_rms"))
    assert "Exchange" not in plan, plan[:2000]
    assert plan.count("MapInPandas") == 2


# -- round-6 LLM-curation operators ------------------------------------


def test_semantic_dedup_pairs_never_cartesian(vecs):
    op = ff.SemanticDeduplicator(
        "embedding", "vec_id", threshold=0.8, k=4, dim=16
    ).fit(vecs)
    plan = _phys(op.candidate_pairs(vecs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_langid_probe_is_broadcast_hash_join(spark, docs):
    op = ff.NgramLanguageIdentifier("text", "doc_id").fit_default(spark)
    plan = _phys(op.transform(docs))
    # the wide profile (<= |langs| * top_k rows) must ride a broadcast
    # hash join; a shuffled probe would move the whole corpus instead
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bpe_transform_and_encode_never_cartesian(docs):
    op = ff.BpeVocabBuilder("text", "doc_id", num_merges=8).fit(docs)
    for frame in (op.transform(docs), op.encode(docs)):
        plan = _phys(frame)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_bigram_scorer_transform_never_cartesian(docs):
    op = ff.BigramLogProbScorer("text", "doc_id").fit(docs)
    plan = _phys(op.transform(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_scorer_transform_is_narrow(spark):
    # scoring is a pure projection over the learned weights: any join or
    # shuffle here would be a regression at corpus scale
    good = (
        "the quick brown fox jumps over the lazy dog and then the cat "
        "and the dog walk home together to have a long dinner with all "
        "of their friends in the warm house near the lake while the sun "
        "goes down over the quiet hills"
    )
    rows = [(i, f"{good} {i}") for i in range(30)] + [
        (100 + i, "$$$ %% @@ ## !! ?? ^^ && ** (( )) %d" % i)
        for i in range(30)
    ]
    corpus = spark.createDataFrame(rows, "doc_id bigint, text string")
    op = ff.QualityScorer("text").fit(corpus)
    plan = _phys(op.transform(corpus))
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_source_mixer_transform_is_narrow(spark):
    rows = [(i, "a" if i % 2 else "b", f"text {i}") for i in range(40)]
    corpus = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    op = ff.SourceMixer("doc_id", "source", {"a": 1.0, "b": 1.0}).fit(corpus)
    plan = _phys(op.transform(corpus))
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_media_hash_dedup_never_cartesian(spark):
    # the r8 perceptual dedup family (image/audio/video) shares the
    # pigeonhole blocking: equi-join on (chunk index, chunk value),
    # never a cross product — pinned on the hash_col reuse path (no
    # decode needed for a plan-shape check)
    hashed = spark.createDataFrame(
        [(i, (i * 2654435761) % (1 << 63)) for i in range(64)],
        "doc_id bigint, h bigint",
    )
    for op in (
        ff.ImageDeduplicator("doc_id", hash_col="h", hamming_threshold=2),
        ff.AudioDeduplicator("doc_id", hash_col="h", hamming_threshold=2),
        ff.VideoDeduplicator("doc_id", hash_col="h", hamming_threshold=2),
    ):
        plan = _phys(op.candidate_pairs(hashed))
        assert "CartesianProduct" not in plan, type(op).__name__
        assert "BroadcastNestedLoopJoin" not in plan, type(op).__name__


def test_corpus_diff_single_equijoin(spark):
    from feature_factory_spark.operators.diff import corpus_diff

    old = spark.createDataFrame([(i, f"t{i}") for i in range(40)],
                                "doc_id bigint, text string")
    new = spark.createDataFrame([(i, f"t{i+1}") for i in range(40)],
                                "doc_id bigint, text string")
    plan = _phys(corpus_diff(old, new, "doc_id", ["text"]))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly one join feeds the status projection
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") \
        + plan.count("ShuffledHashJoin") == 1


def test_perplexity_bucketer_transform_no_corpus_shuffle(spark):
    # the cutpoint CASE is a broadcast join: the corpus side must not
    # exchange (no global sort/window formulation)
    df = spark.createDataFrame([(i, float(i)) for i in range(100)],
                               "doc_id bigint, s double")
    b = ff.PerplexityBucketer("s").fit(df)
    plan = _phys(b.transform(df))
    # the single-row cutpoint frame broadcasts (a 1-row broadcast
    # nested-loop join is the correct physical shape for the ungrouped
    # cross join); the corpus itself never hash-shuffles
    assert "CartesianProduct" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan


# --- r9 operators -------------------------------------------------------

def test_remove_spans_never_cartesian(docs):
    op = ff.ExactSubstringDeduplicator("text", "doc_id", k=4, min_docs=2)
    for keep in ("first", "none"):
        plan = _phys(op.remove_spans(docs, keep=keep))
        assert "CartesianProduct" not in plan, keep
        assert "BroadcastNestedLoopJoin" not in plan, keep


def test_pca_transform_is_narrow(vecs):
    op = ff.PCAProjection("embedding", dim=16, k=4).fit(vecs)
    plan = _phys(op.transform(vecs))
    # the projection is one literal-matrix zip_with: no shuffle, no join
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_badwords_is_narrow(docs):
    plan = _phys(ff.BadWordsFilter("text", ["shared"]).transform(docs))
    assert "Exchange" not in plan and "Join" not in plan


def test_unigram_encode_broadcasts_piece_table(docs):
    op = ff.UnigramVocabBuilder(
        "text", "doc_id", vocab_size=30, seed_size=60, max_piece_len=4
    ).fit(docs)
    plan = _phys(op.encode(docs))
    assert "BroadcastHashJoin" in plan  # word-grain piece table broadcast
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pdf_text_read_media_is_narrow_map(spark, tmp_path):
    from feature_factory_spark.operators.pdfcodec import make_pdf
    from feature_factory_spark.sources import read_media

    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "x.pdf").write_bytes(make_pdf(1, page_texts=["t"]))
    plan = _phys(read_media(spark, str(d), media="pdf_text"))
    assert "Exchange" not in plan  # binaryFile scan -> one Arrow map


def test_cross_modal_never_cartesian(spark):
    # r10: the merged-pair-frame CC + survivor anti-join must stay
    # keyed joins — never a cartesian/nested-loop over the page frame
    pages = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "page_id bigint, q double"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 30, 3)], "a_id bigint, b_id bigint"
    )
    op = ff.CrossModalDeduplicator("page_id", {"text": pairs})
    plan = _phys(op.transform(pages))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    prio = ff.CrossModalDeduplicator(
        "page_id", {"text": pairs}, policy="priority", priority_col="q"
    )
    plan2 = _phys(prio.transform(pages))
    assert "CartesianProduct" not in plan2
    assert "BroadcastNestedLoopJoin" not in plan2


def test_corpus_report_single_scan_aggregate(spark):
    # r10: one groupBy aggregate; the share window runs over the
    # AGGREGATED frame (a second full-input scan would show up as two
    # scan nodes over the same relation)
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", i * 10) for i in range(50)],
        "doc_id bigint, source string, n_chars int",
    )
    plan = _phys(ff.corpus_report(df, ["source"], ["n_chars"]))
    assert plan.count("Scan ExistingRDD") <= 1
    assert "CartesianProduct" not in plan


def _opt(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_dsir_staged_dims_survive_optimizer(spark):
    # r13 staged the token + hashed-dims arrays as real columns with a
    # size() guard as a materialization barrier: if a future Catalyst
    # constant-folds the trivially-true guard or CollapseProject
    # re-inlines the projection, the interpreted HOF fold re-runs the
    # tokenizer chain ~5x per row with no correctness signal (measured
    # 17x slower at sf0.1). Pin: the scoring aggregate must consume the
    # staged __ff_dsir_dims column, and the tokenizer split() must be
    # planned exactly once.
    import feature_factory_spark as ff

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i}") for i in range(30)],
        "doc_id bigint, text string",
    )
    op = ff.DSIRWeighter("text", id_col="doc_id", n_buckets=64)
    op.fit_target(docs.where(F.col("doc_id") % 3 == 0))
    op.fit(docs)
    plan = _opt(op.transform(docs))
    assert "aggregate(__ff_dsir_dims" in plan
    assert plan.count("split(") == 1


def test_main_content_staged_feats_survive_optimizer(spark):
    # same barrier discipline for the jusText-style block scorer: the
    # per-block feature array is referenced five times (chars/main
    # text/two counts); re-inlining would re-run the regexp chain per
    # reference.
    import feature_factory_spark as ff

    pages = spark.createDataFrame(
        [(i, f"<html><p>real content words here {i}</p><a href='#'>nav</a></html>")
         for i in range(10)],
        "doc_id bigint, page string",
    )
    plan = _opt(ff.MainContentExtractor(["page"]).transform(pages))
    assert "__ff_mc_feats_page" in plan
    # the staged column is consumed by the downstream filters/aggregates,
    # not re-inlined: the block regexp split is planned exactly once
    assert plan.count("filter(__ff_mc_feats_page") >= 2
