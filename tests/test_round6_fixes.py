"""Round-6 hardening (ADVICE r5 items): save_state layout-migration
errors, release() frame ownership, ContaminationChecker fit-path
persistence, and BucketedCosineTopK empty-meta fail-loud."""

import os

import pytest
from pyspark import StorageLevel
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.exceptions import StatePersistenceError


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog %d" % i)
            for i in range(20)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# -- save_state layout migration (ADVICE item 1) ------------------------


def test_frameless_save_over_directory_raises_package_error(spark, docs, tmp_path):
    path = str(tmp_path / "state")
    scorer = ff.UnigramLogProbScorer("text", "doc_id")
    scorer.fit(docs)
    scorer.save_state(path)  # directory layout (frame-holding)
    scaler = ff.MinMaxScaler(["v"])
    scaler.fit(spark.createDataFrame([(1.0,), (2.0,)], "v double"))
    with pytest.raises(StatePersistenceError, match="directory"):
        scaler.save_state(path)
    scorer.release()


def test_frame_save_over_file_raises_package_error(spark, docs, tmp_path):
    path = str(tmp_path / "state.json")
    scaler = ff.MinMaxScaler(["v"])
    scaler.fit(spark.createDataFrame([(1.0,), (2.0,)], "v double"))
    scaler.save_state(path)  # single JSON file (frameless)
    scorer = ff.UnigramLogProbScorer("text", "doc_id")
    scorer.fit(docs)
    with pytest.raises(StatePersistenceError, match="file"):
        scorer.save_state(path)
    scorer.release()


# -- release() ownership (ADVICE item 2) --------------------------------


def test_release_does_not_evict_caller_owned_query_frame(spark, docs):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id bigint, embedding array<float>",
    )
    queries = emb.where(F.col("vec_id") < 2).persist(StorageLevel.MEMORY_ONLY)
    try:
        queries.count()
        op = ff.CosineTopK("embedding", "vec_id", k=3)
        op.fit(queries)
        op.release()
        # the CALLER's cache must survive: fit() only referenced the frame
        assert queries.storageLevel.useMemory
    finally:
        queries.unpersist()


def test_release_unpersists_operator_owned_frames(spark, docs):
    scorer = ff.UnigramLogProbScorer("text", "doc_id")
    scorer.fit(docs)
    assert scorer.freq_df_.storageLevel != StorageLevel.NONE
    scorer.release()
    assert scorer.freq_df_.storageLevel == StorageLevel.NONE


def test_release_after_load_state_unpersists(spark, docs, tmp_path):
    path = str(tmp_path / "vocab_state")
    vb = ff.VocabBuilder("text", "doc_id", vocab_size=16)
    vb.fit(docs)
    vb.save_state(path)
    vb.release()
    restored = ff.VocabBuilder("text", "doc_id", vocab_size=16)
    restored.load_state(path, spark)
    assert restored.vocab_df_.storageLevel != StorageLevel.NONE
    restored.release()
    assert restored.vocab_df_.storageLevel == StorageLevel.NONE


# -- ContaminationChecker fit-path persist (ADVICE item 5) --------------


def test_contamination_fit_persists_bench_hashes(spark, docs):
    checker = ff.ContaminationChecker("text", "doc_id", n=3)
    checker.fit(docs.limit(5))
    assert checker.bench_hashes_.storageLevel != StorageLevel.NONE
    first = checker.bench_hashes_
    checker.fit(docs.limit(3))  # refit releases the previous frame
    assert first.storageLevel == StorageLevel.NONE
    assert checker.bench_hashes_.storageLevel != StorageLevel.NONE
    checker.release()
    assert checker.bench_hashes_.storageLevel == StorageLevel.NONE


# -- BucketedCosineTopK empty meta (ADVICE item 3) ----------------------


def test_bucketed_search_index_empty_meta_fails_loud(spark, tmp_path):
    path = str(tmp_path / "lshidx")
    # write an empty meta dataset (simulates a partial write)
    empty = spark.createDataFrame(
        [], "dim int, n_planes int, n_chunks int, seed int"
    )
    empty.write.parquet(os.path.join(path, "meta"))
    op = ff.BucketedCosineTopK("embedding", "vec_id", k=3, dim=2)
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(Exception, match="no LSH meta"):
        op.search_index(spark, path, queries)
