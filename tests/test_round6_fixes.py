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


# -- NgramLanguageIdentifier (VERDICT r5 item 2) ------------------------


class TestNgramLanguageIdentifier:
    def test_holdout_accuracy(self, spark):
        from pyspark.sql import functions as F

        from feature_factory_spark.functions.langdata import HOLDOUT, fixture_df

        op = ff.NgramLanguageIdentifier("text", "doc_id").fit_default(spark)
        assert len(op.langs_) == len(HOLDOUT) == 30
        hold = fixture_df(spark, "holdout").select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("lang").alias("expected"),
            "text",
        )
        pred = op.transform(hold).select("expected", "text_lang").collect()
        correct = sum(1 for r in pred if r["expected"] == r["text_lang"])
        assert correct >= 0.9 * len(pred), (correct, len(pred))
        op.release()

    def test_und_for_letterless_and_null_text(self, spark):
        op = ff.NgramLanguageIdentifier("text", "doc_id").fit_default(spark)
        e = spark.createDataFrame(
            [(1, ""), (2, "123 456 !!!"), (3, None), (4, "   ")],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: r["text_lang"]
               for r in op.transform(e).collect()}
        assert got == {1: "und", 2: "und", 3: "und", 4: "und"}
        op.release()

    def test_state_roundtrip(self, spark, tmp_path):
        op = ff.NgramLanguageIdentifier("text", "doc_id").fit_default(spark)
        path = str(tmp_path / "lid")
        op.save_state(path)
        restored = ff.NgramLanguageIdentifier("text", "doc_id").load_state(
            path, spark
        )
        e = spark.createDataFrame(
            [(1, "the cat sat on the mat with the dog and we went home"),
             (2, "der hund und die katze sind nicht mit uns nach hause gegangen")],
            "doc_id bigint, text string",
        )
        a = sorted((r["doc_id"], r["text_lang"]) for r in op.transform(e).collect())
        b = sorted((r["doc_id"], r["text_lang"]) for r in restored.transform(e).collect())
        assert a == b == [(1, "en"), (2, "de")]
        op.release()
        restored.release()

    def test_plan_is_broadcast_join_no_python(self, spark):
        op = ff.NgramLanguageIdentifier("text", "doc_id").fit_default(spark)
        e = spark.createDataFrame(
            [(1, "hello world")], "doc_id bigint, text string"
        )
        plan = op.transform(e)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan
        op.release()


# -- SemanticDeduplicator (VERDICT r5 item 4) ---------------------------


class TestSemanticDeduplicator:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        import random

        rng = random.Random(11)
        rows = []
        for i in range(40):
            rows.append((i, [rng.gauss(0, 1) for _ in range(8)]))
        # plant 3 near-dup partners of vectors 0, 1, 2
        for i in range(3):
            v = list(rows[i][1])
            v[0] += 0.01
            rows.append((100 + i, v))
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    def test_finds_planted_pairs_only(self, corpus):
        op = ff.SemanticDeduplicator(
            "embedding", "vec_id", threshold=0.99, k=4, dim=8
        )
        op.fit(corpus)
        pairs = op.candidate_pairs(corpus).collect()
        assert {(r["a_id"], r["b_id"]) for r in pairs} == {
            (0, 100), (1, 101), (2, 102)
        }
        for r in pairs:
            assert r["cosine"] >= 0.99

    def test_transform_drops_larger_ids(self, corpus):
        op = ff.SemanticDeduplicator(
            "embedding", "vec_id", threshold=0.99, k=4, dim=8
        )
        kept = sorted(
            r["vec_id"] for r in op.fit(corpus).transform(corpus).collect()
        )
        assert kept == sorted(set(range(40)))

    def test_pairs_share_cluster(self, corpus):
        op = ff.SemanticDeduplicator(
            "embedding", "vec_id", threshold=0.99, k=4, dim=8
        )
        op.fit(corpus)
        clusters = {r["cluster"] for r in op.candidate_pairs(corpus).collect()}
        assert clusters  # pair frame carries the shared cluster id
        # cluster ids are valid
        assert all(0 <= c < 4 for c in clusters)

    def test_state_roundtrip(self, corpus, spark, tmp_path):
        op = ff.SemanticDeduplicator(
            "embedding", "vec_id", threshold=0.99, k=4, dim=8
        )
        op.fit(corpus)
        path = str(tmp_path / "sem.json")
        op.save_state(path)
        restored = ff.SemanticDeduplicator(
            "embedding", "vec_id", threshold=0.99, k=4, dim=8
        ).load_state(path)
        a = sorted((r["a_id"], r["b_id"])
                   for r in op.candidate_pairs(corpus).collect())
        b = sorted((r["a_id"], r["b_id"])
                   for r in restored.candidate_pairs(corpus).collect())
        assert a == b == [(0, 100), (1, 101), (2, 102)]


# -- QualityScorer (VERDICT r5 item 5) ----------------------------------


class TestQualityScorer:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        good = [
            (i,
             "the quick brown fox jumps over the lazy dog and then the "
             "cat and the dog walk home together to have a long dinner "
             "with all of their friends in the warm house near the lake "
             "while the sun goes down over the quiet hills %d" % i)
            for i in range(30)
        ]
        bad = [
            (100 + i, "$$$ %% @@ ## !! ?? ^^ && ** (( )) %d" % i)
            for i in range(30)
        ]
        return spark.createDataFrame(good + bad, "doc_id bigint, text string")

    def test_separates_good_from_junk(self, corpus):
        op = ff.QualityScorer("text").fit(corpus)
        rows = op.transform(corpus).select("doc_id", "text_quality_prob").collect()
        good_p = [r["text_quality_prob"] for r in rows if r["doc_id"] < 100]
        bad_p = [r["text_quality_prob"] for r in rows if r["doc_id"] >= 100]
        assert min(good_p) > max(bad_p)
        assert all(0.0 <= p <= 1.0 for p in good_p + bad_p)

    def test_null_text_scores_null(self, corpus):
        op = ff.QualityScorer("text").fit(corpus)
        out = op.transform(
            corpus.sparkSession.createDataFrame(
                [(1, None)], "doc_id bigint, text string"
            )
        ).collect()
        assert out[0]["text_quality_prob"] is None

    def test_state_roundtrip_scores_identical(self, corpus, tmp_path):
        op = ff.QualityScorer("text").fit(corpus)
        path = str(tmp_path / "qs.json")
        op.save_state(path)
        restored = ff.QualityScorer("text").load_state(path)
        a = [r["text_quality_prob"]
             for r in op.transform(corpus).orderBy("doc_id").collect()]
        b = [r["text_quality_prob"]
             for r in restored.transform(corpus).orderBy("doc_id").collect()]
        assert a == b  # scalar-coefficient state -> bit-identical exprs

    def test_transform_plan_is_pure_projection(self, corpus):
        op = ff.QualityScorer("text").fit(corpus)
        plan = (
            op.transform(corpus)
            ._jdf.queryExecution().executedPlan().toString()
        )
        for marker in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan


class TestNgramLangMargin:
    @pytest.fixture(scope="class")
    def lid(self, spark):
        return ff.NgramLanguageIdentifier(
            "text", "doc_id", emit_margin=True
        ).fit_default(spark)

    @pytest.fixture(scope="class")
    def frame(self, spark):
        return spark.createDataFrame(
            [(1, "the cat sat on the mat and the dog went home with them"),
             (2, "der hund und die katze gingen zusammen nach hause heute"),
             # mixed en/de: a real call either way is unreliable
             (3, "the cat sat der hund und on the mat die katze gingen"),
             (4, "12345 67890 ...")],
            "doc_id bigint, text string",
        )

    def test_margin_column_and_ordering(self, lid, frame):
        rows = {r["doc_id"]: r for r in lid.transform(frame).collect()}
        assert rows[1]["text_lang"] == "en"
        assert rows[2]["text_lang"] == "de"
        assert rows[4]["text_lang"] == "und"
        assert rows[4]["text_lang_margin"] == 0.0
        # clean monolingual text calls are more confident than mixed
        assert rows[1]["text_lang_margin"] > rows[3]["text_lang_margin"]
        assert rows[2]["text_lang_margin"] > rows[3]["text_lang_margin"]
        assert all(rows[i]["text_lang_margin"] >= 0 for i in rows)

    def test_min_margin_demotes_mixed(self, spark, lid, frame):
        margins = {
            r["doc_id"]: r["text_lang_margin"]
            for r in lid.transform(frame).collect()
        }
        cut = (margins[3] + min(margins[1], margins[2])) / 2
        strict = ff.NgramLanguageIdentifier(
            "text", "doc_id", min_margin=cut
        ).fit_default(spark)
        rows = {r["doc_id"]: r for r in strict.transform(frame).collect()}
        assert rows[1]["text_lang"] == "en"
        assert rows[2]["text_lang"] == "de"
        assert rows[3]["text_lang"] == "und"  # demoted
        assert "text_lang_margin" not in rows[1].asDict()  # emit off

    def test_default_margin_keeps_labels(self, spark, frame, lid):
        plain = ff.NgramLanguageIdentifier("text", "doc_id").fit_default(spark)
        a = {r["doc_id"]: r["text_lang"] for r in plain.transform(frame).collect()}
        b = {r["doc_id"]: r["text_lang"] for r in lid.transform(frame).collect()}
        assert a == b


def test_release_unpersists_frames_from_legacy_state_dirs(spark, tmp_path):
    # a pre-r6 NgramLanguageIdentifier state dir also persisted the
    # derived wide pivot; load_state restores + owns it, and release()
    # must unpersist OWNED frames even when the current code no longer
    # declares them in _frame_state_attrs()
    import json
    import os

    op = ff.NgramLanguageIdentifier("text", "doc_id").fit_default(spark)
    path = str(tmp_path / "legacy")
    op.save_state(path)
    op.release()
    # forge the legacy layout: add the wide frame + list it in the json
    op2 = ff.NgramLanguageIdentifier("text", "doc_id").fit_default(spark)
    op2.wide_df_.write.parquet(os.path.join(path, "frame_wide_df_"))
    op2.release()
    meta = json.load(open(os.path.join(path, "state.json")))
    meta["frames"] = ["profile_df_", "wide_df_"]
    json.dump(meta, open(os.path.join(path, "state.json"), "w"))

    sc = spark.sparkContext
    before = len(sc._jsc.getPersistentRDDs())
    restored = ff.NgramLanguageIdentifier("text", "doc_id").load_state(
        path, spark
    )
    restored.profile_df_.count()
    restored.wide_df_.count() if restored.wide_df_ is not None else None
    assert len(sc._jsc.getPersistentRDDs()) > before  # frames pinned
    restored.release()
    assert len(sc._jsc.getPersistentRDDs()) == before  # ALL released
