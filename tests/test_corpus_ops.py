"""LineDeduplicator, UnigramLogProbScorer, KMeansClusterer (round 3
additions to the LLM-data-pipeline surface)."""

import math

import pytest

import feature_factory_spark as ff
from feature_factory_spark.exceptions import InvalidParameterError


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "unique one\nCOMMON LINE\nmore text"),
            (2, "COMMON LINE\nother stuff"),
            (3, "third doc\nCOMMON LINE"),
            (4, "COMMON LINE"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )


class TestLineDeduplicator:
    def test_removes_cross_doc_segments_in_order(self, docs):
        out = (
            ff.LineDeduplicator("doc_id", "text", min_docs=3)
            .transform(docs)
            .orderBy("doc_id")
            .collect()
        )
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[1]["text"] == "unique one\nmore text"
        assert by_id[1]["text_removed_segments"] == 1
        assert by_id[2]["text"] == "other stuff"
        assert by_id[3]["text"] == "third doc"
        # a doc that was ALL boilerplate survives as an empty string
        assert by_id[4]["text"] == ""
        assert by_id[4]["text_removed_segments"] == 1

    def test_below_threshold_segments_kept(self, docs):
        # "unique one" occurs in 1 doc < min_docs -> kept everywhere
        out = ff.LineDeduplicator("doc_id", "text", min_docs=5).transform(docs)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert rows[1]["text"] == "unique one\nCOMMON LINE\nmore text"
        assert rows[1]["text_removed_segments"] == 0

    def test_min_segment_chars_exempts_short_segments(self, spark):
        df = spark.createDataFrame(
            [(1, "x\nlong segment"), (2, "x\nother"), (3, "x")],
            ["doc_id", "text"],
        )
        out = ff.LineDeduplicator(
            "doc_id", "text", min_docs=2, min_segment_chars=2
        ).transform(df)
        rows = {r["doc_id"]: r for r in out.collect()}
        # "x" repeats in all 3 docs but is under min_segment_chars -> kept
        assert rows[3]["text"] == "x"
        assert rows[1]["text"] == "x\nlong segment"

    def test_fraction_threshold(self, docs):
        # COMMON LINE is in 4/5 docs = 0.8 -> removed at 0.8, kept at 0.9
        hi = ff.LineDeduplicator(
            "doc_id", "text", min_doc_fraction=0.9
        ).transform(docs)
        assert all(r["text_removed_segments"] == 0 for r in hi.collect())
        lo = ff.LineDeduplicator(
            "doc_id", "text", min_doc_fraction=0.8
        ).transform(docs)
        assert {r["doc_id"] for r in lo.collect() if r["text_removed_segments"]} == {
            1, 2, 3, 4,
        }

    def test_param_validation(self):
        with pytest.raises(InvalidParameterError):
            ff.LineDeduplicator("id", "t")  # neither threshold
        with pytest.raises(InvalidParameterError):
            ff.LineDeduplicator("id", "t", min_docs=3, min_doc_fraction=0.5)
        with pytest.raises(InvalidParameterError):
            ff.LineDeduplicator("id", "t", min_docs=1)
        with pytest.raises(InvalidParameterError):
            ff.LineDeduplicator("id", "t", min_doc_fraction=1.5)

    def test_preserves_other_columns(self, spark):
        df = spark.createDataFrame(
            [(1, "a\nb", "keep-me"), (2, "a\nc", "me-too")],
            ["doc_id", "text", "extra"],
        )
        out = ff.LineDeduplicator("doc_id", "text", min_docs=2).transform(df)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert rows[1]["extra"] == "keep-me"
        assert set(out.columns) == {
            "doc_id", "text", "extra", "text_removed_segments",
        }


class TestUnigramLogProbScorer:
    def test_scores_match_hand_computation(self, spark):
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "b c")], ["doc_id", "text"]
        )
        out = (
            ff.UnigramLogProbScorer("text", "doc_id")
            .fit(df)
            .transform(df)
            .collect()
        )
        # corpus: a=2 b=2 c=1, total=5
        rows = {r["doc_id"]: r["text_unigram_logprob"] for r in out}
        exp1 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
        exp2 = (math.log(2 / 5) + math.log(1 / 5)) / 2
        assert rows[1] == pytest.approx(exp1)
        assert rows[2] == pytest.approx(exp2)

    def test_unseen_words_get_count_floor(self, spark):
        fit_df = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
        new_df = spark.createDataFrame([(9, "zzz")], ["doc_id", "text"])
        op = ff.UnigramLogProbScorer("text", "doc_id").fit(fit_df)
        row = op.transform(new_df).collect()[0]
        # unseen word -> ln(1/total) with total=3
        assert row["text_unigram_logprob"] == pytest.approx(math.log(1 / 3))

    def test_empty_doc_scores_null(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "")], ["doc_id", "text"])
        op = ff.UnigramLogProbScorer("text", "doc_id").fit(df)
        rows = {r["doc_id"]: r for r in op.transform(df).collect()}
        assert rows[2]["text_unigram_logprob"] is None

    def test_requires_fit(self, spark):
        from feature_factory_spark.exceptions import FitNotCalledError

        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(FitNotCalledError):
            ff.UnigramLogProbScorer("text", "doc_id").transform(df)


class TestBigramLogProbScorer:
    def test_scores_match_hand_computation(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a"), (2, "b a")], ["doc_id", "text"]
        )
        op = ff.BigramLogProbScorer("text", "doc_id").fit(df)
        rows = {
            r["doc_id"]: r["text_bigram_logprob"]
            for r in op.transform(df).collect()
        }
        # unigrams: a=3 b=2 total=5; pairs: 'a b'=1, 'b a'=2
        # P(b|a)=1/3, P(a|b)=2/2=1; uni floor P(a)=3/5, P(b)=2/5
        lp_ab = math.log(0.75 * (1 / 3) + 0.25 * (2 / 5))
        lp_ba = math.log(0.75 * 1.0 + 0.25 * (3 / 5))
        assert rows[1] == pytest.approx((lp_ab + lp_ba) / 2)
        assert rows[2] == pytest.approx(lp_ba)

    def test_word_order_matters(self, spark):
        # natural order scores high, the same words reversed score low
        fit_df = spark.createDataFrame(
            [(i, "the cat sat on the mat") for i in range(5)],
            ["doc_id", "text"],
        )
        probe = spark.createDataFrame(
            [(100, "the cat sat on the mat"), (101, "mat the on sat cat the")],
            ["doc_id", "text"],
        )
        op = ff.BigramLogProbScorer("text", "doc_id").fit(fit_df)
        rows = {
            r["doc_id"]: r["text_bigram_logprob"]
            for r in op.transform(probe).collect()
        }
        assert rows[100] > rows[101]

    def test_unseen_pairs_fall_back_to_unigram_floor(self, spark):
        fit_df = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
        probe = spark.createDataFrame([(9, "zz qq")], ["doc_id", "text"])
        op = ff.BigramLogProbScorer("text", "doc_id").fit(fit_df)
        row = op.transform(probe).collect()[0]
        # pair unseen -> 0.75*0 + 0.25*ln-floor(1/3)
        assert row["text_bigram_logprob"] == pytest.approx(
            math.log(0.25 * (1 / 3))
        )

    def test_min_pair_count_prunes_to_floor(self, spark):
        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "c d")], ["doc_id", "text"]
        )
        op = ff.BigramLogProbScorer(
            "text", "doc_id", min_pair_count=2
        ).fit(df)
        rows = {
            r["doc_id"]: r["text_bigram_logprob"]
            for r in op.transform(df).collect()
        }
        # 'c d' pruned (count 1): scores as unseen; 'a b' kept (count 2)
        # unigrams: a=2 b=2 c=1 d=1 total=6
        assert rows[3] == pytest.approx(math.log(0.25 * (1 / 6)))
        assert rows[1] == pytest.approx(
            math.log(0.75 * 1.0 + 0.25 * (2 / 6))
        )

    def test_state_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "a b c a b"), (2, "c a b")], ["doc_id", "text"]
        )
        op = ff.BigramLogProbScorer("text", "doc_id").fit(df)
        path = str(tmp_path / "bigram_state")
        op.save_state(path)
        restored = ff.BigramLogProbScorer("text", "doc_id").load_state(
            path, spark
        )
        a = sorted(
            (r["doc_id"], r["text_bigram_logprob"])
            for r in op.transform(df).collect()
        )
        b = sorted(
            (r["doc_id"], r["text_bigram_logprob"])
            for r in restored.transform(df).collect()
        )
        assert a == b
        restored.release()
        op.release()

    def test_requires_fit(self, spark):
        from feature_factory_spark.exceptions import FitNotCalledError

        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(FitNotCalledError):
            ff.BigramLogProbScorer("text", "doc_id").transform(df)


class TestKMeansClusterer:
    def test_separated_clusters_recovered(self, spark):
        # two tight blobs far apart (cosine): e1-ish and e2-ish vectors
        rows = [(i, [10.0 + (i % 3), 0.1 * (i % 2), 0.0]) for i in range(10)]
        rows += [(100 + i, [0.1 * (i % 2), 10.0 + (i % 3), 0.0]) for i in range(10)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        km = ff.KMeansClusterer("embedding", "vec_id", k=2, iterations=3)
        out = km.fit(df).transform(df).collect()
        groups = {}
        for r in out:
            groups.setdefault(r["cluster"], set()).add(r["vec_id"] < 100)
        # each cluster is pure: only low ids or only high ids
        assert all(len(v) == 1 for v in groups.values())
        assert len(groups) == 2

    def test_deterministic_across_runs(self, spark):
        rows = [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(40)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        a = ff.KMeansClusterer("embedding", "vec_id", k=4, iterations=2)
        b = ff.KMeansClusterer("embedding", "vec_id", k=4, iterations=2)
        ra = sorted((r["vec_id"], r["cluster"]) for r in a.fit(df).transform(df).collect())
        rb = sorted((r["vec_id"], r["cluster"]) for r in b.fit(df).transform(df).collect())
        assert ra == rb

    def test_cluster_ids_in_range(self, spark):
        rows = [(i, [float(i), 1.0]) for i in range(20)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        km = ff.KMeansClusterer("embedding", "vec_id", k=3, iterations=1)
        out = km.fit(df).transform(df)
        vals = {r["cluster"] for r in out.collect()}
        assert vals <= {0, 1, 2}

    def test_lloyd_agg_plan_is_dim_independent(self, spark):
        """At dim=768, k=64 the Lloyd aggregate must hold exactly two
        aggregate expressions (sum, count) — not one per dimension —
        and the whole fit must complete without building a multi-MB
        per-dimension plan."""
        import re

        from pyspark.sql import functions as F

        from feature_factory_spark.operators.similarity import (
            cluster_sums_frame,
            lloyd_fit,
        )

        dim, k, n = 768, 64, 200
        rows = [
            (i, [float((i * 31 + j * 7) % 13) - 6.0 for j in range(dim)])
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])

        agg = cluster_sums_frame(
            df.select((F.col("vec_id") % 4).alias("cluster"),
                      F.col("embedding").alias("vec"))
        )
        plan = agg._jdf.queryExecution().optimizedPlan().toString()
        agg_line = next(ln for ln in plan.splitlines() if "Aggregate" in ln)
        # one sum + one count, regardless of dim
        assert len(re.findall(r"\bsum\(", agg_line)) == 1, agg_line
        assert "s767" not in plan and len(plan) < 20_000, len(plan)

        cents = lloyd_fit(df, "embedding", "vec_id", k, iterations=1)
        assert len(cents) == k and all(len(c) == dim for c in cents)


class TestVocabBuilder:
    def test_build_ranks_by_count_then_token(self, spark):
        df = spark.createDataFrame(
            [(1, "b b b a a c"), (2, "a d")], ["doc_id", "text"]
        )
        vocab = ff.VocabBuilder("text", "doc_id").build(df)
        rows = [(r["token"], r["count"], r["rank"]) for r in
                vocab.orderBy("rank").collect()]
        assert rows == [("a", 3, 1), ("b", 3, 2), ("c", 1, 3), ("d", 1, 4)]

    def test_vocab_size_cap_and_min_count(self, spark):
        df = spark.createDataFrame(
            [(1, "a a a b b c")], ["doc_id", "text"]
        )
        top = ff.VocabBuilder("text", "doc_id", vocab_size=2).build(df)
        assert [r["token"] for r in top.orderBy("rank").collect()] == ["a", "b"]
        floored = ff.VocabBuilder("text", "doc_id", min_count=2).build(df)
        assert {r["token"] for r in floored.collect()} == {"a", "b"}

    def test_oov_rate_hand_computed(self, spark):
        corpus = spark.createDataFrame(
            [(1, "a a b"), (2, "a b c")], ["doc_id", "text"]
        )
        vb = ff.VocabBuilder("text", "doc_id", vocab_size=2).fit(corpus)
        # vocab = {a (3), b (2)}; doc "a x y": 2 of 3 tokens OOV
        probe = spark.createDataFrame(
            [(10, "a x y"), (11, "a b"), (12, "  ")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r["text_oov_rate"] for r in vb.transform(probe).collect()}
        assert abs(out[10] - 2 / 3) < 1e-12
        assert out[11] == 0.0
        assert out[12] is None  # token-less document -> NULL, not 0

    def test_ngram_vocab_excludes_partial_grams(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "x")], ["doc_id", "text"]
        )
        vocab = ff.VocabBuilder("text", "doc_id", n=2).build(df)
        toks = {r["token"] for r in vocab.collect()}
        assert toks == {"a b", "b c"}  # the 1-word doc contributes nothing

    def test_lowercase_folding(self, spark):
        df = spark.createDataFrame([(1, "The the THE")], ["doc_id", "text"])
        vocab = ff.VocabBuilder("text", "doc_id").build(df)
        rows = [(r["token"], r["count"]) for r in vocab.collect()]
        assert rows == [("the", 3)]

    def test_transform_before_fit_raises(self, spark):
        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(ff.FitNotCalledError):
            ff.VocabBuilder("text", "doc_id").transform(df)


class TestFrameStateGuards:
    def test_fitted_frame_state_roundtrips_through_save(self, spark, tmp_path):
        # r5: frame-held state persists to parquet — save/load/transform
        # now WORKS (full round-trip equality in tests/test_persistence.py)
        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        for make in (
            lambda: ff.VocabBuilder("text", "doc_id"),
            lambda: ff.UnigramLogProbScorer("text", "doc_id"),
        ):
            op = make().fit(df)
            p = str(tmp_path / f"{type(op).__name__}_state")
            op.save_state(p)
            restored = make().load_state(p, spark)
            assert restored.transform(df).count() == 1
            op.release()
            restored.release()

    def test_scalar_only_state_raises_fit_contract_error(self, spark):
        # legacy scalar-only restores mark the instance fitted but carry
        # no frame; transform must fail with the remedy, not AttributeError
        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        op = ff.UnigramLogProbScorer("text", "doc_id")
        op.set_fitted_state({"total_words_": 2.0})
        with pytest.raises(ff.FitNotCalledError, match="freq_df_"):
            op.transform(df)


class TestVocabBuilderNullText:
    def test_null_text_contributes_no_tokens_any_n(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, None), (3, None)], "doc_id bigint, text string"
        )
        for n in (1, 2):
            vocab = ff.VocabBuilder("text", "doc_id", n=n).build(df)
            toks = [r["token"] for r in vocab.collect()]
            assert None not in toks, (n, toks)
            assert toks  # the real doc still contributes
        # NULL-text docs score NULL oov (token-less), not 1.0
        vb = ff.VocabBuilder("text", "doc_id", n=2).fit(df)
        out = {r["doc_id"]: r["text_oov_rate"] for r in vb.transform(df).collect()}
        assert out[2] is None and out[3] is None

    def test_refit_unpersists_previous_frame(self, spark):
        # refit on a DIFFERENT corpus: with the same input the old and
        # new frames share a canonical plan, and the cache manager
        # reports the new entry for the old handle
        df1 = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
        df2 = spark.createDataFrame([(2, "c d e")], "doc_id bigint, text string")
        vb = ff.VocabBuilder("text", "doc_id").fit(df1)
        first = vb.vocab_df_
        vb.fit(df2)
        assert first.storageLevel.useMemory is False  # released
        assert vb.vocab_df_ is not first

        lm = ff.UnigramLogProbScorer("text", "doc_id").fit(df1)
        f1 = lm.freq_df_
        lm.fit(df2)
        assert f1.storageLevel.useMemory is False


class TestEncodingFixer:
    def test_repairs_byte_roundtrip_mojibake(self, spark):
        clean = "Caf\u00e9 \u2014 \u201cquoted\u201d \u2026 na\u00efve \u0153uvre \u00df 10\u00b0 f\u00fcr 5\u20ac \u00c0 bient\u00f4t"
        moji_cp = clean.encode("utf-8").decode("cp1252", errors="ignore")
        moji_l1 = clean.encode("utf-8").decode("latin-1")
        df = spark.createDataFrame(
            [(1, moji_cp), (2, moji_l1), (3, "plain ascii text"), (4, None)],
            "doc_id bigint, text string",
        )
        rows = {r["doc_id"]: r["text"]
                for r in ff.EncodingFixer(["text"]).transform(df).collect()}
        # cp1252 decode drops the bytes it can't map ('ignore'), so only
        # the latin-1 corruption round-trips every char exactly
        assert rows[2] == clean
        assert "Caf\u00e9" in rows[1] and "\u201cquoted\u201d" in rows[1]
        assert "\u00c3" not in rows[1] and "\u00e2\u20ac" not in rows[1]
        assert rows[3] == "plain ascii text"
        assert rows[4] is None

    def test_nbsp_and_controls(self, spark):
        df = spark.createDataFrame(
            [(1, "a\u00a0b\x07cd\x9de"), (2, "keep\ttabs\nand newlines")],
            "doc_id bigint, text string",
        )
        rows = {r["doc_id"]: r["text"]
                for r in ff.EncodingFixer(["text"]).transform(df).collect()}
        assert rows[1] == "a bcde"
        assert rows[2] == "keep\ttabs\nand newlines"

    def test_idempotent(self, spark):
        clean = "Caf\u00e9 \u2014 \u201cquoted\u201d f\u00fcr na\u00efve"
        moji = clean.encode("utf-8").decode("latin-1")
        df = spark.createDataFrame([(1, moji)], "doc_id bigint, text string")
        op = ff.EncodingFixer(["text"])
        once = op.transform(df)
        twice = op.transform(once)
        assert once.collect() == twice.collect()

    def test_plan_is_narrow(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        plan = (ff.EncodingFixer(["text"]).transform(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Join" not in plan and "Exchange" not in plan
