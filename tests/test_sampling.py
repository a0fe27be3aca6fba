"""Tests for deterministic sampling / splitting / sequence packing."""

import pytest

from pyspark.sql import functions as F

import feature_factory_spark as ff


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(F.col("id"))


def test_hash_sampler_stable_and_roughly_proportional(ids):
    s = ff.HashSampler("id", 0.25)
    a = {r["id"] for r in s.transform(ids).collect()}
    b = {r["id"] for r in s.transform(ids).collect()}
    assert a == b  # deterministic
    assert 0.18 <= len(a) / 2000 <= 0.32
    # growing the dataset never changes an existing row's fate
    bigger = ids.sparkSession.range(0, 4000).select(F.col("id"))
    c = {r["id"] for r in s.transform(bigger).collect()}
    assert a == {i for i in c if i < 2000}


def test_hash_splitter_partitions_everything(ids):
    t = ff.HashSplitter("id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    out = t.transform(ids)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert counts["train"] > counts["valid"] and counts["train"] > counts["test"]
    # disjoint and exhaustive by construction; re-run identical
    again = {(r["id"], r["split"]) for r in t.transform(ids).collect()}
    assert len(again) == 2000


def test_weighted_sampler_mixing_and_nesting(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "id bigint, src string")
    keep_low = ff.WeightedSampler("id", "src", {"a": 0.2, "b": 1.0})
    keep_high = ff.WeightedSampler("id", "src", {"a": 0.6, "b": 1.0})
    low = {r["id"] for r in keep_low.transform(df).collect()}
    high = {r["id"] for r in keep_high.transform(df).collect()}
    # all of group b survives either way
    assert all(i in low for i in range(1, 2000, 2))
    # group-a keep rates roughly match the fractions
    a_low = sum(1 for i in low if i % 2 == 0) / 1000
    a_high = sum(1 for i in high if i % 2 == 0) / 1000
    assert 0.13 <= a_low <= 0.27 and 0.5 <= a_high <= 0.7
    # nested samples: raising a fraction only ADDS rows
    assert low <= high


def test_weighted_sampler_default_fraction(spark):
    df = spark.createDataFrame(
        [(i, "other") for i in range(1000)], "id bigint, src string"
    )
    none_kept = ff.WeightedSampler("id", "src", {"a": 1.0}, default_fraction=0.0)
    assert none_kept.transform(df).count() == 0
    all_kept = ff.WeightedSampler("id", "src", {"a": 0.0}, default_fraction=1.0)
    assert all_kept.transform(df).count() == 1000


def test_weighted_sampler_rejects_bad_fraction():
    with pytest.raises(ff.InvalidParameterError):
        ff.WeightedSampler("id", "src", {"a": 1.5})


def test_hash_splitter_fractions_must_sum_to_one():
    with pytest.raises(ff.InvalidParameterError):
        ff.HashSplitter("id", {"a": 0.5, "b": 0.4})


def test_sequence_packer(spark):
    rows = [(i, "s", 100) for i in range(10)]  # 100 tokens each, one group
    df = spark.createDataFrame(rows, "id bigint, src string, tokens int")
    out = (
        ff.SequencePacker("tokens", budget=250, order_col="id", partition_cols=["src"])
        .transform(df)
        .orderBy("id")
        .collect()
    )
    # exclusive cumsum: 0,100,200,300,... -> packs 0,0,0,1,1,2,2,2,3,3
    assert [r["pack_id"] for r in out] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]


def test_sequence_packer_per_partition(spark):
    rows = [(i, f"s{i % 2}", 300) for i in range(6)]
    df = spark.createDataFrame(rows, "id bigint, src string, tokens int")
    out = (
        ff.SequencePacker("tokens", budget=600, order_col="id", partition_cols=["src"])
        .transform(df)
        .collect()
    )
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append((r["id"], r["pack_id"]))
    for src, pairs in by_src.items():
        packs = [p for _, p in sorted(pairs)]
        assert packs == [0, 0, 1]  # 300+300 fills a pack per group


class TestDocumentChunker:
    def test_short_doc_is_single_identity_chunk(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
        out = ff.DocumentChunker("text", chunk_size=10).transform(df).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["chunk_id"], r["text_chunk"], r["chunk_n_words"]) == (0, "a b c", 3)

    def test_overlapping_chunks_cover_all_words_in_order(self, spark):
        words = [f"w{i}" for i in range(25)]
        df = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id bigint, text string"
        )
        out = (
            ff.DocumentChunker("text", chunk_size=10, overlap=2)
            .transform(df)
            .orderBy("chunk_id")
            .collect()
        )
        # step 8: starts at 0, 8, 16, 24 -> 1 + ceil((25-10)/8) = 3... and
        # start 16 covers w16..w24 (9 words); chunks = ceil(15/8)+1 = 3
        assert [r["chunk_id"] for r in out] == [0, 1, 2]
        assert out[0]["text_chunk"].split() == words[0:10]
        assert out[1]["text_chunk"].split() == words[8:18]
        assert out[2]["text_chunk"].split() == words[16:25]
        assert out[2]["chunk_n_words"] == 9

    def test_no_overlap_partitions_exactly(self, spark):
        words = [f"t{i}" for i in range(12)]
        df = spark.createDataFrame([(1, " ".join(words))], "doc_id bigint, text string")
        out = (
            ff.DocumentChunker("text", chunk_size=4)
            .transform(df)
            .orderBy("chunk_id")
            .collect()
        )
        rebuilt = [w for r in out for w in r["text_chunk"].split()]
        assert rebuilt == words

    def test_invalid_params_rejected(self):
        import pytest as _pytest

        from feature_factory_spark.exceptions import InvalidParameterError

        with _pytest.raises(InvalidParameterError):
            ff.DocumentChunker("text", chunk_size=0)
        with _pytest.raises(InvalidParameterError):
            ff.DocumentChunker("text", chunk_size=4, overlap=4)


class TestSourceMixer:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # 3 sources with unequal availability: a=100, b=50, c=200
        rows = (
            [(i, "a") for i in range(100)]
            + [(100 + i, "b") for i in range(50)]
            + [(150 + i, "c") for i in range(200)]
        )
        return spark.createDataFrame(rows, "doc_id bigint, source string")

    def test_default_budget_keeps_scarcest_source_whole(self, corpus):
        # equal weights -> N = 3 * min(count) = 150; b is kept whole
        op = ff.SourceMixer(
            "doc_id", "source", {"a": 1.0, "b": 1.0, "c": 1.0}
        ).fit(corpus)
        assert op.rates_["b"] == 1.0
        assert op.rates_["a"] == 0.5
        assert op.rates_["c"] == 0.25
        out = op.transform(corpus)
        got = {r["source"]: r["count"]
               for r in out.groupBy("source").count().collect()}
        assert got["b"] == 50  # rate 1.0 is exact, not binomial
        assert 30 <= got["a"] <= 70 and 30 <= got["c"] <= 70

    def test_oversample_replicates_whole_copies(self, corpus):
        # budget 600 with equal weights -> target 200 each: a rate 2.0,
        # b rate 4.0, c rate 1.0 — all exact whole-copy replication
        op = ff.SourceMixer(
            "doc_id", "source", {"a": 1.0, "b": 1.0, "c": 1.0},
            budget_rows=600, allow_oversample=True,
        ).fit(corpus)
        out = op.transform(corpus)
        got = {r["source"]: r["count"]
               for r in out.groupBy("source").count().collect()}
        assert got == {"a": 200, "b": 200, "c": 200}
        copies = {r["source"]: r["m"] for r in out.groupBy("source")
                  .agg(F.max("mix_copy").alias("m")).collect()}
        assert copies == {"a": 1, "b": 3, "c": 0}

    def test_alpha_temperature_law(self, corpus):
        # p_s ∝ sqrt(count_s): counts a=100 b=50 c=200 ->
        # raw = 10, 7.071.., 14.142..; wsum sums sorted (a, b, c)
        import math

        op = ff.SourceMixer("doc_id", "source", alpha=0.5).fit(corpus)
        raw = {"a": 100 ** 0.5, "b": 50 ** 0.5, "c": 200 ** 0.5}
        wsum = raw["a"] + raw["b"] + raw["c"]
        props = {s: raw[s] / wsum for s in raw}
        ntot = min(100 / props["a"], 50 / props["b"], 200 / props["c"])
        for s, cnt in (("a", 100), ("b", 50), ("c", 200)):
            expect = math.floor(props[s] * ntot / cnt * 1e6 + 0.5) / 1e6
            assert op.rates_[s] == expect, s
        # alpha FLATTENS: the smallest source keeps a higher share than
        # its natural proportion, the largest a lower one
        assert op.rates_["b"] == 1.0  # scarcest stays whole
        assert op.rates_["c"] < op.rates_["a"] < 1.0

    def test_alpha_one_is_natural_proportions(self, corpus):
        op = ff.SourceMixer("doc_id", "source", alpha=1.0).fit(corpus)
        # p_s ∝ count_s -> every rate is exactly 1 (no-repeat identity)
        assert set(op.rates_.values()) == {1.0}

    def test_alpha_and_weights_are_exclusive(self, corpus):
        with pytest.raises(Exception, match="exactly one"):
            ff.SourceMixer("doc_id", "source", {"a": 1.0}, alpha=0.5)
        with pytest.raises(Exception, match="exactly one"):
            ff.SourceMixer("doc_id", "source")
        with pytest.raises(Exception, match="alpha"):
            ff.SourceMixer("doc_id", "source", alpha=1.5)

    def test_oversample_requires_opt_in(self, corpus):
        from feature_factory_spark.exceptions import InvalidParameterError

        with pytest.raises(InvalidParameterError):
            ff.SourceMixer(
                "doc_id", "source", {"a": 1.0, "b": 1.0, "c": 1.0},
                budget_rows=600,
            ).fit(corpus)

    def test_size_col_token_budget_mixing(self, spark):
        # r10: mixture measured in TOKEN units. a: 10 docs x 100 tokens
        # = 1000; b: 40 docs x 50 tokens = 2000. Equal weights -> the
        # scarcest source in token mass (a) is kept whole: N = 2000
        # tokens, target 1000 each -> rate_a = 1.0, rate_b = 0.5.
        rows = ([(i, "a", 100) for i in range(10)]
                + [(100 + i, "b", 50) for i in range(40)])
        df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tok int")
        op = ff.SourceMixer(
            "doc_id", "source", {"a": 1.0, "b": 1.0}, size_col="n_tok"
        ).fit(df)
        assert op.counts_ == {"a": 1000, "b": 2000}
        assert op.rates_ == {"a": 1.0, "b": 0.5}
        # a token BUDGET oversamples in token units: 6000 tokens total,
        # 3000 per source -> a rate 3.0 (whole copies), b rate 1.5
        op2 = ff.SourceMixer(
            "doc_id", "source", {"a": 1.0, "b": 1.0}, size_col="n_tok",
            budget_rows=6000, allow_oversample=True,
        ).fit(df)
        assert op2.rates_ == {"a": 3.0, "b": 1.5}
        got = {r["source"]: r["count"] for r in op2.transform(df)
               .groupBy("source").count().collect()}
        assert got["a"] == 30  # exact whole-copy replication
        assert 40 <= got["b"] <= 80  # binomial around 60 rows

    def test_size_col_temperature_mode(self, spark):
        # alpha over token mass, not doc counts
        rows = ([(i, "a", 100) for i in range(10)]
                + [(100 + i, "b", 50) for i in range(40)])
        df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tok int")
        import math

        op = ff.SourceMixer(
            "doc_id", "source", alpha=0.5, size_col="n_tok"
        ).fit(df)
        raw = {"a": 1000 ** 0.5, "b": 2000 ** 0.5}
        wsum = raw["a"] + raw["b"]
        props = {s: raw[s] / wsum for s in raw}
        ntot = min(1000 / props["a"], 2000 / props["b"])
        for s, mass in (("a", 1000), ("b", 2000)):
            expect = math.floor(props[s] * ntot / mass * 1e6 + 0.5) / 1e6
            assert op.rates_[s] == expect, s

    def test_size_col_null_mass_fails_loud(self, spark):
        df = spark.createDataFrame(
            [(1, "a", None), (2, "b", 10)],
            "doc_id bigint, source string, n_tok int",
        )
        from feature_factory_spark.exceptions import InvalidParameterError

        with pytest.raises(InvalidParameterError, match="positive"):
            ff.SourceMixer(
                "doc_id", "source", {"a": 1.0, "b": 1.0}, size_col="n_tok"
            ).fit(df)

    def test_unweighted_sources_dropped_missing_weighted_fail(self, corpus):
        from feature_factory_spark.exceptions import InvalidParameterError

        op = ff.SourceMixer("doc_id", "source", {"a": 1.0, "b": 1.0}).fit(
            corpus
        )
        assert set(op.rates_) == {"a", "b"}
        srcs = {r["source"] for r in op.transform(corpus)
                .select("source").distinct().collect()}
        assert srcs == {"a", "b"}
        with pytest.raises(InvalidParameterError):
            ff.SourceMixer(
                "doc_id", "source", {"a": 1.0, "zz": 1.0}
            ).fit(corpus)

    def test_deterministic_across_partitionings(self, corpus):
        op = ff.SourceMixer(
            "doc_id", "source", {"a": 2.0, "b": 1.0, "c": 1.0},
            budget_rows=300, allow_oversample=True,
        ).fit(corpus)
        a = sorted((r["doc_id"], r["mix_copy"])
                   for r in op.transform(corpus).collect())
        op2 = ff.SourceMixer(
            "doc_id", "source", {"a": 2.0, "b": 1.0, "c": 1.0},
            budget_rows=300, allow_oversample=True,
        ).fit(corpus.repartition(13))
        b = sorted((r["doc_id"], r["mix_copy"])
                   for r in op2.transform(corpus.repartition(7)).collect())
        assert a == b

    def test_default_budget_never_demands_oversample_opt_in(self, spark):
        # counts/weights whose min/divide round-trip lands one ulp
        # above 1.0 — the un-rounded check used to raise spuriously
        rows = (
            [(i, "a") for i in range(70)]
            + [(1000 + i, "b") for i in range(93)]
            + [(2000 + i, "c") for i in range(118)]
        )
        corpus = spark.createDataFrame(rows, "doc_id bigint, source string")
        op = ff.SourceMixer(
            "doc_id", "source", {"a": 2.0, "b": 2.0, "c": 7.0}
        ).fit(corpus)  # must not raise
        assert op.rates_["c"] == 1.0

    def test_state_roundtrip(self, corpus, tmp_path):
        op = ff.SourceMixer(
            "doc_id", "source", {"a": 1.0, "b": 1.0, "c": 1.0}
        ).fit(corpus)
        path = str(tmp_path / "mixer.json")
        op.save_state(path)
        restored = ff.SourceMixer(
            "doc_id", "source", {"a": 1.0, "b": 1.0, "c": 1.0}
        ).load_state(path)
        assert restored.rates_ == op.rates_
        a = sorted((r["doc_id"], r["mix_copy"])
                   for r in op.transform(corpus).collect())
        b = sorted((r["doc_id"], r["mix_copy"])
                   for r in restored.transform(corpus).collect())
        assert a == b


class TestStratifiedSampler:
    def test_exact_k_per_group(self, spark):
        rows = ([(i, "en") for i in range(100)]
                + [(200 + i, "fr") for i in range(30)]
                + [(400 + i, "de") for i in range(5)])
        df = spark.createDataFrame(rows, "doc_id bigint, lang string")
        out = ff.StratifiedSampler("doc_id", "lang", k=10).transform(df)
        got = {r["lang"]: r["count"]
               for r in out.groupBy("lang").count().collect()}
        # exact counts; the 5-row group is kept whole
        assert got == {"en": 10, "fr": 10, "de": 5}

    def test_deterministic_and_repartition_stable(self, spark):
        df = spark.createDataFrame(
            [(i, f"g{i % 3}") for i in range(90)],
            "doc_id bigint, lang string",
        )
        op = ff.StratifiedSampler("doc_id", "lang", k=7)
        a = sorted(r["doc_id"] for r in op.transform(df).collect())
        b = sorted(r["doc_id"]
                   for r in op.transform(df.repartition(13)).collect())
        c = sorted(r["doc_id"]
                   for r in ff.StratifiedSampler("doc_id", "lang", k=7,
                                                 skew_safe=False)
                   .transform(df).collect())
        assert a == b == c and len(a) == 21

    def test_salt_changes_draw(self, spark):
        df = spark.createDataFrame(
            [(i, "en") for i in range(100)], "doc_id bigint, lang string"
        )
        a = {r["doc_id"] for r in ff.StratifiedSampler(
            "doc_id", "lang", k=10).transform(df).collect()}
        b = {r["doc_id"] for r in ff.StratifiedSampler(
            "doc_id", "lang", k=10, salt="other").transform(df).collect()}
        assert a != b and len(a) == len(b) == 10


class TestSequencePackerMaterialize:
    def frame(self, spark):
        rows = [
            # (id, src, ids array)
            (1, "a", [1, 2, 3]),
            (2, "a", [4, 5]),
            (3, "a", [6, 7, 8, 9]),
            (4, "a", [10]),
            (5, "b", [11, 12, 13, 14, 15, 16]),
            (6, "b", []),
        ]
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            rows, "id bigint, src string, ids array<int>"
        ).withColumn("n", F.size("ids").cast("bigint"))

    def test_materialize_sequences_and_boundaries(self, spark):
        # budget 5, per source, ordered by id: src a packs are
        # {1,2} (3+2=5 tokens), {3,4} (4+1); src b packs {5,6}
        packer = ff.SequencePacker(
            "n", budget=5, order_col="id", partition_cols=["src"]
        )
        out = {
            (r["src"], r["pack_id"]):
                (list(r["input_ids"]), list(r["doc_ids"]),
                 list(r["doc_lens"]), r["n_docs"], r["n_tokens"])
            for r in packer.materialize(self.frame(spark), "ids")
            .collect()
        }
        assert out[("a", 0)] == ([1, 2, 3, 4, 5], [1, 2], [3, 2], 2, 5)
        assert out[("a", 1)] == ([6, 7, 8, 9, 10], [3, 4], [4, 1], 2, 5)
        # empty doc rides along with zero length (boundary preserved)
        assert out[("b", 1)] == ([], [6], [0], 1, 0)
        assert out[("b", 0)][4] == 6
        # accepts a pre-packed frame without re-running the window
        pre = packer.transform(self.frame(spark))
        again = {
            (r["src"], r["pack_id"]): list(r["input_ids"])
            for r in packer.materialize(pre, "ids").collect()
        }
        assert again[("a", 0)] == [1, 2, 3, 4, 5]

    def test_materialize_plan_clean(self, spark):
        packer = ff.SequencePacker(
            "n", budget=5, order_col="id", partition_cols=["src"]
        )
        out = packer.materialize(self.frame(spark), "ids")
        errs = [f for f in ff.plan_audit(out)
                if f["severity"] == "error"]
        assert errs == []
