"""Partitioning-invariance property tests for the operators whose plans
shuffle on composite keys (VERDICT r3 follow-up: re-verify the OOF
encoder and IntervalJoiner under varied parallelism, the check round 2
ran for the quantile/aggregate operators).

A distributed operator's RESULT must be a pure function of the input
relation, not of how that relation happens to be split across tasks:
any dependence on partition count or row placement is a latent
wrong-answer bug at 1000-executor scale, where partitioning is chosen
by the cluster, not the test. Each test runs the same operator over the
same rows at 1, 3, and 16 input partitions and requires bit-identical
sorted results.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff


def _rows(df, cols):
    out = [tuple(r) for r in df.select(*cols).collect()]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


@pytest.fixture(scope="module")
def oof_input(spark):
    # 60 rows, 3 categories with different target rates, deterministic
    return spark.createDataFrame(
        [
            (i, ["a", "b", "c"][i % 3], float(i % 7 < 3))
            for i in range(60)
        ],
        "id bigint, cat string, y double",
    )


class TestOutOfFoldMeanEncoderPartitioningInvariance:
    def test_same_encoding_at_1_3_16_partitions(self, spark, oof_input):
        enc = ff.OutOfFoldMeanEncoder(["cat"], "y", "id", n_folds=4)
        results = []
        for n in (1, 3, 16):
            out = enc.fit_transform(oof_input.repartition(n))
            results.append(_rows(out, ["id", "cat", "y"]))
        assert results[0] == results[1] == results[2]
        # folds are md5(id) buckets: full shuffle cannot move a row
        # between folds, so every category mean is placement-free

    def test_smoothing_also_invariant(self, spark, oof_input):
        enc = ff.OutOfFoldMeanEncoder(["cat"], "y", "id", n_folds=3, smoothing=5.0)
        a = _rows(enc.fit_transform(oof_input.repartition(1)), ["id", "cat"])
        b = _rows(enc.fit_transform(oof_input.repartition(16)), ["id", "cat"])
        assert a == b


@pytest.fixture(scope="module")
def interval_frames(spark):
    base = dt.datetime(2024, 3, 1)
    points = spark.createDataFrame(
        [("k%d" % (i % 4), base + dt.timedelta(minutes=7 * i), i) for i in range(40)],
        "k string, t timestamp, pid int",
    )
    windows = spark.createDataFrame(
        [
            (
                "k%d" % (j % 4),
                base + dt.timedelta(minutes=20 * j),
                base + dt.timedelta(minutes=20 * j + 35),
                j,
            )
            for j in range(10)
        ],
        "k string, s timestamp, e timestamp, wid int",
    )
    return points, windows


class TestIntervalJoinerPartitioningInvariance:
    @pytest.mark.parametrize("how", ["inner", "left"])
    def test_same_pairs_at_1_3_16_partitions(self, spark, interval_frames, how):
        points, windows = interval_frames
        results = []
        for n in (1, 3, 16):
            op = ff.IntervalJoiner(
                windows.repartition(n),
                on=["k"],
                point_col="t",
                start_col="s",
                end_col="e",
                bin_width_seconds=600,
                how=how,
            )
            out = op.transform(points.repartition(n))
            results.append(_rows(out, ["pid", "wid_right" if "wid_right" in out.columns else "wid"]))
        assert results[0] == results[1] == results[2]

    def test_bin_width_and_partitioning_orthogonal(self, spark, interval_frames):
        # the blocked plan's bins are epoch-derived: changing BOTH the
        # bin width and the partitioning must still give the exact
        # relational answer
        points, windows = interval_frames
        outs = []
        for width, n in ((60, 1), (600, 5), (7200, 16)):
            op = ff.IntervalJoiner(
                windows.repartition(n),
                on=["k"],
                point_col="t",
                start_col="s",
                end_col="e",
                bin_width_seconds=width,
            )
            out = op.transform(points.repartition(n))
            col = "wid_right" if "wid_right" in out.columns else "wid"
            outs.append(_rows(out, ["pid", col]))
        assert outs[0] == outs[1] == outs[2]


class TestR8OpsPartitioningInvariance:
    """The r8 additions whose plans shuffle or fold: perceptual dedup
    pairs, pagerank, perplexity cutpoints, corpus_diff, the shard
    manifest — all must be pure functions of the input relation."""

    def test_audio_video_pairs_invariant(self, spark):
        import hashlib

        from feature_factory_spark.operators.audiohash import pattern_wav
        from feature_factory_spark.operators.videohash import pattern_mp4

        def pat(i):
            p = int(hashlib.md5(f"pi-{i // 2}".encode()).hexdigest()[:16], 16)
            return p if i % 2 == 0 else p ^ 1

        rows = [(i, pattern_wav(pat(i), frame_len=128), pattern_mp4(pat(i)))
                for i in range(12)]
        base = spark.createDataFrame(
            rows, "doc_id bigint, wav binary, vid binary"
        )
        for op, col in (
            (ff.AudioDeduplicator("doc_id", binary_col="wav",
                                  hamming_threshold=2), "wav"),
            (ff.VideoDeduplicator("doc_id", binary_col="vid",
                                  hamming_threshold=2), "vid"),
        ):
            outs = [
                _rows(op.candidate_pairs(base.repartition(n)),
                      ["a_id", "b_id", "hamming"])
                for n in (1, 3, 16)
            ]
            assert outs[0] == outs[1] == outs[2] and outs[0]

    def test_pagerank_invariant(self, spark):
        from feature_factory_spark.functions.graph import pagerank

        edges = spark.createDataFrame(
            [(i, (i * 3 + 1) % 20) for i in range(20)]
            + [(i, (i + 1) % 20) for i in range(20)],
            "src bigint, dst bigint",
        )
        outs = []
        for n in (1, 3, 16):
            r = pagerank(edges.repartition(n), iterations=4)
            outs.append(sorted(
                (x["node"], round(x["rank"], 12)) for x in r.collect()
            ))
        assert outs[0] == outs[1] == outs[2]

    def test_perplexity_cutpoints_invariant(self, spark):
        rows = [(i, float((i * 37) % 101)) for i in range(90)]
        base = spark.createDataFrame(rows, "doc_id bigint, s double")
        outs = []
        for n in (1, 3, 16):
            b = ff.PerplexityBucketer("s").fit(base.repartition(n))
            outs.append(_rows(b.transform(base), ["doc_id", "s_bucket"]))
        assert outs[0] == outs[1] == outs[2]

    def test_corpus_diff_and_manifest_invariant(self, spark):
        from feature_factory_spark.operators.diff import corpus_diff

        old = spark.createDataFrame(
            [(i, f"t{i}") for i in range(40)], "doc_id bigint, text string"
        )
        new = spark.createDataFrame(
            [(i, f"t{i + (i % 3 == 0)}") for i in range(5, 45)],
            "doc_id bigint, text string",
        )
        outs = [
            _rows(corpus_diff(old.repartition(a), new.repartition(b),
                              "doc_id", ["text"]), ["doc_id", "status"])
            for a, b in ((1, 1), (3, 16), (16, 3))
        ]
        assert outs[0] == outs[1] == outs[2]
        docs = spark.createDataFrame(
            [(i, (i % 5) + 1) for i in range(200)],
            "doc_id bigint, n_tokens int",
        )
        op = ff.CorpusShuffler("doc_id", tokens_col="n_tokens",
                               tokens_per_shard=70)
        mans = [
            _rows(op.shard_manifest(docs.repartition(n)),
                  ["shard_id", "n_docs", "n_tokens", "first_position",
                   "last_position", "id_fingerprint"])
            for n in (1, 3, 16)
        ]
        assert mans[0] == mans[1] == mans[2]
