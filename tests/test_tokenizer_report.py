"""tokenizer_report (r11): the tokenizer audit card — fertility,
compression, sequence length, OOV rate per slice. The arithmetic is
oracle-pinned (column_profile:tokenizer_report); these tests cover the
contract on hand-countable fixtures and real BPE output."""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff


@pytest.fixture()
def tokenized(spark):
    rows = [
        # lang, text (4 words, 20 chars), ids (6 tokens, 1 oov)
        ("en", "aaaa bbbb cccc dddd", [1, 2, 3, 4, 5, -1]),
        ("en", "aaaa bbbb", [1, 2]),
        ("de", "xxxx yyyy zzzz", [7, 7, 7, 7, 7, 7, 7, 7]),
    ]
    return spark.createDataFrame(
        rows, "lang string, text string, ids array<bigint>"
    )


def test_metrics_hand_counted(spark, tokenized):
    rep = ff.tokenizer_report(tokenized, "ids", "text", ["lang"])
    got = {(r["lang"], r["metric"]): r["value"] for r in rep.collect()}
    assert got[("en", "n_docs")] == 2.0
    assert got[("en", "n_tokens")] == 8.0
    assert got[("en", "n_words")] == 6.0
    assert got[("en", "tokens_per_doc")] == 4.0
    assert got[("en", "fertility")] == pytest.approx(8 / 6)
    assert got[("en", "oov_rate")] == pytest.approx(1 / 8)
    assert got[("de", "fertility")] == pytest.approx(8 / 3)
    assert got[("de", "oov_rate")] == 0.0
    # chars_per_token: en chars = 19 + 9 = 28 over 8 tokens
    assert got[("en", "chars_per_token")] == pytest.approx(28 / 8)


def test_no_groups_and_no_oov(spark, tokenized):
    rep = ff.tokenizer_report(tokenized, "ids", "text", oov_id=None)
    got = {r["metric"]: r["value"] for r in rep.collect()}
    assert got["n_docs"] == 3.0
    assert "oov_rate" not in got
    assert got["n_tokens"] == 16.0


def test_on_real_bpe_output(spark):
    corpus = spark.createDataFrame(
        [(1, "the low lower lowest"), (2, "new newer newest the")],
        "doc_id int, text string",
    )
    bpe = ff.BpeVocabBuilder("text", "doc_id", num_merges=8).fit(corpus)
    ids = bpe.encode_ids(corpus)
    rep = ff.tokenizer_report(ids, "text_bpe_ids", "text")
    got = {r["metric"]: r["value"] for r in rep.collect()}
    assert got["n_docs"] == 2.0
    assert got["n_words"] == 8.0
    assert got["fertility"] >= 1.0  # BPE never merges across words
    assert got["oov_rate"] == 0.0   # fit corpus == encode corpus


def test_single_aggregate_plan(spark, tokenized):
    rep = ff.tokenizer_report(tokenized, "ids", "text", ["lang"])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one groupBy -> one exchange; the melt adds no shuffle
    assert plan.count("Exchange") <= 2


class TestDedupReport:
    def test_hand_counted_card(self, spark):
        # clusters: {1,2,3} (chain), {10,11} -> sizes 3 and 2
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "a_id bigint, b_id bigint"
        )
        got = {r["metric"]: r["value"]
               for r in ff.dedup_report(pairs, n_total=100).collect()}
        assert got["n_pairs"] == 3.0
        assert got["n_clusters"] == 2.0
        assert got["n_clustered_docs"] == 5.0
        assert got["n_excess_docs"] == 3.0
        assert got["max_cluster_size"] == 3.0
        assert got["mean_cluster_size"] == 2.5
        assert got["cluster_size_2"] == 1.0
        assert got["cluster_size_3"] == 1.0
        assert got["dup_share"] == pytest.approx(0.03)

    def test_works_on_real_minhash_pairs(self, spark):
        docs = spark.createDataFrame(
            [(i, "shared near duplicate body of text here") for i in
             range(4)] + [(9, "a totally different document")],
            "doc_id bigint, text string",
        )
        pairs = ff.MinHashDeduplicator(
            "text", "doc_id", threshold=0.5
        ).candidate_pairs(docs)
        got = {r["metric"]: r["value"]
               for r in ff.dedup_report(pairs).collect()}
        assert got["n_clusters"] == 1.0
        assert got["n_clustered_docs"] == 4.0
        assert got["n_excess_docs"] == 3.0
        assert "dup_share" not in got  # n_total not given
