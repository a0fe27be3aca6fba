"""Tests for connected-components dedup clustering."""

import pytest

import feature_factory_spark as ff
from feature_factory_spark.functions.graph import connected_components, duplicate_ids


def test_connected_components_basic(spark):
    pairs = spark.createDataFrame(
        [(1, 5), (3, 5), (10, 11), (11, 12)], "a_id bigint, b_id bigint"
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 3: 1, 5: 1, 10: 10, 11: 10, 12: 10}


def test_driver_and_distributed_components_agree(spark):
    # the small-graph union-find fallback must match the propagation
    # loop exactly — force the distributed path by zeroing the gate
    from feature_factory_spark.functions import graph

    pairs = spark.createDataFrame(
        [(1, 5), (3, 5), (10, 11), (11, 12), (2, 50), (50, 51), (51, 2)],
        "a_id bigint, b_id bigint",
    )
    fast = {r["node"]: r["component"]
            for r in connected_components(pairs).collect()}
    cap = graph._DRIVER_EDGE_CAP
    graph._DRIVER_EDGE_CAP = 0
    try:
        slow = {r["node"]: r["component"]
                for r in connected_components(pairs).collect()}
    finally:
        graph._DRIVER_EDGE_CAP = cap
    assert fast == slow
    assert fast[3] == 1 and fast[12] == 10 and fast[51] == 2


def test_driver_components_string_ids(spark):
    pairs = spark.createDataFrame(
        [("b", "aa"), ("aa", "c"), ("z", "y")], "a_id string, b_id string"
    )
    comp = {r["node"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert comp == {"aa": "aa", "b": "aa", "c": "aa", "y": "y", "z": "y"}


def test_duplicate_ids_keeps_min_per_cluster(spark):
    pairs = spark.createDataFrame([(1, 5), (3, 5)], "a_id bigint, b_id bigint")
    dups = sorted(r["dup_id"] for r in duplicate_ids(pairs).collect())
    assert dups == [3, 5]


def test_components_policy_vs_greedy_on_chain(spark):
    # chain cluster {1,5},{3,5}: greedy keeps 1 AND 3; components keeps 1
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "alpha beta gamma delta epsilon zeta eta iota"),
            (5, "alpha beta gamma delta epsilon zeta eta"),
            (9, "totally different words here nothing shared at all"),
        ],
        "id bigint, t string",
    )
    greedy = ff.NGramJaccardDeduplicator(
        "t", "id", shingle_n=2, threshold=0.3, all_pairs=True, policy="greedy"
    )
    comp = ff.NGramJaccardDeduplicator(
        "t", "id", shingle_n=2, threshold=0.3, all_pairs=True, policy="components"
    )
    pairs = {(r["a_id"], r["b_id"]) for r in greedy.candidate_pairs(df).collect()}
    kept_greedy = sorted(r["id"] for r in greedy.transform(df).collect())
    kept_comp = sorted(r["id"] for r in comp.transform(df).collect())
    assert 9 in kept_greedy and 9 in kept_comp
    assert kept_comp[0] == 1
    # components keeps exactly one doc per transitive cluster
    if {(1, 5), (3, 5)} <= pairs and (1, 3) not in pairs:
        assert kept_greedy == [1, 3, 9]
        assert kept_comp == [1, 9]
    else:
        # all three pair up -> both policies agree
        assert kept_comp == [1, 9]


def test_components_policy_invalid(spark):
    with pytest.raises(ff.InvalidParameterError):
        ff.MinHashDeduplicator("t", "id", policy="bogus").transform(
            spark.createDataFrame([(1, "a b c")], "id bigint, t string")
        )


class TestExactSubstringDeduplicator:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        shared = "the quick brown fox jumps over the lazy dog again and again today"
        rows = [
            (1, "intro one " + shared + " outro alpha"),
            (2, "different opening " + shared + " closing text here"),
            (3, "totally unique document with no repeated passage at all ok"),
            (4, None),
            (5, "short"),
            (6, "AAA " + shared.upper() + " bbb"),  # case-folded match
        ]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_spans_find_the_shared_passage(self, spark, corpus):
        op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)
        spans = {r["doc_id"]: (r["span_start"], r["span_end"])
                 for r in op.spans(corpus).collect()}
        # the 13-word shared passage merges into ONE maximal span per doc
        assert spans[1] == (2, 15)
        assert spans[2] == (2, 15)
        assert spans[6] == (1, 14)  # lowercase folding matches the caps copy
        assert 3 not in spans and 4 not in spans and 5 not in spans

    def test_dup_ratio_and_nulls(self, spark, corpus):
        op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)
        got = {r["doc_id"]: r["text_dup_ratio"]
               for r in op.transform(corpus).collect()}
        assert abs(got[1] - 13 / 17) < 1e-12
        assert got[3] == 0.0 and got[5] == 0.0
        assert got[4] is None  # NULL text stays NULL, not 0

    def test_below_k_words_contribute_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c")], "doc_id bigint, text string"
        )
        op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)
        assert op.spans(df).count() == 0

    def test_min_docs_threshold(self, spark, corpus):
        op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=4)
        assert op.spans(corpus).count() == 0  # only 3 docs share it

    def test_plan_has_no_cartesian(self, spark, corpus):
        op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)
        plan = op.spans(corpus)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    # --- remove_spans (r9): the Lee et al. 2021 remedy, not just the score

    def test_remove_spans_keep_first(self, spark, corpus):
        op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)
        got = {r["doc_id"]: r["text"]
               for r in op.remove_spans(corpus).collect()}
        # doc 1 holds the corpus-wide first occurrence: VERBATIM
        assert got[1] == ("intro one the quick brown fox jumps over the "
                          "lazy dog again and again today outro alpha")
        # the other copies are cut, original case kept, single spaces
        assert got[2] == "different opening closing text here"
        assert got[6] == "AAA bbb"
        # untouched docs pass through verbatim (incl. NULL)
        assert got[3].startswith("totally unique")
        assert got[4] is None and got[5] == "short"

    def test_remove_spans_keep_none_cuts_everywhere(self, spark, corpus):
        op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)
        got = {r["doc_id"]: r["text"]
               for r in op.remove_spans(corpus, keep="none").collect()}
        assert got[1] == "intro one outro alpha"
        assert got[2] == "different opening closing text here"
        assert got[6] == "AAA bbb"

    @pytest.mark.parametrize("keep", ["first", "none"])
    def test_cleaned_corpus_has_zero_dup_ratio(self, spark, corpus, keep):
        op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)
        cleaned = op.remove_spans(corpus, keep=keep)
        ratios = {r["doc_id"]: r["text_dup_ratio"]
                  for r in op.transform(cleaned).collect()}
        assert all(v == 0.0 for k_, v in ratios.items() if v is not None), ratios

    def test_remove_spans_output_col_and_validation(self, spark, corpus):
        op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)
        out = op.remove_spans(corpus, output_col="text_clean")
        row = {r["doc_id"]: r for r in out.collect()}
        assert row[2]["text"].startswith("different opening the quick")
        assert row[2]["text_clean"] == "different opening closing text here"
        with pytest.raises(Exception, match="keep"):
            op.remove_spans(corpus, keep="bogus")

    def test_remove_spans_within_doc_repeat_keeps_one(self, spark):
        # the SAME passage twice in one doc + once in another: with
        # keep='first' only the (min id, min pos) copy survives
        passage = "one two three four five six seven eight"
        rows = [
            (1, f"{passage} middle words here {passage}"),
            (2, f"pre {passage} post"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)
        got = {r["doc_id"]: r["text"] for r in op.remove_spans(df).collect()}
        assert got[1] == f"{passage} middle words here"
        assert got[2] == "pre post"


# --- pagerank (r8): the link-graph authority signal -------------------

def test_pagerank_classic_triangle(spark):
    from feature_factory_spark.functions.graph import pagerank

    # A->B, A->C, B->C, C->A — published ranks (d=0.85):
    # A ~ 0.3877, B ~ 0.2148, C ~ 0.3975
    e = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")],
        "src string, dst string",
    )
    r = {x["node"]: x["rank"] for x in pagerank(e, iterations=25).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert abs(r["A"] - 0.3877) < 2e-3
    assert abs(r["B"] - 0.2148) < 2e-3
    assert abs(r["C"] - 0.3975) < 2e-3


def test_pagerank_dangling_mass_redistributes(spark):
    from feature_factory_spark.functions.graph import pagerank

    # B has no out-edges: its rank must be redistributed, and the
    # total must stay 1.0 (the probability-conservation contract)
    e = spark.createDataFrame([("A", "B")], "src string, dst string")
    r = {x["node"]: x["rank"] for x in pagerank(e, iterations=10).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r["B"] > r["A"]  # B receives A's mass on top of the base


def test_pagerank_duplicate_and_null_edges_ignored(spark):
    from feature_factory_spark.functions.graph import pagerank

    e = spark.createDataFrame(
        [("A", "B"), ("A", "B"), (None, "B"), ("A", None), ("B", "A")],
        "src string, dst string",
    )
    r = {x["node"]: x["rank"] for x in pagerank(e, iterations=10).collect()}
    # the deduped symmetric 2-cycle: equal ranks
    assert set(r) == {"A", "B"}
    assert abs(r["A"] - r["B"]) < 1e-12


def test_pagerank_validation(spark):
    import pytest

    from feature_factory_spark.functions.graph import pagerank

    e = spark.createDataFrame([("A", "B")], "src string, dst string")
    with pytest.raises(Exception):
        pagerank(e, damping=1.5)
    with pytest.raises(Exception):
        pagerank(e, iterations=0)
    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(Exception, match="no nodes"):
        pagerank(empty)


def test_pagerank_handle_dangling_false_matches_on_dangling_free_graph(spark):
    from feature_factory_spark.functions.graph import pagerank

    e = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "A")], "src string, dst string"
    )
    full = {r["node"]: r["rank"]
            for r in pagerank(e, iterations=8).collect()}
    fast = {r["node"]: r["rank"]
            for r in pagerank(e, iterations=8,
                              handle_dangling=False).collect()}
    assert full == fast
    # on a graph WITH dangling nodes the fast path leaks mass (by
    # documented contract) — ranks sum below 1
    d = spark.createDataFrame([("A", "B")], "src string, dst string")
    leaked = sum(r["rank"] for r in
                 pagerank(d, iterations=5, handle_dangling=False).collect())
    assert leaked < 1.0


def test_pagerank_driver_gate_matches_distributed(spark):
    from feature_factory_spark.functions.graph import pagerank

    # dangling-free graph with in-degree exactly 2: every per-node
    # contribution sum has two commutable terms, so the gated driver
    # loop (handle_dangling=False, fixed budget) must be BIT-identical
    # to the distributed aggregate (handle_dangling=True on a
    # dangling-free graph adds share=0.0 each round — same arithmetic)
    edges = [(i, (i + 1) % 10) for i in range(10)] + [
        (i, (i * 3 + 1) % 10) for i in range(10)
    ]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    dist = {r["node"]: r["rank"]
            for r in pagerank(e, iterations=4).collect()}
    drv = {r["node"]: r["rank"]
           for r in pagerank(e, iterations=4,
                             handle_dangling=False).collect()}
    assert dist == drv
    assert abs(sum(drv.values()) - 1.0) < 1e-9
