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
