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
