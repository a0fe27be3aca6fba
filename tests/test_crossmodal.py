"""CrossModalDeduplicator (r10 brief item 6): union per-modality
duplicate pair frames at the page grain, one survivor per transitive
multi-signal cluster."""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff


@pytest.fixture(scope="module")
def pages(spark):
    # pages 0..19; quality rises with id so priority policy picks the
    # HIGHEST id per cluster (the opposite of min_id — disambiguates)
    return spark.createDataFrame(
        [(i, f"page body {i}", float(i)) for i in range(20)],
        "page_id bigint, text string, quality double",
    )


def pairs(spark, *edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "a_id bigint, b_id bigint"
    )


@pytest.fixture(scope="module")
def signals(spark):
    # text links 1-2, 10-11; image links 2-3 (extends the first text
    # cluster); audio bridges 3-10 (merges BOTH into {1,2,3,10,11}).
    # Page 15-16 is an image-only cluster. Everything else is solo.
    return {
        "text": pairs(spark, (1, 2), (10, 11)),
        "image": pairs(spark, (2, 3), (15, 16)),
        "audio": pairs(spark, (3, 10)),
    }


def test_min_id_survivors(spark, pages, signals):
    op = ff.CrossModalDeduplicator("page_id", signals)
    got = sorted(r["page_id"] for r in op.transform(pages).collect())
    # cluster {1,2,3,10,11} keeps 1; {15,16} keeps 15; solos survive
    dropped = {2, 3, 10, 11, 16}
    assert got == [i for i in range(20) if i not in dropped]


def test_priority_survivors(spark, pages, signals):
    op = ff.CrossModalDeduplicator(
        "page_id", signals, policy="priority", priority_col="quality"
    )
    got = sorted(r["page_id"] for r in op.transform(pages).collect())
    # highest quality = highest id: {1,2,3,10,11} keeps 11; {15,16} keeps 16
    dropped = {1, 2, 3, 10, 15}
    assert got == [i for i in range(20) if i not in dropped]


def test_cluster_provenance(spark, signals):
    op = ff.CrossModalDeduplicator("page_id", signals)
    rows = {r["node"]: r for r in op.clusters().collect()}
    # one component spans all three signals
    assert {rows[i]["component"] for i in (1, 2, 3, 10, 11)} == {1}
    assert rows[2]["signals"] == ["image", "text"]
    assert rows[3]["signals"] == ["audio", "image"]
    assert rows[10]["signals"] == ["audio", "text"]
    assert rows[15]["signals"] == ["image"]
    assert rows[15]["component"] == 15 and rows[16]["component"] == 15


def test_absent_cluster_members_dont_block(spark, pages, signals):
    # a cluster member missing from the transformed frame (e.g. already
    # filtered by a quality gate) must not suppress the remaining rows
    sub = pages.where(~F.col("page_id").isin(1, 11))
    op = ff.CrossModalDeduplicator(
        "page_id", signals, policy="priority", priority_col="quality"
    )
    got = sorted(r["page_id"] for r in op.transform(sub).collect())
    # {2,3,10} competes without 1/11 -> keeps 10; min_id drop semantics
    assert 10 in got and 2 not in got and 3 not in got


def test_priority_requires_priority_col(spark, signals):
    with pytest.raises(ff.InvalidParameterError, match="priority_col"):
        ff.CrossModalDeduplicator("page_id", signals, policy="priority")
    with pytest.raises(ff.InvalidParameterError, match="at least one"):
        ff.CrossModalDeduplicator("page_id", {})


def test_composes_in_pipeline(spark, pages, signals):
    pipe = ff.make_pipeline(
        ("xdedup", ff.CrossModalDeduplicator("page_id", signals)),
    )
    out = pipe.fit(pages)
    assert out.count() == 15
