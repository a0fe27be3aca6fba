"""CorpusShuffler (r8, VERDICT r7 item 3): seeded global shuffle +
token-balanced shard export — parity with the naive global-window law,
determinism across partitionings, and the shard-dir writer."""

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff


def rows(n):
    return [(i, f"src{i % 3}", 10 + (i * 7) % 40) for i in range(n)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        rows(200), "doc_id bigint, source string, n_tokens int"
    )


def naive_law(n, tokens_per_shard, salt="ff"):
    """Single-pass reference: order by (md5, id), exclusive running
    token sum DIV budget."""
    keyed = sorted(
        rows(n),
        key=lambda r: (hashlib.md5(f"{salt}|{r[0]}".encode()).hexdigest(), r[0]),
    )
    out, run = {}, 0
    for pos, r in enumerate(keyed):
        out[r[0]] = (pos, run // tokens_per_shard)
        run += r[2]
    return out


def test_matches_naive_global_law(docs):
    op = ff.CorpusShuffler("doc_id", tokens_col="n_tokens",
                           tokens_per_shard=500)
    got = {r["doc_id"]: (r["position"], r["shard_id"])
           for r in op.transform(docs).collect()}
    assert got == naive_law(200, 500)


def test_docs_per_shard_mode(docs):
    op = ff.CorpusShuffler("doc_id", docs_per_shard=32)
    got = {r["doc_id"]: (r["position"], r["shard_id"])
           for r in op.transform(docs).collect()}
    # position DIV 32, positions are a permutation of 0..199
    assert sorted(p for p, _ in got.values()) == list(range(200))
    assert all(s == p // 32 for p, s in got.values())


def test_deterministic_across_partitionings(docs):
    op = ff.CorpusShuffler("doc_id", tokens_col="n_tokens",
                           tokens_per_shard=500)
    a = {tuple(r) for r in op.transform(docs.repartition(1)).collect()}
    b = {tuple(r) for r in op.transform(docs.repartition(17)).collect()}
    assert a == b


def test_shards_are_token_balanced(docs):
    op = ff.CorpusShuffler("doc_id", tokens_col="n_tokens",
                           tokens_per_shard=1000)
    per_shard = (
        op.transform(docs).groupBy("shard_id")
        .agg(F.sum("n_tokens").alias("t"))
        .orderBy("shard_id").collect()
    )
    # greedy contiguous law: a shard's start/end prefixes each sit
    # within one document (max 49 tokens) of a budget boundary, so
    # every full shard's mass is budget +- max_doc
    for r in per_shard[:-1]:
        assert 1000 - 49 <= r["t"] <= 1000 + 49, r
    # shards are contiguous position ranges
    ranges = (
        op.transform(docs).groupBy("shard_id")
        .agg(F.min("position").alias("lo"), F.max("position").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .orderBy("shard_id").collect()
    )
    nxt = 0
    for r in ranges:
        assert r["lo"] == nxt and r["hi"] - r["lo"] + 1 == r["n"]
        nxt = r["hi"] + 1


def test_salt_changes_order(docs):
    a = ff.CorpusShuffler("doc_id", docs_per_shard=50, salt="a")
    b = ff.CorpusShuffler("doc_id", docs_per_shard=50, salt="b")
    pa = {r["doc_id"]: r["position"] for r in a.transform(docs).collect()}
    pb = {r["doc_id"]: r["position"] for r in b.transform(docs).collect()}
    assert pa != pb
    assert sorted(pa.values()) == sorted(pb.values())


def test_write_shards_layout(docs, tmp_path):
    op = ff.CorpusShuffler("doc_id", tokens_col="n_tokens",
                           tokens_per_shard=1000)
    path = str(tmp_path / "shards")
    op.write_shards(docs, path)
    dirs = sorted(glob.glob(os.path.join(path, "shard_id=*")))
    assert len(dirs) >= 2
    spark = docs.sparkSession
    back = spark.read.parquet(path)
    assert back.count() == 200
    # each shard dir holds exactly its contiguous position range
    expect = {r["doc_id"]: (r["position"], r["shard_id"])
              for r in op.transform(docs).collect()}
    for r in back.collect():
        assert expect[r["doc_id"]] == (r["position"], r["shard_id"])


def test_validation():
    with pytest.raises(Exception):
        ff.CorpusShuffler("id")  # no shard sizing at all
    with pytest.raises(Exception):
        ff.CorpusShuffler("id", tokens_col="t", docs_per_shard=5)
    with pytest.raises(Exception):
        ff.CorpusShuffler("id", tokens_col="t", tokens_per_shard=5,
                          docs_per_shard=5)


def test_output_clash_detected(docs):
    op = ff.CorpusShuffler("doc_id", docs_per_shard=10,
                           position_col="source")
    with pytest.raises(Exception, match="already exist"):
        op.transform(docs)


# --- shard manifest (r8): the loader-side audit surface --------------

def test_shard_manifest_stats_and_fingerprint(spark):
    docs = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(300)], "doc_id bigint, n_tokens int"
    )
    op = ff.CorpusShuffler("doc_id", tokens_col="n_tokens",
                           tokens_per_shard=100)
    man = {r["shard_id"]: r.asDict()
           for r in op.shard_manifest(docs).collect()}
    assert sum(m["n_docs"] for m in man.values()) == 300
    # shards are contiguous position ranges
    for m in man.values():
        assert m["last_position"] - m["first_position"] + 1 == m["n_docs"]
    # removing one doc flips at least one shard's fingerprint
    man2 = {r["shard_id"]: r["id_fingerprint"]
            for r in op.shard_manifest(docs.where("doc_id != 5")).collect()}
    assert any(man[s]["id_fingerprint"] != man2.get(s) for s in man)
    # docs_per_shard mode reports NULL token mass
    dp = ff.CorpusShuffler("doc_id", docs_per_shard=50)
    row = dp.shard_manifest(docs.select("doc_id")).collect()[0]
    assert row["n_tokens"] is None and row["n_docs"] == 50


def test_write_shards_manifest_file(spark, tmp_path):
    import json
    import os

    docs = spark.createDataFrame(
        [(i, 3) for i in range(120)], "doc_id bigint, n_tokens int"
    )
    op = ff.CorpusShuffler("doc_id", tokens_col="n_tokens",
                           tokens_per_shard=90)
    path = str(tmp_path / "shards")
    op.write_shards(docs, path)
    lines = open(os.path.join(path, "_manifest.json")).read().splitlines()
    rows = [json.loads(ln) for ln in lines]
    assert [r["shard_id"] for r in rows] == sorted(r["shard_id"] for r in rows)
    assert sum(r["n_docs"] for r in rows) == 120
    # the manifest describes exactly the shard dirs on disk
    dirs = {d for d in os.listdir(path) if d.startswith("shard_id=")}
    assert dirs == {f"shard_id={r['shard_id']}" for r in rows}
    # opt-out writes no manifest
    p2 = str(tmp_path / "shards2")
    op.write_shards(docs, p2, manifest=False)
    assert not os.path.exists(os.path.join(p2, "_manifest.json"))
