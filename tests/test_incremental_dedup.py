"""Incremental dedup against a persisted corpus index (r8, VERDICT r7
item 2): MinHash/SimHash write_index + dedupe_against — survivor parity
with a full-corpus recompute, parameter pinning, append accumulation,
and the physical partition-pruning contract."""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff

BOILER = "the quick brown fox jumps over the lazy dog near the river bank today"


def corpus_rows():
    """Ids are monotone across the old/new split (the recrawl
    numbering): 0-9 old, 10-19 new. New docs 10/11 duplicate old docs
    0/3; 12 and 13 duplicate each other (within-batch); the rest are
    unique."""
    uniq = [
        f"completely different sentence number {i} about topic {i * i} "
        f"with distinct vocabulary item{i} token{i * 3} word{i * 7}"
        for i in range(20)
    ]
    texts = {i: f"{BOILER} {uniq[i]}" for i in range(20)}
    texts[10] = texts[0]
    texts[11] = texts[3]
    texts[13] = texts[12]
    return [(i, texts[i]) for i in range(20)]


@pytest.fixture(scope="module")
def old_new(spark):
    rows = corpus_rows()
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return df.where("doc_id < 10"), df.where("doc_id >= 10"), df


@pytest.mark.parametrize("make_op", [
    lambda: ff.SimHashDeduplicator("text", "doc_id", hamming_threshold=3,
                                   hash_fn="md5"),
    lambda: ff.MinHashDeduplicator("text", "doc_id", threshold=0.9),
], ids=["simhash", "minhash"])
def test_dedupe_against_matches_full_recompute(old_new, tmp_path, make_op):
    old, new, full = old_new
    op = make_op()
    path = str(tmp_path / "idx")
    op.write_index(old, path)
    incremental = {
        r["doc_id"] for r in op.dedupe_against(new, path).collect()
    }
    full_survivors = {r["doc_id"] for r in op.transform(full).collect()}
    assert incremental == full_survivors & {r[0] for r in new.collect()} \
        == full_survivors - set(range(10))
    # the planted duplicates are gone; doc 12 (the smaller member of
    # the within-batch pair) survives
    assert {10, 11, 13}.isdisjoint(incremental)
    assert 12 in incremental


def test_pairs_against_scores(old_new, tmp_path):
    old, new, _ = old_new
    op = ff.SimHashDeduplicator("text", "doc_id", hamming_threshold=3,
                                hash_fn="md5")
    path = str(tmp_path / "idx")
    op.write_index(old, path)
    pairs = {(r["a_id"], r["b_id"]): r["hamming"]
             for r in op.pairs_against(new, path).collect()}
    assert pairs[(0, 10)] == 0 and pairs[(3, 11)] == 0
    # within-batch pair (12,13) is NOT a corpus pair
    assert all(a < 10 and b >= 10 for a, b in pairs)


def test_parameter_pinning_fails_loudly(old_new, tmp_path):
    old, new, _ = old_new
    path = str(tmp_path / "idx")
    ff.SimHashDeduplicator(
        "text", "doc_id", hamming_threshold=3, hash_fn="md5"
    ).write_index(old, path)
    mismatched = ff.SimHashDeduplicator(
        "text", "doc_id", hamming_threshold=2, hash_fn="md5"
    )
    with pytest.raises(Exception, match="hamming_threshold"):
        mismatched.pairs_against(new, path).collect()
    # a minhash operator cannot probe a simhash index
    with pytest.raises(Exception, match="kind"):
        ff.MinHashDeduplicator("text", "doc_id").pairs_against(
            new, path
        ).collect()


def test_append_accumulates_snapshots(old_new, tmp_path):
    old, new, full = old_new
    op = ff.SimHashDeduplicator("text", "doc_id", hamming_threshold=3,
                                hash_fn="md5")
    path = str(tmp_path / "idx")
    op.write_index(old, path)
    survivors = op.dedupe_against(new, path)
    # append the SURVIVORS; a re-crawl of doc 12's content must now be
    # recognized as a duplicate of the accumulated corpus
    op.write_index(survivors, path, mode="append")
    spark = old.sparkSession
    recrawl = spark.createDataFrame(
        [(30, [r["text"] for r in new.where("doc_id = 12").collect()][0]),
         (31, "genuinely novel content about entirely new subject matter "
              "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"] for r in op.dedupe_against(recrawl, path).collect()}
    assert out == {31}


def _scanned_files(df) -> int:
    """Files read by the executed frame's parquet scans (the
    scale_sanity.py ivfprune walker)."""
    total = [0]

    def walk(node):
        name = node.nodeName()
        if "QueryStage" in name or name == "AdaptiveSparkPlan":
            walk(node.plan() if "QueryStage" in name else node.executedPlan())
            return
        if name.startswith("Scan parquet"):
            m = node.metrics()
            if m.contains("numFiles"):
                total[0] += int(m.apply("numFiles").value())
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return total[0]


def test_index_scan_is_partition_pruned(spark, tmp_path):
    # a large indexed corpus, then a single-doc probe batch: the probe
    # must read strictly fewer index files than the index holds (the
    # ivfprune precedent — physical numFiles metric, not plan text)
    rows = [
        (i, f"{BOILER} item{i} token{i * 3} filler{i * 7} extra{i * 11}")
        for i in range(200)
    ]
    corpus = spark.createDataFrame(rows, "doc_id bigint, text string")
    op = ff.SimHashDeduplicator("text", "doc_id", hamming_threshold=3,
                                hash_fn="md5")
    path = str(tmp_path / "bigidx")
    op.write_index(corpus, path)
    import glob
    import os

    n_index_files = len(
        glob.glob(os.path.join(path, "chunks", "**", "*.parquet"),
                  recursive=True)
    )
    probe = spark.createDataFrame(
        [(1000, rows[5][1])], "doc_id bigint, text string"
    )
    pairs = op.pairs_against(probe, path)
    got = pairs.collect()
    assert (5, 1000) in {(r["a_id"], r["b_id"]) for r in got}
    scanned = _scanned_files(pairs)
    assert 0 < scanned < n_index_files, (scanned, n_index_files)


# --- exact tier (r8): ExactDeduplicator index ------------------------

def test_exact_dedupe_against_matches_full_recompute(old_new, tmp_path):
    old, new, full = old_new
    op = ff.ExactDeduplicator(["text"], "doc_id", normalize=True)
    path = str(tmp_path / "exidx")
    op.write_index(old, path)
    incremental = {r["doc_id"]
                   for r in op.dedupe_against(new, path).collect()}
    full_survivors = {r["doc_id"] for r in op.transform(full).collect()}
    assert incremental == full_survivors - set(range(10))
    # exact duplicates of old docs (10, 11) and the within-batch
    # duplicate 13 are gone
    assert {10, 11, 13}.isdisjoint(incremental)
    assert {12, 14, 15, 16, 17, 18, 19} <= incremental


def test_exact_index_append_and_param_pinning(old_new, tmp_path):
    old, new, _ = old_new
    op = ff.ExactDeduplicator(["text"], "doc_id", normalize=True)
    path = str(tmp_path / "exidx2")
    op.write_index(old, path)
    survivors = op.dedupe_against(new, path)
    op.write_index(survivors, path, mode="append")
    spark = old.sparkSession
    recrawl = spark.createDataFrame(
        [(40, [r["text"] for r in new.where("doc_id = 12").collect()][0]),
         (41, "entirely new exact content never seen before")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"] for r in op.dedupe_against(recrawl, path).collect()}
    assert out == {41}
    # normalize mismatch fails loudly
    with pytest.raises(Exception, match="normalize"):
        ff.ExactDeduplicator(["text"], "doc_id").dedupe_against(
            recrawl, path
        ).collect()


def test_exact_index_scan_is_pruned(spark, tmp_path):
    rows = [(i, f"exact unique content number {i}") for i in range(3000)]
    corpus = spark.createDataFrame(rows, "doc_id bigint, text string")
    op = ff.ExactDeduplicator(["text"], "doc_id")
    path = str(tmp_path / "exbig")
    op.write_index(corpus, path)
    import glob
    import os

    n_files = len(glob.glob(os.path.join(path, "hashes", "**", "*.parquet"),
                            recursive=True))
    probe = spark.createDataFrame(
        [(9000, rows[7][1]), (9001, "novel probe content")],
        "doc_id bigint, text string",
    )
    out = op.dedupe_against(probe, path)
    got = {r["doc_id"] for r in out.collect()}
    assert got == {9001}
    assert 0 < _scanned_files(out) < n_files


# --- embedding tier (r8): EmbeddingDeduplicator LSH index ------------

def _emb_rows():
    """12 old vectors (0-11), new batch: 100/101 perturb old 0/3
    (cosine ~1), 102/103 perturb each other (within-batch pair), 104 is
    fresh. numpy seeding keeps everything deterministic."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(12, 16)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows.append((100, [float(x) for x in base[0] + rng.randn(16) * 0.01]))
    rows.append((101, [float(x) for x in base[3] + rng.randn(16) * 0.01]))
    pair = rng.randn(16)
    rows.append((102, [float(x) for x in pair]))
    rows.append((103, [float(x) for x in pair + rng.randn(16) * 0.01]))
    rows.append((104, [float(x) for x in rng.randn(16)]))
    return rows


def _emb_op():
    return ff.EmbeddingDeduplicator("embedding", "vec_id", threshold=0.95,
                                    dim=16, index_buckets=4)


def test_embedding_dedupe_against_matches_full_recompute(spark, tmp_path):
    df = spark.createDataFrame(_emb_rows(), "vec_id bigint, embedding array<double>")
    old, new = df.where("vec_id < 100"), df.where("vec_id >= 100")
    op = _emb_op()
    path = str(tmp_path / "embidx")
    op.write_index(old, path)
    incremental = {r["vec_id"] for r in op.dedupe_against(new, path).collect()}
    full_survivors = {r["vec_id"] for r in op.transform(df).collect()}
    assert incremental == full_survivors - set(range(12))
    # 100/101 duplicate the corpus; 103 loses the within-batch pair
    assert incremental == {102, 104}
    # pairs carry exact cosines above the threshold
    pairs = {(r["a_id"], r["b_id"]): r["cosine"]
             for r in op.pairs_against(new, path).collect()}
    assert {(0, 100), (3, 101)} <= set(pairs)
    assert all(c >= 0.95 for c in pairs.values())


def test_embedding_index_param_pinning_and_brute_guard(spark, tmp_path):
    df = spark.createDataFrame(_emb_rows(), "vec_id bigint, embedding array<double>")
    path = str(tmp_path / "embpin")
    _emb_op().write_index(df.where("vec_id < 100"), path)
    other = ff.EmbeddingDeduplicator("embedding", "vec_id", threshold=0.95,
                                     dim=16, seed=99, index_buckets=4)
    with pytest.raises(Exception, match="seed"):
        other.pairs_against(df.where("vec_id >= 100"), path).collect()
    brute = ff.EmbeddingDeduplicator("embedding", "vec_id", method="brute")
    with pytest.raises(Exception, match="lsh"):
        brute.write_index(df, str(tmp_path / "nope"))


def test_embedding_index_scan_is_partition_pruned(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(400)]
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    op = _emb_op()
    path = str(tmp_path / "embbig")
    op.write_index(corpus, path)
    import glob
    import os

    n_index_files = len(glob.glob(os.path.join(path, "chunks", "**", "*.parquet"),
                                  recursive=True))
    probe = spark.createDataFrame([(1000, rows[5][1])],
                                  "vec_id bigint, embedding array<double>")
    pairs = op.pairs_against(probe, path)
    assert (5, 1000) in {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    scanned = _scanned_files(pairs)
    assert 0 < scanned < n_index_files, (scanned, n_index_files)


# --- the continuous-recrawl recipe: streaming + persisted index -------

def test_streaming_recrawl_via_foreachbatch(spark, tmp_path):
    """dedupe_against's index probe collects pruning keys, so it cannot
    run INSIDE a streaming plan — foreachBatch is the correct seam: each
    micro-batch dedupes against the ACCUMULATED index, appends its
    survivors to the sink AND to the index (write_index mode='append'),
    so later snapshots dedupe against everything kept so far."""
    import glob

    op = ff.SimHashDeduplicator("text", "doc_id", hamming_threshold=3,
                                hash_fn="md5")
    # highly distinct texts (no shared boilerplate), so only the
    # planted re-crawls are near-dups under simhash
    rows = {
        i: " ".join(
            f"w{(i * 31 + j * 7) % 997}x{i}y{j}" for j in range(30)
        )
        for i in range(20)
    }
    idx = str(tmp_path / "recrawl_idx")
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame(
        [(i, rows[i]) for i in range(10)], "doc_id bigint, text string"
    )
    op.write_index(base, idx)

    def handle(batch_df, _bid):
        kept = batch_df.sparkSession.createDataFrame(
            batch_df.collect(), batch_df.schema
        )  # detach from the streaming plan inside the batch function
        survivors = op.dedupe_against(kept, idx)
        survivors.write.mode("append").parquet(sink)
        op.write_index(survivors, idx, mode="append")

    schema = "doc_id bigint, text string"

    def run_round(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(src)
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # round 1: 10/11 re-crawl base docs 0/3; 13 duplicates 12 in-batch
    run_round([(10, rows[0]), (11, rows[3]), (12, rows[12]),
               (13, rows[12]), (14, rows[14])])
    # round 2: 15 re-crawls doc 12's text — 12 survived round 1 and was
    # APPENDED to the index, so 15 must now be dropped; 16 is fresh
    run_round([(15, rows[12]), (16, rows[16])])

    kept = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    assert kept == {12, 14, 16}
    assert glob.glob(f"{idx}/chunks/**/*.parquet", recursive=True)
