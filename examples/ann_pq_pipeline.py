"""ANN index lifecycle with product quantization — the billion-vector
recipe at example scale.

  1. build an IVF index over the corpus embeddings with the PQ layout
     (m tinyint codes per vector + a model-sized codebook table: 64x
     less vector IO than raw doubles at dim=64/m=8);
  2. probe it and audit recall against the exact top-k
     (`recall_at_k` — k x |queries|-sized, corpus-free);
  3. append a recrawl batch WITHOUT refitting (new vectors assign
     against the frozen centroids and encode against the frozen
     codebooks);
  4. when the drift audit says so, `rebuild_index` side-writes a fresh
     fit, preserving the PQ layout.

Run: python examples/ann_pq_pipeline.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import feature_factory_spark as ff


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    corpus = emb.where(F.col("vec_id") % 10 != 0)   # initial crawl
    recrawl = emb.where(F.col("vec_id") % 10 == 0)  # later snapshot
    queries = emb.where(F.col("vec_id") < 5)

    op = ff.IVFCosineTopK(
        "embedding", "vec_id", k=10, n_centroids=4, n_probe=2
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ivf_pq")

        # 1. PQ-quantized index: codes + codebooks, centroids frozen.
        #    These near-random synthetic embeddings are quantization's
        #    WORST case, so spend m=16 subspaces x k=64 centroids
        #    (still 16x less vector IO than raw doubles); real
        #    clustered embeddings quantize far better at m=8/k=16.
        op.write_index(
            corpus, path, quantize="pq",
            pq=ff.ProductQuantizer("c_vec", dim=64, m=16, k=64),
        )
        stored = spark.read.parquet(os.path.join(path, "corpus"))
        print(f"index: {stored.count()} vectors as "
              f"{len(stored.select('c_pq').first()['c_pq'])} tinyint "
              f"codes each (raw would be 64 doubles)")

        # 2. probe + recall audit vs the exact baseline
        approx = op.search_index(spark, path, queries)
        exact = ff.CosineTopK("embedding", "vec_id", k=10).search(
            corpus, queries
        )
        rec = ff.recall_at_k(exact, approx).agg(
            F.avg("recall").alias("r")
        ).collect()[0]["r"]
        # the raw-layout index shows how much of the loss is the IVF
        # n_probe pruning itself vs the quantization
        raw_path = os.path.join(tmp, "ivf_raw")
        op.write_index(corpus, raw_path)
        raw_rec = ff.recall_at_k(
            exact, op.search_index(spark, raw_path, queries)
        ).agg(F.avg("recall").alias("r")).collect()[0]["r"]
        print(f"recall@10 vs exact: pq {rec:.2f} / raw {raw_rec:.2f} "
              "(the gap to 1.0 is the shared n_probe pruning)")

        # 3. recrawl append: frozen centroids + frozen codebooks
        op.write_index(recrawl, path, mode="append", quantize="pq")
        print("after append:",
              [v["op"] for v in ff.index_versions(spark, path)])
        assert op.search_index(spark, path, queries).count() > 0

        # 4. drift remedy: side-write rebuild, PQ layout preserved
        dest = os.path.join(tmp, "ivf_pq_v2")
        op.rebuild_index(spark, path, dest)
        print("rebuilt:", sorted(os.listdir(dest)),
              f"({n} vectors re-fit)")
    spark.stop()


if __name__ == "__main__":
    main()
