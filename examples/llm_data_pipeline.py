"""LLM training-data pipeline — dedup, quality filtering, similarity.

Shows the beyond-reference surface end to end on the synthetic documents
and embeddings tables:

  quality-score -> language ID -> exact dedup -> MinHash near-dedup
  (transitive clustering) -> embedding similarity search

Run: python examples/llm_data_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import feature_factory_spark as ff


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "8")
        # the walkthrough caches several corpus frames (dedup state,
        # unigram vocab, topic clusters); the 1g default heap is tight
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print(f"documents: {docs.count()}")

    # 1. quality + language features (pure JVM expressions)
    scored = ff.TextFeatures(["text"]).transform(docs)
    scored = ff.LanguageIdentifier(["text"]).transform(scored)
    kept = scored.where(F.col("text_quality_score") > 0.3)
    print(f"pass quality gate: {kept.count()}")

    # 2. exact dedup, then MinHash near-dedup with transitive clustering
    exact = ff.ExactDeduplicator(["text"], "doc_id", normalize=True)
    deduped = exact.transform(kept)
    near = ff.MinHashDeduplicator(
        "text", "doc_id", threshold=0.5, policy="components"
    )
    final = near.transform(deduped)
    print(f"after dedup: {final.count()}")

    # 3. corpus-level cleaning + scoring: boilerplate segment removal
    #    and a unigram-LM junk score fitted on the surviving corpus
    cleaned = ff.LineDeduplicator(
        "doc_id", "text", sep=" ", min_doc_fraction=0.8
    ).transform(final)
    lm = ff.UnigramLogProbScorer("text", "doc_id").fit(cleaned)
    cleaned = lm.transform(cleaned)
    cleaned.select("doc_id", "text_removed_segments", "text_unigram_logprob") \
        .orderBy("text_unigram_logprob").show(5)

    # 3b. tokenizer prep: top-k vocabulary over the cleaned corpus and
    #     the OOV coverage each document would see under it
    vb = ff.VocabBuilder("text", "doc_id", vocab_size=512).fit(cleaned)
    print(f"vocab size: {vb.vocab_df_.count()}")
    cleaned = vb.transform(cleaned)
    cleaned.selectExpr("avg(text_oov_rate) AS mean_oov").show()

    # 4. similarity search + topic bucketing over embeddings
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    topk = ff.CosineTopK("embedding", "vec_id", k=3).search(emb, queries)
    topk.show()
    clustered = (
        ff.KMeansClusterer("embedding", "vec_id", k=4, iterations=2)
        .fit(emb).transform(emb)
    )
    clustered.groupBy("cluster").count().orderBy("cluster").show()

    # 5. mix sources using the cluster id as the mixing key
    mixed = ff.WeightedSampler(
        "vec_id", "cluster_str", fractions={"0": 1.0, "1": 0.5},
        default_fraction=0.25,
    ).transform(clustered.withColumn("cluster_str", F.col("cluster").cast("string")))
    print(f"mixed corpus rows: {mixed.count()}")

    # 6. multimodal: decode image payloads (REAL pure-stdlib PNG/BMP/PPM
    #    decoding) and filter on the decoded features — blank/low-entropy
    #    screenshots are the image-side analogue of boilerplate text
    from feature_factory_spark.operators import image_decoder, image_schema, solid_png

    def synth(batches):
        for pdf in batches:
            pdf["img"] = [
                solid_png(int(i) % 7 + 2, int(i) % 5 + 2, int(i) % 256)
                for i in pdf["doc_id"]
            ]
            yield pdf

    with_img = docs.select("doc_id").limit(200).mapInPandas(
        synth, "doc_id bigint, img binary"
    )
    decoded = ff.BinaryFeatureExtractor(
        "img", decoder=image_decoder, feature_schema=image_schema()
    ).transform(with_img)
    low_info = decoded.where(F.col("img_entropy") < 0.5)
    print(f"low-entropy images: {low_info.count()} / {decoded.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
