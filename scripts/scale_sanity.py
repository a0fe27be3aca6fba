"""Scale sanity: grow the documents corpus 10x (distinct per-copy suffix
so copies of one base doc form a near-dup cluster) and check MinHash
dedup wall time grows ~linearly, not quadratically.

Observed on local[32] at sf0.1 (2026-08, round 3): 5,000 docs / 256
pairs in 7.8 s -> 50,000 docs / ~250k pairs in 12.6 s — 1.6x time for
10x docs and ~1000x verified pairs. The banded bucket join is what keeps
the pair explosion off the critical path.

Usage: python scripts/scale_sanity.py [copies]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import feature_factory_spark as ff


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = docs.count()

    big = docs
    for i in range(1, copies):
        big = big.unionByName(
            docs.select(
                (F.col("doc_id") + i * 100000).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(f" uniquesuffix{i}word{i}tail{i}")
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    big = big.repartition(64).persist()
    big.count()

    dd = ff.MinHashDeduplicator("text", "doc_id", threshold=0.5)
    t0 = time.perf_counter()
    c1 = dd.candidate_pairs(docs).count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cN = dd.candidate_pairs(big).count()
    tN = time.perf_counter() - t0
    print(f"1x:  {n} docs, {c1} pairs, {t1:.1f}s")
    print(
        f"{copies}x: {n * copies} docs, {cN} pairs, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x data)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
