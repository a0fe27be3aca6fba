"""Interleaved A/B for the MinHash signature expression (VERDICT r13
"Next round" item 2: confirm-or-fix the dedup_pairs regression).

Variants, all computing bit-identical signatures over the same
persisted shingle-hash frame:
  fold      — HEAD: ONE aggregate over hs, (a,b) constants as an
              arrays_zip of two F.lit(list) arrays (f977a33)
  fold_lit  — fold, but the zipped (a,b) constants pre-folded to a
              SINGLE Literal node via from_json (the r13
              string_array_literal discipline applied to the struct
              array)
  perpass   — pre-f977a33: num_perm independent
              array_min(transform(hs, rehash)) passes

Each rep times a noop materialization of (id, sig); variants alternate
within each rep so host drift hits all variants equally (guide §1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("AB_REPS", "5"))


def main() -> int:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from feature_factory_spark.functions.text import (
        MERSENNE_P31,
        base_hash_expr,
        universal_rehash_expr,
    )
    from feature_factory_spark.operators.dedup import MinHashDeduplicator

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab-minhash-sig")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = entry._t(spark, SF_DIR, "documents")
    dd = MinHashDeduplicator("text", "doc_id", threshold=0.7)
    hashed = dd._shingled(docs).select(
        "id", F.transform(F.col("sh"), base_hash_expr).alias("hs")
    )
    from pyspark import StorageLevel

    hashed = hashed.persist(StorageLevel.MEMORY_AND_DISK)
    hashed.count()

    n = len(dd._constants)

    def sig_fold():
        return dd._signature_expr()

    def sig_fold_lit():
        ab = F.from_json(
            F.lit(json.dumps(
                [{"0": a, "1": b} for a, b in dd._constants]
            )),
            "array<struct<`0`: bigint, `1`: bigint>>",
        )
        init = F.array_repeat(F.lit(MERSENNE_P31).cast("bigint"), n)
        folded = F.aggregate(
            F.col("hs"),
            init,
            lambda acc, h: F.zip_with(
                acc,
                ab,
                lambda m, c: F.least(
                    m, F.pmod(c["0"] * h + c["1"], F.lit(MERSENNE_P31))
                ),
            ),
        )
        return F.when(F.size(F.col("hs")) > 0, folded).otherwise(
            F.array_repeat(F.lit(None).cast("bigint"), n)
        )

    def sig_perpass():
        return F.array(*[
            F.array_min(
                F.transform(F.col("hs"), lambda h: universal_rehash_expr(h, a, b))
            )
            for a, b in dd._constants
        ])

    variants = {
        "fold": sig_fold,
        "fold_lit": sig_fold_lit,
        "perpass": sig_perpass,
    }

    # parity first: all variants must agree value-for-value
    frames = {
        k: hashed.select("id", fn().alias("sig")) for k, fn in variants.items()
    }
    base = frames["fold"].orderBy("id").collect()
    for k in ("fold_lit", "perpass"):
        other = frames[k].orderBy("id").collect()
        assert [r["sig"] for r in base] == [r["sig"] for r in other], k
    print("parity: all variants bit-identical", flush=True)

    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        for k in variants:
            spark.sparkContext.setJobDescription(f"sig:{k}:rep{rep}")
            t0 = time.perf_counter()
            frames[k].write.format("noop").mode("overwrite").save()
            times[k].append(round(time.perf_counter() - t0, 3))
    for k, ts in times.items():
        ts_sorted = sorted(ts)
        print(f"{k:10s} median {ts_sorted[len(ts)//2]:7.3f}  all {ts}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
