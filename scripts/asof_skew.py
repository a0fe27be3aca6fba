"""Hot-key as-of join: single-window vs time-bucketed carry-in plan.

One pathological key holds ALL rows — the worst case for the default
per-key window (every row lands on one reducer). The skew-safe mode
(`time_bucket_seconds`) bounds reducer work by rows-per-bucket and
must produce the identical result.

Observed on local[32] (2026-08, round 4): 2M left + 200k right rows on
ONE key: 6.1 s single-window vs 4.5 s bucketed; at 10M + 1M rows the
gap widens to 12.8 s vs 6.4 s (2x) — identical checksums. The ratio
keeps growing with key size: the default plan's single reducer sorts
the whole key history (and eventually spills), while the bucketed
plan's widest partition stays one bucket regardless of history length.

Usage: python scripts/asof_skew.py [n_left] [n_right]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import feature_factory_spark as ff


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ONE key; events spread over ~23 days so 1h buckets give ~550
    # buckets with ~3.6k left rows each
    left = spark.range(n_left).select(
        F.lit("hot").alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("t"),
        F.col("id").alias("event_id"),
    )
    right = spark.range(n_right).select(
        F.lit("hot").alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 10 + 3).alias("t"),
        (F.col("id").cast("double") / 7.0).alias("px"),
    )

    def run(label, **kw):
        j = ff.AsOfJoiner(right, on=["k"], ts_col="t", value_cols=["px"], **kw)
        t0 = time.time()
        out = j.transform(left)
        cnt, chk = out.agg(
            F.count("*"), F.expr("bit_xor(xxhash64(event_id, px))")
        ).first()
        dt = time.time() - t0
        print(f"{label}: rows={cnt} checksum={chk} in {dt:.1f}s", flush=True)
        return chk

    a = run("single-window (default)")
    b = run("time-bucketed 1h   ", time_bucket_seconds=3600.0)
    assert a == b, "bucketed plan diverged from the single-window plan"
    print("checksums identical")
    spark.stop()


if __name__ == "__main__":
    main()
