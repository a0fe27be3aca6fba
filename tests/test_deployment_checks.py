"""Executable checks for DEPLOYMENT.md's 100 TB claims (VERDICT.md r4
next-round item 8): each recipe claim that can be demonstrated on
local[*] is pinned here — AQE skew-join splitting, shuffle-free bucketed
joins, zone-map tightening from sort_within_partitions, and partition
pruning on partitioned sinks."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from feature_factory_spark.sources import io as ffio


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def conf_guard(spark):
    """Set/restore session confs around a test."""
    saved = {}

    def set_conf(key, value):
        if key not in saved:
            saved[key] = spark.conf.get(key, None)
        spark.conf.set(key, value)

    yield set_conf
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark, conf_guard):
    """DEPLOYMENT.md 'Session configuration': AQE skew-join splitting is
    what makes a hot key survivable. Synthetic hot key (>90% of rows on
    one join key) + thresholds scaled to the test bed -> the adaptive
    plan must mark the sort-merge join skew=true."""
    conf_guard("spark.sql.adaptive.enabled", "true")
    conf_guard("spark.sql.adaptive.skewJoin.enabled", "true")
    conf_guard("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf_guard("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf_guard("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    conf_guard("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf_guard("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    conf_guard("spark.sql.shuffle.partitions", "8")

    left = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.concat(F.lit("payload-" * 8), F.col("id").cast("string")).alias("pl"),
    )
    right = spark.range(100).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("rv")
    )
    # AQE finalizes per-action: drive the action through THIS plan (an
    # aggregate keeps the driver transfer to one row) and read the final
    # adaptive plan off the same query execution
    agg = left.join(right, "k").agg(F.sum(F.length("pl")))
    agg.collect()
    plan = _executed(agg)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:4000]


def test_bucketed_tables_join_without_shuffle(spark, conf_guard):
    """DEPLOYMENT.md 'Data layout': two tables bucketed by the same key
    with the same bucket count sort-merge join WITHOUT a shuffle."""
    conf_guard("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf_guard("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    conf_guard("spark.sql.sources.bucketing.enabled", "true")

    spark.sql("DROP TABLE IF EXISTS ff_bucket_a")
    spark.sql("DROP TABLE IF EXISTS ff_bucket_b")
    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    ffio.write_bucketed(a, "ff_bucket_a", buckets=8, bucket_cols=["k"],
                        sort_cols=["k"])
    ffio.write_bucketed(b, "ff_bucket_b", buckets=8, bucket_cols=["k"],
                        sort_cols=["k"])
    joined = spark.table("ff_bucket_a").join(spark.table("ff_bucket_b"), "k")
    assert joined.count() == 10_000
    plan = _executed(joined)
    assert "Exchange hashpartitioning" not in plan, plan[:4000]
    assert "SelectedBucketsCount" in plan  # both sides scanned bucketed
    spark.sql("DROP TABLE IF EXISTS ff_bucket_a")
    spark.sql("DROP TABLE IF EXISTS ff_bucket_b")


def test_sort_within_partitions_tightens_row_group_stats(spark, tmp_path):
    """DEPLOYMENT.md 'Data layout': sort_within_partitions clusters the
    sort key so per-file parquet min/max ranges become narrow (zone-map
    pruning). Measured directly from the parquet footers: the summed
    key-range of sorted files must be far below the unsorted layout's
    (which makes every file span ~the whole domain)."""
    import pyarrow.parquet as pq

    df = spark.range(40_000).select(
        (F.col("id") * 7919 % 40_000).alias("key"),  # shuffled domain
        F.col("id").alias("v"),
    ).repartition(1)

    def span_sum(path):
        total = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)
                assert col.path_in_schema == "key"
                total += col.statistics.max - col.statistics.min
        return total

    unsorted = str(tmp_path / "unsorted")
    ffio.write(df, unsorted, max_records_per_file=10_000)
    sorted_path = str(tmp_path / "sorted")
    ffio.write(df, sorted_path, max_records_per_file=10_000,
               sort_within_partitions=["key"])
    # 4 files each; sorted files cover disjoint quarters of the domain
    assert span_sum(sorted_path) < span_sum(unsorted) / 2


def test_partitioned_sink_prunes_at_scan(spark, tmp_path):
    """DEPLOYMENT.md 'Data layout': a reader filtering on the partition
    column scans only its partition (PartitionFilters in the plan, and
    only that partition's files)."""
    path = str(tmp_path / "by_day")
    df = spark.range(5_000).select(
        (F.col("id") % 4).alias("day"), F.col("id").alias("v")
    )
    ffio.write(df, path, partition_by=["day"])
    scan = ffio.read(spark, path, fmt="parquet").where(F.col("day") == 2)
    assert scan.count() == 1250
    plan = _executed(scan)
    assert "PartitionFilters" in plan
    assert "(day" in plan.split("PartitionFilters", 1)[1][:200]


def test_fitted_state_dataframe_not_literal(spark):
    """DEPLOYMENT.md 'Keep learned state in DataFrames': a fitted
    mapping above the literal threshold must apply as a join against a
    state frame, not as a giant CASE literal chain."""
    import feature_factory_spark as ff

    rows = [(i, f"cat_{i % 300}") for i in range(3_000)]
    df = spark.createDataFrame(rows, "id bigint, c string")
    enc = ff.CountFrequencyEncoder(["c"]).fit(df)
    plan = _executed(enc.transform(df).select("c"))
    assert "Join" in plan or "BroadcastHashJoin" in plan, plan[:2000]
