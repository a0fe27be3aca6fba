"""Scale-contract tests: fit-time job counts and physical-plan shape.

These assert the engine's two core scale promises (README 'Design for
scale'): stateful fits run ONE Spark job per statistics pass regardless
of column count, and transform-only plans are shuffle-free single-stage
projections/filters with whole-stage codegen.
"""

import pytest

from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.plans.inspect import plan_report


def count_jobs(spark, fn):
    """Number of Spark jobs triggered by fn()."""
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    fn()
    after = set(tracker.getJobIdsForGroup(None) or [])
    return len(after - before)


@pytest.fixture(scope="module")
def wide(spark):
    rows = [
        (float(i), float(i % 7), float(i % 3), f"c{i % 5}", f"d{i % 4}", f"e{i % 3}")
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "a double, b double, c double, k1 string, k2 string, k3 string"
    ).cache()


# Under AQE a single logical aggregate can surface as 2 Spark jobs
# (shuffle-stage materialization + final), so the absolute count is an
# execution detail. The scale contract is that the job count DOES NOT GROW
# with the number of fitted columns — a per-column fit loop would triple it.


def test_mean_fit_jobs_independent_of_columns(spark, wide):
    wide.count()  # warm the cache outside the measured window
    one = count_jobs(spark, lambda: ff.MeanMedianImputer(["a"]).fit(wide))
    three = count_jobs(
        spark, lambda: ff.MeanMedianImputer(["a", "b", "c"]).fit(wide)
    )
    assert three == one


def test_quantile_fit_jobs_independent_of_columns_and_bins(spark, wide):
    one = count_jobs(
        spark, lambda: ff.EqualFrequencyDiscretizer(["a"], bins=2).fit(wide)
    )
    # 3 columns x 6 boundaries: the reference would run bins+1 jobs per
    # column (discretization.rs:228-253); we stay flat
    many = count_jobs(
        spark, lambda: ff.EqualFrequencyDiscretizer(["a", "b", "c"], bins=5).fit(wide)
    )
    assert many == one


def test_winsorizer_fit_jobs_independent_of_columns(spark, wide):
    one = count_jobs(spark, lambda: ff.Winsorizer(["a"]).fit(wide))
    three = count_jobs(spark, lambda: ff.Winsorizer(["a", "b", "c"]).fit(wide))
    assert three == one


def test_count_encoder_fit_jobs_independent_of_columns(spark, wide):
    # melted single groupBy for all columns (VERDICT scale-weak #2)
    one = count_jobs(spark, lambda: ff.CountFrequencyEncoder(["k1"]).fit(wide))
    three = count_jobs(
        spark, lambda: ff.CountFrequencyEncoder(["k1", "k2", "k3"]).fit(wide)
    )
    assert three == one


def test_woe_encoder_fit_jobs_independent_of_columns(spark, wide):
    df = wide.withColumn("tgt", (F.col("a") > 100).cast("int"))
    one = count_jobs(spark, lambda: ff.WoEEncoder(["k1"], "tgt").fit(df))
    three = count_jobs(
        spark, lambda: ff.WoEEncoder(["k1", "k2", "k3"], "tgt").fit(df)
    )
    assert three == one


def test_constant_selector_fit_jobs_independent_of_columns(spark, wide):
    # numeric + string columns in one aggregate pass (the multi-column
    # countDistinct plans via a single Expand, so jobs stay flat as
    # columns grow)
    few = count_jobs(
        spark, lambda: ff.DropConstantFeatures().fit(wide.select("a", "k1"))
    )
    many = count_jobs(spark, lambda: ff.DropConstantFeatures().fit(wide))
    assert many == few


# ---------------------------------------------------------------- plans ----


def _parquet_df(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 50).cast("double").alias("x"),
        (F.col("id") % 9).cast("double").alias("y"),
        F.concat(F.lit("k"), (F.col("id") % 3)).alias("k"),
    ).write.parquet(p)
    return spark.read.parquet(p)


def test_transform_only_plans_have_no_exchange(spark, tmp_path):
    df = _parquet_df(spark, tmp_path)
    transforms = [
        ff.LogTransformer(["x"]).transform(df.where("x > 0")),
        ff.ArbitraryNumberImputer(["x"], -1.0).transform(df),
        ff.AddMissingIndicator(["x"]).transform(df),
        ff.MathFeatures([("z", F.col("x") * 2)]).transform(df),
        ff.ArbitraryOutlierCapper({"x": 1.0}, {"x": 40.0}).transform(df),
        ff.ArbitraryDiscretizer({"x": [(0.0, 50.0, "all")]}).transform(df),
    ]
    for out in transforms:
        r = plan_report(out)
        assert r["exchanges"] == 0, r["plan"]
        assert r["wholestage_codegen"], r["plan"]


def test_fitted_trimmer_pushes_filters_to_scan(spark, tmp_path):
    df = _parquet_df(spark, tmp_path)
    t = ff.OutlierTrimmer(["x"], 0.1, 0.9).fit(df)
    r = plan_report(t.transform(df))
    assert r["pushed_filters"], r["plan"]
    assert r["exchanges"] == 0


def test_pipeline_plan_fuses_into_single_stage(spark, tmp_path):
    df = _parquet_df(spark, tmp_path)
    pipe = ff.make_pipeline(
        ("imp", ff.ArbitraryNumberImputer(["x"], 0.0)),
        ("cap", ff.ArbitraryOutlierCapper({"x": 0.0}, {"x": 45.0})),
        ("math", ff.MathFeatures([("x2", F.col("x") * F.col("x"))])),
        ("log", ff.LogCpTransformer(["y"], c=1.0)),
    )
    out = pipe.fit(df)
    r = plan_report(out)
    # four chained operators fuse into one shuffle-free codegen stage
    assert r["exchanges"] == 0, r["plan"]
    assert r["wholestage_codegen"]


def test_mapping_projection_reads_only_needed_columns(spark, tmp_path):
    df = _parquet_df(spark, tmp_path)
    enc = ff.CountFrequencyEncoder(["k"]).fit(df)
    out = enc.transform(df).select("id", "k")
    r = plan_report(out)
    assert "ReadSchema: struct<id:bigint,k:string>" in r["plan"], r["plan"]
