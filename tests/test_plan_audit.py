"""plan_audit (r11): the codified 100 TB scale review — lint any
frame's physical plan for cartesian products, single-partition
funnels, row-at-a-time Python UDFs, and pushdown misses."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.plans import plan_audit


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id bigint, k string, v double"
    )


def kinds(findings, severity=None):
    return sorted(
        f["kind"] for f in findings
        if severity is None or f["severity"] == severity
    )


def test_clean_plan_is_clean(spark, df):
    out = df.groupBy("k").agg(F.sum("v").alias("s"))
    assert kinds(plan_audit(out), "error") == []


def test_flags_cartesian(spark, df):
    bad = df.crossJoin(df.select(F.col("id").alias("id2")))
    assert "cartesian" in kinds(plan_audit(bad), "error")
    with pytest.raises(ff.FeatureFactoryError, match="cartesian"):
        plan_audit(bad, fail=True)


def test_flags_global_window_funnel(spark, df):
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert "single_partition" in kinds(plan_audit(bad), "error")
    ok = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert "single_partition" not in kinds(plan_audit(ok))


def test_flags_row_python_udf_but_not_arrow(spark, df):
    from pyspark.sql.functions import udf

    bad = df.withColumn("u", udf(lambda x: x + 1)("id"))
    assert "row_python_udf" in kinds(plan_audit(bad), "error")

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def plus(x: pd.Series) -> pd.Series:
        return x + 1

    arrow = df.withColumn("u", plus("v"))
    res = plan_audit(arrow)
    assert "row_python_udf" not in kinds(res)
    assert "arrow_python_udf" in kinds(res, "info")
    plan_audit(arrow, fail=True)  # info never raises


def test_package_operators_pass_the_audit(spark, df):
    # the operators this package ships must pass their own linter
    docs = spark.createDataFrame(
        [(1, "some text here"), (2, "other text body")],
        "doc_id bigint, text string",
    )
    vec = ff.HashedTfIdfVectorizer("text", n_features=16).fit(docs)
    assert kinds(plan_audit(vec.transform(docs)), "error") == []
    gate = ff.MetaRobotsFilter("text").transform(docs)
    assert kinds(plan_audit(gate), "error") == []


def test_unpushed_filter_warning(spark, df, tmp_path):
    path = str(tmp_path / "t.parquet")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    # a pushable predicate reaches the scan -> no warning
    pushed = back.where(F.col("v") > 1.0)
    assert "unpushed_filter" not in kinds(plan_audit(pushed))
    # an opaque predicate cannot push -> warning fires
    opaque = back.where(
        F.size(F.filter(F.split("k", ","), lambda x: x == "a")) > 0
    )
    assert "unpushed_filter" in kinds(plan_audit(opaque), "warning")
