"""Basic usage — mirrors the reference's examples/basic_usage.rs flow
(load a table, build a pipeline, fit, inspect) on the synthetic testdata.

Run: python examples/basic_usage.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.sources import io as ffio


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    lineitem = ffio.read(spark, f"{sf_dir}/lineitem.parquet")

    pipe = ff.make_pipeline(
        ("impute", ff.MeanMedianImputer(["l_quantity"])),
        ("winsor", ff.Winsorizer(["l_extendedprice"], 0.05, 0.95)),
        ("onehot", ff.OneHotEncoder(["l_returnflag"])),
        ("month", ff.DatetimeFeatures(["l_shipdate"], parts=["year", "month"])),
        ("select", ff.DropCorrelatedFeatures(threshold=0.95)),
        verbose=True,
    )
    out = pipe.fit(lineitem)
    out.show(5)
    print(f"rows: {out.count()}, columns: {out.columns}")
    spark.stop()


if __name__ == "__main__":
    main()


