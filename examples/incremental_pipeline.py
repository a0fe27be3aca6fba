"""Incremental corpus processing — the scheduled-run operational loop.

Demonstrates the pattern a production training-data pipeline runs on a
growing corpus directory:

  1. fit the stateful pipeline steps once on a batch snapshot, then
     `Pipeline.save_state` the fitted parameters (frame-held state goes
     to parquet) so later invocations — including after a driver
     restart — `load_state` instead of re-fitting the corpus;
  2. each scheduled run, `run_incremental` processes ONLY files that
     arrived since the last run (Structured Streaming availableNow +
     checkpoint) and appends exactly-once to the sink;
  3. periodically, `compact_to` rewrites the accreted small files into
     evenly sized ones at a side path.

Run: python examples/incremental_pipeline.py
"""

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession

import feature_factory_spark as ff
from feature_factory_spark.sources import compact_to
from feature_factory_spark.streaming import run_incremental


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ff_incremental_")
    src, sink, ckpt = (os.path.join(work, p) for p in ("src", "sink", "ckpt"))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # day 0: first slice of the corpus lands; fit stateful steps on it
    day0 = docs.where("doc_id % 2 = 0")
    day0.write.parquet(src)
    pipe = ff.make_pipeline(
        ("feat", ff.TextFeatures(["text"])),
        ("lang", ff.LanguageIdentifier(["text"])),
        ("scale", ff.MinMaxScaler(["n_chars"])),  # stateful: fit on batch
    )
    pipe.fit(day0)
    # persist the fitted state: every later scheduled invocation (or a
    # restarted driver) restores it instead of re-fitting the corpus
    state_dir = os.path.join(work, "pipeline_state")
    pipe.save_state(state_dir)

    run_incremental(pipe, spark, src, sink, ckpt, docs.schema)
    print(f"run 1 (day 0 files): sink rows = {spark.read.parquet(sink).count()}")

    # day 1: new files arrive. Simulate a fresh driver: reconstruct the
    # pipeline and load the fitted state from disk — no re-fit.
    docs.where("doc_id % 2 = 1").write.mode("append").parquet(src)
    pipe = ff.make_pipeline(
        ("feat", ff.TextFeatures(["text"])),
        ("lang", ff.LanguageIdentifier(["text"])),
        ("scale", ff.MinMaxScaler(["n_chars"])),
    ).load_state(state_dir, spark)
    run_incremental(pipe, spark, src, sink, ckpt, docs.schema)
    print(f"run 2 (delta only, restored state): sink rows = {spark.read.parquet(sink).count()}")

    # no new input -> nothing appended (exactly-once)
    run_incremental(pipe, spark, src, sink, ckpt, docs.schema)
    print(f"run 3 (no new data): sink rows = {spark.read.parquet(sink).count()}")

    # maintenance: compact the accreted small files to a side path
    n_small = len(glob.glob(f"{sink}/*.parquet"))
    compacted = os.path.join(work, "sink_compacted")
    rows = compact_to(spark, sink, compacted, target_records_per_file=100_000)
    n_big = len(glob.glob(f"{compacted}/*.parquet"))
    print(f"compaction: {n_small} files -> {n_big} files ({rows} rows)")

    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
