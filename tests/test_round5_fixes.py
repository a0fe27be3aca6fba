"""Round-5 hardening: global-window guards, run_incremental sink
options, and the .zstd suffix dispatch (VERDICT.md r4 items 2, ADVICE
items 1/3)."""

import warnings

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.exceptions import UnsupportedFormatError
from feature_factory_spark.sources import io as ffio


@pytest.fixture(scope="module")
def series(spark):
    rows = [("u%d" % (i % 3), i, float(i)) for i in range(30)]
    return spark.createDataFrame(rows, "k string, t int, v double")


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- global-window guards (VERDICT r4 "What's wrong" #1) ----------------


def test_timeseries_global_window_warns(series):
    op = ff.LagFeatures(["v"], ["t"])  # no partition_by
    with pytest.warns(UserWarning, match="GLOBAL"):
        op.transform(series)


def test_window_features_global_window_warns(series):
    op = ff.WindowFeatures(["v"], ["t"], window=3, functions=["mean"])
    with pytest.warns(UserWarning, match="single task"):
        op.transform(series)


def test_expanding_global_window_warns(series):
    op = ff.ExpandingWindowFeatures(["v"], ["t"], functions=["sum"])
    with pytest.warns(UserWarning, match="GLOBAL"):
        op.transform(series)


def test_sequence_packer_global_window_warns(series):
    op = ff.SequencePacker("t", budget=16, order_col="t")
    with pytest.warns(UserWarning, match="SequencePacker"):
        op.transform(series)


def test_partitioned_usage_does_not_warn(series):
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ff.LagFeatures(["v"], ["t"], partition_by=["k"]).transform(series)
        ff.SequencePacker(
            "t", budget=16, order_col="t", partition_cols=["k"]
        ).transform(series)


def test_partitioned_window_plan_has_no_single_partition_exchange(series):
    out = ff.LagFeatures(["v"], ["t"], partition_by=["k"]).transform(series)
    plan = _phys(out.select("k", "t", "v_lag_1"))
    assert "hashpartitioning(k" in plan
    assert "SinglePartition" not in plan

    packed = ff.SequencePacker(
        "t", budget=16, order_col="t", partition_cols=["k"]
    ).transform(series)
    plan = _phys(packed.select("k", "pack_id"))
    assert "hashpartitioning(k" in plan
    assert "SinglePartition" not in plan


def test_global_window_still_correct(series):
    # the guard warns but must not change results: global lag over t
    with pytest.warns(UserWarning):
        out = ff.LagFeatures(["v"], ["t"]).transform(series)
    rows = {r["t"]: r["v_lag_1"] for r in out.collect()}
    assert rows[0] is None
    assert rows[5] == 4.0


# -- run_incremental sink options (ADVICE item 1) -----------------------


def test_run_incremental_csv_sink_roundtrips_with_header(spark, tmp_path):
    from feature_factory_spark.streaming import run_incremental

    src, sink, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt"),
    )
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id int, text string"
    )
    docs.write.parquet(src)
    pipe = ff.make_pipeline(("fp", ff.DocumentFingerprint(["text"])))
    run_incremental(
        pipe, spark, src, sink, ckpt, docs.schema, sink_fmt="csv"
    )
    # read back with the package's own reader (header=True default):
    # without the header the first data row would be consumed as one
    back = ffio.read(spark, sink, fmt="csv")
    assert back.count() == 3
    assert set(back.columns) == {"doc_id", "text", "text_fingerprint"}


# -- .zstd suffix handling (ADVICE item 3, corrected in review) ---------
# Hadoop's ZStandardCodec registers ONLY '.zst', so dispatching a
# '.zstd'-named file to a line reader would scan it UNCOMPRESSED and
# yield silent garbage. The correct behavior is a loud error with the
# rename remedy; '.zst' keeps decompressing transparently.


def test_zstd_suffix_rejected_with_remedy(spark, tmp_path):
    with pytest.raises(UnsupportedFormatError, match="zst"):
        ffio.read(spark, str(tmp_path / "corpus.jsonl.zstd"))


def test_zst_suffix_still_dispatches(spark, tmp_path):
    # nonexistent file: dispatch success -> Spark path error, not
    # UnsupportedFormatError
    with pytest.raises(Exception) as exc:
        ffio.read(spark, str(tmp_path / "corpus.jsonl.zst")).collect()
    assert not isinstance(exc.value, UnsupportedFormatError)


def test_whole_file_compressed_columnar_still_rejected(spark, tmp_path):
    with pytest.raises(UnsupportedFormatError):
        ffio.read(spark, str(tmp_path / "data.parquet.zst"))
