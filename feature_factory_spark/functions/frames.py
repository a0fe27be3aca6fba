"""Small-frame construction helpers.

``spark.createDataFrame(rows, schema)`` parallelizes local rows into
``defaultParallelism`` slices. That is right for data-sized input, but
for the model/metadata frames the index writers persist as ONE file it
makes the single-file write pathological: ``coalesce(1)`` funnels every
(mostly empty) slice through one task, and each slice evaluation is a
separate sequential Python-worker roundtrip — ~5 s per 1-row write at
32 cores, per index. Building the frame in one slice keeps the write a
single cheap task with no coalesce needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def one_slice_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """A local-rows DataFrame carried in ONE partition — use for
    model-sized frames that are written as a single file (index meta,
    version logs, codebooks). Same contract as
    ``spark.createDataFrame(rows, schema)`` otherwise."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


ROWS_PER_SLICE = 50_000


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """A local-rows DataFrame in ``ceil(len/ROWS_PER_SLICE)`` slices —
    use for model/probe frames that query plans re-scan: the default
    ``createDataFrame`` parallelizes into ``defaultParallelism`` slices
    and every scan then pays one Python-worker roundtrip per slice
    (32 near-empty tasks per action at local[32] for a few-thousand-row
    model frame). Row-count-proportional slicing keeps big fitted
    tables (e.g. 100k-word tokenizer tables) off a single task while
    small frames scan in one. ``rows`` must be a sequence (sized)."""
    n = max(1, -(-len(rows) // ROWS_PER_SLICE))
    if n == 1:
        return one_slice_frame(spark, rows, schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n), schema
    )
