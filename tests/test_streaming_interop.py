"""Tests for the streaming module and the pyspark.ml interop adapters."""

import pytest

from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.streaming import (
    SessionWindowAggregator,
    StreamingNotSupportedError,
    WindowedAggregator,
    apply_pipeline_to_stream,
    read_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from feature_factory_spark.sources.io import load_events

    return load_events(spark, SF)


def test_windowed_aggregator_batch(events):
    agg = WindowedAggregator(
        "ts", "1 day", {"n": F.count("*"), "total": F.sum("value")},
        keys=["event_type"],
    )
    out = agg.transform(events)
    assert set(out.columns) == {"window_start", "window_end", "event_type", "n", "total"}
    # window totals must re-aggregate to the raw totals
    assert out.agg(F.sum("n")).collect()[0][0] == events.count()


def test_session_window_batch(events):
    agg = SessionWindowAggregator(
        "ts", "30 minutes", {"n": F.count("*")}, keys=["user_id"]
    )
    out = agg.transform(events)
    assert out.agg(F.sum("n")).collect()[0][0] == events.count()
    assert out.count() <= events.count()


def test_streaming_windowed_agg(spark, events, tmp_path):
    # write a small parquet dir, stream it back with availableNow, and
    # check the stream result equals the batch result
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    stream = read_stream(spark, src, events.schema)
    assert stream.isStreaming
    agg = WindowedAggregator(
        "ts", "1 day", {"n": F.count("*")}, keys=["event_type"], watermark="1 hour"
    )
    out = agg.transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n) FROM win_counts").collect()[0][0]
    assert got == events.count()


def test_streaming_dedup_batch_keeps_min_id(spark):
    from feature_factory_spark.streaming import StreamingDeduplicator

    df = spark.createDataFrame(
        [(3, "dup text"), (1, "dup text"), (2, "other"), (4, "DUP  text")],
        "doc_id bigint, text string",
    )
    out = StreamingDeduplicator(["text"], "doc_id").transform(df)
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 4}
    # normalize=True folds case/whitespace: 4 joins the dup group
    norm = StreamingDeduplicator(["text"], "doc_id", normalize=True).transform(df)
    assert {r["doc_id"] for r in norm.collect()} == {1, 2}


def test_streaming_dedup_simhash_key_batch(spark):
    from feature_factory_spark.streaming import StreamingDeduplicator

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick  brown fox jumps over   the lazy dog"),  # ws variant
            (2, "a completely different document about spark planning"),
        ],
        "doc_id bigint, text string",
    )
    out = StreamingDeduplicator(["text"], "doc_id", key="simhash").transform(df)
    # identical word multiset -> identical 64-bit sketch -> one survivor
    assert {r["doc_id"] for r in out.collect()} == {1, 2}
    assert set(out.columns) == {"doc_id", "text"}


def test_streaming_dedup_simhash_key_on_stream(spark, tmp_path):
    import datetime

    from feature_factory_spark.streaming import StreamingDeduplicator, read_stream

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [
            (1, "shared boilerplate page text", t0),
            (2, "shared  boilerplate   page text", t0),
            (3, "unique article body here", t0),
        ],
        "doc_id bigint, text string, ts timestamp",
    )
    src = str(tmp_path / "simhash_src")
    df.write.parquet(src)
    dd = StreamingDeduplicator(
        ["text"], "doc_id", ts_col="ts", watermark="1 hour", key="simhash"
    )
    out = dd.transform(read_stream(spark, src, df.schema))
    q = (
        out.writeStream.format("memory")
        .queryName("simhash_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id FROM simhash_dedup").collect()
    ids = {r["doc_id"] for r in rows}
    assert len(ids) == 2 and 3 in ids  # one of {1,2} + the unique doc


def test_streaming_dedup_simhash_requires_single_column():
    from feature_factory_spark.streaming import StreamingDeduplicator

    with pytest.raises(Exception, match="one text column"):
        StreamingDeduplicator(["a", "b"], "id", key="simhash")


def test_streaming_dedup_on_stream(spark, events, tmp_path):
    from feature_factory_spark.streaming import StreamingDeduplicator

    src = str(tmp_path / "dedup_src")
    # duplicate every event row: the stream must emit each key once
    events.unionAll(events).write.parquet(src)
    stream = read_stream(spark, src, events.schema)
    dd = StreamingDeduplicator(
        ["user_id", "event_type", "ts"], "event_id",
        ts_col="ts", watermark="1 hour",
    )
    out = dd.transform(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) FROM dedup_out").collect()[0][0]
    expected = events.select("user_id", "event_type", "ts").distinct().count()
    assert got == expected


def test_streaming_dedup_requires_watermark_on_stream(spark, events, tmp_path):
    from feature_factory_spark.streaming import StreamingDeduplicator

    src = str(tmp_path / "dedup_src2")
    events.write.parquet(src)
    stream = read_stream(spark, src, events.schema)
    with pytest.raises(ff.InvalidParameterError):
        StreamingDeduplicator(["ts"], "event_id").transform(stream)


def test_stream_pipeline_stateless_ok(spark, events, tmp_path):
    src = str(tmp_path / "events_src2")
    events.write.parquet(src)
    stream = read_stream(spark, src, events.schema)
    pipe = ff.make_pipeline(
        ("indicator", ff.AddMissingIndicator(["value"])),
        ("math", ff.MathFeatures([("v2", F.col("value") * 2)])),
    )
    out = apply_pipeline_to_stream(pipe, stream)
    assert out.isStreaming
    assert "v2" in out.columns and "value_missing" in out.columns


def test_stream_pipeline_unfitted_stateful_rejected(spark, events, tmp_path):
    src = str(tmp_path / "events_src3")
    events.write.parquet(src)
    stream = read_stream(spark, src, events.schema)
    pipe = ff.make_pipeline(("imp", ff.MeanMedianImputer(["value"])))
    with pytest.raises(StreamingNotSupportedError):
        apply_pipeline_to_stream(pipe, stream)


def test_stream_pipeline_prefitted_stateful_ok(spark, events, tmp_path):
    src = str(tmp_path / "events_src4")
    events.write.parquet(src)
    pipe = ff.make_pipeline(("imp", ff.MeanMedianImputer(["value"])))
    pipe.fit(events)  # fit on batch, serve on stream
    stream = read_stream(spark, src, events.schema)
    out = apply_pipeline_to_stream(pipe, stream)
    assert out.isStreaming


def test_ml_interop_estimator(spark):
    from pyspark.ml import Pipeline as MLPipeline

    from feature_factory_spark.interop import as_ml_stage

    df = spark.createDataFrame(
        [(1.0, "a"), (None, "b"), (3.0, "a")], "x double, k string"
    )
    stages = [
        as_ml_stage(ff.MeanMedianImputer(["x"])),
        as_ml_stage(ff.OneHotEncoder(["k"])),
    ]
    model = MLPipeline(stages=stages).fit(df)
    out = model.transform(df)
    assert "k_a" in out.columns
    assert out.where(F.col("x").isNull()).count() == 0


def test_ml_interop_stateless_is_transformer(spark):
    from pyspark.ml import Transformer as MLTransformer

    from feature_factory_spark.interop import as_ml_stage

    stage = as_ml_stage(ff.AddMissingIndicator(["x"]))
    assert isinstance(stage, MLTransformer)


def test_running_aggregator_batch(spark):
    from feature_factory_spark.streaming import RunningAggregator

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("a", None)],
        "k string, v double",
    )
    out = RunningAggregator(["k"], "v").transform(df)
    rows = {r["k"]: r for r in out.collect()}
    assert rows["a"]["n"] == 2 and rows["a"]["total"] == 4.0
    assert rows["a"]["mean_value"] == 2.0
    assert rows["b"]["n"] == 1 and rows["b"]["mean_value"] == 10.0


def test_running_aggregator_stream_matches_batch(spark, events, tmp_path):
    from feature_factory_spark.streaming import RunningAggregator

    src = str(tmp_path / "run_src")
    events.write.parquet(src)
    stream = read_stream(spark, src, events.schema)
    agg = RunningAggregator(["event_type"], "value")
    out = agg.transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the LAST emitted row per key is the final running value == batch agg
    got = {
        r["event_type"]: r
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY event_type ORDER BY n DESC) rn
                 FROM running_stats) WHERE rn = 1"""
        ).collect()
    }
    expected = {
        r["event_type"]: r
        for r in agg.transform(events).collect()
    }
    assert set(got) == set(expected)
    for k, e in expected.items():
        assert got[k]["n"] == e["n"]
        assert got[k]["total"] == pytest.approx(e["total"])


# --- round-4 review fixes -------------------------------------------------


def test_running_aggregator_batch_excludes_uncastable_and_nan(spark):
    from feature_factory_spark.streaming import RunningAggregator

    df = spark.createDataFrame(
        [("k", "1"), ("k", "abc"), ("k", "3"), ("e", None)],
        "g string, v string",
    )
    out = {r["g"]: r for r in RunningAggregator(["g"], "v").transform(df).collect()}
    # 'abc' fails the cast and is excluded from ALL three statistics
    assert (out["k"]["n"], out["k"]["total"], out["k"]["mean_value"]) == (2, 4.0, 2.0)
    # an all-null key matches the stream's zero-initialised state
    assert (out["e"]["n"], out["e"]["total"], out["e"]["mean_value"]) == (0, 0.0, None)

    nan_df = spark.createDataFrame(
        [("k", 1.0), ("k", float("nan"))], "g string, v double"
    )
    r = RunningAggregator(["g"], "v").transform(nan_df).collect()[0]
    assert (r["n"], r["total"], r["mean_value"]) == (1, 1.0, 1.0)


def test_running_aggregator_ttl_validated_at_init():
    from feature_factory_spark.exceptions import InvalidParameterError
    from feature_factory_spark.streaming import RunningAggregator

    for bad in ("90s", "1 hr", "-5 minutes", "five minutes"):
        with pytest.raises(InvalidParameterError):
            RunningAggregator(["k"], "v", ttl=bad)
    assert RunningAggregator(["k"], "v", ttl="2 hours")._ttl_ms == 7_200_000


def test_streaming_dedup_validates_ts_col(spark):
    from feature_factory_spark.exceptions import (
        InvalidParameterError,
        MissingColumnError,
    )
    from feature_factory_spark.streaming import StreamingDeduplicator

    df = spark.createDataFrame([(1, "t", "x")], "doc_id bigint, text string, s string")
    with pytest.raises(MissingColumnError):
        StreamingDeduplicator(
            ["text"], "doc_id", ts_col="nope", watermark="1 hour"
        ).transform(df)
    with pytest.raises(InvalidParameterError):
        StreamingDeduplicator(
            ["text"], "doc_id", ts_col="s", watermark="1 hour"
        ).transform(df)


def test_binary_extractor_null_payload_yields_null_features(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"")), (2, None), (3, bytearray(b"abc"))],
        "doc_id bigint, payload binary",
    )
    out = {r["doc_id"]: r for r in ff.BinaryFeatureExtractor("payload").transform(df).collect()}
    # zero-byte media is real (len 0, md5 of b''); missing media is NULL
    assert out[1]["payload_payload_len"] == 0
    assert out[1]["payload_payload_md5"] is not None
    assert out[2]["payload_payload_len"] is None
    assert out[2]["payload_payload_md5"] is None
    assert out[3]["payload_payload_len"] == 3


def test_multimodal_output_column_collisions_rejected(spark):
    from feature_factory_spark.exceptions import InvalidParameterError

    df = spark.createDataFrame(
        [(1, bytearray(b"abcdef"), 9)],
        "doc_id bigint, payload binary, frame_index int",
    )
    with pytest.raises(InvalidParameterError, match="frame_index"):
        ff.FrameSampler("payload").transform(df)
    df2 = spark.createDataFrame(
        [(1, bytearray(b"abcdef"), "x")],
        "doc_id bigint, payload binary, payload_payload_len string",
    )
    with pytest.raises(InvalidParameterError, match="payload_payload_len"):
        ff.BinaryFeatureExtractor("payload").transform(df2)


def test_column_profiler_rejects_explicit_empty_list():
    from feature_factory_spark.exceptions import InvalidParameterError

    with pytest.raises(InvalidParameterError):
        ff.ColumnProfiler(columns=[])


def test_text_quality_stage_stream_matches_batch(spark, tmp_path):
    # the filter-on-ingest pattern: the stateless text-quality stage
    # (features -> language id -> Gopher filter -> PII redaction) must
    # run unchanged on a document stream and produce exactly the batch
    # result — these operators are pure plan rewrites, so stream==batch
    # is a contract, not a coincidence
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)

    pipe = ff.make_pipeline(
        ("feat", ff.TextFeatures(["text"])),
        ("lang", ff.LanguageIdentifier(["text"])),
        ("gopher", ff.GopherQualityFilter("text", min_words=5)),
        ("pii", ff.PIIRedactor(["text"])),
    )
    batch_out = pipe.fit(docs)

    stream = read_stream(spark, src, docs.schema)
    out = apply_pipeline_to_stream(pipe, stream)
    assert out.isStreaming
    sink = str(tmp_path / "docs_sink")
    (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_docs"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    stream_rows = sorted(
        (r["doc_id"], r["text"], r["text_quality_score"])
        for r in spark.read.parquet(sink).collect()
    )
    batch_rows = sorted(
        (r["doc_id"], r["text"], r["text_quality_score"])
        for r in batch_out.collect()
    )
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_run_incremental_processes_only_new_files_exactly_once(spark, tmp_path):
    from feature_factory_spark.streaming import run_incremental

    docs = spark.createDataFrame(
        [(i, f"doc number {i} body text") for i in range(20)],
        "doc_id bigint, text string",
    )
    src = str(tmp_path / "inc_src")
    sink = str(tmp_path / "inc_sink")
    ckpt = str(tmp_path / "inc_ckpt")
    first = docs.where("doc_id < 12")
    first.write.parquet(src)

    pipe = ff.make_pipeline(("tok", ff.TokenCount(["text"])))

    run_incremental(pipe, spark, src, sink, ckpt, docs.schema)
    out1 = spark.read.parquet(sink)
    assert out1.count() == 12
    assert "text_ws_tokens" in out1.columns

    # second batch of files arrives; a new run must process ONLY those
    docs.where("doc_id >= 12").write.mode("append").parquet(src)
    run_incremental(pipe, spark, src, sink, ckpt, docs.schema)
    out2 = spark.read.parquet(sink)
    assert out2.count() == 20
    assert sorted(r["doc_id"] for r in out2.collect()) == list(range(20))

    # a third run with no new input appends nothing (exactly-once)
    run_incremental(pipe, spark, src, sink, ckpt, docs.schema)
    assert spark.read.parquet(sink).count() == 20


def test_run_incremental_partitioned_sink(spark, tmp_path):
    import glob

    from feature_factory_spark.streaming import run_incremental

    docs = spark.createDataFrame(
        [(i, f"src{i % 2}", f"text {i}") for i in range(10)],
        "doc_id bigint, source string, text string",
    )
    src, sink, ckpt = (str(tmp_path / p) for p in ("s", "k", "c"))
    docs.write.parquet(src)
    pipe = ff.make_pipeline(("feat", ff.TextFeatures(["text"])))
    run_incremental(pipe, spark, src, sink, ckpt, docs.schema,
                    partition_by=["source"])
    assert sorted(
        p.rsplit("/", 1)[-1] for p in glob.glob(f"{sink}/source=*")
    ) == ["source=src0", "source=src1"]
    assert spark.read.parquet(sink).count() == 10


def test_read_stream_jsonl_alias_and_unknown_format(spark, tmp_path):
    from feature_factory_spark.exceptions import UnsupportedFormatError
    from feature_factory_spark.streaming import read_stream

    schema = "doc_id bigint, text string"
    s = read_stream(spark, str(tmp_path), schema, fmt="jsonl")
    assert s.isStreaming
    with pytest.raises(UnsupportedFormatError, match="supported"):
        read_stream(spark, str(tmp_path), schema, fmt="avro")


def test_run_incremental_rejects_zero_timeout(spark, tmp_path):
    from feature_factory_spark.exceptions import InvalidParameterError
    from feature_factory_spark.streaming import run_incremental

    pipe = ff.make_pipeline(("feat", ff.TextFeatures(["text"])))
    with pytest.raises(InvalidParameterError):
        run_incremental(
            pipe, spark, str(tmp_path / "s"), str(tmp_path / "k"),
            str(tmp_path / "c"), "doc_id bigint, text string",
            timeout_seconds=0,
        )


def test_run_incremental_rejects_unknown_sink_format(spark, tmp_path):
    from feature_factory_spark.exceptions import UnsupportedFormatError
    from feature_factory_spark.streaming import run_incremental

    pipe = ff.make_pipeline(("feat", ff.TextFeatures(["text"])))
    with pytest.raises(UnsupportedFormatError, match="sink"):
        run_incremental(
            pipe, spark, str(tmp_path / "s"), str(tmp_path / "k"),
            str(tmp_path / "c"), "doc_id bigint, text string",
            sink_fmt="avro",
        )


def test_streaming_media_decode_matches_batch(spark, tmp_path):
    """Multimodal batch==stream duality: BinaryFeatureExtractor with the
    REAL image/audio decoders runs unchanged on a file stream (media
    ingestion pipelines decode at the streaming edge), and the streamed
    features equal the batch features."""
    import feature_factory_spark as ff
    from feature_factory_spark.operators import (
        audio_schema, constant_wav, image_decoder, image_schema,
        solid_png, wav_decoder,
    )

    rows = [
        (i, solid_png(i % 5 + 1, i % 3 + 1, (i * 37) % 256),
         constant_wav(40 + i, (i % 10) / 10.0))
        for i in range(30)
    ]
    batch = spark.createDataFrame(rows, "id bigint, img binary, wav binary")
    src = str(tmp_path / "media_src")
    batch.write.parquet(src)

    def decoded(df):
        out = ff.BinaryFeatureExtractor(
            "img", decoder=image_decoder, feature_schema=image_schema()
        ).transform(df)
        out = ff.BinaryFeatureExtractor(
            "wav", decoder=wav_decoder, feature_schema=audio_schema()
        ).transform(out)
        return out.select("id", "img_width", "img_mean", "wav_n_frames", "wav_rms")

    expected = sorted(map(tuple, decoded(batch).collect()))

    stream = read_stream(spark, src, batch.schema)
    q = (
        decoded(stream)
        .writeStream.format("memory")
        .queryName("media_decoded")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM media_decoded").collect()))
    assert got == expected


def test_crawl_curation_ops_stream(spark, tmp_path):
    # the r6 curation projections (HTML extraction, encoding repair,
    # quantization) are stateless narrow maps, so a crawl-curation
    # stage runs unchanged as a structured stream: stream == batch
    import feature_factory_spark as ff

    rows = [
        (i,
         "<html><body><p>Line one &amp; two.</p>"
         "<a href='/x'>l</a></body></html>",
         [float(j + i) for j in range(4)])
        for i in range(30)
    ]
    batch = spark.createDataFrame(
        rows, "doc_id bigint, page string, embedding array<double>"
    )
    src = str(tmp_path / "crawl_src")
    batch.write.parquet(src)
    stream = read_stream(spark, src, batch.schema)
    assert stream.isStreaming

    def curate(df):
        out = ff.HtmlTextExtractor(["page"]).transform(df)
        out = ff.EncodingFixer(["page_html_text"]).transform(out)
        return ff.EmbeddingQuantizer("embedding").transform(out).select(
            "doc_id", "page_html_text", "page_link_count",
            "embedding_q8", "embedding_q8_scale",
        )

    q = (
        curate(stream).writeStream.format("memory")
        .queryName("curated")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["page_html_text"], r["page_link_count"],
                      tuple(r["embedding_q8"]), r["embedding_q8_scale"])
        for r in spark.sql("SELECT * FROM curated").collect()
    }
    want = {
        r["doc_id"]: (r["page_html_text"], r["page_link_count"],
                      tuple(r["embedding_q8"]), r["embedding_q8_scale"])
        for r in curate(batch).collect()
    }
    assert got == want
    assert got[0][0] == "Line one & two.\nl"


def test_r7_curation_ops_stream(spark, tmp_path):
    # r7's stateless curation projections (URL canonicalization, C4
    # line/page cleaning) are narrow maps too: stream == batch
    import feature_factory_spark as ff

    rows = [
        (i,
         f"HTTPS://User@Example.ORG:443/p{i % 5}/?utm_source=x&a={i % 3}#f",
         "A full sentence with enough words here.\nshort.\n"
         + ("lorem ipsum hides here." if i % 4 == 0
            else "Another proper closing sentence arrives now!")
         + "\nMore words make more sentences appear, truly.\n"
           "Sentence four is also quite real.\n"
           "Sentence five closes the page properly.")
        for i in range(24)
    ]
    batch = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
    src = str(tmp_path / "r7_src")
    batch.write.parquet(src)
    stream = read_stream(spark, src, batch.schema)

    def curate(df):
        out = ff.UrlCanonicalizer(["url"]).transform(df)
        return ff.C4Filter("text").transform(out).select(
            "doc_id", "url_canonical", "text_c4", "text_c4_keep"
        )

    q = (
        curate(stream).writeStream.format("memory")
        .queryName("r7curated")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: (r["url_canonical"], r["text_c4"], r["text_c4_keep"])
           for r in spark.sql("SELECT * FROM r7curated").collect()}
    want = {r["doc_id"]: (r["url_canonical"], r["text_c4"], r["text_c4_keep"])
            for r in curate(batch).collect()}
    assert got == want
    assert got[1][0] == "https://example.org/p1?a=1"
    assert got[0][2] is False and got[1][2] is True


def test_r8_markdown_extractor_stream(spark, tmp_path):
    # MarkdownTextExtractor is a stateless regexp chain: stream == batch
    import feature_factory_spark as ff

    rows = [
        (i,
         f"# Doc {i}\n\nA [link](https://x.org/{i}) and "
         f"![img](p{i}.png).\n\n```\ncode {i}\n```\n\n- item\n\n"
         f"Body text number {i} with *emphasis* here.")
        for i in range(12)
    ]
    batch = spark.createDataFrame(rows, "doc_id bigint, md string")
    src = str(tmp_path / "r8md_src")
    batch.write.parquet(src)
    stream = read_stream(spark, src, batch.schema)

    def extract(df):
        return ff.MarkdownTextExtractor(["md"]).transform(df).select(
            "doc_id", "md_md_text", "md_code_blocks", "md_link_count",
            "md_image_count",
        )

    q = (
        extract(stream).writeStream.format("memory")
        .queryName("r8md")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM r8md").collect()}
    want = {tuple(r) for r in extract(batch).collect()}
    assert got == want and len(got) == 12


def test_r8_hashers_and_code_ops_stream(spark, tmp_path):
    """r8 batch==stream duality: the perceptual hashers (narrow Arrow
    maps), the code-curation projections, and PerplexityBucketer's
    broadcast-join transform (fit on batch, serve on stream) all run
    unchanged on a file stream and match their batch outputs."""
    import feature_factory_spark as ff
    from feature_factory_spark.operators.audiohash import pattern_wav
    from feature_factory_spark.operators.imagehash import pattern_png
    from feature_factory_spark.operators.videohash import pattern_mp4
    from feature_factory_spark.streaming import read_stream

    rows = [
        (i,
         pattern_png(0x0F0F0F0F0F0F0F0F ^ i),
         pattern_wav(0x00FF00FF00FF00FF ^ i),
         pattern_mp4(0xAAAA5555AAAA5555 ^ i),
         ("# SPDX-License-Identifier: MIT\ncode\n" if i % 2 == 0
          else "#!/usr/bin/env python3\nprint()\n"),
         "m.py" if i % 3 == 0 else "run",
         float(i))
        for i in range(12)
    ]
    schema = ("doc_id bigint, img binary, wav binary, vid binary, "
              "body string, path string, s double")
    batch = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "r8_src")
    batch.write.parquet(src)
    stream = read_stream(spark, src, batch.schema)

    bucketer = ff.PerplexityBucketer("s").fit(batch)  # fit on batch

    def curate(df):
        out = ff.ImageHasher("img").transform(df)
        out = ff.AudioHasher("wav").transform(out)
        out = ff.VideoHasher("vid").transform(out)
        out = ff.LicenseDetector("body").transform(out)
        out = ff.CodeLanguageIdentifier("path", text_col="body").transform(out)
        out = bucketer.transform(out)  # broadcast-join CASE, stream-safe
        return out.select(
            "doc_id", "img_dhash", "wav_afp", "vid_vhash",
            "body_license", "code_lang", "s_bucket",
        )

    q = (
        curate(stream).writeStream.format("memory")
        .queryName("r8curated")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: tuple(r)[1:]
           for r in spark.sql("SELECT * FROM r8curated").collect()}
    want = {r["doc_id"]: tuple(r)[1:] for r in curate(batch).collect()}
    assert got == want
    assert got[0][3] == "MIT" and got[1][4] == "python"
    assert {v[5] for v in got.values()} == {"head", "middle", "tail"}


def test_r10_stateless_gates_on_stream(spark, tmp_path):
    """The r10 narrow gates (within-doc self-dedup, meta-robots, the
    robots.txt rule join with PRE-FITTED frame state) are pure
    projections/joins, so the identical expressions run on a stream —
    the batch==stream contract the streaming module promises."""
    import pyspark.sql.types as T

    from feature_factory_spark.operators.web import RobotsTxtFilter
    from feature_factory_spark.streaming import (
        apply_pipeline_to_stream, read_stream,
    )

    rows = [
        (1, "a\nb\na", "http://a.com/private/x",
         '<html><head><meta name="robots" content="noindex"></head>'
         "<body>x</body></html>"),
        (2, "x\ny", "http://a.com/ok", "<html><body>y</body></html>"),
    ]
    schema = ("doc_id bigint, text string, url string, page string")
    batch = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "gate_src")
    batch.write.parquet(src)
    stream = read_stream(spark, src, batch.schema)

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/")],
        "domain string, robots_txt string",
    )
    pipe = ff.make_pipeline(
        ("self_dedup", ff.WithinDocDeduplicator("text")),
        ("meta_robots", ff.MetaRobotsFilter("page")),
        ("robots_txt",
         RobotsTxtFilter("url").fit_robots(robots)),
    )
    out = apply_pipeline_to_stream(pipe, stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("gates_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.sql(
        "SELECT * FROM gates_out").collect()}
    # identical to the batch pipeline's output
    want = {r["doc_id"]: r for r in pipe.transform(batch).collect()}
    assert got.keys() == want.keys()
    for k in got:
        assert got[k]["text"] == want[k]["text"]
        assert (got[k]["page_robots_blocked"]
                == want[k]["page_robots_blocked"])
        assert (got[k]["url_robots_blocked"]
                == want[k]["url_robots_blocked"])
    assert got[1]["text"] == "a\nb"
    assert got[1]["page_robots_blocked"] and got[1]["url_robots_blocked"]
    assert not got[2]["page_robots_blocked"]


def test_r11_scorers_stream_equals_batch(spark, tmp_path):
    # r11 scoring ops are stream-safe by construction (stateless
    # transforms over broadcast scalar state): hashed TF-IDF vectors,
    # DSIR scores, and the pair-cosine gate must produce identical
    # rows on a stream and on the batch
    from feature_factory_spark.streaming import (
        apply_pipeline_to_stream, read_stream,
    )

    rows = [
        (1, "clean prose about science", [1.0, 0.0], [1.0, 0.0]),
        (2, "buy now free casino", [1.0, 0.0], [0.0, 1.0]),
        (3, "science prose again", [0.6, 0.8], [0.6, 0.8]),
    ]
    schema = ("doc_id bigint, text string, "
              "img array<double>, txt array<double>")
    batch = spark.createDataFrame(rows, schema)
    target = spark.createDataFrame(
        [(10, "science prose citations measured careful")],
        "doc_id bigint, text string",
    )
    vec = ff.HashedTfIdfVectorizer("text", n_features=32).fit(batch)
    dsir = ff.DSIRWeighter("text", id_col="doc_id", n_buckets=64)
    dsir.fit_target(target).fit(batch)
    pipe = ff.make_pipeline(
        ("tfidf", vec),
        ("dsir", dsir),
        ("pair_gate", ff.ImageTextPairScorer("img", "txt")),
    )
    src = str(tmp_path / "r11_src")
    batch.write.parquet(src)
    stream = read_stream(spark, src, batch.schema)
    out = apply_pipeline_to_stream(pipe, stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("r11_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM r11_out").collect())
    )
    want = sorted(map(tuple, pipe.transform(batch).collect()))
    assert got == want
