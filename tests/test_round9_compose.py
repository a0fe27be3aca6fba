"""r9 composition checks: compact_index on the ANN (IVF) layout,
read_media('pdf_text') end-to-end, and the r9 stateless gates running
unchanged on streams (batch expr == stream expr)."""

import os

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.operators.pdfcodec import make_pdf


def _vecs(spark, n=64, dim=8):
    rows = [
        (i, [float(((i * 7 + j * 3) % 17) - 8) for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_compact_index_on_ivf_layout(spark, tmp_path):
    # IVF index = corpus/ (partitioned by cluster) + centroids/, NO
    # meta pin: compact_index must discover the layout and preserve
    # probe results exactly
    emb = _vecs(spark)
    op = ff.IVFCosineTopK("embedding", "vec_id", k=2, n_centroids=4,
                          n_probe=4)
    op.fit_index(emb)
    src = str(tmp_path / "ivf")
    op.write_index(emb, src)
    # a second append-style write is not part of the IVF contract;
    # compact the single snapshot and compare probes
    dest = str(tmp_path / "ivf_c")
    written = ff.compact_index(spark, src, dest)
    assert set(written) == {"centroids", "corpus"}
    queries = emb.where(F.col("vec_id") < 3)
    a = {(r["query_id"], r["neighbor_id"]) for r in
         op.search_index(spark, src, queries).collect()}
    b = {(r["query_id"], r["neighbor_id"]) for r in
         op.search_index(spark, dest, queries).collect()}
    assert a == b and a
    # cluster partition dirs preserved
    assert any(d.startswith("cluster=")
               for d in os.listdir(os.path.join(dest, "corpus")))
    assert [v["op"] for v in ff.index_versions(spark, dest)] == ["compact"]


def test_read_media_pdf_text(spark, tmp_path):
    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(
        make_pdf(2, page_texts=["alpha page", "beta page"], compress=True)
    )
    (d / "b.pdf").write_bytes(make_pdf(1))          # no content streams
    (d / "c.pdf").write_bytes(b"not a pdf at all")  # undecodable
    from feature_factory_spark.sources import read_media

    out = read_media(spark, str(d), media="pdf_text")
    got = {os.path.basename(r["path"]): r for r in out.collect()}
    assert got["a.pdf"]["media_text"] == "alpha page\nbeta page"
    assert got["a.pdf"]["media_n_pages"] == 2       # probe features too
    assert got["b.pdf"]["media_text"] == ""
    assert got["c.pdf"]["media_text"] is None       # lenient NULLs


def _stream_vs_batch(spark, tmp_path, df, transform, name):
    from feature_factory_spark.streaming import read_stream

    src = str(tmp_path / f"{name}_src")
    df.write.parquet(src)
    batch = {tuple(r) for r in transform(spark.read.parquet(src)).collect()}
    stream = transform(read_stream(spark, src, df.schema))
    assert stream.isStreaming
    out = str(tmp_path / f"{name}_out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"{name}_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == batch and got


def test_main_content_batch_equals_stream(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, '<nav><a href="/">Home</a></nav><p>It is the case that '
             'this page has real prose for the gate.</p>'),
         (2, "<p>short</p>")],
        "doc_id bigint, page string",
    )
    op = ff.MainContentExtractor(["page"])
    _stream_vs_batch(
        spark, tmp_path, df,
        lambda d: op.transform(d).select(
            "doc_id", "page_main_text", "page_n_main_blocks"
        ),
        "mc",
    )


def test_badwords_batch_equals_stream(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "clean text here"), (2, "contains badword now")],
        "doc_id bigint, text string",
    )
    op = ff.BadWordsFilter("text", ["badword"])
    _stream_vs_batch(
        spark, tmp_path, df,
        lambda d: op.transform(d).select(
            "doc_id", "text_badword_count", "text_badwords_keep"
        ),
        "bw",
    )


def test_audio_quality_batch_equals_stream(spark, tmp_path):
    import numpy as np

    from feature_factory_spark.operators.audiocodec import encode_wav

    wav = encode_wav(np.full(6000, 0.5), 8000, 1, 16)
    df = spark.createDataFrame(
        [(1, wav), (2, b"junk")], "doc_id bigint, audio binary"
    )
    op = ff.AudioQualityFilter("audio")
    _stream_vs_batch(
        spark, tmp_path, df,
        lambda d: op.transform(d).select("doc_id", "audio_keep"),
        "aq",
    )
