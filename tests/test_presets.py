"""Preset pipelines (r10): the published cleaning stacks as one-call
recipes, run end-to-end on real testdata to pin that every composed
step actually accepts its upstream's output."""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from feature_factory_spark.sources import read

    return read(spark, f"{SF_DIR}/documents.parquet")


def test_c4_pipeline_end_to_end(spark):
    # sentence-shaped pages (the testdata documents carry no terminal
    # punctuation, so C4's line rule correctly drops them all); doc 0/1
    # are exact twins, doc 3 contains a blocked word, doc 4 is short
    line = "this looks like a real english sentence with many words."
    rows = (
        [(0, "\n".join([line] * 6)), (1, "\n".join([line] * 6))]
        + [(2, "\n".join(
            f"sentence number {i} reads fine and ends with a period."
            for i in range(6)))]
        + [(3, "\n".join([line] * 5 + [line + " zzzz_blocked word."]))]
        + [(4, "too short.")]
    )
    pages = spark.createDataFrame(rows, "doc_id bigint, text string")
    pipe = ff.presets.c4_pipeline(
        "text", "doc_id", badwords=["zzzz_blocked"], redact_pii=True
    )
    out = pipe.fit(pages)
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # 4 fails min_sentences, 3 fails badwords, 0/1 exact-dedup to one
    assert kept == [0, 2]


def test_gopher_pipeline_end_to_end(spark, docs):
    out = ff.presets.gopher_pipeline("text", "doc_id").fit(docs)
    n = out.count()
    assert 0 < n <= docs.count()
    # the word-count gate held
    words = out.select(
        F.size(F.split(F.trim("text"), r"\s+")).alias("w")
    ).agg(F.min("w")).collect()[0][0]
    assert words >= 50


def test_dedup_cascade_idempotent(spark, docs):
    pipe = ff.presets.dedup_cascade("text", "doc_id")
    once = pipe.fit(docs)
    n1 = once.count()
    # a second pass over an already-deduped corpus drops nothing
    again = ff.presets.dedup_cascade("text", "doc_id").fit(once)
    assert again.count() == n1


def test_web_extraction_pipeline(spark):
    pages = spark.createDataFrame(
        [
            (1, "http://a.example.com/x?b=2&a=1",
             "<html><body><p>real content "
             + "in the body of the page with more of the words " * 5
             + "</p><a href='/'>nav</a></body></html>"),
            (2, "http://a.example.com/x?a=1&b=2",  # same after canon
             "<html><body><p>dup</p></body></html>"),
            (3, "http://bad.example.org/y",
             "<html><body><p>blocked "
             + "in the body of the page with more of the words " * 5
             + "</p></body></html>"),
        ],
        "doc_id bigint, url string, page string",
    )
    pipe = ff.presets.web_extraction_pipeline(
        "page", "url", "doc_id", blocked_domains=["bad.example.org"]
    )
    out = pipe.fit(pages)
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]  # dup + blocked dropped
    assert "real content" in rows[0]["page_main_text"]


def test_web_extraction_with_x_robots_header(spark):
    # r11: the header leg of the opt-out triad wired into the preset
    pages = spark.createDataFrame(
        [
            (1, "http://a.example.com/x", "noindex",
             "<html><body><p>opted out</p></body></html>"),
            (2, "http://a.example.com/y", "index",
             "<html><body><p>kept page body</p></body></html>"),
            (3, "http://a.example.com/z", None,
             "<html><body><p>no header page</p></body></html>"),
        ],
        "doc_id bigint, url string, http_x_robots string, page string",
    )
    pipe = ff.presets.web_extraction_pipeline(
        "page", "url", "doc_id", x_robots_col="http_x_robots"
    )
    out = pipe.fit(pages)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]


def test_presets_save_load_state(spark, docs, tmp_path):
    pipe = ff.presets.gopher_pipeline("text", "doc_id")
    out1 = pipe.fit(docs)
    path = str(tmp_path / "preset_state")
    pipe.save_state(path)
    fresh = ff.presets.gopher_pipeline("text", "doc_id").load_state(
        path, spark
    )
    out2 = fresh.transform(docs)
    assert sorted(r["doc_id"] for r in out2.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in out1.select("doc_id").collect())


def test_fineweb_pipeline_end_to_end(spark):
    # english + french docs with quality-passing shape; the lang gate
    # keeps only the english ones before quality/dedup/PII
    en = ("the quick brown fox jumps over the lazy dog and then walks "
          "through the quiet village while people watch from windows ") * 3
    fr = ("le renard brun rapide saute par dessus le chien paresseux et "
          "traverse ensuite le village tranquille sous le regard des gens ") * 3
    rows = ([(i, en + f"unique tail {i}") for i in range(4)]
            + [(100 + i, fr + f"queue unique {i}") for i in range(4)])
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pipe = ff.presets.fineweb_pipeline(spark, "text", "doc_id", lang="en")
    out = pipe.fit(df)
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert kept and all(i < 100 for i in kept)


def test_web_extraction_with_robots_df(spark):
    robots = spark.createDataFrame(
        [("a.example.com", "User-agent: *\nDisallow: /private/")],
        "domain string, robots_txt string",
    )
    body = ("<html><body><p>real content "
            + "in the body of the page with more of the words " * 5
            + "</p></body></html>")
    pages = spark.createDataFrame(
        [(1, "http://a.example.com/ok/1", body),
         (2, "http://a.example.com/private/2", body)],
        "doc_id bigint, url string, page string",
    )
    pipe = ff.presets.web_extraction_pipeline(
        "page", "url", "doc_id", robots_df=robots
    )
    out = pipe.fit(pages)
    assert [r["doc_id"] for r in out.collect()] == [1]
