"""WARC source: pure-stdlib parser/encoder round-trips and the
binaryFile -> mapInPandas explosion (sources/warc.py)."""

import gzip

import pytest

from pyspark.sql import functions as F

from feature_factory_spark.sources import (
    make_http_response, make_warc, parse_warc, read_warc,
)
from feature_factory_spark.sources.warc import gunzip_members


def _records():
    return [
        {"payload": make_http_response(b"<html><body>page one</body></html>"),
         "target_uri": "http://a.example/one", "warc_type": "response",
         "content_type": "application/http; msgtype=response"},
        {"payload": b"warcinfo text", "warc_type": "warcinfo"},
        {"payload": make_http_response(b"{}", status=404,
                                       content_type="application/json"),
         "target_uri": "http://b.example/two", "warc_type": "response"},
    ]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        data = make_warc(_records(), gzip_per_record=gz)
        recs = list(parse_warc(data))
        assert [r["warc_type"] for r in recs] == [
            "response", "warcinfo", "response"
        ]
        assert recs[0]["target_uri"] == "http://a.example/one"
        assert recs[0]["http_status"] == 200
        assert recs[0]["http_content_type"] == "text/html"
        assert recs[0]["payload"] == b"<html><body>page one</body></html>"
        assert recs[1]["http_status"] is None  # non-response: unsplit
        assert recs[1]["payload"] == b"warcinfo text"
        assert recs[2]["http_status"] == 404
        assert recs[2]["http_content_type"] == "application/json"


def test_parse_http_off_keeps_envelope():
    data = make_warc(_records())
    recs = list(parse_warc(data, parse_http=False))
    assert recs[0]["payload"].startswith(b"HTTP/1.1 200")
    assert recs[0]["http_status"] is None


def test_truncated_archive_yields_intact_prefix():
    data = make_warc(_records())
    # cut inside the LAST record's payload: first two still parse
    recs = list(parse_warc(data[:-10]))
    assert len(recs) == 2
    # garbage tail after a clean record boundary: same contract
    assert len(list(parse_warc(make_warc(_records()[:1]) + b"junk"))) == 1
    # not a WARC at all
    assert list(parse_warc(b"PK\x03\x04 definitely a zip")) == []


def test_gunzip_members_concatenated():
    a, b = gzip.compress(b"hello "), gzip.compress(b"world")
    assert gunzip_members(a + b) == b"hello world"
    assert gunzip_members(b"plain") == b"plain"


def test_read_warc_explodes_files(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(make_warc(_records()))
    (d / "b.warc.gz").write_bytes(make_warc(_records()[:1], gzip_per_record=True))
    (d / "junk.warc").write_bytes(b"not a warc")
    out = read_warc(spark, str(d))
    rows = out.collect()
    assert len(rows) == 4  # 3 + 1 + 0
    by_file = {r["source_file"].rsplit("/", 1)[-1] for r in rows}
    assert by_file == {"a.warc", "b.warc.gz"}
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert all(r["http_status"] in (200, 404) for r in resp)
    assert all(r["payload_length"] == len(r["payload"]) for r in rows)


def test_read_warc_plan_is_narrow(spark, tmp_path):
    p = tmp_path / "one.warc"
    p.write_bytes(make_warc(_records()))
    out = read_warc(spark, str(p))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_read_warc_feeds_html_extractor(spark, tmp_path):
    import feature_factory_spark as ff

    p = tmp_path / "one.warc"
    p.write_bytes(make_warc(_records()))
    pages = (
        read_warc(spark, str(p))
        .where(F.col("http_status") == 200)
        .select("target_uri", F.col("payload").cast("string").alias("page"))
    )
    out = ff.HtmlTextExtractor(["page"]).transform(pages).collect()
    assert out[0]["page_html_text"] == "page one"


def test_read_dispatches_warc_extension(spark, tmp_path):
    from feature_factory_spark.sources import read

    p1 = tmp_path / "crawl.warc"
    p1.write_bytes(make_warc(_records()))
    p2 = tmp_path / "crawl2.warc.gz"
    p2.write_bytes(make_warc(_records()[:2], gzip_per_record=True))
    assert read(spark, str(p1)).count() == 3
    assert read(spark, str(p2)).count() == 2


def test_corrupted_gzip_member_keeps_intact_prefix():
    data = bytearray(make_warc(_records(), gzip_per_record=True))
    # flip a byte inside the LAST member's deflate stream
    data[-8] ^= 0xFF
    recs = list(parse_warc(bytes(data)))
    assert 1 <= len(recs) <= 2  # intact prefix only, no zlib.error
    assert recs[0]["http_status"] == 200


def test_streaming_drain_keeps_buffer_bounded():
    # records arrive member-by-member; after parsing, consumed bytes
    # must be dropped from the working buffer (regression guard for the
    # whole-archive materialization the first implementation did)
    from feature_factory_spark.sources.warc import _member_chunks

    data = make_warc(_records() * 20, gzip_per_record=True)
    chunks = list(_member_chunks(data))
    assert len(chunks) == 60  # one member per record
    assert len(list(parse_warc(data))) == 60


# --- WET (pre-extracted text) variant (r8) ----------------------------

def _wet_docs():
    return [
        {"text": "First extracted page text with several words.",
         "target_uri": "https://a.example.org/1"},
        {"text": "Zweite Seite: schöner Text mit Umlauten äöü.",
         "target_uri": "https://b.example.org/2"},
        {"text": "第三页的中文文本内容。",
         "target_uri": "https://c.example.org/3"},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_read_wet_roundtrip(spark, tmp_path, gz):
    from feature_factory_spark.sources import make_wet

    d = tmp_path / "wet"
    d.mkdir()
    name = "a.warc.wet.gz" if gz else "a.warc.wet"
    (d / name).write_bytes(make_wet(_wet_docs(), gzip_per_record=gz))
    out = read_warc(spark, str(d), kind="wet")
    rows = {r["target_uri"]: r for r in out.collect()}
    # the warcinfo record is filtered out; text round-trips incl. UTF-8
    assert len(rows) == 3
    for i, doc in enumerate(_wet_docs()):
        r = rows[doc["target_uri"]]
        assert r["text"] == doc["text"]
        assert r["content_length"] == len(doc["text"].encode("utf-8"))
        assert r["record_id"] == f"<urn:uuid:wet-{i}>"
    assert set(out.columns) == {
        "source_file", "record_id", "target_uri", "warc_date", "text",
        "content_length",
    }


def test_read_wet_is_narrow_and_pruned(spark, tmp_path):
    from feature_factory_spark.sources import make_wet

    d = tmp_path / "wet2"
    d.mkdir()
    (d / "x.warc.wet").write_bytes(make_wet(_wet_docs()))
    out = read_warc(spark, str(d), kind="wet")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_wet_feeds_curation_pipeline(spark, tmp_path):
    # the WET entry point composes with the standard curation chain
    import feature_factory_spark as ff
    from feature_factory_spark.sources import make_wet

    d = tmp_path / "wet3"
    d.mkdir()
    docs = _wet_docs() + [_wet_docs()[0]]  # a duplicate page
    (d / "x.warc.wet").write_bytes(make_wet(docs))
    wet = read_warc(spark, str(d), kind="wet")
    deduped = ff.ExactDeduplicator(["text"], "record_id").transform(wet)
    assert deduped.count() == 3


def test_read_warc_kind_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="kind"):
        read_warc(spark, str(tmp_path), kind="wat")


# --- WAT ingestion (r8): the CommonCrawl metadata sidecar -------------

def test_read_wat_round_trip(spark, tmp_path):
    from feature_factory_spark.sources.warc import make_wat

    docs = [
        {"target_uri": "https://a.org/x", "title": "Alpha Page",
         "links": ["https://b.org/1", "https://b.org/2"]},
        {"target_uri": "https://b.org/y", "title": "Beta",
         "links": []},
        {"target_uri": "https://c.org/z"},  # defaults
    ]
    d = tmp_path / "wat"
    d.mkdir()
    (d / "part0.wat.gz").write_bytes(make_wat(docs, gzip_per_record=True))
    from feature_factory_spark.sources import read_warc

    out = read_warc(spark, str(d), kind="wat")
    rows = {r["target_uri"]: r for r in out.collect()}
    # the warcinfo record is filtered out; one row per metadata record
    assert len(rows) == 3
    assert rows["https://a.org/x"]["title"] == "Alpha Page"
    assert rows["https://a.org/x"]["n_links"] == 2
    assert rows["https://b.org/y"]["n_links"] == 0
    assert rows["https://c.org/z"]["title"] == "Page 2"
    # the raw envelope survives for downstream from_json schemas
    import json

    env = json.loads(rows["https://a.org/x"]["metadata_json"])
    assert env["Envelope"]["WARC-Header-Metadata"]["WARC-Type"] == "response"
    # narrow plan: no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_read_warc_kind_validation(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="kind"):
        from feature_factory_spark.sources import read_warc

        read_warc(spark, str(tmp_path), kind="nope")


def test_edges_from_wat_feed_pagerank(spark, tmp_path):
    from feature_factory_spark.functions.graph import pagerank
    from feature_factory_spark.sources.warc import (
        edges_from_wat, make_wat,
    )

    docs = [
        {"target_uri": "https://a.org/x",
         "links": ["https://b.org/1", "https://c.org/2",
                   "https://a.org/self", "not a url"]},
        {"target_uri": "https://b.org/y", "links": ["https://c.org/3"]},
        {"target_uri": "https://c.org/z", "links": ["https://a.org/4"]},
    ]
    d = tmp_path / "watpr"
    d.mkdir()
    (d / "f.wat.gz").write_bytes(make_wat(docs, gzip_per_record=True))
    from feature_factory_spark.sources import read_warc

    edges = edges_from_wat(read_warc(spark, str(d), kind="wat"))
    got = sorted((r["src_host"], r["dst_host"]) for r in edges.collect())
    # self-loop and unparseable URLs dropped
    assert got == [("a.org", "b.org"), ("a.org", "c.org"),
                   ("b.org", "c.org"), ("c.org", "a.org")]
    # the classic triangle+backlink graph: published d=0.85 ranks
    r = {x["node"]: x["rank"]
         for x in pagerank(edges, "src_host", "dst_host",
                           iterations=25).collect()}
    assert abs(r["a.org"] - 0.3877) < 2e-3


def test_x_robots_tag_surfaced(spark, tmp_path):
    from feature_factory_spark.sources.warc import (
        make_http_response, make_warc, parse_warc,
    )

    data = make_warc([
        {"payload": make_http_response(b"<html>a</html>",
                                       x_robots="noindex, nofollow")},
        {"payload": make_http_response(b"<html>b</html>")},
    ])
    recs = [r for r in parse_warc(data) if r["warc_type"] == "response"]
    assert recs[0]["http_x_robots"] == "noindex, nofollow"
    assert recs[1]["http_x_robots"] is None

    # the distributed read carries the column too, filterable at scan
    import gzip as _gz
    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(_gz.compress(data))
    from feature_factory_spark.sources import read_warc

    df = read_warc(spark, str(tmp_path))
    assert "http_x_robots" in df.columns
    kept = df.where(
        (F.col("warc_type") == "response")
        & ~F.coalesce(
            F.arrays_overlap(
                F.transform(
                    F.split(F.lower(F.col("http_x_robots")), ","),
                    lambda x: F.trim(x),
                ),
                F.array(F.lit("noindex"), F.lit("none")),
            ),
            F.lit(False),
        )
    )
    assert kept.count() == 1
