"""PDF structure probe (operators/pdfcodec.py): fixture round-trips,
leniency, and the read_media dispatch."""

import pytest

from feature_factory_spark.operators.pdfcodec import (
    make_pdf,
    pdf_decoder,
    probe_pdf,
)


@pytest.mark.parametrize("n,ver,enc", [
    (1, "1.4", False), (5, "1.7", True), (9, "2.0", False),
])
def test_roundtrip(n, ver, enc):
    d = probe_pdf(make_pdf(n, version=ver, encrypted=enc))
    assert d["format"] == "pdf" and d["version"] == ver
    assert d["n_pages"] == n == d["declared_pages"]
    assert d["n_objects"] == n + 2
    assert d["encrypted"] == int(enc)
    assert d["has_eof"] == 1 and d["has_xref"] == 1


def test_truncated_download():
    d = probe_pdf(make_pdf(4)[:-30])
    assert d["has_eof"] == 0
    assert d["n_pages"] == 4  # counts survive a cut tail


def test_page_vs_pages_tree_not_confused():
    # the /Type /Pages tree node must not count as a page
    b = make_pdf(2)
    assert probe_pdf(b)["n_pages"] == 2
    assert b.count(b"/Type /Pages") == 1


def test_leniency_and_errors():
    with pytest.raises(ValueError):
        probe_pdf(b"not a pdf at all")
    assert pdf_decoder(b"junk") == {}
    assert pdf_decoder(b"") == {}


def test_read_media_pdf(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.pdf").write_bytes(make_pdf(3))
    (d / "b.pdf").write_bytes(make_pdf(7, encrypted=True))
    (d / "c.pdf").write_bytes(b"corrupt bytes")
    from feature_factory_spark.sources import read_media

    out = read_media(spark, str(d), media="pdf")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert rows["a.pdf"]["media_n_pages"] == 3
    assert rows["b.pdf"]["media_encrypted"] == 1
    assert rows["c.pdf"]["media_format"] is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
