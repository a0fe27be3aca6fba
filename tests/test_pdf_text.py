"""PdfTextExtractor surface (r9 brief item 1): FlateDecode +
content-stream text-operator parsing on the pdfcodec object walker —
closed-form make_pdf fixtures with known embedded text, lenient
truncation branches, and the Spark BinaryFeatureExtractor seam."""

import zlib

import pytest

import feature_factory_spark as ff
from feature_factory_spark.operators.pdfcodec import (
    _content_text,
    extract_pdf_text,
    make_pdf,
    pdf_text_decoder,
    pdf_text_schema,
    probe_pdf,
)


def test_roundtrip_tj_and_TJ_plain_and_compressed():
    texts = [
        "Doc 7 page 0: alpha (beta) gamma",
        "Doc 7 page 1: alpha (beta) gamma",
        "back\\slash and (nested (parens))",
    ]
    for compress in (False, True):
        b = make_pdf(3, page_texts=texts, compress=compress)
        r = extract_pdf_text(b)
        assert r["text"] == "\n".join(texts)
        assert r["n_pages_with_text"] == 3
        assert r["n_text_ops"] == 3
        assert r["n_chars"] == len(r["text"])
        # structure probe still sees the page tree; objects now 2+2n
        p = probe_pdf(b)
        assert p["n_pages"] == 3 and p["n_objects"] == 8


def test_pages_without_content_yield_empty():
    r = extract_pdf_text(make_pdf(2))
    assert r == {"text": "", "n_pages_with_text": 0,
                 "n_text_ops": 0, "n_chars": 0}


def test_truncated_xref_keeps_text():
    b = make_pdf(2, page_texts=["hello world", "second page"],
                 compress=True)[:-30]
    assert probe_pdf(b)["has_eof"] == 0
    assert extract_pdf_text(b)["text"] == "hello world\nsecond page"


def test_truncation_into_content_stream_drops_only_that_page():
    full = make_pdf(2, page_texts=["hello world", "second page"])
    # page 1 is odd -> TJ split at char 5: cut inside its second segment
    cut = full[: full.rfind(b"d page")]
    r = extract_pdf_text(cut)
    # the damaged literal string runs to end-of-data; page 0 is intact
    assert r["text"].startswith("hello world")
    assert "d page" not in r["text"]


def test_truncation_into_compressed_stream_skips_cleanly():
    full = make_pdf(1, page_texts=["only page here"], compress=True)
    data_start = full.find(b"stream\n") + len(b"stream\n")
    cut = full[: data_start + 4]  # 4 bytes of deflate: undecodable
    r = extract_pdf_text(cut)
    assert r == {"text": "", "n_pages_with_text": 0,
                 "n_text_ops": 0, "n_chars": 0}


def test_unknown_filter_skipped_not_fatal():
    b = make_pdf(1, page_texts=["visible"], compress=True)
    b = b.replace(b"/FlateDecode", b"/LZWDecode\x20\x20")
    assert extract_pdf_text(b)["text"] == ""


def test_non_pdf_raises_and_decoder_is_lenient():
    with pytest.raises(ValueError):
        extract_pdf_text(b"GIF89a not a pdf")
    assert pdf_text_decoder(b"GIF89a not a pdf") == {}
    assert pdf_text_decoder(make_pdf(1, page_texts=["x"]))["text"] == "x"


def test_content_text_operator_semantics():
    # quote op: newline + show; Td: line break; TJ ignores kerning
    data = (b"BT (line one) Tj 0 -14 Td (line two) Tj "
            b"(line three) ' [(ker) -120 (ned)] TJ ET")
    lines, shows = _content_text(data)
    assert lines == ["line one", "line two", "line threekerned"]
    assert shows == 4


def test_content_text_hex_strings_and_escapes():
    data = b"BT <48656C6C 6F> Tj ET"
    assert _content_text(data) == (["Hello"], 1)
    # octal escape + odd hex digit padding
    data = b"BT (\\101\\102) Tj T* <41> Tj ET"
    lines, shows = _content_text(data)
    assert lines == ["AB", "A"]
    # comments and names ignored; text outside BT ignored
    assert _content_text(b"(nope) Tj BT % c\n /F1 (yes) Tj ET") == (
        ["yes"], 1)


def test_content_stream_length_indirect_falls_back_to_endstream():
    b = make_pdf(1, page_texts=["fallback text"])
    # make the /Length an (unresolvable) indirect reference: the walker
    # must fall back to scanning for endstream
    b = b.replace(b"/Length 42 ", b"/Length 9 0 R ", 1)
    if b"/Length 9 0 R" not in b:  # length differs; patch generically
        import re
        b = re.sub(rb"/Length \d+ ", b"/Length 9 0 R ", b, count=1)
    assert extract_pdf_text(b)["text"] == "fallback text"


def test_contents_array_of_streams():
    # hand-build a page whose /Contents is an ARRAY of two streams
    s1 = b"BT (part one ) Tj ET"
    s2 = b"BT (part two) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>",
        b"<< /Length %d >>\nstream\n" % len(s1) + s1 + b"\nendstream",
        b"<< /Length %d >>\nstream\n" % len(s2) + s2 + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, body in enumerate(objs, start=1):
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    out += b"%%EOF\n"
    r = extract_pdf_text(bytes(out))
    assert r["text"] == "part one \npart two"
    assert r["n_pages_with_text"] == 1 and r["n_text_ops"] == 2


def test_make_pdf_page_texts_validation():
    with pytest.raises(ValueError, match="one entry per page"):
        make_pdf(2, page_texts=["only one"])


def test_spark_seam_binary_feature_extractor(spark):
    rows = [(i,) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint")

    def synth(batches):
        for pdf in batches:
            pdf["doc"] = [
                make_pdf(
                    2,
                    page_texts=[f"d{i} p0", f"d{i} p1"],
                    compress=(i % 2 == 0),
                )
                if i % 3 != 0
                else b"not a pdf"
                for i in map(int, pdf["doc_id"])
            ]
            yield pdf

    with_pdf = df.mapInPandas(synth, "doc_id bigint, doc binary")
    feats = ff.BinaryFeatureExtractor(
        "doc", decoder=pdf_text_decoder, feature_schema=pdf_text_schema()
    ).transform(with_pdf)
    got = {r["doc_id"]: (r["doc_text"], r["doc_n_pages_with_text"])
           for r in feats.collect()}
    assert got[1] == ("d1 p0\nd1 p1", 2)
    assert got[4] == ("d4 p0\nd4 p1", 2)
    assert got[0] == (None, None)  # non-PDF -> NULL features
