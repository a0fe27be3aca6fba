"""REAL PDF container probing — pure stdlib, from the public PDF
spec (ISO 32000-1 / the classic Adobe PDF Reference file structure):
``%PDF-x.y`` header, numbered indirect objects (``N G obj ...
endobj``), a cross-reference table, and a ``trailer`` dictionary ending
in ``startxref`` + ``%%EOF``.

PDF is the dominant *document* format in web corpora (the multimodal
dispatch already probes images/audio/video); a curation pass filters on
exactly the structural metadata this probe extracts — page count,
version, encryption, truncation — before paying for any real text
extraction. Like the MP3/FLAC/TIFF probes, this parses STRUCTURE only:
content streams are not decoded, so the probe is O(bytes) regex/scan
work with no external dependency.

``make_pdf`` is the deterministic fixture encoder twin (the
solid_png/make_mp3/synth_mp4 precedent): a minimal valid PDF with a
catalog, a page tree, n empty pages, a correct xref table, and a
trailer — byte-reproducible, so entry-query oracles can state its
probed features in closed form.

The Spark seam is the standard one: ``pdf_decoder`` (lenient: {} on
non-PDF bytes) + ``pdf_schema`` plug into
``BinaryFeatureExtractor(decoder=..., feature_schema=...)`` — a narrow
Arrow-batched map, no shuffle.
"""

from __future__ import annotations

import re

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
# /Type /Page not followed by 's' (which would be the /Pages tree node);
# tolerate whitespace/comments between name tokens
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![A-Za-z])")
_COUNT_RE = re.compile(rb"/Count\s+(\d+)")


def probe_pdf(payload: bytes) -> dict:
    """Structural probe of a PDF file. Raises ValueError when the bytes
    are not a PDF (no ``%PDF-`` header).

    Returned features:
    - ``format``: 'pdf'
    - ``version``: the header version string ('1.4', '2.0', ...)
    - ``n_pages``: count of page objects (``/Type /Page``) — the
      robust count that works even when the xref is damaged
    - ``declared_pages``: the page tree's ``/Count`` value (None when
      absent); a mismatch with n_pages flags a damaged/partial file
    - ``n_objects``: count of indirect object headers
    - ``encrypted``: 1 when the trailer carries ``/Encrypt``
    - ``has_eof``: 1 when the file ends with ``%%EOF`` (trailing
      whitespace tolerated) — 0 means a truncated download
    - ``has_xref``: 1 when a cross-reference table/stream marker exists
    """
    if not payload.startswith(b"%PDF-"):
        raise ValueError("PDF: bad signature")
    header = payload[5:16].split(b"\r")[0].split(b"\n")[0]
    version = header.decode("latin-1", "replace").strip() or None
    n_pages = len(_PAGE_RE.findall(payload))
    n_objects = len(_OBJ_RE.findall(payload))
    declared = None
    m = _COUNT_RE.search(payload)
    if m:
        declared = int(m.group(1))
    return {
        "format": "pdf",
        "version": version,
        "n_pages": n_pages,
        "declared_pages": declared,
        "n_objects": n_objects,
        "encrypted": 1 if b"/Encrypt" in payload else 0,
        "has_eof": 1 if payload.rstrip().endswith(b"%%EOF") else 0,
        "has_xref": 1 if (b"\nxref" in payload or payload.startswith(b"xref")
                          or b"/XRef" in payload) else 0,
    }


def pdf_decoder(payload: bytes) -> dict:
    """Lenient seam for BinaryFeatureExtractor: real probe when the
    bytes are a PDF, NULL features otherwise — one corrupt blob must
    not fail a 100 TB scan task."""
    try:
        return probe_pdf(payload)
    except (ValueError, IndexError):
        return {}


def pdf_schema() -> list:
    """feature_schema for BinaryFeatureExtractor(decoder=pdf_decoder)."""
    from pyspark.sql import types as T

    return [
        ("format", T.StringType()),
        ("version", T.StringType()),
        ("n_pages", T.IntegerType()),
        ("declared_pages", T.IntegerType()),
        ("n_objects", T.IntegerType()),
        ("encrypted", T.IntegerType()),
        ("has_eof", T.IntegerType()),
        ("has_xref", T.IntegerType()),
    ]


def make_pdf(
    n_pages: int,
    version: str = "1.4",
    encrypted: bool = False,
) -> bytes:
    """Deterministic minimal-PDF fixture encoder: catalog + page tree +
    ``n_pages`` empty pages, a byte-correct xref table, and a trailer
    (with a structural ``/Encrypt`` reference when ``encrypted`` — the
    probe reads structure, so fixtures need valid structure, not real
    crypto). Total indirect objects = n_pages + 2."""
    if n_pages < 1:
        raise ValueError("n_pages must be >= 1")
    objects: list[bytes] = []
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    for _ in range(n_pages):
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>"
        )
    out = bytearray(b"%PDF-" + version.encode("latin-1") + b"\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(out)
    n = len(objects) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R" % n
    if encrypted:
        out += b" /Encrypt %d 0 R" % n  # structural reference only
    out += b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)
