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
import zlib

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


# --------------------------------------------------------------------------
# text extraction (r9) — FlateDecode + content-stream text operators.
# Public PDF spec semantics (ISO 32000-1 §7.3.4 string objects, §9.4
# text-showing operators); the same naive-but-deterministic extraction
# rules public tools like pdfminer/pdftotext reduce to on simple files:
# Tj / ' / " / TJ show text, Td / TD / T* / ' / " advance the line, TJ
# kerning numbers are ignored. WinAnsi/Identity font encodings are NOT
# resolved — bytes decode as latin-1, the standard-encoding fallback —
# so this covers the ASCII/Latin majority slice; CID-keyed fonts come
# out as raw bytes (garbage in, flagged by quality filters downstream).
# --------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"stream\r?\n")
_LEN_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_CONTENTS_RE = re.compile(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")

_STR_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
    ord("b"): "\b", ord("f"): "\f",
    ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _pdf_objects(payload: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Indirect objects in FILE ORDER: num -> (dict/body part, stream
    data or None). Scan-based (no xref walk) so truncated/damaged files
    still yield every object whose bytes survive; stream data is sized
    by a direct /Length when present, else by the next ``endstream``."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _OBJ_RE.finditer(payload):
        num = int(m.group(1))
        start = m.end()
        sm = _STREAM_RE.search(payload, start)
        em = payload.find(b"endobj", start)
        if sm and (em == -1 or sm.start() < em):
            head = payload[start : sm.start()]
            data_start = sm.end()
            lm = _LEN_RE.search(head)
            if lm:
                data_end = min(data_start + int(lm.group(1)), len(payload))
            else:
                e2 = payload.find(b"endstream", data_start)
                data_end = e2 if e2 != -1 else len(payload)
            # later definitions win: incremental updates APPEND
            # superseding objects, and last-update-wins matches xref
            # resolution (pdfminer/pdftotext behavior)
            objs[num] = (head, payload[data_start:data_end])
        else:
            end = em if em != -1 else len(payload)
            objs[num] = (payload[start:end], None)
    return objs


def _parse_literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a PDF literal string starting at the '(' at ``data[i]``;
    returns (decoded text, index past the closing paren). Handles the
    spec's escapes (\\n \\r \\t \\b \\f \\( \\) \\\\ and 1-3 octal
    digits), line continuations, and balanced unescaped parens."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _STR_ESCAPES:
                out.append(_STR_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                oct_digits = []
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits.append(chr(data[i]))
                    i += 1
                out.append(chr(int("".join(oct_digits), 8) & 0xFF))
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char itself
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _parse_hex_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a PDF hex string starting at the '<' at ``data[i]``; odd
    final digit pads with 0 per spec; bytes decode latin-1."""
    j = data.find(b">", i + 1)
    if j == -1:
        j = len(data)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1


_OPTOK_RE = re.compile(rb"[A-Za-z'\"*][A-Za-z0-9'\"*]*")


def _content_text(data: bytes) -> tuple[list[str], int]:
    """Text lines + show-op count of ONE decoded content stream.

    Linear token scan: literal/hex strings push onto an operand list;
    ``Tj``/``'``/``\"`` show the last string, ``TJ`` shows the
    concatenation of the array's strings (kerning numbers ignored);
    ``Td``/``TD``/``T*``/``'``/``\"`` start a new line; lines flush at
    ``ET`` and end-of-stream. Names, numbers, dicts and inline-image
    blobs are skipped — only text-showing state matters."""
    lines: list[str] = []
    cur: list[str] = []
    strs: list[str] = []
    shows = 0
    in_bt = False

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c == 0x28:  # (
            s, i = _parse_literal_string(data, i)
            strs.append(s)
        elif c == 0x3C:  # <
            if i + 1 < n and data[i + 1] == 0x3C:  # << dict
                i += 2
            else:
                s, i = _parse_hex_string(data, i)
                strs.append(s)
        elif c == 0x25:  # % comment to EOL
            j = data.find(b"\n", i)
            i = j + 1 if j != -1 else n
        elif c == 0x2F:  # /Name
            m = re.compile(rb"/[^\s()<>\[\]{}/%]*").match(data, i)
            i = m.end()
        elif (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A) or c in (0x27, 0x22):
            m = _OPTOK_RE.match(data, i)
            tok = m.group()
            i = m.end()
            if tok == b"BT":
                in_bt = True
                strs.clear()
            elif tok == b"ET":
                in_bt = False
                newline()
            elif in_bt and tok == b"Tj":
                if strs:
                    cur.append(strs[-1])
                    shows += 1
            elif in_bt and tok == b"TJ":
                if strs:
                    cur.append("".join(strs))
                    shows += 1
            elif in_bt and tok in (b"'", b'"'):
                newline()
                if strs:
                    cur.append(strs[-1])
                    shows += 1
            elif in_bt and tok in (b"Td", b"TD"):
                newline()
            elif in_bt and tok == b"T*":
                newline()
            if tok != b"BT":
                strs.clear()
        elif c == 0x5B:  # [ array of a TJ operand
            strs.clear()
            i += 1
        else:
            i += 1
    newline()
    return lines, shows


def extract_pdf_text(payload: bytes) -> dict:
    """REAL text extraction from a PDF's content streams — pure stdlib
    (zlib FlateDecode + the operator scan above). Raises ValueError on
    a non-PDF signature; within a PDF it is lenient per page: a page
    whose content object is missing (truncated download), undecodable
    (unknown filter) or corrupt (bad deflate) contributes no text
    instead of failing the document.

    Returned features:
    - ``text``: page texts (lines joined by ``\\n``) joined by ``\\n``
      across pages, in file order of the page objects
    - ``n_pages_with_text``: pages that contributed at least one char
    - ``n_text_ops``: total text-showing operators executed
    - ``n_chars``: ``len(text)``
    """
    if not payload.startswith(b"%PDF-"):
        raise ValueError("PDF: bad signature")
    objs = _pdf_objects(payload)
    page_texts: list[str] = []
    shows = 0
    for head, _stream in objs.values():
        if _stream is not None or not _PAGE_RE.search(head):
            continue
        cm = _CONTENTS_RE.search(head)
        if not cm:
            continue
        lines: list[str] = []
        for ref in _REF_RE.finditer(cm.group(1)):
            got = objs.get(int(ref.group(1)))
            if got is None or got[1] is None:
                continue  # truncated: the content object is gone
            chead, cdata = got
            if b"/FlateDecode" in chead:
                try:
                    cdata = zlib.decompress(cdata)
                except zlib.error:
                    continue  # corrupt deflate: skip this stream
            elif b"/Filter" in chead:
                continue  # unsupported filter: skip, don't fail
            ls, sh = _content_text(cdata)
            lines.extend(ls)
            shows += sh
        pt = "\n".join(lines)
        if pt:
            page_texts.append(pt)
    text = "\n".join(page_texts)
    return {
        "text": text,
        "n_pages_with_text": len(page_texts),
        "n_text_ops": shows,
        "n_chars": len(text),
    }


def pdf_text_decoder(payload: bytes) -> dict:
    """Lenient seam for BinaryFeatureExtractor: extracted text when the
    bytes are a PDF, NULL features otherwise."""
    try:
        return extract_pdf_text(payload)
    except (ValueError, IndexError):
        return {}


def pdf_text_schema() -> list:
    """feature_schema for BinaryFeatureExtractor(decoder=pdf_text_decoder)."""
    from pyspark.sql import types as T

    return [
        ("text", T.StringType()),
        ("n_pages_with_text", T.IntegerType()),
        ("n_text_ops", T.IntegerType()),
        ("n_chars", T.IntegerType()),
    ]


def pdf_full_decoder(payload: bytes) -> dict:
    """Structure probe + text extraction in ONE decode pass seam —
    what ``read_media(media='pdf_text')`` ingests: every probe feature
    plus the extracted text and its metrics. Lenient ({} on non-PDF)."""
    out = pdf_decoder(payload)
    if not out:
        return {}
    out.update(pdf_text_decoder(payload))
    return out


def pdf_full_schema() -> list:
    """feature_schema for BinaryFeatureExtractor(decoder=pdf_full_decoder)."""
    return pdf_schema() + pdf_text_schema()


def _escape_pdf_string(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        .encode("latin-1")
    )


def make_pdf(
    n_pages: int,
    version: str = "1.4",
    encrypted: bool = False,
    page_texts: list[str] | None = None,
    compress: bool = False,
) -> bytes:
    """Deterministic minimal-PDF fixture encoder: catalog + page tree +
    ``n_pages`` empty pages, a byte-correct xref table, and a trailer
    (with a structural ``/Encrypt`` reference when ``encrypted`` — the
    probe reads structure, so fixtures need valid structure, not real
    crypto). Total indirect objects = n_pages + 2 without text.

    With ``page_texts`` (one string per page) each page gains a
    ``/Contents`` stream showing its text — even page indexes via a
    single ``Tj``, odd indexes via a kerned ``TJ`` array split at char
    5 (both extract to the identical string), so one fixture sweep
    exercises both show operators. ``compress=True`` FlateDecodes every
    content stream (exact ``/Length``). Objects become
    2 + 2*n_pages."""
    if n_pages < 1:
        raise ValueError("n_pages must be >= 1")
    if page_texts is not None and len(page_texts) != n_pages:
        raise ValueError("page_texts must have one entry per page")
    objects: list[bytes] = []
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    first_content = 3 + n_pages
    for p in range(n_pages):
        page = b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
        if page_texts is not None:
            page += b" /Contents %d 0 R" % (first_content + p)
        objects.append(page + b" >>")
    if page_texts is not None:
        for p, txt in enumerate(page_texts):
            if p % 2 == 0 or len(txt) < 6:
                shown = b"(" + _escape_pdf_string(txt) + b") Tj"
            else:
                shown = (
                    b"[(" + _escape_pdf_string(txt[:5]) + b") -20 ("
                    + _escape_pdf_string(txt[5:]) + b")] TJ"
                )
            body = b"BT /F1 12 Tf 72 720 Td " + shown + b" ET"
            head = b""
            if compress:
                body = zlib.compress(body)
                head = b" /Filter /FlateDecode"
            objects.append(
                b"<< /Length %d%s >>\nstream\n" % (len(body), head)
                + body
                + b"\nendstream"
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
