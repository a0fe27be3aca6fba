"""WARC (Web ARChive, ISO 28500) ingestion — the raw-crawl entry point
of the curation pipeline (``read_warc`` -> HtmlTextExtractor ->
language ID / quality / dedup). CommonCrawl — the de-facto LLM corpus
source — ships as WARC, so a training-data engine that cannot open it
starts one ETL step too late.

The reference has no web/source surface at all (SURVEY.md §2.3); this
is beyond-reference, built from the public WARC 1.1 spec and the
CommonCrawl layout: a WARC file is a concatenation of records, each a
``WARC/x.y`` version line + CRLF headers + blank line + Content-Length
payload bytes + two CRLFs; *.warc.gz files are per-record (or
whole-file) concatenated gzip members.

Scale shape: WARC is stream-parsed and (gzipped) non-splittable, so the
unit of parallelism is the FILE — exactly what ``binaryFile`` gives us.
``read_warc`` is a binaryFile scan + one Arrow-batched ``mapInPandas``
that explodes each archive into its records: a narrow map, no shuffle,
and a 1000-executor cluster chews one archive per task. CommonCrawl
crawls are ~90k files of ~1 GB — a natural 90k-task scan. Records
stream out in batches of ``batch_rows`` so a million-record archive
never materializes as one Python list.

Pure stdlib (gzip via zlib); no warcio dependency. ``make_warc`` is the
deterministic encoder twin (same pattern as imagecodec's solid_png) so
tests and fixtures round-trip without external data.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_GZIP_MAGIC = b"\x1f\x8b"
_CRLF2 = b"\r\n\r\n"

# (name, spark sql type) of the exploded record schema
WARC_FIELDS = [
    ("source_file", "string"),
    ("record_id", "string"),
    ("warc_type", "string"),
    ("target_uri", "string"),
    ("warc_date", "string"),
    ("content_type", "string"),
    ("http_status", "int"),
    ("http_content_type", "string"),
    ("http_x_robots", "string"),
    ("payload", "binary"),
    ("payload_length", "bigint"),
]


def _member_chunks(data: bytes) -> Iterator[bytes]:
    """Yield decompressed gzip members one at a time (the *.warc.gz
    layout: one member per record — so peak memory is one member, not
    the whole decompressed archive). Plain input is one chunk. A
    corrupted member (bad CRC / deflate stream) ends the iteration
    instead of raising: the crawl-scale contract is 'keep the intact
    prefix', never 'fail the task'."""
    if not data.startswith(_GZIP_MAGIC):
        yield data
        return
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data) + d.flush()
        except zlib.error:
            return
        yield chunk
        data = d.unused_data
        if data and not data.startswith(_GZIP_MAGIC):
            return  # trailing garbage after a clean member boundary


def gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members fully. Prefer the
    streaming ``_member_chunks`` (what ``parse_warc`` uses); this
    materializing form exists for small-payload callers and tests."""
    return b"".join(_member_chunks(data))


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def split_http_payload(
    payload: bytes,
) -> tuple[int | None, str | None, str | None, bytes]:
    """(status, content-type, x-robots-tag, body) of an HTTP-response
    payload; a non-HTTP payload comes back unsplit with NULL metadata.
    The X-Robots-Tag header is the HTTP-level twin of the
    ``<meta name=robots>`` page directive (operators.web
    .MetaRobotsFilter) — surfacing it at ingestion lets a curation
    pass honor header-level opt-outs before any payload work."""
    if not payload.startswith(b"HTTP/"):
        return None, None, None, payload
    head, sep, body = payload.partition(_CRLF2)
    if not sep:
        return None, None, None, payload
    first, _, rest = head.partition(b"\r\n")
    parts = first.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, None, payload
    headers = _parse_headers(rest)
    return (
        status,
        headers.get("content-type"),
        headers.get("x-robots-tag"),
        body,
    )


_MALFORMED = object()


def _try_parse_one(buf: bytearray) -> tuple:
    """Parse one complete record off the FRONT of ``buf``.

    Returns ``((headers, payload), consumed)`` for a complete record,
    ``(None, skipped)`` when more bytes are needed (``skipped`` = the
    inter-record CRLFs safe to drop now), or ``(_MALFORMED, 0)`` when
    the front can never be a record boundary."""
    pos, n = 0, len(buf)
    while pos + 2 <= n and buf[pos : pos + 2] == b"\r\n":
        pos += 2  # inter-record CRLFs
    if n - pos < 5:
        return None, pos
    if bytes(buf[pos : pos + 5]) != b"WARC/":
        return _MALFORMED, 0
    head_end = buf.find(_CRLF2, pos)
    if head_end < 0:
        return None, pos
    headers = _parse_headers(bytes(buf[pos:head_end]))
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        return _MALFORMED, 0  # record length unknown: unrecoverable
    body_start = head_end + len(_CRLF2)
    if n - body_start < length:
        return None, pos  # payload not fully buffered yet
    payload = bytes(buf[body_start : body_start + length])
    return (headers, payload), body_start + length


def parse_warc(data: bytes, parse_http: bool = True) -> Iterator[dict]:
    """Yield one dict per WARC record (keys = WARC_FIELDS minus
    source_file). Per-record gzip members (the CommonCrawl layout)
    decompress INCREMENTALLY — peak memory is the compressed input
    (already in hand from binaryFile) plus one member and the current
    record, never the whole decompressed archive. Malformed or
    truncated bytes — including a corrupted gzip member mid-file — end
    the stream after the intact prefix instead of raising: one
    bit-flipped archive must never fail a crawl-scale read job.
    (A whole-file-gzip WARC is a single member, so it still
    materializes fully — re-pack per-record for the streaming bound.)"""
    buf = bytearray()
    chunks = _member_chunks(data)
    while True:
        rec, consumed = _try_parse_one(buf)
        if rec is _MALFORMED:
            return
        if rec is None:
            del buf[:consumed]
            chunk = next(chunks, None)
            if chunk is None:
                return  # truncated final record / end of stream
            buf += chunk
            continue
        del buf[:consumed]
        headers, payload = rec
        warc_type = headers.get("warc-type")
        status, http_ctype, x_robots, body = (None, None, None, payload)
        if parse_http and warc_type == "response":
            status, http_ctype, x_robots, body = split_http_payload(payload)
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": warc_type,
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": status,
            "http_content_type": http_ctype,
            "http_x_robots": x_robots,
            "payload": body,
            "payload_length": len(body),
        }


def make_warc(
    records: list[dict],
    gzip_per_record: bool = False,
) -> bytes:
    """Deterministic WARC encoder for fixtures/tests: each record dict
    takes ``payload`` (bytes) plus optional ``warc_type``,
    ``target_uri``, ``record_id``, ``warc_date``, ``content_type``.
    With ``gzip_per_record`` every record becomes its own gzip member
    (the *.warc.gz layout)."""
    out = []
    for i, rec in enumerate(records):
        payload = rec["payload"]
        headers = [
            ("WARC-Type", rec.get("warc_type", "response")),
            ("WARC-Record-ID", rec.get("record_id", f"<urn:uuid:rec-{i}>")),
            ("WARC-Date", rec.get("warc_date", "2026-01-01T00:00:00Z")),
            ("Content-Length", str(len(payload))),
        ]
        if rec.get("target_uri"):
            headers.insert(2, ("WARC-Target-URI", rec["target_uri"]))
        if rec.get("content_type"):
            headers.append(("Content-Type", rec["content_type"]))
        raw = (
            b"WARC/1.0\r\n"
            + b"\r\n".join(
                f"{k}: {v}".encode("latin-1") for k, v in headers
            )
            + _CRLF2
            + payload
            + _CRLF2
        )
        if gzip_per_record:
            co = zlib.compressobj(9, zlib.DEFLATED, 31)
            raw = co.compress(raw) + co.flush()
        out.append(raw)
    return b"".join(out)


def make_http_response(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html",
    x_robots: str | None = None,
) -> bytes:
    """An HTTP response payload for `make_warc` response records."""
    extra = f"X-Robots-Tag: {x_robots}\r\n" if x_robots else ""
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"{extra}Content-Length: {len(body)}\r\n\r\n".encode("latin-1")
        + body
    )


def make_wet(docs: list[dict], gzip_per_record: bool = False) -> bytes:
    """Deterministic WET encoder twin (the CommonCrawl pre-extracted
    plain-text layout): a leading ``warcinfo`` record followed by one
    ``conversion`` record per doc dict (``text`` str, optional
    ``target_uri``/``warc_date``/``record_id``). WET is plain WARC
    with text payloads and no HTTP envelope, so this reuses
    ``make_warc`` wholesale."""
    records = [{
        "warc_type": "warcinfo",
        "content_type": "application/warc-fields",
        "payload": b"software: feature-factory-spark make_wet\r\n",
    }]
    for i, d in enumerate(docs):
        records.append({
            "warc_type": "conversion",
            "content_type": "text/plain",
            "payload": d["text"].encode("utf-8"),
            "target_uri": d.get("target_uri", f"https://example.org/{i}"),
            "warc_date": d.get("warc_date", "2026-01-01T00:00:00Z"),
            "record_id": d.get("record_id", f"<urn:uuid:wet-{i}>"),
        })
    return make_warc(records, gzip_per_record=gzip_per_record)


def make_wat(docs: list[dict], gzip_per_record: bool = False) -> bytes:
    """Deterministic WAT encoder twin (the CommonCrawl per-page
    metadata layout): a leading ``warcinfo`` record followed by one
    ``metadata`` record per doc dict (optional ``target_uri`` /
    ``title`` / ``links`` list / ``warc_date`` / ``record_id``), whose
    JSON payload follows the public WAT envelope structure
    (Envelope -> Payload-Metadata -> HTTP-Response-Metadata ->
    HTML-Metadata -> {Head.Title, Links})."""
    import json

    records = [{
        "warc_type": "warcinfo",
        "content_type": "application/warc-fields",
        "payload": b"software: feature-factory-spark make_wat\r\n",
    }]
    for i, d in enumerate(docs):
        env = {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Target-URI": d.get(
                        "target_uri", f"https://example.org/{i}"
                    ),
                    "WARC-Type": "response",
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Head": {"Title": d.get("title", f"Page {i}")},
                            "Links": [
                                {"path": "A@/href", "url": u}
                                for u in d.get("links", [])
                            ],
                        }
                    }
                },
            }
        }
        records.append({
            "warc_type": "metadata",
            "content_type": "application/json",
            "payload": json.dumps(env, sort_keys=True).encode("utf-8"),
            "target_uri": d.get("target_uri", f"https://example.org/{i}"),
            "warc_date": d.get("warc_date", "2026-01-01T00:00:00Z"),
            "record_id": d.get("record_id", f"<urn:uuid:wat-{i}>"),
        })
    return make_warc(records, gzip_per_record=gzip_per_record)


_WAT_HTML_META = (
    "$.Envelope['Payload-Metadata']['HTTP-Response-Metadata']"
    "['HTML-Metadata']"
)


def read_warc(
    spark: SparkSession,
    path: str,
    parse_http: bool = True,
    batch_rows: int = 1024,
    kind: str = "warc",
    **options,
) -> DataFrame:
    """One-call WARC ingestion: binaryFile scan + per-file record
    explosion. Returns one row per WARC record with the HTTP envelope
    split off response payloads (status, content-type, body) when
    ``parse_http``; unparseable files yield zero rows rather than task
    failures. Narrow map over the scan — parallelism = file count, no
    shuffle.

    ``kind='wet'`` (r8, VERDICT r7 item 5) reads the CommonCrawl WET
    layout — the cheaper pre-extracted-text entry point most curation
    pipelines actually start from: keeps only ``conversion`` records
    and returns (source_file, record_id, target_uri, warc_date, text,
    content_length) with the payload decoded as UTF-8 (malformed bytes
    become U+FFFD, the lenient crawl contract). Same scan + narrow
    map; the filter and decode are plain JVM expressions on top.

    ``kind='wat'`` (r8) reads the CommonCrawl WAT layout — per-page
    METADATA (the link-graph / title / header sidecar): keeps only
    ``metadata`` records and returns (source_file, record_id,
    target_uri, warc_date, metadata_json, title, n_links) with title
    and outlink count pre-extracted from the public WAT envelope paths
    via ``get_json_object`` / ``json_array_length`` (NULL when the
    envelope lacks them) and the full JSON kept for downstream
    ``from_json`` schemas. Same scan + narrow map."""
    import pandas as pd

    from pyspark.sql import functions as F

    from .io import read

    if kind not in ("warc", "wet", "wat"):
        raise ValueError("kind must be 'warc', 'wet', or 'wat'")

    df = read(spark, path, fmt="binaryFile", **options).select(
        "path", "content"
    )
    schema = ", ".join(f"{name} {typ}" for name, typ in WARC_FIELDS)
    cols = [name for name, _ in WARC_FIELDS]

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[tuple] = []
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                if content is None:
                    continue
                for rec in parse_warc(bytes(content), parse_http=parse_http):
                    buf.append((p, *(rec[c] for c in cols[1:])))
                    if len(buf) >= batch_rows:
                        yield pd.DataFrame(buf, columns=cols)
                        buf = []
        if buf:
            yield pd.DataFrame(buf, columns=cols)

    records = df.mapInPandas(explode, schema=schema)
    if kind == "wet":
        return records.where(F.col("warc_type") == "conversion").select(
            "source_file",
            "record_id",
            "target_uri",
            "warc_date",
            F.decode("payload", "UTF-8").alias("text"),
            F.col("payload_length").alias("content_length"),
        )
    if kind == "wat":
        js = F.decode("payload", "UTF-8")
        return records.where(F.col("warc_type") == "metadata").select(
            "source_file",
            "record_id",
            "target_uri",
            "warc_date",
            js.alias("metadata_json"),
            F.get_json_object(
                js, _WAT_HTML_META + "['Head'].Title"
            ).alias("title"),
            F.expr(
                "json_array_length(get_json_object(decode(payload, 'UTF-8'),"
                f' "{_WAT_HTML_META}.Links"))'
            ).alias("n_links"),
        )
    return records


def edges_from_wat(wat: DataFrame) -> DataFrame:
    """Host-level link edges from a ``read_warc(kind='wat')`` frame:
    one (src_host, dst_host) row per outlink whose URL parses to a
    host, self-loops dropped — the input :func:`...functions.graph.
    pagerank` ranks for domain-authority filtering. Pure JVM:
    ``from_json`` on the envelope's Links array + ``try_parse_url``;
    a narrow map over the reader output (the explode multiplies rows
    but shuffles nothing)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    links_schema = T.ArrayType(
        T.StructType([T.StructField("url", T.StringType(), True)])
    )
    links = F.from_json(
        F.get_json_object(F.col("metadata_json"), _WAT_HTML_META + ".Links"),
        links_schema,
    )
    src = F.try_parse_url(F.col("target_uri"), F.lit("HOST"))
    out = (
        wat.select(src.alias("src_host"), F.explode(links).alias("l"))
        .select(
            "src_host",
            F.try_parse_url(F.col("l.url"), F.lit("HOST")).alias("dst_host"),
        )
        .where(
            F.col("src_host").isNotNull()
            & F.col("dst_host").isNotNull()
            & (F.col("src_host") != F.col("dst_host"))
        )
    )
    return out
