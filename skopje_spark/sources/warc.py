"""WARC (ISO 28500) container source — pure stdlib, no warcio.

WARC is THE wire format of web-crawl corpora (Common Crawl ships
WARC/WAT/WET); a training-data engine's ingest loop starts here, one
step upstream of the HTML→text tier in ``operators/webtext.py``. This
module implements the actual container format:

- **records**: ``WARC/1.0`` version line, CRLF-terminated named
  headers (``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``,
  ``Content-Length``, …), one blank line, ``Content-Length`` payload
  bytes, and the mandatory two-CRLF record separator;
- **gzip**: the standard ``.warc.gz`` layout is one gzip MEMBER per
  record so readers can split on member boundaries; the decoder
  handles per-member gzip, whole-file gzip, and plain WARC
  identically (multi-member streams decompress with a zlib
  decompressobj loop over ``unused_data``);
- **HTTP payloads**: ``response`` records carry full HTTP/1.x
  message bytes; the parser splits status line / headers / body and
  surfaces status + Content-Type, which is exactly what the
  downstream quality filters key on.

Spark side (:func:`read_warc`): a ``binaryFile`` scan over the
``*.warc[.gz]`` glob, one archive per task, Arrow-batched parsing in
``mapInPandas`` → one row per RESPONSE record ``(warc_file, url,
date, status, content_type, html)``. One-archive-per-task is the
standard economics (cc_net / Dolma / the CC processing stacks do the
same): per-record gzip members are not seekable without an external
index, and crawl archives are sized (~1 GB) to be the unit of work.
At 100 TB the parallelism is the archive COUNT (~100k files), which
dwarfs any executor fleet.

The encoder exists so fixtures are REAL: any conformant WARC reader
consumes :func:`encode_warc` output, and the driver query's oracle
recomputes the extracted text closed-form through the shared
``html_to_text`` rule tables.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "encode_warc",
    "iter_warc",
    "warc_response_rows",
    "read_warc",
]

_CRLF = b"\r\n"


def encode_warc(records, *, gzip_members: bool = True) -> bytes:
    """Build a real WARC byte stream. ``records`` is a sequence of
    dicts: ``type`` (warcinfo/request/response/…), optional ``url``,
    ``date``, ``record_id``, ``content_type`` (of the PAYLOAD), and
    ``payload`` bytes. ``gzip_members=True`` emits the standard
    one-gzip-member-per-record ``.warc.gz`` layout."""
    import gzip as _gzip

    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec.get("payload", b"")
        hdrs = [
            ("WARC-Type", rec.get("type", "resource")),
            ("WARC-Record-ID",
             rec.get("record_id", f"<urn:uuid:rec-{i:08d}>")),
            ("WARC-Date", rec.get("date", "2024-01-01T00:00:00Z")),
            ("Content-Length", str(len(payload))),
        ]
        if rec.get("url"):
            hdrs.insert(1, ("WARC-Target-URI", rec["url"]))
        if rec.get("content_type"):
            hdrs.append(("Content-Type", rec["content_type"]))
        body = bytearray(b"WARC/1.0" + _CRLF)
        for k, v in hdrs:
            body += f"{k}: {v}".encode() + _CRLF
        body += _CRLF + payload + _CRLF + _CRLF
        out += _gzip.compress(bytes(body), 6) if gzip_members else body
    return bytes(out)


def http_response_bytes(
    body: bytes, *, status: int = 200, reason: str = "OK",
    content_type: str = "text/html; charset=utf-8",
    extra_headers: dict | None = None,
) -> bytes:
    """Assemble a real HTTP/1.1 response message — the payload shape
    of a WARC ``response`` record."""
    lines = [f"HTTP/1.1 {status} {reason}".encode()]
    lines.append(f"Content-Type: {content_type}".encode())
    lines.append(f"Content-Length: {len(body)}".encode())
    for k, v in (extra_headers or {}).items():
        lines.append(f"{k}: {v}".encode())
    return _CRLF.join(lines) + _CRLF + _CRLF + body


def _gunzip_members(b: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; plain bytes
    pass through untouched."""
    if len(b) < 2 or b[:2] != b"\x1f\x8b":
        return b
    out = bytearray()
    rest = b
    while rest:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(rest)
            out += d.flush()
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member in WARC stream: {e}")
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        rest = d.unused_data
    return bytes(out)


def iter_warc(b: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, payload)`` per WARC record. Header names are
    lower-cased; the version line is checked; payload length comes
    from ``Content-Length`` (the spec's framing — payloads may contain
    anything, including WARC-looking bytes)."""
    data = _gunzip_members(bytes(b))
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2  # inter-record padding
        if pos >= n:
            return
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("truncated WARC record header")
        version = data[pos:eol].decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"not a WARC record at {pos}: {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("truncated WARC headers")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.decode().strip().lower()] = v.decode(
                "utf-8", "replace"
            ).strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record without a valid Content-Length")
        payload = data[pos:pos + clen]
        if len(payload) != clen:
            raise ValueError("truncated WARC payload")
        pos += clen
        yield headers, payload


def _parse_http_response(payload: bytes):
    """(status, content_type, body) from HTTP/1.x message bytes."""
    head, sep, body = payload.partition(_CRLF + _CRLF)
    if not sep:
        return None, None, payload
    lines = head.split(_CRLF)
    status = None
    parts = lines[0].split(None, 2)
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.decode("ascii", "replace").strip().lower() == "content-type":
            ctype = v.decode("utf-8", "replace").strip()
    return status, ctype, body


def warc_response_rows(b: bytes) -> Iterator[tuple]:
    """One tuple per RESPONSE record of a WARC stream:
    ``(url, date, status, content_type, body_text)`` — the WET-style
    projection crawl pipelines feed to HTML→text. Non-response
    records (warcinfo, request, metadata) are skipped, which is the
    point of typed records."""
    for headers, payload in iter_warc(b):
        if headers.get("warc-type") != "response":
            continue
        status, ctype, body = _parse_http_response(payload)
        yield (
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            status,
            ctype,
            body.decode("utf-8", "replace"),
        )


WARC_ROW_SCHEMA = (
    "warc_file string, url string, warc_date string, status int, "
    "content_type string, html string"
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC ingestion: ``binaryFile`` scan over the glob
    (one archive per task — the crawl-corpus unit of work), Arrow
    mapInPandas parse, one row per response record. Malformed
    archives raise loudly with the file name (a corrupt archive is an
    ingest incident, not a row to drop silently)."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for fp, blob in zip(pdf["path"], pdf["content"]):
                try:
                    for tup in warc_response_rows(bytes(blob)):
                        rows.append((fp, *tup))
                except ValueError as e:
                    raise ValueError(f"{fp}: {e}")
            yield pd.DataFrame(
                rows,
                columns=["warc_file", "url", "warc_date", "status",
                         "content_type", "html"],
            )

    return raw.mapInPandas(run, schema=WARC_ROW_SCHEMA)
