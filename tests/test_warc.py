"""Unit tests: the WARC (ISO 28500) container codec and distributed
reader (sources/warc.py) — real record framing, per-member gzip,
HTTP response parsing, typed-record filtering, loud truncation."""

from __future__ import annotations

import gzip

import pytest

from skopje_spark.sources.warc import (
    encode_warc,
    http_response_bytes,
    iter_warc,
    read_warc,
    warc_response_rows,
)


def _archive(n=3, gz=True, url_base="http://t.test"):
    recs = [{"type": "warcinfo",
             "content_type": "application/warc-fields",
             "payload": b"software: test\r\n"}]
    for i in range(n):
        url = f"{url_base}/{i}"
        recs.append({"type": "request", "url": url,
                     "payload": b"GET / HTTP/1.1\r\n\r\n"})
        recs.append({
            "type": "response", "url": url,
            "content_type": "application/http; msgtype=response",
            "payload": http_response_bytes(
                f"<html><body>doc {i} &amp; more</body></html>".encode(),
                status=200 if i % 2 == 0 else 404,
            ),
        })
    return encode_warc(recs, gzip_members=gz)


def test_warc_roundtrip_plain_and_gzip():
    for gz in (False, True):
        b = _archive(n=2, gz=gz)
        types = [h["warc-type"] for h, _ in iter_warc(b)]
        assert types == ["warcinfo", "request", "response",
                         "request", "response"]
        rows = list(warc_response_rows(b))
        assert [r[0] for r in rows] == ["http://t.test/0", "http://t.test/1"]
        assert [r[2] for r in rows] == [200, 404]
        assert all(r[3].startswith("text/html") for r in rows)
        assert "doc 0 &amp; more" in rows[0][4]
    # the gzip layout really is one member per record (5 members)
    b = _archive(n=2, gz=True)
    assert b.count(b"\x1f\x8b\x08") >= 5


def test_warc_framing_is_length_based_not_pattern_based():
    """A payload containing WARC-looking bytes must not split the
    record — Content-Length framing, not delimiter scanning."""
    tricky = encode_warc([
        {"type": "resource",
         "payload": b"WARC/1.0\r\nWARC-Type: fake\r\n\r\nnot a record"},
        {"type": "response", "url": "http://t.test/x",
         "payload": http_response_bytes(b"<p>real</p>")},
    ])
    hs = [h["warc-type"] for h, _ in iter_warc(tricky)]
    assert hs == ["resource", "response"]
    assert len(list(warc_response_rows(tricky))) == 1


def test_warc_truncation_and_junk_refuse():
    b = _archive(n=1, gz=False)
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc(b[:-40]))
    with pytest.raises(ValueError, match="not a WARC"):
        list(iter_warc(b"HTTP/1.1 200 OK\r\n\r\n"))
    # truncated gzip member refuses loudly too
    g = _archive(n=1, gz=True)
    with pytest.raises(ValueError, match="gzip"):
        list(iter_warc(g[:-8]))
    # whole-file gzip (non-member layout) also reads
    whole = gzip.compress(_archive(n=2, gz=False))
    assert len(list(warc_response_rows(whole))) == 2


def test_read_warc_distributed(spark, tmp_path):
    """The binaryFile → mapInPandas reader: one row per response
    record across multiple archives, malformed archives named in the
    failure."""
    for i in range(3):
        with open(tmp_path / f"crawl-{i}.warc.gz", "wb") as f:
            f.write(_archive(n=2, gz=True, url_base=f"http://a{i}.test"))
    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    rows = df.collect()
    assert len(rows) == 6
    assert {r["status"] for r in rows} == {200, 404}
    hosts = {r["url"].split("/")[2] for r in rows}
    assert hosts == {"a0.test", "a1.test", "a2.test"}
    assert all("<html>" in r["html"] for r in rows)
    # a corrupt archive fails loudly WITH the file name
    with open(tmp_path / "bad.warc.gz", "wb") as f:
        f.write(b"\x1f\x8b\x08junkjunk")
    with pytest.raises(Exception, match="bad.warc"):
        read_warc(spark, str(tmp_path / "bad.warc.gz")).collect()
