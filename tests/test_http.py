"""HTTP source tests against a local in-process server (no network).

Covers the reference-parity behaviors: JSON fetch shapes, the 429
retry loop (3 attempts, fixed backoff — http.rs:153-186), ranged
chunked download (http.rs:41-124), and the distributed URL fan-out."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
import urllib.error

from skopje_spark.sources.http import (
    RetryPolicy,
    download_file,
    fetch_json,
    fetch_many,
    _get,
)

PAYLOAD = b"0123456789" * 1000  # 10 kB blob for ranged download


class Handler(BaseHTTPRequestHandler):
    rate_limit_hits = {}  # path -> remaining 429s to serve

    def log_message(self, *a):  # silence
        pass

    def _serve(self, body: bytes, status=200, extra=()):
        self.send_response(status)
        for k, v in extra:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(body)

    def do_HEAD(self):
        if self.path == "/blob":
            self._serve(PAYLOAD)

    def do_GET(self):
        if self.path == "/obj":
            self._serve(json.dumps({"name": "x", "vals": [1, 2]}).encode())
        elif self.path == "/arr":
            self._serve(json.dumps([{"k": 1}, {"k": 2}, {"k": 3}]).encode())
        elif self.path.startswith("/flaky"):
            left = Handler.rate_limit_hits.get(self.path, 0)
            if left > 0:
                Handler.rate_limit_hits[self.path] = left - 1
                self._serve(b"slow down", status=429)
            else:
                self._serve(json.dumps({"ok": True}).encode())
        elif self.path == "/blob":
            rng = self.headers.get("Range")
            if rng:
                lo, hi = rng.removeprefix("bytes=").split("-")
                lo, hi = int(lo), int(hi)
                self._serve(PAYLOAD[lo:hi + 1], status=206)
            else:
                self._serve(PAYLOAD)
        else:
            self._serve(b"nope", status=404)


@pytest.fixture(scope="module")
def base_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_json_object_and_array(spark, base_url):
    one = fetch_json(spark, f"{base_url}/obj")
    row = one.collect()[0]
    assert row["name"] == "x" and list(row["vals"]) == [1, 2]

    arr = fetch_json(spark, f"{base_url}/arr", schema="k long")
    assert sorted(r["k"] for r in arr.collect()) == [1, 2, 3]


def test_retry_on_429_then_success(base_url):
    sleeps = []
    pol = RetryPolicy(max_retries=3, backoff_secs=0.01, sleep=sleeps.append)
    Handler.rate_limit_hits["/flaky-ok"] = 2
    body = _get(f"{base_url}/flaky-ok", pol)
    assert json.loads(body) == {"ok": True}
    assert sleeps == [0.01, 0.01]  # two 429s → two backoffs


def test_retry_exhausted_raises(base_url):
    pol = RetryPolicy(max_retries=3, backoff_secs=0.0, sleep=lambda s: None)
    Handler.rate_limit_hits["/flaky-never"] = 99
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{base_url}/flaky-never", pol)
    assert ei.value.code == 429
    # exactly MAX_RETRIES attempts were made (reference: http.rs:157)
    assert Handler.rate_limit_hits["/flaky-never"] == 96


def test_non_retryable_status_raises_immediately(base_url):
    pol = RetryPolicy(max_retries=3, backoff_secs=0.0, sleep=lambda s: None)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{base_url}/missing", pol)
    assert ei.value.code == 404


def test_fetch_many_fan_out(spark, base_url):
    urls = spark.createDataFrame(
        [(f"{base_url}/arr",), (f"{base_url}/obj",), (f"{base_url}/missing",)],
        "url string",
    )
    out = {r["url"].rsplit("/", 1)[-1]: r for r in fetch_many(urls).collect()}
    assert out["arr"]["status"] == 200 and json.loads(out["arr"]["body"])[0]["k"] == 1
    assert out["missing"]["status"] == 404 and out["missing"]["body"] == ""


def test_chunked_download_reassembles(base_url, tmp_path):
    dest = str(tmp_path / "blob.bin")
    n = download_file(f"{base_url}/blob", dest, chunk_size=3000)
    assert n == len(PAYLOAD)
    with open(dest, "rb") as f:
        assert f.read() == PAYLOAD
