"""Spark 4 Python DataSource tests (sources/pysource.py): the
Extract/Load trait surface as first-class `spark.read.format(...)`
sources — batch REST scan with retry + filter pushdown, streaming
feed tail with byte offsets, and the atomic staged-commit sink."""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from skopje_spark.sources.pysource import (
    FeedStreamReader,
    RestJsonReader,
    register_all,
)

ROWS = [
    {"id": 1, "name": "ada", "score": 10},
    {"id": 2, "name": "bob", "score": 20},
    {"id": 3, "name": "cyd", "score": 30},
]


class Handler(BaseHTTPRequestHandler):
    hits = {"count": 0, "flaky_left": 0}

    def log_message(self, *a):
        pass

    def _serve(self, body: bytes, status=200):
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        Handler.hits["count"] += 1
        if self.path == "/page1":
            self._serve(json.dumps(ROWS[:2]).encode())
        elif self.path == "/page2":
            self._serve(json.dumps(ROWS[2:]).encode())
        elif self.path == "/envelope":
            self._serve(json.dumps({"meta": "x", "items": ROWS}).encode())
        elif self.path == "/flaky":
            if Handler.hits["flaky_left"] > 0:
                Handler.hits["flaky_left"] -= 1
                self._serve(b"slow down", status=429)
            else:
                self._serve(json.dumps(ROWS).encode())
        else:
            self._serve(b"nope", status=404)


@pytest.fixture(scope="module")
def base_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


SCHEMA = "id long, name string, score long"


def test_rest_source_multi_url_partitions(spark, base_url):
    register_all(spark)
    df = (
        spark.read.format("skopje_rest")
        .schema(SCHEMA)
        .option("urls", f"{base_url}/page1,{base_url}/page2")
        .load()
    )
    # one input partition per URL — the task fan-out unit
    assert df.rdd.getNumPartitions() == 2
    got = sorted((r.id, r.name, r.score) for r in df.collect())
    assert got == [(1, "ada", 10), (2, "bob", 20), (3, "cyd", 30)]


def test_rest_source_envelope_unwrap(spark, base_url):
    register_all(spark)
    df = (
        spark.read.format("skopje_rest")
        .schema(SCHEMA)
        .option("urls", f"{base_url}/envelope")
        .option("records_field", "items")
        .load()
    )
    assert df.count() == 3


def test_rest_source_filter_pushdown_semantics(spark, base_url):
    register_all(spark)
    df = (
        spark.read.format("skopje_rest")
        .schema(SCHEMA)
        .option("urls", f"{base_url}/page1,{base_url}/page2")
        .load()
        .filter("score > 10 AND name != 'zz'")
    )
    assert sorted(r.id for r in df.collect()) == [2, 3]


def test_rest_reader_pushdown_unit():
    """Reader-level contract: supported filters are absorbed, the rest
    are yielded back for Spark to evaluate."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, Not
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(SCHEMA)
    r = RestJsonReader(schema, {"urls": "http://x/unused"})
    leftover = list(
        r.pushFilters([GreaterThan(("score",), 10), Not(EqualTo(("name",), "zz"))])
    )
    assert len(r.predicates) == 1  # score > 10 absorbed
    assert len(leftover) == 1  # Not(...) handed back
    assert r.predicates[0]({"score": 11}) and not r.predicates[0]({"score": 9})


def test_rest_source_retries_429(spark, base_url):
    register_all(spark)
    Handler.hits["flaky_left"] = 2
    df = (
        spark.read.format("skopje_rest")
        .schema(SCHEMA)
        .option("urls", f"{base_url}/flaky")
        .option("backoff_secs", "0.01")
        .load()
    )
    assert df.count() == 3


def test_ndjson_sink_two_phase_commit(spark, tmp_path):
    register_all(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    df = spark.createDataFrame([(i, f"n{i}") for i in range(10)], "id long, name string")
    df.repartition(4).write.format("skopje_ndjson").option("path", out).mode(
        "append"
    ).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert manifest["rows"] == 10
    # staged dir fully swept (commit removes it); manifest lists all files
    assert not os.path.isdir(os.path.join(out, "_staging"))
    published = sorted(f for f in os.listdir(out) if f.endswith(".ndjson"))
    assert published == manifest["files"]
    back = [
        json.loads(line)
        for f in published
        for line in open(os.path.join(out, f))
    ]
    assert sorted(r["id"] for r in back) == list(range(10))


def test_feed_stream_reader_offsets(tmp_path):
    """Unit-level offset math: partial trailing lines are deferred,
    replay between offsets is deterministic."""
    from pyspark.sql.types import StructType

    feed = str(tmp_path / "feed.ndjson")
    schema = StructType.fromDDL("id long, v string")
    r = FeedStreamReader(schema, {"path": feed})
    assert r.initialOffset() == {"pos": 0}

    rows, off = r.read({"pos": 0})
    assert list(rows) == [] and off == {"pos": 0}  # missing file → empty

    with open(feed, "w") as f:
        f.write('{"id": 1, "v": "a"}\n{"id": 2, "v":')  # second line partial
    rows, off1 = r.read({"pos": 0})
    assert list(rows) == [(1, "a")]

    with open(feed, "a") as f:
        f.write(' "b"}\n')
    rows, off2 = r.read(off1)
    assert list(rows) == [(2, "b")]

    # deterministic replay of the first batch's span
    assert list(r.readBetweenOffsets({"pos": 0}, off1)) == [(1, "a")]


def test_feed_stream_end_to_end(spark, tmp_path):
    register_all(spark)
    feed = str(tmp_path / "feed.ndjson")
    with open(feed, "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": i, "v": f"x{i}"}) + "\n")

    out = str(tmp_path / "out")

    def run_pass() -> None:
        q = (
            spark.readStream.format("skopje_feed")
            .schema("id long, v string")
            .option("path", feed)
            .load()
            .writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_pass()
    got = spark.read.json(out)
    assert got.count() == 5

    # append more, run a second incremental pass from the checkpoint:
    # only the NEW rows arrive (byte offset resumed), no duplicates
    with open(feed, "a") as f:
        for i in range(5, 8):
            f.write(json.dumps({"id": i, "v": f"x{i}"}) + "\n")
    run_pass()
    got = spark.read.json(out)
    assert got.count() == 8
    assert sorted(r.id for r in got.collect()) == list(range(8))


def test_ndjson_sink_append_merges_manifest(spark, tmp_path):
    """A second append commit keeps earlier files in the manifest."""
    register_all(spark)
    out = str(tmp_path / "sink_merge")
    os.makedirs(out)
    for lo in (0, 10):
        df = spark.createDataFrame(
            [(i, f"n{i}") for i in range(lo, lo + 10)], "id long, name string"
        )
        df.repartition(2).write.format("skopje_ndjson").option("path", out).mode(
            "append"
        ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    published = sorted(f for f in os.listdir(out) if f.endswith(".ndjson"))
    assert manifest["rows"] == 20
    assert manifest["files"] == published  # both batches described
    back = [
        json.loads(line)
        for f in published
        for line in open(os.path.join(out, f))
    ]
    assert sorted(r["id"] for r in back) == list(range(20))


def test_ndjson_abort_sweeps_unlisted_staged_files(tmp_path):
    """abort() removes staged files from attempts that never produced a
    commit message (failed/speculative tasks)."""
    from pyspark.sql.types import StructType

    from skopje_spark.sources.pysource import NdjsonWriter

    out = str(tmp_path / "sink_abort")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-orphan.ndjson"), "w") as f:
        f.write('{"id": 1}\n')
    w = NdjsonWriter(StructType.fromDDL("id long"), {"path": out}, overwrite=False)
    w.abort([])  # no commit messages at all
    assert not os.path.isdir(staging)


def test_rest_reader_coerces_before_filtering():
    """Pushed filters evaluate on schema-coerced values, so a JSON
    string '15' in a long column passes `score > 10` instead of
    crashing or silently dropping; non-JSON-primitive literals are
    never absorbed."""
    import datetime

    from pyspark.sql.datasource import EqualTo, GreaterThan
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("id long, score long, name string")
    r = RestJsonReader(schema, {"urls": "http://x/unused"})
    leftover = list(r.pushFilters([GreaterThan(("score",), 10)]))
    assert leftover == [] and len(r.predicates) == 1

    from skopje_spark.sources.pysource import _coerce_primitive

    rec = {
        n: _coerce_primitive(v, t)
        for (n, v), t in zip(
            {"id": 1, "score": "15", "name": 7}.items(), ("bigint", "bigint", "string")
        )
    }
    assert rec == {"id": 1, "score": 15, "name": "7"}
    assert r.predicates[0](rec)
    # unparseable numeric -> NULL -> filtered out, matching Spark's cast
    assert _coerce_primitive("abc", "bigint") is None

    # a date literal is not JSON-native: the filter must be yielded back
    r2 = RestJsonReader(schema, {"urls": "http://x/unused"})
    back = list(r2.pushFilters([EqualTo(("name",), datetime.date(2024, 1, 1))]))
    assert len(back) == 1 and r2.predicates == []
