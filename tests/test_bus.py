"""Unit tests: the skopje_bus message-bus source (sources/bus.py) —
the Kafka offset contract (dense per-partition record offsets,
half-open ranges, deterministic replay, {partition: next_offset}
checkpoints) on the file-backed broker layout."""

from __future__ import annotations

import json
import os
import time

import pytest

from skopje_spark.sources.bus import bus_append, bus_offsets


def _mk_topic(path, per_part=25, parts=3, seg=10):
    for p in range(parts):
        recs = [(f"k{p}-{i}", str(p * 1000 + i)) for i in range(per_part)]
        bus_append(str(path), recs, partition=p, max_segment_records=seg)
    return str(path)


def test_bus_layout_offsets_and_segment_roll(tmp_path):
    topic = _mk_topic(tmp_path / "t", per_part=25, parts=2, seg=10)
    assert bus_offsets(topic) == {"0": 25, "1": 25}
    # segments rolled at 10 records with base offsets in the name
    segs = sorted(os.listdir(os.path.join(topic, "partition=0")))
    assert segs == ["seg-0.ndjson", "seg-10.ndjson", "seg-20.ndjson"]
    # appends continue the offset sequence
    assert bus_append(topic, [("k", "v")], partition=0,
                      max_segment_records=10) == 26


def test_bus_batch_read_and_offset_slicing(spark, tmp_path):
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    topic = _mk_topic(tmp_path / "t", per_part=20, parts=3, seg=7)
    df = spark.read.format("skopje_bus").option("path", topic).load()
    assert df.count() == 60
    rows = df.collect()
    # Kafka-shaped rows: dense offsets per partition, ordered values
    by_p = {}
    for r in rows:
        by_p.setdefault(r["partition"], []).append((r["offset"], r["value"]))
    for p, rs in by_p.items():
        rs.sort()
        assert [o for o, _ in rs] == list(range(20))
        assert [v for _, v in rs] == [str(p * 1000 + i) for i in range(20)]
    # half-open range slicing straddling segment boundaries
    sliced = (
        spark.read.format("skopje_bus")
        .option("path", topic)
        .option("startingOffsets", json.dumps({"0": 5, "1": 19, "2": 20}))
        .option("endingOffsets", json.dumps({"0": 16, "1": 20, "2": 20}))
        .load()
        .collect()
    )
    got = sorted((r["partition"], r["offset"]) for r in sliced)
    assert got == [(0, o) for o in range(5, 16)] + [(1, 19)]
    # deterministic replay: same range, same records
    again = (
        spark.read.format("skopje_bus")
        .option("path", topic)
        .option("startingOffsets", json.dumps({"0": 5, "1": 19, "2": 20}))
        .option("endingOffsets", json.dumps({"0": 16, "1": 20, "2": 20}))
        .load()
        .collect()
    )
    assert sorted(map(tuple, again)) == sorted(map(tuple, sliced))


def test_bus_torn_write_invisible(spark, tmp_path):
    """A record without its newline (a producer mid-write) does not
    exist yet — no torn reads, and the offset end excludes it."""
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    topic = str(tmp_path / "t")
    bus_append(topic, [("a", "1"), ("b", "2")], partition=0)
    seg = os.path.join(topic, "partition=0", "seg-0.ndjson")
    with open(seg, "ab") as f:
        f.write(b'{"k": "c", "v": "3"')  # no newline: torn
    assert bus_offsets(topic) == {"0": 2}
    df = spark.read.format("skopje_bus").option("path", topic).load()
    assert sorted(r["value"] for r in df.collect()) == ["1", "2"]


def test_bus_stream_microbatches_and_restart(spark, tmp_path):
    """Streaming: each microbatch sees exactly the new records; a
    restart from the checkpoint resumes at the committed offsets with
    no duplicates and no loss (the exactly-once contract)."""
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    topic = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    # keyed by batch_id: foreachBatch is at-least-once per batch — a
    # stop() racing the commit record legally replays the same batch id
    # on restart, and an exactly-once downstream must be idempotent on
    # it. Distinct batch ids re-delivering a record would still surface
    # as duplicates in the flattened view below.
    batches: dict[int, list[tuple]] = {}
    bus_append(topic, [("a", "1"), ("b", "2")], partition=0)
    bus_append(topic, [("c", "10")], partition=1)

    def sink(batch_df, batch_id):
        batches[batch_id] = [
            (r["partition"], r["offset"], r["value"])
            for r in batch_df.collect()
        ]

    def delivered():
        return sorted(t for rows in batches.values() for t in rows)

    def run_until(n, timeout=60):
        q = (
            spark.readStream.format("skopje_bus")
            .option("path", topic)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + timeout
            while len(delivered()) < n and time.time() < deadline:
                time.sleep(0.5)
        finally:
            q.stop()
        assert len(delivered()) >= n, delivered()

    run_until(3)
    assert delivered() == [(0, 0, "1"), (0, 1, "2"), (1, 0, "10")]
    # new records while the stream is DOWN; restart must pick up
    # exactly the delta
    bus_append(topic, [("d", "3")], partition=0)
    bus_append(topic, [("e", "11"), ("f", "12")], partition=1)
    run_until(6)
    assert delivered() == [
        (0, 0, "1"), (0, 1, "2"), (0, 2, "3"),
        (1, 0, "10"), (1, 1, "11"), (1, 2, "12"),
    ]


def test_bus_empty_and_missing_topic(spark, tmp_path):
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    topic = str(tmp_path / "nope")
    df = spark.read.format("skopje_bus").option("path", topic).load()
    assert df.count() == 0
    with pytest.raises(Exception, match="path"):
        spark.read.format("skopje_bus").load().count()


def test_bus_append_truncates_torn_tail(spark, tmp_path):
    """A crashed producer's partial record is truncated before the
    next append — never fused into the next record (the corruption
    would otherwise poison the segment forever)."""
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    topic = str(tmp_path / "t")
    bus_append(topic, [("a", "1"), ("b", "2")], partition=0)
    seg = os.path.join(topic, "partition=0", "seg-0.ndjson")
    with open(seg, "ab") as f:
        f.write(b'{"k": "c", "v": "3"')  # torn
    nxt = bus_append(topic, [("d", "4")], partition=0)
    assert nxt == 3  # torn record never existed
    df = spark.read.format("skopje_bus").option("path", topic).load()
    got = sorted((r["offset"], r["value"]) for r in df.collect())
    assert got == [(0, "1"), (1, "2"), (2, "4")]


def test_bus_partial_ending_offsets_default_latest(spark, tmp_path):
    """Partitions absent from an explicit endingOffsets map read to
    their LATEST — a partial map must not silently drop them."""
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    topic = _mk_topic(tmp_path / "t", per_part=6, parts=3, seg=10)
    df = (
        spark.read.format("skopje_bus")
        .option("path", topic)
        .option("endingOffsets", json.dumps({"0": 2}))
        .load()
    )
    got = sorted((r["partition"], r["offset"]) for r in df.collect())
    assert got == (
        [(0, 0), (0, 1)]
        + [(1, o) for o in range(6)]
        + [(2, o) for o in range(6)]
    )


def test_bus_feeds_live_pipeline_end_to_end(spark, tmp_path):
    """Composition: skopje_bus microbatches land in a versioned
    bronze table (exactly-once via Spark's commit log + blind
    appends), and a LivePipeline append node incrementally refines
    bronze → silver off the change feed — the full ingest loop, three
    tiers composed, no duplicates across stream restarts."""
    import time

    from pyspark.sql import functions as F

    from skopje_spark.pipeline_live import LiveNode, LivePipeline
    from skopje_spark.sinks.versioned import (
        latest_version,
        versioned_append,
        versioned_read,
        versioned_write,
    )
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    topic = str(tmp_path / "topic")
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    bus_append(topic, [("a", "5"), ("b", "7")], partition=0)
    bus_append(topic, [("c", "11")], partition=1)

    def to_bronze(batch_df, batch_id):
        rows = batch_df.select(
            "partition", "offset", "key",
            F.col("value").cast("long").alias("v"),
        )
        if latest_version(bronze) is None:
            versioned_write(rows, bronze)
        elif rows.limit(1).count():
            versioned_append(spark, bronze, rows, change_feed=True)

    def run_stream(expect_rows, timeout=60):
        q = (
            spark.readStream.format("skopje_bus")
            .option("path", topic)
            .load()
            .writeStream.foreachBatch(to_bronze)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + timeout
            while time.time() < deadline:
                if (
                    latest_version(bronze) is not None
                    and versioned_read(spark, bronze).count() >= expect_rows
                ):
                    break
                time.sleep(0.5)
        finally:
            q.stop()

    run_stream(3)
    pipe = LivePipeline([
        LiveNode(
            name="silver", target=silver, inputs=[bronze],
            transform=lambda s, f: f[bronze].withColumn(
                "v2", F.col("v") * 2
            ),
            input_keys={bronze: ["partition", "offset"]},
        )
    ])
    assert pipe.run(spark)["silver"]["action"] == "build"
    assert versioned_read(spark, silver).count() == 3
    # more bus traffic while everything is down; restart picks up
    # exactly the delta end to end
    bus_append(topic, [("d", "13")], partition=0)
    run_stream(4)
    assert versioned_read(spark, bronze).count() == 4
    r = pipe.run(spark)["silver"]
    assert r["action"] == "append"
    got = {(x["key"], x["v"], x["v2"])
           for x in versioned_read(spark, silver).collect()}
    assert got == {("a", 5, 10), ("b", 7, 14), ("c", 11, 22),
                   ("d", 13, 26)}
    # idle: the whole chain no-ops
    assert pipe.run(spark)["silver"]["action"] == "noop"
