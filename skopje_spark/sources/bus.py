"""Message-bus source (``skopje_bus``) — the Kafka offset contract on
a file-backed broker.

The reference's runtime pulls from REST endpoints and Postgres; a
production ingest loop at 100 TB pulls from a partitioned message bus.
This module documents and implements that source abstraction AGAINST
KAFKA'S CONTRACT — so swapping the file-backed broker for a real one
changes the transport, not the semantics:

- a TOPIC is a set of numbered PARTITIONS; records within a partition
  are totally ordered and identified by a dense monotone ``offset``
  (a record index, never a byte position);
- a consumer's position is ``{partition: next_offset}`` — exactly the
  shape Spark's Kafka connector checkpoints; ranges are half-open
  ``[start, end)``;
- replaying the same offset range yields the same records (the
  determinism Spark's commit log turns into exactly-once);
- output rows mirror the Kafka connector's schema: ``topic,
  partition, offset, key, value, ts``.

The broker here is an append-only directory layout::

    <topic>/partition=<p>/seg-<base_offset>.ndjson

each segment's name carrying the offset of its first record — offset
lookup is a directory listing plus ONE segment read, never a topic
scan, which is the same log-segment economics Kafka itself uses.
Producers append via :func:`bus_append` (segment roll at
``max_segment_records``); a trailing partial line (a write in
progress) is invisible until its newline lands, so records never tear.

Spark side, one class serves both modes, like the Kafka connector:

- ``spark.readStream.format("skopje_bus").option("path", topic)`` —
  a REAL :class:`DataSourceStreamReader` (not the driver-side Simple
  variant): each microbatch plans one :class:`InputPartition` per bus
  partition, so reads scale with executors; offsets checkpoint
  through Spark's commit log for exactly-once restart.
- ``spark.read.format("skopje_bus")`` with optional
  ``startingOffsets`` / ``endingOffsets`` (JSON ``{partition:
  offset}`` or ``earliest``/``latest``) — the bounded-replay batch
  mode.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

__all__ = ["bus_append", "bus_offsets", "BusDataSource"]

_SEG_RE = re.compile(r"^seg-(\d+)\.ndjson$")

BUS_SCHEMA = (
    "topic string, partition int, offset long, key string, "
    "value string, ts double"
)


def _part_dir(topic: str, p: int) -> str:
    return os.path.join(topic, f"partition={p}")


def _partitions_of(topic: str) -> list[int]:
    if not os.path.isdir(topic):
        return []
    out = []
    for d in os.listdir(topic):
        if d.startswith("partition="):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def _segments(pdir: str) -> list[tuple[int, str]]:
    """[(base_offset, path)] sorted by base."""
    if not os.path.isdir(pdir):
        return []
    segs = []
    for f in os.listdir(pdir):
        m = _SEG_RE.match(f)
        if m:
            segs.append((int(m.group(1)), os.path.join(pdir, f)))
    return sorted(segs)


def _complete_lines(path: str) -> list[bytes]:
    """Records whose newline has landed — a torn trailing write is
    invisible until complete (the no-torn-records contract)."""
    try:
        with open(path, "rb") as f:
            data = f.read()
    except FileNotFoundError:
        return []
    last = data.rfind(b"\n")
    if last < 0:
        return []
    return data[: last + 1].splitlines()


def _partition_end(pdir: str) -> int:
    """Next offset of a partition: last segment's base + its record
    count — one directory listing + one file read, never a log scan."""
    segs = _segments(pdir)
    if not segs:
        return 0
    base, path = segs[-1]
    return base + len(_complete_lines(path))


def bus_offsets(topic: str) -> dict[str, int]:
    """Kafka's end-offsets call: ``{partition: next_offset}``."""
    return {
        str(p): _partition_end(_part_dir(topic, p))
        for p in _partitions_of(topic)
    }


def bus_append(
    topic: str,
    records: Sequence[tuple[str | None, str]],
    *,
    partition: int = 0,
    ts: float = 0.0,
    max_segment_records: int = 1024,
) -> int:
    """Produce ``(key, value)`` records to one partition; returns the
    next offset after the append. Segments roll at
    ``max_segment_records`` with the base offset in the file name, so
    consumers locate any offset without scanning. Records are grouped
    per target segment and written in ONE append each (not one
    open/write/close per record). A torn trailing write from a
    crashed producer (no final newline — invisible to every reader)
    is TRUNCATED away before appending: the partial record never
    became a record, and writing after it would otherwise fuse two
    records into one corrupt line forever."""
    pdir = _part_dir(topic, partition)
    os.makedirs(pdir, exist_ok=True)
    segs = _segments(pdir)
    if segs:
        base, path = segs[-1]
        n = len(_complete_lines(path))
        _truncate_torn_tail(path)
    else:
        base, path, n = 0, os.path.join(pdir, "seg-0.ndjson"), 0
    nxt = base + n
    pend_path, pend = path, []

    def flush():
        if pend:
            with open(pend_path, "ab") as f:
                f.write(b"".join(pend))
            pend.clear()

    for key, value in records:
        if n >= max_segment_records or (
            not pend and not os.path.exists(pend_path)
        ):
            flush()
            base, n = nxt, 0
            pend_path = os.path.join(pdir, f"seg-{base}.ndjson")
        pend.append(
            json.dumps({"k": key, "v": value, "ts": ts}).encode() + b"\n"
        )
        n += 1
        nxt += 1
    flush()
    return nxt


def _truncate_torn_tail(path: str) -> None:
    """Discard a trailing partial line (a crashed producer's torn
    write) so the next append starts on a record boundary."""
    try:
        with open(path, "r+b") as f:
            data = f.read()
            last = data.rfind(b"\n")
            keep = last + 1
            if keep < len(data):
                f.truncate(keep)
    except FileNotFoundError:
        pass


def _read_range(topic: str, p: int, start: int, end: int):
    """Records [start, end) of one partition — segment-pruned by base
    offset, deterministic replay for any fixed range."""
    name = os.path.basename(topic.rstrip("/"))
    segs = _segments(_part_dir(topic, p))
    for i, (base, path) in enumerate(segs):
        nxt_base = segs[i + 1][0] if i + 1 < len(segs) else None
        if nxt_base is not None and nxt_base <= start:
            continue  # wholly before the range
        if base >= end:
            break
        lines = _complete_lines(path)
        for j, line in enumerate(lines):
            off = base + j
            if off < start:
                continue
            if off >= end:
                return
            rec = json.loads(line)
            yield (name, p, off, rec.get("k"), rec.get("v"),
                   float(rec.get("ts", 0.0)))


def _parse_offsets(raw: str | None, topic: str, default: str) -> dict:
    """``earliest`` / ``latest`` / JSON ``{partition: offset}``.
    Partitions ABSENT from an explicit map default to the map's role:
    0 for a starting map, the partition's current end for an ending
    map — a partial endingOffsets must never silently drop the
    unmentioned partitions (Kafka requires them specified; defaulting
    to latest is the lossless reading)."""
    raw = (raw or default).strip()
    if raw == "earliest":
        return {str(p): 0 for p in _partitions_of(topic)}
    if raw == "latest":
        return bus_offsets(topic)
    got = {str(k): int(v) for k, v in json.loads(raw).items()}
    for p in _partitions_of(topic):
        if str(p) not in got:
            got[str(p)] = (
                0 if default == "earliest"
                else _partition_end(_part_dir(topic, p))
            )
    return got


@dataclass
class _BusSlice(InputPartition):
    topic: str
    p: int
    start: int
    end: int


class _BusBatchReader(DataSourceReader):
    def __init__(self, options: dict[str, str]):
        self.topic = options.get("path", "")
        if not self.topic:
            raise ValueError("skopje_bus: provide option 'path'")
        self.start = _parse_offsets(
            options.get("startingoffsets"), self.topic, "earliest"
        )
        self.end = _parse_offsets(
            options.get("endingoffsets"), self.topic, "latest"
        )

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _BusSlice(self.topic, int(p), int(self.start.get(p, 0)), int(e))
            for p, e in sorted(self.end.items(), key=lambda kv: int(kv[0]))
            if int(e) > int(self.start.get(p, 0))
        ] or [_BusSlice(self.topic, -1, 0, 0)]  # empty topic: no rows

    def read(self, part: _BusSlice) -> Iterator[tuple]:
        if part.p < 0:
            return iter(())
        return _read_range(part.topic, part.p, part.start, part.end)


class _BusStreamReader(DataSourceStreamReader):
    """One InputPartition per bus partition per microbatch —
    executor-parallel, with ``{partition: next_offset}`` offsets
    checkpointed by Spark's commit log (exactly-once on restart,
    because ranges replay deterministically)."""

    def __init__(self, options: dict[str, str]):
        self.topic = options.get("path", "")
        if not self.topic:
            raise ValueError("skopje_bus: provide option 'path'")
        self._initial = _parse_offsets(
            options.get("startingoffsets"), self.topic, "earliest"
        )

    def initialOffset(self) -> dict:
        return dict(self._initial)

    def latestOffset(self) -> dict:
        latest = bus_offsets(self.topic)
        # partitions may be created after the stream starts: carry
        # every known partition forward so offsets only ever widen
        for p, o in self._initial.items():
            latest.setdefault(p, o)
        return latest

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return [
            _BusSlice(self.topic, int(p), int(start.get(p, 0)), int(e))
            for p, e in sorted(end.items(), key=lambda kv: int(kv[0]))
            if int(e) > int(start.get(p, 0))
        ] or [_BusSlice(self.topic, -1, 0, 0)]

    def read(self, part: _BusSlice) -> Iterator[tuple]:
        if part.p < 0:
            return iter(())
        return _read_range(part.topic, part.p, part.start, part.end)

    def commit(self, end: dict) -> None:
        # the broker is stateless for consumers (Kafka semantics:
        # progress lives in the consumer's checkpoint, not the log)
        pass


class BusDataSource(DataSource):
    """``skopje_bus`` — see module docstring. Batch and streaming
    reads over the same topic layout, Kafka-shaped offsets and rows."""

    @classmethod
    def name(cls) -> str:
        return "skopje_bus"

    def schema(self) -> str:
        return BUS_SCHEMA

    def reader(self, schema: StructType) -> _BusBatchReader:
        return _BusBatchReader(
            {k.lower(): v for k, v in self.options.items()}
        )

    def streamReader(self, schema: StructType) -> _BusStreamReader:
        return _BusStreamReader(
            {k.lower(): v for k, v in self.options.items()}
        )
