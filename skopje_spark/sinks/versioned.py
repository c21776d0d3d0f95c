"""Versioned parquet table: atomic snapshots, time travel, vacuum.

The reference's load path overwrites table state in place (Postgres
upserts, `/root/reference/src/load/pg.rs:50-117`): history is
destroyed and a reader racing a load sees a half-written table. The
lake-native fix — the core idea behind Delta/Iceberg, reduced to its
parquet-only essentials — is:

- every write lands in a fresh, immutable ``v=N`` snapshot directory;
- a tiny ``_LATEST`` pointer file is swapped via atomic rename
  (os.replace) AFTER the snapshot is fully written;
- readers resolve the pointer first, then scan only that snapshot —
  they never observe partial writes, regardless of write duration;
- old snapshots stay readable (time travel) until ``vacuum``.

Scale: the pointer swap is O(1) metadata no matter the table size —
a 100 TB snapshot commit costs the same rename as a 100 MB one. Data
files are never rewritten by a commit (writers pay only for their own
snapshot), and concurrent readers pin whatever version they resolved,
so long scans are immune to in-flight loads.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_VDIR = re.compile(r"^v=(\d+)$")


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        m = _VDIR.match(d)
        if m and not d.endswith(".tmp"):
            out.append(int(m.group(1)))
    return sorted(out)


def _pointer_path(path: str) -> str:
    return os.path.join(path, "_LATEST")


def latest_version(path: str) -> int | None:
    """Resolve the committed version from the pointer file (not the
    directory listing — a snapshot directory may exist before its
    commit)."""
    try:
        with open(_pointer_path(path)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def versioned_write(df: DataFrame, path: str) -> int:
    """Commit ``df`` as the next snapshot of the table at ``path``;
    returns the new version number.

    The snapshot is written to ``v=N`` in full, then the ``_LATEST``
    pointer is swapped with os.replace — the POSIX-atomic step that
    makes the commit all-or-nothing for readers.
    """
    os.makedirs(path, exist_ok=True)
    current = latest_version(path)
    n = (current + 1) if current is not None else (
        max(_versions(path), default=-1) + 1
    )
    snap = os.path.join(path, f"v={n}")
    df.write.mode("errorifexists").parquet(snap)
    fd, tmp = tempfile.mkstemp(dir=path, prefix="._latest")
    with os.fdopen(fd, "w") as f:
        f.write(str(n))
    os.replace(tmp, _pointer_path(path))
    return n


def versioned_read(
    spark: SparkSession, path: str, *, version: int | None = None
) -> DataFrame:
    """Scan one snapshot: the committed latest by default, or a pinned
    ``version`` (time travel). Uncommitted / vacuumed versions raise."""
    if version is None:
        version = latest_version(path)
        if version is None:
            raise FileNotFoundError(f"no committed version at {path}")
    snap = os.path.join(path, f"v={version}")
    if not os.path.isdir(snap):
        raise FileNotFoundError(f"version {version} not present at {path}")
    return spark.read.parquet(snap)


def versioned_upsert(
    spark: SparkSession, path: str, updates: DataFrame, keys: list[str]
) -> int:
    """MERGE as a snapshot commit: next version = (current rows not
    matching an update key) ∪ updates. The current snapshot is read,
    never mutated — a failed upsert leaves the table exactly as it was.
    """
    current = versioned_read(spark, path)
    kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    return versioned_write(kept.unionByName(updates), path)


def vacuum(path: str, *, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` committed snapshots (never the
    current pointer target); returns the versions removed. Run it with
    a retention matched to the longest running reader — a reader
    pinned to a vacuumed version fails on its next file open, exactly
    as in Delta."""
    committed = latest_version(path)
    vs = _versions(path)
    keep_set = set(vs[-keep:]) | ({committed} if committed is not None else set())
    removed = []
    for v in vs:
        if v not in keep_set:
            shutil.rmtree(os.path.join(path, f"v={v}"))
            removed.append(v)
    return removed


def versioned_changes(
    spark: SparkSession,
    path: str,
    keys: list[str],
    *,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CDC from time travel: the I/U/D changelog between two committed
    snapshots (``to_version`` defaults to the committed latest) —
    operators/cdc.py's snapshot_diff over the two pinned reads. This
    is the read-side complement of :func:`versioned_upsert`: downstream
    consumers (incremental rollups, replica sync, digest maintenance)
    pull exactly what changed between commits without the writer
    having to emit a changelog. Caveat for digest maintenance
    (quality.table_digest_update): U and D rows carry NEW-side values
    only, so the delete-side BEFORE-images must be fetched by joining
    the changed keys back to the ``from_version`` snapshot — see
    table_digest_update's docstring for the wiring."""
    from skopje_spark.operators.cdc import snapshot_diff

    old = versioned_read(spark, path, version=from_version)
    new = versioned_read(spark, path, version=to_version)
    return snapshot_diff(old, new, keys)
