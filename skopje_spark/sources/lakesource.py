"""Spark Python DataSources over the versioned table store — the
lake's native connector surface.

The versioned store (:mod:`skopje_spark.sinks.versioned`) is normally
driven through its function API (``versioned_read`` / ``versioned_
upsert`` / ``versioned_change_feed``). These DataSources expose the
same tables through Spark's own connector contract, so a versioned
table composes with everything that speaks ``spark.read`` /
``spark.readStream`` — SQL, joins, streaming pipelines — without
importing this package's functions:

- :class:`VersionedTableDataSource` (``skopje_versioned``) — batch
  scan of a snapshot. Planning happens DRIVER-side from the kilobyte
  manifest: ``pushFilters`` turns simple comparison predicates into
  footer-stats file pruning (the pruned files never become input
  partitions), every surviving file is one executor partition, and
  the partition read applies deletion vectors, physical→logical
  column renames, and additive-evolution NULL-fill in Arrow batches
  (pyarrow end to end, no row-at-a-time Python).
- :class:`VersionedChangesDataSource` (``skopje_versioned_changes``)
  — a STREAMING source serving the table's change data feed:
  offsets are commit versions (checkpointed by Spark, so restarts
  resume exactly-once), each micro-batch reads the recorded ``cdc-*``
  pool files for the commit range — O(changes) however large the
  table — and an optional initial-snapshot batch serves the starting
  version's full content as ``insert`` rows (Delta's
  ``readChangeFeed`` + ``startingVersion`` contract).

Correctness stance on pushdown: accepted filters are used ONLY to
prune files (conservative by footer stats); every filter is yielded
back to Spark for exact re-application, so a stats-imprecise skip can
narrow IO but never change results.

Scale: both sources decide everything from driver-side manifests
(O(#files) metadata, no job to plan), ship one file per task, and
keep the data path in Arrow. A 100 TB table with a narrow predicate
plans in milliseconds and opens only the matching files; the CDF
stream never rescans the base table.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

# metadata-only commit ops: they move or relabel bytes but produce
# zero logical changes, so the CDF stream skips them outright
# (op markers as written by sinks/versioned.py)
_ZERO_CHANGE_OPS = {"compact", "rename_column", "set_constraint",
                    "drop_constraint"}


def _logical_schema(man: dict) -> StructType:
    """The manifest's schema with per-field metadata (the physical
    name mapping) STRIPPED — connector users see logical names only."""
    src = StructType.fromJson(man["schema"])
    out = StructType()
    for f in src.fields:
        out.add(f.name, f.dataType, f.nullable)
    return out


def _mapping(man: dict) -> dict[str, str]:
    """logical → physical parquet name (identity unless renamed)."""
    return {
        f["name"]: (f.get("metadata") or {}).get("physical", f["name"])
        for f in man["schema"]["fields"]
    }


def _overlaps(entry: dict, stats_col: str, lo, hi) -> bool:
    """Conservative file-interval test: True unless the entry's footer
    stats PROVE no row can satisfy ``lo <= col <= hi`` (either bound
    may be None = unbounded). Mirrors versioned._interval_split with
    open-bound support."""
    if entry.get("rows") == 0:
        return False
    st = (entry.get("stats") or {}).get(stats_col)
    if not st:
        return True
    mn, mx = st.get("min"), st.get("max")
    isnan = lambda x: isinstance(x, float) and x != x  # noqa: E731
    if mn is None or mx is None or isnan(mn) or isnan(mx):
        return True
    try:
        if lo is not None and mx < lo:
            return False
        if hi is not None and mn > hi:
            return False
    except TypeError:  # cross-type comparison — prove nothing
        return True
    return True


def _bounds_from_filters(
    filters: list[Filter], columns: set[str]
) -> dict[str, tuple]:
    """Fold simple comparison filters into per-column [lo, hi]
    intervals usable against footer stats. Only single-column
    comparisons with stats-safe literals (bool/int/float/str)
    contribute; everything else is ignored (Spark re-applies all
    filters anyway)."""
    bounds: dict[str, tuple] = {}

    def tighten(col: str, lo, hi) -> None:
        cur_lo, cur_hi = bounds.get(col, (None, None))
        if lo is not None and (cur_lo is None or lo > cur_lo):
            cur_lo = lo
        if hi is not None and (cur_hi is None or hi < cur_hi):
            cur_hi = hi
        bounds[col] = (cur_lo, cur_hi)

    for f in filters:
        attr = getattr(f, "attribute", None)
        col = attr[0] if attr is not None and len(attr) == 1 else None
        if col is None or col not in columns:
            continue
        v = getattr(f, "value", None)
        if not isinstance(v, (bool, int, float, str)):
            continue
        if isinstance(v, float) and v != v:  # NaN fails every ordered cmp
            continue
        if isinstance(f, EqualTo):
            tighten(col, v, v)
        elif isinstance(v, bool):
            continue  # no ordering on booleans beyond equality
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            tighten(col, v, None)
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            tighten(col, None, v)
    return bounds


@dataclass
class _FilePartition(InputPartition):
    table: str
    rel_path: str
    dv_files: list[str] = field(default_factory=list)
    version: int | None = None
    change_type: str | None = None
    # logical→physical names of the partition's own manifest epoch,
    # resolved driver-side (rename-without-rewrite support)
    mapping: dict = field(default_factory=dict)


def _read_entry_arrow(
    table_dir: str,
    rel_path: str,
    dv_files: list[str],
    logical: StructType,
    mapping: dict[str, str],
    extra: dict | None = None,
):
    """Read one pooled parquet file as Arrow batches aligned to the
    LOGICAL schema: deletion-vector positions masked out, physical
    column names renamed back, columns the file predates NULL-filled,
    ``extra`` literal columns (CDF metadata) appended. Pure
    pyarrow/numpy — runs in the executor task, no JVM round-trips."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    t = pq.read_table(os.path.join(table_dir, rel_path))
    if dv_files:
        base = os.path.basename(rel_path)
        dead: set[int] = set()
        for dv in dv_files:
            dvt = pq.read_table(
                os.path.join(table_dir, dv), columns=["__file", "__pos"]
            )
            files = dvt.column("__file").to_pylist()
            poss = dvt.column("__pos").to_pylist()
            dead.update(p for f, p in zip(files, poss) if f == base)
        if dead:
            mask = np.ones(t.num_rows, dtype=bool)
            mask[np.fromiter(dead, dtype=np.int64)] = False
            t = t.filter(pa.array(mask))
    target = to_arrow_schema(logical)
    cols = []
    for i, f in enumerate(logical.fields):
        phys = mapping.get(f.name, f.name)
        at = target.field(i).type
        if phys in t.column_names:
            col = t.column(phys)
            if col.type != at:
                col = col.cast(at)
        else:  # additive evolution: the file predates this column
            col = pa.nulls(t.num_rows, type=at)
        cols.append(col)
    names = [f.name for f in logical.fields]
    if extra:
        for name, (value, at) in extra.items():
            cols.append(pa.array([value] * t.num_rows, type=at))
            names.append(name)
    out = pa.table(dict(zip(names, cols)))
    yield from out.to_batches(max_chunksize=65536)


class VersionedTableReader(DataSourceReader):
    def __init__(self, options: dict[str, str]) -> None:
        from skopje_spark.sinks.versioned import (
            _read_manifest,
            latest_version,
            version_as_of_timestamp,
        )

        self.table = options.get("path", "")
        if not self.table:
            raise ValueError("skopje_versioned: provide option 'path'")
        committed = latest_version(self.table)
        if committed is None:
            raise FileNotFoundError(
                f"no committed version at {self.table}"
            )
        if options.get("timestampasof") is not None:
            v = version_as_of_timestamp(
                self.table, float(options["timestampasof"])
            )
        else:
            v = int(options.get("versionasof", committed))
        self.version = v
        self.man = _read_manifest(self.table, v)
        self.logical = _logical_schema(self.man)
        self.map = _mapping(self.man)
        self.entries = list(self.man["files"])

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """File pruning, not filter absorption: fold comparison
        filters into per-column intervals, drop files whose footer
        stats prove disjointness, then yield EVERY filter back so
        Spark re-applies exact predicates. Conservative stats can
        only widen IO, never change results."""
        bounds = _bounds_from_filters(
            filters, {f.name for f in self.logical.fields}
        )
        for col, (lo, hi) in bounds.items():
            sk = self.map.get(col, col)
            self.entries = [
                e for e in self.entries if _overlaps(e, sk, lo, hi)
            ]
        yield from filters

    def partitions(self) -> Sequence[InputPartition]:
        # one pooled file per task — the manifest is the split index
        return [
            _FilePartition(
                table=self.table,
                rel_path=e["path"],
                dv_files=list(e.get("dv_files", [])),
            )
            for e in self.entries
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        yield from _read_entry_arrow(
            partition.table,
            partition.rel_path,
            partition.dv_files,
            self.logical,
            self.map,
        )


class VersionedTableDataSource(DataSource):
    """``spark.read.format("skopje_versioned").option("path", p)``.

    Batch connector over a versioned table snapshot: manifest-planned
    (schema, splits, and stats pruning all from kilobytes of driver
    metadata), DV-aware, rename-aware, evolution-aware. Options:
    ``path`` (table dir, required), ``versionAsOf`` (time travel),
    ``timestampAsOf`` (epoch seconds). Result rows are identical to
    ``versioned_read`` — driver-oracled by q_lake_source_read."""

    @classmethod
    def name(cls) -> str:
        return "skopje_versioned"

    def schema(self) -> StructType:
        return VersionedTableReader(dict(self.options)).logical

    def reader(self, schema: StructType) -> VersionedTableReader:
        return VersionedTableReader(dict(self.options))


class VersionedChangesStreamReader(DataSourceStreamReader):
    """Offsets are COMMIT VERSIONS: ``{"version": n}`` means "changes
    through commit n have been served". Each micro-batch plans one
    partition per recorded cdc file in the commit range — executor
    Arrow reads, O(changes). Metadata-only commits contribute
    nothing; a data commit WITHOUT a recorded feed fails loudly
    (option ``allow_unrecorded=true`` downgrades to skipping it)."""

    def __init__(self, schema: StructType, options: dict[str, str]) -> None:
        from skopje_spark.sinks.versioned import latest_version

        self.table = options.get("path", "")
        if not self.table:
            raise ValueError(
                "skopje_versioned_changes: provide option 'path'"
            )
        if latest_version(self.table) is None:
            raise FileNotFoundError(f"no committed version at {self.table}")
        self.start_v = int(options.get("startingversion", "0"))
        self.initial_snapshot = (
            options.get("initialsnapshot", "true").lower() == "true"
        )
        self.allow_unrecorded = (
            options.get("allowunrecorded", "false").lower() == "true"
        )
        self.schema_struct = schema

    def initialOffset(self) -> dict:
        # nothing served yet; the starting version itself is the first
        # batch (its snapshot when initial_snapshot, else its changes)
        return {"version": self.start_v - 1}

    def latestOffset(self) -> dict:
        from skopje_spark.sinks.versioned import latest_version

        return {"version": latest_version(self.table)}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        from skopje_spark.sinks.versioned import (
            _read_manifest,
            snapshot_meta,
        )

        out: list[_FilePartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            if not os.path.isdir(os.path.join(self.table, f"v={v}")):
                raise FileNotFoundError(
                    f"version {v} at {self.table} has been vacuumed — "
                    "the stream's range is gone; restart from a newer "
                    "startingVersion"
                )
            if v == self.start_v and self.initial_snapshot:
                man = _read_manifest(self.table, v)
                out.extend(
                    _FilePartition(
                        table=self.table,
                        rel_path=e["path"],
                        dv_files=list(e.get("dv_files", [])),
                        version=v,
                        change_type="insert",
                        mapping=_mapping(man),
                    )
                    for e in man["files"]
                )
                continue
            op = snapshot_meta(self.table, "op", version=v) or ""
            if op in _ZERO_CHANGE_OPS:
                continue
            cdc_json = snapshot_meta(self.table, "cdc_files", version=v)
            if cdc_json is None:
                if self.allow_unrecorded:
                    continue
                raise ValueError(
                    f"version {v} at {self.table} (op={op or '?'}) has no "
                    "recorded change feed — write with change_feed=True, "
                    "or set allowUnrecorded=true to skip such commits"
                )
            out.extend(
                _FilePartition(
                    table=self.table, rel_path=rel, version=v
                )
                for rel in json.loads(cdc_json)
            )
        return out

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa

        base = StructType()
        for f in self.schema_struct.fields:
            if f.name not in ("_change_type", "_commit_version"):
                base.add(f.name, f.dataType, f.nullable)
        if partition.change_type is not None:
            # snapshot batch: data files, constant change type; extras
            # ordered to match the declared stream schema exactly
            yield from _read_entry_arrow(
                partition.table, partition.rel_path, partition.dv_files,
                base, partition.mapping,
                {
                    "_change_type": (partition.change_type, pa.string()),
                    "_commit_version": (partition.version, pa.int64()),
                },
            )
        else:
            # cdc file: _change_type is a data column in the file
            cdc_schema = StructType(base.fields).add("_change_type", "string")
            yield from _read_entry_arrow(
                partition.table, partition.rel_path, [],
                cdc_schema, {},
                {"_commit_version": (partition.version, pa.int64())},
            )

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing to release


class VersionedChangesDataSource(DataSource):
    """``spark.readStream.format("skopje_versioned_changes")
    .option("path", p)``.

    Streaming change-data-feed source for a versioned table. Options:
    ``path`` (required), ``startingVersion`` (default 0),
    ``initialSnapshot`` (default true: the starting version's full
    content is served once as ``insert`` rows), ``allowUnrecorded``
    (default false: a data commit without a recorded feed is an
    error, not a silent gap). Output columns = table schema +
    ``_change_type`` + ``_commit_version``; restarts resume from
    Spark's checkpointed version offset, so every commit's changes
    are served exactly once."""

    @classmethod
    def name(cls) -> str:
        return "skopje_versioned_changes"

    def schema(self) -> StructType:
        from skopje_spark.sinks.versioned import (
            _read_manifest,
            latest_version,
        )

        path = self.options.get("path", "")
        committed = latest_version(path)
        if committed is None:
            raise FileNotFoundError(f"no committed version at {path}")
        s = _logical_schema(_read_manifest(path, committed))
        return s.add("_change_type", "string").add(
            "_commit_version", "long"
        )

    def streamReader(
        self, schema: StructType
    ) -> VersionedChangesStreamReader:
        return VersionedChangesStreamReader(schema, dict(self.options))
