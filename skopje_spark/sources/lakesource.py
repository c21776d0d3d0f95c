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
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

# metadata-only commit ops: they move or relabel bytes but produce
# zero logical changes, so the CDF stream skips them outright
# (op markers as written by sinks/versioned.py)
_ZERO_CHANGE_OPS = {"compact", "rename_column", "set_constraint",
                    "drop_constraint", "analyze", "drop_column",
                    "widen_column", "set_partition_spec", "value_index",
                    "refold_refs", "tag", "drop_ref", "branch"}


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
) -> tuple[dict[str, tuple], dict[str, set]]:
    """Fold simple comparison filters into per-column [lo, hi]
    intervals usable against footer stats, plus per-column IN-list
    value SETS for exact membership pruning of single-valued
    (partition-layout) files. Only single-column comparisons with
    stats-safe literals (bool/int/float/str) contribute; everything
    else is ignored (Spark re-applies all filters anyway)."""
    bounds: dict[str, tuple] = {}
    in_sets: dict[str, set] = {}

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
        import datetime as _dt

        from skopje_spark.sinks.versioned import _stat_encode

        if isinstance(f, In):
            # IN-list: the [min, max] interval of the values prunes
            # conservatively, and the value SET exactly skips
            # single-valued files (partition layout: min == max) —
            # a two-day .isin plans exactly those days' files, not
            # the whole span between them
            vals = [
                _stat_encode(x) for x in (getattr(f, "value", None) or ())
            ]
            if vals and all(
                isinstance(x, (bool, int, float, str)) for x in vals
            ) and not any(isinstance(x, float) and x != x for x in vals):
                try:
                    tighten(col, min(vals), max(vals))
                except TypeError:
                    pass
                if col in in_sets:
                    in_sets[col] &= set(vals)  # conjunct INs intersect
                else:
                    in_sets[col] = set(vals)
            continue
        v = _stat_encode(getattr(f, "value", None))  # dates → ISO strings
        # datetimes pass through RAW: no file carries timestamp stats
        # (cross-type compares prove nothing and stay conservative),
        # but a hidden date() partition derives a day bound from them
        if not isinstance(v, (bool, int, float, str, _dt.datetime)):
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
    return bounds, in_sets


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
        mask = np.ones(t.num_rows, dtype=bool)
        hit = False
        for dv in dv_files:
            # row-group pushdown on the file id, numpy positions —
            # a mass-delete's vectors never become Python objects
            dvt = pq.read_table(
                os.path.join(table_dir, dv),
                columns=["__pos"],
                filters=[("__file", "==", base)],
            )
            pos = dvt.column("__pos").to_numpy(zero_copy_only=False)
            if len(pos):
                mask[pos.astype(np.int64)] = False
                hit = True
        if hit:
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


def _ref_overlaps(ref: dict, stats_col: str, lo, hi, vals=None) -> bool:
    """Segment-ref-level twin of :func:`_overlaps`: True unless the
    ref's AGGREGATE [min, max] on ``stats_col`` proves every member
    file disjoint from [lo, hi] (either bound may be None), or — for
    a pushed equality / IN value-set ``vals`` — the ref's value-set
    union excludes every sought value. Refs without usable aggregate
    stats stay conservative; cross-type membership (an int bound
    against string stats) proves nothing (see
    versioned._member_provable)."""
    from skopje_spark.sinks.versioned import _bloom_absent, _member_provable

    st = (ref.get("stats") or {}).get(stats_col)
    if not st:
        return True
    bset = vals
    if bset is None and lo is not None and lo == hi:
        bset = {lo}
    evals = st.get("vals")
    if evals is not None and bset is not None:
        try:
            if _member_provable(evals, bset) and not (
                set(evals) & set(bset)
            ):
                return False  # union excludes the set: never opened
        except TypeError:
            pass
    bl = st.get("bloom")
    if bl is not None and bset is not None and _bloom_absent(bl, bset):
        return False  # segment bitmap union excludes every value
    mn, mx = st.get("min"), st.get("max")
    isnan = lambda x: isinstance(x, float) and x != x  # noqa: E731
    if mn is None or mx is None or isnan(mn) or isnan(mx):
        return True
    try:
        if lo is not None and mx < lo:
            return False
        if hi is not None and mn > hi:
            return False
    except TypeError:
        return True
    return True


class VersionedTableReader(DataSourceReader):
    def __init__(self, options: dict[str, str]) -> None:
        from skopje_spark.sinks.versioned import (
            _MANIFEST_NAME,
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
        if options.get("ref") is not None:
            # named ref: tag → pinned version of this table, branch →
            # the branch table's committed latest (same resolution as
            # versioned_read(ref=...))
            if (options.get("versionasof") is not None
                    or options.get("timestampasof") is not None):
                raise ValueError(
                    "skopje_versioned: pass ref OR "
                    "versionAsOf/timestampAsOf, not both"
                )
            from skopje_spark.sinks.versioned import _resolve_ref

            self.table, v = _resolve_ref(self.table, options["ref"])
        elif options.get("timestampasof") is not None:
            v = version_as_of_timestamp(
                self.table, float(options["timestampasof"])
            )
        else:
            v = int(options.get("versionasof", committed))
        self.version = v
        # plan from the TOP-LEVEL manifest only — segment files are
        # opened lazily, and pushFilters prunes whole segments from
        # their kilobyte aggregate stats before any is parsed. At
        # 800k files that is the difference between parsing a couple
        # of segments and parsing the whole manifest per planned scan.
        with open(
            os.path.join(self.table, f"v={v}", _MANIFEST_NAME)
        ) as f:
            self.man = json.load(f)
        self.logical = _logical_schema(self.man)
        self.map = _mapping(self.man)
        self._bounds: dict[str, tuple] = {}
        self._in_sets: dict[str, set] = {}
        # hidden date() partitions: source column → virtual target,
        # so a pushed raw-timestamp filter can skip day partitions
        from skopje_spark.sinks.versioned import (
            _parse_partition_spec,
            table_partition_specs,
        )

        # spec UNION (current + historical epochs), so a pushed
        # raw-timestamp filter keeps pruning old-epoch day files
        # after the table evolved to a different layout
        from skopje_spark.sinks.versioned import _is_mono

        union_spec = _parse_partition_spec(
            table_partition_specs(self.table, version=v)
        )
        # monotone transforms: source → [(target, transform)] — one
        # source can feed several targets across spec epochs
        self._derived: dict[str, list] = {}
        for t, s, tr in union_spec:
            if _is_mono(tr):
                self._derived.setdefault(s, []).append((t, tr))
        # bucket transforms: a pushed point/IN filter on the source
        # key derives the exact bucket(s) driver-side (zlib.crc32
        # twin of the write expression — no job)
        self._bucketed = {
            s: (t, int(tr[len("bucket["):-1]))
            for t, s, tr in union_spec
            if tr.startswith("bucket[")
        }
        # reader metrics (inspectable by tests/operators): how many
        # manifest segments the plan opened vs carried unopened
        self.segments_total = len(self.man.get("segments", [])) or 1
        self.segments_opened: int | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """File pruning, not filter absorption: fold comparison
        filters into per-column intervals, drop manifest SEGMENTS
        whose aggregate stats prove disjointness (never opened), then
        drop files within the surviving segments by footer stats, and
        finally yield EVERY filter back so Spark re-applies exact
        predicates. Conservative stats can only widen IO, never
        change results."""
        self._bounds, self._in_sets = _bounds_from_filters(
            filters, {f.name for f in self.logical.fields}
        )
        yield from filters

    def _resolve_entries(self) -> list[dict]:
        """Materialize the (segment-pruned, then file-pruned) entry
        list for this scan; records the segment-open metrics."""
        import datetime as _dt

        phys_bounds = [
            (self.map.get(col, col), lo, hi)
            for col, (lo, hi) in self._bounds.items()
        ]

        from skopje_spark.sinks.versioned import (
            _bucket_bound_ok,
            _bucket_of,
            _derived_value,
            _stat_encode,
        )

        dtypes = {f.name: f.dataType for f in self.logical.fields}

        def _derive(tr, v, src_type):
            """(value, ok): derived stats-domain value of a monotone
            transform for one bound side; None value with ok=True
            keeps an open side open."""
            if v is None:
                return None, True
            d = _derived_value(tr, v, src_type)
            if d is None:
                return None, False
            return _stat_encode(d), True

        def _bsafe(col, v):
            # bucket derives only from a bound whose Python type
            # matches the source column type (the cross-type-proves-
            # nothing discipline — see versioned._bucket_bound_ok)
            return _bucket_bound_ok(v, dtypes.get(col))

        bucket_sets: list[tuple[str, set]] = []
        for col, (lo, hi) in self._bounds.items():
            for target, tr in self._derived.get(col, []):
                dlo, ok_lo = _derive(tr, lo, dtypes.get(col))
                dhi, ok_hi = _derive(tr, hi, dtypes.get(col))
                if ok_lo and ok_hi and not (dlo is None and dhi is None):
                    # monotone: src ∈ [lo, hi] ⇒ target ∈ derived
                    # interval — prune-only, Spark re-applies the
                    # exact source filter on the survivors
                    phys_bounds.append((target, dlo, dhi))
            bt = self._bucketed.get(col)
            if (
                bt is not None and lo == hi and lo is not None
                and _bsafe(col, lo)
            ):
                # bucket is not monotone: only a POINT bound derives
                btarget, n = bt
                b = _bucket_of(lo, n)
                phys_bounds.append((btarget, b, b))
        for col, vals in self._in_sets.items():
            bt = self._bucketed.get(col)
            if bt is not None and all(_bsafe(col, v) for v in vals):
                btarget, n = bt
                bucket_sets.append(
                    (btarget, {_bucket_of(v, n) for v in vals})
                )
        # membership sets (physical name → sought values): derived
        # bucket sets, pushed IN lists, and pushed equalities — used
        # at BOTH tiers: segment-ref value-set unions close whole
        # segments of scattered categoricals the interval fold never
        # could, then per-file sets prune within opened segments
        member_sets: list[tuple[str, set]] = list(bucket_sets)
        for col, vals in self._in_sets.items():
            member_sets.append((self.map.get(col, col), set(vals)))
        for col, (lo, hi) in self._bounds.items():
            if lo is not None and lo == hi:  # pushed equality
                member_sets.append((self.map.get(col, col), {lo}))

        if "files" in self.man:  # legacy flat manifest
            entries = list(self.man["files"])
            self.segments_opened = 1
        else:
            ref_units = [
                (sk, lo, hi, None) for sk, lo, hi in phys_bounds
            ] + [(sk, None, None, vals) for sk, vals in member_sets]
            entries = []
            opened = 0
            for ref in self.man["segments"]:
                if any(
                    not _ref_overlaps(ref, sk, lo, hi, vs)
                    for sk, lo, hi, vs in ref_units
                ):
                    continue  # proven disjoint: never opened
                opened += 1
                with open(os.path.join(self.table, ref["path"])) as f:
                    entries.extend(json.load(f))
            self.segments_opened = opened
        for sk, lo, hi in phys_bounds:
            entries = [e for e in entries if _overlaps(e, sk, lo, hi)]

        # exact membership pruning where the manifest pins a file's
        # values: single-valued partition files (min == max) AND
        # recorded per-file value sets (versioned_value_index) —
        # mirrors the native versioned_read_where; stat-less /
        # multi-valued files stay conservative candidates, Spark
        # re-applies the exact filter
        from skopje_spark.sinks.versioned import _value_set_disjoint

        for sk, vals in member_sets:
            entries = [
                e for e in entries
                if not _value_set_disjoint(
                    (e.get("stats") or {}).get(sk), vals
                )
            ]
        return entries

    def partitions(self) -> Sequence[InputPartition]:
        # one pooled file per task — the manifest is the split index
        return [
            _FilePartition(
                table=self.table,
                rel_path=e["path"],
                dv_files=list(e.get("dv_files", [])),
            )
            for e in self._resolve_entries()
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

    def writer(
        self, schema: StructType, overwrite: bool
    ) -> "VersionedTableWriter":
        return VersionedTableWriter(schema, dict(self.options), overwrite)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> "VersionedStreamWriter":
        return VersionedStreamWriter(schema, dict(self.options))


def cluster_for_layout(
    df, spec_or_path, *, num_partitions: int | None = None,
    sort: bool = True,
):
    """Pre-shuffle a DataFrame so a partitioned connector write emits
    the MINIMAL file count — Iceberg's ``write.distribution-mode=hash``
    as an explicit step (a Python DataSource cannot demand a
    distribution from Spark, so the shuffle must happen before
    ``df.write``). Rows are hash-repartitioned on the layout's derived
    partition tuple — identity columns and hidden transforms
    (``date()``/``month()``/``hour()``/``bucket(N)``/``truncate(W)``)
    via the same driver-side expressions the native write path stages
    with — so every tuple lands in exactly one task, and (with
    ``sort=True``) tuples arrive contiguously, keeping the fanout
    writer at ONE live ParquetWriter regardless of ``maxOpenWriters``:
    one pool file per partition tuple, the floor.

    ``spec_or_path``: a spec list (``["lang", "day=date(ts)"]``) or an
    existing table path (its committed layout is read). Unpartitioned
    specs return ``df`` unchanged. Skew note: one giant partition
    tuple serializes into one task under hash distribution — exactly
    Iceberg's tradeoff; leave the frame unclustered (fanout handles
    any order) or split the hot tuple upstream when that bites."""
    from pyspark.sql import functions as F

    from skopje_spark.sinks.versioned import (
        _hidden_expr,
        _parse_partition_spec,
        table_partitioning,
    )

    if isinstance(spec_or_path, str):
        spec = table_partitioning(spec_or_path)
    else:
        spec = list(spec_or_path or [])
    parsed = _parse_partition_spec(spec)
    if not parsed:
        return df
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    exprs = []
    for target, source, transform in parsed:
        if source not in dtypes:
            raise KeyError(
                f"partition source column {source!r} not in frame "
                f"columns {sorted(df.columns)}"
            )
        if transform == "identity":
            exprs.append(F.col(source))
        else:
            exprs.append(_hidden_expr(transform, F.col(source),
                                      dtypes[source])[0])
    out = (
        df.repartition(num_partitions, *exprs)
        if num_partitions
        else df.repartition(*exprs)
    )
    return out.sortWithinPartitions(*exprs) if sort else out


@dataclass
class _PooledFile(WriterCommitMessage):
    # manifest entries staged by one task: one for an unpartitioned
    # table, one PER PARTITION TUPLE seen by the task (fanout writer),
    # empty for an empty task
    entries: list = field(default_factory=list)


def _partition_shadow_values(table, parsed_spec, mapping, col_types):
    """Per-row transformed partition values for an Arrow table, one
    list per spec entry, as JSON-safe scalars in the canonical stats
    domain (dates → ISO strings, buckets → ints): the executor-side
    twin of _stage_data_files' shadow expressions. numpy/pyarrow
    only — no JVM, no per-row Python except over UNIQUE values for
    the bucket hash."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from skopje_spark.sinks.versioned import _bucket_of

    def _temporal_labels(col, kind: str):
        """day/month/hour labels from a temporal Arrow column — the
        zone-free write-expression twins (epoch micros for tz-aware
        timestamps, wall micros for NTZ; dates are already days)."""
        t = col.type
        epoch = np.datetime64("1970-01-01")
        if pa.types.is_date(t):
            pyvals = col.to_pylist()
            if kind == "day":
                return [None if v is None else v.isoformat()
                        for v in pyvals]
            return [None if v is None else v.isoformat()[:7]
                    for v in pyvals]  # month; hour refused at init
        unit = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[t.unit]
        raw = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        if kind == "hour":
            hours = np.floor_divide(np.nan_to_num(raw), 3600 * unit)
            return [
                f"{epoch + np.timedelta64(int(h) // 24, 'D')}"
                f"-{int(h) % 24:02d}" if ok else None
                for h, ok in zip(hours, valid)
            ]
        days = np.floor_divide(np.nan_to_num(raw), 86400 * unit)
        labels = [
            str(epoch + np.timedelta64(int(d), "D")) if ok else None
            for d, ok in zip(days, valid)
        ]
        if kind == "month":
            return [None if x is None else x[:7] for x in labels]
        return labels

    out = []
    for target, source, transform in parsed_spec:
        phys = mapping.get(source, source)
        col = table.column(phys)
        if transform == "identity":
            vals = col.to_pylist()
            import datetime as _dt

            vals = [
                v.isoformat() if isinstance(v, _dt.date) else v
                for v in vals
            ]
        elif transform in ("date", "month", "hour"):
            vals = _temporal_labels(
                col, "day" if transform == "date" else transform
            )
        elif transform.startswith("bucket["):
            n = int(transform[len("bucket["):-1])
            raw = col.to_pylist()
            uniq = {v: _bucket_of(v, n) for v in set(raw)}
            vals = [uniq[v] for v in raw]
        else:  # truncate[W]
            w = int(transform[len("truncate["):-1])
            vals = [
                None if v is None
                else (v[:w] if isinstance(v, str) else v - (v % w))
                for v in col.to_pylist()
            ]
        out.append((target, phys if transform == "identity" else target,
                    vals))
    return out


class VersionedTableWriter(DataSourceArrowWriter):
    """Two-phase commit into the versioned store through Spark's
    writer contract: each executor task streams its Arrow batches
    into ONE uniquely-named pool file (unreferenced until commit —
    a failed job leaves only vacuum-collectable orphans), the driver
    commit validates CHECK constraints and publishes the manifest
    with a CAS retry loop (appends commute, so a lost race against
    any concurrent commit is re-pointed at the new latest — the
    blind-append rebase argument).

    ``mode("append")`` adds the batch to the current snapshot;
    ``mode("overwrite")`` commits a snapshot of only the new files
    (history keeps every prior version — overwrite is a commit, not
    a destruction). Appends must match the table schema by name
    (schema evolution stays an explicit ``versioned_upsert(
    evolve_schema=True)`` decision, not a writer side effect)."""

    def __init__(
        self, schema: StructType, options: dict[str, str], overwrite: bool
    ) -> None:
        from skopje_spark.sinks.versioned import (
            _parse_partition_spec,
            _read_manifest,
            latest_version,
            table_partitioning,
        )

        self.path = options.get("path", "")
        if not self.path:
            raise ValueError("skopje_versioned: provide option 'path'")
        self.overwrite = overwrite
        # fanout memory bound: at most this many ParquetWriters (each
        # holding row-group buffers) open per task. Unclustered input
        # into a fine-grained layout (hour=, bucket(1024)) would
        # otherwise hold hundreds — the LRU eviction closes a tuple's
        # writer and opens a FRESH pool file on next sight (the
        # one-value-per-FILE invariant allows several files per
        # tuple), trading file count for bounded memory, exactly
        # Iceberg's fanout/clustered writer tradeoff.
        self.max_open_writers = int(options.get("maxopenwriters", "32"))
        if self.max_open_writers < 1:
            raise ValueError("maxOpenWriters must be >= 1")
        committed = latest_version(self.path)
        # the table's carried parquet_codec property governs connector
        # writes too (resolved driver-side, shipped with the writer)
        from skopje_spark.sinks.versioned import _table_codec

        self.codec = options.get("compression") or _table_codec(self.path)
        # partitioned tables write through a FANOUT writer (Iceberg's
        # unsorted-stream shape): each task splits its Arrow batches
        # by partition tuple and keeps one pool file per tuple, so
        # the one-value-per-file invariant and exact injected stats
        # survive without a layout shuffle. Creating/overwriting can
        # declare a layout via .option("partitionBy", "a,b=date(ts)").
        import re as _re

        raw_spec = options.get("partitionby")
        # split on TOP-LEVEL commas only — 'b=bucket(4,id)' keeps
        # its inner comma
        declared = [
            s.strip()
            for s in _re.split(r",(?![^()]*\))", raw_spec or "")
            if s.strip()
        ]
        if committed is None or overwrite:
            self.partition_spec = declared
        else:
            self.partition_spec = table_partitioning(self.path)
            # an append inherits the table's layout; a DECLARED spec
            # that conflicts with it would silently produce a layout
            # the user didn't ask for — refuse instead of ignore
            if raw_spec is not None and declared != self.partition_spec:
                raise ValueError(
                    f"partitionBy {declared!r} conflicts with the "
                    f"existing layout {self.partition_spec!r} at "
                    f"{self.path} — appends inherit the table's spec; "
                    "use versioned_set_partition_spec to evolve it"
                )
        self.parsed_spec = _parse_partition_spec(self.partition_spec)
        if committed is None or overwrite:
            # creating / replacing: the DataFrame's schema is the
            # table schema (physical = logical for fresh columns)
            self.schema_json = StructType(
                [f for f in schema.fields]
            ).jsonValue()
            self.map = {f.name: f.name for f in schema.fields}
            self.table_schema = schema
        else:
            man = _read_manifest(self.path, committed)
            table = _logical_schema(man)
            if set(schema.fieldNames()) != set(table.fieldNames()):
                raise ValueError(
                    f"append schema {sorted(schema.fieldNames())} differs "
                    f"from table schema {sorted(table.fieldNames())} at "
                    f"{self.path} — use versioned_upsert(evolve_schema="
                    "True) for schema evolution"
                )
            self.schema_json = man["schema"]
            self.map = _mapping(man)
            self.table_schema = table
        # validate the layout against the frame schema exactly as the
        # native write path would (_stage_data_files' checks)
        from skopje_spark.sinks.versioned import (
            _check_hidden_source,
            _check_partition_type,
        )

        dtypes = {f.name: f.dataType for f in self.table_schema.fields}
        for tg, src, tr in self.parsed_spec:
            if src not in dtypes:
                raise KeyError(
                    f"partition source column {src!r} not in schema "
                    f"{sorted(dtypes)}"
                )
            if tr == "identity":
                _check_partition_type(tg, dtypes[src])
            elif tg in dtypes:
                raise ValueError(
                    f"hidden partition target {tg!r} collides with an "
                    "existing column; pick a fresh name"
                )
            else:
                _check_hidden_source(tr, src, dtypes[src])

    def write(self, iterator) -> _PooledFile:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        from skopje_spark.sinks.versioned import _DATA_DIR, _file_entry

        # physical arrow schema: table column order/types, pool names
        logical_arrow = to_arrow_schema(self.table_schema)
        target = pa.schema(
            [
                pa.field(
                    self.map.get(f.name, f.name),
                    logical_arrow.field(i).type,
                )
                for i, f in enumerate(self.table_schema.fields)
            ]
        )
        pool = os.path.join(self.path, _DATA_DIR)
        os.makedirs(pool, exist_ok=True)
        col_types = {f.name: f.dataType for f in self.table_schema.fields}
        # one open writer per partition tuple (Iceberg fanout writer);
        # the () tuple is the unpartitioned path — same code, one file.
        # Open-writer count is CAPPED (self.max_open_writers): the
        # least-recently-written tuple is closed and finalized, and a
        # fresh pool file opens if that tuple reappears — per-task
        # memory stays O(cap × row-group buffer) on any layout.
        from collections import OrderedDict

        writers: OrderedDict[tuple, tuple] = OrderedDict()
        finalized: list[tuple] = []  # (key, abs, rel) of closed files

        def _writer_for(key: tuple):
            got = writers.get(key)
            if got is not None:
                writers.move_to_end(key)
                return got[0]
            if len(writers) >= self.max_open_writers:
                okey, (ow, oabs, orel) = writers.popitem(last=False)
                ow.close()
                finalized.append((okey, oabs, orel))
            rel = f"{_DATA_DIR}/{uuid.uuid4().hex}-w.parquet"
            abs_path = os.path.join(self.path, rel)
            got = (
                pq.ParquetWriter(
                    abs_path, target,
                    compression=self.codec or "snappy",
                ),
                abs_path, rel,
            )
            writers[key] = got
            return got[0]

        for batch in iterator:
            t = pa.table(batch)
            cols = []
            for i, f in enumerate(self.table_schema.fields):
                col = t.column(f.name)
                at = target.field(i).type
                if col.type != at:
                    col = col.cast(at)
                cols.append(col)
            out = pa.table(dict(zip(target.names, cols)))
            if not self.parsed_spec:
                _writer_for(()).write_table(out)
                continue
            shadows = _partition_shadow_values(
                out, self.parsed_spec, self.map, col_types
            )
            keys = list(zip(*[vals for _, _, vals in shadows]))
            groups: dict[tuple, list[int]] = {}
            for i, k in enumerate(keys):
                groups.setdefault(k, []).append(i)
            for key, idxs in groups.items():
                _writer_for(key).write_table(out.take(idxs))
        # injected stats under the stat key (physical name for
        # identity, virtual target for hidden transforms) — exactly
        # _stage_data_files' contract, so every stats consumer prunes
        # connector-written partitions identically
        pairs = [
            (tg, self.map.get(src, src) if tr == "identity" else tg)
            for tg, src, tr in self.parsed_spec
        ]
        for key, (w, abs_path, rel) in writers.items():
            w.close()
            finalized.append((key, abs_path, rel))
        entries = []
        for key, abs_path, rel in finalized:
            e = _file_entry(abs_path, rel)
            if self.parsed_spec:
                part: dict = {}
                stats = e.setdefault("stats", {})
                for (target_name, stat_key), val in zip(pairs, key):
                    part[target_name] = val
                    if val is None:
                        stats.pop(stat_key, None)
                    else:
                        stats[stat_key] = {
                            "min": val, "max": val, "nulls": 0
                        }
                e["partition"] = part
            entries.append(e)
        return _PooledFile(entries=entries)

    def commit(self, messages) -> None:
        from pyspark.sql import SparkSession

        from skopje_spark.sinks.versioned import (
            CommitConflict,
            _commit_manifest,
            _enforce_constraints,
            latest_version,
            snapshot_meta,
        )

        entries = [e for m in messages if m for e in (m.entries or [])]
        base0 = latest_version(self.path)
        enforced_marker = (
            snapshot_meta(self.path, "constraints", version=base0)
            if base0 is not None
            else None
        )
        if entries:
            # commit runs on a driver callback thread where the active
            # session may be unset — getOrCreate rebinds the existing
            # one; constraint enforcement must never silently skip
            from skopje_spark.sinks.versioned import _maintain_value_index

            spark = (
                SparkSession.getActiveSession()
                or SparkSession.builder.getOrCreate()
            )
            _enforce_constraints(spark, self.path, entries, self.map)
            _maintain_value_index(spark, self.path, entries)
        op = "overwrite" if self.overwrite else "append"
        for _ in range(16):  # appends commute: CAS retry always safe
            base = latest_version(self.path)
            reuse = None
            if base is None or self.overwrite:
                files = entries
                schema_json = self.schema_json
            else:
                # segment-diff append: base segments ride by reference
                import json as _json

                with open(
                    os.path.join(self.path, f"v={base}", "_MANIFEST.json")
                ) as f:
                    raw = _json.load(f)
                # the rebase refusal taxonomy, applied to the retry: a
                # concurrent schema evolution would NULL-fill our rows
                # through a schema we never saw — refuse rather than
                # silently absorb (versioned._attempt_rebase cond. 1)
                if raw["schema"] != self.schema_json:
                    raise CommitConflict(
                        f"writer commit at {self.path} refused: concurrent "
                        "commit changed the table schema after this "
                        "writer was planned"
                    )
                schema_json = raw["schema"]
                reuse = raw.get("segments")
                files = (
                    entries if reuse is not None else raw["files"] + entries
                )
            # a CHECK constraint added after _enforce_constraints ran
            # never saw this batch — refuse (rebase condition 2)
            cur_marker = (
                snapshot_meta(self.path, "constraints", version=base)
                if base is not None
                else None
            )
            if entries and cur_marker != enforced_marker:
                raise CommitConflict(
                    f"writer commit at {self.path} refused: CHECK "
                    "constraints changed after this batch was validated"
                )
            commit_meta = {
                "op": op, "n_files_appended": str(len(entries)),
                "n_files_rewritten": "0",
            }
            if base is None or self.overwrite:
                # a create/overwrite defines its own layout, exactly
                # like versioned_write: record the declared spec (or
                # clear a stale inherited one) and reset the epoch
                # history — no earlier-layout file survives
                commit_meta["partition_by"] = json.dumps(
                    self.partition_spec
                )
                commit_meta["partition_specs"] = "[]"
            try:
                _commit_manifest(
                    self.path, schema_json, files, commit_meta,
                    base, 600.0,
                    reuse_refs=reuse,
                )
                return
            except CommitConflict:
                continue
        raise CommitConflict(
            f"writer commit at {self.path} lost 16 consecutive races"
        )

    def abort(self, messages) -> None:
        # drop this job's pooled files eagerly (vacuum would collect
        # them anyway — they are referenced by no manifest)
        for m in messages or []:
            for e in (m.entries if m else []) or []:
                try:
                    os.unlink(os.path.join(self.path, e["path"]))
                except OSError:
                    pass


class VersionedStreamWriter(DataSourceStreamArrowWriter):
    """Exactly-once STREAMING appends into the versioned store —
    ``df.writeStream.format("skopje_versioned")``. Each micro-batch's
    tasks stream Arrow batches into pool files (the batch writer's
    write path, unreferenced until commit); the driver commit is
    gated by a per-stream BATCH LEDGER carried as a table property:
    the ``stream_ledger`` marker maps ``streamId`` → last committed
    batchId, so a replayed micro-batch (crash between sink commit and
    checkpoint advance) is recognized and its files dropped instead
    of double-appended — the same in-commit-ledger idea as
    ``versioned_stream_upsert``, surfaced through Spark's native
    streaming sink contract. Racing commits from OTHER writers
    resolve by the append-commute CAS retry.

    Two different queries writing one table must set distinct
    ``streamId`` options (default ``"default"``) — the ledger is
    per-stream, exactly like separate consumer groups."""

    def __init__(self, schema: StructType, options: dict[str, str]) -> None:
        self._w = VersionedTableWriter(schema, options, overwrite=False)
        self.path = self._w.path
        self.stream_id = options.get("streamid", "default")

    def write(self, iterator) -> "_PooledFile":
        return self._w.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        from pyspark.sql import SparkSession

        from skopje_spark.sinks.versioned import (
            CommitConflict,
            _commit_manifest,
            _enforce_constraints,
            _read_manifest,
            latest_version,
            snapshot_meta,
        )

        entries = [e for m in messages if m for e in (m.entries or [])]

        def _drop_staged() -> None:
            for e in entries:
                try:
                    os.unlink(os.path.join(self.path, e["path"]))
                except OSError:
                    pass

        base = latest_version(self.path)
        enforced_marker = (
            snapshot_meta(self.path, "constraints", version=base)
            if base is not None
            else None
        )
        if base is not None:
            ledger = json.loads(
                snapshot_meta(self.path, "stream_ledger", version=base)
                or "{}"
            )
            last = ledger.get(self.stream_id)
            if last is not None and int(last) >= batchId:
                _drop_staged()  # replayed micro-batch: already landed
                return
        if entries:
            from skopje_spark.sinks.versioned import _maintain_value_index

            spark = (
                SparkSession.getActiveSession()
                or SparkSession.builder.getOrCreate()
            )
            _enforce_constraints(spark, self.path, entries, self._w.map)
            _maintain_value_index(spark, self.path, entries)
        for _ in range(16):
            base = latest_version(self.path)
            reuse = None
            if base is None:
                files = entries
                schema_json = self._w.schema_json
                ledger = {}
            else:
                with open(
                    os.path.join(self.path, f"v={base}", "_MANIFEST.json")
                ) as f:
                    raw = json.load(f)
                # refuse to absorb a concurrent schema evolution or
                # constraint change on retry — the rebase refusal
                # taxonomy (see the batch writer's commit)
                if raw["schema"] != self._w.schema_json:
                    raise CommitConflict(
                        f"stream writer at {self.path} refused: concurrent "
                        "commit changed the table schema after this "
                        "writer was planned"
                    )
                if entries and (
                    snapshot_meta(self.path, "constraints", version=base)
                    != enforced_marker
                ):
                    raise CommitConflict(
                        f"stream writer at {self.path} refused: CHECK "
                        "constraints changed after this batch was "
                        "validated"
                    )
                schema_json = raw["schema"]
                reuse = raw.get("segments")
                files = (
                    entries if reuse is not None else raw["files"] + entries
                )
                ledger = json.loads(
                    snapshot_meta(self.path, "stream_ledger", version=base)
                    or "{}"
                )
                if int(ledger.get(self.stream_id, -1)) >= batchId:
                    _drop_staged()  # raced our own replay — already landed
                    return
            ledger[self.stream_id] = batchId
            commit_meta = {
                "op": "stream_append", "batch_id": str(batchId),
                "stream_ledger": json.dumps(ledger, sort_keys=True),
                "n_files_appended": str(len(entries)),
                "n_files_rewritten": "0",
            }
            if base is None:
                # a stream that CREATES the table defines its layout,
                # exactly like the batch writer's create branch: record
                # the declared spec so table_partitioning() answers,
                # hidden-target reads resolve, and later appends
                # preserve the layout
                commit_meta["partition_by"] = json.dumps(
                    self._w.partition_spec
                )
                commit_meta["partition_specs"] = "[]"
            try:
                _commit_manifest(
                    self.path, schema_json, files, commit_meta,
                    base, 600.0,
                    reuse_refs=reuse,
                )
                return
            except CommitConflict:
                continue
        raise CommitConflict(
            f"stream writer at {self.path} lost 16 consecutive races"
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            for e in (m.entries if m else []) or []:
                try:
                    os.unlink(os.path.join(self.path, e["path"]))
                except OSError:
                    pass


class VersionedChangesStreamReader(DataSourceStreamReader):
    """Offsets are COMMIT VERSIONS: ``{"version": n}`` means "changes
    through commit n have been served". Each micro-batch plans one
    partition per recorded cdc file in the commit range — executor
    Arrow reads, O(changes). Metadata-only commits contribute
    nothing; a data commit WITHOUT a recorded feed fails loudly
    (option ``allow_unrecorded=true`` downgrades to skipping it)."""

    def __init__(self, schema: StructType, options: dict[str, str]) -> None:
        from skopje_spark.sinks.versioned import (
            _MANIFEST_NAME,
            latest_version,
        )

        self.table = options.get("path", "")
        if not self.table:
            raise ValueError(
                "skopje_versioned_changes: provide option 'path'"
            )
        lv = latest_version(self.table)
        if lv is None:
            raise FileNotFoundError(f"no committed version at {self.table}")
        # the stream's logical name → stable PHYSICAL parquet name,
        # from the current manifest: the chain that lets cdc files
        # recorded under a PRE-RENAME logical name resolve to the
        # stream's post-rename column instead of NULL-filling
        with open(
            os.path.join(self.table, f"v={lv}", _MANIFEST_NAME)
        ) as f:
            self._phys = _mapping(json.load(f))
        self._cdc_maps: dict[int, dict] = {}
        self.start_v = int(options.get("startingversion", "0"))
        self.initial_snapshot = (
            options.get("initialsnapshot", "true").lower() == "true"
        )
        self.allow_unrecorded = (
            options.get("allowunrecorded", "false").lower() == "true"
        )
        self.schema_struct = schema

    def _cdc_mapping(self, v: int) -> dict:
        """stream logical name → the name the column was RECORDED
        under in commit ``v``'s cdc files. cdc frames carry the
        logical names of their own epoch; a rename between v and the
        stream's schema epoch changes the logical name but never the
        physical, so chaining stream-name → physical → v's logical
        name re-aligns the columns exactly (versioned_change_feed's
        as-recorded-schema contract, resolved instead of delegated)."""
        m = self._cdc_maps.get(v)
        if m is None:
            from skopje_spark.sinks.versioned import _MANIFEST_NAME

            with open(
                os.path.join(self.table, f"v={v}", _MANIFEST_NAME)
            ) as f:
                man_v = json.load(f)
            phys_to_recorded = {
                (fl.get("metadata") or {}).get("physical", fl["name"]):
                    fl["name"]
                for fl in man_v["schema"]["fields"]
            }
            m = {
                name: phys_to_recorded[phys]
                for name, phys in self._phys.items()
                if phys in phys_to_recorded
                and phys_to_recorded[phys] != name
            }
            self._cdc_maps[v] = m
        return m

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
                # data files carry PHYSICAL column names (stable
                # across renames), so the stream's own logical →
                # physical map serves any snapshot epoch — a rename
                # between v and the stream's schema epoch resolves to
                # real values, never NULL-fill
                out.extend(
                    _FilePartition(
                        table=self.table,
                        rel_path=e["path"],
                        dv_files=list(e.get("dv_files", [])),
                        version=v,
                        change_type="insert",
                        mapping=self._phys,
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
                    table=self.table, rel_path=rel, version=v,
                    mapping=self._cdc_mapping(v),
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
            # cdc file: _change_type is a data column in the file;
            # the mapping re-aligns columns recorded under a
            # pre-rename logical name (identity when never renamed)
            cdc_schema = StructType(base.fields).add("_change_type", "string")
            yield from _read_entry_arrow(
                partition.table, partition.rel_path, [],
                cdc_schema, partition.mapping,
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


def attach_versioned(
    spark,
    name: str,
    path: str,
    *,
    version: int | None = None,
    as_of_ts: float | None = None,
    ref: str | None = None,
    with_meta: bool = False,
) -> None:
    """Register a versioned table under a SQL name so the whole
    ``spark.sql`` surface — joins, CTEs, window functions, the entire
    delegated-SQL tier — composes with the lake without any function
    imports: ``attach_versioned(spark, "docs", path)`` then
    ``spark.sql("SELECT ... FROM docs JOIN other ...")``. The view
    reads through the connector (manifest-planned splits, pushFilters
    pruning, DV/rename/evolution handling), and pinning ``version``/
    ``as_of_ts`` attaches a time-traveled snapshot under its own
    name — the SQL spelling of ``VERSION AS OF`` — and ``ref``
    attaches a named tag or branch (``attach_versioned(spark,
    "docs_audit", path, ref="audit")`` — the SQL read surface of
    write-audit-publish).

    The attachment captures the snapshot resolution at call time the
    way the connector does (latest when unpinned is re-resolved per
    query planning, since the view re-invokes the source).

    ``with_meta=True`` additionally registers the table's METADATA
    tables (``sinks/versioned.py:versioned_meta`` — Iceberg's
    ``t$files`` idea, spelled ``<name>__files`` / ``__partitions`` /
    ``__refs`` / ``__history`` since ``$`` is not a valid Spark view
    name). Metadata views materialize the manifest AT ATTACH TIME
    (kilobyte driver-side reads, pinned like a snapshot read);
    re-attach to refresh. ``__partitions`` is skipped when the table
    is unpartitioned."""
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    r = spark.read.format("skopje_versioned").option("path", path)
    if version is not None:
        r = r.option("versionAsOf", str(version))
    if as_of_ts is not None:
        r = r.option("timestampAsOf", repr(float(as_of_ts)))
    if ref is not None:
        r = r.option("ref", ref)
    r.load().createOrReplaceTempView(name)
    if with_meta:
        from skopje_spark.sinks.versioned import (
            _resolve_ref,
            version_as_of_timestamp,
            versioned_meta,
        )

        mpath, mv = path, version
        if ref is not None:
            mpath, mv = _resolve_ref(path, ref)
        elif as_of_ts is not None:
            mv = version_as_of_timestamp(path, as_of_ts)
        for kind in ("files", "partitions", "refs", "history"):
            try:
                frame = versioned_meta(spark, mpath, kind, version=mv)
            except ValueError:
                continue  # unpartitioned: no __partitions view
            frame.createOrReplaceTempView(f"{name}__{kind}")
