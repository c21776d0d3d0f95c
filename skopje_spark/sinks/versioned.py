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
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_VDIR = re.compile(r"^v=(\d+)$")


class CommitConflict(RuntimeError):
    """An optimistic commit lost its race: the table advanced past the
    writer's base version, or another writer holds the commit lock.
    Recoverable — re-read the new latest, re-derive the change, retry
    (:func:`versioned_merge_concurrent` does exactly that)."""


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


_UNGUARDED = object()  # sentinel: expected_version not supplied


@contextmanager
def _commit_lock(path: str, timeout_s: float):
    """Short mutual-exclusion window for the O(1) commit step of
    guarded writes. Acquired via O_EXCL file create (atomic on POSIX,
    works across processes AND threads); a lock older than
    ``timeout_s`` is presumed abandoned by a crashed writer and stolen
    once. Contention raises :class:`CommitConflict` immediately — the
    caller's retry loop, not a blocking wait, resolves races (data is
    staged before the lock, so the critical section is metadata-only
    and contention windows are milliseconds)."""
    lock = os.path.join(path, "_COMMIT_LOCK")
    for attempt in (0, 1):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(f"{os.getpid()} {time.time()}")
            break
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(lock)
            except FileNotFoundError:
                continue  # released in the gap — retry the create
            if attempt == 0 and age > timeout_s:
                # crashed writer's residue: steal once, then re-create
                try:
                    os.unlink(lock)
                except FileNotFoundError:
                    pass
                continue
            raise CommitConflict(
                f"another commit holds the lock at {path} "
                f"(held {age:.1f}s; presumed live under {timeout_s}s)"
            )
    try:
        yield
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass


def _gc_staged(path: str, timeout_s: float, keep: str) -> None:
    """Remove staged snapshot directories abandoned by crashed guarded
    writers (older than ``timeout_s``), sparing ``keep`` (ours).
    Runs under the commit lock."""
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if not d.startswith(".staged-") or full == keep:
            continue
        try:
            if time.time() - os.path.getmtime(full) > timeout_s:
                shutil.rmtree(full, ignore_errors=True)
        except FileNotFoundError:
            pass


def versioned_write(
    df: DataFrame,
    path: str,
    *,
    meta: dict[str, str] | None = None,
    expected_version: int | None | object = _UNGUARDED,
    lock_timeout_s: float = 600.0,
) -> int:
    """Commit ``df`` as the next snapshot of the table at ``path``;
    returns the new version number.

    The snapshot is written to ``v=N`` in full, then the ``_LATEST``
    pointer is swapped with os.replace — the POSIX-atomic step that
    makes the commit all-or-nothing for readers.

    ``meta`` key/value pairs are written as ``_meta_<key>`` files
    INSIDE the snapshot directory BEFORE the pointer swap, so commit
    data and commit metadata become visible in the same atomic step —
    the transaction-marker mechanism exactly-once stream merges hang
    their batch ledger on (Delta's txn appId/version idea).

    Concurrency: by default single-writer discipline is assumed (as
    for any pointer-swap store). Passing ``expected_version`` turns
    the commit into an optimistic COMPARE-AND-SWAP — it succeeds only
    if the committed version still equals ``expected_version`` (use
    ``None`` to assert "table is empty"), else raises
    :class:`CommitConflict` with nothing published. Guarded commits
    stage their data files OUTSIDE the critical section (the lock
    covers only the version check + directory rename + pointer swap —
    O(1) metadata regardless of snapshot size, so a 100 TB write never
    serializes writers on data transfer, exactly the Delta/Iceberg
    commit-protocol shape). Do not mix guarded and unguarded writers
    on one table: the unguarded path takes no lock."""
    os.makedirs(path, exist_ok=True)
    if expected_version is not _UNGUARDED:
        staged = os.path.join(path, f".staged-{uuid.uuid4().hex}")
        df.write.mode("errorifexists").parquet(staged)
        for k, v in (meta or {}).items():
            with open(os.path.join(staged, f"_meta_{k}"), "w") as f:
                f.write(str(v))
        try:
            with _commit_lock(path, lock_timeout_s):
                current = latest_version(path)
                if current != expected_version:
                    raise CommitConflict(
                        f"table at {path} is at version {current}, "
                        f"writer expected {expected_version}"
                    )
                for v in _versions(path):
                    if current is None or v > current:
                        shutil.rmtree(os.path.join(path, f"v={v}"))
                _gc_staged(path, lock_timeout_s, keep=staged)
                n = (current + 1) if current is not None else 0
                os.replace(staged, os.path.join(path, f"v={n}"))
                fd, tmp = tempfile.mkstemp(dir=path, prefix="._latest")
                with os.fdopen(fd, "w") as f:
                    f.write(str(n))
                os.replace(tmp, _pointer_path(path))
                return n
        except CommitConflict:
            shutil.rmtree(staged, ignore_errors=True)
            raise
    current = latest_version(path)
    # crash residue: a writer that died between snapshot write and
    # pointer swap leaves UNCOMMITTED v=* directories (readers never
    # see them — they follow the pointer). Clear EVERY residue above
    # the pointer — including all of them when no pointer exists yet
    # (a first-ever commit that crashed must not leave junk that a
    # later numbering skips over and time travel then serves) — so
    # the table cannot wedge on errorifexists and version numbering
    # restarts cleanly; single-writer discipline is assumed (as for
    # any pointer-swap store).
    for v in _versions(path):
        if current is None or v > current:
            shutil.rmtree(os.path.join(path, f"v={v}"))
    n = (current + 1) if current is not None else 0
    snap = os.path.join(path, f"v={n}")
    df.write.mode("errorifexists").parquet(snap)
    for k, v in (meta or {}).items():
        with open(os.path.join(snap, f"_meta_{k}"), "w") as f:
            f.write(str(v))
    fd, tmp = tempfile.mkstemp(dir=path, prefix="._latest")
    with os.fdopen(fd, "w") as f:
        f.write(str(n))
    os.replace(tmp, _pointer_path(path))
    return n


def snapshot_meta(path: str, key: str, *, version: int) -> str | None:
    """Read one ``_meta_<key>`` marker from a committed snapshot, or
    None when that commit carries no such marker."""
    try:
        with open(os.path.join(path, f"v={version}", f"_meta_{key}")) as f:
            return f.read()
    except FileNotFoundError:
        return None


def versioned_read(
    spark: SparkSession, path: str, *, version: int | None = None
) -> DataFrame:
    """Scan one snapshot: the committed latest by default, or a pinned
    ``version`` (time travel). Uncommitted / vacuumed versions raise."""
    committed = latest_version(path)
    if committed is None:
        raise FileNotFoundError(f"no committed version at {path}")
    if version is None:
        version = committed
    elif version > committed:
        # the directory may exist (a crashed writer's residue) but the
        # pointer never blessed it — serving it would expose a
        # half-written snapshot as history
        raise FileNotFoundError(
            f"version {version} at {path} is not committed "
            f"(latest committed: {committed})"
        )
    snap = os.path.join(path, f"v={version}")
    if not os.path.isdir(snap):
        raise FileNotFoundError(f"version {version} not present at {path}")
    return spark.read.parquet(snap)


def versioned_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    *,
    meta: dict[str, str] | None = None,
    evolve_schema: bool = False,
) -> int:
    """MERGE as a snapshot commit: next version = (current rows not
    matching an update key) ∪ updates. The current snapshot is read,
    never mutated — a failed upsert leaves the table exactly as it was.

    ``evolve_schema=True`` permits ADDITIVE schema changes in either
    direction: columns new in ``updates`` appear in the committed
    snapshot with NULLs for the kept rows, and columns absent from
    ``updates`` survive with NULLs for the update rows — Delta's
    mergeSchema semantics. Earlier snapshots keep their own schema
    (time travel returns what was committed then). The default stays
    strict: a drifted schema is more often a bug than an evolution,
    so it must be opted into per call."""
    current = versioned_read(spark, path)
    kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    return versioned_write(
        kept.unionByName(updates, allowMissingColumns=evolve_schema),
        path,
        meta=meta,
    )


def versioned_merge_concurrent(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    *,
    meta: dict[str, str] | None = None,
    max_retries: int = 5,
    backoff_s: float = 0.1,
    evolve_schema: bool = False,
) -> int:
    """MERGE safe under CONCURRENT writers: read the latest snapshot
    (pinned by version), derive merged = (rows not matching an update
    key) ∪ updates, and commit with compare-and-swap on that base
    version. A lost race (:class:`CommitConflict`) re-reads the NEW
    latest and re-derives the merge — the standard optimistic
    transaction loop, so N writers upserting disjoint keys all land
    and serialize into N consecutive versions with no lost updates
    (unit-pinned with racing threads). Exponential backoff between
    attempts; raises the final conflict after ``max_retries`` losses.

    Semantic note: concurrent writers that touch the SAME key
    serialize too — last committer wins that key, exactly like
    sequential upserts in commit order. Readers are unaffected
    throughout (pointer-swap isolation)."""
    last: CommitConflict | None = None
    for attempt in range(max_retries + 1):
        base = latest_version(path)
        if base is None:
            merged = updates
        else:
            current = versioned_read(spark, path, version=base)
            kept = current.join(
                updates.select(*keys).distinct(), keys, "left_anti"
            )
            merged = kept.unionByName(
                updates, allowMissingColumns=evolve_schema
            )
        try:
            return versioned_write(
                merged, path, meta=meta, expected_version=base
            )
        except CommitConflict as e:
            last = e
            time.sleep(backoff_s * (2**attempt))
    raise CommitConflict(
        f"merge at {path} lost {max_retries + 1} commit races; last: {last}"
    )


def stream_incarnation_id(checkpoint: str) -> str:
    """Stable id of one logical stream incarnation: a hash of the
    checkpoint location. Structured Streaming's batch ids are only
    meaningful WITHIN one checkpoint — a job restarted with a fresh
    checkpoint renumbers batches from 0 over re-read (and possibly
    NEW) data, so a ledger keyed by bare batch_id would skip brand-new
    batches that happen to reuse old numbers and silently drop their
    data. Scoping the ledger by (incarnation, batch) — Delta's txn
    (appId, version) idea — confines dedup to true same-checkpoint
    replays; a new incarnation re-applies everything, which the
    key-MERGE makes content-idempotent."""
    import hashlib

    return hashlib.sha256(
        os.path.abspath(checkpoint).encode("utf-8")
    ).hexdigest()[:12]


def last_stream_batch(path: str, *, stream_id: str | None = None) -> int | None:
    """Highest micro-batch id durably applied to the table BY the
    given stream incarnation: walk committed versions newest-first for
    the most recent commit whose ``stream_batch_id`` marker matches
    ``stream_id`` (manual commits carry no marker; other incarnations'
    commits don't constrain this one). ``stream_id=None`` returns the
    newest stream-marked commit's batch id regardless of incarnation
    (display/diagnostics). O(#versions) file reads — bounded by vacuum
    retention."""
    committed = latest_version(path)
    if committed is None:
        return None
    for v in sorted(_versions(path), reverse=True):
        if v > committed:
            continue  # written but never committed
        m = snapshot_meta(path, "stream_batch_id", version=v)
        if m is None:
            continue
        sid, _, bid = m.rpartition(":")
        if stream_id is None or sid == stream_id:
            return int(bid)
    return None


def apply_stream_batch(
    path: str,
    keys: list[str],
    batch_df: DataFrame,
    batch_id: int,
    stream_id: str,
    on_commit=None,
) -> bool:
    """One ledgered micro-batch apply (the foreachBatch body of
    :func:`versioned_stream_upsert`, exposed so replay semantics are
    directly unit-testable): MERGE the batch unless this incarnation's
    ledger already covers ``batch_id``; run ``on_commit`` either way.
    Returns whether the batch was freshly applied."""
    last = last_stream_batch(path, stream_id=stream_id)
    fresh = last is None or batch_id > last
    if fresh:
        meta = {"stream_batch_id": f"{stream_id}:{batch_id}"}
        if latest_version(path) is None:
            versioned_write(batch_df, path, meta=meta)
        else:
            versioned_upsert(
                batch_df.sparkSession, path, batch_df, keys, meta=meta
            )
    # on_commit runs even for replay-SKIPPED batches: a crash in the
    # window between the base commit and the hook's own work would
    # otherwise never be healed (the replay skips the commit and would
    # skip the hook with it). Hooks must therefore be idempotent when
    # the base is unchanged — versioned_ivm_view is, by its
    # base_version marker. ``fresh`` tells the hook whether THIS call
    # produced the latest commit (so the batch's keys bound what
    # changed); replay-skipped calls must not assume that.
    if on_commit is not None:
        on_commit(batch_df.sparkSession, batch_df, fresh)
    return fresh


def versioned_stream_upsert(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str,
    *,
    available_now: bool = True,
    on_commit=None,
):
    """EXACTLY-ONCE streaming MERGE into the versioned table:
    ``foreachBatch`` + :func:`versioned_upsert`, made idempotent by a
    batch-id ledger riding inside each commit.

    Structured Streaming guarantees at-least-once delivery to
    foreachBatch — a batch that crashed mid-apply is REPLAYED with
    the same ``batch_id`` under the SAME checkpoint. Each successful
    apply commits ``<incarnation>:<batch_id>`` as a
    ``stream_batch_id`` marker inside the snapshot (written before
    the pointer swap, so data and ledger are atomic together), where
    the incarnation is :func:`stream_incarnation_id` of the
    checkpoint. A replayed batch whose id is <= this incarnation's
    ledger is skipped without touching the table — same-checkpoint
    replays leave BOTH row content and version history identical.

    A job restarted with a FRESH checkpoint is a NEW incarnation:
    batch ids renumber from 0 over re-read (and possibly new) data,
    so its batches are deliberately NOT skipped — a bare-batch-id
    ledger here would silently drop whatever new data landed in the
    renumbered early batches. Re-applying the re-read prefix is
    content-idempotent through the key-MERGE (extra versions, no row
    changes) — correctness first, history compactness second.

    First batch on an empty table commits v=0 directly; later batches
    run the anti-join MERGE. Returns the streaming query.

    Retention caveat: the ledger lives in the commits themselves, so
    ``vacuum`` must retain at least this incarnation's newest
    stream-marked commit; one stream per table (single-writer, as for
    the store itself).

    ``on_commit(spark, batch_df, fresh)``, if given, runs after EVERY
    batch — fresh or replay-skipped (``fresh`` False) — so idempotent
    downstream maintenance (e.g. a :func:`versioned_ivm_view` refresh)
    self-heals across crashes in the commit→hook window."""
    from skopje_spark.streaming.streams import foreach_batch_sink

    sid = stream_incarnation_id(checkpoint)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_stream_batch(
            path, keys, batch_df, batch_id, sid, on_commit=on_commit
        )

    return foreach_batch_sink(
        stream_df, checkpoint, apply_batch, available_now=available_now
    )


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
    (quality.table_digest_update): U rows carry NEW-side values (D
    rows carry old images), so U keys' BEFORE-images must come from
    the ``from_version`` snapshot — :func:`versioned_digest_frames`
    does that wiring; use it."""
    from skopje_spark.operators.cdc import snapshot_diff

    old = versioned_read(spark, path, version=from_version)
    new = versioned_read(spark, path, version=to_version)
    return snapshot_diff(old, new, keys)


def versioned_digest_frames(
    spark: SparkSession,
    path: str,
    keys: list[str],
    *,
    from_version: int,
    to_version: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The CORRECT (inserts, deletes) pair for incremental digest
    maintenance (quality.table_digest_update) between two commits —
    the wiring the changelog alone cannot provide: U rows carry
    NEW-side values only, so the delete side fetches the U keys'
    BEFORE-images from the ``from_version`` snapshot (D rows already
    carry old values).

    ``inserts`` = new images of I and U rows; ``deletes`` = old
    images of U and D rows. Feeding these to table_digest_update
    makes ``update(digest(old)) == digest(new)`` EXACTLY
    (unit-pinned, including updates that change digest columns —
    the case naive changelog wiring silently corrupts).

    Cost: the changelog diff (one full-outer key join) + one
    left-semi join of the old snapshot against the U keys."""
    from pyspark.sql import functions as F

    from skopje_spark.operators.cdc import snapshot_diff

    old = versioned_read(spark, path, version=from_version)
    new = versioned_read(spark, path, version=to_version)
    ch = snapshot_diff(old, new, keys)
    cols = old.columns
    inserts = ch.filter(F.col("__op").isin("I", "U")).select(*cols)
    u_keys = ch.filter(F.col("__op") == "U").select(*keys)
    deletes = (
        old.join(u_keys, keys, "left_semi")
        .select(*cols)
        .unionByName(ch.filter(F.col("__op") == "D").select(*cols))
    )
    return inserts, deletes


def versioned_compact(
    spark: SparkSession,
    path: str,
    *,
    target_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    guarded: bool = False,
) -> int:
    """Small-file compaction as a commit: rewrite the committed latest
    snapshot into fewer, right-sized files and commit the result as
    the next version (markers ``op=compact``, ``source_version``).
    Content-identical by construction; history (and any pinned
    readers) untouched — compaction is just another snapshot.

    ``guarded=True`` commits with compare-and-swap on the source
    version — REQUIRED whenever writers may run concurrently: an
    unguarded compactor that reads v, rewrites, and commits after
    another writer landed v+1 would publish a snapshot that silently
    DROPS that writer's rows (the classic compaction/ingest race).
    Under the guard the compactor loses the race loudly
    (:class:`CommitConflict`) and can simply re-run against the new
    latest; the default stays unguarded for single-writer pipelines.

    Sizing: ``target_files`` wins if given; otherwise
    ceil(snapshot bytes / ``target_file_bytes``). The rewrite uses
    ``coalesce`` when reducing the file count — a NARROW dependency
    (each output task reads several input files, no shuffle), which is
    the whole economics of compaction at 100 TB: IO-bound copy, zero
    exchange. Falls back to ``repartition`` only if asked to *grow*
    the file count."""
    import math

    v = latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed version at {path}")
    snap = os.path.join(path, f"v={v}")
    cur = versioned_read(spark, path, version=v)
    if target_files is None:
        nbytes = sum(
            os.path.getsize(os.path.join(snap, f))
            for f in os.listdir(snap)
            if f.endswith(".parquet")
        )
        target_files = max(1, math.ceil(nbytes / target_file_bytes))
    n_parts = cur.rdd.getNumPartitions()
    out = (
        cur.coalesce(target_files)
        if target_files <= n_parts
        else cur.repartition(target_files)
    )
    # inherit the source commit's markers (base_version for maintained
    # views, stream_batch_id for stream ledgers, ...) so downstream
    # maintenance that reads the LATEST commit's markers keeps working
    # across a compaction; compact's own markers overlay them.
    meta = {
        f[len("_meta_"):]: open(os.path.join(snap, f)).read()
        for f in os.listdir(snap)
        if f.startswith("_meta_")
    }
    meta.update({"op": "compact", "source_version": str(v)})
    if guarded:
        return versioned_write(out, path, meta=meta, expected_version=v)
    return versioned_write(out, path, meta=meta)


def versioned_ivm_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    *,
    table_keys: list[str],
    group_keys: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
    touched_keys: DataFrame | None = None,
) -> int:
    """Materialized grouped-aggregate view OF a versioned table,
    maintained incrementally ACROSS commits — operators/ivm.py wired
    to time travel.

    First call (no committed view): full :func:`ivm_build` of the
    base's committed latest, committed with a ``base_version`` marker.
    Every later call: CDC changelog between the view's recorded
    ``base_version`` and the base's current latest
    (:func:`versioned_changes`), folded into the stored view with
    :func:`ivm_apply` (U/D before-images come from the PINNED old
    snapshot — exactly the wiring the digest-maintenance docs
    mandate), committed as the view's next version with the new
    marker. Already-current views return their version untouched
    (refresh is idempotent).

    Refresh cost: the changelog is one full-outer join of the two base
    snapshots (each shuffles once) plus the O(|view| + |changes|)
    fold (+ a touched-group semi-join slice of the new snapshot when
    min/max are kept) — the base is never re-AGGREGATED after the
    first call. When the caller KNOWS which table keys can have
    changed between the two versions (a stream batch's keys, a load
    manifest), pass them as ``touched_keys``: both snapshots are then
    pruned to those keys by broadcast semi-join BEFORE diffing, so no
    base-sized shuffle happens at all — per-refresh cost drops to
    scan + O(|view| + |touched|). The hint is a correctness contract:
    a change outside ``touched_keys`` is silently missed.

    Retention contract: the base's ``vacuum`` must keep every version
    still referenced by a view's ``base_version`` marker, or the next
    refresh falls back to failing loudly on the missing snapshot
    (never silently full-rebuilding)."""
    from skopje_spark.operators.cdc import snapshot_diff
    from skopje_spark.operators.ivm import ivm_apply, ivm_build

    base_v = latest_version(base_path)
    if base_v is None:
        raise FileNotFoundError(f"no committed version at {base_path}")
    view_v = latest_version(view_path)
    if view_v is None:
        view = ivm_build(
            versioned_read(spark, base_path, version=base_v),
            group_keys, sum_cols, min_cols, max_cols,
        )
        return versioned_write(
            view, view_path,
            meta={"base_version": str(base_v), "op": "ivm_full"},
        )

    marker = snapshot_meta(view_path, "base_version", version=view_v)
    if marker is None:
        raise ValueError(
            f"view at {view_path} v={view_v} carries no base_version marker"
        )
    last_base = int(marker)
    if last_base == base_v:
        return view_v  # already current

    old = versioned_read(spark, base_path, version=last_base)
    new = versioned_read(spark, base_path, version=base_v)
    diff_old, diff_new = old, new
    if touched_keys is not None:
        from pyspark.sql import functions as _F

        tk = _F.broadcast(touched_keys.select(*table_keys).distinct())
        diff_old = old.join(tk, list(table_keys), "left_semi")
        diff_new = new.join(tk, list(table_keys), "left_semi")
    changelog = snapshot_diff(diff_old, diff_new, table_keys)
    folded = ivm_apply(
        versioned_read(spark, view_path, version=view_v),
        changelog,
        diff_old,
        table_keys=table_keys,
        group_keys=group_keys,
        sum_cols=sum_cols,
        min_cols=min_cols,
        max_cols=max_cols,
        new=new if (min_cols or max_cols) else None,
    )
    return versioned_write(
        folded, view_path,
        meta={"base_version": str(base_v), "op": "ivm_incremental"},
    )


def versioned_stream_materialized_view(
    stream_df: DataFrame,
    base_path: str,
    view_path: str,
    keys: list[str],
    checkpoint: str,
    *,
    group_keys: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
    available_now: bool = True,
):
    """Stream → versioned base table → incrementally maintained
    rollup, exactly-once end to end: each micro-batch MERGEs into the
    base (ledger-idempotent, :func:`versioned_stream_upsert`) and then
    folds the base's new commit into the materialized view. A full
    replay leaves base history, base content, view history, and view
    content all identical; a crash between base commit and view
    refresh heals on the next batch because the refresh hook also
    runs for replay-skipped batches and is idempotent when current.

    Per-batch cost: on the common path (this batch produced the
    latest commit and the view was current before it), the batch's
    OWN keys are passed to :func:`versioned_ivm_view` as
    ``touched_keys`` — both base snapshots prune to those keys by
    broadcast semi-join before diffing, so the refresh never shuffles
    the base: scan + O(|view| + |batch|). Only the catch-up path (a
    view found ≥2 commits behind, i.e. after a crash or an external
    base write) pays the full snapshot diff, once.

    Retention: run the base's ``vacuum`` with enough versions to keep
    the view's last ``base_version`` target (consecutive refreshes
    need only keep>=2). Returns the streaming query."""

    def refresh(spark: SparkSession, batch_df: DataFrame, fresh: bool) -> None:
        base_v = latest_version(base_path)
        if base_v is None:
            return  # nothing committed yet (first batch empty)
        hint = None
        if fresh:
            # this batch produced commit base_v; if the view is
            # exactly one commit behind, everything that changed
            # between the versions is this batch's key set
            view_v = latest_version(view_path)
            if view_v is not None:
                m = snapshot_meta(view_path, "base_version", version=view_v)
                if m is not None and int(m) == base_v - 1:
                    hint = batch_df
        versioned_ivm_view(
            spark,
            base_path,
            view_path,
            table_keys=keys,
            group_keys=group_keys,
            sum_cols=sum_cols,
            min_cols=min_cols,
            max_cols=max_cols,
            touched_keys=hint,
        )

    return versioned_stream_upsert(
        stream_df,
        base_path,
        keys,
        checkpoint,
        available_now=available_now,
        on_commit=refresh,
    )


def versioned_history(
    spark: SparkSession, path: str, *, with_counts: bool = False
) -> DataFrame:
    """Commit history of a versioned table as a DataFrame — the
    DESCRIBE HISTORY surface: one row per COMMITTED version with its
    file count, byte size, and commit markers (JSON-encoded, sorted
    keys). Uncommitted residue (crashed writers past the pointer) is
    excluded, exactly as readers exclude it.

    ``with_counts=True`` adds ``n_rows`` — one metadata-only count per
    retained version (parquet footer statistics, no data read; still
    O(retained versions) jobs, which vacuum retention bounds).

    Everything else is driver-side directory metadata — O(retained
    versions) file stats, no Spark job."""
    import json

    committed = latest_version(path)
    rows = []
    for v in _versions(path):
        if committed is None or v > committed:
            continue
        snap = os.path.join(path, f"v={v}")
        files = [f for f in os.listdir(snap) if f.endswith(".parquet")]
        nbytes = sum(os.path.getsize(os.path.join(snap, f)) for f in files)
        meta = {
            f[len("_meta_"):]: open(os.path.join(snap, f)).read()
            for f in os.listdir(snap)
            if f.startswith("_meta_")
        }
        rows.append(
            (v, v == committed, len(files), nbytes,
             json.dumps(meta, sort_keys=True))
        )
    out = spark.createDataFrame(
        rows,
        "version int, is_latest boolean, n_files int, n_bytes long, meta string",
    )
    if with_counts:
        counts = [
            (r[0], versioned_read(spark, path, version=r[0]).count())
            for r in rows
        ]
        cdf = spark.createDataFrame(counts, "version int, n_rows long")
        out = out.join(cdf, "version")
    return out.orderBy("version")
