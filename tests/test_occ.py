"""Optimistic concurrency for the versioned store
(sinks/versioned.py: expected_version CAS commits, _commit_lock,
versioned_merge_concurrent)."""

from __future__ import annotations

import os
import threading
import time

import pytest

from skopje_spark.sinks.versioned import (
    CommitConflict,
    latest_version,
    versioned_merge_concurrent,
    versioned_read,
    versioned_write,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_cas_commit_rejects_stale_base(spark, tmp_path):
    path = str(tmp_path / "t")
    assert versioned_write(_df(spark, [(1, "a")]), path, expected_version=None) == 0
    # writer A advances from 0
    assert versioned_write(_df(spark, [(1, "b")]), path, expected_version=0) == 1
    # writer B still believes base is 0 → must lose, nothing published
    with pytest.raises(CommitConflict, match="expected 0"):
        versioned_write(_df(spark, [(1, "c")]), path, expected_version=0)
    assert latest_version(path) == 1
    assert versioned_read(spark, path).collect()[0]["v"] == "b"
    # a lost race leaves no staged residue behind
    assert not [d for d in os.listdir(path) if d.startswith(".staged-")]


def test_cas_empty_table_assertion(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(1, "a")]), path)
    with pytest.raises(CommitConflict):
        versioned_write(_df(spark, [(2, "b")]), path, expected_version=None)


def test_fresh_lock_conflicts_stale_lock_is_stolen(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(1, "a")]), path)
    lock = os.path.join(path, "_COMMIT_LOCK")
    # fresh lock (live writer): guarded commit must conflict fast
    with open(lock, "w") as f:
        f.write("someone")
    with pytest.raises(CommitConflict, match="holds the lock"):
        versioned_write(_df(spark, [(1, "b")]), path, expected_version=0)
    # stale lock (crashed writer): stolen, commit proceeds
    old = time.time() - 10_000
    os.utime(lock, (old, old))
    assert (
        versioned_write(
            _df(spark, [(1, "b")]), path, expected_version=0, lock_timeout_s=600
        )
        == 1
    )
    assert not os.path.exists(lock)


def test_concurrent_merges_all_land(spark, tmp_path):
    """8 racing writers upserting disjoint keys through the optimistic
    retry loop: every update lands, versions serialize consecutively,
    no lost updates."""
    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(999, "base")]), path)

    n_writers, errors = 8, []

    def worker(i: int) -> None:
        try:
            versioned_merge_concurrent(
                spark, path, _df(spark, [(i, f"w{i}")]), ["k"],
                max_retries=16, backoff_s=0.05,
            )
        except Exception as e:  # pragma: no cover - failure surface
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert latest_version(path) == n_writers  # base v0 + one commit each
    rows = {r["k"]: r["v"] for r in versioned_read(spark, path).collect()}
    assert rows[999] == "base"
    for i in range(n_writers):
        assert rows[i] == f"w{i}"


def test_same_key_races_serialize_last_commit_wins(spark, tmp_path):
    """Two writers updating the SAME key: both commits land (two new
    versions), the later commit's value survives — sequential-upsert
    semantics in commit order, no torn state."""
    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(7, "orig")]), path)
    results = {}

    def worker(tag: str) -> None:
        results[tag] = versioned_merge_concurrent(
            spark, path, _df(spark, [(7, tag)]), ["k"],
            max_retries=16, backoff_s=0.05,
        )

    a = threading.Thread(target=worker, args=("alpha",))
    b = threading.Thread(target=worker, args=("beta",))
    a.start(); b.start(); a.join(); b.join()
    assert sorted(results.values()) == [1, 2]
    winner = max(results, key=results.get)
    rows = versioned_read(spark, path).collect()
    assert len(rows) == 1 and rows[0]["v"] == winner
    # history: the loser's intermediate value is time-travelable
    loser = min(results, key=results.get)
    prev = versioned_read(spark, path, version=results[loser]).collect()
    assert prev[0]["v"] == loser


def test_schema_evolution_opt_in(spark, tmp_path):
    """evolve_schema=True: an upsert adding a column commits with NULL
    backfill for kept rows; a later narrow upsert keeps the evolved
    column (NULL for its own rows); strict default still raises; time
    travel serves each version's own schema."""
    from skopje_spark.sinks.versioned import versioned_upsert

    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(1, "a"), (2, "b")]), path)

    wide = spark.createDataFrame([(2, "b2", 9.5)], "k long, v string, score double")
    with pytest.raises(Exception):  # strict default: schema drift is an error
        versioned_upsert(spark, path, wide, ["k"])
    v1 = versioned_upsert(spark, path, wide, ["k"], evolve_schema=True)
    rows = {r["k"]: r for r in versioned_read(spark, path).collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5

    narrow = _df(spark, [(3, "c")])
    versioned_upsert(spark, path, narrow, ["k"], evolve_schema=True)
    rows = {r["k"]: r for r in versioned_read(spark, path).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3]["score"] is None and rows[2]["score"] == 9.5

    # time travel: v0 has the original two-column schema
    v0 = versioned_read(spark, path, version=0)
    assert v0.columns == ["k", "v"]
    assert versioned_read(spark, path, version=v1).columns == ["k", "v", "score"]

    # the concurrent merge honors the same flag
    wider = spark.createDataFrame([(4, "d", 1.0, "x")],
                                  "k long, v string, score double, tag string")
    versioned_merge_concurrent(spark, path, wider, ["k"], evolve_schema=True)
    rows = {r["k"]: r for r in versioned_read(spark, path).collect()}
    assert rows[4]["tag"] == "x" and rows[1]["tag"] is None


def test_guarded_compaction_loses_race_loudly(spark, tmp_path):
    """The compaction/ingest race: an unguarded compactor that read v0
    would overwrite a merge that landed v1 (dropping its rows);
    guarded=True turns that silent data loss into a CommitConflict,
    and a re-run against the new latest preserves everything."""
    from skopje_spark.sinks.versioned import versioned_compact, versioned_upsert

    path = str(tmp_path / "t")
    versioned_write(
        _df(spark, [(i, f"v{i}") for i in range(50)]).repartition(8), path
    )

    # simulate the race: a merge lands AFTER the compactor resolved v0
    # but BEFORE its commit — with the guard the stale commit must fail.
    # (Interleave by hand: upsert first, then attempt a guarded commit
    # carrying expected_version=0 the way the compactor would.)
    versioned_upsert(spark, path, _df(spark, [(999, "landed")]), ["k"])
    stale = versioned_read(spark, path, version=0).coalesce(1)
    with pytest.raises(CommitConflict):
        versioned_write(stale, path, expected_version=0)
    assert any(r["k"] == 999 for r in versioned_read(spark, path).collect())

    # the re-run path: guarded compaction against the current latest
    v = versioned_compact(spark, path, target_files=1, guarded=True)
    got = versioned_read(spark, path, version=v)
    assert got.count() == 51 and any(r["k"] == 999 for r in got.collect())


def test_versioned_history_surface(spark, tmp_path):
    """versioned_history: committed versions only (crash residue
    excluded), latest flagged, byte/file metadata present, counts on
    demand, markers JSON-sorted."""
    import json
    import os as _os

    from skopje_spark.sinks.versioned import versioned_history

    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(1, "a"), (2, "b")]), path)
    versioned_write(_df(spark, [(1, "a")]), path, meta={"op": "shrink", "z": "1"})
    # crash residue past the pointer: must not appear in history
    _os.makedirs(_os.path.join(path, "v=9"))
    h = versioned_history(spark, path, with_counts=True).collect()
    assert [r["version"] for r in h] == [0, 1]
    assert [r["is_latest"] for r in h] == [False, True]
    assert [r["n_rows"] for r in h] == [2, 1]
    assert all(r["n_files"] >= 1 and r["n_bytes"] > 0 for r in h)
    meta = json.loads(h[1]["meta"])
    assert float(meta.pop("commit_ts")) > 0  # every commit is timestamped
    assert meta == {"op": "shrink", "z": "1"}
    # without counts: no job-per-version, no n_rows column
    h2 = versioned_history(spark, path)
    assert "n_rows" not in h2.columns


def _clustered(spark, path, n=80, files=8):
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(n)], "k long, v string"
    )
    versioned_write(
        df.repartitionByRange(files, "k").sortWithinPartitions("k"), path
    )
    return df


def test_rebase_lands_metadata_only_on_disjoint_race(spark, tmp_path):
    """A lost CAS race against a key-disjoint interloper resolves by
    manifest rebase: no re-derive, interloper's file carried by
    reference, rebase markers recorded, content = serial result."""
    from skopje_spark.sinks.versioned import (
        _read_manifest,
        snapshot_meta,
        versioned_append,
        versioned_upsert,
    )

    path = str(tmp_path / "t")
    _clustered(spark, path)
    # interloper: blind append of provably-disjoint keys → v1
    versioned_append(
        spark, path, _df(spark, [(1000, "x"), (1001, "y")])
    )
    appended = {
        e["path"] for e in _read_manifest(path, 1)["files"]
    } - {e["path"] for e in _read_manifest(path, 0)["files"]}
    # our writer still pinned to base v0: rebase resolves the race
    v = versioned_upsert(
        spark, path, _df(spark, [(3, "NEW")]), ["k"],
        expected_version=0, rebase_on_conflict=True,
    )
    assert v == 2
    assert snapshot_meta(path, "rebased_onto", version=2) == "1"
    assert snapshot_meta(path, "n_rebased_over", version=2) == "1"
    # interloper's appended file rides into v2 BY REFERENCE
    assert appended <= {e["path"] for e in _read_manifest(path, 2)["files"]}
    rows = {r["k"]: r["v"] for r in versioned_read(spark, path).collect()}
    assert rows[3] == "NEW" and rows[1000] == "x" and len(rows) == 82
    # partial-rewrite economics survived the rebase
    assert int(snapshot_meta(path, "n_files_rewritten", version=2)) <= 2


def test_rebase_refused_when_candidate_file_touched(spark, tmp_path):
    """An interloper that rewrote (or DV-deleted) a file our merge
    read from makes the staged output stale — rebase must refuse."""
    from skopje_spark.sinks.versioned import versioned_delete, versioned_upsert

    path = str(tmp_path / "t")
    _clustered(spark, path)
    # interloper rewrites the bucket holding key 3
    versioned_upsert(spark, path, _df(spark, [(4, "theirs")]), ["k"])
    with pytest.raises(CommitConflict, match="touched rewritten file"):
        versioned_upsert(
            spark, path, _df(spark, [(3, "ours")]), ["k"],
            expected_version=0, rebase_on_conflict=True,
        )
    # DV flavor: a concurrent DELETE pinning a vector onto our candidate
    path2 = str(tmp_path / "t2")
    _clustered(spark, path2)
    versioned_delete(spark, path2, "k = 2")
    with pytest.raises(CommitConflict, match="touched rewritten file"):
        versioned_upsert(
            spark, path2, _df(spark, [(3, "ours")]), ["k"],
            expected_version=0, rebase_on_conflict=True,
        )


def test_rebase_refused_when_added_files_may_match(spark, tmp_path):
    """Concurrently ADDED files whose stats overlap our update keys
    would have been merge candidates under serial order — refuse."""
    from skopje_spark.sinks.versioned import versioned_append, versioned_upsert

    path = str(tmp_path / "t")
    _clustered(spark, path)
    versioned_append(
        spark, path, _df(spark, [(200, "x"), (300, "y")]).coalesce(1)
    )
    with pytest.raises(CommitConflict, match="may contain update keys"):
        versioned_upsert(
            spark, path, _df(spark, [(250, "ours")]), ["k"],
            expected_version=0, rebase_on_conflict=True,
        )


def test_rebase_refused_on_schema_or_constraint_change(spark, tmp_path):
    """A concurrent rename or CHECK-constraint change invalidates the
    staged commit's read/validation premises — refuse both."""
    from skopje_spark.sinks.versioned import (
        set_check_constraint,
        versioned_rename_column,
        versioned_upsert,
    )

    path = str(tmp_path / "t")
    _clustered(spark, path)
    versioned_rename_column(path, "v", "val")
    with pytest.raises(CommitConflict, match="changed the table schema"):
        versioned_upsert(
            spark, path, _df(spark, [(3, "ours")]), ["k"],
            expected_version=0, rebase_on_conflict=True,
        )
    path2 = str(tmp_path / "t2")
    _clustered(spark, path2)
    set_check_constraint(spark, path2, "k_small", "k < 10000")
    with pytest.raises(CommitConflict, match="CHECK"):
        versioned_upsert(
            spark, path2, _df(spark, [(3, "ours")]), ["k"],
            expected_version=0, rebase_on_conflict=True,
        )


def test_append_rebase_commutes_with_any_commit(spark, tmp_path):
    """A guarded blind append rebases over even a key-overlapping
    interloper merge: appends read nothing, so they commute."""
    from skopje_spark.sinks.versioned import (
        snapshot_meta,
        versioned_append,
        versioned_upsert,
    )

    path = str(tmp_path / "t")
    _clustered(spark, path)
    versioned_upsert(spark, path, _df(spark, [(3, "theirs")]), ["k"])
    v = versioned_append(
        spark, path, _df(spark, [(3, "dup-ok"), (5000, "new")]),
        expected_version=0, rebase_on_conflict=True,
    )
    assert v == 2 and snapshot_meta(path, "rebased_onto", version=2) == "1"
    rows = [r["v"] for r in versioned_read(spark, path).collect()]
    assert "theirs" in rows and "dup-ok" in rows and "new" in rows
    assert len(rows) == 82  # 80 base + 2 appended (k=3 duplicated verbatim)


def test_dv_delete_rebase_on_disjoint_delete_race(spark, tmp_path):
    """Two DV deletes racing on DIFFERENT files: the loser rebases
    metadata-only and BOTH deletes are effective in the final
    snapshot."""
    from skopje_spark.sinks.versioned import snapshot_meta, versioned_delete

    path = str(tmp_path / "t")
    _clustered(spark, path)  # keys 0..79 in 8 range files
    # interloper deletes from the low bucket -> v1
    versioned_delete(spark, path, "k = 2")
    # our delete, pinned to v0, targets the HIGH bucket -> rebase
    v = versioned_delete(
        spark, path, "k = 75",
        expected_version=0, rebase_on_conflict=True,
    )
    assert v == 2
    assert snapshot_meta(path, "rebased_onto", version=2) == "1"
    keys = {r["k"] for r in versioned_read(spark, path).collect()}
    assert 2 not in keys and 75 not in keys and len(keys) == 78


def test_dv_delete_rebase_keyframe_vs_append(spark, tmp_path):
    """A KEY-FRAME delete (replica-apply shape) proves disjointness
    against a concurrently appended file by stats and rebases; a
    PREDICATE delete racing an append must refuse."""
    from skopje_spark.sinks.versioned import versioned_append, versioned_delete

    path = str(tmp_path / "t")
    _clustered(spark, path)
    versioned_append(
        spark, path, _df(spark, [(1000, "x")]).coalesce(1)
    )                                                                   # v1
    kf = spark.createDataFrame([(5,)], "k long")
    v = versioned_delete(
        spark, path, kf, expected_version=0, rebase_on_conflict=True
    )
    assert v == 2
    keys = {r["k"] for r in versioned_read(spark, path).collect()}
    assert 5 not in keys and 1000 in keys

    path2 = str(tmp_path / "t2")
    _clustered(spark, path2)
    versioned_append(spark, path2, _df(spark, [(1000, "x")]).coalesce(1))
    with pytest.raises(CommitConflict, match="predicate delete"):
        versioned_delete(
            spark, path2, "k = 5",
            expected_version=0, rebase_on_conflict=True,
        )


def test_dv_delete_rebase_refused_when_vectorized_file_touched(spark, tmp_path):
    """An interloper that rewrote (or double-vectorized) the file our
    delete pinned positions into makes the positions stale — refuse."""
    from skopje_spark.sinks.versioned import versioned_delete, versioned_upsert

    path = str(tmp_path / "t")
    _clustered(spark, path)
    versioned_upsert(spark, path, _df(spark, [(6, "theirs")]), ["k"])   # v1
    with pytest.raises(CommitConflict, match="vectorized file"):
        versioned_delete(
            spark, path, "k = 5",
            expected_version=0, rebase_on_conflict=True,
        )


def test_racing_disjoint_range_writers_rebase_under_contention(spark, tmp_path):
    """6 writers racing on DISJOINT key ranges of a clustered table
    with rebase enabled (the default): every update lands, versions
    serialize consecutively, content is the serial union — and the
    rebase path itself is exercised under real thread contention
    (any lost race that rebased recorded its marker)."""
    from skopje_spark.sinks.versioned import snapshot_meta

    path = str(tmp_path / "t")
    rows = [(i, f"base{i}") for i in range(60)]
    versioned_write(
        spark.createDataFrame(rows, "k long, v string")
        .repartitionByRange(6, "k").sortWithinPartitions("k"),
        path,
    )
    errors = []

    def worker(i: int) -> None:
        try:
            upd = spark.createDataFrame(
                [(i * 10 + j, f"w{i}") for j in range(3)], "k long, v string"
            )
            versioned_merge_concurrent(
                spark, path, upd, ["k"], max_retries=16, backoff_s=0.05
            )
        except Exception as e:  # pragma: no cover - failure surface
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert latest_version(path) == 6
    got = {r["k"]: r["v"] for r in versioned_read(spark, path).collect()}
    assert len(got) == 60
    for i in range(6):
        for j in range(3):
            assert got[i * 10 + j] == f"w{i}"
    # rebase observability: any commit that rebased carries its markers
    for v in range(1, 7):
        onto = snapshot_meta(path, "rebased_onto", version=v)
        if onto is not None:
            assert int(onto) == v - 1


# ---------------------------------------------------------------------------
# metadata-only commits racing data commits: both effects must survive
# ---------------------------------------------------------------------------

def _inject_append_before_commit(monkeypatch, spark, path, rows, *, on_op):
    """Deterministically reproduce the round-9 hazard: a data commit
    lands in the window between a metadata op reading the latest
    version and publishing its manifest. The wrapper intercepts the
    metadata op's FIRST commit attempt (identified by its op marker),
    lands a real append, then lets the original commit proceed — the
    guarded CAS must lose and the retry must carry the appended
    files."""
    import skopje_spark.sinks.versioned as V
    from skopje_spark.sinks.versioned import versioned_append

    orig = V._commit_manifest
    state = {"fired": False}

    def racy(p, schema_json, entries, meta, expected_version,
             lock_timeout_s, reuse_refs=None):
        if not state["fired"] and (meta or {}).get("op") == on_op:
            state["fired"] = True
            versioned_append(spark, path, _df(spark, rows))
        return orig(p, schema_json, entries, meta, expected_version,
                    lock_timeout_s, reuse_refs=reuse_refs)

    monkeypatch.setattr(V, "_commit_manifest", racy)
    return state


def test_analyze_racing_append_loses_cas_and_carries_it(
    spark, tmp_path, monkeypatch
):
    """ANALYZE racing one ingest commit: the ingest's rows survive
    (never silently reverted), the stats marker lands, and its
    as_of_version honestly reports the scanned (now stale) version."""
    from skopje_spark.sinks.versioned import table_stats, versioned_analyze

    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(1, "a"), (2, "b")]), path)        # v0
    state = _inject_append_before_commit(
        monkeypatch, spark, path, [(3, "mid-race")], on_op="analyze"
    )
    v = versioned_analyze(spark, path)
    assert state["fired"] and v == 2  # append took v1, analyze v2
    rows = {r["k"]: r["v"] for r in versioned_read(spark, path).collect()}
    assert rows == {1: "a", 2: "b", 3: "mid-race"}  # ingest survived
    st = table_stats(path)
    assert st["n_rows"] == 2                 # describes the scanned v0
    assert st["as_of_version"] == 0          # not claimed current
    assert st["versions_stale"] == 2


def test_rename_racing_append_carries_the_ingest(spark, tmp_path, monkeypatch):
    from skopje_spark.sinks.versioned import versioned_rename_column

    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(1, "a")]), path)                   # v0
    state = _inject_append_before_commit(
        monkeypatch, spark, path, [(2, "mid-race")], on_op="rename_column"
    )
    v = versioned_rename_column(path, "v", "val")
    assert state["fired"] and v == 2
    got = {r["k"]: r["val"] for r in versioned_read(spark, path).collect()}
    assert got == {1: "a", 2: "mid-race"}  # rename AND ingest both landed


def test_constraint_racing_append_validates_the_raced_rows(
    spark, tmp_path, monkeypatch
):
    """set_check_constraint racing an ingest: the retry re-validates
    against the NEW base, so rows landed mid-race are proven too — a
    violating mid-race batch turns the constraint commit into a loud
    ConstraintViolation instead of an unenforced constraint."""
    from skopje_spark.sinks.versioned import (
        ConstraintViolation,
        set_check_constraint,
        table_constraints,
    )

    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(1, "a")]), path)                   # v0
    state = _inject_append_before_commit(
        monkeypatch, spark, path, [(5, "mid-race")], on_op="set_constraint"
    )
    v = set_check_constraint(spark, path, "k_pos", "k > 0")
    assert state["fired"] and v == 2
    assert table_constraints(path) == {"k_pos": "k > 0"}
    got = {r["k"] for r in versioned_read(spark, path).collect()}
    assert got == {1, 5}

    # violating flavor: the mid-race batch falsifies the constraint
    path2 = str(tmp_path / "t2")
    versioned_write(_df(spark, [(1, "a")]), path2)
    _inject_append_before_commit(
        monkeypatch, spark, path2, [(-9, "bad")], on_op="set_constraint"
    )
    with pytest.raises(ConstraintViolation):
        set_check_constraint(spark, path2, "k_pos", "k > 0")
    assert table_constraints(path2) == {}  # nothing published


def test_restore_racing_append_serializes_after_it(
    spark, tmp_path, monkeypatch
):
    """RESTORE racing an ingest: restore wins the serial order (that
    is what rolling back means) but the race is explicit — the
    ingest's commit stays in history, time-travelable, never
    silently overwritten by a stale manifest."""
    from skopje_spark.sinks.versioned import versioned_restore

    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(1, "a")]), path)                   # v0
    versioned_write(_df(spark, [(1, "a"), (2, "b")]), path)         # v1
    state = _inject_append_before_commit(
        monkeypatch, spark, path, [(3, "mid-race")], on_op="restore"
    )
    v = versioned_restore(path, 0, spark=spark)
    assert state["fired"] and v == 3  # append v2, restore v3 (CAS retried)
    got = {r["k"] for r in versioned_read(spark, path).collect()}
    assert got == {1}  # restored content is the new latest
    mid = {r["k"] for r in versioned_read(spark, path, version=2).collect()}
    assert mid == {1, 2, 3}  # the raced ingest is real, committed history
