"""Unit tests: named refs — tags, branches, write-audit-publish
(sinks/versioned.py refs tier). A tag is a metadata-only name for a
committed version, exempt from vacuum retention; a branch is a
zero-copy writable fork under _branches/<name> that versioned_publish
fast-forwards back onto main as one guarded commit."""

from __future__ import annotations

import os

import pytest

from skopje_spark.sinks.versioned import (
    CommitConflict,
    branch_path,
    latest_version,
    table_refs,
    vacuum,
    versioned_branch,
    versioned_delete,
    versioned_drop_ref,
    versioned_publish,
    versioned_read,
    versioned_tag,
    versioned_upsert,
    versioned_write,
)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, ["k", "v"])


def _state(spark, path, **kw):
    return {(r["k"], r["v"]) for r in versioned_read(spark, path, **kw).collect()}


# ---------------------------------------------------------------- tags

def test_tag_pins_a_version_across_later_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]), path)
    versioned_tag(path, "baseline")  # tags v0, commits v1 (metadata)
    versioned_write(_kv(spark, [(1, "a2")]), path)  # v2
    # the ref survives subsequent data commits (carried property)
    refs = table_refs(path)
    assert refs["baseline"] == {
        "type": "tag", "version": 0,
        "created_ts": refs["baseline"]["created_ts"],
    }
    assert _state(spark, path, ref="baseline") == {(1, "a"), (2, "b")}
    assert _state(spark, path) == {(1, "a2")}


def test_tag_explicit_version_replace_and_name_rules(spark, tmp_path):
    path = str(tmp_path / "t2")
    versioned_write(_kv(spark, [(1, "a")]), path)
    versioned_write(_kv(spark, [(1, "b")]), path)
    versioned_tag(path, "x", version=0)
    with pytest.raises(ValueError, match="replace"):
        versioned_tag(path, "x", version=1)
    versioned_tag(path, "x", version=1, replace=True)
    assert table_refs(path)["x"]["version"] == 1
    with pytest.raises(FileNotFoundError, match="not committed"):
        versioned_tag(path, "future", version=99)
    for bad in ("", "a/b", "..", "-lead", "a" * 65):
        with pytest.raises(ValueError, match="ref name"):
            versioned_tag(path, bad)
    with pytest.raises(KeyError):
        versioned_read(spark, path, ref="nosuch")
    with pytest.raises(ValueError, match="not both"):
        versioned_read(spark, path, ref="x", version=0)


def test_vacuum_keeps_tagged_snapshots_until_drop(spark, tmp_path):
    path = str(tmp_path / "t3")
    versioned_write(_kv(spark, [(1, "a")]), path)          # v0
    versioned_tag(path, "keepme", version=0)               # v1
    for i in range(4):                                     # v2..v5
        versioned_write(_kv(spark, [(1, f"x{i}")]), path)
    removed = vacuum(path, keep=1, min_file_age_s=0.0)
    assert 0 not in removed
    # the tagged snapshot still reads exactly as committed
    assert _state(spark, path, ref="keepme") == {(1, "a")}
    # dropping the tag releases it to the next vacuum
    versioned_drop_ref(path, "keepme")
    removed2 = vacuum(path, keep=1, min_file_age_s=0.0)
    assert 0 in removed2
    with pytest.raises(FileNotFoundError):
        versioned_read(spark, path, version=0)
    with pytest.raises(KeyError):
        versioned_drop_ref(path, "keepme")


# ------------------------------------------------------------ branches

def test_branch_isolates_writes_and_publish_fast_forwards(spark, tmp_path):
    path = str(tmp_path / "b")
    versioned_write(_kv(spark, [(1, "a"), (2, "b"), (3, "c")]), path)
    bdir = versioned_branch(path, "audit")
    assert bdir == branch_path(path, "audit")
    assert table_refs(path)["audit"]["type"] == "branch"
    # stage on the branch: upsert + delete; main never moves
    versioned_upsert(spark, bdir, _kv(spark, [(2, "B"), (4, "d")]), ["k"])
    versioned_delete(spark, bdir, "k = 3")
    assert _state(spark, path) == {(1, "a"), (2, "b"), (3, "c")}
    # the branch reads through the ref too
    assert _state(spark, path, ref="audit") == {(1, "a"), (2, "B"), (4, "d")}
    # publish: main flips atomically to the audited state
    main_v = latest_version(path)
    n = versioned_publish(path, "audit")
    assert n == main_v + 1
    assert _state(spark, path) == {(1, "a"), (2, "B"), (4, "d")}
    # pre-publish history is intact (WAP: readers never saw drafts)
    assert _state(spark, path, version=main_v) == {(1, "a"), (2, "b"), (3, "c")}
    # base advanced: the branch can keep staging and publish again
    assert table_refs(path)["audit"]["base_version"] == n
    versioned_upsert(spark, bdir, _kv(spark, [(5, "e")]), ["k"])
    versioned_publish(path, "audit", drop=True)
    assert _state(spark, path) == {(1, "a"), (2, "B"), (4, "d"), (5, "e")}
    assert "audit" not in table_refs(path)
    assert not os.path.isdir(bdir)


def test_publish_refuses_when_main_advanced(spark, tmp_path):
    path = str(tmp_path / "b2")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "wap")
    versioned_upsert(spark, bdir, _kv(spark, [(2, "b")]), ["k"])
    versioned_write(_kv(spark, [(1, "z")]), path)  # main moves on
    with pytest.raises(CommitConflict, match="not a fast-forward"):
        versioned_publish(path, "wap")
    # main untouched by the refused publish
    assert _state(spark, path) == {(1, "z")}
    versioned_drop_ref(path, "wap")
    assert not os.path.isdir(bdir)


def test_branch_from_historical_version_is_not_publishable(spark, tmp_path):
    path = str(tmp_path / "b2h")
    versioned_write(_kv(spark, [(1, "a")]), path)  # v0
    versioned_write(_kv(spark, [(1, "b")]), path)  # v1
    bdir = versioned_branch(path, "old", version=0)
    # the fork itself reads the historical state
    assert _state(spark, bdir) == {(1, "a")}
    with pytest.raises(ValueError, match="not publishable"):
        versioned_publish(path, "old")
    assert _state(spark, path) == {(1, "b")}


def test_branch_survives_main_vacuum_and_vice_versa(spark, tmp_path):
    path = str(tmp_path / "b3")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]), path)
    bdir = versioned_branch(path, "fork")
    for i in range(3):
        versioned_write(_kv(spark, [(1, f"m{i}")]), path)
    vacuum(path, keep=1, min_file_age_s=0.0)
    # branch pool holds its own hard links: main's vacuum can't break it
    assert _state(spark, bdir) == {(1, "a"), (2, "b")}
    for i in range(3):
        versioned_upsert(spark, bdir, _kv(spark, [(9, f"b{i}")]), ["k"])
    vacuum(bdir, keep=1, min_file_age_s=0.0)
    assert _state(spark, path) == {(1, "m2")}


def test_branch_name_collisions_and_tag_branch_cross_rules(spark, tmp_path):
    path = str(tmp_path / "b4")
    versioned_write(_kv(spark, [(1, "a")]), path)
    versioned_branch(path, "dev")
    with pytest.raises(ValueError, match="already exists"):
        versioned_branch(path, "dev")
    with pytest.raises(ValueError, match="already exists"):
        versioned_tag(path, "dev")
    versioned_tag(path, "rel")
    with pytest.raises(ValueError, match="already exists"):
        versioned_branch(path, "rel")
    with pytest.raises(ValueError, match="tag, not a branch"):
        versioned_publish(path, "rel")


def test_connector_reads_refs(spark, tmp_path):
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    path = str(tmp_path / "b5")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]), path)
    versioned_tag(path, "t0")
    bdir = versioned_branch(path, "dev")
    versioned_upsert(spark, bdir, _kv(spark, [(2, "B")]), ["k"])
    versioned_write(_kv(spark, [(3, "c")]), path)

    def rd(**opts):
        r = spark.read.format("skopje_versioned").option("path", path)
        for k, v in opts.items():
            r = r.option(k, v)
        return {(x["k"], x["v"]) for x in r.load().collect()}

    assert rd(ref="t0") == {(1, "a"), (2, "b")}
    assert rd(ref="dev") == {(1, "a"), (2, "B")}
    assert rd() == {(3, "c")}
    with pytest.raises(Exception, match="not both"):
        rd(ref="t0", versionAsOf="0")


def test_publish_carries_branch_schema_evolution(spark, tmp_path):
    from skopje_spark.sinks.versioned import versioned_rename_column

    path = str(tmp_path / "b6")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]), path)
    bdir = versioned_branch(path, "schema")
    versioned_rename_column(bdir, "v", "val")
    versioned_upsert(spark, bdir, spark.createDataFrame(
        [(3, "c")], ["k", "val"]), ["k"])
    versioned_publish(path, "schema", drop=True)
    got = {(r["k"], r["val"]) for r in versioned_read(spark, path).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # rename ledger transferred: physical names stay stable on main
    assert versioned_read(spark, path).columns == ["k", "val"]


def test_branch_maintains_value_index_and_publish_carries_it(spark, tmp_path):
    from skopje_spark.sinks.versioned import (
        _read_manifest,
        snapshot_meta,
        versioned_append,
        versioned_value_index,
    )

    path = str(tmp_path / "b7")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]), path)
    versioned_value_index(spark, path, ["v"])
    bdir = versioned_branch(path, "idx")
    # clone transferred the maintenance config
    assert snapshot_meta(bdir, "value_index",
                         version=latest_version(bdir)) is not None
    versioned_append(spark, bdir, _kv(spark, [(3, "c")]))
    man = _read_manifest(bdir, latest_version(bdir))
    live = [e for e in man["files"] if e.get("rows")]
    # every non-empty file (cloned AND branch-written) carries sets
    assert len(live) >= 2
    assert all(
        (e.get("stats") or {}).get("v", {}).get("vals") for e in live
    )
    versioned_publish(path, "idx", drop=True)
    man2 = _read_manifest(path, latest_version(path))
    assert all(
        (e.get("stats") or {}).get("v", {}).get("vals")
        for e in man2["files"] if e.get("rows")
    )
    assert snapshot_meta(path, "value_index",
                         version=latest_version(path)) is not None


def test_maintenance_report_surfaces_refs(spark, tmp_path):
    from skopje_spark.sinks.versioned import maintenance_report

    path = str(tmp_path / "mr")
    versioned_write(_kv(spark, [(1, "a")]), path)          # v0
    versioned_tag(path, "pin0")                            # v1 (tags v0)
    versioned_branch(path, "fresh")                        # v2
    versioned_branch(path, "gone-stale")                   # v3
    versioned_write(_kv(spark, [(1, "b")]), path)          # v4: mains on
    rep = maintenance_report(path)
    assert rep["n_tags"] == 1 and rep["n_branches"] == 2
    # the tag holds v0, far outside the recent window → pinning
    assert rep["pinning_tags"] == ["pin0"]
    # both branches' bases predate the current committed version
    assert rep["stale_branches"] == ["fresh", "gone-stale"]
    assert "drop_stale_branches" in rep["recommendations"]
    # a just-forked branch on a fresh table is NOT stale
    p2 = str(tmp_path / "mr2")
    versioned_write(_kv(spark, [(1, "a")]), p2)
    versioned_branch(p2, "live")
    rep2 = maintenance_report(p2)
    assert rep2["stale_branches"] == [] and rep2["n_branches"] == 1
    assert "drop_stale_branches" not in rep2["recommendations"]


def test_orphaned_branch_dir_is_cleared_on_recreate(spark, tmp_path):
    """Crash residue: a drop/publish that committed its refs removal
    but died before deleting the branch directory must not block
    re-creating the branch — the refs property is the source of
    truth."""
    import shutil as _sh

    path = str(tmp_path / "b8")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "dev")
    # simulate the crash window: remove the refs entry the way
    # drop_ref's commit does, but leave the directory behind
    saved = str(tmp_path / "saved")
    _sh.copytree(bdir, saved)
    versioned_drop_ref(path, "dev")
    _sh.copytree(saved, bdir)  # the orphan
    # genuine residue is OLD (the age gate separates it from a live
    # concurrent creator's fresh clone) — backdate it accordingly
    old = __import__("time").time() - 3600.0
    os.utime(bdir, (old, old))
    assert "dev" not in table_refs(path) and os.path.isdir(bdir)
    bdir2 = versioned_branch(path, "dev")  # must not raise
    assert bdir2 == bdir
    assert _state(spark, path, ref="dev") == {(1, "a")}


def test_streaming_wap_stream_into_branch_then_publish(spark, tmp_path):
    """Streaming write-audit-publish composes from existing parts: a
    branch is a full table, so writeStream lands micro-batches on the
    branch (exactly-once ledger and all) while main serves the last
    published state; publish flips main atomically to the audited
    stream output."""
    import os as _os

    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    path = str(tmp_path / "swap")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "ingest")
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text('{"k": 2, "v": "b"}\n{"k": 3, "v": "c"}\n')
    q = (
        spark.readStream.schema("k long, v string").json(str(src))
        .writeStream.format("skopje_versioned").option("path", bdir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    # audit boundary: the stream landed on the branch only
    assert _state(spark, path) == {(1, "a")}
    assert _state(spark, bdir) == {(1, "a"), (2, "b"), (3, "c")}
    versioned_publish(path, "ingest")
    assert _state(spark, path) == {(1, "a"), (2, "b"), (3, "c")}
    # the branch keeps its stream ledger for the next micro-batches
    from skopje_spark.sinks.versioned import snapshot_meta

    assert snapshot_meta(
        bdir, "stream_ledger", version=latest_version(bdir)
    ) is not None
    assert _os.path.isdir(bdir)


def test_attach_versioned_ref_views(spark, tmp_path):
    from skopje_spark.sources.lakesource import attach_versioned

    path = str(tmp_path / "b9")
    versioned_write(_kv(spark, [(1, "a")]), path)
    versioned_tag(path, "t0")
    bdir = versioned_branch(path, "dev")
    versioned_upsert(spark, bdir, _kv(spark, [(2, "b")]), ["k"])
    versioned_write(_kv(spark, [(9, "z")]), path)
    attach_versioned(spark, "refv_tag", path, ref="t0")
    attach_versioned(spark, "refv_dev", path, ref="dev")
    got = {
        (r["k"], r["v"], r["src"])
        for r in spark.sql(
            "SELECT k, v, 'tag' AS src FROM refv_tag "
            "UNION ALL SELECT k, v, 'dev' FROM refv_dev"
        ).collect()
    }
    assert got == {(1, "a", "tag"), (1, "a", "dev"), (2, "b", "dev")}


def test_change_feed_across_ref_and_publish_commits(spark, tmp_path):
    """Ref-only commits (tag / branch creation / drop_ref) feed ZERO
    rows — consumers cross them without keys and without a snapshot
    diff. A publish_branch commit is real content change: with keys it
    serves the exact staged diff via the snapshot-diff fallback;
    without keys it raises loudly instead of feeding garbage."""
    from skopje_spark.sinks.versioned import versioned_change_feed

    path = str(tmp_path / "feed")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]), path)   # v0
    versioned_tag(path, "t0")                                 # v1
    bdir = versioned_branch(path, "wap")                      # v2
    versioned_upsert(spark, bdir, _kv(spark, [(3, "c")]), ["k"])
    versioned_drop_ref(path, "t0")                            # v3
    versioned_publish(path, "wap", drop=True)                 # v4
    # ref-only range: zero rows, no keys needed
    assert versioned_change_feed(
        spark, path, from_version=1, to_version=3
    ).count() == 0
    # the publish version feeds the staged insert via keyed diff
    rows = versioned_change_feed(
        spark, path, from_version=4, keys=["k"]
    ).collect()
    assert {(r["k"], r["_change_type"]) for r in rows} == {(3, "insert")}
    # and refuses keyless (no CDC sidecars were recorded)
    with pytest.raises(ValueError, match="no recorded change feed"):
        versioned_change_feed(spark, path, from_version=4)


# ------------------------------------------- create/drop race hygiene
# (round-13 ADVICE: the residue sweep must never delete a live racer's
# in-flight clone, the tombstone sweep must never break a live drop's
# rollback, and publish/clone must freshen pooled mtimes so vacuum's
# age gate holds its promise for hours-old audited branch files)


def test_fresh_orphan_branch_dir_refuses_instead_of_sweeping(
    spark, tmp_path
):
    """A branch dir with no refs entry that is FRESH is a concurrent
    creator's in-flight clone, not crash residue — a second creator
    must refuse loudly rather than delete it from under the racer."""
    import shutil as _sh

    path = str(tmp_path / "b10")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "dev")
    saved = str(tmp_path / "saved10")
    _sh.copytree(bdir, saved)
    versioned_drop_ref(path, "dev")
    _sh.copytree(saved, bdir)  # fresh mtime: looks in-flight
    with pytest.raises(CommitConflict, match="concurrent"):
        versioned_branch(path, "dev")
    # the presumed-live dir was NOT deleted
    assert os.path.isdir(bdir)


def test_fresh_drop_tombstone_survives_branch_create(spark, tmp_path):
    """An in-flight drop tombstone-renames its dir before the refs
    commit and renames it BACK if the commit is refused — a branch
    create sweeping fresh tombstones would break that rollback. Old
    tombstones (a crashed drop's residue) are still swept."""
    import time as _t

    path = str(tmp_path / "b11")
    versioned_write(_kv(spark, [(1, "a")]), path)
    broot = os.path.join(path, "_branches")
    fresh = os.path.join(broot, ".dropped-x-deadbeef")
    stale = os.path.join(broot, ".dropped-y-cafebabe")
    os.makedirs(fresh)
    os.makedirs(stale)
    old = _t.time() - 3600.0
    os.utime(stale, (old, old))
    versioned_branch(path, "dev")
    assert os.path.isdir(fresh)        # live drop's rollback intact
    assert not os.path.isdir(stale)    # crashed drop's residue swept


def test_retire_branch_dir_freshens_tombstone(spark, tmp_path):
    """os.replace preserves the moved dir's own mtime, so a drop of an
    OLD branch would tombstone as instantly-sweepable residue unless
    the rename freshens it."""
    import time as _t

    from skopje_spark.sinks.versioned import _retire_branch_dir

    path = str(tmp_path / "b12")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "old")
    ancient = _t.time() - 7200.0
    os.utime(bdir, (ancient, ancient))
    tomb = _retire_branch_dir(path, "old")
    assert tomb is not None
    assert _t.time() - os.path.getmtime(tomb) < 60.0


def test_branch_failure_cleanup_spares_racing_winner(
    spark, tmp_path, monkeypatch
):
    """The advisor's interleaving: creator A stalls after its clone; a
    racer (correctly treating A as crashed) sweeps, reclones, and wins
    the refs commit. A's derive then loses with 'already exists' — and
    A's failure cleanup must NOT delete the dir now serving the
    winner's committed branch."""
    import json as _json
    import shutil as _sh

    import skopje_spark.sinks.versioned as V

    path = str(tmp_path / "b13")
    versioned_write(_kv(spark, [(1, "a")]), path)
    real = V._metadata_commit
    fired = {"done": False}

    def hijack(p, derive, **kw):
        if not fired["done"] and p == path:
            fired["done"] = True
            bdir = V.branch_path(path, "dev")
            _sh.rmtree(bdir)  # the racer sweeps the "crashed" creator
            V.versioned_clone(path, bdir, version=0,
                              expected_version=None)

            def rderive(cur, raw):
                refs = V.table_refs(path, version=cur)
                refs["dev"] = {
                    "type": "branch", "fork_version": 0,
                    "base_version": cur + 1, "created_ts": "0",
                }
                return raw["schema"], {
                    "op": "branch", "refs": _json.dumps(refs),
                }

            real(path, rderive, lock_timeout_s=60.0)  # racer wins
        return real(p, derive, **kw)

    monkeypatch.setattr(V, "_metadata_commit", hijack)
    with pytest.raises(ValueError, match="already exists"):
        versioned_branch(path, "dev")
    # the winner's committed branch survived the loser's cleanup
    assert os.path.isdir(branch_path(path, "dev"))
    assert _state(spark, path, ref="dev") == {(1, "a")}


def test_branch_own_failure_still_cleans_residue(
    spark, tmp_path, monkeypatch
):
    """When the refs commit fails for a NON-race reason, the creator's
    own clone is residue and must still be removed (the ownership
    token says it is ours and no refs entry serves the name)."""
    import skopje_spark.sinks.versioned as V

    path = str(tmp_path / "b14")
    versioned_write(_kv(spark, [(1, "a")]), path)
    real = V._metadata_commit

    def boom(p, derive, **kw):
        if p == path:
            raise RuntimeError("pointer store I/O failure")
        return real(p, derive, **kw)

    monkeypatch.setattr(V, "_metadata_commit", boom)
    with pytest.raises(RuntimeError, match="pointer store"):
        versioned_branch(path, "dev")
    assert not os.path.isdir(branch_path(path, "dev"))
    assert "dev" not in table_refs(path)


def test_publish_freshens_pooled_mtimes(spark, tmp_path):
    """Write-audit-publish stages HOURS-old branch files into main's
    pool; os.link preserves their old mtimes, so vacuum's
    min_file_age_s pool guard would see them as unreferenced AND old
    in the window before the CAS commit and unlink them. Publish must
    freshen every pooled entry so the age gate means what it says."""
    import json as _json
    import time as _t

    from skopje_spark.sinks.versioned import (
        _read_manifest, versioned_publish as _pub,
    )

    path = str(tmp_path / "b15")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "wap")
    versioned_upsert(spark, bdir, _kv(spark, [(2, "b")]), ["k"])
    # the audit took hours: backdate every branch pool file (shared
    # inodes backdate main's copies too — those are referenced by
    # main's pre-publish manifest and NOT part of the hazard, so the
    # freshness assertion below covers only files NEW to main's pool)
    ancient = _t.time() - 7200.0
    pool = os.path.join(bdir, "data")
    for f in os.listdir(pool):
        os.utime(os.path.join(pool, f), (ancient, ancient))
    pre = set(os.listdir(os.path.join(path, "data")))
    t0 = _t.time()
    versioned_publish(path, "wap")
    man = _read_manifest(path, latest_version(path))
    checked = 0
    for e in man["files"]:
        for rel in [e["path"], *e.get("dv_files", [])]:
            if os.path.basename(rel) in pre:
                continue  # shared since the fork — vacuum ref-counts it
            full = os.path.join(path, rel)
            assert os.path.getmtime(full) >= t0 - 60.0, rel
            checked += 1
    assert checked >= 1
    # and the published state is what the branch audited
    assert _state(spark, path) == {(1, "a"), (2, "b")}
    # vacuum right after the publish keeps every referenced file
    vacuum(path, keep=1, min_file_age_s=600.0)
    assert _state(spark, path) == {(1, "a"), (2, "b")}


def test_clone_freshens_pooled_mtimes(spark, tmp_path):
    """Same hazard on versioned_clone: linked pool entries inherit the
    source files' mtimes (arbitrarily old on a long-lived table)."""
    import time as _t

    from skopje_spark.sinks.versioned import (
        _read_manifest, versioned_clone,
    )

    src, dst = str(tmp_path / "src16"), str(tmp_path / "dst16")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]), src)
    ancient = _t.time() - 7200.0
    pool = os.path.join(src, "data")
    for f in os.listdir(pool):
        os.utime(os.path.join(pool, f), (ancient, ancient))
    t0 = _t.time()
    versioned_clone(src, dst)
    man = _read_manifest(dst, latest_version(dst))
    for e in man["files"]:
        full = os.path.join(dst, e["path"])
        assert os.path.getmtime(full) >= t0 - 60.0, e["path"]
    assert _state(spark, dst) == {(1, "a"), (2, "b")}
