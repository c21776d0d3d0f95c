"""Unit tests: three-way branch merge (sinks/versioned.py:
versioned_merge_branch). versioned_publish handles the fast-forward
case; merge handles real divergence — the branch's file-level delta
since its fork replays onto main's current manifest, with git/lakeFS
conflict semantics: anything changed differently on both sides refuses
loudly (MergeConflict), nothing is combined silently."""

from __future__ import annotations

import os

import pytest

from skopje_spark.sinks.versioned import (
    CommitConflict,
    MergeConflict,
    branch_path,
    latest_version,
    set_check_constraint,
    snapshot_meta,
    table_refs,
    vacuum,
    versioned_append,
    versioned_branch,
    versioned_compact,
    versioned_delete,
    versioned_merge_branch,
    versioned_publish,
    versioned_read,
    versioned_upsert,
    versioned_write,
)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, ["k", "v"])


def _state(spark, path, **kw):
    return {(r["k"], r["v"]) for r in versioned_read(spark, path, **kw).collect()}


def test_merge_diverged_appends(spark, tmp_path):
    """The canonical diverged case publish refuses: both sides appended
    since the fork. The merge is the union, one metadata commit."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)  # v0
    bdir = versioned_branch(path, "audit")  # v1 (refs)
    versioned_append(spark, bdir, _kv(spark, [(2, "b")]))  # branch-side
    versioned_append(spark, path, _kv(spark, [(3, "m")]))  # main diverges (v2)
    with pytest.raises(CommitConflict, match="fast-forward"):
        versioned_publish(path, "audit")
    n = versioned_merge_branch(path, "audit")
    assert n == latest_version(path)
    assert _state(spark, path) == {(1, "a"), (2, "b"), (3, "m")}
    assert snapshot_meta(path, "op", version=n) == "merge_branch"
    assert snapshot_meta(path, "merge_base_version", version=n) == "0"
    # branch is no longer fast-forwardable but records where it merged
    entry = table_refs(path)["audit"]
    assert entry["base_version"] is None
    assert entry["merged_version"] == n


def test_merge_branch_dv_delete_survives(spark, tmp_path):
    """A deletion-vector DELETE staged on the branch (entry changed,
    zero data files rewritten) lands on main while main's own appended
    file carries through untouched."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]), path)
    bdir = versioned_branch(path, "fix")
    versioned_delete(spark, bdir, "k = 1")
    versioned_append(spark, path, _kv(spark, [(9, "z")]))
    versioned_merge_branch(path, "fix")
    assert _state(spark, path) == {(2, "b"), (9, "z")}
    # the DV file the branch staged is readable from main's pool
    # (hard-linked + freshened, not referenced back into the branch)
    v = latest_version(path)
    assert _state(spark, path, version=v) == {(2, "b"), (9, "z")}


def test_merge_conflict_same_file_changed_both_sides(spark, tmp_path):
    """Both sides DV-deleted from the SAME file: changed-on-both
    refuses, and main is untouched by the failed merge."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]).coalesce(1), path)
    bdir = versioned_branch(path, "b1")
    versioned_delete(spark, bdir, "k = 1")
    versioned_delete(spark, path, "k = 2")  # same single file on main
    before = latest_version(path)
    with pytest.raises(MergeConflict, match="BOTH"):
        versioned_merge_branch(path, "b1")
    assert latest_version(path) == before
    assert _state(spark, path) == {(1, "a")}


def test_merge_conflict_main_compacted_branch_target(spark, tmp_path):
    """Main compacted away the file the branch DV-deleted from: the
    branch's change targets a file main no longer has — refuse (serial
    order would retarget the delete at the compacted file)."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]).repartition(2), path)
    bdir = versioned_branch(path, "b1")
    versioned_delete(spark, bdir, "k = 1")
    versioned_compact(spark, path, target_files=1)
    with pytest.raises(MergeConflict):
        versioned_merge_branch(path, "b1")


def test_merge_constraint_added_on_main_refuses(spark, tmp_path):
    """A CHECK constraint added on main after the fork never saw the
    branch's rows — refuse even though the branch left the property
    untouched."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "b1")
    versioned_append(
        spark, bdir,
        spark.createDataFrame([(2, None)], "k INT, v STRING"),
    )
    set_check_constraint(spark, path, "v_set", "v IS NOT NULL")
    with pytest.raises(MergeConflict, match="constraints"):
        versioned_merge_branch(path, "b1")


def test_merge_adopts_branch_constraint(spark, tmp_path):
    """A constraint added on the BRANCH transfers with the merge, same
    as publish — but when main committed data since the fork, those
    rows must be VALIDATED against it first (they were only ever
    checked against main's own constraints): without a session the
    merge refuses; with one it validates and proceeds."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "b1")
    set_check_constraint(spark, bdir, "v_set", "v IS NOT NULL")
    versioned_append(spark, path, _kv(spark, [(9, "z")]))
    # job-free merge can't prove main's new row satisfies the branch's
    # constraint → refuse
    with pytest.raises(MergeConflict, match="branch's CHECK"):
        versioned_merge_branch(path, "b1")
    # with a session the post-fork rows validate and the merge lands
    versioned_merge_branch(path, "b1", spark=spark)
    assert snapshot_meta(
        path, "constraints", version=latest_version(path)
    ) == snapshot_meta(bdir, "constraints", version=latest_version(bdir))


def test_merge_branch_constraint_rejects_violating_main_rows(
    spark, tmp_path
):
    """The symmetric smuggling hole: main committed a row AFTER the
    fork that violates the constraint the branch added — the merge
    must refuse even WITH a session, or the merged table would
    advertise a CHECK its rows break."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "b1")
    set_check_constraint(spark, bdir, "v_set", "v IS NOT NULL")
    versioned_append(
        spark, path,
        spark.createDataFrame([(9, None)], "k INT, v STRING"),
    )
    with pytest.raises(MergeConflict, match="violate the branch's"):
        versioned_merge_branch(path, "b1", spark=spark)
    # no-data-since-fork merges stay job-free and need no session
    path2 = str(tmp_path / "t2")
    versioned_write(_kv(spark, [(1, "a")]), path2)
    bdir2 = versioned_branch(path2, "b1")
    set_check_constraint(spark, bdir2, "v_set", "v IS NOT NULL")
    versioned_merge_branch(path2, "b1")
    assert snapshot_meta(
        path2, "constraints", version=latest_version(path2)
    ) is not None


def test_sweep_disjoint_subquadratic_and_correct():
    """The key-disjointness gate sweeps sorted intervals — two 1k-file
    deltas decide in O(n+m) comparisons, not the 1e6 pair loop — and
    agrees with the brute-force answer on overlap detection."""
    from skopje_spark.sinks.versioned import _sweep_disjoint

    n = 1000
    # disjoint: branch owns even slots, main odd slots
    b = [(4 * i, 4 * i + 1, f"b{i}") for i in range(n)]
    m = [(4 * i + 2, 4 * i + 3, f"m{i}") for i in range(n)]
    hit, comp = _sweep_disjoint(b, m)
    assert hit is None
    assert comp <= 2 * n  # linear sweep, nowhere near n*m
    # one overlapping pair buried mid-list is found
    m2 = m + [(4 * 500, 4 * 500 + 1, "mX")]
    hit, _ = _sweep_disjoint(b, m2)
    assert hit == ("b500", "mX")
    # brute-force agreement on a small adversarial mix (touching
    # endpoints count as overlap, nested intervals, duplicates)
    b3 = [(0, 10, "b0"), (11, 11, "b1"), (20, 30, "b2")]
    m3 = [(10, 10, "m0")]
    assert _sweep_disjoint(b3, m3)[0] == ("b0", "m0")
    m4 = [(12, 19, "m1"), (31, 40, "m2")]
    assert _sweep_disjoint(b3, m4)[0] is None
    m5 = [(21, 22, "m3")]
    assert _sweep_disjoint(b3, m5)[0] == ("b2", "m3")
    assert _sweep_disjoint([], m3)[0] is None
    assert _sweep_disjoint(b3, [])[0] is None


def test_merge_key_disjointness_gate(spark, tmp_path):
    """key= upgrades the merge to upsert-grade: overlapping key ranges
    between the branch's delta and main's delta refuse; provably
    disjoint ranges merge."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "b1")
    versioned_append(spark, bdir, _kv(spark, [(10, "b"), (11, "b")]))
    versioned_append(spark, path, _kv(spark, [(11, "m"), (12, "m")]))
    with pytest.raises(MergeConflict, match="share keys"):
        versioned_merge_branch(path, "b1", key="k")
    # file-level default still merges (two appends both survive)
    versioned_merge_branch(path, "b1")
    assert (1, "a") in _state(spark, path)
    # disjoint case
    path2 = str(tmp_path / "t2")
    versioned_write(_kv(spark, [(1, "a")]), path2)
    bdir2 = versioned_branch(path2, "b1")
    versioned_append(spark, bdir2, _kv(spark, [(10, "b")]))
    versioned_append(spark, path2, _kv(spark, [(20, "m")]))
    versioned_merge_branch(path2, "b1", key="k")
    assert _state(spark, path2) == {(1, "a"), (10, "b"), (20, "m")}


def test_merge_drop_removes_branch(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "b1")
    versioned_append(spark, bdir, _kv(spark, [(2, "b")]))
    versioned_append(spark, path, _kv(spark, [(3, "m")]))
    versioned_merge_branch(path, "b1", drop=True)
    assert "b1" not in table_refs(path)
    assert not os.path.isdir(branch_path(path, "b1"))
    assert _state(spark, path) == {(1, "a"), (2, "b"), (3, "m")}


def test_repeat_merge_of_further_appends(spark, tmp_path):
    """After a merge the branch can keep staging APPENDS and merge
    again: already-merged files are no-ops against the same fork base."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "b1")
    versioned_append(spark, bdir, _kv(spark, [(2, "b")]))
    versioned_append(spark, path, _kv(spark, [(3, "m")]))
    versioned_merge_branch(path, "b1")
    versioned_append(spark, bdir, _kv(spark, [(4, "b2")]))
    versioned_append(spark, path, _kv(spark, [(5, "m2")]))
    versioned_merge_branch(path, "b1")
    assert _state(spark, path) == {
        (1, "a"), (2, "b"), (3, "m"), (4, "b2"), (5, "m2"),
    }


def test_merge_after_publish_is_noop_plus_delta(spark, tmp_path):
    """publish advances the branch's base; a LATER divergence merges
    with the published files recognized as already-carried no-ops."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "b1")
    versioned_append(spark, bdir, _kv(spark, [(2, "b")]))
    versioned_publish(path, "b1")  # fast-forward
    versioned_append(spark, bdir, _kv(spark, [(3, "b2")]))
    versioned_append(spark, path, _kv(spark, [(4, "m")]))  # diverge
    versioned_merge_branch(path, "b1")
    assert _state(spark, path) == {(1, "a"), (2, "b"), (3, "b2"), (4, "m")}


def test_merge_historical_fork_is_not_a_revert(spark, tmp_path):
    """A branch forked from a HISTORICAL version (publish refuses it
    outright) merges its delta without reverting main's newer commits."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)  # v0
    versioned_append(spark, path, _kv(spark, [(2, "m")]))  # v1
    bdir = versioned_branch(path, "old", version=0)
    with pytest.raises(ValueError, match="historical"):
        versioned_publish(path, "old")
    versioned_append(spark, bdir, _kv(spark, [(3, "b")]))
    versioned_merge_branch(path, "old")
    assert _state(spark, path) == {(1, "a"), (2, "m"), (3, "b")}


def test_merge_upsert_rewrite_on_branch(spark, tmp_path):
    """A branch-side UPSERT that rewrote a fork file (remove+add)
    merges onto a main that only appended."""
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]).coalesce(1), path)
    bdir = versioned_branch(path, "b1")
    versioned_upsert(spark, bdir, _kv(spark, [(1, "A")]), ["k"])
    versioned_append(spark, path, _kv(spark, [(9, "m")]))
    versioned_merge_branch(path, "b1")
    assert _state(spark, path) == {(1, "A"), (2, "b"), (9, "m")}


def test_merge_refuses_vacuumed_fork_base(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "b1")
    versioned_append(spark, bdir, _kv(spark, [(2, "b")]))
    versioned_append(spark, path, _kv(spark, [(3, "m")]))
    vacuum(path, keep=1, min_file_age_s=0.0)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        versioned_merge_branch(path, "b1")


def test_merge_tag_and_missing_ref_errors(spark, tmp_path):
    from skopje_spark.sinks.versioned import versioned_tag

    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)
    versioned_tag(path, "rel")
    with pytest.raises(ValueError, match="tag, not a branch"):
        versioned_merge_branch(path, "rel")
    with pytest.raises(KeyError):
        versioned_merge_branch(path, "nope")


def test_merge_rederives_after_lost_commit_race(spark, tmp_path, monkeypatch):
    """A commit landing on main between the merge's read and its CAS
    loses the race loudly inside _commit_manifest; the retry loop
    re-derives against the new latest and the merged result carries
    BOTH the racer's append and the branch delta."""
    import skopje_spark.sinks.versioned as V

    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "b1")
    versioned_append(spark, bdir, _kv(spark, [(2, "b")]))
    versioned_append(spark, path, _kv(spark, [(3, "m")]))

    real_commit = V._commit_manifest
    fired = {"n": 0}

    def racing(path_, schema, entries, meta, expected, lock, **kw):
        if (
            meta.get("op") == "merge_branch"
            and path_ == path
            and fired["n"] == 0
        ):
            fired["n"] = 1
            # the racer's append lands first — the merge's CAS must lose
            versioned_append(spark, path, _kv(spark, [(4, "race")]))
        return real_commit(path_, schema, entries, meta, expected, lock,
                           **kw)

    monkeypatch.setattr(V, "_commit_manifest", racing)
    versioned_merge_branch(path, "b1")
    assert fired["n"] == 1
    assert _state(spark, path) == {
        (1, "a"), (2, "b"), (3, "m"), (4, "race"),
    }


def test_merge_race_with_conflicting_change_refuses(spark, tmp_path,
                                                    monkeypatch):
    """Same race, but the interleaved commit CONFLICTS (it DVs the file
    the branch also changed): the re-derivation refuses loudly instead
    of silently dropping either side."""
    import skopje_spark.sinks.versioned as V

    path = str(tmp_path / "t")
    versioned_write(_kv(spark, [(1, "a"), (2, "b")]).coalesce(1), path)
    bdir = versioned_branch(path, "b1")
    versioned_delete(spark, bdir, "k = 1")

    real_commit = V._commit_manifest
    fired = {"n": 0}

    def racing(path_, schema, entries, meta, expected, lock, **kw):
        if (
            meta.get("op") == "merge_branch"
            and path_ == path
            and fired["n"] == 0
        ):
            fired["n"] = 1
            versioned_delete(spark, path, "k = 2")  # same single file
        return real_commit(path_, schema, entries, meta, expected, lock,
                           **kw)

    monkeypatch.setattr(V, "_commit_manifest", racing)
    with pytest.raises(MergeConflict, match="BOTH"):
        versioned_merge_branch(path, "b1")
    assert _state(spark, path) == {(1, "a")}  # racer's delete won; branch's didn't leak
