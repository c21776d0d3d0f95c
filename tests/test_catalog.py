"""Unit tests: the catalog tier (sinks/catalog.py) — multi-table
consistent snapshots, vacuum-protecting pin tags, and atomic
multi-table write-audit-publish over per-table branches."""

from __future__ import annotations

import pytest

from skopje_spark.sinks.catalog import (
    attach_catalog,
    catalog_commit,
    catalog_publish,
    catalog_read,
    catalog_tables,
)
from skopje_spark.sinks.versioned import (
    CommitConflict,
    table_refs,
    vacuum,
    versioned_branch,
    versioned_publish,
    versioned_tag,
    versioned_upsert,
    versioned_write,
)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, ["k", "v"])


def _vals(df):
    return {(r["k"], r["v"]) for r in df.collect()}


def test_catalog_pins_consistent_versions(spark, tmp_path):
    a, b, cat = (str(tmp_path / x) for x in ("a", "b", "cat"))
    versioned_write(_kv(spark, [(1, "a")]), a)
    versioned_write(_kv(spark, [(1, "x")]), b)
    v0 = catalog_commit(cat, {"ta": (a, None), "tb": (b, None)})
    assert v0 == 0
    # table mains move on; the catalog still serves the pinned pair
    versioned_write(_kv(spark, [(1, "a2")]), a)
    versioned_write(_kv(spark, [(1, "x2")]), b)
    assert _vals(catalog_read(spark, cat, "ta")) == {(1, "a")}
    assert _vals(catalog_read(spark, cat, "tb")) == {(1, "x")}
    # re-pin to current latests in one commit; old catalog version
    # still serves the OLD consistent pair (multi-table time travel)
    v1 = catalog_commit(cat, {"ta": None, "tb": None})
    assert _vals(catalog_read(spark, cat, "ta")) == {(1, "a2")}
    assert _vals(catalog_read(spark, cat, "ta", version=v0)) == {(1, "a")}
    assert _vals(catalog_read(spark, cat, "tb", version=v0)) == {(1, "x")}
    views = attach_catalog(spark, cat, version=v1, prefix="c_")
    assert set(views) == {"c_ta", "c_tb"}
    assert _vals(spark.table("c_tb")) == {(1, "x2")}
    # guarded commits CAS on the catalog version
    with pytest.raises(CommitConflict, match="expected"):
        catalog_commit(cat, {"ta": None}, expected_version=v0)
    with pytest.raises(KeyError):
        catalog_read(spark, cat, "nosuch")
    # drop removes the table from the mapping
    catalog_commit(cat, {"tb": "drop"})
    assert set(catalog_tables(cat)) == {"ta"}


def test_catalog_pin_tags_protect_from_vacuum(spark, tmp_path):
    a, cat = str(tmp_path / "a"), str(tmp_path / "cat")
    versioned_write(_kv(spark, [(1, "a")]), a)            # v0
    from skopje_spark.sinks.catalog import _cat_tag

    catalog_commit(cat, {"ta": (a, 0)})                   # tags v0
    tag = _cat_tag(cat, "ta")
    assert table_refs(a)[tag]["version"] == 0
    for i in range(4):
        versioned_write(_kv(spark, [(1, f"m{i}")]), a)
    removed = vacuum(a, keep=1, min_file_age_s=0.0)
    assert 0 not in removed  # the catalog-pinned snapshot survives
    assert _vals(catalog_read(spark, cat, "ta")) == {(1, "a")}
    # re-pinning retargets the tag and releases the old version
    catalog_commit(cat, {"ta": None})
    assert table_refs(a)[tag]["version"] > 0
    assert 0 in vacuum(a, keep=1, min_file_age_s=0.0)


def test_catalog_publish_flips_tables_together(spark, tmp_path):
    docs, embs, cat = (str(tmp_path / x) for x in ("docs", "embs", "cat"))
    versioned_write(_kv(spark, [(1, "d1"), (2, "d2")]), docs)
    versioned_write(_kv(spark, [(1, "e1"), (2, "e2")]), embs)
    v0 = catalog_commit(cat, {"docs": (docs, None), "embs": (embs, None)})
    versioned_upsert(
        spark, versioned_branch(docs, "wap"), _kv(spark, [(3, "d3")]), ["k"]
    )
    versioned_upsert(
        spark, versioned_branch(embs, "wap"), _kv(spark, [(3, "e3")]), ["k"]
    )
    # before publish: catalog serves the old pair
    assert _vals(catalog_read(spark, cat, "docs")) == {(1, "d1"), (2, "d2")}
    v1 = catalog_publish(cat, {"docs": "wap", "embs": "wap"}, drop=True)
    assert _vals(catalog_read(spark, cat, "docs")) == {
        (1, "d1"), (2, "d2"), (3, "d3")
    }
    assert _vals(catalog_read(spark, cat, "embs")) == {
        (1, "e1"), (2, "e2"), (3, "e3")
    }
    # the OLD catalog version still serves the old CONSISTENT pair
    assert _vals(catalog_read(spark, cat, "docs", version=v0)) == {
        (1, "d1"), (2, "d2")
    }
    assert _vals(catalog_read(spark, cat, "embs", version=v0)) == {
        (1, "e1"), (2, "e2")
    }
    assert v1 == v0 + 1
    assert "wap" not in table_refs(docs)


def test_catalog_publish_prechecks_before_any_table_moves(spark, tmp_path):
    a, b, cat = (str(tmp_path / x) for x in ("a", "b", "cat"))
    versioned_write(_kv(spark, [(1, "a")]), a)
    versioned_write(_kv(spark, [(1, "x")]), b)
    catalog_commit(cat, {"ta": (a, None), "tb": (b, None)})
    versioned_upsert(spark, versioned_branch(a, "ok"), _kv(spark, [(2, "n")]), ["k"])
    versioned_branch(b, "stale")
    versioned_write(_kv(spark, [(1, "x2")]), b)  # b's branch goes stale
    va = {e["version"] for e in catalog_tables(cat).values()}
    with pytest.raises(CommitConflict, match="aborting before any"):
        catalog_publish(cat, {"ta": "ok", "tb": "stale"})
    # the staleness precheck fired BEFORE any table moved: a's main is
    # untouched (its publishable branch was NOT consumed), and the
    # catalog pins still serve the old consistent set
    from skopje_spark.sinks.versioned import versioned_read

    assert _vals(versioned_read(spark, a)) == {(1, "a")}
    assert {e["version"] for e in catalog_tables(cat).values()} == va
    assert _vals(catalog_read(spark, cat, "ta")) == {(1, "a")}
    # the untouched branch publishes fine on its own afterwards
    versioned_publish(a, "ok")
    assert _vals(versioned_read(spark, a)) == {(1, "a"), (2, "n")}
    with pytest.raises(KeyError, match="no branch"):
        catalog_publish(cat, {"ta": "nosuch"})


def test_publish_fast_forwards_over_ref_only_commits(spark, tmp_path):
    path = str(tmp_path / "reffwd")
    versioned_write(_kv(spark, [(1, "a")]), path)
    bdir = versioned_branch(path, "wap")
    versioned_upsert(spark, bdir, _kv(spark, [(2, "b")]), ["k"])
    # ref-only commits on main (a release tag) must not block publish
    versioned_tag(path, "rel-1")
    versioned_tag(path, "rel-2", version=0)
    versioned_publish(path, "wap", drop=True)
    got = {(r["k"], r["v"]) for r in
           __import__("skopje_spark").versioned_read(spark, path).collect()}
    assert got == {(1, "a"), (2, "b")}
    # the tags survived the publish
    assert {"rel-1", "rel-2"} <= set(table_refs(path))


def test_two_catalogs_same_basename_pin_independently(spark, tmp_path):
    """Two catalogs sharing a basename must not retarget each other's
    pin tag on a shared table — each tag carries the catalog's path
    digest."""
    a = str(tmp_path / "a")
    versioned_write(_kv(spark, [(1, "x")]), a)            # v0
    c1 = str(tmp_path / "prod" / "catalog")
    c2 = str(tmp_path / "staging" / "catalog")
    catalog_commit(c1, {"ta": (a, 0)})
    versioned_write(_kv(spark, [(1, "y")]), a)            # v1 (+tag = v2)
    catalog_commit(c2, {"ta": (a, None)})
    # both pins protected: vacuum keeps v0 AND the c2-pinned latest
    removed = vacuum(a, keep=1, min_file_age_s=0.0)
    assert 0 not in removed
    assert _vals(catalog_read(spark, c1, "ta")) == {(1, "x")}
    assert _vals(catalog_read(spark, c2, "ta")) == {(1, "y")}


def test_racing_taggers_all_land(spark, tmp_path):
    """Concurrent tag creations on one table are guarded metadata
    commits: every racer's tag lands (CAS retry loop), none is lost to
    a torn refs rewrite."""
    import threading

    path = str(tmp_path / "race")
    versioned_write(_kv(spark, [(1, "a")]), path)
    errs = []

    def tagger(i):
        try:
            versioned_tag(path, f"tag-{i}", version=0)
        except Exception as e:  # noqa: BLE001 — collected for assert
            errs.append(e)

    ts = [threading.Thread(target=tagger, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert {f"tag-{i}" for i in range(6)} <= set(table_refs(path))


def test_racing_publishes_exactly_one_wins(spark, tmp_path):
    """Two branches publishing concurrently: the CAS lets exactly one
    fast-forward; the loser gets a loud CommitConflict and main holds
    the winner's state plus an intact refs map."""
    import threading

    path = str(tmp_path / "race2")
    versioned_write(_kv(spark, [(1, "a")]), path)
    b1 = versioned_branch(path, "w1")
    versioned_upsert(spark, b1, _kv(spark, [(2, "b")]), ["k"])
    b2 = versioned_branch(path, "w2")
    versioned_upsert(spark, b2, _kv(spark, [(3, "c")]), ["k"])
    results: dict[str, object] = {}

    def pub(name):
        try:
            results[name] = versioned_publish(path, name)
        except CommitConflict as e:
            results[name] = e

    ts = [threading.Thread(target=pub, args=(n,)) for n in ("w1", "w2")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wins = [n for n, r in results.items() if isinstance(r, int)]
    losses = [n for n, r in results.items() if isinstance(r, CommitConflict)]
    assert len(wins) == 1 and len(losses) == 1
    got = _vals(
        __import__("skopje_spark").versioned_read(spark, path)
    )
    expected = {(1, "a"), (2, "b")} if wins == ["w1"] else {(1, "a"), (3, "c")}
    assert got == expected
    # both refs still present and well-formed; the loser can re-fork
    assert {"w1", "w2"} <= set(table_refs(path))


def test_sibling_branch_creation_does_not_block_publish(spark, tmp_path):
    """Creating a second branch is a ref-only commit — it must not
    make the first branch unpublishable (content never moved)."""
    path = str(tmp_path / "sib")
    versioned_write(_kv(spark, [(1, "a")]), path)
    b1 = versioned_branch(path, "exp1")
    versioned_branch(path, "exp2")  # sibling after exp1
    versioned_upsert(spark, b1, _kv(spark, [(2, "b")]), ["k"])
    versioned_publish(path, "exp1")  # must not raise
    got = _vals(__import__("skopje_spark").versioned_read(spark, path))
    assert got == {(1, "a"), (2, "b")}
    # exp2's content DID diverge from main now — publish refuses
    with pytest.raises(CommitConflict, match="not a fast-forward"):
        versioned_publish(path, "exp2")


def test_catalog_drop_releases_pin_tag(spark, tmp_path):
    """Dropping (or moving) a table out of the catalog must release
    its vacuum pin — otherwise the pinned snapshot leaks forever."""
    from skopje_spark.sinks.catalog import _cat_tag

    a, cat = str(tmp_path / "a"), str(tmp_path / "cat")
    versioned_write(_kv(spark, [(1, "x")]), a)
    catalog_commit(cat, {"ta": (a, 0)})
    assert _cat_tag(cat, "ta") in table_refs(a)
    catalog_commit(cat, {"ta": "drop"})
    assert _cat_tag(cat, "ta") not in table_refs(a)
    # the formerly pinned snapshot is back under normal retention
    for i in range(3):
        versioned_write(_kv(spark, [(1, f"m{i}")]), a)
    assert 0 in vacuum(a, keep=1, min_file_age_s=0.0)


def test_failed_guarded_catalog_commit_leaves_pins_untouched(spark, tmp_path):
    """Pin tags move only AFTER the catalog CAS lands: a refused
    guarded commit must not retarget the tag away from the version the
    catalog still serves."""
    from skopje_spark.sinks.catalog import _cat_tag

    a, cat = str(tmp_path / "a"), str(tmp_path / "cat")
    versioned_write(_kv(spark, [(1, "x")]), a)            # v0
    v0 = catalog_commit(cat, {"ta": (a, 0)})
    versioned_write(_kv(spark, [(1, "y")]), a)
    with pytest.raises(CommitConflict):
        catalog_commit(cat, {"ta": None}, expected_version=v0 + 7)
    # the served pin is still protected
    assert table_refs(a)[_cat_tag(cat, "ta")]["version"] == 0
    for i in range(3):
        versioned_write(_kv(spark, [(1, f"m{i}")]), a)
    assert 0 not in vacuum(a, keep=1, min_file_age_s=0.0)
    assert _vals(catalog_read(spark, cat, "ta")) == {(1, "x")}


def test_concurrent_unguarded_catalog_commits_lose_nothing(spark, tmp_path):
    """Unguarded catalog commits re-derive the carried mapping inside
    the CAS retry loop, so concurrent commits touching different
    tables both land."""
    import threading

    a, b, cat = (str(tmp_path / x) for x in ("a", "b", "cat"))
    versioned_write(_kv(spark, [(1, "a")]), a)
    versioned_write(_kv(spark, [(1, "x")]), b)
    catalog_commit(cat, {"ta": (a, 0), "tb": (b, 0)})
    versioned_write(_kv(spark, [(1, "a2")]), a)   # ta -> v1 available
    versioned_write(_kv(spark, [(1, "x2")]), b)   # tb -> v1 available
    errs = []

    def repin(name):
        try:
            catalog_commit(cat, {name: 1})
        except Exception as e:  # noqa: BLE001 — collected for assert
            errs.append(e)

    ts = [threading.Thread(target=repin, args=(n,)) for n in ("ta", "tb")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    pins = {n: s["version"] for n, s in catalog_tables(cat).items()}
    assert pins == {"ta": 1, "tb": 1}  # neither re-pin was lost


def test_tag_and_catalog_refuse_vacuumed_versions(spark, tmp_path):
    a, cat = str(tmp_path / "a"), str(tmp_path / "cat")
    versioned_write(_kv(spark, [(1, "x")]), a)            # v0
    for i in range(3):
        versioned_write(_kv(spark, [(1, f"m{i}")]), a)
    vacuum(a, keep=1, min_file_age_s=0.0)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        versioned_tag(a, "dead", version=0)
    with pytest.raises(FileNotFoundError, match="servable"):
        catalog_commit(cat, {"ta": (a, 0)})


def test_two_entries_same_path_hold_independent_pins(spark, tmp_path):
    """Round-13 ADVICE: the vacuum-pin tag is per (entry name, path) —
    an alias serving one table at TWO versions must hold two tags, so
    retargeting one entry's pin never un-protects the other's."""
    from skopje_spark.sinks.catalog import _cat_tag

    a, cat = str(tmp_path / "a2"), str(tmp_path / "cat2")
    versioned_write(_kv(spark, [(1, "v0")]), a)           # v0
    versioned_write(_kv(spark, [(1, "v1")]), a)           # v1
    catalog_commit(cat, {"cur": (a, 1), "prev": (a, 0)})
    tags = table_refs(a)
    assert _cat_tag(cat, "cur") in tags
    assert _cat_tag(cat, "prev") in tags
    assert _cat_tag(cat, "cur") != _cat_tag(cat, "prev")
    # advance the table and re-pin ONLY "cur" — "prev"'s pin must hold
    for i in range(3):
        versioned_write(_kv(spark, [(1, f"m{i}")]), a)
    catalog_commit(cat, {"cur": None})
    removed = vacuum(a, keep=1, min_file_age_s=0.0)
    assert 0 not in removed  # "prev" still serves v0
    assert _vals(catalog_read(spark, cat, "prev")) == {(1, "v0")}
    # dropping "prev" releases exactly its own pin
    catalog_commit(cat, {"prev": "drop"})
    assert _cat_tag(cat, "prev") not in table_refs(a)
    assert _cat_tag(cat, "cur") in table_refs(a)
    assert 0 in vacuum(a, keep=1, min_file_age_s=0.0)


def test_failed_commit_critical_section_cleans_staged_dir(
    spark, tmp_path, monkeypatch
):
    """Round-13 ADVICE: a NON-conflict failure inside the commit
    critical section (pointer-store I/O) must not leak the staged
    directory."""
    import os

    import skopje_spark.sinks.versioned as V

    a, cat = str(tmp_path / "a3"), str(tmp_path / "cat3")
    versioned_write(_kv(spark, [(1, "x")]), a)
    catalog_commit(cat, {"ta": (a, None)})
    real = V.POINTER_STORE.swap_pointer

    def boom(path, n):
        if path == cat:
            raise RuntimeError("pointer store I/O failure")
        return real(path, n)

    monkeypatch.setattr(V.POINTER_STORE, "swap_pointer", boom)
    with pytest.raises(RuntimeError, match="pointer store"):
        catalog_commit(cat, {"ta": None})
    monkeypatch.undo()
    assert not [
        d for d in os.listdir(cat) if d.startswith(".staged-")
    ]
    # the catalog still serves its previous consistent snapshot
    assert _vals(catalog_read(spark, cat, "ta")) == {(1, "x")}
