"""Regression units for the retired-physicals ledger across RESTORE /
CLONE, zone-pinned hidden day partitioning, hidden-spec compaction
sizing, and cross-type composite-key MERGE pruning (round-11 ADVICE
findings — each test fails on the pre-fix code)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from skopje_spark.sinks.versioned import (
    _read_manifest,
    latest_version,
    snapshot_meta,
    versioned_clone,
    versioned_compact,
    versioned_drop_column,
    versioned_partitions,
    versioned_read,
    versioned_read_where,
    versioned_restore,
    versioned_upsert,
    versioned_write,
)


def _table(spark, path, n=6):
    df = spark.createDataFrame(
        [(i, f"v{i}", f"note-{i}") for i in range(n)],
        "id long, val string, note string",
    )
    versioned_write(df, path)
    return df


def test_restore_across_drop_then_upsert_keeps_column(spark, tmp_path):
    """drop(note) → restore(v0) → upsert must NOT remap the restored
    column to a fresh physical name: the pre-drop ledger entry is
    LIVE again in the restored schema, and remapping it silently
    NULLs the column for every carried file (whole-column data loss
    via three public API calls)."""
    path = str(tmp_path / "t")
    _table(spark, path)
    versioned_drop_column(path, "note")
    versioned_restore(path, 0, spark=spark)
    # the restore's ledger follows the restored CONTENT (note is live)
    assert json.loads(
        snapshot_meta(path, "retired_physicals",
                      version=latest_version(path)) or "[]"
    ) == []
    upd = spark.createDataFrame(
        [(0, "V0", "note-NEW")], "id long, val string, note string"
    )
    versioned_upsert(spark, path, upd, keys=["id"])
    got = {r["id"]: r["note"] for r in versioned_read(spark, path).collect()}
    assert got[0] == "note-NEW"
    # carried (non-rewritten) rows keep their pre-drop note values —
    # the pre-fix code read NULL here (live physical remapped)
    assert got[3] == "note-3" and got[5] == "note-5"
    # and the schema still maps note to its identity physical
    man = _read_manifest(path, latest_version(path))
    note = next(f for f in man["schema"]["fields"] if f["name"] == "note")
    assert (note.get("metadata") or {}).get("physical", "note") == "note"


def test_restore_to_post_drop_version_keeps_ledger(spark, tmp_path):
    """Restoring to a POST-drop version carries that version's ledger,
    so a later re-add still gets a fresh physical (no resurrection)."""
    path = str(tmp_path / "t")
    _table(spark, path)
    versioned_drop_column(path, "note")           # v1: retired=[note]
    v_post = latest_version(path)
    upd = spark.createDataFrame([(0, "V0")], "id long, val string")
    versioned_upsert(spark, path, upd, keys=["id"])  # v2
    versioned_restore(path, v_post, spark=spark)     # v3
    assert json.loads(
        snapshot_meta(path, "retired_physicals",
                      version=latest_version(path))
    ) == ["note"]
    re_add = spark.createDataFrame(
        [(1, "V1", "fresh")], "id long, val string, note string"
    )
    versioned_upsert(spark, path, re_add, keys=["id"], evolve_schema=True)
    got = {r["id"]: r["note"] for r in versioned_read(spark, path).collect()}
    assert got[1] == "fresh"
    # carried pre-drop files must read NULL, never the old bytes
    assert got[3] is None and got[5] is None


def test_clone_carries_retired_ledger(spark, tmp_path):
    """A shallow clone hard-links pre-drop pool files; without the
    ledger, re-adding the dropped column at the clone resurrects the
    dropped bytes."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _table(spark, src)
    versioned_drop_column(src, "note")
    versioned_clone(src, dst)
    assert json.loads(
        snapshot_meta(dst, "retired_physicals", version=0)
    ) == ["note"]
    re_add = spark.createDataFrame(
        [(0, "V0", "fresh")], "id long, val string, note string"
    )
    versioned_upsert(spark, dst, re_add, keys=["id"], evolve_schema=True)
    got = {r["id"]: r["note"] for r in versioned_read(spark, dst).collect()}
    assert got[0] == "fresh"
    assert got[3] is None and got[4] is None  # no resurrection


def test_hidden_day_partition_is_session_zone_independent(spark, tmp_path):
    """day=date(ts) stamps the UTC EPOCH day: a writer session in one
    zone and a reader in another must agree on day labels and prune
    exactly — to_date(ts) follows spark.sql.session.timeZone and
    mislabels (pre-fix: LA writer labels 2024-05-02T00:30 naive-UTC
    rows as 2024-05-01)."""
    path = str(tmp_path / "t")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        # naive datetimes convert through the SYSTEM zone (UTC in this
        # container): wall time == UTC time == the day that must stick
        rows = [
            (i, dt.datetime(2024, 5, 1 + (i % 3), 0, 30), f"p{i}")
            for i in range(12)
        ]
        df = spark.createDataFrame(rows, "id long, ts timestamp, v string")
        versioned_write(df, path, partition_by=["day=date(ts)"])
        days = [p["day"] for p in versioned_partitions(path)]
        assert days == ["2024-05-01", "2024-05-02", "2024-05-03"]
        # reader in a THIRD zone: target bound elects exactly one day
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        got = versioned_read_where(spark, path, {"day": dt.date(2024, 5, 2)})
        assert sorted(r["id"] for r in got.collect()) == [
            i for i in range(12) if i % 3 == 1
        ]
        # raw-ts bound: derived prune-only day interval stays exact
        got2 = versioned_read_where(
            spark, path,
            {"ts": (dt.datetime(2024, 5, 2, 0, 0),
                    dt.datetime(2024, 5, 2, 23, 59))},
        )
        assert sorted(r["id"] for r in got2.collect()) == [
            i for i in range(12) if i % 3 == 1
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_unscoped_compact_respects_hidden_partition_count(spark, tmp_path):
    """versioned_compact on a day=date(ts) table counts partitions by
    the transform TARGET: target_files spreads across the real day
    count instead of over-splitting every day (pre-fix: raw spec
    strings key the partition dicts to None → n_parts=1 →
    fpp=target_files → n_days × target_files output files)."""
    rows = [
        (i, dt.datetime(2024, 5, 1 + (i % 5), 6, i % 60), f"p{i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v string")
    path = str(tmp_path / "t")
    versioned_write(df, path, partition_by=["day=date(ts)"])
    v = versioned_compact(spark, path, target_files=5)
    files = _read_manifest(path, v)["files"]
    assert len(files) == 5  # one per day, not 25
    assert versioned_read(spark, path).count() == 60


def test_composite_key_merge_with_castable_key_type(spark, tmp_path):
    """An INT update key against a STRING table key column must stay a
    conservative candidate, not crash the upsert: bounds are computed
    from the type-ALIGNED frame (pre-fix: raw int bounds cross-type
    compare against string stats inside _interval_split →
    TypeError)."""
    df = spark.createDataFrame(
        [(i, str(i % 3), f"v{i}") for i in range(9)],
        "id long, code string, v string",
    )
    path = str(tmp_path / "t")
    versioned_write(df, path)
    upd = spark.createDataFrame(
        [(4, 1, "UPDATED")], "id long, code int, v string"
    )
    versioned_upsert(spark, path, upd, keys=["id", "code"])
    got = {
        (r["id"], r["code"]): r["v"]
        for r in versioned_read(spark, path).collect()
    }
    assert got[(4, "1")] == "UPDATED"
    assert got[(5, "2")] == "v5"
    assert len(got) == 9


def test_join_advice_auto_routes_stats_then_sample(spark, tmp_path):
    """Fresh ANALYZE stats answer the join-planning card with ZERO
    Spark jobs (proven by passing spark=None) and agree with the
    sampled card's recommendation; a post-stats commit makes them
    stale and the same call falls back to sampling."""
    from skopje_spark.operators.estimate import join_advice_auto
    from skopje_spark.sinks.versioned import (
        versioned_analyze,
        versioned_append,
        versioned_write,
    )

    dim = str(tmp_path / "dim")
    fact = str(tmp_path / "fact")
    versioned_write(
        spark.createDataFrame(
            [(i, f"d{i}") for i in range(50)], "k long, name string"
        ),
        dim,
    )
    versioned_write(
        spark.createDataFrame(
            [(i % 50, f"f{i}") for i in range(5000)], "k long, v string"
        ),
        fact,
    )
    versioned_analyze(spark, dim, ["k"])
    versioned_analyze(spark, fact, ["k"])
    # spark=None: the stats path must launch no job and never touch it
    card = join_advice_auto(None, dim, "k", fact, "k")
    assert card["source"] == "stats"
    assert card["recommendation"] == "broadcast_a"
    # the sampled card agrees on the fixture
    sampled = join_advice_auto(
        spark, dim, "k", fact, "k", max_stale=-1, rate=0.5
    )
    assert sampled["source"] == "sample"
    assert sampled["recommendation"] == card["recommendation"]
    # a commit after ANALYZE staleness-gates the stats tier
    versioned_append(
        spark, fact,
        spark.createDataFrame([(1, "x")], "k long, v string"),
    )
    fallback = join_advice_auto(spark, dim, "k", fact, "k", rate=0.5)
    assert fallback["source"] == "sample"


def _lang_table(spark, path, n=200):
    """loosely language-clustered docs: ~2 langs per file, so footer
    min/max intervals cannot isolate one language."""
    from skopje_spark.sinks.versioned import versioned_write

    langs = ["de", "en", "es", "fr", "zh"]
    df = spark.createDataFrame(
        [(i, langs[i % 5], f"t{i}") for i in range(n)],
        "id long, lang string, txt string",
    )
    versioned_write(
        df.repartitionByRange(3, "lang", "id")
        .sortWithinPartitions("lang", "id"),
        path,
    )
    return df


def test_value_index_prunes_point_and_in_reads(spark, tmp_path):
    """versioned_value_index records per-file exact value sets; point
    and IN bounds prune by membership where intervals span neighbors;
    content stays exact; the connector prunes pushed equality the
    same way; the commit is zero-change for the feed."""
    from pyspark.sql.datasource import EqualTo
    from skopje_spark.sinks.versioned import (
        versioned_change_feed,
        versioned_read_where,
        versioned_value_index,
    )
    from skopje_spark.sources.lakesource import VersionedTableReader

    path = str(tmp_path / "t")
    _lang_table(spark, path)
    v = versioned_value_index(spark, path, ["lang"])
    ent = _read_manifest(path, v)["files"]
    assert all("vals" in e["stats"]["lang"] for e in ent)
    containing = {
        e["path"] for e in ent if "de" in e["stats"]["lang"]["vals"]
    }
    assert 0 < len(containing) < len(ent)
    m: dict = {}
    got = versioned_read_where(spark, path, {"lang": "de"}, metrics=m)
    assert sorted(r["id"] for r in got.collect()) == list(range(0, 200, 5))
    # connector: pushed equality elects the same files
    rd = VersionedTableReader({"path": path})
    list(rd.pushFilters([EqualTo(("lang",), "de")]))
    assert {p.rel_path for p in rd.partitions()} == containing
    # IN bound prunes by set intersection
    got2 = versioned_read_where(spark, path, {"lang": ["zh"]})
    assert sorted(r["id"] for r in got2.collect()) == list(range(4, 200, 5))
    # zero-change op: the feed crosses it without a keys fallback
    feed = versioned_change_feed(spark, path, from_version=v)
    assert feed.count() == 0


def test_value_index_coverage_drop_and_cap(spark, tmp_path):
    """A multi-valued file whose WHOLE value set sits inside an
    IN-list bound (exact zero nulls) is droppable metadata-only —
    interval stats alone could not prove that; high-cardinality
    columns are simply not indexed (cap), staying conservative."""
    from skopje_spark.sinks.versioned import (
        versioned_delete,
        versioned_read,
        versioned_value_index,
    )

    path = str(tmp_path / "t")
    _lang_table(spark, path)
    versioned_value_index(spark, path, ["lang"], max_distinct=4)
    ent = _read_manifest(path, latest_version(path))["files"]
    # files span ≥2 langs each (the loose clustering) — find one
    # file's full set and delete exactly those languages
    multi = [e for e in ent if len(e["stats"]["lang"]["vals"]) >= 2]
    assert multi
    target = multi[0]["stats"]["lang"]["vals"]
    v = versioned_delete(spark, path, {"lang": list(target)})
    assert int(snapshot_meta(path, "n_files_dropped", version=v)) >= 1
    left = {r["lang"] for r in versioned_read(spark, path).collect()}
    assert not (left & set(target))
    # cap: id has 200 distinct values per... > max_distinct → no vals
    path2 = str(tmp_path / "t2")
    _lang_table(spark, path2)
    versioned_value_index(spark, path2, ["id"], max_distinct=4)
    ent2 = _read_manifest(path2, latest_version(path2))["files"]
    assert all("vals" not in (e["stats"].get("id") or {}) for e in ent2)


def test_value_index_maintained_by_later_writes(spark, tmp_path):
    """The value_index table property makes the index SELF-MAINTAINING:
    appends, upserts, and connector writes after the index commit
    stamp their own staged files with value sets, so membership
    pruning never degrades on fresh ingests."""
    from skopje_spark.sinks.versioned import (
        versioned_append,
        versioned_read_where,
        versioned_upsert,
        versioned_value_index,
    )
    from skopje_spark.sources.pysource import register_all

    register_all(spark)
    path = str(tmp_path / "t")
    _lang_table(spark, path)
    versioned_value_index(spark, path, ["lang"])
    # native append: new file gets its set stamped at stage time
    batch = spark.createDataFrame(
        [(1000, "it", "x"), (1001, "it", "y")],
        "id long, lang string, txt string",
    )
    v1 = versioned_append(spark, path, batch)
    ent = _read_manifest(path, v1)["files"]
    fresh = [e for e in ent if 1000 in range(1000, 1002) and
             (e["stats"].get("lang") or {}).get("vals") == ["it"]]
    assert fresh, "appended file must carry its value set"
    # ...and the point read elects it exactly
    got = versioned_read_where(spark, path, {"lang": "it"})
    assert sorted(r["id"] for r in got.collect()) == [1000, 1001]
    # upsert rewrite: rewritten files re-stamped
    upd = spark.createDataFrame(
        [(0, "de", "NEW")], "id long, lang string, txt string"
    )
    v2 = versioned_upsert(spark, path, upd, ["id"])
    ent2 = _read_manifest(path, v2)["files"]
    assert all(
        "vals" in (e["stats"].get("lang") or {})
        for e in ent2 if e.get("rows")
    ), "every non-empty file (carried + rewritten) keeps a value set"
    # connector append: stamped through the writer commit too
    (spark.createDataFrame([(2000, "pt", "z")],
                           "id long, lang string, txt string")
     .write.format("skopje_versioned").option("path", path)
     .mode("append").save())
    ent3 = _read_manifest(path, latest_version(path))["files"]
    pt = [e for e in ent3
          if (e["stats"].get("lang") or {}).get("vals") == ["pt"]]
    assert pt
    got2 = versioned_read_where(spark, path, {"lang": "pt"})
    assert [r["id"] for r in got2.collect()] == [2000]


def test_value_index_survives_column_rename(spark, tmp_path):
    """The value_index property carries PHYSICAL names, so renaming
    the indexed column never detaches maintenance: post-rename
    appends still stamp their files, and reads bound by the NEW
    logical name prune by membership."""
    from skopje_spark.sinks.versioned import (
        versioned_append,
        versioned_read_where,
        versioned_rename_column,
        versioned_value_index,
    )

    path = str(tmp_path / "t")
    _lang_table(spark, path)
    versioned_value_index(spark, path, ["lang"])
    versioned_rename_column(path, "lang", "language")
    batch = spark.createDataFrame(
        [(1000, "it", "x")], "id long, language string, txt string"
    )
    v = versioned_append(spark, path, batch)
    ent = _read_manifest(path, v)["files"]
    it_files = [
        e for e in ent
        if (e["stats"].get("lang") or {}).get("vals") == ["it"]
    ]
    assert it_files, "post-rename append still stamped (physical name)"
    got = versioned_read_where(spark, path, {"language": "it"})
    assert [r["id"] for r in got.collect()] == [1000]


def test_segment_tier_value_union_closes_scattered_categorical(
    spark, tmp_path, monkeypatch
):
    """Segment refs fold a value-set UNION (from recorded vals or
    singleton min==max stats): a point bound on a SCATTERED
    categorical — whose interval folds span everything — still closes
    whole segments by membership, natively and in the connector."""
    import skopje_spark.sinks.versioned as V
    from pyspark.sql.datasource import EqualTo
    from skopje_spark.sinks.versioned import (
        versioned_read_where,
        versioned_write,
    )
    from skopje_spark.sources.lakesource import VersionedTableReader

    monkeypatch.setattr(V, "_SEG_TARGET", 4)
    path = str(tmp_path / "t")
    # 80 files clustered by k; lang cycles L0..L7 per 10-row block, so
    # every segment's [min, max] fold spans most of the alphabet while
    # its 4-ish distinct langs stay far under the union cap
    df = spark.createDataFrame(
        [(i, f"L{(i // 10) % 8}", f"r{i}") for i in range(800)],
        "k long, lang string, v string",
    )
    versioned_write(
        df.repartitionByRange(80, "k").sortWithinPartitions("k"), path
    )
    m: dict = {}
    got = versioned_read_where(spark, path, {"lang": "L5"}, metrics=m)
    assert sorted(r["k"] for r in got.collect()) == [
        i for i in range(800) if (i // 10) % 8 == 5
    ]
    assert m["segments_total"] >= 6
    assert m["segments_opened"] < m["segments_total"]
    # connector pushed equality closes the same segments
    rd = VersionedTableReader({"path": path})
    list(rd.pushFilters([EqualTo(("lang",), "L5")]))
    parts = rd.partitions()
    assert rd.segments_opened < rd.segments_total
    assert len(parts) == 10  # exactly the L5 files (single-valued)
