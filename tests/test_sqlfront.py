"""SQL-string DML front end (sqlfront.py): MERGE/UPDATE/DELETE text
drives the native versioned operators with identical semantics and
economics; out-of-grammar statements refuse loudly."""

from __future__ import annotations

import os

import pytest

from skopje_spark.sinks.versioned import (
    latest_version,
    snapshot_meta,
    versioned_read,
    versioned_update,
    versioned_write,
)
from skopje_spark.sqlfront import versioned_sql


def _mk(spark, path, n=100, files=4):
    df = spark.createDataFrame(
        [(i, float(i), f"r{i}") for i in range(n)],
        "k long, x double, v string",
    )
    versioned_write(
        df.repartitionByRange(files, "k").sortWithinPartitions("k"), path
    )
    return df


def test_sql_merge_clauses_roundtrip(spark, tmp_path):
    """MERGE text with per-clause conditions, alias rewriting into
    the src_ pair domain, UPDATE SET expressions mixing both sides,
    DELETE, and INSERT * — end state identical to the native call."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    src = spark.createDataFrame(
        [(5, 500.0, "S5"), (7, 0.0, "S7"), (200, 1.0, "NEW"),
         (300, 2.0, "SKIP")],
        "k long, x double, v string",
    )
    src.createOrReplaceTempView("sqlfront_src")
    versioned_sql(
        spark,
        """
        MERGE INTO tgt AS t USING sqlfront_src AS s
        ON t.k = s.k
        WHEN MATCHED AND s.k = 5 THEN UPDATE SET x = s.x + t.x, v = s.v
        WHEN MATCHED AND s.k = 7 THEN DELETE
        WHEN NOT MATCHED AND s.k = 200 THEN INSERT *
        """,
        tables={"tgt": path},
    )
    got = {r["k"]: (r["x"], r["v"]) for r in versioned_read(spark, path).collect()}
    assert got[5] == (505.0, "S5")       # s.x + t.x over the pair
    assert 7 not in got and 300 not in got
    assert got[200] == (1.0, "NEW") and len(got) == 100
    # partial rewrite, not table rewrite
    assert int(snapshot_meta(path, "n_files_rewritten", version=1)) <= 2


def test_sql_update_pre_update_semantics(spark, tmp_path):
    """All SET expressions see the PRE-update row (SQL UPDATE
    semantics): swapping two columns through each other works; only
    containing files rewrite; WHERE-less UPDATE touches every row."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    versioned_sql(
        spark,
        "UPDATE t SET x = x * 2, v = concat(v, '-', cast(x as int)) "
        "WHERE k between 10 and 12",
        tables={"t": path},
    )
    got = {r["k"]: (r["x"], r["v"]) for r in versioned_read(spark, path).collect()}
    assert got[10] == (20.0, "r10-10")   # v used PRE-update x
    assert got[13] == (13.0, "r13")
    v = latest_version(path)
    assert int(snapshot_meta(path, "n_files_rewritten", version=v)) == 1
    assert int(snapshot_meta(path, "n_rows_updated", version=v)) == 3


def test_sql_delete_and_dict_update_pruning(spark, tmp_path):
    """DELETE text lands deletion vectors (zero rewrites); the native
    versioned_update dict-bounds path scans only the stats-matching
    files."""
    path = str(tmp_path / "t")
    _mk(spark, path, files=4)
    versioned_sql(spark, f"DELETE FROM '{path}' WHERE k % 10 = 9")
    v = latest_version(path)
    assert int(snapshot_meta(path, "n_files_rewritten", version=v)) == 0
    assert versioned_read(spark, path).count() == 90
    # dict-bounds update: one range file scanned of four
    v2 = versioned_update(spark, path, {"x": "x + 0.5"}, {"k": (0, 10)})
    assert int(snapshot_meta(path, "n_files_scanned", version=v2)) == 1
    got = {r["k"]: r["x"] for r in versioned_read(spark, path).collect()}
    assert got[3] == 3.5 and got[50] == 50.0


def test_sql_front_end_refusals(spark, tmp_path):
    """Out-of-grammar statements refuse loudly with the fragment."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=10, files=1)
    spark.createDataFrame([(1, 1.0, "a")], "k long, x double, v string") \
        .createOrReplaceTempView("sqlfront_ref")
    with pytest.raises(ValueError, match="versioned_sql supports"):
        versioned_sql(spark, f"TRUNCATE TABLE '{path}'")
    with pytest.raises(ValueError, match="equality conjuncts"):
        versioned_sql(
            spark,
            f"MERGE INTO '{path}' AS t USING sqlfront_ref AS s "
            "ON t.k > s.k WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="differently"):
        versioned_sql(
            spark,
            f"MERGE INTO '{path}' AS t USING sqlfront_ref AS s "
            "ON t.k = s.x WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="INSERT \\*"):
        versioned_sql(
            spark,
            f"MERGE INTO '{path}' AS t USING sqlfront_ref AS s "
            "ON t.k = s.k WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)",
        )
    with pytest.raises(KeyError, match="UPDATE SET targets"):
        versioned_sql(spark, f"UPDATE '{path}' SET nope = 1 WHERE k = 1")


def test_sql_insert_values_and_select(spark, tmp_path):
    """INSERT INTO completes the DML quartet: VALUES tuples align
    positionally with casts, SELECT bodies align by name, arity
    mismatches refuse, and the commit is the store's blind append
    (zero rewrites)."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=10, files=1)
    versioned_sql(
        spark,
        f"INSERT INTO '{path}' VALUES (100, 1.5, 'ins1'), (101, 2.5, 'ins2')",
    )
    v = latest_version(path)
    assert snapshot_meta(path, "op", version=v) == "append"
    got = {r["k"]: (r["x"], r["v"]) for r in versioned_read(spark, path).collect()}
    assert got[100] == (1.5, "ins1") and got[101] == (2.5, "ins2")
    assert len(got) == 12
    # SELECT body, aligned by name
    spark.createDataFrame(
        [(200, 9.0, "sel")], "k long, x double, v string"
    ).createOrReplaceTempView("sqlfront_ins")
    versioned_sql(
        spark,
        f"INSERT INTO '{path}' SELECT v, k, x FROM sqlfront_ins".replace(
            "v, k, x", "v, k, x"
        ),
    )
    got2 = {r["k"]: r["v"] for r in versioned_read(spark, path).collect()}
    assert got2[200] == "sel" and len(got2) == 13
    with pytest.raises(ValueError, match="arity"):
        versioned_sql(spark, f"INSERT INTO '{path}' VALUES (1, 2)")
    with pytest.raises(FileNotFoundError, match="does not exist"):
        versioned_sql(
            spark, f"INSERT INTO '{tmp_path}/missing' VALUES (1, 1.0, 'a')"
        )


# ------------------------------------------------------- CTAS + ref DDL

def test_ctas_creates_partitioned_table(spark, tmp_path):
    from skopje_spark.sinks.versioned import (
        table_partitioning,
        versioned_read,
    )

    path = str(tmp_path / "ctas")
    spark.createDataFrame(
        [(1, "de", "x"), (2, "en", "y"), (3, "de", "z")],
        ["k", "lang", "body"],
    ).createOrReplaceTempView("ctas_src")
    v = versioned_sql(
        spark,
        f"CREATE TABLE '{path}' PARTITIONED BY (lang) AS "
        "SELECT * FROM ctas_src",
    )
    assert v == 0
    assert table_partitioning(path) == ["lang"]
    got = {(r["k"], r["lang"]) for r in versioned_read(spark, path).collect()}
    assert got == {(1, "de"), (2, "en"), (3, "de")}
    # CTAS never replaces
    with pytest.raises(FileExistsError, match="never replaces"):
        versioned_sql(
            spark, f"CREATE TABLE '{path}' AS SELECT * FROM ctas_src"
        )
    with pytest.raises(ValueError, match="AS SELECT"):
        versioned_sql(
            spark, f"CREATE TABLE '{tmp_path}/x' AS DELETE FROM y"
        )


def test_alter_table_ref_ddl_roundtrip(spark, tmp_path):
    from skopje_spark.sinks.versioned import (
        branch_path,
        table_refs,
        versioned_read,
        versioned_write,
    )

    path = str(tmp_path / "refddl")
    spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]).createOrReplaceTempView(
        "refddl_src"
    )
    versioned_sql(spark, f"CREATE TABLE '{path}' AS SELECT * FROM refddl_src")
    versioned_sql(spark, f"ALTER TABLE '{path}' CREATE TAG rel AS OF VERSION 0")
    versioned_sql(spark, f"ALTER TABLE '{path}' CREATE BRANCH dev")
    refs = table_refs(path)
    assert refs["rel"]["type"] == "tag" and refs["dev"]["type"] == "branch"
    # stage through SQL against the branch path, then publish via DDL
    versioned_sql(
        spark,
        f"INSERT INTO '{branch_path(path, 'dev')}' VALUES (3, 'c')",
    )
    versioned_sql(spark, f"ALTER TABLE '{path}' PUBLISH BRANCH dev AND DROP")
    got = {(r["k"], r["v"]) for r in versioned_read(spark, path).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    assert "dev" not in table_refs(path)
    # kind-checked drops
    with pytest.raises(ValueError, match="ref is a tag"):
        versioned_sql(spark, f"ALTER TABLE '{path}' DROP BRANCH rel")
    versioned_sql(spark, f"ALTER TABLE '{path}' DROP TAG rel")
    assert table_refs(path) == {}
    with pytest.raises(ValueError, match="unsupported ALTER TABLE"):
        versioned_sql(spark, f"ALTER TABLE '{path}' FROBNICATE x")


def test_maintenance_sql_optimize_vacuum_analyze(spark, tmp_path):
    """OPTIMIZE / VACUUM / ANALYZE TABLE as SQL text route to the
    native maintenance operators: compaction (plain, ZORDER, scoped),
    version-retention vacuum with DRY RUN, and the column_stats
    metadata commit."""
    import json as _json

    from skopje_spark.sinks.versioned import (
        _read_manifest,
        _versions,
        versioned_append,
    )

    path = str(tmp_path / "maint")
    _mk(spark, path, n=200, files=8)
    for lo in (200, 300):
        versioned_append(
            spark, path,
            spark.createDataFrame(
                [(i, float(i), f"r{i}") for i in range(lo, lo + 50)],
                "k long, x double, v string",
            ),
        )
    # plain OPTIMIZE: fewer files, content identical
    before = versioned_read(spark, path).count()
    v = versioned_sql(spark, f"OPTIMIZE '{path}'", target_files=2)
    assert snapshot_meta(path, "op", version=v) == "compact"
    assert len(_read_manifest(path, v)["files"]) == 2
    assert versioned_read(spark, path).count() == before
    # OPTIMIZE ... ZORDER BY: re-clustered, still content identical
    v2 = versioned_sql(
        spark, f"OPTIMIZE '{path}' ZORDER BY (k, x)", target_files=2
    )
    assert versioned_read(spark, path).count() == before
    # ANALYZE TABLE: column_stats property commit
    v3 = versioned_sql(
        spark,
        f"ANALYZE TABLE '{path}' COMPUTE STATISTICS FOR COLUMNS k, v",
    )
    stats = _json.loads(snapshot_meta(path, "column_stats", version=v3))
    assert set(stats["columns"]) == {"k", "v"}
    # VACUUM DRY RUN reports, removes nothing; real VACUUM removes
    dry = versioned_sql(spark, f"VACUUM '{path}' RETAIN 2 VERSIONS DRY RUN")
    assert dry and all(v in _versions(path) for v in dry)
    gone = versioned_sql(spark, f"VACUUM '{path}' RETAIN 2 VERSIONS")
    assert gone == dry and all(v not in _versions(path) for v in gone)
    assert versioned_read(spark, path).count() == before
    with pytest.raises(ValueError, match="equality conjuncts"):
        versioned_sql(spark, f"OPTIMIZE '{path}' WHERE k > 3")


def test_select_is_side_effect_free(spark, tmp_path):
    """A mapped SELECT must not clobber a same-named pre-existing temp
    view, and must leave no attachments behind."""
    path = str(tmp_path / "sel")
    _mk(spark, path, n=10, files=1)
    # a user temp view that happens to share the mapped name
    spark.createDataFrame([(999,)], "k long").createOrReplaceTempView(
        "sel_t"
    )
    df = versioned_sql(
        spark, "SELECT k FROM sel_t WHERE k < 3", tables={"sel_t": path}
    )
    assert sorted(r["k"] for r in df.collect()) == [0, 1, 2]
    # the result stays valid after the statement (plan already bound)
    assert df.count() == 3
    # the pre-existing view is back, not the attachment
    assert [r["k"] for r in spark.table("sel_t").collect()] == [999]
    spark.catalog.dropTempView("sel_t")
    # with no collision, the attachment is dropped afterwards
    versioned_sql(
        spark, "SELECT k FROM sel_t VERSION AS OF 0", tables={"sel_t": path}
    )
    tmp = {
        t.name for t in spark.catalog.listTables() if t.isTemporary
    }
    assert "sel_t" not in tmp and "sel_t__v0" not in tmp


def test_add_and_drop_constraint_sql(spark, tmp_path):
    """ALTER TABLE .. ADD CONSTRAINT n CHECK (expr) / DROP CONSTRAINT n
    as SQL text, including the NOVALIDATE form for backfills."""
    from skopje_spark.sinks.versioned import (
        ConstraintViolation,
        table_constraints,
        versioned_append,
        versioned_write,
    )

    path = str(tmp_path / "cons_t")
    versioned_write(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, v double"),
        path,
    )
    versioned_sql(spark, f"ALTER TABLE '{path}' ADD CONSTRAINT v_pos CHECK (v > 0)")
    assert "v_pos" in table_constraints(path)
    bad = spark.createDataFrame([(3, -1.0)], "k bigint, v double")
    with pytest.raises(ConstraintViolation):
        versioned_append(spark, path, bad)
    # a constraint the current data violates refuses without NOVALIDATE
    with pytest.raises(ConstraintViolation):
        versioned_sql(
            spark, f"ALTER TABLE '{path}' ADD CONSTRAINT v_big CHECK (v > 15)"
        )
    versioned_sql(
        spark,
        f"ALTER TABLE '{path}' ADD CONSTRAINT v_big CHECK (v > 15) NOVALIDATE",
    )
    assert "v_big" in table_constraints(path)
    versioned_sql(spark, f"ALTER TABLE '{path}' DROP CONSTRAINT v_big")
    versioned_sql(spark, f"ALTER TABLE '{path}' DROP CONSTRAINT v_pos")
    assert table_constraints(path) == {}
    versioned_append(spark, path, bad)  # constraints gone: append admits
