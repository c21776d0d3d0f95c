"""LIVE JDBC integration over embedded Derby (bundled with Spark).

Every spec previously tested only at the option-dict level now
executes against a real SQL database in the Spark JVM: writes,
reads, DB-side pushdown, partitioned scans, the staging-table swap
transaction (with rollback under crash injection), and the KeyMap
fetch/insert cycle (reference ``src/keymap.rs:52-75,171-183``,
``src/load/pg.rs:50-117``).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from skopje_spark.sinks.jdbc import (
    jdbc_sink,
    jdbc_sink_atomic,
    staging_swap_statements,
)
from skopje_spark.sources.derby import (
    derby_atomic_swap,
    derby_config,
    derby_execute,
    derby_query_rows,
    derby_shutdown,
    derby_table_exists,
)
from skopje_spark.sources.jdbc import jdbc_query, jdbc_table


@pytest.fixture()
def db(spark):
    path = tempfile.mkdtemp(prefix="skopje_derby_") + "/db"
    yield derby_config(path)
    derby_shutdown(spark, path)


def _seed(spark, n=100):
    return spark.range(n).select(
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") * 2).cast("double").alias("v"),
        F.concat(F.lit("name_"), F.format_string("%03d", F.col("id"))).alias("name"),
    )


def test_roundtrip_schema_and_values(spark, db):
    df = _seed(spark)
    jdbc_sink(df, db, "t_round", mode="overwrite",
              column_types="name VARCHAR(32)")
    back = jdbc_table(spark, db, "t_round")
    assert back.schema.simpleString() == "struct<id:bigint,v:double,name:string>"
    assert back.count() == 100
    rows = {r.id: (r.v, r.name) for r in back.collect()}
    assert rows[7] == (14.0, "name_007")


def test_filter_pushdown_reaches_database(spark, db):
    jdbc_sink(_seed(spark), db, "t_push", mode="overwrite",
              column_types="name VARCHAR(32)")
    scan = jdbc_table(spark, db, "t_push").filter(F.col("id") > 90)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(ID,90)" in plan.replace(
        "GreaterThan(id,90)", "GreaterThan(ID,90)")
    assert scan.count() == 9


def test_partitioned_read_is_range_disjoint(spark, db):
    jdbc_sink(_seed(spark, 1000), db, "t_part", mode="overwrite",
              column_types="name VARCHAR(32)")
    scan = jdbc_table(
        spark, db, "t_part", partition_column="id",
        lower_bound=0, upper_bound=1000, num_partitions=4,
    )
    assert scan.rdd.getNumPartitions() == 4
    sizes = scan.rdd.glom().map(len).collect()
    assert sum(sizes) == 1000 and all(s > 0 for s in sizes)
    assert scan.agg(F.sum("id")).first()[0] == 499_500


def test_db_side_query_pushdown(spark, db):
    jdbc_sink(_seed(spark), db, "t_q", mode="overwrite",
              column_types="name VARCHAR(32)")
    # Spark's JDBC writer creates quoted (case-sensitive lowercase)
    # column names, so raw DB-side SQL must quote them too
    agg = jdbc_query(
        spark, db,
        'SELECT COUNT(*) AS n, SUM("v") AS sv FROM t_q WHERE "id" < 50',
    )
    row = agg.first()
    assert (int(row.N if hasattr(row, "N") else row.n),
            float(row.SV if hasattr(row, "SV") else row.sv)) == (50, 2450.0)


def test_fetch_if_exists_live(spark, db):
    # reference fetch_if_exists: arbitrary SQL, one row or none
    jdbc_sink(_seed(spark), db, "t_one", mode="overwrite",
              column_types="name VARCHAR(32)")
    hit = jdbc_query(
        spark, db, 'SELECT "v" FROM t_one WHERE "id" = 42').first()
    assert hit is not None and float(hit[0]) == 84.0
    miss = jdbc_query(
        spark, db, 'SELECT "v" FROM t_one WHERE "id" = -1').first()
    assert miss is None


def test_sink_dedup_contract(spark, db):
    # L2 copy contract: pre-dedup before load (ref src/load/pg.rs:19-20)
    df = _seed(spark, 10).unionAll(_seed(spark, 10))
    jdbc_sink(df, db, "t_dedup", mode="overwrite", dedup_keys=["id"],
              column_types="name VARCHAR(32)")
    assert jdbc_table(spark, db, "t_dedup").count() == 10


def test_atomic_swap_promotes_staged_load(spark, db):
    jdbc_sink(_seed(spark, 10), db, "t_swap", mode="overwrite",
              column_types="name VARCHAR(32)")
    ran = jdbc_sink_atomic(_seed(spark, 25), db, "t_swap",
                           column_types="name VARCHAR(32)")
    assert any("RENAME TABLE" in s for s in ran)
    assert jdbc_table(spark, db, "t_swap").count() == 25
    # neither the stage nor the old table survives a clean swap
    assert not derby_table_exists(spark, db.url, "t_swap__stage")
    assert not derby_table_exists(spark, db.url, "t_swap__old")


def test_atomic_swap_first_load_no_prior_table(spark, db):
    jdbc_sink_atomic(_seed(spark, 5), db, "t_fresh",
                     column_types="name VARCHAR(32)")
    assert jdbc_table(spark, db, "t_fresh").count() == 5


def test_swap_transaction_rolls_back_whole(spark, db):
    """Crash injection: a failing statement inside the swap must leave
    the ORIGINAL table fully intact (Derby DDL is transactional)."""
    jdbc_sink(_seed(spark, 10), db, "t_tx", mode="overwrite",
              column_types="name VARCHAR(32)")
    jdbc_sink(_seed(spark, 99), db, "t_tx__stage", mode="overwrite",
              column_types="name VARCHAR(32)")
    stmts = [
        "RENAME TABLE t_tx TO t_tx__old",
        "RENAME TABLE t_tx__stage TO t_tx",
        "DROP TABLE no_such_table_boom",  # injected failure
    ]
    with pytest.raises(Exception):
        derby_execute(spark, db.url, stmts, transactional=True)
    # rollback undid BOTH renames: the live table still serves old data
    assert derby_table_exists(spark, db.url, "t_tx")
    assert jdbc_table(spark, db, "t_tx").count() == 10
    assert derby_table_exists(spark, db.url, "t_tx__stage")
    # and the recovery path (a clean re-swap) then succeeds
    derby_atomic_swap(spark, db.url, "t_tx")
    assert jdbc_table(spark, db, "t_tx").count() == 99


def test_staging_statements_derby_dialect():
    stage, swap = staging_swap_statements("t", dialect="derby",
                                          table_exists=True)
    assert stage == "t__stage"
    assert swap == [
        "RENAME TABLE t TO t__old",
        "RENAME TABLE t__stage TO t",
        "DROP TABLE t__old",
    ]
    _, fresh = staging_swap_statements("t", dialect="derby",
                                       table_exists=False)
    assert fresh == ["RENAME TABLE t__stage TO t"]


def test_keymap_fetch_insert_cycle_live(spark, db):
    """pg_fetch → gap-fill assign → pg_insert of the delta, against a
    real database (reference src/keymap.rs:171-183 `transact`)."""
    from skopje_spark.operators.keymap import keymap_assign

    dim0 = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (3, "delta")], "key bigint, value string"
    )
    jdbc_sink(dim0, db, "keymap", mode="overwrite",
              column_types="value VARCHAR(64)")

    incoming = spark.createDataFrame(
        [("alpha",), ("gamma",), ("epsilon",)], "value string"
    )
    dim = jdbc_table(spark, db, "keymap")           # pg_fetch
    full = keymap_assign(dim, incoming, policy="gapfill")
    delta = full.join(dim.select("key"), "key", "left_anti")
    jdbc_sink(delta, db, "keymap", mode="append")   # pg_insert (delta only)

    final = {r.value: r.key for r in jdbc_table(spark, db, "keymap").collect()}
    # gap-fill: epsilon/gamma (sorted) take free keys 2 then 4
    assert final == {"alpha": 0, "beta": 1, "delta": 3,
                     "epsilon": 2, "gamma": 4}


def test_concurrent_insert_conflict_surfaces(spark, db):
    """Two writers appending the same PRIMARY KEY: the database rejects
    the second — the constraint violation the reference's ON CONFLICT
    paths are built around is observable through Spark's JDBC sink."""
    derby_execute(spark, db.url, [
        "CREATE TABLE t_pk (id BIGINT PRIMARY KEY, v DOUBLE)"
    ], transactional=False)
    one = spark.createDataFrame([(1, 1.0)], "id bigint, v double")
    jdbc_sink(one, db, "t_pk", mode="append")
    with pytest.raises(Exception):
        jdbc_sink(one, db, "t_pk", mode="append")
    rows = derby_query_rows(spark, db.url, "SELECT COUNT(*) FROM t_pk")
    assert int(rows[0][0]) == 1


def test_upsert_merge_updates_and_inserts(spark, db):
    """MERGE-based upsert: matched keys update in place, novel keys
    insert — the reference's ON CONFLICT write path, set-based."""
    from skopje_spark.sinks.jdbc import jdbc_upsert

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id bigint, v double"
    )
    jdbc_sink(base, db, "t_up", mode="overwrite")
    delta = spark.createDataFrame(
        [(2, 99.0), (4, 40.0)], "id bigint, v double"
    )
    stmts = jdbc_upsert(delta, db, "t_up", ["id"])
    assert any("MERGE INTO" in s for s in stmts)
    final = {r.id: r.v for r in jdbc_table(spark, db, "t_up").collect()}
    assert final == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0}
    # the delta stage is dropped inside the same transaction
    assert not derby_table_exists(spark, db.url, "t_up__delta")


def test_upsert_dedups_delta_before_merge(spark, db):
    from skopje_spark.sinks.jdbc import jdbc_upsert

    jdbc_sink(spark.createDataFrame([(1, 1.0)], "id bigint, v double"),
              db, "t_upd", mode="overwrite")
    dup = spark.createDataFrame(
        [(1, 5.0), (1, 5.0), (2, 2.0), (2, 2.0)], "id bigint, v double"
    )
    jdbc_upsert(dup, db, "t_upd", ["id"])
    assert jdbc_table(spark, db, "t_upd").count() == 2


def test_upsert_statement_postgres_dialect():
    from skopje_spark.sinks.jdbc import upsert_statement

    sql = upsert_statement("t", "t__delta", ["k"], ["k", "a", "b"],
                           dialect="postgres")
    assert 'ON CONFLICT ("k") DO UPDATE SET' in sql
    assert '"a" = EXCLUDED."a"' in sql and '"b" = EXCLUDED."b"' in sql


def test_exactly_once_batch_sink_idempotent_epochs(spark, db):
    """Replaying an epoch with the same batch_id (Spark's crash
    recovery contract) must not duplicate rows; distinct ids append."""
    from skopje_spark.sinks.jdbc import jdbc_exactly_once_batch

    sink = jdbc_exactly_once_batch(db, "t_stream")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    sink(b0, 0)
    sink(b0, 0)      # replay of epoch 0: must no-op
    assert jdbc_table(spark, db, "t_stream").count() == 2
    b1 = spark.createDataFrame([(3, "c")], "id bigint, s string")
    sink(b1, 1)
    assert jdbc_table(spark, db, "t_stream").count() == 3
    # marker table records both epochs exactly once
    rows = derby_query_rows(
        spark, db.url,
        "SELECT COUNT(*) FROM stream_commits WHERE tbl = 't_stream'")
    assert int(rows[0][0]) == 2


def test_exactly_once_batch_sink_from_real_stream(spark, db, tmp_path):
    """End-to-end: a file stream drains through foreachBatch into the
    database; a second availableNow run re-reads nothing new and the
    row count is stable (checkpoint + marker double protection)."""
    import json

    from skopje_spark.sinks.jdbc import jdbc_exactly_once_batch
    from skopje_spark.streaming.streams import (
        file_stream,
        foreach_batch_sink,
    )

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(json.dumps({"id": i, "s": f"r{i}"}) for i in range(5)))
    ckpt = str(tmp_path / "ckpt")
    stream = file_stream(spark, str(src), schema="id bigint, s string")
    sink = jdbc_exactly_once_batch(db, "t_live_stream")
    q = foreach_batch_sink(stream, ckpt, sink, available_now=True)
    q.awaitTermination(120)
    assert jdbc_table(spark, db, "t_live_stream").count() == 5
    # rerun with the same checkpoint: no new input, no new rows
    stream2 = file_stream(spark, str(src), schema="id bigint, s string")
    q2 = foreach_batch_sink(stream2, ckpt, sink, available_now=True)
    q2.awaitTermination(120)
    assert jdbc_table(spark, db, "t_live_stream").count() == 5


def test_upsert_all_key_delta_is_insert_only(spark, db):
    """A delta whose columns are ALL keys has nothing to update —
    matched rows must no-op, novel keys still insert."""
    from skopje_spark.sinks.jdbc import jdbc_upsert, upsert_statement

    jdbc_sink(spark.createDataFrame([(1,), (2,)], "id bigint"),
              db, "t_keys", mode="overwrite")
    jdbc_upsert(spark.createDataFrame([(2,), (3,)], "id bigint"),
                db, "t_keys", ["id"])
    ids = sorted(r.id for r in jdbc_table(spark, db, "t_keys").collect())
    assert ids == [1, 2, 3]
    pg = upsert_statement("t", "s", ["k"], ["k"], dialect="postgres")
    assert pg.endswith("DO NOTHING")


def test_injected_executor_still_gets_database_dialect(spark, db):
    """DDL dialect follows the database URL, not whether an executor
    was injected: a custom run_sql against a Derby URL must receive
    Derby spellings (RENAME TABLE, MERGE), never the Postgres default."""
    from skopje_spark.sinks.jdbc import jdbc_sink_atomic, jdbc_upsert

    ran: list[list[str]] = []
    jdbc_sink(_seed(spark, 3), db, "t_dia", mode="overwrite")
    jdbc_sink_atomic(_seed(spark, 4), db, "t_dia",
                     run_sql=lambda stmts: ran.append(stmts))
    swap = ran[0]
    assert any(s.startswith("RENAME TABLE") for s in swap)
    assert not any("IF EXISTS" in s or s == "BEGIN" for s in swap)
    jdbc_upsert(spark.createDataFrame([(1, 9.0)], "id bigint, v double"),
                db, "t_dia", ["id"],
                run_sql=lambda stmts: ran.append(stmts))
    assert any("MERGE INTO" in s for s in ran[1])
    assert not any("ON CONFLICT" in s for s in ran[1])
