"""Embedded Derby: a LIVE JDBC endpoint inside the Spark JVM.

The reference's whole runtime is a real SQL database — every extract
runs a statement against Postgres (``/root/reference/src/extract/pg.rs:54,114``)
and every load commits through one (``/root/reference/src/load/pg.rs:67,96``).
Until now this repo's JDBC tier was spec-level only ("no live database
in the test environment"). That premise was wrong in one useful way:
Spark ships Apache Derby (for the Hive metastore), so an **embedded**
Derby database — same JVM, zero extra processes, standard JDBC — is
always available. This module turns it into the live integration
endpoint: every reader/writer spec in :mod:`skopje_spark.sources.jdbc`
/ :mod:`skopje_spark.sinks.jdbc` now executes for real — writes,
partitioned reads, DB-side pushdown, and the staging-table swap in a
genuine database transaction.

Scale note: embedded Derby is the *test* endpoint, not the production
one. The production path is the same code with a server-grade URL
(``jdbc:postgresql://...``) — nothing here is Derby-specific except
:func:`derby_url` and the ``dialect="derby"`` DDL spelling; the
reader/writer option maps, partitioning spec, and swap flow are shared.

Dialect deltas handled here (vs the Postgres spellings in
``sinks/jdbc.py``):

- rename is ``RENAME TABLE a TO b`` (no ``ALTER TABLE .. RENAME``);
- there is no ``IF EXISTS`` — existence is read from
  ``SYS.SYSTABLES`` just before the swap transaction (race caveat on
  :func:`derby_atomic_swap`);
- DDL is transactional, so a failed swap rolls back atomically (the
  crash-injection test pins this).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from skopje_spark.sources.jdbc import JdbcConfig

_LOG_PROP = "derby.stream.error.file"


def derby_url(db_path: str, *, create: bool = True) -> str:
    """JDBC URL for an embedded database rooted at ``db_path``."""
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:{db_path}{suffix}"


def derby_config(db_path: str, *, create: bool = True,
                 fetchsize: int = 10_000) -> JdbcConfig:
    """A :class:`JdbcConfig` for an embedded Derby DB. No driver class
    needed: Derby 10.16 autoloads via the JDBC 4 service registry."""
    return JdbcConfig(url=derby_url(db_path, create=create),
                      fetchsize=fetchsize)


def _quiet_logs(spark: SparkSession) -> None:
    # Derby writes derby.log into the CWD unless told otherwise.
    jsys = spark._jvm.java.lang.System
    if jsys.getProperty(_LOG_PROP) is None:
        jsys.setProperty(_LOG_PROP, "/tmp/skopje_derby.log")


def derby_connect(spark: SparkSession, url: str):
    """Raw JVM ``java.sql.Connection`` via py4j — the escape hatch for
    DDL/DML that Spark's DataFrame reader/writer doesn't speak
    (CREATE/RENAME/DROP, the reference's `transact` pattern)."""
    _quiet_logs(spark)
    return spark._jvm.java.sql.DriverManager.getConnection(url)


def derby_execute(spark: SparkSession, url: str, statements: list[str],
                  *, transactional: bool = True) -> None:
    """Run ``statements`` over one connection; with ``transactional``
    they commit as ONE database transaction and roll back together on
    any failure — the all-or-nothing contract the reference gets from
    ``transaction.commit()`` (``/root/reference/src/load/pg.rs:81``)."""
    conn = derby_connect(spark, url)
    try:
        if transactional:
            conn.setAutoCommit(False)
        stmt = conn.createStatement()
        try:
            for sql in statements:
                stmt.execute(sql)
            if transactional:
                conn.commit()
        except Exception:
            if transactional:
                conn.rollback()
            raise
        finally:
            stmt.close()
    finally:
        conn.close()


def derby_query_rows(spark: SparkSession, url: str, sql: str) -> list[tuple]:
    """Driver-side scalar/metadata query (existence checks, counts).
    Row data should go through ``spark.read.jdbc`` — this is for the
    bounded metadata reads only."""
    conn = derby_connect(spark, url)
    try:
        stmt = conn.createStatement()
        try:
            rs = stmt.executeQuery(sql)
            ncols = rs.getMetaData().getColumnCount()
            out = []
            while rs.next():
                out.append(tuple(rs.getObject(i + 1) for i in range(ncols)))
            rs.close()
            return out
        finally:
            stmt.close()
    finally:
        conn.close()


def derby_table_exists(spark: SparkSession, url: str, table: str) -> bool:
    rows = derby_query_rows(
        spark, url,
        "SELECT COUNT(*) FROM SYS.SYSTABLES WHERE TABLENAME = "
        f"'{table.upper()}'",
    )
    return int(rows[0][0]) > 0


def derby_atomic_swap(spark: SparkSession, url: str, table: str, *,
                      stage_suffix: str = "__stage") -> list[str]:
    """Promote ``<table><stage_suffix>`` to ``<table>`` in ONE
    transaction (Derby DDL is transactional): rename the old table out,
    rename the stage in, drop the old. Derby has no ``IF EXISTS``, so
    existence is read from ``SYS.SYSTABLES`` immediately BEFORE the
    transaction (not inside it): a concurrent swapper racing the same
    table can invalidate the precomputed statement list, in which case
    the transaction fails loudly and rolls back whole — single-writer
    per table is the intended usage; the loser reruns. Returns the
    statements that ran."""
    stage = f"{table}{stage_suffix}"
    old = f"{table}__old"
    stmts: list[str] = []
    # a leftover __old from a previous crashed swap blocks the rename;
    # clear it first (its data was already promoted or superseded)
    if derby_table_exists(spark, url, old):
        stmts.append(f"DROP TABLE {old}")
    renamed_out = derby_table_exists(spark, url, table)
    if renamed_out:
        stmts.append(f"RENAME TABLE {table} TO {old}")
    stmts.append(f"RENAME TABLE {stage} TO {table}")
    if renamed_out:
        stmts.append(f"DROP TABLE {old}")
    derby_execute(spark, url, stmts, transactional=True)
    return stmts


def derby_shutdown(spark: SparkSession, db_path: str) -> None:
    """Cleanly boot the database down (flushes + releases the dir).
    Derby signals a successful single-DB shutdown with SQLSTATE 08006
    — that 'error' is the success path."""
    try:
        derby_connect(spark, f"jdbc:derby:{db_path};shutdown=true")
    except Exception:
        pass
