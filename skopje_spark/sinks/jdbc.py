"""JDBC sink with a staging-table swap for transactional semantics.

Parity targets:

- `PgLoadExt::insert` — prepared-statement inserts inside **one
  transaction**, all-or-nothing (``/root/reference/src/load/pg.rs:50-86``;
  commit at ``:81``) → Spark JDBC writes are per-partition transactions,
  NOT globally atomic. :func:`jdbc_sink_atomic` restores the
  all-or-nothing contract with the classic staging pattern: write to
  ``<table>__stage``, then swap inside a single DB transaction.
- `PgLoadExt::copy` bulk load (``/root/reference/src/load/pg.rs:88-117``)
  → large ``batchsize`` append.

``batchsize`` replaces the reference's one-row-per-round-trip prepared
execute (``/root/reference/src/load/pg.rs:63-67``) — Spark batches
inserts per partition, which is the main reason the Spark path beats a
row-at-a-time loader at any scale.

Live execution: embedded Derby (bundled with Spark for the Hive
metastore) is always reachable, so the whole flow — staged write, swap
transaction, rollback on failure — runs for real in the test suite via
:mod:`skopje_spark.sources.derby`. Server-grade databases reuse the
same code with their own URL; ``dialect`` only changes the DDL
spelling (Postgres ``ALTER TABLE .. RENAME`` vs Derby
``RENAME TABLE``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from skopje_spark.sources.jdbc import JdbcConfig


def writer_options(cfg: JdbcConfig, table: str, *,
                   batchsize: int = 10_000) -> dict[str, str]:
    opts = cfg.options()
    opts.pop("fetchsize", None)
    opts.update(dbtable=table, batchsize=str(batchsize))
    return opts


def jdbc_sink(df: DataFrame, cfg: JdbcConfig, table: str, *,
              mode: str = "append", batchsize: int = 10_000,
              dedup_keys: list[str] | None = None,
              num_partitions: int | None = None,
              column_types: str | None = None) -> None:
    """Plain append/overwrite (`insert` analog, minus global
    atomicity). ``num_partitions`` caps concurrent DB connections
    (one per partition task). ``column_types`` feeds Spark's
    ``createTableColumnTypes`` — needed on dialects whose default
    string mapping is a large-object type (Derby: string→CLOB, and
    CLOBs can't appear in predicates or GROUP BY, so pass e.g.
    ``"name VARCHAR(64)"`` for any string column you'll filter on)."""
    if dedup_keys:
        df = df.dropDuplicates(dedup_keys)
    if num_partitions:
        df = df.coalesce(num_partitions)
    opts = writer_options(cfg, table, batchsize=batchsize)
    if column_types:
        opts["createTableColumnTypes"] = column_types
    df.write.format("jdbc").options(**opts).mode(mode).save()


def staging_swap_statements(table: str, *, stage_suffix: str = "__stage",
                            dialect: str = "postgres",
                            table_exists: bool = True
                            ) -> tuple[str, list[str]]:
    """(stage_table, swap_ddl): the transaction that promotes a staged
    load, restoring the reference's single-commit semantics
    (``/root/reference/src/load/pg.rs:81``) on top of Spark's
    per-partition writes.

    ``dialect="postgres"`` emits self-delimiting DDL (BEGIN/COMMIT +
    IF EXISTS). ``dialect="derby"`` emits bare statements — Derby has
    no IF EXISTS, so the caller states ``table_exists`` (checked
    against SYS.SYSTABLES) and the executor owns the transaction
    boundary (see :func:`skopje_spark.sources.derby.derby_atomic_swap`).
    """
    stage = f"{table}{stage_suffix}"
    old = f"{table}__old"
    if dialect == "postgres":
        swap = [
            "BEGIN",
            f"DROP TABLE IF EXISTS {old}",
            f"ALTER TABLE IF EXISTS {table} RENAME TO {old}",
            f"ALTER TABLE {stage} RENAME TO {table}",
            f"DROP TABLE IF EXISTS {old}",
            "COMMIT",
        ]
    elif dialect == "derby":
        swap = [f"RENAME TABLE {stage} TO {table}"]
        if table_exists:
            swap = [
                f"RENAME TABLE {table} TO {old}",
                f"RENAME TABLE {stage} TO {table}",
                f"DROP TABLE {old}",
            ]
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    return stage, swap


def jdbc_sink_atomic(df: DataFrame, cfg: JdbcConfig, table: str, *,
                     batchsize: int = 10_000,
                     column_types: str | None = None,
                     run_sql=None) -> list[str]:
    """All-or-nothing load: overwrite the staging table, then swap in
    one DB transaction. ``run_sql(statements)`` executes the swap; when
    omitted and ``cfg.url`` is an embedded-Derby URL the swap runs LIVE
    through :func:`~skopje_spark.sources.derby.derby_atomic_swap`
    (existence-aware, single transaction, rolls back whole on failure).
    Returns the statements that were (or would be) run."""
    if run_sql is None and cfg.url.startswith("jdbc:derby:"):
        jdbc_sink(df, cfg, f"{table}__stage", mode="overwrite",
                  batchsize=batchsize, column_types=column_types)
        from skopje_spark.sources.derby import derby_atomic_swap
        return derby_atomic_swap(df.sparkSession, cfg.url, table)
    stage, swap = staging_swap_statements(table)
    jdbc_sink(df, cfg, stage, mode="overwrite", batchsize=batchsize,
              column_types=column_types)
    if run_sql is not None:
        run_sql(swap)
    return swap
