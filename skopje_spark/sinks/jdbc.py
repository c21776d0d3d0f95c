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

No live database in the test environment: the swap statements are
returned for inspection and the write spec is testable; execution
happens wherever a JDBC URL is reachable.
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
              num_partitions: int | None = None) -> None:
    """Plain append/overwrite (`insert` analog, minus global
    atomicity). ``num_partitions`` caps concurrent DB connections
    (one per partition task)."""
    if dedup_keys:
        df = df.dropDuplicates(dedup_keys)
    if num_partitions:
        df = df.coalesce(num_partitions)
    df.write.format("jdbc").options(
        **writer_options(cfg, table, batchsize=batchsize)
    ).mode(mode).save()


def staging_swap_statements(table: str, *, stage_suffix: str = "__stage"
                            ) -> tuple[str, list[str]]:
    """(stage_table, swap_ddl): the transaction that promotes a staged
    load, restoring the reference's single-commit semantics
    (``/root/reference/src/load/pg.rs:81``) on top of Spark's
    per-partition writes."""
    stage = f"{table}{stage_suffix}"
    swap = [
        "BEGIN",
        f"DROP TABLE IF EXISTS {table}__old",
        f"ALTER TABLE IF EXISTS {table} RENAME TO {table}__old",
        f"ALTER TABLE {stage} RENAME TO {table}",
        f"DROP TABLE IF EXISTS {table}__old",
        "COMMIT",
    ]
    return stage, swap


def jdbc_sink_atomic(df: DataFrame, cfg: JdbcConfig, table: str, *,
                     batchsize: int = 10_000,
                     run_sql=None) -> list[str]:
    """All-or-nothing load: overwrite the staging table, then swap in
    one DB transaction. ``run_sql(statements)`` executes the swap
    (injected so environments without a live DB can test the flow);
    returns the statements that were (or would be) run."""
    stage, swap = staging_swap_statements(table)
    jdbc_sink(df, cfg, stage, mode="overwrite", batchsize=batchsize)
    if run_sql is not None:
        run_sql(swap)
    return swap
