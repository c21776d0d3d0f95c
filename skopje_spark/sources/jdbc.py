"""JDBC source: the Spark-native replacement for the reference's
Postgres extract surface.

Parity targets:

- `fetch_if_exists` — arbitrary SQL returning one row
  (``/root/reference/src/extract/pg.rs:43-65``) → :func:`jdbc_query`
  with a pushed-down query + ``.first()`` at the call site.
- `fetch_collection` — SQL → rows → user projection
  (``/root/reference/src/extract/pg.rs:101-125``) → :func:`jdbc_query`
  then ``.select(...)``: the closure becomes a Catalyst projection and
  never leaves the JVM.
- Connection pooling (`deadpool`, ``/root/reference/src/extract/pg.rs:42``)
  → Spark opens one connection per partition task; parallelism is the
  partitioning spec, not a pool.

Scale design: a partitioned read (``partition_column`` +
``num_partitions``) turns one big table into N range-disjoint queries
executed concurrently — the JDBC equivalent of a splittable scan. An
unpartitioned read funnels everything through one connection and is
only acceptable for dimensions.

Live integration: embedded Derby (bundled with Spark) serves as the
in-JVM database endpoint — every reader spec here executes for real in
``tests/test_jdbc_live.py`` and under the driver gate
(``queries/jdbc_live.py``); production reuses the same code with a
server URL.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcConfig:
    url: str                       # jdbc:postgresql://host/db
    user: str | None = None
    password: str | None = None
    driver: str | None = None      # e.g. org.postgresql.Driver
    fetchsize: int = 10_000        # rows per network round-trip

    def options(self) -> dict[str, str]:
        opts = {"url": self.url, "fetchsize": str(self.fetchsize)}
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.driver:
            opts["driver"] = self.driver
        return opts


def reader_options(cfg: JdbcConfig, *, table: str | None = None,
                   query: str | None = None,
                   partition_column: str | None = None,
                   lower_bound: int | None = None,
                   upper_bound: int | None = None,
                   num_partitions: int | None = None) -> dict[str, str]:
    """Build the full option map for a JDBC read. Exactly one of
    ``table`` / ``query``; partitioned reads need all four partition
    params (Spark generates WHERE-range predicates per partition)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query required")
    opts = cfg.options()
    if table is not None:
        opts["dbtable"] = table
    else:
        # pushdown: the whole statement runs DB-side, like the
        # reference's fetch_stmt strings
        opts["query"] = query
    partition_params = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in partition_params):
        if any(p is None for p in partition_params):
            raise ValueError("partitioned read needs column+bounds+count")
        if query is not None:
            raise ValueError("partitioning requires table, not query")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def jdbc_table(spark: SparkSession, cfg: JdbcConfig, table: str, *,
               partition_column: str | None = None,
               lower_bound: int | None = None,
               upper_bound: int | None = None,
               num_partitions: int | None = None) -> DataFrame:
    """Partitioned table scan — the fact-table path."""
    opts = reader_options(
        cfg, table=table, partition_column=partition_column,
        lower_bound=lower_bound, upper_bound=upper_bound,
        num_partitions=num_partitions,
    )
    return spark.read.format("jdbc").options(**opts).load()


def jdbc_query(spark: SparkSession, cfg: JdbcConfig, query: str) -> DataFrame:
    """Arbitrary-SQL scan (`fetch_collection` analog): the statement
    executes database-side; the result lands as a DataFrame."""
    opts = reader_options(cfg, query=query)
    return spark.read.format("jdbc").options(**opts).load()
