"""JDBC source/sink SPEC tests: reader/writer option maps and swap
DDL as pure functions. The same surfaces run LIVE against embedded
Derby in ``tests/test_jdbc_live.py`` and under the driver gate in
``queries/jdbc_live.py``."""

from __future__ import annotations

import pytest

from skopje_spark.sinks.jdbc import staging_swap_statements, writer_options
from skopje_spark.sources.jdbc import JdbcConfig, reader_options

CFG = JdbcConfig(
    url="jdbc:postgresql://db/warehouse", user="u", password="p",
    driver="org.postgresql.Driver",
)


def test_reader_options_table_vs_query_exclusive():
    with pytest.raises(ValueError, match="exactly one"):
        reader_options(CFG)
    with pytest.raises(ValueError, match="exactly one"):
        reader_options(CFG, table="t", query="SELECT 1")


def test_reader_options_partitioned_scan():
    opts = reader_options(
        CFG, table="orders", partition_column="o_orderkey",
        lower_bound=0, upper_bound=1_000_000, num_partitions=32,
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1000000")
    assert opts["numPartitions"] == "32"
    assert opts["fetchsize"] == "10000"


def test_reader_options_partition_validation():
    with pytest.raises(ValueError, match="column\\+bounds\\+count"):
        reader_options(CFG, table="t", partition_column="k")  # missing bounds
    with pytest.raises(ValueError, match="requires table"):
        reader_options(
            CFG, query="SELECT 1", partition_column="k",
            lower_bound=0, upper_bound=1, num_partitions=2,
        )


def test_query_pushdown_option():
    opts = reader_options(CFG, query="SELECT max(o_orderkey) FROM orders")
    assert "dbtable" not in opts and opts["query"].startswith("SELECT max")


def test_writer_options_batching():
    opts = writer_options(CFG, "facts", batchsize=50_000)
    assert opts["dbtable"] == "facts" and opts["batchsize"] == "50000"
    assert "fetchsize" not in opts  # read-side knob must not leak


def test_staging_swap_is_single_transaction():
    stage, swap = staging_swap_statements("facts")
    assert stage == "facts__stage"
    assert swap[0] == "BEGIN" and swap[-1] == "COMMIT"
    # the stage table is promoted inside the transaction
    assert any("RENAME TO facts" in s and "facts__stage" in s for s in swap)
