"""JDBC snapshot-read option building (no live database in the sandbox —
the DataFrameReader wiring in snapshot_reader runs against any reachable
JDBC URL unchanged; these pin the partitioning contract)."""

from __future__ import annotations

import pytest

from postgres_cdc_example_spark.sources.jdbc import jdbc_options


def test_partitioned_options_complete():
    opts = jdbc_options(
        "jdbc:postgresql://host/db",
        "person",
        partition_column="id",
        lower_bound=1,
        upper_bound=100_000,
        num_partitions=64,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "1"
    assert opts["upperBound"] == "100000"
    assert opts["numPartitions"] == "64"
    assert opts["fetchsize"] == "10000"


def test_partitioned_requires_bounds():
    with pytest.raises(ValueError, match="lower_bound"):
        jdbc_options("jdbc:postgresql://host/db", "person", partition_column="id")


def test_serial_read_has_no_partition_options():
    opts = jdbc_options("jdbc:postgresql://host/db", "region", fetch_size=500)
    assert "partitionColumn" not in opts
    assert opts["fetchsize"] == "500"


def test_extra_options_pass_through():
    opts = jdbc_options(
        "jdbc:postgresql://host/db", "person", user="cdc", pushDownPredicate="true"
    )
    assert opts["user"] == "cdc" and opts["pushDownPredicate"] == "true"
