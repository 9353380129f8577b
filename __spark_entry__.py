"""Driver contract for the spark-graft builder (PySpark target).

Delegates to :mod:`postgres_cdc_example_spark.queries` — the named-query
registry where every implemented operator from SURVEY.md §2 (and the
large-scale extension ops) is registered together with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from postgres_cdc_example_spark import queries as _q

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's core invariant — filtered replication
    sync check (pubsub/main.go:79,186-198): target == σ(score%2=0)(source).
    """
    return _q.queries()["monitor_sync_check"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the few
    non-SQL-expressible ops, which get rows-only checks)."""
    return _q.oracle_sql()
