"""Live-source JDBC snapshot reads — the reference's bulk copy, Spark-first.

The reference's replicator opens the source Postgres and scans the whole
table serially (``replicator/main.go:98-101``: ``SELECT id, name, uid,
score, created_at FROM person ORDER BY id``) before switching to the WAL
stream. The Spark-native equivalent is a *partitioned* JDBC read: Spark
issues ``numPartitions`` range-bounded queries in parallel, one per
executor slot, so a 1 TB snapshot arrives as hundreds of concurrent
cursors instead of one — the ORDER BY disappears because downstream
operators never depend on scan order (the apply fold orders by ``seq``,
SURVEY.md §7.4 hard part 2).

No Postgres exists in the test sandbox (BASELINE.md scopes capture as
external), so tests cover the option-building logic; ``snapshot_reader``
itself is exercised against any reachable JDBC URL unchanged. The
partition-bounds discovery round-trip (min/max via a 1-row JDBC subquery)
is the standard production recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 10_000  # rows per JDBC cursor fetch — amortizes RTT


def jdbc_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = DEFAULT_FETCH_SIZE,
    **extra: str,
) -> dict[str, str]:
    """Build the option map for a (possibly partitioned) JDBC scan.

    Partitioned iff ``partition_column`` is given — then bounds and
    ``num_partitions`` are required (Spark splits [lower, upper] into
    that many WHERE-range queries). Serial otherwise (tiny dimension
    tables only; a serial scan of a big table is the anti-pattern the
    reference's single-cursor copy embodies).
    """
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned JDBC read needs lower_bound, upper_bound and "
                "num_partitions alongside partition_column"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def discover_bounds(
    spark: SparkSession, url: str, table: str, partition_column: str, **extra: str
) -> tuple[int, int]:
    """Min/max of the partition column via a single-row JDBC subquery —
    the bounds-discovery round-trip that precedes every partitioned scan."""
    bounds = (
        spark.read.format("jdbc")
        .options(
            **jdbc_options(
                url,
                f"(SELECT min({partition_column}) AS lo, "
                f"max({partition_column}) AS hi FROM {table}) b",
                **extra,
            )
        )
        .load()
        .collect()[0]
    )
    return bounds["lo"], bounds["hi"]


def snapshot_reader(
    spark: SparkSession,
    url: str,
    table: str = "person",
    partition_column: str | None = "id",
    num_partitions: int | None = None,
    **extra: str,
) -> DataFrame:
    """The reference's bulk copy as a parallel JDBC scan.

    ``num_partitions`` defaults to the cluster's default parallelism;
    pass ``partition_column=None`` for a serial read of a small table.
    """
    if partition_column is None:
        return (
            spark.read.format("jdbc")
            .options(**jdbc_options(url, table, **extra))
            .load()
        )
    lo, hi = discover_bounds(spark, url, table, partition_column, **extra)
    n = num_partitions or spark.sparkContext.defaultParallelism
    return (
        spark.read.format("jdbc")
        .options(
            **jdbc_options(
                url,
                table,
                partition_column=partition_column,
                lower_bound=lo,
                upper_bound=hi,
                num_partitions=n,
                **extra,
            )
        )
        .load()
    )
