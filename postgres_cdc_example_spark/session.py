"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[*]``; the conf below is chosen so the *same plans*
hold on a 1000-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic join
  strategy switch) — at 100 TB the static plan is never exactly right.
- Arrow execution for the few Pandas-UDF paths (multimodal / embedding ops).
- UTC session timezone so parquet TIMESTAMP (no tz) round-trips match the
  DuckDB oracle bit-for-bit.
- Broadcast threshold raised: TPC-H-ish dims (region/nation/supplier/part at
  bench SF) are far below 64 MB and must never shuffle-join.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "postgres-cdc-example-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # r13 (guide §3, measured): prefer shuffled-hash over sort-merge
        # when a join side's ESTIMATED size fits the local-map threshold —
        # the planner's per-join size gate, not an unconditional switch:
        # fact-fact joins whose sides exceed the threshold stay SMJ at any
        # scale, small-side joins skip both sorts. Interleaved A/B over
        # all 227 bench queries: 132.6 -> 127.0 s at 32 cores (-4.2%) and
        # 52.7 -> 51.8 s on the top-40 at 8 cores (-1.7%) — a win at BOTH
        # core counts (individual queries swing both ways; totals decide).
        # Env-overridable so a memory-tight deployment can restore the
        # sort-merge default.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # 128 MB splits — right at cluster scale (~800k tasks at 100 TB).
        # Test fixtures are single ≤11 MB files (one scan task regardless);
        # operators that expand rows (shingling, explodes) repartition
        # explicitly before the expansion so parallelism never depends on
        # input split count.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(128 * 1024 * 1024)),
        )
        # events.ts is parquet TIMESTAMP(NANOS) which Spark can't decode
        # natively — read as long ns, normalized to timestamp_ntz in
        # sources.tables.load_table (micros, matching DuckDB's truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Static conf: the generated-class cache defaults to 100 entries —
        # a session cycling through the full registry (the bench's
        # interleaved passes, the all-oracle test sweep) evicts every
        # query's compiled stages between its own samples and re-pays Janino
        # compilation per pass. 2000 sufficed at ~95 benched queries; at 131
        # (x2 scale factors in a bench session) total fragments exceed it
        # again — the r6 "exact-substring regression" was exactly this
        # (measured r7: 2000 -> 10000 took dedup_exact_substring 3.03 ->
        # 1.33 s and dedup_substring_removal 4.52 -> 2.94 s in the full
        # bench shape, whole-list total 124 -> 116 s; a 1 GiB JVM
        # ReservedCodeCacheSize changed nothing, exonerating the JIT).
        # r8: the benched list grew 138 -> 147 and the common-query sum
        # inflated ~6% in the interleaved shape again -> 20000 (same
        # mechanism, same fix, validated by a back-to-back A/B at the
        # 147-query list: 130.5 s @ 10000 vs 126.0 s @ 20000). A later
        # 40000 probe measured NO improvement (ambient machine-load drift,
        # not eviction), so the bound stays at the evidence-backed 20000.
        .config("spark.sql.codegen.cache.maxEntries", "20000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
