"""Size-gated broadcast hints.

A forced ``F.broadcast`` encodes the *assumption* that a side is small; when
the assumption breaks (a huge eval suite's distinct 8-grams, an oversized
ingest batch), the executors OOM collecting the "small" side instead of
degrading to a shuffle join. The gate below keeps the fast path — broadcast
when the side really is small — and makes the failure mode a plan change,
not a crash.

The probe is ``LIMIT (max_rows+1) → count``: Spark stops scanning as soon
as the limit is satisfied, so a too-big side costs O(max_rows) probe work,
never a full materialization; a small side is computed once for the probe
and once for the join (acceptable — it is, by definition, small). At
100 TB the probe bound is the knob: size it to what one executor can hold
(rows × row-width ≲ a few hundred MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~2M narrow rows ≈ low hundreds of MB broadcast — safe for default
# executor memory; callers override per side-width.
BROADCAST_MAX_ROWS = 2_000_000


def broadcast_if_small(
    df: DataFrame,
    max_rows: int | None = BROADCAST_MAX_ROWS,
    upper_bound: int | None = None,
) -> DataFrame:
    """Return ``df`` with a broadcast hint iff it has ≤ ``max_rows`` rows;
    otherwise return it unhinted so the optimizer plans a plain shuffle
    join. ``max_rows=None`` skips the gate and always hints
    (caller-asserted smallness).

    The size evidence is either ``upper_bound`` — a number the CALLER
    already knows dominates ``df``'s row count (e.g. token count ≥ distinct
    gram count), usually obtained from a far cheaper aggregate than
    materializing ``df`` twice — or, absent that, a direct early-exit
    ``limit+count`` probe of ``df``. A conservative upper bound can only
    under-broadcast (costing a plan change), never OOM."""
    if max_rows is None:
        return F.broadcast(df)
    n = upper_bound if upper_bound is not None else df.limit(max_rows + 1).count()
    if n <= max_rows:
        return F.broadcast(df)
    return df


def heal_scan_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default parallelism
    IFF its plan currently yields fewer partitions than that — the
    scale-adaptive guard in front of per-row compute-heavy projections
    (rolling-hash fingerprints, salted-md5 grids, chained BPE rewrites).

    Why conditional (r12 optimization round, guide §2.5 "input skew"):
    parquet row groups are the unit of scan splitting, so a single-row-
    group file is ONE task no matter what ``maxPartitionBytes`` says —
    on the bench fixtures every heavy projection placed directly on a
    scan ran single-threaded (measured: 2.0 s single-task vs 0.3 s
    healed for the fingerprint pass). At production scale the scan
    already yields >= parallelism splits, the condition is false, and
    the plan keeps its no-extra-Exchange shape — this never taxes the
    100 TB path with a corpus-wide shuffle.

    The partition probe (``df.rdd.getNumPartitions()``) reads plan
    metadata (file splits) on the driver and launches no job ONLY while
    the plan upstream of it is exchange-free (scan/project/filter-rooted)
    — under AQE, converting a plan that contains an Exchange to an RDD
    materializes its query stages, i.e. submits real jobs. Every call
    site keeps the heal directly on a scan-rooted projection; a derived
    plan with joins/aggregates underneath must not be passed here.
    Row-level results cannot depend on it: callers apply it only in
    front of per-row deterministic projections."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
