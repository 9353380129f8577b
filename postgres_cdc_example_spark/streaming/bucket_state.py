"""Bucket-partitioned CDC state store — the scale path for update-in-place.

``VersionedStateStore`` (state.py) rewrites the FULL state every micro-batch:
correct and simple, but O(state) per batch — a non-starter when state is
10 TB and a batch touches 0.01% of keys. This store partitions state by a
deterministic key bucket (``pmod(key, n_buckets)``) so a micro-batch:

1. computes the buckets its changed keys hash into (≤ n_buckets values,
   collected to the driver as a bounded list),
2. reads ONLY those partitions (partition pruning — the scan's
   ``PartitionFilters`` prove no untouched bucket is read),
3. applies the change log against that state slice (operators/cdc_apply —
   correct because apply is closed per key and keys never change bucket),
4. dynamically overwrites ONLY those partitions
   (``partitionOverwriteMode=dynamic``); buckets whose keys were all
   deleted are removed explicitly, since dynamic overwrite cannot express
   an empty partition.

Per-batch cost is O(changed buckets), not O(state). Replays are idempotent:
re-applying a batch to already-applied buckets rewrites identical bytes
(upserts/deletes are idempotent merges). At 100 TB the partition count rises
(e.g. 4096 buckets × ~25 GB) and the filesystem ops below are what a
Delta/Iceberg transaction log performs atomically — the documented
production swap-in (SURVEY.md §7.4 hard part 1).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from postgres_cdc_example_spark.operators.cdc_apply import apply_changes

BUCKET_COL = "__bucket"


class BucketedStateStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema: StructType,
        key: str = "id",
        n_buckets: int = 64,
    ):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.key = key
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)
        self.recover()

    # --- bucket arithmetic -------------------------------------------------
    def bucket_expr(self, col: str | None = None) -> F.Column:
        return F.pmod(F.col(col or self.key), F.lit(self.n_buckets))

    def _bucket_dir(self, b: int) -> str:
        return os.path.join(self.root, f"{BUCKET_COL}={b}")

    def _existing_buckets(self) -> list[int]:
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.root)
            if d.startswith(f"{BUCKET_COL}=")
        )

    # --- reads -------------------------------------------------------------
    def read(self) -> DataFrame:
        if not self._existing_buckets():
            return self.spark.createDataFrame([], self.schema)
        # partition column __bucket is discovered from the dir layout and
        # dropped by the projection; data schema comes from the files
        df = self.spark.read.parquet(self.root)
        return df.select(*[f.name for f in self.schema.fields])

    def read_buckets(self, buckets: list[int]) -> DataFrame:
        """Partition-pruned state slice: only the listed bucket directories
        are scanned (assert via the plan's PartitionFilters)."""
        present = [b for b in buckets if b in set(self._existing_buckets())]
        if not present:
            return self.spark.createDataFrame([], self.schema)
        df = self.spark.read.parquet(self.root).filter(
            F.col(BUCKET_COL).isin(present)
        )
        return df.select(*[f.name for f in self.schema.fields])

    def recover(self) -> list[int]:
        """Finish (or roll back) a swap interrupted mid-``commit_buckets``.

        Invariant from the rename-aside ordering: a ``.old.`` dir exists
        only during the window between moving the live bucket aside and
        deleting the aside copy. Two cases per leftover:

        - live bucket dir MISSING → the crash hit between the two renames;
          restore the aside copy (the pre-batch slice — the replayed batch
          will re-apply on top, idempotently).
        - live bucket dir PRESENT → the staged dir made it in; the aside
          copy is garbage from a completed swap — delete it.

        Runs on every store construction, so a restarted pipeline is always
        structurally consistent before its first read. Returns the bucket
        ids that were restored."""
        restored = []
        for name in os.listdir(self.root):
            if not name.startswith(f".old.{BUCKET_COL}="):
                continue
            b = int(name.rsplit("=", 1)[1])
            live = self._bucket_dir(b)
            aside = os.path.join(self.root, name)
            if os.path.isdir(live):
                shutil.rmtree(aside, ignore_errors=True)
            else:
                os.rename(aside, live)
                restored.append(b)
        return restored

    # --- writes ------------------------------------------------------------
    def commit_full(self, df: DataFrame) -> None:
        """Backfill path: write every bucket (static overwrite)."""
        (
            df.withColumn(BUCKET_COL, self.bucket_expr())
            .write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(self.root)
        )

    def commit_buckets(self, df: DataFrame, buckets: list[int]) -> None:
        """Replace exactly the listed partitions with ``df``'s rows.

        The new slice's plan READS the partitions being replaced, so it is
        first materialized to a staging directory, then swapped in with
        per-bucket directory renames (a bucket absent from staging was
        emptied by deletes and is simply dropped). The write-then-swap is
        the filesystem spelling of a transaction-log commit — Delta/Iceberg
        make the same move atomic across partitions."""
        staging = self.root.rstrip("/") + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        (
            df.withColumn(BUCKET_COL, self.bucket_expr())
            .write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(staging)
        )
        for b in buckets:
            live = self._bucket_dir(b)
            staged = os.path.join(staging, f"{BUCKET_COL}={b}")
            # Rename the live dir ASIDE (not rmtree-first): a crash between
            # removing the live bucket and moving the staged one in must not
            # lose the bucket — recovery can restore from the .old dir. The
            # dot-prefix keeps Spark partition discovery and
            # _existing_buckets from ever seeing the aside copy.
            old = os.path.join(self.root, f".old.{BUCKET_COL}={b}")
            shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(live):
                os.rename(live, old)
            if os.path.isdir(staged):
                os.rename(staged, live)
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)

    # --- the incremental CDC apply ----------------------------------------
    def apply_and_commit(self, changes: DataFrame, **apply_kwargs) -> list[int]:
        """Apply a change log touching an arbitrary key subset, reading and
        rewriting only the affected buckets. Returns the bucket list (for
        observability). Cost: O(changed buckets), not O(state)."""
        buckets = [
            r[0]
            for r in changes.select(self.bucket_expr().alias("b")).distinct().collect()
        ]
        if not buckets:
            return []
        state_slice = self.read_buckets(buckets)
        new_slice = apply_changes(state_slice, changes, key=self.key, **apply_kwargs)
        self.commit_buckets(new_slice.select(*[f.name for f in self.schema.fields]), buckets)
        return buckets
