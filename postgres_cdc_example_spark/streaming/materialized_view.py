"""Streaming materialized aggregate view — incremental maintenance wired
into the CDC stream.

The reference's pubsub monitor polls full-table COUNT(*)s every 5 s
(``pubsub/main.go:159-169``) — an O(state) rescan per tick. This module
keeps a grouped aggregate (rows + exact integer sum per group) continuously
current by folding :func:`operators.incremental.maintain_agg` over the same
change stream the state pipeline consumes: per micro-batch the cost is
O(|changes| + touched keys), never O(state), so a 100 TB state table costs
the same per tick as a 100 MB one.

Crash consistency (exactly-once, both stores versioned at ``batch_id + 1``):
the aggregate commits BEFORE the state store, so at any crash point

- agg @ v+1, state @ v   → replay: agg skips (version check), state
  re-applies (idempotent fold) — both land at v+1;
- agg @ v,   state @ v   → replay recomputes the delta from the untouched
  pre-state — correct by construction.

State can therefore never be AHEAD of the aggregate, which is the one
ordering that would poison the delta (a pre-state slice that already
contains the batch yields a zero delta, silently freezing the view).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import LongType, StringType, StructField, StructType

from postgres_cdc_example_spark.operators.cdc_apply import apply_changes
from postgres_cdc_example_spark.operators.incremental import agg_snapshot, maintain_agg
from postgres_cdc_example_spark.schemas import PERSON_SCHEMA
from postgres_cdc_example_spark.sources.changelog import (
    decode_change_lines,
    flatten_person_changes,
    split_corrupt,
)
from postgres_cdc_example_spark.streaming.state import VersionedStateStore

AGG_SCHEMA = StructType(
    [
        StructField("name", StringType(), True),
        StructField("n_rows", LongType(), True),
        StructField("sum_cents", LongType(), True),  # exact integer units
    ]
)

_APPLY_KW = dict(
    seq="seq",
    action="action",
    value_cols=["name", "uid", "score"],
    created_col="created_at",
)


def _score() -> Column:  # lazy: Column creation needs a live session
    return F.col("score").cast("long")


class StreamingAggView:
    """person change-lines → state table + continuously-maintained
    ``(name, n_rows, sum_cents=Σscore)`` aggregate."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        store_root: str,
        checkpoint_dir: str,
        group_col: str = "name",
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.group_col = group_col
        self.state_store = VersionedStateStore(spark, store_root + "/state", PERSON_SCHEMA)
        self.agg_store = VersionedStateStore(spark, store_root + "/agg", AGG_SCHEMA)

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        valid, _dead = split_corrupt(decode_change_lines(batch_df))
        changes = flatten_person_changes(valid)
        v_next = batch_id + 1
        # replay guard (see CdcPipeline._apply_batch): the agg store commits
        # BEFORE the state store, so state at v_next implies both are done —
        # re-running would read-and-overwrite the same version directory.
        state_v = self.state_store.latest_version()
        if state_v is not None and state_v >= v_next:
            return
        state = self.state_store.read()
        agg_v = self.agg_store.latest_version()
        if agg_v is None:
            # seed from current state (empty on a fresh pipeline; the
            # backfilled snapshot when attach() followed a bulk copy)
            self.agg_store.commit(
                agg_snapshot(state, self.group_col, _score()), version=batch_id
            )
            agg_v = batch_id
        if agg_v < v_next:
            new_agg = maintain_agg(
                self.agg_store.read(),
                state,
                changes,
                group_col=self.group_col,
                cents=_score(),
                key="id",
                **_APPLY_KW,
            )
            self.agg_store.commit(new_agg, version=v_next)
        new_state = apply_changes(state, changes, key="id", **_APPLY_KW)
        self.state_store.commit(new_state.select(*state.columns), version=v_next)

    def start(self, available_now: bool = True) -> StreamingQuery:
        lines = (
            self.spark.readStream.format("text")
            .option("maxFilesPerTrigger", 16)
            .load(self.source_dir)
        )
        writer = (
            lines.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="2 seconds")
        return writer.start()

    def view(self) -> DataFrame:
        return self.agg_store.read()

    def state(self) -> DataFrame:
        return self.state_store.read()
