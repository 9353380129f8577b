"""Stateful streaming operators: cross-restart session state via
applyInPandasWithState, and watermarked windowed aggregation — both checked
against their batch twins (the DuckDB-oracled queries in
queries/windows.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_example_spark.queries.windows import event_sessionization
from postgres_cdc_example_spark.sources.tables import load_table
from postgres_cdc_example_spark.streaming.stateful import (
    sessionize_stream,
    windowed_counts,
)

SPLIT_TS = "2024-01-16 00:00:00"


def _drain(stream_df, ckpt, sink: list) -> None:
    """availableNow drain through foreachBatch (checkpoint-recoverable)."""

    def collect_batch(bdf, _bid):
        sink.extend(bdf.collect())

    q = (
        stream_df.writeStream.foreachBatch(collect_batch)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_sessionize_stream_matches_batch_minus_open_tails(spark, sf_dir, tmp_path):
    """Two runs sharing one checkpoint: run 2 resumes the open-session state
    run 1 left in the state store (restart durability). Emitted (closed)
    sessions must equal the batch gaps-and-islands sessions minus each
    user's final (still-open) session."""
    ev = load_table(spark, "events", sf_dir)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    ev.filter(F.col("ts") < SPLIT_TS).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    emitted: list = []
    _drain(sessionize_stream(stream), ckpt, emitted)
    n_first_run = len(emitted)

    ev.filter(F.col("ts") >= SPLIT_TS).coalesce(1).write.mode("append").parquet(src)
    _drain(sessionize_stream(stream), ckpt, emitted)
    assert len(emitted) > n_first_run, "second run must close run-1 sessions"

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 4))
        for r in emitted
    }
    batch = event_sessionization(spark, sf_dir)
    last = batch.groupBy("user_id").agg(F.max("session_seq").alias("session_seq"))
    closed_batch = batch.join(last, ["user_id", "session_seq"], "left_anti")
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 4))
        for r in closed_batch.collect()
    }
    assert got == want


def test_windowed_counts_append_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked tumbling windows in append mode: every emitted window must
    carry exactly the batch-computed aggregate, and the windows closed by the
    final watermark must all have been emitted."""
    ev = load_table(spark, "events", sf_dir)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    ev.filter(F.col("ts") < SPLIT_TS).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    emitted: list = []
    _drain(windowed_counts(stream), ckpt, emitted)
    ev.filter(F.col("ts") >= SPLIT_TS).coalesce(1).write.mode("append").parquet(src)
    _drain(windowed_counts(stream), ckpt, emitted)

    assert emitted, "watermark advancement must have finalized some windows"
    got = {
        r.window_start: (r.n_events, round(r.total_value, 4)) for r in emitted
    }
    batch = {
        r.window_start: (r.n_events, round(r.total_value, 4))
        for r in (
            ev.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("total_value"),
            )
            .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
            .collect()
        )
    }
    for ws, agg in got.items():
        assert batch[ws] == agg, f"window {ws}: stream={agg} batch={batch[ws]}"
    # run-1's data (split minus 2h watermark) must be fully finalized by run 2
    import datetime

    cutoff = datetime.datetime(2024, 1, 15, 22, 0, 0)
    finalized = {ws for ws in batch if ws < cutoff}
    assert finalized <= set(got), "all watermark-passed windows must be emitted"


def test_dedup_stream_emits_each_key_once(spark, sf_dir, tmp_path):
    """A doubled stream (every event written twice across two files) must
    come out with each event_id exactly once."""
    ev = load_table(spark, "events", sf_dir).limit(500)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    ev.coalesce(1).write.parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)  # exact duplicates

    stream = spark.readStream.schema(ev.schema).parquet(src)
    from postgres_cdc_example_spark.streaming.stateful import dedup_stream

    emitted: list = []
    _drain(dedup_stream(stream), ckpt, emitted)
    ids = [r.event_id for r in emitted]
    assert len(ids) == len(set(ids)), "no key may be emitted twice"
    assert set(ids) == {r.event_id for r in ev.collect()}, "every key emitted once"
