"""Round-13 optimization-round pins.

Each test pins a semantics edge or plan shape that an r13 optimization
touched, so a later rewrite can't silently undo it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_example_spark.queries.windows import _funnel_conditional_agg


def _stage_fixture():
    stage_names = [(0, "ingest"), (1, "gate")]
    conds = {0: F.lit(True), 1: F.col("k1")}
    return stage_names, conds


def test_funnel_empty_stage_yields_null_token_sum(spark):
    """r12 verdict #10: a stage with ZERO survivors must report
    total_tokens = NULL (the oracle's sum() over an empty CTE), never 0,
    while its survivor count stays 0."""
    flags = spark.createDataFrame(
        [(1, 10, False), (2, 20, False)], "doc_id long, n_toks long, k1 boolean"
    )
    stage_names, conds = _stage_fixture()
    row = _funnel_conditional_agg(flags, stage_names, conds).collect()[0]
    assert row["n0"] == 2 and row["t0"] == 30
    assert row["n1"] == 0
    assert row["t1"] is None


def test_funnel_empty_corpus_yields_zero_counts_null_sums(spark):
    """An EMPTY documents table must report n_units = 0 (the oracle's
    count(*) over an empty CTE) with NULL token sums for every stage."""
    flags = spark.createDataFrame([], "doc_id long, n_toks long, k1 boolean")
    stage_names, conds = _stage_fixture()
    row = _funnel_conditional_agg(flags, stage_names, conds).collect()[0]
    assert row["n0"] == 0 and row["t0"] is None
    assert row["n1"] == 0 and row["t1"] is None
