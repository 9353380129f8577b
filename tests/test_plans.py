"""Physical-plan regression tests — the 100 TB guardrails.

Correctness tests can pass on a plan that would melt at scale; these pin the
properties that matter on a 1000-executor cluster: predicate pushdown and
column pruning reaching the parquet scan, broadcast joins for dimension
sides, no row-at-a-time Python evaluation outside the two mapInPandas
multimodal stages, and no accidental cartesian products in the pair-join
dedup operators."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from postgres_cdc_example_spark import queries as q


def plan_of(spark, sf_dir, name: str) -> str:
    df = q.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter must reach the scan"
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read_schema, "unused wide column must be pruned"
    assert "l_orderkey" not in read_schema, "unused key column must be pruned"


def test_snowflake_join_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "nation_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_topn_join_broadcasts_filtered_dim(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q3_top_orders")
    assert "BroadcastHashJoin" in plan


def test_ann_broadcasts_query_side(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "ann_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name", ["dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash"]
)
def test_dedup_joins_are_keyed_not_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "nation_revenue",
        "cdc_apply_full",
        "cdc_compaction",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "text_quality",
        "text_lang_id",
        "ann_cosine_topk",
        "ann_ivf_topk",
    ],
)
def test_no_python_evaluation_in_jvm_operators(spark, sf_dir, name):
    """Everything except the multimodal mapInPandas stages must stay JVM-side
    (whole-stage codegen) — Python row/batch eval in a hot path is the
    10-100× slow path at scale."""
    plan = plan_of(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


@pytest.mark.parametrize("name", ["multimodal_features", "multimodal_frame_sample"])
def test_multimodal_is_arrow_batched(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "MapInPandas" in plan, "multimodal decode must be Arrow-batched mapInPandas"
    assert "BatchEvalPython" not in plan, "no row-at-a-time Python UDFs"
