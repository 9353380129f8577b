#!/usr/bin/env python
"""Dump .explain('formatted') for the r12-optimization-touched queries.

Usage: python scripts/gen_r12_plans.py <tag> <outdir>
Run once from the pre-optimization commit (tag=before) and once from the
optimized tree (tag=after); the judge diffs the pair per query.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG, OUTDIR = sys.argv[1], sys.argv[2]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "event_reach_approx_error",
    "sample_poisson_bootstrap",
    "text_fingerprint",
    "bpe_apply_tokens",
    "bpe_merge_steps",
    "bloom_semijoin_audit",
    "semantic_dedup",
    "semantic_dedup_incremental",
    "event_type_pagerank",
    "ann_pq_distortion_by_cluster",
    "contamination_bloom_prefilter",
    "dedup_minhash_lsh",
    "dedup_minhash_oph",
    "dedup_oph_calibration",
    "dedup_minhash_calibration",
    "dedup_simhash_calibration",
    "pipeline_end_to_end",
    "retrieval_rank_agreement",
    "text_unigram_nll",
    "dedup_winnowing_pairs",
]


def main() -> None:
    import bench
    from postgres_cdc_example_spark import queries as q
    from postgres_cdc_example_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{TAG}")
    spark.sparkContext.setLogLevel("ERROR")
    bench._build_layers(spark)
    registry = q.queries()
    os.makedirs(OUTDIR, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in QUERIES:
        try:
            df = registry[name](spark, SF)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            txt = f"PLAN GENERATION FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(OUTDIR, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
