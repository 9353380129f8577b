"""Partition-count invariance — the cheapest honest 100 TB test.

On a 1000-executor cluster nothing about physical parallelism is stable:
shuffle partition counts, input split sizes, and reducer assignment all
differ run to run. Any query whose RESULT depends on them (float summation
order reaching an output, per-partition ids leaking, LIMIT without ORDER)
is wrong at scale even if it hash-matches the oracle on one local config.

These tests re-run representative queries — every exactness policy in the
repo is represented (integer cents, micro-grid logs, round-6 cosine,
window tie-breaks, sketch-bound booleans) — under deliberately different
``spark.sql.shuffle.partitions`` and input-split settings and require
bit-identical row sets.
"""

from __future__ import annotations

import pytest

from postgres_cdc_example_spark.queries import REGISTRY, _load_all

_load_all()

# one representative per exactness policy / plan family
INVARIANCE_QUERIES = [
    "q1_pricing_summary",  # decimal aggregate + rounding
    "cdc_apply_full",  # join/merge state machine
    "dedup_minhash_lsh",  # md5 min-agg + band join + Jaccard micro-grid
    "text_unigram_nll",  # micro-grid log BEFORE per-doc sum
    "source_token_kl",  # micro-grid log-ratio, bigint-weighted sum
    "kmeans_centroids",  # iterative loop, nano-grid means
    "bm25_doc_ranking",  # double formula + window tie-break
    "quality_linear_score",  # per-row sigmoid micro-round
    "event_reach_approx_error",  # sketch bounds (merge-order sensitive!)
    "retention_cohorts",  # date arithmetic + distinct
    "quality_curriculum",  # two-pass distributed rank (range-bucket offsets)
    "corpus_manifest",  # XOR checksum fold (must be partition-order-proof)
    "token_count_min_sketch",  # fixed-cell sketch + top-k tie-break
    "event_rate_anomaly",  # exact-integer variance + sqrt/div micro-grid
    "embedding_covariance",  # decimal moment sums + one closing double div
    "bpe_merge_steps",  # iterative broadcast/rewrite with checkpoint cuts
    "embedding_pca_top2",  # driver eigen fit off distributed exact moments
    "quality_classifier_train",  # decimal gradient sums + integer-div update
    "vocab_hll_audit",  # register maxima + exact shift sums (order-proof)
    "pack_documents_ffd",  # collected-metadata serial FFD off the count scan
    "ann_pq_topk",  # integer Lloyd codebook + ADC literal-table search
    "dedup_winnowing_pairs",  # packed window-min selection + fp-hash pair join
    "hybrid_rank_fusion",  # two-arm ranks + integer RRF + full-join fusion
    "heavy_hitters_misra_gries",  # value-at-rank offsets + merged summary bound
    "audience_overlap_kmv",  # bottom-k sketch merge + HUGEINT estimator
    "range_partition_plan",  # collected histogram walk -> literal assignment
    "semantic_decontam_audit",  # micro-grid cosine BEFORE per-vector max
    "rank_sketch_bottomk",  # hash bottom-k sample + literal-estimate audit
    "late_arrival_injection_audit",  # two-pass prefix max over injected arrival order
    "value_location_kruskalwallis",  # doubled-grid midranks + decimal floor-div terms
    "value_location_friedman",  # per-block doubled midranks, fully-integer cleared Q
    "value_cochran_q",  # milli-grid binary outcomes, fully-integer cleared Q
    "length_quality_kendall",  # dense-grid 2D prefix sums + tie scalars
    "text_kneser_ney_nll",  # exact-rational KN smoothing, per-row ln micro-round
    "multimodal_decoded_parity",  # stdlib codec round-trip per doc (no shuffle at all)
    "cdc_schema_drift_audit",  # to_json/from_json wire round-trip + set diff
    "dedup_snm_multipass",  # two distributed ranks + union-dedup + pass flags
    "pipeline_end_to_end",  # 5-member flag chain + packing window off one checkpoint
    "semantic_dedup_incremental",  # cluster-keyed delta join, round-6 cosine grid
    "doc_chunk_plan",  # sequence explode + slice/md5 (no shuffle at all)
    "length_mad_gate",  # doubled order statistics off per-source histograms
    "dedup_edit_distance_verify",  # distributed-rank blocking + char-DP verify
    # round-9 continuation representatives
    "theilsen_daily_trend",  # double-sorted rational pair median (IEEE order key)
    "volume_ljung_box",  # integer micro autocovariances over a positional hash join
    "source_token_js",  # two-arm micro-log sums + truncation-symmetric closing div
    "sample_poisson_bootstrap",  # hash-CDF weights; per-replicate sums must not see order
    "dedup_minhash_oph",  # single-hash bucket minima + equality collisions
    "funnel_latency_quantiles",  # histogram order statistics off user-keyed mins
    "event_transition_matrix",  # user-keyed lead window + bounded argmax ties
    # round-10 representatives
    "value_levene_brownforsythe",  # histogram lower-medians + micro-floored means + cleared F
    "customer_churn_hazard",  # lag-window gaps + duration histograms + floored hazard sums
    "orders_daily_autocorr",  # SIGNED one-IEEE-division micro rounding of grid covariances
    "user_type_entropy",  # per-(user,type) ln micro-round before weighted sum + div
    "quality_filter_funnel",  # one wide conditional aggregate -> literal pivot
    "lm_dirichlet_ranking",  # exact-integer-ratio ln + per-term window tie-break
    "gram_novelty_curve",  # min-bucket first-occurrence attribution off the shared gram layer
    "packing_waste_curve",  # integer ceil grid x literal granularity table
    "dedup_minhash_calibration",  # signature-agreement counts + jaccard floor off shared layers
    # round-12 representatives
    "event_session_gap_curve",  # user-keyed lag gap multiset vs broadcast grid
    "doc_nll_outlier_fences",  # per-source cum-histogram quartiles + doubled fences
    "pack_efficiency_audit",  # composes the serial FFD fold + bucketed next-fit window
    "ann_probe_recall_curve",  # probe-rank windows + round-6 cosine + micro recall
    "embedding_intrinsic_dim",  # anchor-gate hash + micro-ln before the integer sum
    "retrieval_rank_agreement",  # two ranker windows + bounded signed pair counts
    "lang_source_association",  # COMPLETE-grid cleared chi2 (r12 fix) + micro V^2
    "cdc_erasure_roundtrip",  # key-window terminal flags + anti/semi-join counts
    "cdc_apply_idempotence",  # double checkpointed fold + symmetric exceptAll
    # cube/rollup stay out: grouping-set NULL markers are unsortable in this
    # harness's tuple canon; their exactness is the integer-cents policy and
    # the oracle hash already compares them order-insensitively
]


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _clear_shared_layers():
    """Drop the session-memoized shingle/occurrence caches so each config
    run re-executes the shared layer under ITS parallelism — otherwise the
    second run would read the first run's persisted RDD and the layer's
    own partition-(in)dependence would go untested."""
    from postgres_cdc_example_spark.queries.extensions import (
        _BANDS_SHARE,
        _NGRAM_SHARE,
        _PCA_FIT_SHARE,
    )
    from postgres_cdc_example_spark.queries.llmdata import (
        _GRAM8_SHARE,
        _OCC_SHARE,
        _WINFP_SHARE,
    )

    # r10: the drift audit's memoized wire-line layer must also re-build
    # under each config, or its persisted partitioning goes untested
    from postgres_cdc_example_spark.queries.cdc import _WIRE_LINES_SHARE

    for cache in (
        _NGRAM_SHARE,
        _OCC_SHARE,
        _BANDS_SHARE,
        _GRAM8_SHARE,
        _WINFP_SHARE,
        _WIRE_LINES_SHARE,
    ):
        for df in cache.values():
            try:
                df.unpersist()
            except Exception:
                pass
        cache.clear()
    from postgres_cdc_example_spark.queries.extensions import (
        _PQ_SHARE,
        _RETRAIN_PQ_SHARE,
        _STALE_PQ_SHARE,
    )

    _PCA_FIT_SHARE.clear()  # driver-value memo: rebuild the fit per config
    _PQ_SHARE.clear()  # same for the PQ codebook
    _STALE_PQ_SHARE.clear()  # ...and the staleness audit's frozen codebook
    _RETRAIN_PQ_SHARE.clear()  # ...and its retrained counterfactual


@pytest.mark.parametrize("name", INVARIANCE_QUERIES)
def test_result_invariant_under_parallelism(spark, sf_dir, name):
    fn = REGISTRY[name].fn
    shuffle_prev = spark.conf.get("spark.sql.shuffle.partitions")
    split_prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        _clear_shared_layers()
        a = _canon(fn(spark, sf_dir))
        # 17 reducers AND tiny input splits (64 KiB) → different scan
        # partitioning, different merge order, different reducer count
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        _clear_shared_layers()
        b = _canon(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_prev)
        spark.conf.set("spark.sql.files.maxPartitionBytes", split_prev)
        _clear_shared_layers()
    assert a == b, f"{name} result depends on physical parallelism"
