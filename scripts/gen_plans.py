#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the headline operators
with the 100 TB plan-shape commentary. Run after plan-affecting changes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import io

import __spark_entry__ as e
from postgres_cdc_example_spark.session import get_spark

SF = "/root/testdata/sf0.01"

NOTES = {
    "nation_revenue": "Snowflake join: ONE shuffle (lineitem⋈orders); customer→nation→region pre-joined and broadcast. Watch for: BroadcastHashJoin ×4, no SortMergeJoin, pruned ReadSchema.",
    "q1_pricing_summary": "Scan→filter→agg: shipdate predicate in PushedFilters, 7-column ReadSchema (not 11), partial agg before the single exchange.",
    "dedup_minhash_lsh": "Shingles explode to rows; min-agg combines map-side; candidate join shuffles on (band_idx, band_key) only — all-pairs never materializes.",
    "clicks_asof_errors": "As-of join as union + last(ignorenulls) window: one exchange on user_id, NO BroadcastNestedLoopJoin (the range-join trap).",
    "errors_nearby_clicks": "Bucketed range join: equi-join on the quantized bucket + residual filter; again no nested loop.",
    "rollup_region_revenue": "ROLLUP = Expand (3 grouping sets per row) feeding ONE hash aggregate — the fact table is scanned once.",
    "incremental_agg_maintenance": "State enters only through a left-semi join on touched keys — the state-side scan is delta-sized, the delta merges via one union+agg.",
    "q10_returned_items": "Top-20 via TakeOrderedAndProject (per-partition heap), not a global sort; returnflag filter pushed to the lineitem scan.",
    "user_profile_similarity": "Multi-probe sign-LSH over profile vectors: the pair join is an EQUI-join on the probe bucket (×5 expansion on the query side only) — the r1 all-pairs user≠user nested loop is gone; raise PROFILE_PLANES as U grows.",
    "dedup_incremental": "Delta-vs-corpus LSH: delta band table broadcasts; corpus bands meet it on (band_idx, band_key) — corpus×corpus pairs never enumerate, per-batch cost is O(delta bands + collisions).",
    "benchmark_contamination": "Decontamination sweep: one distinct-8-gram explode feeds both sides; benchmark side (tiny) broadcasts; corpus rows shuffle only when a gram collides.",
    "text_unigram_nll": "Unigram-LM scoring: token counts combine map-side; the scoring join's per-token log-prob is micro-grid-rounded BEFORE the per-doc sum, so the aggregate is pure integer addition; scans prune to (doc_id, text).",
    "event_hourly_gapfill": "Gap fill: per-user hour grid from sequence() (bounded by span, never a global calendar cross join); fill join is a left equi-join on (user, hour).",
    "corpus_curation_v2": "Curation chain as ONE DAG: bigrams/8-grams are per-row array transforms (no window sorts); doc_id-keyed gate aggregates share a shuffle; gram join stays inverted-index-keyed with the benchmark side size-gated broadcast.",
    "quality_linear_score": "Frozen linear quality gate: every feature is a per-row array expression - the plan is scan -> filter -> project with ZERO exchanges, the cheapest thing that can front a 100 TB curation DAG.",
    "source_token_kl": "Domain-shift KL: one doc_id join + three map-side-combined aggregates keyed on token/source; the per-token log-ratio is micro-rounded before the bigint-weighted sum so no float ever reaches an aggregate.",
    "ann_ivf_kmeans_topk": "Learned IVF: training collapsed the centroids to literals, so bulk assignment is a zero-shuffle projection (greatest over per-centroid cosine structs); the only joins belong to the search phase within the query's cluster.",
    "dedup_cross_source_matrix": "Leakage matrix: collision-sized pair table joined twice to the corpus-sized doc dim with NO forced hints - AQE's runtime stats pick the pair side as broadcast build.",
    "bm25_doc_ranking": "Lexical retrieval: the 5-term idf table broadcasts into the tf join, filtering the corpus to matching terms before the per-term top-10 window.",
    "dedup_exact_substring": "Suffix-array-family substring dedup, relationally: positional grams are slice+concat_ws projections (one explode, no window sorts); hot grams (df>64) drop BEFORE the self-join; the pair join is an EQUI-join on the gram text; the gaps-and-islands span merge windows on (doc_a, doc_b, diagonal) — group size bounded by the shorter doc, never by N.",
    "multimodal_phash_neardup": "Perceptual near-dup: ONE Arrow mapInPandas pass computes the 64-bit aHash; candidates meet on the exploded 16-bit band (equi-join, recall-exact to Hamming 15); verification is popcount-of-XOR in codegen. doc×doc never materializes.",
    "dedup_keeper_by_quality": "Quality-aware keeper selection: connected-components cluster table joined to the ZERO-shuffle quality projection on doc_id; one row_number window per component (cluster sizes are collision-bounded). Everything keyed — no cartesian in the composed DAG.",
    "embedding_source_drift": "Embedding-space drift: one vec_id equi-join + one (source × dim)-keyed aggregate on integer nano-units; the corpus centroid derives from the per-source sums (no second scan) and broadcasts as ONE row into the final cosine projection.",
    "quality_curriculum": "Curriculum deciles: the corpus-sized rank window is keyed on the quality RANGE bucket (one hash shuffle); cumulative offsets come from the <=245-row histogram and broadcast back — never a single-reducer global sort.",
    "lsh_band_bucket_stats": "LSH tuning audit: two keyed aggregates — (band_idx, band_key) then a 4-row band reduce. candidate_pairs PREDICTS the band self-join's output volume without running any join.",
    "lsh_recall_audit": "Recall S-curve: exact truth pairs (df-cutoff inverted index) LEFT-join the band-collision candidates on (doc_a, doc_b); both sides are collision-bounded, the decile rollup is 10 keys.",
    "corpus_manifest": "Integrity sweep: scan -> per-row md5 projection -> one per-source aggregate with an XOR fold (commutative, overflow-free) — nothing else touches the data.",
    "contamination_bloom_prefilter": "Broadcast-bloom decontamination: corpus grams test membership via codegen bit arithmetic on the literal 1024-long bitmap (driver state bounded by M, not by benchmark size); the only join is the exact-audit equi-join on the gram.",
    "token_count_min_sketch": "CMS build: ONE map-side-combined aggregate keyed on (j, bucket) into <=2048 cells regardless of vocabulary; the audit side joins the broadcast cell table to the exact top-20 probes.",
    "incremental_join_maintenance": "IVM delta: a Union of three custkey-keyed delta-sized joins — no ExceptAll, no anti-join, no full-view recompute anywhere in the plan.",
    "event_rate_anomaly": "Anomaly tail: one keyed aggregate + one event_type-keyed window; variance from exact integer frame sums so the plan's only float math is the closing sqrt/division projection.",
    "embedding_covariance": "Distributed PCA moments: Arrow-batched Gram map (exact int64 m'm per batch — the measured-7x numpy path) into 2080 (i,j)-keyed cells — no corpus self-join; 64-row mean sides broadcast.",
    "bpe_merge_steps": "Tokenizer training loop: per step, one pair-keyed combine + TakeOrdered-1 + a 1-row broadcast into the per-row rewrite; generations localCheckpoint so the unrolled chain never recomputes prior folds.",
    "user_erasure_audit": "Erasure + compliance proof: one anti-join (the erasure) + one semi-join over the REWRITTEN side (the zero-residual claim); audit counts are 1-row broadcasts.",
    "embedding_pca_top2": "Distributed-PCA serving: the driver eigen fit collapsed both directions and the mean to 64-element literals, so the two-component projection is scan -> project with ZERO exchanges and zero joins — the second component costs no extra reads.",
    "bpe_apply_tokens": "Tokenizer serving: the frozen merge table applies as chained constant-folded per-row rewrites in ONE corpus scan — no joins, no shuffle; Generate barriers every 2 merges keep the fold chain inside the janino method limit without breaking the single pass.",
    "quality_classifier_train": "Full-batch GD epoch: per step, one map-side-combined residual-moment aggregate over the checkpointed zero-shuffle feature projection, with 1-row weight sides broadcast — the iterate/broadcast/rewrite skeleton at its purest.",
    "vocab_hll_audit": "Relational HyperLogLog: token hashes combine into per-(source, register) maxima map-side; the 256-register grid and the 1-row estimate join back as broadcasts; the exact COUNT DISTINCT side exists only because this is the audit.",
    "pack_documents_ffd": "Exact FFD under the driver threshold: the corpus contributes ONE (id, token-count) projection; assignment is bounded driver metadata returned as a LocalTableScan — above threshold the plan switches to the bucket-ranked harmonic arm.",
    "source_quota_admission": "Per-source quota: one window cumsum keyed on source over (source, id, count) triples — stop-at-first-overflow is exactly cum<=budget under monotone sums, which is what keeps this a single keyed shuffle instead of a serial scan.",
    "basket_part_pairs": "Market-basket mining: pairs explode from the grouped basket ARRAY (one order-keyed shuffle, baskets capped at 64 items before the quadratic step); pair counts combine map-side; part-frequency joins stay part-keyed.",
    "event_type_pagerank": "Graph centrality loop: the edge table is the big data (one user-keyed sequence shuffle + one (from,to) count); each of the 3 iterations broadcasts the bounded rank vector into a single edge-keyed join+aggregate with per-edge floored integer contributions.",
    "covariance_incremental": "Moment-level IVM: base and delta splits each run the Arrow Gram map; the merge is a 2080-cell keyed union-aggregate — the oracle recomputes from scratch, so the driver hash equality proves merge == recompute bit-for-bit.",
    "embedding_outliers": "PCA-space outlier gate: two literal-dot projections + ONE 1-row exact moment aggregate broadcast back; the 3-sigma test is all-integer ((x*n - S1)^2 > 9*(n*S2 - S1^2)) so no float reaches a verdict.",
    "ann_pq_topk": "PQ/ADC serving: codes are literal-codeword argmin projections, per-query distance tables are literal integer arrays — the search plan is scan -> project -> explode -> one q_id-keyed ranking window, with NO join anywhere.",
    "ann_ivfpq_topk": "IVF-PQ serving: coarse assignment is an argmin over the literal centroid table and the residual slicing fuses into the same zero-shuffle projection, so the probe stays joinless — scan -> project -> explode -> cid filter -> one q_id-keyed ranking window; at rest the code table partitions by cid for partition-pruned probes.",
    "order_value_quantiles_2pass": "Two-pass exact quantiles: pass 1 is one map-side-combined histogram over domain-bounded buckets; pass 2 re-scans ONLY the target buckets with the range predicate PUSHED to the parquet scan (PushedFilters on the raw column), ranks inside per-bucket windows (never a global sort), and a broadcast 3-row target table picks the answers.",
    "boilerplate_segment_removal": "C4-style boilerplate removal: segments shuffle on md5(seg) — a fixed-width key however long the segment — into one map-side-combined count, join back hash-keyed, and the doc rebuild is ONE doc-keyed aggregate; nothing reaches the driver.",
    "event_funnel": "Ordered funnel: three chained per-user window aggregates stack on a SINGLE user_id Exchange (the naive spec is three grouped self-joins re-shuffling the fact table per step); one bounded 1-row aggregate closes the counts.",
    "tfidf_cosine_pairs": "Weighted sparse cosine: tf/df off the shared occurrence layer (map-side combined), pair dots from the df-cutoff inverted-index join, norms join back id-keyed — and cosine is never divided (decimal cross-multiplication), so the whole plan is integer codegen.",
    "orders_zorder_layout": "Morton-layout audit: the bit interleave is one codegen projection, file assignment broadcasts a 1-row maxima aggregate, and the per-file footer stats close in a single 32-group aggregate — no sort anywhere.",
    "hybrid_rank_fusion": "RRF fusion: the lexical arm is the tok-keyed inverted-index join off the shared tf-idf weight layer; the semantic arm broadcasts the 10-query sample against one corpus scan; fusion is a (q_id, doc_id)-keyed FULL join of two top-20 lists + one per-query ranking window — all-integer RRF, no floats.",
    "pii_redaction_audit": "PII sweep: detection counts, chained redaction, md5+length byte pins and the zero-residual re-scan are ALL per-row regex/codegen projections — one corpus scan, zero exchanges, zero joins; the cheapest shape a compliance pass can have.",
    "boilerplate_incremental": "Count-table IVM: base and delta splits each run one map-side-combined md5(seg) count; the merge is a hash-keyed union-aggregate — the oracle recounts from scratch, so the driver hash proves merge == recompute without a corpus rescan.",
    "doc_winnowing_fingerprints": "Winnowing selection: gram hashes, window minima, distinct and checksum are per-row ARRAY arithmetic — scan -> project with zero exchanges; the fingerprint index is one further explode away.",
    "dedup_winnowing_pairs": "Guarantee-backed near-dup candidates: distinct (doc, fingerprint-hash) rows from one explode, hot hashes cut at df<=64, pairs meet on the 40-bit h equi-join — the MinHash/LSH pair shape with winnowing's shared-substring covenant.",
    "quality_classifier_apply": "Classifier serving: the GD weights are 4 collected literals, so inference is scan -> project (zero exchanges, zero joins) — training's aggregates ran once at build time, driver-sized.",
    "heavy_hitters_misra_gries": "One corpus-sized (source, tok) count with partial_count before its exchange; every window/scalar downstream runs on <= 8 x n_sources survivor rows. Watch for: map-side combine, broadcast 1-row t_m/bound sides, no CartesianProduct.",
    "dedup_containment_pairs": "Same inverted-index shape as dedup_ngram_jaccard (shared shingle layer, df <= 64 cutoff) with the directional containment predicate; candidate join keyed on the gram, never all-pairs.",
    "audience_overlap_kmv": "Bottom-k sketches (<= 64 rows/day) merged through a bounded 30-day grid join; the corpus touches only one distinct + one per-day window. Watch for: the non-equi day-grid BNLJ is the bounded build side, exact arm keyed on user_id.",
    "range_partition_plan": "Pass-2 assignment is a constant-folded literal CASE sum into a 16-group aggregate: no Join operator anywhere, histogram walk happened at plan-build time on ~500-bucket driver metadata.",
    "bloom_semijoin_audit": "Probe-side bloom test is codegen bit arithmetic against the 8 KiB literal bitmap inside the lineitem scan; the exact semi-join rides the same scan as one BroadcastHashJoin. Watch for: no Python eval, single probe scan.",
    "join_cardinality_estimate": "ONE map-side-combined key-count aggregate feeds everything: exact sum(c^2), the top-32 TakeOrdered, and two 1-row scalar broadcasts. DECIMAL(38,0) squares.",
    "semantic_decontam_audit": "Corpus scan x eval-suite-bounded broadcast (the ANN-audit contract); per-pair cosine hits the micro grid before the per-vector max; final histogram is ~20 groups + a 1-row compliance broadcast.",
    "dedup_prefix_filter_pairs": "Rarest-first prefix slice indexes ~10% of each doc's shingles; candidate equi-join on the prefix gram, verification joins bounded per-pair arrays. Watch for: no df-cutoff needed (exact recall at 0.9 by construction) — volume priced by prefix_filter_volume_stats.",
    "contrastive_negatives_plan": "One corpus scan against the 64-row hash-reservoir pool broadcast (non-equi, bounded build side), one keyed anti-join against the verified near-dup pairs, one per-anchor window over <= 64 rows.",
    "dedup_sorted_neighborhood": "Two-pass distributed rank (prefix-bucket row_number + broadcast offsets), 8-way rank-key explode + equi-join for neighbor pairs (no range join), bounded per-pair array verification off the shared shingle layer.",
    "quantile_histogram_rollup": "Hourly histogram -> daily merge is two map-side-combined aggregates on (day, bucket); the cumulative walk windows over ~50 buckets per day; exact side is one per-day ranking window (the audit, not the product).",
    "dedup_graph_shape_audit": "All six consumers (triangle arms, components, degrees, edges) read the ONE checkpointed verified-pair table; triangle counting is the ordered 3-way self-join on pair-table-sized inputs, never the corpus.",
    "cdc_gap_detection": "One keyed window over the change log (the compaction shuffle it shares), a 120-key rollup, and the 1-row injected-loss broadcast closing the summary.",
    "audience_churn_kmv": "Same merged-sketch shape as audience_overlap_kmv restricted to consecutive-day pairs; the theta-window argument makes the A-not-B membership test exact inside the union sketch; exact arm keyed on user_id.",
    "event_volume_trend": "Daily rollup (one shuffle on type+day) into a 5-group exact-moment aggregate; coefficients are single IEEE double divisions of exact integers — the moment vector is the mergeable summary.",
    "join_order_advisor": "Key-only scans feed three count aggregates (the CBO statistics pass); the output is three 1-row scalars merged via broadcast — the advisor prices the join orders without materializing either join payload.",
    "user_activity_gini": "Both statistics come from the bounded (count -> n_users) histogram — windows over histogram rows only, never a global per-user ranking; four 1-row scalar broadcasts close the output.",
    "order_priority_chi2": "One map-side-combined |cells|-bounded aggregate; margins/total live on the cell table; per-cell statistic is cleared-denominator HUGEINT rational — no floats anywhere in a significance test.",
    "value_distribution_ks": "One map-side-combined aggregate on the bounded milli-value domain; the CDF supremum windows over those bounded rows; the significance decision is squared-form integer arithmetic — no sqrt ever runs.",
    "length_quality_spearman": "Zero-shuffle scoring scan + two value-domain-bounded midrank histograms (windows over histogram rows only) + one moment aggregate; the closing Pearson-on-ranks runs as correctly-rounded IEEE ops on exact integers.",
    "join_skew_audit": "Skew planning: per-key multiplicities from ONE map-side-combined aggregate, a 1-row (total, n_keys) broadcast, and TakeOrdered for the heavy-hitter top-20 — never a global sort.",
    "value_location_kruskalwallis": "K-sample location test: one map-side-combined (type, milli-grid) aggregate, a bounded-grid window for doubled midranks, a k-row group table, two 1-row scalar broadcasts — the decision is cleared-denominator DECIMAL(38,0) arithmetic vs a chi2-quantile literal; no transcendental anywhere.",
    "dedup_snm_multipass": "Two independent distributed ranks (prefix-bucket row_number + broadcast offsets per pass), each feeding the 8-way rank-explode equi-join; union canonicalizes to (least, greatest) and the per-pass flags aggregate on the pair key; verification joins the checkpointed per-doc shingle arrays ONCE per unique pair — no range join, no global sort, no re-verification per pass.",
    "pipeline_end_to_end": "Every member (exact keepers, cluster keepers, contamination set, quality scores, quota admissions) computed ONCE and joined by doc_id into a single flag-annotated narrow frame (localCheckpointed); the output rows are conditional aggregates and one bounded packing window over that cache — the capstone never recomputes a stage.",
    "semantic_dedup_incremental": "Delta-only a side (vec_id >= threshold filter BEFORE the join) against the full corpus b side, equi-joined on cluster_id from the literal trained centroids - per-batch cost O(delta x cluster density), never corpus x corpus.",
    "perplexity_bucket_plan": "The unigram scorer runs once behind a lazy localCheckpoint; per-lang ranks use the two-pass distributed shape (per-(lang, NLL-bucket) row_number + broadcast offsets); tercile arithmetic is integer div - no per-doc global sort.",
    "doc_chunk_plan": "One scan, one Generate (sequence explode), slice+md5 inside codegen - zero shuffle; output volume is the intrinsic ~n/stride chunks per doc.",
    "golden_record_survivorship": "Everything downstream of the composed dedup_clusters runs on CLUSTER rows only (localCheckpointed once for four consumers): keyed aggregates + per-component row_number windows over handfuls of rows.",
    "length_mad_gate": "Order statistics from per-source VALUE histograms: one map-side-combined (source, n_chars) aggregate, cumulative windows over histogram rows (value-domain-bounded), then one re-aggregation against broadcast med2/mad4 scalars - never a per-doc sort.",
    "dedup_edit_distance_verify": "SNM blocking (two-pass distributed rank + 8-way rank-explode equi-join) feeding a bounded char-DP: levenshtein on 64-char prefixes is O(64^2) per blocked pair, total O(n x window).",
    "cube_priority_status_volume": "Expand x4 (the grouping sets) into ONE hash aggregate with map-side partials on low-cardinality keys; cents are exact integers so every margin equals the sum of its children.",
    "length_quality_kendall": "Kendall tau-b: zero-shuffle scoring scan, one (length, quality-percent) keyed count, a dense value-domain-bounded grid (<= |lengths| x 101, the HLL-grid class), 2D prefix sums as two windows over grid rows, then a moment row — concordance counting without any pair join.",
    "text_kneser_ney_nll": "KN-smoothed scoring: four map-side-combined counts off ONE bigram explode, 1-row type-count broadcast, per-bigram probability as an exact rational with a single per-row ln micro-rounded BEFORE the per-doc sum; all joins bigram/word-keyed.",
    "multimodal_decoded_parity": "Real-codec round-trip: ONE Arrow mapInPandas stage fused over the pruned (doc_id, text) scan — encode, stdlib decode (zlib inflate + PNG filter reconstruction, wave PCM), aHash and round-trip booleans all inside it; no shuffle at all.",
    "cdc_schema_drift_audit": "Wire-decode drift audit: to_json/from_json fused into one scan with a Generate barrier so the JSON parses ONCE per row (projection collapse would re-inline it per subfield — measured 2x); one map-side-combined aggregate on the tiny drift-signature key.",
    "dedup_winnowing_incremental": "Per-batch winnowing: the persisted fingerprint layer explodes once; df cutoff computed over the UNION universe; the b side filters to the delta BEFORE the h-keyed equi-join, so per-batch cost is O(delta fingerprints + collisions), corpus x corpus never re-pairs.",
    "k_anonymity_audit": "Re-identification audit: ONE map-side-combined aggregate on the bounded QI space (nations x balance buckets); count(DISTINCT) expands over the 5-value segment domain; the risky-group filter runs on grouped rows only.",
    "orders_column_profile": "Column profiler: one unpivot explode (columns x rows, single scan), one map-side-combined (column, value) histogram, per-column aggregates over histogram rows; entropy terms micro-round per histogram row before the sum; top value via one bounded window.",
    "event_volume_cusum": "CUSUM change-point: one (type, day) rollup (map-side combined) feeds windows over the bounded day domain (<=31 rows/type); the statistic clears to prefix*D - k*T so NO division exists in the plan and every tie-break is explicit.",
    "zorder_overlap_depth": "Read-amplification audit composed ON TOP of the layout query: files -> +-1 boundary events, net delta per position (coincident open/close order-unambiguous), one running-sum window over <=2*n_files bounded rows per (layout, dim) — the corpus is scanned exactly once, by the layout stage underneath.",
    "value_location_friedman": "Blocked repeated-measures test: one (user, type) map-side aggregate, per-user windows over k<=handful rows (ONE user-keyed shuffle shared by the complete-block filter and the ranking), a k-row type table, two 1-row scalars; the tie-general statistic clears COMPLETELY to integers on doubled ranks — no rounding anywhere in the plan.",
    "value_cochran_q": "Blocked binary-rate test: one (user, type) map-side aggregate with the milli-grid threshold deciding the outcome inside codegen, two keyed rollups (k-row columns, user-row rows, both map-side combined), 1-row scalars; numerator and denominator are exact integers.",
    "theilsen_daily_trend": "Robust trend slope: corpus -> bounded daily grid in ONE map-side-combined aggregate; the O(days^2) pair enumeration is an audited BNLJ whose build side IS the grid; lower-median selection by row_number on the bounded pair set — no percentile interpolation, no corpus-proportional stage past the first aggregate.",
    "volume_ljung_box": "Portmanteau autocorrelation test: the lag join b.rn = a.rn + k extracts as an EQUI key (hash join, plan-pinned) — only the 5-row lag grid nested-loops; r_k^2 and Q live on the integer micro grid with non-negative floor-divisions only, decided against the chi-square(5) literal.",
    "dedup_minhash_oph": "One-permutation hashing: ONE md5 per shingle row (16x less hash arithmetic than classic minhash — the scale point), (doc, nibble-bucket) min-aggregate <= 16 rows/doc, candidates meet on (bucket, min) equality, exact-Jaccard verification reuses the shared gram layer via doc-keyed joins.",
    "orders_fd_audit": "Constraint verification: each FD arm is one determinant-keyed map-side-combined aggregate (count distinct dependent) + a 1-row rollup; the four arms union bounded rows — at 100 TB each arm is exactly one shuffle keyed on its determinant.",
    "event_ewma_anomaly": "Exact EWMA: 10 fixed lag() projections over one bounded-grid window (never a 2^t positional power), partial-window denominator = sum of weights present; spike/dip are integer cross-multiplied compares — zero joins in the plan.",
    "sample_poisson_bootstrap": "Poisson bootstrap: 16 replicates in ONE scan — the replicate grid broadcasts (16-row BNLJ), weights are per-row hash-CDF projections inside codegen, one map-side-combined per-replicate aggregate, 1-row summary broadcasts. No data replication anywhere.",
    "source_token_js": "JS drift: one doc_id-keyed join, one (source, tok) map-side count, vocab-bounded margin joins; per-token ln runs on exact integer ratios and micro-rounds BEFORE the HUGEINT weighted sums; the unseen-token arm contributes at the single ln(2) literal via an anti-join on the vocab grid.",
    "cohort_revenue_ltv": "Cohort LTV: custkey-keyed min-aggregate for the cohort month, custkey-keyed fact join, cumulative window PARTITIONED BY COHORT (<= months rows each — bounded partitions, never a global sort), cohort-size broadcast closes the per-customer curve.",
    "funnel_latency_quantiles": "Latency quantiles as ORDER STATISTICS: user-keyed min-aggregates, one user-keyed join, then a value-domain-bounded latency histogram; the cumulative window and the 4-rank probe join (bounded BNLJ) run on histogram rows only — no percentile interpolation, no global sort of raw latencies.",
    "customer_order_rank_suite": "rank/percent_rank/cume_dist/ntile fused into ONE Window operator: a single hash shuffle on o_custkey, per-partition sorts bounded by orders-per-customer, zero joins; the micro-grid recomputation keeps the parity contract integer-exact.",
    "event_transition_matrix": "Markov transitions: ONE user-keyed lead() window (the shared sequence partitioning) into a |types|^2-bounded cell table; margins, probabilities, and the per-row argmax all run on bounded rows.",
    "orders_interarrival_stats": "Purchase cadence: one custkey-keyed lag() window, then a gap-day histogram (value-domain-bounded) with cumulative window + 4-rank probe — quantiles as order statistics, never percentile interpolation or a global sort of raw gaps.",
    "vocab_oov_rate": "OOV audit: token counts combine map-side; the top-K vocab is a deterministic bounded window and BROADCASTS into one membership join; per-source rollup is |sources|-bounded.",
    "vocab_heaps_law": "Heaps growth without rescans: one (tok, min-doc) aggregate + one bucketed occurrence count (both map-side combined), decile bucketing off a 1-row max-id broadcast, cumulative sums over the 10-row grid, OLS beta as integer cross-products.",
    "token_burstiness": "Zero-inflated Fano factor from occurrence rows only: (doc, tok) count, tok-keyed moment rollup, 1-row doc-count broadcast, TakeOrdered top-20 — no zero-row materialization for the n_docs x vocab grid.",
    "supplier_acctbal_outlier_fences": "Tukey fences per nation: (nation, cents) histogram with per-nation cum windows, quartile rank probes as integer compares, fences on the x2 grid joined back |nations|-bounded; raw supplier rows are scanned once.",
    "dedup_transitivity_audit": "Clustering coefficient of the verified pair graph: wedge join keyed on the center doc (degree^2-bounded by LSH collision structure), closure via one keyed join back to pairs, three 1-row counts broadcast — shares the persisted shingle/band layers.",
    "user_bot_regularity": "Bot cadence: one user-keyed lag window (the shared sequence shuffle) + one user-keyed moment aggregate; CV^2 and the flag are integer expressions inside codegen; no joins.",
    "value_levene_brownforsythe": "Brown-Forsythe spread test: (group, milli-value) histogram combines map-side on the bounded domain; medians from per-group windows over histogram rows; one keyed join back for |x-med|; F assembled from a 3-row aggregate in cleared integer form. No pair joins, no raw-row windows.",
    "customer_churn_hazard": "Nelson-Aalen with censoring: one custkey lag window (the interarrival shuffle), two bounded duration histograms (events + censored open gaps), risk sets from one cumulative window on the bounded grid, per-day hazard as integer division. Never a (customer x day) expansion.",
    "user_type_entropy": "Type entropy: (user, type) count then user rollup, both map-side combined; one ln per (user, type) of an exact integer ratio, micro-rounded before the weighted sum; flag is pure codegen arithmetic. Two shuffles on user_id total.",
    "orders_daily_autocorr": "Signed ACF lags 1..7: daily aggregate (map-side combined), deviations cleared to integers, C_k via the rn+k HASH equi-join on the bounded grid crossed with the broadcast 7-row lag table, Bartlett gate in squared cleared form. Everything after the first aggregate is grid-bounded.",
    "quality_filter_funnel": "Filter funnel: ONE scan computes every rule flag as integer predicates, ONE wide conditional aggregate yields all fail/exclusive/token counts in a single row, and a literal 6-row pivot lays out the funnel - no per-rule rescan anywhere.",
    "lm_dirichlet_ranking": "Dirichlet QL ranking: tf/dl/cf off the shared occurrence layer; the 5-term table broadcasts into the tf filter-join so only matching postings shuffle; one per-term top-10 window over the filtered slice; the ln runs once per (doc, term) on an exact integer ratio.",
    "gram_novelty_curve": "Novelty curve: bucket assignment is pure doc_id arithmetic off a 1-row max broadcast; first-occurrence via a gram-keyed min aggregate on the shared persisted 8-gram layer; everything downstream lives on the 10-row grid. No first-occurrence global rank, no rescan.",
    "packing_waste_curve": "Packing waste: one scan of doc lengths crossed with the broadcast 5-row granularity grid (audited bounded-literal BNLJ), integer ceil per row inside codegen, one map-side-combined aggregate per granularity.",
    "dedup_minhash_calibration": "Estimator calibration: candidates from the persisted band table's bucket self-join (never all-pairs), signature agreement via doc-keyed joins of the 16-hash rows, exact Jaccard from the persisted shingle layer on the bounded candidate set, final 17-row-max aggregate.",
    "orders_pareto_concentration": "Lorenz points: custkey cents aggregate (map-side combined), ONE customer-cardinality rank window, 1-row totals + 4-row literal percent grid broadcast; conditional sums close it. At 1e9 customers swap the window for the two-pass distributed rank (documented).",
    "split_kfold_plan": "Leakage-safe folds: the collision-bounded cluster table left-joins the doc dim on doc_id; fold is per-row md5-prefix arithmetic. No shuffles beyond the composed member's own.",
    "text_mattr": "MATTR: sliding windows live INSIDE each row's token array (transform over sequence + slice + array_distinct) - scan -> project -> output, zero exchanges; cost O(len*W) per row inside codegen's Generate.",
    "orders_abc_classification": "ABC classes: part-keyed cents aggregate, ONE part-cardinality rank/cumsum window, 1-row total broadcast; class is per-row integer arithmetic. Two-pass distributed rank documented for 1e9+ parts.",
    "embedding_label_separation": "Label separation: (label x dim) nano-sum aggregate, broadcast centroid join back for member cosines (one scan), |labels|^2 centroid grid with != condition - never a vector-pair join.",
    "benchmark_coverage_report": "Coverage: benchmark slice filters the shared gram layer (tiny side), corpus distinct grams meet it on the gram key - inverted-index economics identical to the contamination sweep, one doc-keyed rollup.",
    "dedup_shingle_df_profile": "DF profile: one (shingle)-keyed map-side-combined count off the shared layer, ~32-row log2 bucket rollup, 1-row pair-volume broadcast. The cheapest view of the family's worst-case join cost.",
    "event_hour_dow_heatmap": "Heatmap: one map-side-combined aggregate onto <=168 cells; chi-square and intensity are grid arithmetic plus 1-row broadcasts.",
    "purchase_asof_after_error": "Forward as-of as union + DESC window with last(ignorenulls): one exchange on user_id, per-partition sort, NO range-condition BNLJ - the mirror of clicks_asof_errors.",
    "priority_mix_monthly_drift": "Mix drift: one (month, priority) map-side-combined aggregate; the 5-row priority margin and 1-row total broadcast into the bounded month grid; chi-square terms are cleared integer arithmetic.",
    "dedup_oph_calibration": "OPH calibration: same collision equi-join + keyed verification joins as dedup_minhash_oph minus the threshold filter; <=17-row final rollup; never all-pairs.",
    "source_hapax_profile": "Hapax: token-keyed corpus count + (source, token)-keyed local count off the shared occurrence layer, token-keyed join onto the smaller local aggregate, ~sources-row rollup.",
    "supplier_nation_hhi": "HHI: broadcast supplier dim into lineitem, (nation, supplier) map-side-combined cents aggregate, <=25-row nation rollup with DECIMAL(38) squared-share arithmetic, broadcast name join.",
    "cdc_tombstone_retention": "Tombstones: ONE exchange on the table key feeds both the DESC row_number and the lead() window (shared sort), key-bounded rollup, 1-row watermark/span broadcast.",
    "dedup_quality_interaction": "Dup x quality: near-dup cluster member (shared band layers) LEFT-joined doc-keyed onto the quality member, <=15-cell rollup - both members run once.",
    "token_budget_frontier": "Frontier: the curriculum two-pass token cumsum (range-bucket windows + broadcast <=245-row offsets), broadcast 5-row budget grid, conditional aggregation so every budget emits.",
    "ann_pq_distortion_by_cluster": "PQ distortion: encode and coarse assignment are zero-shuffle literal-codebook projections off the memoized layers; one vec-keyed d2 aggregate; <=k-row rollup.",
    "dedup_mixture_shift": "Mixture shift: exact + cluster members joined doc-keyed, one source rollup, 1-row before/after totals broadcast; shares floored before the signed difference.",
    "dedup_simhash_calibration": "SimHash calibration: occurrence-layer 32-sum simhash aggregate, byte-band bucket self-join (collision volume ~ sum bucket^2 - dense on this closed-vocab corpus, measured), exact hamming counts + stratified Jaccard verification (full at h<=3, deterministic 1/16 sample above).",
    "contamination_by_source": "Contamination attribution: one doc-keyed LEFT join of the corpus projection onto the member's matched set, source rollup; benchmark split excluded from denominators.",
    "split_temporal_leakage": "Temporal leakage: 1-row span + 3-row cut grid broadcast, ONE (cut, user) map-side-combined aggregate, 3-row rollup; events never self-join.",
    "event_markov_nll": "Markov NLL: one user-keyed window builds transitions, |types|^2-bounded train counts broadcast, per-transition log micro-rounds before the per-state integer sums.",
    "text_jm_lambda_grid": "JM grid: vocab-bounded train counts broadcast into the held bigrams, 5-row lambda grid fanout, 5-row rollup + rank window; logs micro-round before sums.",
    # round-12
    "event_session_gap_curve": "Gap curve: ONE user-keyed lag window yields the gap multiset; sessions(T) = n_users + breaks per 6-row broadcast grid — the sessionization operator never re-runs per threshold.",
    "cdc_erasure_roundtrip": "Erasure round-trip: one key-partitioned window shared by all three derived stores; the purgable set is key-bounded + broadcast; per store one anti-join (the purge) + one semi-join (the residual re-scan).",
    "doc_nll_outlier_fences": "NLL fences: the registered unigram-NLL member runs off the shared occurrence layer; quartiles from a per-source cumulative histogram (one exchange feeds both windows), doubled-IQR integer fences, bounded rollup.",
    "pack_efficiency_audit": "Pack audit: registered FFD + next-fit members plus three 1-row strategy aggregates; the members' cost dominates, the audit adds bounded rollups only.",
    "ann_probe_recall_curve": "Probe curve: memoized literal centroids (zero new training); 10x8 query-centroid broadcast product ranks probes; candidate scoring stays cluster-keyed; streamed corpus side repartitioned (the one-scan-partition BNLJ lesson).",
    "embedding_intrinsic_dim": "TwoNN: labeled all-pairs exact 2-NN baseline (ID is a sampled statistic at scale); ln(mu) micro-rounds before the integer sum; streamed side repartitioned (46.6 s -> 2.5 s at sf0.1).",
    "retrieval_rank_agreement": "Rank agreement: both registered rankers off the shared tf layers; the composed join is (tok, doc_id)-keyed and the Kendall pair rollup is bounded by construction (<= 45 pairs/term).",
    "lang_source_association": "Lang x source V^2: one (lang, source) map-side-combined aggregate; margins grid COMPLETED (r x c cross of two bounded aggregates) so empty cells keep their chi2 mass; single-N cleared form.",
    "cdc_apply_idempotence": "Idempotence audit: the registered apply fold composed with itself (key-bounded both times) + a symmetric exceptAll diff against a literal-zero oracle column; change summaries combine map-side.",
}


def main() -> None:
    spark = get_spark(app_name="plans-doc")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    out = io.StringIO()
    out.write(
        """# PLANS — physical-plan evidence for the headline operators

Generated by `python scripts/gen_plans.py` (re-run after plan-affecting
changes). Each section: what the plan MUST look like to survive 100 TB, then
the actual `explain("formatted")` output at sf0.01. The properties below are
additionally pinned as regressions in `tests/test_plans.py`.
"""
    )
    for name, note in NOTES.items():
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out.write(f"\n## {name}\n\n{note}\n\n```\n{plan.strip()}\n```\n")
    open("PLANS.md", "w").write(out.getvalue())


if __name__ == "__main__":
    main()
