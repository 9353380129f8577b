"""Round-11 fixes and operators: the chi2 heatmap positive control (r10
ADVICE high), the forward-asof duplicate-timestamp determinism control
(r10 ADVICE low), and planted fixtures for the round's new operators."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

import postgres_cdc_example_spark.queries as q
from postgres_cdc_example_spark.queries import REGISTRY

q.queries()  # populate REGISTRY


def _stage_single_parquet(spark_df, tmp_path, mini, table, stage_name):
    stage = str(tmp_path / stage_name)
    spark_df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    os.replace(os.path.join(stage, part), mini / f"{table}.parquet")


def _mini(sf_dir, tmp_path, name):
    mini = tmp_path / name
    mini.mkdir()
    for fname in os.listdir(sf_dir):
        shutil.copy(os.path.join(sf_dir, fname), mini / fname)
    return mini


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def test_heatmap_chi2_rejects_planted_hotspot(spark, sf_dir, tmp_path):
    """POSITIVE control for the r10 ADVICE high (the per-cell floor +
    double /n scaling bounded chi2_micro below the critical value, so
    reject_uniform could NEVER fire): a complete 168-cell grid with 5
    events per cell plus 2000 extra on one cell must reject uniformity;
    the exactly-uniform grid must not (chi2 == 0). Both engines agree on
    both planted corpora."""
    from tests.oracle_utils import compare_to_oracle

    e = REGISTRY["event_hour_dow_heatmap"]
    # 2024-03-04 is a Monday: days 4..10 cover ISO dow 1..7
    for planted, name in ((True, "sf_hot"), (False, "sf_uni")):
        mini = _mini(sf_dir, tmp_path, name)
        rows, eid = [], 0
        for day in range(4, 11):
            for hr in range(24):
                n = 5 + (2000 if planted and day == 5 and hr == 3 else 0)
                for _ in range(n):
                    eid += 1
                    rows.append(
                        (eid, f"2024-03-{day:02d} {hr:02d}:30:00", 1, "view",
                         1.0, "{}")
                    )
        _stage_single_parquet(
            _events_df(spark, rows), tmp_path, mini, "events", name + "_st"
        )
        compare_to_oracle(spark, str(mini), e.fn, e.oracle)
        got = e.fn(spark, str(mini)).collect()
        assert len(got) == 168
        verdicts = {r.reject_uniform for r in got}
        chi2 = got[0].chi2_micro
        if planted:
            assert verdicts == {1}, f"planted hotspot must reject (chi2={chi2})"
            # Tuesday 03:00 carries ~70% of all traffic
            hot = next(r for r in got if r.dow == 2 and r.hr == 3)
            assert hot.n_events == 2005 and hot.intensity_micro > 50_000_000
        else:
            assert verdicts == {0}, f"uniform grid must not reject (chi2={chi2})"
            assert chi2 == 0  # exactly uniform: every c*k == n


def test_forward_asof_duplicate_ts_purchases_deterministic(
    spark, sf_dir, tmp_path
):
    """r10 ADVICE low: purchases sharing (user_id, ts) made the DuckDB
    ASOF oracle nondeterministic while the engine always keeps min
    event_id. Plant exact-timestamp duplicate purchases with DIFFERENT
    values and assert both engines now agree, and that the matched value
    is the min-event_id purchase's."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_asof_dup")
    rows = [
        # user 1: error at 10:00; THREE purchases at the identical 11:00
        (100, "2024-03-01 10:00:00", 1, "error", 1.0, "{}"),
        (103, "2024-03-01 11:00:00", 1, "purchase", 333.0, "{}"),
        (101, "2024-03-01 11:00:00", 1, "purchase", 111.0, "{}"),
        (102, "2024-03-01 11:00:00", 1, "purchase", 222.0, "{}"),
        # user 2: duplicates at the error's OWN timestamp (<= bound)
        (200, "2024-03-02 09:00:00", 2, "error", 1.0, "{}"),
        (202, "2024-03-02 09:00:00", 2, "purchase", 77.0, "{}"),
        (201, "2024-03-02 09:00:00", 2, "purchase", 55.0, "{}"),
        # user 3: no purchase after the error (left-join NULL arm)
        (300, "2024-03-03 12:00:00", 3, "error", 1.0, "{}"),
        (301, "2024-03-03 11:00:00", 3, "purchase", 9.0, "{}"),
    ]
    _stage_single_parquet(
        _events_df(spark, rows), tmp_path, mini, "events", "asof_dup_st"
    )
    e = REGISTRY["purchase_asof_after_error"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.event_id: r for r in e.fn(spark, str(mini)).collect()}
    assert got[100].purchase_value == 111.0  # min event_id among ties
    assert got[100].recovery_us == 3_600_000_000
    assert got[200].purchase_value == 55.0 and got[200].recovery_us == 0
    assert got[300].purchase_ts is None and got[300].recovery_us is None


def test_oph_calibration_operating_point_consistency(spark, sf_dir):
    """The calibration table's threshold accounting must agree with the
    production `dedup_minhash_oph` output on the same corpus: the admitted
    ∧ true count across levels equals the pair query's row count (that
    query IS adaptive-threshold + exact-J >= 0.5), and the per-level
    counters nest (admitted_true <= min(admitted, true) <= n_pairs)."""
    rows = REGISTRY["dedup_oph_calibration"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_admitted <= r.n_pairs
        assert 0 <= r.n_true <= r.n_pairs
        assert r.n_admitted_true <= min(r.n_admitted, r.n_true)
        assert 0 <= r.min_jac_micro <= r.mean_jac_micro <= r.max_jac_micro
        assert r.mean_predicted_micro >= 0
    n_production = REGISTRY["dedup_minhash_oph"].fn(spark, sf_dir).count()
    assert sum(r.n_admitted_true for r in rows) == n_production
    # the curve must include sub-threshold noise the pair query never shows
    assert any(r.n_admitted == 0 and r.n_pairs > 0 for r in rows)


def test_hapax_profile_nesting_invariants(spark, sf_dir, tmp_path):
    """Counter nesting per source: a corpus-wide hapax occurrence is
    necessarily a local hapax, locals are distinct tokens, distincts are
    occurrences; shares are consistent with the counts. The synthetic
    corpus draws from a closed vocabulary (zero natural corpus hapaxes —
    itself asserted), so corpus-hapax coverage comes from a PLANTED doc
    carrying nonce tokens: they must surface as exactly its source's
    corpus-hapax count, in both engines."""
    from tests.oracle_utils import compare_to_oracle

    rows = REGISTRY["source_hapax_profile"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            0
            <= r.n_corpus_hapax
            <= r.n_local_hapax
            <= r.n_distinct
            <= r.n_occurrences
        )
        assert r.corpus_hapax_micro == r.n_corpus_hapax * 1_000_000 // r.n_distinct
        assert r.local_hapax_micro == r.n_local_hapax * 1_000_000 // r.n_distinct
    assert all(r.n_corpus_hapax == 0 for r in rows), "closed-vocab fixture"
    assert any(r.n_local_hapax > 0 for r in rows)

    mini = _mini(sf_dir, tmp_path, "sf_hapax")
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    extra = spark.createDataFrame(
        [(800_001, "zqxv wqzk zqxv pflm", "en", "noncesrc", 19)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _stage_single_parquet(
        base.unionByName(extra), tmp_path, mini, "documents", "hapax_st"
    )
    e = REGISTRY["source_hapax_profile"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.source: r for r in e.fn(spark, str(mini)).collect()}
    # wqzk/pflm occur once corpus-wide; zqxv twice (local but not corpus)
    assert got["noncesrc"].n_corpus_hapax == 2
    assert got["noncesrc"].n_local_hapax == 2
    assert got["noncesrc"].n_distinct == 3


def test_hhi_bounds_and_two_supplier_geometry(spark, sf_dir):
    """HHI sits in [1e6/n, 1e6]; the top share bounds it from both sides
    (top² ≤ HHI ≤ top·1e6); the effective-supplier inverse is consistent."""
    rows = REGISTRY["supplier_nation_hhi"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1_000_000 // r.n_suppliers <= r.hhi_micro <= 1_000_000
        # sum of squared shares is at least the top share squared and at
        # most top_share * 1 (all mass at-or-below the top share)
        assert r.hhi_micro >= r.top_share_micro**2 // 1_000_000
        assert r.hhi_micro <= r.top_share_micro + r.n_suppliers  # + floor slack
        assert r.effective_suppliers_milli == 1_000_000_000 // r.hhi_micro
        assert 1_000 <= r.effective_suppliers_milli <= r.n_suppliers * 1000 + 1000


def test_tombstone_retention_planted_lifecycle(spark, sf_dir, tmp_path):
    """Planted change log exercising every verdict arm: key 1 deleted at
    10% of the span (old tombstone -> purgable 1), key 2 deleted at the
    watermark (fresh tombstone -> purgable 0), key 3 deleted then
    re-inserted (live -> NULL verdict, the delete counted superseded).
    Both engines agree on the planted corpus."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_tomb")
    # _changes maps: signup->I, error->D, else U; key = event_id % 120.
    # event_ids chosen so ids mod 120 give keys 1, 2, 3; span = 100 days.
    rows = [
        # key 1: insert day 0, delete day 10 -> tombstone age 90d > 1d line
        (1, "2024-01-01 00:00:00", 7, "signup", 1.0, "{}"),
        (121, "2024-01-11 00:00:00", 7, "error", 1.0, "{}"),
        # key 2: insert day 0, delete at the very watermark (age 0)
        (2, "2024-01-01 00:00:00", 8, "signup", 1.0, "{}"),
        (242, "2024-04-10 00:00:00", 8, "error", 1.0, "{}"),
        # key 3: delete day 20, re-insert day 30 -> live, superseded delete
        (3, "2024-01-01 00:00:00", 9, "signup", 1.0, "{}"),
        (123, "2024-01-21 00:00:00", 9, "error", 1.0, "{}"),
        (243, "2024-01-31 00:00:00", 9, "signup", 1.0, "{}"),
    ]
    _stage_single_parquet(
        _events_df(spark, rows), tmp_path, mini, "events", "tomb_st"
    )
    e = REGISTRY["cdc_tombstone_retention"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.id: r for r in e.fn(spark, str(mini)).collect()}
    assert got[1].final_action == "D" and got[1].purgable == 1
    assert got[2].final_action == "D" and got[2].purgable == 0
    assert got[2].tombstone_age_us == 0
    assert got[3].final_action == "I" and got[3].purgable is None
    assert got[3].n_superseded == 1 and got[3].n_deletes == 1
    assert got[1].n_superseded == 0  # terminal delete, nothing after it


def test_dup_quality_interaction_partitions_corpus(spark, sf_dir):
    """The cross-tab partitions the corpus exactly (every doc in exactly
    one (class, bucket) cell), keeper count equals the number of near-dup
    components, and all three classes appear on the fixture."""
    rows = REGISTRY["dedup_quality_interaction"].fn(spark, sf_dir).collect()
    docs_total = REGISTRY["text_quality"].fn(spark, sf_dir).count()
    assert sum(r.n_docs for r in rows) == docs_total
    classes = {r.dup_class for r in rows}
    assert classes == {"unique", "keeper", "duplicate"}
    n_keepers = sum(r.n_docs for r in rows if r.dup_class == "keeper")
    comp = (
        REGISTRY["dedup_clusters"]
        .fn(spark, sf_dir)
        .select("component")
        .distinct()
        .count()
    )
    assert n_keepers == comp
    for r in rows:
        assert 0 <= r.q_bucket <= 4
        assert 0 <= r.mean_quality_micro <= 1_000_000


def test_token_budget_frontier_monotone_curve(spark, sf_dir):
    """All budgets emit rows; the curve is monotone (bigger budget ->
    more docs/tokens, never-better marginal quality) and each budget
    respects its token ceiling."""
    rows = sorted(
        REGISTRY["token_budget_frontier"].fn(spark, sf_dir).collect(),
        key=lambda r: r.budget_pct,
    )
    assert [r.budget_pct for r in rows] == [1, 5, 10, 25, 50]
    for r in rows:
        assert r.n_tokens <= r.budget_tokens
        if r.n_docs == 0:
            assert r.mean_quality_micro is None
            assert r.frontier_quality_micro is None
    filled = [r for r in rows if r.n_docs > 0]
    assert filled, "fixture must fill at least one budget"
    for a, b in zip(filled, filled[1:]):
        assert a.n_docs <= b.n_docs and a.n_tokens <= b.n_tokens
        assert a.mean_quality_micro >= b.mean_quality_micro
        assert a.frontier_quality_micro >= b.frontier_quality_micro
        assert a.n_sources <= b.n_sources


def test_pq_distortion_covers_corpus_and_is_nontrivial(spark, sf_dir):
    """Every vector lands in exactly one cluster row; distortion is
    positive (the codebook is lossy) and mean <= max per cluster."""
    from postgres_cdc_example_spark.sources.tables import load_table

    rows = REGISTRY["ann_pq_distortion_by_cluster"].fn(spark, sf_dir).collect()
    n_vecs = load_table(spark, "embeddings", sf_dir).count()
    assert sum(r.n_vectors for r in rows) == n_vecs
    for r in rows:
        assert 0 < r.mean_distortion <= r.max_distortion
        assert r.mean_distortion == r.total_distortion // r.n_vectors


def test_mixture_shift_flags_planted_dup_heavy_source(spark, sf_dir, tmp_path):
    """POSITIVE control: a planted 'mirror' source that is 30 exact
    copies of one document must lose nearly all its token share under
    the keeper rule (flag 1, negative shift), while the survivors' shares
    rise; shares stay a partition of ~1e6 on both sides. Both engines
    agree on the planted corpus."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_mix_shift")
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    text = base.orderBy("doc_id").first().text
    extra = spark.createDataFrame(
        [
            (800_000 + i, text, "en", "mirror", len(text))
            for i in range(30)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _stage_single_parquet(
        base.unionByName(extra), tmp_path, mini, "documents", "mixsh_st"
    )
    e = REGISTRY["dedup_mixture_shift"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.source: r for r in e.fn(spark, str(mini)).collect()}
    m = got["mirror"]
    assert m.shift_flag == 1 and m.shift_micro < 0
    # the 30 copies collapse to at most one kept mirror doc's tokens
    assert m.tokens_after <= m.tokens_before // 30 + m.tokens_before % 30
    assert sum(r.shift_flag for r in got.values()) >= 1
    for side in ("share_before_micro", "share_after_micro"):
        s = sum(getattr(r, side) for r in got.values())
        assert 1_000_000 - len(got) <= s <= 1_000_000


def test_simhash_calibration_curve_shape(spark, sf_dir):
    """Calibration invariants: hamming levels stay in [0, 32]; the full
    stratum (h <= 3) verifies every pair while higher levels carry the
    deterministic sample; true pairs concentrate at low hamming; the
    fixture produces both true pairs and noise."""
    from postgres_cdc_example_spark.queries.extensions import (
        SIMHASH_CAL_FULL_H,
    )

    rows = sorted(
        REGISTRY["dedup_simhash_calibration"].fn(spark, sf_dir).collect(),
        key=lambda r: r.hamming,
    )
    assert rows
    for r in rows:
        assert 0 <= r.hamming <= 32
        assert 0 <= r.n_true_sampled <= r.n_verified <= r.n_pairs
        if r.hamming <= SIMHASH_CAL_FULL_H:
            assert r.n_verified == r.n_pairs, "full stratum verifies all"
        if r.n_verified:
            assert 0 <= r.min_jac_micro <= r.mean_jac_micro <= r.max_jac_micro
        else:
            assert r.mean_jac_micro is None
    assert any(r.n_true_sampled > 0 for r in rows), "fixture has near-dups"
    assert any(
        r.n_true_sampled == 0 and r.n_pairs > 0 for r in rows
    ), "and noise"
    top_true = max(r.hamming for r in rows if r.n_true_sampled > 0)
    assert top_true <= 4, "true pairs must sit at low hamming on this corpus"


def test_contamination_by_source_reconciles_with_member(spark, sf_dir):
    """The per-source rollup must reconcile exactly with the registered
    member (same matched-doc set) and the corpus excluding the benchmark
    split; rates are consistent with the counts."""
    from postgres_cdc_example_spark.queries.llmdata import BENCH_MOD
    from postgres_cdc_example_spark.sources.tables import load_table

    rows = REGISTRY["contamination_by_source"].fn(spark, sf_dir).collect()
    n_corpus = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") % BENCH_MOD != 0)
        .count()
    )
    n_contam = REGISTRY["benchmark_contamination"].fn(spark, sf_dir).count()
    assert sum(r.n_docs for r in rows) == n_corpus
    assert sum(r.n_contaminated for r in rows) == n_contam
    for r in rows:
        assert r.doc_rate_micro == r.n_contaminated * 1_000_000 // r.n_docs
        assert (
            r.token_rate_micro
            == r.contaminated_tokens * 1_000_000 // r.total_tokens
        )


def test_temporal_leakage_planted_disjoint_eras(spark, sf_dir, tmp_path):
    """NEGATIVE control: users split into disjoint eras (1-5 only before
    mid-span, 6-10 only after) must show ZERO user leakage at the 50% cut
    while a straddling user makes the 25% cut leak; both engines agree."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_leak")
    rows, eid = [], 0
    # era 1: users 1-5, days 1-9; era 2: users 6-10, days 12-20
    for day in range(1, 10):
        for u in range(1, 6):
            eid += 1
            rows.append((eid, f"2024-03-{day:02d} 10:00:00", u, "view", 1.0, "{}"))
    for day in range(12, 21):
        for u in range(6, 11):
            eid += 1
            rows.append((eid, f"2024-03-{day:02d} 10:00:00", u, "view", 1.0, "{}"))
    # one straddler active on both sides of the 25% cut (day ~5.75) but
    # wholly inside era 1, so the 50% cut stays clean
    eid += 1
    rows.append((eid, "2024-03-02 10:00:00", 99, "view", 1.0, "{}"))
    eid += 1
    rows.append((eid, "2024-03-08 10:00:00", 99, "view", 1.0, "{}"))
    _stage_single_parquet(
        _events_df(spark, rows), tmp_path, mini, "events", "leak_st"
    )
    e = REGISTRY["split_temporal_leakage"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.cut_pct: r for r in e.fn(spark, str(mini)).collect()}
    assert got[50].n_users_both == 0 and got[50].user_leakage_micro == 0
    assert got[50].test_events_seen_user_micro == 0
    assert got[25].n_users_both >= 1 and got[25].user_leakage_micro > 0


def test_benford_verdict_both_arms(spark, sf_dir, tmp_path):
    """r11: the Benford audit gained a chi2 significance verdict. TPC-H's
    uniform price generator violates Benford, so the stock fixture is the
    positive control (reject 1). NEGATIVE control: a planted order table
    whose first-digit counts follow Benford's law exactly (round(n*p_d)
    orders at price d*100) must NOT reject. Both engines agree on both."""
    from tests.oracle_utils import compare_to_oracle

    e = REGISTRY["orders_benford_audit"]
    stock = e.fn(spark, sf_dir).collect()
    assert stock[0].reject_benford == 1, "uniform TPC-H prices violate Benford"

    from postgres_cdc_example_spark.queries.relational import _BENFORD_MICRO

    mini = _mini(sf_dir, tmp_path, "sf_benford")
    n = 5000
    rows, ok = [], 0
    for d, p in _BENFORD_MICRO.items():
        for _ in range(round(n * p / 1_000_000)):
            ok += 1
            rows.append(
                (ok, 1 + ok % 50, "O", float(d * 100), "2024-03-01 00:00:00",
                 "3-MEDIUM")
            )
    odf = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate_s string, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    )
    _stage_single_parquet(odf, tmp_path, mini, "orders", "benford_st")
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = e.fn(spark, str(mini)).collect()
    assert got[0].reject_benford == 0, f"Benford-exact corpus must accept"
    assert got[0].chi2_micro < 1_000_000  # chi2 < 1 on the exact-fit corpus


def test_markov_nll_planted_seen_vs_unseen_transitions(spark, sf_dir, tmp_path):
    """Planted control: train half teaches view<->purchase alternation;
    the test half replays it for one user (seen transitions, low NLL) and
    plays a never-trained error<->signup alternation for another (unseen
    history -> uniform-smoothed, high NLL). The per-state table must rank
    them accordingly, and both engines agree."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_markov")
    rows, eid = [], 0
    # train: days 1-5, user 1 alternates view/purchase (40 events)
    for i in range(40):
        eid += 1
        day = 1 + i // 10
        t = "view" if i % 2 == 0 else "purchase"
        rows.append((eid, f"2024-03-0{day} {i % 10:02d}:10:00", 1, t, 1.0, "{}"))
    # test: days 8-9 (past the 50% cut of the 1..9 span)
    for i in range(6):
        eid += 1
        t = "view" if i % 2 == 0 else "purchase"
        rows.append((eid, f"2024-03-08 {i:02d}:00:00", 2, t, 1.0, "{}"))
    for i in range(6):
        eid += 1
        t = "error" if i % 2 == 0 else "signup"
        rows.append((eid, f"2024-03-09 {i:02d}:00:00", 3, t, 1.0, "{}"))
    _stage_single_parquet(
        _events_df(spark, rows), tmp_path, mini, "events", "markov_st"
    )
    e = REGISTRY["event_markov_nll"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.prev_type: r for r in e.fn(spark, str(mini)).collect()}
    assert got["view"].mean_nll_micro < got["error"].mean_nll_micro
    # seen alternation: ln((20+4)/(20+1)) ~ 0.1335; unseen state: ln 4
    assert got["view"].mean_nll_micro < 200_000
    assert got["error"].mean_nll_micro == got["signup"].mean_nll_micro
    assert abs(got["error"].mean_nll_micro - 1_386_294) < 2


def test_jm_lambda_grid_selects_interior_minimum(spark, sf_dir):
    """Grid invariants: all five lambdas emit with identical held-out
    bigram counts; exactly one is_best and it attains the minimum mean
    NLL; the curve is non-degenerate (not all equal)."""
    rows = sorted(
        REGISTRY["text_jm_lambda_grid"].fn(spark, sf_dir).collect(),
        key=lambda r: r.lambda_micro,
    )
    assert [r.lambda_micro for r in rows] == [
        100000, 300000, 500000, 700000, 900000
    ]
    assert len({r.n_held_bigrams for r in rows}) == 1
    assert sum(r.is_best for r in rows) == 1
    best = next(r for r in rows if r.is_best)
    assert best.mean_nll_micro == min(r.mean_nll_micro for r in rows)
    assert len({r.mean_nll_micro for r in rows}) > 1
    for r in rows:
        assert r.mean_nll_micro > 0
        assert r.nll_micro_sum >= r.mean_nll_micro * r.n_held_bigrams


def test_heatmap_chi2_cleared_form_is_exact():
    """Hypothesis proof of the r11 chi2 clearing (the ADVICE-high fix):
    for any complete grid of counts, sum((c*k - n)^2) * 1e6 // (n*k)
    equals floor(chi2 * 1e6) computed with exact Fractions — the single
    division makes the integer form EXACT, not just close (the broken
    r10 per-cell form loses up to k units per cell and a factor n)."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(0, 10_000), min_size=2, max_size=168))
    def prove(counts):
        n = sum(counts)
        if n == 0:
            return
        k = len(counts)
        cleared = sum((c * k - n) ** 2 for c in counts) * 1_000_000 // (n * k)
        exact = Fraction(0)
        for c in counts:
            e = Fraction(n, k)
            exact += (Fraction(c) - e) ** 2 / e
        assert cleared == (exact * 1_000_000).__floor__()

    prove()


def test_benford_chi2_cleared_form_within_floor_budget():
    """Hypothesis proof of the Benford per-term clearing: each term
    (obs*1e6 - n*p)^2 // (n*p) floors away < 1 micro-unit, so the summed
    integer statistic sits within 9 micro-units BELOW the Fraction-exact
    chi2*1e6 (never above — floors only discard); with expectations on
    the micro grid the reference chi2 uses p_micro/1e6 itself."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from postgres_cdc_example_spark.queries.relational import _BENFORD_MICRO

    ps = list(_BENFORD_MICRO.values())

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(0, 100_000), min_size=9, max_size=9))
    def prove(obs):
        n = sum(obs)
        if n == 0:
            return
        cleared = sum(
            (o * 1_000_000 - n * p) ** 2 // (n * p) for o, p in zip(obs, ps)
        )
        exact = Fraction(0)
        for o, p in zip(obs, ps):
            e = Fraction(n * p, 1_000_000)
            exact += (Fraction(o) - e) ** 2 / e
        exact_micro = exact * 1_000_000
        assert Fraction(cleared) <= exact_micro
        assert exact_micro - cleared < 9

    prove()
