"""Round-10 operators: positive controls, planted fixtures, and invariants
for the spread test, churn hazard, type entropy, daily ACF, filter funnel,
Dirichlet ranking, gram novelty, packing waste, and minhash calibration."""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import functions as F

import postgres_cdc_example_spark.queries as q
from postgres_cdc_example_spark.queries import REGISTRY
from postgres_cdc_example_spark.sources.tables import load_table

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


def test_brownforsythe_detects_planted_unequal_spread(spark, sf_dir, tmp_path):
    """POSITIVE control: purchase values pinned to a constant (MAD 0),
    view/click values alternating far from their median (large MAD) must
    reject equal spread; the all-constant fixture must not. Both engines
    agree on the planted corpus."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_bf")
    rows = []
    eid = 0
    for i in range(300):
        rows.append((eid, "2024-03-01 10:00:00", 1, "purchase", 100.0, "{}"))
        eid += 1
    for i in range(300):
        v = 50.0 if i % 2 == 0 else 450.0
        rows.append((eid, "2024-03-01 11:00:00", 2, "view", v, "{}"))
        eid += 1
    for i in range(300):
        v = 10.0 if i % 2 == 0 else 900.0
        rows.append((eid, "2024-03-01 12:00:00", 3, "click", v, "{}"))
        eid += 1
    ev = spark.createDataFrame(
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
    _stage_single_parquet(ev, tmp_path, mini, "events", "bf_stage")
    e = REGISTRY["value_levene_brownforsythe"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    r = e.fn(spark, str(mini)).first()
    assert r.reject_equal_spread == 1
    assert r.mad_purchase_micro == 0  # constant group: zero deviation
    assert r.mad_click_micro > r.mad_view_micro > 0


def test_churn_hazard_hand_computed_fixture(spark, sf_dir, tmp_path):
    """Hand-checkable Nelson-Aalen: 3 customers, horizon = day 28 —
    A orders day 0, 10, 20 (gaps 10, 10; censored 28-20 = 8),
    B orders day 10, 25 (gap 15; censored 3),
    C orders day 28 only (censored 0, no event).
    Durations: events {10:2, 15:1}; censored {0, 3, 8}.
    Risk sets: at t=10, durations >= 10 -> {10, 10, 15} = 3;
    at t=15 -> {15} = 1. Hazards: 2/3, 1/1."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_churn")
    base = 10957  # 2000-01-01 in epoch days
    rows = []
    ok = 0
    for ck, days in ((1, [0, 10, 20]), (2, [10, 25]), (3, [28])):
        for d in days:
            ok += 1
            rows.append((ok, ck, "O", 100.0, f"day{d}", "1-URGENT"))
    odf = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_tag string, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.expr(
            "cast(date_add(date'2000-01-01',"
            " cast(substr(o_tag, 4) AS INT)) AS timestamp)"
        ).alias("o_orderdate"),
        "o_orderpriority",
    )
    _stage_single_parquet(odf, tmp_path, mini, "orders", "churn_stage")
    e = REGISTRY["customer_churn_hazard"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.gap_days: r for r in e.fn(spark, str(mini)).collect()}
    assert set(got) == {10, 15}
    assert (got[10].n_risk, got[10].n_events) == (3, 2)
    assert (got[15].n_risk, got[15].n_events) == (1, 1)
    assert got[10].hazard_micro == 666_666
    assert got[15].hazard_micro == 1_000_000
    assert got[15].cum_hazard_micro == 1_666_666
    del base


def test_user_type_entropy_flags_and_exact_values(spark, sf_dir, tmp_path):
    """Planted users: a single-type 50-event bot (flagged), a perfectly
    uniform two-type user (entropy == ln 2 in micro, not flagged), and a
    99:1 concentrated two-type user (flagged by the half-max rule)."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_ent")
    rows = []
    eid = 0
    for _ in range(50):
        rows.append((eid, "2024-03-01 10:00:00", 901, "click", 1.0, "{}"))
        eid += 1
    for i in range(40):
        rows.append(
            (eid, "2024-03-01 10:00:00", 902,
             "click" if i % 2 == 0 else "view", 1.0, "{}")
        )
        eid += 1
    for i in range(100):
        rows.append(
            (eid, "2024-03-01 10:00:00", 903,
             "view" if i == 0 else "click", 1.0, "{}")
        )
        eid += 1
    ev = spark.createDataFrame(
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
    _stage_single_parquet(ev, tmp_path, mini, "events", "ent_stage")
    e = REGISTRY["user_type_entropy"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.user_id: r for r in e.fn(spark, str(mini)).collect()}
    assert got[901].concentration_flag == 1 and got[901].entropy_micro == 0
    assert got[902].concentration_flag == 0
    assert got[902].entropy_micro == math.floor(math.log(2) * 1e6 + 0.5)
    assert got[903].concentration_flag == 1
    assert 0 < got[903].entropy_micro < 346574  # below half of ln 2


def test_daily_autocorr_detects_planted_alternation(spark, sf_dir, tmp_path):
    """POSITIVE control: a 40-day alternating volume series (5, 55, 5, 55
    ...) must give strongly negative lag-1 ACF and positive lag-2 ACF,
    both Bartlett-significant; odd lags negative, even lags positive."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_acf")
    rows = []
    ok = 0
    for day in range(40):
        n = 5 if day % 2 == 0 else 55
        for j in range(n):
            ok += 1
            rows.append((ok, 1, "O", 10.0, day, "1-URGENT"))
    odf = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, d int, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.expr("cast(date_add(date'2001-01-01', d) AS timestamp)").alias(
            "o_orderdate"
        ),
        "o_orderpriority",
    )
    _stage_single_parquet(odf, tmp_path, mini, "orders", "acf_stage")
    e = REGISTRY["orders_daily_autocorr"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.lag: r for r in e.fn(spark, str(mini)).collect()}
    assert got[1].acf_micro < -900_000 and got[1].reject_zero_acf == 1
    assert got[2].acf_micro > 900_000 and got[2].reject_zero_acf == 1
    for k in range(1, 8):
        assert (got[k].acf_micro < 0) == (k % 2 == 1)


def test_filter_funnel_accounting_invariants(spark, sf_dir):
    """Exclusive counts never exceed fail counts; survivors + union of
    failures == corpus; the fixture actually exercises several rules."""
    rows = {r.rule_no: r for r in
            REGISTRY["quality_filter_funnel"].fn(spark, sf_dir).collect()}
    n_docs = load_table(spark, "documents", sf_dir).count()
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    for no in (1, 2, 3, 4, 5):
        assert 0 <= rows[no].n_docs_exclusive <= rows[no].n_docs
    # survivors + docs failing at least one rule = all docs; the union is
    # bounded below by max fail and the sum of exclusives
    failed_any = n_docs - rows[0].n_docs
    assert failed_any >= max(rows[no].n_docs for no in (1, 2, 3, 4, 5))
    assert failed_any >= sum(rows[no].n_docs_exclusive for no in (1, 2, 3, 4, 5))
    assert sum(1 for no in (1, 2, 3, 5) if rows[no].n_docs > 0) >= 2


def test_dirichlet_ranking_monotone_in_tf_at_equal_length(spark, sf_dir):
    """Within a term, a doc with higher tf and the same dl must never rank
    below one with lower tf — the estimator is monotone in tf for fixed
    dl (checked over every comparable pair in the top-10 lists); ranks
    are dense 1..k per term."""
    rows = REGISTRY["lm_dirichlet_ranking"].fn(spark, sf_dir).collect()
    assert rows
    by_term: dict = {}
    for r in rows:
        by_term.setdefault(r.tok, []).append(r)
    for term, rs in by_term.items():
        ranks = sorted(x.rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        for a in rs:
            for b in rs:
                if a.dl == b.dl and a.tf > b.tf:
                    assert a.rank < b.rank
                    assert a.score_micro >= b.score_micro


def test_gram_novelty_curve_conservation(spark, sf_dir):
    """Bucket 1 is all-novel by construction; cumulative novelty is
    monotone and its total equals the distinct gram count of the corpus;
    per-bucket novelty never exceeds the bucket's distinct grams."""
    from postgres_cdc_example_spark.queries.llmdata import _doc_grams8

    rows = sorted(
        REGISTRY["gram_novelty_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(1, 11))
    nonempty = [r for r in rows if r.n_distinct_grams > 0]
    assert nonempty[0].novelty_micro == 1_000_000
    total_distinct = _doc_grams8(spark, sf_dir).select("g").distinct().count()
    assert rows[-1].cum_new_grams == total_distinct
    cums = [r.cum_new_grams for r in rows]
    assert cums == sorted(cums)
    for r in rows:
        assert r.n_new_grams <= r.n_distinct_grams


def test_packing_waste_monotone_in_granularity(spark, sf_dir):
    """Finer buckets can only reduce padding: waste_micro is non-increasing
    as n_buckets grows; padded >= kept always; truncation is independent
    of granularity."""
    rows = sorted(
        REGISTRY["packing_waste_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r.n_buckets,
    )
    assert [r.n_buckets for r in rows] == [1, 2, 4, 8, 16]
    wastes = [r.waste_micro for r in rows]
    assert wastes == sorted(wastes, reverse=True)
    truncs = {r.truncated_tokens for r in rows}
    assert len(truncs) == 1
    for r in rows:
        assert r.padded_tokens >= r.kept_tokens
        assert r.pad_waste_tokens == r.padded_tokens - r.kept_tokens


def test_minhash_calibration_exact_dup_lands_at_16(spark, sf_dir, tmp_path):
    """A planted exact duplicate must appear in the est=16 bucket with
    Jaccard exactly 1.0 folded into the stats, and every bucket's mean
    must sit within its [min, max] envelope; the predicted_micro column
    is est/16 exactly."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_cal")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    base = docs.orderBy("doc_id").first()
    dup = spark.createDataFrame(
        [(920001, base.text, base.lang, "dup", len(base.text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _stage_single_parquet(
        docs.unionByName(dup), tmp_path, mini, "documents", "cal_stage"
    )
    e = REGISTRY["dedup_minhash_calibration"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    rows = {r.est_matches: r for r in e.fn(spark, str(mini)).collect()}
    assert 16 in rows and rows[16].max_jac_micro == 1_000_000
    for est, r in rows.items():
        assert r.min_jac_micro <= r.mean_jac_micro <= r.max_jac_micro
        assert r.predicted_micro == est * 1_000_000 // 16


def test_pareto_concentration_nesting_and_bounds(spark, sf_dir):
    """Lorenz consistency: larger top-percent slices carry more customers
    and at least as much revenue; shares are proper fractions ordered the
    same way; every slice's share >= its population share (revenue sorted
    descending can never under-weight the top)."""
    rows = sorted(
        REGISTRY["orders_pareto_concentration"].fn(spark, sf_dir).collect(),
        key=lambda r: r.top_percent,
    )
    assert [r.top_percent for r in rows] == [1, 5, 10, 20]
    for a, b in zip(rows, rows[1:]):
        assert a.n_top_customers <= b.n_top_customers
        assert a.revenue_cents <= b.revenue_cents
        assert a.revenue_share_micro <= b.revenue_share_micro
    for r in rows:
        assert 0 < r.revenue_share_micro <= 1_000_000
        assert r.revenue_share_micro >= r.top_percent * 10_000 - 10_000


def test_kfold_plan_colocates_near_dup_clusters(spark, sf_dir):
    """Leakage safety: every member of a near-dup cluster gets the SAME
    fold; folds cover 0..K-1; every document appears exactly once."""
    from postgres_cdc_example_spark.queries.extensions import KFOLD_K

    plan = REGISTRY["split_kfold_plan"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, "documents", sf_dir).count()
    assert len(plan) == n_docs
    assert len({r.doc_id for r in plan}) == n_docs
    by_group: dict = {}
    for r in plan:
        assert 0 <= r.fold < KFOLD_K
        by_group.setdefault(r.group_key, set()).add(r.fold)
    assert all(len(folds) == 1 for folds in by_group.values())
    clustered = [r for r in plan if r.in_cluster == 1]
    assert clustered, "fixture must carry near-dup clusters"
    multi = [g for g, _ in by_group.items()
             if sum(1 for r in plan if r.group_key == g) > 1]
    assert multi, "at least one multi-member group must exist"


def test_mattr_length_independence_and_exact_window_math(spark, sf_dir, tmp_path):
    """A doc that repeats a W-token fully-distinct block has MATTR == 1.0
    at every length (raw TTR would fall); a doc of one repeated token has
    MATTR == 1/W; short docs fall back to plain TTR with the flag."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_mattr")
    words = [f"w{i}" for i in range(25)]
    rows = [
        (950001, " ".join(words * 4), "en", "p", 0),  # 100 toks, windows distinct
        (950002, " ".join(["same"] * 60), "en", "p", 0),  # degenerate
        (950003, " ".join(words[:10]), "en", "p", 0),  # short: TTR fallback
    ]
    rows = [(d, t, lg, s, len(t)) for d, t, lg, s, _ in rows]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    _stage_single_parquet(
        base.unionByName(docs), tmp_path, mini, "documents", "mattr_stage"
    )
    e = REGISTRY["text_mattr"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.doc_id: r for r in e.fn(spark, str(mini)).collect()}
    assert got[950001].mattr_micro == 1_000_000 and got[950001].short_doc == 0
    assert got[950002].mattr_micro == 1_000_000 // 25
    assert got[950003].short_doc == 1 and got[950003].mattr_micro == 1_000_000


def test_abc_classification_boundaries_and_conservation(spark, sf_dir):
    """Classes partition all parts; prev-cum share is monotone in rank;
    the A boundary part (first with prev_cum >= 80%) is classed B, but
    the part that CROSSES the boundary (prev < 80%) stays A; revenue sums
    to the corpus total."""
    rows = sorted(
        REGISTRY["orders_abc_classification"].fn(spark, sf_dir).collect(),
        key=lambda r: r.revenue_rank,
    )
    assert rows and [r.revenue_rank for r in rows] == list(
        range(1, len(rows) + 1)
    )
    shares = [r.prev_cum_share_micro for r in rows]
    assert shares == sorted(shares)
    for r in rows:
        want = (
            "A"
            if r.prev_cum_share_micro < 800000
            else ("B" if r.prev_cum_share_micro < 950000 else "C")
        )
        assert r.abc_class == want
    assert {r.abc_class for r in rows} == {"A", "B", "C"}
    li = load_table(spark, "lineitem", sf_dir)
    total = li.select(
        F.sum(F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
    ).collect()[0][0]
    assert sum(r.revenue_cents for r in rows) == total


def test_label_separation_margin_arithmetic_and_coverage(spark, sf_dir):
    """One row per observed label; margins are exactly intra minus
    nearest-other; nearest_other differs from the label itself; member
    counts sum to the table size."""
    rows = REGISTRY["embedding_label_separation"].fn(spark, sf_dir).collect()
    n_vecs = load_table(spark, "embeddings", sf_dir).count()
    labels = {r.label for r in rows}
    assert len(rows) == len(labels) >= 2
    assert sum(r.n_vecs for r in rows) == n_vecs
    for r in rows:
        assert r.nearest_other_label in labels - {r.label}
        assert (
            r.separation_margin_micro
            == r.intra_mean_cos_micro - r.nearest_other_cos_micro
        )


def test_benchmark_coverage_planted_full_and_zero(spark, sf_dir, tmp_path):
    """A benchmark doc duplicated verbatim in the corpus must read 100%
    covered; one with fully unique text must read 0% — and the engines
    agree on the planted fixture."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_cov")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    base = docs.orderBy("doc_id").first()
    unique = " ".join(f"zq{i}token" for i in range(20))
    extra = spark.createDataFrame(
        [
            # benchmark slice members (doc_id % 20 == 0)
            (900020, base.text, "en", "bench", len(base.text)),
            (900040, unique, "en", "bench", len(unique)),
            # corpus twin of the first benchmark doc
            (900021, base.text, "en", "corpus", len(base.text)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _stage_single_parquet(
        docs.unionByName(extra), tmp_path, mini, "documents", "cov_stage"
    )
    e = REGISTRY["benchmark_coverage_report"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.doc_id: r for r in e.fn(spark, str(mini)).collect()}
    assert got[900020].coverage_micro == 1_000_000
    assert got[900020].majority_covered == 1
    assert got[900040].coverage_micro == 0
    assert got[900040].majority_covered == 0


def test_shingle_df_profile_conservation_and_cutoff(spark, sf_dir):
    """Bucket pair volumes sum to the corpus total (shares sum to ~1e6);
    cutoff_saves equals the mass of buckets entirely above the cutoff
    plus the above-cutoff part of the straddling bucket (>= the pure
    high buckets' share); row/shingle counts are consistent."""
    rows = sorted(
        REGISTRY["dedup_shingle_df_profile"].fn(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert rows
    total_share = sum(r.pair_share_micro for r in rows)
    assert 1_000_000 - len(rows) <= total_share <= 1_000_000
    saves = {r.cutoff_saves_micro for r in rows}
    assert len(saves) == 1  # global column, identical on every row
    high = sum(r.pair_share_micro for r in rows if r.df_lo > 64)
    assert saves.pop() >= high
    for r in rows:
        assert r.n_rows >= r.n_shingles  # df >= 1 per shingle
        assert r.df_lo == 2 ** r.bucket


def test_hour_dow_heatmap_grid_and_intensity(spark, sf_dir):
    """Cells stay inside the 7x24 grid; shares sum to ~1e6; intensity
    averages to ~1e6 across cells; the uniformity verdict is emitted
    (non-NULL) exactly when the grid is complete."""
    rows = REGISTRY["event_hour_dow_heatmap"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dow <= 7 and 0 <= r.hr <= 23
    assert len({(r.dow, r.hr) for r in rows}) == len(rows) <= 168
    assert 1_000_000 - len(rows) <= sum(r.share_micro for r in rows) <= 1_000_000
    mean_int = sum(r.intensity_micro for r in rows) / len(rows)
    assert abs(mean_int - 1_000_000) < 1_000
    complete = len(rows) == 168
    verdicts = {r.reject_uniform for r in rows}
    if complete:
        assert verdicts <= {0, 1} and len(verdicts) == 1
    else:
        assert verdicts == {None}


def test_forward_asof_recovery_semantics(spark, sf_dir):
    """Every matched purchase is at-or-after its error with non-negative
    recovery latency, and it is the EARLIEST such purchase: no other
    purchase by the same user sits strictly between the error and the
    match. One row per error event (left join semantics)."""
    rows = REGISTRY["purchase_asof_after_error"].fn(spark, sf_dir).collect()
    ev = load_table(spark, "events", sf_dir)
    n_errors = ev.filter("event_type = 'error'").count()
    assert len(rows) == n_errors
    purchases = {}
    for r in ev.filter("event_type = 'purchase'").collect():
        purchases.setdefault(r.user_id, []).append(r.ts)
    matched = [r for r in rows if r.purchase_ts is not None]
    assert matched, "fixture must produce some recoveries"
    for r in matched:
        assert r.purchase_ts >= r.ts and r.recovery_us >= 0
        earlier = [
            t for t in purchases.get(r.user_id, [])
            if r.ts <= t < r.purchase_ts
        ]
        assert not earlier, "match must be the earliest at-or-after purchase"


def test_brownforsythe_missing_group_yields_null_verdict(
    spark, sf_dir, tmp_path
):
    """With only two of the three groups present, k != 3 and the fixed
    F(2, inf) literal would mis-calibrate — the verdict must be NULL (and
    identical in both engines), not a silently wrong 0/1."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_bf2")
    rows = []
    for i in range(60):
        rows.append((i, "2024-03-01 10:00:00", 1, "purchase", 100.0 + i, "{}"))
        rows.append((1000 + i, "2024-03-01 11:00:00", 2, "view", 50.0 + 7 * i, "{}"))
    ev = spark.createDataFrame(
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
    _stage_single_parquet(ev, tmp_path, mini, "events", "bf2_stage")
    e = REGISTRY["value_levene_brownforsythe"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    r = e.fn(spark, str(mini)).first()
    assert r.k == 2
    assert r.reject_equal_spread is None
    assert r.f_micro is not None  # the statistic itself is still reported


def test_priority_mix_drift_flags_planted_composition_shift(
    spark, sf_dir, tmp_path
):
    """POSITIVE control: a planted month with the same VOLUME as its
    neighbors but an all-URGENT composition must flag; stable months must
    not; both engines agree on the planted corpus."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_mix")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rows = []
    ok = 0
    for m in range(6):
        for i in range(200):
            ok += 1
            # month 3 is all-urgent; others cycle uniformly
            p = "1-URGENT" if m == 3 else prios[i % 5]
            rows.append((ok, 1 + ok % 50, "O", 100.0, m, p))
    odf = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, m int, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.expr("cast(add_months(date'2002-01-15', m) AS timestamp)").alias(
            "o_orderdate"
        ),
        "o_orderpriority",
    )
    _stage_single_parquet(odf, tmp_path, mini, "orders", "mix_stage")
    e = REGISTRY["priority_mix_monthly_drift"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = sorted(e.fn(spark, str(mini)).collect(), key=lambda r: r.month)
    assert len(got) == 6 and all(r.n_orders == 200 for r in got)
    flags = [r.drift_flag for r in got]
    assert flags[3] == 1, "the planted all-urgent month must flag"
    # the planted month inflates the GLOBAL urgent share, so neighbors
    # drift slightly against it — but far less than the planted month
    chis = [r.chi2_micro for r in got]
    assert chis[3] == max(chis) and chis[3] > 5 * min(chis)
