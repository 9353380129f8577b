"""Round-12 verdict-flag control battery (VERDICT r11 next-round #1).

The r10 heatmap chi-squared bug proved the DuckDB-oracle harness is
structurally blind to "engine and oracle agree on the wrong formula":
both sides mirrored a double-scaled denominator, the value hashes stayed
green, and ``reject_uniform`` could mathematically never fire.  The only
systematic defense is a planted POSITIVE control (the flag demonstrably
FIRES) plus a planted NEGATIVE control (the flag stays 0 on data
matching the null) for every decision column the registry emits — and a
meta-test that refuses any future flag column that lacks one.

This file closes the audit: the two columns the r11 judge found with
zero coverage anywhere (``volume_ljung_box.reject_white_noise`` and
``value_distribution_ks.reject_same_dist``) get full two-arm planted
controls with a pure-Python exactness mirror; the location/rate family
(Mann-Whitney, Kruskal-Wallis, Friedman, Cochran Q) — whose only prior
tests were degenerate/overflow arms — gets a shared planted fixture
whose SHIFTED arm fires all four and whose ROTATED-NULL arm holds all
four at 0 *without* degenerating (denominators stay positive);
``user_bot_regularity.is_regular`` (single-valued on the fixture) gets a
planted metronome; and every descriptive flag is pinned to attain both
arms on the real fixture.  ``test_flag_meta_every_flag_column_has_a_control``
is the enforcement: it statically scans the package for flag-pattern
output columns and fails if any is neither mapped to a named control
test nor verified to be a plan-internal (non-output) label.
"""

from __future__ import annotations

import os
import re

import pytest

import postgres_cdc_example_spark.queries as q
from postgres_cdc_example_spark.queries import REGISTRY
from tests.oracle_utils import compare_to_oracle
from tests.test_round11 import _events_df, _mini, _stage_single_parquet

q.queries()  # populate REGISTRY

# ---------------------------------------------------------------------------
# Ljung-Box: reject_white_noise (zero prior coverage — r11 VERDICT #1)
# ---------------------------------------------------------------------------

# Deterministic pseudo-white daily-count series (random.Random(9),
# 100 + randrange(40), 60 days), frozen as a literal so no RNG version
# drift can ever move the arm.  Pure-Python mirror Q_micro = 1_354_225,
# far below chi2_0.95(5) micro = 11_070_498.
WHITE_COUNTS = [
    129, 139, 123, 117, 108, 111, 100, 121, 132, 129,
    138, 105, 121, 135, 139, 102, 124, 110, 128, 127,
    110, 110, 115, 103, 107, 108, 132, 137, 104, 124,
    106, 118, 113, 114, 126, 105, 117, 113, 125, 117,
    121, 102, 112, 100, 126, 103, 124, 131, 108, 101,
    115, 127, 107, 138, 100, 107, 137, 112, 112, 121,
]

STEP_COUNTS = [200] * 30 + [100] * 30  # strong lag-1..5 autocorrelation
CONST_COUNTS = [150] * 60  # degenerate: dss = 0 -> Q = 0 in both engines

LB_CRIT_MICRO = 11_070_498  # chi2_0.95(5) on the micro grid


def _ljung_box_q_micro_mirror(counts: list[int]) -> int:
    """Pure-Python integer mirror of the engine/oracle cleared form —
    the Hypothesis-style proof that both engines compute THIS number."""
    n = len(counts)
    s = sum(counts)
    dv = [n * c - s for c in counts]
    dss = sum(d * d for d in dv)
    qm = 0
    for k in range(1, 6):
        ck = sum(dv[t] * dv[t + k] for t in range(n - k))
        if dss == 0 or n <= k:
            continue
        rk2 = (ck * ck * 1_000_000) // (dss * dss)
        qm += (n * (n + 2) * rk2) // (n - k)
    return qm


def _daily_events(spark, counts):
    """One events table whose per-day volumes equal ``counts`` exactly,
    starting 2024-01-01; timestamps within a day are distinct."""
    import datetime as dt

    rows, eid = [], 0
    base = dt.date(2024, 1, 1)
    for day, c in enumerate(counts):
        d = base + dt.timedelta(days=day)
        for i in range(c):
            eid += 1
            rows.append(
                (eid, f"{d} {i // 3600:02d}:{(i // 60) % 60:02d}:{i % 60:02d}",
                 1 + (eid % 7), "view", 1.0, "{}")
            )
    return _events_df(spark, rows)


def test_ljung_box_verdict_both_arms(spark, sf_dir, tmp_path):
    """reject_white_noise FIRES on a planted step series (autocorrelated
    daily volume), stays 0 on a frozen pseudo-white series WITHOUT
    degenerating (dss > 0, Q > 0), and reports exactly Q = 0 on the
    constant series — each arm's q_micro equal to the pure-Python
    integer mirror, and each arm oracle-verified in both engines."""
    e = REGISTRY["volume_ljung_box"]
    arms = [
        ("lb_step", STEP_COUNTS, 1),
        ("lb_white", WHITE_COUNTS, 0),
        ("lb_const", CONST_COUNTS, 0),
    ]
    for name, counts, want in arms:
        mini = _mini(sf_dir, tmp_path, name)
        _stage_single_parquet(
            _daily_events(spark, counts), tmp_path, mini, "events",
            name + "_st"
        )
        compare_to_oracle(spark, str(mini), e.fn, e.oracle)
        got = e.fn(spark, str(mini)).collect()
        assert len(got) == 5  # one row per lag, shared verdict
        mirror = _ljung_box_q_micro_mirror(counts)
        assert {r.q_micro for r in got} == {mirror}, name
        assert {r.reject_white_noise for r in got} == {want}, name
        if name == "lb_step":
            assert mirror > LB_CRIT_MICRO
        elif name == "lb_white":
            assert 0 < mirror < LB_CRIT_MICRO  # non-degenerate null
        else:
            assert mirror == 0  # constant series: dss = 0 exactly


# ---------------------------------------------------------------------------
# KS + Mann-Whitney + Kruskal-Wallis + Friedman + Cochran Q: one planted
# fixture pair fires/holds the whole location/rate family
# ---------------------------------------------------------------------------


def _shifted_events(spark):
    """9 users x 3 types, fully separated locations: purchase ~10,
    click ~50, view ~200 (above the Cochran 150-milli*1000 threshold),
    tiny per-user jitter so pooled ranks are tie-free."""
    rows, eid = [], 0
    for u in range(1, 10):
        for etype, basev in (("purchase", 10.0), ("click", 50.0),
                             ("view", 200.0)):
            eid += 1
            rows.append(
                (eid, f"2024-02-{u:02d} 0{eid % 10}:00:{eid % 60:02d}", u,
                 etype, basev + u * 0.001, "{}")
            )
    return _events_df(spark, rows)


def _rotated_null_events(spark):
    """9 users x 3 types, values a rotation of {10, 20, 200}: every type
    sees the identical value multiset (KS/MW/KW exactly null), every
    rank and every Cochran success is balanced across types (Friedman /
    Cochran numerators exactly 0) while blocks still vary (denominators
    stay positive — the null is NON-degenerate)."""
    vals = (10.0, 20.0, 200.0)
    types = ("purchase", "view", "click")
    rows, eid = [], 0
    for u in range(9):
        rot = u % 3
        for j, etype in enumerate(types):
            eid += 1
            rows.append(
                (eid, f"2024-03-{u + 1:02d} 0{j}:00:00", u + 1, etype,
                 vals[(j + rot) % 3], "{}")
            )
    return _events_df(spark, rows)


def test_location_rate_verdicts_both_arms(spark, sf_dir, tmp_path):
    """POSITIVE arm: fully separated per-type value locations fire
    reject_same_dist (KS), reject_same_location (Mann-Whitney,
    Kruskal-Wallis, Friedman) and reject_same_rate (Cochran Q).
    NEGATIVE arm: the rotated-null fixture holds every verdict at 0 with
    every statistic exactly 0 and every denominator positive — a true
    null, not a degenerate one.  All five queries oracle-verified on
    both planted corpora."""
    cases = {
        "value_distribution_ks": "reject_same_dist",
        "value_location_mannwhitney": "reject_same_location",
        "value_location_kruskalwallis": "reject_same_location",
        "value_location_friedman": "reject_same_location",
        "value_cochran_q": "reject_same_rate",
    }
    for planted, name in ((True, "loc_shift"), (False, "loc_null")):
        mini = _mini(sf_dir, tmp_path, name)
        df = _shifted_events(spark) if planted else _rotated_null_events(spark)
        _stage_single_parquet(df, tmp_path, mini, "events", name + "_st")
        for qname, flag in cases.items():
            e = REGISTRY[qname]
            compare_to_oracle(spark, str(mini), e.fn, e.oracle)
            row = e.fn(spark, str(mini)).first()
            assert row[flag] == (1 if planted else 0), (qname, name)
        if not planted:
            # non-degenerate null: statistics exactly 0, denominators live
            ks = REGISTRY["value_distribution_ks"].fn(spark, str(mini)).first()
            assert ks.ks_micro == 0 and ks.na == 9 and ks.nb == 9
            mw = REGISTRY["value_location_mannwhitney"].fn(
                spark, str(mini)
            ).first()
            assert mw.rank_biserial_micro == 0
            kw = REGISTRY["value_location_kruskalwallis"].fn(
                spark, str(mini)
            ).first()
            assert kw.n_groups == 3 and kw.h_corr_micro == 0
            fr = REGISTRY["value_location_friedman"].fn(
                spark, str(mini)
            ).first()
            assert fr.rank_ss > 0 and fr.friedman_q_micro == 0
            cq = REGISTRY["value_cochran_q"].fn(spark, str(mini)).first()
            assert cq.n_blocks == 9 and cq.cochran_q_micro == 0


# ---------------------------------------------------------------------------
# bot regularity: is_regular (single-valued 0 on the fixture)
# ---------------------------------------------------------------------------


def test_bot_regularity_flags_planted_metronome(spark, sf_dir, tmp_path):
    """is_regular FIRES for a planted metronome (ten events at exactly
    60-second gaps -> CV^2 = 0) and stays 0 for a planted bursty human
    (gaps spanning 1s..200s) — the positive arm the real fixture never
    produces (sf0.001 has zero regular users)."""
    mini = _mini(sf_dir, tmp_path, "sf_bot")
    rows = []
    for i in range(10):  # user 1: exact 60 s cadence
        rows.append((100 + i, f"2024-04-01 10:{i:02d}:00", 1, "view", 1.0,
                     "{}"))
    gaps = [1, 50, 3, 200, 7, 90]  # user 2: bursty, CV^2 >> 0.05
    t = 0
    rows.append((200, "2024-04-01 12:00:00", 2, "view", 1.0, "{}"))
    for i, g in enumerate(gaps):
        t += g
        rows.append((201 + i, f"2024-04-01 12:{t // 60:02d}:{t % 60:02d}", 2,
                     "view", 1.0, "{}"))
    _stage_single_parquet(
        _events_df(spark, rows), tmp_path, mini, "events", "bot_st"
    )
    e = REGISTRY["user_bot_regularity"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.user_id: r for r in e.fn(spark, str(mini)).collect()}
    assert got[1].is_regular == 1 and got[1].cv2_micro == 0
    assert got[2].is_regular == 0 and got[2].cv2_micro >= 50_000


# ---------------------------------------------------------------------------
# descriptive flags: both arms must occur on the real fixture
# ---------------------------------------------------------------------------

FIXTURE_BOTH_ARMS = [
    ("scalar_functions", "is_even"),
    ("scalar_functions", "has_one"),
    ("event_hourly_gapfill", "is_gap"),
    ("event_transition_matrix", "is_top_transition"),
    ("boilerplate_prefix_flags", "is_boilerplate"),
    ("text_mixed_language", "is_mixed"),
    ("semantic_dedup", "is_kept"),
]


@pytest.mark.parametrize("qname,flag", FIXTURE_BOTH_ARMS)
def test_fixture_flag_attains_both_arms(spark, sf_dir, qname, flag):
    """Non-vacuity pin: the descriptive flag column takes BOTH values on
    the sf0.001 fixture, so downstream consumers (and the oracle value
    hash) exercise both code paths every sweep."""
    vals = {
        r[0]
        for r in REGISTRY[qname].fn(spark, sf_dir).select(flag).distinct()
        .collect()
    }
    assert len(vals) == 2, f"{qname}.{flag} single-valued: {vals}"


# ---------------------------------------------------------------------------
# the enforcing meta-test
# ---------------------------------------------------------------------------

# Every flag-pattern output column in the package, mapped to the named
# test(s) that prove it can fire (and, where the semantics have a null
# arm, that it can stay 0).  A new flag column fails the meta-test until
# it is added here with a real control.
FLAG_CONTROLS = {
    "reject_white_noise": "test_ljung_box_verdict_both_arms",
    "reject_same_dist": "test_location_rate_verdicts_both_arms",
    "reject_same_location": "test_location_rate_verdicts_both_arms",
    "reject_same_rate": "test_location_rate_verdicts_both_arms",
    "reject_uniform": "test_heatmap_chi2_rejects_planted_hotspot",
    "reject_benford": "test_benford_verdict_both_arms",
    "reject_equal_spread": "test_brownforsythe_detects_planted_unequal_spread",
    "reject_no_trend": "test_trend_family_detects_planted_monotone_trend",
    "reject_random": "test_trend_family_detects_planted_monotone_trend",
    "reject_zero_acf": "test_daily_autocorr_detects_planted_alternation",
    "is_regular": "test_bot_regularity_flags_planted_metronome",
    "is_even": "test_fixture_flag_attains_both_arms",
    "has_one": "test_fixture_flag_attains_both_arms",
    "is_gap": "test_fixture_flag_attains_both_arms",
    "is_top_transition": "test_fixture_flag_attains_both_arms",
    "is_boilerplate": "test_fixture_flag_attains_both_arms",
    "is_mixed": "test_fixture_flag_attains_both_arms",
    "is_kept": "test_fixture_flag_attains_both_arms",
    "is_anomaly": "test_anomaly_stream_matches_batch_closed_hours",
    "is_best": "test_jm_lambda_grid_selects_interior_minimum",
    "is_current": "test_scd2_current_versions_match_apply",
    "is_key": "test_fd_audit_catches_planted_violation",
    "concentration_flag": "test_user_type_entropy_flags_and_exact_values",
    "drift_flag": "test_priority_mix_drift_flags_planted_composition_shift",
    "shift_flag": "test_mixture_shift_flags_planted_dup_heavy_source",
}

# Verdict-semantics columns whose NAMES escape the regex patterns (no
# reject_/is_/has_/_flag affix) but which encode decisions all the same —
# curated here so the meta-test's reach matches its intent, each mapped
# to its existing named control.
EXTRA_VERDICT_COLUMNS = {
    "purgable": "test_tombstone_retention_planted_lifecycle",
    "admitted": "test_quota_gate_stream_matches_batch_admission",
}

# Flag-pattern names that are PLAN-INTERNAL labels (never output columns);
# mapped to the registered query whose output schema must NOT contain them
# — verified live so a refactor that promotes one to an output column
# demotes it back into FLAG_CONTROLS territory.
INTERNAL_FLAGS = {
    "is_new": "event_time_sliding",
    "is_true": "bloom_semijoin_audit",
    "is_test": "event_markov_nll",
}

_FLAG_ALIAS = re.compile(
    r'\.alias\(\s*"((?:reject_|is_|has_|verdict)[a-z0-9_]*'
    r'|[a-z0-9_]+_flag)"\s*\)'
)
_FLAG_AS = re.compile(
    r"\bAS\s+((?:reject_|is_|has_|verdict)[a-z0-9_]*|[a-z0-9_]+_flag)\b"
)


def _package_flag_columns() -> set[str]:
    pkg = os.path.join(os.path.dirname(__file__), "..",
                       "postgres_cdc_example_spark")
    found = set()
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            src = open(os.path.join(root, f)).read()
            for m in _FLAG_ALIAS.finditer(src):
                found.add(m.group(1))
            for m in _FLAG_AS.finditer(src):
                found.add(m.group(1))
    return found


def test_flag_meta_every_flag_column_has_a_control(spark, sf_dir):
    """ENFORCEMENT (r11 VERDICT next-round #1): statically enumerate
    every flag-pattern column the package emits; each must be either
    (a) mapped in FLAG_CONTROLS to a test function that exists in
    tests/, or (b) declared plan-internal in INTERNAL_FLAGS and verified
    ABSENT from that query's output schema.  A new verdict column cannot
    register without a planted control."""
    found = _package_flag_columns()
    unclassified = found - set(FLAG_CONTROLS) - set(INTERNAL_FLAGS)
    assert not unclassified, (
        f"flag columns without a named control test: {sorted(unclassified)}"
        " — add a planted two-arm control and map it in FLAG_CONTROLS"
    )
    # every named control test must actually exist somewhere in tests/
    tests_dir = os.path.dirname(__file__)
    defs = set()
    for f in os.listdir(tests_dir):
        if f.endswith(".py"):
            defs.update(
                re.findall(r"^def (test_[a-z0-9_]+)",
                           open(os.path.join(tests_dir, f)).read(), re.M)
            )
    missing = {
        t
        for t in list(FLAG_CONTROLS.values())
        + list(EXTRA_VERDICT_COLUMNS.values())
        if t not in defs
    }
    assert not missing, f"controls name nonexistent tests: {sorted(missing)}"
    # the curated extras must still exist in the package (rename guard)
    pkg = os.path.join(os.path.dirname(__file__), "..",
                       "postgres_cdc_example_spark")
    src_all = ""
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                src_all += open(os.path.join(root, f)).read()
    for col in EXTRA_VERDICT_COLUMNS:
        assert col in src_all, f"curated extra column vanished: {col}"
    # internal labels must stay internal (not output columns)
    for flag, qname in INTERNAL_FLAGS.items():
        cols = REGISTRY[qname].fn(spark, sf_dir).columns
        assert flag not in cols, (
            f"{flag} became an output column of {qname} — move it to"
            " FLAG_CONTROLS with a planted control"
        )
