"""Property tests for the round-6 sketch ALGEBRA (pure Python, no Spark).

The oracle comparisons prove engine == DuckDB on the fixtures; these prove
the algebraic guarantees the docstrings claim hold on ARBITRARY inputs —
the part a fixed fixture can't: Misra-Gries's merged error bound and
heavy-hitter completeness, KMV's merge == direct identity, and the
histogram quantile's bucket-width error bound. Each mirror implementation
follows the registered query's integer algebra exactly
(queries/llmdata.heavy_hitters_misra_gries,
queries/relational.audience_overlap_kmv,
queries/windows.quantile_histogram_rollup)."""

from __future__ import annotations

import datetime
import os
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_cdc_example_spark.queries.llmdata import MG_K
from postgres_cdc_example_spark.queries.relational import KMV_K
from postgres_cdc_example_spark.queries.windows import QHR_BUCKET_MILLI


def _mg_reduce(counts: dict, k: int) -> tuple[dict, int]:
    """Order-free MG on a count table: subtract the (k+1)-th largest count,
    keep positives. Returns (summary, offset)."""
    if len(counts) <= k:
        return dict(counts), 0
    t = sorted(counts.values(), reverse=True)[k]
    return {x: c - t for x, c in counts.items() if c > t}, t


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.tuples(st.integers(0, 40), st.integers(1, 500)), max_size=60),
        min_size=1,
        max_size=6,
    )
)
def test_misra_gries_merge_bound_and_completeness(sources):
    """For ANY per-source count tables: the merged summary underestimates,
    the underestimate is within SUM(t_s) + t_m, and every item whose true
    count exceeds that bound survives the merge."""
    per_source = []
    for src_rows in sources:
        c = Counter()
        for tok, n in src_rows:
            c[tok] += n
        per_source.append(c)

    exact = Counter()
    for c in per_source:
        exact.update(c)

    offsets = []
    merged = Counter()
    for c in per_source:
        summ, t = _mg_reduce(c, MG_K)
        offsets.append(t)
        merged.update(summ)
    final, t_m = _mg_reduce(merged, MG_K)
    bound = sum(offsets) + t_m

    assert len(final) <= MG_K
    for tok, est in final.items():
        assert 0 < est <= exact[tok], "MG must underestimate"
        assert exact[tok] - est <= bound, "merged error bound must hold"
    for tok, c in exact.items():
        if c > bound:
            assert tok in final, "a heavy hitter above the bound must survive"


def _bottom_k(values, k):
    return sorted(set(values))[:k]


@settings(max_examples=200, deadline=None)
@given(
    st.sets(st.integers(0, 10**6), max_size=300),
    st.sets(st.integers(0, 10**6), max_size=300),
)
def test_kmv_merge_equals_direct(a, b):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) for ANY hash
    sets — the identity the oracle pins on the fixture, universally."""
    direct = _bottom_k(a | b, KMV_K)
    merged = _bottom_k(set(_bottom_k(a, KMV_K)) | set(_bottom_k(b, KMV_K)), KMV_K)
    assert direct == merged


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 639_999), min_size=1, max_size=400))
def test_histogram_quantile_error_bounded_by_bucket_width(millis):
    """The bucket-lower-edge estimate at rank ceil(q·n/100) is within one
    bucket width below the exact rank value, for ANY value multiset and
    both registered percentiles."""
    hist = Counter(m // QHR_BUCKET_MILLI for m in millis)
    ordered = sorted(millis)
    n = len(millis)
    for q in (50, 90):
        k = (q * n + 99) // 100
        cum = 0
        est = None
        for b in sorted(hist):
            cum += hist[b]
            if cum >= k:
                est = b * QHR_BUCKET_MILLI
                break
        exact = ordered[k - 1]
        assert est is not None
        assert 0 <= exact - est < QHR_BUCKET_MILLI


def _rs_hash(event_id: int) -> int:
    """The registered query's 60-bit row hash, mirrored exactly:
    md5 of the decimal id string, first 15 hex chars as an integer."""
    import hashlib

    return int(hashlib.md5(str(event_id).encode()).hexdigest()[:15], 16)


def _rs_bottom_k(rows, k):
    """bottom-k rows of [(id, value)] under the (hash, id) total order —
    the exact selection rank_sketch_bottomk runs per day and at merge."""
    return sorted(rows, key=lambda r: (_rs_hash(r[0]), r[0]))[:k]


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(0, 10**12)),
        min_size=1,
        max_size=300,
        unique_by=lambda r: r[0],
    ),
    st.lists(st.integers(0, 5), min_size=1, max_size=300),
    st.integers(2, 64),
)
def test_rank_sketch_bottomk_merge_equals_direct(rows, groups, k):
    """For ANY unique-id row multiset, ANY partition into groups, and ANY
    sketch size: merging per-group bottom-k partials yields exactly the
    direct corpus bottom-k — the idempotent-monoid identity
    rank_sketch_bottomk's per-day-then-merge construction relies on
    (queries/windows.rank_sketch_bottomk)."""
    parts: dict[int, list] = {}
    for row, g in zip(rows, groups * (len(rows) // len(groups) + 1)):
        parts.setdefault(g, []).append(row)
    union_of_partials: list = []
    for part in parts.values():
        union_of_partials.extend(_rs_bottom_k(part, k))
    merged = _rs_bottom_k(union_of_partials, k)
    direct = _rs_bottom_k(rows, k)
    assert merged == direct


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(0, 10**12)),
        min_size=1,
        max_size=200,
        unique_by=lambda r: r[0],
    )
)
def test_rank_sketch_exact_when_n_at_most_k(rows):
    """With n <= k the sketch IS the corpus: the sample-rank estimate at
    ceil(q·k/100) must equal the exact corpus value at ceil(q·n/100) for
    both registered percentiles (the sketch degrades to exact, never to
    wrong)."""
    k = len(rows)  # sketch size >= corpus
    sample = sorted(v for _, v in _rs_bottom_k(rows, k))
    exact = sorted(v for _, v in rows)
    n = len(rows)
    for q in (50, 90):
        assert sample[(q * k + 99) // 100 - 1] == exact[(q * n + 99) // 100 - 1]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(0, 60), min_size=2, max_size=250),
    st.lists(st.integers(0, 60), min_size=2, max_size=250),
)
def test_mannwhitney_cleared_form_equals_classical_decision(a, b):
    """The cleared-denominator squared decision in
    value_location_mannwhitney (queries/relational.py) must agree with
    the classical tie-corrected |z| > 1.96 on ANY two integer samples —
    including tie-heavy ones, where the all-tied degenerate case (zero
    variance) must gracefully not-reject."""
    import math

    ca, cb = Counter(a), Counter(b)
    vals = sorted(set(a) | set(b))
    u2 = 0
    cumb = 0
    for v in vals:
        u2 += ca.get(v, 0) * (2 * cumb + cb.get(v, 0))
        cumb += cb.get(v, 0)
    na, nb = len(a), len(b)
    N = na + nb
    T = sum(
        (ca.get(v, 0) + cb.get(v, 0)) ** 3 - (ca.get(v, 0) + cb.get(v, 0))
        for v in vals
    )
    lhs = 3 * 10000 * (u2 - na * nb) ** 2 * N * (N - 1)
    rhs = 38416 * na * nb * (N**3 - N - T)
    cleared = lhs > rhs

    var = na * nb / 12 * ((N + 1) - T / (N * (N - 1)))
    if var == 0:
        assert not cleared, "zero-variance (all-tied) must not reject"
        return
    z = (u2 / 2 - na * nb / 2) / math.sqrt(var)
    classical = z * z > 1.96**2
    # exact boundary ties between float z² and the integer form are
    # impossible for strict > on integers unless z² == c² exactly, which
    # the integer form decides consistently; allow the knife-edge only
    if abs(z * z - 1.96**2) > 1e-9:
        assert cleared == classical


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 40), min_size=2, max_size=120),
        min_size=1,
        max_size=6,
    )
)
def test_kruskalwallis_cleared_form_equals_classical(groups):
    """The cleared-denominator k-sample decision in
    value_location_kruskalwallis (queries/relational.py) must agree with
    the classical tie-corrected H > chi2_0.95(k-1) on ANY integer samples —
    including tie-heavy ones and the all-tied degenerate case (zero
    denominator), which must gracefully report H=0 / no-reject."""
    from fractions import Fraction

    from postgres_cdc_example_spark.queries.relational import KW_CHI2_MICRO

    k = len(groups)
    counters = [Counter(g) for g in groups]
    total = Counter()
    for c in counters:
        total.update(c)
    vals = sorted(total)
    N = sum(total.values())

    # integer pipeline exactly as registered: doubled midranks d2, per-group
    # doubled rank sums S_i, A_micro via truncating div, cleared comparison
    d2 = {}
    cum = 0
    for v in vals:
        d2[v] = 2 * cum + total[v] + 1
        cum += total[v]
    s = [sum(c[v] * d2[v] for v in c) for c in counters]
    ni = [sum(c.values()) for c in counters]
    a_micro = sum((si * si * 10**6) // n for si, n in zip(s, ni))
    h2_num = 3 * a_micro - 3 * N * (N + 1) * (N + 1) * 10**6
    tie3 = sum(t**3 - t for t in total.values())
    denom = N**3 - N - tie3
    if denom == 0:
        h_corr_micro = 0
        cleared = False
    else:
        h_corr_micro = (max(h2_num, 0) * (N - 1)) // denom
        cleared = k > 1 and h2_num * (N - 1) > KW_CHI2_MICRO[k - 1] * denom

    # classical tie-corrected H from exact rationals (midrank = d2/2)
    if denom == 0 or k <= 1:
        assert not cleared
        assert h_corr_micro == 0
        return
    A = sum(Fraction(si * si, 4 * n) for si, n in zip(s, ni))  # sum R_i^2/n_i
    H = Fraction(12, N * (N + 1)) * A - 3 * (N + 1)
    Hc = H / (1 - Fraction(tie3, N**3 - N))
    q = Fraction(KW_CHI2_MICRO[k - 1], 10**6)
    # the registered form floors A*1e6 per group (<= 1 micro each), so only
    # a knife-edge within that slack may legitimately disagree
    slack = Fraction(3 * k * (N - 1), denom) * Fraction(1, 10**6)
    if abs(Hc - q) > slack:
        assert cleared == (Hc > q)
    # value check: h_corr_micro within the same truncation slack of exact Hc
    assert abs(Fraction(h_corr_micro, 10**6) - max(Hc, 0)) <= slack + Fraction(1, 10**6)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 30)),
        min_size=2,
        max_size=120,
    )
)
def test_kendall_dominance_grid_equals_bruteforce(points):
    """The dense-grid 2D-prefix-sum concordance counting in
    length_quality_kendall (queries/llmdata.py) must equal brute-force
    pair enumeration on ANY point set — including tie-heavy grids where
    most mass sits on few cells."""
    from collections import Counter

    cell = Counter(points)
    ts = sorted({t for t, _ in points})
    qmax = 30

    # grid algorithm exactly as registered: per-q running count over t
    # (ct_lt), then per-t prefix over q (s_ll) / suffix (s_lg)
    ct_lt = {}
    run = {q: 0 for q in range(qmax + 1)}
    for t in ts:
        for q in range(qmax + 1):
            ct_lt[(t, q)] = run[q]
        for q in range(qmax + 1):
            run[q] += cell.get((t, q), 0)
    C = D = 0
    for t in ts:
        pre = 0
        tot = sum(ct_lt[(t, q)] for q in range(qmax + 1))
        cum = 0
        for q in range(qmax + 1):
            s_ll = pre
            cum += ct_lt[(t, q)]
            s_lg = tot - cum
            n = cell.get((t, q), 0)
            C += n * s_ll
            D += n * s_lg
            pre += ct_lt[(t, q)]
    bC = bD = 0
    for i in range(len(points)):
        for j in range(i + 1, len(points)):
            d = (points[i][0] - points[j][0]) * (points[i][1] - points[j][1])
            if d > 0:
                bC += 1
            elif d < 0:
                bD += 1
    assert (C, D) == (bC, bD)


@settings(max_examples=150, deadline=None)
@given(
    st.integers(2, 6),
    st.lists(
        st.lists(st.integers(0, 8), min_size=6, max_size=6),
        min_size=2,
        max_size=40,
    ),
)
def test_friedman_cleared_form_equals_classical(k, blocks):
    """The doubled-rank cleared Friedman in value_location_friedman
    (queries/relational.py) must equal the classical tie-general statistic
    Q = (k-1)·Σ_j(R_j − n(k+1)/2)² / Σ_ij(r_ij − (k+1)/2)² EXACTLY (as
    rationals — the cleared form has no rounding at all), including
    tie-heavy and all-tied blocks."""
    from fractions import Fraction

    from postgres_cdc_example_spark.queries.relational import KW_CHI2_MICRO

    rows = [b[:k] for b in blocks]  # n blocks × k treatments
    n = len(rows)
    # doubled midranks per block: d = 2*cum_lt + tiecount + 1
    d = []
    for b in rows:
        db = []
        for v in b:
            lt = sum(1 for x in b if x < v)
            ties = sum(1 for x in b if x == v)
            db.append(2 * lt + ties + 1)
        d.append(db)
    r2j = [sum(d[i][j] for i in range(n)) for j in range(k)]
    N = (k - 1) * sum((r2 - n * (k + 1)) ** 2 for r2 in r2j)
    D = sum((dij - (k + 1)) ** 2 for row in d for dij in row)
    # classical from exact rationals (midrank = d/2, mean rank (k+1)/2)
    if D == 0:
        assert N == 0  # all-tied: every rank is the mean
        return
    Rj = [Fraction(r2, 2) for r2 in r2j]
    mean = Fraction(n * (k + 1), 2)
    qnum = (k - 1) * sum((R - mean) ** 2 for R in Rj)
    qden = sum(
        (Fraction(dij, 2) - Fraction(k + 1, 2)) ** 2 for row in d for dij in row
    )
    assert Fraction(N, D) == qnum / qden
    # the registered decision (N·1e6 > Q_micro·D) equals the rational
    # comparison Q > Q_micro/1e6 exactly — integers on both sides
    q_lit = KW_CHI2_MICRO[k - 1]
    assert (N * 10**6 > q_lit * D) == (Fraction(N, D) > Fraction(q_lit, 10**6))


@settings(max_examples=150, deadline=None)
@given(
    st.integers(2, 6),
    st.lists(
        st.lists(st.integers(0, 1), min_size=6, max_size=6),
        min_size=2,
        max_size=40,
    ),
)
def test_cochran_q_cleared_form_equals_classical(k, blocks):
    """The fully-integer cleared Cochran's Q in value_cochran_q
    (queries/relational.py) must equal the classical rational
    Q = k(k-1)·Σ(C_j − N/k)² / (k·ΣR_i − ΣR_i²) EXACTLY, including
    all-zero / all-one blocks (which contribute nothing to the
    denominator) and the fully degenerate zero-denominator corpus."""
    from fractions import Fraction

    from postgres_cdc_example_spark.queries.relational import KW_CHI2_MICRO

    rows = [b[:k] for b in blocks]
    n = len(rows)
    C = [sum(r[j] for r in rows) for j in range(k)]
    R = [sum(r) for r in rows]
    N = sum(C)
    nm = (k - 1) * sum((k * c - N) ** 2 for c in C)
    dn = k * (k * sum(R) - sum(r * r for r in R))
    if dn == 0:
        # every block all-0 or all-1: column totals are all equal, so the
        # numerator must vanish too (0/0 -> report 0, no-reject)
        assert nm == 0
        return
    classical = (
        Fraction(k * (k - 1))
        * sum((Fraction(c) - Fraction(N, k)) ** 2 for c in C)
        / (k * sum(R) - sum(r * r for r in R))
    )
    assert Fraction(nm, dn) == classical
    q_lit = KW_CHI2_MICRO[k - 1]
    assert (nm * 10**6 > q_lit * dn) == (
        Fraction(nm, dn) > Fraction(q_lit, 10**6)
    )


def test_chi2_table_overflow_reports_null_not_silent_zero(spark, tmp_path):
    """df > 10 exceeds the KW_CHI2_MICRO literal table. Without an explicit
    guard, the quantile CASE yields NULL, `x > NULL` is NULL, the WHEN
    does not match, and the CASE falls to ELSE 0 — a SILENT no-reject in
    BOTH engines (their three-valued logic agrees, so the oracle compare
    passes on the wrong answer). The guard must surface an honest NULL in
    both engines on a 12-event-type corpus."""
    import duckdb as _duckdb

    from postgres_cdc_example_spark.queries import REGISTRY

    rows = []
    eid = 0
    for u in range(8):
        for t in range(12):  # 12 types -> df = 11 > 10
            for j in range(3):
                eid += 1
                rows.append(
                    (
                        eid,
                        datetime.datetime(2024, 1, 1, 0, 0, eid % 60),
                        u,
                        f"type_{t:02d}",
                        # straddle COCHRAN_MILLI (value 150): some (user,
                        # type) maxima above, some below, so Cochran's
                        # denominator is nonzero and the df guard decides
                        # x = 1 iff the (u,t) max residue exceeds 75, which
                        # mixes 0s and 1s across blocks (the three j-residues
                        # are spaced 29 apart mod 97, so maxima range 58..96)
                        float((u * 7 + t * 13 + j * 29) % 97) * 2.0,
                        "{}",
                    )
                )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "sf_df11")
    os.makedirs(d)
    ev.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{os.path.join(d, 'events.parquet', '*.parquet')}')"
    )
    for name, col in [
        ("value_location_kruskalwallis", "reject_same_location"),
        ("value_location_friedman", "reject_same_location"),
        ("value_cochran_q", "reject_same_rate"),
    ]:
        q = REGISTRY[name]
        srow = q.fn(spark, d).collect()[0]
        assert srow[col] is None, f"{name}: Spark must report NULL for df=11"
        orow = con.execute(q.oracle).fetchone()
        ocols = [desc[0] for desc in con.description]
        assert orow[ocols.index(col)] is None, (
            f"{name}: oracle must report NULL for df=11"
        )


# ---------------------------------------------------------------------------
# round 9: trend & randomness family — cleared integer forms vs classical
# ---------------------------------------------------------------------------

Z2_MICRO = 3_841_459  # z²₀.₉₇₅ on the micro grid (= χ²₀.₉₅(1))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 500), min_size=3, max_size=40))
def test_mann_kendall_cleared_form_equals_classical(xs):
    """The all-integer decision 18e6·(|S|-1)² > z²_micro·var18 must equal
    the classical continuity-corrected two-sided z-test at alpha=0.05 —
    including tie-corrected variance and the |S|<=1 degenerate."""
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(xs)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
    )
    cleared = (
        abs(s) > 1
        and var18 > 0
        and (abs(s) - 1) ** 2 * 18_000_000 > Z2_MICRO * var18
    )
    if var18 > 0 and abs(s) > 1:
        z = (abs(s) - 1) / ((var18 / 18.0) ** 0.5)
        classical = z * z > Z2_MICRO / 1e6
        # the cleared form is EXACT; the float form can disagree only
        # within float rounding of z² against the literal — equality of
        # decisions holds because the literal itself is the micro grid
        assert cleared == classical
    else:
        assert not cleared


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 200), min_size=4, max_size=60))
def test_runs_test_cleared_form_equals_classical(xs):
    """(Rn - n - 2·n1·n2)²·(n-1)·1e6 > z²_micro·2n1n2(2n1n2-n) must equal
    the classical Wald-Wolfowitz normal-approximation decision with the
    lower-median binarization convention (ties count as 'below')."""
    n = len(xs)
    med = sorted(xs)[(n + 1) // 2 - 1]
    b = [1 if x > med else 0 for x in xs]
    runs = 1 + sum(1 for i in range(1, n) if b[i] != b[i - 1])
    n1 = sum(b)
    n2 = n - n1
    if n1 == 0 or n2 == 0 or 2 * n1 * n2 <= n:
        cleared = False
    else:
        diff = runs * n - n - 2 * n1 * n2
        cleared = diff * diff * (n - 1) * 1_000_000 > Z2_MICRO * 2 * n1 * n2 * (
            2 * n1 * n2 - n
        )
    if n1 > 0 and n2 > 0 and 2 * n1 * n2 > n:
        e_r = 1 + 2 * n1 * n2 / n
        var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
        z2 = (runs - e_r) ** 2 / var
        assert cleared == (z2 > Z2_MICRO / 1e6)
    else:
        assert not cleared


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 1000), min_size=7, max_size=50))
def test_ljung_box_micro_grid_within_quantization(xs):
    """Q_micro (the per-lag n(n+2)·r_k²_micro // (n-k) sum on the integer
    micro grid) must sit within the accumulated floor-quantization of the
    float Ljung-Box Q — per lag the floor loses < 1 micro before the
    n(n+2)//(n-k) factor, so |Q_micro/1e6 - Q| < 5·n(n+2)/(n-5)/1e6 + 5e-6
    is the hard bound."""
    n = len(xs)
    s = sum(xs)
    d = [n * x - s for x in xs]
    dss = sum(v * v for v in d)
    lags = [k for k in range(1, 6) if k < n]
    q_micro = 0
    q_float = 0.0
    for k in lags:
        ck = sum(d[t] * d[t + k] for t in range(n - k))
        if dss == 0:
            continue
        rk2_micro = (ck * ck * 1_000_000) // (dss * dss)
        q_micro += (n * (n + 2) * rk2_micro) // (n - k)
        q_float += n * (n + 2) * (ck / dss) ** 2 / (n - k)
    bound = 5 * n * (n + 2) / max(n - 5, 1) / 1e6 + 5e-6
    assert abs(q_micro / 1e6 - q_float) <= bound


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 300), min_size=2, max_size=25))
def test_theilsen_lower_median_pair_selection(xs):
    """row_number-selected lower median over (double slope, num, den) must
    pick exactly the classical lower median of the pairwise slope multiset
    (doubles of small-int ratios order rationals correctly here because
    IEEE division is correctly rounded and distinct small rationals are
    never merged by rounding at these magnitudes... EXCEPT when two
    distinct rationals round to the same double — then num/den tie-break
    keeps the order deterministic and the value chosen still equals a true
    lower-median slope)."""
    n = len(xs)
    pairs = [
        (xs[j] - xs[i], j - i) for i in range(n) for j in range(i + 1, n)
    ]
    ordered = sorted(pairs, key=lambda p: (p[0] / p[1], p[0], p[1]))
    chosen = ordered[(len(ordered) + 1) // 2 - 1]
    from fractions import Fraction

    slopes = sorted(Fraction(a, b) for a, b in pairs)
    true_lower_median = slopes[(len(slopes) + 1) // 2 - 1]
    assert Fraction(chosen[0], chosen[1]) == true_lower_median


def test_poisson_bootstrap_cdf_literals_are_exact():
    """The BOOT_CDF_MICRO literal table must be floor(P(X<=k)·1e6 + 0.5)
    for X ~ Poisson(1) — recomputed here from the series so a typo'd
    threshold (which would silently skew every replicate weight) fails
    loudly."""
    import math

    from postgres_cdc_example_spark.queries.extensions import BOOT_CDF_MICRO

    cdf = 0.0
    for k, lit in enumerate(BOOT_CDF_MICRO):
        cdf += math.exp(-1.0) / math.factorial(k)
        assert lit == math.floor(cdf * 1_000_000 + 0.5), k
    assert all(a < b for a, b in zip(BOOT_CDF_MICRO, BOOT_CDF_MICRO[1:]))


def test_poisson_bootstrap_weights_mean_near_one(spark, sf_dir):
    """Hash-CDF Poisson(1) weights must average ~1 per replicate (the
    construction's unbiasedness: E[n_eff] = N) — a broken uniform (e.g.
    a hex-parse bug making u constant) collapses every weight to the
    same value and fails the tolerance band."""
    from postgres_cdc_example_spark.queries import REGISTRY

    rows = REGISTRY["sample_poisson_bootstrap"].fn(spark, sf_dir).collect()
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    assert len(rows) == 16
    for r in rows:
        assert 0.8 * n <= r.n_eff <= 1.2 * n, (r.replicate, r.n_eff, n)
    # replicates must actually differ (independent draws)
    assert len({r.n_eff for r in rows}) > 1


def test_js_divergence_bounded_and_zero_on_self(spark, sf_dir):
    """JS is bounded by ln 2 (693147 micro) and ≥ ~0 (micro-rounding can
    dip a few micro below zero on near-identical distributions — bounded
    by the per-token half-micro rounding, never more than vocab·1 micro
    in magnitude)."""
    from postgres_cdc_example_spark.queries import REGISTRY

    rows = REGISTRY["source_token_js"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.js_micro <= 693_147 + 1, r
        assert r.js_micro >= -1_000, r


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=8),
        min_size=1,
        max_size=20,
    )
)
def test_fano_cleared_form_equals_zero_inflated_bruteforce(docs):
    """(n·S2 - T²)·1e6 // (n·T) computed from occurrence rows only must
    equal the brute-force Fano factor over the zero-PADDED per-doc count
    vector (population variance / mean) on the same micro grid."""
    n = len(docs)
    toks = sorted({t for d in docs for t in d})
    for tok in toks:
        counts = [d.count(tok) for d in docs]
        T = sum(counts)
        S2 = sum(c * c for c in counts)
        if T == 0:
            continue
        cleared = ((n * S2 - T * T) * 1_000_000) // (n * T)
        mean = T / n
        var = sum((c - mean) ** 2 for c in counts) / n
        # brute force on the micro grid: floor(var/mean * 1e6) — the two
        # must agree because (n·S2 - T²)/(n·T) IS var/mean exactly
        import math

        brute = math.floor(var / mean * 1_000_000 + 1e-9)
        assert abs(cleared - brute) <= 1, (tok, cleared, brute)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 100), st.sampled_from("abcdefgh")),
        min_size=1,
        max_size=60,
    )
)
def test_heaps_decile_buckets_equal_prefix_vocab(occ):
    """Cumulative first-occurrence decile counts must equal brute-force
    prefix vocabulary at every decile boundary: vocab(k) = |{tok :
    min_doc(tok) <= boundary_k}| with boundary via the same integer
    bucketing ((doc-1)*10 // max_id + 1)."""
    max_id = max(d for d, _ in occ)
    first = {}
    for d, t in occ:
        first[t] = min(first.get(t, d), d)
    from collections import Counter

    vh = Counter(((fd - 1) * 10) // max_id + 1 for fd in first.values())
    cum = 0
    for k in range(1, 11):
        cum += vh.get(k, 0)
        boundary_docs = {d for d, _ in occ if ((d - 1) * 10) // max_id + 1 <= k}
        brute = len(
            {t for t, fd in first.items() if ((fd - 1) * 10) // max_id + 1 <= k}
        )
        assert cum == brute, (k, cum, brute, boundary_docs)


# --- round-10 statistics: cleared-form equivalence proofs ---------------------


def _bf_pipeline(groups: list[list[int]]):
    """Pure-Python replica of value_levene_brownforsythe's integer
    pipeline (milli inputs): lower-median per group, z = 1000*|x - med|,
    micro-floored group means, ssw via the q - 2*zbar*s + n*zbar^2
    identity, ssb, and the cleared decision vs F_crit = 5991465//2."""
    stats = []
    for g in groups:
        sg = sorted(g)
        n = len(g)
        # smallest m with 2*cum >= n (the house lower-median probe)
        cum = 0
        med = sg[-1]
        for v in sg:
            cum += 1
            if 2 * cum >= n:
                med = v
                break
        z = [1000 * abs(x - med) for x in g]
        s, q = sum(z), sum(v * v for v in z)
        stats.append((n, s, q, s // n))
    nt = sum(n for n, _s, _q, _zb in stats)
    k = len(stats)
    zbar_all = sum(s for _n, s, _q, _zb in stats) // nt
    ssw = sum(q - 2 * zb * s + n * zb * zb for n, s, q, zb in stats)
    ssb = sum(n * (zb - zbar_all) ** 2 for n, _s, _q, zb in stats)
    crit = 5991465 // 2
    if ssw == 0:
        return ssw, ssb, None, 0
    f_micro = (ssb * (nt - k) * 1_000_000) // (ssw * (k - 1))
    return ssw, ssb, f_micro, 1 if f_micro > crit else 0


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 2000), min_size=2, max_size=60),
        min_size=3,
        max_size=3,
    )
)
def test_brownforsythe_ssw_identity_and_decision(groups):
    """(1) The q - 2*zbar*s + n*zbar^2 identity equals the direct
    sum-of-squares around the SAME integer mean exactly; (2) the cleared
    integer decision equals the Fraction-exact F > crit decision on the
    quantized pipeline (no float ever decides)."""
    from fractions import Fraction

    ssw, ssb, f_micro, reject = _bf_pipeline(groups)
    # direct ssw around the quantized mean, recomputed independently
    direct = 0
    for g in groups:
        sg = sorted(g)
        n, cum, med = len(g), 0, sorted(g)[-1]
        for v in sg:
            cum += 1
            if 2 * cum >= n:
                med = v
                break
        z = [1000 * abs(x - med) for x in g]
        zb = sum(z) // n
        direct += sum((v - zb) ** 2 for v in z)
    assert ssw == direct
    if f_micro is not None:
        nt = sum(len(g) for g in groups)
        k = len(groups)
        exact = Fraction(ssb * (nt - k), ssw * (k - 1))
        crit = Fraction(5991465 // 2, 1_000_000)
        # floor-micro vs exact: the decision can only differ inside one
        # micro-unit of the boundary; the cleared form IS the exact floor
        assert f_micro == (exact.numerator * 1_000_000) // exact.denominator
        assert reject == (1 if exact > crit else 0) or abs(
            exact - crit
        ) * 1_000_000 < 1


def _nelson_aalen(events: list[int], censored: list[int], horizon: int):
    """Pure replica of customer_churn_hazard's histogram pipeline."""
    from collections import Counter

    ev, cz = Counter(events), Counter(censored)
    all_t = sorted(set(ev) | set(cz))
    n_all = len(events) + len(censored)
    out, cum, cum_lt = [], 0, 0
    for t in all_t:
        n_risk = n_all - cum_lt
        if ev[t] > 0 and t <= horizon:
            h = ev[t] * 1_000_000 // n_risk
            cum += h
            out.append((t, n_risk, ev[t], h, cum))
        cum_lt += ev[t] + cz[t]
    return out


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=80),
    st.lists(st.integers(0, 60), min_size=1, max_size=40),
)
def test_nelson_aalen_risk_sets_match_bruteforce(events, censored):
    """The histogram/cumulative-window risk set equals the brute-force
    definition n(t) = #durations >= t, and the cumulative hazard is the
    running sum of floored per-day terms."""
    rows = _nelson_aalen(events, censored, horizon=90)
    durations = events + censored
    running = 0
    for t, n_risk, de, h, cum in rows:
        brute = sum(1 for d in durations if d >= t)
        assert n_risk == brute
        assert de == sum(1 for d in events if d == t)
        assert h == de * 1_000_000 // brute
        running += h
        assert cum == running
    # hazard rows exist iff events exist within the horizon
    assert bool(rows) == any(e <= 90 for e in events)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 500), min_size=3, max_size=120))
def test_acf_cleared_bartlett_equals_fraction_exact(xs):
    """orders_daily_autocorr's cleared significance gate
    c_k^2 * n * 10^4 > 38416 * dss^2 decides EXACTLY the same as the
    Fraction-exact |r| > 1.96/sqrt(n) test (1.96^2 = 3.8416 is the exact
    rational 38416/10^4 — no approximation anywhere)."""
    from fractions import Fraction

    n = len(xs)
    s = sum(xs)
    dv = [n * x - s for x in xs]
    dss = sum(d * d for d in dv)
    for k in range(1, min(7, n - 1) + 1):
        c_k = sum(dv[i] * dv[i + k] for i in range(n - k))
        cleared = c_k * c_k * n * 10_000 > 38416 * dss * dss
        if dss == 0:
            assert not cleared
            continue
        r = Fraction(c_k, dss)
        exact = r * r * n > Fraction(38416, 10_000)
        assert cleared == exact


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(1, 500), min_size=1, max_size=8)
)
def test_type_entropy_micro_error_bounded(counts):
    """user_type_entropy's per-term micro rounding then weighted sum then
    one truncating division lands within 2 micro-units of the exact
    float entropy — the error budget the docstring claims (0.5 micro per
    term weighted to <=0.5 total, +1 for the final floor)."""
    import math

    n = sum(counts)
    ws = sum(
        c * math.floor(math.log(n / c) * 1_000_000 + 0.5) for c in counts
    )
    got = ws // n
    exact = sum((c / n) * math.log(n / c) for c in counts) * 1_000_000
    assert abs(got - exact) <= 2


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=200))
def test_mattr_bounds_and_rename_invariance(tokens):
    """text_mattr's window sum: 1/W <= MATTR <= 1 always, and the score is
    invariant under any injective relabeling of the vocabulary (it
    measures structure, not identity)."""
    W = 25
    if len(tokens) >= W:
        dsum = sum(
            len(set(tokens[i : i + W])) for i in range(len(tokens) - W + 1)
        )
        nw = len(tokens) - W + 1
        micro = dsum * 1_000_000 // (nw * W)
    else:
        micro = len(set(tokens)) * 1_000_000 // len(tokens)
    assert 1_000_000 // W <= micro <= 1_000_000
    relabeled = [t + 1000 for t in tokens]
    if len(relabeled) >= W:
        dsum2 = sum(
            len(set(relabeled[i : i + W]))
            for i in range(len(relabeled) - W + 1)
        )
        micro2 = dsum2 * 1_000_000 // ((len(relabeled) - W + 1) * W)
    else:
        micro2 = len(set(relabeled)) * 1_000_000 // len(relabeled)
    assert micro == micro2
