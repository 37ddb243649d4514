"""Property tests for the r11h-n exact-integer math identities.

Each operator docstring claims an algebraic identity lets the engine
avoid floats/recursion; these tests pin the identities themselves in
pure Python (no Spark session), so a future edit that breaks the algebra
fails in milliseconds, not in a full oracle sweep.
"""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


# --- two-stage truncating-division identity (part_gini_concentration) -------

@given(
    num=st.integers(min_value=0, max_value=9 * 10**15),
    den=st.integers(min_value=1, max_value=9 * 10**15),
)
def test_two_stage_division_identity(num, den):
    direct = (num * 10**6) // den  # exact in Python bigints
    staged = (num * 1000 // den) * 1000 + ((num * 1000 % den) * 1000) // den
    assert staged == direct
    # and the widest int64 intermediate really is num*1000
    assert num * 1000 <= 9 * 10**18


# --- SES dyadic unroll (events_ses_forecast) ---------------------------------

@given(xs=st.lists(st.integers(min_value=-10**7, max_value=10**7),
                   min_size=1, max_size=16))
def test_ses_dyadic_unroll_matches_recurrence(xs):
    level = Fraction(xs[0])
    for x in xs[1:]:
        level = (Fraction(x) + level) / 2
    n = len(xs)
    num = xs[0] + sum(xs[i] * (1 << (i - 1)) for i in range(1, n))
    assert Fraction(num, 1 << (n - 1)) == level


# --- Holt 4^t state scaling (events_holt_linear) ------------------------------

@given(xs=st.lists(st.integers(min_value=-10**6, max_value=10**6),
                   min_size=1, max_size=8))
def test_holt_integer_recurrence_matches_rational(xs):
    lv, b = Fraction(xs[0]), Fraction(0)
    for x in xs[1:]:
        lv_new = (Fraction(x) + lv + b) / 2
        b = (lv_new - lv + b) / 2
        lv = lv_new
    lint, bint = 4 * xs[0], 0
    for t, x in enumerate(xs[1:], start=2):
        cl, cb = 1 << (2 * t - 1), 1 << (2 * t - 2)
        lint, bint = cl * x + 2 * lint + 2 * bint, cb * x - lint + 3 * bint
    n = len(xs)
    # exact claim: L_n = 4^n * l_n, B_n = 4^n * b_n
    assert Fraction(lint) == lv * 4**n
    assert Fraction(bint) == b * 4**n


# --- tie-aware Mann-Whitney fold (ml_roc_auc) ---------------------------------

@given(data=st.lists(st.tuples(st.integers(min_value=-50, max_value=50),
                               st.booleans()),
                     min_size=2, max_size=200))
def test_mann_whitney_grouped_fold_matches_bruteforce(data):
    pos = [s for s, y in data if y]
    neg = [s for s, y in data if not y]
    if not pos or not neg:
        return
    # brute force 2U
    u2 = 0
    for p in pos:
        for q in neg:
            u2 += 2 if p > q else (1 if p == q else 0)
    # grouped fold over distinct scores ascending
    scores = sorted(set(s for s, _ in data))
    cneg_below, fold = 0, 0
    for s in scores:
        p_n = sum(1 for v in pos if v == s)
        n_n = sum(1 for v in neg if v == s)
        fold += p_n * (2 * cneg_below + n_n)
        cneg_below += n_n
    assert fold == u2


# --- KS packed-cumsum unpack (ml_ks_statistic) ---------------------------------

@given(counts=st.lists(st.tuples(st.integers(min_value=0, max_value=10**5),
                                 st.integers(min_value=0, max_value=10**5)),
                       min_size=1, max_size=100))
def test_ks_packed_cumsum_unpack(counts):
    cpos = cneg = csum = 0
    for p, n in counts:
        cpos += p
        cneg += n
        csum += p * (1 << 31) + n
        assert csum // (1 << 31) == cpos
        assert csum % (1 << 31) == cneg


# --- Benford leading digit via string (events_benford_deviation) ---------------

@given(cents=st.integers(min_value=1, max_value=10**12))
def test_benford_digit_string_equals_log_free_math(cents):
    by_string = int(str(cents)[0])
    by_math = cents // 10 ** int(math.floor(math.log10(cents)))
    assert by_string == by_math


# --- Gini rank identity (part_gini_concentration) -------------------------------

@given(xs=st.lists(st.integers(min_value=0, max_value=10**6), min_size=2,
                   max_size=100))
def test_gini_rank_identity_matches_mean_difference(xs):
    s = sum(xs)
    if s == 0:
        return
    n = len(xs)
    xs_sorted = sorted(xs)
    rank_form = Fraction(
        2 * sum(i * x for i, x in enumerate(xs_sorted, start=1)) - (n + 1) * s,
        n * s,
    )
    # definitional form: half the relative mean absolute difference
    mad = sum(abs(a - b) for a in xs for b in xs)
    definitional = Fraction(mad, 2 * n * n) / Fraction(s, n)
    assert rank_form == definitional


# --- assortativity cancellation (graph_assortativity) ---------------------------

@given(edges=st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                      min_size=1, max_size=60).map(
                          lambda es: [(a, b) for a, b in es if a != b]))
def test_assortativity_sqrt_cancels_on_symmetric_list(edges):
    if not edges:
        return
    sym = edges + [(b, a) for a, b in edges]
    deg: dict[int, int] = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    dx = [deg[a] for a, _ in sym]
    dy = [deg[b] for _, b in sym]
    n = len(sym)
    s1x, s1y = sum(dx), sum(dy)
    s2x, s2y = sum(v * v for v in dx), sum(v * v for v in dy)
    assert s1x == s1y and s2x == s2y  # the cancellation premise
    den = n * s2x - s1x * s1x
    if den == 0:
        return
    sxy = sum(a * b for a, b in zip(dx, dy))
    r_exact = Fraction(n * sxy - s1x * s1y, den)
    # cross-check against the float Pearson on the same pairs
    mx = s1x / n
    cov = sum((a - mx) * (b - mx) for a, b in zip(dx, dy))
    var = sum((a - mx) ** 2 for a in dx)
    assert abs(float(r_exact) - cov / var) < 1e-9


# --- tar geometry (train_webdataset_index) ---------------------------------------

@given(sizes=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                      max_size=50))
def test_tar_member_geometry(sizes):
    off = 0
    for n in sizes:
        member = 512 + ((n + 511) // 512) * 512
        assert member % 512 == 0
        assert member >= 512 + n
        assert member - 512 - n < 512  # minimal padding
        payload_offset = off + 512
        assert payload_offset % 512 == 0 or off % 512 != 0
        off += member


# --- Welch cross-multiplied decision (events_ab_welch_ttest, r11q) -----------

@given(
    xs=st.lists(st.integers(min_value=0, max_value=10**6), min_size=2, max_size=40),
    ys=st.lists(st.integers(min_value=0, max_value=10**6), min_size=2, max_size=40),
)
def test_welch_cross_multiplication_matches_rational(xs, ys):
    na, nb = len(xs), len(ys)
    sa, sb = sum(xs), sum(ys)
    qa, qb = sum(x * x for x in xs), sum(y * y for y in ys)
    dd = sa * nb - sb * na
    van, vbn = na * qa - sa * sa, nb * qb - sb * sb
    lhs = dd * dd * (na - 1) * (nb - 1) * 10**6
    rhs = 3_841_459 * (van * nb * nb * (nb - 1) + vbn * na * na * (na - 1))
    # rational ground truth: t^2 = (m1-m2)^2 / (v1/n1 + v2/n2)
    m = Fraction(sa, na) - Fraction(sb, nb)
    vterm = Fraction(van, na * na * (na - 1)) + Fraction(vbn, nb * nb * (nb - 1))
    if vterm == 0:
        assert rhs == 0
        return
    t2 = m * m / vterm
    assert (lhs > rhs) == (t2 > Fraction(3_841_459, 10**6))


# --- tie-corrected Mann-Whitney decision (events_ab_mann_whitney, r11q) ------

@given(
    data=st.lists(
        st.tuples(st.integers(min_value=0, max_value=12), st.booleans()),
        min_size=2, max_size=60,
    )
)
def test_mann_whitney_tie_corrected_identity(data):
    if not any(a for _, a in data) or all(a for _, a in data):
        return
    n = len(data)
    na = sum(1 for _, a in data if a)
    # grouped fold: per distinct value, counts and cum_before
    vals = sorted({v for v, _ in data})
    r2a = 0
    ties = 0
    cum = 0
    for v in vals:
        cnt = sum(1 for x, _ in data if x == v)
        cnt_a = sum(1 for x, a in data if x == v and a)
        r2a += cnt_a * (2 * cum + cnt + 1)
        ties += cnt**3 - cnt
        cum += cnt
    # brute-force doubled rank sum with average ranks over ties
    by_val = sorted(range(n), key=lambda i: data[i][0])
    r2a_brute = 0
    i = 0
    while i < n:
        j = i
        while j < n and data[by_val[j]][0] == data[by_val[i]][0]:
            j += 1
        avg2 = (i + 1) + j  # 2*average of ranks i+1..j
        for k in range(i, j):
            if data[by_val[k]][1]:
                r2a_brute += avg2
        i = j
    assert r2a == r2a_brute
    d = r2a - na * (na + 1) - na * (n - na)
    tt = n**3 - n - ties
    if tt == 0:
        return
    z2 = Fraction(3 * d * d * n * (n - 1), na * (n - na) * tt)
    lhs = 3 * d * d * n * (n - 1) * 10**6
    rhs = 3_841_459 * na * (n - na) * tt
    assert (lhs > rhs) == (z2 > Fraction(3_841_459, 10**6))


# --- Cramer 3x3 normal equations (ml_multiple_regression, r11s) --------------

@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=10),
            st.integers(min_value=0, max_value=10**6),
        ),
        min_size=4, max_size=40,
    )
)
def test_cramer_3x3_solves_normal_equations(rows):
    n = len(rows)
    a = sum(x1 for x1, _, _ in rows)
    b = sum(x2 for _, x2, _ in rows)
    c = sum(x1 * x1 for x1, _, _ in rows)
    d = sum(x1 * x2 for x1, x2, _ in rows)
    e = sum(x2 * x2 for _, x2, _ in rows)
    sy = sum(y for _, _, y in rows)
    s1y = sum(x1 * y for x1, _, y in rows)
    s2y = sum(x2 * y for _, x2, y in rows)
    det_a = n * (c * e - d * d) - a * (a * e - b * d) + b * (a * d - b * c)
    det_0 = sy * (c * e - d * d) - a * (s1y * e - d * s2y) + b * (s1y * d - c * s2y)
    det_1 = n * (s1y * e - d * s2y) - sy * (a * e - b * d) + b * (a * s2y - b * s1y)
    det_2 = n * (c * s2y - d * s1y) - a * (a * s2y - b * s1y) + sy * (a * d - b * c)
    if det_a == 0:
        return  # singular (collinear features) — the op reports via TDIV guard
    b0, b1, b2 = (Fraction(x, det_a) for x in (det_0, det_1, det_2))
    # the solution must satisfy the normal equations A·beta = rhs exactly
    assert n * b0 + a * b1 + b * b2 == sy
    assert a * b0 + c * b1 + d * b2 == s1y
    assert b * b0 + d * b1 + e * b2 == s2y


# --- gaps-and-islands run invariant (win_gaps_islands, r11p) -----------------

@given(
    keys=st.sets(st.integers(min_value=0, max_value=200), min_size=1, max_size=60)
)
def test_islands_key_minus_rank_invariant(keys):
    ordered = sorted(keys)
    grp = [k - (i + 1) for i, k in enumerate(ordered)]
    # constant within each maximal consecutive run, strictly increasing across runs
    runs = []
    for k, g in zip(ordered, grp):
        if runs and runs[-1][1] == g:
            runs[-1][0].append(k)
        else:
            runs.append(([k], g))
    for ks, _ in runs:
        assert all(b - a == 1 for a, b in zip(ks, ks[1:]))
    for (ks1, g1), (ks2, g2) in zip(runs, runs[1:]):
        assert ks2[0] - ks1[-1] > 1  # maximality: runs are separated by a gap
        assert g2 > g1


# --- Holt-Winters closed linear form (events_holt_winters, r11u) -------------

@settings(deadline=None)  # first call pays the events-module import
@given(xs=st.lists(st.integers(min_value=-10**6, max_value=10**6),
                   min_size=12, max_size=12))
def test_holt_winters_coefs_match_fraction_recurrence(xs):
    from presto_db_spark.operators.events import _HW_DEN, _hw_coefs

    # ground truth: the additive HW recurrence in exact rationals
    m = 4
    L = Fraction(sum(xs[:4]), 4)
    B = Fraction(0)
    s = [Fraction(xs[i]) - L for i in range(m)]
    for t in range(5, 13):
        x = Fraction(xs[t - 1])
        slot = (t - 1) % m
        L_new = (x - s[slot]) / 2 + (L + B) / 2
        B = (L_new - L) / 2 + B / 2
        s[slot] = (x - L_new) / 2 + s[slot] / 2
        L = L_new
    cl, cb, cs = _hw_coefs()
    dot = lambda coef: sum(k * x for k, x in zip(coef, xs))
    assert Fraction(dot(cl), _HW_DEN) == L
    assert Fraction(dot(cb), _HW_DEN) == B
    # slot 1 (index 0) was last updated at t=9 → scale 4^6
    assert Fraction(dot(cs[0]), 4**6) == s[0]
