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
