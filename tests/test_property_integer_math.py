"""Property tests for the round-9 exact-integer constructions.

Pure-Python fuzz (no Spark session — these pin ALGEBRA, not plans):

* the BPE wrapped-string merge (one ``str.replace``; Python's replace has
  the same greedy left-to-right non-overlapping semantics as Spark's and
  DuckDB's, which ``tests/test_bpe_chain.py`` pins on fixed cases) must
  equal a reference greedy merge over the symbol list, for ANY symbol
  sequence and pair — including symbols that embed each other;
* the cross-multiplied z-score flag must equal the float formulation
  everywhere except inside the float's own ulp-uncertainty band.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

W = "\x02"

_SYM = st.text(alphabet="ab", min_size=1, max_size=3)


def _greedy_merge(syms: list[str], x: str, y: str) -> list[str]:
    """Reference BPE merge: scan left-to-right, merge non-overlapping
    (x, y) adjacencies, never re-merge a token formed in this pass."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(_SYM, min_size=1, max_size=12), _SYM, _SYM)
def test_wrapped_replace_equals_greedy_merge(syms, x, y):
    enc = "".join(W + s + W for s in syms)
    merged = enc.replace(W + x + W + W + y + W, W + x + y + W)
    got = merged[1:-1].split(W + W)
    assert got == _greedy_merge(syms, x, y)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=10, max_size=20),
    st.integers(min_value=0, max_value=10_000),
)
def test_zscore_cross_multiplication_equals_float_form(window, cents):
    n = len(window)
    s = sum(window)
    q = sum(v * v for v in window)
    lhs = (cents * n - s) ** 2 * (n - 1)
    rhs = 9 * n * (n * q - s * s)
    integer_flag = lhs > rhs
    # float reference: |x - mean| > 3 * sample_stddev
    mean = s / n
    var = (q - n * mean * mean) / (n - 1)
    float_flag = abs(cents - mean) > 3 * math.sqrt(max(var, 0.0))
    if integer_flag != float_flag:
        # disagreement is only legitimate inside the float form's own
        # rounding band — the exact integer side is the ground truth
        assert math.isclose(lhs, rhs, rel_tol=1e-9), (window, cents)
