"""Oracle-double-rounding adjudications, shared by the dual-run gates.

VERDICT r11 directive #6: the decimal-vs-double rounding tie has three
adjudicated instances (q78, q18, q65 — each investigated manually in
r09-r11). This module promotes those adjudications into ONE documented,
opt-in, per-query mechanism so a future tie doesn't cost a fresh manual
investigation — and so the xfail reason string recorded in the pytest
artifact always names the shared adjudication record.

This is NOT a blanket epsilon. A query is eligible only if it has an
entry in :data:`ADJUDICATED`, and the observed divergence must MATCH the
recorded shape exactly; anything else re-raises the original assertion
(a NEW kind of divergence in these files still fails loudly).

Two adjudicated shapes, both rooted in the same engine-semantics fact —
Spark (like the reference's Presto decimal arithmetic) evaluates
DECIMAL expressions exactly and rounds HALF_UP, while DuckDB evaluates
them in IEEE double whose value can land an ulp on the other side of
the .5 boundary:

* ``cell_tie`` — the row sets agree; a handful of numeric output cells
  differ by exactly one unit in the last rounded decimal place
  (|a − b| ≤ 0.01). q78: round(DECIMAL 23/40, 2) → Spark/Presto 0.58,
  DuckDB 0.57. q18: an avg over exact cents landing on a half-cent tie
  (6105.975 → 6105.97 vs 6105.98).
* ``boundary_selection`` — the tie sits inside a PREDICATE, so the
  engines disagree about which rows qualify: q65 filters
  ``revenue <= 0.1 * avg(revenue)`` where the double avg and the exact
  decimal avg straddle a boundary item; each engine emits the same row
  COUNT but up to ``max_rows`` rows are swapped for their
  across-the-boundary twins. Verified by requiring an equal-size,
  bounded symmetric difference with everything else identical.
"""

from __future__ import annotations

import decimal
import math

# One rounding unit in the last rounded decimal place of the affected
# columns (all three instances round money/ratios to 2 places).
TIE_UNIT = 0.01

ADJUDICATED: dict[str, dict] = {
    "q78": {
        "class": "cell_tie",
        "max_cells": 4,
        "reason": (
            "round(DECIMAL ratio, 2) knife edge (23/40 = 0.575): Spark "
            "divides in exact decimal and rounds HALF_UP to 0.58 like the "
            "reference's decimal arithmetic; DuckDB divides in double "
            "(0.5749999…) and emits 0.57 — the ORACLE is the deviant "
            "engine (adjudicated r10; mechanism r12)"
        ),
    },
    "q18": {
        "class": "cell_tie",
        "max_cells": 4,
        "reason": (
            "avg over exact cents landing on a half-cent tie (measured "
            "r10: 6105.975 → Spark exact-decimal 6105.97 vs DuckDB double "
            "6105.98); trips only at the sf0.01 fixture (adjudicated r10; "
            "mechanism r12)"
        ),
    },
    "q65": {
        "class": "boundary_selection",
        "max_rows": 4,
        "reason": (
            "revenue <= 0.1*avg(revenue) boundary: DuckDB's double avg "
            "(order-dependent under AQE partition orders) and Spark's "
            "exact decimal avg straddle a boundary item, swapping up to a "
            "few qualifying rows; trips only at the sf0.01 fixture "
            "(adjudicated r10; mechanism r12)"
        ),
    },
}


def _is_num(v) -> bool:
    return isinstance(v, (float, decimal.Decimal)) and not isinstance(v, bool)


def _coarse_key(row) -> tuple:
    # Alignment key: floats rounded to 1 place so a last-cent tie doesn't
    # split the pair; everything else stringified.
    return tuple(
        f"{float(v):.1f}" if _is_num(v) else str(v) for v in row
    )


def _norm_row(row) -> tuple:
    return tuple(
        f"{float(v):.4f}" if _is_num(v) else str(v) for v in row
    )


def _cells_tie(srow, orow, budget: list[int]) -> bool:
    if len(srow) != len(orow):
        return False
    for sv, ov in zip(srow, orow):
        if _is_num(sv) or _is_num(ov):
            if sv is None or ov is None:
                if sv is not ov:
                    return False
                continue
            fa, fb = float(sv), float(ov)
            if math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-6):
                continue
            if abs(fa - fb) > TIE_UNIT + 1e-9:
                return False
            budget[0] += 1
        elif str(sv) != str(ov):
            return False
    return True


def adjudicate(name: str, spark_rows, ora_rows) -> str | None:
    """Return the recorded reason string iff the divergence between the
    two row lists matches ``name``'s adjudicated shape; ``None``
    otherwise (the caller re-raises its original assertion).
    """
    rec = ADJUDICATED.get(name)
    if rec is None or len(spark_rows) != len(ora_rows):
        return None
    if rec["class"] == "cell_tie":
        budget = [0]
        for srow, orow in zip(
            sorted(spark_rows, key=_coarse_key),
            sorted(ora_rows, key=_coarse_key),
        ):
            if not _cells_tie(srow, orow, budget):
                return None
        if not (0 < budget[0] <= rec["max_cells"]):
            return None
        return (
            f"{name}: {budget[0]} cell(s) off by one rounding unit "
            f"(≤ {TIE_UNIT}) — {rec['reason']}"
        )
    # boundary_selection: equal-size bounded symmetric difference, the
    # shared rows identical (cell ties inside shared rows also allowed —
    # same root cause).
    from collections import Counter

    sc = Counter(_norm_row(r) for r in spark_rows)
    oc = Counter(_norm_row(r) for r in ora_rows)
    only_s = list((sc - oc).elements())
    only_o = list((oc - sc).elements())
    # absorb cell-tie pairs among the leftovers first
    budget = [0]
    unpaired_s = []
    for srow in sorted(only_s):
        matched = False
        for i, orow in enumerate(only_o):
            b2 = [budget[0]]
            if _cells_tie(srow, orow, b2):
                budget[0] = b2[0]
                only_o.pop(i)
                matched = True
                break
        if not matched:
            unpaired_s.append(srow)
    n_swapped = max(len(unpaired_s), len(only_o))
    if n_swapped == 0 and budget[0] == 0:
        return None
    if len(unpaired_s) != len(only_o) or n_swapped > rec["max_rows"]:
        return None
    return (
        f"{name}: {n_swapped} boundary row(s) selected differently "
        f"(+{budget[0]} cell tie(s)) — {rec['reason']}"
    )
