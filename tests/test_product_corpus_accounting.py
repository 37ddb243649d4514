"""Exhaustive accounting of the reference's product-test SQL corpus.

VERDICT r06 directive #4: every ``.sql`` under
``presto-product-tests/src/main/resources/sql-tests/testcases/`` must be
accounted for — exact-replayed, dual-run, semantically covered, an
environment gate, or a documented deviation.  This gate recomputes the
classification FROM THE ACTUAL SELECTION LOGIC of the replay/dual-run
modules (imports their constants, re-applies their skip predicates), so
it breaks the moment a gate drifts, and asserts the buckets partition the
corpus with zero unaccounted files.  COVERAGE.md's residual table mirrors
these counts.
"""

from __future__ import annotations

import os
import re

import pytest

ROOT = "/root/reference/presto-product-tests/src/main/resources/sql-tests"
CASES = f"{ROOT}/testcases"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CASES), reason="reference product tests not present"
)


def _all_sql() -> list[str]:
    out = []
    for root, _dirs, files in os.walk(CASES):
        for f in files:
            if f.endswith(".sql"):
                out.append(
                    os.path.relpath(os.path.join(root, f[:-4]), CASES)
                )
    return sorted(out)


def classify() -> dict[str, str]:
    from tests.test_product_dualrun import (
        DEVIATIONS as DUAL_DEVIATIONS,
        HIVE_TPCH,
        SKIPPED_PAIRS,
        TPCH_CONNECTOR,
    )
    from tests.test_product_dualrun_tpcds import EXCLUDED as TPCDS_EXCLUDED
    from tests.test_product_golden import (
        _MULTI_CASES,
        DEVIATIONS,
        _INSERT_CASES,
        _case_missing_tables,
        _load_case,
        _pairs,
    )

    cat: dict[str, str] = {}

    for case in _pairs():
        query, tables, _o, _e = _load_case(case)
        if case in DEVIATIONS:
            cat[case] = "deviation-documented"
        elif "show functions" in query.lower():
            cat[case] = "show-functions-dump (registration gate)"
        elif _case_missing_tables(query, tables):
            cat[case] = "dual-run (missing tiny content)"
        else:
            cat[case] = "exact-replay"

    for case in SKIPPED_PAIRS + HIVE_TPCH + TPCH_CONNECTOR:
        cat[case] = (
            "deviation-documented" if case in DUAL_DEVIATIONS else "dual-run"
        )

    for f in sorted(os.listdir(f"{CASES}/tpcds")):
        if f.endswith(".sql"):
            name = f[:-4]
            cat[f"tpcds/{name}"] = (
                "deviation-documented (engine semantics)"
                if name in TPCDS_EXCLUDED
                else "dual-run (tpcds)"
            )

    for case in _INSERT_CASES:
        cat[f"insert/{case}"] = "exact-replay (insert corpus)"
    for case in _MULTI_CASES:
        cat[case] = "exact-replay (multi-section)"
    for case in ("ml_functions/prediction", "ml_functions/varcharPrediction"):
        cat[case] = "exact-replay (test_ml.py)"
    cat["orc/select_varchar_orc_dictionary"] = (
        "exact-replay (shipped ORC binary, test_product_residual)"
    )
    cat["tables_with_header_and_footer"] = (
        "exact-replay (regenerated fixtures + read_text_skipping, "
        "test_product_residual)"
    )

    for case in _all_sql():
        if case.startswith("connectors/"):
            cat[case] = (
                "environment gate (external mysql/postgresql/sqlserver "
                "server; JDBC machinery live-tested vs embedded Derby)"
            )
    return cat


def test_every_corpus_file_accounted():
    cat = classify()
    files = _all_sql()
    missing = [f for f in files if f not in cat]
    stale = [f for f in cat if f not in files]
    assert not missing, f"unaccounted corpus files: {missing}"
    assert not stale, f"accounting references nonexistent files: {stale}"
    assert len(files) == len(cat)


def test_accounting_summary_matches_coverage_md():
    """The counts table in COVERAGE.md must match the recomputed buckets
    (collapsed to the headline groups) — docs may never drift from the
    actual gates."""
    from collections import Counter

    cat = classify()

    def group(v: str) -> str:
        if v.startswith("exact-replay"):
            return "exact-replay"
        if v.startswith("dual-run"):
            return "dual-run"
        if v.startswith("show-functions"):
            return "show-functions-dump"
        if v.startswith("deviation"):
            return "deviation-documented"
        return "environment-gate"

    counts = Counter(group(v) for v in cat.values())
    text = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "COVERAGE.md")
    ).read()
    for key, n in counts.items():
        assert f"{key}: {n}" in text, (
            f"COVERAGE.md lacks '{key}: {n}' "
            f"(recomputed buckets: {dict(counts)}, total {sum(counts.values())})"
        )
    assert f"total: {sum(counts.values())}" in text
