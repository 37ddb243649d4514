"""Dual-run gate for the product-test TPC-DS golden directory.

``presto-product-tests/.../testcases/tpcds`` ships all 99 TPC-DS queries
(103 files, four as _1/_2 variants) with expected results pinned to real
TPC-DS data this environment doesn't have. The files are the benchto
corpus's text with UNQUALIFIED quoted references (``"store_returns"``,
``"sum"(...)``) — different grammar surface, same semantics.

This gate runs each file VERBATIM through :meth:`Engine.sql` over the
:mod:`presto_db_spark.benchto_tpcds` adapter views and value-checks the
result against DuckDB running the IDENTICAL text over the IDENTICAL view
layer (``USE tpcds.sf`` makes the unqualified names resolve there), the
same dual-run contract as :mod:`tests.test_benchto_tpcds_verbatim`.

Zero exclusions since r12 (mirroring the benchto twin): q78 rejoined the
gate via the shared oracle-double-rounding adjudication in
``tests/oracle_ties.py`` (VERDICT r11 #6) — its exact-decimal tie
(23/40 rounds HALF_UP to 0.58 like the reference; DuckDB's double
division lands below) is machine-verified against the recorded shape
and xfailed with the recorded reason, as are q18/q65's driver-scale
ties. q27/q14_1 rejoined in r11 once the adapter's late-window fact
slice made their ROLLUP inputs non-empty (see benchto_tpcds.py).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

TPCDS_DIR = (
    "/root/reference/presto-product-tests/src/main/resources/sql-tests/"
    "testcases/tpcds"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TPCDS_DIR), reason="reference product tests not present"
)

EXCLUDED: set[str] = set()
CASES = sorted(
    f[:-4]
    for f in os.listdir(TPCDS_DIR)
    if f.endswith(".sql") and f[:-4] not in EXCLUDED
) if os.path.isdir(TPCDS_DIR) else []


def _load(name: str) -> str:
    with open(f"{TPCDS_DIR}/{name}.sql") as f:
        text = f.read()
    body = "\n".join(
        ln for ln in text.splitlines() if not ln.strip().startswith("--")
    )
    return body.strip().rstrip(";")


@pytest.fixture(scope="module")
def dual(spark, sf_dir):
    from presto_db_spark.benchto_tpcds import (
        register_tpcds_duckdb, register_tpcds_views,
    )
    from presto_db_spark.engine import Engine

    names = register_tpcds_views(spark, sf_dir)
    con = duckdb.connect()
    register_tpcds_duckdb(con, sf_dir)
    con.execute("USE tpcds.sf")
    yield Engine(spark), con
    for n in names:
        spark.catalog.dropTempView(n)
    con.close()


def _norm_key(row):
    return tuple(f"{v:.6g}" if isinstance(v, float) else str(v) for v in row)


def _cell_match(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-6)
    return str(a) == str(b)


# Oracle-double-rounding ties (q78/q18/q65 — the q78 engine-semantics
# class) are adjudicated by the SHARED per-query mechanism in
# tests/oracle_ties.py (VERDICT r11 #6): on a value mismatch, the
# observed divergence must MATCH the query's recorded shape (cell tie /
# boundary selection, with bounded counts) to convert to xfail carrying
# the recorded reason string; anything else — including a NEW kind of
# divergence in these same files — re-raises and fails loudly.
from tests.oracle_ties import adjudicate  # noqa: E402


@pytest.mark.parametrize("name", CASES)
def test_tpcds_product_file_dualrun(dual, sf_dir, name):
    engine, con = dual
    sql = _load(name)
    spark_rows = [tuple(r) for r in engine.sql(sql).collect()]
    ora_rows = [tuple(r) for r in con.execute(sql).fetchall()]
    try:
        assert len(spark_rows) == len(ora_rows), (
            f"{name}: {len(spark_rows)} rows vs oracle {len(ora_rows)}"
        )
        for srow, orow in zip(
            sorted(spark_rows, key=_norm_key), sorted(ora_rows, key=_norm_key)
        ):
            assert len(srow) == len(orow), f"{name}: arity {srow} vs {orow}"
            for sv, ov in zip(srow, orow):
                assert _cell_match(sv, ov), (
                    f"{name}: {srow} vs {orow} ({sv!r}≠{ov!r})"
                )
    except AssertionError:
        reason = adjudicate(name, spark_rows, ora_rows)
        if reason:
            pytest.xfail(reason)
        raise
