"""Dual-run gate for golden pairs whose shipped .result can't replay.

~36 pairs of the reference's product-test corpus
(``presto-product-tests/src/main/resources/sql-tests/testcases``) skip the
exact-replay gate (:mod:`tests.test_product_golden`) because they need
TPC-H tables whose tiny-SF *content* isn't available (part / orders /
lineitem / partsupp), and two whole directories — ``hive_tpch`` (the 22
TPC-H queries verbatim) and ``tpch_connector`` — ship expectations pinned
to SF1 / tiny dbgen data. Their GRAMMAR was therefore unexercised.

This gate runs each such ``.sql`` through :meth:`Engine.sql` AND through
DuckDB on the SAME synthesized table layer (the benchto adapter of
:mod:`presto_db_spark.benchto` — deterministic pure-SQL column synthesis,
identical text in both engines), ignoring the shipped ``.result``. The
comparison is the benchto-verbatim comparator: row count + order-
insensitive multiset with float tolerance.

Two table spellings appear in the corpus and both are mounted:

* ``tpch.tiny.X`` references with UNPREFIXED columns (the tpch-connector
  schema) → rewritten to ``tiny_X`` views (``register_benchto_views``
  with prefix ``tiny_``);
* bare ``lineitem`` / ``part`` / ``partsupp`` references with PREFIXED
  columns (the hive-loaded schema) → full-column prefixed views derived
  from the same adapter (``p_mfgr``, ``ps_supplycost``, ``l_shipmode``...
  all present, so q02/q16/q20-class queries run).
"""

from __future__ import annotations

import math
import os
import re

import duckdb
import pytest

ROOT = "/root/reference/presto-product-tests/src/main/resources/sql-tests"
CASES = f"{ROOT}/testcases"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CASES), reason="reference product tests not present"
)

# TPC-H prefixed column layout: prefixed name = <abbr>_<benchto column>.
PREFIXED = {
    "region": ("r", ["regionkey", "name", "comment"]),
    "nation": ("n", ["nationkey", "name", "regionkey", "comment"]),
    "supplier": ("s", ["suppkey", "name", "address", "nationkey", "phone",
                        "acctbal", "comment"]),
    "customer": ("c", ["custkey", "name", "address", "nationkey", "phone",
                        "acctbal", "mktsegment", "comment"]),
    "part": ("p", ["partkey", "name", "mfgr", "brand", "type", "size",
                    "container", "retailprice", "comment"]),
    "orders": ("o", ["orderkey", "custkey", "orderstatus", "totalprice",
                      "orderdate", "orderpriority", "clerk", "shippriority",
                      "comment"]),
    "lineitem": ("l", ["orderkey", "partkey", "suppkey", "linenumber",
                        "quantity", "extendedprice", "discount", "tax",
                        "returnflag", "linestatus", "shipdate", "commitdate",
                        "receiptdate", "shipinstruct", "shipmode", "comment"]),
    "partsupp": ("ps", ["partkey", "suppkey", "availqty", "supplycost",
                         "comment"]),
}


def _prefixed_body(table: str, inner: str) -> str:
    """SELECT text (same in both engines) mapping the unprefixed adapter
    body *inner* to the hive-style prefixed column names."""
    abbr, cols = PREFIXED[table]
    proj = ", ".join(f"{c} AS {abbr}_{c}" for c in cols)
    return f"SELECT {proj} FROM ({inner}) __u"


@pytest.fixture(scope="module")
def dual(spark, sf_dir):
    """(engine, duckdb-conn) with the identical dual table layer mounted.

    The unprefixed adapter bodies reference the raw driver tables through
    dedicated ``__dr_<t>`` names (Spark temp views resolve lazily by name,
    so registering a view called ``region`` over a body that itself says
    ``FROM region`` would be a cycle)."""
    from presto_db_spark.benchto import view_definitions
    from presto_db_spark.catalog import load_table
    from presto_db_spark.engine import Engine

    for t in PREFIXED:
        if t != "partsupp":  # synthesized — no driver parquet
            load_table(spark, sf_dir, t).createOrReplaceTempView(f"__dr_{t}")
    defs_s = view_definitions(
        raw=lambda t: f"__dr_{t}", s=lambda x: f"CAST({x} AS STRING)"
    )
    for table, body in defs_s.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW tiny_{table} AS {body}")
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW {table} AS "
            f"{_prefixed_body(table, body)}"
        )

    con = duckdb.connect()
    try:
        con.execute("CREATE MACRO date(x) AS CAST(x AS DATE)")
    except Exception:
        pass
    defs_d = view_definitions(
        raw=lambda t: f"read_parquet('{sf_dir}/{t}.parquet')",
        s=lambda x: f"CAST({x} AS VARCHAR)",
    )
    for table, body in defs_d.items():
        con.execute(f"CREATE OR REPLACE VIEW tiny_{table} AS {body}")
        con.execute(
            f"CREATE OR REPLACE VIEW {table} AS {_prefixed_body(table, body)}"
        )

    yield Engine(spark), con
    for table in PREFIXED:
        spark.catalog.dropTempView(table)
        spark.catalog.dropTempView(f"tiny_{table}")
        if table != "partsupp":
            spark.catalog.dropTempView(f"__dr_{table}")
    con.close()


# --- corpus enumeration ------------------------------------------------------

def _table_skipped_pairs():
    """The pairs the exact-replay gate skips for missing table content
    (shared selection logic: a pair promoted to exact-replay — e.g. the
    19 partkey=272 window pairs, r13 — leaves this bucket automatically)."""
    from tests.test_product_golden import (
        DEVIATIONS, _case_missing_tables, _load_case, _pairs,
    )

    out = []
    for case in _pairs():
        query, tables, _opts, _exp = _load_case(case)
        if case in DEVIATIONS or "show functions" in query.lower():
            continue
        if _case_missing_tables(query, tables):
            out.append(case)
    return out


def _dir_cases(d: str) -> list[str]:
    p = f"{CASES}/{d}"
    if not os.path.isdir(p):
        return []
    return [
        f"{d}/{f[:-4]}" for f in sorted(os.listdir(p))
        if f.endswith(".sql") and os.path.exists(f"{p}/{f[:-4]}.result")
    ]


SKIPPED_PAIRS = _table_skipped_pairs()
HIVE_TPCH = _dir_cases("hive_tpch")
TPCH_CONNECTOR = _dir_cases("tpch_connector")

# Documented oracle deviations: the Spark side still must RUN (grammar
# exercised through Engine.sql); the DuckDB cross-check is waived with the
# reason recorded.
ORACLE_DEVIATIONS: dict[str, str] = {}

# Documented full deviations (neither side runs meaningfully) — recorded,
# not silently skipped.
DEVIATIONS = {
    "tpch_connector/showSchemas":
        "SHOW SCHEMAS FROM tpch enumerates the static tpch connector's "
        "scale-factor schemas (tiny/sf1/...); the engine is single-catalog "
        "Spark — the SHOW SCHEMAS surface itself is covered by "
        "tests/test_systemcat.py over the live session catalog",
    "tpch_connector/showTables":
        "SHOW TABLES FROM tpch.sf1 — same static-connector enumeration; "
        "SHOW TABLES over the live catalog is covered in test_systemcat",
}


def _load_query(case: str) -> str:
    with open(f"{CASES}/{case}.sql") as f:
        text = f.read()
    body = "\n".join(
        ln for ln in text.splitlines() if not ln.strip().startswith("--")
    )
    return body.strip().rstrip(";")


def _norm_key(row):
    return tuple(
        f"{v:.6g}" if isinstance(v, float) else str(v) for v in row
    )


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


# Cases whose reference SQL is UNDERDETERMINED on the sf0.01 fixture only
# (driver scale via SPARK_GRAFT_TEST_SF_DIR; the sf0.001 default is
# tie-free, data-verified r10): windowSpecificationABcpA's
# ``lag(quantity) OVER (PARTITION BY partkey ORDER BY orderkey)`` orders
# by a NON-UNIQUE key, and sf0.01 contains a duplicate (partkey=272,
# orderkey=3652) pair (quantities [29, 14]) — each engine may order the
# tied peers differently, so the lag value is legitimately either row.
# The check still runs; only a tie-induced mismatch converts to xfail.
UNDERDETERMINED_AT_DRIVER_SCALE = {"window_functions/windowSpecificationABcpA"}

_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _dualrun(dual, case: str) -> None:
    try:
        _dualrun_inner(dual, case)
    except AssertionError:
        if (
            case in UNDERDETERMINED_AT_DRIVER_SCALE
            and _SF_DIR.rstrip("/").endswith("sf0.01")
        ):
            pytest.xfail(
                f"{case}: tie-dependent window result on the sf0.01 "
                "fixture (non-unique ORDER BY key; documented above)"
            )
        raise


def _dualrun_inner(dual, case: str) -> None:
    engine, con = dual
    if case in DEVIATIONS:
        pytest.skip(f"documented deviation: {DEVIATIONS[case]}")
    text = re.sub(r"tpch\.tiny\.(\w+)", r"tiny_\1", _load_query(case))
    # q15-style multi-statement files: run every statement in order on
    # BOTH engines, compare the last result. View creation is spelled
    # TEMPORARY so Spark doesn't demand a warehouse-backed view over temp
    # inputs (DuckDB accepts the same spelling; the SELECT text is
    # untouched).
    stmts = [s.strip() for s in text.split(";") if s.strip()]
    stmts = [
        re.sub(r"(?i)^CREATE (OR REPLACE )?VIEW", r"CREATE \1TEMPORARY VIEW", s)
        for s in stmts
    ]
    df = None
    for s in stmts:
        df = engine.sql(s)
    spark_rows = [tuple(r) for r in df.collect()]
    if case in ORACLE_DEVIATIONS:
        assert spark_rows is not None  # Spark-side grammar exercised
        return
    res = None
    for s in stmts:
        res = con.execute(s)
    ora_rows = [tuple(r) for r in res.fetchall()]
    assert len(spark_rows) == len(ora_rows), (
        f"{case}: {len(spark_rows)} rows vs oracle {len(ora_rows)}"
    )
    for srow, orow in zip(
        sorted(spark_rows, key=_norm_key), sorted(ora_rows, key=_norm_key)
    ):
        assert len(srow) == len(orow), f"{case}: arity {srow} vs {orow}"
        for sv, ov in zip(srow, orow):
            assert _cell_match(sv, ov), f"{case}: {srow} vs {orow} ({sv!r}≠{ov!r})"


@pytest.mark.parametrize("case", SKIPPED_PAIRS)
def test_dualrun_table_skipped(dual, case):
    _dualrun(dual, case)


@pytest.mark.parametrize("case", HIVE_TPCH)
def test_dualrun_hive_tpch(dual, case):
    _dualrun(dual, case)


@pytest.mark.parametrize("case", TPCH_CONNECTOR)
def test_dualrun_tpch_connector(dual, case):
    _dualrun(dual, case)


def test_dualrun_coverage():
    """Combined with the exact-replay gate and the 103-file tpcds
    dual-run, >=300 corpus pairs are exercised. This asserts the dual-run
    share of that count (floor lowered 65 -> 46 in r13 when the 19
    partkey=272 window pairs PROMOTED to exact-replay — the corpus total
    is unchanged, pairs moved to the stronger bucket)."""
    assert len(SKIPPED_PAIRS) + len(HIVE_TPCH) + len(TPCH_CONNECTOR) >= 46
