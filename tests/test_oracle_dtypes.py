"""Oracle dtype hygiene — kills the HUGEINT failure class for good.

Round-6 post-mortem (VERDICT r06 §What's wrong #1-2): DuckDB types
``list_sum``/``sum(BIGINT)``/``sum(INTEGER)`` as HUGEINT, which pandas
canonicalization decays to float64, so an oracle column that is
value-identical to Spark's BIGINT still hash-mismatches in the driver
(int 37 vs float 37.0).  Two guards:

* a regression test proving the dtype-faithful replica
  (``oracle_utils.run_oracle`` fetching via ``cur.df()``) now FAILS a
  deliberate ``list_sum`` oracle locally — the old ``fetchall()`` path
  returned Python ints and hid the decay;
* a DESCRIBE sweep over EVERY registered oracle asserting no
  HUGEINT/UHUGEINT column ever reaches the driver again.
"""

from __future__ import annotations

import duckdb

from presto_db_spark.catalog import TABLES
from presto_db_spark.registry import all_oracle_sql

from .conftest import SF_DIR
from .oracle_utils import compare, run_oracle


def test_hugeint_oracle_fails_locally():
    """A deliberate list_sum (HUGEINT) oracle must mismatch against a
    Spark-side BIGINT through the replica gate — this is the exact
    geo_wkb_roundtrip r06 failure mode, reproduced as a regression."""
    cols, rows = run_oracle("SELECT list_sum([1, 2, 34]) AS v", SF_DIR)
    problems = compare(["v"], [(37,)], cols, rows)
    assert problems, (
        "replica must flag int-vs-float kind drift (driver hashes 37 != 37.0)"
    )
    assert "kind-strict" in problems[0] or "values differ" in problems[0]


def test_hugeint_cast_passes_locally():
    cols, rows = run_oracle("SELECT CAST(list_sum([1, 2, 34]) AS BIGINT) AS v", SF_DIR)
    assert compare(["v"], [(37,)], cols, rows) == []


def test_sum_integer_decays_without_cast():
    """sum(INTEGER) is the other spelling of the same landmine (tpcds_q62/
    q99 carried it latently)."""
    cols, rows = run_oracle("SELECT sum(1) AS v FROM range(5)", SF_DIR)
    assert compare(["v"], [(5,)], cols, rows), "sum() HUGEINT decay must be flagged"
    cols, rows = run_oracle("SELECT CAST(sum(1) AS BIGINT) AS v FROM range(5)", SF_DIR)
    assert compare(["v"], [(5,)], cols, rows) == []


def test_no_hugeint_in_any_oracle():
    """DESCRIBE every registered oracle: no HUGEINT/UHUGEINT column may
    reach the driver's pandas canonicalization (it decays to float64 and
    hash-mismatches any Spark integer column)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    offenders: list[str] = []
    for name, sql in sorted(all_oracle_sql().items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except duckdb.Error as e:  # pragma: no cover - oracle must bind
            offenders.append(f"{name}: DESCRIBE failed: {e}")
            continue
        for col, typ, *_ in desc:
            if "HUGEINT" in str(typ).upper():
                offenders.append(f"{name}.{col}: {typ}")
    con.close()
    assert not offenders, f"HUGEINT-typed oracle columns: {offenders}"
