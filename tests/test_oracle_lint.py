"""Oracle-SQL lint: pitfalls that produce silently-wrong oracles.

r11w finding: DuckDB's ``//`` on DECIMAL operands routes through FLOAT
(``SELECT CAST(7 AS DECIMAL(38,0)) // CAST(2 AS DECIMAL(38,0))`` returns
3.5 — not even an integer), so a cross-multiplied 128-bit ratio written
with DECIMAL casts is off-by-one whenever the float rounds across the
boundary (events_cross_correlation hit this on every row). The exact
128-bit division type in DuckDB is HUGEINT. This lint keeps the rule
mechanical: no oracle may integer-divide DECIMAL-cast operands.
"""

from __future__ import annotations

import re

from presto_db_spark.registry import all_oracle_sql


def test_no_decimal_integer_division_in_oracles():
    """Any oracle line mixing a DECIMAL cast with `//` is a latent
    float-division bug — use HUGEINT for exact wide division (DECIMAL
    stays fine for multiply/compare, which are exact)."""
    offenders = []
    for name, sql in all_oracle_sql().items():
        for ln, line in enumerate(sql.splitlines(), 1):
            if "//" in line and re.search(r"DECIMAL\s*\(", line, re.I):
                offenders.append(f"{name}:{ln}: {line.strip()}")
    assert not offenders, "\n".join(offenders)


def test_duckdb_division_semantics_pinned():
    """Pin the engine facts the oracles rely on: integer and HUGEINT
    `//` truncate toward zero (matching Spark's `div`); DECIMAL `//`
    is float division (the thing the lint above bans)."""
    import duckdb

    con = duckdb.connect()
    assert con.sql("SELECT -7 // 2").fetchone()[0] == -3
    assert con.sql("SELECT 7 // 2").fetchone()[0] == 3
    assert (
        con.sql(
            "SELECT CAST(10 AS HUGEINT) * 10000000000000000000000000000000"
            " // 3"
        ).fetchone()[0]
        == 33333333333333333333333333333333
    )
    assert (
        con.sql(
            "SELECT CAST(7 AS DECIMAL(38,0)) // CAST(2 AS DECIMAL(38,0))"
        ).fetchone()[0]
        == 3.5  # float! — why the lint exists
    )


def test_spark_decimal_div_semantics_pinned(spark):
    """Spark-side counterpart: `div` on DECIMAL(38,0) truncates toward
    zero and RETURNS LONG — exact if and only if the QUOTIENT fits
    int64; past that it silently wraps (pinned below so nobody assumes
    otherwise). Every repo op that divides 128-bit intermediates
    (ml_multiple_regression, events_cross_correlation, the stats
    family) therefore keeps its quotient bounded (ppm/micros scale),
    with the wide type only in multiplications and comparisons."""
    row = spark.sql(
        "SELECT CAST(-7 AS DECIMAL(38,0)) div 2 AS a,"
        " CAST(12345678901234567890123456789 AS DECIMAL(38,0)) div 7 AS b,"
        " CAST(12345678901234567890123456789 AS DECIMAL(38,0))"
        "   div 12345678901234567890 AS c"
    ).collect()[0]
    assert row.a == -3
    # in-range quotient: exact
    assert row.c == 12345678901234567890123456789 // 12345678901234567890
    # out-of-range quotient: WRAPS — the documented hazard
    assert row.b != 12345678901234567890123456789 // 7
