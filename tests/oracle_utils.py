"""Local replica of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle over the same parquet tables and
compares row count, column names, and the order-insensitive multiset of
row values (floats compared exactly after the in-query rounding — the
driver hashes, so exact is what matters).
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb

from presto_db_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and fix float repr at 12 significant digits
        return float(f"{v + 0.0:.12g}")
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver semantics), normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(
    spark_cols: list[str],
    spark_rows: list[tuple],
    ora_cols: list[str],
    ora_rows: list[tuple],
) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    if sorted(spark_cols) != sorted(ora_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}")
        return problems
    if len(spark_rows) != len(ora_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} oracle={len(ora_rows)}")
    a = normalize_rows(spark_cols, spark_rows)
    b = normalize_rows(ora_cols, ora_rows)
    if a != b:
        only_spark = [r for r in a if r not in set(b)][:5]
        only_ora = [r for r in b if r not in set(a)][:5]
        problems.append(f"values differ; spark-only={only_spark} oracle-only={only_ora}")
    return problems


def check_query(spark, name: str, fn, sql: str | None, sf_dir: str) -> list[str]:
    df = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns
    if sql is None:
        return [] if len(spark_rows) >= 0 else ["spark query failed"]
    ora_cols, ora_rows = run_oracle(sql, sf_dir)
    return compare(spark_cols, spark_rows, ora_cols, [tuple(r) for r in ora_rows])
