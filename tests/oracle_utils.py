"""Local replica of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle over the same parquet tables and
compares them the way the driver does: build a pandas frame from each
result, sort columns by name, ``sort_values`` over all columns (this is
the step that dies with ``TypeError: unhashable type: 'list'`` on
array-valued columns — reproduced here so driver-incompatible shapes fail
locally first), then compare values at FULL float precision (the driver
hashes raw values; any rounding must happen inside the query on BOTH
sides, never in this gate).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

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


def driver_canon(cols: list[str], rows: list[tuple]) -> pd.DataFrame:
    """Canonicalize a result the way the driver does: column-name sort,
    then a pandas ``sort_values`` over every column.  Raises ``TypeError``
    on list/dict/ndarray cells exactly like the driver's canonicalizer."""
    df = pd.DataFrame(rows, columns=cols, dtype=object)
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _cell_eq(a: Any, b: Any) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb  # exact: the driver hashes full precision
    return bool(a == b)


def compare(
    spark_cols: list[str],
    spark_rows: list[tuple],
    ora_cols: list[str],
    ora_rows: list[tuple],
) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    if sorted(spark_cols) != sorted(ora_cols):
        problems.append(
            f"columns differ: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}"
        )
        return problems
    if len(spark_rows) != len(ora_rows):
        problems.append(
            f"row count differs: spark={len(spark_rows)} oracle={len(ora_rows)}"
        )
        return problems
    try:
        a = driver_canon(spark_cols, spark_rows)
    except TypeError as e:
        return [f"spark result breaks the driver canonicalizer: {e}"]
    try:
        b = driver_canon(ora_cols, ora_rows)
    except TypeError as e:
        return [f"oracle result breaks the driver canonicalizer: {e}"]
    bad: list[str] = []
    for i in range(len(a)):
        ra, rb = a.iloc[i], b.iloc[i]
        if not all(_cell_eq(ra[c], rb[c]) for c in a.columns):
            bad.append(f"row {i}: spark={tuple(ra)} oracle={tuple(rb)}")
            if len(bad) >= 5:
                break
    if bad:
        problems.append("values differ (full-precision): " + "; ".join(bad))
    return problems


def check_query(spark, name: str, fn, sql: str | None, sf_dir: str) -> list[str]:
    df = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns
    if sql is None:
        # rows-only check, but still enforce a driver-canonicalizable shape
        try:
            driver_canon(spark_cols, spark_rows)
        except TypeError as e:
            return [f"spark result breaks the driver canonicalizer: {e}"]
        return []
    ora_cols, ora_rows = run_oracle(sql, sf_dir)
    return compare(spark_cols, spark_rows, ora_cols, [tuple(r) for r in ora_rows])
