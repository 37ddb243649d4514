"""The reference's OWN TPC-DS benchmark SQL, verbatim, through Engine.sql.

TPC-DS companion to ``test_benchto_verbatim.py`` (round-4's TPC-H gate):
reads 12 files from ``presto-benchto-benchmarks/src/main/resources/sql/
presto/tpcds/`` exactly as shipped, applies only benchto's own
``${database}/${schema}`` substitution, executes them through
:meth:`Engine.sql` over the :mod:`presto_db_spark.benchto_tpcds` adapter
views, and value-checks every result against DuckDB running the IDENTICAL
post-substitution text on identical views. Exercises grammar the TPC-H
corpus doesn't: quoted aliases with spaces ("30 days"), dot-qualified
quoted aliases, DECIMAL '…' typed literals, derived-table towers, and the
TPC-DS star schema's sk-join idiom.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from presto_db_spark.benchto_tpcds import register_tpcds_duckdb, register_tpcds_views
from presto_db_spark.engine import Engine

BENCHTO_DIR = (
    "/root/reference/presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BENCHTO_DIR), reason="reference benchto SQL not present"
)

# Every reference file whose tables the adapter synthesizes — star
# aggregates, demographic joins, derived-table towers, latency buckets,
# correlated averages, EXISTS batteries, returns joins, rollups, and the
# q65 below-store-average shape. 45 of the reference's 99 files run
# VERBATIM. q27 is excluded: its d_year = 2002 gate is beyond the driver
# data's 1995-2001 span, making the base empty — and GROUP BY ROLLUP over
# an EMPTY input is an engine semantic difference (DuckDB/standard emit
# the grand-total grouping-set row, Spark emits none), so the file cannot
# value-match on this data. The q27 SHAPE is covered by the adapted
# registry query tpcds_q27 (operators/tpcds2.py).
QUERIES = ["q03", "q06", "q07", "q09", "q13", "q19", "q20", "q26",
           "q33", "q34", "q35", "q36", "q41", "q42", "q45", "q46", "q48",
           "q50", "q52", "q53", "q55", "q56", "q60", "q61", "q62", "q63",
           "q65", "q68", "q69", "q71", "q73", "q79", "q84", "q85", "q88",
           "q90", "q91", "q92", "q93", "q94", "q95", "q96", "q97", "q98",
           "q99"]


def _load(name: str) -> str:
    with open(f"{BENCHTO_DIR}/{name}.sql") as f:
        text = f.read()
    text = text.replace("${database}", "tpcds").replace("${schema}", "sf")
    return text.strip().rstrip(";")


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    eng = Engine(spark)
    register_tpcds_views(spark, sf_dir)
    return eng


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    register_tpcds_duckdb(con, sf_dir)
    return con


def _norm(v):
    if isinstance(v, float):
        return round(v, 4)
    return v


def _key(row):
    return tuple(str(_norm(v)) for v in row)


def _match(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is None and b is None
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-6)
    return a == b


@pytest.mark.parametrize("name", QUERIES)
def test_benchto_tpcds_file_verbatim(engine, oracle, name):
    sql = _load(name)
    spark_rows = [tuple(r) for r in engine.sql(sql).collect()]
    ora_rows = [tuple(r) for r in oracle.execute(sql).fetchall()]
    assert len(spark_rows) == len(ora_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(ora_rows)}"
    )
    for srow, orow in zip(sorted(spark_rows, key=_key), sorted(ora_rows, key=_key)):
        assert len(srow) == len(orow), f"{name}: arity {srow} vs {orow}"
        for sv, ov in zip(srow, orow):
            assert _match(sv, ov), f"{name}: {srow} vs {orow} (col {sv!r}≠{ov!r})"


def test_benchto_tpcds_nonempty_coverage(oracle):
    """The adapter's synthesized domains must make the reference predicates
    select data: at least 30 of the files return ≥1 row (a handful are
    legitimately empty at sf0.001 — ultra-selective attribute batteries)."""
    nonempty = sum(1 for name in QUERIES if oracle.execute(_load(name)).fetchall())
    assert nonempty >= 30, f"only {nonempty}/{len(QUERIES)} files return rows"
