"""Oracle sweep for the stats family (mirrors the per-family sweeps the
other operator modules carry — test_graph_sweep / test_events etc.).
test_math_props.py keeps the crafted algebraic decision pins; this file
is the fixture-level DuckDB value gate at pytest scale, and it picks up
every new stats op automatically."""

from __future__ import annotations

import pytest

from presto_db_spark.operators import stats as st

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(st.QUERIES))
def test_stats_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, st.QUERIES[name], st.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"
