"""Oracle sweep for the graph family (mirrors the per-family sweeps the
other operator modules carry — test_text/test_events/test_dedup etc.).
test_graph_ops.py keeps the crafted-graph algorithmic pins; this file is
the fixture-level DuckDB value gate at pytest scale."""

from __future__ import annotations

import pytest

from presto_db_spark.operators import graph as gr

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(gr.QUERIES))
def test_graph_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, gr.QUERIES[name], gr.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"
