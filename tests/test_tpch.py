"""TPC-H suite vs DuckDB oracle at sf0.001 (fast) — the driver re-runs the
same comparison at sf0.01."""

from __future__ import annotations

import pytest

from presto_db_spark.operators import tpch

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, tpch.QUERIES[name], tpch.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"
