from __future__ import annotations

import pytest

from presto_db_spark.operators import pandas_surface as ps

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(ps.QUERIES))
def test_pandas_surface_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, ps.QUERIES[name], ps.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"
