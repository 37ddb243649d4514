from __future__ import annotations

import pytest

from presto_db_spark.operators import dedup as dd

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(dd.QUERIES))
def test_dedup_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, dd.QUERIES[name], dd.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"
