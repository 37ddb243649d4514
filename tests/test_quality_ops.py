from __future__ import annotations

import pytest

from presto_db_spark.operators import quality as ql

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(ql.QUERIES))
def test_quality_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, ql.QUERIES[name], ql.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"
