from __future__ import annotations

import pytest

from presto_db_spark.operators import similarity as sm

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(sm.QUERIES))
def test_similarity_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, sm.QUERIES[name], sm.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"
