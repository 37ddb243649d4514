from __future__ import annotations

import pytest

from presto_db_spark.operators import relational

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_vs_duckdb(spark, sf_dir, name):
    problems = check_query(
        spark, name, relational.QUERIES[name], relational.ORACLE.get(name), sf_dir
    )
    assert not problems, f"{name}: {problems}"
