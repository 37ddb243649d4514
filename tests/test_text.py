from __future__ import annotations

import pytest

from presto_db_spark.operators import text as tx

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(tx.QUERIES))
def test_text_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, tx.QUERIES[name], tx.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"
