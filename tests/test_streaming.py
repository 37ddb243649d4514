from __future__ import annotations

import pytest

from presto_db_spark.streaming import pipeline as sp

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(sp.QUERIES))
def test_streaming_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, sp.QUERIES[name], sp.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"
