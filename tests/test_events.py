from __future__ import annotations

import pytest

from presto_db_spark.operators import events as ev

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(ev.QUERIES))
def test_events_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, ev.QUERIES[name], ev.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"
