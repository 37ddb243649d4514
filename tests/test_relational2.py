from __future__ import annotations

import pytest

from presto_db_spark.operators import rangejoin as rj
from presto_db_spark.operators import relational2 as r2

from .oracle_utils import check_query

ALL = {**{n: (r2.QUERIES[n], r2.ORACLE.get(n)) for n in r2.QUERIES},
       **{n: (rj.QUERIES[n], rj.ORACLE.get(n)) for n in rj.QUERIES}}


@pytest.mark.parametrize("name", sorted(ALL))
def test_relational2_vs_duckdb(spark, sf_dir, name):
    fn, sql = ALL[name]
    problems = check_query(spark, name, fn, sql, sf_dir)
    assert not problems, f"{name}: {problems}"


def test_multi_distinct_single_scan(spark, sf_dir):
    """The MarkDistinct shape must plan as ONE scan (Expand), not N."""
    df = r2.agg_multi_distinct(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan


def test_range_join_no_duplicates(spark, sf_dir):
    """Bucket explosion must not duplicate candidate pairs."""
    df = rj.QUERIES["events_range_join"](spark, sf_dir)
    total = df.count()
    distinct = df.select("click_id", "purchase_id").distinct().count()
    assert total == distinct
