from __future__ import annotations

import pytest

from presto_db_spark.operators import geo, sketch

from .oracle_utils import check_query

ALL = {**{n: (sketch.QUERIES[n], sketch.ORACLE.get(n)) for n in sketch.QUERIES},
       **{n: (geo.QUERIES[n], geo.ORACLE.get(n)) for n in geo.QUERIES}}


@pytest.mark.parametrize("name", sorted(ALL))
def test_sketch_geo_vs_duckdb(spark, sf_dir, name):
    fn, sql = ALL[name]
    problems = check_query(spark, name, fn, sql, sf_dir)
    assert not problems, f"{name}: {problems}"


def test_sketch_merge_associativity(spark, sf_dir):
    """Merging per-nation sketches must equal the directly-built global
    sketch — the mergeability property that makes digests distributable."""
    from pyspark.sql import functions as F

    from presto_db_spark.operators.tpch import _t

    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    enriched = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_nationkey", "l_extendedprice")
    )
    per_nation = sketch.sketch_histogram(
        enriched, ["c_nationkey"], "l_extendedprice"
    )
    merged = per_nation.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    direct = sketch.sketch_histogram(enriched, [], "l_extendedprice")
    a = sorted((r.bin, r.cnt) for r in merged.collect())
    b = sorted((r.bin, r.cnt) for r in direct.collect())
    assert a == b
