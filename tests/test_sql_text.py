"""SQL-text parity: raw TPC-H-style SQL through Engine.sql (the spark.sql
parser/analyzer path — SURVEY.md §3 steps 3-5, which we delegate wholesale)
checked against DuckDB running the same text."""

from __future__ import annotations

import pytest

from presto_db_spark.engine import Engine

from .oracle_utils import compare, run_oracle

# Dialect-shared SQL (runs verbatim on Spark and DuckDB).
SHARED_SQL = {
    "q06_text": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q01_text": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(round(l_extendedprice * 100)) / 100, 2) AS sum_base_price,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "join_text": """
        SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_cust,
               round(sum(round(c.c_acctbal * 100)) / 100, 2) AS total_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "cte_text": """
        WITH big AS (
          SELECT o_custkey, count(*) AS n FROM orders
          GROUP BY o_custkey HAVING count(*) > 10
        )
        SELECT CAST(count(*) AS BIGINT) AS n_big_customers,
               CAST(max(n) AS BIGINT) AS max_orders
        FROM big
    """,
}


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir=sf_dir)


@pytest.mark.parametrize("name", sorted(SHARED_SQL))
def test_sql_text_vs_duckdb(engine, sf_dir, name):
    sql = SHARED_SQL[name]
    df = engine.sql(sql)
    spark_cols, spark_rows = df.columns, [tuple(r) for r in df.collect()]
    ora_cols, ora_rows = run_oracle(sql, sf_dir)
    problems = compare(spark_cols, spark_rows, ora_cols, [tuple(r) for r in ora_rows])
    assert not problems, f"{name}: {problems}"


def test_dialect_function_ddl_rewrites():
    from presto_db_spark.functions.dialect import rewrite_presto_sql as r

    cats = frozenset({"example"})
    assert r(
        "CREATE FUNCTION example.default.f(x INT) RETURNS INT RETURN x", catalogs=cats
    ) == "CREATE TEMPORARY FUNCTION f(x INT) RETURNS INT RETURN x"
    assert r("DROP FUNCTION IF EXISTS example.default.f", catalogs=cats) == (
        "DROP TEMPORARY FUNCTION IF EXISTS f"
    )
    # RETURNS NULL ON NULL INPUT -> explicit guard (Spark parses only
    # CALLED ON NULL INPUT)
    out = r(
        "CREATE FUNCTION two(a INT, b STRING) RETURNS STRING "
        "RETURNS NULL ON NULL INPUT RETURN concat(b, a)"
    )
    assert "TEMPORARY" in out
    assert "CASE WHEN a IS NULL OR b IS NULL THEN NULL ELSE (concat(b, a)) END" in out
    # zero-arg + already-temporary + non-function CREATE pass through sanely
    assert r("CREATE FUNCTION f0() RETURNS INT RETURN 7") == (
        "CREATE TEMPORARY FUNCTION f0() RETURNS INT RETURN 7"
    )
    assert r("CREATE TABLE t (x INT)") == "CREATE TABLE t (x INT)"


def test_dialect_window_compat():
    """Presto window laxities (product-test window_functions corpus):
    frames on ranking/lead/lag stripped; rank without window ORDER BY
    gets a constant one (all-peers semantics)."""
    from presto_db_spark.functions.dialect import rewrite_presto_sql as r

    # rank with no ORDER BY -> constant order injected
    out = r("SELECT rank() OVER (PARTITION BY k) FROM t")
    assert "ORDER BY 1" in out
    # explicit frame on rank stripped, the injected/own order preserved
    out = r("SELECT rank() OVER (ORDER BY d RANGE BETWEEN UNBOUNDED "
            "PRECEDING AND CURRENT ROW) FROM t")
    assert "RANGE" not in out.upper() and "ORDER BY d NULLS LAST" in out
    # lag frame stripped (short RANGE CURRENT ROW form)
    out = r("SELECT lag(x) OVER (PARTITION BY g ORDER BY x RANGE CURRENT ROW) FROM t")
    assert "RANGE" not in out.upper()
    # aggregate frames are untouched
    out = r("SELECT sum(x) OVER (ORDER BY x ROWS BETWEEN 2 PRECEDING AND "
            "CURRENT ROW) FROM t")
    assert "ROWS BETWEEN 2 PRECEDING" in out
    # idempotence
    q = "SELECT rank() OVER (PARTITION BY k) , lag(x) OVER (ORDER BY x ROWS CURRENT ROW) FROM t"
    assert r(r(q)) == r(q)


def test_dialect_approx_most_frequent(spark):
    """approx_most_frequent(buckets, value, capacity) → capacity-bounded
    approx_top_k rendered as the Presto value→count map; idempotent."""
    from presto_db_spark.engine import Engine
    from presto_db_spark.functions.dialect import rewrite_presto_sql as r

    q = "SELECT approx_most_frequent(3, k, 15) AS m FROM amf_t"
    assert r(r(q)) == r(q)
    eng = Engine(spark)
    spark.range(100).selectExpr("id % 7 AS k").createOrReplaceTempView("amf_t")
    m = eng.sql(q).collect()[0].m
    assert len(m) == 3 and all(v >= 14 for v in m.values())
    spark.catalog.dropTempView("amf_t")
