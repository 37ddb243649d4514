"""Presto-dialect SQL through Engine.sql — the function-compat layer
(presto_db_spark/functions/presto.py; reference registration point
``pm/metadata/BuiltInFunctionNamespaceManager.java:433-700``)."""

from __future__ import annotations

import math

import pytest

from presto_db_spark.engine import Engine
from presto_db_spark.functions.presto import mysql_to_java_pattern


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir=sf_dir)


def test_strpos_one_based(engine):
    r = engine.sql("SELECT strpos('hello', 'l') a, strpos('hello', 'z') b").collect()[0]
    assert (r.a, r.b) == (3, 0)


def test_to_unixtime_double(engine):
    r = engine.sql(
        "SELECT to_unixtime(TIMESTAMP '2020-01-01 00:00:00.5') t"
    ).collect()[0]
    assert abs(r.t - 1577836800.5) < 1e-6


def test_from_unixtime_roundtrip(engine):
    r = engine.sql(
        "SELECT presto_from_unixtime(to_unixtime(TIMESTAMP '2021-06-01 12:34:56')) t"
    ).collect()[0]
    assert str(r.t) == "2021-06-01 12:34:56"


def test_url_functions(engine):
    r = engine.sql(
        "SELECT url_extract_host('https://a.example.com/p/q?x=1') h, "
        "url_extract_path('https://a.example.com/p/q?x=1') p, "
        "url_extract_query('https://a.example.com/p/q?x=1') q"
    ).collect()[0]
    assert (r.h, r.p, r.q) == ("a.example.com", "/p/q", "x=1")


def test_json_extract_scalar(engine):
    r = engine.sql(
        """SELECT json_extract_scalar('{"a": {"b": 7}}', '$.a.b') v,
                  json_array_get('[10, 20, 30]', 1) e"""
    ).collect()[0]
    assert (r.v, r.e) == ("7", "20")


def test_math_compat(engine):
    r = engine.sql(
        "SELECT is_finite(1.0) a, is_infinite(infinity()) b, "
        "presto_truncate(-2.7) c, normal_cdf(0.0, 1.0, 0.0) d"
    ).collect()[0]
    assert (r.a, r.b, r.c) == (True, True, -2.0)
    assert abs(r.d - 0.5) < 1e-12


def test_word_stem_and_hamming(engine):
    r = engine.sql(
        "SELECT word_stem('running') s, hamming_distance('abcde', 'abcdf') h"
    ).collect()[0]
    assert (r.s, r.h) == ("runn", 1)


def test_cosine_similarity_dense(engine):
    r = engine.sql(
        "SELECT cosine_similarity_dense(array(1.0d, 0.0d), array(0.0d, 1.0d)) o, "
        "cosine_similarity_dense(array(1.0d, 2.0d), array(2.0d, 4.0d)) s"
    ).collect()[0]
    assert abs(r.o - 0.0) < 1e-12 and abs(r.s - 1.0) < 1e-12


def test_mysql_pattern_translation():
    assert mysql_to_java_pattern("%Y-%m-%d") == "yyyy-MM-dd"
    assert mysql_to_java_pattern("%H:%i:%s") == "HH:mm:ss"
    assert mysql_to_java_pattern("%Y年%m月") == "yyyy'年'MM'月'"


def test_date_parse_udf(engine):
    r = engine.sql(
        "SELECT date_parse('2019-07-04 11:22:33', '%Y-%m-%d %H:%i:%s') t, "
        "date_format_mysql(TIMESTAMP '2019-07-04 11:22:33', '%d/%m/%Y') f"
    ).collect()[0]
    assert str(r.t) == "2019-07-04 11:22:33"
    assert r.f == "04/07/2019"


def test_presto_sql_over_tables(engine):
    # Presto `arbitrary` == Spark `any_value` (aggregate names translate in
    # query text; scalar temp functions cannot wrap aggregates).
    rows = engine.sql(
        """
        SELECT c_mktsegment,
               count_if(c_acctbal > 0) AS n_pos,
               any_value(c_mktsegment) AS seg_again
        FROM customer GROUP BY c_mktsegment
        """
    ).collect()
    assert all(r.c_mktsegment == r.seg_again for r in rows)
    assert math.fsum(r.n_pos for r in rows) > 0
