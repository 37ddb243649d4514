"""SQL-callable ST_* surface (functions/geosql.py vs GeoFunctions.java).

Pinned-value probes for every registered function plus a plan gate: a
pasted ST_* expression over a table is pure JVM expression code (the SQL
functions inline — no Python stage anywhere)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from presto_db_spark.engine import Engine

    return Engine(spark)


PINNED = [
    ("ST_AsText(ST_Point(1, 2))", "POINT (1 2)"),
    ("ST_AsText(ST_Point(1.5, -2.25))", "POINT (1.5 -2.25)"),
    ("ST_Area(ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))",
     16.0),
    # 3-4-5 triangle
    ("ST_Length(ST_GeometryFromText('LINESTRING (0 0, 3 4)'))", 5.0),
    ("ST_X(ST_Point(7, 9))", 7.0),
    ("ST_Y(ST_Point(7, 9))", 9.0),
    ("ST_GeometryType(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))",
     "ST_LineString"),
    ("ST_GeometryType(ST_Point(0, 0))", "ST_Point"),
    ("ST_Envelope(ST_GeometryFromText('LINESTRING (0 0, 3 4)'))",
     "POLYGON ((0 0, 3 0, 3 4, 0 4, 0 0))"),
    # square centroid (signed-area formula)
    ("ST_AsText(ST_Centroid(ST_GeometryFromText("
     "'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')))", "POINT (2 2)"),
    ("ST_Distance(ST_Point(0, 0), ST_Point(3, 4))", 5.0),
    ("ST_NumPoints(ST_GeometryFromText('LINESTRING (0 0, 1 1, 2 2)'))", 3),
    ("ST_IsClosed(ST_GeometryFromText('LINESTRING (0 0, 1 1, 0 0)'))", True),
    ("ST_IsClosed(ST_GeometryFromText('LINESTRING (0 0, 1 1, 2 2)'))", False),
    ("ST_AsText(ST_StartPoint(ST_GeometryFromText("
     "'LINESTRING (5 6, 1 1, 2 3)')))", "POINT (5 6)"),
    ("ST_AsText(ST_EndPoint(ST_GeometryFromText("
     "'LINESTRING (5 6, 1 1, 2 3)')))", "POINT (2 3)"),
    ("ST_AsText(ST_PointN(ST_GeometryFromText("
     "'LINESTRING (0 0, 1 1, 2 3)'), 3))", "POINT (2 3)"),
    ("ST_PointN(ST_GeometryFromText('LINESTRING (0 0, 1 1)'), 5)", None),
    ("ST_Dimension(ST_GeometryFromText('POLYGON ((0 0, 1 0, 1 1, 0 0))'))",
     2),
    ("ST_Dimension(ST_Point(0, 0))", 0),
    ("ST_CoordDim(ST_Point(0, 0))", 2),
    ("ST_XMin(ST_GeometryFromText('LINESTRING (-5 0, 3 4)'))", -5.0),
    ("ST_XMax(ST_GeometryFromText('LINESTRING (-5 0, 3 4)'))", 3.0),
    ("ST_YMin(ST_GeometryFromText('LINESTRING (-5 0, 3 4)'))", 0.0),
    ("ST_YMax(ST_GeometryFromText('LINESTRING (-5 0, 3 4)'))", 4.0),
    ("ST_IsEmpty(ST_Point(0, 0))", False),
    # X/Y on a non-point is NULL (the reference raises; NULL is the
    # documented SQL-surface softening)
    ("ST_X(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))", None),
    # non-polygon area is 0 (GeoFunctions: area of lower-dim geometry)
    ("ST_Area(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))", 0.0),
    # vertex-mean centroid for linestrings (documented deviation)
    ("ST_AsText(ST_Centroid(ST_GeometryFromText("
     "'LINESTRING (0 0, 2 0, 2 2, 0 2)')))", "POINT (1 1)"),
]


@pytest.mark.parametrize("expr,expected", PINNED)
def test_st_scalar_pinned(engine, expr, expected):
    got = engine.sql(f"SELECT {expr} AS v").collect()[0][0]
    if isinstance(expected, float):
        assert got == pytest.approx(expected, abs=1e-12), (expr, got)
    else:
        assert got == expected, (expr, got)


def test_st_geometryfromtext_rejects_garbage(engine):
    with pytest.raises(Exception, match="Invalid WKT"):
        engine.sql("SELECT ST_GeometryFromText('CIRCLE (0 0 5)') AS v").collect()


def test_st_functions_stay_jvm(engine, spark, sf_dir):
    """A pasted ST_* pipeline over a real table has no Python stage — the
    SQL functions inline into codegen expressions."""
    from presto_db_spark.catalog import load_table

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("cust_geo")
    df = engine.sql(
        "SELECT c_custkey, "
        "ST_Distance(ST_Point(c_acctbal, 0), ST_Point(0, c_acctbal)) AS d, "
        "ST_AsText(ST_Point(c_custkey, c_nationkey)) AS w "
        "FROM cust_geo"
    )
    assert df.count() > 0
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in s, s[:1500]
    spark.catalog.dropTempView("cust_geo")
