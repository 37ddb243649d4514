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
    # --- r06: constructors / accessors (GeoFunctions:137,793,880,684,550,710)
    ("ST_LineFromText('LINESTRING (0 0, 1 1)')", "LINESTRING (0 0, 1 1)"),
    ("ST_Points(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))",
     ["POINT (0 0)", "POINT (1 1)"]),
    ("ST_EnvelopeAsPts(ST_GeometryFromText('LINESTRING (-5 0, 3 4)'))",
     ["POINT (-5 0)", "POINT (3 4)"]),
    ("ST_Geometries(ST_GeometryFromText('MULTIPOINT ((1 2), (3 4))'))",
     ["POINT (1 2)", "POINT (3 4)"]),
    ("ST_Geometries(ST_GeometryFromText("
     "'MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))'))",
     ["LINESTRING (0 0, 1 1)", "LINESTRING (2 2, 3 3)"]),
    ("ST_Geometries(ST_Point(9 ,8))", ["POINT (9 8)"]),
    ("ST_NumGeometries(ST_GeometryFromText('MULTIPOINT ((1 2), (3 4))'))", 2),
    ("ST_NumGeometries(ST_Point(1, 2))", 1),
    ("ST_InteriorRings(ST_GeometryFromText("
     "'POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (2 2, 3 2, 3 3, 2 2))'))",
     ["LINESTRING (2 2, 3 2, 3 3, 2 2)"]),
    ("ST_InteriorRingN(ST_GeometryFromText("
     "'POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (2 2, 3 2, 3 3, 2 2))'), 1)",
     "LINESTRING (2 2, 3 2, 3 3, 2 2)"),
    ("ST_InteriorRingN(ST_GeometryFromText("
     "'POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0))'), 1)", None),
]


@pytest.mark.parametrize("expr,expected", PINNED)
def test_st_scalar_pinned(engine, expr, expected):
    got = engine.sql(f"SELECT {expr} AS v").collect()[0][0]
    if isinstance(expected, float):
        assert got == pytest.approx(expected, abs=1e-12), (expr, got)
    else:
        assert got == expected, (expr, got)


def test_wkb_codec_roundtrip(engine):
    """ST_AsBinary / ST_GeomFromBinary (GeoFunctions.java:261,245): the
    Arrow codec round-trips arbitrary doubles and the point hex matches
    the OGC little-endian layout."""
    got = engine.sql(
        "SELECT hex(ST_AsBinary(ST_Point(100, 2.5))) AS h, "
        "ST_GeomFromBinary(ST_AsBinary(ST_GeometryFromText("
        "'LINESTRING (1.25 -2, 3 4.75)'))) AS back"
    ).collect()[0]
    import struct

    exp = struct.pack("<BI2d", 1, 1, 100.0, 2.5).hex().upper()
    assert got["h"] == exp
    assert got["back"] == "LINESTRING (1.25 -2, 3 4.75)"


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


def test_multi_geometry_forms(engine):
    """Review regressions: flat MULTIPOINT form, MULTIPOLYGON with
    interior rings (ring seams must NOT split a polygon), LINESTRING
    word-boundary validation."""
    assert engine.sql(
        "SELECT ST_NumGeometries(ST_GeometryFromText('MULTIPOINT (1 2, 3 4)')) v"
    ).collect()[0][0] == 2
    assert engine.sql(
        "SELECT ST_Geometries(ST_GeometryFromText('MULTIPOINT (1 2, 3 4)')) v"
    ).collect()[0][0] == ["POINT (1 2)", "POINT (3 4)"]
    mp = ("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 0), (1 1, 2 1, 1 2, 1 1)), "
          "((9 9, 10 9, 9 10, 9 9)))")
    assert engine.sql(
        f"SELECT ST_NumGeometries(ST_GeometryFromText('{mp}')) v"
    ).collect()[0][0] == 2
    assert engine.sql(
        f"SELECT ST_Geometries(ST_GeometryFromText('{mp}')) v"
    ).collect()[0][0] == [
        "POLYGON ((0 0, 4 0, 4 4, 0 0), (1 1, 2 1, 1 2, 1 1))",
        "POLYGON ((9 9, 10 9, 9 10, 9 9))",
    ]
    with pytest.raises(Exception, match="not a LINESTRING"):
        engine.sql("SELECT ST_LineFromText('LINESTRINGXYZ') v").collect()
