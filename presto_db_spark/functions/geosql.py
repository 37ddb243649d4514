"""SQL-callable ST_* geometry functions over the WKT-string model.

The operator modules (``operators/geo.py``, ``wkt*.py``) implement the
geospatial plans; this module makes the scalar surface PASTE-COMPATIBLE:
a user of the reference can run ``SELECT ST_AsText(ST_Point(1, 2))`` or
``ST_Area(ST_GeometryFromText('POLYGON ((...))'))`` through
:meth:`Engine.sql` directly (``presto-geospatial/.../GeoFunctions.java``
scalar registrations).

Everything is a Spark SQL *function* (``CREATE TEMPORARY FUNCTION ...
RETURN <expr>``) whose body is pure JVM expression code — higher-order
folds for length/area/centroid, no Python anywhere, so a pasted ST_*
over a billion-row table stays inside WholeStageCodegen.

Geometry value = WKT string (the reference's geometry type rendered
through ST_AsText; construction/accessor semantics match the operator
modules' parsers, so values round-trip between the two surfaces).

Documented deviations (same model as the operator modules):

* ``ST_Distance`` is point↔point here (the general point↔polygon form is
  the operator ``geo_wkt_distance``);
* ``ST_Centroid`` is the signed-area centroid for polygons (the
  reference formula), the vertex mean for linestrings/multipoints (the
  reference weights linestrings by segment length);
* single-ring polygons (holes/MULTI* live in the wkt2 operator slice).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# -- shared body fragments (inlined into each function's RETURN) ------------

_PARTS = "split(trim(regexp_replace({g}, '[^0-9,.\\\\- ]', '')), ',')"
_XS = (
    "transform(" + _PARTS + ", p -> CAST(element_at(split(trim(p), ' +'), 1)"
    " AS DOUBLE))"
)
_YS = (
    "transform(" + _PARTS + ", p -> CAST(element_at(split(trim(p), ' +'), 2)"
    " AS DOUBLE))"
)
_TYPE = "regexp_extract({g}, '^\\\\s*([A-Z]+)', 1)"
_NUM = (
    "(CASE WHEN {v} = floor({v}) THEN CAST(CAST({v} AS BIGINT) AS STRING) "
    "ELSE CAST({v} AS STRING) END)"
)

# shoelace 2*signed-area over the CLOSED ring (consecutive segments)
_A2 = (
    "aggregate(sequence(1, size({xs}) - 1), CAST(0.0 AS DOUBLE), (acc, i) -> "
    "acc + (element_at({xs}, i) * element_at({ys}, i + 1) "
    "- element_at({xs}, i + 1) * element_at({ys}, i)))"
)


def _fn(name: str, params: str, rtype: str, body: str) -> str:
    return (
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
        f"RETURNS {rtype} RETURN {body}"
    )


def _point(xe: str, ye: str) -> str:
    return (
        "concat('POINT (', " + _NUM.format(v=xe) + ", ' ', "
        + _NUM.format(v=ye) + ", ')')"
    )


_XS_G, _YS_G = _XS.format(g="g"), _YS.format(g="g")

_GEO_FUNCTIONS: list[str] = [
    # constructors / text round-trip
    _fn("st_point", "x DOUBLE, y DOUBLE", "STRING", _point("x", "y")),
    _fn(
        "st_geometryfromtext", "s STRING", "STRING",
        "CASE WHEN trim(s) RLIKE "
        "'^(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON)' "
        "THEN trim(s) ELSE CAST(raise_error(concat('Invalid WKT: ', s)) "
        "AS STRING) END",
    ),
    _fn("st_astext", "g STRING", "STRING", "g"),
    _fn(
        "st_geometrytype", "g STRING", "STRING",
        "CASE " + _TYPE.format(g="g") + " WHEN 'POINT' THEN 'ST_Point' "
        "WHEN 'LINESTRING' THEN 'ST_LineString' "
        "WHEN 'POLYGON' THEN 'ST_Polygon' "
        "WHEN 'MULTIPOINT' THEN 'ST_MultiPoint' "
        "WHEN 'MULTILINESTRING' THEN 'ST_MultiLineString' "
        "WHEN 'MULTIPOLYGON' THEN 'ST_MultiPolygon' END",
    ),
    # coordinate accessors
    _fn(
        "st_x", "g STRING", "DOUBLE",
        "CASE WHEN " + _TYPE.format(g="g") + " = 'POINT' "
        "THEN element_at(" + _XS_G + ", 1) END",
    ),
    _fn(
        "st_y", "g STRING", "DOUBLE",
        "CASE WHEN " + _TYPE.format(g="g") + " = 'POINT' "
        "THEN element_at(" + _YS_G + ", 1) END",
    ),
    _fn("st_xmin", "g STRING", "DOUBLE", "array_min(" + _XS_G + ")"),
    _fn("st_xmax", "g STRING", "DOUBLE", "array_max(" + _XS_G + ")"),
    _fn("st_ymin", "g STRING", "DOUBLE", "array_min(" + _YS_G + ")"),
    _fn("st_ymax", "g STRING", "DOUBLE", "array_max(" + _YS_G + ")"),
    _fn("st_numpoints", "g STRING", "INT", "CAST(size(" + _XS_G + ") AS INT)"),
    _fn(
        "st_isempty", "g STRING", "BOOLEAN",
        "NOT (g RLIKE '[0-9]')",
    ),
    _fn(
        "st_isclosed", "g STRING", "BOOLEAN",
        "element_at(" + _XS_G + ", 1) = element_at(" + _XS_G + ", -1) "
        "AND element_at(" + _YS_G + ", 1) = element_at(" + _YS_G + ", -1)",
    ),
    _fn(
        "st_dimension", "g STRING", "TINYINT",
        "CAST(CASE WHEN " + _TYPE.format(g="g")
        + " IN ('POINT', 'MULTIPOINT') THEN 0 "
        "WHEN " + _TYPE.format(g="g")
        + " IN ('LINESTRING', 'MULTILINESTRING') THEN 1 "
        "ELSE 2 END AS TINYINT)",
    ),
    _fn("st_coorddim", "g STRING", "TINYINT", "CAST(2 AS TINYINT)"),
    # point extraction
    _fn(
        "st_startpoint", "g STRING", "STRING",
        _point("element_at(" + _XS_G + ", 1)", "element_at(" + _YS_G + ", 1)"),
    ),
    _fn(
        "st_endpoint", "g STRING", "STRING",
        _point("element_at(" + _XS_G + ", -1)", "element_at(" + _YS_G + ", -1)"),
    ),
    _fn(
        "st_pointn", "g STRING, n INT", "STRING",
        "CASE WHEN n >= 1 AND n <= size(" + _XS_G + ") THEN "
        + _point("element_at(" + _XS_G + ", n)", "element_at(" + _YS_G + ", n)")
        + " END",
    ),
    # measures
    _fn(
        "st_length", "g STRING", "DOUBLE",
        "aggregate(sequence(1, size(" + _XS_G + ") - 1), CAST(0.0 AS DOUBLE), "
        "(acc, i) -> acc + sqrt("
        "(element_at(" + _XS_G + ", i + 1) - element_at(" + _XS_G + ", i)) "
        "* (element_at(" + _XS_G + ", i + 1) - element_at(" + _XS_G + ", i)) "
        "+ (element_at(" + _YS_G + ", i + 1) - element_at(" + _YS_G + ", i)) "
        "* (element_at(" + _YS_G + ", i + 1) - element_at(" + _YS_G + ", i))))",
    ),
    _fn(
        "st_area", "g STRING", "DOUBLE",
        "CASE WHEN " + _TYPE.format(g="g") + " = 'POLYGON' THEN "
        "abs(" + _A2.format(xs=_XS_G, ys=_YS_G) + ") / 2 ELSE 0.0 END",
    ),
    _fn(
        "st_distance", "a STRING, b STRING", "DOUBLE",
        "CASE WHEN " + _TYPE.format(g="a") + " = 'POINT' AND "
        + _TYPE.format(g="b") + " = 'POINT' THEN sqrt("
        "(element_at(" + _XS.format(g="a") + ", 1) - element_at("
        + _XS.format(g="b") + ", 1)) * (element_at(" + _XS.format(g="a")
        + ", 1) - element_at(" + _XS.format(g="b") + ", 1)) + "
        "(element_at(" + _YS.format(g="a") + ", 1) - element_at("
        + _YS.format(g="b") + ", 1)) * (element_at(" + _YS.format(g="a")
        + ", 1) - element_at(" + _YS.format(g="b") + ", 1))) END",
    ),
    _fn(
        "st_envelope", "g STRING", "STRING",
        "concat('POLYGON ((', "
        + _NUM.format(v="array_min(" + _XS_G + ")") + ", ' ', "
        + _NUM.format(v="array_min(" + _YS_G + ")") + ", ', ', "
        + _NUM.format(v="array_max(" + _XS_G + ")") + ", ' ', "
        + _NUM.format(v="array_min(" + _YS_G + ")") + ", ', ', "
        + _NUM.format(v="array_max(" + _XS_G + ")") + ", ' ', "
        + _NUM.format(v="array_max(" + _YS_G + ")") + ", ', ', "
        + _NUM.format(v="array_min(" + _XS_G + ")") + ", ' ', "
        + _NUM.format(v="array_max(" + _YS_G + ")") + ", ', ', "
        + _NUM.format(v="array_min(" + _XS_G + ")") + ", ' ', "
        + _NUM.format(v="array_min(" + _YS_G + ")") + ", '))')",
    ),
    _fn(
        "st_centroid", "g STRING", "STRING",
        "CASE WHEN " + _TYPE.format(g="g") + " = 'POINT' THEN g "
        "WHEN " + _TYPE.format(g="g") + " = 'POLYGON' THEN "
        + _point(
            "(aggregate(sequence(1, size(" + _XS_G + ") - 1), "
            "CAST(0.0 AS DOUBLE), (acc, i) -> acc + "
            "(element_at(" + _XS_G + ", i) + element_at(" + _XS_G + ", i + 1))"
            " * (element_at(" + _XS_G + ", i) * element_at(" + _YS_G + ", i + 1)"
            " - element_at(" + _XS_G + ", i + 1) * element_at(" + _YS_G + ", i))))"
            " / (3 * " + _A2.format(xs=_XS_G, ys=_YS_G) + ")",
            "(aggregate(sequence(1, size(" + _XS_G + ") - 1), "
            "CAST(0.0 AS DOUBLE), (acc, i) -> acc + "
            "(element_at(" + _YS_G + ", i) + element_at(" + _YS_G + ", i + 1))"
            " * (element_at(" + _XS_G + ", i) * element_at(" + _YS_G + ", i + 1)"
            " - element_at(" + _XS_G + ", i + 1) * element_at(" + _YS_G + ", i))))"
            " / (3 * " + _A2.format(xs=_XS_G, ys=_YS_G) + ")",
        )
        + " ELSE "
        + _point(
            "aggregate(" + _XS_G + ", CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
            " / size(" + _XS_G + ")",
            "aggregate(" + _YS_G + ", CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
            " / size(" + _YS_G + ")",
        )
        + " END",
    ),
]


def register_geo_functions(spark: SparkSession) -> None:
    for stmt in _GEO_FUNCTIONS:
        spark.sql(stmt)
