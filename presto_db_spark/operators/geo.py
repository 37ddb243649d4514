"""Geospatial point operators — grid-blocked spatial join + point predicates.

The reference ships a geospatial plugin (``presto-geospatial/.../GeoFunctions
.java``, 60+ ``ST_*`` functions) and an R-tree spatial join
(``pm/operator/SpatialJoinOperator.java:40``, ``PagesRTreeIndex.java``;
SURVEY §2.3). Full geometry needs a GEOS binding (Sedona) — out of core
scope — but the *point* subset that covers the common analytics cases
(distance, radius join, bounding-box containment) is pure math, and the
scalable join strategy translates directly:

* Presto partitions space with a KDB-tree and R-tree-probes per partition;
* here space is partitioned with a **fixed grid of cell width r** (the
  radius): a pair within distance r must lie in the same or adjacent cells,
  so the left side emits 1 cell, the right side 9 neighbors, and the join
  is an equi-join on the cell key — one shuffle, candidates bounded per
  cell, no quadratic blowup (the same blocking idea as the LSH dedup and
  the bucketized range join).

Points are synthesized deterministically from customer keys (the testdata
has no geo columns); all predicates are plain expressions so the DuckDB
oracle value-checks everything.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .tpch import _t

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

RADIUS = 3.0
GRID = RADIUS  # cell width == radius → adjacency covers all candidate pairs


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# Deterministic synthetic coordinates in a 100×100 plane.
_X_SQL = "CAST((c_custkey * 37) % 1000 AS DOUBLE) / 10"
_Y_SQL = "CAST((c_custkey * 73) % 1000 AS DOUBLE) / 10"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    return cust.select(
        ck.alias("pid"),
        ((ck * 37 % 1000).cast("double") / 10).alias("x"),
        ((ck * 73 % 1000).cast("double") / 10).alias("y"),
    )


def st_distance(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """ST_Distance for points (GeoFunctions.java:ST_Distance), euclidean."""
    return F.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))


@_q(
    "geo_point_predicates",
    f"""
WITH p AS (SELECT c_custkey AS pid, {_X_SQL} AS x, {_Y_SQL} AS y
           FROM customer WHERE c_custkey < 500)
SELECT pid,
       round(sqrt((x - 50) * (x - 50) + (y - 50) * (y - 50)), 6) AS dist_center,
       (x >= 20 AND x < 60 AND y >= 30 AND y < 80) AS in_bbox,
       round(6371 * 2 * asin(sqrt(
         pow(sin(radians(y / 2 - 25) / 2), 2)
         + cos(radians(y / 2)) * cos(radians(25))
           * pow(sin(radians(x / 2 - 25) / 2), 2))), 6) AS haversine_km
FROM p
""",
)
def geo_point_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Distance, ST_Contains(bbox, point), great_circle_distance
    (``GeoFunctions.java``: ST_Contains, ST_Distance;
    ``pm/operator/scalar/MathFunctions.java``-adjacent haversine) as pure
    expressions over synthesized points (lat/lon scaled into range)."""
    pts = _points(spark, sf_dir).filter(F.col("pid") < 500)
    x, y = F.col("x"), F.col("y")
    lat1, lat2 = F.radians(y / 2), F.radians(F.lit(25.0))
    dlat = F.radians(y / 2 - 25) / 2
    dlon = F.radians(x / 2 - 25) / 2
    hav = (
        F.lit(6371.0)
        * 2
        * F.asin(
            F.sqrt(
                F.pow(F.sin(dlat), 2) + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon), 2)
            )
        )
    )
    return pts.select(
        "pid",
        F.round(st_distance(x, y, F.lit(50.0), F.lit(50.0)), 6).alias("dist_center"),
        ((x >= 20) & (x < 60) & (y >= 30) & (y < 80)).alias("in_bbox"),
        F.round(hav, 6).alias("haversine_km"),
    )


@_q(
    "geo_radius_join",
    f"""
WITH p AS (SELECT c_custkey AS pid, {_X_SQL} AS x, {_Y_SQL} AS y
           FROM customer WHERE c_custkey < 2000)
SELECT a.pid AS id_a, b.pid AS id_b,
       round(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 6) AS dist
FROM p a JOIN p b
  ON a.pid < b.pid
 AND sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) <= {RADIUS}
""",
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-radius self-join (``SpatialJoinOperator`` ST_Distance(a,b)<r
    case) via grid blocking: left emits its cell, right its 3×3 neighborhood;
    the equi-join on cell keys is the only shuffle. The oracle is the plain
    O(n²) inequality join — results must be identical."""
    pts = _points(spark, sf_dir).filter(F.col("pid") < 2000)
    cx, cy = F.floor(F.col("x") / GRID), F.floor(F.col("y") / GRID)
    left = pts.select(
        F.col("pid").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.concat_ws("_", cx, cy).alias("cell"),
    )
    neighbors = F.explode(
        F.flatten(
            F.array(
                *[
                    F.array(
                        *[
                            F.concat_ws("_", cx + dx, cy + dy)
                            for dy in (-1, 0, 1)
                        ]
                    )
                    for dx in (-1, 0, 1)
                ]
            )
        )
    )
    right = pts.select(
        F.col("pid").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        neighbors.alias("cell"),
    )
    dist = st_distance(F.col("xa"), F.col("ya"), F.col("xb"), F.col("yb"))
    return (
        left.join(right, ["cell"])
        .filter((F.col("id_a") < F.col("id_b")) & (dist <= RADIUS))
        .select("id_a", "id_b", F.round(dist, 6).alias("dist"))
    )
