#!/usr/bin/env python
"""Same-session A/B for graph_bfs_distances: per-round visited
re-checkpoint (current) vs visited-as-union-of-pinned-frontiers (the
r13 'not yet optimized' candidate — drops one materialization per
round; the anti-join probes the union of already-pinned frontiers)."""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from presto_db_spark.session import get_spark  # noqa: E402
from presto_db_spark.operators.graph import (  # noqa: E402
    _repeat_edges,
    _BFS_MAX_DEPTH,
    _BFS_SRC_MOD,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bfs(spark: SparkSession, sf_dir: str, union_visited: bool) -> DataFrame:
    edges = _repeat_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = edges.select(F.col("x").alias("u"), F.col("y").alias("w")).unionAll(
        edges.select(F.col("y").alias("u"), F.col("x").alias("w"))
    ).localCheckpoint(eager=False)
    srcs = (
        adj.select(F.col("u").alias("node"))
        .filter(F.col("node") % _BFS_SRC_MOD == 0)
        .distinct()
    )
    if union_visited:
        srcs = srcs.localCheckpoint(eager=False)
        visited = srcs.withColumn("dist", F.lit(0).cast("int"))
        frontier = srcs
        for d in range(1, _BFS_MAX_DEPTH + 1):
            reached = (
                frontier.join(adj, frontier["node"] == adj["u"])
                .select(F.col("w").alias("node"))
                .distinct()
            )
            frontier = reached.join(
                visited.select("node"), "node", "left_anti"
            ).localCheckpoint(eager=False)
            visited = visited.unionAll(
                frontier.withColumn("dist", F.lit(d).cast("int"))
            )
    else:
        visited = srcs.withColumn("dist", F.lit(0).cast("int")).localCheckpoint(
            eager=False
        )
        frontier = srcs
        for d in range(1, _BFS_MAX_DEPTH + 1):
            reached = (
                frontier.join(adj, frontier["node"] == adj["u"])
                .select(F.col("w").alias("node"))
                .distinct()
            )
            frontier = reached.join(visited, "node", "left_anti").localCheckpoint(
                eager=False
            )
            visited = visited.unionAll(
                frontier.withColumn("dist", F.lit(d).cast("int"))
            ).localCheckpoint(eager=False)
    return (
        visited.groupBy("dist")
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .orderBy("dist")
    )


def timed(df_fn, n=4):
    ts = []
    for _ in range(n):
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        ts.append(round(time.time() - t0, 3))
    return ts


def main() -> None:
    spark = get_spark("ab_bfs")
    spark.sparkContext.setJobDescription("ab_bfs")
    new = lambda: bfs(spark, SF_DIR, True)   # noqa: E731
    old = lambda: bfs(spark, SF_DIR, False)  # noqa: E731
    a, b = new(), old()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, "rows differ"
    print("rows identical", a.count(), flush=True)
    timed(new, 1); timed(old, 1)
    for block in range(3):
        to = timed(old)
        tn = timed(new)
        print(
            f"block{block}: old(median {statistics.median(to):.2f}) {to}  "
            f"new(median {statistics.median(tn):.2f}) {tn}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
