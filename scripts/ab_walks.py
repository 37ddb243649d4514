#!/usr/bin/env python
"""Same-session A/B for graph_random_walks: per-step lazy localCheckpoint
(current, r13 opt) vs the unpinned build-round form. Interleaved runs,
noop sink (bench methodology), row-identity via exceptAll both ways."""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402

from presto_db_spark.session import get_spark  # noqa: E402
from presto_db_spark.operators.graph import (  # noqa: E402
    _repeat_edges,
    WALK_STEPS,
    WALK_SRC_MOD,
    WALK_LCG_A,
    WALK_LCG_C,
    WALK_LCG_M,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def walks(spark: SparkSession, sf_dir: str, pin_steps: bool) -> DataFrame:
    edges = _repeat_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = edges.select(F.col("x").alias("u"), F.col("y").alias("w")).unionByName(
        edges.select(F.col("y").alias("u"), F.col("x").alias("w"))
    )
    wu = W.partitionBy("u").orderBy("w")
    adjr = adj.select(
        "u", "w",
        F.row_number().over(wu).alias("rn"),
        F.count("*").over(W.partitionBy("u")).alias("deg"),
    ).localCheckpoint(eager=False)
    frontier = (
        adj.filter(F.col("u") % WALK_SRC_MOD == 0)
        .select(F.col("u").alias("walk"), F.col("u").alias("node"))
        .distinct()
    )
    out = frontier.select("walk", F.lit(0).alias("step"), "node")
    for t in range(1, WALK_STEPS + 1):
        nxt = (
            frontier.join(adjr, frontier["node"] == adjr["u"])
            .filter(
                F.col("rn")
                == ((WALK_LCG_A * (F.col("walk") * 100003 + t * 1009
                                   + F.col("node")) + WALK_LCG_C)
                    % WALK_LCG_M) % F.col("deg") + 1
            )
            .select("walk", F.col("w").alias("node"))
        )
        frontier = nxt.localCheckpoint(eager=False) if pin_steps else nxt
        out = out.unionByName(
            frontier.select("walk", F.lit(t).alias("step"), "node")
        )
    return out.select(
        "walk", F.col("step").cast("long"), F.col("node").cast("long")
    ).orderBy("walk", "step")


def timed(df_fn, n=4):
    ts = []
    for _ in range(n):
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        ts.append(round(time.time() - t0, 3))
    return ts


def main() -> None:
    spark = get_spark("ab_walks")
    spark.sparkContext.setJobDescription("ab_walks")
    new = lambda: walks(spark, SF_DIR, True)   # noqa: E731
    old = lambda: walks(spark, SF_DIR, False)  # noqa: E731
    # row identity once up front
    a, b = new(), old()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, "rows differ"
    print("rows identical", a.count(), flush=True)
    # prewarm both
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
