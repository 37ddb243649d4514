"""Property tests for the distributed-rank primitive (operators/distrank).

The scalable twins' oracles already prove end-to-end equality with the
single-partition ntile / cumulative-window SQL on the driver fixtures;
these tests pin the PRIMITIVE itself against Spark's own window
operators on crafted edge cases the fixtures don't cover: heavy ties
(only the composite key is unique), N not divisible by k, N < k, N == 1,
descending order keys, and the running-sum path — so a future change to
the offset arithmetic or the arithmetic-ntile formula fails here before
it reaches an operator."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from presto_db_spark.operators.distrank import global_index, ntile_expr


def _crafted(spark, n: int, n_distinct_vals: int, seed: int):
    rnd = random.Random(seed)
    rows = [(i, rnd.randrange(n_distinct_vals), rnd.randrange(1000)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long, amt long")


def _window_truth(df, order_cols, k):
    w = W.orderBy(*order_cols)
    return {
        r["id"]: (r["rn"], r["nt"], r["cs"])
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rn"),
            F.ntile(k).over(w).alias("nt"),
            F.sum("amt")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("cs"),
        ).collect()
    }


def _distrank_result(df, order_cols, k):
    """Runs BOTH strategies — the running-sum window path (sum_col set)
    and the sorted-partition row-offset rank-only path — asserts their
    ranks/buckets agree, and returns the window path's full triple."""
    gi = global_index(df, order_cols, sum_col="amt")
    full = {
        r["id"]: (r["__rn"], r["nt"], r["__csum"])
        for r in gi.select(
            "id",
            "__rn",
            ntile_expr("__rn", "__n_total", k).alias("nt"),
            "__csum",
        ).collect()
    }
    ro = global_index(df, order_cols)
    rank_only = {
        r["id"]: (r["__rn"], r["nt"])
        for r in ro.select(
            "id", "__rn", ntile_expr("__rn", "__n_total", k).alias("nt")
        ).collect()
    }
    assert rank_only == {i: (rn, nt) for i, (rn, nt, _) in full.items()}
    return full


def test_global_index_matches_window_heavy_ties(spark):
    """200 rows over only 7 distinct order values — ranks, ntile(5)
    buckets and the inclusive running sum must all equal the
    single-window truth (the composite (v, id) key totalizes ties)."""
    df = _crafted(spark, 200, 7, seed=1)
    order = [F.asc("v"), F.asc("id")]
    assert _distrank_result(df, order, 5) == _window_truth(df, order, 5)


def test_global_index_matches_window_descending(spark):
    """Descending order key (the ABC shape: cents DESC, part ASC)."""
    df = _crafted(spark, 137, 23, seed=2)
    order = [F.desc("amt"), F.asc("id")]
    assert _distrank_result(df, order, 5) == _window_truth(df, order, 5)


def test_ntile_small_and_indivisible_n(spark):
    """N < k (every rank lands in its own bucket per the SQL-standard
    equal-height rule), N == 1, and N % k != 0 — the arithmetic formula
    must agree with F.ntile in all three regimes."""
    for n, k in [(3, 5), (1, 5), (17, 5), (25, 4), (6, 6)]:
        df = _crafted(spark, n, 1000, seed=n * 31 + k)
        order = [F.asc("v"), F.asc("id")]
        assert _distrank_result(df, order, k) == _window_truth(df, order, k), (n, k)


def test_global_index_totals(spark):
    """__n_total / __sum_total are the grand totals on every row."""
    df = _crafted(spark, 61, 9, seed=7)
    gi = global_index(df, [F.asc("v"), F.asc("id")], sum_col="amt")
    rows = gi.select("__n_total", "__sum_total").distinct().collect()
    assert len(rows) == 1
    total = df.agg(F.count("*"), F.sum("amt")).collect()[0]
    assert (rows[0]["__n_total"], rows[0]["__sum_total"]) == (total[0], total[1])
