"""Z-order write-side contract (VERDICT r07 directive #7).

``layout_zorder`` computes the Morton key and measures per-bucket
locality; these tests prove the WRITTEN layout delivers the claim:

* the Z-clustered parquet's row-group min/max statistics prune a
  both-dimension predicate to a small fraction of row groups, while an
  unclustered write of the SAME rows prunes (almost) nothing — checked
  directly against the parquet footers via pyarrow, i.e. the same
  statistics any parquet reader (Spark's included) consults;
* Spark's read plan over the written table shows the predicate pushed
  into the scan (PushedFilters), so the engine actually uses them;
* the filtered result over the Z-layout equals the filtered result over
  the unclustered layout — layout changes scan cost, never values.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
import pytest

from presto_db_spark.operators.warehouse import _zkeyed_orders
from presto_db_spark.sources.io import write_zordered

from pyspark.sql import functions as F


def _stats(path: str, col: str) -> list[tuple[int, int]]:
    """(min, max) of ``col`` for every row group under ``path``."""
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            spans.append((st.min, st.max))
    return spans


def _surviving(spans: list[tuple[int, int]], lo: int, hi: int) -> float:
    hit = sum(1 for mn, mx in spans if mx >= lo and mn <= hi)
    return hit / len(spans)


@pytest.fixture(scope="module")
def layouts(spark):
    # sf0.01 (the driver's correctness SF): 15k orders over 64 row groups
    # gives stats tight enough that the pruning fraction is a signal, not
    # sampling noise (sf0.001's 1500 rows over 16 groups sit right at the
    # threshold).
    from tests.conftest import SF_DIR_CORRECTNESS

    z = _zkeyed_orders(spark, SF_DIR_CORRECTNESS).select(
        "o_orderkey",
        F.col("xr").alias("o_custkey"),
        F.col("yr").alias("day_1992"),
        "zkey",
    )
    zdir = tempfile.mkdtemp(prefix="ztest_clustered_")
    flat = tempfile.mkdtemp(prefix="ztest_unclustered_")
    write_zordered(z, zdir, zcol="zkey", n_files=64)
    # unclustered control: same rows, same file count, natural
    # (orderkey-ish) arrival order — custkey and day are uncorrelated
    # with it, so every file spans (nearly) the full domain of both.
    z.drop("zkey").repartition(64).write.mode("overwrite").parquet(flat)
    return zdir, flat


def test_zorder_rowgroups_prune_on_both_columns(layouts):
    zdir, flat = layouts
    # thin slice of each dimension (~10% of the domain)
    for col in ("o_custkey", "day_1992"):
        spans_z = _stats(zdir, col)
        spans_f = _stats(flat, col)
        assert len(spans_z) >= 8 and len(spans_f) >= 8
        dom_lo = min(mn for mn, _ in spans_f)
        dom_hi = max(mx for _, mx in spans_f)
        width = max((dom_hi - dom_lo) // 10, 1)
        lo, hi = dom_lo + 4 * width, dom_lo + 5 * width
        frac_z = _surviving(spans_z, lo, hi)
        frac_f = _surviving(spans_f, lo, hi)
        # Z-layout: a 10% slice of either dimension touches well under
        # half the row groups; the unclustered control touches ~all.
        assert frac_z <= 0.5, (col, frac_z, spans_z)
        assert frac_f >= 0.9, (col, frac_f, spans_f)
        assert frac_z < frac_f


def test_zorder_read_pushes_filters(spark, layouts):
    # one column per read: the rendered plan truncates long PushedFilters
    # lists, so a combined predicate can hide the second column's entry.
    zdir, _ = layouts
    for col, lo, hi in (("o_custkey", 1, 120), ("day_1992", 1500, 1900)):
        df = spark.read.parquet(zdir).filter(F.col(col).between(lo, hi))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        assert f"GreaterThanOrEqual({col}" in plan, plan


def test_zorder_pruned_read_reuses_one_scratch_dir(spark):
    # VERDICT r08 #4: the registry query used mkdtemp per invocation,
    # leaking a full orders copy per bench run.  The path is now a fixed
    # per-(process, SF) location, so repeated invocations overwrite in
    # place instead of accumulating.
    from presto_db_spark.operators.warehouse import (
        _zorder_write_path,
        layout_zorder_pruned_read,
    )
    from tests.conftest import SF_DIR

    p1 = _zorder_write_path(SF_DIR)
    p2 = _zorder_write_path(SF_DIR)
    assert p1 == p2
    layout_zorder_pruned_read(spark, SF_DIR).collect()
    files_first = sorted(glob.glob(os.path.join(p1, "*.parquet")))
    layout_zorder_pruned_read(spark, SF_DIR).collect()
    files_second = sorted(glob.glob(os.path.join(p1, "*.parquet")))
    assert len(files_second) == len(files_first) > 0
    # and no per-invocation mkdtemp siblings appeared (the old leak made
    # zorder_orders_<random8> dirs; the fixed scheme is zorder_orders_sf*_<pid>)
    strays = [
        d
        for d in glob.glob(os.path.join(tempfile.gettempdir(), "zorder_orders_*"))
        if not os.path.basename(d).startswith("zorder_orders_sf")
    ]
    assert strays == []


def test_zorder_layout_preserves_values(spark, layouts):
    zdir, flat = layouts
    pred = "o_custkey BETWEEN 1 AND 120 AND day_1992 BETWEEN 1500 AND 1900"
    a = sorted(
        tuple(r) for r in spark.read.parquet(zdir).filter(pred).collect()
    )
    b = sorted(
        tuple(r) for r in spark.read.parquet(flat).filter(pred).collect()
    )
    assert a == b and len(a) > 0


def test_hilbert_run_locality_vs_zorder(spark, sf_dir):
    """The measured claim behind `layout_hilbert`: over equal-count RUNS
    of the sort key (the physical row-group model), Hilbert's footer
    spans are tighter than Morton's on the row-weighted mean of BOTH
    columns (no quadrant-boundary jumps), and at least as tight on each
    column individually. At fixed aligned-cell granularity the two keys
    partition points IDENTICALLY (both keys' top bits name the same
    quadtree cell) — which is why this test compares runs, not cells."""
    from presto_db_spark.operators import warehouse as wh

    def metric(rows):
        n = sum(r.n_rows for r in rows)
        return (
            sum(r.n_rows * r.span_custkey for r in rows) / n,
            sum(r.n_rows * r.span_day for r in rows) / n,
        )

    zc, zd = metric(wh._run_span_report(wh._zkeyed_orders(spark, sf_dir), "zkey").collect())
    hc, hd = metric(wh.QUERIES["layout_hilbert"](spark, sf_dir).collect())
    assert hc + hd < zc + zd, (hc, hd, zc, zd)
    assert hc <= zc * 1.02 and hd <= zd * 1.02, (hc, hd, zc, zd)


def test_hilbert_arrow_matches_expression_chain(spark, sf_dir):
    """Three-way parity anchor: the Arrow xy2d pass (operator path) must
    equal the pure-JVM CASE-expression chain generated from the SAME
    formula text the DuckDB oracle inlines. (Arrow == oracle is pinned by
    the registry value-hash; this pins Arrow == JVM-chain, closing the
    triangle.)"""
    from presto_db_spark.operators import warehouse as wh

    a = {
        r.o_orderkey: r.hkey
        for r in wh._hkeyed_orders(spark, sf_dir).collect()
    }
    b = {
        r.o_orderkey: r.hkey
        for r in wh._hkeyed_orders_expr(spark, sf_dir).collect()
    }
    assert a == b and len(a) > 0
