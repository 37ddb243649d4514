from __future__ import annotations

import pytest

from presto_db_spark.operators import warehouse as wh

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(wh.QUERIES))
def test_warehouse_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, wh.QUERIES[name], wh.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"


def test_zorder_buckets_are_local_on_both_columns(spark, sf_dir):
    """The point of Z-order: bucket min/max spans must be tight on BOTH
    interleaved columns simultaneously — each occupied bucket's span must
    be far below the global range (a single-column sort would give tight
    spans on one column and near-global spans on the other)."""
    rows = wh.QUERIES["layout_zorder"](spark, sf_dir).collect()
    assert rows
    gx = max(r.max_custkey for r in rows) - min(r.min_custkey for r in rows)
    gy = max(r.max_day for r in rows) - min(r.min_day for r in rows)
    # weight by rows: the mass-weighted mean span is the pruning-relevant one
    n = sum(r.n_rows for r in rows)
    mx = sum(r.span_custkey * r.n_rows for r in rows) / n
    my = sum(r.span_day * r.n_rows for r in rows) / n
    assert mx <= gx / 4, (mx, gx)
    assert my <= gy / 4, (my, gy)
    for r in rows:
        assert r.min_custkey <= r.max_custkey
        assert r.min_day <= r.max_day


def test_scd2_intervals_partition_history(spark, sf_dir):
    """Per key: versions are 1..n contiguous, valid ranges are ordered and
    non-overlapping ([from, to) chaining), and exactly ONE current row."""
    rows = wh.QUERIES["scd2_order_history"](spark, sf_dir).collect()
    assert rows
    by_key = {}
    for r in rows:
        by_key.setdefault(r.o_custkey, []).append(r)
    for key, rs in by_key.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1)), key
        assert sum(r.is_current for r in rs) == 1
        assert rs[-1].is_current and rs[-1].valid_to is None
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from, (key, a.version)
            assert a.valid_from <= a.valid_to, (key, a.version)
