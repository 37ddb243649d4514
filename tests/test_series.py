from __future__ import annotations

import pytest

from presto_db_spark.operators import series as sr

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(sr.QUERIES))
def test_series_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, sr.QUERIES[name], sr.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"


def test_stl_identity_holds(spark, sf_dir):
    """Where trend is defined, cents*1e6 == trend + seasonal + remainder
    EXACTLY (additive decomposition is an identity, not a fit)."""
    rows = sr.QUERIES["events_stl_decompose"](spark, sf_dir).collect()
    assert rows
    interior = [r for r in rows if r.trend_micros is not None]
    assert interior, "no full 7-day windows in the fixture"
    for r in interior:
        assert (
            r.cents * 1_000_000
            == r.trend_micros + r.seasonal_micros + r.remainder_micros
        ), r


def test_gap_fill_brackets_and_endpoints(spark, sf_dir):
    """Every interpolated value sits within [min, max] of its bracketing
    known values; non-gap days carry their own value; at least one gap
    exists (the %3 hole pattern guarantees it)."""
    rows = sr.QUERIES["events_gap_fill_interpolate"](spark, sf_dir).collect()
    gaps = [r for r in rows if r.is_gap]
    assert gaps, "hole pattern produced no gaps"
    known = {r.d: r.filled_cents for r in rows if not r.is_gap}
    days = sorted(r.d for r in rows)
    for g in gaps:
        prevs = [d for d in days if d < g.d and d in known]
        nexts = [d for d in days if d > g.d and d in known]
        if prevs and nexts:
            lo = min(known[prevs[-1]], known[nexts[0]])
            hi = max(known[prevs[-1]], known[nexts[0]])
            assert lo <= g.filled_cents <= hi, g


def test_bootstrap_ci_orders(spark, sf_dir):
    r = sr.QUERIES["stats_bootstrap_ci"](spark, sf_dir).collect()[0]
    assert r.ci_lo_cents <= r.ci_hi_cents
    # the sample mean of a location statistic sits inside a 95% CI on
    # this fixture (not guaranteed in general, but deterministic here)
    assert r.ci_lo_cents <= r.sample_mean_cents <= r.ci_hi_cents
    assert r.n_resamples == sr.BOOT_B and r.n_days >= 20


def test_apportionment_sums_to_budget(spark, sf_dir):
    rows = sr.QUERIES["sample_allocation_apportion"](spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == sr.ALLOC_N
    # monotone in weight up to the +1 remainder seat
    by_wt = sorted(rows, key=lambda r: r.n_rows * r.range_cents)
    allocs = [r.alloc for r in by_wt]
    for a, b in zip(allocs, allocs[1:]):
        assert b >= a - 1


def test_weighted_median_is_weighted_midpoint(spark, sf_dir):
    r = sr.QUERIES["agg_weighted_median"](spark, sf_dir).collect()[0]
    # re-derive from first principles on the driver (fixture-sized check)
    import duckdb

    con = duckdb.connect()
    got = con.execute(
        f"""
        WITH g AS (SELECT CAST(round(l_extendedprice*100) AS BIGINT) c,
                          CAST(sum(round(l_quantity)) AS BIGINT) w
                   FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1)
        SELECT min(c) FROM (
          SELECT c, sum(w) OVER (ORDER BY c) s, sum(w) OVER () t FROM g
        ) WHERE 2*s >= t
        """
    ).fetchone()[0]
    assert r.median_cents == got
