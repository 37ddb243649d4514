from __future__ import annotations

import numpy as np
import pytest

from presto_db_spark.operators import tdigest

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(tdigest.QUERIES))
def test_tdigest_vs_duckdb(spark, sf_dir, name):
    fn, sql = tdigest.QUERIES[name], tdigest.ORACLE.get(name)
    problems = check_query(spark, name, fn, sql, sf_dir)
    assert not problems, f"{name}: {problems}"


def test_tdigest_accuracy_unknown_domain():
    """The adaptive digest's raison d'être: a power-law domain spanning six
    orders of magnitude, where any fixed grid sized for the bulk would put
    the whole tail in one bin. Rank error must stay under 1/COMPRESSION at
    every probed quantile — far tighter than the registry contract's EPS."""
    rng = np.random.default_rng(11)
    x = rng.lognormal(mean=3.0, sigma=2.5, size=100_000)
    m, w = tdigest.build_digest(x, np.ones(len(x)))
    assert len(m) <= 2 * tdigest.COMPRESSION
    xs = np.sort(x)
    for q in (0.001, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999):
        est = tdigest.digest_quantile(m, w, q)
        rank = np.searchsorted(xs, est) / len(x)
        assert abs(rank - q) < 1.0 / tdigest.COMPRESSION, (q, est, rank)


def test_tdigest_merge_matches_oneshot():
    """Mergeability: partial digests built on arbitrary splits, merged, must
    estimate within the same rank-error budget as the one-shot digest —
    the property that makes the two-phase distributed plan correct."""
    rng = np.random.default_rng(5)
    x = rng.exponential(100.0, 80_000)
    chunks = np.array_split(x, 17)
    ms, ws = [], []
    for c in chunks:
        a, b = tdigest.build_digest(c, np.ones(len(c)))
        ms.append(a)
        ws.append(b)
    mm, mw = tdigest.build_digest(np.concatenate(ms), np.concatenate(ws))
    assert len(mm) <= 2 * tdigest.COMPRESSION
    xs = np.sort(x)
    for q in (0.01, 0.5, 0.99):
        est = tdigest.digest_quantile(mm, mw, q)
        rank = np.searchsorted(xs, est) / len(x)
        assert abs(rank - q) < 2.0 / tdigest.COMPRESSION, (q, est, rank)


def test_tdigest_weighted_and_edges():
    """Weighted points behave as repeated points; empty and single-point
    digests are well-defined."""
    m, w = tdigest.build_digest(np.array([]), np.array([]))
    assert len(m) == 0 and np.isnan(tdigest.digest_quantile(m, w, 0.5))

    m, w = tdigest.build_digest(np.array([42.0]), np.array([3.0]))
    assert tdigest.digest_quantile(m, w, 0.01) == 42.0
    assert tdigest.digest_quantile(m, w, 0.99) == 42.0

    # weight-10 at 0 and weight-90 at 100: p50 must sit near 100's side
    m, w = tdigest.build_digest(np.array([0.0, 100.0]), np.array([10.0, 90.0]))
    assert tdigest.digest_quantile(m, w, 0.95) == 100.0
    v = np.r_[np.zeros(10), np.full(90, 100.0)]
    me, we = tdigest.build_digest(v, np.ones(100))
    assert tdigest.digest_quantile(me, we, 0.95) == tdigest.digest_quantile(m, w, 0.95)


def test_tdigest_sql_surface(spark, sf_dir):
    """The reference's digest function names through Engine.sql
    (TDigestFunctions.java / TDigestAggregationFunction.java): a pasted
    Presto digest query runs — tdigest_agg in GROUP BY, value_at_quantile
    / values_at_quantiles / quantile_at_value accessors, and merge() of
    per-group digests equaling the global digest within the rank-error
    bound."""
    import duckdb
    import numpy as np

    from presto_db_spark.engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    rows = eng.sql(
        "SELECT o_orderpriority, "
        "value_at_quantile(tdigest_agg(o_totalprice), 0.5) AS p50, "
        "values_at_quantiles(tdigest_agg(o_totalprice), ARRAY[0.25, 0.75]) AS pq, "
        "quantile_at_value(tdigest_agg(o_totalprice), 100000.0) AS r "
        "FROM orders GROUP BY o_orderpriority"
    ).collect()
    assert len(rows) == 5
    for row in rows:
        assert row.pq[0] < row.p50 < row.pq[1]
        assert 0.0 <= row.r <= 1.0

    merged = eng.sql(
        "WITH monthly AS (SELECT month(o_orderdate) AS m, "
        "tdigest_agg(o_totalprice) AS d FROM orders GROUP BY month(o_orderdate)) "
        "SELECT value_at_quantile(merge(d), 0.5) AS p50 FROM monthly"
    ).collect()[0].p50
    vals = np.sort(
        duckdb.sql(
            f"SELECT o_totalprice FROM read_parquet('{sf_dir}/orders.parquet')"
        ).fetchnumpy()["o_totalprice"]
    )
    rank = np.searchsorted(vals, merged) / len(vals)
    assert abs(rank - 0.5) < 0.02, f"merged digest rank error {abs(rank - 0.5)}"


def test_qdigest_sql_surface(spark, sf_dir):
    """qdigest spellings (QuantileDigestFunctions.java /
    QuantileDigestAggregationFunction.java): plain, weighted (x, w) and
    accuracy (x, w, e) forms all run; uniform weight == unweighted; a
    2x-weighted upper half shifts the median up."""
    from presto_db_spark.engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    row = eng.sql(
        "SELECT value_at_quantile(qdigest_agg(o_totalprice), 0.5) AS p,"
        "       value_at_quantile(qdigest_agg(o_totalprice, 1), 0.5) AS pw,"
        "       value_at_quantile(qdigest_agg(o_totalprice, 1, 0.01), 0.5) AS pa,"
        "       value_at_quantile(qdigest_agg(o_totalprice,"
        "         CASE WHEN o_totalprice > 200000 THEN 3 ELSE 1 END), 0.5) AS pskew"
        " FROM orders"
    ).collect()[0]
    assert row.p == row.pw == row.pa
    assert row.pskew > row.p
