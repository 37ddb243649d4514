from __future__ import annotations

import pytest

from presto_db_spark.operators import events as ev

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(ev.QUERIES))
def test_events_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, ev.QUERIES[name], ev.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"


def test_attribution_credit_invariants(spark, sf_dir):
    """events_attribution integer invariants: per model, total credit ==
    n_attributed_conversions * 1e6 ppm EXACTLY (the linear remainder
    assignment makes this an equality, not a float approximation), and
    first/last totals equal the linear total."""
    from presto_db_spark.operators import events as E

    rows = E.QUERIES["events_attribution"](spark, sf_dir).collect()
    assert rows, "no attributed conversions at this SF"
    tot_first = sum(r.first_ppm for r in rows)
    tot_last = sum(r.last_ppm for r in rows)
    tot_linear = sum(r.linear_ppm for r in rows)
    assert tot_first == tot_last == tot_linear
    assert tot_linear % E.ATTR_PPM == 0
