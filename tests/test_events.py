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


def test_cusum_closed_form_equals_recursive(spark, sf_dir):
    """The operator's two-window closed form must replay the textbook
    recursive CUSUM S_i = max(0, S_{i-1} + dev_i) row for row."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from presto_db_spark.operators import events as E

    ev = E.load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    t = {
        r.event_type: r.tgt
        for r in ev.groupBy("event_type")
        .agg(F.expr("sum(cents) div count(*)").cast("bigint").alias("tgt"))
        .collect()
    }
    rows = sorted(
        ev.collect(), key=lambda r: (r.user_id, r.event_type, r.ts, r.event_id)
    )
    rec = defaultdict(int)
    per_type_alarms = defaultdict(int)
    per_type_max = defaultdict(int)
    for r in rows:
        k = (r.user_id, r.event_type)
        rec[k] = max(0, rec[k] + (r.cents - t[r.event_type]))
        if rec[k] > E.CUSUM_H_CENTS:
            per_type_alarms[r.event_type] += 1
        per_type_max[r.event_type] = max(per_type_max[r.event_type], rec[k])
    got = {
        r.event_type: (r.n_alarm_rows, r.max_cusum_cents)
        for r in E.QUERIES["events_cusum_changepoint"](spark, sf_dir).collect()
    }
    want = {
        et: (per_type_alarms[et], per_type_max[et]) for et in per_type_max
    }
    assert got == want
