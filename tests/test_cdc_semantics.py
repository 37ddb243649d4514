"""CDC fold semantics on a crafted change log (round 9).

The fixture corpus exercises cdc_apply_changes statistically; these tests
pin the MERGE-semantics edges explicitly on a constructed log:

* delete → re-insert: the key SURVIVES with the re-inserted value
  (the delete filter applies after the fold, not per-event);
* upsert → delete: the key is ABSENT from the snapshot;
* last-writer-wins on the total (ts, event_id) key, including two
  changes in the same microsecond (event_id breaks the tie);
* snapshot diff classifies insert / delete / update correctly across a
  cutoff.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def crafted_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cdc_events")
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ev(eid, ts, uid, etype, value):
        return {
            "event_id": eid,
            "ts": ts,
            "user_id": uid,
            "event_type": etype,
            "value": value,
            "props": "{}",
        }

    rows = [
        # user 1: upsert -> delete -> re-insert  => survives with 30.0
        ev(1, t0, 1, "click", 10.0),
        ev(2, t0 + dt.timedelta(days=1), 1, "error", 0.0),
        ev(3, t0 + dt.timedelta(days=10), 1, "purchase", 30.0),
        # user 2: upsert -> delete (last)        => absent
        ev(4, t0, 2, "view", 5.0),
        ev(5, t0 + dt.timedelta(days=10), 2, "error", 0.0),
        # user 3: two changes in the SAME microsecond — event_id 7 wins
        ev(6, t0, 3, "click", 1.0),
        ev(7, t0, 3, "click", 2.0),
        # user 4: appears only after the diff cutoff => 'insert' in diff
        ev(8, t0 + dt.timedelta(days=12), 4, "signup", 7.0),
    ]
    pd.DataFrame(rows).to_parquet(os.path.join(d, "events.parquet"))
    return str(d)


def _snapshot(spark, sf_dir):
    from presto_db_spark.operators.events import cdc_apply_changes

    return {
        r["user_id"]: r.asDict()
        for r in cdc_apply_changes(spark, sf_dir).collect()
    }


def test_delete_then_reinsert_survives(spark, crafted_sf_dir):
    snap = _snapshot(spark, crafted_sf_dir)
    assert 1 in snap and snap[1]["last_value"] == 30.0
    assert snap[1]["n_changes"] == 3 and snap[1]["n_deletes"] == 1


def test_trailing_delete_removes_key(spark, crafted_sf_dir):
    snap = _snapshot(spark, crafted_sf_dir)
    assert 2 not in snap


def test_same_microsecond_tiebreak_by_event_id(spark, crafted_sf_dir):
    snap = _snapshot(spark, crafted_sf_dir)
    assert snap[3]["last_value"] == 2.0  # event_id 7 beats 6


def test_streaming_fold_matches_batch(spark, crafted_sf_dir):
    from presto_db_spark.streaming.pipeline import streaming_cdc_apply

    batch = _snapshot(spark, crafted_sf_dir)
    stream = {
        r["user_id"]: r.asDict()
        for r in streaming_cdc_apply(spark, crafted_sf_dir).collect()
    }
    assert stream == batch


def test_snapshot_diff_classification(spark, crafted_sf_dir):
    # cutoff 2024-01-16: s1 sees events through day 10+1; user 4 and the
    # late changes land only in s2
    from presto_db_spark.operators import events as E

    rows = {
        (r["change_type"], r["user_id"]): (r["value_before"], r["value_after"])
        for r in E.cdc_snapshot_diff(spark, crafted_sf_dir).collect()
    }
    # user 1: before cutoff last op is the delete -> absent in s1;
    # after cutoff re-inserted -> 'insert'
    assert ("insert", 1) in rows and rows[("insert", 1)][1] == 30.0
    # user 2: present in s1 (delete comes after cutoff) -> 'delete'
    assert ("delete", 2) in rows and rows[("delete", 2)][0] == 5.0
    # user 4: only exists after cutoff -> 'insert'
    assert ("insert", 4) in rows
    # user 3: unchanged across the cutoff -> NOT in the diff
    assert not any(uid == 3 for _, uid in rows)
