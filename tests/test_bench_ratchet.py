"""Unit tests for bench.py's two-phase ambient-ref ratchet (ADVICE r09
closure + r10 review fixes). The refs file feeds every future round's
normalized headline, so its transition rules are pinned here:

* a below-ref observation STAGES, it never persists directly;
* a second run within 10% CONFIRMS — and the persisted value is clamped
  to min(current ref, max of the two readings), so a stale stage can
  never raise a ref above an explicit pin;
* a non-confirming second observation replaces the stage (flukes age
  out);
* a scan-fixture fingerprint mismatch (bytes OR rows) re-pins the ref
  and both fingerprints immediately and drops any stage.
"""

from __future__ import annotations

import json

import bench


def _write_refs(tmp_path, refs):
    p = tmp_path / "ambient_refs.json"
    p.write_text(json.dumps(refs))
    return p


def _run(monkeypatch, tmp_path, refs, probe, **kw):
    p = _write_refs(tmp_path, refs)
    monkeypatch.setattr(bench, "AMBIENT_REFS_FILE", str(p))
    changed = bench._ratchet_refs(probe, probe, kw.get("probe_bytes"),
                                  kw.get("ref_bytes"), kw.get("probe_rows"),
                                  kw.get("ref_rows"))
    return json.loads(p.read_text()), changed


def test_below_ref_observation_stages_only(monkeypatch, tmp_path):
    refs, changed = _run(
        monkeypatch, tmp_path,
        {"spark_sec": 0.10}, {"spark_sec": 0.08},
    )
    assert refs["spark_sec"] == 0.10          # live ref untouched
    assert refs["_staged"]["spark_sec"] == 0.08
    assert any("staged" in c for c in changed)


def test_second_run_confirms_with_conservative_max(monkeypatch, tmp_path):
    refs, changed = _run(
        monkeypatch, tmp_path,
        {"spark_sec": 0.10, "_staged": {"spark_sec": 0.080}},
        {"spark_sec": 0.084},                 # within 10% of the stage
    )
    assert refs["spark_sec"] == 0.084         # max(0.080, 0.084)
    assert "spark_sec" not in refs.get("_staged", {})
    assert any("confirmed" in c for c in changed)


def test_confirmation_clamped_to_current_ref(monkeypatch, tmp_path):
    """A stale stage above a freshly pinned ref must not raise it."""
    refs, _ = _run(
        monkeypatch, tmp_path,
        {"spark_sec": 0.14, "_staged": {"spark_sec": 0.15}},
        {"spark_sec": 0.139},                 # below ref, within 10% of stage
    )
    assert refs["spark_sec"] == 0.14          # min(old, max(val, cand))


def test_nonconfirming_observation_replaces_stage(monkeypatch, tmp_path):
    refs, _ = _run(
        monkeypatch, tmp_path,
        {"spark_sec": 0.10, "_staged": {"spark_sec": 0.050}},  # old fluke
        {"spark_sec": 0.090},                 # far from the fluke
    )
    assert refs["spark_sec"] == 0.10
    assert refs["_staged"]["spark_sec"] == 0.090


def test_above_ref_observation_is_ignored(monkeypatch, tmp_path):
    refs, changed = _run(
        monkeypatch, tmp_path,
        {"spark_sec": 0.10}, {"spark_sec": 0.25},
    )
    assert refs["spark_sec"] == 0.10
    assert "spark_sec" not in refs.get("_staged", {})
    assert changed == []


def test_fixture_bytes_mismatch_repins_immediately(monkeypatch, tmp_path):
    refs, changed = _run(
        monkeypatch, tmp_path,
        {"scan_sec": 0.10, "scan_probe_bytes": 111, "scan_probe_rows": 5,
         "_staged": {"scan_sec": 0.07}},
        {"scan_sec": 0.20},
        probe_bytes=222, ref_bytes=111, probe_rows=5, ref_rows=5,
    )
    assert refs["scan_sec"] == 0.20
    assert refs["scan_probe_bytes"] == 222
    assert "scan_sec" not in refs.get("_staged", {})
    assert any("new fixture" in c for c in changed)


def test_fixture_rows_mismatch_repins_immediately(monkeypatch, tmp_path):
    """Same bytes, different rows (the VERDICT r09 #6 motivating case):
    must re-pin — never stage against the incomparable fixture."""
    refs, changed = _run(
        monkeypatch, tmp_path,
        {"scan_sec": 0.10, "scan_probe_bytes": 111, "scan_probe_rows": 5},
        {"scan_sec": 0.08},
        probe_bytes=111, ref_bytes=111, probe_rows=9, ref_rows=5,
    )
    assert refs["scan_sec"] == 0.08
    assert refs["scan_probe_rows"] == 9
    assert any("new fixture" in c for c in changed)
