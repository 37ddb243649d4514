#!/usr/bin/env python
"""Ratchet the bench ambient-calibration references (VERDICT r07 #1).

Measures the three ambient probes (numpy matmul, spark ALU codegen,
spark parquet scan-aggregate — see bench.py) and lowers any ref in
ambient_refs.json that the current box beats.  Refs are the box's
best-ever idle values; they can only ever be TOO HIGH (pinned on a
contended box), which makes bench.py's factor under-correct — the honest
direction.  Run this whenever the box might be quiet (e.g. between work
phases); a ratchet-down makes future factors more accurate and never
rewrites history (recorded artifacts carry the refs they used).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    import bench

    from presto_db_spark.session import get_spark

    spark = get_spark("ambient_pin")
    probe = bench._ambient_probe(spark)
    # second pass: the first can carry residual JIT warmup
    probe2 = bench._ambient_probe(spark)
    measured = {
        k: min(v for v in (probe.get(k), probe2.get(k)) if v is not None)
        for k in set(probe) | set(probe2)
    }
    path = bench.AMBIENT_REFS_FILE
    with open(path) as f:
        refs = json.load(f)
    changed = []
    staged = refs.get("_staged", {})
    for key, val in measured.items():
        old = refs.get(key)
        if old is None or val < old:
            refs[key] = val
            # an explicit pin supersedes any staged auto-ratchet
            # candidate — a stale stage must never later raise the ref
            # back above this pin (bench._ratchet_refs also clamps).
            staged.pop(key, None)
            changed.append(f"{key}: {old} -> {val}")
    refs["_staged"] = staged
            if key == "scan_sec":
                # fingerprint the probe dataset the ref was pinned against
                # (ADVICE r08: bench.py drops the scan ratio on mismatch;
                # VERDICT r09 #6: row count recorded alongside bytes)
                refs["scan_probe_bytes"] = bench._scan_probe_bytes()
                rows = bench._scan_probe_rows()
                if rows is not None:
                    refs["scan_probe_rows"] = rows
    if changed:
        with open(path, "w") as f:
            json.dump(refs, f, indent=2)
            f.write("\n")
    print(json.dumps({"measured": measured, "ratcheted": changed}))


if __name__ == "__main__":
    main()
