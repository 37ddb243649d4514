"""Documentation-count gate (VERDICT r07 directive #3).

The README/COVERAGE registry totals and recorded-artifact bench claims
are machine-owned by ``scripts/update_counts.py``; this test runs its
``--check`` mode so any drift (a new operator without a doc regen, a
hand-edited number) fails the suite — same philosophy as the golden
corpus-accounting gate."""

import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_documented_counts_match_registry_and_artifacts():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "update_counts.py"),
         "--check"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
