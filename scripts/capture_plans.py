#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/$SPARK_GRAFT_PLAN_ROUND (default r14)/.

Usage: python scripts/capture_plans.py <suffix> [q1,q2,...]
Writes plans/<round>/<query>_<suffix>.txt. Plans are captured at
$SPARK_GRAFT_SF_DIR (default sf0.1) without executing the query (the
initial AQE plan: Exchange count, join strategy, PushedFilters,
ReadSchema, codegen spans and Python-eval nodes are all visible there).
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"))

def main():
    suffix = sys.argv[1]
    from presto_db_spark.registry import all_queries
    from presto_db_spark.session import get_spark
    import bench
    names = (
        [q.strip() for q in sys.argv[2].split(",") if q.strip()]
        if len(sys.argv) > 2 else list(bench.HEADLINE)
    )
    spark = get_spark("plan_capture")
    qs = all_queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok", len(plan.splitlines()), "lines")

if __name__ == "__main__":
    main()
