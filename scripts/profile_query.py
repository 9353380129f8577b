#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1: measure first).

For each named query: build the shared layers (untimed, as bench.py does),
warm at sf0.001, then at $SPARK_GRAFT_SF_DIR measure best-of-N wall time
split into DATAFRAME BUILD (python construction), PLANNING (analysis +
optimization + physical planning, forced via executedPlan) and EXECUTION
(noop sink), plus the number of Spark jobs each execution triggers (driver
actions inside a query function — collect/count for literals — show up
here as extra jobs serialized before the final one). Optionally dumps
.explain("formatted") to plans/r12/<name>_<tag>.txt.

Usage:
  python scripts/profile_query.py [--plans TAG] [--n N] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    n_runs = 3
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        del args[i : i + 2]
    if "--n" in args:
        i = args.index("--n")
        n_runs = int(args[i + 1])
        del args[i : i + 2]
    names = args
    if not names:
        print("usage: profile_query.py [--plans TAG] [--n N] name...", file=sys.stderr)
        sys.exit(2)

    import bench
    from postgres_cdc_example_spark import queries as q
    from postgres_cdc_example_spark.session import get_spark

    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    for name in names:
        if name not in registry:
            print(f"unknown query: {name}", file=sys.stderr)
            sys.exit(2)
    # identical pre-state to bench.py: sf0.001 warm-up + layer prebuild
    for name in names:
        try:
            bench._force(registry[name](spark, "/root/testdata/sf0.001"))
        except Exception as e:
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
    bench._build_layers(spark)

    tracker = spark.sparkContext.statusTracker()
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best = None
        for run in range(n_runs):
            t0 = time.perf_counter()
            df = registry[name](spark, SF_DIR)
            t1 = time.perf_counter()
            jobs_before = tracker.getJobIdsForGroup(None)
            # force full planning without execution
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            bench._force(df)
            t3 = time.perf_counter()
            jobs_after = tracker.getJobIdsForGroup(None)
            row = {
                "build": t1 - t0,
                "plan": t2 - t1,
                "exec": t3 - t2,
                "total": t3 - t0,
                "jobs": len(set(jobs_after) - set(jobs_before)),
            }
            print(
                f"# {name} run{run}: build={row['build']:.3f} plan={row['plan']:.3f}"
                f" exec={row['exec']:.3f} total={row['total']:.3f}"
                f" jobs={row['jobs']}",
                flush=True,
            )
            if best is None or row["total"] < best["total"]:
                best = row
        print(
            f"{name}: best total={best['total']:.3f}"
            f" (build={best['build']:.3f} plan={best['plan']:.3f}"
            f" exec={best['exec']:.3f} jobs={best['jobs']})",
            flush=True,
        )
        if plans_tag:
            out_dir = os.path.join(ROOT, "plans", os.environ.get("PLANS_DIR", "r13"))
            os.makedirs(out_dir, exist_ok=True)
            df = registry[name](spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(out_dir, f"{name}_{plans_tag}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"# wrote {path}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
