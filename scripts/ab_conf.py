#!/usr/bin/env python
"""A/B a set of runtime SQL confs over a query list, bench-style.

Interleaves A (baseline session confs) and B (with --conf overrides applied
via spark.conf.set) pass by pass in ONE session, so ambient drift hits both
arms equally; reports per-query min and the A/B totals. Only runtime-settable
SQL confs can be tested this way (AQE knobs, join prefs, advisory sizes).

Usage:
  python scripts/ab_conf.py --conf k=v[,k=v...] [--n N] [--queries a,b,...]
  (default query list: every BENCH_QUERIES entry)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    confs: dict[str, str] = {}
    n_passes = 2
    names: list[str] | None = None
    while args:
        a = args.pop(0)
        if a == "--conf":
            for kv in args.pop(0).split(","):
                k, v = kv.split("=", 1)
                confs[k] = v
        elif a == "--n":
            n_passes = int(args.pop(0))
        elif a == "--queries":
            names = args.pop(0).split(",")
        else:
            print(f"unknown arg {a}", file=sys.stderr)
            sys.exit(2)
    if not confs:
        print("need --conf", file=sys.stderr)
        sys.exit(2)

    import bench
    from postgres_cdc_example_spark import queries as q
    from postgres_cdc_example_spark.session import get_spark

    spark = get_spark(app_name="ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    if names is None:
        names = list(bench.BENCH_QUERIES)
    baseline = {k: spark.conf.get(k, None) for k in confs}

    for name in names:
        try:
            bench._force(registry[name](spark, "/root/testdata/sf0.001"))
        except Exception as e:
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
    bench._build_layers(spark)

    res: dict[str, dict[str, list[float]]] = {
        "A": {n: [] for n in names},
        "B": {n: [] for n in names},
    }

    def set_mode(mode: str) -> None:
        for k, v in confs.items():
            if mode == "B":
                spark.conf.set(k, v)
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    for p in range(n_passes):
        for mode in ("A", "B"):
            set_mode(mode)
            for name in names:
                t0 = time.perf_counter()
                bench._force(registry[name](spark, SF_DIR))
                res[mode][name].append(time.perf_counter() - t0)
        print(f"# pass {p + 1}/{n_passes} done", file=sys.stderr)
    set_mode("A")

    ta = tb = 0.0
    print(f"{'query':42s} {'A':>7s} {'B':>7s} {'B/A':>6s}")
    for name in names:
        a = min(res["A"][name])
        b = min(res["B"][name])
        ta += a
        tb += b
        flag = " <<<" if b / a > 1.15 else (" >>>" if b / a < 0.87 else "")
        print(f"{name:42s} {a:7.3f} {b:7.3f} {b / a:6.2f}{flag}")
    print(f"{'TOTAL':42s} {ta:7.3f} {tb:7.3f} {tb / ta:6.2f}")


if __name__ == "__main__":
    main()
