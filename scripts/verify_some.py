#!/usr/bin/env python
"""Spot-verify NAMED queries against their DuckDB oracles — the same
row-count + column-set + order-insensitive normalized-value comparison as
scripts/verify_driver.py, restricted to a list of names so a per-query
optimization can be re-verified in seconds instead of a full sweep.

Usage: python scripts/verify_some.py [--sf SF_DIR] name [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from verify_driver import norm  # noqa: E402


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from postgres_cdc_example_spark.session import get_spark

    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        del args[:2]
    names = args
    if not names:
        print("usage: verify_some.py [--sf SF_DIR] name...", file=sys.stderr)
        return 2

    spark = get_spark(app_name="verify-some")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, osql = e.queries(), e.oracle_sql()
    fails = []
    for name in names:
        sdf = qs[name](spark, sf)
        scols = list(sdf.columns)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in osql:
            print(f"{name}: rows-only ({len(srows)} rows)")
            continue
        res = con.sql(osql[name])
        dcols = list(res.columns)
        drows = [tuple(r) for r in res.fetchall()]

        def order(cols):
            return sorted(range(len(cols)), key=lambda i: cols[i])

        sn = sorted(
            (tuple(norm(r[i]) for i in order(scols)) for r in srows), key=repr
        )
        dn = sorted(
            (tuple(norm(r[i]) for i in order(dcols)) for r in drows), key=repr
        )
        ok = sorted(scols) == sorted(dcols) and sn == dn
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} rows)")
        if not ok:
            fails.append(name)
    print(f"FAILURES: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
