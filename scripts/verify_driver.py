#!/usr/bin/env python
"""Driver-contract verification: exactly what the round driver does.

Runs `entry()` at sf0.001 (smoke), then EVERY registered query at sf0.01
against its DuckDB oracle — row count, sorted-column names, and
order-insensitive normalized values must all match. Rows-only queries
(no oracle) are executed and row-counted. Exit 0 iff everything passes.

Usage: python scripts/verify_driver.py [sf_dir]
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v + 0.0)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from postgres_cdc_example_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="verify-driver")
    spark.sparkContext.setLogLevel("ERROR")

    assert e.entry(spark).collect(), "entry() returned no rows"
    print("entry() smoke: OK", file=sys.stderr)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, osql = e.queries(), e.oracle_sql()
    fails, zero = [], []
    for name, fn in sorted(qs.items()):
        sdf = fn(spark, sf)
        scols = list(sdf.columns)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in osql:
            print(f"{name}: rows-only ({len(srows)} rows)", file=sys.stderr)
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
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} rows)", file=sys.stderr)
        if not ok:
            fails.append(name)
        elif not srows:
            zero.append(name)

    print(f"FAILURES: {fails or 'none'}")
    print(f"ZERO-ROW OK (vacuous): {zero or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
