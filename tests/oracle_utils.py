"""Local replica of the driver's oracle comparison: run the Spark query and
the DuckDB oracle SQL on the same parquet fixtures, compare row count,
column names (sorted), and values order-insensitively and exactly — at least
as strict as the driver's value hash."""

from __future__ import annotations

import datetime
import math
import os

import duckdb

from postgres_cdc_example_spark.schemas import FIXTURE_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and represent with enough digits to be exact
        return repr(v + 0.0)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def normalize_result(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver semantics), then rows by repr."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _assert_driver_canonicalizable(s_pdf, d_pdf) -> None:
    """The driver compares via pandas (`toPandas` vs `fetchdf`), stringifying
    values after a sort-canonicalization. Two failure modes invisible to the
    exact fetchall() compare below:

    - DuckDB HUGEINT (e.g. sum(BIGINT)) arrives as float64 while Spark sends
      int64 -> "117.0" != "117" hash mismatch. Catch: dtype-kind mismatch.
    - list/array-valued cells are unhashable in the driver's pandas sort.
    """
    d_kinds = {c: d_pdf[c].dtype.kind for c in d_pdf.columns}
    for c in s_pdf.columns:
        sk, dk = s_pdf[c].dtype.kind, d_kinds.get(c, "?")
        numeric = {"i", "u", "f"}
        if sk in numeric or dk in numeric:
            if dk == "f" and c in d_pdf.columns and d_pdf[c].isna().any():
                # Null-induced float64: a nullable int column becomes float64
                # in pandas on BOTH sides of the driver's compare (the frames
                # are value-identical, so they null together) — "9711.0" ==
                # "9711.0" still hashes equal. Only a null-FREE float column
                # facing ints signals the dangerous HUGEINT->float64 class.
                # (The Spark sample here is limit(20), so its kind can differ
                # from the full frame's — sf0.01 caught exactly that on
                # cdc_scd2_history's valid_to_seq.)
                continue
            assert (sk in {"i", "u"}) == (dk in {"i", "u"}), (
                f"driver-visible dtype mismatch on {c!r}: spark kind={sk} "
                f"duckdb kind={dk} (HUGEINT->float64? cast the oracle sum)"
            )
        if sk == "O":
            import numpy as np

            for cell in s_pdf[c].head(5):
                assert not isinstance(cell, (list, tuple, dict, np.ndarray)), (
                    f"column {c!r} holds array values — unhashable in the driver "
                    "canonicalizer; project to scalars (array_join / explode)"
                )


def compare_to_oracle(spark, sf_dir: str, fn, oracle: str) -> None:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.sql(oracle)
        d_cols = list(res.columns)
        d_rows = [tuple(r) for r in res.fetchall()]
        _assert_driver_canonicalizable(sdf.limit(20).toPandas(), con.sql(oracle).fetchdf())
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = normalize_result(s_cols, s_rows)
    dn = normalize_result(d_cols, d_rows)
    diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not diffs, f"value mismatch ({len(diffs)} rows), first: {diffs[0]}"
