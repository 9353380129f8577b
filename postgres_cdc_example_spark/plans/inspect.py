"""Plan inspection utilities — the engine's own plan-quality assertions.

Used by tests/test_plans.py and available for ad-hoc tuning sessions:
``explain_str`` captures any explain mode as a string; the predicates below
encode the scale rules this repo holds every operator to (see README
"Designed for 100 TB").
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_exchange(df: DataFrame) -> bool:
    """True when the plan contains any shuffle or broadcast Exchange.
    Bucketed / co-partitioned plans should return False. (ReusedExchange
    markers are stripped first — reuse isn't an extra shuffle.)"""
    return "Exchange" in explain_str(df).replace("ReusedExchange", "")


def uses_python_eval(df: DataFrame) -> bool:
    """True when rows leave the JVM for Python evaluation (the 10-100× slow
    path) — row-at-a-time UDFs, Arrow UDF batches, or pandas map stages."""
    plan = explain_str(df)
    return any(
        marker in plan for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas")
    )


def scan_read_schema(df: DataFrame) -> list[str]:
    """The ReadSchema lines of every file scan — what actually gets read;
    a projection narrower than the table proves column pruning."""
    return [
        line.strip()
        for line in explain_str(df).splitlines()
        if "ReadSchema" in line
    ]


def pushed_filters(df: DataFrame) -> list[str]:
    return [
        line.strip()
        for line in explain_str(df).splitlines()
        if "PushedFilters" in line or "PartitionFilters" in line
    ]
