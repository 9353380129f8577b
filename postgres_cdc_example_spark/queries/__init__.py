"""Named query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 (and every extension op) is
registered here as a named query: a ``(spark, sf_dir) -> DataFrame`` callable
plus, where SQL-expressible, an equivalent ANSI-SQL oracle string that DuckDB
runs on the same parquet fixtures.  ``__spark_entry__`` re-exports these.

Column names are aliased identically on both sides — the driver's comparison
sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import all query modules (each registers itself on import)."""
    global _LOADED
    if _LOADED:
        return
    from postgres_cdc_example_spark.queries import (  # noqa: F401
        analytics,
        cdc,
        extensions,
        llmdata,
        parity,
        relational,
        tpch,
        tpch_full,
        windows,
    )

    _LOADED = True
