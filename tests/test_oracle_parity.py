"""Every registered query with an oracle must hash-match DuckDB at sf0.001 —
the local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from postgres_cdc_example_spark.queries import REGISTRY, _load_all
from tests.oracle_utils import compare_to_oracle

_load_all()
_WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = REGISTRY[name]
    compare_to_oracle(spark, sf_dir, q.fn, q.oracle)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
