"""Differential test: every registered query with an oracle must match
DuckDB at sf0.001 (the external driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from equity_volatility_lakehouse_platform_spark.plans import (
    all_oracles,
    all_queries,
    load_all,
)
from tests.oracle_compare import run_compare

load_all()
_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    run_compare(spark, sf_dir, name, _QUERIES[name], _ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
