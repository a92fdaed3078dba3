"""Registry mapping query names -> (Spark builder, DuckDB oracle SQL).

Contract (driver): builders take ``(spark, sf_dir)`` and return a
DataFrame; oracle SQL runs on DuckDB views named after the testdata
tables. Column names must match exactly (the comparator sorts columns
by name and hashes values), so every computed column is aliased
identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` => rows-only check
    (genuinely non-SQL-expressible: stateful streaming, EWM, UDF stubs)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def set_oracle(name: str, oracle: str) -> None:
    """Attach/replace the oracle for an already-registered query — for
    oracles assembled from other modules' CTE fragments at import time
    (e.g. ml07 reuses dedup's signature SQL)."""
    if name not in _QUERIES:
        raise KeyError(f"unknown query: {name}")
    _ORACLES[name] = oracle


def all_queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)
