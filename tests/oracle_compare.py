"""Mini correctness driver: run a registered query on Spark AND its DuckDB
oracle over the same parquet tables, compare row-count, column names and
values — emulating the external driver's gate so regressions surface in
pytest before a round ends.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # bytes / arrays -> canonical text
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        if str(df[c].dtype).startswith("float32"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    # Sort on BIT-canonical keys: float columns sort by their uint64 view
    # (after NaN canonicalization), not their numeric value. A numeric
    # sort treats -0.0 == +0.0, so rows tying on every key but differing
    # in sign bits would align arbitrarily (order-dependent pass/fail
    # under the bit-exact compare below); the bit key gives both engines
    # the identical total order. Any deterministic order works — the key
    # need not be numerically meaningful.
    keys = {}
    for c in df.columns:
        if df[c].dtype.kind == "f":
            v = df[c].to_numpy(dtype="float64").copy()
            v[np.isnan(v)] = np.nan  # canonical NaN payload
            keys[c] = pd.Series(v.view(np.uint64), index=df.index)
        else:
            keys[c] = df[c]
    kdf = pd.DataFrame(keys, index=df.index)
    sort_cols = list(kdf.columns)
    try:
        order = kdf.sort_values(sort_cols, kind="mergesort", na_position="last").index
    except TypeError:
        order = kdf.sort_values(
            sort_cols, kind="mergesort", na_position="last", key=lambda s: s.map(str)
        ).index
    return df.loc[order].reset_index(drop=True)


def compare_frames(spark_df: pd.DataFrame, duck_df: pd.DataFrame, name: str, rtol=0.0):
    """Compare Spark vs DuckDB results.

    Default is EXACT bit-level float comparison — the external driver hashes
    canonicalized bytes, so ``-0.0 != +0.0`` and a 1-ulp drift is a FAIL
    there; a looser local gate let exactly such a bug (sc03 signed zero)
    survive a full round. Pass ``rtol`` explicitly only for queries whose
    oracle is documented as approximate.
    """
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} (spark) != {len(duck_df)} (duckdb)"
    )
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"
    )
    a, b = _normalize(spark_df), _normalize(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype("float64").to_numpy().copy()
            bv = bv.astype("float64").to_numpy().copy()
            if rtol:
                both_nan = np.isnan(av) & np.isnan(bv)
                close = np.isclose(av, bv, rtol=rtol, atol=1e-12, equal_nan=True)
                ok = both_nan | close
            else:
                # Canonicalize NaN payloads, then compare raw IEEE-754 bits:
                # distinguishes -0.0 from +0.0 and any 1-ulp difference.
                av[np.isnan(av)] = np.nan
                bv[np.isnan(bv)] = np.nan
                ok = av.view(np.uint64) == bv.view(np.uint64)
            assert ok.all(), (
                f"{name}.{c}: {int((~ok).sum())} value mismatches, e.g. "
                f"{list(zip(av[~ok][:3], bv[~ok][:3]))}"
            )
        else:
            mism = ~(av.eq(bv) | (av.isna() & bv.isna()))
            assert not mism.any(), (
                f"{name}.{c}: {int(mism.sum())} mismatches, e.g. "
                f"{list(zip(av[mism][:3], bv[mism][:3]))}"
            )


def run_compare(spark, sf_dir: str, name: str, query_fn, oracle: str) -> None:
    sdf = query_fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    ddf = con.execute(oracle).fetchdf()
    con.close()
    compare_frames(sdf, ddf, name)
