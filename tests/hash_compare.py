"""Streaming hash-digest comparator for large-result oracle checks.

``tests.oracle_compare.run_compare`` materializes BOTH result sets on the
driver — fine at sf0.01 (the external driver's gate), but a 6M-row result
at the 10x scale sanity OOMs the comparator itself (SCALE.md, sc03).

This module compares digests instead: each side reduces its result to

    (row_count, sum(int(md5(row)[0:15], 16)), sum(int(md5(row)[15:30], 16)))

over a canonical per-row string, so row ORDER never matters (sum is
commutative), duplicates are counted, and memory is O(1):

* Spark computes the digest executor-side (md5/conv/sum built-ins); the
  driver receives three numbers.
* DuckDB streams its result in record batches; each batch is
  canonicalized in vectorized numpy/hashlib with EXACTLY the same rules.

Canonical forms (must stay in lockstep between ``_spark_canon`` and
``_pandas_canon``):

* float64  -> microunits: round(x * 1e6) half-away-from-zero via the
  exact fmod formula (functions/rounding.py rationale), rendered as an
  int64 string; ``nan`` / ``inf`` / ``-inf`` literals; ``-0`` keeps its
  sign flag (bit-level parity with the exact comparator). |x| is
  asserted < 9e12 so the int64 microunits cannot overflow.
* int/long -> decimal string; bool -> '1'/'0'.
* timestamp -> epoch-micros string (UTC session on the Spark side,
  naive micros on the DuckDB side — identical values by the engine's
  read contract); date -> epoch-days string.
* string   -> raw utf-8; binary -> lowercase hex.
* NULL     -> '\\x01' sentinel (after canonicalization).
* Row      -> columns sorted by name, joined with '\\x1f'.

Arrays/structs are NOT supported — queries returning them have small
results and use the exact comparator.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from tests.oracle_compare import duck_connection

SEP = "\x1f"
# NOT "\x00": numpy fixed-width unicode treats NUL as padding and strips
# it inside pandas where/astype, silently emptying the sentinel.
NULL = "\x01"
_MICRO_LIMIT = 9e12  # |x|*1e6 must stay far inside int64


# ---------------------------------------------------------------------------
# Spark side: canonical string per column, digest via md5/conv/sum.
# ---------------------------------------------------------------------------

def _spark_canon(field):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    c = F.col(field.name)
    t = field.dataType
    # DECIMAL canonicalizes as double microunits on BOTH sides: one
    # engine frequently types a computed column DECIMAL where the other
    # has DOUBLE (e.g. DuckDB CASE over decimal literals), and the
    # exact comparator coerces the same way.
    if isinstance(t, (T.DoubleType, T.FloatType, T.DecimalType)):
        x = c.cast("double")
        y = x * F.lit(1e6)
        frac = y % F.lit(1.0)
        tr = y - frac
        adj = (
            F.when(frac >= 0.5, F.lit(1.0))
            .when(frac <= -0.5, F.lit(-1.0))
            .otherwise(F.lit(0.0))
        )
        micro = (tr + adj).cast("long").cast("string")
        inf = F.lit(float("inf"))
        canon = (
            F.when(F.isnan(x), F.lit("nan"))
            .when(x == inf, F.lit("inf"))
            .when(x == -inf, F.lit("-inf"))
            # signed zero via the string cast ('-0.0' keeps its sign;
            # 1/x raises under ANSI and Spark's atan2 normalizes -0.0)
            .when(
                (x == 0.0) & F.startswith(x.cast("string"), F.lit("-")),
                F.lit("-0"),
            )
            # out-of-range FINITE magnitudes must fail loudly, not hash
            # as a lossy value (the branch above already consumed
            # nan/inf, so this only sees finite x).
            .when(
                F.abs(x) > _MICRO_LIMIT,
                F.assert_true(
                    F.lit(False), F.lit("hash_compare: |x| > 9e12")
                ).cast("string"),
            )
            .otherwise(micro)
        )
        return canon
    if isinstance(t, T.BooleanType):
        # cast chain propagates NULL (a when/otherwise would swallow it)
        return c.cast("int").cast("string")
    if isinstance(t, T.TimestampType) or isinstance(t, T.TimestampNTZType):
        return F.unix_micros(c.cast("timestamp")).cast("string")
    if isinstance(t, T.DateType):
        return F.datediff(c, F.lit("1970-01-01").cast("date")).cast("string")
    if isinstance(t, T.BinaryType):
        return F.lower(F.hex(c))
    if isinstance(t, (T.StringType, T.IntegerType, T.LongType, T.ShortType,
                      T.ByteType)):
        return c.cast("string")
    raise NotImplementedError(
        f"hash_compare: unsupported Spark type {t} for column {field.name}"
    )


def spark_digest(df) -> tuple[int, int, int]:
    from pyspark.sql import functions as F

    fields = sorted(df.schema.fields, key=lambda f: f.name)
    row = F.concat_ws(
        SEP, *[F.coalesce(_spark_canon(f), F.lit(NULL)) for f in fields]
    )
    hc = F.col("h")
    s1 = F.sum(F.conv(F.substring(hc, 1, 15), 16, 10).cast("decimal(38,0)"))
    s2 = F.sum(F.conv(F.substring(hc, 16, 15), 16, 10).cast("decimal(38,0)"))
    out = df.select(F.md5(row).alias("h")).agg(
        F.count(F.lit(1)).alias("n"), s1.alias("s1"), s2.alias("s2")
    ).collect()[0]
    return int(out["n"]), int(out["s1"] or 0), int(out["s2"] or 0)


# ---------------------------------------------------------------------------
# DuckDB side: stream record batches, canonicalize in numpy, hash in Python.
# ---------------------------------------------------------------------------

def _pandas_canon(s: pd.Series) -> pd.Series:
    kind = s.dtype.kind
    if kind == "f":
        x = s.to_numpy(dtype="float64")
        out = np.empty(len(x), dtype=object)
        nan = np.isnan(x)
        posinf = np.isposinf(x)
        neginf = np.isneginf(x)
        negzero = (x == 0.0) & np.signbit(x)
        finite = ~(nan | posinf | neginf)
        if (np.abs(x[finite]) > _MICRO_LIMIT).any():
            raise AssertionError("hash_compare: |x| > 9e12")
        y = x * 1e6
        with np.errstate(invalid="ignore"):
            frac = np.fmod(y, 1.0)
        t = y - frac
        adj = np.where(frac >= 0.5, 1.0, np.where(frac <= -0.5, -1.0, 0.0))
        micro = np.where(finite, t + adj, 0.0).astype(np.int64)
        out[:] = micro.astype(str)
        out[negzero] = "-0"
        out[nan] = "nan"
        out[posinf] = "inf"
        out[neginf] = "-inf"
        # pandas float NaN is also SQL NULL in fetched frames; DuckDB
        # fetch uses NaN for both — mirror the Spark side, where true
        # NULLs arrive as None and NaN as NaN. DuckDB's arrow fetch
        # keeps them distinct via the validity mask (handled below).
        return pd.Series(out, index=s.index)
    if kind == "b":
        return pd.Series(np.where(s.to_numpy(), "1", "0"), index=s.index)
    if kind == "M":
        v = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
        return pd.Series(
            v.to_numpy(dtype="datetime64[us]").view("int64").astype(str),
            index=s.index,
        )
    if kind in "iu":
        return s.astype("int64").astype(str)
    if kind == "O":
        import datetime as _dt

        _EPOCH = _dt.date(1970, 1, 1)

        def conv(v):
            if isinstance(v, bytes):
                return v.hex()
            if isinstance(v, bool):
                return "1" if v else "0"
            if isinstance(v, int):
                return str(v)
            if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                return str((v - _EPOCH).days)
            return v
        return s.map(conv)
    raise NotImplementedError(f"hash_compare: unsupported pandas dtype {s.dtype}")


def _digest_batch(pdf: pd.DataFrame, mask_null: pd.DataFrame) -> tuple[int, int, int]:
    cols = sorted(pdf.columns)
    canon = {}
    for c in cols:
        v = _pandas_canon(pdf[c])
        v = v.where(~mask_null[c], NULL)
        canon[c] = v.astype(str)
    joined = canon[cols[0]].str.cat([canon[c] for c in cols[1:]], sep=SEP)
    s1 = s2 = 0
    for r in joined:
        h = hashlib.md5(r.encode("utf-8")).hexdigest()
        s1 += int(h[0:15], 16)
        s2 += int(h[15:30], 16)
    return len(pdf), s1, s2


def duck_digest(con, sql: str) -> tuple[int, int, int]:
    cur = con.execute(sql)
    n = s1 = s2 = 0
    reader = cur.fetch_record_batch(100_000)
    import pyarrow as pa

    for batch in reader:
        tbl = pa.Table.from_batches([batch])
        # DECIMAL -> float64 (see _spark_canon: decimals canonicalize as
        # double microunits on both sides)
        for i, f in enumerate(tbl.schema):
            if pa.types.is_decimal(f.type):
                tbl = tbl.set_column(
                    i, f.name, tbl.column(i).cast(pa.float64())
                )
        # validity mask BEFORE pandas conversion (NaN vs NULL distinction)
        mask_null = pd.DataFrame(
            {name: pd.Series(tbl.column(name).is_null().to_pandas())
             for name in tbl.column_names}
        )
        # integer_object_nulls: nullable int columns must NOT decay to
        # float64 (their canonical form is the plain decimal string).
        pdf = tbl.to_pandas(integer_object_nulls=True, date_as_object=True)
        bn, b1, b2 = _digest_batch(pdf, mask_null)
        n += bn; s1 += b1; s2 += b2
    return n, s1, s2


def run_hash_compare(spark, sf_dir: str, name: str, query_fn, oracle: str) -> None:
    """Digest-compare a query against its oracle; raises on mismatch."""
    sdf = query_fn(spark, sf_dir)
    sn, ss1, ss2 = spark_digest(sdf)
    con = duck_connection(sf_dir)
    try:
        dn, ds1, ds2 = duck_digest(con, oracle)
    finally:
        con.close()
    assert sn == dn, f"{name}: row count {sn} (spark) != {dn} (duckdb)"
    assert (ss1, ss2) == (ds1, ds2), (
        f"{name}: digest mismatch over {sn} rows "
        f"(spark {ss1}/{ss2} vs duckdb {ds1}/{ds2})"
    )
