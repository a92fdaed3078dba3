"""Table readers (SURVEY.md §2.1 scans).

The reference scans CSV-per-symbol files, Iceberg tables, Excel sheets and
HTTP APIs (`data_apis/my_alpaca.py:120-122`, `Procesamiento_fase_1.ipynb`
cell 6, `my_ishares.py:11-19`, `my_eodhd.py:5-18`). Our engine's equivalent
is a schema-aware reader layer over parquet/CSV lakes:

* explicit-schema reads (schema-on-write contract, never inference in prod),
* nanosecond-timestamp repair (test parquet stores TIMESTAMP(NANOS), which
  Spark reads as long under ``legacy.parquet.nanosAsLong``; we restore real
  TimestampType at micros precision so values match any SQL engine),
* column pruning and predicate pushdown come free from Catalyst because we
  return plain DataFrames backed by the parquet scan.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def _nano_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) in ``path``.

    Peeks at the parquet footer driver-side (cheap — metadata only) so the
    reader works for any table without a hand-maintained column registry.
    """
    import pyarrow.dataset as ds
    import pyarrow as pa

    schema = ds.dataset(path, format="parquet").schema
    out = []
    for field in schema:
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
            out.append(field.name)
    return tuple(out)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with proper TimestampType columns.

    Works on ANY SparkSession, not just the engine's own factory: a bare
    session (e.g. the correctness driver's) lacks the legacy-nanos conf and
    would fail the read outright with PARQUET_TYPE_ILLEGAL, and a session
    with a non-UTC timezone would skew every tz-naive timestamp comparison
    (year/hour/date_trunc vs DuckDB). Both confs are runtime-settable, so we
    assert them here — at the read site — rather than trusting the session.

    DOCUMENTED SIDE EFFECT: this mutates the caller's session config
    (UTC timezone + nanosAsLong + inferTimestampNTZ=false) for the rest
    of the session — the
    engine's contract is UTC wall-clock semantics everywhere, and the
    driver's bare session depends on the overwrite. A co-resident
    workload needing a different session timezone must scope its own
    conf around its reads; the engine never restores a previous value.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if _nano_ts_columns(path):
        # Without this a vectorized parquet read of INT64 TIMESTAMP(NANOS)
        # throws; with it the column arrives as a long we repair below.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Oracle comparisons are tz-naive; all timestamp extraction must agree
    # with DuckDB's wall-clock view of the same micros values.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Files written as isAdjustedToUTC=false micros would otherwise infer
    # TIMESTAMP_NTZ, and the repair cast below — while value-identical
    # under the UTC session — blocks parquet filter pushdown on every
    # timestamp predicate and adds a per-row cast. Reading them directly
    # as TimestampType is free and pushdown-friendly.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    for col in _nano_ts_columns(path):
        # nanos -> micros with integer `div` (float division would lose
        # precision on epoch-scale int64); timestamp_micros -> TimestampType.
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    for field in df.schema.fields:
        # Files written as isAdjustedToUTC=false micros arrive as
        # TIMESTAMP_NTZ under Spark's NTZ inference. The engine contract
        # is TimestampType with UTC wall-clock semantics (streaming
        # watermarks and from_utc_timestamp require it); with the session
        # pinned to UTC above, the cast preserves the wall-clock value
        # exactly — same micros DuckDB sees.
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register the testdata tables as temp views for the SQL surface."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_csv_bars(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV scan with explicit schema + timestamp parsing (S4).

    Reference: per-symbol ``pd.read_csv(parse_dates=['timestamp'])``
    (`data_apis/my_alpaca.py:120-122`). At scale this is one distributed
    multi-file scan, not a per-file loop.
    """
    return (
        spark.read.option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .schema(schema)
        .csv(path)
    )
