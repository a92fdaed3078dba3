"""Explicit StructType contracts per layer (SURVEY.md §1.3-1.4).

The reference infers schemas everywhere (pandas read_csv, Iceberg catalog);
our engine is schema-on-write: bronze is string-typed where the feed is
stringly (the Athena raw table held timestamps as strings — docx CTAS
`from_iso8601_timestamp(regexp_replace(timestamp,' ','T'))`), silver/gold
are strongly typed.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# Bronze: as-landed 30-min bars, timestamp still a string (docx raw table).
BARS_BRONZE = _struct(
    ("symbol", T.StringType()),
    ("timestamp", T.StringType()),
    ("open", T.DoubleType()),
    ("high", T.DoubleType()),
    ("low", T.DoubleType()),
    ("close", T.DoubleType()),
    ("volume", T.LongType()),
    ("trade_count", T.LongType()),
    ("vwap", T.DoubleType()),
)

# Silver: typed bars (UTC instant + naive NY wall-clock like the reference,
# my_alpaca.py:127-128 / docx local_timestamp UPDATE).
BARS_30M = _struct(
    ("symbol", T.StringType()),
    ("timestamp", T.TimestampType()),
    ("local_timestamp", T.TimestampNTZType()),
    ("open", T.DoubleType()),
    ("high", T.DoubleType()),
    ("low", T.DoubleType()),
    ("close", T.DoubleType()),
    ("volume", T.LongType()),
    ("trade_count", T.LongType()),
    ("vwap", T.DoubleType()),
)

BARS_DAILY = _struct(
    ("symbol", T.StringType()),
    ("date", T.DateType()),
    ("open", T.DoubleType()),
    ("high", T.DoubleType()),
    ("low", T.DoubleType()),
    ("close", T.DoubleType()),
    ("close_adj", T.DoubleType()),
    ("volume", T.LongType()),
    ("trade_count", T.LongType()),
    ("size_index", T.StringType()),
    ("sector_index", T.StringType()),
)

# SCD-2 membership dimension (my_eodhd.py:124-137; sentinel open intervals
# 1950-01-01 / 2199-12-31 per my_eodhd.py:107-110).
CONSTITUENTS = _struct(
    ("symbol", T.StringType()),
    ("name", T.StringType()),
    ("start_date", T.DateType()),
    ("end_date", T.DateType()),
    ("weight", T.DoubleType()),
    ("exchange", T.StringType()),
    ("industry", T.StringType()),
    ("sector", T.StringType()),
    ("is_active_in_index", T.BooleanType()),
    ("is_delisted", T.BooleanType()),
    ("index_symbol", T.StringType()),
)

INDEX_LIST = _struct(
    ("full_symbol", T.StringType()),
    ("symbol", T.StringType()),
    ("name", T.StringType()),
    ("constituents_count", T.LongType()),
    ("value", T.DoubleType()),
    ("market_cap", T.DoubleType()),
    ("currency_code", T.StringType()),
    ("last_update", T.DateType()),
)

ETF_HOLDINGS = _struct(
    ("ticker", T.StringType()),
    ("name", T.StringType()),
    ("weight", T.DoubleType()),
    ("sector", T.StringType()),
)

SENTINEL_START = "1950-01-01"
SENTINEL_END = "2199-12-31"
