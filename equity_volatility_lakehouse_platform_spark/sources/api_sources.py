"""Driver-side API sources (SURVEY.md §2.1 S1/S2/S3/S5).

The reference ingests from HTTP JSON APIs (EODHD index list + historical
constituents, my_eodhd.py:5-18,84-122), an SDK (Alpaca bars batched 200
symbols/request, alpa.py:59-115,383-386), and Excel holdings files
(my_ishares.py:11-19). Network and SDK clients don't exist in the engine
— each source takes an injectable ``fetch`` callable (prod: requests /
alpaca SDK; tests: fixture payloads), normalizes driver-side, and lands
in a typed Spark DataFrame immediately.

Scale note: these are *dimension* feeds (10^2-10^4 rows) — driver fetch +
``spark.createDataFrame`` is the right shape; they broadcast into every
downstream join. Fact-scale data never flows through this path.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.schemas import (
    CONSTITUENTS,
    ETF_HOLDINGS,
    INDEX_LIST,
    SENTINEL_END,
    SENTINEL_START,
)

# API PascalCase -> engine snake_case (my_eodhd.py:63-82,124-137).
_INDEX_LIST_RENAMES = {
    "ID": "full_symbol",
    "Code": "symbol",
    "Name": "name",
    "Constituents": "constituents_count",
    "Value": "value",
    "MarketCap": "market_cap",
    "CurrencyCode": "currency_code",
    "LastUpdate": "last_update",
}
_CONSTITUENT_RENAMES = {
    "Code": "symbol",
    "Name": "name",
    "StartDate": "start_date",
    "EndDate": "end_date",
    "Weight": "weight",
    "Exchange": "exchange",
    "Industry": "industry",
    "Sector": "sector",
    "IsActiveNow": "is_active_in_index",
    "IsDelisted": "is_delisted",
}


def _renamed(row: dict, renames: dict[str, str]) -> dict:
    return {renames.get(k, k): v for k, v in row.items()}


def index_list_source(
    spark: SparkSession,
    fetch: Callable[[], list[dict]],
    fallback: Callable[[], list[dict]] | None = None,
) -> DataFrame:
    """S1: index-list JSON -> typed DataFrame, with the reference's
    403-fallback-to-cache behavior (my_eodhd.py:8-18) generalized to a
    ``fallback`` callable."""
    try:
        rows = fetch()
    except Exception:
        if fallback is None:
            raise
        rows = fallback()
    cols = [f.name for f in INDEX_LIST.fields]
    data = [
        tuple(_renamed(r, _INDEX_LIST_RENAMES).get(c) for c in cols) for r in rows
    ]
    return spark.createDataFrame(data, INDEX_LIST)


def historical_constituents_source(
    spark: SparkSession,
    index_codes: Sequence[str],
    fetch: Callable[[str], dict],
) -> DataFrame:
    """S2: per-index historical constituents. The API returns a dict of
    dicts under HistoricalTickerComponents (my_eodhd.py:99-114); open
    validity intervals are closed with the 1950-01-01 / 2199-12-31
    sentinels and tagged with the index symbol (my_eodhd.py:42,107-110).
    One union'd dimension frame out."""
    cols = [f.name for f in CONSTITUENTS.fields]
    data = []
    for code in index_codes:
        payload = fetch(code).get("HistoricalTickerComponents", {})
        for raw in payload.values():
            row = _renamed(raw, _CONSTITUENT_RENAMES)
            row["index_symbol"] = code
            for col, sentinel in (("start_date", SENTINEL_START), ("end_date", SENTINEL_END)):
                if not row.get(col):
                    row[col] = sentinel
            data.append(tuple(row.get(c) for c in cols))
    # Dates arrive as ISO strings; load string-typed, cast to the contract.
    from pyspark.sql import types as T

    load_schema = ", ".join(
        f"{f.name} string" if isinstance(f.dataType, T.DateType)
        else f"{f.name} {f.dataType.simpleString()}"
        for f in CONSTITUENTS.fields
    )
    df = spark.createDataFrame(data, load_schema)
    return df.withColumns(
        {"start_date": F.to_date("start_date"), "end_date": F.to_date("end_date")}
    )


def sdk_bars_source(
    spark: SparkSession,
    symbols: Sequence[str],
    fetch_batch: Callable[[Sequence[str]], Iterable[dict]],
    batch_size: int = 200,
) -> DataFrame:
    """S3: SDK bar fetch, batched ``batch_size`` symbols per request
    (alpa.py:383-386; bars.py:433-436). Each batch lands as rows; the
    union is a single createDataFrame (driver-bounded: this path feeds
    incremental syncs, not backfills)."""
    rows: list[dict] = []
    for i in range(0, len(symbols), batch_size):
        rows.extend(fetch_batch(symbols[i : i + batch_size]))
    return spark.createDataFrame(
        [
            (r["symbol"], r["timestamp"], r["open"], r["high"], r["low"],
             r["close"], int(r.get("volume", 0)), int(r.get("trade_count", 0)),
             r.get("vwap"))
            for r in rows
        ],
        "symbol string, timestamp string, open double, high double, low double, "
        "close double, volume long, trade_count long, vwap double",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))


def excel_holdings_source(
    spark: SparkSession,
    path: str,
    reader: Callable[[str], "object"] | None = None,
) -> DataFrame:
    """S5: iShares holdings workbook -> DataFrame, deduped on Ticker
    (my_ishares.py:11-19). ``reader`` defaults to pandas.read_excel and is
    injectable because the xlsx engine isn't guaranteed in every runtime."""
    if reader is None:
        import pandas as pd

        reader = pd.read_excel  # needs openpyxl at runtime
    pdf = reader(path)
    pdf = pdf.drop_duplicates(subset=["Ticker"])
    data = [
        (str(r["Ticker"]), str(r.get("Name", "")), float(r.get("Weight", 0.0)),
         str(r.get("Sector", "")))
        for _, r in pdf.iterrows()
    ]
    return spark.createDataFrame(data, ETF_HOLDINGS)
