"""Daily roll-up operators (SURVEY.md §2.4 A1, §3.1 stage 3).

The reference consolidates 30-min bars to daily rows per symbol with
order-dependent first/last (`data_apis/my_alpaca.py:272-280`) and computes
premarket aggregates from the 04:00-09:30 bucket
(`my_stock_functions.py:561-576,613-641`). Spark's ``first``/``last`` are
order-nondeterministic, so the engine uses ``min_by``/``max_by`` keyed on
the timestamp (SURVEY §7.5) — partial+final aggregation, one shuffle on
``(key, day)``, no window needed.

At 100 TB: the groupBy shuffles once on (key, day); with input partitioned
by key/date the shuffle is pruned to co-located partitions. No driver
materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def daily_rollup(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Ordered OHLCV-style daily roll-up: open/high/low/close by time order,
    plus count and dollar-volume analogues."""
    return (
        df.groupBy(key, F.date_trunc("day", ts).alias("day"))
        .agg(
            F.min_by(value, ts).alias("open"),
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            F.max_by(value, ts).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value).alias("dollar_vol"),
        )
    )


def premarket_rollup(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    premarket: Column | None = None,
) -> DataFrame:
    """Premarket-bucket aggregates per (key, day): first/last price, volume,
    volume-weighted numerator, event count (reference premarket = 04:00-09:30
    NY; here hour < 9 over the synthetic stream)."""
    if premarket is None:
        premarket = F.hour(ts) < 9
    return (
        df.filter(premarket)
        .groupBy(key, F.date_trunc("day", ts).alias("day"))
        .agg(
            F.min_by(value, ts).alias("pm_open"),
            F.max_by(value, ts).alias("pm_close"),
            F.sum(value).alias("pm_vol"),
            F.sum(F.col(value) * F.col(value)).alias("pm_wvol"),
            F.count(F.lit(1)).alias("pm_n"),
        )
    )


def daily_bars(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Full daily frame: roll-up plus premarket aggregates in ONE pass.

    The premarket bucket is folded into the same groupBy via aggregate
    FILTER clauses instead of a second scan + left join — one shuffle on
    (key, day) total, which matters at 100 TB (the join variant reads the
    fact table twice and shuffles three times). Days with no premarket
    rows keep the left-join null semantics (NULLIF on the count; filtered
    min_by/sum are already null there) that drive the reference's
    gap_pct=0 / HHI-null rules (my_stock_functions.py:243,571-573).
    """
    pm = f"hour({ts}) < 9"
    return df.groupBy(key, F.date_trunc("day", ts).alias("day")).agg(
        F.min_by(value, ts).alias("open"),
        F.max(value).alias("high"),
        F.min(value).alias("low"),
        F.max_by(value, ts).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value).alias("dollar_vol"),
        F.expr(f"min_by({value}, {ts}) FILTER (WHERE {pm})").alias("pm_open"),
        F.expr(f"max_by({value}, {ts}) FILTER (WHERE {pm})").alias("pm_close"),
        F.expr(f"sum({value}) FILTER (WHERE {pm})").alias("pm_vol"),
        F.expr(f"sum({value} * {value}) FILTER (WHERE {pm})").alias("pm_wvol"),
        F.nullif(F.expr(f"count(1) FILTER (WHERE {pm})"), F.lit(0)).alias("pm_n"),
    )


def daily_ohlcv(
    bars: DataFrame,
    key: str = "symbol",
    ts: str = "local_timestamp",
) -> DataFrame:
    """Daily consolidation of real OHLCV bars (my_alpaca.py:267-280): per
    (key, day) open=first open, high=max high, low=min low, close=last
    close (min_by/max_by on the bar timestamp — order-deterministic),
    volume/trade_count summed, stamped with the reference's canonical
    04:00 day timestamp (my_stock_functions.py:44)."""
    day4 = F.date_trunc("day", ts) + F.expr("interval 4 hours")
    return bars.groupBy(key, day4.alias("timestamp")).agg(
        F.min_by("open", ts).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", ts).alias("close"),
        F.sum("volume").alias("volume"),
        F.sum("trade_count").alias("trade_count"),
        F.sum(F.col("volume") * F.col("vwap")).alias("dollar_volume"),
    )
