"""Silver grid-fill (SURVEY.md §3.2, §7.2 step 3 — the semantic heart).

The reference materializes every 30-min slot Mon-Fri 04:00-19:30 in a
driver-side Python double loop, cross-joins it with symbols, clamps to the
per-symbol [min, max] range, left-joins observed bars, then window-fills
(Procesamiento_fase_1.ipynb cells 11-18). Our engine builds the same grid
distributed: per-symbol ``explode(sequence(first_day, last_day))`` x 32
slots — the grid rows are born on executors, pre-partitioned by symbol, so
the subsequent left join co-locates without a driver round-trip.

Fill semantics follow the Spark-notebook convention (SURVEY §7.5 picks it
over the divergent pandas one): close = ffill then bfill for leading
nulls; open/high/low/vwap coalesce to the filled close; volume and
trade_count zero-fill. The grid deliberately ignores DST and holidays
(naive 32 slots per weekday) — that is reference behavior to preserve,
not a bug to fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SLOTS_PER_DAY = 32


def build_grid(bars: DataFrame, key: str = "symbol", ts: str = "local_timestamp") -> DataFrame:
    """Dense 30-min weekday grid per key, clamped to each key's observed
    [min, max] range (fase_1.ipynb cell 11 semantics, no crossJoin)."""
    bounds = bars.groupBy(key).agg(
        F.date_trunc("day", F.min(ts)).alias("_first"),
        F.date_trunc("day", F.max(ts)).alias("_last"),
        F.min(ts).alias("_lo"),
        F.max(ts).alias("_hi"),
    )
    days = bounds.select(
        key,
        "_lo",
        "_hi",
        F.explode(
            F.sequence(F.col("_first"), F.col("_last"), F.expr("interval 1 day"))
        ).alias("_day"),
    ).filter(F.dayofweek("_day").between(2, 6))
    slot_ts = F.col("_day") + F.make_interval(
        hours=F.lit(4) + (F.col("_slot") / 2).cast("int"),
        mins=(F.col("_slot") % 2) * 30,
    )
    return (
        days.select(
            key,
            "_lo",
            "_hi",
            F.explode(F.sequence(F.lit(0), F.lit(SLOTS_PER_DAY - 1))).alias("_slot"),
            F.col("_day"),
        )
        .select(key, "_lo", "_hi", slot_ts.alias(ts))
        .filter(F.col(ts).between(F.col("_lo"), F.col("_hi")))
        .drop("_lo", "_hi")
    )


def grid_fill(
    bars: DataFrame, key: str = "symbol", ts: str = "local_timestamp"
) -> DataFrame:
    """Grid left-join + window fill (fase_1.ipynb cells 14-18):

    * close: forward fill, then backward fill for leading nulls (W1+W2);
    * open/high/low/vwap: coalesce to the filled close;
    * volume/trade_count: zero-fill;
    * ``is_filled`` marks synthesized rows.
    """
    grid = build_grid(bars, key, ts)
    joined = grid.join(bars, [key, ts], "left")
    w = Window.partitionBy(key).orderBy(ts)
    ffill = F.last("close", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bfill = F.first("close", ignorenulls=True).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled_close = F.when(ffill.isNotNull(), ffill).otherwise(bfill)
    out = joined.withColumn("is_filled", F.col("close").isNull()).withColumn(
        "close", filled_close
    )
    for col in ("open", "high", "low", "vwap"):
        out = out.withColumn(col, F.coalesce(F.col(col), F.col("close")))
    for col in ("volume", "trade_count"):
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(0).cast("long")))
    if "timestamp" in out.columns:
        # UTC instant for synthesized rows: naive NY wall clock -> UTC.
        out = out.withColumn(
            "timestamp",
            F.coalesce(
                F.col("timestamp"),
                F.to_utc_timestamp(F.col(ts).cast("timestamp"), "America/New_York"),
            ),
        )
    return out
