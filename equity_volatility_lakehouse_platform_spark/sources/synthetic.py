"""Seeded synthetic 30-min bar generator — fully distributed.

Fixture factory for the equity-domain operators (grid-fill, quality,
daily/feature layers). Everything is built with explode(sequence(...)) +
hash-derived pseudo-randomness: no driver loops, no RNG state — the same
code generates 3 symbols x 10 days in tests or 10k symbols x 20 years on
a cluster (the reference builds its grid with a driver-side double loop,
Procesamiento_fase_1.ipynb:169 cell 11 — the anti-pattern SURVEY §4 tells
us to replace).

Bars satisfy the docx OHLC invariants by construction; ``drop_rate``
knocks out pseudo-random slots to create the gaps grid-fill must repair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NY_TZ = "America/New_York"
SLOTS_PER_DAY = 32  # 04:00-19:30 NY, 30-min (fase_1.ipynb:169)


def synthetic_bars(
    spark: SparkSession,
    symbols: list[str],
    start: str = "2024-03-04",
    end: str = "2024-03-15",
    drop_rate: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic 30-min OHLCV bars for ``symbols`` over weekdays in
    [start, end]. ``drop_rate=k`` drops ~1/k of slots pseudo-randomly."""
    sym = spark.createDataFrame([(s,) for s in symbols], ["symbol"])
    days = sym.select(
        "symbol",
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("interval 1 day")
            )
        ).alias("day"),
    ).filter(F.dayofweek("day").between(2, 6))
    slots = days.select(
        "symbol",
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(SLOTS_PER_DAY - 1))).alias("slot"),
    )
    # Naive NY wall-clock slot (04:00 + 30min*slot), like the reference grid.
    local_ts = F.expr(
        "make_timestamp_ntz(year(day), month(day), day(day), "
        "4 + cast(slot / 2 as int), (slot % 2) * 30, 0)"
    )
    h = F.xxhash64("symbol", "day", "slot", F.lit(seed))
    u = (F.pmod(h, 10000) / 10000.0)  # [0,1) pseudo-uniform
    base = 50.0 + F.pmod(F.xxhash64("symbol", F.lit(seed)), 100)
    drift = F.sin(F.col("slot") / 5.0 + F.pmod(h, 7))
    o = base + 2.0 * drift
    c = base + 2.0 * F.sin(F.col("slot") / 5.0 + 1.0 + F.pmod(h, 7))
    hi = F.greatest(o, c) + u
    lo = F.least(o, c) - (1.0 - u) * 0.5
    bars = slots.select(
        "symbol",
        local_ts.alias("local_timestamp"),
        F.to_utc_timestamp(local_ts.cast("timestamp"), NY_TZ).alias("timestamp"),
        F.round(o, 4).alias("open"),
        F.round(hi, 4).alias("high"),
        F.round(lo, 4).alias("low"),
        F.round(c, 4).alias("close"),
        F.pmod(h, 5000).cast("long").alias("volume"),
        (F.pmod(h, 50) + 1).cast("long").alias("trade_count"),
        F.round((F.greatest(o, c) + F.least(o, c)) / 2, 4).alias("vwap"),
        h.alias("_h"),
    )
    if drop_rate:
        bars = bars.filter(F.pmod(F.col("_h"), drop_rate) != 0)
    return bars.drop("_h")


def corrupt_bars(bars: DataFrame, every: int = 13) -> DataFrame:
    """Inject the defect classes the docx repair/validation queries target:
    vwap outside [low, high] and negative volume on ~1/every rows."""
    h = F.xxhash64("symbol", "local_timestamp")
    bad = F.pmod(h, every) == 0
    return bars.withColumn(
        "vwap", F.when(bad, F.col("high") + 5.0).otherwise(F.col("vwap"))
    ).withColumn("volume", F.when(bad, F.lit(-1)).otherwise(F.col("volume")))
