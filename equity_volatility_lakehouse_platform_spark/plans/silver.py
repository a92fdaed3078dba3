"""Silver grid-fill query over the events stream (SURVEY.md §3.2 traced
end-to-end on driver testdata): dense per-key hourly grid -> left join ->
forward fill — the distributed replacement for the reference's driver-loop
grid + crossJoin (Procesamiento_fase_1.ipynb cells 11-18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.operators.calendar_ops import (
    US_HOLIDAYS_2024,
)
from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table
from equity_volatility_lakehouse_platform_spark.functions.rounding import r6

# g02's oracle NOT IN list is generated from the SAME pinned holiday
# source the Spark plan anti-joins against, so the two sides stay
# equivalent for ANY event span (previously only the two January dates
# were listed, silently assuming spans end before Presidents Day).
_HOLIDAYS_SQL = ", ".join(f"DATE '{d}'" for d in US_HOLIDAYS_2024)


@register(
    "g01_grid_fill_hourly",
    oracle="""
    WITH hourly AS (
      SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             arg_max(value, ts) AS close, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS TIMESTAMP) AS h
      FROM bounds
    ), joined AS (
      SELECT g.user_id, g.h, o.close, COALESCE(o.n, 0) AS n_events,
             o.close IS NULL AS is_filled
      FROM grid g LEFT JOIN hourly o ON g.user_id = o.user_id AND g.h = o.h
    )
    SELECT user_id, h, n_events, is_filled,
           (ROUND(last_value(close IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) + 0.0)
             AS close_ffill
    FROM joined
    """,
)
def g01_grid_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gap-fill by explode: every observed hour emits itself plus the empty
    # slots up to (excluding) the NEXT observed hour (lead), carrying its
    # own close — the forward fill falls out of the generation, so there is
    # no dense-grid build, no grid<->observed join, and no fill window.
    # Two shuffles total (hourly agg, lead window); grid rows are generated
    # on executors, never the driver — the distributed replacement for the
    # reference's driver-loop grid + crossJoin (fase_1 cells 11-18).
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h")).agg(
        F.max_by("value", "ts").alias("close"), F.count(F.lit(1)).alias("n")
    # Round at the HOURLY grain: identical output (the forward fill
    # carries the rounded value unchanged), but the r6 expression lives
    # in the aggregate stage instead of the sequence/explode stage —
    # whose generated method is near the 8 KB JIT limit already
    # (SCALE.md round-5 addendum 2); ~2x on the explode stage at sf0.1.
    ).select("user_id", "h", r6("close").alias("close"), "n")
    w = Window.partitionBy("user_id").orderBy("h")
    slots = hourly.withColumn("next_h", F.lead("h").over(w)).select(
        "user_id",
        "h",
        "close",
        "n",
        F.explode(
            F.sequence(
                "h",
                F.coalesce(
                    F.col("next_h") - F.expr("interval 1 hour"), F.col("h")
                ),
                F.expr("interval 1 hour"),
            )
        ).alias("slot"),
    )
    return slots.select(
        "user_id",
        F.col("slot").alias("h"),
        F.when(F.col("slot") == F.col("h"), F.col("n")).otherwise(F.lit(0)).alias("n_events"),
        (F.col("slot") != F.col("h")).alias("is_filled"),
        F.col("close").alias("close_ffill"),
    )


@register(
    "g02_trading_day_grid",
    # Business-calendar grid fill: each user's daily closes are aligned
    # to the TRADING-day grid (weekdays minus the pinned US holidays —
    # the S14 calendar source) spanning that user's own history, with
    # gaps forward-filled and flagged. The oracle's holiday list is
    # string-formatted from US_HOLIDAYS_2024 itself (see _HOLIDAYS_SQL).
    oracle=f"""
    WITH bars AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             arg_max(value, ts) AS close
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM bars GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    ), tdays AS (
      SELECT user_id, day FROM grid
      WHERE isodow(day) <= 5
        AND day NOT IN ({_HOLIDAYS_SQL})
    ), j AS (
      SELECT t.user_id, t.day, b.close
      FROM tdays t LEFT JOIN bars b USING (user_id, day)
    )
    SELECT user_id, CAST(day AS TIMESTAMP) AS day,
           (ROUND(last_value(close IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) + 0.0)
             AS close_ffill,
           CAST(close IS NULL AS BOOLEAN) AS is_synthetic
    FROM j
    """,
)
def g02_trading_day_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The grid generates on EXECUTORS from one row per user (explode of
    # a per-user date sequence — never a driver loop, never a dense
    # cross join); the holiday dimension broadcasts into a left-anti
    # join (operators/calendar_ops). Grid and bars then join
    # co-partitioned on (user_id, day) and one window pass forward-fills
    # — at 100 TB the grid is |users| x |days|, dwarfed by the tick
    # table it summarizes.
    from equity_volatility_lakehouse_platform_spark.operators.calendar_ops import (
        holidays_df,
    )

    ev = load_table(spark, sf_dir, "events")
    bars = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.max_by("value", "ts").alias("close"))
    span = bars.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day"),
    ).filter(F.dayofweek("day").between(2, 6))
    hol = holidays_df(spark)
    tdays = grid.join(
        F.broadcast(hol), grid["day"] == hol["holiday"], "left_anti"
    )
    j = tdays.join(bars, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.col("day").cast("timestamp").alias("day"),
        r6(F.last("close", ignorenulls=True).over(w)).alias("close_ffill"),
        F.col("close").isNull().alias("is_synthetic"),
    )
