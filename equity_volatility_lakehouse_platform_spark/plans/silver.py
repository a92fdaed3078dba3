"""Silver grid-fill query over the events stream (SURVEY.md §3.2 traced
end-to-end on driver testdata): dense per-key hourly grid -> left join ->
forward fill — the distributed replacement for the reference's driver-loop
grid + crossJoin (Procesamiento_fase_1.ipynb cells 11-18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table
from equity_volatility_lakehouse_platform_spark.functions.rounding import r6


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
