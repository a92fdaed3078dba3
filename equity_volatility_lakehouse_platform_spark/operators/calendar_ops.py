"""Trading-calendar source (SURVEY.md §2.1 S14, §2.8 date/time).

The reference pulls the Alpaca trading calendar and US federal holidays
from client libraries (bars.py:152-153; my_stock_functions.py:509-510).
Our engine derives the calendar distributed (sequence/explode) from a
pinned holiday table — a broadcastable dimension, never driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Pinned US federal holidays (observed), 2024 — extend per deployment year.
US_HOLIDAYS_2024 = [
    "2024-01-01", "2024-01-15", "2024-02-19", "2024-05-27", "2024-06-19",
    "2024-07-04", "2024-09-02", "2024-10-14", "2024-11-11", "2024-11-28",
    "2024-12-25",
]


def holidays_df(spark: SparkSession, dates: list[str] | None = None) -> DataFrame:
    dates = dates or US_HOLIDAYS_2024
    return spark.createDataFrame([(d,) for d in dates], ["d"]).select(
        F.col("d").cast("date").alias("holiday")
    )


def trading_days(
    spark: SparkSession, start: str, end: str, holiday_dates: list[str] | None = None
) -> DataFrame:
    """Open market days: weekdays minus holidays, generated on executors."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("interval 1 day")
            )
        ).alias("day")
    ).filter(F.dayofweek("day").between(2, 6))
    hol = holidays_df(spark, holiday_dates)
    return days.join(F.broadcast(hol), days.day == hol.holiday, "left_anti")


def days_since_holiday(
    df: DataFrame, date_col: str, holidays: DataFrame
) -> DataFrame:
    """As-of backward lookup (my_stock_functions.py:513-521 searchsorted):
    broadcast non-equi join + max + datediff."""
    return (
        df.join(F.broadcast(holidays), holidays.holiday <= F.col(date_col), "left")
        .groupBy(*df.columns)
        .agg(
            F.datediff(F.col(date_col), F.max("holiday")).cast("long").alias(
                "days_since_holiday"
            )
        )
    )
