"""ML data-contract layer (SURVEY.md §2.12) — engine-side DataFrame ops.

The reference's model layer (data_apis/my_model.py) is sklearn on the
driver; what belongs to the ENGINE is the data contract: label
construction, one-hot encoding, median imputation, warm-up trim, and the
three split families (temporal holdout, rolling origin, per-year). Model
fitting stays a ``toPandas()`` handoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_market_path(df: DataFrame, threshold: float = 0.06) -> DataFrame:
    """my_model.py:50: market_path_flag = market_absolute_path >= 0.06."""
    return df.withColumn(
        "market_path_flag", (F.col("market_absolute_path") >= threshold).cast("int")
    )


def one_hot(df: DataFrame, col: str, values: list[str]) -> DataFrame:
    """Explicit one-hot columns (my_model.py:53-57 pd.get_dummies). Explicit
    category list keeps the plan single-pass and the schema stable."""
    for v in values:
        safe = v.lower().replace(" ", "_").replace("-", "_")
        df = df.withColumn(f"{col}_{safe}", (F.col(col) == v).cast("int"))
    return df.drop(col)


def impute_median(df: DataFrame, cols: list[str]) -> DataFrame:
    """Median imputation (my_model.py:63-66). Medians computed in one
    aggregate pass, then broadcast into coalesce."""
    meds = df.agg(*[F.median(c).alias(c) for c in cols]).first()
    return df.select(
        *[
            F.coalesce(F.col(c), F.lit(meds[c])).alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )


def trim_warmup(df: DataFrame, key: str, order_col: str, n: int = 20) -> DataFrame:
    """Drop each key's first n rows (my_model.py:59-61 cumcount>=n)."""
    w = Window.partitionBy(key).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") > n).drop("_rn")
    )


def temporal_holdout(
    df: DataFrame, date_col: str, cutoff: str
) -> tuple[DataFrame, DataFrame]:
    """Last-N-months holdout (my_model.py:426-444): train < cutoff <= test."""
    c = F.lit(cutoff).cast(dict(df.dtypes)[date_col])
    return df.filter(F.col(date_col) < c), df.filter(F.col(date_col) >= c)


def rolling_origin_splits(
    df: DataFrame, date_col: str, cutoffs: list[str]
) -> list[tuple[DataFrame, DataFrame]]:
    """Rolling-origin evaluation splits (my_model.py:446-482): one
    (train, test) pair per cutoff, train strictly before."""
    return [temporal_holdout(df, date_col, c) for c in cutoffs]


def year_splits(df: DataFrame, date_col: str) -> DataFrame:
    """Year-tagged frame for per-year evaluation loops (my_model.py:484-513)."""
    return df.withColumn("split_year", F.year(date_col))
