"""Lookback / recursive per-key series functions.

Everything here is the "slow path" the SURVEY allows only when built-ins
can't express the semantics: EWM is recursive (y[i] = a*x[i] + (1-a)*y[i-1])
so it cannot be a Spark window aggregate. We run it as an Arrow-batched
grouped-map (`applyInPandas`): one pandas frame per key, vectorized pandas
``ewm`` inside — the same per-symbol unit of work the reference uses
(data_alpaca/alpa.py:49-57 ``groupby().transform(ewm...)``).

Scale: partitioning is by key, so a 100 TB table with millions of keys
spreads evenly; a single key's history (~100k rows for a decade of 30-min
bars) easily fits one executor task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ewm_mean(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
    alpha: float,
    out: str,
    adjust: bool = False,
) -> DataFrame:
    """Exponentially-weighted mean per key, ordered by ``order`` columns.

    Matches ``pandas.Series.ewm(alpha=alpha, adjust=adjust).mean()``
    (reference: alpa.py:49-57 ``exp_rel_tr_soft/peak`` ATR smoothing).
    """
    schema = T.StructType(
        df.schema.fields + [T.StructField(out, T.DoubleType(), True)]
    )

    def fn(pdf):
        pdf = pdf.sort_values(order)
        pdf[out] = pdf[value].ewm(alpha=alpha, adjust=adjust).mean()
        return pdf

    return df.groupBy(key).applyInPandas(fn, schema=schema)
