"""The Gold feature library (SURVEY.md §2.9) as composable Spark expressions.

Each function takes the daily-bars frame (from ``operators.daily.daily_bars``:
key, day, open/high/low/close, n_events, dollar_vol, pm_*) and appends one
feature column. All features share ONE window spec —
``partitionBy(key).orderBy(day)`` — so stacking any subset costs a single
shuffle+sort (SURVEY §4 physical notes; the reference reuses one spec the
same way in Procesamiento_fase_2.ipynb cell 6).

Reference semantics per feature are cited from
data_apis/my_stock_functions.py; warm-up windows yield NULL exactly where
pandas ``rolling(n)``/``shift`` yield NaN (SURVEY §7.5 NaN placement).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def w_key(key: str = "user_id") -> WindowSpec:
    return Window.partitionBy(key).orderBy("day")


def _guarded(frame: WindowSpec, col: str, n: int, agg) -> Column:
    """Aggregate over a rows frame, NULL until the frame holds exactly n rows
    (pandas rolling warm-up semantics)."""
    return F.when(F.count(col).over(frame) == n, agg(col).over(frame))


def prev_day_return(df: DataFrame, key: str = "user_id") -> DataFrame:
    # my_stock_functions.py:12-48: daily close pct_change().shift(1).
    w = w_key(key)
    pct = F.col("close") / F.nullif(F.lag("close").over(w), F.lit(0.0)) - 1
    return df.withColumn("prev_day_return", F.lag(pct).over(w))


def std_return_last5d(df: DataFrame, key: str = "user_id") -> DataFrame:
    # my_stock_functions.py:50-107: std of the 5 last daily log-return sums;
    # the within-day sum of intraday log-returns telescopes to ln(close/open).
    w = w_key(key)
    # NULLIF(ratio, 0): a zero price makes the ratio 0 — Spark log(0) is
    # NULL already, but DuckDB ln(0) errors, so both sides guard explicitly.
    df = df.withColumn(
        "_dlr",
        F.log(F.nullif(F.col("close") / F.nullif(F.col("open"), F.lit(0.0)), F.lit(0.0))),
    )
    frame = w.rowsBetween(-4, 0)
    out = F.when(F.count("_dlr").over(frame) == 5, F.stddev_samp("_dlr").over(frame))
    return df.withColumn("std_return_last5d", out).drop("_dlr")


def range_rel_last1d(df: DataFrame, key: str = "user_id") -> DataFrame:
    # my_stock_functions.py:109-152: (day_high - day_low)/day_close, shift 1d.
    w = w_key(key)
    rel = (F.col("high") - F.col("low")) / F.nullif(F.col("close"), F.lit(0.0))
    return df.withColumn("range_rel_last1d", F.lag(rel).over(w))


def rvol_20d(df: DataFrame, key: str = "user_id", n: int = 20) -> DataFrame:
    # my_stock_functions.py:154-197: day dollar-vol / n-day rolling mean
    # excluding today (rolling(n).mean().shift(1)).
    frame = w_key(key).rowsBetween(-n, -1)
    base = F.when(F.count("dollar_vol").over(frame) == n, F.avg("dollar_vol").over(frame))
    return df.withColumn("rvol_20d", F.col("dollar_vol") / F.nullif(base, F.lit(0.0)))


def gap_pct(df: DataFrame, key: str = "user_id") -> DataFrame:
    # my_stock_functions.py:199-274: (first premarket open - prev day last
    # close)/prev close; 0 when the day has no premarket rows; NULL on the
    # first day (no prev close).
    w = w_key(key)
    prev_close = F.lag("close").over(w)
    gap = (F.col("pm_open") - prev_close) / F.nullif(prev_close, F.lit(0.0))
    return df.withColumn(
        "gap_pct",
        F.when(prev_close.isNull(), F.lit(None).cast("double")).otherwise(
            F.coalesce(gap, F.lit(0.0))
        ),
    )


def dist_max_20d(df: DataFrame, key: str = "user_id", n: int = 20) -> DataFrame:
    # my_stock_functions.py:276-318: (close[n-1] - max(close over prior n))
    # / max(close over prior n).
    w = w_key(key)
    frame = w.rowsBetween(-n, -1)
    prior_max = F.when(F.count("close").over(frame) == n, F.max("close").over(frame))
    return df.withColumn(
        "dist_max_20d",
        (F.lag("close").over(w) - prior_max) / F.nullif(prior_max, F.lit(0.0)),
    )


def _wick(upper: bool) -> Column:
    rng = F.col("high") - F.col("low")
    wick = (
        F.col("high") - F.greatest("open", "close")
        if upper
        else F.least("open", "close") - F.col("low")
    )
    # np.where(range==0, 0, wick/range) div-by-zero guard
    # (my_stock_functions.py:346-350,396-400).
    return F.when(rng == 0, F.lit(0.0)).otherwise(wick / rng)


def upper_wick_ratio_last1d(df: DataFrame, key: str = "user_id") -> DataFrame:
    # my_stock_functions.py:320-368, at daily-candle grain, shifted 1d.
    return df.withColumn("upper_wick_ratio_last1d", F.lag(_wick(True)).over(w_key(key)))


def lower_wick_ratio_last1d(df: DataFrame, key: str = "user_id") -> DataFrame:
    # my_stock_functions.py:370-418.
    return df.withColumn("lower_wick_ratio_last1d", F.lag(_wick(False)).over(w_key(key)))


def weekday_features(df: DataFrame) -> DataFrame:
    # my_stock_functions.py:420-487: day name + cyclic sin/cos encode of the
    # Monday-based weekday index over a 5-day cycle.
    wd = (F.dayofweek("day") + 5) % 7  # Mon=0 .. Sun=6
    two_pi = 2 * 3.141592653589793
    return (
        df.withColumn("weekday", F.date_format("day", "EEEE"))
        .withColumn("weekday_sin", F.sin(two_pi * wd / 5))
        .withColumn("weekday_cos", F.cos(two_pi * wd / 5))
    )


def hhi_premarket(df: DataFrame) -> DataFrame:
    # my_stock_functions.py:533-583: Herfindahl of premarket volume within
    # the day — sum(v^2)/sum(v)^2 needs only the premarket sums already in
    # the daily frame; NULL when the day has no premarket volume.
    return df.withColumn(
        "hhi_premarket_volume",
        F.col("pm_wvol") / F.nullif(F.col("pm_vol") * F.col("pm_vol"), F.lit(0.0)),
    )


def z_pm(df: DataFrame, key: str = "user_id", n: int = 20) -> DataFrame:
    # my_stock_functions.py:585-651: (premarket return - n-day mean daily
    # return) / n-day std of daily returns.
    w = w_key(key)
    df = df.withColumn("_dr", F.col("close") / F.nullif(F.lag("close").over(w), F.lit(0.0)) - 1)
    frame = w.rowsBetween(-(n - 1), 0)
    mu = F.when(F.count("_dr").over(frame) == n, F.avg("_dr").over(frame))
    sigma = F.when(F.count("_dr").over(frame) == n, F.stddev_samp("_dr").over(frame))
    pm_ret = F.col("pm_close") / F.nullif(F.col("pm_open"), F.lit(0.0)) - 1
    return df.withColumn("z_pm_comp", (pm_ret - mu) / F.nullif(sigma, F.lit(0.0))).drop("_dr")


def pm_rts_hist(df: DataFrame, key: str = "user_id", n: int = 20, eps: float = 0.01) -> DataFrame:
    # my_stock_functions.py:653-714: log((avg_trade_size+eps) /
    # (rolling_median_n(avg_trade_size)+eps)). Exact rolling median via a
    # sorted frame snapshot (Spark median() rejects window frames): with
    # exactly n=20 rows it is the mean of sorted elements 10 and 11.
    df = df.withColumn("_ats", F.col("dollar_vol") / F.col("n_events"))
    frame = w_key(key).rowsBetween(-(n - 1), 0)
    # Materialize the frame snapshot ONCE: referencing the window expr
    # twice (get 9 / get 10) would extract TWO identical collect_list
    # window aggregates (seen as _we17/_we18 in the f20 plan) — the
    # frame is collected and sorted once here, the two gets read refs.
    # sort_array, not array_sort: the lambda comparator is a
    # CodegenFallback that drops the projection out of codegen; order
    # is identical on these NULL-free double arrays (round 14).
    df = df.withColumn(
        "_ats_frame", F.sort_array(F.collect_list("_ats").over(frame))
    ).withColumn("_ats_cnt", F.count("_ats").over(frame))
    med = (F.get("_ats_frame", n // 2 - 1) + F.get("_ats_frame", n // 2)) / 2
    med = F.when(F.col("_ats_cnt") == n, med)
    return df.withColumn(
        "pm_rts_hist", F.log((F.col("_ats") + eps) / (med + eps))
    ).drop("_ats", "_ats_frame", "_ats_cnt")


def pm_vwap_return(df: DataFrame, key: str = "user_id") -> DataFrame:
    # my_stock_functions.py:716-777: premarket VWAP / prev regular close - 1
    # (value doubles as the volume weight in the synthetic stream).
    w = w_key(key)
    vwap_pm = F.col("pm_wvol") / F.nullif(F.col("pm_vol"), F.lit(0.0))
    prev_close = F.lag("close").over(w)
    return df.withColumn("pm_vwap_return", vwap_pm / F.nullif(prev_close, F.lit(0.0)) - 1)


def fase2_ratios(df: DataFrame, key: str = "user_id") -> DataFrame:
    # Procesamiento_fase_2.ipynb cells 4-5: percent-change ratio features and
    # the lag-1 open/prev-close gap, all off one window spec.
    w = w_key(key)
    prev_close = F.lag("close").over(w)
    return (
        df.withColumn(
            "pct_change_low_high",
            (F.col("high") - F.col("low")) / F.nullif(F.col("low"), F.lit(0.0)) * 100,
        )
        .withColumn(
            "pct_change_open_close",
            (F.col("close") - F.col("open")) / F.nullif(F.col("open"), F.lit(0.0)) * 100,
        )
        .withColumn(
            "pct_gap_open_prev_close",
            (F.col("open") - prev_close) / F.nullif(prev_close, F.lit(0.0)) * 100,
        )
    )


def lookback_ladder(df: DataFrame, key: str = "user_id", lags=(1, 7, 14)) -> DataFrame:
    # Procesamiento_fase_2.ipynb cell 6: pct_change_{k} ladder; row-count
    # lags on the daily grid (SURVEY §7.5 lag-by-rows semantics).
    w = w_key(key)
    for k in lags:
        df = df.withColumn(
            f"pct_change_{k}d",
            F.col("close") / F.nullif(F.lag("close", k).over(w), F.lit(0.0)) - 1,
        )
    return df


def true_range(df: DataFrame, key: str = "user_id") -> DataFrame:
    # alpa.py:42-46: tr = max(high, prev_close) - min(low, prev_close);
    # rel_tr = tr / close. prev_close backfilled with same-day low/high
    # bounds on the first row (bfill-across-columns in the reference).
    w = w_key(key)
    prev_close = F.coalesce(F.lag("close").over(w), F.col("open"))
    tr = F.greatest("high", prev_close) - F.least("low", prev_close)
    return df.withColumn("tr", tr).withColumn(
        "rel_tr", tr / F.nullif(F.col("close"), F.lit(0.0))
    )


def market_path_label(df: DataFrame, threshold: float = 0.06) -> DataFrame:
    # SURVEY §7.5 external-label note: market_absolute_path is consumed but
    # never computed in the reference (my_model.py:50). Our definition:
    # intraday absolute path |close/open - 1|; flag at the reference's 0.06.
    path = F.abs(F.col("close") / F.nullif(F.col("open"), F.lit(0.0)) - 1)
    return df.withColumn("market_absolute_path", path).withColumn(
        "market_path_flag", (path >= threshold).cast("int")
    )


def gold_matrix(df: DataFrame, key: str = "user_id") -> DataFrame:
    """The full feature matrix, fused: two projection layers instead of a
    per-feature chain, so Catalyst groups the window expressions by frame
    (~5 Window passes instead of one per feature). Layer 1 materializes
    the shared derived series (prev_close, daily return, log-return,
    premarket return, avg trade size); layer 2 computes every feature over
    four frames of ONE window spec. Values are identical to chaining the
    individual feature functions — same expressions, same order.
    """
    w = w_key(key)
    df = df.select(
        "*",
        F.lag("close").over(w).alias("prev_close"),
        (F.col("close") / F.nullif(F.lag("close").over(w), F.lit(0.0)) - 1).alias("_dr"),
        F.log(
            F.nullif(F.col("close") / F.nullif(F.col("open"), F.lit(0.0)), F.lit(0.0))
        ).alias("_dlr"),
        (F.col("pm_close") / F.nullif(F.col("pm_open"), F.lit(0.0)) - 1).alias("_pm_ret"),
        (F.col("dollar_vol") / F.col("n_events")).alias("_ats"),
    )
    w5 = w.rowsBetween(-4, 0)
    wz = w.rowsBetween(-19, 0)
    wx = w.rowsBetween(-20, -1)
    pc = F.col("prev_close")
    rvol_base = F.when(F.count("dollar_vol").over(wx) == 20, F.avg("dollar_vol").over(wx))
    prior_max = F.when(F.count("close").over(wx) == 20, F.max("close").over(wx))
    mu = F.when(F.count("_dr").over(wz) == 20, F.avg("_dr").over(wz))
    sigma = F.when(F.count("_dr").over(wz) == 20, F.stddev_samp("_dr").over(wz))
    # The rolling-median frame is materialized ONCE as a named column
    # (round-14 optimization): referencing the sorted-frame expression
    # twice inline planned TWO identical collect_list window aggregates
    # (_we17/_we18 in the executed f20 plan) and sorted each per row.
    # sort_array replaces the array_sort lambda comparator — identical
    # order on these NULL-free double arrays (collect_list never emits
    # NULLs, and _ats is never NaN: dollar_vol/n_events with count>=1)
    # — because the lambda is a CodegenFallback that silently dropped
    # the ENTIRE 25-feature assembly projection out of
    # WholeStageCodegen.
    df = df.withColumn(
        "_ats_sorted", F.sort_array(F.collect_list("_ats").over(wz))
    )
    med = F.when(
        F.count("_ats").over(wz) == 20,
        (F.get("_ats_sorted", 9) + F.get("_ats_sorted", 10)) / 2,
    )
    wd = (F.dayofweek("day") + 5) % 7
    two_pi = 2 * 3.141592653589793
    pc_bf = F.coalesce(pc, F.col("open"))
    tr = F.greatest("high", pc_bf) - F.least("low", pc_bf)
    path = F.abs(F.col("close") / F.nullif(F.col("open"), F.lit(0.0)) - 1)
    return df.select(
        key,
        "day",
        F.lag("_dr").over(w).alias("prev_day_return"),
        F.when(F.count("_dlr").over(w5) == 5, F.stddev_samp("_dlr").over(w5)).alias(
            "std_return_last5d"
        ),
        F.lag((F.col("high") - F.col("low")) / F.nullif(F.col("close"), F.lit(0.0)))
        .over(w)
        .alias("range_rel_last1d"),
        (F.col("dollar_vol") / F.nullif(rvol_base, F.lit(0.0))).alias("rvol_20d"),
        F.when(pc.isNull(), F.lit(None).cast("double"))
        .otherwise(F.coalesce((F.col("pm_open") - pc) / F.nullif(pc, F.lit(0.0)), F.lit(0.0)))
        .alias("gap_pct"),
        ((pc - prior_max) / F.nullif(prior_max, F.lit(0.0))).alias("dist_max_20d"),
        F.lag(_wick(True)).over(w).alias("upper_wick_ratio_last1d"),
        F.lag(_wick(False)).over(w).alias("lower_wick_ratio_last1d"),
        F.date_format("day", "EEEE").alias("weekday"),
        F.sin(two_pi * wd / 5).alias("weekday_sin"),
        F.cos(two_pi * wd / 5).alias("weekday_cos"),
        (F.col("pm_wvol") / F.nullif(F.col("pm_vol") * F.col("pm_vol"), F.lit(0.0))).alias(
            "hhi_premarket_volume"
        ),
        ((F.col("_pm_ret") - mu) / F.nullif(sigma, F.lit(0.0))).alias("z_pm_comp"),
        F.log((F.col("_ats") + 0.01) / (med + 0.01)).alias("pm_rts_hist"),
        (
            (F.col("pm_wvol") / F.nullif(F.col("pm_vol"), F.lit(0.0)))
            / F.nullif(pc, F.lit(0.0))
            - 1
        ).alias("pm_vwap_return"),
        ((F.col("high") - F.col("low")) / F.nullif(F.col("low"), F.lit(0.0)) * 100).alias(
            "pct_change_low_high"
        ),
        ((F.col("close") - F.col("open")) / F.nullif(F.col("open"), F.lit(0.0)) * 100).alias(
            "pct_change_open_close"
        ),
        ((F.col("open") - pc) / F.nullif(pc, F.lit(0.0)) * 100).alias(
            "pct_gap_open_prev_close"
        ),
        F.col("_dr").alias("pct_change_1d"),
        (F.col("close") / F.nullif(F.lag("close", 7).over(w), F.lit(0.0)) - 1).alias(
            "pct_change_7d"
        ),
        (F.col("close") / F.nullif(F.lag("close", 14).over(w), F.lit(0.0)) - 1).alias(
            "pct_change_14d"
        ),
        tr.alias("tr"),
        (tr / F.nullif(F.col("close"), F.lit(0.0))).alias("rel_tr"),
        path.alias("market_absolute_path"),
        (path >= 0.06).cast("int").alias("market_path_flag"),
    )


def gold_matrix_guarded(
    df: DataFrame,
    key: str = "user_id",
    max_key_rows: int | None = None,
    mode: str = "warn",
) -> DataFrame:
    """Deploy wrapper for :func:`gold_matrix` with the one-giant-key
    guard WIRED IN (operators.skew_guard): one cheap probe pass before
    the windowed assembly, warning (or raising, ``mode='error'``) when
    a single key would serialize the window sort into one task. The
    matrix itself is unchanged — gold features mix bounded and
    UNBOUNDED frames (cumulative paths), so the bounded-slice
    mitigation does not apply; the guard makes the hazard loud and
    names the fixes (pre-aggregate to a coarser grain, or split the
    key upstream) instead of letting the stage degrade silently."""
    from equity_volatility_lakehouse_platform_spark.operators.skew_guard import (
        DEFAULT_MAX_KEY_ROWS,
        assert_no_giant_key,
    )

    assert_no_giant_key(
        df,
        key,
        max_key_rows=DEFAULT_MAX_KEY_ROWS if max_key_rows is None else max_key_rows,
        mode=mode,
    )
    return gold_matrix(df, key)
