"""Gold feature-library queries (SURVEY.md §2.9) with DuckDB oracles.

Thin query layer: the actual feature logic lives in
``functions.features`` (Spark expressions over the daily-bars frame built
by ``operators.daily``). Every oracle shares the same daily CTE so the
comparison exercises the full pipeline: events scan -> ordered daily
roll-up -> premarket join -> windowed feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.functions import features as feat
from equity_volatility_lakehouse_platform_spark.operators.daily import daily_bars
from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table
from equity_volatility_lakehouse_platform_spark.functions.rounding import r6, r6s

# Shared SQL mirror of operators.daily.daily_bars (the oracle-side pipeline).
DAILY_CTE = """
WITH daily_base AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
         arg_max(value, ts) AS close,
         CAST(count(*) AS BIGINT) AS n_events, SUM(value) AS dollar_vol
  FROM events GROUP BY 1, 2
), pm AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         arg_min(value, ts) AS pm_open, arg_max(value, ts) AS pm_close,
         SUM(value) AS pm_vol, SUM(value * value) AS pm_wvol,
         CAST(count(*) AS BIGINT) AS pm_n
  FROM events WHERE EXTRACT(hour FROM ts) < 9 GROUP BY 1, 2
), daily AS (
  SELECT b.*, p.pm_open, p.pm_close, p.pm_vol, p.pm_wvol, p.pm_n
  FROM daily_base b LEFT JOIN pm p USING (user_id, day)
)
"""

W = "(PARTITION BY user_id ORDER BY day)"


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_bars(load_table(spark, sf_dir, "events"))


def _out(df: DataFrame, *cols: str) -> DataFrame:
    # Toward-zero 1e-9 nudge before the 6dp round (mirrored as
    # `ROUND(x - sign(x) * 1e-9, 6)` in every oracle). r6 itself is
    # bit-identical to DuckDB ROUND (functions/rounding.py), so the
    # nudge's remaining job is absorbing sub-1e-9 summation-order drift
    # in the aggregated inputs (dollar_vol / pm sums) near .5 boundaries.
    # Same device as plans/windows._r6s; hits were observed at 10x SF.
    rounded = [
        # NAME into r6s: parsed-SQL fast path (one py4j round-trip per
        # column; the Column-tree form cost ~1.4 s of driver time just
        # CONSTRUCTING f20's 25-column projection — functions/rounding).
        r6s(c).alias(c)
        if dict(df.dtypes)[c] == "double"
        else F.col(c)
        for c in cols
    ]
    return df.select("user_id", "day", *rounded)


@register(
    "f01_prev_day_return",
    oracle=DAILY_CTE + f"""
    SELECT user_id, day, (ROUND((lag(pct) OVER {W}) - sign(lag(pct) OVER {W}) * 0.000000001, 6) + 0.0) AS prev_day_return
    FROM (SELECT user_id, day,
                 close / NULLIF(lag(close) OVER {W}, 0) - 1 AS pct
          FROM daily)
    """,
)
def f01_prev_day_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(feat.prev_day_return(_daily(spark, sf_dir)), "prev_day_return")


@register(
    "f02_std_return_last5d",
    oracle=DAILY_CTE + """
    SELECT user_id, day,
           (ROUND((CASE WHEN count(dlr) OVER w5 = 5 THEN stddev_samp(dlr) OVER w5 END) - sign(CASE WHEN count(dlr) OVER w5 = 5 THEN stddev_samp(dlr) OVER w5 END) * 0.000000001, 6) + 0.0) AS std_return_last5d
    FROM (SELECT user_id, day, ln(NULLIF(close / NULLIF(open, 0), 0)) AS dlr FROM daily)
    WINDOW w5 AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def f02_std_return_last5d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(feat.std_return_last5d(_daily(spark, sf_dir)), "std_return_last5d")


@register(
    "f03_range_rel_last1d",
    oracle=DAILY_CTE + f"""
    SELECT user_id, day,
           (ROUND((lag((high - low) / NULLIF(close, 0)) OVER {W}) - sign(lag((high - low) / NULLIF(close, 0)) OVER {W}) * 0.000000001, 6) + 0.0) AS range_rel_last1d
    FROM daily
    """,
)
def f03_range_rel_last1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(feat.range_rel_last1d(_daily(spark, sf_dir)), "range_rel_last1d")


@register(
    "f04_rvol_20d",
    oracle=DAILY_CTE + """
    SELECT user_id, day,
           (ROUND((dollar_vol / NULLIF(CASE WHEN count(dollar_vol) OVER wx = 20 THEN AVG(dollar_vol) OVER wx END, 0)) - sign(dollar_vol / NULLIF(CASE WHEN count(dollar_vol) OVER wx = 20 THEN AVG(dollar_vol) OVER wx END, 0)) * 0.000000001, 6) + 0.0) AS rvol_20d
    FROM daily
    WINDOW wx AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    """,
)
def f04_rvol_20d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(feat.rvol_20d(_daily(spark, sf_dir)), "rvol_20d")


@register(
    "f05_gap_pct",
    oracle=DAILY_CTE + f"""
    SELECT user_id, day,
           (ROUND((CASE WHEN prev_close IS NULL THEN NULL ELSE COALESCE((pm_open - prev_close) / NULLIF(prev_close, 0), 0) END) - sign(CASE WHEN prev_close IS NULL THEN NULL ELSE COALESCE((pm_open - prev_close) / NULLIF(prev_close, 0), 0) END) * 0.000000001, 6) + 0.0) AS gap_pct
    FROM (SELECT user_id, day, pm_open, lag(close) OVER {W} AS prev_close FROM daily)
    """,
)
def f05_gap_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(feat.gap_pct(_daily(spark, sf_dir)), "gap_pct")


@register(
    "f06_dist_max_20d",
    oracle=DAILY_CTE + f"""
    SELECT user_id, day,
           (ROUND(((lag(close) OVER {W} - CASE WHEN count(close) OVER wx = 20 THEN max(close) OVER wx END) / NULLIF(CASE WHEN count(close) OVER wx = 20 THEN max(close) OVER wx END, 0)) - sign((lag(close) OVER {W} - CASE WHEN count(close) OVER wx = 20 THEN max(close) OVER wx END) / NULLIF(CASE WHEN count(close) OVER wx = 20 THEN max(close) OVER wx END, 0)) * 0.000000001, 6) + 0.0) AS dist_max_20d
    FROM daily
    WINDOW wx AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    """,
)
def f06_dist_max_20d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(feat.dist_max_20d(_daily(spark, sf_dir)), "dist_max_20d")


@register(
    "f07_upper_wick_ratio_last1d",
    oracle=DAILY_CTE + f"""
    SELECT user_id, day,
           (ROUND((lag(CASE WHEN high - low = 0 THEN 0.0 ELSE (high - greatest(open, close)) / (high - low) END) OVER {W}) - sign(lag(CASE WHEN high - low = 0 THEN 0.0 ELSE (high - greatest(open, close)) / (high - low) END) OVER {W}) * 0.000000001, 6) + 0.0) AS upper_wick_ratio_last1d
    FROM daily
    """,
)
def f07_upper_wick_ratio_last1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(
        feat.upper_wick_ratio_last1d(_daily(spark, sf_dir)), "upper_wick_ratio_last1d"
    )


@register(
    "f08_lower_wick_ratio_last1d",
    oracle=DAILY_CTE + f"""
    SELECT user_id, day,
           (ROUND((lag(CASE WHEN high - low = 0 THEN 0.0 ELSE (least(open, close) - low) / (high - low) END) OVER {W}) - sign(lag(CASE WHEN high - low = 0 THEN 0.0 ELSE (least(open, close) - low) / (high - low) END) OVER {W}) * 0.000000001, 6) + 0.0) AS lower_wick_ratio_last1d
    FROM daily
    """,
)
def f08_lower_wick_ratio_last1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(
        feat.lower_wick_ratio_last1d(_daily(spark, sf_dir)), "lower_wick_ratio_last1d"
    )


@register(
    "f09_weekday_encode",
    oracle=DAILY_CTE + """
    SELECT user_id, day,
           dayname(day) AS weekday,
           (ROUND((sin(2 * pi() * ((dayofweek(day) + 6) % 7) / 5)) - sign(sin(2 * pi() * ((dayofweek(day) + 6) % 7) / 5)) * 0.000000001, 6) + 0.0) AS weekday_sin,
           (ROUND((cos(2 * pi() * ((dayofweek(day) + 6) % 7) / 5)) - sign(cos(2 * pi() * ((dayofweek(day) + 6) % 7) / 5)) * 0.000000001, 6) + 0.0) AS weekday_cos
    FROM daily
    """,
)
def f09_weekday_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(
        feat.weekday_features(_daily(spark, sf_dir)), "weekday", "weekday_sin", "weekday_cos"
    )


@register(
    "f10_days_since_holiday",
    oracle=DAILY_CTE + """
    SELECT d.user_id, d.day,
           CAST(datediff('day', max(h.hday), d.day) AS BIGINT) AS days_since_holiday
    FROM daily d
    LEFT JOIN (VALUES (TIMESTAMP '2024-01-01 00:00:00'),
                      (TIMESTAMP '2024-01-15 00:00:00')) AS h(hday)
      ON h.hday <= d.day
    GROUP BY d.user_id, d.day
    """,
)
def f10_days_since_holiday(spark: SparkSession, sf_dir: str) -> DataFrame:
    # my_stock_functions.py:489-531 (np.searchsorted previous-holiday as-of):
    # broadcast non-equi join against the tiny holiday dim + max + datediff.
    daily = _daily(spark, sf_dir)
    holidays = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-15 00:00:00",)], ["h"]
    ).select(F.col("h").cast("timestamp").alias("hday"))
    return (
        daily.join(F.broadcast(holidays), holidays.hday <= daily.day, "left")
        .groupBy("user_id", "day")
        .agg(F.datediff(F.col("day"), F.max("hday")).cast("long").alias("days_since_holiday"))
    )


@register(
    "f11_hhi_premarket_volume",
    oracle=DAILY_CTE + """
    SELECT user_id, day,
           (ROUND((pm_wvol / NULLIF(pm_vol * pm_vol, 0)) - sign(pm_wvol / NULLIF(pm_vol * pm_vol, 0)) * 0.000000001, 6) + 0.0) AS hhi_premarket_volume
    FROM daily
    """,
)
def f11_hhi_premarket_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(feat.hhi_premarket(_daily(spark, sf_dir)), "hhi_premarket_volume")


@register(
    "f12_z_pm_comp",
    oracle=DAILY_CTE + f"""
    SELECT user_id, day,
           (ROUND(((pm_ret - CASE WHEN count(dr) OVER wz = 20 THEN AVG(dr) OVER wz END) / NULLIF(CASE WHEN count(dr) OVER wz = 20 THEN stddev_samp(dr) OVER wz END, 0)) - sign((pm_ret - CASE WHEN count(dr) OVER wz = 20 THEN AVG(dr) OVER wz END) / NULLIF(CASE WHEN count(dr) OVER wz = 20 THEN stddev_samp(dr) OVER wz END, 0)) * 0.000000001, 6) + 0.0) AS z_pm_comp
    FROM (SELECT user_id, day,
                 close / NULLIF(lag(close) OVER {W}, 0) - 1 AS dr,
                 pm_close / NULLIF(pm_open, 0) - 1          AS pm_ret
          FROM daily)
    WINDOW wz AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def f12_z_pm_comp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(feat.z_pm(_daily(spark, sf_dir)), "z_pm_comp")


@register(
    "f13_pm_rts_hist",
    oracle=DAILY_CTE + """
    SELECT user_id, day,
           (ROUND((ln((ats + 0.01) / (CASE WHEN count(ats) OVER wm = 20 THEN median(ats) OVER wm END + 0.01))) - sign(ln((ats + 0.01) / (CASE WHEN count(ats) OVER wm = 20 THEN median(ats) OVER wm END + 0.01))) * 0.000000001, 6) + 0.0) AS pm_rts_hist
    FROM (SELECT user_id, day, dollar_vol / n_events AS ats FROM daily)
    WINDOW wm AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def f13_pm_rts_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(feat.pm_rts_hist(_daily(spark, sf_dir)), "pm_rts_hist")


@register(
    "f14_pm_vwap_return",
    oracle=DAILY_CTE + f"""
    SELECT user_id, day,
           (ROUND(((pm_wvol / NULLIF(pm_vol, 0)) / NULLIF(lag(close) OVER {W}, 0) - 1) - sign((pm_wvol / NULLIF(pm_vol, 0)) / NULLIF(lag(close) OVER {W}, 0) - 1) * 0.000000001, 6) + 0.0)
             AS pm_vwap_return
    FROM daily
    """,
)
def f14_pm_vwap_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(feat.pm_vwap_return(_daily(spark, sf_dir)), "pm_vwap_return")


@register(
    "f15_fase2_ratios",
    oracle=DAILY_CTE + f"""
    SELECT user_id, day,
           (ROUND(((high - low) / NULLIF(low, 0) * 100) - sign((high - low) / NULLIF(low, 0) * 100) * 0.000000001, 6) + 0.0)    AS pct_change_low_high,
           (ROUND(((close - open) / NULLIF(open, 0) * 100) - sign((close - open) / NULLIF(open, 0) * 100) * 0.000000001, 6) + 0.0) AS pct_change_open_close,
           (ROUND(((open - lag(close) OVER {W}) / NULLIF(lag(close) OVER {W}, 0) * 100) - sign((open - lag(close) OVER {W}) / NULLIF(lag(close) OVER {W}, 0) * 100) * 0.000000001, 6) + 0.0)
             AS pct_gap_open_prev_close
    FROM daily
    """,
)
def f15_fase2_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(
        feat.fase2_ratios(_daily(spark, sf_dir)),
        "pct_change_low_high", "pct_change_open_close", "pct_gap_open_prev_close",
    )


@register(
    "f16_lookback_ladder",
    oracle=DAILY_CTE + f"""
    SELECT user_id, day,
           (ROUND((close / NULLIF(lag(close, 1) OVER {W}, 0) - 1) - sign(close / NULLIF(lag(close, 1) OVER {W}, 0) - 1) * 0.000000001, 6) + 0.0)  AS pct_change_1d,
           (ROUND((close / NULLIF(lag(close, 7) OVER {W}, 0) - 1) - sign(close / NULLIF(lag(close, 7) OVER {W}, 0) - 1) * 0.000000001, 6) + 0.0)  AS pct_change_7d,
           (ROUND((close / NULLIF(lag(close, 14) OVER {W}, 0) - 1) - sign(close / NULLIF(lag(close, 14) OVER {W}, 0) - 1) * 0.000000001, 6) + 0.0) AS pct_change_14d
    FROM daily
    """,
)
def f16_lookback_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(
        feat.lookback_ladder(_daily(spark, sf_dir), lags=(1, 7, 14)),
        "pct_change_1d", "pct_change_7d", "pct_change_14d",
    )


@register(
    "f17_true_range",
    oracle=DAILY_CTE + f"""
    SELECT user_id, day,
           (ROUND((greatest(high, prev_close) - least(low, prev_close)) - sign(greatest(high, prev_close) - least(low, prev_close)) * 0.000000001, 6) + 0.0) AS tr,
           (ROUND(((greatest(high, prev_close) - least(low, prev_close)) / NULLIF(close, 0)) - sign((greatest(high, prev_close) - least(low, prev_close)) / NULLIF(close, 0)) * 0.000000001, 6) + 0.0) AS rel_tr
    FROM (SELECT user_id, day, open, high, low, close,
                 COALESCE(lag(close) OVER {W}, open) AS prev_close
          FROM daily)
    """,
)
def f17_true_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(feat.true_range(_daily(spark, sf_dir)), "tr", "rel_tr")


@register(
    "f18_market_path_label",
    oracle=DAILY_CTE + """
    SELECT user_id, day,
           (ROUND((abs(close / NULLIF(open, 0) - 1)) - sign(abs(close / NULLIF(open, 0) - 1)) * 0.000000001, 6) + 0.0) AS market_absolute_path,
           CAST(abs(close / NULLIF(open, 0) - 1) >= 0.06 AS INTEGER) AS market_path_flag
    FROM daily
    """,
)
def f18_market_path_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _out(
        feat.market_path_label(_daily(spark, sf_dir)),
        "market_absolute_path", "market_path_flag",
    )


@register(
    "f19_event_segmentation",
    # The trend/threshold scan is recursive (every reset depends on the
    # previous hit), so the oracle — like w11's EWM — is a DuckDB recursive
    # CTE stepping one row per key per iteration, carrying the scan state
    # (ref, lo, hi, start_time, n). The tiered band arithmetic mirrors
    # operators.events_seg.min_max_target bit-for-bit: every literal is
    # forced DOUBLE so both engines run the identical IEEE-754 sequence.
    # NB: intermediates (factor..hit) must be computed over renamed prev_*
    # columns in a subquery — DuckDB resolves unqualified names to real
    # columns of in-scope tables BEFORE lateral aliases, so reusing the
    # carried column names would silently read the previous row's values.
    oracle="""
    WITH RECURSIVE base AS (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE value > 0
    ), mx AS (
      SELECT user_id, max(rn) AS mxrn FROM base GROUP BY user_id
    ), scan AS (
      SELECT user_id, rn, ts, value,
             CASE WHEN value <= 0.1 THEN CAST(0.12 AS DOUBLE)
                  WHEN value <= 0.5 THEN CAST(0.08 AS DOUBLE)
                  WHEN value <= 2   THEN CAST(0.05 AS DOUBLE)
                  WHEN value <= 10  THEN CAST(0.03 AS DOUBLE)
                  ELSE CAST(0.02 AS DOUBLE) END AS factor,
             CASE WHEN value <= 0.5 THEN 1e4
                  WHEN value <= 2   THEN 1e3
                  ELSE 1e2 END AS pw,
             floor(value * pw + 0.5) / pw AS p,
             floor(p * (1 - factor) * pw + 0.5) / pw AS min_t,
             (p - min_t) + p AS max_t,
             (value <= min_t OR value >= max_t) AS hit,
             ts AS ev_start, value AS ev_open, value AS ev_high,
             value AS ev_low, CAST(1 AS BIGINT) AS ev_n,
             value AS ref, value AS lo, value AS hi, ts AS start_time,
             CASE WHEN hit THEN CAST(0 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) END AS n
      FROM base WHERE rn = 1
      UNION ALL
      SELECT user_id, rn, ts, value,
             CASE WHEN prev_ref <= 0.1 THEN CAST(0.12 AS DOUBLE)
                  WHEN prev_ref <= 0.5 THEN CAST(0.08 AS DOUBLE)
                  WHEN prev_ref <= 2   THEN CAST(0.05 AS DOUBLE)
                  WHEN prev_ref <= 10  THEN CAST(0.03 AS DOUBLE)
                  ELSE CAST(0.02 AS DOUBLE) END AS factor,
             CASE WHEN prev_ref <= 0.5 THEN 1e4
                  WHEN prev_ref <= 2   THEN 1e3
                  ELSE 1e2 END AS pw,
             floor(prev_ref * pw + 0.5) / pw AS p,
             floor(p * (1 - factor) * pw + 0.5) / pw AS min_t,
             (p - min_t) + p AS max_t,
             (value <= min_t OR value >= max_t) AS hit,
             prev_start AS ev_start, prev_ref AS ev_open,
             greatest(prev_hi, value) AS ev_high,
             least(prev_lo, value) AS ev_low,
             prev_n + 1 AS ev_n,
             CASE WHEN hit THEN value ELSE prev_ref END AS ref,
             CASE WHEN hit THEN value ELSE least(prev_lo, value) END AS lo,
             CASE WHEN hit THEN value ELSE greatest(prev_hi, value) END AS hi,
             CASE WHEN hit THEN ts ELSE prev_start END AS start_time,
             CASE WHEN hit THEN CAST(0 AS BIGINT) ELSE prev_n + 1 END AS n
      FROM (
        SELECT b.user_id, b.rn, b.ts, b.value,
               s.ref AS prev_ref, s.lo AS prev_lo, s.hi AS prev_hi,
               s.start_time AS prev_start, s.n AS prev_n
        FROM base b JOIN scan s ON b.user_id = s.user_id AND b.rn = s.rn + 1
      )
    )
    SELECT user_id, start_time, end_time, open, high, low, close,
           (ROUND(pct_raw - sign(pct_raw) * 0.000000001, 6) + 0.0) AS pct_change,
           n_bars
    FROM (
      SELECT user_id, ev_start AS start_time, ts AS end_time,
             ev_open AS open, ev_high AS high, ev_low AS low, value AS close,
             (value - ev_open) / ev_open AS pct_raw, ev_n AS n_bars
      FROM scan WHERE hit
      UNION ALL
      SELECT s.user_id, s.start_time, s.ts, s.ref, s.hi, s.lo, s.value,
             (s.value - s.ref) / s.ref, s.n
      FROM scan s JOIN mx USING (user_id) WHERE s.rn = mx.mxrn
    )
    """,
)
def f19_event_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # build_event_df trend/threshold segmentation (my_alpaca.py:19-111):
    # a stateful per-key scan run as applyInPandas (operators/events_seg.py),
    # also pinned by a pandas differential test (tests/test_domain.py).
    # Non-positive prices are gated out FIRST (mirrored in the oracle):
    # the reference's band function raises ValueError on price <= 0
    # (my_helper.py), i.e. such rows are invalid input by the reference's
    # own contract — the larger test SFs contain a handful of them.
    from equity_volatility_lakehouse_platform_spark.operators.events_seg import segment_events

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return segment_events(ev)


@register(
    "f20_gold_matrix",
    oracle=DAILY_CTE + f"""
    , enr AS (
      SELECT user_id, day, open, high, low, close, n_events, dollar_vol,
             pm_open, pm_close, pm_vol, pm_wvol,
             lag(close) OVER {W} AS prev_close,
             close / NULLIF(lag(close) OVER {W}, 0) - 1 AS dr,
             ln(NULLIF(close / NULLIF(open, 0), 0)) AS dlr,
             pm_close / NULLIF(pm_open, 0) - 1 AS pm_ret,
             dollar_vol / n_events AS ats
      FROM daily
    )
    SELECT user_id, day,
           (ROUND((lag(dr) OVER w) - sign(lag(dr) OVER w) * 0.000000001, 6) + 0.0) AS prev_day_return,
           (ROUND((CASE WHEN count(dlr) OVER w5 = 5 THEN stddev_samp(dlr) OVER w5 END) - sign(CASE WHEN count(dlr) OVER w5 = 5 THEN stddev_samp(dlr) OVER w5 END) * 0.000000001, 6) + 0.0) AS std_return_last5d,
           (ROUND((lag((high - low) / NULLIF(close, 0)) OVER w) - sign(lag((high - low) / NULLIF(close, 0)) OVER w) * 0.000000001, 6) + 0.0) AS range_rel_last1d,
           (ROUND((dollar_vol / NULLIF(CASE WHEN count(dollar_vol) OVER wx = 20 THEN AVG(dollar_vol) OVER wx END, 0)) - sign(dollar_vol / NULLIF(CASE WHEN count(dollar_vol) OVER wx = 20 THEN AVG(dollar_vol) OVER wx END, 0)) * 0.000000001, 6) + 0.0) AS rvol_20d,
           (ROUND((CASE WHEN prev_close IS NULL THEN NULL ELSE COALESCE((pm_open - prev_close) / NULLIF(prev_close, 0), 0) END) - sign(CASE WHEN prev_close IS NULL THEN NULL ELSE COALESCE((pm_open - prev_close) / NULLIF(prev_close, 0), 0) END) * 0.000000001, 6) + 0.0) AS gap_pct,
           (ROUND(((prev_close - CASE WHEN count(close) OVER wx = 20 THEN max(close) OVER wx END) / NULLIF(CASE WHEN count(close) OVER wx = 20 THEN max(close) OVER wx END, 0)) - sign((prev_close - CASE WHEN count(close) OVER wx = 20 THEN max(close) OVER wx END) / NULLIF(CASE WHEN count(close) OVER wx = 20 THEN max(close) OVER wx END, 0)) * 0.000000001, 6) + 0.0) AS dist_max_20d,
           (ROUND((lag(CASE WHEN high - low = 0 THEN 0.0 ELSE (high - greatest(open, close)) / (high - low) END) OVER w) - sign(lag(CASE WHEN high - low = 0 THEN 0.0 ELSE (high - greatest(open, close)) / (high - low) END) OVER w) * 0.000000001, 6) + 0.0) AS upper_wick_ratio_last1d,
           (ROUND((lag(CASE WHEN high - low = 0 THEN 0.0 ELSE (least(open, close) - low) / (high - low) END) OVER w) - sign(lag(CASE WHEN high - low = 0 THEN 0.0 ELSE (least(open, close) - low) / (high - low) END) OVER w) * 0.000000001, 6) + 0.0) AS lower_wick_ratio_last1d,
           dayname(day) AS weekday,
           (ROUND((sin(2 * pi() * ((dayofweek(day) + 6) % 7) / 5)) - sign(sin(2 * pi() * ((dayofweek(day) + 6) % 7) / 5)) * 0.000000001, 6) + 0.0) AS weekday_sin,
           (ROUND((cos(2 * pi() * ((dayofweek(day) + 6) % 7) / 5)) - sign(cos(2 * pi() * ((dayofweek(day) + 6) % 7) / 5)) * 0.000000001, 6) + 0.0) AS weekday_cos,
           (ROUND((pm_wvol / NULLIF(pm_vol * pm_vol, 0)) - sign(pm_wvol / NULLIF(pm_vol * pm_vol, 0)) * 0.000000001, 6) + 0.0) AS hhi_premarket_volume,
           (ROUND(((pm_ret - CASE WHEN count(dr) OVER wz = 20 THEN AVG(dr) OVER wz END) / NULLIF(CASE WHEN count(dr) OVER wz = 20 THEN stddev_samp(dr) OVER wz END, 0)) - sign((pm_ret - CASE WHEN count(dr) OVER wz = 20 THEN AVG(dr) OVER wz END) / NULLIF(CASE WHEN count(dr) OVER wz = 20 THEN stddev_samp(dr) OVER wz END, 0)) * 0.000000001, 6) + 0.0) AS z_pm_comp,
           (ROUND((ln((ats + 0.01) / (CASE WHEN count(ats) OVER wz = 20 THEN median(ats) OVER wz END + 0.01))) - sign(ln((ats + 0.01) / (CASE WHEN count(ats) OVER wz = 20 THEN median(ats) OVER wz END + 0.01))) * 0.000000001, 6) + 0.0)
             AS pm_rts_hist,
           (ROUND(((pm_wvol / NULLIF(pm_vol, 0)) / NULLIF(prev_close, 0) - 1) - sign((pm_wvol / NULLIF(pm_vol, 0)) / NULLIF(prev_close, 0) - 1) * 0.000000001, 6) + 0.0)
             AS pm_vwap_return,
           (ROUND(((high - low) / NULLIF(low, 0) * 100) - sign((high - low) / NULLIF(low, 0) * 100) * 0.000000001, 6) + 0.0)    AS pct_change_low_high,
           (ROUND(((close - open) / NULLIF(open, 0) * 100) - sign((close - open) / NULLIF(open, 0) * 100) * 0.000000001, 6) + 0.0) AS pct_change_open_close,
           (ROUND(((open - prev_close) / NULLIF(prev_close, 0) * 100) - sign((open - prev_close) / NULLIF(prev_close, 0) * 100) * 0.000000001, 6) + 0.0)
             AS pct_gap_open_prev_close,
           (ROUND((close / NULLIF(prev_close, 0) - 1) - sign(close / NULLIF(prev_close, 0) - 1) * 0.000000001, 6) + 0.0)              AS pct_change_1d,
           (ROUND((close / NULLIF(lag(close, 7) OVER w, 0) - 1) - sign(close / NULLIF(lag(close, 7) OVER w, 0) - 1) * 0.000000001, 6) + 0.0)   AS pct_change_7d,
           (ROUND((close / NULLIF(lag(close, 14) OVER w, 0) - 1) - sign(close / NULLIF(lag(close, 14) OVER w, 0) - 1) * 0.000000001, 6) + 0.0)   AS pct_change_14d,
           (ROUND((greatest(high, COALESCE(prev_close, open)) - least(low, COALESCE(prev_close, open))) - sign(greatest(high, COALESCE(prev_close, open)) - least(low, COALESCE(prev_close, open))) * 0.000000001, 6) + 0.0) AS tr,
           (ROUND(((greatest(high, COALESCE(prev_close, open)) - least(low, COALESCE(prev_close, open))) / NULLIF(close, 0)) - sign((greatest(high, COALESCE(prev_close, open)) - least(low, COALESCE(prev_close, open))) / NULLIF(close, 0)) * 0.000000001, 6) + 0.0)
             AS rel_tr,
           (ROUND((abs(close / NULLIF(open, 0) - 1)) - sign(abs(close / NULLIF(open, 0) - 1)) * 0.000000001, 6) + 0.0) AS market_absolute_path,
           CAST(abs(close / NULLIF(open, 0) - 1) >= 0.06 AS INTEGER) AS market_path_flag
    FROM enr
    WINDOW w  AS (PARTITION BY user_id ORDER BY day),
           w5 AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
           wz AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
           wx AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    """,
)
def f20_gold_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Gold assembly (SURVEY §3.1 stage 4 / §7.2 step 6): EVERY feature
    # over one daily frame and ONE window spec via the fused two-layer
    # projection (functions.features.gold_matrix) — one groupBy shuffle +
    # one window sort, and the window expressions collapse to ~5 passes
    # grouped by frame instead of one per feature. days_since_holiday joins
    # in at deploy time via operators.calendar_ops (environment-supplied
    # holiday dim), and EWM via functions.lookbacks — both excluded here to
    # keep the matrix purely windowed.
    return _out(
        feat.gold_matrix(_daily(spark, sf_dir)),
        "prev_day_return", "std_return_last5d", "range_rel_last1d", "rvol_20d",
        "gap_pct", "dist_max_20d", "upper_wick_ratio_last1d",
        "lower_wick_ratio_last1d", "weekday", "weekday_sin", "weekday_cos",
        "hhi_premarket_volume", "z_pm_comp", "pm_rts_hist", "pm_vwap_return",
        "pct_change_low_high", "pct_change_open_close", "pct_gap_open_prev_close",
        "pct_change_1d", "pct_change_7d", "pct_change_14d", "tr", "rel_tr",
        "market_absolute_path", "market_path_flag",
    )


@register(
    "f21_intraday_volume_profile",
    # Intraday volume profile: each user's average share of daily
    # activity landing in each 30-minute bucket (the U-shape every
    # open/close-heavy tape shows; feeds execution scheduling). Shares
    # are exact integer ratios; only the cross-day average takes the
    # nudged round (summation order differs between engines).
    oracle="""
    WITH b AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(EXTRACT(hour FROM ts) * 2
                  + CASE WHEN EXTRACT(minute FROM ts) >= 30 THEN 1 ELSE 0 END
               AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    ), sh AS (
      SELECT user_id, bucket,
             n * 1.0 / SUM(n) OVER (PARTITION BY user_id, day) AS share
      FROM b
    )
    SELECT user_id, bucket,
           CAST(count(*) AS BIGINT) AS n_days,
           (ROUND(AVG(share) - sign(AVG(share)) * 0.000000001, 6) + 0.0)
             AS avg_share
    FROM sh GROUP BY user_id, bucket
    """,
)
def f21_intraday_volume_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One groupBy shuffle builds the (user, day, bucket) counts; the
    # daily total is a whole-partition window over that aggregate (tiny:
    # <=48 rows per user-day); the final per-bucket average re-groups on
    # a prefix of the same key. Nothing touches raw events twice.
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.hour("ts") * 2 + F.when(F.minute("ts") >= 30, 1).otherwise(0)
    ).cast("bigint")
    b = ev.groupBy(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        bucket.alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    sh = b.select(
        "user_id", "bucket",
        (
            F.col("n") * F.lit(1.0)
            / F.sum("n").over(Window.partitionBy("user_id", "day"))
        ).alias("share"),
    )
    return sh.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_days"),
        r6s(F.avg("share")).alias("avg_share"),
    )


@register(
    "f24_event_study_car",
    # Event-study cumulative abnormal return: around each shock day
    # (days with >= 1 'error' event), the +-2-day window of daily
    # returns minus the user's own mean return, accumulated per offset
    # — the standard finance-research CAR curve, averaged across events
    # per user and relative day.
    oracle="""
    WITH bars AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             arg_max(value, ts) AS close
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT user_id, day,
             close / NULLIF(lag(close) OVER (PARTITION BY user_id
                                             ORDER BY day), 0.0) - 1.0
               AS ret
      FROM bars
    ), mu AS (
      SELECT user_id, day, ret,
             AVG(ret) OVER (PARTITION BY user_id) AS mean_ret
      FROM r
    ), ev AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS event_day
      FROM events WHERE event_type = 'error'
    ), win AS (
      SELECT e.user_id, e.event_day,
             CAST(o.off AS BIGINT) AS rel_day,
             e.event_day + to_days(CAST(o.off AS INTEGER)) AS day
      FROM ev e CROSS JOIN (SELECT unnest(range(-2, 3)) AS off) o
    )
    SELECT w.user_id, w.rel_day,
           CAST(count(m.ret) AS BIGINT) AS n_obs,
           (ROUND(AVG(m.ret - m.mean_ret)
                  - sign(AVG(m.ret - m.mean_ret)) * 0.000000001, 6) + 0.0)
             AS avg_abnormal_ret
    FROM win w JOIN mu m ON w.user_id = m.user_id AND w.day = m.day
    GROUP BY w.user_id, w.rel_day
    """,
)
def f24_event_study_car(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The event window materializes by EXPLODING each event day into its
    # five relative offsets (executor-side, the g01 generation rule) and
    # equi-joining back on (user, day) — never a range join, never a
    # per-event scan. Abnormal returns subtract the user's whole-sample
    # mean via a window that shares the returns' partitioning.
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    bars = events.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.max_by("value", "ts").alias("close"))
    wseq = Window.partitionBy("user_id").orderBy("day")
    r = bars.select(
        "user_id", "day",
        (
            F.col("close") / F.nullif(F.lag("close").over(wseq), F.lit(0.0))
            - F.lit(1.0)
        ).alias("ret"),
    )
    mu = r.select(
        "user_id", "day", "ret",
        F.avg("ret").over(Window.partitionBy("user_id")).alias("mean_ret"),
    )
    ev = (
        events.filter(F.col("event_type") == "error")
        .select("user_id", F.date_trunc("day", "ts").alias("event_day"))
        .distinct()
    )
    win = ev.select(
        "user_id", "event_day",
        F.explode(F.sequence(F.lit(-2), F.lit(2))).alias("rel_day"),
    ).select(
        "user_id",
        F.col("rel_day").cast("bigint").alias("rel_day"),
        F.timestamp_add("DAY", F.col("rel_day"), F.col("event_day")).alias("day"),
    )
    j = win.join(mu, ["user_id", "day"])
    return j.groupBy("user_id", "rel_day").agg(
        F.count("ret").alias("n_obs"),
        r6s(F.avg(F.col("ret") - F.col("mean_ret"))).alias("avg_abnormal_ret"),
    )


@register(
    "f25_cross_sectional_zrank",
    # Cross-sectional neutralization — the canonical alpha-factor
    # transform (rank/z-score each day's returns ACROSS symbols, not
    # along time): every w-query windows WITHIN a symbol; factor models
    # need the TRANSPOSE, per-day stats over the symbol axis. Two
    # inherent shuffles (by symbol for the lag, by day for the cross
    # section — the axis flip is the cost, same as any factor pipeline);
    # the per-day moments are ORDERED folds over the day's return list
    # (by user_id) so both engines sum the identical sequence, and the
    # tiny per-day stats table broadcasts back onto the rows. Rank ties
    # break on user_id; z uses the sample std (n-1), days with a single
    # cross-sectional observation are dropped.
    oracle=DAILY_CTE + f"""
    , rets AS (
      SELECT user_id, day,
             close / NULLIF(lag(close) OVER {W}, 0) - 1 AS ret
      FROM daily
    ), r2 AS (
      SELECT * FROM rets WHERE ret IS NOT NULL
    ), ds AS (
      SELECT day, list(ret ORDER BY user_id) AS lst, count(*) AS n
      FROM r2 GROUP BY day HAVING count(*) >= 2
    ), st AS (
      SELECT day, n, lst,
             list_reduce(lst, (a, b) -> a + b) / n AS mu
      FROM ds
    ), st2 AS (
      SELECT day, n, mu,
             sqrt(list_reduce(list_transform(lst, x -> (x - mu) * (x - mu)),
                              (a, b) -> a + b) / (n - 1)) AS sd
      FROM st
    ), ranked AS (
      SELECT r.user_id, r.day, r.ret, s.n, s.mu, s.sd,
             row_number() OVER (PARTITION BY r.day
                                ORDER BY r.ret, r.user_id) AS rk
      FROM r2 r JOIN st2 s USING (day)
    )
    SELECT user_id, day,
           (ROUND(ret - sign(ret) * 0.000000001, 6) + 0.0) AS ret,
           CAST(rk AS BIGINT) AS cs_rank,
           CAST(n AS BIGINT) AS cs_n,
           (ROUND((ret - mu) / NULLIF(sd, 0)
                  - sign((ret - mu) / NULLIF(sd, 0)) * 0.000000001, 6)
            + 0.0) AS cs_z,
           (ROUND((rk - 1) * 1.0 / (n - 1)
                  - sign((rk - 1) * 1.0 / (n - 1)) * 0.000000001, 6)
            + 0.0) AS cs_pct_rank
    FROM ranked
    """,
)
def f25_cross_sectional_zrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = _daily(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("day")
    # Narrow (user_id, day, ret) frame consumed TWICE (the per-day
    # moment aggregation and the ranked join); the lazy checkpoint
    # stops the events groupBy + lag window from executing once per
    # consumer (round-14 optimization, the d16 manifest pattern).
    rets = (
        daily.select(
            "user_id", "day",
            (
                F.col("close") / F.nullif(F.lag("close").over(wu), F.lit(0.0))
                - 1
            ).alias("ret"),
        )
        .filter(F.col("ret").isNotNull())
        .localCheckpoint(eager=False)
    )
    ds = (
        rets.groupBy("day")
        .agg(
            F.array_sort(F.collect_list(F.struct("user_id", "ret"))).alias(
                "pairs"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .select("day", "n", F.expr("transform(pairs, e -> e.ret)").alias("lst"))
    )
    st = ds.select(
        "day", "n", "lst",
        F.expr("aggregate(lst, 0D, (a, b) -> a + b)").alias("_sum"),
    ).select("day", "n", "lst", (F.col("_sum") / F.col("n")).alias("mu"))
    st2 = st.select(
        "day", "n", "mu",
        F.sqrt(
            F.expr(
                "aggregate(transform(lst, x -> (x - mu) * (x - mu)),"
                " 0D, (a, b) -> a + b)"
            )
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    wd = Window.partitionBy("day").orderBy("ret", "user_id")
    ranked = (
        rets.join(F.broadcast(st2), "day")
        .withColumn("rk", F.row_number().over(wd))
    )
    out = ranked.select(
        "user_id", "day", "ret",
        F.col("rk").cast("bigint").alias("cs_rank"),
        F.col("n").cast("bigint").alias("cs_n"),
        ((F.col("ret") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0))).alias(
            "_z"
        ),
        ((F.col("rk") - 1) * 1.0 / (F.col("n") - 1)).alias("_pr"),
    )
    return out.select(
        "user_id", "day",
        r6s("ret").alias("ret"),
        "cs_rank", "cs_n",
        r6s("_z").alias("cs_z"),
        r6s("_pr").alias("cs_pct_rank"),
    )


@register(
    "f26_factor_ic",
    # Factor Information Coefficient — THE alpha-factor eval metric:
    # per-day Spearman rank correlation between a factor (yesterday's
    # return, the momentum signal) and the FORWARD one-day return it is
    # supposed to predict. Composes f25's cross-sectional machinery one
    # level up. Spearman = Pearson over ranks, and with unique ranks
    # (row_number, symbol tiebreak) EVERY moment is an INTEGER sum —
    # n, Sx, Sy, Sxy, Sxx, Syy are exact under any accumulation order,
    # no ordered folds needed; the final IC is two exact integer
    # expressions, one sqrt each, one division (all correctly-rounded
    # IEEE on both engines, nudge-rounded). Cost: the same two inherent
    # shuffles as f25 (by symbol for the lags, by day for the cross
    # section); the IC table is one tiny row per day.
    oracle=DAILY_CTE + f"""
    , rets AS (
      SELECT user_id, day,
             close / NULLIF(lag(close) OVER {W}, 0) - 1 AS ret,
             lead(close) OVER {W} / NULLIF(close, 0) - 1 AS fwd
      FROM daily
    ), r2 AS (
      SELECT * FROM rets WHERE ret IS NOT NULL AND fwd IS NOT NULL
    ), rk AS (
      SELECT day,
             row_number() OVER (PARTITION BY day ORDER BY ret, user_id)
               AS rx,
             row_number() OVER (PARTITION BY day ORDER BY fwd, user_id)
               AS ry
      FROM r2
    ), mo AS (
      SELECT day, count(*) AS n,
             sum(rx) AS sx, sum(ry) AS sy, sum(rx * ry) AS sxy,
             sum(rx * rx) AS sxx, sum(ry * ry) AS syy
      FROM rk GROUP BY day HAVING count(*) >= 3
    ), ic AS (
      SELECT day, n,
             (n * sxy - sx * sy)
               / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0)
               AS ic
      FROM mo
    )
    SELECT day, CAST(n AS BIGINT) AS n,
           (ROUND(ic - sign(ic) * 0.000000001, 6) + 0.0) AS spearman_ic
    FROM ic
    """,
)
def f26_factor_ic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = _daily(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("day")
    rets = daily.select(
        "user_id", "day",
        (
            F.col("close") / F.nullif(F.lag("close").over(wu), F.lit(0.0)) - 1
        ).alias("ret"),
        (
            F.lead("close").over(wu) / F.nullif(F.col("close"), F.lit(0.0)) - 1
        ).alias("fwd"),
    ).filter(F.col("ret").isNotNull() & F.col("fwd").isNotNull())
    wx = Window.partitionBy("day").orderBy("ret", "user_id")
    wy = Window.partitionBy("day").orderBy("fwd", "user_id")
    rk = rets.select(
        "day",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    mo = (
        rk.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rx").alias("sx"),
            F.sum("ry").alias("sy"),
            F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
            F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
            F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        )
        .filter(F.col("n") >= 3)
    )
    ic = mo.select(
        "day",
        F.col("n").cast("bigint").alias("n"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(
                F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
                * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
                F.lit(0.0),
            )
        ).alias("ic"),
    )
    return ic.select("day", "n", r6s("ic").alias("spearman_ic"))


@register(
    "f27_amihud_illiquidity",
    # Amihud (2002) illiquidity — THE standard price-impact proxy:
    # per (symbol, month), the mean over days of |daily return| /
    # dollar volume (x 1e6 for the conventional scale). The daily
    # ratios are bit-identical on both engines (same lag/division
    # order), and the monthly mean is an ORDERED fold over the month's
    # days (list_reduce by day == aggregate over the sorted
    # collect_list), so no groupBy summation-order hazard. Two
    # shuffles: the per-symbol lag sort, then the (symbol, month)
    # roll-up whose fold is bounded by days/month.
    oracle=DAILY_CTE + f"""
    , rets AS (
      SELECT user_id, day, dollar_vol,
             abs(close / NULLIF(lag(close) OVER {W}, 0) - 1) AS aret
      FROM daily
    ), r2 AS (
      SELECT user_id, CAST(date_trunc('month', day) AS TIMESTAMP) AS month,
             day, 1000000.0 * aret / NULLIF(dollar_vol, 0) AS illiq
      FROM rets WHERE aret IS NOT NULL
    ), g AS (
      SELECT user_id, month,
             count(*) AS n_days,
             list_reduce(list(illiq ORDER BY day),
                         (a, b) -> a + b) AS s
      FROM r2 GROUP BY user_id, month
    )
    SELECT user_id, month, CAST(n_days AS BIGINT) AS n_days,
           (ROUND(s / n_days - sign(s / n_days) * 0.000000001, 6) + 0.0)
             AS amihud_illiq
    FROM g
    """,
)
def f27_amihud_illiquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = _daily(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("day")
    rets = daily.select(
        "user_id", "day", "dollar_vol",
        F.abs(
            F.col("close") / F.nullif(F.lag("close").over(wu), F.lit(0.0)) - 1
        ).alias("aret"),
    ).filter(F.col("aret").isNotNull())
    r2 = rets.select(
        "user_id",
        F.date_trunc("month", "day").alias("month"),
        "day",
        (
            F.lit(1000000.0) * F.col("aret")
            / F.nullif(F.col("dollar_vol"), F.lit(0.0))
        ).alias("illiq"),
    )
    g = r2.groupBy("user_id", "month").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.array_sort(F.collect_list(F.struct("day", "illiq"))).alias("lst"),
    ).select(
        "user_id", "month", "n_days",
        F.expr(
            "aggregate(transform(lst, e -> e.illiq), 0D, (a, b) -> a + b)"
        ).alias("s"),
    )
    return g.select(
        "user_id", "month",
        F.col("n_days").cast("bigint").alias("n_days"),
        r6s((F.col("s") / F.col("n_days"))).alias("amihud_illiq"),
    )


@register(
    "f28_rolling_beta",
    # Rolling market beta + alpha (round 10) — the CAPM exposure every
    # equity feature matrix carries next to the volatility block: per
    # (user, day), OLS slope/intercept of the user's daily return
    # against the equal-weight market return over a trailing 5-day
    # window (full windows only — the warm-up guard every w-family
    # rolling stat applies). Moments are plain frame sums (the w06
    # device: 6dp round + toward-zero nudge absorbs frame-accumulation
    # ulp drift); beta = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2),
    # alpha = (Sy - beta*Sx) / n. Cost shape: the daily roll-up's one
    # shuffle, a day-keyed market aggregate broadcast back, one window
    # sort per user — no self-joins, no all-pairs.
    oracle=DAILY_CTE + f"""
    , rets AS (
      SELECT user_id, day,
             close / NULLIF(lag(close) OVER {W}, 0) - 1 AS ret
      FROM daily
    ), mkt AS (
      SELECT day, avg(close) AS mclose FROM daily GROUP BY day
    ), mret AS (
      SELECT day,
             mclose / NULLIF(lag(mclose) OVER (ORDER BY day), 0) - 1 AS mr
      FROM mkt
    ), j AS (
      SELECT r.user_id, r.day, r.ret, m.mr
      FROM rets r JOIN mret m ON m.day = r.day
      WHERE r.ret IS NOT NULL AND m.mr IS NOT NULL
    ), win AS (
      SELECT user_id, day,
             count(*) OVER w AS n,
             sum(mr) OVER w AS sx, sum(ret) OVER w AS sy,
             sum(mr * ret) OVER w AS sxy, sum(mr * mr) OVER w AS sxx
      FROM j
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    ), b AS (
      SELECT user_id, day, n, sx, sy,
             (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) AS beta
      FROM win WHERE n = 5
    ), o AS (
      SELECT user_id, day, n, beta,
             (sy - beta * sx) / n AS alpha
      FROM b
    )
    SELECT user_id, day, CAST(n AS BIGINT) AS n,
           (ROUND(beta - sign(beta) * 0.000000001, 6) + 0.0) AS beta,
           (ROUND(alpha - sign(alpha) * 0.000000001, 6) + 0.0) AS alpha
    FROM o
    """,
)
def f28_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = _daily(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("day")
    rets = daily.select(
        "user_id", "day",
        (
            F.col("close")
            / F.nullif(F.lag("close").over(wu), F.lit(0.0))
            - 1
        ).alias("ret"),
    )
    mkt = daily.groupBy("day").agg(F.avg("close").alias("mclose"))
    wm = Window.orderBy("day")
    mret = mkt.select(
        "day",
        (
            F.col("mclose")
            / F.nullif(F.lag("mclose").over(wm), F.lit(0.0))
            - 1
        ).alias("mr"),
    )
    j = (
        rets.join(F.broadcast(mret), "day")
        .filter(F.col("ret").isNotNull() & F.col("mr").isNotNull())
    )
    w5 = Window.partitionBy("user_id").orderBy("day").rowsBetween(-4, 0)
    win = j.select(
        "user_id", "day",
        F.count(F.lit(1)).over(w5).alias("n"),
        F.sum("mr").over(w5).alias("sx"),
        F.sum("ret").over(w5).alias("sy"),
        F.sum(F.col("mr") * F.col("ret")).over(w5).alias("sxy"),
        F.sum(F.col("mr") * F.col("mr")).over(w5).alias("sxx"),
    ).filter(F.col("n") == 5)
    b = win.select(
        "user_id", "day", "n", "sx", "sy",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(
                F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
                F.lit(0.0),
            )
        ).alias("beta"),
    )
    o = b.select(
        "user_id", "day", F.col("n").cast("bigint").alias("n"), "beta",
        ((F.col("sy") - F.col("beta") * F.col("sx")) / F.col("n")).alias(
            "alpha"
        ),
    )
    return o.select(
        "user_id", "day", "n",
        r6s("beta").alias("beta"), r6s("alpha").alias("alpha"),
    )


@register(
    "f29_max_drawdown",
    # Maximum drawdown (round 10) — the risk headline every equity
    # tear-sheet leads with: per user, the deepest peak-to-trough slide
    # of the daily close, draw_d = close_d / running_max(close) - 1,
    # max_drawdown = min(draw), trough = its (earliest) day. Running
    # max over an unbounded frame + one roll-up — both engines compute
    # draw from IDENTICAL doubles (running max is order-deterministic,
    # no float accumulation), so the argmin tie-break (draw, day) picks
    # the same trough. One window sort per user + one groupBy; no
    # self-joins.
    oracle=DAILY_CTE + """
    , dd AS (
      SELECT user_id, day,
             close / NULLIF(max(close) OVER (PARTITION BY user_id
                            ORDER BY day ROWS UNBOUNDED PRECEDING), 0)
               - 1 AS draw
      FROM daily
    ), r AS (
      SELECT user_id, day, draw,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY draw NULLS LAST, day) AS rn
      FROM dd
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_days,
           (ROUND(min(draw) - sign(min(draw)) * 0.000000001, 6) + 0.0)
             AS max_drawdown,
           max(CASE WHEN rn = 1 THEN day END) AS trough_day
    FROM r GROUP BY user_id
    """,
)
def f29_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = _daily(spark, sf_dir)
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = daily.select(
        "user_id", "day",
        (
            F.col("close")
            / F.nullif(F.max("close").over(wrun), F.lit(0.0))
            - 1
        ).alias("draw"),
    )
    # asc_nulls_last: Spark sorts NULLS FIRST by default where DuckDB
    # sorts NULLS LAST — draw is NULL iff the running max is exactly 0
    # (impossible on current fixtures, permitted by the schema), and a
    # NULL-first trough pick would diverge between engines there.
    wmin = Window.partitionBy("user_id").orderBy(
        F.col("draw").asc_nulls_last(), "day"
    )
    r = dd.withColumn("rn", F.row_number().over(wmin))
    g = r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min("draw").alias("_mdd"),
        F.max(F.when(F.col("rn") == 1, F.col("day"))).alias("trough_day"),
    )
    return g.select(
        "user_id", "n_days", r6s("_mdd").alias("max_drawdown"),
        "trough_day",
    )
