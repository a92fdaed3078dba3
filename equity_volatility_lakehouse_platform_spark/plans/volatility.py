"""Realized-volatility estimators and technical indicators — the
platform's namesake surface (SURVEY §0: the reference is an
equity-VOLATILITY lakehouse; §2.8's feature library stops at true
range / rolling std, so these extend it with the canonical OHLC
range-based estimators every vol desk derives from daily bars).

All three queries share one physical shape: the a01 daily-bar roll-up
(one groupBy shuffle), a narrow per-bar term projection (map stage,
codegen'd), then ONE window sort per user over ~250 rows/year/symbol.
At 100 TB the bar table is tiny relative to ticks (symbols x days), so
the window pass is never the bottleneck — the single ordered roll-up
shuffle is, exactly as in f20. Estimator math stays JVM-side (ln/mult/
sqrt); no UDFs anywhere.

Estimator references (public): Parkinson (1980), Garman-Klass (1980),
Rogers-Satchell (1991) — the standard range-based sigma^2-per-day
formulas, annualized by 252 trading days.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.plans.windows import _round_step
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table

# Embedded as repr'd double literals on BOTH sides so neither engine's
# ln(2) constant-folding can differ in the last ulp.
_4LN2 = repr(4.0 * math.log(2.0))          # Parkinson denominator
_GKC = repr(2.0 * math.log(2.0) - 1.0)     # Garman-Klass ln(C/O)^2 coeff
_ANN = "252.0"                             # trading days/year

# The shared daily-bar CTE (a01's ordered roll-up: pandas first/last
# become min_by/max_by keyed on ts — SURVEY §7.5). ``where`` lets the
# log-based estimators enforce the positive-price contract (f19's rule:
# the reference band function raises on price <= 0): sf0.1 carries a few
# value == 0.0 ticks, and DuckDB's ln(0) ERRORS where Spark yields NULL,
# so unguarded bars would diverge the engines at exactly one SF.
def _bars_sql(where: str = "") -> str:
    return f"""
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           arg_min(value, ts) AS open, max(value) AS high,
           min(value) AS low, arg_max(value, ts) AS close
    FROM events {where}
    GROUP BY user_id, date_trunc('day', ts)
"""


_BARS_SQL = _bars_sql()


def _bars(spark: SparkSession, sf_dir: str, positive: bool = False) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    if positive:
        # Pushes to the parquet scan (PushedFilters: [GreaterThan(value,0)]).
        ev = ev.filter(F.col("value") > 0)
    return ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
    )


def _day_window() -> Window:
    # day is a groupBy key -> unique per user: ordering is deterministic
    # with no tiebreak column needed.
    return Window.partitionBy("user_id").orderBy("day")


def _r6s_sql(x: str) -> str:
    return f"(ROUND(({x}) - sign({x}) * 0.000000001, 6) + 0.0)"


_W19_VOLS = [
    ("vol_parkinson", f"SQRT(GREATEST({_ANN} * (AVG(pk_t) OVER w) / {_4LN2}, 0.0))"),
    ("vol_gk", f"SQRT(GREATEST({_ANN} * (AVG(gk_t) OVER w), 0.0))"),
    ("vol_rs", f"SQRT(GREATEST({_ANN} * (AVG(rs_t) OVER w), 0.0))"),
]


@register(
    "w19_ohlc_vol_estimators",
    oracle=f"""
    WITH bars AS ({_bars_sql("WHERE value > 0")}),
    terms AS (
      SELECT user_id, day,
             ln(high / low) * ln(high / low) AS pk_t,
             0.5 * ln(high / low) * ln(high / low)
               - {_GKC} * ln(close / open) * ln(close / open) AS gk_t,
             ln(high / close) * ln(high / open)
               + ln(low / close) * ln(low / open) AS rs_t
      FROM bars
    )
    SELECT user_id, day,
           {", ".join(_r6s_sql(f"CASE WHEN count(*) OVER w = 20 THEN {expr} END") + f" AS {name}" for name, expr in _W19_VOLS)}
    FROM terms
    WINDOW w AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def w19_ohlc_vol_estimators(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rolling 20-day Parkinson / Garman-Klass / Rogers-Satchell realized
    # vol (annualized) from daily OHLC bars. Terms are computed ONCE per
    # bar in a separate projection (the two-step JIT-cliff discipline —
    # SCALE.md addendum 2), then averaged over one shared window frame.
    # GK's per-frame mean can go negative on pathological bars and FP
    # can push RS's mathematically-nonnegative mean to -epsilon, so both
    # engines clamp with GREATEST(x, 0) before SQRT: a tiny negative
    # rounds to vol 0 instead of diverging NULL-vs-0 at the 6dp gate.
    lhl = F.log(F.col("high") / F.col("low"))
    lco = F.log(F.col("close") / F.col("open"))
    terms = _bars(spark, sf_dir, positive=True).select(
        "user_id", "day",
        (lhl * lhl).alias("pk_t"),
        (F.lit(0.5) * lhl * lhl - F.lit(float(_GKC)) * lco * lco).alias("gk_t"),
        (
            F.log(F.col("high") / F.col("close")) * F.log(F.col("high") / F.col("open"))
            + F.log(F.col("low") / F.col("close")) * F.log(F.col("low") / F.col("open"))
        ).alias("rs_t"),
    )
    w = _day_window().rowsBetween(-19, 0)
    full = F.count(F.lit(1)).over(w) == 20
    ann, denom = F.lit(float(_ANN)), F.lit(float(_4LN2))

    def vol(term: str, scale: Column) -> Column:
        return F.when(full, F.sqrt(F.greatest(scale * F.avg(term).over(w), F.lit(0.0))))

    return _round_step(
        terms, ["user_id", "day"],
        [
            ("vol_parkinson", vol("pk_t", ann / denom), "r6s"),
            ("vol_gk", vol("gk_t", ann), "r6s"),
            ("vol_rs", vol("rs_t", ann), "r6s"),
        ],
    )


@register(
    "w20_rsi",
    oracle=f"""
    WITH bars AS ({_BARS_SQL}),
    d AS (
      SELECT user_id, day, close,
             close - lag(close) OVER (PARTITION BY user_id ORDER BY day) AS delta
      FROM bars
    ),
    gl AS (
      SELECT user_id, day, close,  delta,
             CASE WHEN delta > 0 THEN delta
                  WHEN delta IS NOT NULL THEN 0.0 END AS gain,
             CASE WHEN delta < 0 THEN -delta
                  WHEN delta IS NOT NULL THEN 0.0 END AS loss
      FROM d
    )
    SELECT user_id, day, (ROUND(close, 6) + 0.0) AS close,
           {_r6s_sql('''CASE WHEN count(delta) OVER w = 14 THEN
             100.0 * (AVG(gain) OVER w)
               / NULLIF((AVG(gain) OVER w) + (AVG(loss) OVER w), 0.0) END''')} AS rsi_14
    FROM gl
    WINDOW w AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    """,
)
def w20_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 14-period Cutler's RSI (SMA of gains vs losses — the SQL-exact
    # variant; Wilder's EWM recursion is the w11 applyInPandas shape).
    # The gate counts NON-NULL deltas so the first bar's undefined delta
    # keeps the first 14 frames in warm-up, matching pandas rolling(14)
    # over a diff(). 100*ag/(ag+al) avoids the 0-loss division blow-up:
    # all-gain frames read exactly 100, all-zero frames NULL via NULLIF.
    bars = _bars(spark, sf_dir)
    wseq = _day_window()
    d = bars.select(
        "user_id", "day", "close",
        (F.col("close") - F.lag("close").over(wseq)).alias("delta"),
    )
    gl = d.select(
        "user_id", "day", "close", "delta",
        F.when(F.col("delta") > 0, F.col("delta"))
        .when(F.col("delta").isNotNull(), F.lit(0.0)).alias("gain"),
        F.when(F.col("delta") < 0, -F.col("delta"))
        .when(F.col("delta").isNotNull(), F.lit(0.0)).alias("loss"),
    )
    w = wseq.rowsBetween(-13, 0)
    ag, al = F.avg("gain").over(w), F.avg("loss").over(w)
    rsi = F.when(
        F.count("delta").over(w) == 14,
        F.lit(100.0) * ag / F.nullif(ag + al, F.lit(0.0)),
    )
    return _round_step(
        gl, ["user_id", "day"],
        [("close", F.col("close"), "r6"), ("rsi_14", rsi, "r6s")],
    )


@register(
    "w21_bollinger_bands",
    oracle=f"""
    WITH bars AS ({_BARS_SQL}),
    st AS (
      SELECT user_id, day, close,
             CASE WHEN count(*) OVER w = 20 THEN AVG(close) OVER w END AS ma,
             CASE WHEN count(*) OVER w = 20 THEN stddev_samp(close) OVER w END AS sd
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    bb AS (
      SELECT user_id, day, close, ma,
             ma + 2.0 * sd AS bb_up, ma - 2.0 * sd AS bb_lo
      FROM st
    )
    SELECT user_id, day, (ROUND(close, 6) + 0.0) AS close,
           {_r6s_sql("ma")} AS ma_20,
           {_r6s_sql("bb_up")} AS bb_upper,
           {_r6s_sql("bb_lo")} AS bb_lower,
           {_r6s_sql("(close - bb_lo) / NULLIF(bb_up - bb_lo, 0.0)")} AS pct_b
    FROM bb
    """,
)
def w21_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 20-day Bollinger bands (SMA +- 2 sigma) and %B position. The band
    # arithmetic runs in a SECOND projection over the ma/sd window
    # outputs so each value is computed once (%B reuses bb_up/bb_lo by
    # reference — inlining the stddev tree 4x would cross the 8 KB
    # codegen cliff on wider variants of this query).
    bars = _bars(spark, sf_dir)
    w = _day_window().rowsBetween(-19, 0)
    full = F.count(F.lit(1)).over(w) == 20
    st = bars.select(
        "user_id", "day", "close",
        F.when(full, F.avg("close").over(w)).alias("ma"),
        F.when(full, F.stddev_samp("close").over(w)).alias("sd"),
    )
    bb = st.select(
        "user_id", "day", "close", "ma",
        (F.col("ma") + F.lit(2.0) * F.col("sd")).alias("bb_up"),
        (F.col("ma") - F.lit(2.0) * F.col("sd")).alias("bb_lo"),
    )
    pct_b = (F.col("close") - F.col("bb_lo")) / F.nullif(
        F.col("bb_up") - F.col("bb_lo"), F.lit(0.0)
    )
    return _round_step(
        bb, ["user_id", "day"],
        [
            ("close", F.col("close"), "r6"),
            ("ma_20", F.col("ma"), "r6s"),
            ("bb_upper", F.col("bb_up"), "r6s"),
            ("bb_lower", F.col("bb_lo"), "r6s"),
            ("pct_b", pct_b, "r6s"),
        ],
    )


@register(
    "w22_stochastic_oscillator",
    oracle=f"""
    WITH bars AS ({_BARS_SQL}),
    k AS (
      SELECT user_id, day, close,
             CASE WHEN count(*) OVER w = 14 THEN
               100.0 * (close - min(low) OVER w)
                 / NULLIF((max(high) OVER w) - (min(low) OVER w), 0.0) END AS pk
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, day, (ROUND(close, 6) + 0.0) AS close,
           {_r6s_sql("pk")} AS pct_k,
           {_r6s_sql("CASE WHEN count(pk) OVER w3 = 3 THEN AVG(pk) OVER w3 END")} AS pct_d
    FROM k
    WINDOW w3 AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def w22_stochastic_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 14-day stochastic %K (close position inside the rolling high-low
    # range) smoothed into %D by a 3-day SMA. Two window passes over the
    # SAME partition/order spec — Spark plans ONE exchange + ONE sort and
    # chains the frames, so the indicator costs the same single window
    # pass as any one of its inputs. %D averages the UNROUNDED %K (the
    # rounding projection stays last, per the two-step JIT discipline);
    # NULLIF guards flat 14-day ranges (ANSI mode: division by zero
    # throws, not NaNs).
    bars = _bars(spark, sf_dir)
    w14 = _day_window().rowsBetween(-13, 0)
    pk = F.when(
        F.count(F.lit(1)).over(w14) == 14,
        F.lit(100.0)
        * (F.col("close") - F.min("low").over(w14))
        / F.nullif(F.max("high").over(w14) - F.min("low").over(w14), F.lit(0.0)),
    )
    k = bars.select("user_id", "day", "close", pk.alias("pk"))
    w3 = _day_window().rowsBetween(-2, 0)
    pd_ = F.when(F.count("pk").over(w3) == 3, F.avg("pk").over(w3))
    return _round_step(
        k, ["user_id", "day"],
        [
            ("close", F.col("close"), "r6"),
            ("pct_k", F.col("pk"), "r6s"),
            ("pct_d", pd_, "r6s"),
        ],
    )


# MACD EWM constants: embedded as repr'd doubles on BOTH sides so the
# recursions run the identical IEEE ops (pandas computes (1-a)*y + a*x
# then divides by ((1-a)+a), which rounds to exactly 1.0 for these
# alphas — the w11 precedent, verified bit-exact there).
_A12 = 2.0 / 13.0
_A26 = 2.0 / 27.0
_A9 = 2.0 / 10.0


def _ema_sql(a: float, x: str, y: str) -> str:
    return f"{a!r} * {x} + {1.0 - a!r} * {y}"


@register(
    "w24_macd",
    # The three EMA recursions (12/26 on close, 9 on macd) ride ONE
    # recursive CTE carrying all accumulators; macd must be re-derived
    # inline in the recursive arm (SQL can't reference sibling aliases)
    # but the duplicated subtrees are the same doubles, so signal sees
    # the identical macd value pandas computes.
    oracle=f"""
    WITH RECURSIVE bars AS ({_BARS_SQL}),
    base AS (
      SELECT user_id, day, close,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM bars
    ), rec AS (
      SELECT user_id, day, rn,
             close AS ema12, close AS ema26, CAST(0.0 AS DOUBLE) AS sig
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.day, b.rn,
             {_ema_sql(_A12, "b.close", "rec.ema12")},
             {_ema_sql(_A26, "b.close", "rec.ema26")},
             {_ema_sql(_A9,
                       f"(({_ema_sql(_A12, 'b.close', 'rec.ema12')})"
                       f" - ({_ema_sql(_A26, 'b.close', 'rec.ema26')}))",
                       "rec.sig")}
      FROM base b JOIN rec ON b.user_id = rec.user_id AND b.rn = rec.rn + 1
    )
    SELECT user_id, day,
           (ROUND(ema12 - ema26, 6) + 0.0) AS macd,
           (ROUND(sig, 6) + 0.0) AS macd_signal,
           (ROUND((ema12 - ema26) - sig, 6) + 0.0) AS macd_hist
    FROM rec
    """,
)
def w24_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MACD(12, 26, 9) over daily bars: EMA recursions are the one shape
    # with no native Spark window expression (SURVEY §7.4, same as w11),
    # so all three run in ONE Arrow-batched grouped-map — one shuffle on
    # user_id, pandas ewm(adjust=False) inside, instead of three chained
    # applyInPandas passes. Per-key daily history (~250 rows/yr) fits an
    # executor task at any corpus scale; keys spread evenly.
    from pyspark.sql import types as T

    bars = _bars(spark, sf_dir)
    schema = T.StructType(
        [
            bars.schema["user_id"],
            bars.schema["day"],
            T.StructField("macd", T.DoubleType(), True),
            T.StructField("macd_signal", T.DoubleType(), True),
            T.StructField("macd_hist", T.DoubleType(), True),
        ]
    )

    def fn(pdf):
        pdf = pdf.sort_values("day")
        c = pdf["close"]
        ema12 = c.ewm(alpha=_A12, adjust=False).mean()
        ema26 = c.ewm(alpha=_A26, adjust=False).mean()
        macd = ema12 - ema26
        sig = macd.ewm(alpha=_A9, adjust=False).mean()
        out = pdf[["user_id", "day"]].copy()
        out["macd"] = macd
        out["macd_signal"] = sig
        out["macd_hist"] = macd - sig
        return out

    from equity_volatility_lakehouse_platform_spark.functions.rounding import r6

    res = bars.groupBy("user_id").applyInPandas(fn, schema=schema)
    return res.select(
        "user_id", "day",
        r6("macd").alias("macd"),
        r6("macd_signal").alias("macd_signal"),
        r6("macd_hist").alias("macd_hist"),
    )


@register(
    "w25_donchian_channels",
    oracle=f"""
    WITH bars AS ({_BARS_SQL}),
    ch AS (
      SELECT user_id, day, close,
             CASE WHEN count(*) OVER w = 20 THEN max(high) OVER w END AS dc_up,
             CASE WHEN count(*) OVER w = 20 THEN min(low) OVER w END AS dc_lo
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, day, (ROUND(close, 6) + 0.0) AS close,
           (ROUND(dc_up, 6) + 0.0) AS dc_upper,
           (ROUND(dc_lo, 6) + 0.0) AS dc_lower,
           {_r6s_sql("(dc_up + dc_lo) / 2.0")} AS dc_mid,
           {_r6s_sql("(close - dc_lo) / NULLIF(dc_up - dc_lo, 0.0)")} AS dc_pos
    FROM ch
    """,
)
def w25_donchian_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 20-day Donchian channels: rolling extreme bands + channel position.
    # Extremes are order-independent (max/min never drift), so the bands
    # round r6 bit-exact; only the derived ratios take the r6s nudge.
    # Same single-window physical shape as w21/w22.
    bars = _bars(spark, sf_dir)
    w = _day_window().rowsBetween(-19, 0)
    full = F.count(F.lit(1)).over(w) == 20
    ch = bars.select(
        "user_id", "day", "close",
        F.when(full, F.max("high").over(w)).alias("dc_up"),
        F.when(full, F.min("low").over(w)).alias("dc_lo"),
    )
    mid = (F.col("dc_up") + F.col("dc_lo")) / F.lit(2.0)
    pos = (F.col("close") - F.col("dc_lo")) / F.nullif(
        F.col("dc_up") - F.col("dc_lo"), F.lit(0.0)
    )
    return _round_step(
        ch, ["user_id", "day"],
        [
            ("close", F.col("close"), "r6"),
            ("dc_upper", F.col("dc_up"), "r6"),
            ("dc_lower", F.col("dc_lo"), "r6"),
            ("dc_mid", mid, "r6s"),
            ("dc_pos", pos, "r6s"),
        ],
    )


@register(
    "w26_rolling_sharpe",
    oracle=f"""
    WITH bars AS ({_BARS_SQL}),
    r AS (
      SELECT user_id, day,
             close / NULLIF(lag(close) OVER (PARTITION BY user_id ORDER BY day), 0.0)
               - 1.0 AS ret
      FROM bars
    )
    SELECT user_id, day,
           {_r6s_sql("ret")} AS ret,
           {_r6s_sql(f'''CASE WHEN count(ret) OVER w = 20 THEN
             sqrt({_ANN}) * (AVG(ret) OVER w)
               / NULLIF(stddev_samp(ret) OVER w, 0.0) END''')} AS sharpe_20
    FROM r
    WINDOW w AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def w26_rolling_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Annualized rolling 20-day Sharpe ratio (zero risk-free rate) over
    # daily close-to-close returns. The gate counts NON-NULL returns so
    # the first bar's undefined return keeps early frames in warm-up —
    # same discipline as w20's delta count. One roll-up shuffle + one
    # per-user sort shared by the lag and the frame.
    bars = _bars(spark, sf_dir)
    wseq = _day_window()
    r = bars.select(
        "user_id", "day",
        (
            F.col("close") / F.nullif(F.lag("close").over(wseq), F.lit(0.0))
            - F.lit(1.0)
        ).alias("ret"),
    )
    w = wseq.rowsBetween(-19, 0)
    sharpe = F.when(
        F.count("ret").over(w) == 20,
        F.sqrt(F.lit(float(_ANN)))
        * F.avg("ret").over(w)
        / F.nullif(F.stddev_samp("ret").over(w), F.lit(0.0)),
    )
    return _round_step(
        r, ["user_id", "day"],
        [("ret", F.col("ret"), "r6s"), ("sharpe_20", sharpe, "r6s")],
    )


@register(
    "w23_atr",
    oracle=f"""
    WITH bars AS ({_BARS_SQL}),
    pc AS (
      SELECT user_id, day, high, low, close,
             lag(close) OVER (PARTITION BY user_id ORDER BY day) AS prev_close
      FROM bars
    ),
    tr AS (
      SELECT user_id, day, close,
             CASE WHEN prev_close IS NULL THEN NULL
                  ELSE GREATEST(high - low, abs(high - prev_close),
                                abs(low - prev_close)) END AS true_range
      FROM pc
    )
    SELECT user_id, day, (ROUND(close, 6) + 0.0) AS close,
           (ROUND(true_range, 6) + 0.0) AS true_range,
           {_r6s_sql("CASE WHEN count(true_range) OVER w = 14 THEN AVG(true_range) OVER w END")} AS atr_14
    FROM tr
    WINDOW w AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    """,
)
def w23_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 14-day Average True Range — the windowed roll-up of f17's per-bar
    # true range (SMA variant; Wilder's EWM recursion is the w11
    # applyInPandas shape). The gap-aware range needs the PREVIOUS
    # close, so the first bar per user has no true range and the gate
    # counts non-null ranges (14 full ranges -> bar 15 onward). Same
    # bars -> lag -> window physical shape as w20: one roll-up shuffle,
    # one per-user sort shared by the lag and the frame.
    bars = _bars(spark, sf_dir)
    wseq = _day_window()
    pc = bars.select(
        "user_id", "day", "high", "low", "close",
        F.lag("close").over(wseq).alias("prev_close"),
    )
    tr = F.when(
        F.col("prev_close").isNotNull(),
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - F.col("prev_close")),
            F.abs(F.col("low") - F.col("prev_close")),
        ),
    )
    trd = pc.select("user_id", "day", "close", tr.alias("true_range"))
    w = wseq.rowsBetween(-13, 0)
    atr = F.when(
        F.count("true_range").over(w) == 14, F.avg("true_range").over(w)
    )
    return _round_step(
        trd, ["user_id", "day"],
        [
            ("close", F.col("close"), "r6"),
            ("true_range", F.col("true_range"), "r6"),
            ("atr_14", atr, "r6s"),
        ],
    )


_A20 = 2.0 / 21.0  # EMA(20) smoothing for the Keltner midline


@register(
    "w27_keltner_channels",
    # Midline: EMA(20) of typical price (recursive -> recursive-CTE
    # oracle, the w24 pattern). Bands: +- 2 x ATR(10) (SMA variant).
    # ATR window means take the r6s nudge (Spark's sliding frame
    # add/removes where DuckDB's segment tree re-aggregates, so the
    # frame sums can differ in the last ulp); the EMA recursion itself
    # is bit-identical and the midline rounds r6.
    oracle=f"""
    WITH RECURSIVE bars AS ({_BARS_SQL}),
    pc AS (
      SELECT user_id, day, high, low, close,
             (high + low + close) / 3.0 AS tp,
             lag(close) OVER (PARTITION BY user_id ORDER BY day) AS prev_close
      FROM bars
    ), tr AS (
      SELECT user_id, day, tp,
             CASE WHEN prev_close IS NULL THEN NULL
                  ELSE GREATEST(high - low, abs(high - prev_close),
                                abs(low - prev_close)) END AS true_range
      FROM pc
    ), atr AS (
      SELECT user_id, day, tp,
             CASE WHEN count(true_range) OVER w = 10
                  THEN AVG(true_range) OVER w END AS atr_10
      FROM tr
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    ), base AS (
      SELECT user_id, day, tp, atr_10,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM atr
    ), rec AS (
      SELECT user_id, day, rn, atr_10, tp AS ema
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.day, b.rn, b.atr_10,
             {_ema_sql(_A20, "b.tp", "rec.ema")}
      FROM base b JOIN rec ON b.user_id = rec.user_id AND b.rn = rec.rn + 1
    )
    SELECT user_id, day,
           (ROUND(ema, 6) + 0.0) AS kc_mid,
           (ROUND((ema + 2.0 * atr_10)
                  - sign(ema + 2.0 * atr_10) * 0.000000001, 6) + 0.0)
             AS kc_upper,
           (ROUND((ema - 2.0 * atr_10)
                  - sign(ema - 2.0 * atr_10) * 0.000000001, 6) + 0.0)
             AS kc_lower
    FROM rec
    """,
)
def w27_keltner_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Composition of both indicator machineries: the windowed ATR rides
    # the bar roll-up's partitioning (one shuffle + one per-user sort),
    # then ONE grouped-map pass adds the EMA midline — the applyInPandas
    # shuffle re-keys on user_id only; every other stage is JVM-side.
    from pyspark.sql import types as T

    bars = _bars(spark, sf_dir)
    wseq = _day_window()
    pc = bars.select(
        "user_id", "day", "high", "low", "close",
        ((F.col("high") + F.col("low") + F.col("close")) / F.lit(3.0)).alias("tp"),
        F.lag("close").over(wseq).alias("prev_close"),
    )
    tr = F.when(
        F.col("prev_close").isNotNull(),
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - F.col("prev_close")),
            F.abs(F.col("low") - F.col("prev_close")),
        ),
    )
    trd = pc.select("user_id", "day", "tp", tr.alias("true_range"))
    w10 = wseq.rowsBetween(-9, 0)
    atr = trd.select(
        "user_id", "day", "tp",
        F.when(
            F.count("true_range").over(w10) == 10,
            F.avg("true_range").over(w10),
        ).alias("atr_10"),
    )
    schema = T.StructType(
        [
            atr.schema["user_id"],
            atr.schema["day"],
            T.StructField("atr_10", T.DoubleType(), True),
            T.StructField("ema", T.DoubleType(), True),
        ]
    )

    def fn(pdf):
        pdf = pdf.sort_values("day")
        out = pdf[["user_id", "day", "atr_10"]].copy()
        out["ema"] = pdf["tp"].ewm(alpha=_A20, adjust=False).mean()
        return out

    from equity_volatility_lakehouse_platform_spark.functions.rounding import r6, r6s

    res = atr.groupBy("user_id").applyInPandas(fn, schema=schema)
    return res.select(
        "user_id", "day",
        r6("ema").alias("kc_mid"),
        r6s(F.col("ema") + F.lit(2.0) * F.col("atr_10")).alias("kc_upper"),
        r6s(F.col("ema") - F.lit(2.0) * F.col("atr_10")).alias("kc_lower"),
    )


@register(
    "f22_overnight_intraday_split",
    # Return decomposition: the day's log return splits EXACTLY into the
    # overnight gap (prev close -> open) plus the intraday move (open ->
    # close) — ln telescopes, so r_on + r_id == r_cc bit-for-bit only up
    # to FP; each term is computed independently on both engines from
    # identical bars, so all three columns agree exactly.
    oracle=f"""
    WITH bars AS ({_bars_sql("WHERE value > 0")}),
    seq AS (
      SELECT user_id, day, open, close,
             lag(close) OVER (PARTITION BY user_id ORDER BY day) AS prev_close
      FROM bars
    )
    SELECT user_id, day,
           {_r6s_sql("ln(open / prev_close)")} AS r_overnight,
           {_r6s_sql("ln(close / open)")} AS r_intraday,
           {_r6s_sql("ln(close / prev_close)")} AS r_close_close
    FROM seq
    """,
)
def f22_overnight_intraday_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The vol-desk attribution primitive (is variance earned overnight
    # or intraday?): same bar->lag physical shape as w20/w23 — one
    # roll-up shuffle, one per-user sort; positive-price guard pushes to
    # the scan (DuckDB ln(0) errors where Spark nulls, the w19 rule).
    bars = _bars(spark, sf_dir, positive=True)
    seq = bars.select(
        "user_id", "day", "open", "close",
        F.lag("close").over(_day_window()).alias("prev_close"),
    )
    return _round_step(
        seq, ["user_id", "day"],
        [
            ("r_overnight", F.log(F.col("open") / F.col("prev_close")), "r6s"),
            ("r_intraday", F.log(F.col("close") / F.col("open")), "r6s"),
            ("r_close_close", F.log(F.col("close") / F.col("prev_close")), "r6s"),
        ],
    )


_LAMBDA = 0.94  # RiskMetrics decay


@register(
    "w30_riskmetrics_ewma_vol",
    # RiskMetrics EWMA variance: sigma2_t = L*sigma2_{t-1} + (1-L)*r_t^2
    # seeded with the first squared return — THE industry-standard daily
    # vol recursion (J.P. Morgan RiskMetrics 1996, lambda = 0.94).
    # Recursive like w11/w24, so: grouped-map on the Spark side,
    # recursive CTE on the oracle side, identical IEEE ops throughout.
    oracle=f"""
    WITH RECURSIVE bars AS ({_bars_sql("WHERE value > 0")}),
    r AS (
      SELECT user_id, day,
             ln(close / lag(close) OVER (PARTITION BY user_id ORDER BY day))
               AS lr
      FROM bars
    ), base AS (
      SELECT user_id, day, lr * lr AS r2,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM r WHERE lr IS NOT NULL
    ), rec AS (
      SELECT user_id, day, rn, r2 AS s2 FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.day, b.rn,
             {_LAMBDA!r} * rec.s2 + {1.0 - _LAMBDA!r} * b.r2
      FROM base b JOIN rec ON b.user_id = rec.user_id AND b.rn = rec.rn + 1
    )
    SELECT user_id, day,
           (ROUND(sqrt(s2 * {_ANN}), 6) + 0.0) AS ewma_vol_ann
    FROM rec
    """,
)
def w30_riskmetrics_ewma_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One bar roll-up shuffle -> per-user lag -> ONE grouped-map running
    # the recursion (pandas ewm(alpha=1-lambda, adjust=False) over
    # squared log returns reproduces it exactly: identical multiply-add
    # per step, w11's precedent). The warm-up row (first return) seeds
    # the state, matching the CTE's base case.
    from pyspark.sql import types as T

    bars = _bars(spark, sf_dir, positive=True)
    wseq = _day_window()
    r = bars.select(
        "user_id", "day",
        F.log(F.col("close") / F.lag("close").over(wseq)).alias("lr"),
    ).filter(F.col("lr").isNotNull())
    base = r.select(
        "user_id", "day", (F.col("lr") * F.col("lr")).alias("r2")
    )
    schema = T.StructType(
        [
            base.schema["user_id"],
            base.schema["day"],
            T.StructField("s2", T.DoubleType(), True),
        ]
    )

    def fn(pdf):
        pdf = pdf.sort_values("day")
        out = pdf[["user_id", "day"]].copy()
        out["s2"] = pdf["r2"].ewm(alpha=1.0 - _LAMBDA, adjust=False).mean()
        return out

    from equity_volatility_lakehouse_platform_spark.functions.rounding import r6

    res = base.groupBy("user_id").applyInPandas(fn, schema=schema)
    return res.select(
        "user_id", "day",
        r6(F.sqrt(F.col("s2") * F.lit(float(_ANN)))).alias("ewma_vol_ann"),
    )


@register(
    "w31_drawdown_duration",
    # Drawdown depth AND age: percent below the running peak plus days
    # since that peak was set (w15 gives the depth; desks also need the
    # duration). Peak identification is exact: a row is a peak iff its
    # close EQUALS its own running max (identical doubles on both
    # engines), and the governing peak is the LATEST such row at or
    # before the current one.
    oracle=f"""
    WITH bars AS ({_BARS_SQL}),
    rm AS (
      SELECT user_id, day, close,
             max(close) OVER w AS runmax
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, day,
           {_r6s_sql("close / NULLIF(runmax, 0.0) - 1.0")} AS drawdown,
           CAST(date_diff('day',
                  max(CASE WHEN close = runmax THEN day END) OVER w, day)
                AS BIGINT) AS dd_days
    FROM rm
    WINDOW w AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def w31_drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two chained window passes over the SAME partition/order spec (one
    # exchange, one sort): pass 1 materializes the running max, pass 2
    # takes the latest peak day (max over the frame of peak-row days).
    # NULLIF guards an all-zero-price prefix (sf0.1 carries value == 0.0
    # ticks; ANSI division by zero THROWS rather than NaNs).
    bars = _bars(spark, sf_dir)
    w = _day_window().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rm = bars.select(
        "user_id", "day", "close", F.max("close").over(w).alias("runmax")
    )
    peak_day = F.max(
        F.when(F.col("close") == F.col("runmax"), F.col("day"))
    ).over(w)
    staged = rm.select(
        "user_id", "day",
        (
            F.col("close") / F.nullif(F.col("runmax"), F.lit(0.0))
            - F.lit(1.0)
        ).alias("_dd"),
        F.datediff(F.col("day"), peak_day).cast("bigint").alias("dd_days"),
    )
    from equity_volatility_lakehouse_platform_spark.functions.rounding import r6s

    return staged.select(
        "user_id", "day", r6s("_dd").alias("drawdown"), "dd_days"
    )


@register(
    "w33_variance_ratio",
    # Lo-MacKinlay variance-ratio test statistic VR(5): the variance of
    # overlapping 5-day log-returns over 5x the 1-day variance — the
    # canonical random-walk diagnostic (VR=1 under iid returns; <1 mean
    # reversion, >1 momentum). One physical chain: a01 bar roll-up
    # shuffle -> ONE per-user window sort (both lags share it) -> final
    # per-user aggregate that REUSES the user_id partitioning (no new
    # exchange). var_samp accumulates in engine-specific order -> both
    # the variances and the ratio take the nudged round.
    oracle=f"""
    WITH bars AS ({_bars_sql("WHERE value > 0")}),
    rets AS (
      SELECT user_id,
             ln(close / lag(close) OVER w)    AS r1,
             ln(close / lag(close, 5) OVER w) AS r5
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    )
    SELECT user_id,
           CAST(count(r1) AS BIGINT) AS n_rets,
           {_r6s_sql("var_samp(r5) / NULLIF(5.0 * var_samp(r1), 0)")} AS vr_5
    FROM rets GROUP BY user_id
    """,
)
def w33_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars(spark, sf_dir, positive=True)
    w = _day_window()
    rets = bars.select(
        "user_id",
        F.log(F.col("close") / F.lag("close", 1).over(w)).alias("r1"),
        F.log(F.col("close") / F.lag("close", 5).over(w)).alias("r5"),
    )
    from equity_volatility_lakehouse_platform_spark.functions.rounding import r6s

    return rets.groupBy("user_id").agg(
        F.count("r1").alias("n_rets"),
        r6s(
            F.var_samp("r5") / F.nullif(F.lit(5.0) * F.var_samp("r1"), F.lit(0.0))
        ).alias("vr_5"),
    )


@register(
    "w34_return_acf",
    # Per-user autocorrelation function of daily log-returns at lags
    # 1/2/5 — the serial-dependence diagnostic read next to VR (w33).
    # corr() is the same Pearson definition on both engines and skips
    # null pairs identically (warm-up lags), so the only cross-engine
    # hazard is accumulation order -> nudged rounds. Same two-exchange
    # physical chain as w33.
    oracle=f"""
    WITH bars AS ({_bars_sql("WHERE value > 0")}),
    rets AS (
      SELECT user_id, day, ln(close / lag(close) OVER w) AS r
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ),
    lagged AS (
      SELECT user_id, r,
             lag(r)    OVER w AS r_1,
             lag(r, 2) OVER w AS r_2,
             lag(r, 5) OVER w AS r_5
      FROM rets
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    )
    SELECT user_id,
           CAST(count(r) AS BIGINT) AS n_rets,
           {_r6s_sql("corr(r, r_1)")} AS acf_1,
           {_r6s_sql("corr(r, r_2)")} AS acf_2,
           {_r6s_sql("corr(r, r_5)")} AS acf_5
    FROM lagged GROUP BY user_id
    """,
)
def w34_return_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars(spark, sf_dir, positive=True)
    w = _day_window()
    rets = bars.select(
        "user_id", "day",
        F.log(F.col("close") / F.lag("close", 1).over(w)).alias("r"),
    )
    lagged = rets.select(
        "user_id",
        "r",
        F.lag("r", 1).over(w).alias("r_1"),
        F.lag("r", 2).over(w).alias("r_2"),
        F.lag("r", 5).over(w).alias("r_5"),
    )
    from equity_volatility_lakehouse_platform_spark.functions.rounding import r6s

    return lagged.groupBy("user_id").agg(
        F.count("r").alias("n_rets"),
        r6s(F.corr("r", "r_1")).alias("acf_1"),
        r6s(F.corr("r", "r_2")).alias("acf_2"),
        r6s(F.corr("r", "r_5")).alias("acf_5"),
    )


@register(
    "w35_mean_reversion_half_life",
    # Ornstein-Uhlenbeck half-life of mean reversion per user — the
    # stat-arb holding-period estimate: fit the AR(1) drift
    # dp_t = alpha + beta * p_{t-1} + eps by closed-form OLS
    # (beta = cov(dp, p_lag) / var(p_lag)) on daily log closes, then
    # half_life = -ln(2) / ln(1 + beta) for mean-reverting users
    # (0 < 1 + beta < 1 guarded to the valid log domain; trending or
    # degenerate series yield NULL rather than a fake number). Same
    # two-exchange chain as w33/w34; covar_samp/var_samp accumulate in
    # engine order -> every continuous output takes the nudged round.
    oracle=f"""
    WITH bars AS ({_bars_sql("WHERE value > 0")}),
    series AS (
      SELECT user_id,
             ln(close)              AS p,
             lag(ln(close)) OVER w  AS p_lag
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ), fit AS (
      SELECT user_id,
             CAST(count(p_lag) AS BIGINT) AS n_obs,
             covar_samp(p - p_lag, p_lag) / NULLIF(var_samp(p_lag), 0) AS beta
      FROM series WHERE p_lag IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, n_obs,
           {_r6s_sql("beta")} AS ar1_beta,
           {_r6s_sql(
               "CASE WHEN beta > -1 AND beta < 0 "
               "THEN -ln(2.0) / ln(1.0 + beta) END")} AS half_life_days
    FROM fit
    """,
)
def w35_mean_reversion_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    from equity_volatility_lakehouse_platform_spark.functions.rounding import r6s

    bars = _bars(spark, sf_dir, positive=True)
    w = _day_window()
    series = bars.select(
        "user_id",
        F.log("close").alias("p"),
        F.lag(F.log("close")).over(w).alias("p_lag"),
    ).filter(F.col("p_lag").isNotNull())
    fit = series.groupBy("user_id").agg(
        F.count("p_lag").alias("n_obs"),
        (
            F.covar_samp(F.col("p") - F.col("p_lag"), F.col("p_lag"))
            / F.nullif(F.var_samp("p_lag"), F.lit(0.0))
        ).alias("beta"),
    )
    import math

    return fit.select(
        "user_id",
        "n_obs",
        r6s(F.col("beta")).alias("ar1_beta"),
        r6s(
            F.when(
                (F.col("beta") > -1) & (F.col("beta") < 0),
                F.lit(-math.log(2.0)) / F.log(F.lit(1.0) + F.col("beta")),
            )
        ).alias("half_life_days"),
    )


_PI2 = repr(math.pi / 2.0)  # bipower scaling mu1^-2 = pi/2


@register(
    "w36_bipower_jump",
    # Realized variance vs bipower variation — the Barndorff-Nielsen &
    # Shephard (2004) jump decomposition, THE intraday complement to the
    # daily range estimators (w19): RV = sum r_i^2 converges to
    # integrated variance PLUS squared jumps, BV = (pi/2) sum
    # |r_i||r_{i-1}| to integrated variance ONLY, so max(RV - BV, 0) is
    # the day's jump contribution and its share of RV flags jump days.
    # Per (user, day) over the intraday tick returns, days with >= 4
    # positive-price ticks (>= 3 returns, the minimum that gives BV two
    # bipower terms). Every floating sum is an ORDERED left fold over
    # the tick sequence (by ts, event_id) — list_reduce in DuckDB,
    # aggregate() on the sorted collect_list in Spark — so RV/BV are
    # bit-identical cross-engine; ln/division inputs are identical
    # doubles and the outputs take the nudged round (w19's rule).
    # Scale: one groupBy shuffle on (user, day); per-day tick arrays are
    # bounded by the trading day, so the fold is O(ticks/day) per group
    # — no window, no self-join.
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             ts, event_id, value
      FROM events WHERE value > 0
    ), g AS (
      SELECT user_id, day,
             list(value ORDER BY ts, event_id) AS vals,
             count(*) AS n_ticks
      FROM e GROUP BY user_id, day
    ), f AS (
      SELECT user_id, day,
             list_transform(range(2, len(vals) + 1),
                            i -> ln(vals[i] / vals[i-1])) AS rs
      FROM g WHERE n_ticks >= 4
    ), agg AS (
      SELECT user_id, day, len(rs) AS n_ret,
             list_reduce(list_transform(rs, r -> r * r),
                         (acc, x) -> acc + x) AS rv,
             {_PI2} * list_reduce(
                 list_transform(range(2, len(rs) + 1),
                                i -> abs(rs[i]) * abs(rs[i-1])),
                 (acc, x) -> acc + x) AS bv
      FROM f
    ), j AS (
      SELECT user_id, day, n_ret, rv, bv,
             greatest(rv - bv, 0.0) AS jv,
             greatest(rv - bv, 0.0) / NULLIF(rv, 0) AS js
      FROM agg
    )
    SELECT user_id, day, CAST(n_ret AS BIGINT) AS n_ret,
           {_r6s_sql("rv")} AS rv,
           {_r6s_sql("bv")} AS bv,
           {_r6s_sql("jv")} AS jump_var,
           {_r6s_sql("js")} AS jump_share
    FROM j
    """,
)
def w36_bipower_jump(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value") > 0)  # pushes to the scan (w19's guard)
        .select("user_id", F.date_trunc("day", "ts").alias("day"),
                "ts", "event_id", "value")
    )
    g = ev.groupBy("user_id", "day").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("lst"),
        F.count(F.lit(1)).alias("n_ticks"),
    ).filter(F.col("n_ticks") >= 4)
    # Layered projections (w08's rule): vals once, returns once, folds
    # once, rounds over plain refs.
    vals = g.select(
        "user_id", "day",
        F.expr("transform(lst, e -> e.value)").alias("vals"),
    )
    rets = vals.select(
        "user_id", "day",
        F.expr(
            "transform(sequence(2, size(vals)),"
            " i -> ln(element_at(vals, i) / element_at(vals, i - 1)))"
        ).alias("rs"),
    )
    folds = rets.select(
        "user_id", "day",
        F.size("rs").cast("bigint").alias("n_ret"),
        F.expr(
            "aggregate(transform(rs, r -> r * r), 0D, (acc, x) -> acc + x)"
        ).alias("rv"),
        F.expr(
            f"{_PI2}D * aggregate("
            "  transform(sequence(2, size(rs)),"
            "            i -> abs(element_at(rs, i))"
            "                 * abs(element_at(rs, i - 1))),"
            "  0D, (acc, x) -> acc + x)"
        ).alias("bv"),
    )
    return _round_step(
        folds.withColumn("jv", F.greatest(F.col("rv") - F.col("bv"), F.lit(0.0)))
        .withColumn("js", F.col("jv") / F.nullif(F.col("rv"), F.lit(0.0))),
        ["user_id", "day", "n_ret"],
        [
            ("rv", F.col("rv"), "r6s"),
            ("bv", F.col("bv"), "r6s"),
            ("jump_var", F.col("jv"), "r6s"),
            ("jump_share", F.col("js"), "r6s"),
        ],
    )


@register(
    "w38_realized_semivariance",
    # Realized semivariance + signed jump variation (round 10) —
    # Barndorff-Nielsen, Kinnebrock & Shephard (2008), the DIRECTIONAL
    # refinement of w36's jump decomposition: RS+ = sum r^2 over
    # positive returns converges to half the integrated variance plus
    # the POSITIVE jumps' contribution, RS- likewise for negative, so
    # their difference (the signed jump variation) tells crash days
    # from melt-up days where w36's RV - BV cannot. Same fixture
    # contract as w36 (per (user, day) tick returns, >= 4 positive-
    # price ticks) and the same cross-engine devices: ordered left
    # folds over the (ts, event_id)-sorted return sequence — the
    # conditional r^2 terms fold IN SEQUENCE with zeros for the
    # non-matching sign, so Spark and DuckDB sum the identical float
    # series — and nudge-rounded ratio outputs. One groupBy shuffle,
    # day-bounded arrays, no window.
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             ts, event_id, value
      FROM events WHERE value > 0
    ), g AS (
      SELECT user_id, day,
             list(value ORDER BY ts, event_id) AS vals,
             count(*) AS n_ticks
      FROM e GROUP BY user_id, day
    ), f AS (
      SELECT user_id, day,
             list_transform(range(2, len(vals) + 1),
                            i -> ln(vals[i] / vals[i-1])) AS rs
      FROM g WHERE n_ticks >= 4
    ), agg AS (
      SELECT user_id, day, len(rs) AS n_ret,
             list_reduce(list_transform(rs, r -> r * r),
                         (acc, x) -> acc + x) AS rv,
             list_reduce(list_transform(rs,
                         r -> CASE WHEN r > 0 THEN r * r ELSE 0.0 END),
                         (acc, x) -> acc + x) AS rs_up,
             list_reduce(list_transform(rs,
                         r -> CASE WHEN r < 0 THEN r * r ELSE 0.0 END),
                         (acc, x) -> acc + x) AS rs_down
      FROM f
    )
    SELECT user_id, day, CAST(n_ret AS BIGINT) AS n_ret,
           {_r6s_sql("rv")} AS rv,
           {_r6s_sql("rs_up")} AS rs_up,
           {_r6s_sql("rs_down")} AS rs_down,
           {_r6s_sql("rs_up - rs_down")} AS signed_jump,
           {_r6s_sql("(rs_up - rs_down) / NULLIF(rv, 0)")}
             AS signed_jump_share
    FROM agg
    """,
)
def w38_realized_semivariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .select("user_id", F.date_trunc("day", "ts").alias("day"),
                "ts", "event_id", "value")
    )
    g = ev.groupBy("user_id", "day").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("lst"),
        F.count(F.lit(1)).alias("n_ticks"),
    ).filter(F.col("n_ticks") >= 4)
    vals = g.select(
        "user_id", "day",
        F.expr("transform(lst, e -> e.value)").alias("vals"),
    )
    rets = vals.select(
        "user_id", "day",
        F.expr(
            "transform(sequence(2, size(vals)),"
            " i -> ln(element_at(vals, i) / element_at(vals, i - 1)))"
        ).alias("rs"),
    )
    folds = rets.select(
        "user_id", "day",
        F.size("rs").cast("bigint").alias("n_ret"),
        F.expr(
            "aggregate(transform(rs, r -> r * r), 0D, (acc, x) -> acc + x)"
        ).alias("rv"),
        F.expr(
            "aggregate(transform(rs, r -> if(r > 0D, r * r, 0D)),"
            " 0D, (acc, x) -> acc + x)"
        ).alias("rs_up"),
        F.expr(
            "aggregate(transform(rs, r -> if(r < 0D, r * r, 0D)),"
            " 0D, (acc, x) -> acc + x)"
        ).alias("rs_down"),
    )
    return _round_step(
        folds,
        ["user_id", "day", "n_ret"],
        [
            ("rv", F.col("rv"), "r6s"),
            ("rs_up", F.col("rs_up"), "r6s"),
            ("rs_down", F.col("rs_down"), "r6s"),
            ("signed_jump", F.col("rs_up") - F.col("rs_down"), "r6s"),
            (
                "signed_jump_share",
                (F.col("rs_up") - F.col("rs_down"))
                / F.nullif(F.col("rv"), F.lit(0.0)),
                "r6s",
            ),
        ],
    )


@register(
    "w41_garch_forecast",
    # GARCH(1,1) one-step variance forecast (round 10, Bollerslev 1986)
    # — the conditional-volatility workhorse next to the realized
    # family (w19/w36/w38): h_t = omega + alpha * r_{t-1}^2 +
    # beta * h_{t-1} recursed over each user's DAILY log-return
    # sequence with fixed textbook parameters (alpha 0.1, beta 0.85,
    # omega 5e-6 => long-run variance 1e-4, seeded at h_0 = the
    # long-run level — all EXPLICIT double literals on both sides so no
    # engine constant-folds differently). The recursion is ONE ordered
    # left fold per user (aggregate with h_0 init in Spark ==
    # list_reduce over the h_0-prepended list in DuckDB — the identical
    # operation sequence), so the forecast is bit-exact cross-engine.
    # One groupBy shuffle; day-bounded arrays; no window, no Python.
    oracle=f"""
    WITH bars AS ({_bars_sql("WHERE value > 0")}
    ), g AS (
      SELECT user_id, list(close ORDER BY day) AS vals
      FROM bars GROUP BY user_id
    ), f AS (
      SELECT user_id, len(vals) AS n_days,
             list_transform(range(2, len(vals) + 1),
                            i -> ln(vals[i] / vals[i-1])) AS rs
      FROM g WHERE len(vals) >= 2
    ), h AS (
      SELECT user_id, n_days,
             list_reduce(
               list_prepend(CAST(0.0001 AS DOUBLE),
                            list_transform(rs, r -> r * r)),
               (acc, x) -> 0.000005 + 0.1 * x + 0.85 * acc) AS hn
      FROM f
    )
    SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
           {_r6s_sql("hn")} AS h_next,
           {_r6s_sql("sqrt(hn)")} AS sigma_next
    FROM h
    """,
)
def w41_garch_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars(spark, sf_dir, positive=True)
    g = bars.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("day", "close"))).alias("lst"),
    )
    vals = g.select(
        "user_id", F.expr("transform(lst, e -> e.close)").alias("vals")
    ).filter(F.size("vals") >= 2)
    f = vals.select(
        "user_id",
        F.size("vals").cast("bigint").alias("n_days"),
        F.expr(
            "transform(sequence(2, size(vals)),"
            " i -> ln(element_at(vals, i) / element_at(vals, i - 1)))"
        ).alias("rs"),
    )
    h = f.select(
        "user_id", "n_days",
        F.expr(
            "aggregate(transform(rs, r -> r * r), 0.0001D,"
            " (acc, x) -> 0.000005D + 0.1D * x + 0.85D * acc)"
        ).alias("hn"),
    )
    from equity_volatility_lakehouse_platform_spark.functions.rounding import r6s

    return h.select(
        "user_id", "n_days",
        r6s("hn").alias("h_next"),
        r6s(F.sqrt("hn")).alias("sigma_next"),
    )
