"""Window-function queries (SURVEY.md §2.5 W1-W13) over the events stream.

The reference's window surface (ffill/bfill, lag ladders, rolling stats,
EWM, cumcount, day-boundary resets) re-expressed as Spark window specs.
One shared spec ``partitionBy(user_id).orderBy(ts, event_id)`` serves all
of them — a single shuffle + sort per partition key, exactly the physical
shape SURVEY §4 calls for (the reference reuses one window spec the same
way in Procesamiento_fase_2.ipynb cell 6).

``event_id`` is in the ordering as a tiebreak: Spark and any oracle engine
must agree on row order for lag/row_number to be deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table
from equity_volatility_lakehouse_platform_spark.functions.rounding import r6

def _w_key():
    """The one shared per-key ordered window (SURVEY §4 physical notes).
    Built lazily — Window specs need an active SparkSession."""
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


def _r6(col):
    return r6(col)


def _r6s(col):
    """Nudged 6dp round (functions/rounding.r6s): r6 is bit-identical to
    DuckDB ROUND, so the 1e-9 toward-zero nudge now exists to absorb
    sub-1e-9 summation-order drift in aggregated INPUTS (the engines may
    feed the round 1-ulp-different sums near a .5 boundary). Oracle
    mirror: (ROUND(x - sign(x) * 0.000000001, 6) + 0.0)."""
    return r6(col - F.signum(col) * F.lit(1e-9))


@register(
    "w01_forward_fill",
    oracle="""
    SELECT event_id, user_id, ts,
           (ROUND(last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) + 0.0) AS value_ffill
    FROM events
    """,
)
def w01_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1 forward fill: F.last(col, ignorenulls=True) over unbounded-preceding
    # (fase_1.ipynb:241 cell 16). 'error' rows act as the gaps to fill.
    ev = load_table(spark, sf_dir, "events")
    gappy = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        _r6(
            F.last(gappy, ignorenulls=True).over(
                _w_key().rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("value_ffill"),
    )


@register(
    "w02_backward_fill",
    oracle="""
    SELECT event_id, user_id, ts,
           (ROUND(COALESCE(
             last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             first_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           ), 6) + 0.0) AS value_filled
    FROM events
    """,
)
def w02_backward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W2 bfill + ffill-then-bfill coalesce (fase_1.ipynb:257 cell 17).
    ev = load_table(spark, sf_dir, "events")
    gappy = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    ffill = F.last(gappy, ignorenulls=True).over(
        _w_key().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bfill = F.first(gappy, ignorenulls=True).over(
        _w_key().rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id", "user_id", "ts", _r6(F.coalesce(ffill, bfill)).alias("value_filled")
    )


@register(
    "w03_lag_gap",
    oracle="""
    SELECT event_id, user_id, ts,
           (ROUND((value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                 / NULLIF(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0)
                 * 100, 6) + 0.0) AS gap_pct
    FROM events
    """,
)
def w03_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W3 prev-close gap: (open - lag(close))/lag(close)*100 (fase_2.ipynb:97).
    ev = load_table(spark, sf_dir, "events")
    prev = F.lag("value").over(_w_key())
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        _r6((F.col("value") - prev) / F.nullif(prev, F.lit(0.0)) * 100).alias("gap_pct"),
    )


@register(
    "w04_lag_ladder",
    oracle="""
    SELECT event_id, user_id,
           (ROUND(value / NULLIF(lag(value, 1)  OVER w, 0) - 1
                 - sign(value / NULLIF(lag(value, 1)  OVER w, 0) - 1) * 0.000000001, 6) + 0.0) AS pct_change_1,
           (ROUND(value / NULLIF(lag(value, 8)  OVER w, 0) - 1
                 - sign(value / NULLIF(lag(value, 8)  OVER w, 0) - 1) * 0.000000001, 6) + 0.0) AS pct_change_8,
           (ROUND(value / NULLIF(lag(value, 32) OVER w, 0) - 1
                 - sign(value / NULLIF(lag(value, 32) OVER w, 0) - 1) * 0.000000001, 6) + 0.0) AS pct_change_32
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w04_lag_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W4 deep lag ladder, k in {32,224,...} bars (fase_2.ipynb:113 cell 6),
    # scaled to the events grain. All lags share ONE window spec => one sort.
    ev = load_table(spark, sf_dir, "events")
    cols = [
        _r6s(F.col("value") / F.nullif(F.lag("value", k).over(_w_key()), F.lit(0.0)) - 1).alias(
            f"pct_change_{k}"
        )
        for k in (1, 8, 32)
    ]
    return ev.select("event_id", "user_id", *cols)


@register(
    "w05_rolling_std",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN count(value) OVER w = 5
                THEN (ROUND(stddev_samp(value) OVER w, 6) + 0.0) END AS std_5
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def w05_rolling_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W5 rolling(5).std with pandas warm-up-NaN semantics: null until the
    # window is full (my_stock_functions.py:99; SURVEY §7.5 NaN placement).
    ev = load_table(spark, sf_dir, "events")
    w5 = _w_key().rowsBetween(-4, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.count("value").over(w5) == 5, _r6(F.stddev_samp("value").over(w5))).alias(
            "std_5"
        ),
    )


@register(
    "w06_rolling_mean_excl_current",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN count(value) OVER w = 20
                THEN (ROUND(AVG(value) OVER w, 6) + 0.0) END AS mean_20_excl
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    """,
)
def w06_rolling_mean_excl_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W6 rolling(20).mean().shift(1) (my_stock_functions.py:184-187):
    # frame (-20,-1) with a count guard replicating the shift+warm-up.
    ev = load_table(spark, sf_dir, "events")
    w = _w_key().rowsBetween(-20, -1)
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.count("value").over(w) == 20, _r6(F.avg("value").over(w))).alias(
            "mean_20_excl"
        ),
    )


@register(
    "w07_rolling_max_excl_current",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN count(value) OVER w = 20
                THEN (ROUND(max(value) OVER w, 6) + 0.0) END AS max_20_excl
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    """,
)
def w07_rolling_max_excl_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W7 shift(1).rolling(20).max() (my_stock_functions.py:304-308).
    ev = load_table(spark, sf_dir, "events")
    w = _w_key().rowsBetween(-20, -1)
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.count("value").over(w) == 20, _r6(F.max("value").over(w))).alias(
            "max_20_excl"
        ),
    )


@register(
    "w08_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN count(value) OVER w = 20
                THEN (ROUND(median(value) OVER w, 6) + 0.0) END AS median_20
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def w08_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W8 rolling(20).median() (my_stock_functions.py:694-699). Spark's
    # median/percentile aggregates reject window frames, so the exact rolling
    # median is a sorted frame snapshot: with exactly 20 rows it is the mean
    # of elements 10 and 11 — all JVM-side (collect_list/array_sort), no UDF.
    ev = load_table(spark, sf_dir, "events")
    w = _w_key().rowsBetween(-19, 0)
    frame = F.array_sort(F.collect_list("value").over(w))
    exact_median = (F.get(frame, 9) + F.get(frame, 10)) / 2
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.count("value").over(w) == 20, _r6(exact_median)).alias("median_20"),
    )


@register(
    "w09_rolling_zscore",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN count(value) OVER w = 20
                THEN (ROUND((value - AVG(value) OVER w) / NULLIF(stddev_samp(value) OVER w, 0), 6) + 0.0)
           END AS zscore_20
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def w09_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W9 20d mu/sigma z-score (my_stock_functions.py:630-641).
    ev = load_table(spark, sf_dir, "events")
    w = _w_key().rowsBetween(-19, 0)
    z = (F.col("value") - F.avg("value").over(w)) / F.nullif(
        F.stddev_samp("value").over(w), F.lit(0.0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.count("value").over(w) == 20, _r6(z)).alias("zscore_20"),
    )


@register(
    "w10_pct_change_shift",
    oracle="""
    SELECT event_id, user_id,
           (ROUND(pct - sign(pct) * 0.000000001, 6) + 0.0) AS pct_change,
           (ROUND(lag(pct) OVER w2
                 - sign(lag(pct) OVER w2) * 0.000000001, 6) + 0.0) AS pct_change_lag1
    FROM (
      SELECT event_id, user_id, ts,
             value / NULLIF(lag(value) OVER w, 0) - 1 AS pct
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w10_pct_change_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W10 pct_change() and pct_change().shift(1) (my_stock_functions.py:39,141,...).
    ev = load_table(spark, sf_dir, "events")
    pct = F.col("value") / F.nullif(F.lag("value").over(_w_key()), F.lit(0.0)) - 1
    return ev.select(
        "event_id",
        "user_id",
        _r6s(pct).alias("pct_change"),
        _r6s(F.lag(pct).over(_w_key())).alias("pct_change_lag1"),
    )


@register(
    "w11_ewm_mean",
    # EWM is recursive (y = (1-a)*y_prev + a*x), so the oracle is a DuckDB
    # recursive CTE stepping one row per key per iteration. The arithmetic
    # matches pandas ewm(adjust=False) bit-for-bit: pandas computes
    # 0.9*y + 0.1*x then divides by (0.9+0.1)==1.0 (exact), and FP addition
    # is commutative, so 0.1*x + 0.9*y is the identical double.
    oracle="""
    WITH RECURSIVE base AS (
      SELECT event_id, user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), rec AS (
      SELECT event_id, user_id, rn, value AS ewm FROM base WHERE rn = 1
      UNION ALL
      SELECT b.event_id, b.user_id, b.rn, 0.1 * b.value + 0.9 * rec.ewm
      FROM base b JOIN rec ON b.user_id = rec.user_id AND b.rn = rec.rn + 1
    )
    SELECT event_id, user_id, (ROUND(ewm, 6) + 0.0) AS ewm_01 FROM rec
    """,
)
def w11_ewm_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W11 ewm(adjust=False, alpha=a).mean() per key (alpa.py:49-57) — the one
    # operator with no native Spark expression (SURVEY §7.4). Implemented as
    # an Arrow-batched grouped-map; per-key series fit an executor (same
    # assumption the reference makes per symbol). Unit-tested against pandas
    # in tests/test_windows.py.
    from equity_volatility_lakehouse_platform_spark.functions.lookbacks import ewm_mean

    ev = load_table(spark, sf_dir, "events")
    return ewm_mean(
        ev.select("event_id", "user_id", "ts", "value"),
        key="user_id",
        order=["ts", "event_id"],
        value="value",
        alpha=0.1,
        out="ewm_01",
    ).select("event_id", "user_id", r6("ewm_01").alias("ewm_01"))


@register(
    "w12_cumcount_trim",
    oracle="""
    SELECT event_id, user_id FROM (
      SELECT event_id, user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn > 20
    """,
)
def w12_cumcount_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W12 cumcount()>=n warm-up trim (my_model.py:59-61).
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", F.row_number().over(_w_key()).alias("rn"))
        .filter(F.col("rn") > 20)
        .select("event_id", "user_id")
    )


@register(
    "w13_day_boundary_reset",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN CAST(date_trunc('day', lag(ts) OVER w) AS TIMESTAMP)
                     = CAST(date_trunc('day', ts) AS TIMESTAMP)
                THEN (ROUND(ln(NULLIF(value / NULLIF(lag(value) OVER w, 0), 0)), 6) + 0.0) END AS intraday_log_ret
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w13_day_boundary_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W13 intraday log-return NaN'd across day changes
    # (my_stock_functions.py:85-88).
    ev = load_table(spark, sf_dir, "events")
    prev_ts = F.lag("ts").over(_w_key())
    prev_v = F.lag("value").over(_w_key())
    same_day = F.date_trunc("day", prev_ts) == F.date_trunc("day", F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.when(
            same_day,
            _r6(F.log(F.nullif(F.col("value") / F.nullif(prev_v, F.lit(0.0)), F.lit(0.0)))),
        ).alias("intraday_log_ret"),
    )


@register(
    "j09_asof_lookup",
    oracle="""
    SELECT event_id, user_id, ts,
           max(CASE WHEN event_type = 'error' THEN ts END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_ts
    FROM events
    """,
)
def j09_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J9 as-of backward lookup (np.searchsorted previous-holiday,
    # my_stock_functions.py:513-521): running max of the marker timestamp —
    # no join, one window pass.
    ev = load_table(spark, sf_dir, "events")
    marker = F.when(F.col("event_type") == "error", F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.max(marker)
        .over(_w_key().rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("last_error_ts"),
    )


@register(
    "j12_asof_join",
    oracle="""
    WITH quotes AS (
      SELECT user_id, ts, max(value) AS quote
      FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    ), trades AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT t.event_id, t.user_id, t.ts, (ROUND(t.value, 6) + 0.0) AS trade_value,
           (ROUND(q.quote, 6) + 0.0) AS asof_quote
    FROM trades t ASOF LEFT JOIN quotes q
      ON t.user_id = q.user_id AND t.ts >= q.ts
    """,
)
def j12_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-table as-of join (generalizes J9; pandas merge_asof semantics):
    # each trade takes the latest quote at-or-before its timestamp. Spark
    # has no ASOF JOIN, so it's the union+window formulation: tag both
    # sides, sort quotes ahead of trades at equal ts, forward-carry the
    # quote — ONE shuffle on the key, no range join, no per-row subquery.
    # The scale-canonical shape (a broadcast/range join explodes at 100 TB;
    # this stays linear). Oracle is DuckDB's native ASOF JOIN.
    ev = load_table(spark, sf_dir, "events")
    quotes = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("quote"))
        .select("user_id", "ts", F.lit(None).cast("long").alias("event_id"),
                F.lit(None).cast("double").alias("value"), "quote",
                F.lit(0).alias("is_trade"))
    )
    trades = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value",
        F.lit(None).cast("double").alias("quote"), F.lit(1).alias("is_trade"),
    )
    unioned = quotes.unionByName(trades)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_trade")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("asof_quote", F.last("quote", ignorenulls=True).over(w))
        .filter(F.col("is_trade") == 1)
        .select(
            "event_id", "user_id", "ts",
            _r6(F.col("value")).alias("trade_value"),
            _r6(F.col("asof_quote")).alias("asof_quote"),
        )
    )


@register(
    "w14_ranking",
    oracle="""
    SELECT event_id, user_id,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS BIGINT)
             AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_type, event_id)
    """,
)
def w14_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ranking surface (SURVEY §2.5 note: unused by the reference, exposed
    # anyway). rank/dense_rank deliberately ordered on a column with ties
    # (event_type) so the three functions genuinely differ; event_id
    # tiebreak keeps every engine deterministic.
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_type", "event_id")
    wq = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(wq).cast("long").alias("quartile"),
    )


@register(
    "w15_max_drawdown",
    oracle="""
    SELECT event_id, user_id, ts,
           (ROUND(run_peak, 6) + 0.0) AS run_peak,
           (ROUND(drawdown - sign(drawdown) * 0.000000001, 6) + 0.0) AS drawdown,
           (ROUND(max_drawdown - sign(max_drawdown) * 0.000000001, 6) + 0.0)
             AS max_drawdown
    FROM (
      SELECT event_id, user_id, ts, run_peak, drawdown,
             min(drawdown) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS max_drawdown
      FROM (
        SELECT event_id, user_id, ts,
               max(value) OVER w AS run_peak,
               value / NULLIF(max(value) OVER w, 0) - 1.0 AS drawdown
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      )
    )
    """,
)
def w15_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Running-peak drawdown curve per key (risk analytics over the same
    # per-key ordered stream as W1-W13): running max, per-row drawdown
    # relative to the peak, and the running minimum of that drawdown (the
    # max-drawdown-so-far). Three window functions over ONE shared
    # partition/order spec -> a single shuffle + sort, same physical shape
    # at 100 TB. Raw drawdown feeds the running min BEFORE rounding so
    # both engines fold the identical binary doubles; NULLIF guards the
    # value==0 rows present at sf0.1 (peak 0 -> NULL drawdown, min over a
    # window skips NULLs in both engines).
    ev = load_table(spark, sf_dir, "events")
    w = _w_key().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.max("value").over(w).alias("run_peak"),
        (
            F.col("value") / F.nullif(F.max("value").over(w), F.lit(0.0)) - 1.0
        ).alias("drawdown"),
    )
    dd = curve.withColumn("max_drawdown", F.min("drawdown").over(w))
    return dd.select(
        "event_id",
        "user_id",
        "ts",
        _r6(F.col("run_peak")).alias("run_peak"),
        _r6s(F.col("drawdown")).alias("drawdown"),
        _r6s(F.col("max_drawdown")).alias("max_drawdown"),
    )


@register(
    "w16_rolling_corr",
    oracle="""
    SELECT event_id, user_id, ts,
           (ROUND((CASE WHEN count(*) OVER w = 20 THEN corr(value, lag_v) OVER w END)
                  - sign(CASE WHEN count(*) OVER w = 20 THEN corr(value, lag_v) OVER w END)
                    * 0.000000001, 6) + 0.0) AS corr_20
    FROM (
      SELECT event_id, user_id, ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_v
      FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def w16_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rolling 20-row correlation between the series and its own lag (the
    # autocorrelation feature a quant pipeline derives per key; a17 is
    # the STATIC pairwise matrix, this is the windowed variant). Two
    # window passes over the SAME partition/order spec — lag first, then
    # corr over the trailing frame — one shuffle + one sort. Warm-up
    # frames yield NULL (pandas rolling(20) semantics, count gate like
    # the F-library); r6s absorbs the engines' summation-order drift in
    # the co-moment accumulation.
    ev = load_table(spark, sf_dir, "events")
    w = _w_key()
    frame = w.rowsBetween(-19, 0)
    lagged = ev.select(
        "event_id", "user_id", "ts", "value",
        F.lag("value").over(w).alias("lag_v"),
    )
    corr = F.when(
        F.count(F.lit(1)).over(frame) == 20, F.corr("value", "lag_v").over(frame)
    )
    return lagged.select(
        "event_id", "user_id", "ts", _r6s(corr).alias("corr_20")
    )
