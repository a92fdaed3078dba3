"""Trend/threshold event segmentation (reference: build_event_df,
data_apis/my_alpaca.py:19-111).

Each emitted row is one full trend: a run of consecutive bars from a
reference price until the price crosses the dynamic target band given by
the tiered threshold function (my_helper.py:2-24 — relative factor 12%/
8%/5%/3%/2% by price tier, with tier-dependent rounding). On a hit the
event closes, the reference resets to the hit price, and scanning
continues; a trailing partial segment is always emitted.

Deviations from the reference, by design:
- No 1-minute drill-down (my_alpaca.py:73-95): hits resolve at the input
  bar granularity. The drill-down is an external-API refinement, not an
  engine operator.
- No split-factor ratio (close_adj/close): the synthetic series has a
  single value column, so factor_ratio == 1 throughout.
- ``pct_change`` gets a 1e-9 toward-zero nudge before 6dp rounding (the
  cross-engine oracle-stability device used across the window library);
  the reference does not round pct_change at all.
- Band rounding is explicit half-up (``floor(x*pw + 0.5)/pw``), not
  Python ``round`` — see ``_round_half_up`` for where they can differ.

Scale: the scan is inherently sequential *within* a key (every reset
depends on the previous hit), so it runs as applyInPandas — one Arrow
batch per key, parallel across keys. That is the correct 100 TB shape:
state never leaves the executor, and no driver materialization occurs.
A key's full history must fit in one task (same constraint the window
feature library already has).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.functions.rounding import r6s

SEGMENT_SCHEMA = (
    "user_id bigint, start_time timestamp, end_time timestamp, "
    "open double, high double, low double, close double, "
    "pct_change double, n_bars bigint"
)


def _round_half_up(x: float, pw: float) -> float:
    """Explicit half-up decimal round: floor(x*pw + 0.5)/pw, pure double ops.

    Used instead of Python's ``round`` so the SQL oracle can reproduce the
    band BIT-FOR-BIT (``FLOOR(x*pw + 0.5)/pw`` evaluates the identical
    IEEE-754 sequence in any engine); Python's banker's rounding has no
    portable SQL equivalent. The two can disagree not only on exact
    binary ties but whenever rounding error in the ``x*pw`` product
    pushes the result across the .5 boundary — rare on 2dp-ish prices
    but not measure-zero; the explicit form is the engine's defined
    semantics, applied identically on both comparison sides.
    """
    return math.floor(x * pw + 0.5) / pw


def min_max_target(price: float) -> tuple[float, float]:
    """Tiered dynamic target band (mirrors my_helper.py:2-24, including
    its ValueError on non-positive prices — a zero/negative reference
    price would otherwise produce inf/NaN pct_change downstream)."""
    if price <= 0:
        raise ValueError(f"price must be positive, got {price}")
    if price <= 0.1:
        factor, pw = 0.12, 1e4
    elif price <= 0.5:
        factor, pw = 0.08, 1e4
    elif price <= 2:
        factor, pw = 0.05, 1e3
    elif price <= 10:
        factor, pw = 0.03, 1e2
    else:
        factor, pw = 0.02, 1e2
    price = _round_half_up(price, pw)
    lo = _round_half_up(price * (1 - factor), pw)
    hi = (price - lo) + price
    return lo, hi


def _segment_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    uid = pdf.loc[0, "user_id"]
    vals = pdf["value"].to_numpy()
    times = pdf["ts"].to_numpy()

    events: list[dict] = []
    ref = float(vals[0])
    lo = hi = ref
    start = times[0]
    n = 0
    for i in range(len(vals)):
        v = float(vals[i])
        lo = min(lo, v)
        hi = max(hi, v)
        n += 1
        min_t, max_t = min_max_target(ref)
        if v <= min_t or v >= max_t:
            events.append(
                {
                    "user_id": uid,
                    "start_time": start,
                    "end_time": times[i],
                    "open": ref,
                    "high": hi,
                    "low": lo,
                    "close": v,
                    "pct_change": (v - ref) / ref,
                    "n_bars": n,
                }
            )
            ref = v
            lo = hi = ref
            start = times[i]
            n = 0
    # Trailing partial trend (my_alpaca.py:98-110).
    v = float(vals[-1])
    events.append(
        {
            "user_id": uid,
            "start_time": start,
            "end_time": times[-1],
            "open": ref,
            "high": hi,
            "low": lo,
            "close": v,
            "pct_change": (v - ref) / ref,
            "n_bars": n,
        }
    )
    return pd.DataFrame(events)


def segment_events(events: DataFrame) -> DataFrame:
    """Per-key trend segmentation of the (user_id, ts, value) series."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_segment_group, SEGMENT_SCHEMA)
        # toward-zero nudge before rounding: ratios of 2dp inputs can land
        # exactly on a 6dp half boundary; r6s resolves it identically on
        # both engines (functions/rounding.py).
        .withColumn("pct_change", r6s("pct_change"))
    )
