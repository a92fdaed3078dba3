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
depends on the previous hit), so it runs inside one Arrow map pass over
user_id-partitioned, in-partition-sorted data — parallel across keys,
state never leaves the executor, no driver materialization. (Round 14:
the earlier per-group applyInPandas paid fixed Python/Arrow cost per
key — ~6.3 s over 1500 tiny groups at sf0.1; the fused pass walks the
contiguous runs of whole partitions instead.) A key's full history must
fit in one task (same constraint the window feature library already
has).
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


def _segment_series(uid, vals, times, out: list) -> None:
    """Segment ONE key's (already ts/event_id-sorted) series, appending
    result tuples to ``out``.

    Row-for-row identical to ``_segment_group``'s per-row scan, but
    restructured around the loop invariant that ``ref`` — and therefore
    the (min_t, max_t) band — only changes on a hit: per segment, the
    band is computed once and the next hit located with a vectorized
    chunked search; high/low are slice max/min (same picked values as
    the sequential min/max chain — no arithmetic, so bit-identity is
    structural). The round-14 optimization round measured the old
    per-group applyInPandas at ~6.3 s for 1500 tiny groups at sf0.1 —
    nearly all per-group Python/Arrow overhead; this kernel form also
    makes a single very long key O(N) instead of O(N) Python iterations.
    """
    import numpy as np

    n_rows = len(vals)
    ref = float(vals[0])
    start = times[0]
    scan_from = 0
    while True:
        min_t, max_t = min_max_target(ref)
        hit = -1
        i = scan_from
        # chunked search keeps total work O(N + segments * chunk)
        while i < n_rows:
            j = min(n_rows, i + 4096)
            w = np.flatnonzero((vals[i:j] <= min_t) | (vals[i:j] >= max_t))
            if len(w):
                hit = i + int(w[0])
                break
            i = j
        if hit < 0:
            break
        seg = vals[scan_from:hit + 1]
        hi = max(ref, float(seg.max()))
        lo = min(ref, float(seg.min()))
        v = float(vals[hit])
        out.append(
            (uid, start, times[hit], ref, hi, lo, v, (v - ref) / ref,
             hit - scan_from + 1)
        )
        ref = v
        start = times[hit]
        scan_from = hit + 1
    # Trailing partial trend (my_alpaca.py:98-110).
    if scan_from < n_rows:
        seg = vals[scan_from:]
        hi = max(ref, float(seg.max()))
        lo = min(ref, float(seg.min()))
        n = n_rows - scan_from
    else:
        hi = lo = ref
        n = 0
    v = float(vals[-1])
    out.append((uid, start, times[-1], ref, hi, lo, v, (v - ref) / ref, n))


_SEGMENT_COLS = [
    "user_id", "start_time", "end_time", "open", "high", "low", "close",
    "pct_change", "n_bars",
]


def segment_events(events: DataFrame) -> DataFrame:
    """Per-key trend segmentation of the (user_id, ts, value) series.

    Physical shape (round 14, optimization round): ONE shuffle by
    user_id + in-partition sort, then a single mapInPandas pass whose
    kernel walks the contiguous per-user runs — the previous
    groupBy().applyInPandas paid per-GROUP Python/Arrow overhead
    (~1500 x ~67-row groups at sf0.1 -> 6.3 s, nearly all fixed cost);
    the fused pass is the same exchange count with per-partition
    batching. A user's rows all hash to one partition, the kernel
    carries a possibly-split trailing run across Arrow batch
    boundaries, and per-key results are independent of partitioning —
    output is bit-identical (differential + property tests unchanged).
    """

    def _kernel(batches):
        import numpy as np
        import pandas as pd

        leftover = None

        def _runs(pdf, hold_tail):
            uids = pdf["user_id"].to_numpy()
            vals = pdf["value"].to_numpy()
            times = pdf["ts"].to_numpy()
            change = np.flatnonzero(uids[1:] != uids[:-1]) + 1
            starts = [0, *change.tolist()]
            ends = [*change.tolist(), len(uids)]
            if hold_tail:
                # the final run may continue in the next Arrow batch
                starts, ends = starts[:-1], ends[:-1]
            out: list = []
            for s, e in zip(starts, ends):
                _segment_series(uids[s], vals[s:e], times[s:e], out)
            tail_from = ends[-1] if ends else 0
            return out, tail_from

        for pdf in batches:
            if leftover is not None:
                pdf = pd.concat([leftover, pdf], ignore_index=True)
                leftover = None
            if not len(pdf):
                continue
            out, tail_from = _runs(pdf, hold_tail=True)
            leftover = pdf.iloc[tail_from:]
            if out:
                yield pd.DataFrame(out, columns=_SEGMENT_COLS)
        if leftover is not None and len(leftover):
            out, _ = _runs(leftover, hold_tail=False)
            if out:
                yield pd.DataFrame(out, columns=_SEGMENT_COLS)

    return (
        events.select("user_id", "event_id", "ts", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(_kernel, SEGMENT_SCHEMA)
        # toward-zero nudge before rounding: ratios of 2dp inputs can land
        # exactly on a 6dp half boundary; r6s resolves it identically on
        # both engines (functions/rounding.py).
        .withColumn("pct_change", r6s("pct_change"))
    )
