"""One-giant-key detector for per-key sequential operators.

Window features (lag ladder, rolling stats), EWM, and event segmentation
all hold ONE key's history in one task's sort run / Arrow batch — the
documented single-task constraint (SCALE.md "Known single-task
constraints"). That design is right for symbol/user keys (10^3..10^7
distinct) and silently wrong for one-giant-key data: the task holding
the giant key runs alone for hours while the cluster idles, or OOMs.

``key_skew_report`` is the runtime probe: ONE map-side-combined
aggregation pass (shuffle volume = |distinct keys| rows, not data rows)
that measures the exact top-key share. It is a DIAGNOSTIC operator — run
it at ingest/validation time or before a big windowed job, not inside
every query (it costs one key-cardinality shuffle).

``assert_no_giant_key`` wraps it as a guard: warn (default) or raise
when one key exceeds the task-size threshold, with the mitigation named
in the message (range-repartition that key's span, or pre-aggregate to a
coarser grain) instead of letting the stage degrade silently.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default threshold: rows of one key a single window/sort task should be
# asked to hold. ~50M narrow rows is a few GB of task memory at typical
# row widths — past it, spills begin and the stage serializes on one core.
DEFAULT_MAX_KEY_ROWS = 50_000_000


class GiantKeyError(RuntimeError):
    """A single key exceeds the per-task row threshold for windowed ops."""


def key_skew_report(df: DataFrame, key_cols: list[str] | str) -> dict:
    """Exact key-skew profile in ONE aggregation pass.

    Returns {total_rows, n_keys, max_key_rows, max_key_share,
    avg_key_rows}. Partial aggregation makes the shuffle linear in the
    number of DISTINCT keys, so the probe is cheap even at 100 TB unless
    the key is near-unique — in which case there is no skew problem.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    row = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.sum("_n").alias("total_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("_n").alias("max_key_rows"),
        )
        .first()
    )
    total = row["total_rows"] or 0
    n_keys = row["n_keys"] or 0
    mx = row["max_key_rows"] or 0
    return {
        "total_rows": int(total),
        "n_keys": int(n_keys),
        "max_key_rows": int(mx),
        "max_key_share": (mx / total) if total else 0.0,
        "avg_key_rows": (total / n_keys) if n_keys else 0.0,
    }


def assert_no_giant_key(
    df: DataFrame,
    key_cols: list[str] | str,
    max_key_rows: int = DEFAULT_MAX_KEY_ROWS,
    max_key_share: float | None = None,
    mode: str = "warn",
) -> dict:
    """Guard a per-key windowed/sequential stage against one-giant-key
    input. ``mode='warn'`` emits a ``UserWarning``; ``mode='error'``
    raises ``GiantKeyError``. Returns the skew report either way so
    callers can log it."""
    rep = key_skew_report(df, key_cols)
    too_big = rep["max_key_rows"] > max_key_rows
    too_skewed = (
        max_key_share is not None
        and rep["total_rows"] > 0
        and rep["max_key_share"] > max_key_share
    )
    if too_big or too_skewed:
        msg = (
            f"giant key detected on {key_cols}: max_key_rows="
            f"{rep['max_key_rows']} ({rep['max_key_share']:.1%} of "
            f"{rep['total_rows']} rows, {rep['n_keys']} keys; threshold "
            f"{max_key_rows} rows"
            + (f" / {max_key_share:.0%} share" if max_key_share is not None else "")
            + "). A partitionBy-key window will sort this key in ONE task "
            "— range-repartition that key's span (key, order-col) with "
            "boundary overlap, or pre-aggregate to a coarser grain, "
            "before the windowed stage."
        )
        if mode == "error":
            raise GiantKeyError(msg)
        warnings.warn(msg, UserWarning, stacklevel=2)
    return rep


# ---------------------------------------------------------------------------
# Mitigation: sliced bounded windows for giant keys
# ---------------------------------------------------------------------------

def slice_giant_keys(
    df: DataFrame,
    key_cols: list[str] | str,
    order_cols: list[str] | str,
    lookback: int,
    max_key_rows: int = DEFAULT_MAX_KEY_ROWS,
    grid: int = 64,
) -> DataFrame:
    """Split each giant key's span into row-balanced slices so a
    BOUNDED-lookback window (lag k, rolling n, k/n <= ``lookback``) can
    run partitioned by (key, ``_slice``) instead of one task per key.

    Mechanics (all distributed, one extra aggregation pass + one
    broadcast join over the input):

    1. ONE groupBy computes per-key row counts and a ``grid``-point
       quantile sketch of the primary order column (map-side combined;
       shuffle = |distinct keys| rows).
    2. Keys with > ``max_key_rows`` rows pick ceil(n / max_key_rows)
       slice boundaries off their sketch (capped at ``grid`` slices);
       the tiny boundary table broadcasts back onto the input, and each
       row's ``_slice`` is the count of boundaries below its order value
       (a JVM-side array fold — no shuffle).
    3. Warm-up context: each row is REPLICATED (flagged ``_ctx = 1``)
       into EVERY later slice whose first rows still reach back to it —
       i.e. the last ``lookback`` REAL rows of the key preceding each
       slice boundary, accumulated across ALL earlier slices, not just
       the adjacent one. Quantile ties can collapse boundaries into
       slices smaller than ``lookback``; adjacent-only replication
       would lose history there. A row in slice s at descending rank d
       (1 = the slice's last row) has exactly (d - 1) + rows(s+1..s'-1)
       real rows between it and the start of slice s', so it is context
       for s' iff that count < ``lookback``; the per-slice row counts
       are a tiny (keys x <= ``grid``) broadcast map, keeping the
       fan-out fully distributed.

    The caller swaps ``Window.partitionBy(keys)`` for
    ``Window.partitionBy(*keys, "_slice")``, computes its bounded
    expressions, then filters ``_ctx == 0`` and drops the helper
    columns. Results are bit-identical to the unsliced window for any
    frame reaching at most ``lookback`` rows back (slice 0 keeps the
    plain warm-up nulls).

    Caveats: boundaries are strict on the PRIMARY order column, so rows
    sharing one order value stay in one slice (a key whose rows all
    carry the same timestamp cannot be split); non-giant keys pass
    through with ``_slice = 0`` untouched.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ocols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    primary = ocols[0]

    from pyspark.sql import Window

    fractions = [i / grid for i in range(1, grid)]
    per_key = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.percentile_approx(primary, fractions, 10_000).alias("_q"),
    )
    # s = number of slices for this giant key (>= 2 by the filter);
    # boundary i (1-based, i < s) is the quantile at floor(grid*i/s).
    giants = per_key.filter(F.col("_n") > max_key_rows).select(
        *keys,
        F.expr(
            f"transform("
            f"  sequence(1, CAST(least(ceil(_n / {max_key_rows}), {grid}) AS INT) - 1),"
            f"  i -> _q[CAST(floor({grid} * i /"
            f"       least(ceil(_n / {max_key_rows}), {grid})) AS INT) - 1])"
        ).alias("_bounds"),
    )
    with_bounds = df.join(F.broadcast(giants), on=keys, how="left")
    slice_id = F.when(F.col("_bounds").isNull(), F.lit(0)).otherwise(
        F.aggregate(
            "_bounds",
            F.lit(0),
            lambda acc, b: acc + F.when(F.col(primary) > b, 1).otherwise(0),
        )
    )
    base = (
        with_bounds
        .withColumn("_slice", slice_id)
        .withColumn("_nslices", F.size("_bounds") + 1)  # -1+1=0 for non-giants
        .drop("_bounds")
        .withColumn("_ctx", F.lit(0))
    )
    w_desc = Window.partitionBy(*keys, "_slice").orderBy(
        *[F.desc(c) for c in ocols]
    )
    # Per-key map {slice -> real-row count}: tiny (keys x <= grid
    # entries), broadcast back so each candidate row can decide which
    # later slices still need it without any per-key global sort.
    slice_counts = (
        base.groupBy(*keys, "_slice")
        .agg(F.count(F.lit(1)).alias("_sn"))
        .groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_slice", "_sn"))
            ).alias("_scounts")
        )
    )
    # Candidates: only the last `lookback` rows of each non-final slice
    # can ever be context (the condition below adds a non-negative
    # between-slices count to _d, so _d > lookback never qualifies).
    cand = (
        base.filter(F.col("_slice") < F.col("_nslices") - 1)
        .withColumn("_d", F.row_number().over(w_desc))
        .filter(F.col("_d") <= lookback)
        .join(F.broadcast(slice_counts), on=keys, how="inner")
    )
    # Target slices sp: rows strictly between this row and sp's start =
    # (_d - 1) + sum of counts of slices (_slice+1 .. sp-1); replicate
    # iff that is < lookback. Empty slices (collapsed boundaries) are
    # absent from the map -> coalesce 0. filter(t -> t < sp) expresses
    # the possibly-empty range (_slice+1 .. sp-1) without a descending
    # sequence().
    ctx = (
        cand.withColumn(
            "_slice",
            F.explode(
                F.expr(
                    "filter(sequence(_slice + 1, _nslices - 1), sp -> "
                    " aggregate(filter(sequence(_slice + 1, sp), t -> t < sp),"
                    "           0L,"
                    "           (a, t) -> a + coalesce(element_at(_scounts, t), 0L))"
                    f" + _d <= {int(lookback)})"
                )
            ),
        )
        .withColumn("_ctx", F.lit(1))
        .drop("_d", "_scounts")
    )
    return base.unionByName(ctx).drop("_nslices")


def guarded_lag_ladder(
    df: DataFrame,
    key_cols: list[str] | str,
    order_cols: list[str] | str,
    value_col: str,
    lags: tuple[int, ...] = (1, 8, 32),
    max_key_rows: int = DEFAULT_MAX_KEY_ROWS,
    mode: str = "warn",
) -> DataFrame:
    """The w04 lag-ladder deploy surface with the skew guard WIRED IN:
    probe first (one cheap pass); if a giant key trips the threshold,
    emit the warning AND take the mitigated plan — lag ladder over
    (key, _slice) partitions built by ``slice_giant_keys`` — instead of
    letting one task sort the giant key. Output (key/order columns +
    raw ``pct_change_{k}``) is bit-identical on both paths: the lag
    operands are the same rows either way.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ocols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    from pyspark.sql import Window

    rep = assert_no_giant_key(df, keys, max_key_rows=max_key_rows, mode=mode)
    out_cols = [c for c in df.columns]
    if rep["max_key_rows"] > max_key_rows:
        sliced = slice_giant_keys(
            df, keys, ocols, lookback=max(lags), max_key_rows=max_key_rows
        )
        w = Window.partitionBy(*keys, "_slice").orderBy(*ocols)
        out = sliced.select(
            "*",
            *[
                (
                    F.col(value_col)
                    / F.nullif(F.lag(value_col, k).over(w), F.lit(0.0))
                    - 1
                ).alias(f"pct_change_{k}")
                for k in lags
            ],
        ).filter(F.col("_ctx") == 0)
        return out.select(
            *out_cols, *[f"pct_change_{k}" for k in lags]
        )
    w = Window.partitionBy(*keys).orderBy(*ocols)
    return df.select(
        "*",
        *[
            (
                F.col(value_col)
                / F.nullif(F.lag(value_col, k).over(w), F.lit(0.0))
                - 1
            ).alias(f"pct_change_{k}")
            for k in lags
        ],
    )
