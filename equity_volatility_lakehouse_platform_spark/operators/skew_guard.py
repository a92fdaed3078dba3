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
