"""Cross-engine-exact 6dp rounding for double output columns.

Every float output column in the oracle-checked surface is rounded to
6dp on both sides. The two engines natively round DIFFERENTLY:

* Spark ``round(x, 6)``: HALF_UP on the shortest decimal representation,
  via a per-row ``BigDecimal`` allocation — semantically defensible but
  (a) measurably slow (it dominated q1/f20 profiles at sf0.1 — see
  scripts/profile_q1.py) and (b) divergent from DuckDB whenever the
  shortest-repr view of a value sits on the other side of a .5 boundary
  from its binary-double view.
* DuckDB ``ROUND(x, 6)``: ``std::round(x * 1e6) / 1e6`` — pure binary
  double arithmetic, half away from zero on the scaled value.

``r6`` below reproduces DuckDB's computation BIT-EXACTLY using only
codegen-friendly primitives, so Spark and the oracle agree by
construction on every representable double (verified over 2M+ samples
including exact .5 boundaries, +-inf, NaN, subnormals, and >2^53
magnitudes — zero bit mismatches):

* ``y = x * 1e6`` — identical IEEE multiply on both engines;
* ``frac = y % 1.0`` — fmod is EXACT for finite doubles, so
  ``t = y - frac`` is trunc-toward-zero with no rounding error (unlike
  ``floor(y + 0.5)``, which mis-rounds near 2^52, and unlike Spark's
  ``F.floor``, which returns BIGINT and would overflow past 2^63);
* half-away-from-zero via exact comparisons on ``frac`` (|t| >= 2^53
  implies frac == 0, so the +-1 adjustment is always exact);
* non-finite ``y`` (inf overflow / NaN) falls back to ``y / 1e6``,
  matching ``std::round``'s identity on non-finites;
* ``+ 0.0`` flushes -0.0 to +0.0, mirroring the ``(ROUND(x, 6) + 0.0)``
  convention used throughout the oracles (Spark's native round also
  never emits -0.0, so this changes nothing vs the previous behavior).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


def _round_scaled(col: Column | str, p: float) -> Column:
    """Round to 1/p grain, bit-identical to DuckDB ``(ROUND(x, s)+0.0)``
    for ``p = 10**s``."""
    x = F.col(col) if isinstance(col, str) else col
    y = x * F.lit(p)
    frac = y % F.lit(1.0)
    t = y - frac
    adj = (
        F.when(frac >= 0.5, F.lit(1.0))
        .when(frac <= -0.5, F.lit(-1.0))
        .otherwise(F.lit(0.0))
    )
    return (
        F.when(F.isnan(y) | (F.abs(y) == F.lit(_INF)), y / F.lit(p))
        .otherwise((t + adj) / F.lit(p))
        + F.lit(0.0)
    )


def _round_sql(ref: str, p: str, nudge: bool) -> str:
    """The ``_round_scaled`` expression as ONE SQL string over a quoted
    column reference. Building the same tree through the Column API costs
    ~25 py4j round-trips per call (~1.5 s of driver time on a 25-column
    projection, profiled); parsing a single string is ~40x cheaper and
    analyzes to the identical expression, so results are bit-identical.
    """
    # Quote each dot-separated segment: "s.total_value" is a QUALIFIED
    # reference (alias s, column total_value), exactly as F.col parses it.
    x = ".".join(f"`{p.replace('`', '``')}`" for p in ref.split("."))
    if nudge:
        x = f"({x} - sign({x}) * 1.0E-9D)"
    y = f"({x} * {p})"
    frac = f"({y} % 1.0D)"
    adj = f"CASE WHEN {frac} >= 0.5D THEN 1.0D WHEN {frac} <= -0.5D THEN -1.0D ELSE 0.0D END"
    return (
        f"CASE WHEN isnan({y}) OR abs({y}) = double('Infinity') THEN {y} / {p} "
        f"ELSE (({y} - {frac}) + {adj}) / {p} END + 0.0D"
    )


def r6(col: Column | str) -> Column:
    """6dp round, bit-identical to DuckDB ``(ROUND(x, 6) + 0.0)``.

    A plain column NAME takes the parsed-SQL fast path (same analyzed
    expression, ~40x cheaper to construct — see ``_round_sql``)."""
    if isinstance(col, str):
        return F.expr(_round_sql(col, "1.0E6D", nudge=False))
    return _round_scaled(col, 1e6)


def r2(col: Column | str) -> Column:
    """2dp (money-grain) round, bit-identical to DuckDB ``ROUND(x, 2)``
    up to signed zero. Used before DECIMAL(18,2) casts so the cast input
    is the double nearest k/100 on BOTH engines — each engine's
    double->decimal cast then lands on exactly k/100, regardless of the
    generator's input precision (a raw 3dp value like 2.675 would
    otherwise round differently through Spark's shortest-repr HALF_UP
    cast vs DuckDB's binary-double cast)."""
    if isinstance(col, str):
        return F.expr(_round_sql(col, "100.0D", nudge=False))
    return _round_scaled(col, 1e2)


def r6s(col: Column | str) -> Column:
    """Nudged 6dp round: 1e-9 toward-zero shift before ``r6``.

    Ratios of exactly-2dp inputs can land exactly ON a 6dp .5 boundary;
    the nudge moves them decisively to one side, which also absorbs
    sub-1e-9 summation-order drift in aggregated inputs. Oracle mirror:
    ``(ROUND(x - sign(x) * 0.000000001, 6) + 0.0)`` — both engines
    compute the identical nudged argument, then ``r6`` == ``ROUND`` by
    construction.
    """
    if isinstance(col, str):
        return F.expr(_round_sql(col, "1.0E6D", nudge=True))
    return r6(col - F.signum(col) * F.lit(1e-9))
