"""Data-quality operators — the docx SQL validation/repair suite
(SURVEY.md §2.2 P8/P9/P11, §2.4 A11, §5) as reusable DataFrame ops.

The reference's only test discipline is a battery of Athena probes:
null/invalid-cast counts, symbol lexical rules, OHLC invariants, and the
vwap repair UPDATE. Here each is a single-pass aggregate or a declarative
rewrite; ``validate_bars`` runs the whole battery in ONE scan (all probes
are conditional sums — no reason to read the table 15 times at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def bad_symbol() -> Column:
    """docx symbol rule: regexp_like(symbol,'[^A-Z]') OR length(symbol)>5 OR
    empty. (Lazy: column exprs need an active session.)"""
    return (
        F.regexp_like("symbol", F.lit("[^A-Z]"))
        | (F.length("symbol") > 5)
        | (F.col("symbol") == "")
    )


def _probe(cond: Column, name: str) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)


def validate_bars(bars: DataFrame) -> DataFrame:
    """The full docx battery, one row out, one scan in."""
    return bars.agg(
        F.count(F.lit(1)).alias("n_rows"),
        _probe(F.col("timestamp").isNull(), "null_timestamp"),
        _probe(bad_symbol(), "bad_symbol"),
        # OHLC invariants (8 probes, docx incongruence query):
        _probe(F.col("low") > F.col("high"), "low_gt_high"),
        _probe(~F.col("open").between(F.col("low"), F.col("high")), "open_outside"),
        _probe(~F.col("close").between(F.col("low"), F.col("high")), "close_outside"),
        _probe(~F.col("vwap").between(F.col("low"), F.col("high")), "vwap_outside"),
        _probe(F.col("volume") < 0, "negative_volume"),
        _probe(F.col("trade_count") <= 0, "nonpositive_trades"),
        # null / negative value columns (7 probes):
        *[
            _probe(F.col(c).isNull() | (F.col(c) < 0), f"bad_{c}")
            for c in ("open", "high", "low", "close", "vwap")
        ],
    )


def repair_vwap(bars: DataFrame) -> DataFrame:
    """docx repair: UPDATE ... SET vwap=(low+high)/2 WHERE vwap<low OR
    vwap>high — declaratively (Delta UPDATE at deploy)."""
    bad = (F.col("vwap") < F.col("low")) | (F.col("vwap") > F.col("high"))
    return bars.withColumn(
        "vwap", F.when(bad, (F.col("low") + F.col("high")) / 2).otherwise(F.col("vwap"))
    )


def drop_bad_symbols(bars: DataFrame) -> DataFrame:
    """docx symbol-rule DELETE equivalent."""
    return bars.filter(~bad_symbol())


def delete_before(bars: DataFrame, cutoff: str, ts: str = "local_timestamp") -> DataFrame:
    """docx `DELETE ... WHERE local_timestamp < TIMESTAMP '2016-01-01'`."""
    return bars.filter(F.col(ts) >= F.lit(cutoff).cast(dict(bars.dtypes)[ts]))


def parse_bronze_timestamp(bronze: DataFrame, col: str = "timestamp") -> DataFrame:
    """The Athena CTAS typing step: raw string timestamps -> TimestampType
    (`from_iso8601_timestamp(regexp_replace(timestamp,' ','T'))`, docx).
    try_to_timestamp keeps malformed rows NULL for the validation probes."""
    iso = F.regexp_replace(F.col(col), " ", "T")
    return bronze.withColumn(col, F.try_to_timestamp(iso))
