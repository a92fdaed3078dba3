"""Sink round-trip queries (SURVEY.md §2.1 S7/S9/S10/S12).

Each query exercises a real write path end-to-end — partitioned parquet
with dynamic partition overwrite, and the on-conflict-do-nothing upsert —
then reads the lake back and aggregates it, so the DuckDB oracle can
state what the sink must contain. Writes go to a fresh temp directory per
invocation (the driver may call these repeatedly).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table
from equity_volatility_lakehouse_platform_spark.sources.sinks import (
    upsert_parquet,
    write_partitioned,
)


@register(
    "snk01_partitioned_overwrite_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def snk01_partitioned_overwrite_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S7/S9/S10: partitioned snappy parquet with dynamic partition
    # overwrite (Iceberg overwritePartitions semantics, fase_1 cell 20).
    # Writing twice proves idempotence — the second write must replace,
    # not duplicate, each partition. Partition column count stays bounded
    # (event_type cardinality), the 100 TB-safe layout.
    ev = load_table(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="evlp_snk01_") + "/events_lake"
    write_partitioned(ev, path, ["event_type"])
    write_partitioned(ev, path, ["event_type"])  # idempotent re-run
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@register(
    "snk02_upsert_insert_only",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def snk02_upsert_insert_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S12: ON CONFLICT DO NOTHING (bars.py:196-198). Seed the lake with a
    # third of the orders, upsert the full table twice; existing keys must
    # be skipped, so the lake holds each order exactly once.
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="evlp_snk02_") + "/orders_lake"
    upsert_parquet(spark, orders.filter(F.col("o_orderkey") % 3 == 0), path, ["o_orderkey"])
    upsert_parquet(spark, orders, path, ["o_orderkey"])
    upsert_parquet(spark, orders, path, ["o_orderkey"])  # no-op batch
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


@register(
    "snk03_bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
)
def snk03_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bucketing for co-located joins (SURVEY §4 / guide): both tables are
    # written bucketed+sorted on the join key, so the join AND the
    # follow-up groupBy on that key run with ZERO exchanges — the layout
    # investment that pays on every subsequent query at 100 TB.
    # tests/test_plans.py asserts the no-shuffle property.
    import tempfile
    import uuid

    suffix = uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix="evlp_bucketed_")
    names = {}
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"evlp_{tbl}_b{suffix}"
        (
            load_table(spark, sf_dir, tbl)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{base}/{name}")
            .saveAsTable(name)
        )
        names[tbl] = name
    o = spark.table(names["orders"])
    l = spark.table(names["lineitem"])
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )
