"""Sink round-trip queries (SURVEY.md §2.1 S7/S9/S10/S12).

Each query exercises a real write path end-to-end — partitioned parquet
with dynamic partition overwrite, and the on-conflict-do-nothing upsert —
then reads the lake back and aggregates it, so the DuckDB oracle can
state what the sink must contain. Writes go to a per-(query, sf,
process) scratch root that is reused and wiped across invocations
(sources.sinks.session_scratch) — repeated sweeps leave no net-new
temp directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.functions.rounding import r2, r6
from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.sources.acid import AcidTable
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table, table_rows
from equity_volatility_lakehouse_platform_spark.sources.sinks import (
    session_scratch,
    write_partitioned,
)


def _money(col: str):
    # DuckDB-exact 2dp round BEFORE the decimal cast (functions/rounding
    # .r2): both engines' cast inputs are then the identical
    # double-nearest-k/100, so the DECIMAL(18,2) casts agree for ANY
    # input precision — a plain F.round(col, 2) here would itself
    # diverge from DuckDB's ROUND on 3dp boundary values like 2.675
    # (tests/test_domain.py::test_money_guard_3dp_fixture).
    return F.sum(r2(F.col(col)).cast("decimal(18,2)")).cast("double")


# DuckDB mirror of _money (see comment above).
_MONEY_SQL = "CAST(SUM(CAST(ROUND({col}, 2) AS DECIMAL(18,2))) AS DOUBLE)"


@register(
    "snk01_partitioned_overwrite_roundtrip",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           {_MONEY_SQL.format(col="value")} AS total_value
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
    path = session_scratch("snk01", sf_dir) + "/events_lake"
    write_partitioned(ev, path, ["event_type"])
    write_partitioned(ev, path, ["event_type"])  # idempotent re-run
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        _money("value").alias("total_value"),
    )


@register(
    "snk02_upsert_insert_only",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def snk02_upsert_insert_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S12: ON CONFLICT DO NOTHING (bars.py:196-198) as a TRANSACTIONAL
    # MERGE on the ACID commit log (sources/acid.py): seed the table with
    # a third of the orders, merge the full table twice; existing keys
    # are skipped and each batch commits atomically, so the table holds
    # each order exactly once — and a crash mid-merge would leave the
    # previous snapshot intact (tests/test_acid.py kill-test).
    orders = load_table(spark, sf_dir, "orders")
    path = session_scratch("snk02", sf_dir) + "/orders_acid"
    table = AcidTable(spark, path)
    table.overwrite(orders.filter(F.col("o_orderkey") % 3 == 0))
    table.merge_insert_only(orders, ["o_orderkey"])
    table.merge_insert_only(orders, ["o_orderkey"])  # no-op batch
    back = table.read()
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money("o_totalprice").alias("total_price"),
    )


@register(
    "snk03_bucketed_colocated_join",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           {_MONEY_SQL.format(col="l.l_extendedprice")} AS total_price
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
    import uuid

    suffix = uuid.uuid4().hex[:8]
    base = session_scratch("bucketed", sf_dir)
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
            _money("l_extendedprice").alias("total_price"),
        )
    )


@register(
    "snk04_acid_time_travel",
    oracle=f"""
    SELECT 0 AS version, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders WHERE o_orderkey % 3 = 0 GROUP BY o_orderstatus
    UNION ALL
    SELECT 1 AS version, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def snk04_acid_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Time travel on the ACID commit log: version 0 (the seed) must stay
    # byte-identical after a later MERGE commits version 1 — immutable
    # data files + manifest snapshots, the Delta/Iceberg read contract.
    orders = load_table(spark, sf_dir, "orders")
    path = session_scratch("snk04", sf_dir) + "/orders_acid"
    table = AcidTable(spark, path)
    table.overwrite(orders.filter(F.col("o_orderkey") % 3 == 0))
    table.merge_insert_only(orders, ["o_orderkey"])

    def _agg(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money("o_totalprice").alias("total_price"),
        ).select(F.lit(version).alias("version"), "*")

    return _agg(table.read(0), 0).unionByName(_agg(table.read(1), 1))


@register(
    "snk05_acid_delete_update",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice + 1.0")} AS total_price
    FROM orders WHERE o_orderstatus <> 'F' AND o_orderstatus = 'O'
    GROUP BY o_orderstatus
    UNION ALL
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders WHERE o_orderstatus <> 'F' AND o_orderstatus <> 'O'
    GROUP BY o_orderstatus
    """,
)
def snk05_acid_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Transactional DELETE + UPDATE (docx UPDATE/DELETE parity) as
    # copy-on-write commits: delete the 'F' orders, then bump every 'O'
    # order's price by 1.00 — each an atomic version; files without
    # matches carry over by reference (tests/test_acid.py asserts the
    # minimal-rewrite property).
    orders = load_table(spark, sf_dir, "orders")
    path = session_scratch("snk05", sf_dir) + "/orders_acid"
    table = AcidTable(spark, path)
    table.overwrite(orders)
    table.delete_where(F.col("o_orderstatus") == "F")
    table.update_where(
        F.col("o_orderstatus") == "O",
        {"o_totalprice": F.col("o_totalprice") + F.lit(1.0)},
    )
    return table.read().groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money("o_totalprice").alias("total_price"),
    )


@register(
    "snk06_acid_change_feed",
    # The change feed between known commits is fully predictable from the
    # source table, so the oracle restates each step's row-level diff:
    # v0->v1 (merge_insert_only of the full table over the even-key half)
    # inserts exactly the odd-key orders; v1->v2 (DELETE status 'F')
    # deletes exactly the 'F' orders.
    oracle=f"""
    SELECT 'v0->v1' AS step, 'insert' AS change_type, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_orderstatus
    UNION ALL
    SELECT 'v1->v2' AS step, 'delete' AS change_type, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderstatus
    """,
)
def snk06_acid_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CDC read surface over the ACID log (AcidTable.changes): build three
    # versions, then consume each hop as a row-level change feed. The
    # feed scans only the file-set symmetric difference of the two
    # manifests — change-proportional, not table-proportional (the
    # incremental-consumption contract a 100 TB downstream sync needs).
    orders = load_table(spark, sf_dir, "orders")
    path = session_scratch("snk06", sf_dir) + "/orders_acid"
    table = AcidTable(spark, path)
    table.overwrite(orders.filter(F.col("o_orderkey") % 2 == 0))
    table.merge_insert_only(orders, ["o_orderkey"])
    table.delete_where(F.col("o_orderstatus") == "F")

    def _agg(step: str, feed: DataFrame) -> DataFrame:
        return feed.groupBy("_change_type", "o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            _money("o_totalprice").alias("total_price"),
        ).select(
            F.lit(step).alias("step"),
            F.col("_change_type").alias("change_type"),
            "o_orderstatus",
            "n_rows",
            "total_price",
        )

    return _agg("v0->v1", table.changes(0, 1)).unionByName(
        _agg("v1->v2", table.changes(1, 2))
    )


@register(
    "snk07_schema_evolution",
    # v0 lands even-key orders WITHOUT the channel column; v1 appends the
    # odd-key orders WITH it. The evolved snapshot reads old files as
    # NULL-channel (no rewrite), so the per-channel account is fully
    # predictable from the source table.
    oracle=f"""
    SELECT COALESCE(channel, 'unknown') AS channel,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM (
      SELECT o_totalprice, NULL AS channel FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_totalprice,
             CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'api' END AS channel
      FROM orders WHERE o_orderkey % 2 = 1
    )
    GROUP BY 1
    """,
)
def snk07_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ADD-COLUMN schema evolution on the ACID table (the Delta/Iceberg
    # mergeSchema contract): appending a batch that carries a new column
    # widens the committed schema; files from before the evolution are
    # never rewritten — the snapshot read fills the missing column with
    # NULL. Changing an existing column's type refuses loudly
    # (tests/test_acid.py).
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    path = session_scratch("snk07", sf_dir) + "/orders_acid"
    table = AcidTable(spark, path)
    table.overwrite(orders.filter(F.col("o_orderkey") % 2 == 0))
    widened = orders.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "channel",
        F.when(F.col("o_orderkey") % 3 == 0, "web").otherwise("api"),
    )
    table.append(widened)
    return (
        table.read()
        .groupBy(F.coalesce("channel", F.lit("unknown")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money("o_totalprice").alias("total_price"),
        )
    )


@register(
    "snk08_cdc_apply",
    # The downstream half of the CDC contract: a replica seeded from
    # snapshot v0 and advanced ONLY by the change feeds (delete keys,
    # then insert rows — updates arrive as delete+insert pairs) must
    # reconstruct v2 exactly. The oracle restates v2 from the source
    # table: all orders, with 'F' orders carrying the updated priority.
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_cdc_applied,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def snk08_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Replica maintenance is change-proportional at every step: each
    # feed ships only the manifests' file-set difference, the delete
    # application is an anti-join on the key, and the insert application
    # a union — the table itself is never re-shipped. (The replica here
    # re-aggregates fully only because the gate compares full states.)
    orders = load_table(spark, sf_dir, "orders")
    path = session_scratch("snk08", sf_dir) + "/orders_acid"
    table = AcidTable(spark, path)
    table.overwrite(orders.filter(F.col("o_orderkey") % 2 == 0))
    table.merge_insert_only(orders, ["o_orderkey"])
    table.update_where(
        F.col("o_orderstatus") == "F",
        {"o_orderpriority": F.lit("CDC-APPLIED")},
    )

    replica = table.read(0)
    for v in (1, 2):
        feed = table.changes(v - 1, v)
        deletes = feed.filter(F.col("_change_type") == "delete").select(
            "o_orderkey"
        )
        inserts = feed.filter(F.col("_change_type") == "insert").drop(
            "_change_type"
        )
        replica = replica.join(
            deletes, "o_orderkey", "left_anti"
        ).unionByName(inserts)

    return replica.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(
            F.when(F.col("o_orderpriority") == "CDC-APPLIED", 1)
        ).cast("bigint").alias("n_cdc_applied"),
        _money("o_totalprice").alias("total_price"),
    )


@register(
    "snk09_merge_upsert",
    # Full transactional MERGE (Delta upsert — update matched, insert
    # unmatched; sources/acid.py merge_upsert). Seed the table with a
    # CORRUPTED third of the orders (prices doubled), then merge the
    # full clean source: matched keys must be OVERWRITTEN with the clean
    # image (insert-only would keep the corruption), unmatched keys
    # insert. The final snapshot therefore equals the clean source
    # exactly — any surviving doubled price fails the money aggregate.
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def snk09_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = session_scratch("snk09", sf_dir) + "/orders_acid"
    table = AcidTable(spark, path)
    corrupted = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    table.overwrite(corrupted)
    table.merge_upsert(orders, ["o_orderkey"])
    back = table.read()
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money("o_totalprice").alias("total_price"),
    )


@register(
    "snk10_zorder_layout",
    # OPTIMIZE ZORDER BY (sources/acid.optimize_zorder): events land in
    # time-sliced commits (every user scattered across every file), then
    # the layout rewrite clusters on (user_id, ts) via quantile-rank
    # Morton interleave + one repartitionByRange. The oracle pins
    # ROW-IDENTITY through the rewrite (layout must never change data);
    # the file-skipping improvement itself is asserted in
    # tests/test_acid.py (engine-internal file counts have no SQL
    # mirror).
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           (ROUND(SUM(value), 6) + 0.0) AS total_value
    FROM events GROUP BY user_id
    """,
)
def snk10_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    path = session_scratch("snk10", sf_dir) + "/events_acid"
    table = AcidTable(spark, path)
    table.overwrite(ev.filter(F.dayofmonth("ts") <= 10).coalesce(2))
    table.append(ev.filter(F.dayofmonth("ts").between(11, 20)).coalesce(2))
    table.append(ev.filter(F.dayofmonth("ts") > 20).coalesce(2))
    table.optimize_zorder(["user_id", "ts"], target_files=4)
    return (
        table.read()
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r6(F.sum("value")).alias("total_value"),
        )
    )


@register(
    "snk11_jsonl_roundtrip",
    # JSON-lines landing format (the interchange format every training-
    # data pipeline ingests and emits): events written as partitioned
    # gzip JSONL, read back with an EXPLICIT schema (never inference —
    # a schema-inference pass over 100 TB of JSONL is a full extra
    # scan), timestamps round-tripped through ISO-8601 text. The oracle
    # aggregates the source directly: a lossless round trip is
    # indistinguishable from no round trip.
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           (ROUND(SUM(value), 6) + 0.0) AS total_value,
           CAST(max(ts) AS TIMESTAMP) AS max_ts
    FROM events GROUP BY event_type
    """,
)
def snk11_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    out = session_scratch("snk11", sf_dir) + "/events_jsonl"
    # Spark's default JSON timestampFormat is millisecond-grain — a
    # silent 3-digit truncation on micro-stamped events. Pin the format
    # to microseconds on BOTH sides for a lossless round trip.
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    (
        ev.write.mode("overwrite")
        .option("compression", "gzip")
        .option("timestampFormat", ts_fmt)
        .partitionBy("event_type")
        .json(out)
    )
    back = (
        spark.read.schema(
            "event_id bigint, user_id bigint, ts timestamp, value double, "
            "event_type string"
        )
        .option("timestampFormat", ts_fmt)
        .json(out)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        r6(F.sum("value")).alias("total_value"),
        F.max("ts").alias("max_ts"),
    )


@register(
    "snk12_csv_roundtrip",
    # CSV staging round trip (S4's read path exercised as a registered
    # query, not only pytest): events written as gzip CSV with an
    # explicit microsecond timestampFormat, read back with an EXPLICIT
    # schema (inference over 100 TB of CSV costs a full extra scan and
    # guesses types). Lossless round trip == aggregate of the source.
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           (ROUND(SUM(value), 6) + 0.0) AS total_value,
           CAST(min(ts) AS TIMESTAMP) AS min_ts
    FROM events GROUP BY event_type
    """,
)
def snk12_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    out = session_scratch("snk12", sf_dir) + "/events_csv"
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    (
        ev.write.mode("overwrite")
        .option("compression", "gzip")
        .option("header", "true")
        .option("timestampFormat", ts_fmt)
        .csv(out)
    )
    back = (
        spark.read.schema(
            "event_id bigint, user_id bigint, ts timestamp, "
            "event_type string, value double"
        )
        .option("header", "true")
        .option("timestampFormat", ts_fmt)
        .csv(out)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        r6(F.sum("value")).alias("total_value"),
        F.min("ts").alias("min_ts"),
    )


@register(
    "snk13_orc_roundtrip",
    # ORC staging round trip — the other columnar interchange format a
    # lake ingests (Hive-era pipelines hand these over): zlib ORC write
    # + explicit-schema read. ORC stores real timestamps (no
    # text-format truncation hazard, unlike CSV/JSON), so the round
    # trip is lossless by construction; the oracle aggregates the
    # source directly.
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           (ROUND(SUM(value), 6) + 0.0) AS total_value,
           CAST(max(ts) AS TIMESTAMP) AS max_ts
    FROM events GROUP BY event_type
    """,
)
def snk13_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    out = session_scratch("snk13", sf_dir) + "/events_orc"
    ev.write.mode("overwrite").option("compression", "zlib").orc(out)
    back = spark.read.schema(
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double"
    ).orc(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        r6(F.sum("value")).alias("total_value"),
        F.max("ts").alias("max_ts"),
    )


@register(
    "snk14_shallow_clone",
    # Delta CLONE parity (round 8): shallow-clone the seeded table —
    # ZERO data copied, the clone's v0 manifest references the source's
    # files absolutely — then DELETE on the clone and verify the three
    # snapshots a clone contract promises: the source is untouched, the
    # clone's v0 equals the source, and the clone's v1 carries the
    # delete. Copy-on-write localizes the touched source files into the
    # clone (sources/acid.py:clone); `side` labels the three reads.
    oracle=f"""
    SELECT 'source' AS side, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'clone_v0' AS side, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'clone_v1' AS side, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders WHERE o_orderkey % 5 <> 0 GROUP BY o_orderstatus
    """,
)
def snk14_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = session_scratch("snk14", sf_dir)
    src = AcidTable(spark, base + "/src")
    src.overwrite(orders)
    clone = src.clone(base + "/clone")
    clone.delete_where(F.col("o_orderkey") % 5 == 0)

    def _agg(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money("o_totalprice").alias("total_price"),
        ).select(F.lit(side).alias("side"), "*")

    return (
        _agg(src.read(), "source")
        .unionByName(_agg(clone.read(0), "clone_v0"))
        .unionByName(_agg(clone.read(1), "clone_v1"))
    )


@register(
    "snk15_restore_vacuum",
    # RESTORE + retention VACUUM — the recovery-and-reclaim pair every
    # lakehouse table needs operationally: v0 seeds the table, v1 is a
    # bad DELETE (drops the 'F' orders), v2 = restore(0) rolls BACK by
    # rolling FORWARD (a new manifest re-referencing v0's immutable
    # files — zero bytes rewritten; the bad version stays in the log
    # for audit). vacuum(retain_last=2) then reclaims files pinned ONLY
    # by expired snapshots — v1's copy-on-write rewrites — while every
    # file the retained versions reference survives, so the restored
    # read is identical before and after the vacuum. The oracle states
    # both reads: post-restore == the full seed, and the audit trail
    # carries exactly the four ops.
    oracle=f"""
    SELECT 'post_restore' AS side, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'post_vacuum' AS side, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def snk15_restore_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = session_scratch("snk15", sf_dir) + "/orders_acid"
    table = AcidTable(spark, path)
    table.overwrite(orders)                             # v0: seed
    table.delete_where(F.col("o_orderstatus") == "F")   # v1: the "oops"
    table.restore(0)                                    # v2: roll back
    post_restore = table.read()

    def _agg(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money("o_totalprice").alias("total_price"),
        ).select(F.lit(side).alias("side"), "*")

    fst = _agg(post_restore, "post_restore").localCheckpoint(eager=True)
    # Retention vacuum AFTER the pre-vacuum read materialized: keep the
    # newest 2 versions (v1 + v2); v1's COW rewrite files are exclusive
    # to it... and v1 is retained, so what actually expires is nothing
    # exclusive — v0's files are shared with v2 (the restore) and MUST
    # survive. The read-after-vacuum assertion is the point: retention
    # never damages a retained snapshot.
    table.vacuum(retain_last=2)
    return fst.unionByName(_agg(table.read(), "post_vacuum"))


@register(
    "snk16_merge_delete_branch",
    # Three-branch MERGE (Delta's WHEN MATCHED AND cond THEN DELETE /
    # WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT) — the one
    # MERGE clause snk09's upsert stops short of, and the shape every
    # CDC-applying pipeline needs (a tombstone in the source deletes the
    # target row in the SAME atomic commit as the updates). Source = the
    # even-key orders with price+1; matched 'F' sources take the DELETE
    # branch, other matched sources the UPDATE branch (no unmatched keys
    # here — snk09 covers inserts). The oracle restates the final table:
    # odd keys unchanged, even non-F keys price+1, even 'F' keys gone.
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col=
               "CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1.0 "
               "ELSE o_totalprice END")} AS total_price
    FROM orders
    WHERE NOT (o_orderkey % 2 = 0 AND o_orderstatus = 'F')
    GROUP BY o_orderstatus
    """,
)
def snk16_merge_delete_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = session_scratch("snk16", sf_dir) + "/orders_acid"
    table = AcidTable(spark, path)
    table.overwrite(orders)
    source = orders.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
    )
    table.merge_full(
        source, ["o_orderkey"],
        delete_condition=F.col("o_orderstatus") == "F",
    )
    return table.read().groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money("o_totalprice").alias("total_price"),
    )


@register(
    "snk17_partition_evolution",
    # PARTITION EVOLUTION (Iceberg's flagship): the partition spec is
    # table METADATA, not directory paths, so changing it never
    # rewrites a byte of old data. v0 lands the pre-2000 events
    # clustered by event_type (the low-cardinality spec a small table
    # starts with); v1 appends the rest clustered by user_id (the
    # higher-cardinality spec a grown table needs) — old files stay
    # byte-identical under their
    # old clustering, history() records the spec per commit, and every
    # read sees the union. Spec columns stay ordinary data columns, so
    # reads never depend on directory-name recovery. The oracle states
    # the spec-spanning read: the full events table aggregated per
    # type/year.
    oracle="""
    SELECT event_type,
           CAST(EXTRACT(year FROM ts) AS BIGINT) AS yr,
           CAST(count(*) AS BIGINT) AS n,
           (ROUND(SUM(value), 6) + 0.0) AS total_value
    FROM events
    GROUP BY event_type, EXTRACT(year FROM ts)
    """,
)
def snk17_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from equity_volatility_lakehouse_platform_spark.sources.readers import (
        load_table,
    )

    events = load_table(spark, sf_dir, "events")
    path = session_scratch("snk17", sf_dir) + "/events_acid"
    table = AcidTable(spark, path)
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")
    table.append_partitioned(
        events.filter(F.col("ts") < cutoff), ["event_type"]
    )
    old_files = set(table._manifest(0)["files"])
    table.append_partitioned(
        events.filter(F.col("ts") >= cutoff), ["user_id"]
    )
    # Evolution contract: v1 carries v0's files untouched, and the two
    # commits record their own specs.
    assert old_files <= set(table._manifest(1)["files"])
    assert [m.get("spec") for m in table.history()] == [
        ["event_type"], ["user_id"]
    ]
    return table.read().groupBy(
        "event_type", F.year("ts").cast("bigint").alias("yr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        r6(F.sum("value")).alias("total_value"),
    )


@register(
    "snk18_stats_pruned_scan",
    # Manifest-stats FILE SKIPPING (round 9) — the read-side payoff of
    # snk10's ZORDER: the layout rewrite now commits per-file min/max
    # stats on its z-ordered columns, so a band probe prunes files from
    # the MANIFEST alone (zero data I/O — at 100 TB the probe's cost is
    # O(files) driver metadata, not a scan), then applies the residual
    # predicate to the survivors. The in-query assertion pins that
    # pruning actually skipped files; the oracle states the band
    # aggregate over the raw table — pruning must be invisible to
    # results by construction.
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           (ROUND(SUM(value), 6) + 0.0) AS total_value
    FROM events
    WHERE value >= 10.0 AND value <= 20.0
    GROUP BY event_type
    """,
)
def snk18_stats_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from equity_volatility_lakehouse_platform_spark.sources.readers import (
        load_table,
    )

    events = load_table(spark, sf_dir, "events")
    path = session_scratch("snk18", sf_dir) + "/events_acid"
    table = AcidTable(spark, path)
    table.overwrite(events.repartition(6))   # value scattered everywhere
    table.optimize_zorder(["value"], target_files=6)
    keep, total = table.prune_files("value", 10.0, 20.0)
    assert len(keep) < total, "stats pruning skipped nothing"
    return (
        table.read_range("value", 10.0, 20.0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r6(F.sum("value")).alias("total_value"),
        )
    )


@register(
    "snk19_write_audit_publish",
    # Write-Audit-Publish (round 10) — the WAP ingestion pattern
    # (Netflix's Iceberg workflow; Delta's staging-table idiom): a
    # landing batch is WRITTEN to a staging table, AUDITED, and only
    # published to prod by an atomic commit when every expectation
    # holds — a poisoned batch is rejected wholesale and prod never
    # sees a partially-validated state. Exercised end to end: batch 1
    # (status F orders) passes and publishes; batch 2 carries injected
    # negative prices (keys % 5 = 0 of the O slice), trips the
    # positive-price expectation in AcidTable.append (one aggregate
    # pass computes every constraint), and is rejected; batch 3
    # (status P) publishes on top. The output pins both the per-batch
    # audit verdicts AND prod's final state (row count + money sum),
    # which must equal batches 1+3 exactly — the oracle recomputes the
    # same slices directly. Atomicity under crash/race is the ACID
    # layer's own pytest surface (test_acid).
    oracle=f"""
    WITH b1 AS (SELECT * FROM orders WHERE o_orderstatus = 'F'),
    b3 AS (SELECT * FROM orders WHERE o_orderstatus = 'P'),
    pub AS (SELECT * FROM b1 UNION ALL SELECT * FROM b3),
    audit AS (
      SELECT 1 AS batch, CAST((SELECT count(*) FROM b1) AS BIGINT)
               AS n_rows, TRUE AS published
      UNION ALL
      SELECT 2, CAST((SELECT count(*) FROM orders
                      WHERE o_orderstatus = 'O') AS BIGINT), FALSE
      UNION ALL
      SELECT 3, CAST((SELECT count(*) FROM b3) AS BIGINT), TRUE
    )
    SELECT batch, n_rows, published,
           CAST((SELECT count(*) FROM pub) AS BIGINT) AS prod_rows,
           (SELECT {_MONEY_SQL.format(col="o_totalprice")} FROM pub)
             AS prod_price_sum
    FROM audit
    """,
)
def snk19_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    from equity_volatility_lakehouse_platform_spark.sources.acid import (
        ExpectationViolation,
    )

    from equity_volatility_lakehouse_platform_spark.sources.sinks import (
        session_scratch,
    )

    orders = load_table(spark, sf_dir, "orders")
    # Reused-and-wiped per sf_dir (not a fresh mkdtemp): timed re-runs
    # must not accumulate staging/prod lake copies.
    root = session_scratch("snk19", sf_dir)
    staging = AcidTable(spark, root + "/staging")
    prod = AcidTable(spark, root + "/prod")
    rules = {
        "key_not_null": F.col("o_orderkey").isNotNull(),
        "price_positive": F.col("o_totalprice") > 0,
    }
    batches = [
        (1, orders.filter(F.col("o_orderstatus") == "F")),
        (
            2,
            orders.filter(F.col("o_orderstatus") == "O").withColumn(
                "o_totalprice",
                F.when(
                    F.col("o_orderkey") % 5 == 0,
                    -F.col("o_totalprice"),
                ).otherwise(F.col("o_totalprice")),
            ),
        ),
        (3, orders.filter(F.col("o_orderstatus") == "P")),
    ]
    audit_rows = []
    for batch_id, df in batches:
        staging.append(df)  # landing zone takes everything
        try:
            prod.append(df, expectations=rules)  # audit gates publish
            published = True
        except ExpectationViolation:
            published = False
        audit_rows.append((batch_id, df.count(), published))
    state = prod.read().agg(
        F.count(F.lit(1)).alias("prod_rows"),
        _money("o_totalprice").alias("prod_price_sum"),
    ).first()
    return spark.createDataFrame(
        [
            (b, n, p, state["prod_rows"], state["prod_price_sum"])
            for b, n, p in audit_rows
        ],
        "batch INT, n_rows BIGINT, published BOOLEAN, "
        "prod_rows BIGINT, prod_price_sum DOUBLE",
    )


@register(
    "snk20_incremental_view_maintenance",
    # Incremental view maintenance over the ACID change feed (round 11)
    # — the lakehouse pattern that keeps a downstream aggregate fresh
    # WITHOUT recomputing it: a per-status (count, money-sum) view is
    # initialized once, then each committed mutation (COW UPDATE, then
    # DELETE) publishes a row-level change feed (changes() — old image
    # as delete + new image as insert, cost proportional to the CHANGE,
    # not the table) that is folded into the view as signed deltas.
    # Counts are exact integers and money rides the DECIMAL(18,2)
    # device, so insert/delete images cancel EXACTLY — the maintained
    # view is bit-identical to a full recompute, which is precisely
    # what the oracle states (it recomputes the final table state from
    # the same key arithmetic: +1.5 on keys % 7, keys % 13 deleted).
    # At 100 TB: the view update scans only the touched files' change
    # rows and shuffles one tiny (status)-keyed delta — the whole point
    # of IVM vs the full groupBy it replaces.
    oracle=f"""
    WITH final AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.5
                  ELSE o_totalprice END AS price,
             o_orderstatus AS st
      FROM orders WHERE o_orderkey % 13 <> 0
    )
    SELECT st AS o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="price")} AS price_sum,
           CAST(2 AS BIGINT) AS n_delta_commits
    FROM final GROUP BY st
    """,
)
def snk20_incremental_view_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from equity_volatility_lakehouse_platform_spark.sources.sinks import (
        session_scratch,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = session_scratch("snk20", sf_dir)
    t = AcidTable(spark, root + "/orders_acid")
    v0 = t.overwrite(orders)

    cents = r2(F.col("o_totalprice")).cast("decimal(18,2)")
    view = AcidTable(spark, root + "/status_view")
    view.overwrite(
        t.read().groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents).cast("decimal(28,2)").alias("price_cents"),
        )
    )

    def _apply_delta(v_from: int, v_to: int) -> None:
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = (
            t.changes(v_from, v_to)
            .groupBy("o_orderstatus")
            .agg(
                F.sum(sign).cast("long").alias("d_n"),
                F.sum(sign.cast("decimal(18,2)") * cents)
                .cast("decimal(28,2)")
                .alias("d_cents"),
            )
        )
        cur = view.read()
        merged = (
            cur.join(delta, "o_orderstatus", "full")
            .select(
                "o_orderstatus",
                (
                    F.coalesce(F.col("n_orders"), F.lit(0))
                    + F.coalesce(F.col("d_n"), F.lit(0))
                ).cast("long").alias("n_orders"),
                (
                    F.coalesce(
                        F.col("price_cents"),
                        F.lit(0).cast("decimal(28,2)"),
                    )
                    + F.coalesce(
                        F.col("d_cents"), F.lit(0).cast("decimal(28,2)")
                    )
                ).cast("decimal(28,2)").alias("price_cents"),
            )
            .filter(F.col("n_orders") > 0)
        )
        view.overwrite(merged)

    v1 = t.update_where(
        F.col("o_orderkey") % 7 == 0,
        {"o_totalprice": F.col("o_totalprice") + F.lit(1.5)},
    )
    _apply_delta(v0, v1)
    v2 = t.delete_where(F.col("o_orderkey") % 13 == 0)
    _apply_delta(v1, v2)

    return view.read().select(
        "o_orderstatus",
        "n_orders",
        F.col("price_cents").cast("double").alias("price_sum"),
        F.lit(2).cast("long").alias("n_delta_commits"),
    )


@register(
    "snk21_minhash_signature_index",
    # Materialized MinHash signature INDEX (round 13) — the 100 TB
    # dedup shape measured in LSH_RECALL_500K_r13.json: the widened
    # signature costs real hash work (39.6s compute+write at 500k
    # docs), so production materializes it ONCE per corpus snapshot
    # and every banding consumer serves from the index scan instead of
    # re-shingling (d03 per-run 53.5s -> 26.9s). This registers the
    # full cycle as an engine surface: provision the width from the
    # corpus count (lsh_n_perm — the index carries the corpus's
    # provisioned signature), write the index under the session
    # scratch (wiped per process, sweep-hygienic), and serve d03
    # through sig_path. The oracle is d03's own: the index must be
    # result-invisible. tests/test_plans.py pins that a sig_path serve
    # plan scans the signature table and never touches documents.
)
def snk21_minhash_signature_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # NOTE (round-14, r13 ADVICE): this builder EXECUTES work at plan-
    # BUILD time — one documents count and the full signature
    # compute+write — because the returned plan must scan the already-
    # materialized index (that IS the surface under test). Explain-only
    # consumers and plan-shape tests pay that build; registry consumers
    # that want the lazy half should call d03 with sig_path directly.
    # The corpus count is computed ONCE here and threaded into d03.
    from equity_volatility_lakehouse_platform_spark.operators import (
        textops as tx,
    )
    from equity_volatility_lakehouse_platform_spark.plans.dedup import (
        d03_minhash_lsh_pairs,
        lsh_n_perm,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_docs = table_rows(sf_dir, "documents")
    n_perm = lsh_n_perm(n_docs)
    path = session_scratch("snk21", sf_dir) + "/sig_index"
    tx.minhash_signature(docs, n_perm=n_perm).write.mode(
        "overwrite"
    ).parquet(path)
    return d03_minhash_lsh_pairs(
        spark, sf_dir, sig_path=path, n_docs=n_docs
    )


def _snk21_oracle() -> None:
    from equity_volatility_lakehouse_platform_spark.plans import (
        dedup as _d,  # noqa: F401 — ensures d03's oracle is registered
    )
    from equity_volatility_lakehouse_platform_spark.plans import registry as _r

    _r.set_oracle(
        "snk21_minhash_signature_index",
        _r.all_oracles()["d03_minhash_lsh_pairs"],
    )


_snk21_oracle()


@register(
    "snk22_video_fingerprint_index",
    # Materialized VIDEO-FINGERPRINT index (round 14) — snk21's
    # materialize-once/serve-many cycle applied to d25, the registry's
    # most expensive query (17.5s at sf0.1, decode-bound: the ISO-BMFF
    # walk + per-sampled-frame PNG decode recomputed per run). The
    # builder runs the decode ONCE, writes the 192-bit clip
    # fingerprints (twelve 16-bit band words per doc) as a parquet
    # index under the session scratch, and serves d25 through fp_path —
    # every serve is then a column-pruned index scan + the hint-pinned
    # Hamming band join. The oracle is d25's own: the index must be
    # RESULT-INVISIBLE (the snk21 contract). Like snk21, the builder
    # EXECUTES the decode+write at plan-BUILD time by design — the
    # returned plan must scan the already-materialized index.
)
def snk22_video_fingerprint_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from equity_volatility_lakehouse_platform_spark.operators.multimodal import (
        synth_video_pair_payloads,
        video_fp_bands_frame,
    )
    from equity_volatility_lakehouse_platform_spark.plans.multimodal import (
        d25_perceptual_video_neardup,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = session_scratch("snk22", sf_dir) + "/video_fp_index"
    video_fp_bands_frame(synth_video_pair_payloads(docs)).write.mode(
        "overwrite"
    ).parquet(path)
    return d25_perceptual_video_neardup(spark, sf_dir, fp_path=path)


def _snk22_oracle() -> None:
    from equity_volatility_lakehouse_platform_spark.plans import (
        multimodal as _mm,  # noqa: F401 — ensures d25's oracle is registered
    )
    from equity_volatility_lakehouse_platform_spark.plans import registry as _r

    _r.set_oracle(
        "snk22_video_fingerprint_index",
        _r.all_oracles()["d25_perceptual_video_neardup"],
    )


_snk22_oracle()


@register(
    "snk23_ann_codebook_index",
    # Materialized TRAINED-QUANTIZER index (round 14) — snk21's
    # materialize-once/serve-many cycle for the ANN training leg.
    # Codebooks are a per-corpus-snapshot artifact: the K-scaled
    # training sample (max(2048, 8*K), round 13) made in-query training
    # strictly heavier to buy correctness past K=256, and that cost is
    # a BUILD cost, not a serve cost. The builder trains the coarse
    # quantizer (spherical k-means) and the PQ codebook ONCE, persists
    # both as parquet under the session scratch, and serves sim08
    # through cent_path/cb_path — every serve is then probe + ADC +
    # re-rank against codebook SCANS, zero Lloyd iterations. The oracle
    # is sim08's own: the persisted codebooks must be result-invisible
    # (the snk21 contract). Like snk21/snk22, the builder EXECUTES
    # training+write at plan-BUILD time by design.
)
def snk23_ann_codebook_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from equity_volatility_lakehouse_platform_spark.plans.similarity import (
        _emb,
        _ivf_emb,
        _pq_subspaces,
        ivf_train_centroids,
        pq_train_codebook,
        sim08_ivfadc_topk,
    )

    root = session_scratch("snk23", sf_dir)
    cent_path = root + "/coarse_centroids"
    cb_path = root + "/pq_codebook"
    ivf_train_centroids(
        _ivf_emb(spark, sf_dir), n_centroids=4, iters=2
    ).write.mode("overwrite").parquet(cent_path)
    pq_train_codebook(
        _pq_subspaces(_emb(spark, sf_dir), 16), n_centroids=16, iters=2
    ).write.mode("overwrite").parquet(cb_path)
    return sim08_ivfadc_topk(
        spark, sf_dir, cent_path=cent_path, cb_path=cb_path
    )


def _snk23_oracle() -> None:
    from equity_volatility_lakehouse_platform_spark.plans import (
        similarity as _sim,  # noqa: F401 — ensures sim08's oracle is registered
    )
    from equity_volatility_lakehouse_platform_spark.plans import registry as _r

    _r.set_oracle(
        "snk23_ann_codebook_index",
        _r.all_oracles()["sim08_ivfadc_topk"],
    )


_snk23_oracle()


@register(
    "snk24_delta_format_export",
    # Delta-FORMAT interop export (round 14 — VERDICT r13 "What's
    # missing" #2: artifacts this engine writes could not be opened by
    # independent engines). The cycle under test: transactional history
    # on the bespoke ACID log (overwrite + append + a copy-on-write
    # DELETE, so the log carries real remove actions), exported 1:1
    # into a spec-conformant Delta table (sources/delta_compat.py —
    # public delta.io PROTOCOL.md, data files HARD-LINKED so a 100 TB
    # export moves zero data bytes), a parquet checkpoint +
    # _last_checkpoint written, and the result read back THROUGH the
    # checkpointed Delta log. The oracle restates the surviving rows
    # from the source table directly — export, checkpoint and replay
    # must be result-invisible. tests/test_delta_compat.py adds the
    # foreign-engine half (DuckDB over a plain-json log replay) and
    # per-version time-travel parity.
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_MONEY_SQL.format(col="o_totalprice")} AS total_price
    FROM orders WHERE o_orderstatus <> 'F'
    GROUP BY o_orderstatus
    """,
)
def snk24_delta_format_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from equity_volatility_lakehouse_platform_spark.sources.delta_compat import (
        DeltaCompatTable,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = session_scratch("snk24", sf_dir)
    acid = AcidTable(spark, base + "/orders_acid")
    acid.overwrite(orders.filter(F.col("o_orderkey") % 3 != 0))
    acid.append(orders.filter(F.col("o_orderkey") % 3 == 0))
    acid.delete_where(F.col("o_orderstatus") == "F")
    delta = DeltaCompatTable(spark, base + "/orders_delta")
    delta.export_acid(acid)
    delta.checkpoint()
    back = delta.read()
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money("o_totalprice").alias("total_price"),
    )
