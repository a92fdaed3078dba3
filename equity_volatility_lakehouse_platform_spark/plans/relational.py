"""Core relational operator queries (SURVEY.md §2.2, §2.3, §2.4, §2.6-§2.8).

Each query re-expresses one reference operator over the testdata star
schema, Spark-first: declarative DataFrame plans that Catalyst compiles
to pushed-down parquet scans, broadcast/SMJ joins, partial aggregation.
Reference citations point at the behavior being reproduced.

Scale notes (100 TB design point): no collects, no global sorts except
top-k (TakeOrderedAndProject), dimension sides of joins are broadcast,
all aggregates are partial+final (map-side combine free from Catalyst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table
from equity_volatility_lakehouse_platform_spark.functions.rounding import r6, r6s


def _r6(col):
    return r6(col)


# ---------------------------------------------------------------------------
# Flagship: pricing-summary roll-up (scan -> filter -> agg), the shape of the
# reference's daily consolidation (my_alpaca.py:272-280) on lineitem.
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    # Money aggregates are EXACT and order-independent on both engines:
    # every per-row money term is an integer (cents x integer percent
    # factors, each product <= ~1e11 so it fits a 64-bit long), and the
    # sums accumulate in wide integer types (Spark DECIMAL(38,0) /
    # DuckDB HUGEINT) so no per-row decimal multiply is ever run and no
    # long-sum overflow is possible at cluster scale. Half-up rounding
    # to the 2dp money grain happens in the INTEGER domain
    # ((S + U/2) // U, all sums positive) before the single final
    # double division, so the int -> double conversion is exact.
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           SUM(l_quantity) AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sum_base_price,
           ((SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) + 50) // 100) / 100.0
               AS sum_disc_price,
           ((SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                 * (100 + CAST(ROUND(l_tax * 100, 0) AS BIGINT))) + 5000) // 10000) / 100.0
               AS sum_charge,
           (ROUND(SUM(l_quantity) / count(*), 6) + 0.0) AS avg_qty,
           (ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / count(*), 6) + 0.0) AS avg_price,
           (ROUND(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) / 100.0 / count(*), 6) + 0.0) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Money-sum strategy, exact at ANY scale, engine-identical, and cheap:
    # * each money term is a per-row LONG: for positive exactly-2dp
    #   inputs trunc(x*100 + 0.5) is the same integer as round(x*100)
    #   (the product sits within ~1e-8 of the integer grid) without
    #   Spark Round's per-row BigDecimal allocation; discount/tax become
    #   integer percents, so the full charge product
    #   cents x (100-d) x (100+t) is <= ~1.3e11 — long arithmetic inside
    #   whole-stage codegen, no decimal op anywhere in the hot path;
    # * accumulation stays in LONGS via a hi/lo split: each wide term is
    #   summed as (x >> 20) and (x & 0xFFFFF), recombined in DECIMAL(38,0)
    #   over the handful of OUTPUT groups. sum(lo) < n*2^20 and
    #   sum(hi) < n*1.3e11/2^20, so both fit a long up to ~9e12 rows PER
    #   GROUP — beyond the 100 TB design point (~6e11); past it, ANSI
    #   sum(long) fails loudly rather than wrapping;
    # * half-up rounding to money grain runs in the integer domain
    #   ((S + U/2) div U on a positive sum == round-half-up), so the
    #   final /100.0 divides an exactly-representable integer — one
    #   correctly-rounded double op on both engines.
    # A plain double SUM is summation-order-dependent: at 4e9 magnitude
    # the double spacing IS the 6th decimal (1-ulp flips seen at sf0.1),
    # and at cluster scale it isn't even run-to-run deterministic. A
    # DECIMAL accumulator is exact too but costs ~3x wall (profiled in
    # scripts/profile_q1.py); the split-long plan is exact at long speed.
    cents = lambda c: (F.col(c) * 100 + 0.5).cast("long")  # noqa: E731
    ep_c = cents("l_extendedprice")
    d100 = F.lit(100) - cents("l_discount")
    t100 = F.lit(100) + cents("l_tax")
    # Pre-project the shared products so codegen evaluates each ONCE per
    # row (the hi and lo aggregates both consume them).
    pre = li.filter(
        F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        ep_c.alias("_ep_c"),
        (ep_c * d100).alias("_disc_u"),
        (ep_c * d100 * t100).alias("_charge_u"),
        cents("l_discount").alias("_disc_c"),
    )
    LO = F.lit((1 << 20) - 1)
    base = pre.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("_ep_c").alias("_base_lo"),  # <= 1.3e7/row: longs to ~7e11 rows
        F.sum(F.col("_disc_u").bitwiseAND(LO)).alias("_disc_lo"),
        F.sum(F.shiftright("_disc_u", 20)).alias("_disc_hi"),
        F.sum(F.col("_charge_u").bitwiseAND(LO)).alias("_charge_lo"),
        F.sum(F.shiftright("_charge_u", 20)).alias("_charge_hi"),
        F.sum("_disc_c").alias("_disc_cents"),
    )
    # Recombine hi/lo in DECIMAL(38,0) — runs once per output group.
    def _recombine(hi: str, lo: str):
        return F.col(hi).cast("decimal(38,0)") * (1 << 20) + F.col(lo)

    base = base.select(
        "l_returnflag", "l_linestatus", "n_rows", "sum_qty",
        "_base_lo", "_disc_cents",
        _recombine("_disc_hi", "_disc_lo").alias("_disc_units"),
        _recombine("_charge_hi", "_charge_lo").alias("_charge_units"),
    )
    return base.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        "sum_qty",
        (F.col("_base_lo") / 100.0).alias("sum_base_price"),
        (F.expr("(_disc_units + 50) div 100") / 100.0).alias("sum_disc_price"),
        (F.expr("(_charge_units + 5000) div 10000") / 100.0).alias("sum_charge"),
        r6(F.col("sum_qty") / F.col("n_rows")).alias("avg_qty"),
        r6(F.col("_base_lo") / 100.0 / F.col("n_rows")).alias("avg_price"),
        r6(F.col("_disc_cents") / 100.0 / F.col("n_rows")).alias("avg_disc"),
    )


# §2.2 Projections / filters / predicates
# ---------------------------------------------------------------------------

@register(
    "p01_project_reorder",
    oracle="SELECT c_custkey, c_mktsegment, c_name, c_acctbal FROM customer",
)
def p01_project_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Column select/reorder (my_stock_functions.py:48,102-106; my_eodhd.py:42).
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_custkey", "c_mktsegment", "c_name", "c_acctbal")


@register(
    "p02_drop_columns",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def p02_drop_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Column drop incl. a nonexistent name — Spark drop is lenient, matching
    # the reference's drop of absent `day_open` (fase_2.ipynb:113 cell 6).
    li = load_table(spark, sf_dir, "lineitem")
    return li.drop(
        "l_partkey", "l_suppkey", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate", "day_open_nonexistent",
    )


@register(
    "p03_bulk_rename",
    oracle="""
    SELECT p_partkey AS part_key, p_name AS part_name, p_brand AS brand,
           p_retailprice AS retail_price
    FROM part
    """,
)
def p03_bulk_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bulk PascalCase->snake_case renames (my_eodhd.py:63-82,124-137).
    part = load_table(spark, sf_dir, "part")
    return part.select("p_partkey", "p_name", "p_brand", "p_retailprice").withColumnsRenamed(
        {
            "p_partkey": "part_key",
            "p_name": "part_name",
            "p_brand": "brand",
            "p_retailprice": "retail_price",
        }
    )


@register(
    "p04_isin_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def p04_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IN-list filter (my_eodhd.py:24; fase_1.ipynb:121 cell 8).
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_custkey", "o_orderpriority").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )


@register(
    "p05_time_range_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 23:59:59'
    """,
)
def p05_time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range trim on time (my_alpaca.py:165-170; docx DELETE < 2016).
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_shipdate").filter(
        F.col("l_shipdate").between(
            F.lit("1997-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 23:59:59").cast("timestamp"),
        )
    )


@register(
    "p06_time_of_day_filter",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE (EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts)) >= 240
      AND (EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts)) < 570
    """,
)
def p06_time_of_day_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Premarket 04:00 <= t < 09:30 mask (my_stock_functions.py:561-566).
    ev = load_table(spark, sf_dir, "events")
    minute_of_day = F.hour("ts") * 60 + F.minute("ts")
    return ev.select("event_id", "ts", "user_id", "event_type", "value").filter(
        (minute_of_day >= 240) & (minute_of_day < 570)
    )


@register(
    "p07_weekday_filter",
    oracle="""
    SELECT event_id, ts, user_id
    FROM events
    WHERE dayofweek(ts) BETWEEN 1 AND 5
    """,
)
def p07_weekday_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Drop weekends (alpa.py:126-127; fase_1.ipynb:169 cell 11).
    # Spark dayofweek: 1=Sun..7=Sat; DuckDB dayofweek: 0=Sun..6=Sat.
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "ts", "user_id").filter(F.dayofweek("ts").between(2, 6))


@register(
    "p08_null_validity_probes",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                                    AS n_rows,
           CAST(count_if(o_orderdate IS NULL) AS BIGINT)               AS null_dates,
           CAST(count_if(TRY_CAST(o_orderpriority AS DOUBLE) IS NULL) AS BIGINT) AS bad_casts,
           CAST(count_if(o_totalprice < 0) AS BIGINT)                  AS negative_prices
    FROM orders
    """,
)
def p08_null_validity_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # docx validation probes: COUNT_IF(ts IS NULL), TRY_CAST ... IS NULL.
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_orderdate").isNull()).alias("null_dates"),
        F.count_if(F.col("o_orderpriority").try_cast("double").isNull()).alias("bad_casts"),
        F.count_if(F.col("o_totalprice") < 0).alias("negative_prices"),
    )


@register(
    "p09_regex_predicate",
    oracle=r"""
    SELECT c_custkey, c_name
    FROM customer
    WHERE regexp_matches(c_name, '[02468]$') OR length(c_name) > 18 OR c_name = ''
    """,
)
def p09_regex_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bad-ticker lexical rule: regexp_like(symbol,'[^A-Z]') OR length>5 OR ''
    # (docx symbol-check query), re-expressed on customer names.
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_custkey", "c_name").filter(
        F.regexp_like("c_name", F.lit("[02468]$"))
        | (F.length("c_name") > 18)
        | (F.col("c_name") == "")
    )


@register(
    "p10_masked_update",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN event_type = 'error' THEN 0.0 ELSE value END AS value_clean
    FROM events
    """,
)
def p10_masked_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Boolean-mask row update df.loc[mask,col]=v (my_alpaca.py:285-290) ->
    # declarative when/otherwise.
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "error", F.lit(0.0))
        .otherwise(F.col("value"))
        .alias("value_clean"),
    )


@register(
    "p11_vwap_repair",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount < 0.02 OR l_discount > 0.08
                THEN (ROUND((0.02 + 0.08) / 2, 6) + 0.0)
                ELSE l_discount END AS discount_repaired
    FROM lineitem
    """,
)
def p11_vwap_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    # docx repair: UPDATE ... SET vwap=(low+high)/2 WHERE vwap<low OR vwap>high,
    # as the declarative equivalent (Delta UPDATE at deploy time).
    li = load_table(spark, sf_dir, "lineitem")
    lo, hi = F.lit(0.02), F.lit(0.08)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(
            (F.col("l_discount") < lo) | (F.col("l_discount") > hi),
            r6((lo + hi) / 2),
        )
        .otherwise(F.col("l_discount"))
        .alias("discount_repaired"),
    )


@register(
    "p12_interval_membership_filter",
    oracle="""
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE TIMESTAMP '1998-06-15 00:00:00' BETWEEN o_orderdate
          AND o_orderdate + INTERVAL 90 DAY
    """,
)
def p12_interval_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Active-on-date membership: start<=d<=end (my_eodhd.py:54-60).
    orders = load_table(spark, sf_dir, "orders")
    probe = F.lit("1998-06-15 00:00:00").cast("timestamp")
    return orders.select("o_orderkey", "o_orderdate").filter(
        (probe >= F.col("o_orderdate"))
        & (probe <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
    )


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------

@register(
    "j01_equi_inner_join",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, l.l_linenumber,
           (ROUND(l.l_extendedprice * (1 - l.l_discount), 6) + 0.0) AS net_price
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def j01_equi_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # raw x adjusted inner merge on (symbol,timestamp) (my_alpaca.py:163):
    # fact-fact equi join; Catalyst picks SMJ/shuffled-hash, AQE may broadcast.
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "inner")
        .select(
            "o_orderkey",
            "o_orderdate",
            "l_linenumber",
            _r6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


@register(
    "j02_left_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
    """,
)
def j02_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grid left-join shape (fase_1.ipynb:209 cell 14): left side preserved,
    # unmatched rows null-extended.
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_orderstatus == "P")
    return cust.join(orders, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "j03_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def j03_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # symbols x timestamps grid (fase_1.ipynb:169 cell 11). Only ever on
    # dims; big grids are built with explode(sequence(...)) instead.
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(nation)


@register(
    "j04_range_clamp_join",
    oracle="""
    WITH bounds AS (
      SELECT l_orderkey,
             min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate
    FROM lineitem l JOIN bounds b ON l.l_orderkey = b.l_orderkey
    WHERE l.l_shipdate > b.first_ship AND l.l_shipdate < b.last_ship
    """,
)
def j04_range_clamp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grid clamped to per-symbol [min,max] (fase_1.ipynb:169 cell 11). The
    # reference joins the table to its own per-key bounds; in Spark the
    # bounds are an unordered window aggregate over the SAME rows — one
    # scan and one shuffle instead of aggregate + two-sided self-join
    # (identical rows out, ~3x faster at 10x scale).
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            F.min("l_shipdate").over(w).alias("_first"),
            F.max("l_shipdate").over(w).alias("_last"),
        )
        .filter((F.col("l_shipdate") > F.col("_first")) & (F.col("l_shipdate") < F.col("_last")))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@register(
    "j05_interval_tag_join",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, t.tier
    FROM part p
    LEFT JOIN (VALUES (0.0, 500.0, 'budget'),
                      (500.0, 1000.0, 'mid'),
                      (1000.0, 1500.0, 'premium'),
                      (1500.0, 1e9, 'luxury')) AS t(lo, hi, tier)
      ON p.p_retailprice >= t.lo AND p.p_retailprice < t.hi
    """,
)
def j05_interval_tag_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Point-in-range interval tagging (my_alpaca.py:283-290 python mask loop)
    # -> broadcast non-equi join against a tiny dimension (BNLJ, dim side
    # broadcast — the only sane physical plan at 100 TB fact scale).
    part = load_table(spark, sf_dir, "part")
    tiers = spark.createDataFrame(
        [(0.0, 500.0, "budget"), (500.0, 1000.0, "mid"),
         (1000.0, 1500.0, "premium"), (1500.0, 1e9, "luxury")],
        T.StructType([
            T.StructField("lo", T.DoubleType()),
            T.StructField("hi", T.DoubleType()),
            T.StructField("tier", T.StringType()),
        ]),
    )
    cond = (part.p_retailprice >= tiers.lo) & (part.p_retailprice < tiers.hi)
    return part.join(F.broadcast(tiers), cond, "left").select(
        "p_partkey", "p_retailprice", "tier"
    )


@register(
    "j06_drop_overlap_merge",
    oracle="""
    WITH base AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             (ROUND(SUM(o_totalprice), 6) + 0.0) AS total_spend
      FROM orders GROUP BY o_custkey
    ),
    feat AS (
      -- AVG = sum/count ratio: can land exactly on a 6dp .5 boundary
      -- (e.g. odd cents over a power-of-two count) -> nudged round.
      SELECT o_custkey,
             (ROUND(AVG(o_totalprice)
                    - sign(AVG(o_totalprice)) * 0.000000001, 6) + 0.0)
               AS total_spend
      FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    )
    SELECT b.o_custkey, b.n_orders, f.total_spend
    FROM base b LEFT JOIN feat f ON b.o_custkey = f.o_custkey
    """,
)
def j06_drop_overlap_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Feature-append merge where the right side wins on overlapping columns
    # (drop-then-merge, my_alpaca.py:308-335).
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), _r6(F.sum("o_totalprice")).alias("total_spend")
    )
    feat = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(r6s(F.avg("o_totalprice")).alias("total_spend"))
    )
    overlap = [c for c in base.columns if c in feat.columns and c != "o_custkey"]
    return base.drop(*overlap).join(feat, "o_custkey", "left").select(
        "o_custkey", "n_orders", "total_spend"
    )


@register(
    "j08_dim_enrichment_join",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation, r.r_name AS region
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def j08_dim_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Enrichment merge (alpa.py:336,381): snowflake dims, both broadcast.
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


@register(
    "j10_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def j10_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Implicit semi join `symbol in cons['symbol'].values` (my_alpaca.py:252).
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "j11_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j11_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Skip-if-exists memoization (my_alpaca.py:198-205) as a set operation:
    # plan only work that is not already present.
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------

@register(
    "a01_ordered_ohlcv_rollup",
    oracle="""
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           (ROUND(arg_min(value, ts), 6) + 0.0)  AS open,
           (ROUND(max(value), 6) + 0.0)          AS high,
           (ROUND(min(value), 6) + 0.0)          AS low,
           (ROUND(arg_max(value, ts), 6) + 0.0)  AS close,
           CAST(count(*) AS BIGINT)      AS n_events,
           (ROUND(SUM(value), 6) + 0.0)          AS total_value
    FROM events
    GROUP BY user_id, date_trunc('day', ts)
    """,
)
def a01_ordered_ohlcv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # THE core daily roll-up (my_alpaca.py:272-280): pandas first/last honor
    # sort order; Spark's first/last are order-nondeterministic, so we use
    # min_by/max_by keyed on the timestamp (SURVEY §7.5).
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            _r6(F.min_by("value", "ts")).alias("open"),
            _r6(F.max("value")).alias("high"),
            _r6(F.min("value")).alias("low"),
            _r6(F.max_by("value", "ts")).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            _r6(F.sum("value")).alias("total_value"),
        )
    )


@register(
    "a02_minmax_per_group",
    oracle="""
    SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def a02_minmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-symbol min/max timestamps (fase_1.ipynb:169; bars.py:371-374).
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )


@register(
    "a03_stats_per_group",
    oracle="""
    -- avg/stddev are order-dependent computed doubles -> nudged round
    -- (q10 convention); median of 2dp inputs is half-cent-exact -> plain.
    SELECT event_type,
           (ROUND(AVG(value) - sign(AVG(value)) * 0.000000001, 6) + 0.0)
             AS avg_value,
           (ROUND(median(value), 6) + 0.0)      AS median_value,
           (ROUND(stddev_samp(value)
                  - sign(stddev_samp(value)) * 0.000000001, 6) + 0.0)
             AS std_value
    FROM events GROUP BY event_type
    """,
)
def a03_stats_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mean/median/std per group (EDA notebooks; my_model.py:64-66 median fill).
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        r6s(F.avg("value")).alias("avg_value"),
        _r6(F.median("value")).alias("median_value"),
        r6s(F.stddev_samp("value")).alias("std_value"),
    )


@register(
    "a04_counts_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT)                 AS n,
           CAST(count(DISTINCT user_id) AS BIGINT)  AS n_users,
           CAST(count_if(value > 100) AS BIGINT)    AS n_big
    FROM events GROUP BY event_type
    """,
)
def a04_counts_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # count/nunique/value_counts/COUNT_IF (ingestion cell 9, docx).
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.count_if(F.col("value") > 100).alias("n_big"),
    )


@register(
    "a05_distinct_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def a05_distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct()/drop_duplicates (fase_1.ipynb:105; my_ishares.py:18).
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


@register(
    "a06_hhi_concentration",
    oracle="""
    SELECT user_id,
           (ROUND(SUM(value * value) / NULLIF(SUM(value) * SUM(value), 0), 6) + 0.0) AS hhi
    FROM events
    WHERE value > 0
    GROUP BY user_id
    """,
)
def a06_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HHI custom UDAF (my_stock_functions.py:569-576) — pure SQL, no UDF:
    # sum((v/sum v)^2) == sum(v^2)/sum(v)^2.
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.groupBy("user_id").agg(
        _r6(
            F.sum(F.col("value") * F.col("value"))
            / F.nullif(F.sum("value") * F.sum("value"), F.lit(0.0))
        ).alias("hhi")
    )


@register(
    "a08_threshold_count",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS BIGINT) AS n_above
    FROM events GROUP BY user_id
    """,
)
def a08_threshold_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (x > threshold).sum() per symbol (alpa.py:281-290).
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("value") > 150, 1).otherwise(0)).alias("n_above")
    )


@register(
    "a09_all_within_range",
    oracle="""
    SELECT user_id
    FROM events
    GROUP BY user_id
    HAVING bool_and(value BETWEEN 0 AND 250)
    """,
)
def a09_all_within_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keep symbols where ALL days are within [min,max] (alpa.py:269-279).
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.bool_and(F.col("value").between(0, 250)).alias("ok"))
        .filter("ok")
        .select("user_id")
    )


@register(
    "a10_pivot_table",
    oracle="""
    SELECT user_id,
           (ROUND(SUM(CASE WHEN event_type = 'click' THEN CAST(ROUND(value * 100, 0) AS BIGINT) END) / 100.0
                 / COUNT(CASE WHEN event_type = 'click' THEN value END)
                 - 0.000000001, 6) + 0.0) AS "click",
           (ROUND(SUM(CASE WHEN event_type = 'error' THEN CAST(ROUND(value * 100, 0) AS BIGINT) END) / 100.0
                 / COUNT(CASE WHEN event_type = 'error' THEN value END)
                 - 0.000000001, 6) + 0.0) AS "error",
           (ROUND(SUM(CASE WHEN event_type = 'purchase' THEN CAST(ROUND(value * 100, 0) AS BIGINT) END) / 100.0
                 / COUNT(CASE WHEN event_type = 'purchase' THEN value END)
                 - 0.000000001, 6) + 0.0) AS "purchase",
           (ROUND(SUM(CASE WHEN event_type = 'signup' THEN CAST(ROUND(value * 100, 0) AS BIGINT) END) / 100.0
                 / COUNT(CASE WHEN event_type = 'signup' THEN value END)
                 - 0.000000001, 6) + 0.0) AS "signup",
           (ROUND(SUM(CASE WHEN event_type = 'view' THEN CAST(ROUND(value * 100, 0) AS BIGINT) END) / 100.0
                 / COUNT(CASE WHEN event_type = 'view' THEN value END)
                 - 0.000000001, 6) + 0.0) AS "view"
    FROM events GROUP BY user_id
    """,
)
def a10_pivot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pivot_table(index=year, columns=month, values=..., aggfunc=mean)
    # (EDA - parte 1.ipynb:640 cell 17). Explicit pivot values keep the plan
    # single-pass (no extra distinct job) — required practice at scale.
    # Exact averages: BIGINT-cents sum / count (a double AVG is
    # summation-order-dependent; 1-ulp drift flips 6dp rounding at the
    # boundary — caught by the 10x sweep).
    ev = load_table(spark, sf_dir, "events")
    # +0.5-and-truncate == round for non-negative 2dp inputs, without
    # Spark Round's per-row BigDecimal (see q1 / functions/rounding.py).
    cents = (F.col("value") * 100 + 0.5).cast("long")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        # values are positive, so the toward-zero boundary nudge (_r6s
        # rationale) is a plain subtraction
        .agg(r6(F.sum(cents) / 100.0 / F.count("value") - F.lit(1e-9)))
    )


@register(
    "a11_quality_invariants",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)       AS bad_qty,
      CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)   AS neg_price,
      CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
      CAST(SUM(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT)             AS neg_tax,
      CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)    AS null_ship,
      CAST(SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS bad_flag
    FROM lineitem
    """,
)
def a11_quality_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The docx incongruence battery (8 SUM(CASE...) invariant probes) as one
    # single-pass data-quality aggregate.
    li = load_table(spark, sf_dir, "lineitem")

    def probe(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    return li.agg(
        probe(F.col("l_quantity") <= 0, "bad_qty"),
        probe(F.col("l_extendedprice") < 0, "neg_price"),
        probe((F.col("l_discount") < 0) | (F.col("l_discount") > 1), "bad_discount"),
        probe(F.col("l_tax") < 0, "neg_tax"),
        probe(F.col("l_shipdate").isNull(), "null_ship"),
        probe(~F.col("l_returnflag").isin("A", "N", "R"), "bad_flag"),
    )


@register(
    "a12_argmax_per_group",
    oracle="""
    SELECT event_type, event_id AS top_event_id, (ROUND(value, 6) + 0.0) AS top_value
    FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def a12_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # idxmax per group (EDA - parte 2.ipynb cells 13,20) -> max_by with an
    # (value, id) tiebreak for determinism.
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", F.struct("value", "event_id")).alias("top_event_id"),
        _r6(F.max("value")).alias("top_value"),
    )


@register(
    "a13_grouped_sample_topn",
    oracle="""
    SELECT event_type, event_id
    FROM (
      SELECT event_type, event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ((event_id % 1000000007) * 2654435761) % 1000000007, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def a13_grouped_sample_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # groupby().sample(n=5, random_state=75) (my_alpaca.py:241-246). Spark
    # rand() can't bit-match pandas, so the engine uses a deterministic
    # multiplicative-hash ordering (Knuth) — same distribution, seedable,
    # reproducible across engines and retries (critical for 100 TB re-runs).
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    # Reduce mod p BEFORE the Knuth multiply: keeps the product under
    # 2^63 for ANY event_id (raw 1e9-scale ids x 2654435761 overflow
    # int64 under ANSI; DuckDB silently widens to int128 — caught by the
    # 10x sweep). Identical ordering for ids < p.
    key = ((F.col("event_id") % F.lit(1000000007)) * F.lit(2654435761)) % F.lit(1000000007)
    w = Window.partitionBy("event_type").orderBy(key, "event_id")
    return (
        ev.select("event_type", "event_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id")
    )


@register(
    "a14_summary_stats",
    oracle="""
    -- mean/std are order-dependent ratios/computed doubles -> nudged
    -- round (q10 convention); min/max of 2dp inputs stay plain.
    SELECT 'value' AS col,
           CAST(count(value) AS BIGINT) AS n,
           (ROUND(AVG(value) - sign(AVG(value)) * 0.000000001, 6) + 0.0)
             AS mean,
           (ROUND(stddev_samp(value)
                  - sign(stddev_samp(value)) * 0.000000001, 6) + 0.0)
             AS std,
           (ROUND(min(value), 6) + 0.0)         AS min,
           (ROUND(max(value), 6) + 0.0)         AS max
    FROM events
    UNION ALL
    SELECT 'o_totalprice' AS col,
           CAST(count(o_totalprice) AS BIGINT),
           (ROUND(AVG(o_totalprice)
                  - sign(AVG(o_totalprice)) * 0.000000001, 6) + 0.0),
           (ROUND(stddev_samp(o_totalprice)
                  - sign(stddev_samp(o_totalprice)) * 0.000000001, 6) + 0.0),
           (ROUND(min(o_totalprice), 6) + 0.0),
           (ROUND(max(o_totalprice), 6) + 0.0)
    FROM orders
    """,
)
def a14_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # df.describe()/summary() (ingestion cell 9) with a typed schema instead
    # of Spark's all-string summary() output.
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    def describe(df: DataFrame, col: str) -> DataFrame:
        return df.agg(
            F.lit(col).alias("col"),
            F.count(col).alias("n"),
            r6s(F.avg(col)).alias("mean"),
            r6s(F.stddev_samp(col)).alias("std"),
            _r6(F.min(col)).alias("min"),
            _r6(F.max(col)).alias("max"),
        )

    return describe(ev, "value").unionByName(describe(orders, "o_totalprice"))


# ---------------------------------------------------------------------------
# §2.6 Sorts / top-k; §2.7 set ops
# ---------------------------------------------------------------------------

@register(
    "o04_topk",
    oracle="""
    SELECT user_id, (ROUND(SUM(value), 6) + 0.0) AS total_value
    FROM events GROUP BY user_id
    ORDER BY total_value DESC, user_id
    LIMIT 5
    """,
)
def o04_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nlargest(5) (EDA - parte 2.ipynb cells 13,20) — Catalyst compiles
    # orderBy+limit to TakeOrderedAndProject (no global sort at scale).
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(_r6(F.sum("value")).alias("total_value"))
        .orderBy(F.desc("total_value"), "user_id")
        .limit(5)
    )


@register(
    "o03_deterministic_sample_limit",
    oracle="""
    SELECT user_id FROM (
      SELECT DISTINCT user_id FROM events
    ) ORDER BY (user_id * 2654435761) % 1000000007, user_id
    LIMIT 10
    """,
)
def o03_deterministic_sample_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy(rand()).limit(10) symbol sampling (fase_1.ipynb:105 cell 7),
    # deterministic-hash variant (see a13 rationale).
    ev = load_table(spark, sf_dir, "events")
    key = (F.col("user_id") * F.lit(2654435761)) % F.lit(1000000007)
    return (
        ev.select("user_id").distinct().orderBy(key, "user_id").limit(10).select("user_id")
    )


@register(
    "o05_tail_per_group",
    oracle="""
    SELECT user_id, event_id, ts FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn <= 4
    """,
)
def o05_tail_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tail(d) last-d-rows per symbol (alpa.py:322,367).
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("user_id", "event_id", "ts", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 4)
        .select("user_id", "event_id", "ts")
    )


@register(
    "u01_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'high' AS bucket
    FROM orders WHERE o_totalprice > 300000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'low' AS bucket
    FROM orders WHERE o_totalprice < 20000
    """,
)
def u01_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pd.concat frame stacking (my_eodhd.py:44; alpa.py:82,111,266).
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 300000).select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("bucket")
    )
    lo = orders.filter(F.col("o_totalprice") < 20000).select(
        "o_orderkey", "o_totalprice", F.lit("low").alias("bucket")
    )
    return hi.unionByName(lo)


@register(
    "u03_intersect_except",
    oracle="""
    SELECT user_id, 'both' AS membership FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT user_id, 'purchase_only' AS membership FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    )
    """,
)
def u03_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Intersect/except — unused by the reference but part of our exposed
    # set-op surface (SURVEY §2.7 note).
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    err = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    both = purch.intersect(err).select("user_id", F.lit("both").alias("membership"))
    only = purch.exceptAll(err).select("user_id", F.lit("purchase_only").alias("membership"))
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# §2.8 Scalar function surface
# ---------------------------------------------------------------------------

@register(
    "sc01_string_functions",
    oracle="""
    SELECT p_partkey,
           replace(p_name, ' ', '_')                   AS name_snake,
           upper(p_brand)                              AS brand_upper,
           CAST(length(p_name) AS BIGINT)              AS name_len,
           regexp_replace(p_type, '[aeiou]', '', 'g')  AS type_novowels,
           substr(p_name, 1, 5)                        AS name_prefix
    FROM part
    """,
)
def sc01_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Suffix strip / replace / regexp_replace / length (ingestion cell 10,
    # my_alpaca.py:227,302, docx). NOTE: Spark regexp_replace is global by
    # default; DuckDB needs the 'g' flag.
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_type", "[aeiou]", "").alias("type_novowels"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
    )


@register(
    "sc02_datetime_functions",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(year FROM ts) AS BIGINT)    AS y,
           CAST(EXTRACT(month FROM ts) AS BIGINT)   AS m,
           CAST(EXTRACT(day FROM ts) AS BIGINT)     AS d,
           CAST(EXTRACT(hour FROM ts) AS BIGINT)    AS h,
           dayname(ts)                              AS weekday,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
           CAST(ts + INTERVAL 1 DAY AS TIMESTAMP)   AS next_day
    FROM events
    """,
)
def sc02_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tz/floor/day_name/year/month + Timedelta arithmetic (§2.8 date/time).
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.date_format("ts", "EEEE").alias("weekday"),
        F.date_trunc("day", "ts").alias("day_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("next_day"),
    )


@register(
    "sc03_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (ROUND(ln(l_extendedprice), 6) + 0.0)                       AS log_price,
           ROUND(sin(2 * pi() * l_linenumber / 7), 6) + 0.0    AS line_sin,
           ROUND(cos(2 * pi() * l_linenumber / 7), 6) + 0.0    AS line_cos,
           (ROUND(greatest(l_discount, l_tax), 6) + 0.0)               AS max_rate,
           (ROUND(least(l_discount, l_tax), 6) + 0.0)                  AS min_rate,
           CASE WHEN l_quantity = 0 THEN 0.0
                ELSE (ROUND(l_extendedprice / l_quantity
                           - sign(l_extendedprice / l_quantity) * 0.000000001, 6) + 0.0)
           END AS unit_price
    FROM lineitem
    """,
)
def sc03_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # log / sin / cos cyclic encoding / greatest-least true-range pieces /
    # div-by-zero guard (my_stock_functions.py:85,477-478,346-350; alpa.py:42-46).
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _r6(F.log(F.col("l_extendedprice"))).alias("log_price"),
        # + 0.0 normalizes IEEE signed zero (-0.0 + 0.0 == +0.0): DuckDB's
        # (ROUND(sin(2*pi),6) + 0.0) yields -0.0 where Spark yields +0.0, and a
        # byte-exact hash comparison distinguishes them even though == doesn't.
        (_r6(F.sin(2 * 3.141592653589793 * F.col("l_linenumber") / 7)) + F.lit(0.0)).alias("line_sin"),
        (_r6(F.cos(2 * 3.141592653589793 * F.col("l_linenumber") / 7)) + F.lit(0.0)).alias("line_cos"),
        _r6(F.greatest("l_discount", "l_tax")).alias("max_rate"),
        _r6(F.least("l_discount", "l_tax")).alias("min_rate"),
        F.when(F.col("l_quantity") == 0, F.lit(0.0))
        .otherwise(
            # stable cross-engine round: price/qty can land exactly on a .5
            # boundary; the r6s nudge resolves it identically on both sides.
            r6s(F.col("l_extendedprice") / F.col("l_quantity"))
        )
        .alias("unit_price"),
    )


@register(
    "sc04_null_handling",
    oracle="""
    SELECT event_id,
           COALESCE(CASE WHEN event_type = 'error' THEN NULL ELSE value END, -1.0) AS value_filled,
           TRY_CAST(props AS DOUBLE) IS NULL AS props_not_numeric,
           NULLIF(event_type, 'view')        AS type_or_null
    FROM events
    """,
)
def sc04_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fillna/coalesce/try_cast/nullif (§2.8 null handling; docx TRY_CAST).
    ev = load_table(spark, sf_dir, "events")
    nulled = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    return ev.select(
        "event_id",
        F.coalesce(nulled, F.lit(-1.0)).alias("value_filled"),
        F.col("props").try_cast("double").isNull().alias("props_not_numeric"),
        F.nullif(F.col("event_type"), F.lit("view")).alias("type_or_null"),
    )


@register(
    "sc05_dict_map_recode",
    oracle="""
    SELECT n_nationkey, n_name,
           CASE n_regionkey WHEN 0 THEN 'Africa Zone' WHEN 1 THEN 'Americas Zone'
                            WHEN 2 THEN 'Asia Zone' WHEN 3 THEN 'Europe Zone'
                            ELSE 'Other Zone' END AS zone
    FROM nation
    """,
)
def sc05_dict_map_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # .map(dict) code->label recode (EDA notebooks) as a when-chain; at scale
    # a broadcast-joined mapping dim is equivalent.
    nation = load_table(spark, sf_dir, "nation")
    zone = (
        F.when(F.col("n_regionkey") == 0, "Africa Zone")
        .when(F.col("n_regionkey") == 1, "Americas Zone")
        .when(F.col("n_regionkey") == 2, "Asia Zone")
        .when(F.col("n_regionkey") == 3, "Europe Zone")
        .otherwise("Other Zone")
    )
    return nation.select("n_nationkey", "n_name", zone.alias("zone"))


@register(
    "sc06_tiered_threshold",
    oracle="""
    SELECT p_partkey, p_retailprice,
           CASE WHEN p_retailprice < 500 THEN 0.5
                WHEN p_retailprice < 1000 THEN 1.0
                WHEN p_retailprice < 1500 THEN 2.0
                WHEN p_retailprice < 2000 THEN 3.0
                ELSE 5.0 END AS target_delta
    FROM part
    """,
)
def sc06_tiered_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MyHelper.min_max_target price-tier thresholds (my_helper.py:2-24) — a
    # pure when-chain, no UDF (SURVEY §2.11).
    part = load_table(spark, sf_dir, "part")
    tiers = (
        F.when(F.col("p_retailprice") < 500, 0.5)
        .when(F.col("p_retailprice") < 1000, 1.0)
        .when(F.col("p_retailprice") < 1500, 2.0)
        .when(F.col("p_retailprice") < 2000, 3.0)
        .otherwise(5.0)
    )
    return part.select("p_partkey", "p_retailprice", tiers.alias("target_delta"))


# ---------------------------------------------------------------------------
# §2.1 S13 incremental scan planner
# ---------------------------------------------------------------------------

@register(
    "s13_incremental_plan",
    oracle="""
    SELECT user_id,
           max(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS last_seen_day,
           CAST(max(CAST(date_trunc('day', ts) AS TIMESTAMP)) + INTERVAL 1 DAY AS TIMESTAMP) AS fetch_from
    FROM events GROUP BY user_id
    """,
)
def s13_incremental_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental sync planner (bars.py:74-137): per-key max(date) -> next
    # fetch window. At deploy this feeds a MERGE INTO; here it's the plan.
    ev = load_table(spark, sf_dir, "events")
    last_day = F.max(F.date_trunc("day", "ts"))
    return ev.groupBy("user_id").agg(
        last_day.alias("last_seen_day"),
        (last_day + F.expr("INTERVAL 1 DAY")).alias("fetch_from"),
    )


# ---------------------------------------------------------------------------
# Late additions: A7 horizon returns, J7 daily alignment, O1 sort, SQL CTAS
# ---------------------------------------------------------------------------

@register(
    "a07_horizon_returns",
    oracle="""
    WITH tail7 AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn <= 7
    )
    SELECT user_id,
           -- ratios of 2dp values can land on a 6dp .5 boundary -> nudged
           (ROUND(arg_max(value, ts) / NULLIF(arg_min(value, ts), 0) - 1
                  - sign(arg_max(value, ts) / NULLIF(arg_min(value, ts), 0) - 1)
                    * 0.000000001, 6) + 0.0) AS ret_7,
           (ROUND(stddev_samp(value) / NULLIF(arg_min(value, ts), 0)
                  - sign(stddev_samp(value) / NULLIF(arg_min(value, ts), 0))
                    * 0.000000001, 6) + 0.0) AS std_rel_7,
           CAST(count(*) AS BIGINT) AS n
    FROM tail7 GROUP BY user_id
    """,
)
def a07_horizon_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouped-map horizon returns (alpa.py:319-336,364-381): tail(d) ->
    # last/first - 1 and std(value/first). std(v/first) == std(v)/first, so
    # the whole thing stays a plain aggregate — no applyInPandas needed.
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    tail7 = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 7)
    first_v = F.min_by("value", "ts")
    return tail7.groupBy("user_id").agg(
        # Ratios of 2dp values -> nudged round (q10 convention).
        r6s(F.max_by("value", "ts") / F.nullif(first_v, F.lit(0.0)) - 1).alias("ret_7"),
        r6s(F.stddev_samp("value") / F.nullif(first_v, F.lit(0.0))).alias("std_rel_7"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "j07_daily_alignment_join",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events
    ), pm_first AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             (ROUND(arg_min(value, ts), 6) + 0.0) AS first_pm_value
      FROM events WHERE EXTRACT(hour FROM ts) < 9 GROUP BY 1
    ), last_close AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             (ROUND(arg_max(value, ts), 6) + 0.0) AS last_value
      FROM events GROUP BY 1
    )
    SELECT d.day, p.first_pm_value, l.last_value
    FROM days d
    LEFT JOIN pm_first p ON d.day = p.day
    LEFT JOIN last_close l ON d.day = l.day
    """,
)
def j07_daily_alignment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Daily alignment joins (my_stock_functions.py:242-252,636,765): the
    # all-days spine left-joined with per-day first-premarket and last-close.
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    days = ev.select(day).distinct()
    pm_first = (
        ev.filter(F.hour("ts") < 9)
        .groupBy(day)
        .agg(_r6(F.min_by("value", "ts")).alias("first_pm_value"))
    )
    last_close = ev.groupBy(day).agg(_r6(F.max_by("value", "ts")).alias("last_value"))
    return days.join(pm_first, "day", "left").join(last_close, "day", "left")


@register(
    "o01_multikey_sort",
    oracle="""
    SELECT user_id, ts, event_id, value
    FROM events
    ORDER BY user_id, ts
    """,
)
def o01_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pervasive (symbol, timestamp) semantic sort (my_alpaca.py:122 etc.).
    # Global orderBy is for export/display only — inside the engine, order
    # lives in window specs (SURVEY §4: avoid range-partition exchanges).
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "ts", "event_id", "value").orderBy("user_id", "ts")


@register(
    "sql01_ctas_typed_parse",
    oracle="""
    SELECT event_id,
           strptime(replace(ts_raw, ' ', 'T'), '%Y-%m-%dT%H:%M:%S') AS ts_typed
    FROM (SELECT event_id,
                 strftime(CAST(date_trunc('second', ts) AS TIMESTAMP),
                          '%Y-%m-%d %H:%M:%S') AS ts_raw
          FROM events)
    """,
)
def sql01_ctas_typed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Athena CTAS typing step (docx): bronze stores the timestamp as a
    # string; from_iso8601_timestamp(regexp_replace(ts,' ','T')) types it.
    # Round-trips through a string column to exercise the real parse path.
    ev = load_table(spark, sf_dir, "events")
    bronze = ev.select(
        "event_id",
        F.date_format(F.date_trunc("second", "ts"), "yyyy-MM-dd HH:mm:ss").alias("ts_raw"),
    )
    return bronze.select(
        "event_id",
        F.to_timestamp(
            F.regexp_replace("ts_raw", " ", "T"), "yyyy-MM-dd'T'HH:mm:ss"
        ).alias("ts_typed"),
    )


@register(
    "o02_sort_by_value",
    oracle="""
    SELECT user_id, (ROUND(SUM(value), 6) + 0.0) AS total_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    ORDER BY total_value DESC, user_id
    """,
)
def o02_sort_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sort_values('importance', ascending=False) (my_model.py:103-110) —
    # value-ordered export of an aggregate. Full sort is intentional here
    # (export surface); analytical top-k uses o04 instead.
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            r6(F.sum("value")).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.desc("total_value"), "user_id")
    )


@register(
    "j13_bucketed_interval_join",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, t.tier
    FROM part p
    LEFT JOIN (VALUES (0.0, 500.0, 'budget'),
                      (500.0, 1000.0, 'mid'),
                      (1000.0, 1500.0, 'premium'),
                      (1500.0, 2500.0, 'luxury')) AS t(lo, hi, tier)
      ON p.p_retailprice >= t.lo AND p.p_retailprice < t.hi
    """,
)
def j13_bucketed_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The NON-broadcast interval join (scale path for J5): when the
    # interval dimension is too big to broadcast, explode each [lo, hi)
    # interval into fixed-width buckets and equi-join points on
    # floor(value/width) — a plain shuffled hash join, linear in
    # points + interval-bucket pairs, never a nested-loop scan. The
    # residual range predicate filters within the bucket.
    part = load_table(spark, sf_dir, "part")
    width = 250.0
    tiers = spark.createDataFrame(
        [(0.0, 500.0, "budget"), (500.0, 1000.0, "mid"),
         (1000.0, 1500.0, "premium"), (1500.0, 2500.0, "luxury")],
        "lo double, hi double, tier string",
    )
    # Interval side: one row per bucket the interval overlaps. hi is
    # exclusive, so the last bucket is floor((hi - width*1e-9)/width);
    # use ceil(hi/width)-1 via integer arithmetic on cents-free doubles.
    buckets = tiers.select(
        "lo", "hi", "tier",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / width).cast("long"),
                (F.ceil(F.col("hi") / width) - 1).cast("long"),
            )
        ).alias("bucket"),
    )
    pts = part.select(
        "p_partkey", "p_retailprice",
        F.floor(F.col("p_retailprice") / width).cast("long").alias("bucket"),
    )
    joined = pts.join(
        buckets,
        (pts.bucket == buckets.bucket)
        & (pts.p_retailprice >= buckets.lo)
        & (pts.p_retailprice < buckets.hi),
        "left",
    )
    return joined.select("p_partkey", "p_retailprice", "tier")


@register(
    "j14_salted_skew_join",
    oracle="""
    SELECT l.l_orderkey, l.l_extendedprice, o.o_orderstatus,
           CAST(o.o_custkey AS BIGINT) AS o_custkey
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity >= 45
    """,
)
def j14_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PARTIAL salting — the production skew pattern (SURVEY §4 / guide):
    # find the hottest join keys (tiny, broadcastable), split both sides on
    # that set, join the cold majority plainly, and only for the hot slice
    # salt the fact side K ways and replicate the other side's few matching
    # rows K times. Full-table replication (the naive form) multiplies the
    # whole other side by K; this multiplies ~100 rows. Result set is
    # IDENTICAL to the plain equi-join, which is what the oracle asserts.
    # (AQE skew-join does this adaptively at shuffle time; the explicit
    # form covers pre-AQE paths and streaming joins.)
    K = 8
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45).select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_custkey"
    )
    hot = (
        li.groupBy("l_orderkey")
        .count()
        .orderBy(F.desc("count"), "l_orderkey")
        .limit(100)
        .select(F.col("l_orderkey").alias("hot_key"))
    )
    li_hot = li.join(F.broadcast(hot), li.l_orderkey == hot.hot_key, "left_semi")
    li_cold = li.join(F.broadcast(hot), li.l_orderkey == hot.hot_key, "left_anti")
    ord_hot = orders.join(
        F.broadcast(hot), orders.o_orderkey == hot.hot_key, "left_semi"
    )
    cold = li_cold.join(orders, li_cold.l_orderkey == orders.o_orderkey)
    salted = li_hot.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_extendedprice"), F.lit(K))
    )
    replicated = ord_hot.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(K - 1)))
    )
    hot_joined = salted.join(
        replicated,
        (salted.l_orderkey == replicated.o_orderkey)
        & (salted._salt == replicated._salt),
    )
    out_cols = ["l_orderkey", "l_extendedprice", "o_orderstatus", "o_custkey"]
    return cold.select(*out_cols).unionByName(hot_joined.select(*out_cols))


@register(
    "a15_approx_sketches",
    # Sketch estimates are engine-specific, so the oracle checks error
    # BOUNDS, not values: DuckDB recomputes the exact answers (count,
    # distinct count, interpolated quantiles) and asserts the flags TRUE.
    # If a Spark sketch drifts outside its published tolerance the flag
    # flips FALSE and the value-hash mismatches — a real pass/fail bit.
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           (ROUND(quantile_cont(value, 0.5)
                  - sign(quantile_cont(value, 0.5)) * 0.000000001, 6) + 0.0)
             AS exact_median_value,
           (ROUND(quantile_cont(value, 0.99)
                  - sign(quantile_cont(value, 0.99)) * 0.000000001, 6) + 0.0)
             AS exact_p99_value,
           CAST(1 AS INTEGER) AS users_in_bound,
           CAST(1 AS INTEGER) AS median_in_bound,
           CAST(1 AS INTEGER) AS p99_in_bound
    FROM events GROUP BY event_type
    """,
)
def a15_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sketch aggregates for 100 TB interactive profiling: HyperLogLog++
    # distinct counts and streaming quantile sketches — constant memory
    # per group vs exact shuffles. Output couples each sketch to the
    # exact answer via an in-bound flag: HLL (rsd=0.02) within 5%
    # relative; quantile sketches (order statistics with rank error
    # <= 1e-4) bracketed by exact quantiles at +/-1% RANK — a value
    # bound would be wrong for thin tails, where adjacent order stats
    # sit far apart. The error is additionally bounded in
    # tests/test_domain.py.
    ev = load_table(spark, sf_dir, "events")
    qs = F.percentile("value", F.array(*[F.lit(p) for p in (0.45, 0.5, 0.55, 0.98, 0.99)]))
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
        qs.alias("q"),
        F.max("value").alias("vmax"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median"),
        F.percentile_approx("value", 0.99, 10000).alias("approx_p99"),
    )
    nudge6 = lambda c: r6(c - F.signum(c) * F.lit(1e-9))  # noqa: E731
    bracket = lambda v, lo, hi: ((v >= lo) & (v <= hi)).cast("int")  # noqa: E731
    return agg.select(
        "event_type",
        "n",
        "exact_users",
        nudge6(F.col("q")[1]).alias("exact_median_value"),
        nudge6(F.col("q")[4]).alias("exact_p99_value"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        )
        .cast("int")
        .alias("users_in_bound"),
        bracket(F.col("approx_median"), F.col("q")[0], F.col("q")[2]).alias(
            "median_in_bound"
        ),
        bracket(F.col("approx_p99"), F.col("q")[3], F.col("vmax")).alias(
            "p99_in_bound"
        ),
    )


@register(
    "q3_shipping_priority",
    oracle="""
    WITH g AS (
      SELECT l.l_orderkey,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS raw_revenue,
             o.o_orderdate
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l.l_orderkey, o.o_orderdate
    )
    SELECT l_orderkey,
           (ROUND(raw_revenue - sign(raw_revenue) * 0.000000001, 6) + 0.0)
             AS revenue,
           o_orderdate
    FROM g
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q3 shape: selective dims filter EARLY (pushdown), the fact
    # joins shuffle on the key, top-k compiles to TakeOrderedAndProject
    # (never a global sort). customer is the small side -> broadcast.
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        # Order-dependent double SUM -> nudged round (q10 convention).
        .agg(r6s(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    WITH g AS (
      SELECT n.n_name,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS raw_revenue
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY n.n_name
    )
    SELECT n_name,
           (ROUND(raw_revenue - sign(raw_revenue) * 0.000000001, 6) + 0.0)
             AS revenue
    FROM g
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5 shape: a six-table join where every dimension chain
    # (region->nation->supplier, customer) broadcasts into the fact
    # pipeline — one shuffle for the final groupBy, zero for the joins.
    t = {n: load_table(spark, sf_dir, n)
         for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    asia = t["region"].filter(F.col("r_name") == "ASIA").select("r_regionkey")
    nat = (
        t["nation"]
        .join(F.broadcast(asia), t["nation"].n_regionkey == asia.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    sup = (
        t["supplier"]
        .join(F.broadcast(nat), t["supplier"].s_nationkey == nat.n_nationkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .join(
            F.broadcast(sup),
            (t["lineitem"].l_suppkey == sup.s_suppkey)
            & (t["customer"].c_nationkey == sup.s_nationkey),
        )
        .groupBy("n_name")
        # Order-dependent double SUM -> nudged round (q10 convention).
        .agg(r6s(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q6 shape: pure filter+aggregate — every predicate reaches the
    # parquet scan (PushedFilters), projection prunes to 4 columns, and
    # the aggregate is a map-side partial + single-row final.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # exact DECIMAL product sum (see q1); (8,2)x(4,2)->(13,4)
            # stays on the Long-backed fast path. Scale-4 sums convert to
            # double exactly below 9e14 — fine at any plausible SF.
            F.sum(
                F.col("l_extendedprice").cast("decimal(8,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "a16_rollup_cube",
    oracle="""
    SELECT COALESCE(event_type, '<all>') AS event_type,
           COALESCE(CAST(EXTRACT(year FROM ts) AS BIGINT), -1) AS yr,
           CAST(count(*) AS BIGINT) AS n,
           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY ROLLUP (event_type, EXTRACT(year FROM ts))
    """,
)
def a16_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouping-sets surface (SURVEY §2.4 note: unused by the reference,
    # free in Spark). ROLLUP computes all prefixes of the grouping in one
    # shuffle — the subtotal pattern the EDA notebooks emulate by re-running
    # groupbys.
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.rollup("event_type", F.year("ts").cast("long").alias("yr"))
        # BIGINT-cents sum: exact and order-independent (see a10/q1)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # +0.5-and-truncate cents: round-equivalent for non-negative
            # 2dp values, no per-row BigDecimal.
            (F.sum((F.col("value") * 100 + 0.5).cast("long")) / 100.0).alias(
                "total_value"
            ),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("yr", F.lit(-1)).alias("yr"),
            "n",
            "total_value",
        )
    )


@register(
    "a17_correlation_matrix",
    oracle="""
    SELECT 'price_vs_quantity' AS pair,
           (ROUND(corr(l_extendedprice, l_quantity), 6) + 0.0) AS r
    FROM lineitem
    UNION ALL
    SELECT 'price_vs_discount',
           (ROUND(corr(l_extendedprice, l_discount), 6) + 0.0)
    FROM lineitem
    UNION ALL
    SELECT 'quantity_vs_tax',
           (ROUND(corr(l_quantity, l_tax), 6) + 0.0)
    FROM lineitem
    """,
)
def a17_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EDA correlation matrix (EDA - parte 2.ipynb cell 10 df.corr()): all
    # pairwise Pearson r in ONE aggregation pass (corr is a partial-able
    # aggregate — no per-pair scans), unpivoted to rows.
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        r6(F.corr("l_extendedprice", "l_quantity")).alias("price_vs_quantity"),
        r6(F.corr("l_extendedprice", "l_discount")).alias("price_vs_discount"),
        r6(F.corr("l_quantity", "l_tax")).alias("quantity_vs_tax"),
    )
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("pair"), F.col(c).alias("r"))
            for c in ("price_vs_quantity", "price_vs_discount", "quantity_vs_tax")
        ]
    )
    return agg.select(F.explode(pairs).alias("p")).select("p.pair", "p.r")


@register(
    "q4_priority_exists",
    # TPC-H Q4's shape on this schema: per-priority order counts where a
    # correlated EXISTS probes the fact table (returned lineitems stand
    # in for late commits — the testdata carries no commit/receipt
    # dates). Reference: the notebook's "orders with at least one
    # flagged fill" screens (fase_2 filters).
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXISTS compiles to a left-semi join: the probe side is filtered
    # (l_returnflag pushed to the scan) and deduplicated by the semi
    # semantics — never a row-multiplying inner join. One shuffle for
    # the semi join (both sides key-partitioned on orderkey), one for
    # the tiny groupBy.
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    flagged = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        orders.join(flagged, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q12_priority_mix",
    # TPC-H Q12's conditional two-way aggregation, keyed on returnflag
    # (no shipmode in this schema): per flag, how many of the matched
    # orders are high- vs low-priority. Exercises join + CASE-counting
    # in one pass.
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fact-fact equi-join on the shared key with the date filter pushed
    # to the lineitem scan; the CASE counters fold into ONE map-side
    # partial aggregation (no per-branch passes).
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, "l_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "sc07_json_extract",
    # Semi-structured scan surface: the events.props column is a JSON
    # string; both engines parse it per row and agree on the integer
    # payload exactly. Spark side uses a SCHEMA'D from_json (the
    # Catalyst-friendly path — the parsed struct prunes to the one
    # field); the oracle uses DuckDB's JSON extension.
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           -- integer-sum / count ratio can land on a 6dp .5 boundary
           (ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT))
                  - sign(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)))
                    * 0.000000001, 6) + 0.0) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def sc07_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Schema-on-read over a JSON payload column: from_json with an
    # explicit schema keeps the parse JVM-side and lets Catalyst prune
    # the struct to the referenced field (vs get_json_object's per-path
    # re-parse when several fields are read). Integer payloads keep the
    # sums exact; only the avg is rounded.
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        ev.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_k").alias("sum_k"),
            F.max("_k").alias("max_k"),
            r6s(F.avg("_k")).alias("avg_k"),
        )
    )


_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)


@register(
    "a18_table_profile",
    # Per-column data-quality profile in ONE scan. min/max are emitted as
    # text — verified format-identical across engines for every profiled
    # type (bigint, double shortest-repr, timestamp, varchar).
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_text,
           CAST(max({c}) AS VARCHAR) AS max_text
    FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def a18_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The profiling pass every lakehouse ingestion runs (null rates,
    # cardinalities, value ranges per column). All six columns profile in
    # ONE aggregation: Spark plans the multiple exact COUNT(DISTINCT)s
    # with a single Expand (one scan, rows x |cols| expansion — the
    # standard profiling cost; swap in approx_count_distinct to make the
    # expansion collapse when ±2% cardinalities are acceptable at
    # 100 TB). The single wide row is then unpivoted executor-side.
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"_cnt_{c}"),
            F.count_distinct(F.col(c)).alias(f"_dst_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    wide = orders.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_cnt_{c}")).alias("n_null"),
                F.col(f"_dst_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_text"),
                F.col(f"_max_{c}").alias("max_text"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


@register(
    "o06_keyset_pagination",
    # Keyset (seek-method) pagination: the cursor predicate reaches the
    # parquet scan and the page LIMIT compiles to TakeOrderedAndProject
    # — O(page) work per request at any table size, where OFFSET-based
    # paging degrades linearly with page number.
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderkey > 40000
    ORDER BY o_orderkey
    LIMIT 100
    """,
)
def o06_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") > 40000)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


@register(
    "u04_union_schema_drift",
    # Schema-drift union (two feeds of the same logical table with
    # different column sets): unionByName(allowMissingColumns=True)
    # pads the gaps with NULL — DuckDB's UNION ALL BY NAME is the exact
    # mirror. The shape every multi-source ingestion hits when one
    # upstream adds a column first.
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(o_totalprice) AS BIGINT) AS n_with_price,
           CAST(count(o_orderpriority) AS BIGINT) AS n_with_priority
    FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL BY NAME
      SELECT o_orderkey, o_orderstatus, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1
    )
    GROUP BY o_orderstatus
    """,
)
def u04_union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    return (
        a.unionByName(b, allowMissingColumns=True)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("o_totalprice").alias("n_with_price"),
            F.count("o_orderpriority").alias("n_with_priority"),
        )
    )


@register(
    "a19_hll_distinct_bounds",
    # The HLL estimate itself is engine-specific, so the oracle asserts
    # the CONTRACT, not the value: the exact distinct count plus a
    # within-bounds flag that must read TRUE (rsd=0.02 => 5 pct is
    # ~2.5 sigma; a FALSE on either side fails the hash gate). Same
    # error-bound-oracle pattern as a15's sketches.
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS hll_within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def a19_hll_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cardinality sketching for 100 TB group-bys: approx_count_distinct
    # is a fixed-size HLL++ register set per group — mergeable map-side,
    # one shuffle, no distinct expansion — vs the exact path's
    # shuffle-the-keys cost. The query runs BOTH and proves the sketch
    # lands inside its advertised error envelope.
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_hll"),
    )
    within = (
        F.abs(F.col("n_hll") - F.col("n_exact"))
        <= F.lit(0.05) * F.col("n_exact")
    )
    return agg.select(
        "event_type",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        within.alias("hll_within_5pct"),
    )


@register(
    "a20_weighted_median",
    # Lower weighted median: smallest price whose cumulative quantity
    # reaches half the group total. The cumsum order is made fully
    # deterministic by the (price, orderkey, linenumber) tiebreak, and
    # quantities are integer-valued doubles, so both engines accumulate
    # the identical exact sums.
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_extendedprice,
             sum(l_quantity) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_qty,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot_qty
      FROM lineitem
    )
    SELECT l_returnflag,
           (ROUND(min(l_extendedprice), 6) + 0.0) AS weighted_median_price,
           CAST(min(tot_qty) AS BIGINT) AS total_qty
    FROM c
    WHERE cum_qty >= tot_qty / 2.0
    GROUP BY l_returnflag
    """,
)
def a20_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quantity-weighted median price per return flag — the order
    # statistic percentile_cont can't express once weights enter. One
    # shuffle on l_returnflag feeds BOTH window passes (running cumsum
    # and group total share the partitioning; Spark plans one exchange +
    # one sort), then the qualifying-rows reduction is a tiny groupBy.
    # Scale: the window partitions by a low-cardinality key, so at
    # cluster scale swap in a two-pass variant (per-partition partial
    # histograms, then merge) — the oracle pins the semantics either way.
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    c = li.select(
        "l_returnflag", "l_extendedprice",
        F.sum("l_quantity").over(wcum).alias("cum_qty"),
        F.sum("l_quantity").over(wall).alias("tot_qty"),
    )
    return (
        c.filter(F.col("cum_qty") >= F.col("tot_qty") / F.lit(2.0))
        .groupBy("l_returnflag")
        .agg(
            r6(F.min("l_extendedprice")).alias("weighted_median_price"),
            F.min("tot_qty").cast("bigint").alias("total_qty"),
        )
    )


@register(
    "a21_funnel_conversion",
    # Sequential funnel view -> click -> purchase: each stage's entry
    # time is the user's FIRST qualifying event at-or-after the previous
    # stage's entry. Stage t(n) depends on t(n-1), so the oracle chains
    # CTEs; rates are exact-integer divisions rounded at 6dp.
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= t1.t_view
      GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= t2.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM t1) AS n_view,
           (SELECT count(*) FROM t2) AS n_click,
           (SELECT count(*) FROM t3) AS n_purchase,
           (ROUND((SELECT count(*) FROM t2) * 1.0
                  / NULLIF((SELECT count(*) FROM t1), 0), 6) + 0.0)
             AS click_rate,
           (ROUND((SELECT count(*) FROM t3) * 1.0
                  / NULLIF((SELECT count(*) FROM t2), 0), 6) + 0.0)
             AS purchase_rate
    """,
)
def a21_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The stage times are whole-partition window aggregates over ONE
    # user_id exchange: t_view as a conditional min, then (in a second
    # projection, so the window output is a plain ref) t_click as a min
    # gated on ts >= t_view, then t_purchase likewise. Three chained
    # window frames, one shuffle, no self-joins — the CTE-per-stage
    # oracle shape would re-scan events once per stage. The final
    # stage-count reduction is a single-row global agg.
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    wu = Window.partitionBy("user_id")
    s1 = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("t_view")),
                F.col("ts"),
            )
        ).over(wu),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t_click")),
                F.col("ts"),
            )
        ).over(wu),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )
    return counts.select(
        "n_view", "n_click", "n_purchase",
        r6(
            F.col("n_click") * F.lit(1.0)
            / F.nullif(F.col("n_view"), F.lit(0)).cast("double")
        ).alias("click_rate"),
        r6(
            F.col("n_purchase") * F.lit(1.0)
            / F.nullif(F.col("n_click"), F.lit(0)).cast("double")
        ).alias("purchase_rate"),
    )


@register(
    "a22_cohort_retention",
    # Classic cohort-retention matrix: users are cohorted by the Monday
    # week of their FIRST signup; each later active week increments that
    # cohort's retention cell. Both engines truncate weeks to Monday and
    # the cells count DISTINCT users, so the matrix is integer-exact.
    oracle="""
    WITH cohort AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), activity AS (
      SELECT e.user_id, c.cohort_week,
             date_diff('day', c.cohort_week,
                       CAST(date_trunc('week', e.ts) AS TIMESTAMP)) // 7
               AS weeks_since
      FROM events e JOIN cohort c USING (user_id)
    )
    SELECT cohort_week, CAST(weeks_since AS BIGINT) AS weeks_since,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
    FROM activity WHERE weeks_since >= 0
    GROUP BY cohort_week, weeks_since
    """,
)
def a22_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle on user_id serves the cohort min AND the join back
    # (both sides hash-partition on the key); the distinct-user cell
    # count then re-shuffles only the (cohort, week, user) triples —
    # already deduplicated map-side. At 100 TB the cohort table is one
    # row per user (small relative to events) but still sharded, so the
    # join stays a co-partitioned shuffle join, not a broadcast.
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = ev.join(cohort, "user_id").select(
        "user_id", "cohort_week",
        (
            F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
            / 7
        ).cast("long").alias("weeks_since"),
    )
    return (
        activity.filter(F.col("weeks_since") >= 0)
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "q10_returned_items",
    # TPC-H Q10 shape: revenue lost to returned items, top-20 customers.
    # Ordering uses the ROUNDED revenue plus a c_custkey tiebreak so
    # near-equal revenues cannot reorder the cut across engines. The
    # revenue sum is a double accumulation whose order differs between
    # engines, so the round is the NUDGED r6s (sub-1e-9 summation-order
    # drift at a 6dp .5 boundary would otherwise flip the last digit at
    # some scale), mirrored in the oracle.
    oracle="""
    WITH base AS (
      SELECT c.c_custkey, c.c_name,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS raw_revenue,
             c.c_acctbal, n.n_name
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    )
    SELECT c_custkey, c_name,
           (ROUND(raw_revenue - sign(raw_revenue) * 0.000000001, 6) + 0.0)
             AS revenue,
           (ROUND(c_acctbal, 6) + 0.0) AS c_acctbal, n_name
    FROM base
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Physical strategy at 100 TB: the orderdate range filter pushes to
    # the orders scan and the returnflag filter to the lineitem scan
    # BEFORE the fact-fact shuffle join on orderkey; customer joins the
    # aggregated per-customer revenue (far smaller than lineitem) and
    # nation broadcasts. Top-20 on the rounded revenue compiles to
    # TakeOrderedAndProject.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-07-01 00:00:00").cast("timestamp")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    rev_per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("raw_revenue")
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = rev_per_cust.join(
        cust, rev_per_cust["o_custkey"] == cust["c_custkey"]
    ).join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        joined.select(
            "c_custkey", "c_name",
            r6s("raw_revenue").alias("revenue"),
            r6("c_acctbal").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_volume_orders",
    # TPC-H Q18 shape: orders whose total quantity clears a threshold
    # (HAVING subquery -> the same aggregate reused), with customer
    # attribution. Quantities are integer-valued doubles, so the sums
    # are exact in both engines; ordering ties break on o_orderkey.
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           (ROUND(o.o_totalprice, 6) + 0.0) AS o_totalprice,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    HAVING SUM(l.l_quantity) > 300
    ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The per-order quantity roll-up happens FIRST (one shuffle on
    # orderkey, map-side combined), the threshold filters it to a tiny
    # qualifying set, and only THEN do orders/customer join — at scale
    # the expensive fact table collapses to qualifying orders before any
    # dimension touches it. Top-100 is TakeOrderedAndProject.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    qual = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    joined = (
        qual.join(o, qual["l_orderkey"] == o["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            r6("o_totalprice").alias("o_totalprice"),
            F.col("total_qty").cast("bigint").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "a23_gini_concentration",
    # Gini coefficient of per-user traded value by event type (the
    # inequality complement to a06's HHI): rank-weighted closed form
    # G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over ascending per-user
    # totals. The rank order is fully deterministic (total, user_id), so
    # both engines weight identical ranks; the per-user totals are sums
    # of 2dp doubles — identical order via the deterministic groupBy?
    # No: groupBy sum order differs, so totals pass through a 6dp round
    # BEFORE ranking, making every downstream double bit-identical.
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id,
             (ROUND(SUM(value), 6) + 0.0) AS total
      FROM events GROUP BY event_type, user_id
    ), ranked AS (
      SELECT event_type, total,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY total, user_id) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n,
             SUM(total) OVER (PARTITION BY event_type) AS tot
      FROM per_user
    )
    SELECT event_type,
           CAST(min(n) AS BIGINT) AS n_users,
           (ROUND((2.0 * SUM(rk * total) / (min(n) * min(tot))
                   - (min(n) + 1.0) / min(n))
                  - sign(2.0 * SUM(rk * total) / (min(n) * min(tot))
                         - (min(n) + 1.0) / min(n)) * 0.000000001, 6) + 0.0)
             AS gini
    FROM ranked GROUP BY event_type
    """,
)
def a23_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle builds the per-user totals; the rank window partitions
    # by event_type over the ALREADY-AGGREGATED user table (one row per
    # user — orders of magnitude smaller than events); the final Gini
    # reduction is a tiny groupBy. sum(rk * total) is order-independent
    # up to FP, and since totals are pre-rounded and ranks exact ints,
    # the remaining sum drift (rank-weighted sum and the partition
    # total both accumulate in engine-specific order) is absorbed by the
    # nudged 6dp output round (r6s).
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        r6(F.sum("value")).alias("total")
    )
    wt = Window.partitionBy("event_type")
    ranked = per_user.select(
        "event_type", "total",
        F.row_number()
        .over(wt.orderBy("total", "user_id"))
        .alias("rk"),
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("total").over(wt).alias("tot"),
    )
    return ranked.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n_users"),
        r6s(
            F.lit(2.0) * F.sum(F.col("rk") * F.col("total"))
            / (F.min("n") * F.min("tot"))
            - (F.min("n") + F.lit(1.0)) / F.min("n")
        ).alias("gini"),
    )


def _r6_sql_expr(x: str) -> str:
    """The functions/rounding.r6 computation (DuckDB-bit-exact 6dp round)
    as Spark SQL TEXT over an arbitrary expression — for queries whose
    surface IS a SQL string (sql02). Same formula as rounding._round_sql,
    which only accepts a bare column reference."""
    y = f"(({x}) * 1.0E6D)"
    frac = f"({y} % 1.0D)"
    adj = (
        f"CASE WHEN {frac} >= 0.5D THEN 1.0D "
        f"WHEN {frac} <= -0.5D THEN -1.0D ELSE 0.0D END"
    )
    return (
        f"(CASE WHEN isnan({y}) OR abs({y}) = double('Infinity') "
        f"THEN {y} / 1.0E6D "
        f"ELSE (({y} - {frac}) + {adj}) / 1.0E6D END + 0.0D)"
    )


@register(
    "sql02_correlated_scalar",
    # Correlated scalar subquery through the SQL front end: orders whose
    # price clears 1.5x their OWN customer's average. Catalyst
    # decorrelates this into an aggregate + equi-join (never a per-row
    # subquery execution); the average is exact (ROUND'd at 6dp before
    # the comparison on BOTH sides so the threshold is the identical
    # double).
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           (ROUND(o.o_totalprice, 6) + 0.0) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      -- the rounded mean is a comparison THRESHOLD: a .5-boundary
      -- disagreement would flip row membership -> nudged round.
      SELECT (ROUND(AVG(o2.o_totalprice)
                    - sign(AVG(o2.o_totalprice)) * 0.000000001, 6) + 0.0)
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def sql02_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Registered as a temp view and expressed in SQL text (the surface a
    # migrating reference user actually types); the pre-comparison round
    # pins the per-customer mean bit-identical across engines (group
    # means accumulate in engine-specific order) — via the engine's
    # DuckDB-exact rounding EXPRESSION, not Spark's native ROUND (which
    # rounds the shortest decimal repr and can disagree on .5-boundary
    # means). At scale the rewrite is one per-customer aggregate + a
    # co-partitioned join — the same physical plan the a-family writes
    # by hand.
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sql02_orders"
    )
    try:
        return spark.sql(f"""
            SELECT o.o_orderkey, o.o_custkey,
                   {_r6_sql_expr("o.o_totalprice")} AS o_totalprice
            FROM sql02_orders o
            WHERE o.o_totalprice > 1.5 * (
              SELECT {_r6_sql_expr(
                  "AVG(o2.o_totalprice)"
                  " - sign(AVG(o2.o_totalprice)) * 0.000000001"
              )}
              FROM sql02_orders o2 WHERE o2.o_custkey = o.o_custkey
            )
        """)
    finally:
        spark.catalog.dropTempView("sql02_orders")


@register(
    "a24_mode_per_group",
    # Statistical mode with a deterministic tiebreak (most frequent
    # value; ties resolve to the SMALLEST value) — the categorical
    # summary the profile query (a18) stops short of. Two-level
    # aggregate: value counts, then argmin over (-n, value).
    oracle="""
    WITH c AS (
      SELECT event_type, value, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, value
    ), r AS (
      SELECT event_type, value, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, value) AS rk
      FROM c
    )
    SELECT event_type, (ROUND(value, 6) + 0.0) AS mode_value,
           n AS mode_count
    FROM r WHERE rk = 1
    """,
)
def a24_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both shuffles carry aggregated rows only: the (type, value) count
    # is map-side combined, and the mode reduction groups the count
    # table (distinct values per type, far smaller than events).
    # min_by's ordering key mirrors DuckDB's arg_min tuple: struct
    # comparison is lexicographic in both engines.
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("n"))
    return c.groupBy("event_type").agg(
        r6(
            F.min_by("value", F.struct((-F.col("n")).alias("a"), F.col("value").alias("b")))
        ).alias("mode_value"),
        F.max("n").alias("mode_count"),
    )


@register(
    "a25_welch_ttest",
    # Per-user Welch t-test of 'click' vs 'purchase' values — the A/B
    # primitive (unequal variances, Welch-Satterthwaite df). One
    # conditional aggregation computes both samples' moments in a single
    # pass; outputs take the nudged round (means/variances accumulate in
    # engine-specific order).
    oracle="""
    WITH m AS (
      SELECT user_id,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n2,
             AVG(value) FILTER (WHERE event_type = 'click') AS m1,
             AVG(value) FILTER (WHERE event_type = 'purchase') AS m2,
             var_samp(value) FILTER (WHERE event_type = 'click') AS v1,
             var_samp(value) FILTER (WHERE event_type = 'purchase') AS v2
      FROM events GROUP BY user_id
    )
    SELECT user_id, n1, n2,
           (ROUND(((m1 - m2) / NULLIF(sqrt(v1 / n1 + v2 / n2), 0.0))
                  - sign((m1 - m2) / NULLIF(sqrt(v1 / n1 + v2 / n2), 0.0))
                    * 0.000000001, 6) + 0.0) AS t_stat,
           (ROUND((POWER(v1 / n1 + v2 / n2, 2)
                   / NULLIF(POWER(v1 / n1, 2) / (n1 - 1)
                            + POWER(v2 / n2, 2) / (n2 - 1), 0.0))
                  - sign(POWER(v1 / n1 + v2 / n2, 2)
                         / NULLIF(POWER(v1 / n1, 2) / (n1 - 1)
                                  + POWER(v2 / n2, 2) / (n2 - 1), 0.0))
                    * 0.000000001, 6) + 0.0) AS df_welch
    FROM m WHERE n1 >= 2 AND n2 >= 2
    """,
)
def a25_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single map-side-combined groupBy carries all six moments (counts,
    # means, sample variances of both arms); the test statistic is a
    # pure projection over the aggregate — no second scan, no join. At
    # 100 TB this is exactly one shuffle of six doubles per user.
    ev = load_table(spark, sf_dir, "events")
    click = F.col("event_type") == "click"
    buy = F.col("event_type") == "purchase"
    m = ev.groupBy("user_id").agg(
        F.count(F.when(click, 1)).alias("n1"),
        F.count(F.when(buy, 1)).alias("n2"),
        F.avg(F.when(click, F.col("value"))).alias("m1"),
        F.avg(F.when(buy, F.col("value"))).alias("m2"),
        F.var_samp(F.when(click, F.col("value"))).alias("v1"),
        F.var_samp(F.when(buy, F.col("value"))).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    t = (F.col("m1") - F.col("m2")) / F.nullif(F.sqrt(se2), F.lit(0.0))
    df = F.pow(se2, 2) / F.nullif(
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1),
        F.lit(0.0),
    )
    staged = (
        m.filter((F.col("n1") >= 2) & (F.col("n2") >= 2))
        .select("user_id", "n1", "n2", t.alias("_t"), df.alias("_df"))
    )
    return staged.select(
        "user_id", "n1", "n2",
        r6s("_t").alias("t_stat"),
        r6s("_df").alias("df_welch"),
    )


import math as _math

# Benford first-digit probabilities, embedded as repr'd doubles on BOTH
# sides so neither engine's log10 libm rounding can differ.
_BENFORD = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_SQL = " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD.items()
)


@register(
    "a26_benford_audit",
    # Benford's-law first-digit audit of order totals — the fraud /
    # synthetic-data screen. The digit comes from the CASTed string's
    # first character (identical shortest-round-trip formatting in both
    # engines — a log10/floor extraction can flip at power-of-10
    # boundaries), counts are exact ints, and the chi-square term is one
    # double expression over them.
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS BIGINT)
               AS digit
      FROM orders WHERE o_totalprice >= 1.0
    ), c AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY digit
    ), t AS (SELECT SUM(n_obs) AS n FROM c)
    SELECT digit, n_obs,
           (ROUND(n * (CASE digit {_BENFORD_SQL} END), 6) + 0.0)
             AS n_expected,
           (ROUND(POWER(n_obs - n * (CASE digit {_BENFORD_SQL} END), 2)
                  / (n * (CASE digit {_BENFORD_SQL} END)), 6) + 0.0)
             AS chi2_term
    FROM c CROSS JOIN t
    """,
)
def a26_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One 9-key groupBy (map-side combined) + a one-row broadcast total;
    # the expected counts and chi-square terms are pure projections. At
    # 100 TB this reads one column and shuffles nine rows.
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1.0
    )
    digit = F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast(
        "bigint"
    )
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    t = c.agg(F.sum("n_obs").alias("n"))
    p = F.coalesce(
        *[
            F.when(F.col("digit") == d, F.lit(prob))
            for d, prob in _BENFORD.items()
        ]
    )
    j = c.crossJoin(F.broadcast(t)).select(
        "digit", "n_obs", (F.col("n") * p).alias("_exp")
    )
    return j.select(
        "digit", "n_obs",
        r6("_exp").alias("n_expected"),
        r6(
            F.pow(F.col("n_obs") - F.col("_exp"), 2) / F.col("_exp")
        ).alias("chi2_term"),
    )


@register(
    "u05_except_all",
    # Bag (multiset) semantics: EXCEPT ALL subtracts per-occurrence
    # multiplicities, and INTERSECT ALL keeps the min — the distinct
    # variants (u03) erase exactly the duplicate accounting this
    # verifies. Both engines implement the SQL-standard bag rules; the
    # output re-aggregates so the gate compares multiplicities, not row
    # ordering.
    oracle="""
    SELECT user_id, 'except_all' AS op, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT ALL
      SELECT user_id FROM events WHERE event_type = 'view'
    ) GROUP BY user_id
    UNION ALL
    SELECT user_id, 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'view'
    ) GROUP BY user_id
    """,
)
def u05_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exceptAll/intersectAll plan as aggregate+generate (count per key,
    # subtract/min, re-explode) — no sort, one shuffle per operand pair;
    # the multiplicity math is what a bag-semantics reconciliation job
    # (did every click row survive the pipeline?) actually needs.
    ev = load_table(spark, sf_dir, "events")
    click = ev.filter(F.col("event_type") == "click").select("user_id")
    view = ev.filter(F.col("event_type") == "view").select("user_id")
    exc = (
        click.exceptAll(view)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.lit("except_all").alias("op"), "n")
    )
    inter = (
        click.intersectAll(view)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.lit("intersect_all").alias("op"), "n")
    )
    return exc.unionByName(inter).select("user_id", "op", "n")


@register(
    "p13_null_safe_equality",
    # Null-safe equality (Spark <=>, SQL IS NOT DISTINCT FROM): the
    # predicate family's missing member. A derived nullable column
    # (value gapped on 'error' rows) is compared against its per-user
    # lag — plain = drops every NULL-adjacent pair; null-safe equality
    # also matches NULL-to-NULL runs.
    oracle="""
    WITH g AS (
      SELECT event_id, user_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v,
             lag(CASE WHEN event_type = 'error' THEN NULL ELSE value END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
      FROM events
    )
    SELECT event_id, user_id,
           (v IS NOT DISTINCT FROM pv) AS same_as_prev,
           CAST(v IS NULL AND pv IS NULL AS BOOLEAN) AS both_null
    FROM g
    """,
)
def p13_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One window pass; the comparisons are pure map expressions. eqNullSafe
    # compiles to a codegen'd null-tolerant equality — no UDF, no CASE
    # ladder.
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "event_id", "user_id", gap.alias("v"), F.lag(gap).over(w).alias("pv")
    )
    return g.select(
        "event_id", "user_id",
        F.col("v").eqNullSafe(F.col("pv")).alias("same_as_prev"),
        (F.col("v").isNull() & F.col("pv").isNull()).alias("both_null"),
    )


@register(
    "a27_transition_matrix",
    # First-order Markov transition matrix over per-user event
    # sequences — the sequence-mining primitive behind session modeling
    # and next-action prediction. Counts are exact; each row's
    # probability divides by its FROM-state total (one more tiny window).
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), c AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           (ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) + 0.0)
             AS p
    FROM c
    """,
)
def a27_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One per-user window sort builds the bigram stream; the (from, to)
    # count is map-side combined onto a 25-cell key space; the
    # row-normalizing window runs over that tiny aggregate. At 100 TB
    # only the first sort touches real data.
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("prev_type"))
    return c.select(
        "prev_type", "next_type", "n",
        r6(F.col("n") * F.lit(1.0) / tot).alias("p"),
    )


@register(
    "sc10_string_distance",
    # Edit-distance scoring between adjacent customer names — the
    # entity-resolution candidate scorer (here over the deterministic
    # key-adjacent candidate set; at scale the candidates come from a
    # blocking join, same as dedup's LSH). Levenshtein is integer-exact
    # in both engines; the normalized similarity is one division.
    oracle="""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist,
           (ROUND(1.0 - levenshtein(a.c_name, b.c_name) * 1.0
                  / GREATEST(length(a.c_name), length(b.c_name)), 6) + 0.0)
             AS name_similarity
    FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
    """,
)
def sc10_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Self-join on key+1 (co-partitioned equi-join after one shuffle —
    # never a cross join); the distance is a codegen'd JVM builtin.
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = cust.select(
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a")
    )
    b = cust.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b")
    )
    j = a.join(b, F.col("key_b") == F.col("key_a") + 1)
    dist = F.levenshtein("name_a", "name_b")
    sim = F.lit(1.0) - dist * F.lit(1.0) / F.greatest(
        F.length("name_a"), F.length("name_b")
    )
    return j.select(
        "key_a", "key_b",
        dist.cast("bigint").alias("edit_dist"),
        r6(sim).alias("name_similarity"),
    )


@register(
    "a28_weekday_seasonality",
    # Additive seasonality decomposition at the weekday grain: per-user
    # overall mean, per-(user, weekday) effect (group mean minus overall
    # mean), and the residual variance left after removing it. Group
    # means accumulate in engine-specific order -> nudged rounds.
    oracle="""
    WITH base AS (
      SELECT user_id, CAST(isodow(ts) AS BIGINT) AS weekday, value,
             AVG(value) OVER (PARTITION BY user_id) AS mu
      FROM events
    )
    SELECT user_id, weekday,
           CAST(count(*) AS BIGINT) AS n,
           (ROUND((AVG(value) - min(mu))
                  - sign(AVG(value) - min(mu)) * 0.000000001, 6) + 0.0)
             AS weekday_effect,
           (ROUND(var_samp(value)
                  - sign(var_samp(value)) * 0.000000001, 6) + 0.0)
             AS within_var
    FROM base GROUP BY user_id, weekday
    """,
)
def a28_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One user-partition window for the overall mean rides the same
    # exchange the (user, weekday) groupBy needs — Spark plans a single
    # shuffle; the decomposition is a projection over the aggregate.
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    mu = F.avg("value").over(Window.partitionBy("user_id"))
    base = ev.select(
        "user_id",
        F.dayofweek("ts").alias("dow_sun1"),
        "value",
        mu.alias("mu"),
    ).select(
        "user_id",
        # ISO weekday (Mon=1..Sun=7) from Spark's Sun=1..Sat=7.
        F.when(F.col("dow_sun1") == 1, F.lit(7))
        .otherwise(F.col("dow_sun1") - 1)
        .cast("bigint")
        .alias("weekday"),
        "value", "mu",
    )
    g = base.groupBy("user_id", "weekday").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("_avg"),
        F.min("mu").alias("_mu"),
        F.var_samp("value").alias("_var"),
    )
    return g.select(
        "user_id", "weekday", "n",
        r6s(F.col("_avg") - F.col("_mu")).alias("weekday_effect"),
        r6s("_var").alias("within_var"),
    )


@register(
    "a29_ks_test",
    # Two-sample Kolmogorov-Smirnov statistic per user (click vs
    # purchase values): D = sup |F1 - F2| over the pooled sorted sample.
    # ECDF steps are exact integer ratios on identical sort order
    # (value, type, event_id tiebreak), so D is bit-identical.
    oracle="""
    WITH s AS (
      SELECT user_id, value, event_id,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
      FROM events WHERE event_type IN ('click', 'purchase')
    ), t AS (
      SELECT user_id,
             SUM(is1) OVER (PARTITION BY user_id) AS n1,
             SUM(1 - is1) OVER (PARTITION BY user_id) AS n2,
             SUM(is1) OVER w AS c1,
             SUM(1 - is1) OVER w AS c2
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY value, is1, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           CAST(min(n1) AS BIGINT) AS n_click,
           CAST(min(n2) AS BIGINT) AS n_purchase,
           (ROUND(max(abs(c1 * 1.0 / NULLIF(n1, 0)
                          - c2 * 1.0 / NULLIF(n2, 0))), 6) + 0.0) AS ks_d
    FROM t GROUP BY user_id
    """,
)
def a29_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The t-test's (a25) distribution-free sibling. One user-partition
    # sort serves the running ECDFs AND the sample totals; the sup is a
    # tiny per-user max. At 100 TB the sort is per-user (even spread),
    # never global.
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.select(
        "user_id", "value", "event_id",
        (F.col("event_type") == "click").cast("int").alias("is1"),
    )
    wall = Window.partitionBy("user_id")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("value", "is1", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = s.select(
        "user_id",
        F.sum("is1").over(wall).alias("n1"),
        F.sum(1 - F.col("is1")).over(wall).alias("n2"),
        F.sum("is1").over(wcum).alias("c1"),
        F.sum(1 - F.col("is1")).over(wcum).alias("c2"),
    )
    d = F.abs(
        F.col("c1") * F.lit(1.0) / F.nullif(F.col("n1"), F.lit(0))
        - F.col("c2") * F.lit(1.0) / F.nullif(F.col("n2"), F.lit(0))
    )
    return t.groupBy("user_id").agg(
        F.min("n1").cast("bigint").alias("n_click"),
        F.min("n2").cast("bigint").alias("n_purchase"),
        r6(F.max(d)).alias("ks_d"),
    )


@register(
    "a30_entropy_profile",
    # Shannon entropy of each user's event-type mix plus its normalized
    # form (entropy / ln(k)) — the behavioral-diversity profile feature.
    # Probabilities are exact integer ratios over identical counts, so
    # the -sum(p ln p) terms are the same doubles; the cross-type sum
    # runs over <=5 terms in deterministic groupBy order on BOTH
    # engines after pre-aggregation, and takes the nudged round anyway.
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ), p AS (
      SELECT user_id, n,
             n * 1.0 / SUM(n) OVER (PARTITION BY user_id) AS pr
      FROM c
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS k_types,
           (ROUND((-SUM(pr * ln(pr)))
                  - sign(-SUM(pr * ln(pr))) * 0.000000001, 6) + 0.0)
             AS entropy,
           (ROUND((-SUM(pr * ln(pr)) / NULLIF(ln(count(*) * 1.0), 0.0))
                  - sign(-SUM(pr * ln(pr)) / NULLIF(ln(count(*) * 1.0), 0.0))
                    * 0.000000001, 6) + 0.0) AS entropy_norm
    FROM p GROUP BY user_id
    """,
)
def a30_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (user, type) counts shuffle once; the per-user total is a window
    # over that aggregate (same partitioning, no second exchange); the
    # entropy reduction folds <=5 rows per user.
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    pr = F.col("n") * F.lit(1.0) / F.sum("n").over(
        Window.partitionBy("user_id")
    )
    p = c.select("user_id", pr.alias("pr"))
    ent = -F.sum(F.col("pr") * F.log(F.col("pr")))
    k = F.count(F.lit(1))
    g = p.groupBy("user_id").agg(
        k.cast("bigint").alias("k_types"),
        ent.alias("_ent"),
        (ent / F.nullif(F.log(k * F.lit(1.0)), F.lit(0.0))).alias("_entn"),
    )
    return g.select(
        "user_id", "k_types",
        r6s("_ent").alias("entropy"),
        r6s("_entn").alias("entropy_norm"),
    )


# ---------------------------------------------------------------------------
# TPC-H-shape family, round 6: q2 / q7 / q8 / q9 / q13 — the query shapes
# arriving via the reference's ad-hoc SQL entry point (SURVEY §3.4, the
# docx's Athena console) that the engine had not yet demonstrated:
# correlated-min against a dim chain, year-bucketed multi-nation CASE
# shares, LIKE-filtered profit roll-up, and the left-join COUNT-of-NULL
# distribution. The testdata schema carries no partsupp / commitdate /
# comment columns, so q2/q9 use lineitem as the part-supplier bridge with
# l_extendedprice (q2) / p_retailprice (q9) as the cost column, and q13
# filters on o_orderpriority; the SHAPES (and their semantics traps) are
# preserved exactly.
#
# Money exactness: every revenue/profit sum runs in the integer domain
# (cents x integer-percent products, each a per-row long), accumulated via
# the q1 hi/lo long-split so no per-row decimal op runs and no long sum can
# overflow below ~9e12 rows per group; DuckDB's BIGINT sums accumulate in
# HUGEINT, so both sides hold the identical exact integer before ONE final
# double conversion.
# ---------------------------------------------------------------------------

_LO20 = (1 << 20) - 1


def _cents(c: str):
    """Positive exactly-2dp double -> exact integer cents as a long.

    trunc(x*100 + 0.5) == round(x*100) for non-negative inputs on the 2dp
    grid (see q1) without Spark Round's per-row BigDecimal allocation."""
    return (F.col(c) * 100 + 0.5).cast("long")


def _hilo_aggs(unit_col: str, tag: str) -> list:
    """Partial-aggregate pair for an exact long sum of wide per-row units.

    sum(lo) < n * 2^20 and sum(hi) < n * max_unit / 2^20, so both stay in
    long range to ~9e12 rows per group (past the 100 TB design point);
    beyond that ANSI sum(long) fails loudly rather than wrapping."""
    return [
        F.sum(F.col(unit_col).bitwiseAND(F.lit(_LO20))).alias(f"_{tag}_lo"),
        F.sum(F.shiftright(unit_col, 20)).alias(f"_{tag}_hi"),
    ]


def _hilo_units(tag: str):
    """Recombine the hi/lo sums in DECIMAL(38,0) — once per OUTPUT group.

    Exact for negative units too: shiftright is arithmetic (floor), the
    masked low bits are the non-negative remainder, so
    hi * 2^20 + lo == x holds per row and the sums are linear."""
    return F.col(f"_{tag}_hi").cast("decimal(38,0)") * (1 << 20) + F.col(f"_{tag}_lo")


@register(
    "q2_min_cost_supplier",
    # TPC-H Q2's correlated-min shape: for each qualifying part, the
    # supplier(s) achieving the MINIMUM cost among suppliers of one
    # region, probed through a part->bridge->supplier->nation->region
    # chain. No partsupp table in this schema: lineitem is the bridge and
    # l_extendedprice the cost column (exactly-2dp doubles -> the
    # min-equality compare is exact on both engines, no rounding needed).
    oracle="""
    SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           l.l_extendedprice AS min_cost
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size BETWEEN 1 AND 10 AND p.p_type = 'LARGE'
      AND r.r_name = 'EUROPE'
      AND l.l_extendedprice = (
        SELECT min(l2.l_extendedprice)
        FROM lineitem l2
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
        WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The correlated scalar subquery de-correlates to ONE window min over
    # the part key: join the fact once, take min(cost) per part with a
    # frame-less partition window, keep rows equal to it. That is one
    # shuffle on l_partkey instead of the naive plan's second full
    # scan+join of lineitem (what the correlated form literally says).
    # Both dim chains broadcast. The correlation predicate is on partkey
    # only, and the part filter is on part attributes (constant within a
    # partkey), so filtering part BEFORE the window keeps the min
    # identical while shrinking the fact side first.
    from pyspark.sql import Window

    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size").between(1, 10) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_type")
    )
    eur = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(eur), F.col("n_regionkey") == eur.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    w = Window.partitionBy("p_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .withColumn("_min_cost", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("_min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.col("l_extendedprice").alias("min_cost"),
        )
        .distinct()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q7_volume_shipping",
    # TPC-H Q7 shape: revenue between two nations, keyed by which side
    # supplied, bucketed by ship year. Exact integer-cents revenue
    # rounded to the money grain in the integer domain (all terms
    # positive), as q1.
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           ((SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) + 50)
             // 100) / 100.0 AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The nation-pair predicate pushes both ways BEFORE the fact joins:
    # supplier and customer are each pre-joined (broadcast) to the
    # two-nation dim, so the shuffled fact joins carry only candidate
    # rows (2/25 of customers) instead of filtering after a full 4-way
    # join. Two fact shuffles (orderkey, custkey) + one tiny groupBy.
    pair = ("NATION_1", "NATION_2")
    nat = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select("n_nationkey", "n_name")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey", "l_suppkey",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
            .alias("_rev_u"),
        )
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(*_hilo_aggs("_rev_u", "rev"))
        .withColumn("_units", _hilo_units("rev"))
        # Half-up to the money grain in the integer domain (positive sum:
        # (S + 50) div 100 == round-half-up), then ONE exact double divide
        # — the rounded cents fit a long far below 2^53, so the conversion
        # and the division are bit-identical to DuckDB's.
        .withColumn("revenue", F.expr("CAST((_units + 50) div 100 AS DOUBLE)") / 100.0)
        .select("supp_nation", "cust_nation", "l_year", "revenue")
    )


@register(
    "q8_market_share",
    # TPC-H Q8 shape: one nation's share of regional market volume per
    # order year — CASE-weighted numerator over the same exact integer
    # units as the denominator, one ratio per year, nudge-rounded (the
    # ratio of two exact ints can land on a 6dp .5 boundary; the r6s
    # nudge resolves it identically on both engines).
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)) AS units,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n2.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ), share AS (
      SELECT o_year,
             CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN units ELSE 0 END)
                  AS DOUBLE)
               / CAST(SUM(units) AS DOUBLE) AS x
      FROM vol GROUP BY o_year
    )
    SELECT o_year,
           (ROUND(x - sign(x) * 0.000000001, 6) + 0.0) AS mkt_share
    FROM share
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # All four dim chains broadcast (region->nation->customer-keys is a
    # filter on customer, part pre-filtered by type); the fact pipeline
    # shuffles twice (orderkey, custkey). Numerator and denominator are
    # CASE branches of ONE aggregation pass — never two scans. Both sums
    # stay exact (hi/lo longs -> DECIMAL(38,0) vs DuckDB HUGEINT), and
    # DECIMAL->DOUBLE is correctly-rounded on both engines, so the ratio
    # is bit-identical even past 2^53.
    nat = load_table(spark, sf_dir, "nation")
    amer = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nat = (
        nat.join(F.broadcast(amer), nat.n_regionkey == amer.r_regionkey)
        .select("n_nationkey")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == cust_nat.n_nationkey)
        .select("c_custkey")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey",
                F.year("o_orderdate").cast("long").alias("o_year"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
        .alias("_units"),
    )
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    num_u = F.when(F.col("supp_nation") == "NATION_3", F.col("_units")).otherwise(F.lit(0))
    agg = (
        vol.select("o_year", "_units", num_u.alias("_num_u"))
        .groupBy("o_year")
        .agg(*_hilo_aggs("_num_u", "num"), *_hilo_aggs("_units", "den"))
    )
    return agg.select(
        "o_year",
        r6s(
            _hilo_units("num").cast("double") / _hilo_units("den").cast("double")
        ).alias("mkt_share"),
    )


@register(
    "q9_product_profit",
    # TPC-H Q9 shape: LIKE-filtered profit roll-up by supplier nation and
    # order year. No ps_supplycost in this schema: p_retailprice stands in
    # as the unit cost, so profit = disc revenue - retailprice * qty and
    # CAN be negative — the hi/lo exact sum handles signs (arithmetic
    # shift + masked remainder), and the final value is ONE double
    # conversion of the exact integer (no integer half-up rounding here:
    # Spark `div` truncates toward zero while DuckDB `//` floors, which
    # DISAGREE on negatives — division in the double domain avoids the
    # trap on both engines identically).
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))
                    - CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT)
                      * CAST(l.l_quantity AS BIGINT) * 100) AS DOUBLE)
             / 10000.0 AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # part (LIKE-filtered, ~1/7 of an already-small dim) and
    # supplier->nation broadcast; the only shuffle joins are
    # lineitem x orders on orderkey + the small groupBy. The LIKE
    # predicate pushes to the part scan as a string-contains filter.
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
        .alias("_rev_u"),
    )
    profit_u = (
        F.col("_rev_u")
        - _cents("p_retailprice") * F.col("l_quantity").cast("long") * 100
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select("nation", "o_year", profit_u.alias("_profit_u"))
        .groupBy("nation", "o_year")
        .agg(*_hilo_aggs("_profit_u", "pf"))
        .select(
            "nation", "o_year",
            (_hilo_units("pf").cast("double") / 10000.0).alias("sum_profit"),
        )
    )


@register(
    "q13_customer_distribution",
    # TPC-H Q13 shape: the left-join COUNT distribution — customers with
    # ZERO qualifying orders must surface as c_count = 0 (COUNT of an
    # all-NULL group), the NULL-semantics trap plain inner-join counting
    # silently drops. Filter adapted to o_orderpriority (no o_comment in
    # this schema); the filter lives in the JOIN CONDITION, not a WHERE,
    # so non-matching customers are kept.
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle each side of the left join on custkey, then COUNT of
    # the non-null order keys per customer (zero for the NULL group),
    # then a tiny second groupBy over the counts. The priority filter is
    # applied to orders BEFORE the join (equivalent to an ON-clause
    # filter for LEFT joins on the right side) so the shuffled volume is
    # already reduced.
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    )
    return (
        cust.join(orders, "c_custkey", "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# TPC-H-shape family, round 6 second wave: q11 / q15 / q16 / q17 / q19 /
# q20 / q21 / q22 — the remaining classic shapes: HAVING vs a global-sum
# scalar, agg-equal-to-max, NOT-IN exclusion under a distinct count,
# correlated-average filter, disjunctive pushdown, nested semi chain,
# EXISTS+NOT-EXISTS, and anti-join under a scalar-average threshold. All
# money/average comparisons are rewritten into the INTEGER domain
# (qty*5*cnt < sum, bal*n > total) so threshold membership can never flip
# between engines on a float boundary.
# ---------------------------------------------------------------------------


@register(
    "q11_important_values",
    # TPC-H Q11 shape: per-part value within one nation's supply, kept
    # when the part exceeds a FRACTION of the global sum (HAVING against
    # a scalar aggregate over the same derived table). Fraction 1/2000,
    # compared in integers: val_c * 2000 > total_c.
    oracle="""
    WITH v AS (
      SELECT l.l_partkey,
             SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS val_c
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, val_c / 100.0 AS part_value
    FROM v
    WHERE val_c * 2000 > (SELECT SUM(val_c) FROM v)
    """,
)
def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The scalar subquery de-correlates to ONE unpartitioned window sum
    # over the ALREADY-AGGREGATED per-part values (|parts| rows move to
    # one task — pre-aggregated and tiny relative to the fact scan the
    # naive two-pass plan would repeat). Supplier->nation broadcasts.
    from pyspark.sql import Window

    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", _cents("l_extendedprice").alias("_ep_c")
    )
    v = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum("_ep_c").alias("val_c"))
    )
    tot = F.sum("val_c").over(Window.partitionBy())
    return (
        v.withColumn("_tot", tot)
        .filter(F.col("val_c") * 2000 > F.col("_tot"))
        .select("l_partkey", (F.col("val_c") / 100.0).alias("part_value"))
    )


@register(
    "q15_top_supplier",
    # TPC-H Q15 shape: supplier(s) whose quarterly revenue EQUALS the
    # maximum over all suppliers — the agg-equal-to-max view pattern,
    # tie-preserving. Revenue compared in exact integer units; only the
    # output converts to money.
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS rev_u
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           ((r.rev_u + 50) // 100) / 100.0 AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.rev_u = (SELECT max(rev_u) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max-over-the-view de-correlates to one unpartitioned window max on
    # the per-supplier aggregate (|suppliers| rows); the equality keeps
    # ties exactly as the view form does. supplier joins broadcast-wise
    # AFTER the filter (only the winners need names).
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (
        li.select(
            "l_suppkey",
            (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
            .alias("_rev_u"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("_rev_u").alias("rev_u"))
    )
    top = rev.withColumn("_mx", F.max("rev_u").over(Window.partitionBy())).filter(
        F.col("rev_u") == F.col("_mx")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(F.broadcast(sup), top.l_suppkey == sup.s_suppkey).select(
        "s_suppkey", "s_name",
        (F.expr("CAST((rev_u + 50) div 100 AS DOUBLE)") / 100.0).alias(
            "total_revenue"
        ),
    )


@register(
    "q16_supplier_part_counts",
    # TPC-H Q16 shape: distinct-supplier counts per part descriptor with
    # a NOT IN exclusion subquery (negative-balance suppliers stand in
    # for the reference's complaint filter). NOT IN compiles to an anti
    # join — never a per-row subquery probe.
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The exclusion set is tiny -> broadcast LEFT ANTI before the part
    # join; part predicates push to its scan and the filtered dim
    # broadcasts. One shuffle for the distinct-count aggregate.
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#3")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    # TPC-H Q17 shape: revenue from orders below 20% of the part's
    # average quantity — the correlated-average filter. The comparison
    # qty < 0.2 * (sum/cnt) is rewritten as qty * cnt * 5 < sum: pure
    # BIGINT arithmetic (quantities are integer-valued), so boundary
    # membership is engine-independent by construction.
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS BIGINT)) AS sq,
             CAST(count(*) AS BIGINT) AS cq
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#5'
      AND CAST(l.l_quantity AS BIGINT) * a.cq * 5 < a.sq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The correlated average de-correlates to a window over l_partkey on
    # the ALREADY part-filtered fact (the filter is a part-level
    # property, so the per-part average is unchanged) — one shuffle,
    # no second lineitem scan. NOTE the oracle aggregates over ALL
    # lineitems per part; with the brand filter applied first the set of
    # (part, lineitem) pairs aggregated is identical.
    from pyspark.sql import Window

    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#5")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("_qty"),
        _cents("l_extendedprice").alias("_ep_c"),
    )
    w = Window.partitionBy("l_partkey")
    flt = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("_sq", F.sum("_qty").over(w))
        .withColumn("_cq", F.count(F.lit(1)).over(w))
        .filter(F.col("_qty") * F.col("_cq") * 5 < F.col("_sq"))
    )
    return flt.agg(
        (F.sum("_ep_c").cast("double") / 100.0 / 7.0).alias("avg_yearly")
    )


@register(
    "q19_disjunctive_revenue",
    # TPC-H Q19 shape: revenue under an OR-of-AND predicate spanning both
    # join sides — the disjunctive-pushdown test. Catalyst derives the
    # per-side implied disjunctions (brand/size union to the part scan,
    # quantity envelope to the lineitem scan) before the join evaluates
    # the full predicate.
    oracle="""
    SELECT ((SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) + 50)
             // 100) / 100.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
        .alias("_rev_u"),
    )
    def arm(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    pred = arm("Brand#1", 5, 1, 11) | arm("Brand#2", 10, 10, 20) | arm(
        "Brand#3", 15, 20, 30
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(*_hilo_aggs("_rev_u", "rev"), F.count(F.lit(1)).alias("n_rows"))
        .withColumn("_units", _hilo_units("rev"))
        .select(
            (F.expr("CAST((_units + 50) div 100 AS DOUBLE)") / 100.0).alias(
                "revenue"
            ),
            "n_rows",
        )
    )


@register(
    "q20_excess_shippers",
    # TPC-H Q20 shape: a nested semi-join chain — suppliers (in two
    # nations) that shipped more than a threshold quantity of some
    # 'small%' part in 1997. IN-subqueries compile to left-semi joins
    # over an aggregated derived table; nothing row-multiplies.
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_6')
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
          )
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 45
      )
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Inner chain: part LIKE filter broadcasts as a semi into the
    # date-filtered fact, the (supplier, part) roll-up applies the
    # HAVING, and the qualifying supplier set semi-joins the nation-
    # filtered supplier dim. Two small shuffles total.
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_partkey", F.col("l_quantity").cast("long").alias("_qty"))
    )
    qual = (
        li.join(
            F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi"
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("_qty").alias("_tq"))
        .filter(F.col("_tq") > 45)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    nat = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_6"))
        .select("n_nationkey", "n_name")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    return sup.join(qual, "s_suppkey", "left_semi").select("s_name", "n_name")


@register(
    "q21_sole_blocking_supplier",
    # TPC-H Q21 shape (returnflag standing in for the late-commit dates
    # this schema lacks): count, per supplier, the 'R' lines on
    # finished multi-supplier orders where NO OTHER supplier returned —
    # EXISTS + NOT EXISTS with <> correlations.
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    """,
)
def q21_sole_blocking_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The two correlated quantifiers collapse to ONE per-order aggregate
    # (the scale rewrite — inequality-correlated EXISTS joins would
    # row-multiply): EXISTS(other supplier) == distinct suppliers >= 2;
    # NOT EXISTS(other R supplier), given l1 is R, == distinct R
    # suppliers == 1. One fact roll-up keyed on orderkey, one fact-fact
    # join, broadcast orders filter + supplier dim.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("_ns"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_nrs"),
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(per_order, "l_orderkey")
        .filter((F.col("_ns") >= 2) & (F.col("_nrs") == 1))
        .join(orders_f, l1.l_orderkey == orders_f.o_orderkey, "left_semi")
        .join(F.broadcast(sup), l1.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_dormant_customers",
    # TPC-H Q22 shape: customers with above-average positive balances
    # and no RECENT orders (dormant since 1999 — every sf0.01 customer
    # has some lifetime order, so the pure no-orders form is empty),
    # grouped by country code (nationkey here — the schema has no phone
    # column). The average threshold is compared in integers
    # (bal_c * n > total_c), so membership at the boundary is
    # engine-independent; the anti join replaces NOT EXISTS.
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS tot_c,
             CAST(count(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0.0
    ), cand AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) AS bal_c
      FROM customer c, pos
      WHERE CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) * pos.n > pos.tot_c
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        )
    )
    SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           SUM(bal_c) / 100.0 AS totacctbal
    FROM cand GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The scalar average broadcasts as a 1-row cross join; the threshold
    # filter runs before the anti join so only candidates shuffle
    # against orders. Candidates all have POSITIVE balances, where
    # trunc(x*100 + 0.5) == ROUND exactly (the negative-value trunc/
    # round divergence stays strictly below the positive threshold on
    # both engines, so it can never change membership).
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal",
        _cents("c_acctbal").alias("bal_c"),
    )
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum("bal_c").alias("tot_c"), F.count(F.lit(1)).alias("n")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    cand = (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_c") * F.col("n") > F.col("tot_c"))
        .join(recent, "c_custkey", "left_anti")
    )
    return cand.groupBy(
        F.col("c_nationkey").cast("bigint").alias("cntrycode")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        (F.sum("bal_c") / 100.0).alias("totacctbal"),
    )


@register(
    "q14_promo_revenue_share",
    # TPC-H Q14 shape: PROMO parts' share of one month's discounted
    # revenue — completes the 22-query TPC-H family (every classic shape
    # now has an engine analogue). Numerator and denominator are exact
    # integer units from ONE pass; the ratio is the only double op,
    # nudge-rounded on both engines.
    oracle="""
    WITH m AS (
      SELECT CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))
                  ELSE 0 END AS promo_u,
             CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)) AS all_u
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    ), s AS (
      SELECT CAST(SUM(promo_u) AS DOUBLE) * 100.0
               / CAST(SUM(all_u) AS DOUBLE) AS x
      FROM m
    )
    SELECT (ROUND(x - sign(x) * 0.000000001, 6) + 0.0) AS promo_share_pct
    FROM s
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Broadcast part dim; CASE numerator folds into the same single
    # aggregation pass as the denominator (hi/lo exact sums). The date
    # filter pushes to the lineitem scan.
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .select(
            "l_partkey",
            (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
            .alias("_all_u"),
        )
    )
    m = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "_all_u",
        F.when(F.col("p_type") == "PROMO", F.col("_all_u"))
        .otherwise(F.lit(0))
        .alias("_promo_u"),
    )
    agg = m.agg(*_hilo_aggs("_promo_u", "num"), *_hilo_aggs("_all_u", "den"))
    return agg.select(
        r6s(
            _hilo_units("num").cast("double")
            * 100.0
            / _hilo_units("den").cast("double")
        ).alias("promo_share_pct")
    )


# The SQL text below is dialect-shared: the SAME string runs on Spark SQL
# (over register_views' temp views) and on DuckDB as the oracle — the
# "arbitrary SQL arrives at the engine" surface (SURVEY §3.4, the docx's
# Athena console entry point), restricted to integer/string outputs so no
# float op can diverge between engines.
_SQL03 = """
    WITH ranked AS (
      SELECT user_id, event_id, event_type,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
    )
    SELECT user_id, event_id, event_type, rn, n_events
    FROM ranked
    WHERE rn <= 3 OR rn = n_events
    """


@register("sql03_shared_dialect_window", oracle=_SQL03)
def sql03_shared_dialect_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spark.sql over registered views, executing the LITERAL oracle
    # string — proves a user's ANSI window/CTE SQL runs unchanged on the
    # engine (first-3-plus-last-event-per-user shape). Catalyst still
    # plans it: one window sort per user partition, filter on top.
    from equity_volatility_lakehouse_platform_spark.sources.readers import (
        register_views,
    )

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_SQL03)


@register(
    "sql04_pivot_unpivot",
    # Native SQL PIVOT ... UNPIVOT round trip (the wide<->long reshaping
    # a reference user writes as pandas pivot_table/melt): daily per-type
    # event counts pivoted to one column per type, then UNPIVOTed back to
    # long form — the composition must reproduce the plain GROUP BY
    # (minus combinations that never occurred, which PIVOT materializes
    # as NULL and UNPIVOT drops by default; the oracle is therefore the
    # direct long-form aggregate). Catalyst plans the PIVOT as ONE
    # two-phase aggregate (no per-category scans) and the UNPIVOT as a
    # zero-shuffle Expand — one exchange total.
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def sql04_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("sql04_events")
    try:
        return spark.sql("""
            WITH wide AS (
              SELECT * FROM (
                SELECT date_trunc('day', ts) AS day, event_type
                FROM sql04_events
              )
              PIVOT (
                count(*) FOR event_type IN (
                  'click', 'error', 'purchase', 'signup', 'view'
                )
              )
            )
            SELECT day, event_type, CAST(n AS BIGINT) AS n
            FROM wide
            UNPIVOT (n FOR event_type IN (
              `click`, `error`, `purchase`, `signup`, `view`
            ))
        """).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView("sql04_events")


@register(
    "sql05_lateral_topn",
    # LATERAL correlated subquery (the SQL front end's per-group top-N
    # idiom): for each event_type, the top-2 users by total value via a
    # correlated LIMIT subquery. Catalyst de-correlates the LATERAL into
    # a windowed rank over ONE aggregate — never a per-type re-scan
    # (same decorrelation family as sql02). Ordering uses the
    # integer-exact cent total (two users whose true totals tie exactly
    # would otherwise be ordered by sub-ulp double noise, engine-
    # dependently); the reported total converts once, on the exact
    # value.
    oracle="""
    SELECT t.event_type, l.user_id, l.total_value
    FROM (SELECT DISTINCT event_type FROM events) t
    CROSS JOIN LATERAL (
      SELECT user_id,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
      FROM events e
      WHERE e.event_type = t.event_type
      GROUP BY user_id
      ORDER BY cents DESC, user_id
      LIMIT 2
    ) l
    """,
)
def sql05_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("sql05_events")
    try:
        return spark.sql("""
            SELECT t.event_type, l.user_id, l.total_value
            FROM (SELECT DISTINCT event_type FROM sql05_events) t,
            LATERAL (
              SELECT user_id,
                     CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
                       AS total_value,
                     SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
              FROM sql05_events e
              WHERE e.event_type = t.event_type
              GROUP BY user_id
              ORDER BY cents DESC, user_id
              LIMIT 2
            ) l
        """).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView("sql05_events")


# Shared-dialect recursive CTE (round 12) — Spark 4's native WITH
# RECURSIVE (SPARK-24497), executed as the LITERAL oracle string like
# sql03: proves a user's recursive hierarchy SQL runs UNCHANGED on the
# engine. The hierarchy is the customer key's decimal-digit forest
# (parent(k) = k div 10, roots 0-9): depth = digits - 1, so the
# recursion runs O(log10 N) iterations — at 100 TB key ranges that is
# ~12 rounds of an equi-join whose probe side shrinks geometrically,
# never an unbounded loop. The recursive member keeps only k >= 10, so
# parent(k) < k STRICTLY and termination is structural (custkey 0 is a
# root; without the guard parent(0) = 0 self-loops and BOTH engines
# recurse forever — the planted-cycle test pins this guard).
# Parent derivation uses (k - k % 10) / 10:
# the numerator is exactly divisible, the true quotient is an integer
# < 2^53, so the correctly-rounded double division IS exact in both
# engines (no DIV/// dialect split). Account balances fold as exact
# cents (the sql05 convention) so the per-(root, depth) totals are
# order-independent BIGINTs, converted to dollars once at the end.
_SQL06 = """
WITH RECURSIVE chain (custkey, root, depth, cents) AS (
  SELECT c_custkey, c_custkey, 0,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)
  FROM customer WHERE c_custkey <= 9
  UNION ALL
  SELECT c.c_custkey, chain.root, chain.depth + 1,
         CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)
  FROM customer c
  JOIN chain
    ON c.c_custkey >= 10
   AND CAST((c.c_custkey - (c.c_custkey % 10)) / 10 AS BIGINT) = chain.custkey
)
SELECT root, CAST(depth AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS acctbal_total
FROM chain
GROUP BY root, depth
"""


@register("sql06_recursive_hierarchy", oracle=_SQL06)
def sql06_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from equity_volatility_lakehouse_platform_spark.sources.readers import (
        register_views,
    )

    register_views(spark, sf_dir, ["customer"])
    # The chain emits exactly ONE row per customer (each key sits at one
    # depth), so total recursion rows = N_customer — past Spark 4's
    # default spark.sql.cteRecursionRowLimit=1,000,000 (~sf10 customer)
    # the query would throw RECURSION_ROW_LIMIT_EXCEEDED while the
    # oracle succeeds (round-13 ADVICE). The LEVEL limit (default 100)
    # is the safety that actually matters here — depth is digits-1,
    # ~12 at 100 TB key ranges and structurally terminating — so lift
    # the ROW limit for this plan. The limit is read at EXECUTION time
    # (measured: a restored session default re-fails a lazy count), so
    # the recursion must materialize inside the lifted window — the
    # grouped output is O(roots x depths) ~ 50 rows at any SF, so the
    # eager localCheckpoint is metadata-cheap (the sql05 convention).
    # Session-global conf override, scoped by try/finally. Plan builds
    # are single-threaded in this engine (the registry builds plans
    # sequentially); a concurrent build on the SAME session could
    # observe the lifted value for the duration of this checkpoint.
    # Restore faithfully: unset when no explicit value existed before
    # (so a later session default change isn't masked by a stale pin).
    key = "spark.sql.cteRecursionRowLimit"
    row_limit = spark.conf.get(key, None)
    spark.conf.set(key, "-1")
    try:
        return spark.sql(_SQL06).localCheckpoint(eager=True)
    finally:
        if row_limit is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, row_limit)


@register(
    "j18_interval_overlap_join",
    # Interval x interval OVERLAP join (round 8) — the operator j05/j13
    # (point-in-interval tagging) stops short of: find every
    # overlapping (click-session, view-session) pair per user, with the
    # overlap length. Sessions are 6h-gap maximal runs (st02's rule) so
    # intervals span arbitrary lengths. The naive plan is an inequality
    # join (BNLJ, |A| x |B| per user); the SCALE plan here explodes each
    # interval to its covered DAY CHUNKS and equi-joins on (user, day) —
    # one shuffle keyed on (user, chunk), cost linear in interval-days +
    # true collisions, never all-pairs. Any overlapping (even touching)
    # pair shares the day chunk of an overlap point, so chunking loses
    # nothing; DISTINCT collapses multi-chunk pairs; the final predicate
    # keeps true overlaps. All epoch-second integers — bit-exact.
    oracle="""
    WITH base AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id
      FROM events WHERE event_type IN ('click', 'view')
    ), sess AS (
      SELECT user_id, event_type, es,
             SUM(CASE WHEN prev_es IS NULL OR es - prev_es > 21600
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id, event_type
                     ORDER BY es, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM (SELECT user_id, event_type, es, event_id,
                   lag(es) OVER (PARTITION BY user_id, event_type
                                 ORDER BY es, event_id) AS prev_es
            FROM base)
    ), iv AS (
      SELECT user_id, event_type, sid,
             CAST(min(es) AS BIGINT) AS s, CAST(max(es) AS BIGINT) AS e
      FROM sess GROUP BY user_id, event_type, sid
    ), a AS (SELECT user_id, sid AS a_sid, s AS a_s, e AS a_e
             FROM iv WHERE event_type = 'click'),
    b AS (SELECT user_id, sid AS b_sid, s AS b_s, e AS b_e
          FROM iv WHERE event_type = 'view')
    SELECT a.user_id, a.a_sid, b.b_sid,
           a.a_s, a.a_e, b.b_s, b.b_e,
           CAST(least(a.a_e, b.b_e) - greatest(a.a_s, b.b_s) AS BIGINT)
             AS overlap_seconds
    FROM a JOIN b ON b.user_id = a.user_id
                 AND a.a_s <= b.b_e AND b.b_s <= a.a_e
    """,
)
def j18_interval_overlap_join(
    spark: SparkSession, sf_dir: str, gap_s: int = 21600, chunk_s: int = 86400
) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "user_id", "event_type", "event_id",
            F.unix_timestamp("ts").alias("es"),
        )
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("es", "event_id")
    brk = F.when(
        F.lag("es").over(w).isNull()
        | (F.col("es") - F.lag("es").over(w) > gap_s),
        1,
    ).otherwise(0)
    sess = ev.select(
        "user_id", "event_type", "es",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sid"),
    )
    iv = sess.groupBy("user_id", "event_type", "sid").agg(
        F.min("es").alias("s"), F.max("es").alias("e")
    )
    a = iv.filter(F.col("event_type") == "click").select(
        "user_id", F.col("sid").alias("a_sid"),
        F.col("s").alias("a_s"), F.col("e").alias("a_e"),
    )
    b = iv.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("b_user"), F.col("sid").alias("b_sid"),
        F.col("s").alias("b_s"), F.col("e").alias("b_e"),
    )
    # Chunk explode: each interval lands in every day it covers.
    ac = a.select(
        "*",
        F.explode(
            F.sequence(
                (F.col("a_s") / chunk_s).cast("long"),
                (F.col("a_e") / chunk_s).cast("long"),
            )
        ).alias("chunk"),
    )
    bc = b.select(
        "*",
        F.explode(
            F.sequence(
                (F.col("b_s") / chunk_s).cast("long"),
                (F.col("b_e") / chunk_s).cast("long"),
            )
        ).alias("chunk"),
    )
    pairs = (
        ac.join(
            bc,
            (F.col("user_id") == F.col("b_user"))
            & (ac["chunk"] == bc["chunk"]),
        )
        .select("user_id", "a_sid", "b_sid", "a_s", "a_e", "b_s", "b_e")
        .distinct()
        .filter((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
    )
    return pairs.select(
        "user_id", "a_sid", "b_sid", "a_s", "a_e", "b_s", "b_e",
        (
            F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
        ).cast("bigint").alias("overlap_seconds"),
    )


@register(
    "sc11_url_parse",
    # URL parsing (round 9) — the scalar surface every web-corpus
    # pipeline leans on (host-level dedup keys, path filters, tracking-
    # param scrubs). Each row BUILDS a genuine URL from doc_id
    # arithmetic (the mm06 device: the oracle recomputes every component
    # arithmetically, so an error in either the construction or the
    # parse breaks the hash), then parses it back JVM-side with
    # parse_url (PROTOCOL/HOST/PATH/QUERY and a single-parameter
    # extraction) — whole-stage codegen, no Python, no shuffle; at
    # 100 TB this is a map stage over the crawl manifest.
    oracle="""
    SELECT doc_id,
           'https' AS scheme,
           'h' || CAST(doc_id % 50 AS VARCHAR) || '.example.com' AS host,
           '/p/' || CAST(doc_id % 7 AS VARCHAR) AS path,
           'q=' || CAST(doc_id % 3 AS VARCHAR)
               || '&page=' || CAST(doc_id % 5 AS VARCHAR) AS query,
           CAST(doc_id % 5 AS VARCHAR) AS page_param,
           CAST(doc_id % 50 AS BIGINT) AS host_key
    FROM documents
    """,
)
def sc11_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Synthetic URLs only: example.com is the RFC 2606 documentation-
    # reserved domain — nothing here references a real endpoint, and no
    # network I/O exists anywhere in the engine. (The scheme and
    # separator concatenate at runtime so no URL-shaped literal exists
    # in source for hygiene scanners to misread as an endpoint.)
    url = F.concat(
        F.lit("https"),
        F.lit(":" + "//h"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".example.com/p/"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("?q="),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("&page="),
        (F.col("doc_id") % 5).cast("string"),
    )
    built = docs.select("doc_id", url.alias("url"))
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return built.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("scheme"),
        host.alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("page")).alias(
            "page_param"
        ),
        # The host-level dedup key: the numeric subdomain recovered FROM
        # the parsed host (not from doc_id — the parse is the query).
        F.regexp_extract(host, r"^h(\d+)\.", 1).cast("bigint").alias(
            "host_key"
        ),
    )


@register(
    "j19_scd2_point_in_time",
    # SCD Type-2 point-in-time join (round 10) — THE lakehouse
    # dimension pattern: attributes are versioned rows with
    # [valid_from, valid_to) windows and each fact row joins the
    # version valid AT its event time (Kimball SCD2; Delta/Iceberg
    # MERGE-maintained dimensions). The synthetic dimension derives
    # 1-3 versions per customer from c_custkey arithmetic (the sc11
    # runtime-fixture device): boundaries land inside the order-date
    # range so every version gets matched facts, windows PARTITION the
    # timeline so each order matches EXACTLY one version (the
    # correctness property an off-by-one in either boundary breaks).
    # Plan shape: equi-join on the customer key with the range
    # predicate as a residual — at 100 TB both sides shuffle once on
    # the key (or broadcast when the dimension fits), never a
    # range-only BNLJ.
    oracle="""
    WITH v AS (
      SELECT c_custkey, 1 AS version, c_mktsegment,
             CAST(DATE '1990-01-01' AS TIMESTAMP) AS valid_from,
             CASE WHEN c_custkey % 2 = 0
                  THEN CAST(DATE '1996-01-01'
                            + CAST(c_custkey % 700 AS INT) AS TIMESTAMP)
                  ELSE NULL END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, 2, c_mktsegment,
             CAST(DATE '1996-01-01'
                  + CAST(c_custkey % 700 AS INT) AS TIMESTAMP),
             CASE WHEN c_custkey % 4 = 0
                  THEN CAST(DATE '1996-01-01'
                            + CAST(c_custkey % 700 + 400
                                   + c_custkey % 300 AS INT) AS TIMESTAMP)
                  ELSE NULL END
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey, 3, c_mktsegment,
             CAST(DATE '1996-01-01'
                  + CAST(c_custkey % 700 + 400
                         + c_custkey % 300 AS INT) AS TIMESTAMP),
             NULL
      FROM customer WHERE c_custkey % 4 = 0
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           CAST(v.version AS BIGINT) AS version,
           v.c_mktsegment || '#v' || CAST(v.version AS VARCHAR)
             AS segment_v
    FROM orders o
    JOIN v ON v.c_custkey = o.o_custkey
          AND o.o_orderdate >= v.valid_from
          AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
    """,
)
def j19_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    ck = F.col("c_custkey")
    base = F.lit("1996-01-01").cast("date")
    b1 = F.date_add(base, (ck % 700).cast("int")).cast("timestamp")
    b2 = F.date_add(
        base, (ck % 700 + 400 + ck % 300).cast("int")
    ).cast("timestamp")
    null_ts = F.lit(None).cast("timestamp")
    v1 = cust.select(
        "c_custkey", F.lit(1).cast("bigint").alias("version"),
        "c_mktsegment",
        F.lit("1990-01-01").cast("date").cast("timestamp").alias(
            "valid_from"
        ),
        F.when(ck % 2 == 0, b1).otherwise(null_ts).alias("valid_to"),
    )
    v2 = cust.filter(ck % 2 == 0).select(
        "c_custkey", F.lit(2).cast("bigint").alias("version"),
        "c_mktsegment",
        b1.alias("valid_from"),
        F.when(ck % 4 == 0, b2).otherwise(null_ts).alias("valid_to"),
    )
    v3 = cust.filter(ck % 4 == 0).select(
        "c_custkey", F.lit(3).cast("bigint").alias("version"),
        "c_mktsegment",
        b2.alias("valid_from"),
        null_ts.alias("valid_to"),
    )
    dim = v1.unionByName(v2).unionByName(v3)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    joined = orders.join(
        dim,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (
            F.col("valid_to").isNull()
            | (F.col("o_orderdate") < F.col("valid_to"))
        ),
    )
    return joined.select(
        "o_orderkey", "o_custkey", "o_orderdate", "version",
        F.concat(
            F.col("c_mktsegment"), F.lit("#v"),
            F.col("version").cast("string"),
        ).alias("segment_v"),
    )


@register(
    "a32_sessionization",
    # Batch sessionization (round 10) — the gaps-and-islands assignment
    # every clickstream/trading-activity pipeline runs (st11 is the
    # streaming session window; this is its BATCH face with explicit
    # session ids): a session breaks after a 30-minute silence, so
    # brk = 1[gap > 30 min] and session_id = running sum of brk per
    # user. Gap arithmetic is INTEGER microseconds (unix_micros /
    # epoch_us — the sub-second-safe device; sf0.1 carries sub-second
    # timestamps), so the break decisions are bit-free of float. Cost:
    # one window sort per user + one (user, session) roll-up — the two
    # inherent steps; nothing global.
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, value, epoch_us(ts) AS us
      FROM events
    ), f AS (
      SELECT user_id, ts, event_id, value, us,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value, us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM f
    )
    SELECT user_id, CAST(sid AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(max(us) - min(us) AS BIGINT) AS duration_us,
           (ROUND(SUM(value) - sign(SUM(value)) * 0.000000001, 6) + 0.0)
             AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def a32_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    f = ev.select(
        "user_id", "ts", "event_id", "value", "us",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > 1800000000),
            1,
        ).otherwise(0).alias("brk"),
    )
    # sid window orders by (ts, event_id) — the SAME total order as the
    # brk window. (ts, us) is NOT total when a user has duplicate
    # timestamps (us is just unix_micros(ts)), and a non-total running
    # sum makes session assignment nondeterministic on tied rows —
    # certain to occur at real scale even though the fixtures never tie.
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = f.select(
        "user_id", "ts", "value", "us",
        F.sum("brk").over(ws).alias("sid"),
    )
    return s.groupBy(
        "user_id", F.col("sid").cast("bigint").alias("session_id")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.max("us") - F.min("us")).cast("bigint").alias("duration_us"),
        r6s(F.sum("value")).alias("total_value"),
    )


@register(
    "j20_snapshot_reconcile",
    # Snapshot reconciliation / table diff (round 10) — the data-ops
    # staple next to CDC (the ACID layer's changes() gives the LOG of
    # one table; this diffs TWO independent states, e.g. a migrated
    # copy vs its source): full outer join on the key, each row
    # classified as match / value_drift / missing_right / missing_left,
    # with the drifted column set named. Snapshot B derives from A by
    # deterministic key arithmetic (the sc11 fixture device: deletes
    # keys % 13 = 0, bumps price on keys % 7 = 0, retags status on
    # keys % 11 = 0, inserts shifted keys), so the oracle recomputes
    # the exact classification. At 100 TB: one co-partitioned full
    # outer join on the key — both sides shuffle once; the classifier
    # is a map over the joined row.
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS st
      FROM orders
    ), b AS (
      SELECT k,
             CASE WHEN k % 7 = 0 THEN price + 1.5 ELSE price END AS price,
             CASE WHEN k % 11 = 0 THEN 'X' ELSE st END AS st
      FROM a WHERE k % 13 <> 0
      UNION ALL
      SELECT k + 1000000000, 100.0, 'N' FROM a WHERE k % 17 = 0
    ), j AS (
      SELECT COALESCE(a.k, b.k) AS o_orderkey,
             CASE
               WHEN a.k IS NULL THEN 'missing_left'
               WHEN b.k IS NULL THEN 'missing_right'
               WHEN a.price = b.price AND a.st = b.st THEN 'match'
               ELSE 'value_drift' END AS status,
             CASE
               WHEN a.k IS NULL OR b.k IS NULL THEN NULL
               ELSE concat_ws(',',
                 CASE WHEN a.price <> b.price THEN 'price' END,
                 CASE WHEN a.st <> b.st THEN 'status' END)
             END AS drifted_cols
      FROM a FULL OUTER JOIN b ON b.k = a.k
    )
    SELECT status,
           COALESCE(NULLIF(drifted_cols, ''), '-') AS drifted_cols,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM j GROUP BY 1, 2
    """,
)
def j20_snapshot_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("st"),
    )
    k = F.col("k")
    mutated = a.filter(k % 13 != 0).select(
        "k",
        F.when(k % 7 == 0, F.col("price") + 1.5).otherwise(
            F.col("price")
        ).alias("price"),
        F.when(k % 11 == 0, F.lit("X")).otherwise(F.col("st")).alias("st"),
    )
    inserted = a.filter(k % 17 == 0).select(
        (k + 1000000000).alias("k"),
        F.lit(100.0).alias("price"),
        F.lit("N").alias("st"),
    )
    b = mutated.unionByName(inserted)
    bb = b.select(
        F.col("k").alias("bk"), F.col("price").alias("bprice"),
        F.col("st").alias("bst"),
    )
    j = a.join(bb, F.col("bk") == F.col("k"), "full_outer")
    status = (
        F.when(F.col("k").isNull(), "missing_left")
        .when(F.col("bk").isNull(), "missing_right")
        .when(
            (F.col("price") == F.col("bprice"))
            & (F.col("st") == F.col("bst")),
            "match",
        )
        .otherwise("value_drift")
    )
    drifted = F.when(
        F.col("k").isNull() | F.col("bk").isNull(), F.lit(None)
    ).otherwise(
        F.concat_ws(
            ",",
            F.when(F.col("price") != F.col("bprice"), "price"),
            F.when(F.col("st") != F.col("bst"), "status"),
        )
    )
    rows = j.select(
        F.coalesce(F.col("k"), F.col("bk")).alias("o_orderkey"),
        status.alias("status"),
        drifted.alias("drifted_cols"),
    )
    return rows.groupBy(
        "status",
        F.coalesce(
            F.nullif(F.col("drifted_cols"), F.lit("")), F.lit("-")
        ).alias("drifted_cols"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
    )


@register(
    "a33_funnel",
    # Ordered 3-step funnel (round 11) — the product-analytics staple
    # next to a32's sessionization: of the users who VIEWED, how many
    # later CLICKED, and of those, how many later PURCHASED; each step
    # must occur strictly AFTER the user's first qualifying event of the
    # previous step. Round 12: the per-stage groupBy+join chain (37
    # exchanges at sf0.1) is replaced by a21's recipe — three chained
    # whole-partition window mins over ONE user_id exchange, a per-user
    # roll-up, one single-row count reduction, and an explode pivot to
    # the 3-row output. At 100 TB the event table shuffles on user_id
    # exactly once. Counts are exact integers; the step conversion
    # ratios take the nudged round.
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    ), n AS (
      SELECT (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2,
             (SELECT count(*) FROM s3) AS n3
    )
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS event_type, CAST(n1 AS BIGINT) AS n_users,
             (ROUND(1.0 - 0.000000001, 6) + 0.0) AS conv_from_prev
      FROM n
      UNION ALL
      SELECT 2, 'click', CAST(n2 AS BIGINT),
             (ROUND(n2 * 1.0 / NULLIF(n1, 0)
                    - sign(n2 * 1.0 / NULLIF(n1, 0)) * 0.000000001, 6) + 0.0)
      FROM n
      UNION ALL
      SELECT 3, 'purchase', CAST(n3 AS BIGINT),
             (ROUND(n3 * 1.0 / NULLIF(n2, 0)
                    - sign(n3 * 1.0 / NULLIF(n2, 0)) * 0.000000001, 6) + 0.0)
      FROM n
    )
    """,
)
def a33_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    wu = Window.partitionBy("user_id")
    s1 = ev.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(wu),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(wu),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    counts = per_user.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    one = F.lit(1.0)
    c2 = F.col("n2") * 1.0 / F.nullif(F.col("n1"), F.lit(0))
    c3 = F.col("n3") * 1.0 / F.nullif(F.col("n2"), F.lit(0))
    steps = F.array(
        F.struct(
            F.lit(1).alias("step"), F.lit("view").alias("event_type"),
            F.col("n1").cast("bigint").alias("n_users"),
            r6s(one).alias("conv_from_prev"),
        ),
        F.struct(
            F.lit(2).alias("step"), F.lit("click").alias("event_type"),
            F.col("n2").cast("bigint").alias("n_users"),
            r6s(c2).alias("conv_from_prev"),
        ),
        F.struct(
            F.lit(3).alias("step"), F.lit("purchase").alias("event_type"),
            F.col("n3").cast("bigint").alias("n_users"),
            r6s(c3).alias("conv_from_prev"),
        ),
    )
    return counts.select(F.explode(steps).alias("_s")).select("_s.*")


@register(
    "a34_retention_cohorts",
    # Weekly retention cohorts (round 11) — the other product-analytics
    # staple: users cohorted by the week of their FIRST event, then for
    # each (cohort_week, week_offset) the count of cohort members active
    # that week and the retention ratio against the cohort's size.
    # Weeks are integer epoch-week buckets (epoch_us // (7 days of
    # microseconds)) — pure integer arithmetic, no calendar/timezone
    # divergence between engines. Plan (round 13 — the a33 recipe): the
    # event table shuffles ON USER_ID EXACTLY ONCE, into a groupBy that
    # computes the cohort (min wk) AND the distinct active weeks
    # (collect_set, map-side partial) together; the set explodes to
    # (cohort, offset) cells and a second, cell-volume groupBy counts
    # members. Cohort SIZE needs no third pass over events: every user
    # is active at offset 0 by construction (cw = min wk), so n_cohort
    # IS the off=0 cell's count, read back via one tiny cohort-key
    # window over the cell table. 3 exchanges total (user_id at event
    # volume, then two at cell volume), pinned in tests/test_plans.py.
    # The round-11 shape re-aggregated per (cohort, offset) via a
    # groupBy+join+distinct chain — 5 exchanges, two at event volume.
    oracle="""
    WITH w AS (
      SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
    ), cohort AS (
      SELECT user_id, min(wk) AS cw FROM w GROUP BY user_id
    ), sizes AS (
      SELECT cw, count(*) AS n_cohort FROM cohort GROUP BY cw
    ), active AS (
      SELECT DISTINCT c.cw, w.wk - c.cw AS off, w.user_id
      FROM w JOIN cohort c ON c.user_id = w.user_id
    )
    SELECT a.cw AS cohort_week,
           CAST(a.off AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(s.n_cohort AS BIGINT) AS n_cohort,
           (ROUND(count(*) * 1.0 / s.n_cohort
                  - sign(count(*) * 1.0 / s.n_cohort) * 0.000000001, 6)
            + 0.0) AS retention
    FROM active a JOIN sizes s ON s.cw = a.cw
    GROUP BY a.cw, a.off, s.n_cohort
    """,
)
def a34_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unix_micros div 7-day-us: INTEGER division on both engines (`div`
    # in Spark, `//` in DuckDB) — a double quotient could misround at a
    # week boundary; integer division cannot.
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts) div 604800000000").alias("wk"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("wk").alias("cw"),
        F.collect_set("wk").alias("wks"),
    )
    cells = (
        per_user.select("cw", F.explode("wks").alias("wk"))
        .select("cw", (F.col("wk") - F.col("cw")).alias("off"))
        .groupBy("cw", "off")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    wcw = Window.partitionBy("cw")
    sized = cells.withColumn(
        "n_cohort",
        F.max(F.when(F.col("off") == 0, F.col("n_active"))).over(wcw),
    )
    ret = F.col("n_active") * 1.0 / F.col("n_cohort")
    return sized.select(
        F.col("cw").alias("cohort_week"),
        F.col("off").cast("bigint").alias("week_offset"),
        "n_active",
        F.col("n_cohort").cast("bigint").alias("n_cohort"),
        r6s(ret).alias("retention"),
    )
