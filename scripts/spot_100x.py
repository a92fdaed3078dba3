"""100x spot-check of the top-3 headline queries (round-6 VERDICT item 8).

Builds a 100x fact dataset in /tmp (duckdb replication of the sf0.1
events/lineitem/orders under shifted keys — build_10x.py's method at
factor 100; documents 8x, dims symlinked) and warm-times
q1_pricing_summary, g01_grid_fill_hourly, f20_gold_matrix against it.
Pass criterion: wall-time grows no faster than data past the 10x point
(no new plan cliffs) — results recorded in SCALE.md.

Usage::

    python scripts/spot_100x.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["q1_pricing_summary", "g01_grid_fill_hourly", "f20_gold_matrix"]


def build(src: str, out: str, factor: int = 100) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET, CODEC 'SNAPPY')"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    copy(
        f"""
        SELECT event_id + r * 1000000000 AS event_id, ts,
               user_id + r * 150 AS user_id, event_type, value, props
        FROM '{src}/events.parquet', range({factor}) t(r)
        """,
        "events",
    )
    copy(
        f"""
        SELECT l_orderkey + r * 100000000 AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate
        FROM '{src}/lineitem.parquet', range({factor}) t(r)
        """,
        "lineitem",
    )
    copy(
        f"""
        SELECT o_orderkey + r * 100000000 AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM '{src}/orders.parquet', range({factor}) t(r)
        """,
        "orders",
    )
    copy(
        f"""
        SELECT doc_id + r * 1000000 AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE text || ' v' || CAST(r AS VARCHAR) END AS text,
               * EXCLUDE (doc_id, text)
        FROM '{src}/documents.parquet', range(8) t(r)
        """,
        "documents",
    )
    for dim in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        dst = f"{out}/{dim}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src}/{dim}.parquet", dst)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_100x"
    if not os.path.exists(f"{out}/lineitem.parquet"):
        build(src, out)

    from equity_volatility_lakehouse_platform_spark.plans import all_queries, load_all
    from equity_volatility_lakehouse_platform_spark.session import get_spark

    load_all()
    qs = all_queries()
    spark = get_spark(app_name="spot-100x")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    for name in QUERIES:
        df = qs[name](spark, out)
        df.write.mode("overwrite").format("noop").save()  # warm: codegen etc.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 2)
        print(name, timings[name], "s")
    print(json.dumps({"scale": "100x-sf0.1", "timings": timings}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
