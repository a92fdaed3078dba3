"""Build the 10x scale-sanity dataset (SCALE.md methodology).

Replicates the sf0.1 fact tables 10x under shifted keys with DuckDB —
events (1M rows / 1,500 users), lineitem (6M), orders (1.5M), documents
(4x -> 20k, shifted doc_ids with perturbed text so dedup stays
non-degenerate) — and symlinks the dimension tables unchanged. Output is
a directory usable as ``sf_dir`` by every query and by bench.py
(``SPARK_GRAFT_SF_DIR=/tmp/sf1.0 python bench.py``). Not committed data;
rebuild on demand::

    python scripts/build_10x.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET, CODEC 'SNAPPY')"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    ev = f"'{src}/events.parquet'"
    copy(
        f"""
        SELECT event_id + r * 1000000000 AS event_id, ts,
               user_id + r * 150 AS user_id,
               event_type, value, props
        FROM {ev}, range(10) t(r)
        """,
        "events",
    )
    copy(
        f"""
        SELECT l_orderkey + r * 100000000 AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate
        FROM '{src}/lineitem.parquet', range(10) t(r)
        """,
        "lineitem",
    )
    copy(
        f"""
        SELECT o_orderkey + r * 100000000 AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM '{src}/orders.parquet', range(10) t(r)
        """,
        "orders",
    )
    copy(
        f"""
        SELECT doc_id + r * 1000000 AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE text || ' v' || CAST(r AS VARCHAR) END AS text,
               * EXCLUDE (doc_id, text)
        FROM '{src}/documents.parquet', range(4) t(r)
        """,
        "documents",
    )
    for dim in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        dst = f"{out}/{dim}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src}/{dim}.parquet", dst)
        print(f"{dim}: symlinked")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
