"""State-growth-axis spot for streaming (round 12).

The corpus spot (spot_100x.py) scales DATA and the query spot
(spot_queries_100x.py) scales QUERIES; this scales the axis a
long-running production stream actually grows on — DISTINCT KEYS and
stream length. The sf0.1 events table (100k rows / 1,500 users) is
replicated 100x with OFFSET user_ids and event_ids (timestamps
unchanged), so 150k keys hold live state simultaneously inside one
watermark horizon and the stream is 10M rows long; per-key event volume
stays constant, so correct state handling means wall and state rows grow
~linearly with keys — anything superlinear is a state-management bug.

For each of st10/st14/st15/st16/st17 at factor 1 and 100 it records
wall, output rows, and the state-store telemetry captured by
events_stream.LAST_PROGRESS (numRowsTotal summed over state operators,
state partitions). A RocksDB-provider variant re-validates the
HDFS-vs-RocksDB decision of SCALE.md addendum 3 in the large-state
regime it explicitly left untested.

Usage: python scripts/spot_state_100x.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1/events.parquet"
QUERIES = (
    "st10_stream_stream_join",
    "st14_stream_stream_left_join",
    "st15_stream_stream_right_join",
    "st16_stream_stream_full_join",
    "st17_stateful_timeout_sessions",
    # round 12: the native session_window migration target next to the
    # GroupState sessionizer it replaces — same keys, same gap.
    "st22_session_window_sessions",
)
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def build_events(factor: int) -> str:
    import duckdb

    root = f"/tmp/evlp_state_spot_f{factor}"
    if os.path.exists(os.path.join(root, "events.parquet")):
        return root
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + k.k * 1000000 AS event_id,
                 e.ts,
                 e.user_id + k.k * 100000 AS user_id,
                 e.event_type, e.value, e.props
          FROM read_parquet('{BASE}') e
          CROSS JOIN (SELECT unnest(range(0, {factor})) AS k) k
        ) TO '{root}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return root


def run_one(spark, name: str, sf_dir: str) -> dict:
    from equity_volatility_lakehouse_platform_spark.plans import (
        all_queries,
        load_all,
    )
    from equity_volatility_lakehouse_platform_spark.streaming import (
        events_stream,
    )

    load_all()
    t0 = time.time()
    out = all_queries()[name](spark, sf_dir)
    n = out.count()
    wall = time.time() - t0
    prog = events_stream.LAST_PROGRESS or {}
    ops = prog.get("stateOperators") or []
    return {
        "wall_s": round(wall, 2),
        "rows_out": n,
        "state_rows_total": sum(o.get("numRowsTotal", 0) for o in ops),
        "state_partitions": max(
            (o.get("numShufflePartitions", 0) for o in ops), default=0
        ),
        "n_state_operators": len(ops),
    }


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SPOT_STATE_100x_r12.json"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # SPOT_STATE_QUERIES=a,b runs a subset and MERGES into an existing
    # out file (adding one query must not re-pay the whole matrix).
    sel = os.environ.get("SPOT_STATE_QUERIES")
    active = tuple(sel.split(",")) if sel else QUERIES
    results: dict = {"axis": "state (distinct keys x stream length)"}
    if sel and os.path.exists(out_path):
        with open(out_path) as f:
            results.update(json.load(f))
    for factor in (1, 100):
        sf_dir = build_events(factor)
        for name in active:
            r = run_one(spark, name, sf_dir)
            results.setdefault(name, {})[f"f{factor}"] = r
            print(f"f{factor} {name}: {r}", flush=True)

    # RocksDB re-validation in the large-state regime (one stream-stream
    # join + the applyInPandasWithState sessionizer).
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        for name in ("st14_stream_stream_left_join",
                     "st17_stateful_timeout_sessions",
                     "st22_session_window_sessions"):
            if name not in active:
                continue
            r = run_one(spark, name, build_events(100))
            results[name]["f100_rocksdb"] = r
            print(f"f100[rocksdb] {name}: {r}", flush=True)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    for name in active:
        f1, f100 = results[name]["f1"], results[name]["f100"]
        results[name]["wall_ratio"] = round(
            f100["wall_s"] / max(f1["wall_s"], 1e-9), 1
        )
        results[name]["state_rows_ratio"] = round(
            f100["state_rows_total"] / max(f1["state_rows_total"], 1), 1
        )

    print(json.dumps(results, indent=1))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
