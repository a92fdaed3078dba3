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

For each of st10/st14/st15/st16/st17/st22 at factor 1 and 100 it
records wall, output rows, and the state-store telemetry captured by
events_stream.LAST_PROGRESS (numRowsTotal summed over state operators,
state partitions). A RocksDB-provider variant re-validates the
HDFS-vs-RocksDB decision of SCALE.md addendum 3 in the large-state
regime it explicitly left untested.

PROTOCOL (second r12 cut): every cell runs in its OWN subprocess with
a fresh engine session (session.get_spark — measuring the engine as
shipped, not a hand-rolled builder). The first cut ran all cells in one
long-lived JVM: each streaming row localCheckpoints its full output
(9.1M rows for the sessionizers) into the shared block manager, so
later cells paid the earlier cells' heap — st22's f100 measured 252 s
late in a full matrix vs 102 s in a fresh JVM, and every row inflated
monotonically with run position. Subprocess isolation makes cells
position-independent and reproducible.

Usage: python scripts/spot_state_100x.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
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
# RocksDB re-validation in the large-state regime (one stream-stream
# join + both sessionizers).
ROCKSDB_QUERIES = (
    "st14_stream_stream_left_join",
    "st17_stateful_timeout_sessions",
    "st22_session_window_sessions",
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


def run_cell(name: str, sf_dir: str, provider: str | None) -> dict:
    """Run one (query, dataset, provider) cell in THIS process and
    return its measurement dict. Invoked only in --cell subprocesses."""
    from equity_volatility_lakehouse_platform_spark.plans import (
        all_queries,
        load_all,
    )
    from equity_volatility_lakehouse_platform_spark.session import get_spark
    from equity_volatility_lakehouse_platform_spark.streaming import (
        events_stream,
    )

    extra = {
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g")
    }
    if provider == "rocksdb":
        extra["spark.sql.streaming.stateStore.providerClass"] = ROCKSDB
    spark = get_spark(
        app_name="spot-state-100x",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf=extra,
    )
    load_all()
    # Warm the fresh JVM on the SMALL (f1) dataset first — codegen, JIT,
    # state-store machinery, Python worker pool all pay their one-time
    # cost outside the timed region (the bench.py protocol). Without it
    # the f1 cells measure ~10 s of cold-start and the wall ratios
    # deflate to meaninglessness.
    all_queries()[name](spark, build_events(1)).count()
    # Pre-touch the TIMED dataset too (round-13 ADVICE): the f1 warmup
    # leaves the f1 input page-cached while an f100 cell would first-
    # touch its 112 MB input inside the timed region — wall_ratio was
    # systematically inflated by cold-read I/O on a host already
    # documented as I/O-noisy. A raw byte read guarantees page-cache
    # residency regardless of parquet pruning, so both factors time
    # equally-cached inputs.
    for fname in os.listdir(sf_dir):
        if fname.endswith(".parquet"):
            with open(os.path.join(sf_dir, fname), "rb") as fh:
                while fh.read(1 << 24):
                    pass
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


def spawn_cell(name: str, sf_dir: str, provider: str | None) -> dict:
    """Fresh-JVM measurement: re-exec this script in --cell mode and
    parse the single JSON line it prints last."""
    cmd = [sys.executable, os.path.abspath(__file__), "--cell", name,
           sf_dir, provider or "default"]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"cell {name} ({provider or 'default'}) failed:\n"
            + proc.stderr[-2000:]
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--cell":
        name, sf_dir, provider = sys.argv[2], sys.argv[3], sys.argv[4]
        r = run_cell(name, sf_dir, None if provider == "default" else provider)
        print(json.dumps(r), flush=True)
        return 0

    out_path = sys.argv[1] if len(sys.argv) > 1 else "SPOT_STATE_100x_r12.json"
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
            r = spawn_cell(name, sf_dir, None)
            results.setdefault(name, {})[f"f{factor}"] = r
            print(f"f{factor} {name}: {r}", flush=True)

    for name in ROCKSDB_QUERIES:
        if name not in active:
            continue
        r = spawn_cell(name, build_events(100), "rocksdb")
        results[name]["f100_rocksdb"] = r
        print(f"f100[rocksdb] {name}: {r}", flush=True)

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
