"""st17/st22 x {HDFS, RocksDB} store-provider decision matrix (round 13).

Round-12 addendum 3 left the sessionizer store-provider choice
UNRESOLVED: st22's RocksDB leg measured 157/303/489/1058 s across four
same-code runs under documented monotonic host I/O noise, so no stable
separation existed. This re-runs the four (query, provider) cells at
f100 (150k live keys, 10M rows) with:

  * a fresh JVM per cell (spot_state_100x.py --cell — the engine as
    shipped, no shared-block-manager contamination),
  * the round-13 pre-touch fix (the timed dataset is page-cached
    OUTSIDE the timed region, both providers equally),
  * N repeats per cell, STRICTLY INTERLEAVED across providers and
    queries (the AB_EXT discipline applied to the store decision), so
    machine drift hits every cell equally and only a genuine provider
    difference can separate them,
  * min / median / spread recorded per cell — the spread IS the noise
    band that round-12 lacked.

Usage: python scripts/statestore_matrix.py [out.json] [n_reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

# Repo root (for the engine package) AND the scripts dir itself (for
# spot_state_100x) — the latter so the import also resolves when this
# module is run via -m or imported from elsewhere, not only when
# sys.path[0] happens to be scripts/ (round-13 ADVICE).
_SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS_DIR))
sys.path.insert(0, _SCRIPTS_DIR)

from spot_state_100x import build_events, spawn_cell  # noqa: E402

CELLS = [
    ("st17_stateful_timeout_sessions", None),
    ("st17_stateful_timeout_sessions", "rocksdb"),
    ("st22_session_window_sessions", None),
    ("st22_session_window_sessions", "rocksdb"),
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "STATESTORE_MATRIX_r13.json"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = build_events(100)
    runs: dict[str, list[dict]] = {f"{q}@{p or 'hdfs'}": [] for q, p in CELLS}
    for rep in range(n_reps):
        for q, p in CELLS:  # strict interleave
            r = spawn_cell(q, sf_dir, p)
            key = f"{q}@{p or 'hdfs'}"
            runs[key].append(r)
            print(f"rep {rep + 1} {key}: {r}", flush=True)

    summary = {}
    for key, rs in runs.items():
        walls = [r["wall_s"] for r in rs]
        summary[key] = {
            "walls_s": walls,
            "min_s": round(min(walls), 2),
            "median_s": round(statistics.median(walls), 2),
            "spread_pct": round(
                100.0 * (max(walls) - min(walls)) / max(min(walls), 1e-9), 1
            ),
            "state_rows_total": rs[0]["state_rows_total"],
            "state_partitions": rs[0]["state_partitions"],
        }
    record = {
        "method": "fresh-JVM per cell, pre-touched inputs, strictly "
        "interleaved across providers, N reps; min/median/spread per cell",
        "dataset": "f100 (150k keys, 10M rows)",
        "n_reps": n_reps,
        "cells": summary,
    }
    line = json.dumps(record, indent=1)
    print(line)
    with open(out_path, "w") as fh:
        fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
