"""Driver-identical correctness sweep.

Runs EVERY registered query against its DuckDB oracle on a BARE
SparkSession (``SparkSession.builder.master(...).getOrCreate()`` with no
repo confs) — exactly what the external correctness driver injects. The
engine must assert any conf it needs at the read site
(``sources/readers.py:load_table``), never trust the session.

Usage::

    python scripts/bare_sweep.py [sf_dir] [out.json]

Writes a JSON artifact {name: "match" | "fail: ..."} and exits non-zero
on any failure.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from tests.oracle_compare import run_compare

    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    from equity_volatility_lakehouse_platform_spark.sources.scratch import (
        scratch_base,
    )

    # Watch BOTH scratch roots: tempfile's default and the engine's
    # fast-scratch base (round 14) — a leak in either is a leak.
    watch = {tempfile.gettempdir()}
    if scratch_base():
        watch.add(scratch_base())
    tmp_before = {(w, d) for w in watch for d in os.listdir(w)}

    qs, oracles = e.queries(), e.oracle_sql()
    results: dict[str, str] = {}
    for name in sorted(qs):
        try:
            if name in oracles:
                run_compare(spark, sf_dir, name, qs[name], oracles[name])
                results[name] = "match"
            else:
                qs[name](spark, sf_dir).count()
                results[name] = "rows-only: ran"
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            results[name] = f"fail: {str(ex)[:300]}"
            print(f"FAIL {name}: {str(ex)[:200]}", file=sys.stderr)

    n_fail = sum(v.startswith("fail") for v in results.values())
    # Scratch hygiene (round 12): every sink/index query goes through
    # sources.sinks.session_scratch (reused+wiped per query, removed at
    # exit), so a full sweep may create at most the per-query scratch
    # roots of THIS process — anything else is a leak.
    pid_tag = f"_p{os.getpid()}"
    leaked = sorted(
        f"{w}/{d}"
        for (w, d) in {
            (w, d) for w in watch for d in os.listdir(w)
        } - tmp_before
        if not d.endswith(pid_tag)
        # Spark/JVM session artifacts, not engine scratch: native codec
        # libs, the connect artifacts dir, JVM perf files.
        and not d.startswith(
            ("spark-", "blockmgr-", "hive", "temporary", "artifacts-",
             "liblz4", "snappy-", "libzstd", "hsperfdata")
        )
    )
    if leaked:
        print(f"SCRATCH LEAK: {leaked}", file=sys.stderr)

    summary = {
        "sf_dir": sf_dir,
        "queries": len(qs),
        "oracles": len(oracles),
        "failed": n_fail,
        "tmp_leaked": leaked,
        "results": results,
    }
    payload = json.dumps(summary, indent=1, sort_keys=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(payload + "\n")
    print(f"bare sweep @ {sf_dir}: {len(qs) - n_fail}/{len(qs)} ok, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
