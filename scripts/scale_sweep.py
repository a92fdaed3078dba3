"""10x scale-sanity sweep with the streaming hash comparator.

Builds the 10x dataset (scripts/build_10x.py methodology) if absent,
then runs EVERY registered query against its DuckDB oracle using
``tests.hash_compare`` — both engines reduce to (count, md5-sum digest),
so the comparator never materializes a multi-million-row result on the
driver (the sc03 OOM documented in SCALE.md round 4). Queries without an
oracle run rows-only, exactly like scripts/bare_sweep.py.

Usage::

    python scripts/scale_sweep.py [sf_dir=/tmp/sf1.0] [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "build_10x.py"),
             "/root/testdata/sf0.1", sf_dir],
            check=True,
        )

    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from tests.hash_compare import run_hash_compare

    # NOT the bare driver session (that contract is the sf0.01 gate):
    # at 10x the bucketed-table write OOMs the 1g default driver heap.
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = e.queries(), e.oracle_sql()
    results: dict[str, str] = {}
    for name in sorted(qs):
        try:
            if name in oracles:
                run_hash_compare(spark, sf_dir, name, qs[name], oracles[name])
                results[name] = "match"
            else:
                qs[name](spark, sf_dir).count()
                results[name] = "rows-only: ran"
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            results[name] = f"fail: {str(ex)[:300]}"
            print(f"FAIL {name}: {str(ex)[:200]}", file=sys.stderr)

    n_fail = sum(v.startswith("fail") for v in results.values())
    summary = {
        "sf_dir": sf_dir,
        "comparator": "hash-digest (tests/hash_compare.py)",
        "queries": len(qs),
        "oracles": len(oracles),
        "failed": n_fail,
        "results": results,
    }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
    print(
        f"scale sweep @ {sf_dir}: {len(qs) - n_fail}/{len(qs)} ok, {n_fail} fail"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
