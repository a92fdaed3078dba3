"""Pre-commit parity gate for new/changed queries.

Round-6 postmortem: st14 was written, registered, and snapshot-committed
without a single oracle-parity run, and shipped a wrong answer (VERDICT
r6). This gate makes that impossible to repeat cheaply: it computes the
DELTA between the current registry and the repo's evidence + git state,
and runs the full bit-exact oracle compare on exactly that delta.

A query is "in the delta" when EITHER
  * its name is absent from the newest committed ``BARE_SWEEP_r*.json``
    (i.e. it has never had durable full-sweep evidence), OR
  * the source file defining its builder has uncommitted modifications
    (``git diff/status`` vs HEAD) — the exact st14 scenario: an edited
    plan about to be committed on the strength of a stale artifact.

Usage::

    python scripts/check_new.py                 # delta at sf0.001 (fast)
    python scripts/check_new.py --sf sf0.01     # delta at sf0.01
    python scripts/check_new.py --all           # whole registry
    python scripts/check_new.py st14_stream_stream_left_join ...  # named

Exits non-zero on any mismatch. Intended use (documented in README):
run before any commit that registers or edits a query.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _latest_sweep_names() -> set[str]:
    """Query names present in the newest committed BARE_SWEEP artifact."""
    best, best_round = None, -1
    for path in glob.glob(os.path.join(REPO, "BARE_SWEEP_r*.json")):
        m = re.search(r"BARE_SWEEP_r(\d+)", os.path.basename(path))
        if m and int(m.group(1)) >= best_round:
            # Prefer the plain-sf artifact at equal round numbers.
            if int(m.group(1)) > best_round or "_sf" not in path:
                best, best_round = path, int(m.group(1))
    if best is None:
        return set()
    with open(best) as f:
        return set(json.load(f).get("results", {}))


def _dirty_files() -> set[str]:
    """Repo-relative paths with uncommitted changes (staged or not)."""
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
    except Exception:
        return set()
    files = set()
    for line in out.splitlines():
        # "XY path" or "XY old -> new" for renames.
        path = line[3:].split(" -> ")[-1].strip()
        if path.endswith(".py"):
            files.add(path)
    return files


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf = "sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i:i + 2]
    run_all = "--all" in args
    args = [a for a in args if a != "--all"]
    sf_dir = sf if os.path.isabs(sf) else f"/root/testdata/{sf}"

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()

    if args:
        delta = [n for n in args if n in qs]
        unknown = sorted(set(args) - set(delta))
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
    elif run_all:
        delta = sorted(qs)
    else:
        evidenced = _latest_sweep_names()
        dirty = _dirty_files()
        delta = sorted(
            n for n, fn in qs.items()
            if n not in evidenced
            or os.path.relpath(fn.__code__.co_filename, REPO) in dirty
        )

    if not delta:
        print("check_new: delta is empty — nothing new or modified to verify")
        return 0
    print(f"check_new: verifying {len(delta)} queries at {sf_dir}: {delta}")

    from pyspark.sql import SparkSession
    from tests.oracle_compare import run_compare

    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
    ).config("spark.ui.showConsoleProgress", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    failed = []
    for name in delta:
        try:
            if name in oracles:
                run_compare(spark, sf_dir, name, qs[name], oracles[name])
                print(f"  {name}: match")
            else:
                qs[name](spark, sf_dir).count()
                print(f"  {name}: rows-only ran (no oracle)")
        except Exception as ex:  # noqa: BLE001 — report every failure
            failed.append(name)
            print(f"  {name}: FAIL {str(ex)[:300]}", file=sys.stderr)

    if failed:
        print(f"check_new: {len(failed)} FAILED: {failed}", file=sys.stderr)
        return 1
    print(f"check_new: all {len(delta)} green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
