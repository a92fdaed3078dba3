"""Capture explain("formatted") for bench-tier queries into plans/r14/.

Round-14 optimization tooling: writes one ``<query>_<tag>.txt`` per
headline + extended query (or an explicit list) so plan claims in
OPTIMIZATION_r14.md are checkable without running Spark.

Usage:
    python scripts/capture_plans.py before [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTENDED, HEADLINE  # noqa: E402
from equity_volatility_lakehouse_platform_spark.plans import (  # noqa: E402
    all_queries,
    load_all,
)
from equity_volatility_lakehouse_platform_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (HEADLINE + EXTENDED)
    os.makedirs(OUT, exist_ok=True)
    load_all()
    queries = all_queries()
    spark = get_spark(app_name="capture-plans")
    for name in names:
        if name not in queries:
            print(f"skip (unregistered): {name}")
            continue
        spark.sparkContext.setJobDescription(f"plan: {name}")
        df = queries[name](spark, SF)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        txt = df._jdf.queryExecution().explainString(mode)  # noqa: SLF001
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name:36s} -> {path}  (Exchange x{n_ex})")
    spark.stop()


if __name__ == "__main__":
    main()
