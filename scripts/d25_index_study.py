"""d25 materialize-once/serve-many study (round 14 — the snk21 recipe
applied to the registry's most expensive query).

Measures, at one SF on a warm session:
  * d25 DIRECT per-run wall (clip synth + container walk + PNG decode +
    band join, recomputed every run — the r13 shape);
  * the INDEX BUILD (decode once, write the 192-bit fingerprints as
    parquet);
  * d25 SERVED from the index per-run wall (column-pruned index scan +
    the hint-pinned Hamming band join only).

The serve leg is the steady-state cost every repeat consumer pays once
a corpus snapshot's index exists. Result-invisibility is gated
elsewhere (snk22's oracle IS d25's; tests/test_plans.py pins the serve
plan never rescans documents or re-decodes).

Usage: python scripts/d25_index_study.py [sf_dir] [out.json] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "D25_INDEX_r14.json"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from equity_volatility_lakehouse_platform_spark.operators.multimodal import (
        synth_video_pair_payloads,
        video_fp_bands_frame,
    )
    from equity_volatility_lakehouse_platform_spark.plans.multimodal import (
        d25_perceptual_video_neardup,
    )
    from equity_volatility_lakehouse_platform_spark.session import get_spark
    from equity_volatility_lakehouse_platform_spark.sources.readers import (
        load_table,
    )
    from equity_volatility_lakehouse_platform_spark.sources.sinks import (
        session_scratch,
    )

    spark = get_spark(app_name="d25-index-study")

    def timed(fn) -> list[float]:
        fn()  # warm codegen / broadcast init
        walls = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 3))
        return walls

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    direct = timed(lambda: noop(d25_perceptual_video_neardup(spark, sf_dir)))

    path = session_scratch("d25study", sf_dir) + "/video_fp_index"
    t0 = time.perf_counter()
    video_fp_bands_frame(
        synth_video_pair_payloads(load_table(spark, sf_dir, "documents"))
    ).write.mode("overwrite").parquet(path)
    build = round(time.perf_counter() - t0, 3)

    served = timed(
        lambda: noop(d25_perceptual_video_neardup(spark, sf_dir, fp_path=path))
    )
    spark.stop()

    rec = {
        "sf_dir": sf_dir,
        "n_runs": n_runs,
        "direct_sec": direct,
        "index_build_sec": build,
        "served_sec": served,
        "speedup_min_over_min": round(min(direct) / min(served), 2),
    }
    with open(out_json, "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
