"""100x QUERY-axis spot (round-11 VERDICT item 2).

Every corpus-axis 100x spot so far scales the DATA while the retrieval
query set stays fixture-sized (3 probes) — but a production retrieval
service grows on the QUERY axis. This spot holds the corpus fixed
(sf0.1) and scales the query workload 100x (n_queries 3 -> 300;
ml12's eval set via eval_mod 20 -> 1 = 20x, the max its corpus-
proportional design allows), gating on:

  * exchange count at 100x queries == at 3 queries (the plan must not
    reshape — in particular nothing query-derived may flip the join
    strategy);
  * wall ratio well below the query factor (corpus-side work dominates
    by design: assignment/encoding is shared across queries, so more
    queries must amortize, not multiply).

Results merge into the corpus-axis artifact (SCALE_SPOT_100x_r11.json)
under "query_axis".

Usage::

    python scripts/spot_queries_100x.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, kwargs at baseline, kwargs at scaled, query factor)
CASES = [
    ("sim01_bruteforce_topk", {"n_queries": 3}, {"n_queries": 300}, 100),
    ("sim04_ivf_ann_topk", {"n_queries": 3}, {"n_queries": 300}, 100),
    ("sim08_ivfadc_topk", {"n_queries": 3}, {"n_queries": 300}, 100),
    ("sim10_mmr_diversify", {"n_queries": 3}, {"n_queries": 300}, 100),
    ("sim11_ann_mmr", {"n_queries": 3}, {"n_queries": 300}, 100),
    ("sim12_persisted_ivf_index", {"n_queries": 3}, {"n_queries": 300}, 100),
    ("sim14_radius_search", {"n_queries": 3}, {"n_queries": 300}, 100),
    ("ml12_knn_classify", {"eval_mod": 20}, {"eval_mod": 1}, 20),
    # round 12: the ANN-backed eval loop next to its brute-force audit —
    # same 20x eval-set growth, but per-query work is O(nprobe * cap)
    # instead of O(N), so the wall must amortize where ml12's is linear.
    ("ml23_knn_classify_ann", {"eval_mod": 20}, {"eval_mod": 1}, 20),
    # round 14: the hierarchical coarse path — per-query work is
    # O(nprobe * cell + cap) like sim04's, so queries must amortize.
    ("sim15_two_level_ivf_topk", {"n_queries": 3}, {"n_queries": 300}, 100),
    # round 14: hard-negative mining — the brute audit tier (anchors x
    # corpus BNLJ, ml12's contract); the production path mines from the
    # IVFADC shortlist instead.
    ("ml25_contrastive_mining", {"n_anchors": 8}, {"n_anchors": 800}, 100),
]

# Same rebuild discipline as the corpus-axis spot: these train/write
# per call, so each timed run must pay the whole pipeline.
REBUILD = {"sim08_ivfadc_topk", "sim11_ann_mmr", "sim12_persisted_ivf_index",
           "sim15_two_level_ivf_topk"}

# Brute-force baselines whose WORK is Q x N by definition (sim01/ml12
# score every corpus vector per query; sim10's candidate stage is
# sim01's). Linear-in-Q wall is their correct behavior — the gate only
# flags growth past the query factor with headroom for timing noise.
# The production paths (sim04/sim08/sim11/sim12) must amortize far
# below the factor.
LINEAR_BY_DESIGN = {
    "sim01_bruteforce_topk", "sim10_mmr_diversify", "ml12_knn_classify",
    "ml25_contrastive_mining",
}


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def _time(df) -> float:
    df.write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _time_rebuild(fn, spark, d, kw) -> float:
    fn(spark, d, **kw).write.mode("overwrite").format("noop").save()
    t0 = time.perf_counter()
    fn(spark, d, **kw).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None

    from equity_volatility_lakehouse_platform_spark.plans import all_queries, load_all
    from equity_volatility_lakehouse_platform_spark.session import get_spark

    load_all()
    qs = all_queries()
    spark = get_spark(app_name="spot-queries-100x")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    failures: list[str] = []
    run = [c for c in CASES if not os.environ.get("SPOT_QUERIES")
           or c[0] in os.environ["SPOT_QUERIES"].split(",")]
    for name, kw_base, kw_big, factor in run:
        fn = qs[name]
        if name in REBUILD:
            t_base = _time_rebuild(fn, spark, sf_dir, kw_base)
            t_big = _time_rebuild(fn, spark, sf_dir, kw_big)
        else:
            t_base = _time(fn(spark, sf_dir, **kw_base))
            t_big = _time(fn(spark, sf_dir, **kw_big))
        x_base = _exchanges(fn(spark, sf_dir, **kw_base))
        x_big = _exchanges(fn(spark, sf_dir, **kw_big))
        rec = {
            "query_factor": factor,
            "base_sec": round(t_base, 2),
            "scaled_sec": round(t_big, 2),
            "wall_ratio": round(t_big / t_base, 1) if t_base > 0 else None,
            "exchanges_base": x_base,
            "exchanges_scaled": x_big,
        }
        if x_big > x_base:
            failures.append(
                f"{name}: exchanges grew {x_base} -> {x_big} at {factor}x "
                "queries (plan reshaped by the workload size)"
            )
        limit = factor * 1.25 if name in LINEAR_BY_DESIGN else factor
        if name in LINEAR_BY_DESIGN:
            rec["linear_by_design"] = True
        if t_base > 0 and t_big / t_base > limit:
            failures.append(
                f"{name}: wall ratio {t_big / t_base:.1f}x exceeds the "
                f"{factor}x query factor (superlinear in the workload)"
            )
        results[name] = rec
        print(name, json.dumps(rec))
    section = {"corpus": sf_dir, "results": results, "failures": failures}
    if out_json:
        merged = {}
        if os.path.exists(out_json):
            with open(out_json) as fh:
                merged = json.load(fh)
        if os.environ.get("SPOT_MERGE") and "query_axis" in merged:
            # subset runs (SPOT_QUERIES=...) update/append their rows
            # instead of clobbering the other queries' results
            prior = merged["query_axis"]
            prior.setdefault("results", {}).update(section["results"])
            prior["corpus"] = section["corpus"]
            prior["failures"] = [
                f for f in prior.get("failures", [])
                if f.split(":")[0] not in section["results"]
            ] + section["failures"]
        else:
            merged["query_axis"] = section
        with open(out_json, "w") as fh:
            fh.write(json.dumps(merged) + "\n")
    print(json.dumps(section))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
