"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect — the same way you'd measure on a cluster).

NOISE RULE (round 14 — BENCH_r13's j01/j05/q1 rows drifted +29-38% on
untouched code while the same-code refresh measured 0.96x): the printed
line now carries per-query relative spread ("spread_pct": stddev/best
as integer percent, arrays aligned with the key order of "queries" /
"extended_queries"; full stats stay in the BENCH_FULL sidecar). A
round-over-round per-query regression is REAL iff
  new_best > old_best * (1 + (2 * max(spread_old, spread_new) + 5) / 100)
— i.e. it must clear twice the larger measured noise band plus 5
points; anything inside the band is host drift, not code. Deltas past
~20% should additionally be confirmed by the interleaved A/B
(scripts/ab_extended.py) before being acted on — the same-hour paired
protocol that exonerated the r12 scare.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from equity_volatility_lakehouse_platform_spark.plans import all_queries, load_all
from equity_volatility_lakehouse_platform_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "j01_equi_inner_join",
    "j05_interval_tag_join",
    "a01_ordered_ohlcv_rollup",
    "a11_quality_invariants",
    "w04_lag_ladder",
    "w08_rolling_median",
    "o04_topk",
    "f12_z_pm_comp",
    "f20_gold_matrix",
    "j12_asof_join",
    "g01_grid_fill_hourly",
    "d01_exact_dedup",
    "d03_minhash_lsh_pairs",
    "sim01_bruteforce_topk",
    "sim04_ivf_ann_topk",
    "t02_quality_score",
    "st01_tumbling_window",
]

# Extended tier (round 8): the heavy round-6/7/8 machinery with no prior
# committed timing trend — streaming outer joins and timeout sessions,
# MERGE/ZORDER sinks, chunk dedup, the curation DAG, trained-codebook
# PQ, event segmentation. Timed best-of-3 (they are seconds-scale each)
# and reported in the same JSON so regressions are visible
# round-over-round; the headline total stays the 18-query metric for
# cross-round comparability.
EXTENDED = [
    "st14_stream_stream_left_join",
    "st15_stream_stream_right_join",
    "st16_stream_stream_full_join",
    "st17_stateful_timeout_sessions",
    "snk09_merge_upsert",
    "snk10_zorder_layout",
    "d14_chunk_dedup",
    "d16_curation_dag",
    "sim06_pq_ann_topk",
    "f19_event_segmentation",
    # round 9: trained-coarse IVFADC, semantic/CDC dedup, the MMR
    # re-rank, the jump decomposition, the cross-sectional transform,
    # and the streaming CDC apply.
    "sim08_ivfadc_topk",
    "d17_semantic_dedup",
    "d18_cdc_chunk_dedup",
    "sim10_mmr_diversify",
    "w36_bipower_jump",
    "f25_cross_sectional_zrank",
    "st21_stream_cdc_apply",
    # round 10: the production ANN-fed MMR composition.
    "sim11_ann_mmr",
    # round 14: exact-dedup-first capped LSH and exact-substring mass.
    "d26_dedup_first_lsh",
    "d27_exact_substring_mass",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    load_all()
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    spark = get_spark(app_name="evlp-bench")
    timings: dict[str, float] = {}
    # Build every plan once, warm it once (Janino codegen + broadcast init
    # dominate cold first runs), then time the steady-state EXECUTION of
    # the already-analyzed plan — the component that scales with data and
    # extrapolates to a long-lived cluster; one-time driver-side analysis
    # does not.
    # min-of-n per query: single-shot timings on a shared box are noisy
    # (round-2 showed ±13% on byte-identical code); the minimum is the
    # stable estimator of the true cost.
    # n=5: this VM shows ±20-40% ambient swings between whole-process
    # runs; a deeper min pool keeps the recorded floor close to the
    # true steady-state cost.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    dfs = {name: queries[name](spark, sf_dir) for name in names}
    for name in names:
        dfs[name].write.mode("overwrite").format("noop").save()
    # Per-query runs are CONSECUTIVE, not round-robin interleaved: the
    # JVM's generated-class cache is bounded, so cycling 17 other
    # queries between two runs of the same query evicts its codegen'd
    # classes and re-times Janino compilation instead of execution
    # (profiled: f20 2.1 s interleaved vs 1.4 s isolated at sf0.1 —
    # compile time, not compute). Consecutive runs measure the
    # steady-state execution a long-lived cluster job actually sees.
    runs: dict[str, list[float]] = {name: [] for name in names}
    for name in names:
        for _ in range(n_runs):
            t0 = time.perf_counter()
            dfs[name].write.mode("overwrite").format("noop").save()
            runs[name].append(time.perf_counter() - t0)
    timings = {name: round(min(ts), 3) for name, ts in runs.items()}

    # Extended tier: BUILD fresh per run (several of these queries stage
    # side-effectful sinks / training checkpoints whose reuse would time
    # a cache, not the machinery), best-of-3.
    n_ext = int(os.environ.get("SPARK_GRAFT_BENCH_EXT_RUNS", "3"))
    ext_names = [n for n in EXTENDED if n in queries]
    ext_runs: dict[str, list[float]] = {name: [] for name in ext_names}
    for name in ext_names:
        queries[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()  # warm codegen
        for _ in range(n_ext):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            ext_runs[name].append(time.perf_counter() - t0)
    ext_timings = {name: round(min(ts), 3) for name, ts in ext_runs.items()}
    spark.stop()

    # Variance alongside the headline floor: single numbers on a shared
    # box have masqueraded as regressions before (round-4's 9.04 s vs a
    # 7.97 s re-run was ±15% ambient noise, not code). best = the
    # recorded metric; median & stddev bound how much of any
    # round-over-round delta is noise.
    def _stats(ts: list[float]) -> dict[str, float]:
        s = sorted(ts)
        n = len(s)
        med = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
        mean = sum(s) / n
        var = sum((x - mean) ** 2 for x in s) / (n - 1) if n > 1 else 0.0
        return {
            "best": round(s[0], 3),
            "median": round(med, 3),
            "stddev": round(var ** 0.5, 3),
            "n": n,
        }

    # The driver captures only the LAST ~2000 chars of stdout and parses
    # the JSON line out of that window. Rounds 6-8 silently shipped
    # parsed=null because query_stats pushed the line past the window.
    # So: per-run variance stats go to a sidecar file, and the printed
    # line carries only the driver contract fields (measured ~1 kB).
    def _spread_pct(ts: list[float]) -> int:
        s = sorted(ts)
        n = len(s)
        mean = sum(s) / n
        var = sum((x - mean) ** 2 for x in s) / (n - 1) if n > 1 else 0.0
        return round(100 * (var ** 0.5) / s[0]) if s[0] > 0 else 0

    record = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        # `value` == sum(queries); extended-tier timings live under
        # their own key so a consumer summing `queries` reproduces the
        # headline metric exactly.
        "queries": timings,
        "extended_queries": ext_timings,
        "extended_total": round(sum(ext_timings.values()), 3),
        # Per-query relative spread (stddev/best, integer percent),
        # aligned with the key order of queries / extended_queries —
        # the noise band the module docstring's regression rule uses.
        "spread_pct": {
            "headline": [_spread_pct(runs[n]) for n in timings],
            "extended": [_spread_pct(ext_runs[n]) for n in ext_timings],
        },
        "sf": sf,
    }
    full = dict(record)
    full["query_stats"] = {
        name: _stats(ts) for name, ts in {**runs, **ext_runs}.items()
    }
    # Self-enforcing noise rule (round 14): compare against the newest
    # committed BENCH_r{N}.json and list the per-query deltas that
    # clear the band — the sidecar carries the verdict so a regression
    # never has to be re-derived by hand. Old spread is used when the
    # prior artifact carries spread_pct; otherwise the current run's.
    def _flag_regressions() -> list:
        import glob
        import re as _re

        here = os.path.dirname(os.path.abspath(__file__))
        arts = sorted(
            glob.glob(os.path.join(here, "BENCH_r*.json")),
            key=lambda p: int(_re.search(r"_r(\d+)", p).group(1)),
        )
        if not arts:
            return []
        try:
            prior = json.load(open(arts[-1]))
            prior = prior.get("parsed") or prior
        except Exception:  # noqa: BLE001 — malformed artifact: no compare
            return []
        if prior.get("sf") != record.get("sf"):
            return []  # cross-SF walls are not comparable
        out = []
        for tier, key in (("headline", "queries"), ("extended", "extended_queries")):
            olds = prior.get(key) or {}
            news = record.get(key) or {}
            sp_old = dict(
                zip(olds, (prior.get("spread_pct") or {}).get(tier, []))
            )
            sp_new = dict(
                zip(news, (record.get("spread_pct") or {}).get(tier, []))
            )
            for q, v in news.items():
                o = olds.get(q)
                if not o:
                    continue
                band = (
                    2 * max(sp_old.get(q, 0), sp_new.get(q, 0)) + 5
                ) / 100
                if v > o * (1 + band):
                    out.append(
                        {
                            "query": q,
                            "prior_best": o,
                            "best": v,
                            "ratio": round(v / o, 2),
                            "band_pct": round(100 * band),
                            "vs": os.path.basename(arts[-1]),
                        }
                    )
        return out

    full["regressions_vs_prior"] = _flag_regressions()
    sidecar = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
    )
    with open(sidecar, "w") as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    line = json.dumps(record)
    if len(line) > 1800:  # never outgrow the capture window again
        record.pop("spread_pct", None)
        line = json.dumps(record)
    if len(line) > 1800:
        record.pop("extended_queries", None)
        line = json.dumps(record)
    print(line)


if __name__ == "__main__":
    main()
