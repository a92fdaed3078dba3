"""100x spot-check of the top-10 scale-story queries (round-7 VERDICT item 4).

Builds a 100x fact dataset in /tmp (duckdb replication of the sf0.1
facts under shifted keys — build_10x.py's method at factor 100;
documents 8x and embeddings 100x with per-replica jitter, dims
symlinked) and warm-times the queries whose 100 TB story rests on
claims: the three round-6 headliners plus as-of join, lag ladder, LSH
pair generation, IVF ANN, the stream-stream join, event segmentation,
and the leakage-safe split.

Two gates per query, recorded in SCALE.md:
  * wall-time ratio vs the same warm run at plain sf0.1 — must stay
    sub-linear-ish vs the 100x data factor (no plan cliffs);
  * the physical plan's Exchange count at 100x must NOT EXCEED the
    sf0.1 count (a broadcast join silently flipping to a shuffle join
    at scale is exactly the regression this catches).

Coverage caps (logged, not silent): documents replicate 8x (text
payloads dominate disk; d03/ml07 still shuffle 8x the candidate
volume), embeddings 100x with 1e-4 per-replica jitter so bucketing
stays non-degenerate.

Usage::

    python scripts/spot_100x.py [src_sf_dir] [out_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q1_pricing_summary",
    "g01_grid_fill_hourly",
    "f20_gold_matrix",
    "j12_asof_join",
    "w04_lag_ladder",
    "d03_minhash_lsh_pairs",
    "sim04_ivf_ann_topk",
    "st10_stream_stream_join",
    "f19_event_segmentation",
    "ml07_leakage_safe_split",
    # round-8 additions: the new heavy machinery's scale trend
    "sim06_pq_ann_topk",
    "sim08_ivfadc_topk",
    "d16_curation_dag",
    # round-9 additions. d17_semantic_dedup joined in round 10 under
    # auto-K; round 13 moved the provisioning to K = max(4,
    # ceil(N/256)) (constant ~256-vector clusters, linear prune — the
    # sqrt contract trips the 16384 guard past N ~ 2.7e8).
    "w36_bipower_jump",
    "f25_cross_sectional_zrank",
    "sim10_mmr_diversify",
    "sim11_ann_mmr",
    "d17_semantic_dedup",
    "ml18_random_projection",
    "t16_gopher_quality_gates",
    "mm10_wav_header_parse",
    "d18_cdc_chunk_dedup",
    "w37_time_range_window",
    "f26_factor_ic",
    "f27_amihud_illiquidity",
    "mm11_exif_ifd_walk",
    "mm12_mp4_box_walk",
    "ml19_purged_kfold",
    "ml20_mutual_information",
    "sc11_url_parse",
    "t17_corpus_datacard",
    # round-10 additions: the persisted-index query path, the Bloom
    # novelty gate, and the SCD2 point-in-time join.
    "sim12_persisted_ivf_index",
    "d19_bloom_novelty",
    "j19_scd2_point_in_time",
    "d20_edit_distance_verify",
    "f28_rolling_beta",
    "f29_max_drawdown",
    "a32_sessionization",
    "sim13_knn_graph",
    "w41_garch_forecast",
    "j20_snapshot_reconcile",
    # round-11 additions: funnel, retention cohorts, incremental view
    # maintenance (the IVM query mutates its own scratch ACID table per
    # run — REBUILD-style by construction since every call re-seeds).
    "a33_funnel",
    "a34_retention_cohorts",
    "snk20_incremental_view_maintenance",
    # d06/d10 joined in round 11 after their fixed 2-bit bucketing was
    # caught putting the 100x corpus in 4 buckets (~5e9 pairs); bits now
    # auto-provisions like sim13/sim14.
    "d06_embedding_neardup",
    "d10_cosine_dup_clusters",
    "d21_pagerank",
    "ml22_pr_auc",
    "sim14_radius_search",
    # round-12 additions: perceptual image near-dup (real PNG decode +
    # Hamming banding) and the ANN-backed eval loop.
    "d22_perceptual_image_neardup",
    "d23_perceptual_audio_neardup",
    # d24 rides the 100x-replicated embeddings (train AND benchmark
    # splits both scale). sql06 is NOT spotted on this axis: its input
    # (customer) is a symlinked dim here, and its cost is O(N_cust)
    # over log10(key-range) equi-join rounds by construction.
    "d24_semantic_decontamination",
    # round-13: ml23 REJOINS the corpus axis (r12 excluded it — fixed
    # 4-centroid codebook made candidates O(N^2/(eval_mod*K)); the
    # coarse quantizer now auto-provisions K = max(4, ceil(N/256)) and
    # trains via ivf_train_centroids, so candidate volume is linear).
    "ml23_knn_classify_ann",
    # round-13: perceptual VIDEO near-dup (frame-sampled dHash over the
    # real container walk) completes the d22/d23 modality triad, and
    # the materialized-signature index cycle (build + serve).
    "d25_perceptual_video_neardup",
    "snk21_minhash_signature_index",
    # round-14: exact-dedup-first + capped LSH (the hot-bucket
    # hardening) — its scale story IS this axis: candidate volume must
    # track DISTINCT texts, with template mass accounted, never joined.
    "d26_dedup_first_lsh",
    # round-14: materialized video-fingerprint index (build + serve).
    "snk22_video_fingerprint_index",
    # round-14: exact-substring dedup — every k-token window anchors
    # through ONE corpus groupBy; must stay linear on this axis. d28
    # is the removal half on the same anchor stages.
    "d27_exact_substring_mass",
    "d28_substring_trim",
    # round-14: trained-quantizer index (build + serve).
    "snk23_ann_codebook_index",
    # round-14: two-level hierarchical coarse quantization — the
    # O(N*K*D) single-level assignment cliff closed; must track the
    # corpus linearly with K2 ~ sqrt(K) scans per vector.
    "sim15_two_level_ivf_topk",
    # round-14: Delta-format export — the ACID history replay is
    # O(files) metadata (hard links + log JSON); the data-scale legs
    # are the ACID overwrite/append/COW-delete feeding it. Must track
    # the fact table linearly with flat exchanges.
    "snk24_delta_format_export",
    # round-14: sequence packing (shards provision at ~4096 docs so the
    # sequential kernel leg stays constant per shard) and source mixing
    # (map + 20-row agg + broadcast filter — must stay a flat map
    # shape on this axis).
    "t19_sequence_packing",
    "t20_source_mixing",
    # round-14: exactly-once Delta-format stream ingest — blind appends
    # + txn watermark; must track the event volume linearly (no state
    # operator, no content-key join; idempotence is a log lookup).
    "st23_delta_txn_ingest_stream",
    # round-14: calibration bins — one min/max agg + one 10-row bin
    # agg over the 100x embeddings; must stay a flat 2-exchange shape.
    "ml24_calibration_bins",
    # round-14: perplexity filter — model aggs are vocab-scale, scoring
    # is broadcast joins, the only corpus-scale stages are the per-doc
    # reduce and the doc-score sort; must track documents linearly.
    "t21_perplexity_filter",
    # round-14: packed-sequence assembly — text shuffles exactly once
    # (assignment join -> (shard,bin) concat); must track documents
    # linearly.
    "t22_packed_sequences",
    # round-14: the curation DAG composed through packing — raw text
    # touched once in the d16 manifest; the packing tail adds one
    # exchange on ids+counts rows. Must track documents linearly.
    "d30_packed_curation_dag",
]


def build(src: str, out: str, factor: int = 100) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET, CODEC 'SNAPPY')"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    copy(
        f"""
        SELECT event_id + r * 1000000000 AS event_id, ts,
               user_id + r * 150 AS user_id, event_type, value, props
        FROM '{src}/events.parquet', range({factor}) t(r)
        """,
        "events",
    )
    copy(
        f"""
        SELECT l_orderkey + r * 100000000 AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate
        FROM '{src}/lineitem.parquet', range({factor}) t(r)
        """,
        "lineitem",
    )
    copy(
        f"""
        SELECT o_orderkey + r * 100000000 AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM '{src}/orders.parquet', range({factor}) t(r)
        """,
        "orders",
    )
    # Text payloads dominate disk: 8x keeps the build tractable while
    # still multiplying candidate-pair volume. NOT a silent cap.
    print("NOTE: documents replicated 8x (not 100x) — text disk cap")
    copy(
        f"""
        SELECT doc_id + r * 1000000 AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE text || ' v' || CAST(r AS VARCHAR) END AS text,
               * EXCLUDE (doc_id, text)
        FROM '{src}/documents.parquet', range(8) t(r)
        """,
        "documents",
    )
    # 100x vectors with per-replica jitter so LSH/IVF bucket occupancy
    # stays non-degenerate (identical copies would all collide).
    copy(
        f"""
        SELECT vec_id + r * 1000000 AS vec_id,
               CAST(list_transform(embedding, x -> x + r * 0.0001)
                    AS FLOAT[]) AS embedding,
               label
        FROM '{src}/embeddings.parquet', range({factor}) t(r)
        """,
        "embeddings",
    )
    for dim in ("region", "nation", "customer", "supplier", "part"):
        dst = f"{out}/{dim}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src}/{dim}.parquet", dst)


def _exchanges(df) -> int:
    """Exchange operators in the (pre-execution) physical plan — the
    scale-sensitive part: a planning-time broadcast-to-shuffle flip at
    the bigger input shows up here."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def _time(df) -> float:
    df.write.mode("overwrite").format("noop").save()  # warm codegen
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


# Queries whose plan LAZILY CHECKPOINTS an internal stage (PQ training,
# the d16 flag manifest): re-saving one DataFrame would reuse the
# materialized checkpoint and time only the serving half — rebuild the
# query per run so every timed run pays the whole pipeline.
REBUILD = {
    "sim06_pq_ann_topk",
    "sim08_ivfadc_topk",
    "d16_curation_dag",
    # sim11 composes sim08's checkpointed training; sim12 and d17 train/
    # write per call (index build + ACID sinks) — rebuild so every timed
    # run pays the full pipeline.
    "sim11_ann_mmr",
    "sim12_persisted_ivf_index",
    "d17_semantic_dedup",
    # snk20 runs its ACID commits + delta folds EAGERLY at build time;
    # timing only the returned view read would measure nothing. d10's
    # connected-components rounds likewise run eagerly (localCheckpoint
    # per label-propagation round).
    "snk20_incremental_view_maintenance",
    "d10_cosine_dup_clusters",
    # ml23 counts the corpus and trains its auto-K coarse quantizer at
    # build time (lazily checkpointed) — rebuild so every timed run
    # pays count + training + serve. snk21 writes its signature index
    # eagerly at build time — same rule.
    "ml23_knn_classify_ann",
    "snk21_minhash_signature_index",
    # d26 counts the corpus at build time to provision (n_perm, b, r);
    # snk22 writes its fingerprint index eagerly at build time.
    "d26_dedup_first_lsh",
    "snk22_video_fingerprint_index",
    # snk23 trains + writes its codebooks eagerly at build time.
    "snk23_ann_codebook_index",
    # sim15 counts the corpus and trains BOTH quantizer levels at
    # build time (lazily checkpointed).
    "sim15_two_level_ivf_topk",
    # snk24 runs its ACID writes + export + checkpoint eagerly at
    # build time; only the replayed read-back is lazy.
    "snk24_delta_format_export",
    # t19 counts the corpus at build time to provision nshard; t22 and
    # d30 compose it (d30 counts the SURVIVOR set at build).
    "t19_sequence_packing",
    "t22_packed_sequences",
    "d30_packed_curation_dag",
    # st23 runs its whole stream (landing dir -> foreachBatch appends)
    # when the plan is built; only the final snapshot read is lazy.
    "st23_delta_txn_ingest_stream",
}


def _time_rebuild(fn, spark, d) -> float:
    # best-of-1 after warm: each run retrains, so one timed run is the
    # budget-honest choice (the training dominates, and it is exactly
    # what is being measured).
    fn(spark, d).write.mode("overwrite").format("noop").save()  # warm
    best = float("inf")
    for _ in range(1):
        t0 = time.perf_counter()
        fn(spark, d).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_100x"
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    if not os.path.exists(f"{out}/lineitem.parquet"):
        build(src, out)

    from equity_volatility_lakehouse_platform_spark.plans import all_queries, load_all
    from equity_volatility_lakehouse_platform_spark.session import get_spark

    load_all()
    qs = all_queries()
    spark = get_spark(app_name="spot-100x")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    failures: list[str] = []
    extra_sections: dict = {}
    # $SPOT_QUERIES: comma-separated subset (split long runs across
    # invocations); $SPOT_MERGE: read the existing out_json and only
    # update/append this run's rows.
    run_queries = [
        q for q in os.environ.get("SPOT_QUERIES", "").split(",") if q
    ] or QUERIES
    if out_json and os.environ.get("SPOT_MERGE") and os.path.exists(out_json):
        with open(out_json) as fh:
            prior = json.load(fh)
        # Preserve sections other runners merged in (query_axis, ad-hoc
        # studies) — a subset re-run must not truncate the artifact.
        extra_sections = {
            k: v
            for k, v in prior.items()
            if k not in ("scale", "results", "failures")
        }
        results.update(prior.get("results", {}))
        # Drop prior failure entries for queries re-run this invocation:
        # a query that failed before but passes now must not carry a
        # stale (or duplicated) failure row into the merged artifact.
        failures.extend(
            f
            for f in prior.get("failures", [])
            if f.split(":", 1)[0] not in run_queries
        )
    for name in run_queries:
        if name.startswith("st"):
            # Streaming queries materialize EAGERLY (the registered fn
            # runs the stream and localCheckpoints the sink) — time the
            # whole run; the checkpoint scan's plan carries no signal,
            # so the exchange gate is recorded as n/a (0 == 0).
            t0 = time.perf_counter()
            qs[name](spark, src)
            t_base = time.perf_counter() - t0
            t0 = time.perf_counter()
            qs[name](spark, out)
            t_big = time.perf_counter() - t0
            x_base = x_big = 0
        elif name in REBUILD:
            t_base = _time_rebuild(qs[name], spark, src)
            t_big = _time_rebuild(qs[name], spark, out)
            x_base = _exchanges(qs[name](spark, src))
            x_big = _exchanges(qs[name](spark, out))
        else:
            base_df = qs[name](spark, src)
            big_df = qs[name](spark, out)
            t_base = _time(base_df)
            t_big = _time(big_df)
            x_base = _exchanges(base_df)
            x_big = _exchanges(big_df)
        rec = {
            "sf0.1_sec": round(t_base, 2),
            "100x_sec": round(t_big, 2),
            "wall_ratio": round(t_big / t_base, 1) if t_base > 0 else None,
            "exchanges_sf0.1": x_base,
            "exchanges_100x": x_big,
        }
        if x_big > x_base:
            failures.append(
                f"{name}: exchanges grew {x_base} -> {x_big} at 100x "
                "(broadcast flipped to shuffle?)"
            )
        results[name] = rec
        print(name, json.dumps(rec))
    summary = {
        "scale": "100x-sf0.1", "results": results, "failures": failures,
        **extra_sections,
    }
    line = json.dumps(summary)
    print(line)
    if out_json:
        with open(out_json, "w") as f:
            f.write(line + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
