"""Physical-plan regression tests: the scale properties the engine
guarantees (pushdown, broadcast strategy, shuffle budget) asserted on the
executed plans, so a refactor that silently de-optimizes a query fails CI
— not just the stopwatch at 100 TB.
"""

from __future__ import annotations

import re

import pytest

from equity_volatility_lakehouse_platform_spark.plans import all_queries, load_all

load_all()
QS = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    # "formatted" keeps full scan metadata (toString truncates PushedFilters).
    df = QS[name](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _exchanges(plan: str) -> int:
    # Formatted mode prints shuffle nodes as "(NN) Exchange" (arguments are
    # listed separately), so count node headers; \b excludes
    # BroadcastExchange, which is a different (non-shuffle) node.
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def test_q6_filters_reach_the_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, "no PushedFilters in scan"
    pushed = m.group(1)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to parquet scan"
    # Projection pruned to the 4 referenced columns.
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and len(m.group(1).split(",")) == 4, "scan reads extra columns"


def test_dimension_joins_broadcast(spark, sf_dir):
    # Interval tag (J5) must be a broadcast nested-loop join, and the
    # TPC-H Q5 dimension chain must broadcast (no shuffled dim joins).
    assert "BroadcastNestedLoopJoin" in _plan(spark, sf_dir, "j05_interval_tag_join")
    q5 = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in q5
    # Only the final groupBy may shuffle besides the fact-fact joins.
    assert _exchanges(q5) <= 4


def test_shuffle_budgets(spark, sf_dir):
    # The numbers each plan's docstring promises.
    budgets = {
        "q1_pricing_summary": 1,       # one groupBy
        "a01_ordered_ohlcv_rollup": 1, # one groupBy
        "w04_lag_ladder": 1,           # one window spec
        "f20_gold_matrix": 2,          # daily agg + window sort
        "g01_grid_fill_hourly": 2,     # hourly agg + lead window
        "d02_minhash_signatures": 0,   # zero-shuffle projection
        "sim04_ivf_ann_topk": 4,       # assignment groupBy + per-probe cap window + 2 tiny query-side windows
        "w15_max_drawdown": 1,         # one shared window spec (3 fns, 1 sort)
        "t06_repetition_stats": 2,     # tf groupBy + per-doc groupBy
        "ml06_feature_hashing": 1,     # one (doc,bucket) groupBy
        "w19_ohlc_vol_estimators": 2,  # daily-bar groupBy + per-user window sort
        "w20_rsi": 2,                  # same bar->window shape
        "w21_bollinger_bands": 2,      # same bar->window shape
        "w22_stochastic_oscillator": 2,  # %K and %D share one window sort
        "t09_bigram_topk": 2,          # bigram-count groupBy + lang window
        "w24_macd": 2,                 # daily-bar groupBy + one grouped-map shuffle
        "w25_donchian_channels": 2,    # same bar->window shape as w21
        "w26_rolling_sharpe": 2,       # same bar->window shape as w20
        "a19_hll_distinct_bounds": 2,  # distinct expand + final groupBy
        "a20_weighted_median": 2,      # returnflag window sort + tiny groupBy
        "ml10_quantile_binning": 1,    # ntile window; edge roll-up reuses the partitioning
        "mm06_png_header_parse": 0,    # pure map stage, bytes never shuffle
        "t10_tfidf_topk": 4,           # tf groupBy + df groupBy + term join + doc window
        "j17_asof_nearest": 2,         # quotes groupBy + one shared union-window sort
        "a21_funnel_conversion": 2,    # user window + single-row stage-count agg
        "a33_funnel": 2,               # same recipe: user window + single-row count agg
        "a34_retention_cohorts": 3,    # user groupBy (event volume) + 2 cell-volume aggs
        "d22_perceptual_image_neardup": 3,  # band join (2 sides) + pair groupBy; synth/dHash are map-only
        "d23_perceptual_audio_neardup": 3,  # same _hamming_band_neardup tail over the audio fingerprint
        "a22_cohort_retention": 3,     # cohort agg + join + distinct-cell count
        "a23_gini_concentration": 2,   # per-user totals + type-partition rank window
        "t11_zipf_fit": 2,             # term counts + lang rank window/OLS agg
        "d12_minhash_accuracy": 2,     # band-collision join + verify joins share sig partitioning
        "g02_trading_day_grid": 3,     # bars agg + span agg + grid-bars join/ffill window
        "q10_returned_items": 3,       # fact join + per-cust agg + cust join (dims broadcast)
        "q18_large_volume_orders": 3,  # qty rollup + two key joins (top-k never global-sorts)
        "w27_keltner_channels": 3,     # bar rollup + ATR window sort + grouped-map EMA
        "d11_prefix_dedup": 1,         # one digest groupBy, raw text never shuffles
        "ml11_psi_drift": 5,           # two global-range aggs + bin counts (one-row exchanges)
        "w28_linear_interp": 1,        # both bracket lookups on ONE sort
        "w29_distribution_ranks": 1,   # one exchange, tie-group functions share it
        "sql02_correlated_scalar": 2,  # decorrelated: per-cust agg + equi-join
        "d13_containment_dedup": 2,    # band-collision join + shingle verify
        "ml12_knn_classify": 2,        # broadcast BNLJ + vote groupBy/window
        "a24_mode_per_group": 2,       # value counts + mode window
        "a25_welch_ttest": 1,          # one conditional-moment groupBy
        "f22_overnight_intraday_split": 2,  # bar rollup + lag window
        "f21_intraday_volume_profile": 3,   # bucket counts + day-total window + avg
        "mm07_modality_router": 0,     # pure map stage
        "d14_chunk_dedup": 2,          # digest window + per-doc reassembly groupBy
        "sim06_pq_ann_topk": 5,        # encode agg + ADC-sum agg + 2 query windows + rer join (training is checkpointed: 2 corpus aggs + 2 codebook-size aggs, once)
        "w33_variance_ratio": 2,       # bar rollup + one shared lag window
        "w34_return_acf": 2,           # bar rollup + one shared lag window
        "t19_sequence_packing": 1,     # ONE shard groupBy feeds the Arrow pack kernel
        "t20_source_mixing": 3,        # source agg + 2 metadata-scale aggs; rate table broadcast back (corpus never re-shuffles)
        "snk24_delta_format_export": 1,  # replayed-read groupBy; export itself is metadata-only
        "ml24_calibration_bins": 2,    # one min/max agg (broadcast back) + one 10-row bin agg
        "t21_perplexity_filter": 8,    # 4 vocab-scale model aggs + per-doc reduce + doc-score sort; corpus text never shuffles
        "ml25_contrastive_mining": 2,  # anchor window + 64-row pivot agg; corpus side never shuffles (broadcast BNLJ)
        "t22_packed_sequences": 4,
        "d30_packed_curation_dag": 3,  # curation tail (checkpointed manifest) + pack shard groupBy + (shard,bin) roll-up     # t19's shard kernel + assignment-docs join + (shard,bin) groupBy (docs side broadcasts at test SF; the join legitimately shuffles text ONCE at scale)
    }
    for name, budget in budgets.items():
        got = _exchanges(_plan(spark, sf_dir, name))
        assert got <= budget, f"{name}: {got} exchanges > budget {budget}"


def test_ivf_corpus_never_shuffles_for_probe(spark, sf_dir):
    # sim04: centroids and the probe set broadcast; the corpus's only
    # shuffle is the assignment groupBy. No sort-merge join may appear.
    plan = _plan(spark, sf_dir, "sim04_ivf_ann_topk")
    assert "BroadcastHashJoin" in plan, "probe join must broadcast the query set"
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_topk_compiles_to_take_ordered(spark, sf_dir):
    # orderBy+limit must become TakeOrderedAndProject, never a global sort.
    plan = _plan(spark, sf_dir, "o04_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Arguments: rangepartitioning" not in plan


def test_bucketed_join_has_zero_exchanges(spark, sf_dir):
    # snk03: bucketed+sorted layout on the join key must make the join AND
    # the follow-up groupBy shuffle-free.
    plan = _plan(spark, sf_dir, "snk03_bucketed_colocated_join")
    assert _exchanges(plan) == 0, "bucketed join should not shuffle"


def test_lsh_reads_persisted_signatures_when_given(spark, sf_dir, tmp_path):
    # d03/d07 sig_path: a materialized signature table must REPLACE the
    # recompute — the plan scans the signature parquet and never touches
    # documents (no re-shingling) — and yield the identical result.
    from equity_volatility_lakehouse_platform_spark.plans.dedup import (
        d02_minhash_signatures,
        d03_minhash_lsh_pairs,
    )
    from equity_volatility_lakehouse_platform_spark.sources.sinks import write_partitioned

    sig_path = str(tmp_path / "signatures")
    write_partitioned(d02_minhash_signatures(spark, sf_dir), sig_path, [])

    from_table = d03_minhash_lsh_pairs(spark, sf_dir, sig_path=sig_path)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = from_table._jdf.queryExecution().explainString(mode)
    assert "signatures" in plan, "plan must scan the materialized signature table"
    assert "documents" not in plan, "sig_path plan must not rescan documents"
    assert "md5" not in plan, "sig_path plan must not recompute hashes"

    recomputed = QS["d03_minhash_lsh_pairs"](spark, sf_dir)
    assert sorted(map(tuple, from_table.collect())) == sorted(
        map(tuple, recomputed.collect())
    ), "persisted-signature path must be result-identical"


def test_snk21_serves_from_the_signature_index(spark, sf_dir):
    # snk21 builds the signature index eagerly at plan-build time; the
    # RETURNED plan must serve entirely from the index scan — no
    # document rescan, no hash recompute (the whole point of
    # materializing the index once per corpus snapshot).
    plan = _plan(spark, sf_dir, "snk21_minhash_signature_index")
    assert "sig_index" in plan, "plan must scan the materialized index"
    assert "documents" not in plan, "serve plan must not rescan documents"
    assert "md5" not in plan, "serve plan must not recompute hashes"


def test_snk22_serves_from_the_video_fp_index(spark, sf_dir):
    # snk22 builds the video-fingerprint index eagerly at plan-build
    # time; the RETURNED plan must serve entirely from the index scan —
    # no clip synth, no container walk, no PNG decode (d25's dominant
    # cost, materialized once per corpus snapshot).
    plan = _plan(spark, sf_dir, "snk22_video_fingerprint_index")
    assert "video_fp_index" in plan, "plan must scan the materialized index"
    assert "documents" not in plan, "serve plan must not rescan documents"
    assert "mapInPandas" not in plan.lower(), "serve plan must not re-decode"


def test_snk23_serves_from_the_codebook_index(spark, sf_dir):
    # snk23 trains + persists the coarse quantizer and PQ codebook at
    # plan-build time; the RETURNED plan must serve from the codebook
    # scans — no Lloyd iteration subtree (whose signature is the
    # per-cid collect_list re-mean) may appear in the serve plan.
    plan = _plan(spark, sf_dir, "snk23_ann_codebook_index")
    assert "coarse_centroids" in plan, "plan must scan the coarse index"
    assert "pq_codebook" in plan, "plan must scan the PQ codebook index"
    # Round 14: the fused bounded-sample trainer collapsed the Lloyd
    # loop to a single exchange+kernel, so the self-training plan now
    # shuffles as FEW times as the serve plan — the serve win is the
    # skipped training compute, not shuffle count. Pin both halves:
    # never more exchanges than in-query training, and no training
    # kernel feed (the fused trainer's sample exchange / per-cid
    # re-mean signatures) in the serve plan.
    trained = _plan(spark, sf_dir, "sim08_ivfadc_topk")
    assert _exchanges(plan) <= _exchanges(trained), (
        f"serve plan must not shuffle more than in-query training: "
        f"{_exchanges(plan)} vs {_exchanges(trained)}"
    )


def test_no_cartesian_products_anywhere(spark, sf_dir):
    side_effectful = {
        "snk01_partitioned_overwrite_roundtrip",
        "snk02_upsert_insert_only",
        "snk03_bucketed_colocated_join",  # writes bucketed tables eagerly
        "snk04_acid_time_travel",  # commits an ACID table eagerly
        "snk05_acid_delete_update",  # commits an ACID table eagerly
        "st03_streaming_tumbling",
        "st04_stateful_running_totals",
        "d07_duplicate_clusters",  # iterative: builds eagerly
    }
    explicit_cross = {"j03_cross_join"}  # the one deliberate cross join
    for name in sorted(QS):
        if name in side_effectful or name in explicit_cross:
            continue
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_round5_broadcast_properties(spark, sf_dir):
    # w17: the hourly market series must broadcast (it is O(hours) at any
    # data scale — the fact side must never shuffle for the join).
    w17 = _plan(spark, sf_dir, "w17_rolling_beta")
    assert "BroadcastHashJoin" in w17, "market join must broadcast"
    assert "SortMergeJoin" not in w17
    # t07: the unigram vocabulary join must broadcast; the scoring path
    # shuffles only for the two groupBys (model fit + per-doc reduce).
    t07 = _plan(spark, sf_dir, "t07_unigram_logprob")
    assert "BroadcastHashJoin" in t07, "vocabulary join must broadcast"
    # The only tolerated product is the broadcast of the 1-row n_total:
    # no CartesianProduct node may appear (crossJoin of a 1-row aggregate
    # plans as BroadcastNestedLoopJoin).
    assert "CartesianProduct" not in t07
    # d08: cluster assignment + keeper window — no cartesian anywhere.
    d08 = _plan(spark, sf_dir, "d08_canonical_selection")
    assert "CartesianProduct" not in d08


def test_round5_shuffle_budgets(spark, sf_dir):
    budgets = {
        "ml08_oof_target_encoding": 2,  # (cat,fold) groupBy + tiny window
        "mm05_audio_pcm_stats": 0,      # map-only decode stage
        "w16_rolling_corr": 1,          # one shared window spec
    }
    for name, budget in budgets.items():
        got = _exchanges(_plan(spark, sf_dir, name))
        assert got <= budget, f"{name}: {got} exchanges > budget {budget}"


def test_change_feed_scans_only_touched_files(spark, sf_dir, tmp_path):
    # snk06's contract: changes(v1, v2) reads the file-set symmetric
    # difference, so a hop that touched one partition's files must not
    # scan the untouched files of the table.
    from pyspark.sql import functions as F
    from equity_volatility_lakehouse_platform_spark.sources.acid import AcidTable
    from equity_volatility_lakehouse_platform_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    t = AcidTable(spark, str(tmp_path / "acid"))
    t.overwrite(orders)                                     # v0
    t.merge_insert_only(
        orders.withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000),
        ["o_orderkey"],
    )                                                       # v1: new files only
    feed = t.changes(0, 1)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = feed._jdf.queryExecution().explainString(mode)
    v0_files = set(t._manifest(0)["files"])
    v1_files = set(t._manifest(1)["files"])
    added = v1_files - v0_files
    # The added files appear in the scan; the carried-over v0 files must not.
    assert added, "merge must add files"
    for f in sorted(v0_files & v1_files)[:3]:
        assert f.split("/")[-1] not in plan, "carried-over file scanned"


def test_q10_filters_reach_the_scans(spark, sf_dir):
    # q10's selective predicates must hit the parquet scans BEFORE the
    # fact-fact join: returnflag on lineitem, the orderdate range on
    # orders — at 100 TB these filters decide whether the join reads
    # terabytes or gigabytes.
    plan = _plan(spark, sf_dir, "q10_returned_items")
    assert re.search(r"PushedFilters:.*l_returnflag", plan), "returnflag not pushed"
    assert re.search(r"PushedFilters:.*o_orderdate", plan), "orderdate not pushed"
    assert "CartesianProduct" not in plan


def test_q18_aggregates_before_dimension_joins(spark, sf_dir):
    # The quantity roll-up (HashAggregate over lineitem) must appear
    # BELOW both joins in q18's plan: the fact collapses to qualifying
    # orders before orders/customer touch it.
    plan = _plan(spark, sf_dir, "q18_large_volume_orders")
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1
    # Tree printing is top-down (parents first): the fact aggregate being
    # BELOW the joins means every Join line prints BEFORE the first
    # HashAggregate line.
    assert join_pos < agg_pos, "quantity roll-up is not below the joins"
    assert "TakeOrderedAndProject" in plan


def test_partitioned_sink_reads_prune_partitions(spark, sf_dir, tmp_path):
    # S7/S9's layout contract at scale: a filter on the partition column
    # of a written lake table must become a PartitionFilter (directory
    # pruning — zero data files of other partitions opened), not a data
    # filter evaluated per row.
    from equity_volatility_lakehouse_platform_spark.sources.readers import load_table
    from equity_volatility_lakehouse_platform_spark.sources.sinks import write_partitioned

    out = str(tmp_path / "events_by_type")
    write_partitioned(
        load_table(spark, sf_dir, "events"), out, ["event_type"]
    )
    df = spark.read.parquet(out).filter("event_type = 'click'")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), "partition filter not pruned"
    # And the pruned read returns exactly the partition's rows.
    n_click = load_table(spark, sf_dir, "events").filter(
        "event_type = 'click'"
    ).count()
    assert df.count() == n_click


def test_q2_decorrelates_to_one_lineitem_scan(spark, sf_dir):
    # q2's correlated min MUST compile to one window pass, never a second
    # lineitem scan+join (what the literal correlated form would run).
    plan = _plan(spark, sf_dir, "q2_min_cost_supplier")
    assert len(re.findall(r"lineitem\.parquet", plan)) == 1, "lineitem scanned twice"
    assert "Window" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # part + supplier chains


def test_q17_correlated_avg_one_scan(spark, sf_dir):
    # The per-part average must come from a window over the already
    # part-filtered fact, not a second lineitem aggregate joined back.
    plan = _plan(spark, sf_dir, "q17_small_quantity_revenue")
    assert len(re.findall(r"lineitem\.parquet", plan)) == 1, "lineitem scanned twice"
    assert "Window" in plan


def test_q19_disjunction_prunes_scans(spark, sf_dir):
    # The OR-of-ANDs must still push derivable per-side predicates: the
    # quantity envelope (1..30) to lineitem, brand/size disjunction to part.
    plan = _plan(spark, sf_dir, "q19_disjunctive_revenue")
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    joined = " ".join(m)
    assert "l_quantity" in joined, "quantity envelope not pushed to lineitem scan"
    assert "p_brand" in joined or "p_size" in joined, "part disjunction not pushed"


def test_q21_quantifiers_collapse_to_one_rollup(spark, sf_dir):
    # EXISTS/NOT EXISTS must run as ONE per-order aggregate joined back —
    # exactly two lineitem scans (the l1 probe + the roll-up), never the
    # three the literal nested form would read, and no row-multiplying
    # non-equi join.
    plan = _plan(spark, sf_dir, "q21_sole_blocking_supplier")
    assert len(re.findall(r"lineitem\.parquet", plan)) == 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q16_not_in_is_anti_join(spark, sf_dir):
    # NOT IN must compile to a broadcast LEFT ANTI join, with the part
    # predicates pushed to the part scan.
    plan = _plan(spark, sf_dir, "q16_supplier_part_counts")
    assert re.search(r"BroadcastHashJoin .*LeftAnti|LeftAnti.*BuildRight", plan) or "LeftAnti" in plan
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("p_size" in x or "p_brand" in x for x in m)


def test_q22_threshold_before_anti_join(spark, sf_dir):
    # The scalar-average threshold must filter customers BEFORE the anti
    # join against orders (candidates only), and the 1-row average side
    # must broadcast.
    plan = _plan(spark, sf_dir, "q22_dormant_customers")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_pq_adc_lookups_broadcast(spark, sf_dir):
    # sim06: the codebook crossJoin and both ADC table lookups must
    # broadcast — the corpus's only shuffles are the two encode
    # aggregations; approximate distances never shuffle raw vectors.
    plan = _plan(spark, sf_dir, "sim06_pq_ann_topk")
    assert "BroadcastHashJoin" in plan, "ADC lookups must broadcast"
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_curation_dag_single_text_scan(spark, sf_dir):
    # d16: the composed quality -> contamination -> dedup funnel must
    # touch raw text exactly once — one corpus scan plus the tiny
    # benchmark scan (pushdown-filtered ~1%) — and stay within two
    # exchanges (per-doc shingle roll-up + digest window). Downstream
    # of the checkpointed flag manifest, documents must never be
    # re-read.
    from equity_volatility_lakehouse_platform_spark.plans.dedup import (
        _d16_flagged,
    )

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    inner = (
        _d16_flagged(spark, sf_dir)
        ._jdf.queryExecution()
        .explainString(mode)
    )
    assert inner.count("documents.parquet") == 2, (
        f"expected corpus + benchmark scans only:\n{inner}"
    )
    # 4 = per-doc shingle roll-up with its two-distinct expand pair
    # (digest-keyed, raw text already dropped) + digest window + the
    # benchmark-sized distinct.
    assert _exchanges(inner) <= 4
    outer = _plan(spark, sf_dir, "d16_curation_dag")
    assert "documents.parquet" not in outer, (
        "a post-manifest stage re-scans raw text"
    )


def test_round9_shuffle_budgets(spark, sf_dir):
    # The numbers each round-9 plan's comment promises.
    budgets = {
        "w36_bipower_jump": 1,           # one (user, day) groupBy; folds are map-side
        "w37_time_range_window": 1,      # one window sort (RANGE frame)
        "t16_gopher_quality_gates": 0,   # list-scalar map stage
        "mm10_wav_header_parse": 0,      # codegen byte walk
        "sc11_url_parse": 0,             # codegen parse_url projection
        "ml18_random_projection": 0,     # Arrow kernel in the scan's partitions
        "d18_cdc_chunk_dedup": 4,        # doc window + chunk roll-up + digest window + reassembly
    }
    for name, budget in budgets.items():
        n = _exchanges(_plan(spark, sf_dir, name))
        assert n <= budget, f"{name}: {n} exchanges > budget {budget}"


def test_f25_day_stats_broadcast_back(spark, sf_dir):
    # The per-day cross-sectional stats table must BROADCAST onto the
    # return rows (it is tiny — one row per day); a shuffled join here
    # would re-exchange the whole fact by day a second time.
    plan = _plan(spark, sf_dir, "f25_cross_sectional_zrank")
    assert "BroadcastHashJoin" in plan


def test_sim11_ann_mmr_zero_corpus_shuffle(spark, sf_dir):
    # sim11 (round 10): the production ANN->MMR path inherits sim08's
    # FAISS-shaped plan — raw vectors never sort-merge or cartesian;
    # candidate/codebook/probe joins all broadcast; the MMR kernel only
    # ever groups the <= shortlist-sized candidate set.
    plan = _plan(spark, sf_dir, "sim11_ann_mmr")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # Round-14 fusion: the MMR pair stage lives INSIDE the grouped
    # Arrow kernel (no a x b self-join, no per-side q_id exchanges) —
    # the whole plan carries at most 5 shuffle exchanges (was 7 with
    # the joined pair stage). The candidate set stays shortlist-bounded
    # per query by contract, so the in-kernel pair matrix is <= 10^4
    # cells.
    assert _exchanges(plan) <= 5, (
        f"sim11 exchange budget exceeded: {_exchanges(plan)}"
    )


def test_sim10_mmr_single_qid_exchange(spark, sf_dir):
    # Same kernel, brute-force baseline: the top-shortlist window and
    # the grouped MMR kernel share ONE q_id partitioning; the fused
    # pair stage adds no join. Budget: 1 shuffle exchange total.
    plan = _plan(spark, sf_dir, "sim10_mmr_diversify")
    assert _exchanges(plan) <= 1, (
        f"sim10 exchange budget exceeded: {_exchanges(plan)}"
    )
    assert "CartesianProduct" not in plan


def test_d19_bloom_probe_broadcasts_filter_side(spark, sf_dir):
    # d19: both the position set (<= m rows) and the exact-truth digest
    # set must broadcast — the landing batch never shuffles for the
    # probe, and raw text appears only under the md5 scans.
    plan = _plan(spark, sf_dir, "d19_bloom_novelty")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_j19_scd2_join_is_key_equi_not_bnlj(spark, sf_dir):
    # j19: the SCD2 range predicate must ride as a RESIDUAL on the
    # customer-key equi-join (broadcast or SMJ) — a BroadcastNestedLoop
    # over 150k x versions rows is the plan cliff this pins against.
    plan = _plan(spark, sf_dir, "j19_scd2_point_in_time")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_round10_exchange_budgets(spark, sf_dir):
    # Shuffle budgets for the round-10 additions (measured at sf0.01;
    # a regression past these means a reused partitioning broke or a
    # broadcast flipped to shuffle).
    budgets = {
        "d20_edit_distance_verify": 2,   # d03's band groupBy; text joins broadcast
        "f28_rolling_beta": 5,           # daily rollup + tiny day agg + lag/beta windows
        "f29_max_drawdown": 3,           # daily rollup + draw window + trough rollup (shared keys reuse)
        "a32_sessionization": 2,         # one user sort; (user, sid) rollup reuses it
        "sim13_knn_graph": 1,            # ONE bucket-key shuffle into the Arrow top-k kernel (round 11)
        "w41_garch_forecast": 3,         # bar rollup + per-user fold rollup
    }
    for name, budget in budgets.items():
        got = _exchanges(_plan(spark, sf_dir, name))
        assert got <= budget, f"{name}: {got} exchanges > budget {budget}"
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_d06_bucket_join_pinned_shuffle(spark, sf_dir):
    # d06 (round 11): the bucket self-join is hint-pinned shuffle_hash
    # so the plan is identical at every corpus size, and the pair
    # stage must never cartesian.
    plan = _plan(spark, sf_dir, "d06_embedding_neardup")
    assert "ShuffledHashJoin" in plan, "bucket join must shuffle on the key"
    assert "CartesianProduct" not in plan


def test_round12_new_query_plans(spark, sf_dir):
    # d24: the train x benchmark probe is the hint-pinned shuffle_hash
    # bucket join (NEITHER side broadcasts — both splits are
    # corpus-sized at 100 TB, unlike sim14's capped query set); the
    # whole mask costs the bucket shuffle + the vec_id agg/re-join.
    plan = _plan(spark, sf_dir, "d24_semantic_decontamination")
    assert "ShuffledHashJoin" in plan, "bucket probe must shuffle on key"
    assert "CartesianProduct" not in plan
    got = _exchanges(plan)
    assert got <= 6, f"d24: {got} exchanges > budget 6"
    # sql06: the recursion must stay an equi-join per level — a
    # cartesian inside the loop multiplies by the customer table per
    # iteration. The registered builder eagerly checkpoints (its plan
    # is an opaque scan), so explain the literal statement it executes.
    from equity_volatility_lakehouse_platform_spark.plans.relational import _SQL06
    from equity_volatility_lakehouse_platform_spark.sources.readers import (
        register_views,
    )

    register_views(spark, sf_dir, ["customer"])
    df6 = spark.sql(_SQL06)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan6 = df6._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan6
    assert "BroadcastNestedLoopJoin" not in plan6


def test_d26_serves_from_persisted_signatures(spark, sf_dir, tmp_path):
    # d26 shares snk21's index surface: given sig_path, the plan scans
    # the materialized signature table for the LSH leg (documents are
    # still read ONCE for the digest groupBy — that's the exact-dedup
    # stage, not a signature recompute) and yields identical results.
    from equity_volatility_lakehouse_platform_spark.plans.dedup import (
        d02_minhash_signatures,
        d26_dedup_first_lsh,
    )
    from equity_volatility_lakehouse_platform_spark.sources.sinks import (
        write_partitioned,
    )

    sig_path = str(tmp_path / "signatures")
    write_partitioned(d02_minhash_signatures(spark, sf_dir), sig_path, [])
    served = d26_dedup_first_lsh(spark, sf_dir, sig_path=sig_path)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = served._jdf.queryExecution().explainString(mode)
    assert "signatures" in plan, "plan must scan the materialized table"
    recomputed = QS["d26_dedup_first_lsh"](spark, sf_dir)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, recomputed.collect())
    ), "persisted-signature path must be result-identical"


def test_f20_rolling_median_frame_materialized_once(spark, sf_dir):
    # Round 14: the gold matrix's rolling-median frame is ONE
    # collect_list window (materialized as a named column) sorted with
    # the codegen-able sort_array — the earlier inline form planned two
    # identical collect_list aggregates and the array_sort lambda
    # dropped the whole 25-feature assembly projection out of
    # whole-stage codegen.
    plan = _plan(spark, sf_dir, "f20_gold_matrix")
    assert plan.count("collect_list") <= 2, (  # formatted plans list each node twice
        "rolling-median frame must be collected once"
    )
    assert "array_sort" not in plan, "sort_array (codegen) replaced array_sort"
