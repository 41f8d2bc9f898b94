"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Consumers: the COMPARABLE-21 run under count() — the exact action the
reference baseline was measured with, so the BASELINE.md ratios stay
like-for-like. ADDITIONS run under a hash-reducing aggregate
(bit_xor(xxhash64(struct(*)))) that forces EVERY output column of every
row to materialize: under count(), Catalyst prunes unreferenced
projections, so pure-projection queries (scalar_*, text_pii_redact,
web_url_canonicalize) would report scan cost instead of their real
work. A warmup pass first absorbs JVM/codegen startup so per-query
numbers measure the plan, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time


# The 21-query COMPARABLE set: the queries behind BASELINE.md's
# recorded table and the round-over-round "value" metric. Module-level
# so tests can pin that every name still resolves — a renamed query
# silently dropping out of the filter below would shrink "value" and
# masquerade as a speedup. Measured FIRST, in its own warmup+measure
# phase, so its numbers come from the same JVM state round 1 measured
# in — widening the headline surface in later rounds inflated the
# comparable numbers ~1.25x purely through session state (codegen
# cache, block-manager churn, GC landing spots) accumulated by the
# queries that ran before it.
BASELINE_ORDER = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_revenue",
    "q9_product_profit",
    "q18_large_volume_customer",
    "agg_rollup",
    "window_row_number",
    "topk_per_group",
    "dmds_select_plus",
    "dedup_exact_keep_first",
    "dedup_minhash_pairs",
    "text_token_stats",
    "text_lang_id",
    "similarity_cosine_topk",
    "similarity_ann_lsh_topk",
    "window_tumbling_1h",
    "sessionize_10m",
    "timeseries_gapfill",
    "pipeline_curation",
]
# later-round additions: reported per-query and in value_full
ADDITIONS = [
    "dedup_simhash_pairs",
    "dedup_embedding_neardup",
    "text_bpe_token_count",
    "text_fingerprint",
    "similarity_ivf_topk",
    "sample_hash_10pct",
    "sample_train_val_test",
    "agg_salted_sum",
    "join_salted_skew",
    "window_sliding_1h_30m",
    "text_contamination_ngram",
    "text_gopher_rules",
    "tokens_pack_sequences",
    "events_funnel_steps",
    "events_retention_cohorts",
    "profile_column_stats",
    "pipeline_pretrain_corpus",
    # round-4 additions
    "text_vocab_coverage",
    "join_range_attribution",
    "tokens_pack_spans",
    "events_conversion_latency",
    "graph_pagerank",
    "customers_rfm_segments",
    # round-5 additions: the Arrow fast paths benched against their
    # JVM-fold twins, so the claimed vectorization win has BOTH
    # numbers of record (dedup_embedding_neardup was already benched;
    # similarity_pairs_threshold joins here for its twin)
    "similarity_pairs_threshold",
    "dedup_embedding_neardup_arrow",
    "similarity_pairs_threshold_arrow",
    "tokens_domain_mixture",
    "events_user_path_topk",
    "dedup_containment_verify",
    "dedup_fuzzy_fingerprint_pairs",
    # round-5 batch three
    "profile_covariance",
    "suppliers_pareto_class",
    "events_concurrency_peak",
    "graph_common_neighbors",
    "events_late_arrivals",
    # round-5 batch four
    "agg_weighted_median",
    "text_trigram_novelty",
    "suppliers_winsorized_balance",
    # round-5 batches five/six
    "events_active_users_rolling",
    "profile_ks_drift",
    "text_source_vocab_jaccard",
    "orders_cohort_ltv",
    "embedding_dim_stats",
    # round-5 batch seven
    "graph_clustering_coefficient",
    "text_term_burstiness_topk",
    "similarity_radius_count",
    "events_activity_streaks_topk",
    # round-5 batch eight
    "text_readability_profile",
    "tokens_packing_efficiency_sweep",
    "orders_basket_size_stats",
    # round-5 batch nine
    "orders_repeat_purchase_rate",
    "lineitem_revenue_waterfall",
    "similarity_lsh_bucket_stats",
    # round-5 batch ten
    "dedup_minhash_precision",
    "orders_value_gini",
    # round-5 batch eleven
    "text_lang_confusion",
    "sample_hamilton_allocation",
    # round-6 additions (dedup_fuzzy_fingerprint_pairs_fast is the
    # xxhash64 blocking twin: benched alongside the md5 form so the
    # recall-vs-cost trade-off has both numbers of record)
    "dedup_incremental_minhash",
    "dedup_fuzzy_fingerprint_pairs_fast",
    # round-6 batch two
    "tokens_bpe_merge_candidates",
    "text_pii_counts",
    "text_vocab_growth",
    "similarity_lsh_recall_report",
    "lineitem_corr_components",
    "sample_systematic_every_k",
    "events_inter_arrival_histogram",
    "dedup_semdedup_prune",
    "graph_common_neighbors_capped",
    # round-6 batch three
    "window_ewma_pow2",
    "text_repetition_profile",
    "profile_duplicate_rows",
    "tokens_vocab_truncation_loss",
    "graph_supplier_jaccard",
    "events_weekday_hour_heatmap",
    "multimodal_byte_histogram",
    # round-6 batch four
    "events_attribution_linear",
    "dedup_method_agreement",
    "graph_khop_reachability",
    # round-7 batch one (span dedup + rarity + lift)
    "dedup_repeated_ngram_spans",
    "dedup_duplicated_span_fraction",
    "text_token_rarity_score",
    "events_transition_lift",
    # round-7 batch two (advisors + binned interval join + MIPS)
    "profile_join_skew_advisor",
    "join_interval_overlap",
    "similarity_mips_topk",
    # round-7 batch three (multimodal)
    "multimodal_phash_neardup",
    "multimodal_audio_vad",
    # round-7 batch four (span coverage + exact shift measures)
    "dedup_span_coverage",
    "text_source_tv_distance",
    "text_vocab_gini_impurity",
    # round-7 batch five (inverted-index exact truth vs the banding)
    "dedup_minhash_recall_report",
    # round-7 batch six
    "join_asof_forward",
    "profile_functional_dependency",
    "agg_hll_calibration",
    # round-7 batch seven
    "parts_xyz_classification",
    "agg_cms_calibration",
    # round-7 batch eight
    "join_scd2_lookup",
    # round-7 batch nine
    "dedup_span_rewrite_stats",
    "rollup_incremental_spans",
    # round-7 batch ten
    "embedding_pca_power",
    # round-7 batch eleven
    "events_survival_curve",
    "embedding_centroid_drift",
    "agg_approx_percentile_calibration",
    # round-9 additions: the u64 world write path (scratch-world CRUD
    # end to end, the dmds_crud shape at DECIMAL(20,0)) and the PII
    # rewrite (single codegen projection over the text column)
    "dmds_u64_snapshot",
    "text_pii_redact",
    # the WebDataset sink+loader round trip (tar shards written and
    # re-parsed end to end each pass)
    "sink_webdataset_roundtrip",
    # round-9 batch two: rational-BM25 ranked retrieval (tokenize +
    # tf/df + TakeOrdered top-k), SFT conversation packing (ordered
    # array_sort pack + md5 per conversation), and the leakage-safe
    # cluster split (text-partition representative window)
    "text_bm25_topk",
    "sft_pack_conversations",
    "sample_split_leakage_safe",
    # round-9 batch three: DPO pairing (dual rank windows on one
    # exchange), the per-epoch shuffle order (3x replicated corpus
    # through the range-partitioned global rank), and the curriculum
    # NTILE (sharded rank + closed form)
    "sft_preference_pairs",
    "tokens_epoch_shuffle_order",
    "sample_ntile_curriculum",
    # round-9 batch four: per-type OLS trend (two stacked aggregates)
    # and dense-grid linear interpolation (grid join + shared fill
    # exchange)
    "events_regression_trend",
    "timeseries_interp_linear",
    # round-9 batch five: the end-to-end SFT corpus composite
    # (validate -> decontaminate -> truncate -> pack -> split)
    "pipeline_sft_corpus",
    # round-9 batch six: the composite's survivors packed into
    # training sequences (split-keyed sharded cumsum on top)
    "sft_pack_training_sequences",
    # nearest as-of: two keyed as-of passes + one event_id hash join
    "join_asof_nearest",
    # whole-document FFD packing: one Arrow task per hash shard
    "tokens_bin_pack_ffd",
    # round-10 batch one: the web-curation family (canonicalize, domain
    # profile, blocklist gate, line-level boilerplate dedup)
    "web_url_canonicalize",
    "web_domain_stats",
    "web_blocklist_filter",
    "web_line_boilerplate_topk",
    "web_line_dedup_rewrite",
    # round-10 batch two: KMV calibration, DSIR importance, OHLC bars,
    # attrition funnel, exact Lloyd step
    "agg_kmv_distinct_calibration",
    "sample_dsir_importance",
    "events_ohlc_downsample",
    "pipeline_attrition_report",
    "embedding_kmeans_lloyd_step",
    # round-10 batch three: layout/calibration + the BPE training loop
    # and the zlib quality signal
    "layout_zorder_locality",
    "profile_bloom_prejoin_calibration",
    "tokens_bpe_train_merges",
    "text_compression_ratio",
    # round-10 batch four: the DSIR resampler, the JL projection
    # calibration, and the k-anonymity report
    "sample_dsir_resample",
    "embedding_jl_projection_calibration",
    "profile_k_anonymity",
    # round-10 batch five: entity resolution, forecast backtest,
    # negative mining
    "entity_resolution_pairs",
    "timeseries_backtest_snaive",
    "sample_contrastive_negatives",
    "similarity_hard_negatives",
    # round-10 batch six: snapshot audit + semantic decontamination
    "profile_snapshot_diff",
    "similarity_semantic_decontaminate",
    # round-10 batch seven: the incremental line index + k-fold CV
    "rollup_incremental_lines",
    "sample_kfold_assign",
    # round-10 batch eight: URL-vs-content agreement + BPE apply
    "web_dedup_method_agreement",
    "tokens_bpe_apply_learned",
    # round-10 batch nine: duplicate-aware soft sampling weights
    "sample_softdedup_weights",
    # round-11: HTML->text extraction + the full web-ingest composite,
    # the persisted incremental IVF index (two refresh increments per
    # pass, end to end), World snapshot time travel (two versioned
    # commits + both pinned reads), and the exact-grid two-round
    # k-means (reshaped round 11 for oracle-checkability)
    "web_html_extract",
    "pipeline_web_ingest",
    "rollup_incremental_ivf",
    "dmds_snapshot_timetravel",
    "embedding_kmeans_assign",
    "web_html_links",
    "dmds_snapshot_diff",
    "similarity_ivf_probe_sweep",
    "text_quality_linear_score",
    "pipeline_web_curation_full",
    # round-12: the index-lifecycle family — incrementally-maintained
    # near-dup cluster map (two increments, contracted-CC folds), the
    # staged IVF quantizer retrain (migration + post-retrain ingest),
    # batch ANN serving through the maintained store, and the per-cell
    # drift report
    "rollup_incremental_clusters",
    "rollup_ivf_retrain",
    "similarity_ivf_search_batch",
    "similarity_ivf_drift_report",
    "multimodal_real_decode_stats",
    # round-12 batch two: CDC application (latest-wins max_by merge,
    # net-changes compaction, World merge replayed twice end to end),
    # the log-free bigram LM (train + stupid-backoff doc scoring), and
    # the inverted index (posting build + conjunctive retrieval)
    "cdc_apply_changeset",
    "cdc_net_changes",
    "cdc_world_merge",
    "text_lm_train_bigram",
    "text_lm_score_docs",
    "text_inverted_postings",
    "text_boolean_retrieval",
    "text_phrase_retrieval",
    # round-12 batch three: zone-map range read through the World store
    # (ingest + refresh + pruned read per pass)
    "dmds_zonemap_read",
    # round-12 batch four: the streaming-CDC ingest loop (three
    # micro-batches + one redelivery through the tombstoned seq-aware
    # merge, then a horizon purge, end to end per pass)
    "rollup_incremental_cdc",
    # round-12 batch five: declarative quality gates (6 constraints in
    # one aggregation pass; 3 key-only FK orphan censuses)
    "quality_constraint_report",
    "quality_referential_report",
    # round-12 batch six: classifier-evaluation metrics (exact rank-sum
    # AUC, one-pass confusion/P-R-F1, calibration bins)
    "eval_auc_rank_sum",
    "eval_confusion_prf",
    "eval_calibration_bins",
    "eval_pr_curve",
    # round-12 batch seven: merge_asof tolerance (same single
    # sort-shuffle plan as join_asof; the gap gate is one CASE)
    "join_asof_tolerance",
    # round-13 batch one: ranking/retrieval evaluation over a temporal
    # split (exact-ppm NDCG with an embedded integer discount table,
    # MRR/hit rates, recall@k curve)
    "rank_eval_ndcg",
    "rank_eval_mrr_hit",
    "rank_eval_recall_curve",
    # round-13 batch two: leakage-safe feature engineering
    # (point-in-time history window, hashing-trick collision census,
    # out-of-fold target encoding)
    "feature_point_in_time",
    "feature_hash_bucket_stats",
    "feature_target_encoding_oof",
    # round-13 batch three: privacy-risk profiling beyond k-anonymity
    # (l-diversity report, exact-ppm t-closeness TV distances);
    # multimodal_phash_neardup (rows-only -> full oracle this round)
    # was already benched in round 7
    "privacy_l_diversity",
    "privacy_t_closeness",
    # round-13 batch four: scale-free forecast accuracy (MASE/sMAPE on
    # the snaive backtest grid), funnel time-to-convert rank stats off
    # a bounded distinct-seconds histogram, catalog exposure/coverage
    "forecast_eval_mase_smape",
    "events_time_to_convert",
    "rank_eval_catalog_coverage",
    # round-13 batch five: product quantization (codebook train/encode
    # census + asymmetric-distance top-k) — the memory half of IVF+PQ
    "embedding_pq_codebook_census",
    "similarity_pq_adc_topk",
    # round-13 batch six: header-vs-detail money reconciliation and
    # RAKE keyphrase extraction (island phrases, exact-ppm scores)
    "quality_reconciliation_report",
    "text_keyphrase_rake",
    # round-13 batch seven: the complete IVF+PQ serving stack in one
    # query (coarse-cell probe -> ADC rerank, fully integer-exact)
    "similarity_ivfadc_topk",
    # round-13 batch eight: Matryoshka truncation-recall study
    # (full-dim vs 16-dim top-10 overlap, WindowGroupLimit heaps)
    "embedding_truncation_recall",
    # round-14 batch one: the MAINTAINED IVFADC store (PQ codes
    # persisted per increment, ADC served from the codes column)
    "rollup_incremental_ivfadc",
    # round-14 batch two: first compressed codec un-gated (stdlib PNG
    # encode -> inflate+unfilter decode, raster-sum certified)
    "multimodal_png_decode_stats",
    # round-14 batch three: survivorship/golden record (MDM merge),
    # split-conformal coverage, B-cubed dedup cluster quality
    "survivorship_golden_record",
    "eval_conformal_coverage",
    "dedup_bcubed_quality",
    # round-14 batch four: robust statistics over calendar grids
    "orders_theilsen_trend",
    "events_cusum_changepoint",
    # round-14 batch five: the MAINTAINED inverted index (O(new)
    # posting increments; BM25 served from the store)
    "rollup_incremental_postings",
    "retrieval_bm25_incremental",
    # round-14 batch six: market-basket rules + chi-square independence
    "basket_association_rules",
    "profile_chi2_independence",
    "orders_kendall_tau",
    # round-14 batch seven: phrase retrieval from the maintained
    # positional grain
    "retrieval_phrase_incremental",
    # round-14 batch eight: quantile-forecast scoring + two-sample test
    "forecast_eval_pinball",
    "events_mannwhitney_u",
    # round-14 batch nine: PQ quantization-error census (the PQ-half
    # retrain trigger, from the maintained store's codes)
    "embedding_pq_drift_report",
    # round-14 batch ten: effect sizes (Cramer's V^2, Cohen's kappa)
    "profile_cramers_v2",
    "dedup_method_kappa",
    # round-15: postings-store analyzer migration (two increments +
    # staged stem3 re-materialization + post-flip increment per pass)
    "rollup_postings_retokenize",
    # round-15: maintained golden-record store (two CDC-ordered
    # increments + replay + serve per pass)
    "rollup_incremental_survivorship",
    # round-15: baseline JPEG codec (encode + full Huffman/IDCT decode
    # of one real JFIF per document per pass)
    "multimodal_jpeg_decode_stats",
    # round-15 batch two: rank/effect-size statistics + hybrid fusion
    "orders_spearman_daily",
    "events_kruskal_wallis",
    "eval_cohens_d2",
    "events_runs_test",
    "events_acf_daily",
    "retrieval_rrf_fusion",
    # round-15 batch three: paired/change-point tests, communities,
    # the k-anonymity generalization ladder
    "events_wilcoxon_signed_rank",
    "events_pettitt_changepoint",
    "graph_label_propagation",
    "privacy_k_anonymity_ladder",
    # round-15 batch four: scorer-evaluation completions + dedup audit
    "eval_brier_score",
    "eval_ece",
    "eval_lift_gains",
    "dedup_selection_bias_report",
]


def _cpu_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat's aggregate cpu line.

    Steal is time this VM's vCPUs were runnable but the hypervisor ran
    a co-tenant instead — the direct counter for the noisy-host regime
    BASELINE.md documents. Returns (0, 0) when /proc/stat is absent
    (non-Linux) so the bench still runs."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from dmds_spark.queries import all_queries
    from dmds_spark.session import get_spark, release_materialized_state

    spark = get_spark(app_name="dmds_spark_bench")

    qs = all_queries()
    missing = [h for h in BASELINE_ORDER + ADDITIONS if h not in qs]
    if missing:
        # comparability guard: never drop names silently (a shrunk set
        # would read as a speedup); shout and keep the record honest
        print(f"bench: MISSING QUERIES {missing}", file=sys.stderr)
    baseline_order = [h for h in BASELINE_ORDER if h in qs]
    additions = [h for h in ADDITIONS if h in qs]

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    times: dict[str, float] = {}
    # Per-measured-pass host-load telemetry. Rounds 6-13 all relitigated
    # noise-vs-regression from timings alone; recording loadavg and the
    # CPU-steal fraction PER PASS makes each BENCH_r{N}.json artifact
    # self-adjudicating (steal_pct > ~5 or load1 far above the pass's
    # own Spark parallelism => co-tenant regime, per BASELINE.md).
    pass_loads: list[dict] = []

    from pyspark.sql import functions as F

    def consume_count(df) -> None:
        df.count()

    def consume_hash(df) -> None:
        # forces full materialization of every output column (see
        # module docstring). bit_xor, not sum: summing random 64-bit
        # hashes overflows ANSI long arithmetic almost immediately,
        # while xor is overflow-free and order-independent. Falls back
        # to count() for output types xxhash64 cannot hash (maps) —
        # that fallback raises at ANALYSIS time, before any execution,
        # so nothing runs twice
        try:
            reducer = df.agg(
                F.expr(
                    "bit_xor(xxhash64(struct("
                    + ", ".join(f"`{c}`" for c in df.columns)
                    + ")))"
                )
            )
        except Exception:  # noqa: BLE001 — unhashable output schema
            df.count()
            return
        reducer.collect()

    def run_phase(names: list[str], min_passes: int = 0,
                  consume=consume_count, phase: str = "baseline") -> None:
        # warmup (not measured): one pass absorbs JVM startup, codegen
        # for every exec kind in the phase, and parquet footer caches —
        # the measured passes then time the PLAN, not the JIT
        for name in names:
            t0 = time.perf_counter()
            consume(qs[name](spark, sf_dir))
            release_materialized_state(spark)
            print(f"warmup {name} {time.perf_counter()-t0:.2f}s", file=sys.stderr)
        # min over repeats: a full GC of the large local-JVM heap (or a
        # noisy-host CPU-steal spike) pauses seconds and lands on an
        # arbitrary query; the minimum over interleaved passes is the
        # plan's actual cost (what a multi-executor cluster would see).
        # release_materialized_state between queries drops each query's
        # localCheckpoint blocks so heap pressure stays per-query; the
        # explicit GC between passes makes collection pauses land
        # BETWEEN measurements instead of inside an arbitrary one.
        for i in range(max(repeats, min_passes)):
            spark.sparkContext._jvm.System.gc()
            steal0, total0 = _cpu_jiffies()
            load0 = os.getloadavg()[0] if hasattr(os, "getloadavg") else 0.0
            t_pass = time.perf_counter()
            for name in names:
                t0 = time.perf_counter()
                consume(qs[name](spark, sf_dir))
                dt = round(time.perf_counter() - t0, 4)
                times[name] = min(times.get(name, dt), dt)
                release_materialized_state(spark)
                print(f"measured {name} {dt:.2f}s", file=sys.stderr)
            steal1, total1 = _cpu_jiffies()
            load1 = os.getloadavg()[0] if hasattr(os, "getloadavg") else 0.0
            dj = max(total1 - total0, 1)
            pass_loads.append({
                "phase": phase, "pass": i,
                "sec": round(time.perf_counter() - t_pass, 2),
                "load1_start": round(load0, 2), "load1_end": round(load1, 2),
                "steal_pct": round(100.0 * (steal1 - steal0) / dj, 2),
            })

    # BOTH phases get >= 4 measured passes regardless of the env
    # override: this host shows minutes-scale CPU-steal windows from
    # co-tenants (a whole 2-pass measurement can land inside one,
    # inflating every min uniformly ~1.5x — r4's driver run recorded
    # dedup_embedding_neardup at 12.7 s vs 4.6 s re-measured on a quiet
    # box, purely because the additions phase only had 2 passes). All
    # queries are sub-6 s when healthy, so extra passes are cheap
    # insurance that at least one pass lands in a quiet window.
    run_phase(baseline_order, min_passes=4, phase="baseline")
    # SPARK_GRAFT_BENCH_PHASE=baseline: comparable-21 only (fast
    # re-measure for round-over-round drift checks). The driver sets
    # nothing, so its per-round record always covers the full set.
    if os.environ.get("SPARK_GRAFT_BENCH_PHASE", "all") != "baseline":
        run_phase(additions, min_passes=4, consume=consume_hash,
                  phase="additions")

    total = round(sum(times[k] for k in baseline_order), 4)
    # The driver records only the LAST ~2000 chars of stdout and tries
    # to json-parse them; a final line carrying all 130+ per-query
    # timings is ~4 KB, so every round since r5 recorded "parsed": null
    # (the tail started mid-line). Keep the final stdout line COMPACT —
    # comparable-21 timings only — and write the full per-query detail
    # to BENCH_DETAIL.json next to this script instead.
    load_summary = {
        "passes": len(pass_loads),
        "load1_min": min((p["load1_start"] for p in pass_loads), default=0.0),
        "load1_max": max(
            (max(p["load1_start"], p["load1_end"]) for p in pass_loads),
            default=0.0,
        ),
        "steal_pct_max": max((p["steal_pct"] for p in pass_loads),
                             default=0.0),
        "cpus": os.cpu_count(),
        # self-certification (round 16): os.cpu_count() above records
        # the HOST core count regardless of $SPARK_GRAFT_CPUS, which
        # made a local[8] run's artifact claim "cpus": 32. Record the
        # parallelism that was actually in effect so the artifact can
        # prove which master ran it.
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "spark_graft_cpus": os.environ.get("SPARK_GRAFT_CPUS"),
    }
    detail = {
        "queries": times,
        "missing": missing,
        "metric": "headline_queries_total",
        "unit": "sec",
        "value": total,
        "value_full": round(sum(times.values()), 4),
        "n_queries": len(times),
        "sf": sf,
        "load": load_summary,
        "load_passes": pass_loads,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    line = dict(detail)
    line["queries"] = {k: times[k] for k in baseline_order}
    line.pop("load_passes", None)  # per-pass rows live in the detail file
    line["detail"] = "BENCH_DETAIL.json"
    out = json.dumps(line)
    # The round driver json-parses only the LAST ~2000 chars of stdout:
    # the final line must fit or the whole bench run records nothing.
    # Normal runs fit comfortably; a wide failure list (many `missing`
    # entries) must degrade to a shorter-but-valid line, never crash
    # after a 30-minute run.
    if len(out) >= 1900:
        line["missing"] = f"{len(missing)} queries (see BENCH_DETAIL.json)"
        out = json.dumps(line)
    if len(out) >= 1900:
        line.pop("queries", None)
        out = json.dumps(line)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
