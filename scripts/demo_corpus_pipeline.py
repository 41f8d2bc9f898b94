#!/usr/bin/env python
"""End-to-end walkthrough: the reference's World data model + the
training-corpus pipeline, in one runnable script.

Usage: python scripts/demo_corpus_pipeline.py [sf_dir]
Default sf_dir: /root/testdata/sf0.001 (runs in ~1 min on local[*]).

Stages (each prints a one-line summary):
  1. World CRUD  — build a 2-dim world (reference world.rs semantics:
     dim 0 immutable id, chunk-grid partitioning), upsert, relocate,
     range-select with chunk pruning.
  2. Curation    — language ID -> quality gate -> exact dedup ->
     MinHash near-dup keep-first (pipeline_curation).
  3. Dedup audit — near-dup cluster sizes + containment-verified pairs.
  4. Packing     — fixed-length sequence packing with the two-level
     sharded cumsum (tokens_pack_sequences).
  5. Mixture     — per-source token share + uniform-mixture weights.
  6. Similarity  — LSH-bucketed ANN top-k neighbors of vec 0.
  7. Export      — sharded manifest export + incremental rollup refresh.

This is a DEMO of the public API surface (same calls as USAGE.md), not
a benchmark — bench.py is the measured path.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dmds_spark.core.dims import DimSpec, WorldSpec  # noqa: E402
from dmds_spark.queries import all_queries  # noqa: E402
from dmds_spark.session import get_spark  # noqa: E402
from dmds_spark.world import World  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="dmds_spark_demo")
    qs = all_queries()

    # -- 1. World CRUD ------------------------------------------------
    with tempfile.TemporaryDirectory() as root:
        spec = WorldSpec(
            dims=(
                DimSpec("id", 0, 1023, 64),
                DimSpec("score", 0, 1023, 64),
            )
        )
        w = World(spark, spec, root)
        w.insert_rows(
            [{"id": i, "score": (i * 37) % 1024} for i in range(200)]
        )
        w.flush()
        hits = w.read(w.select(1, slice(500, 600))).count()
        w.upsert(
            spark.createDataFrame([(7, 999)], ["id", "score"])
        )  # relocates id 7's chunk
        w.flush()
        moved = w.read(w.select(1, slice(990, 1024))).count()
        print(f"1. world: 200 rows, score in [500,600) -> {hits} hits; "
              f"relocated row visible in new chunk -> {moved} hit(s)")

    # -- 1b. Full-u64 world (DimSpec(u64=True)) -----------------------
    with tempfile.TemporaryDirectory() as root:
        uspec = WorldSpec(
            dims=(
                DimSpec("id", 0, 2**64 - 1, 2**32, u64=True),
                DimSpec("score", 0, 1023, 64),
            )
        )
        uw = World(spark, uspec, root)
        uw.insert_rows(
            [{"id": 2**63 + i * 2**33, "score": i} for i in range(32)]
        )
        uw.flush()
        top = uw.read(uw.select(0, (2**63 + 16 * 2**33, None))).count()
        print(f"1b. u64 world: 32 rows past 2^63 (DECIMAL(20,0) ids), "
              f"top-half range select -> {top} hits")

    # -- 2. Curation --------------------------------------------------
    kept = qs["pipeline_curation"](spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_kept = kept.count()
    print(f"2. curation: {n_docs} docs -> {n_kept} kept "
          f"(lang+quality+exact+near-dup gates)")

    # -- 3. Dedup audit ----------------------------------------------
    sizes = qs["dedup_cluster_size_dist"](spark, sf_dir).collect()
    dup_docs = sum(r.cluster_size * r.n_clusters
                   for r in sizes if r.cluster_size > 1)
    pairs = qs["dedup_containment_verify"](spark, sf_dir).count()
    print(f"3. dedup audit: {dup_docs} docs in size>=2 near-dup clusters; "
          f"{pairs} containment-verified pairs (>=0.7)")

    # -- 4. Packing ---------------------------------------------------
    packs = qs["tokens_pack_sequences"](spark, sf_dir)
    row = packs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks")
    ).collect()[0]
    print(f"4. packing: {row['n']} doc->sequence assignments, "
          f"{row['toks']} tokens packed into fixed-length sequences")

    # -- 5. Mixture ---------------------------------------------------
    mix = qs["tokens_domain_mixture"](spark, sf_dir).collect()
    shares = {r.source: r.share_ppm for r in sorted(mix, key=lambda r: r.source)}
    print(f"5. mixture: per-source token share (ppm) {shares}")

    # -- 6. Similarity ------------------------------------------------
    ann = qs["similarity_ann_lsh_topk"](spark, sf_dir).collect()
    ids = [r.vec_id for r in ann]
    print(f"6. similarity: ANN top-{len(ids)} neighbors of vec 0 -> {ids}")

    # -- 7. Export + continuous aggregate -----------------------------
    from dmds_spark.operators.rollup import IncrementalRollup
    from dmds_spark.sources.sinks import export_sharded

    with tempfile.TemporaryDirectory() as root:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        manifest = export_sharded(
            docs, f"{root}/corpus", shards=8, shard_key="doc_id",
            sort_cols=["doc_id"],
        )
        rows = [e["rows"] for e in manifest]
        ru = IncrementalRollup(
            spark, f"{root}/corpus", f"{root}/rollup",
            ["source"], ["n_chars"],
        )
        st = ru.refresh()
        groups = ru.read().count()
        print(f"7. export: {len(manifest)} shard files "
              f"(rows {min(rows)}..{max(rows)}, manifest written); "
              f"rollup v{st['version']} folded {st['new_files']} files "
              f"-> {groups} source groups")

    # -- 8. Corpus health: drift + novelty + robust stats -------------
    ks = {r["source"]: r["ks_stat"]
          for r in qs["profile_ks_drift"](spark, sf_dir).collect()}
    worst = max(ks, key=ks.get)
    med = qs["agg_weighted_median"](spark, sf_dir).collect()
    wm = {r["l_returnflag"]: r["wmedian_price_cents"] for r in med}
    print(f"8. health: max KS drift {worst}={ks[worst]:.3f}; "
          f"weighted median price (cents) by flag {wm}")

    # -- 9. SFT data prep: composite build + DPO pairs -----------------
    sft = qs["pipeline_sft_corpus"](spark, sf_dir)
    splits = {r["split"]: r["n"] for r in
              sft.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    pairs = qs["sft_preference_pairs"](spark, sf_dir).count()
    print(f"9. sft: corpus build kept {sum(splits.values())} conversations "
          f"{splits}; {pairs} DPO preference pairs")

    # -- 10. publish gate: declarative quality constraints -------------
    gate = qs["quality_constraint_report"](spark, sf_dir)
    verdicts = {r["constraint"]: r["passed"] for r in gate.collect()}
    n_fail = sum(1 for v in verdicts.values() if v == 0)
    fks = qs["quality_referential_report"](spark, sf_dir)
    fk_ok = all(r["passed"] == 1 for r in fks.collect())
    print(f"10. quality gate: {len(verdicts) - n_fail}/{len(verdicts)} "
          f"constraints pass ({n_fail} failing by design); "
          f"FK integrity {'clean' if fk_ok else 'VIOLATED'} on 3 keys")

    # -- 11. filter evaluation: is a scorer worth shipping? -------------
    auc = qs["eval_auc_rank_sum"](spark, sf_dir).collect()[0]
    prf = qs["eval_confusion_prf"](spark, sf_dir).collect()[0]
    print(f"11. filter eval: diversity-vs-dup AUC "
          f"{auc['auc_ppm'] / 10_000:.1f}% (chance — scorer rejected); "
          f"at the 0.33 threshold P={prf['precision_ppm']} ppm "
          f"R={prf['recall_ppm']} ppm")

    # -- 12. LM quality gate + index retrieval --------------------------
    lm = qs["text_lm_score_docs"](spark, sf_dir)
    kept = lm.agg(F.sum("keep")).collect()[0][0]
    phrase = qs["text_phrase_retrieval"](spark, sf_dir).count()
    print(f"12. lm + index: stupid-backoff keep gate retains {kept}/"
          f"{lm.count()} held-out docs; phrase 'hash join' found in "
          f"{phrase} docs via positional postings")

    # -- 13. round-13: ranking eval + PQ serving + features -------------
    ndcg = qs["rank_eval_ndcg"](spark, sf_dir).collect()[0]
    adc = qs["similarity_ivfadc_topk"](spark, sf_dir).collect()
    trunc = qs["embedding_truncation_recall"](spark, sf_dir)
    mean_trunc = trunc.agg(F.avg("recall_ppm")).collect()[0][0]
    print(f"13. ranking + ANN serving: popularity-ranker NDCG@5 "
          f"{ndcg['mean_ndcg_ppm'] / 10_000:.1f}% over "
          f"{ndcg['n_users']} held-out users; IVFADC top-{len(adc)} "
          f"served from PQ codes (rank-1 self-retrieval "
          f"{'OK' if adc[0]['vec_id'] == 0 else 'BROKEN'}); "
          f"16-of-64-dim truncation keeps {mean_trunc / 10_000:.0f}% "
          f"of exact top-10s")

    # -- 14. round-13: leakage-safe features + release review -----------
    enc = qs["feature_target_encoding_oof"](spark, sf_dir).count()
    tv = qs["privacy_t_closeness"](spark, sf_dir).collect()
    worst = tv[0]
    recon = qs["quality_reconciliation_report"](spark, sf_dir).collect()
    drift = sum(r["sum_abs_diff_c"] for r in recon)
    print(f"14. features + privacy: {enc} out-of-fold target encodings; "
          f"worst t-closeness group ({worst['nationkey']}, "
          f"{worst['mktsegment']}) TV {worst['tv_ppm'] / 10_000:.1f}%; "
          f"header-vs-detail reconciliation drift {drift} cents "
          f"across {sum(r['n_orders'] for r in recon)} orders")

    # -- 15. round-14: maintained retrieval + golden records ------------
    bm = qs["retrieval_bm25_incremental"](spark, sf_dir).collect()
    ph = qs["retrieval_phrase_incremental"](spark, sf_dir).count()
    gold = qs["survivorship_golden_record"](spark, sf_dir)
    n_gold = gold.count()
    print(f"15. maintained retrieval + MDM: BM25 top-{len(bm)} and "
          f"phrase hits in {ph} docs served from the incremental "
          f"posting store; {n_gold} golden records mastered from the "
          f"event stream (recency/precedence/vote survivorship)")

    # -- 16. round-14: uncertainty + robust trend + rules ---------------
    conf = {r["event_type"]: r for r in
            qs["eval_conformal_coverage"](spark, sf_dir).collect()}
    cov = min(r["coverage_ppm"] for r in conf.values())
    ts = qs["orders_theilsen_trend"](spark, sf_dir).collect()[0]
    kt = qs["orders_kendall_tau"](spark, sf_dir).collect()[0]
    rules = qs["basket_association_rules"](spark, sf_dir).collect()
    top = rules[0]
    print(f"16. uncertainty + trend + rules: conformal q_hat "
          f"{next(iter(conf.values()))['q_hat_cents']} cents, worst "
          f"held-out coverage {cov / 10_000:.1f}%; Theil-Sen slope "
          f"{ts['slope_cents_per_day']} cents/day over {ts['n_days']} "
          f"days (Kendall tau {kt['tau_a_ppm'] / 10_000:.1f}%); top "
          f"basket rule {top['ante']}->{top['cons']} lift "
          f"{top['lift_ppm'] / 10_000:.1f}%")

    # -- 17. round-14: dedup quality + PNG codec + change-point ---------
    bc = qs["dedup_bcubed_quality"](spark, sf_dir).collect()[0]
    png = qs["multimodal_png_decode_stats"](spark, sf_dir).collect()[0]
    cp = qs["events_cusum_changepoint"](spark, sf_dir).collect()[0]
    print(f"17. dedup quality + codecs: MinHash clustering B-cubed "
          f"P {bc['bcubed_precision_ppm'] / 10_000:.1f}% / "
          f"R {bc['bcubed_recall_ppm'] / 10_000:.1f}% vs exact-Jaccard "
          f"truth; {png['n']} PNGs decoded to "
          f"{png['sum_raster_bytes']} raster bytes with the stdlib "
          f"codec; CUSUM flags day {cp['changepoint_day']} as the "
          f"event-rate change-point")

    print("demo: all stages ran")
    return 0


if __name__ == "__main__":
    sys.exit(main())
