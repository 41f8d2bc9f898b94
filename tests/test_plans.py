"""Plan-property pins for the headline queries (SURVEY.md §4: the
optimizations the engine owes the user). A change that silently drops
pushdown, column pruning, a broadcast, or adds a shuffle fails HERE,
not on the cluster bill.

Run at sf0.001 — plan shape is scale-independent (modulo AQE runtime
re-planning, which these static checks precede).
"""

import pytest
from pyspark.sql import functions as F

from dmds_spark.plans import (
    broadcast_join_count,
    physical_plan,
    pushed_filters,
    read_schemas,
    scan_count,
    shuffle_count,
    unpartitioned_window_count,
)
from dmds_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def test_q6_filters_reach_scan(spark, qs):
    """Every Q6 predicate must push into the parquet scan."""
    df = qs["q6_forecast_revenue"](spark, SF)
    pf = " ".join(pushed_filters(df))
    assert "l_quantity" in pf
    assert "l_discount" in pf or "l_shipdate" in pf


def test_q6_column_pruning(spark, qs):
    """Q6 touches 4 columns; the scan must not read more."""
    df = qs["q6_forecast_revenue"](spark, SF)
    rs = read_schemas(df)[0]
    cols = {c.split(":")[0] for c in rs[len("struct<") : -1].split(",") if c}
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q1_partial_aggregation(spark, qs):
    """Q1's aggregation must be two-phase (map-side partial combine
    before the exchange) — the difference between shuffling 600k rows
    and shuffling 6."""
    plan = physical_plan(qs["q1_pricing_summary"](spark, SF))
    assert "partial_sum" in plan or "partial_count" in plan


def test_q3_broadcasts_customer(spark, qs):
    """The filtered customer dim must broadcast, never shuffle-join."""
    df = qs["q3_shipping_priority"](spark, SF)
    assert broadcast_join_count(df) >= 1


def test_q5_broadcasts_dims(spark, qs):
    """supplier/nation/region are all broadcast in the 6-way join."""
    df = qs["q5_local_supplier_volume"](spark, SF)
    assert broadcast_join_count(df) >= 3


def test_topn_uses_take_ordered(spark, qs):
    """Global top-N must run as TakeOrderedAndProject (per-partition
    top-N + driver merge), not a full sort."""
    plan = physical_plan(qs["sort_limit_topn"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_window_row_number_single_shuffle(spark, qs):
    """A single window pass = exactly one exchange."""
    df = qs["window_row_number"](spark, SF)
    assert shuffle_count(df) == 1


def test_sessionize_single_shuffle(spark, qs):
    """Lag + running-sum + grouped agg all share the user_id
    partitioning: one exchange total, the rest reuses it."""
    df = qs["sessionize_10m"](spark, SF)
    assert shuffle_count(df) <= 2  # one for the window; agg may reuse


def test_dedup_exact_single_shuffle(spark, qs):
    df = qs["dedup_exact_keep_first"](spark, SF)
    assert shuffle_count(df) == 1


def test_minhash_signatures_single_shuffle(spark):
    """The window (k-gram lead) and the min-aggregation share the
    doc_id partitioning: one exchange for the whole signature pipeline
    (+1 only if the parallelism guard repartitions a tiny source)."""
    from dmds_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = minhash_signatures(docs, "text", "doc_id")
    # tiny test file triggers the ensure_parallelism round-robin; the
    # semantic pipeline itself contributes exactly one hash exchange
    assert shuffle_count(sigs) <= 2


def test_ann_broadcasts_query_side(spark, qs):
    """The single query vector must broadcast to the candidates."""
    df = qs["similarity_ann_lsh_topk"](spark, SF)
    assert broadcast_join_count(df) >= 1


def test_dmds_empty_select_is_local(spark, qs):
    """An out-of-domain selection folds to an empty LocalRelation —
    zero I/O (the reference's Shape::None, src/world.rs:313-317)."""
    df = qs["dmds_select_empty_domain"](spark, SF)
    plan = physical_plan(df)
    assert "FileScan" not in plan or "LocalTableScan" in plan


def test_q11_broadcasts_dims_and_threshold(spark, qs):
    """Q11: supplier/nation and the one-row threshold must all
    broadcast — the per-part value agg is the only real shuffle."""
    df = qs["q11_important_parts"](spark, SF)
    assert broadcast_join_count(df) >= 3


def test_q16_antijoin_broadcasts(spark, qs):
    """Q16's NOT-IN supplier exclusion must be a broadcast anti-join."""
    plan = physical_plan(qs["q16_supplier_part_count"](spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_salted_agg_two_phase(spark, qs):
    """salted_agg must shuffle on (key, salt) then on key — two
    exchanges, both preceded by partial aggregation."""
    df = qs["agg_salted_sum"](spark, SF)
    assert shuffle_count(df) == 2
    assert "partial_sum" in physical_plan(df)


def test_salted_join_no_broadcast_of_fact(spark, qs):
    """join_salted_skew joins on (key, salt): the composite key must
    appear in the join, proving the hot key is actually split."""
    plan = physical_plan(qs["join_salted_skew"](spark, SF))
    assert "__salt" in plan


def test_gapfill_grid_is_broadcast(spark, qs):
    """The bounds row feeding the dense grid must broadcast; the LOCF
    window and the grid join share the event_type partitioning."""
    df = qs["timeseries_gapfill"](spark, SF)
    assert broadcast_join_count(df) >= 1


def test_embedding_neardup_no_all_pairs(spark, qs):
    """The near-dup candidate join must be an equi-join on the LSH
    bucket — never a BroadcastNestedLoopJoin / cartesian all-pairs."""
    plan = physical_plan(qs["dedup_embedding_neardup"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "__bucket" in plan


def test_pairs_threshold_no_all_pairs(spark, qs):
    """Threshold pairs block on the LSH bucket, not a low-cardinality
    attribute: equi-join on __bucket, no nested-loop."""
    plan = physical_plan(qs["similarity_pairs_threshold"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "__bucket" in plan


def test_arrow_variants_no_all_pairs_and_arrow_stages(spark, qs):
    """The Arrow fast-path twins keep the exact blocking shape (equi-
    join on __bucket, never nested-loop) and actually run their Python
    stages as Arrow-batched MapInPandas — if a refactor silently
    rewired them to the JVM fold, the benched 'vectorization win'
    rows would be measuring nothing."""
    for name in (
        "dedup_embedding_neardup_arrow",
        "similarity_pairs_threshold_arrow",
    ):
        plan = physical_plan(qs[name](spark, SF))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "__bucket" in plan, name
        assert "MapInPandas" in plan, name


def test_simhash_band_equijoin(spark, qs):
    """SimHash blocking must equi-join on the pigeonhole band key."""
    plan = physical_plan(qs["dedup_simhash_pairs"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "__block" in plan


def test_tfidf_broadcasts_corpus_count(spark, qs):
    """The single-row corpus count must broadcast into the score join;
    ranking is a per-doc window, never a global sort."""
    df = qs["text_tfidf_topk"](spark, SF)
    assert broadcast_join_count(df) >= 1


def test_knn_batch_broadcasts_queries(spark, qs):
    """The query set broadcasts; candidate scoring stays distributed."""
    df = qs["similarity_knn_batch"](spark, SF)
    assert broadcast_join_count(df) >= 1


def test_boilerplate_topn_no_global_sort(spark, qs):
    plan = physical_plan(qs["text_boilerplate_ngrams"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_cluster_pairs_single_band_shuffle(spark):
    """The LSH candidate join must join on the band key only (one
    shuffle), never a cartesian of signatures."""
    from dmds_spark.operators.dedup import minhash_lsh_candidates, minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = minhash_signatures(docs, "text", "doc_id")
    cand = minhash_lsh_candidates(sigs, "doc_id")
    plan = physical_plan(cand)
    assert "CartesianProduct" not in plan
    assert "band_key" in plan


def test_contamination_broadcasts_eval_side(spark, qs):
    """The benchmark shingle set must broadcast — the training-corpus
    probe join must never shuffle the corpus on the shingle key."""
    df = qs["text_contamination_ngram"](spark, SF)
    assert broadcast_join_count(df) >= 1
    assert "BroadcastNestedLoopJoin" not in physical_plan(df)


def test_profile_stats_split_aggregate_shape(spark, qs):
    """The exact profile splits the string min/max out of the
    multi-distinct aggregate (optimization round): the distinct+null
    side hash-aggregates over the Expand, the min/max side
    sort-aggregates with NO grouping key (no Sort node at all), and
    the two 1-row results re-attach by the scalar cross join. Two
    column-pruned scans — the fused shape sort-aggregated the
    Expand-multiplied corpus ((1+#cols) x rows) by the 5-col dedup
    key, measured 5.2 s at sf0.1 vs 2.4 s split."""
    from dmds_spark.plans import scan_count

    df = qs["profile_column_stats"](spark, SF)
    assert scan_count(df) == 2
    plan = physical_plan(df)
    assert "Expand" in plan
    # the Expand-side dedup of distinct keys must hash-aggregate
    assert "HashAggregate(keys=[l_" in plan
    # any surviving SortAggregate is keyless (scalar min/max): no sort
    for line in plan.splitlines():
        if "SortAggregate" in line:
            assert "key=[]" in line, line


def test_profile_stats_approx_path(spark):
    """The 100 TB path: approx distinct counts collapse the Expand and
    still profile every column in one scan."""
    from dmds_spark.plans import scan_count
    from dmds_spark.queries.profiling_q import _PROF_COLS, _profile_stats

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = _profile_stats(li, _PROF_COLS, approx=True)
    assert scan_count(df) == 1
    assert "Expand" not in physical_plan(df)
    rows = {r["col_name"]: r for r in df.collect()}
    assert set(rows) == set(_PROF_COLS)
    assert all(r["n_distinct"] > 0 for r in rows.values())


def test_histogram_filter_reaches_scan(spark, qs):
    """The histogram's range bounds must push into the parquet scan."""
    df = qs["profile_price_histogram"](spark, SF)
    pf = " ".join(pushed_filters(df))
    assert "o_totalprice" in pf


def test_histogram_partial_aggregation(spark, qs):
    plan = physical_plan(qs["profile_price_histogram"](spark, SF))
    assert "partial_count" in plan or "partial_min" in plan


def test_packing_two_level_cumsum_shape(spark):
    """Sequence packing at size must be two-level
    (sharded_exclusive_cumsum): the data-side running-sum window
    partitions on (source, shard) — a window partitioned by source
    alone puts each source through ONE task (the 100 TB skew killer).
    The per-shard offsets re-attach via broadcast. Pinned at the
    operator level with the sharded shape forced (num_ranges), because
    at test scale the registered queries legitimately dispatch to the
    small-input fast path (separate pin below)."""
    import re

    from dmds_spark.operators.relational import sharded_exclusive_cumsum

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    df = sharded_exclusive_cumsum(
        d, "source", ["doc_id"], "n_tokens", "cb", num_ranges=8
    )
    plan = physical_plan(df)
    # data window keys are (source, __pid) ordered by doc_id
    assert re.search(r"windowspecdefinition\(source#\d+, __pid#", plan)
    # and never source-alone ordered by doc_id
    assert not re.search(r"windowspecdefinition\(source#\d+, doc_id#", plan)
    assert "BroadcastHashJoin" in plan


def test_packing_small_input_fast_path(spark, qs):
    """At small scale the size-estimate dispatch must take the plain
    per-group window — no checkpoint, no offsets join (the two-level
    machinery costs ~0.6 s of fixed overhead that buys nothing when one
    task holds the whole input). The sharded shape must still engage
    when the estimate exceeds the shard budget: forced here via
    small_input_bytes=0 on the identical input."""
    import re

    from dmds_spark.operators.relational import sharded_exclusive_cumsum

    df = qs["tokens_pack_sequences"](spark, SF)
    plan = physical_plan(df)
    assert re.search(r"windowspecdefinition\(source#\d+, doc_id#", plan)
    assert "__pid" not in plan

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    sharded = sharded_exclusive_cumsum(
        d, "source", ["doc_id"], "n_tokens", "cb", small_input_bytes=0
    )
    assert re.search(
        r"windowspecdefinition\(source#\d+, __pid#", physical_plan(sharded)
    )


def test_pretrain_corpus_no_per_source_data_window(spark, qs):
    """The corpus composite must never run a window partitioned by
    source alone over data-sized input UNLESS the input fits one shard
    (the small-input dispatch): at test scale either the fast path
    (source, doc_id ordering, tiny input) or the sharded (source,
    __pid) window is acceptable, but the sharded machinery and the
    skewed shape must not BOTH appear."""
    import re

    df = qs["pipeline_pretrain_corpus"](spark, SF)
    plan = physical_plan(df)
    two_level = bool(re.search(r"windowspecdefinition\(source#\d+, __pid#", plan))
    skewed = bool(re.search(r"windowspecdefinition\(source#\d+, doc_id#", plan))
    assert two_level != skewed  # exactly one packing shape
    if skewed:
        assert "__pid" not in plan  # fast path: no sharding residue


def test_funnel_no_window_over_stream(spark, qs):
    """The funnel must be aggregate+join shaped — no Window exec over
    the raw event stream. Built with materialize=False: the registered
    query's eager per-step checkpoints truncate lineage to Scan
    ExistingRDD nodes, which would make this pin vacuous (the guarded
    regression would execute at checkpoint time, invisible to the
    final plan)."""
    from dmds_spark.operators.events import sequential_funnel
    from dmds_spark.sources.registry import load_events

    e = load_events(spark, SF)
    df = sequential_funnel(
        e, ["view", "click", "purchase"], materialize=False
    )
    assert "Window" not in physical_plan(df)


def test_range_attribution_hash_join(spark, qs):
    """The attribution range join must be a (user, bucket) hash
    equi-join with the exact interval re-filter — never a nested-loop
    over per-user (view, purchase) pairs."""
    plan = physical_plan(qs["join_range_attribution"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_vocab_coverage_broadcasts_vocab(spark, qs):
    """The top-N vocabulary must re-attach as a broadcast join; the
    only wide stage is the per-doc aggregate."""
    df = qs["text_vocab_coverage"](spark, SF)
    assert broadcast_join_count(df) >= 1


def test_chunk_overlap_no_shuffle(spark, qs):
    """Chunk-span generation is a pure per-row explode — zero
    exchanges anywhere in the plan."""
    df = qs["tokens_chunk_overlap"](spark, SF)
    assert shuffle_count(df) == 0


def test_cap_per_source_two_level_window(spark, qs):
    """Domain capping must be the two-level shape: a sliced
    (source, hash) pre-rank before the per-source rank, so no window
    ever sees an unbounded hot domain."""
    plan = physical_plan(qs["sample_cap_per_source"](spark, SF))
    import re

    # two Window execs: first partitioned by (source, slice-hash)
    assert len(re.findall(r"\bWindow(?:GroupLimit)?\b", plan)) >= 2
    assert "xxhash64" in plan.lower()


def test_pack_spans_no_per_source_data_window(spark, qs):
    """The gather-span variant inherits the cumsum dispatch — at test
    scale the small-input fast path (plain per-source window, no
    sharding residue), with the two-level shape covered by the forced
    operator pin in test_packing_two_level_cumsum_shape."""
    import re

    plan = physical_plan(qs["tokens_pack_spans"](spark, SF))
    two_level = bool(re.search(r"windowspecdefinition\(source#\d+, __pid#", plan))
    skewed = bool(re.search(r"windowspecdefinition\(source#\d+, doc_id#", plan))
    assert two_level != skewed  # exactly one packing shape
    if skewed:
        assert "__pid" not in plan


def test_market_basket_equijoin_within_order(spark, qs):
    """The basket self-join must key on the order id (bounded per-group
    fan-out), never a nested-loop or cartesian pair enumeration."""
    plan = physical_plan(qs["market_basket_pairs"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrdered" in plan  # top-25 never globally sorts


def test_triangle_count_equijoins_only(spark, qs):
    """Triangle enumeration is two equi-joins over the oriented edge
    list — a nested-loop here is the all-wedges explosion."""
    plan = physical_plan(qs["graph_triangle_count"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scd2_windows_share_one_user_sort(spark, qs):
    """Both SCD2 window passes sort by (user_id; ts, event_id)-prefixed
    orders, so the plan needs at most two hash exchanges total (one for
    the event-grain windows + group, one for the interval-grain lead) —
    a per-window exchange would make it four."""
    df = qs["events_scd2_intervals"](spark, SF)
    assert shuffle_count(df) <= 2


def test_attribution_no_nested_loop(spark, qs):
    """Last-touch attribution joins purchases to touches on user_id
    (the time predicates are post-join filters) — an accidental range-
    only join condition would plan as BroadcastNestedLoopJoin."""
    plan = physical_plan(qs["events_attribution_last_touch"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# --- round-5 batch-three pins (llm_extra6) ---------------------------------


def test_covariance_single_scan_partial_agg(spark, qs):
    """All three covariance pairs must come from ONE lineitem scan and
    a two-phase aggregate (7 partial sums) — a per-pair scan or a
    single-phase agg would triple/centralize the 100 TB read."""
    from dmds_spark.plans import scan_count

    df = qs["profile_covariance"](spark, SF)
    plan = physical_plan(df)
    assert scan_count(df) == 1
    assert "partial_sum" in plan or "partial_count" in plan


def test_equidepth_bins_distributed_rank(spark, qs):
    """The decile NTILE must be the two-level global rank (per-shard
    window on __pid + offsets), never a single-partition ORDER BY
    window over the whole table."""
    import re

    plan = physical_plan(qs["profile_equidepth_bins"](spark, SF))
    assert re.search(r"windowspecdefinition\(__pid#", plan)


def test_transition_counts_two_shuffles(spark, qs):
    """Markov transition table = one window sort-shuffle (user_id) +
    one count shuffle over <=|types|^2 groups; anything more means a
    redundant exchange crept in."""
    df = qs["events_transition_counts"](spark, SF)
    assert shuffle_count(df) <= 2


def test_twap_window_keys_include_user(spark, qs):
    """The TWAP lead window must partition by (event_type, user_id) —
    event_type alone drags each type's whole global stream through one
    task at scale."""
    import re

    plan = physical_plan(qs["events_time_weighted_value"](spark, SF))
    assert re.search(
        r"windowspecdefinition\(event_type#\d+, user_id#", plan
    )
    assert not re.search(r"windowspecdefinition\(event_type#\d+, ts#", plan)


def test_pareto_distributed_rank_no_nested_loop(spark, qs):
    """The ABC classification's global rank must be the sharded shape
    (per-__pid window + offsets), with only equi-joins in the plan."""
    import re

    plan = physical_plan(qs["suppliers_pareto_class"](spark, SF))
    assert re.search(r"windowspecdefinition\(__pid#", plan)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_shard_plan_single_scan_partial_agg(spark, qs):
    """The 16-shard write plan is one scan + one small partial-combined
    aggregate; the token counts must ride the same scan."""
    from dmds_spark.plans import scan_count

    df = qs["tokens_shard_plan"](spark, SF)
    plan = physical_plan(df)
    assert scan_count(df) == 1
    assert "partial_sum" in plan or "partial_count" in plan


def test_concurrency_peak_sharded_at_size(spark):
    """The sweep-line running sum over event_type (a handful of keys)
    must take the two-level sharded shape when forced to size: window
    keys (event_type, __pid), offsets re-attached by broadcast. The
    registered query may dispatch to the small-input path at test
    scale (same dispatch pin as packing)."""
    import re

    from dmds_spark.operators.relational import sharded_exclusive_cumsum
    from dmds_spark.sources.registry import load_events

    ev = load_events(spark, SF).select(
        "event_type", F.unix_micros("ts").alias("t"), F.lit(1).alias("d")
    )
    df = sharded_exclusive_cumsum(
        ev, "event_type", [F.col("t").asc(), F.col("d").asc()], "d",
        out="r", num_ranges=8,
    )
    plan = physical_plan(df)
    assert re.search(r"windowspecdefinition\(event_type#\d+, __pid#", plan)
    assert not re.search(r"windowspecdefinition\(event_type#\d+, t#", plan)
    assert "BroadcastHashJoin" in plan


def test_common_neighbors_equijoin_takeordered(spark, qs):
    """Wedge enumeration must equi-join on the shared customer endpoint
    (never nested-loop all supplier pairs), and the top-20 must be
    TakeOrdered, not a global sort."""
    plan = physical_plan(qs["graph_common_neighbors"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrdered" in plan


def test_cross_source_overlap_equijoins(spark, qs):
    """The contamination matrix reuses the LSH band equi-join and adds
    two doc_id equi-joins for the source lookups — no nested loops."""
    plan = physical_plan(qs["dedup_cross_source_overlap"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_yoy_revenue_broadcasts_part(spark, qs):
    """The part dimension must broadcast into the lineitem join."""
    df = qs["parts_yoy_revenue"](spark, SF)
    assert broadcast_join_count(df) >= 1


def test_hapax_two_count_shuffles(spark, qs):
    """Lexical diversity = (source, token) count then source rollup —
    two partial-combined exchanges, explode never crosses a shuffle."""
    df = qs["text_hapax_ratio"](spark, SF)
    assert shuffle_count(df) <= 2
    assert "partial_count" in physical_plan(df)


def test_price_dispersion_broadcasts_part(spark, qs):
    """The part dimension must broadcast; one aggregate does all three
    dispersion components."""
    df = qs["parts_price_dispersion"](spark, SF)
    assert broadcast_join_count(df) >= 1
    assert shuffle_count(df) <= 1


def test_weighted_median_broadcast_totals(spark, qs):
    """Group totals (3 rows) must ride a broadcast join onto the
    cumulative-weight side; the heavy lifting is partial-combined."""
    df = qs["agg_weighted_median"](spark, SF)
    plan = physical_plan(df)
    assert broadcast_join_count(df) >= 1
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_winsorized_rank_is_sharded_cumsum(spark):
    """The per-nation rank must come from the sharded running count —
    window keys (nk, __pid), never nk alone over the data rows — when
    the sharded shape is forced (at size the dispatch engages it)."""
    import re

    from dmds_spark.operators.relational import sharded_exclusive_cumsum

    s = spark.read.parquet(f"{SF}/supplier.parquet").select(
        F.col("s_nationkey").alias("nk"),
        F.col("s_acctbal").alias("bc"),
        F.col("s_suppkey").alias("sk"),
        F.lit(1).alias("one"),
    )
    df = sharded_exclusive_cumsum(
        s, "nk", ["bc", "sk"], "one", "cb", num_ranges=8
    )
    plan = physical_plan(df)
    assert re.search(r"windowspecdefinition\(nk#\d+, __pid#", plan)
    assert not re.search(r"windowspecdefinition\(nk#\d+, bc#", plan)


def test_winsorized_bounds_broadcast(spark, qs):
    """Clamp bounds and group sizes are #nations-sized — they must
    broadcast back onto the supplier rows, never shuffle them."""
    df = qs["suppliers_winsorized_balance"](spark, SF)
    assert broadcast_join_count(df) >= 2


def test_trigram_novelty_stays_jvm_side(spark, qs):
    """Trigram construction is transform(sequence(...)) inside codegen:
    no Python UDF, no nested-loop join anywhere in the plan."""
    plan = physical_plan(qs["text_trigram_novelty"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mad_anomalies_broadcasts_medians(spark, qs):
    """Both median tables (types-sized) must broadcast back onto the
    bounded daily table."""
    df = qs["events_daily_anomalies_mad"](spark, SF)
    assert broadcast_join_count(df) >= 2


def test_active_users_explode_not_range_join(spark, qs):
    """DAU/WAU/MAU: trailing windows come from the bounded explode of
    the collapsed (user, day) table — never a per-day range join
    against raw events (no nested-loop join in the plan)."""
    plan = physical_plan(qs["events_active_users_rolling"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_cohort_ltv_partial_aggs(spark, qs):
    plan = physical_plan(qs["orders_cohort_ltv"](spark, SF))
    assert "partial_min" in plan or "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_temperature_mixture_single_scan(spark, qs):
    """One token-count agg; the 1-row total broadcasts back."""
    from dmds_spark.plans import scan_count

    df = qs["sample_temperature_mixture"](spark, SF)
    plan = physical_plan(df)
    assert scan_count(df) <= 2  # source agg + its own total re-agg
    assert "BroadcastExchange" in plan


def test_ks_drift_no_cartesian_on_data(spark, qs):
    """The only nested-loop join allowed is the broadcast grid build
    (sources x lengths, domain-bounded) — raw doc rows never cross
    join; data-sized stages are hash-partitioned aggregations."""
    plan = physical_plan(qs["profile_ks_drift"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_vocab_jaccard_distinct_before_selfjoin(spark, qs):
    """The token self-join must run on the DISTINCT (source, token)
    table (fan-out bounded by #sources) — partial aggregation present,
    never a nested-loop join."""
    plan = physical_plan(qs["text_source_vocab_jaccard"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rolling_revenue_grid_first(spark, qs):
    """Only the calendar-bounded day grid reaches the global range
    window: the day aggregate (partial-combined) precedes it."""
    plan = physical_plan(qs["orders_rolling_7d_revenue"](spark, SF))
    assert "partial_sum" in plan
    assert "RangeFrame" in plan


def test_dim_stats_single_shuffle(spark, qs):
    df = qs["embedding_dim_stats"](spark, SF)
    assert shuffle_count(df) <= 1
    assert "partial_count" in physical_plan(df)


def test_clustering_coeff_no_wedge_explosion(spark, qs):
    """Triangles come from the oriented two-join; no nested loops."""
    plan = physical_plan(qs["graph_clustering_coefficient"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_burstiness_partial_aggs(spark, qs):
    df = qs["text_term_burstiness_topk"](spark, SF)
    plan = physical_plan(df)
    assert "partial_count" in plan or "partial_sum" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort


def test_radius_count_broadcasts_probes(spark, qs):
    """The 5-probe side must broadcast; the corpus never shuffles for
    the cross pairing."""
    plan = physical_plan(qs["similarity_radius_count"](spark, SF))
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan  # JVM fold, no Python UDF


def test_streaks_window_on_user(spark, qs):
    """The islands window partitions on the high-cardinality user key
    over the collapsed (user, day) table."""
    import re

    plan = physical_plan(qs["events_activity_streaks_topk"](spark, SF))
    assert re.search(r"windowspecdefinition\(user_id#\d+L?, day#", plan)


def test_benford_single_scan(spark, qs):
    from dmds_spark.plans import scan_count

    df = qs["profile_benford_digits"](spark, SF)
    assert scan_count(df) <= 2  # digits + its own 1-row total


def test_readability_single_scan(spark, qs):
    from dmds_spark.plans import scan_count

    df = qs["text_readability_profile"](spark, SF)
    assert scan_count(df) == 1
    assert shuffle_count(df) <= 1


def test_packing_sweep_grid_broadcast(spark, qs):
    """The 3-row length grid broadcasts onto per-doc lengths — one
    scan regardless of how many lengths the sweep tries."""
    from dmds_spark.plans import scan_count

    df = qs["tokens_packing_efficiency_sweep"](spark, SF)
    plan = physical_plan(df)
    assert scan_count(df) == 1
    assert "BroadcastExchange" in plan


def test_basket_stats_copartitioned(spark, qs):
    plan = physical_plan(qs["orders_basket_size_stats"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan


def test_repeat_rate_two_aggregates(spark, qs):
    df = qs["orders_repeat_purchase_rate"](spark, SF)
    assert shuffle_count(df) <= 2
    assert "partial_count" in physical_plan(df)


def test_waterfall_single_scan(spark, qs):
    from dmds_spark.plans import scan_count

    df = qs["lineitem_revenue_waterfall"](spark, SF)
    assert scan_count(df) == 1
    assert shuffle_count(df) <= 1


def test_lsh_bucket_stats_shape(spark, qs):
    """One explode + two hash aggregates; the constant-folded
    hyperplane matrix keeps the plan free of Python eval."""
    plan = physical_plan(qs["similarity_lsh_bucket_stats"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_precision_single_lsh_pass(spark, qs):
    """Candidates are counted AND verified from ONE materialized LSH
    pass; no nested loops anywhere."""
    plan = physical_plan(qs["dedup_minhash_precision"](spark, SF))
    assert "CartesianProduct" not in plan


def test_gini_uses_distributed_rank(spark, qs):
    """The value rank must come from the range-shard machinery — never
    a single-partition ORDER BY window over the data."""
    import re

    plan = physical_plan(qs["orders_value_gini"](spark, SF))
    assert not re.search(
        r"Window .*row_number.*windowspecdefinition\(c#", plan
    )
    assert "partial_sum" in plan


def test_lang_confusion_single_scan(spark, qs):
    from dmds_spark.plans import scan_count

    df = qs["text_lang_confusion"](spark, SF)
    assert scan_count(df) == 1
    assert shuffle_count(df) <= 1


def test_hamilton_totals_exact(spark, qs):
    """Allocations must sum exactly to the target on the driver data
    (the property naive rounding breaks)."""
    rows = qs["sample_hamilton_allocation"](spark, SF).collect()
    assert sum(r["alloc"] for r in rows) == 1000
    assert all(r["alloc"] - r["base_alloc"] in (0, 1) for r in rows)


# --- round-6 pins -----------------------------------------------------------


def test_corr_components_single_scan_partial_agg(spark, qs):
    """All six correlation pairs' SS terms must come from ONE lineitem
    scan and a two-phase aggregate — a per-pair scan would read the
    100 TB fact table six times."""
    from dmds_spark.plans import scan_count

    df = qs["lineitem_corr_components"](spark, SF)
    # the one aggregate materializes at build (localCheckpoint barrier:
    # 1 row, 6 pair-row consumers), so the served plan shows 0 file
    # scans; anything >1 means a union branch re-scans the fact table
    assert scan_count(df) <= 1


def test_incremental_dedup_band_equijoin_id_only(spark, tmp_path):
    """The increment's candidate join is an equi-join on band_key
    carrying ids only — never nested-loop, and never the 512-byte
    signatures through the shuffle (they re-attach post-distinct)."""
    from dmds_spark.operators.dedup import minhash_signatures
    from dmds_spark.operators.incremental_dedup import IncrementalMinHashDedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    store = IncrementalMinHashDedup(
        spark, None, str(tmp_path / "s"), "text", "doc_id"
    )
    new_sigs = minhash_signatures(
        docs.filter(F.col("doc_id") % 2 == 1), "text", "doc_id", 16, 3
    ).localCheckpoint(eager=True)
    stored = minhash_signatures(
        docs.filter(F.col("doc_id") % 2 == 0), "text", "doc_id", 16, 3
    ).localCheckpoint(eager=True)
    df = store._increment_pairs(new_sigs, stored)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "band_key" in plan


def test_pii_counts_single_scan_partial_agg(spark, qs):
    """All four pattern counts fuse into one scan + one two-phase
    aggregate; the scan must read only (source, text)."""
    from dmds_spark.plans import scan_count

    df = qs["text_pii_counts"](spark, SF)
    assert scan_count(df) == 1
    plan = physical_plan(df)
    assert "partial_sum" in plan or "partial_count" in plan
    rs = read_schemas(df)[0]
    assert "doc_id" not in rs and "n_chars" not in rs


def test_vocab_truncation_single_type_rank(spark, qs):
    """The rank input must be TakeOrdered top-k, never a
    vocabulary-sized single-partition sort: the only Window in the
    plan runs post-limit over max(_VOCAB_SIZES) rows. The sweep over
    candidate sizes is a broadcast grid, not extra scans."""
    from dmds_spark.plans import scan_count

    df = qs["tokens_vocab_truncation_loss"](spark, SF)
    # counts materialize once behind the vocabulary-sized barrier
    # (top-k + totals consumers); >1 means a consumer re-counts the
    # token stream
    assert scan_count(df) <= 1
    assert broadcast_join_count(df) >= 1
    plan = physical_plan(df)
    # the distributed top-k (per-partition heap + k-row merge) feeds
    # the rank; without it row_number sorts the whole vocabulary
    # through one task
    assert "TakeOrderedAndProject" in plan
    # whole-node match: a WindowGroupLimit (rank-limit pushdown) or
    # other Window-prefixed node is not an extra window exchange
    import re

    assert len(re.findall(r"\bWindow\b", plan)) <= 1


def test_supplier_jaccard_broadcasts_degrees(spark, qs):
    """The degree tables join broadcast (supplier-sized); the wedge
    join stays the only data-sized shuffle pair generator."""
    df = qs["graph_supplier_jaccard"](spark, SF)
    plan = physical_plan(df)
    assert broadcast_join_count(df) >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ewma_single_window_sort(spark, qs):
    """All four lags share ONE per-customer window sort — four
    separate window exchanges would quadruple the shuffle."""
    df = qs["window_ewma_pow2"](spark, SF)
    assert shuffle_count(df) <= 2  # the window exchange (+AQE read)
    plan = physical_plan(df)
    import re

    # one logical window operator (whole-node match: WindowGroupLimit
    # and friends don't count as extra exchanges)
    assert len(re.findall(r"\bWindow\b", plan)) <= 2


def test_semdedup_blocks_on_cluster(spark, qs):
    """The SemDeDup prune must compare within cluster blocks (equi-join
    on cluster), never an all-pairs product."""
    df = qs["dedup_semdedup_prune"](spark, SF)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cluster" in plan


def test_repetition_profile_doc_keyed_shuffles(spark, qs):
    """Both trigram collapses key on doc_id (high-cardinality, no skew
    pole); the per-source rollup is the only small aggregate."""
    df = qs["text_repetition_profile"](spark, SF)
    plan = physical_plan(df)
    assert "partial_count" in plan or "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_khop_no_data_sized_nested_loop(spark, qs):
    """The only nested-loop allowed is the 1-row seed broadcast; hop
    expansion must be equi-joins on the edge keys."""
    df = qs["graph_khop_reachability"](spark, SF)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # hop joins are hash equi-joins on c/s
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan \
        or "ShuffledHashJoin" in plan


def test_span_queries_no_nested_loop(spark, qs):
    """All four span-dedup queries: gram/doc-keyed equi-joins only —
    an accidental broadcast-nested-loop over the token-stream-sized
    gram table would be the 100 TB killer."""
    for name in (
        "dedup_repeated_ngram_spans",
        "dedup_duplicated_span_fraction",
        "dedup_doc_dup_span_topk",
        "dedup_span_coverage",
    ):
        plan = physical_plan(qs[name](spark, SF))
        assert "NestedLoop" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_token_rarity_joins_rare_set_only(spark, qs):
    """The token-keyed join must be against the filtered RARE set (the
    count<=2 filter sits under the join), not the full frequency
    table — the filter is what removes the common-word skew pole."""
    df = qs["text_token_rarity_score"](spark, SF)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan
    # the rare-set filter (c <= 2) appears below the join
    assert "<= 2" in plan


def test_interval_overlap_query_hash_join(spark, qs):
    df = qs["join_interval_overlap"](spark, SF)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan
    assert "__bin" in plan


def test_cardinality_report_single_scan(spark, qs):
    """Three profiled columns must come from ONE stacked scan of
    orders, not one scan per column."""
    df = qs["profile_cardinality_report"](spark, SF)
    assert scan_count(df) == 1


def test_tv_distance_broadcasts_totals(spark, qs):
    """Per-source totals are |sources|-sized: every totals join must
    broadcast; the only big shuffles key on (source, token)."""
    df = qs["text_source_tv_distance"](spark, SF)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_transition_lift_broadcasts_marginals(spark, qs):
    df = qs["events_transition_lift"](spark, SF)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "NestedLoop" not in plan or "BuildRight" in plan


def test_outlier_iqr_broadcasts_quartiles(spark, qs):
    """The per-group quartile table is group-count-sized and must
    broadcast back onto the scan."""
    df = qs["profile_outlier_iqr"](spark, SF)
    assert "BroadcastHashJoin" in physical_plan(df)


def test_recall_report_truth_is_equijoin(spark, qs):
    """The exact-truth side must reach pairs through the shingle
    inverted index (equi-join on the shingle), never an all-pairs
    product over documents."""
    df = qs["dedup_minhash_recall_report"](spark, SF)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skew_advisor_is_two_aggregates(spark, qs):
    """One key aggregate + one scalar total + a broadcast back: the
    advisor must stay metadata-cheap (it runs BEFORE the big job)."""
    df = qs["profile_join_skew_advisor"](spark, SF)
    assert scan_count(df) <= 2  # key agg + total reuse the same scan
    assert "NestedLoop" not in physical_plan(df) or "Broadcast" in physical_plan(df)


def test_bm25_takeordered_topk(spark, qs):
    """The BM25 final top-k must be a distributed TakeOrdered, and the
    only Window in the plan runs over the k survivors — never a
    corpus-sized single-partition rank sort. df and corpus totals are
    broadcast back onto the tf stream."""
    import re

    df = qs["text_bm25_topk"](spark, SF)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert len(re.findall(r"\bWindow\b", plan)) <= 1
    assert broadcast_join_count(df) >= 2
    assert "CartesianProduct" not in plan


def test_sft_pack_no_window(spark, qs):
    """Packing orders turns via array_sort inside ONE conv_id
    aggregate — no per-turn window exchange, one data-sized shuffle."""
    df = qs["sft_pack_conversations"](spark, SF)
    plan = physical_plan(df)
    assert "Window" not in plan
    assert shuffle_count(df) <= 2  # the conv_id agg exchange (+AQE)


def test_sft_family_single_window(spark, qs):
    """Each per-turn SFT operator is one conv_id-partitioned window
    over one scan — a second exchange means the window and groupBy
    stopped sharing the partitioning."""
    import re

    for name in ("sft_role_alternation", "sft_truncate_to_budget",
                 "sft_loss_mask_spans"):
        df = qs[name](spark, SF)
        plan = physical_plan(df)
        assert len(re.findall(r"\bWindow\b", plan)) <= 1, name
        assert scan_count(df) == 1, name
        assert shuffle_count(df) <= 2, name


def test_leakage_split_single_shuffle(spark, qs):
    """The representative window is the only shuffle: the split itself
    is a projection on top (no second exchange, no join)."""
    df = qs["sample_split_leakage_safe"](spark, SF)
    assert shuffle_count(df) <= 2
    assert scan_count(df) == 1


def test_preference_pairs_one_exchange(spark, qs):
    """Both rank windows and the pair aggregate share the conv_id
    partitioning — one data-sized exchange, one scan, no join."""
    df = qs["sft_preference_pairs"](spark, SF)
    plan = physical_plan(df)
    assert scan_count(df) == 1
    assert shuffle_count(df) <= 2
    assert "Join" not in plan


def test_reply_dedup_single_agg(spark, qs):
    """Keep-first is a MIN inside the md5 groupBy: no window, no
    second pass over the replies."""
    df = qs["sft_reply_dedup"](spark, SF)
    plan = physical_plan(df)
    assert "Window" not in plan
    assert scan_count(df) == 1
    assert shuffle_count(df) <= 2


def test_decontaminate_convs_broadcast_probe(spark, qs):
    """The benchmark shingle set broadcasts onto the corpus shingle
    stream; the corpus side never shuffles for the probe."""
    df = qs["sft_decontaminate_convs"](spark, SF)
    plan = physical_plan(df)
    assert broadcast_join_count(df) >= 1
    assert "CartesianProduct" not in plan


def test_epoch_plan_broadcast_totals(spark, qs):
    """The 1-row totals frame joins broadcast; nothing data-sized
    shuffles twice (source agg + tiny re-agg only)."""
    df = qs["tokens_epoch_plan"](spark, SF)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_epoch_shuffle_order_no_global_window(spark, qs):
    """Per-epoch position comes from the range-partitioned
    global_row_number: every Window in the plan is partitioned by the
    pinned shard id, never a single-partition rank over the corpus."""
    import re

    df = qs["tokens_epoch_shuffle_order"](spark, SF)
    plan = physical_plan(df)
    n_windows = len(re.findall(r"\bWindow\b", plan))
    n_pid_windows = len(
        re.findall(r"windowspecdefinition\(__pid#", plan)
    )
    assert n_windows == n_pid_windows


def test_ntile_curriculum_no_per_source_sort_task(spark, qs):
    """The NTILE comes from the closed form over the sharded rank plus
    a broadcast per-source count — acceptable plans are the small-input
    fast path (plain (source) window at test scale) or the sharded
    ((source, __pid)) window; either way counts broadcast and there is
    no second data-sized exchange beyond the rank's."""
    df = qs["sample_ntile_curriculum"](spark, SF)
    plan = physical_plan(df)
    assert broadcast_join_count(df) >= 1
    assert "CartesianProduct" not in plan
    assert scan_count(df) <= 2  # rank input + per-source counts


def test_regression_trend_no_window_no_join(spark, qs):
    """Two stacked aggregates (daily rollup, moment sums) on one scan:
    the regression never windows or joins."""
    df = qs["events_regression_trend"](spark, SF)
    plan = physical_plan(df)
    assert "Window" not in plan
    assert "Join" not in plan
    assert scan_count(df) == 1


def test_interp_linear_one_fill_exchange(spark, qs):
    """Both fill windows (backward LAST, forward FIRST) share the
    (event_type, hw) ordering — one exchange feeds them; the grid side
    broadcasts its bounds and the hourly join is the only data-sized
    shuffle pair."""
    import re

    df = qs["timeseries_interp_linear"](spark, SF)
    plan = physical_plan(df)
    assert len(re.findall(r"\bWindow\b", plan)) <= 2
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) <= 4  # hourly agg + grid/hourly join + fill


def test_sft_pipeline_broadcasts_and_no_global_sort(spark, qs):
    """The composite's eval gram set broadcasts; the anti-joins and the
    pack/representative stages never sort the corpus globally (no
    partition-less Window, no CartesianProduct)."""
    import re

    df = qs["pipeline_sft_corpus"](spark, SF)
    plan = physical_plan(df)
    assert broadcast_join_count(df) >= 1
    assert "CartesianProduct" not in plan
    # every window is keyed (conv_id / packed_md5) — a partition-less
    # windowspecdefinition() starts with the ordering spec directly
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert not spec.lstrip().startswith("turn#"), spec


def test_schema_drift_single_scan(spark, qs):
    """All columns' profiles aggregate in ONE pass over ONE scan (the
    per-column-union form read the corpus once per column); no join,
    no window."""
    df = qs["profile_schema_drift"](spark, SF)
    plan = physical_plan(df)
    assert "Window" not in plan
    assert "Join" not in plan
    assert scan_count(df) == 1


def test_sft_sequence_packing_keyed_windows_only(spark, qs):
    """The packing cumsum is split-keyed (sharded or small-input plain
    form) — never a partition-less window over the corpus."""
    import re

    df = qs["sft_pack_training_sequences"](spark, SF)
    plan = physical_plan(df)
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        # a partition-less window's spec STARTS with an ordering entry
        # (carries ASC/DESC); keyed windows lead with bare partition
        # columns
        head = spec.split(",")[0]
        assert " ASC" not in head and " DESC" not in head, spec
    assert "CartesianProduct" not in plan


def test_asof_nearest_no_theta_join(spark, qs):
    """Both directions are union+keyed-window as-of passes; the only
    join is the event_id hash join comparing distances — no
    theta/nested-loop pair generator anywhere."""
    df = qs["join_asof_nearest"](spark, SF)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        head = spec.split(",")[0]
        assert " ASC" not in head and " DESC" not in head, spec


def test_temporal_split_projection_only(spark, qs):
    """The bounds row broadcasts; the split is a projection — no
    data-sized shuffle, one scan pair (events + bounds agg)."""
    df = qs["sample_split_temporal"](spark, SF)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert scan_count(df) <= 2


# ---------------------------------------------------------------------------
# round-10 additions: web curation, calibration, Lloyd step
# ---------------------------------------------------------------------------

_R10_KEYS = [
    "web_url_canonicalize", "web_domain_stats", "web_blocklist_filter",
    "web_line_boilerplate_topk", "web_line_dedup_rewrite",
    "agg_kmv_distinct_calibration", "sample_dsir_importance",
    "events_ohlc_downsample", "pipeline_attrition_report",
    "embedding_kmeans_lloyd_step",
]


def test_round10_no_python_udfs(spark, qs):
    """The whole round-10 batch is codegen-side: regexp/array/agg
    expressions only — no row-at-a-time Python, no Arrow eval nodes
    (there is nothing here a built-in can't express)."""
    for k in _R10_KEYS:
        plan = physical_plan(qs[k](spark, SF))
        assert "BatchEvalPython" not in plan, k
        assert "ArrowEvalPython" not in plan, k
        assert "MapInPandas" not in plan, k


def test_url_canonicalize_scan_shaped(spark, qs):
    """Canonicalize + URL dedup = one projection + one hash aggregate:
    a single exchange, no join anywhere."""
    df = qs["web_url_canonicalize"](spark, SF)
    plan = physical_plan(df)
    assert shuffle_count(df) == 1
    assert "Join" not in plan


def test_blocklist_filter_is_pure_scan_filter(spark, qs):
    """The literal blocklist stays a scan-side filter (IN + endswith):
    no join node; one exchange for the per-source rollup."""
    df = qs["web_blocklist_filter"](spark, SF)
    plan = physical_plan(df)
    assert "Join" not in plan
    assert shuffle_count(df) == 1


def test_line_boilerplate_topk_take_ordered(spark, qs):
    """Top-k boilerplate lines must be TakeOrderedAndProject over the
    (source, line) aggregate — never a full global sort."""
    plan = physical_plan(qs["web_line_boilerplate_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_line_dedup_rewrite_no_pair_blowup(spark, qs):
    """The rewrite joins line stats back onto the line stream on the
    full (source, line) key — an equi-join, never a nested-loop or
    cartesian pair generator."""
    plan = physical_plan(qs["web_line_dedup_rewrite"](spark, SF))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_bucket_stats_broadcast(spark, qs):
    """The 256-row bucket table must BROADCAST back onto the token
    stream — shuffling the token stream to join 256 rows would be the
    classic small-dim mistake."""
    df = qs["sample_dsir_importance"](spark, SF)
    assert broadcast_join_count(df) >= 1
    assert "SortMergeJoin" not in physical_plan(df)


def test_kmv_partial_distinct_before_exchange(spark, qs):
    """The bigram DISTINCT must run partially map-side (HashAggregate
    before the exchange) so the shuffle carries the per-partition
    distinct set, not the raw token stream."""
    df = qs["agg_kmv_distinct_calibration"](spark, SF)
    plan = physical_plan(df)
    assert "Join" not in plan
    assert shuffle_count(df) <= 3


def test_ohlc_single_aggregate(spark, qs):
    """OHLC bars are ONE hash aggregate with map-side partials
    (min/max/min_by/max_by all combine): one exchange, no window, no
    join."""
    df = qs["events_ohlc_downsample"](spark, SF)
    plan = physical_plan(df)
    assert shuffle_count(df) == 1
    assert "Window" not in plan
    assert "Join" not in plan
    assert "partial_min" in plan or "partial_max" in plan


def test_attrition_keyed_window_only(spark, qs):
    """The exact-dup rule's window is keyed by the text digest — never
    a partition-less global window."""
    import re

    plan = physical_plan(qs["pipeline_attrition_report"](spark, SF))
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        head = spec.split(",")[0]
        assert " ASC" not in head and " DESC" not in head, spec


def test_lloyd_broadcasts_centroids(spark, qs):
    """The assign stage is embeddings x k with the k centroids
    BROADCAST (nested-loop over a k-row build side is the right
    plan); the big side must never shuffle for the cross join."""
    plan = physical_plan(qs["embedding_kmeans_lloyd_step"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_dsir_resample_is_filter_on_importance_plan(spark, qs):
    """The accept test is a codegen filter on the importance pipeline:
    still exactly one broadcast (the 256-row bucket table), no extra
    exchange, no Python eval."""
    df = qs["sample_dsir_resample"](spark, SF)
    plan = physical_plan(df)
    assert broadcast_join_count(df) >= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    base = qs["sample_dsir_importance"](spark, SF)
    assert shuffle_count(df) == shuffle_count(base)


def test_jl_projection_broadcasts_j_range(spark, qs):
    """The 16-row j range broadcasts onto the exploded dims — the big
    side never shuffles for the cross join."""
    plan = physical_plan(qs["embedding_jl_projection_calibration"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_k_anonymity_two_aggregates_no_join(spark, qs):
    df = qs["profile_k_anonymity"](spark, SF)
    plan = physical_plan(df)
    assert "Join" not in plan
    assert shuffle_count(df) == 2


def test_entity_resolution_blocked_equi_join(spark, qs):
    """The ER pair generator must be an equi-join on the full blocking
    key — never a nested-loop/cartesian all-pairs."""
    plan = physical_plan(qs["entity_resolution_pairs"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snaive_backtest_keyed_window(spark, qs):
    """The lag window is keyed by event_type; the bounds row
    broadcasts; the event stream is scanned for the daily counts and
    the bounds only."""
    import re

    df = qs["timeseries_backtest_snaive"](spark, SF)
    plan = physical_plan(df)
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        head = spec.split(",")[0]
        assert " ASC" not in head and " DESC" not in head, spec
    assert "CartesianProduct" not in plan


def test_contrastive_negatives_single_hash_join(spark, qs):
    """Candidates join back to the corpus on neg_id as a hash join;
    the k-row j range broadcasts."""
    plan = physical_plan(qs["sample_contrastive_negatives"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_hard_negatives_bucket_join_only(spark, qs):
    """The hard-negative pair generator joins ON THE BUCKET (hash or
    sort-merge equi-join); the top-1 is a keyed window. No cartesian
    pair generator anywhere."""
    import re

    plan = physical_plan(qs["similarity_hard_negatives"](spark, SF))
    assert "CartesianProduct" not in plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        head = spec.split(",")[0]
        assert " ASC" not in head and " DESC" not in head, spec


def test_snapshot_diff_digest_join(spark, qs):
    """The diff joins 32-byte digests, full-outer on the id — never a
    nested loop; the status rollup adds one exchange."""
    plan = physical_plan(qs["profile_snapshot_diff"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_semantic_decontaminate_bucket_join(spark, qs):
    """The corpus x eval pair generator is an equi-join on the LSH
    bucket — never corpus x eval all-pairs; the threshold test is a
    codegen filter (no Python eval)."""
    plan = physical_plan(qs["similarity_semantic_decontaminate"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kfold_assign_scan_shaped(spark, qs):
    """Fold assignment is a scan projection; the only exchanges serve
    the 5-group balance report (count-distinct expand included). No
    join anywhere."""
    df = qs["sample_kfold_assign"](spark, SF)
    plan = physical_plan(df)
    assert "Join" not in plan
    assert shuffle_count(df) <= 2


def test_softdedup_weights_no_all_pairs(spark, qs):
    """The weight table rides the banded candidate join + min-label
    propagation — no cartesian/nested-loop pair generator; the size
    join is a self equi-join on cluster_id."""
    plan = physical_plan(qs["sample_softdedup_weights"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_html_extract_is_single_projection(spark, qs):
    """The whole HTML->text extractor must fuse into the scan
    projection: zero exchanges, zero Python (a UDF here would cap the
    ingest chain at Python speed on 100 TB of crawl bytes)."""
    df = qs["web_html_extract"](spark, SF)
    plan = physical_plan(df)
    assert shuffle_count(df) == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_web_ingest_two_aggregates_no_join(spark, qs):
    """html->extract->canonicalize fuse into the scan; then exactly two
    hash aggregates (canon_url dedup, domain rollup) and NO join — the
    keeper's stats ride along via min_by."""
    df = qs["pipeline_web_ingest"](spark, SF)
    plan = physical_plan(df)
    assert shuffle_count(df) == 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_kmeans_assign_broadcasts_centers(spark, qs):
    """Both Lloyd rounds must broadcast the k centers — a shuffle of
    the embeddings side per round would dominate at scale."""
    plan = physical_plan(qs["embedding_kmeans_assign"](spark, SF))
    assert plan.count("BroadcastNestedLoopJoin") + plan.count(
        "BroadcastExchange"
    ) >= 2


def test_kmeans_assign_seed_is_take_ordered(spark, qs):
    """The k-means seed draw must be TakeOrderedAndProject (per-
    partition top-8 heap + driver merge) — round 12's verdict found the
    seed computed via a corpus-wide single-partition row_number window,
    one task sorting every vector at 100 TB. The one unpartitioned
    window that remains is the cid renumbering over the ALREADY LIMITED
    <=8 seed rows."""
    df = qs["embedding_kmeans_assign"](spark, SF)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert unpartitioned_window_count(df) == 1


# Every query whose plan legitimately carries an unpartitioned Window
# exec, with the bound that keeps its single sort task small FOREVER
# (not just at test SF). Anything else with an unpartitioned window
# fails the sweep below — the "W.orderBy trap" becomes unlandable.
UNPARTITIONED_WINDOW_OK = {
    # post-limit top-k grains: the window input is k rows by plan shape
    "embedding_kmeans_assign": "cid renumber over <=8 seed rows post-TakeOrdered",
    # (the PQ queries left this list in the r15 optimization round:
    # codebooks collect their bounded seeds, so no window remains)
    "text_zipf_topk": "rank over the already-limited top-50 tokens",
    "tokens_vocab_truncation_loss": "rank over TakeOrdered top-N vocab rows",
    "text_bm25_topk": "rank over the TakeOrdered top-k survivors",
    "retrieval_bm25_incremental": "rank over the TakeOrdered top-k survivors",
    # calendar-bounded grids: thousands of rows off any corpus size
    "orders_rolling_7d_revenue": "trailing-7d window over the day grid",
    "orders_seasonality_decomposition": "12-month MA over the month grid",
    # strata/bucket tables: input is #groups rows after a full aggregate
    "sample_hamilton_allocation": "remainder ranks over the #strata table",
    "sample_neyman_allocation": "allocation windows over the #sources table",
    "text_vocab_growth": "cumsum over exactly 10 decile-bucket rows",
    # ppm score grids: distinct scores <= 1e6+1 by construction
    "eval_auc_rank_sum": "rank-sum over the distinct-ppm score grid",
    "eval_pr_curve": "cum TP/FP over the distinct-ppm score grid",
    "eval_lift_gains": "cum counts over the distinct-ppm score grid",
    "eval_conformal_coverage": (
        "cum counts over the distinct-|residual| cents grid (bounded "
        "by the value range, ~50k rows at any corpus size)"
    ),
    "orders_theilsen_trend": (
        "cum counts over the distinct-slope grid (bounded by the "
        "calendar pair count, < 700k for a century of days)"
    ),
    "events_cusum_changepoint": "running sum over the calendar day grid",
    "events_mannwhitney_u": (
        "cum counts over the distinct-cents histogram (bounded by the "
        "value range)"
    ),
    "events_kruskal_wallis": (
        "cum counts over the distinct-cents histogram (bounded by the "
        "value range)"
    ),
    "orders_spearman_daily": (
        "two rank histograms over the calendar day grid (~2.4k rows)"
    ),
    "events_wilcoxon_signed_rank": (
        "cum counts over the distinct-|diff| histogram (bounded by "
        "the day-pair count, ~90 rows)"
    ),
    "events_runs_test": "lag window over the calendar day grid",
    "retrieval_rrf_fusion": (
        "rank windows over the two TakeOrdered top-100 lists"
    ),
    # distinct-seconds histogram: <= attribution-horizon seconds rows
    "events_time_to_convert": "cum counts over the distinct-seconds grid",
    # size-gated dispatch: plain window only below ONE scan shard
    # (128 MiB); above it the sharded two-level cumsum kicks in
    # (operators/relational.py global_row_number small-input fast path)
    "suppliers_pareto_class": "small-input fast path; sharded above 128 MiB",
}


def test_no_unpartitioned_windows_outside_allowlist(spark, qs):
    """Registry-wide sweep: NO query may carry an unpartitioned Window
    exec unless it is allowlisted above with its bound stated. This is
    the tested form of the per-docstring claims — a new corpus-sized
    W.orderBy(...) window (one task sorts the corpus) fails here at
    plan-build time, before it ever reaches a cluster."""
    offenders = {}
    stale = set(UNPARTITIONED_WINDOW_OK) - set(qs)
    assert not stale, f"allowlist names unknown queries: {sorted(stale)}"
    for name, fn in qs.items():
        df = fn(spark, SF)
        c = unpartitioned_window_count(df)
        if c and name not in UNPARTITIONED_WINDOW_OK:
            offenders[name] = c
    assert not offenders, (
        "unpartitioned Window execs outside the allowlist (single-task "
        f"sort of the whole input at scale): {offenders}"
    )


# Every query whose optimized plan legitimately carries an
# UNCONDITIONAL broadcast hint on a subtree that reaches an
# SF-proportional parquet scan without an Aggregate/Limit reducer,
# with the bound that keeps the broadcast side small FOREVER stated.
# Everything here is a key-equality/isin FILTER bound the plan-tree
# detector cannot see as a reducer (filters are proportional in
# general; these ones select a constant id set). Anything else fails
# the sweep below — a hard F.broadcast(customer/part/...) on a raw
# SF-proportional scan (round 13's verdict found three) can no longer
# land.
FORCED_BROADCAST_OK = {
    # single query vector / constant probe batch: vec_id point filters
    "similarity_cosine_topk": "query side is vec_id = 0 (1 row)",
    "similarity_mips_topk": "query side is a fixed <=8-id isin probe set",
    "similarity_knn_batch": "probe batch is a fixed <=16-id isin set",
    "similarity_ann_lsh_topk": "query side is a point vec_id filter",
    "similarity_radius_count": "probe side is 5 fixed vec_ids",
    "similarity_quantized_rerank_topk": "query + rerank probes: fixed id sets",
    "similarity_ivf_topk": "query vector + probed-cell centroid rows (<=nprobe)",
    "similarity_ivf_probe_sweep": "one query vector joined per nprobe grid value",
    "similarity_ivf_search_batch": "probe batch is a fixed <=16-id isin set",
    "similarity_pq_adc_topk": "query side is a point vec_id filter",
    "similarity_ivfadc_topk": "query vector + <=nprobe probed-cell rows",
    "rollup_incremental_ivfadc": (
        "query batch is vec_id < 3 (3 rows) + its <=nprobe cells/tables"
    ),
    "embedding_truncation_recall": "20-query sample: fixed isin id set",
    "retrieval_rrf_fusion": "vector-list query side is vec_id = 0 (1 row)",
    # k-seed selection by key filter: vec_id < K rows exactly
    "embedding_kmeans_lloyd_step": "centroid side is vec_id < K (K=8 rows)",
    # documented deliberate broadcast with the 100 TB alternative stated
    "dedup_cross_source_overlap": (
        "(doc_id, source) projection broadcast to avoid re-executing the "
        "LSH pair pipeline (docstring: checkpoint barrier + shuffle joins "
        "once the id->source map outgrows a broadcast)"
    ),
}


def test_no_forced_broadcast_of_sf_tables_outside_allowlist(
    spark, qs, monkeypatch
):
    """Registry-wide sweep: with the maybe_broadcast size gate disabled
    (so gated hints vanish), NO query may carry an unconditional
    broadcast hint whose side reaches an SF-proportional parquet scan
    without a cardinality reducer — unless allowlisted above with its
    bound stated. This is the tested form of core/engine.py's rule
    ("use maybe_broadcast for every SF-proportional dimension"): a
    forced F.broadcast(customer) is an OOM at 100 TB regardless of how
    green it is at test SF."""
    from dmds_spark.plans import forced_broadcast_base_scans

    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_MAX_BYTES", "-1")
    stale = set(FORCED_BROADCAST_OK) - set(qs)
    assert not stale, f"allowlist names unknown queries: {sorted(stale)}"
    offenders = {}
    for name, fn in qs.items():
        hits = forced_broadcast_base_scans(fn(spark, SF))
        if hits and name not in FORCED_BROADCAST_OK:
            offenders[name] = hits
    assert not offenders, (
        "unconditional broadcast hints on SF-proportional base scans "
        f"(forced OOM at 100 TB): {offenders}"
    )
