"""Physical-plan audits: the 100 TB story is only real if the plans show it.

These tests pin the plan shapes that matter at scale — broadcast joins for
dimensions, predicate pushdown and column pruning at the parquet scan,
top-k without a global sort, no cartesian products where an equi-join is
intended. A regression here is a performance bug even when results stay
correct.
"""

from __future__ import annotations

import pytest

from allora_indexer_spark.registry import all_queries

QUERIES = all_queries()


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q02_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(QUERIES["q02_revenue_by_nation"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the only non-broadcast join is lineitem⋈orders on orderkey
    assert plan.count("SortMergeJoin") <= 1


def test_q06_pushes_predicates_to_scan(spark, sf_dir):
    plan = plan_of(QUERIES["q06_revenue_filter"].fn(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q01_prunes_columns(spark, sf_dir):
    plan = plan_of(QUERIES["q01_pricing_summary"].fn(spark, sf_dir))
    # ReadSchema must not include unused columns like l_orderkey/l_partkey
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_returnflag" in read_schema
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema


def test_q24_topk_avoids_global_sort(spark, sf_dir):
    plan = plan_of(QUERIES["q24_global_topk_orders"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q23_range_join_stays_hash_join(spark, sf_dir):
    plan = plan_of(QUERIES["q23_range_join_ship_lag"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q41_lsh_join_is_equi_join(spark, sf_dir):
    """The LSH candidate join must hash-partition on the band key, never
    fall back to the oracle's OR-condition nested loop."""
    plan = plan_of(QUERIES["q41_minhash_lsh_dedup"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q51_corpus_is_not_shuffled(spark, sf_dir):
    """Brute-force knn: query set broadcast, corpus scanned in place."""
    plan = plan_of(QUERIES["q51_knn_bruteforce"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q99zw_semdedup_pair_join_is_cell_bounded(spark, sf_dir):
    """SemDeDup's intra-cell pair join must hash/sort-merge on the cell
    key (quadratic only WITHIN a cell) — never the all-pairs nested loop
    the inequality condition could tempt the planner into."""
    plan = plan_of(
        QUERIES["q99zw_semdedup_embedding_dedup"].fn(spark, sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_on_hot_paths(spark, sf_dir):
    # AQE wraps plans in AdaptiveSparkPlan(isFinalPlan=false) before execution,
    # hiding codegen annotation — turn it off just for this inspection.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("q01_pricing_summary", "q30_token_stats"):
            plan = plan_of(QUERIES[name].fn(spark, sf_dir))
            # formatted mode marks whole-stage-codegen stages as
            # "[codegen id : N]" on each participating operator
            assert "codegen id" in plan, f"{name} fell out of codegen"
            assert "partial_" in plan or "HashAggregate" not in plan, (
                f"{name} lost map-side partial aggregation"
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both fact tables on the join key pre-partitions the join:
    the plan must contain no Exchange between the scans and the join — the
    co-located-join strategy for repeated fact-fact joins at scale."""
    from pyspark.sql import functions as F

    wh = str(tmp_path / "bucketed_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed LOCATION '{wh}'")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey") \
        .saveAsTable("bucketed.lineitem_b")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey") \
        .saveAsTable("bucketed.orders_b")
    joined = spark.table("bucketed.lineitem_b").join(
        spark.table("bucketed.orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(joined)
        # a bare bucketed join needs ZERO exchanges — both sides are
        # pre-partitioned (and pre-sorted) on the join key by bucketing
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # sanity: same row count as the plain parquet join
        assert joined.count() == li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32*1024*1024))
        spark.sql("DROP TABLE IF EXISTS bucketed.lineitem_b")
        spark.sql("DROP TABLE IF EXISTS bucketed.orders_b")


def test_unpivot_is_single_scan_expand(spark, sf_dir):
    """q47's wide→long must be an Expand over ONE scan of lineitem — not the
    oracle's 4-scan UNION ALL — and the aggregation must still be partial
    (map-side combine before the shuffle)."""
    plan = plan_of(QUERIES["q47_unpivot_charges"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]  # formatted mode repeats nodes in detail blocks
    assert "Expand" in tree
    assert tree.count("Scan parquet") == 1, "unpivot re-scanned the fact table"
    assert "partial" in plan.lower()


def test_grouping_sets_single_exchange(spark, sf_dir):
    """q46's three grouping sets must share one shuffle (Expand + single
    Exchange), not one aggregation pass per set."""
    plan = plan_of(QUERIES["q46_grouping_sets"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "Expand" in tree
    assert tree.count("Exchange") == 1  # one shuffle for all three grains
    assert tree.count("Scan parquet") == 1


def test_posexplode_aggregates_partially(spark, sf_dir):
    """q54's explode→agg must keep a partial_ aggregation below the
    Exchange so the shuffle carries <=64 rows per task, not rows×dim."""
    plan = plan_of(QUERIES["q54_embedding_dimension_stats"].fn(spark, sf_dir))
    assert "Generate" in plan
    assert "partial" in plan.lower()


def test_aqe_splits_skewed_join(spark, tmp_path):
    """AQE skew-join handling: a join where one key holds ~90% of the rows
    must show skew=true partitions in the final adaptive plan once the
    skew thresholds are crossed — the runtime answer to hot topic_ids that
    q45 solves statically with salting."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        joined = left.join(right, "k")
        # collect() drives THIS DataFrame's QueryExecution to completion so
        # its executedPlan is the FINAL adaptive plan (count() would plan a
        # separate aggregate query and leave this one unexecuted)
        assert len(joined.collect()) == 400_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not mark the skewed join side"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_gap_detection_avoids_global_data_sort(spark, sf_dir):
    """q67: the data-sized window must hash-partition on the range bucket;
    only the O(#buckets) summary window may be a single partition."""
    plan = plan_of(QUERIES["q67_sequence_gaps"].fn(spark, sf_dir))
    assert plan.count("Exchange SinglePartition") <= 1
    assert "hashpartitioning(b#" in plan or "hashpartitioning(b " in plan


def test_twa_window_is_partitioned(spark, sf_dir):
    """q66: LEAD runs under a user_id-partitioned window — no global sort."""
    plan = plan_of(QUERIES["q66_time_weighted_avg"].fn(spark, sf_dir))
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(user_id" in plan


def test_q72_tfidf_df_count_is_skew_safe(spark, sf_dir):
    # doc_freq must be a partial-aggregating groupBy on token joined back
    # — NOT a token-partitioned window, which would sort a stopword's
    # entire (doc, token) set in one partition. The only Window left is
    # the per-document top-5.
    plan = plan_of(QUERIES["q72_tfidf_top_terms"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    # "Window (" counts only true Window nodes, not WindowGroupLimit
    assert tree.count("Window (") == 1
    assert "partial_count" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q77_mode_uses_window_group_limit(spark, sf_dir):
    # rank<=1 must be pushed below the window sort (WindowGroupLimit), so
    # only per-group heads survive the shuffle-side sort.
    plan = plan_of(QUERIES["q77_modal_event_type"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "WindowGroupLimit" in tree


def test_q76_scrub_is_scan_only_codegen(spark, sf_dir):
    # regex normalization is per-row JVM work: no exchange, whole-stage
    # codegen from scan to project.
    plan = plan_of(QUERIES["q76_stopword_scrub"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "WholeStageCodegen" in plan or "* Project" in tree


def test_q70_aggregates_before_full_outer_join(spark, sf_dir):
    # both sides must reduce to the nation grain before the full-outer
    # join: every scan feeds a HashAggregate below the join node.
    plan = plan_of(QUERIES["q70_full_outer_nation_activity"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    join_line = next(
        line for line in tree.splitlines() if "Join FullOuter" in line
    )
    assert join_line  # full-outer is actually planned
    assert tree.count("HashAggregate") >= 4  # partial+final on both sides


def test_q78_decontamination_broadcasts_heldout(spark, sf_dir):
    # the heldout shingle set must broadcast; the training corpus side is
    # never shuffled for the contamination probe.
    plan = plan_of(QUERIES["q78_decontaminate"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree


def test_q79_quota_cap_uses_window_group_limit(spark, sf_dir):
    # per-source cap must prune to K rows per group before the sort.
    plan = plan_of(QUERIES["q79_source_quota_cap"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan.split("\n\n")[0]


def test_q86_lm_aggregated_before_join(spark, sf_dir):
    # the LM must collapse to vocab^2-bounded counts BEFORE joining the
    # corpus-sized doc-gram stream, and the final doc mean must have
    # map-side partials; a plan that joins raw grams to raw grams would
    # square the corpus.
    plan = plan_of(QUERIES["q86_bigram_lm_doc_score"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree and "BroadcastNestedLoopJoin" not in tree
    join_pos = max(tree.find("SortMergeJoin"), tree.find("BroadcastHashJoin"))
    assert join_pos != -1
    # the join's build side contains the aggregated LM (HashAggregate below)
    assert tree.count("HashAggregate") >= 4  # LM partial+final, doc partial+final


def test_q89_centroids_partial_agg_under_explode(spark, sf_dir):
    # posexplode must stream map-side with partial aggregation collapsing
    # each partition to labels x dims rows before the single Exchange.
    plan = plan_of(QUERIES["q89_label_centroids"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert "partial" in plan  # partial aggregation present


def test_q90_waveform_keeps_samples_in_arrays(spark, sf_dir):
    # the per-sample math must stay inside the array column: the only
    # Generate is the window explode, there is no shuffle at all, and no
    # per-sample rows ever exist.
    plan = plan_of(QUERIES["q90_waveform_window_stats"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Generate") == 1
    assert "Exchange" not in tree


def test_q91_correlation_single_aggregate(spark, sf_dir):
    # five moment sums in ONE hash aggregate with map-side partials — no
    # window, no join, one shuffle on the group key.
    plan = plan_of(QUERIES["q91_value_time_correlation"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert "Join" not in tree and "Window" not in tree


def test_q95_packing_two_level_cumsum_bounded_partitions(spark, sf_dir):
    # the prefix sum must be two-level: an intra-bucket window on
    # (source, bk) — partitions bounded by the bucket width, never by a
    # source's corpus share — plus a bucket-offset window over one
    # aggregate row per bucket. A single Window partitioned on source
    # alone is the straggler shape this replaced.
    plan = plan_of(QUERIES["q95_sequence_packing"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Window (") == 2
    assert "partial_sum" in plan  # bucket sums combine map-side
    assert "[source" not in _window_specs_without_bk(plan), (
        "a Window partitions on source without the bucket key"
    )


def _window_specs_without_bk(plan: str) -> str:
    # window spec lines that mention a bare source partition (no bk)
    return "\n".join(
        line
        for line in plan.splitlines()
        if "windowspecdefinition(source" in line and "bk" not in line
    )


def test_q41_digest_pass_not_duplicated(spark, sf_dir):
    # the md5-per-shingle digest pipeline is the dominant cost: it must
    # run ONCE, not once per join side — ZERO md5 sites may remain in
    # the outer plan. Round-16 shape: the band self-join runs over SLIM
    # checkpointed band rows (one LogicalRDD, both sides) and the
    # shingle arrays join back from a separate checkpointed (doc_id, s)
    # frame for both pair sides — 4 LogicalRDD references total, and
    # the band-hash exchange no longer carries shingle arrays at all.
    df = QUERIES["q41_minhash_lsh_dedup"].fn(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("md5") == 0
    assert optimized.count("LogicalRDD") == 4  # slim bands x2 + s x2

    from allora_indexer_spark.operators.dedup import banded_signatures
    from allora_indexer_spark.tables import load_table

    producer = banded_signatures(load_table(spark, sf_dir, "documents"))
    popt = producer._jdf.queryExecution().optimizedPlan().toString()
    assert popt.count("md5") == 3


def test_q61_q94_decode_is_one_python_stage(spark, sf_dir):
    # each codec round trip is a single Arrow-batched Python stage over
    # the scan — no shuffle, no second Python boundary.
    for name in ("q61_multimodal_decode", "q94_ppm_decode"):
        plan = plan_of(QUERIES[name].fn(spark, sf_dir))
        tree = plan.split("\n\n")[0]
        assert tree.count("MapInPandas") == 1, name
        assert "Exchange" not in tree, name


def test_q96_quantization_is_scan_only(spark, sf_dir):
    # quantize + diagnostics are higher-order expressions inside the row:
    # one scan, no Exchange, no Python stage.
    plan = plan_of(QUERIES["q96_scalar_quantization"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "MapInPandas" not in tree and "BatchEvalPython" not in tree


def test_q97_span_dedup_skew_safe_count(spark, sf_dir):
    # the corpus-wide gram count must be a partial-aggregating groupBy
    # joined back (hot grams collapse map-side; AQE can split the join) —
    # NOT a window over gh, which would sort a hot gram's entire row set
    # in one partition. The price is the gram stream evaluated on both
    # sides (two Generates); no nested-loop fallback anywhere.
    plan = plan_of(QUERIES["q97_duplicated_span_stats"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Generate") == 2
    assert "Window" not in tree
    assert "partial_count" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q98_sessionization_single_exchange(spark, sf_dir):
    # one hash exchange on user_id feeds the lag window, the running-sum
    # window, AND the session roll-up (its key is a superset of the window
    # partition key, so Catalyst reuses the child partitioning).
    plan = plan_of(QUERIES["q98_sessionization"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1


def test_q99_pii_mask_is_scan_only_codegen(spark, sf_dir):
    # regex scrub rides the scan: zero shuffle, zero Python stage.
    plan = plan_of(QUERIES["q99_pii_mask"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "MapInPandas" not in tree and "BatchEvalPython" not in tree


def test_q99b_srp_signature_map_side_sketch(spark, sf_dir):
    # the 16-plane signature is unrolled JVM arithmetic (no Python stage);
    # the bucket count is a partial-aggregating groupBy joined back, not a
    # signature-partitioned window (hot buckets would sort in one
    # partition), so no Window appears at all.
    plan = plan_of(QUERIES["q99b_srp_signature"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert "partial_count" in plan
    assert "MapInPandas" not in tree and "BatchEvalPython" not in tree


def test_q97b_span_merge_skew_safe_and_doc_bounded(spark, sf_dir):
    # same skew-safe count shape as q97 (groupBy+join-back, two Generates);
    # the only Windows are the per-doc island passes, whose partitions are
    # bounded by document length — never by gram popularity.
    plan = plan_of(QUERIES["q97b_duplicated_span_merge"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Generate") == 2
    assert "partial_count" in plan
    # island detection = lag pass + running-sum pass, both on doc_id
    assert tree.count("Window") == 2


def test_q99e_funnel_windows_share_one_exchange(spark, sf_dir):
    # the three stage windows (view -> click -> purchase) and the per-user
    # dedup all chain on the single user_id exchange; the only other
    # exchange is the 4-key stage histogram.
    plan = plan_of(QUERIES["q99e_funnel_stages"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 2
    assert tree.count("Window") == 3


def test_q99f_cohorts_two_exchanges_no_join(spark, sf_dir):
    # first-seen window keys on user_id; the retention matrix re-keys once
    # on (cohort_week, week_offset) with a partial distinct below it.
    plan = plan_of(QUERIES["q99f_retention_cohorts"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 2
    assert "Join" not in tree


def test_q55_vocab_head_prunes_before_sort(spark, sf_dir):
    # top-10-per-lang must carry WindowGroupLimit: only ~10 rows per
    # group survive the map side, so a hot language (lang partitions are
    # 1/|langs| of the vocabulary) never sorts its full token set in one
    # task.
    plan = plan_of(QUERIES["q55_top_tokens_per_lang"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_q99i_transitions_tiny_normalizer_window(spark, sf_dir):
    # the lag rides one user_id exchange; the normalizing window runs
    # over the (prev, next) AGGREGATE (|types|^2 rows), never raw events
    # — the Window must sit above the final HashAggregate.
    plan = plan_of(QUERIES["q99i_event_transitions"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Window (") == 2  # lag pass + tiny normalizer
    assert "partial_count" in plan


def test_q99j_conversion_is_two_aggregates_no_window(spark, sf_dir):
    # conditional MINs per user then a scalar roll-up: no window, no join.
    plan = plan_of(QUERIES["q99j_time_to_conversion"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert "Join" not in tree


def test_q99l_candidate_prune_is_map_side(spark, sf_dir):
    # the candidate pass is ONE MapInPandas stage whose output feeds a
    # broadcast semi-join — the full token stream is never shuffled, and
    # the corpus total joins in as a broadcast 1-row cross (the only
    # nested-loop allowed: its build side is a scalar aggregate).
    plan = plan_of(QUERIES["q99l_frequent_tokens"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInPandas") == 1
    assert "BroadcastHashJoin LeftSemi" in tree
    assert "CartesianProduct" not in tree


def test_q99m_signature_join_is_equi(spark, sf_dir):
    # FastSS pair generation must be an equi-join on the deletion
    # signature — a cartesian/theta formulation is exactly the O(V²)
    # plan the operator exists to avoid.
    plan = plan_of(
        QUERIES["q99m_vocab_edit_distance_pairs"].fn(spark, sf_dir)
    )
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "levenshtein" in plan  # exact verify survived optimization


def test_q99n_profile_is_single_scan(spark, sf_dir):
    # all 6 columns' stats ride ONE parquet scan (Expand fans it out to
    # the per-distinct aggregates); a per-column scan would read the
    # table 6 times.
    plan = plan_of(QUERIES["q99n_column_profile"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    assert "Expand" in tree


def test_q99o_priority_sample_no_global_sort(spark, sf_dir):
    # top-k by priority must be TakeOrderedAndProject (per-partition
    # heaps, single tiny merge) with zero Exchange — never a global sort
    # of the corpus.
    plan = plan_of(QUERIES["q99o_priority_sample"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree
    assert "Exchange" not in tree


def test_q99p_prefix_join_is_equi_with_exact_verify(spark, sf_dir):
    # PPJoin candidate generation must be an equi-join on prefix shingles
    # (never cartesian), with the exact array_intersect verify surviving
    # in the plan.
    plan = plan_of(QUERIES["q99p_setsim_prefix_join"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "array_intersect" in plan


def test_q99r_interpolation_single_window_pass(spark, sf_dir):
    # all four ignore-nulls frames (prev/next value+timestamp) must share
    # ONE Window over one sort on the densified grid — a second sort pass
    # would double the grid shuffle for no reason.
    plan = plan_of(QUERIES["q99r_linear_interpolation"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Window (") == 1


def test_q99s_pyramid_single_scan_three_levels(spark, sf_dir):
    # the rollup pyramid reads events ONCE and re-aggregates partials:
    # three exchanges (hour/day/week grain), one parquet scan.
    plan = plan_of(QUERIES["q99s_rollup_pyramid"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    assert tree.count("Exchange") == 3


def test_q99q_resize_single_python_stage_no_shuffle(spark, sf_dir):
    # resize is map-side: exactly one Arrow Python stage, zero Exchange.
    plan = plan_of(QUERIES["q99q_image_resize"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInPandas") == 1
    assert "Exchange" not in tree


def test_q99t_salt_reaches_the_join_keys(spark, sf_dir):
    # the salted exchange must actually exist: a SortMergeJoin whose keys
    # include the salt column, fed by hash exchanges carrying salt — the
    # plan that spreads one hot user over 8 reducers.
    plan = plan_of(QUERIES["q99t_salted_skew_join"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" in tree
    import re

    left = re.search(r"Left keys \[2\]: \[[^\]]*salt[^\]]*\]", plan)
    right = re.search(r"Right keys \[2\]: \[[^\]]*salt[^\]]*\]", plan)
    assert left and right, "salt column missing from the join keys"


def test_q99k_drift_join_free_single_token_aggregate(spark, sf_dir):
    # TV drift must be ONE conditional token aggregate + a 1-row totals
    # broadcast: no SortMergeJoin, no Window, and the only nested loop is
    # the scalar cross.
    plan = plan_of(QUERIES["q99k_split_token_drift"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" not in tree
    assert "Window" not in tree
    # 2 scans: the 1-row totals aggregate re-derives the token-count
    # lineage (scans are the cheap part; the vocab-sized SMJ is gone)
    assert tree.count("Scan parquet") == 2


def test_q99v_median_never_sorts_the_full_table(spark, sf_dir):
    # two-pass selection: the only Sorts are (a) the ~hundreds-row
    # histogram cumulative window and (b) the single selected bucket's
    # rows — the fact scan itself must flow into the bucket hash-join
    # unsorted, and the bucket filter must be a hash join, not a nested
    # loop over the corpus.
    plan = plan_of(QUERIES["q99v_distributed_median"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastHashJoin" in tree
    assert tree.count("Window") == 2
    # every Sort sits above an Exchange/Aggregate, never directly on the
    # fact scan's branch before the join
    import re

    scan_branch = tree.split("BroadcastHashJoin")[1].split(":-")[1].split("+-")[0] if ":-" in tree else ""
    assert "Sort" not in scan_branch


def test_q99w_bm25_topk_no_global_sort(spark, sf_dir):
    # ranked retrieval ends in TakeOrderedAndProject (per-partition heaps)
    # and the corpus-stat/df sides ride broadcasts — no sort-merge join of
    # token rows, no global sort of scores.
    plan = plan_of(QUERIES["q99w_bm25_ranking"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree
    assert "SortMergeJoin" not in tree


def test_q99x_fusion_joins_two_tiny_rank_frames(spark, sf_dir):
    # RRF fuses two <=50-row rank lists: the fusion join must not be a
    # cartesian, the dense side must broadcast its single query vector,
    # and the final cut is TakeOrdered.
    plan = plan_of(QUERIES["q99x_hybrid_rrf"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree
    assert "CartesianProduct" not in tree


def test_q99y_interval_join_is_binned_equi(spark, sf_dir):
    # the keyless interval join must stay an equi-join — the naive plan
    # for a pure inequality join is a BroadcastNestedLoop over the
    # corpus. Since the O(matches) fix, the equi-key is the ORDER DATE
    # against a pre-aggregated, window-exploded per-day calendar that
    # broadcasts (days x 7 rows); match count never touches the plan.
    plan = plan_of(QUERIES["q99y_binned_interval_join"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree
    assert "BroadcastHashJoin" in tree  # tiny calendar side broadcasts
    assert "Generate" in tree  # the per-day 7-date window explode


def test_q99zd_trim_rebuild_is_map_side(spark, sf_dir):
    # the cleaned-text rebuild must be a filter-with-index over the token
    # array (no per-token explode back through a shuffle): after the
    # coverage aggregate, the only joins are doc-keyed; no cartesian.
    plan = plan_of(QUERIES["q99zd_span_trim"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_q99zm_packing_one_exchange_on_source(spark, sf_dir):
    # the placement map is ONE window pass partitioned by the source
    # shard axis: exactly one hash exchange (on source), no global sort,
    # no Python stage — text bytes never move.
    plan = plan_of(QUERIES["q99zm_sequence_packing"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan  # the q10-style global-sort trap
    assert "MapInPandas" not in tree


def test_q99zn_repetition_is_map_only(spark, sf_dir):
    # duplicate-n-gram fractions are pure array built-ins inside one
    # projection — zero Python, zero aggregation exchange. Round 16: a
    # single data-derived widen exchange may precede the projection on
    # NARROW scans only (tables.widen_if_narrow — a no-op whenever the
    # production scan already has >= parallelism splits; quiet-box A/B
    # 4.23 -> 3.23 s best-of-3 at sf0.1), so the pin allows at most one
    # Exchange and it must be the widen's hash partitioning, not an agg.
    plan = plan_of(QUERIES["q99zn_repetition_ratios"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 1
    if "Exchange" in tree:
        assert "hashpartitioning(doc_id" in plan
    assert "HashAggregate" not in tree
    assert "MapInPandas" not in tree


def test_q99zo_bpe_is_two_shuffles_takeordered(spark, sf_dir):
    # BPE pair stats: corpus explode -> word-count agg (shuffle 1, word
    # TYPES only travel), pair explode over types -> pair agg (shuffle
    # 2), TakeOrdered top-k — never a global sort, never Python.
    plan = plan_of(QUERIES["q99zo_bpe_pair_stats"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree
    assert tree.count("Exchange") == 2
    assert "CartesianProduct" not in tree
    assert "MapInPandas" not in tree


def test_q99zp_leakage_joins_are_equi(spark, sf_dir):
    # the leakage audit rides q41's bucketed LSH join; the two split
    # lookups must be doc_id equi-joins — no cartesian, no BNL over the
    # corpus.
    plan = plan_of(QUERIES["q99zp_split_leakage_audit"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_q99zq_shuffle_rank_avoids_global_sort(spark, sf_dir):
    # the global permutation rank must come from the two-pass bucket-
    # offset pattern: the corpus-sized window is partitioned on the hash
    # bucket (never a single global sort partition), offsets ride a
    # broadcast equi-join. The only SinglePartition exchange allowed is
    # the ~256-row histogram cumulative window.
    plan = plan_of(QUERIES["q99zq_global_shuffle_batches"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "hashpartitioning(bucket" in plan
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree
    assert "MapInPandas" not in tree


def test_q99zr_winnow_window_is_doc_partitioned(spark, sf_dir):
    # the winnowing selection must be ONE window pass partitioned on
    # doc_id (hot grams cannot skew it) — never a SinglePartition sort.
    from allora_indexer_spark.operators.dedup import winnow_fingerprints
    from allora_indexer_spark.tables import load_table

    sel_plan = plan_of(winnow_fingerprints(load_table(spark, sf_dir, "documents")))
    assert "hashpartitioning(doc_id" in sel_plan
    assert sel_plan.split("\n\n")[0].count("Window") == 1
    assert "SinglePartition" not in sel_plan
    # the full query: selection materialized once (localCheckpoint ->
    # ExistingRDD), so the explode+window subtree is NOT duplicated per
    # join side; only the documents base scan reads parquet.
    plan = plan_of(QUERIES["q99zr_winnowing_fingerprints"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    assert "Scan ExistingRDD" in tree
    assert "CartesianProduct" not in tree
    assert "MapInPandas" not in tree


def test_q99zs_both_ranks_avoid_global_sort(spark, sf_dir):
    # both strategies' global ranks must ride the two-pass bucket-offset
    # shape: corpus-sized windows partitioned on the bucket axes (hash
    # prefix / (tc, doc_id-range)), offsets via broadcast equi-joins;
    # SinglePartition exchanges exist only for the tiny histogram
    # cumulative windows.
    plan = plan_of(QUERIES["q99zs_padding_waste_audit"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "hashpartitioning(bucket" in plan
    assert "hashpartitioning(tc" in plan
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree
    assert "MapInPandas" not in tree


def test_q99zt_vocab_join_is_broadcast(spark, sf_dir):
    # the vocab head comes from TakeOrdered over the word-TYPE table
    # (never a global sort of the corpus) and membership is a broadcast
    # join of the V-row vocab against the exploded corpus.
    plan = plan_of(QUERIES["q99zt_vocab_coverage"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree
    assert "CartesianProduct" not in tree
    assert "MapInPandas" not in tree


def test_q99zzt_sniff_dispatch_is_map_only(spark, sf_dir):
    # the five-codec dispatch rides the scan in ONE Arrow-batched
    # stage: no shuffle besides the codec-bound repartition, no joins,
    # exactly one Python stage.
    plan = plan_of(
        QUERIES["q99zzt_multimodal_sniff_decode"].fn(spark, sf_dir)
    )
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInPandas") == 1
    assert "SortMergeJoin" not in tree
    assert "BroadcastHashJoin" not in tree
    assert "CartesianProduct" not in tree
    assert "Window" not in tree


def test_q99zzu_scene_cuts_single_video_window(spark, sf_dir):
    # one window pass partitioned by video id over the map-only hash
    # stage — no self-join, no corpus-scale sort outside the window's
    # per-partition sort.
    plan = plan_of(QUERIES["q99zzu_video_scene_cuts"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") == 1
    assert "Join" not in tree
    assert "CartesianProduct" not in tree


def test_q99zzs_selection_window_shares_component_partitioning(
    spark, sf_dir
):
    # the keeper decision adds windows over ONE component partitioning
    # (count + argmax-first in the same pass) and equi-joins only; the
    # connected-components loop upstream is localCheckpoint-truncated.
    plan = plan_of(
        QUERIES["q99zzs_dedup_canonical_selection"].fn(spark, sf_dir)
    )
    tree = plan.split("\n\n")[0]
    assert "Window" in tree
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
