"""Physical-property tests — the Spark re-expression of the reference's
behavioral layer (SURVEY §5.4): instead of counting cells/rows pulled, we
assert the *plan shape* that guarantees the property at any scale.

- predicate pushdown → PushedFilters in the parquet scan
- column pruning → ReadSchema contains only referenced columns
- ORDER BY + LIMIT → TakeOrderedAndProject (bounded memory top-k)
- small dim join → BroadcastHashJoin (no fact-side shuffle)
- aggregation → partial (map-side) aggregate before the exchange
- relational/pipeline queries → no Python evaluator in the plan
"""

import pytest
from pyspark.sql import functions as F

from squirreling_spark import inventory

inventory.load_all()

SF = "/root/testdata/sf0.001"


def plan_of(name, spark):
    df = inventory.QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_filter_pushdown_reaches_scan(spark):
    df = inventory.QUERIES["filter_where"](spark, SF)
    plan = formatted(df)
    assert "PushedFilters" in plan
    # at least the equality + range conjuncts are pushed
    assert "l_linestatus" in plan.split("PushedFilters")[1][:400]


def test_column_pruning(spark):
    df = inventory.QUERIES["scan_project"](spark, SF)
    plan = formatted(df)
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_comment" not in read_schema and "l_tax" not in read_schema


def test_topk_uses_take_ordered(spark):
    plan = plan_of("topk", spark)
    assert "TakeOrderedAndProject" in plan


def test_dim_join_broadcasts(spark):
    plan = plan_of("join_inner", spark)
    assert "BroadcastHashJoin" in plan


def test_semi_anti_join_operators(spark):
    assert "Semi" in plan_of("join_semi", spark)
    assert "Anti" in plan_of("join_anti", spark)


def test_partial_aggregation_before_shuffle(spark):
    plan = plan_of("hash_agg_q1", spark)
    # partial then final hash aggregate = map-side combine
    assert plan.count("HashAggregate") >= 2
    assert "partial" in plan.lower()


def test_no_python_in_relational_queries(spark):
    for name in ["hash_agg_q1", "join_inner", "window_row_number", "topk",
                 "dedup_minhash_lsh", "dedup_simhash", "text_quality"]:
        plan = plan_of(name, spark)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} fell off the JVM fast path"
        )


def test_count_star_metadata_only(spark):
    df = inventory.QUERIES["count_star"](spark, SF)
    plan = plan_of("count_star", spark)
    # spark answers parquet count(*) from row-group metadata via
    # a LocalTableScan/empty-schema scan — no data columns read
    f = formatted(df)
    if "ReadSchema" in f:
        read_schema = f.split("ReadSchema")[1].splitlines()[0]
        assert "struct<>" in read_schema.replace(" ", "")


def test_whole_stage_codegen_on_hot_path(spark):
    df = inventory.QUERIES["hash_agg_q1"](spark, SF)
    df.collect()  # AQE finalizes the plan only on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen stages in plan toString
    assert "*(1)" in plan and "*(2)" in plan


def test_knn_topk_is_two_stage(spark):
    """Per-query top-k must not be one Window.partitionBy(q_id) over the
    full corpus-x-queries product (#queries giant tasks at scale): the
    local stage partitions by (__pid, q_id)."""
    plan = plan_of("knn_bruteforce", spark)
    assert plan.count("Window") >= 2
    assert "__pid" in plan


def test_assign_cells_is_aggregate_not_window(spark):
    """IVF centroid assignment is a map-side-combining max_by aggregate:
    the corpus-x-centroids product collapses before the shuffle."""
    from squirreling_spark.pipeline.similarity import assign_cells
    from squirreling_spark.qutil import t

    emb = t(spark, SF, "embeddings")
    cents = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    df = assign_cells(emb, cents)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in plan and "partial" in plan.lower()
    assert "Window" not in plan


def test_positional_join_no_global_window(spark):
    plan = plan_of("positional_join", spark)
    # the only windows allowed are over the one-row-per-partition offsets
    # (they sit under a BroadcastExchange); the data path is window-free
    for segment in plan.split("BroadcastExchange")[:1]:
        assert "Window" not in segment


def test_dedup_segments_no_window_partial_min(spark):
    """Keeper selection must be a partial-aggregated min(struct), never a
    row_number window over segment groups (single-hot-key risk)."""
    plan = plan_of("dedup_segments", spark)
    assert "Window" not in plan
    assert "partial_min" in plan
    assert "partial_collect_list" in plan  # doc re-assembly map-side too


def test_tfidf_topk_is_group_limited(spark):
    """Per-doc top-k must run as partial+final WindowGroupLimit (rank
    pushdown), not a bare window over all scored rows."""
    plan = plan_of("tfidf_top_terms", spark)
    assert plan.count("WindowGroupLimit") >= 2
    assert "Partial" in plan.split("WindowGroupLimit")[2][:200]


def test_contamination_benchmark_side_broadcasts(spark):
    """The distinct'd benchmark n-gram set must be the build/broadcast side
    and per-doc hit counting must partially aggregate before the shuffle."""
    plan = plan_of("contamination_check", spark)
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan


def test_knn_join_lsh_no_cross_product(spark):
    """Candidate generation must join on band keys — a nested-loop product
    over the corpus would be the O(n^2) shape LSH exists to avoid."""
    plan = plan_of("knn_join_lsh", spark)
    assert "band_key" in plan
    assert "CartesianProduct" not in plan
    # the only BroadcastNestedLoopJoin allowed is none at all here
    assert "BroadcastNestedLoopJoin" not in plan


def test_q4_exists_is_semi_join(spark):
    """The correlated EXISTS must decorrelate to ONE LeftSemi hash join —
    never a per-row subquery or a nested loop."""
    plan = plan_of("q4_order_priority", spark)
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q16_not_in_is_anti_join(spark):
    plan = plan_of("q16_supplier_count", spark)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q18_having_subquery_is_semi_join_over_partial_agg(spark):
    """The IN-over-grouped-HAVING must aggregate lineitem once (map-side
    partial combine) and semi-join orders against the aggregated keys."""
    plan = plan_of("q18_large_volume", spark)
    assert "LeftSemi" in plan
    assert "partial_sum" in plan


def test_range_join_is_hash_join(spark):
    """The binned rewrite's whole point: BETWEEN joins plan as hash
    equi-joins on the bin key, never BroadcastNestedLoopJoin."""
    for q in ("range_join_events", "sessions_overlap"):
        plan = plan_of(q, spark)
        assert "__sq_range_bin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_table_profile_splits_distincts_from_plain_stats(spark):
    """Exact distinct counts must run as their own aggregate (Expand is
    inherent to multi-column COUNT DISTINCT) cross-joined to the plain
    stats — fused, the min/max/count rows ride the k+1-times-replicated
    Expand too (measured 3-5x slower). One Expand, 1-row cross join."""
    plan = plan_of("table_profile_orders", spark)
    assert plan.count("Expand") == 1
    assert "Cross" in plan or "CartesianProduct" in plan


def test_embedding_outliers_two_stage_bottom_k(spark):
    """Per-label bottom-k must prune partition-locally before the global
    rank (no single-label straggler task), and the centroid join must
    broadcast."""
    plan = plan_of("embedding_outliers", spark)
    assert plan.count("WindowGroupLimit") >= 2  # local + global stage
    assert "BroadcastHashJoin" in plan


def test_corpus_pipeline_two_corpus_exchanges(spark):
    """The staged curation composite (pipeline/export.py) promises
    exactly TWO corpus-keyed hash exchanges — the dedup min_by and the
    shard layout — plus the final presentation sort. A third
    requirement-driven hash exchange means the score-join regression
    came back (5.1x at 10x data, SCALING.md). The input spread()
    repartition (REPARTITION_BY_NUM, also hash-keyed since round 5)
    is layout prep, not a plan-required shuffle — excluded."""
    plan = plan_of("corpus_pipeline", spark)
    required = sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
        and "ENSURE_REQUIREMENTS" in line
    )
    assert required == 2, plan[:2000]


def test_quality_classifier_fold_not_duplicated(spark):
    """score_parts' interpreted token fold (aggregate(transform(...)))
    must appear ONCE in the classifier plan — predicate pushdown
    re-inlining it into a filter doubles the most expensive expression
    per row."""
    plan = plan_of("quality_classifier", spark)
    assert plan.count("aggregate(transform") <= 2  # logit + keep columns
    # and in the staged composite, exactly one evaluation site:
    assert plan_of("corpus_pipeline", spark).count("aggregate(transform") == 1


def test_cms_build_partial_aggregation(spark):
    """The sketch groupBy must map-side combine: the exchange carries
    d*w cells, not token rows."""
    from squirreling_spark.pipeline.sketch import cms_build
    from squirreling_spark.pipeline.text import tokens
    from squirreling_spark.qutil import t

    toks = (
        t(spark, SF, "documents")
        .select(F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
    )
    plan = cms_build(toks, "term")._jdf.queryExecution().executedPlan().toString()
    before_exchange = plan.split("Exchange")[-1]  # text below = upstream
    assert "partial_count" in before_exchange or "partial" in before_exchange


def test_temperature_mix_corpus_pass_is_broadcast_only(spark):
    """The corpus side of temperature mixing must see only a broadcast
    join and a row-local filter — the sole hash exchange allowed is the
    |sources|-row count aggregate."""
    plan = plan_of("temperature_mix", spark)
    assert "BroadcastHashJoin" in plan
    # the one hash exchange groups by source (tiny); the corpus rows
    # themselves ride round-robin (spread) only
    assert plan.count("Exchange hashpartitioning") == 1


def test_ivfpq_search_no_python_and_broadcast_tables(spark):
    """IVF-PQ search touches corpus-scale data only through broadcast
    joins of the three lookup tables; no Python evaluator anywhere."""
    plan = plan_of("knn_ivfpq", spark)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_eliminates_shuffle(spark):
    """The 100 TB co-located-join story, demonstrated for real: both
    sides written bucketed on the join key → the sort-merge join reads
    bucket files directly and the plan contains NO exchange at all.
    (Broadcast is disabled for the test so the join can't cheat; the
    same-bucket-count requirement is what a production pipeline
    maintains for its fact/dim conformed keys.)"""
    from squirreling_spark.qutil import t

    o = t(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = t(spark, SF, "customer").select("c_custkey", "c_name")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")
    (o.write.mode("overwrite").bucketBy(8, "o_custkey")
     .sortBy("o_custkey").saveAsTable("bkt_orders"))
    (c.write.mode("overwrite").bucketBy(8, "c_custkey")
     .sortBy("c_custkey").saveAsTable("bkt_customer"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_orders").join(
            spark.table("bkt_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        ).groupBy("c_name").agg(F.sum("o_totalprice"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # bucket-pruned scan: the JOIN itself moves no data
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange hashpartitioning" not in join_part, join_part[:800]
        # unbucketed control: same join DOES shuffle both sides
        jc = o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        pc = jc._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in pc
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_ivfpq_codes_partition_pruning(spark, tmp_path):
    """The SCALING.md claim, demonstrated: the IVF-PQ code table written
    partitioned by cell lets a probe read ONLY its inverted lists — the
    scan's PartitionFilters prune the other cells' files entirely."""
    from squirreling_spark.pipeline.pq import ivfpq_build
    from squirreling_spark.qutil import t

    e = t(spark, SF, "embeddings")
    _, _, codes = ivfpq_build(
        e, "embedding", "vec_id", k_coarse=8, m=4, ksub=16, dim=64
    )
    path = str(tmp_path / "codes")
    codes.write.mode("overwrite").partitionBy("cell").parquet(path)
    probed = spark.read.parquet(path).filter(F.col("cell").isin([0, 3]))
    plan = formatted(probed)
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cell" in pf, pf
    # and the probe really reads a subset: distinct cells in the result
    cells = {r["cell"] for r in probed.select("cell").distinct().collect()}
    assert cells <= {0, 3}


def test_spatial_join_is_grid_hash_join(spark):
    """The grid-banded spatial join's whole point: ON ST_Intersects plans
    as a hash equi-join on grid cells (JVM bbox prefilter in the join
    condition), with the Python geometry predicate applied POST-join to
    candidates only — never BroadcastNestedLoopJoin x Python."""
    plan = plan_of("spatial_join", spark)
    assert "__sq_sj_" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the pandas predicate must sit above the join (candidate filter),
    # so the join condition itself is Python-free
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def test_bm25_single_scan_broadcast_stats_take_ordered(spark):
    """bm25_rank: tf folds are row-local (no per-term shuffle), the 1-row
    stats aggregate broadcasts back, and top-k is TakeOrderedAndProject —
    no full sort, no Python."""
    plan = plan_of("bm25_rank", spark)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats crossJoin
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly one scan of the documents file feeds the tf fold side
    assert plan.count("Scan parquet") <= 3  # doc scan + stats scan (+reuse)


def test_bpe_encode_broadcast_word_map(spark):
    """bpe_encode_docs: the word->segmentation map joins via broadcast
    (vocab-sized), never a shuffled join of the exploded corpus."""
    plan = plan_of("bpe_encode_docs", spark)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_nfc_python_stage_is_arrow_and_single(spark):
    """text_nfc_normalize: exactly ONE Arrow-batched Python stage (the
    UDF result is materialized once, not re-evaluated per consumer)."""
    plan = plan_of("text_nfc_normalize", spark)
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan  # never row-at-a-time


def test_salted_agg_two_phase_partitioning(spark):
    """salted_agg: phase 1 shuffles on (keys..., salt) — spreading the hot
    groups — and phase 2 re-partitions on the bare keys; both partial
    (map-side) aggregates present."""
    plan = plan_of("salted_agg_skew", spark)
    assert "__sq_salt" in plan
    import re
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("__sq_salt" in p for p in parts)  # salted phase
    assert any(
        "l_returnflag" in p and "__sq_salt" not in p for p in parts
    )  # de-salted final phase
    assert "partial_" in plan.lower() or "partial" in plan


def test_salted_join_key_includes_salt(spark):
    """salted_join: the join key is (key, salt) — hot keys spread over
    salt_buckets tasks; dimension side replicated via explode."""
    plan = plan_of("salted_join_brand", spark)
    assert "__sq_salt" in plan
    assert "Generate explode" in plan or "explode" in plan


def test_minhash_collapsed_single_subtree(spark, sf001):
    # r8: the collapsed MinHash operator must stay SINGLE-SUBTREE — one
    # parquet scan, zero joins (a band self-join re-evaluates the whole
    # fingerprint+signature subtree per side: measured zero
    # ReusedExchange on the draft)
    from squirreling_spark import inventory

    inventory.load_all()
    df = inventory.QUERIES["dedup_minhash_collapsed"](spark, sf001)
    ex = df._jdf.queryExecution().executedPlan().toString()
    assert ex.count("Scan parquet") == 1
    assert "Join" not in ex


def test_minhash_candidates_single_subtree(spark, sf001):
    # r12: the PAIR-level candidate operator is single-subtree too — the
    # band self-join it replaced evaluated the shingle+signature subtree
    # once per side (two parquet scans, two md5 aggregates, a broadcast
    # build); now one scan, zero joins, bucket-local collect_list pairs
    from squirreling_spark import inventory

    inventory.load_all()
    df = inventory.QUERIES["dedup_minhash_lsh"](spark, sf001)
    ex = df._jdf.queryExecution().executedPlan().toString()
    assert ex.count("Scan parquet") == 1
    assert "Join" not in ex


def test_dhash_collapsed_constant_output_groups(spark):
    # the collapsed default's output is bounded by DISTINCT hashes: a
    # duplicate-heavy input adds members, never edges
    from squirreling_spark.pipeline.multimodal import dhash_near_dup

    hashes = spark.createDataFrame(
        [(str(i), 1, 2, 3, 4) for i in range(50)]
        + [(str(100 + i), 1, 2, 3, 5) for i in range(50)],
        "media_id string, b0 long, b1 long, b2 long, b3 long",
    )
    rows = dhash_near_dup(hashes, max_hamming=16).collect()
    assert len(rows) == 1  # one edge between the two distinct hashes
    assert rows[0].n_a == 50 and rows[0].n_b == 50


def test_c4_and_html_row_local_no_exchange(spark):
    # r8: the C4 rule set and the HTML extractor are one codegen HOF
    # projection over the scan — zero Python, and no Exchange from the
    # operator itself (the only allowed Exchange is qutil.spread's
    # fixture repartition in the query wrapper)
    for name in ["c4_quality_filter", "html_extract"]:
        plan = plan_of(name, spark)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan, f"{name} left the JVM"
        assert "Exchange hashpartitioning" not in plan, plan[:600]
        assert "SortMergeJoin" not in plan and "Join" not in plan


def test_rrf_fusion_bounded_after_retrievers(spark):
    # fusion runs on top-k-bounded state: exactly one groupBy over the
    # unioned rank lists, and the corpus never joins the fusion side
    plan = plan_of("rrf_fusion", spark)
    assert "Union" in plan
    # the final ranking window exists but ranks <= |systems|*k rows
    assert "row_number" in plan


def test_funnel_no_windows_no_history(spark):
    # the funnel is chained min-struct aggregates — never a per-user
    # sorted history (Window/collect_list would buffer unbounded
    # per-user state at scale)
    plan = plan_of("events_funnel", spark)
    assert "Window" not in plan
    assert "collect_list" not in plan


def test_resample_windows_are_key_partitioned(spark):
    # both windows (last-observation pick, LOCF fill) must partition by
    # the key — a global window would funnel the grid through one task
    from squirreling_spark import inventory

    inventory.load_all()
    df = inventory.QUERIES["events_resample_locf"](spark, SF)
    ex = df._jdf.queryExecution().executedPlan().toString()
    for line in ex.splitlines():
        if "Window " in line:
            assert "user_id" in line, line


def test_r9_batch_plan_shapes(spark):
    # debounce: exactly ONE exchange (the key-partitioned window shuffle)
    plan = plan_of("events_debounce", spark)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    # split assignment summary: row-local hash (no window), no cartesian;
    # the per-source total joins back via broadcast
    plan = plan_of("docs_split_assign", spark)
    assert "WindowExec" not in plan and "Window\n" not in plan
    assert "BroadcastHashJoin" in plan
    # novelty: gram hash joins only — never any nested-loop shape
    plan = plan_of("docs_ngram_novelty", spark)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # lift: the only nested-loop is the broadcast of the 1-ROW total
    # (crossJoin(broadcast(total)) — constant-size by construction); the
    # data-sized joins are hash joins and the top-50 is bounded two-stage
    plan = plan_of("token_pair_lift", spark)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "TakeOrderedAndProject" in plan


def test_r10_docs_communities_plan_shapes(spark):
    """LPA plan contract, both layers (r9 verdict Missing #1):
    1. docs_communities (default truncation): the final executed plan is
       a checkpointed label LEAF + one comm-size aggregate + ONE
       label-sized join — no CartesianProduct, no window, and the
       iteration subtrees are NOT nested in the plan.
    2. One untruncated round (truncate_rounds=False, iters=1) compiles to
       exactly the documented shape: one edge->label hash join, one
       (node, label) count aggregate, ONE degree-bounded argmax window —
       and never a CartesianProduct."""
    plan = plan_of("docs_communities", spark)
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan          # truncated label leaf
    assert "+- Window [" not in plan           # rounds live below the leaf
    from squirreling_spark.pipeline.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], ["id_a", "id_b"]
    )
    rnd = label_propagation(edges, iters=1, truncate_rounds=False)
    rplan = rnd._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in rplan
    # ONE argmax window per round — but the untruncated round-1 label
    # table is referenced TWICE (output + comm-size agg), so the nested
    # plan carries 2 copies: exactly the duplication-per-reference that
    # makes per-round truncation mandatory for deep iters. Spark rewrites
    # the rn=1 filter into WindowGroupLimit pushdown on each.
    assert rplan.count("+- Window [") == 2
    assert rplan.count("WindowGroupLimit") == 4   # partial+final per copy
    # joins: edge->label (round) + labels->sizes (final) — hash joins only
    assert "BroadcastNestedLoopJoin" not in rplan


def test_r10_docs_langid_plan_row_local(spark):
    """Language ID from the registered query (fixture parquet scan): the
    profile is compiled into the projection — no join, no generate, no
    exchange anywhere in the executed plan (the 100 TB scan-speed
    contract; mirrors the unit pin in test_classify.py)."""
    plan = plan_of("docs_langid", spark)
    for op in ("Join", "Generate", "Exchange", "ArrowEvalPython"):
        assert op not in plan, op


def test_r10_hll_plan_two_map_combined_exchanges(spark):
    """HLL sketch plan contract: one row-local value/bucket/rho
    projection, then register groupBy-max and estimate groupBy-sum —
    exactly TWO hash exchanges, both behind partial aggregation (the
    exchange carries <= m rows per group per task, never data rows), no
    joins, no windows, no Python."""
    plan = plan_of("events_hll_users", spark)
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_max" in plan and "partial_sum" in plan
    for op in ("Join", "Window", "ArrowEvalPython", "CartesianProduct"):
        assert op not in plan, op


def test_r10_user_overlap_no_key_shuffle_products(spark):
    """Overlap estimation must move REGISTERS, not keys: the only
    nested-loop join allowed is the constant-size event-type pair cross
    (|types|^2 rows); everything data-sized is hash join / map-combined
    aggregate, and no CartesianProduct anywhere."""
    plan = plan_of("events_user_overlap", spark)
    assert "CartesianProduct" not in plan
    # the |types|^2 pair cross appears twice (membership + output join) —
    # both constant-size; nothing data-sized may nested-loop
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "partial_max" in plan  # register merges map-side


def test_r11_pure_sketch_defaults_have_no_exact_branch(spark):
    """r10 verdict task 1: the REGISTERED sketch queries must be
    pure-sketch — the full-shuffle exact exhibits live only in the
    _vs_exact variants.

    - cms_top_terms: tokens score against the BROADCAST wide sketch
      (depth broadcast hash joins, all row-local) and only φ-survivors
      shuffle — exactly 2 hash exchanges (sketch build + survivor
      group), top-k via TakeOrderedAndProject, NO exact term count, no
      sort-merge join, and the checkpointed wide table keeps the sketch
      subtree from being recomputed per broadcast.
    - docs_hll_ngrams: registers + estimate only — exactly two
      map-combined exchanges, zero joins, no count-distinct.
    - events_user_overlap: register algebra only — no distinct self-join
      on user_id; registers come from a checkpointed leaf; output joins
      all broadcast; no sort-merge join anywhere."""
    plan = plan_of("cms_top_terms", spark)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("BroadcastHashJoin") == 5
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "exact_count" not in plan
    assert "distinct" not in plan.lower()

    plan = plan_of("docs_hll_ngrams", spark)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_max" in plan and "partial_sum" in plan
    assert "count(distinct" not in plan.lower()  # (est_distinct is a col)
    for op in ("Join", "Window", "ArrowEvalPython"):
        assert op not in plan, op

    plan = plan_of("events_user_overlap", spark)
    assert "SortMergeJoin" not in plan
    assert "exact_overlap" not in plan
    assert "Scan ExistingRDD" in plan  # checkpointed register leaf
    # the only distinct is the constant-size event-type list
    assert plan.count("CartesianProduct") == 0


def test_r11_quantile_sketch_plan_bucket_level_only(spark):
    """Quantile sketch plan contract (r10 verdict task 5): one row-local
    bucket projection + map-combined sketch groupBy, then cumsum windows
    and the rank pick over BUCKET-level rows — exactly two hash
    exchanges, no join anywhere, no data-sized sort; the quantile list
    explodes from a literal array (Generate, row-local)."""
    plan = plan_of("docs_length_quantiles", spark)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_count" in plan  # sketch build map-combines
    assert "Join" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("+- Window [") == 2  # cum + total, same partitioning


def test_r11_second_half_sketch_plans(spark):
    """Second-half sketch rows keep the family contracts:
    - docs_token_mass_quantiles (weighted): identical shape to the
      unweighted pin — two hash exchanges, no joins.
    - sources_gram_overlap: register algebra on the documents domain —
      checkpointed register leaf, no SortMergeJoin, no exact branch
      (the only distinct is the constant source list)."""
    plan = plan_of("docs_token_mass_quantiles", spark)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Join" not in plan

    plan = plan_of("sources_gram_overlap", spark)
    assert "SortMergeJoin" not in plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "count(distinct" not in plan.lower()


def test_r12_cdf_sketch_plan_bucket_level_only(spark):
    """qsketch_cdf keeps the quantile-sketch family contract: probes
    explode from a literal array (Generate, row-local — never a join)
    against bucket-level rows, one map-combined (group, probe)
    aggregation — exactly two hash exchanges, no join, no window, no
    data-sized sort."""
    plan = plan_of("docs_length_cdf", spark)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_count" in plan  # sketch build map-combines
    assert "Generate explode" in plan  # literal probe array, row-local
    for op in ("Join", "+- Window [", "Exchange rangepartitioning"):
        assert op not in plan, op
