"""Physical-plan shape assertions — the 100 TB posture, enforced.

Correctness tests prove the right ANSWER; these prove the right PLAN:
broadcasts where a dim is small, pushdown reaching the parquet scan,
top-k avoiding a global sort, partial aggregation before the exchange.
A regression here (e.g. a dim falling off the broadcast path, a filter
stuck above the scan) multiplies cost at scale long before it shows up
in a local benchmark.
"""

from __future__ import annotations

import pytest

import __spark_entry__  # noqa: F401  (populate REGISTRY)
from end_to_end_etl_using_snowflake_spark.plans.registry import REGISTRY

from .conftest import SF_MED


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].build(spark, SF_MED)
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_broadcasts_both_dims_and_partial_aggs(spark):
    plan = plan_of(spark, "flagship_fact_rebuild")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, "dims must broadcast, not sort-merge"
    # partial (map-side) aggregation before the exchange
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_projection_and_filters_reach_the_scan(spark):
    plan = plan_of(spark, "p2_projection_pushdown")
    assert "PushedFilters: [" in plan, plan
    assert "IsNotNull" in plan or "GreaterThanOrEqual" in plan, plan
    # column pruning: the scan reads only the needed columns
    scan_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_comment" not in scan_schema, scan_schema


def test_topk_has_no_global_sort(spark):
    plan = plan_of(spark, "o2_sort_topk")
    assert "TakeOrderedAndProject" in plan, plan


def test_semi_join_stays_semi(spark):
    plan = plan_of(spark, "p6_semi_join_in_subquery")
    assert "LeftSemi" in plan, plan


def test_merge_state_equation_broadcasts_the_batch(spark):
    # the merge state equation = LeftAnti (kept rows) + LeftOuter (apply
    # branch); the small source batch must build broadcast hash tables —
    # the target is probed in place, never shuffled
    plan = plan_of(spark, "m1_merge_upsert_state")
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


@pytest.mark.parametrize("name", ["d3_dedup_minhash_lsh", "llm_corpus_clean"])
def test_text_pipelines_stay_jvm_side(spark, name):
    # no Python evaluation in the hot path: these are pure DataFrame ops
    plan = plan_of(spark, name)
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Row-level runtime filtering: when a selective build side feeds a
    shuffle join, the optimizer injects a bloom filter on the probe side
    so non-matching fact rows die before the exchange. At 100 TB this is
    the difference between shuffling the whole fact table and shuffling
    the ~matching fraction. The 10 GB application-side default keeps it
    off at fixture scale — lowered to 0 here to pin the plan shape Spark
    will pick on a real cluster (broadcast disabled to force the shuffle
    join it applies to)."""
    from pyspark.sql import functions as F

    from end_to_end_etl_using_snowflake_spark.plans.tables import load

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load(spark, SF_MED, "lineitem")
        o = load(spark, SF_MED, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan.lower(), plan
        [(prio, n_bloom)] = [(r.o_orderpriority, r.n) for r in j.collect()]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # the bloom filter is pruning-only: same answer as the plain join
    li = load(spark, SF_MED, "lineitem")
    o = load(spark, SF_MED, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    n_plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert (prio, n_bloom) == ("1-URGENT", n_plain)


def test_bucketed_join_runs_without_exchange(spark):
    """Both sides bucketed on the join key -> SortMergeJoin with NO
    Exchange anywhere in the plan and `Bucketed: true` scans. Broadcast
    is disabled so the exchange-free property is the layout's doing,
    not the small-dim escape hatch."""
    from end_to_end_etl_using_snowflake_spark.plans.queries import _bucketed_pair

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li, o = _bucketed_pair(spark, SF_MED)
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Bucketed: true") == 2, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_partitioned_table_scan_prunes_partitions(spark, tmp_path):
    """A date-partitioned fact table + an equality filter on the
    partition column must prune at the DIRECTORY level: the filter
    shows up as a PartitionFilter on the scan (zero data files read
    from other dates), not a post-scan Filter. This is the layout the
    pipelines' fact rebuild uses at 100 TB (overwrite_partitions on
    order_date)."""
    from pyspark.sql import functions as F

    from end_to_end_etl_using_snowflake_spark.operators.dml import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "fact_part"), partition_by=["d"])
    t.overwrite(
        spark.range(0, 1000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("2021-06-0"), (F.col("id") % 9) + 1).alias("d"),
            (F.col("id") * 1.5).alias("v"),
        )
    )
    df = t.read().filter(F.col("d") == "2021-06-03")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan, plan
    assert "2021-06-03" in plan.split("PartitionFilters:")[1].split("]")[0], plan
    # the partition predicate must NOT appear as a data-level PushedFilter
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "d" not in pushed.replace("isnotnull", ""), plan
    assert df.count() == 1000 // 9 + (1 if 3 <= 1000 % 9 else 0)


def test_global_sort_uses_range_partitioning(spark):
    """A full ORDER BY must plan as a RangePartitioning exchange (every
    partition gets a key range via sampling, sorted independently —
    the distributed total sort), never a single-partition collapse.
    TakeOrderedAndProject is pinned elsewhere for top-k; this is the
    no-limit path."""
    from pyspark.sql import functions as F

    from end_to_end_etl_using_snowflake_spark.plans.tables import load

    df = load(spark, SF_MED, "orders").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    assert "SinglePartition" not in plan, plan


def test_kmeans_default_path_never_buffers_group_values(spark):
    """The default centroid update must be a plain SUM/COUNT (order-free,
    map-side partial agg) — a hot cell at 100 TB must never collect its
    members' values into one in-memory array. The collect_list fold
    exists only behind exact_means=True for oracle parity."""
    from end_to_end_etl_using_snowflake_spark.operators.similarity import kmeans_lloyd
    from end_to_end_etl_using_snowflake_spark.plans.tables import load

    emb = load(spark, SF_MED, "embeddings")
    df = kmeans_lloyd(emb, "vec_id", "embedding", n_cells=8, iterations=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # forbidden: buffering one entry PER MEMBER of a cell —
    # collect_list(struct(id, val)). Still allowed: the bounded per-cell
    # centroid assembly collect_list(struct(i, mean)) (k x dims entries).
    assert "collect_list(struct(id" not in plan, plan
    assert "partial_sum" in plan, plan


def test_lsh_pairs_plan_has_no_cartesian_node(spark):
    """d5l (banded embedding near-dup pairs) must candidate via an
    equi-join on (band, chunk) — the O(N^2) BNLJ self-join is exactly
    what the operator exists to avoid (it stays only in d5, the oracle
    baseline). The candidate join must also stay NARROW: cosine
    scoring (the zip_with/aggregate fold over the vectors) happens at
    the later id-keyed join-back, never inside the banding join — at
    100 TB that is the difference between shuffling 24-byte rows and
    shuffling embeddings."""
    plan = plan_of(spark, "d5l_dedup_embedding_lsh")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    band_join_lines = [
        line for line in plan.splitlines()
        if "Join" in line and "band" in line and "key" in line
    ]
    assert band_join_lines, plan
    for line in band_join_lines:
        assert "zip_with" not in line, line


def test_lsh_bucket_cap_plan_filters_before_self_join(spark):
    """d14 (capped banded LSH) inherits d5l's no-cartesian / narrow-
    banding-join contract AND must apply the hot-bucket size filter
    BEFORE the candidate self-join: the cap's whole point is bounding
    per-bucket fan-out at cap^2 — a post-join filter would still
    enumerate the Omega(bucket^2) pairs the sf10 adversarial corpus
    proved fatal. Filter evidence: a size aggregate over (band, key)
    feeding the join side (count + filter nodes keyed on band/key)."""
    plan = plan_of(spark, "d14_dedup_lsh_bucket_cap")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    band_join_lines = [
        line for line in plan.splitlines()
        if "Join" in line and "band" in line and "key" in line
    ]
    assert band_join_lines, plan
    for line in band_join_lines:
        assert "zip_with" not in line, line
    # the bucket-size aggregate exists and its filter survives planning
    assert "partial_count" in plan or "count(1)" in plan, plan
    assert "__bn" in plan, plan


def test_curriculum_shard_plan_no_global_sort(spark):
    """x26 (curriculum sharding) must rank per (band, shard) with a
    HASH exchange, never a range/global sort — the whole point is that
    a trainer's curriculum order needs only within-shard order. The
    1-row threshold relation may BNLJ in (the allowed scalar-aggregate
    shape); a range partitioning would mean someone reintroduced a
    global ORDER BY difficulty."""
    plan = plan_of(spark, "x26_quality_curriculum")
    assert "rangepartitioning" not in plan.lower(), plan
    assert "hashpartitioning(band" in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan


def test_pii_redact_plan_single_stage(spark):
    """t14 (PII scrub) is a pure row-local regexp projection: zero
    exchanges, zero Python nodes — the linear-in-corpus-bytes contract
    its doc claims at 100 TB."""
    plan = plan_of(spark, "t14_pii_redact")
    assert "Exchange" not in plan, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan


def test_q6_all_predicates_reach_the_scan(spark):
    """TPC-H Q6 is the pushdown probe: ship-date bounds must land in
    PushedFilters so row groups prune at the parquet reader; the
    aggregate must be partial+final with no grouping exchange fan-out."""
    plan = plan_of(spark, "q6_forecast_revenue")
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "l_shipdate" in pushed, plan
    assert "partial_sum" in plan or "partial_count" in plan, plan


def test_q19_disjunction_still_hash_joins(spark):
    """TPC-H Q19's OR'd conjunct groups must not defeat the equi-join
    extraction: the plan keeps a hash join on partkey (broadcast or
    shuffled), never a nested-loop over the disjunction."""
    plan = plan_of(spark, "q19_disjunctive_predicates")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan, plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Dynamic partition pruning: joining a date-partitioned fact to a
    FILTERED dim must inject the dim's surviving keys as a runtime
    partition filter on the fact scan (dynamicpruning expression) — at
    100 TB this skips whole date directories the dim filter excludes,
    before any fact bytes are read."""
    from pyspark.sql import functions as F

    from end_to_end_etl_using_snowflake_spark.operators.dml import ParquetTable

    fact = ParquetTable(spark, str(tmp_path / "fact_dpp"), partition_by=["d"])
    fact.overwrite(
        spark.range(0, 2000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("2021-06-0"), (F.col("id") % 9) + 1).alias("d"),
        )
    )
    dim = spark.range(0, 9).select(
        F.concat(F.lit("2021-06-0"), F.col("id") + 1).alias("d"),
        (F.col("id") % 3 == 0).alias("keep"),
    )
    confs = {
        "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
        # let DPP fire at fixture scale (fallback filter ratio gate)
        "spark.sql.optimizer.dynamicPartitionPruning.useStats": "false",
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio": "10.0",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = fact.read().join(dim.filter(F.col("keep")), "d")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan
        assert j.count() == 3 * (2000 // 9) + sum(
            1 for i in range(2000 % 9) if (i + 1 - 1) % 9 in (0, 3, 6)
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


TPCH_R4 = [
    "q2_min_cost_supplier", "q8_market_share", "q9_product_profit",
    "q11_important_stock", "q12_priority_shipping",
    "q13_customer_distribution", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_qty_revenue",
    "q20_promotion_suppliers", "q21_waiting_suppliers",
]


@pytest.mark.parametrize("name", TPCH_R4)
def test_tpch_completion_no_nested_loops(spark, name):
    # every round-4 TPC-H shape must plan as hash/sort-merge joins —
    # a CartesianProduct or BroadcastNestedLoopJoin means a subquery
    # failed to decorrelate (or a join condition fell through) and the
    # query is quadratic at scale. The 1-row scalar-aggregate
    # broadcasts (q11 threshold, q15 max, q17 final) are BNLJ-free by
    # construction: they join on no condition but against ONE row.
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, plan
    # BroadcastNestedLoopJoin is tolerable ONLY against a 1-row
    # aggregate (scalar threshold); anything else is a regression
    if "BroadcastNestedLoopJoin" in plan:
        assert name in ("q11_important_stock", "q15_top_supplier",
                        "q17_small_qty_revenue"), plan


def test_q21_census_rewrite_single_pass(spark):
    # the EXISTS/NOT-EXISTS pair must run as ONE per-order aggregate
    # joined back — not two correlated probes (three scans total:
    # l1, census, plus the orders filter on each)
    plan = plan_of(spark, "q21_waiting_suppliers")
    # the two COUNT(DISTINCT)s compile to ONE expand-based two-phase
    # aggregate (gid grouping column) keyed on the order — the census
    assert "gid#" in plan and "partial_count(l_suppkey" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q6_style_pushdown_on_new_queries(spark):
    # q15's quarter filter must reach the lineitem scan
    plan = plan_of(spark, "q15_top_supplier")
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    assert "LessThan(l_shipdate" in plan, plan


def test_profiler_is_one_scan_no_join(spark):
    # prof2 computes every per-column metric in a single aggregate over
    # one scan (count-distincts share one Expand); any join or second
    # scan means the profiler degenerated to per-column passes
    plan = plan_of(spark, "prof2_table_profile")
    assert "Join" not in plan, plan
    assert plan.count("FileScan parquet") == 1, plan
    assert "Expand" in plan, plan


def test_segment_boilerplate_no_cartesian(spark):
    # d10's doc-freq join is keyed on the segment text — a hash join
    # with the (segment, count) side tiny, never a cartesian
    plan = plan_of(spark, "d10_segment_boilerplate")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_semantic_dedup_pairs_stay_cluster_keyed(spark):
    # d11: the only nested-loop nodes allowed are broadcasts of the
    # 8-row centroid block (the assignment subplan appears once per
    # use of asg — 3x here); the within-cluster pair stage must join
    # keyed on cell, never cross-join the corpus with itself
    plan = plan_of(spark, "d11_semantic_dedup")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 3, plan
    # any keyed join flavor on the cell column qualifies
    # (SortMerge / ShuffledHash / BroadcastHash all print "Join [cell")
    assert "Join [cell" in plan, plan


def test_bpe_encode_vocab_join_is_keyed(spark):
    # t12: the 5 in-plan argmax broadcasts are 1-row scalar blocks
    # (BNLJ); the corpus -> vocab encode join must be hash-keyed on
    # the word
    plan = plan_of(spark, "t12_bpe_encode")
    assert "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan, plan


def test_pq_adc_codebook_broadcasts(spark):
    # v11: encoding and LUT scoring join against broadcast
    # O(subspaces x codes x dims) blocks; nothing may cartesian
    plan = plan_of(spark, "v11_pq_adc_topk")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_global_shuffle_single_exchange_no_global_sort(spark):
    # x21: ONE hash exchange on shard + per-shard local sort; a global
    # sort (range partitioning) would serialize the permutation write
    plan = plan_of(spark, "x21_global_shuffle")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "rangepartitioning" not in plan, plan
    # the scan must prune to doc_id only
    assert "ReadSchema: struct<doc_id:bigint>" in plan, plan


def test_match_recognize_no_cartesian_single_user_shuffle(spark):
    # e13: runs compress events; adjacent-run matching must be a keyed
    # join (user_id, match_id), never a cartesian
    plan = plan_of(spark, "e13_match_recognize")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_multi_table_insert_routes_in_one_scan(spark):
    # m10 audit plan: three branch reads, no join back to the source —
    # the routing itself happened in ONE write job at build time
    plan = plan_of(spark, "m10_multi_table_insert")
    assert "CartesianProduct" not in plan, plan


def test_mmr_joins_stay_keyed(spark):
    # v14: the only BNLJ is the broadcast query block (v1 shape); the
    # k-step loop's rem/red/pick joins must all be keyed
    plan = plan_of(spark, "v14_mmr_rerank")
    assert "CartesianProduct" not in plan, plan


def test_tdigest_boundary_joins_broadcast(spark):
    # k7: rows join their O(delta log n) boundary relation and probes —
    # every such join must broadcast the tiny side and stay keyed or
    # broadcast-range; a SortMergeJoin against boundaries would shuffle
    # the full table per join at scale
    plan = plan_of(spark, "k7_tdigest_quantiles")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_tdigest_sketch_pass_is_blocked_equality_join(spark):
    # k7/k10: the ONE distributed pass of the t-digest build must join
    # ranks to bounds as a BroadcastHashJoin on (scope, blk) EQUALITY
    # keys — a nested-loop or scope-only-keyed join re-introduces
    # O(rows * delta) residual work (the pre-r8 2-4 s regression)
    from pyspark.sql import functions as F, Window

    from end_to_end_etl_using_snowflake_spark.operators.sketches import (
        tdigest_sketch_pass,
    )

    rows = spark.range(1000).select(
        (F.col("id") % 4).cast("string").alias("scope"),
        F.col("id").alias("cents"),
        F.col("id").alias("tb"),
    )
    ranked = rows.withColumn(
        "r", F.row_number().over(Window.partitionBy("scope").orderBy("cents", "tb"))
    )
    ns = {"0": 250, "1": 250, "2": 250, "3": 250}
    plan = tdigest_sketch_pass(ranked, ns, delta=20)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin [scope" in plan, plan
    assert "blk" in plan.split("BroadcastHashJoin")[1].split("]")[0], plan


def test_sample_dialect_percent_form_is_filter_topn_is_ordered_limit(spark):
    # sql12: the percent branch lowers to a pure scan+filter (no
    # shuffle before the aggregate); the ROWS branch must plan
    # TakeOrderedAndProject, never a global Sort+collect
    plan = plan_of(spark, "sql12_sample_dialect")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_match_recognize_w_chain_stays_keyed(spark):
    # e17: the three extra adjacent-run joins stay (user, match) keyed
    plan = plan_of(spark, "e17_match_recognize_w")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_connect_by_recursion_stays_keyed(spark):
    # sql14: each recursion level is a keyed frontier join (UnionLoop
    # in Spark 4), with the START WITH filter pushed to the scan
    plan = plan_of(spark, "sql14_connect_by")
    assert "CartesianProduct" not in plan, plan
    assert "UnionLoop" in plan, plan


def test_asof_dialect_is_union_window_not_range_join(spark):
    # sql15: the dialect path must inherit the as-of machinery's shape
    # (one union + keyed window), never a range join
    plan = plan_of(spark, "sql15_asof_dialect")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" in plan, plan


def test_generator_spine_broadcasts(spark):
    # sql16: the 31-row spine must broadcast; the fact side never
    # shuffles for the join
    plan = plan_of(spark, "sql16_generator_dialect")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_verbatim_merge_compiles_to_join_plus_anti(spark):
    # sql18: the MERGE text compiler must produce the engine's MERGE
    # shape — one keyed join + one anti join, never a cartesian
    plan = plan_of(spark, "sql18_reference_merge")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_verbatim_fact_insert_broadcasts_dims(spark):
    # sql21: the compiled star join must broadcast both dims (the
    # flagship's pinned posture, reached through the text path)
    plan = plan_of(spark, "sql21_reference_fact_insert")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_connect_by_level_keeps_keyed_recursion(spark):
    # sql29: the depth guard must not change the recursion shape —
    # still a keyed frontier join per level (UnionLoop), no cartesian
    plan = plan_of(spark, "sql29_connect_by_level")
    assert "CartesianProduct" not in plan, plan
    assert "UnionLoop" in plan, plan


def test_flatten_recursive_is_pure_generators(spark):
    # sql30: the bounded fixpoint is a union of per-row generators —
    # one narrow pipeline per level, NO join and NO shuffle anywhere
    plan = plan_of(spark, "sql30_flatten_recursive")
    assert "Generate" in plan, plan
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "SortMergeJoin", "BroadcastHashJoin", "Exchange"):
        assert node not in plan, (node, plan)


def test_cdc_merge_compiles_to_join_plus_anti(spark):
    # sql31: predicated clauses + DELETE must keep the MERGE shape —
    # one keyed join + one anti join, never a cartesian
    plan = plan_of(spark, "sql31_merge_cdc_apply")
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sample_system_scans_only_selected_blocks(spark):
    # x25: the aggregate runs over a path-pruned read of the selected
    # bucket directories with map-side partial aggregation; the
    # unsampled blocks never enter the plan (the scan lists 6 of 16
    # directories — visible as the per-file parquet scan inputs)
    plan = plan_of(spark, "x25_sample_system")
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_match_recognize_text_compiler_stays_keyed(spark):
    # sql32: the text-compiled pattern chain must match the hand-built
    # e13/e17 shape — keyed run joins, no cartesian, single user shuffle
    plan = plan_of(spark, "sql32_match_recognize_text")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_match_recognize_all_rows_stays_keyed(spark):
    # sql42: the exploded match relation joins back to the numbered
    # row relation on (partition key, run id) — a keyed equi-join,
    # never a cartesian; the RUNNING windows ride the same partitioning
    plan = plan_of(spark, "sql42_match_recognize_all_rows")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_mr_variants_stay_keyed_and_bounded(spark):
    # sql38: Catalyst pushes each variant-leg's direction/quantifier
    # filter BELOW the shared run-relation subtree (per-leg pruning
    # beats exchange reuse — each leg aggregates only its matching
    # runs), so assert the properties that matter at scale instead:
    # every join keyed, no cartesian, and the exchange count bounded
    # by the total leg count (not quadratic in anything)
    plan = plan_of(spark, "sql38_match_recognize_alt")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    total_legs = 4 + 2 + 1  # W variant + V variant + the alt statement
    assert plan.count("Exchange") <= 2 * total_legs, plan


def test_dedup_representative_stays_cluster_keyed(spark):
    # d13: label join + member window + aggregate all keyed by
    # cluster/doc — no cartesian anywhere in the LSH + components +
    # representative pipeline
    plan = plan_of(spark, "d13_dedup_representative")
    assert "CartesianProduct" not in plan, plan


def test_source_overlap_sketch_pass_is_one_window(spark):
    # dq6: the distributed portion is the distinct (source, hash) pass
    # + ONE source-keyed top-k window; the pairwise matrix math happens
    # on the collected sketch (bounded by S*k), so the returned plan is
    # a local relation — assert the build ran and produced the matrix
    # without any join/exchange in the RETURNED dataframe's plan
    from end_to_end_etl_using_snowflake_spark.plans.registry import REGISTRY

    df = REGISTRY["dq6_source_overlap_matrix"].build(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan


def test_udtf_runs_arrow_batched(spark):
    # udf3: the Python UDTF must evaluate through the Arrow batch path
    # (ArrowEvalPythonUDTF), never the pickled row-at-a-time BatchEval
    plan = plan_of(spark, "udf3_arrow_udtf_chunker")
    assert "ArrowEvalPythonUDTF" in plan, plan
    assert "BatchEvalPythonUDTF" not in plan, plan


def test_window_dialect_shares_one_shuffle(spark):
    # f20: RATIO_TO_REPORT + CONDITIONAL_TRUE_EVENT +
    # CONDITIONAL_CHANGE_EVENT all partition by user_id — Catalyst must
    # serve all three (plus the wrapped change-flag subquery) from ONE
    # exchange and one sort, not one per window
    plan = plan_of(spark, "f20_window_dialect")
    assert plan.count("Exchange") <= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_format_strings_stay_projected(spark):
    # f23: format-string conversions are per-row expressions over one
    # scan — no join, no cartesian; the single exchange is the
    # (absent) aggregation's, i.e. none
    plan = plan_of(spark, "f23_format_strings")
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan


def test_connect_by_path_stays_keyed(spark):
    # sql49: every recursion step is a keyed equi-join of the frontier
    # against the table; the NOCYCLE/path state is carried in columns,
    # never via a cartesian or nested-loop re-probe
    plan = plan_of(spark, "sql49_connect_by_path")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_mr_skip_past_last_runs_arrow_on_candidates(spark):
    # sql50: the greedy non-overlap selection is ONE Arrow mapInPandas
    # per statement over the COMPRESSED candidate relation, clustered
    # by the partition key (r16: the grouped-map applyInPandas form
    # paid one pandas frame per GROUP — 4.4 s on 1500 tiny groups vs
    # 0.8 s per-partition for the identical selection) — it must sit
    # ABOVE the run-relation aggregation (never over raw events),
    # everything stays keyed, and the raw-row path has no Python at
    # all (the 'next' probe's half)
    plan = plan_of(spark, "sql50_match_recognize_skip")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "MapInPandas" in plan, plan  # the greedy step, Arrow, per-partition
    # the per-GROUP form must not come back
    assert "FlatMapGroupsIn" not in plan, plan


def test_session_variable_predicate_is_pushed_literal(spark):
    """sql55's 100 TB claim, enforced: after SET, a $var predicate
    arrives at Catalyst as a FOLDABLE LITERAL — the parquet scan shows
    it in PushedFilters (partition/row-group pruning territory), with
    no subquery or join node standing in for the variable."""
    df = REGISTRY["sql55_session_variables"].build(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan, plan
    # the computed threshold itself (MAX - 5) appears as a literal
    # GreaterThanOrEqual pushed to the scan (the PushedFilters list is
    # truncated by toString, so the equality literal is asserted on
    # the Filter node instead)
    assert "GreaterThanOrEqual(l_quantity" in plan, plan
    assert "= R)" in plan, plan
    # and no scalar-subquery re-evaluation survives into the main scan
    assert "Subquery" not in plan, plan


def test_sql_udf_body_inlines_into_the_plan(spark):
    """sql57's 100 TB claim, enforced: a Snowflake SQL UDF lowered to
    Spark's native SQL function INLINES — the executed plan contains
    the body's expressions inside whole-stage codegen, with no Python
    evaluation node and partial aggregation intact."""
    df = REGISTRY["sql57_sql_udf"].build(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    # the banding UDF's CASE landed in the scan-side project
    assert "CASE WHEN" in plan, plan


def test_jaro_winkler_udf_runs_on_candidates_only(spark):
    """x28's scale claim, enforced: the pandas-UDF Jaro-Winkler scan
    (ArrowEvalPython) sits ABOVE the gram equi-join — it scores
    blocked candidate pairs, never a corpus-sized or cartesian
    relation."""
    plan = plan_of(spark, "x28_jaro_winkler_join")
    assert "ArrowEvalPython" in plan, plan
    # the blocker is a real equi-join, not a cartesian product
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
    # the UDF appears once, downstream of the join (the join's hash
    # exchange precedes it in the plan text)
    udf_at = plan.index("ArrowEvalPython")
    assert "HashJoin" in plan[udf_at:] or "SortMergeJoin" in plan[udf_at:], (
        "gram join must be below the UDF"
    )


def test_f39_datetime_battery_scans_two_columns_no_python(spark):
    """r13 probe battery 8: the boundary-count lowerings are per-row
    codegen arithmetic — the scan reads ONLY (ts, event_type), nothing
    reaches Python, and the only exchange is the group-by."""
    plan = plan_of(spark, "f39_datetime_battery")
    scan_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "ts" in scan_schema and "event_type" in scan_schema
    assert "props" not in scan_schema and "value" not in scan_schema
    assert "Python" not in plan and "BatchEvalPython" not in plan
    assert "partial_" in plan  # map-side partial aggs


def test_k11_minhash_registers_partial_agg_no_python(spark):
    """r13: MINHASH's k register mins are ONE hash-agg with map-side
    partials (the shuffle carries k longs per group, never raw
    values); similarity/combine are post-agg projections. No Python,
    no cartesian."""
    plan = plan_of(spark, "k11_minhash_sql_family")
    assert "partial_min" in plan or "partial_" in plan, plan
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_f42_cast_types_stay_in_scan_pushdown(spark):
    """r13: cast-target translation is pure expression rewriting —
    pruning still reaches the scan (only the 6 referenced lineitem
    columns are read) and no Python node appears."""
    plan = plan_of(spark, "f42_cast_type_names")
    scan_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in scan_schema
    assert "l_partkey" not in scan_schema
    assert "Python" not in plan


def test_sql64_delete_using_plans_left_anti(spark):
    """r13: the join-DELETE's kept side is NOT EXISTS -> LEFT ANTI —
    duplicate source rows can never multiply the target (no dedup
    node needed, no cartesian)."""
    plan = plan_of(spark, "sql64_delete_using")
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan


def test_f43_value_windows_stay_jvm_side(spark):
    """r14: the appended whole-window frames run inside Spark's native
    Window exec — no Python, no cartesian; one window partitioning
    (both OVER clauses share the partition key so Catalyst reuses the
    exchange)."""
    plan = plan_of(spark, "f43_value_window_frames")
    assert "Window" in plan, plan
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_f44_time_family_is_pure_codegen(spark):
    """r14: the TIME lowerings are scalar expressions over one orders
    scan — no shuffle (no Exchange beyond the scan coalesce), no
    Python, and pruning reaches the scan (only o_orderkey read)."""
    plan = plan_of(spark, "f44_time_convention")
    assert "Python" not in plan
    assert "Join" not in plan
    scan_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in scan_schema
    assert "o_totalprice" not in scan_schema


def test_f45_grouping_sets_single_shuffle(spark):
    """r14: four grouping sets expand map-side; exactly one hash
    aggregate pair (partial -> final) around one exchange, no
    Python."""
    plan = plan_of(spark, "f45_grouping_alias")
    assert "Expand" in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "Python" not in plan


def test_f46_battery11_scan_only(spark):
    """r14: CONCAT_WS/FACTORIAL/TO_JSON/JSON_EXTRACT lowerings are
    scalar codegen over one scan — no shuffle, no Python; pruning
    keeps the scan at the three referenced columns."""
    plan = plan_of(spark, "f46_scalar_battery11")
    assert "Python" not in plan
    assert "Exchange" not in plan, plan
    scan_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_totalprice" not in scan_schema


def test_f47_collations_jvm_side(spark):
    """r14: ICU collation comparisons are native expressions — no
    Python, no cartesian (the scalar subquery broadcasts one row)."""
    plan = plan_of(spark, "f47_collation_icu")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_f48_codec_udf_in_scan_stage(spark):
    """r14: the codec family IS the documented Arrow slow path — pin
    that it stays Arrow-batched (ArrowEvalPython, never row-at-a-time
    BatchEvalPython) and pipelines inside the scan stage with no
    shuffle."""
    plan = plan_of(spark, "f48_codec_roundtrip")
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan, plan


def test_x29_preagg_factors_expand(spark):
    """r14: the pre-aggregate + rollup-of-partials rewrite — Expand
    must sit ABOVE the first (finest-grain) aggregate, i.e. Expand's
    input is the ~45-row intermediate, not the base scan. Two
    aggregate pairs, no Python."""
    plan = plan_of(spark, "x29_grouping_sets_preagg")
    assert "Expand" in plan, plan
    # the finest-grain partial agg appears BELOW the Expand node
    assert plan.index("Expand") < plan.index("Scan "), plan
    agg_before_expand = plan[plan.index("Expand"):].count("HashAggregate")
    assert agg_before_expand >= 2, plan  # finest-grain pair under Expand
    assert "Python" not in plan


def test_f45_lowered_text_auto_factors_expand(spark):
    """r15 (VERDICT r14 #2): pasted GROUP BY GROUPING SETS text with
    decomposable aggregates now auto-factors through the finest-grain
    pre-aggregate in the lowering itself — f45's plan must look like
    x29's: Expand sits ABOVE the finest-grain aggregate (its input is
    the tiny intermediate, not the base scan)."""
    from end_to_end_etl_using_snowflake_spark.functions.sqldialect import (
        rewrite_grouping_sets_preagg as R,
    )

    plan = plan_of(spark, "f45_grouping_alias")
    assert "Expand" in plan, plan
    assert plan.index("Expand") < plan.index("Scan "), plan
    agg_below_expand = plan[plan.index("Expand"):].count("HashAggregate")
    assert agg_below_expand >= 2, plan
    assert "Python" not in plan
    # non-decomposable aggregates keep the direct Expand plan (a
    # fallback, not a refusal)
    for q in (
        "SELECT a, AVG(x) AS m FROM t GROUP BY GROUPING SETS ((a), ())",
        "SELECT a, COUNT(DISTINCT x) AS m FROM t"
        " GROUP BY GROUPING SETS ((a), ())",
        "SELECT a, MEDIAN(x) AS m FROM t GROUP BY GROUPING SETS ((a), ())",
        "SELECT a + 1 AS b, SUM(x) AS m FROM t"
        " GROUP BY GROUPING SETS ((a + 1), ())",
    ):
        assert R(q) == q


def test_fill_identity_no_global_window(spark):
    """r15 (VERDICT r14 #5 hotspot check): the identity fill's rank
    must NEVER plan as a single-partition global window — at a 100 TB
    initial load that serializes every insert row through one task.
    The bucketed design ranks within __bkt partitions (a hash of the
    sort key) and adds broadcast offsets; the pin asserts the Window
    operator carries a non-empty partition spec."""
    import re as _re

    from pyspark.sql import functions as F

    from end_to_end_etl_using_snowflake_spark.operators import merge as M

    df = (
        spark.range(0, 10000)
        .select(
            F.lit(None).cast("long").alias("id"),
            F.concat(F.lit("k"), F.col("id")).alias("name"),
        )
    )
    out = M.fill_identity(df, "id", order_by=["name"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    windows = _re.findall(r"Window \[[^\]]*\], \[[^\]]*\]", plan)
    assert windows, plan  # the rank IS a window — it must be present
    # every Window's partition spec (the second bracket list) is
    # non-empty: "Window [funcs], [partspec], [ordspec]" — an empty
    # partspec would read "], [], ["
    assert "], [], [" not in plan, plan
    assert "__bkt" in plan, plan


def test_f49_null_ordering_stays_window_exec(spark):
    """r14: explicit NULL placements are plain SortOrder properties —
    native Window exec, no Python, one shuffle per partition key."""
    plan = plan_of(spark, "f49_null_ordering")
    assert "Window" in plan, plan
    assert "NULLS LAST" in plan and "NULLS FIRST" in plan, plan
    assert "Python" not in plan
