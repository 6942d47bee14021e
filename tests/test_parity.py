"""Every registered query must match its DuckDB oracle exactly at
sf0.001 (fast inner loop; the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__  # populates the registry  # noqa: F401
from end_to_end_etl_using_snowflake_spark.plans.registry import REGISTRY

from .conftest import SF_SMALL
from .oracle_harness import run_compare


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    result = run_compare(name, SF_SMALL, spark)
    if not result["has_oracle"]:
        assert result["spark_rows"] >= 0
        return
    assert result["match"], result["errors"]


def test_entry_smoke(spark):
    df = __spark_entry__.entry(spark)
    assert df.count() > 0


def test_driver_prefix_spans_all_operator_families():
    """The driver's correctness gate checks a PREFIX of queries() (50
    entries per round so far). Round-11 rotation (VERDICT r10 #4):
    2-entry core + d5l/d14 (REDEFINED this round — adaptive banding
    geometry, fresh oracles) + the two never-driver-checked r11
    additions (f31, wp1) + the FULL 34-entry r5-last-green cohort +
    10 family-diverse r6-stale picks. Guard both properties: the
    redefined/debt/stale cohorts are inside the window (none silently
    pushed out), and the core operator families stay covered."""
    prefix = list(__spark_entry__.queries())[:50]
    redefined_or_new = [
        "d5l_dedup_embedding_lsh", "d14_dedup_lsh_bucket_cap",
        "f31_to_char_numeric", "wp1_write_file_plan",
        "v16_ann_lsh_adaptive", "wp2_compaction_plan",
        "f32_agg_dialect", "sql53_cluster_by_ddl",
        "f33_everyday_scalars2", "sql54_copy_into_text",
    ]
    stale_r5_cohort = [
        "dq3_distribution_drift", "e10_stream_outer_join",
        "e11_stream_window_agg", "e8_stream_static_enrich",
        "m10_multi_table_insert", "m9_cascading_delete",
        "pl_result_cache", "pl_secured_view", "pl_time_travel",
        "pl_undrop", "pl_zero_copy_clone", "pl_zonemap_prune",
        "prof1_corr_exact", "prof2_table_profile", "q11_important_stock",
        "q12_priority_shipping", "q13_customer_distribution",
        "q15_top_supplier", "q16_supplier_part_counts",
        "q17_small_qty_revenue", "q20_promotion_suppliers",
        "q21_waiting_suppliers", "q8_market_share", "q9_product_profit",
        "sql5_qualify_dialect", "t12_bpe_encode", "udf2_grouped_map_zscore",
        "v13_ann_recall_eval", "x16_pagerank_iter3", "x17_weighted_sample",
        "x18_fuzzy_name_join", "x19_stratified_exact_sample",
        "x20_temperature_mixture", "x21_global_shuffle",
    ]
    pushed_out = [
        n for n in redefined_or_new + stale_r5_cohort if n not in prefix
    ]
    assert not pushed_out, (
        f"r11 redefined/stale cohort entries outside the 50-window: {pushed_out}"
    )
    families = {
        "flagship": ("flagship",),
        "reference-pipeline": ("pl_dim_", "pl_fact_", "pl_time_"),
        "scan/project/join core": ("j1_", "a1_", "m9_", "m10_"),
        "dedup-llm": ("d5l_", "d14_", "d11_"),
        "similarity-ann": ("v13_", "v16_"),
        "text-analysis": ("t12_",),
        "sketches": ("k5_", "prof2_"),
        "streaming/cdc": ("e8_", "e10_", "e11_"),
        "llm-pipeline": ("x16_", "x17_", "x19_", "x20_", "x21_"),
        "sql-surface": ("sql5_", "sql53_", "sql54_"),
        # underscore-terminated explicit prefixes (ADVICE r10: bare
        # "f1"/"f2" matched f10_* and pinned nothing)
        "functions": ("f31_", "f32_", "f33_"),
        "write-planning": ("wp1_", "wp2_"),
        "profiling": ("prof1_", "udf2_"),
        "quality": ("dq3_",),
    }
    missing = {
        fam: pfxs
        for fam, pfxs in families.items()
        if not any(name.startswith(p) for p in pfxs for name in prefix)
    }
    assert not missing, f"families absent from the checked prefix: {missing}"
    # every entry in the checked window must carry a real oracle
    rows_only = [n for n in prefix if REGISTRY[n].oracle is None]
    assert rows_only == [], (
        f"unexpected rows-only queries inside the checked prefix: {rows_only}"
    )
