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
    entries per round so far). Round-8 rotation (VERDICT r7 item #1):
    2-entry core + the 12 session-2 entries that had NEVER had a driver
    check + the full 31-entry r3-last-green cohort + 5 r4-stale padding
    slots that round-8 additions evict one-for-one. Guard both
    properties: the debt + stale cohorts are inside the window (none
    silently pushed out), and the core operator families stay covered."""
    prefix = list(__spark_entry__.queries())[:50]
    never_driver_checked = [
        "sql29_connect_by_level", "sql30_flatten_recursive",
        "sql33_split_to_table", "sql34_variant_path",
        "sql35_composed_dialect", "sql36_unpivot_text",
        "f16_listagg", "f17_scalar_dialect", "k9_theta_sketch_bounds",
        "x25_sample_system", "s8_copy_unload", "e18_append_only_stream",
    ]
    stale_r3 = [
        "d1_dedup_exact", "d2_dedup_ngram_jaccard", "d3_dedup_minhash_lsh",
        "d4_dedup_simhash", "d5_dedup_embedding_cosine",
        "d5l_dedup_embedding_lsh", "d6_dedup_cluster_labels",
        "e1_tumbling_window_agg", "e3_sessionize_stateful_stream",
        "e5_session_window_native", "e6_stream_dedup_watermark",
        "j6_salted_skew_join", "llm_corpus_clean", "m5_cdc_apply_changes",
        "m7_incremental_fact_merge", "mm1_multimodal_decode",
        "mm3_feature_extract", "pl_identity_keys", "pl_list_stage",
        "pl_show_streams", "t1_token_stats", "t2_quality_score",
        "t3_lang_id", "t4_fingerprint", "t7_repetition_filter",
        "v1_ann_bruteforce_topk", "v2_ann_lsh_topk", "v3_ann_ivf_topk",
        "v7_ann_matmul_topk", "x1_asof_join", "x2_leakage_safe_split",
    ]
    pushed_out = [n for n in never_driver_checked + stale_r3 if n not in prefix]
    assert not pushed_out, (
        f"r8 debt/stale cohort entries outside the 50-window: {pushed_out}"
    )
    families = {
        "flagship": ("flagship",),
        "reference-pipeline": ("pl_dim_", "pl_identity_"),
        "scan/project/join core": ("j6_", "p9_", "x25_"),
        "merge/dml": ("m5_", "m7_", "s8_"),
        "agg-surface": ("q1_", "f16_"),
        "dedup-llm": ("d1_", "d2_", "d3_", "d4_", "d5", "d6_", "d7_"),
        "similarity-ann": ("v1_", "v2_", "v3_", "v7_"),
        "text-analysis": ("t1_", "t2_", "t3_", "t4_", "t7_"),
        "multimodal": ("mm1_", "mm3_"),
        "sketches": ("k1_", "k9_"),
        "streaming": ("e1_", "e3_", "e5_", "e6_", "e18_"),
        "llm-pipeline": ("x1_", "x2_", "llm_corpus"),
        # w3 (the last r4 padding slot) was evicted by sql39; window-
        # function machinery stays covered by the event-window and
        # asof entries inside the prefix
        "window-funcs": ("e1_", "e5_", "x1_"),
        "sql-surface": ("sql29_", "sql30_", "sql33_", "sql34_", "sql35_", "sql36_"),
        "functions": ("f16_", "f17_"),
    }
    missing = {
        fam: pfxs
        for fam, pfxs in families.items()
        if not any(name.startswith(p) for p in pfxs for name in prefix)
    }
    assert not missing, f"families absent from the checked prefix: {missing}"
    # every entry in the checked window must carry a real oracle
    # (round 4 upgraded the last rows-only entry, pl_backfill_scale,
    # to a closed-form audit oracle over the source parquet).
    rows_only = [n for n in prefix if REGISTRY[n].oracle is None]
    assert rows_only == [], (
        f"unexpected rows-only queries inside the checked prefix: {rows_only}"
    )
