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
    entries per round so far). Round-10 rotation (VERDICT r9 Next #1):
    2-entry core + the 11 session-3 entries that have NEVER had a
    driver check + the FULL 23-entry r4-last-green cohort + 14 r5-stale
    family picks (pl_backfill_incremental first). Guard both
    properties: the debt + stale cohorts are inside the window (none
    silently pushed out), and the core operator families stay
    covered. r10 additions evict only r5-pick padding from the tail."""
    prefix = list(__spark_entry__.queries())[:50]
    never_driver_checked = [
        "f26_regexp_dialect", "f27_calendar_dialect", "f28_bit_ops",
        "f29_percentile_dialect", "f30_variant_typeof",
        "sql51_transaction_text", "sql52_native_spellings",
        "s11_put_remove_stage", "d14_dedup_lsh_bucket_cap",
        "t14_pii_redact", "x26_quality_curriculum",
    ]
    stale_r4_cohort = [
        "dq1_referential_audit", "e7_stream_interval_join", "f10_try_cast",
        "f13_regex_funcs", "f14_explode_generator", "m1_merge_upsert_state",
        "mm2_frame_sample", "p9_unpivot", "pl_backfill_scale",
        "pl_pipe_task_admin", "sql2_lateral_topk", "sql3_window_text",
        "v10_ann_quantized_rerank", "v8_quantize_int8", "v9_kmeans_iter3",
        "w4_ntile_distribution", "x10_source_quality_cap",
        "x12_similar_doc_retrieval", "x14_content_defined_chunks",
        "x7_sequence_packing", "x8_pii_pseudonymize", "x9_chunk_documents",
        "z1_zorder_layout_key",
    ]
    must_keep = ["pl_backfill_incremental"]  # the O(delta) 100 TB claim
    pushed_out = [
        n for n in never_driver_checked + stale_r4_cohort + must_keep
        if n not in prefix
    ]
    assert not pushed_out, (
        f"r10 debt/stale cohort entries outside the 50-window: {pushed_out}"
    )
    families = {
        "flagship": ("flagship",),
        "reference-pipeline": ("pl_dim_", "pl_backfill_", "pl_pipe_"),
        "scan/project/join core": ("p9_", "f10_", "sql2_"),
        "merge/dml": ("m1_", "sql51_"),
        "dedup-llm": ("d14_", "d12_"),
        "similarity-ann": ("v8_", "v9_", "v10_", "v11_"),
        "text-analysis": ("t14_", "t11_", "x9_"),
        "sketches": ("k4_", "dq2_"),
        "streaming/cdc": ("e7_", "e12_", "e9_"),
        "llm-pipeline": ("x7_", "x8_", "x10_", "x12_", "x14_", "x26_"),
        "window-funcs": ("w4_",),
        "sql-surface": ("sql3_", "sql4_", "sql52_"),
        "functions": ("f1", "f2"),
        "stage-verbs": ("s11_",),
        "multimodal": ("mm2_", "mm4_"),
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
