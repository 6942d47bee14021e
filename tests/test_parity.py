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
    entries per round so far). Round-6 rotation: rounds 1-5 drove 172
    distinct entries to driver rows; the r6 window holds the 23
    never-driver-checked entries (the full VERDICT-r5 set, including
    d10/d11 that NOTES r5 omitted), the 2-entry always-on core,
    re-checks of the oldest r1 greens, and padding re-checks that
    round-6 additions evict one-for-one. Guard both properties: every
    never-checked entry is inside the window (none silently pushed
    out), and the core pillars stay covered."""
    prefix = list(__spark_entry__.queries())[:50]
    never_checked_r6 = [
        "a8_filtered_aggregates", "d10_segment_boilerplate",
        "d11_semantic_dedup", "dq4_minhash_recall_eval",
        "e13_match_recognize", "e15_stream_full_outer_join",
        "e16_stream_session_close", "f15_min_max_by",
        "k5_file_bloom_prune", "pl_clustering_info", "pl_dynamic_table",
        "pl_quarantine", "pl_show_columns", "pl_transaction",
        "prof3_sketch_profile", "sql6_flatten_dialect",
        "sql7_group_by_all", "t13_quality_classifier", "v14_mmr_rerank",
        "v15_ann_ivf_trained", "w5_rank_distribution_funcs",
        "x23_length_bucketing", "x24_asof_directional",
    ]
    pushed_out = [n for n in never_checked_r6 if n not in prefix]
    assert not pushed_out, (
        f"never-driver-checked entries outside the 50-window: {pushed_out}"
    )
    families = {
        "flagship": ("flagship",),
        "reference-pipeline": ("pl_dim_", "pl_quarantine", "pl_transaction",
                               "pl_dynamic_", "pl_clustering_", "pl_show_"),
        "scan/project/join core": ("p1_", "p2_", "j1_", "a1_"),
        "merge/dml": ("m2_", "m6_"),
        "sketches": ("k5_", "prof3_"),
        "text-analysis": ("t1_", "t13_"),
        "dedup-llm": ("d10_", "d11_", "dq4_", "d1_", "d3_"),
        "similarity": ("v14_", "v15_", "v1_"),
        "llm-pipeline": ("x23_", "x24_"),
        "window/agg-surface": ("w5_", "a8_", "f15_"),
        "sql-surface": ("sql6_", "sql7_"),
        "streaming": ("e13_", "e15_", "e16_"),
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
