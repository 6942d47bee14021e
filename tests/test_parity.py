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
    entries per round so far). Round-7 rotation: all 202 entries are
    cumulatively driver-green (r6 closed the verification debt), so the
    window now serves RE-verification of the stalest greens — the full
    r1/r2 last-green cohort (25 entries, VERDICT r6 item #3) + the
    2-entry core + stalest-r3 padding that round-7 additions evict
    one-for-one. Guard both properties: the stale cohort is inside the
    window (none silently pushed out), and the core pillars stay
    covered."""
    prefix = list(__spark_entry__.queries())[:50]
    stale_r1_r2 = [
        "a5_rollup", "a6_percentile_groups", "a7_grouping_sets",
        "f12_histogram_bins", "f6_date_math", "f7_string_funcs",
        "f8_conditional_funcs", "f9_json_extract",
        "j7_outer_join_family", "p10_exists_correlated", "p8_pivot",
        "q18_large_orders_having", "q3_shipping_priority", "s1_set_ops",
        "sql1_text_surface", "x3_time_spine_rollup", "x4_snapshot_as_of",
        "a4_count_distinct", "b1_bucketed_colocated_join",
        "e2_sessionize", "e4_sliding_window_agg", "f5_string_extract",
        "m8_scd2_merge", "w2_window_frames", "x5_range_join",
    ]
    pushed_out = [n for n in stale_r1_r2 if n not in prefix]
    assert not pushed_out, (
        f"stale r1/r2 cohort entries outside the 50-window: {pushed_out}"
    )
    families = {
        "flagship": ("flagship",),
        "reference-pipeline": ("pl_dim_", "pl_identity_"),
        "scan/project/join core": ("p10_", "p8_", "j7_", "j6_"),
        "merge/dml": ("m8_", "m5_", "m7_"),
        "agg-surface": ("a4_", "a5_", "a6_", "a7_"),
        # text-analysis, similarity, and dedup-llm rotated fully out
        # of the r7 window: all their entries are cumulatively
        # driver-green (t/v r1-r6, d1-d6 r3, d10/d11 r6) and locally
        # oracle-swept every pytest run; the final padding slots went
        # to session-2's NEW statement compilers (sql31/sql32), and
        # the rotated-out families return in r8.
        "llm-pipeline": ("x1_", "x2_", "x5_", "llm_corpus"),
        "window-funcs": ("w2_", "e2_", "e4_"),
        "sql-surface": ("sql1_",),
        "functions": ("f5_", "f6_", "f7_", "f8_", "f9_", "f12_"),
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
