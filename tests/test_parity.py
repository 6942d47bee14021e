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
    entries per round so far). Round-5 rotation: rounds 1-4 drove 124
    distinct entries to driver rows; the r5 window holds the 41
    never-driver-checked round-4 additions, f11_array_funcs (the only
    red row ever, fixed in r1 but never re-rotated), a 4-entry
    always-on core, and 4 re-check slots. Guard both properties: every
    never-checked entry is inside the window (none silently pushed
    out), and the core pillars stay covered."""
    prefix = list(__spark_entry__.queries())[:50]
    families = {
        "flagship": ("flagship",),
        "reference-pipeline": ("pl_dim_", "pl_backfill", "pl_schema_",
                               "pl_secured_", "pl_zero_copy_", "pl_pipe_"),
        "merge/dml": ("m1_", "m9_"),
        "casts/functions": ("f10_", "f11_"),
        "tpch-analytics": ("q2_", "q8_", "q9_", "q11_", "q12_", "q13_",
                           "q15_", "q16_", "q17_", "q20_", "q21_"),
        "sketches": ("k4_",),
        "text-analysis": ("t11_", "t12_"),
        "dedup-llm": ("d12_",),
        "similarity": ("v11_", "v13_"),
        "llm-pipeline": ("x16_", "x17_", "x18_", "x19_", "x20_"),
        "multimodal": ("mm4_",),
        "quality/profiling": ("dq2_", "dq3_", "prof1_", "prof2_"),
        "sql-surface": ("sql4_", "sql5_", "udf2_"),
        "streaming": ("e8_", "e9_", "e10_", "e11_", "e12_"),
        "materialized-view": ("mv1_",),
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
