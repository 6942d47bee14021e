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
    entries in rounds 1-3). Round-4 rotation: rounds 1-3 drove 79
    distinct entries to driver rows; the r4 window holds the 46
    never-driver-checked entries plus a 4-entry always-on core. Guard
    both properties: every never-checked entry is inside the window
    (none silently pushed out), and the core pillars stay covered."""
    prefix = list(__spark_entry__.queries())[:50]
    families = {
        "flagship": ("flagship",),
        "reference-pipeline": ("pl_dim_", "pl_backfill"),
        "merge/dml": ("m1_",),
        "casts/functions": ("f10_", "f13_", "f14_"),
        "tpch-analytics": ("q1_", "q4_", "q5_", "q7_"),
        "sketches": ("k1_", "k2_", "k3_"),
        "text-analysis": ("t5_", "t6_", "t8_", "t9_", "t10_"),
        "dedup-llm": ("d7_", "d8_", "d9_"),
        "similarity": ("v4_", "v6_", "v8_", "v9_", "v10_"),
        "llm-pipeline": ("x6_", "x7_", "x8_", "x9_", "x10_", "x12_"),
        "multimodal": ("mm2_", "mm4_"),
        "windows/quality": ("w3_", "w4_", "dq1_"),
        "sql-surface": ("sql2_", "sql3_", "p9_", "udf1_"),
        "layout/streaming": ("z1_", "e7_"),
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
