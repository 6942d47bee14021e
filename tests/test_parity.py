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
    entries in round 1). Guard the curated emission order: any 50-query
    prefix must contain every operator family, so a registry addition
    can't silently push a whole family out of the checked window."""
    prefix = list(__spark_entry__.queries())[:50]
    families = {
        "scan/filter": ("p1_", "p2_", "p5_", "p6_", "p7_"),
        "join": ("j1_", "j2_", "j4_", "j5_"),
        "aggregate": ("a1_", "a4_"),
        "window-dedup": ("w1_",),
        "merge/dml": ("m1_", "m2_", "m5_", "m6_"),
        "casts/functions": ("f4_", "f5_"),
        "pipeline-state": ("pl_dim_", "pl_fact_", "pl_identity_"),
        "dedup-llm": ("d1_", "d2_", "d3_", "d4_", "d5_", "d6_"),
        "similarity": ("v1_", "v2_", "v3_", "v7_"),
        "text-analysis": ("t1_", "t2_", "t3_", "t4_", "t7_"),
        "multimodal": ("mm1_", "mm3_"),
        "llm-pipeline": ("x2_", "llm_"),
        "streaming/windows": ("e1_", "e2_", "e3_", "e4_", "e5_", "e6_"),
        "scale-paths": ("j6_", "b1_", "x1_", "x5_"),
        "flagship": ("flagship",),
    }
    missing = {
        fam: pfxs
        for fam, pfxs in families.items()
        if not any(name.startswith(p) for p in pfxs for name in prefix)
    }
    assert not missing, f"families absent from the checked prefix: {missing}"
    # every entry in the checked window must carry a real oracle (a
    # rows-only entry inside the window wastes a driver-checked slot)
    rows_only = [n for n in prefix if REGISTRY[n].oracle is None]
    assert not rows_only, f"rows-only queries inside the checked prefix: {rows_only}"
