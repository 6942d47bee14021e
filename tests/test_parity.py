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
