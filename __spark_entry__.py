"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``end_to_end_etl_using_snowflake_spark``; this
module only adapts its registry to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from end_to_end_etl_using_snowflake_spark.plans import queries as _queries_module  # noqa: F401,E402
from end_to_end_etl_using_snowflake_spark.plans import registry as _registry  # noqa: E402

# importing plans.queries (and friends) populates the registry
import end_to_end_etl_using_snowflake_spark.plans.llm_ops  # noqa: F401,E402
import end_to_end_etl_using_snowflake_spark.plans.pipeline_queries  # noqa: F401,E402
import end_to_end_etl_using_snowflake_spark.plans.backfill  # noqa: F401,E402
import end_to_end_etl_using_snowflake_spark.plans.tpch  # noqa: F401,E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference fact_order rebuild, order-...sql:179-212)
    on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.REGISTRY["flagship_fact_rebuild"].build(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
