"""Local replica of the driver's correctness gate: run a registered
Spark query and its DuckDB oracle side-by-side, compare row count,
column names, and an order-insensitive multiset of canonicalized values.

Exact comparison by design: the registry's determinism conventions
(decimal arithmetic, exact double conversion, deterministic tiebreaks)
are supposed to make Spark and DuckDB bit-identical. Any mismatch is a
bug in the query spec, not "float noise" to be tolerated.
"""

from __future__ import annotations

import duckdb

from end_to_end_etl_using_snowflake_spark.plans.tables import TPCH_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def run_compare(name: str, sf_dir: str, spark) -> dict:
    """Driver-faithful comparison: delegates to tools/strict_parity,
    which converts BOTH sides through pandas (dtype-aware — the driver's
    hash distinguishes int64 from a HUGEINT-turned-float64, naive from
    tz-aware timestamps, and cannot hash raw array cells at all)."""
    from tools.strict_parity import compare

    con = duckdb_connection(sf_dir)
    try:
        result = compare(name, spark, con, sf_dir=sf_dir)
    finally:
        con.close()
    result["match"] = bool(result.get("ok"))
    result["has_oracle"] = "rows_only" not in result
    result.setdefault("spark_rows", result.get("rows_only", 0))
    if result.get("err"):
        result.setdefault("errors", []).append(result["err"])
    return result
