"""Local replica of the driver's correctness gate: run a registered
Spark query and its DuckDB oracle side-by-side, compare row count,
column names, and an order-insensitive multiset of canonicalized values.

Exact comparison by design: the registry's determinism conventions
(decimal arithmetic, exact double conversion, deterministic tiebreaks)
are supposed to make Spark and DuckDB bit-identical. Any mismatch is a
bug in the query spec, not "float noise" to be tolerated.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from end_to_end_etl_using_snowflake_spark.plans.registry import REGISTRY
from end_to_end_etl_using_snowflake_spark.plans.tables import TPCH_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        f = float(v)
        return f
    if isinstance(v, float):
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def run_compare(name: str, sf_dir: str, spark) -> dict:
    spec = REGISTRY[name]
    sdf = spec.build(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(row) for row in sdf.collect()]

    result = {
        "name": name,
        "spark_rows": len(spark_rows),
        "spark_cols": spark_cols,
        "has_oracle": spec.oracle is not None,
    }
    if spec.oracle is None:
        result["match"] = len(spark_rows) >= 0
        return result

    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(spec.oracle)
        duck_cols = [d[0] for d in cur.description]
        duck_rows = cur.fetchall()
    finally:
        con.close()

    result["duck_rows"] = len(duck_rows)
    result["duck_cols"] = duck_cols

    errors = []
    if sorted(spark_cols) != sorted(duck_cols):
        errors.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        errors.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    if not errors:
        order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        # sort key gives a total order in the presence of NULLs
        # (None sorts first; bare tuple sort raises on None < int)
        s_set = sorted(
            (tuple(_canon(r[i]) for i in order) for r in spark_rows),
            key=lambda t: tuple((v is not None, v if v is not None else 0) for v in t),
        )
        d_set = sorted(
            (tuple(_canon(r[i]) for i in dorder) for r in duck_rows),
            key=lambda t: tuple((v is not None, v if v is not None else 0) for v in t),
        )
        pairs = [(a, b) for a, b in zip(s_set, d_set) if a != b]
        if pairs:
            noise = sum(1 for a, b in pairs if _allclose(a, b))
            errors.append(
                f"{len(pairs)} value mismatches ({noise} are <1e-12 float noise); "
                f"first: spark={pairs[0][0]} duck={pairs[0][1]}"
            )

    result["errors"] = errors
    result["match"] = not errors
    return result


def _allclose(a: tuple, b: tuple) -> bool:
    """Diagnostic only: True when every differing field is float noise
    (<1e-12). The verdict still counts these as mismatches — the registry
    conventions are supposed to give bit-exact parity."""
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if not (
            isinstance(x, float)
            and isinstance(y, float)
            and math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12)
        ):
            return False
    return True
