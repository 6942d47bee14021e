"""Driver-faithful strict parity sweep.

The driver's correctness gate (CORRECTNESS_r{N}.json) converts BOTH the
Spark result and the DuckDB oracle result to pandas, sorts columns by
name, sorts rows by all columns, and hashes the values. That is far
stricter than Python-object equality: ``5`` (int64) and ``5.0``
(float64, e.g. a DuckDB HUGEINT sum) stringify differently; a DuckDB
TIMESTAMPTZ is a different pandas dtype from a naive timestamp; a
``Decimal('1.50')`` is not ``1.5``.

This tool replicates that comparison so mismatches are caught locally
BEFORE the driver runs.  Usage:

    python tools/strict_parity.py [query ...]        # default: all
    SF_DIR=/root/testdata/sf0.01 python tools/strict_parity.py
"""

from __future__ import annotations

import json
import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    from end_to_end_etl_using_snowflake_spark.plans.tables import TPCH_TABLES

    con = duckdb.connect()
    for name in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v):
    """Canonical token per value, calibrated against the driver's r01
    verdicts: int vs float DISTINCT (HUGEINT sums fail), None vs NaT vs
    NaN DISTINCT (nullable-date/int conversions fail), date ==
    midnight-naive-timestamp (flagship passes), tz-aware != naive."""
    import datetime
    from decimal import Decimal

    import numpy as np

    if v is None:
        return "null"  # None == NaT (m8 passed the driver's r01 check
    if v is pd.NaT:    # with Spark None vs DuckDB NaT); NaN stays
        return "null"  # distinct (f10's all-null int column failed)
    if isinstance(v, float) and pd.isna(v):
        return "nan"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        return f"f:{float(v)!r}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, pd.Timestamp):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.datetime):
        return f"ts:{pd.Timestamp(v).isoformat()}"
    if isinstance(v, datetime.date):
        return f"ts:{pd.Timestamp(v).isoformat()}"
    if isinstance(v, (list, tuple, np.ndarray, dict)):
        # The driver's canonicalizer sort_values/factorize dies on
        # unhashable cells (TypeError: unhashable type: 'list' — the r02
        # mm3 failure). Mirror that as a HARD local error so array/struct
        # output columns never reach the driver.
        raise TypeError(
            f"raw array/struct output cell ({type(v).__name__}): the driver "
            "cannot hash this — project to scalar columns or concat_ws"
        )
    return f"s:{v}"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    out = pd.DataFrame({c: [_canon_cell(v) for v in df[c]] for c in df.columns})
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort")
    return out.reset_index(drop=True)


def _norm_dtype(dt) -> str:
    # pandas dtype classes that the driver's schema check treats as
    # interchangeable: integer/float (nullable conversion), object/naive
    # datetime (Spark date objects vs DuckDB datetime64). tz-aware
    # datetimes are NOT interchangeable with naive (e4 failed schema).
    if dt.kind in ("i", "u", "f", "O"):
        return "loose"
    if str(dt).startswith("datetime64") and getattr(dt, "tz", None) is None:
        return "loose"
    return str(dt)


def compare(name: str, spark, con, sf_dir: str | None = None) -> dict:
    from end_to_end_etl_using_snowflake_spark.plans.registry import REGISTRY

    sf_dir = sf_dir or SF_DIR
    spec = REGISTRY[name]
    out = {"name": name}
    try:
        sdf = spec.build(spark, sf_dir).toPandas()
    except Exception:
        out["err"] = "spark: " + traceback.format_exc(limit=3)
        return out
    if spec.oracle is None:
        out["rows_only"] = len(sdf)
        out["ok"] = True
        return out
    try:
        ddf = con.execute(spec.oracle).df()
    except Exception:
        out["err"] = "duckdb: " + traceback.format_exc(limit=3)
        return out

    out["spark_rows"], out["duck_rows"] = len(sdf), len(ddf)
    errs = []
    if sorted(sdf.columns) != sorted(ddf.columns):
        errs.append(f"cols: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
    elif len(sdf) != len(ddf):
        errs.append(f"rows: {len(sdf)} vs {len(ddf)}")
    else:
        for c in sorted(sdf.columns):
            if _norm_dtype(sdf[c].dtype) != _norm_dtype(ddf[c].dtype):
                errs.append(f"dtype[{c}]: spark={sdf[c].dtype} duck={ddf[c].dtype}")
        if not errs:
            try:
                sv, dv = _canon(sdf), _canon(ddf)
                neq = (sv != dv).any(axis=1)
                if neq.any():
                    i = int(neq.idxmax())
                    errs.append(
                        f"{int(neq.sum())} value rows differ; first row {i}: "
                        f"spark={sv.iloc[i].to_dict()} duck={dv.iloc[i].to_dict()}"
                    )
            except Exception:
                errs.append("hash: " + traceback.format_exc(limit=2))
    out["errors"] = errs
    out["ok"] = not errs
    return out


def main() -> None:
    # populate the registry exactly like __spark_entry__ does
    import __spark_entry__  # noqa: F401

    from end_to_end_etl_using_snowflake_spark.plans.registry import REGISTRY

    names = sys.argv[1:] or list(REGISTRY)
    # bare session like the driver's: no arrow flag, default confs except
    # shuffle partitions kept sane for local sweeps
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", os.environ.get("DRIVER_MEM", "8g"))
        # sweep harness collects FULL results to compare against DuckDB;
        # O(rows) outputs at sf1 (e.g. d4's per-doc dedup relation) are
        # legitimately >1g — this is a verifier limit, not engine state
        .config("spark.driver.maxResultSize", os.environ.get("MAX_RESULT", "8g"))
        .config("spark.ui.enabled", "false")
        .appName("strict-parity")
        .getOrCreate()
    )
    con = duck_con(SF_DIR)
    bad = 0
    for n in names:
        r = compare(n, spark, con)
        if not r.get("ok"):
            bad += 1
        tag = "OK " if r.get("ok") else "BAD"
        detail = ""
        if r.get("err"):
            detail = " | " + r["err"].strip().splitlines()[-1]
        elif r.get("errors"):
            detail = " | " + "; ".join(r["errors"])[:400]
        elif "rows_only" in r:
            detail = f" | rows-only ({r['rows_only']})"
        print(f"{tag} {n}{detail}", flush=True)
    print(json.dumps({"total": len(names), "bad": bad}))
    spark.stop()


if __name__ == "__main__":
    main()
