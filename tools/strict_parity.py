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
    # Large-SF sweeps: the ORACLE is the memory hog (e.g. d3's shingle
    # explosion at sf10 materializes tens of GB in DuckDB and got the
    # whole process OOM-killed alongside the Spark JVM). Cap DuckDB and
    # let it spill to disk instead of dying; defaults keep small sweeps
    # unchanged. DUCK_MEM e.g. "48GB", DUCK_TMP a writable directory.
    mem = os.environ.get("DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("DUCK_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
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


def compare_agg(name: str, spark, con, sf_dir: str | None = None) -> dict:
    """Engine-side aggregate comparison for outputs too large to
    collect (O(rows) relations at sf1+): both engines reduce the full
    result to per-column order-insensitive checksums — count, and per
    column SUM of a 60-bit md5 hash (strings), exact SUM/MIN/MAX
    (integers), or SUM of round(x * 1e6) (doubles; the repo's value
    conventions make doubles bit-identical, so the fixed-point sum
    is exact) — and only the scalars cross the driver. Weaker than
    the full row hash (a swap of values between rows of the same
    column is undetected across columns) but catches count, content,
    and distribution drift at any scale with O(1) driver memory."""
    from end_to_end_etl_using_snowflake_spark.plans.registry import REGISTRY

    sf_dir = sf_dir or SF_DIR
    spec = REGISTRY[name]
    out = {"name": name, "mode": "agg"}
    if spec.oracle is None:
        out["err"] = "agg mode requires an oracle"
        return out
    try:
        sdf = spec.build(spark, sf_dir)
    except Exception:
        out["err"] = "spark: " + traceback.format_exc(limit=3)
        return out

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    s_aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    d_aggs = ["CAST(count(*) AS BIGINT) AS n_rows"]
    for f in sdf.schema.fields:
        c = f.name
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType)):
            s_aggs += [
                F.sum(F.col(c).cast("decimal(38,0)")).cast("double").alias(f"{c}__sum"),
                F.min(c).cast("long").alias(f"{c}__min"),
                F.max(c).cast("long").alias(f"{c}__max"),
            ]
            d_aggs += [
                f'CAST(CAST(sum("{c}") AS DECIMAL(38,0)) AS DOUBLE) AS "{c}__sum"',
                f'CAST(min("{c}") AS BIGINT) AS "{c}__min"',
                f'CAST(max("{c}") AS BIGINT) AS "{c}__max"',
            ]
        elif isinstance(f.dataType, T.DoubleType):
            s_aggs += [
                F.sum(F.expr(f"CAST(round(`{c}` * 1000000) AS DECIMAL(38,0))"))
                .cast("double")
                .alias(f"{c}__fxsum")
            ]
            d_aggs += [
                f'CAST(sum(CAST(round("{c}" * 1000000) AS DECIMAL(38,0))) AS DOUBLE)'
                f' AS "{c}__fxsum"'
            ]
        else:  # strings, dates, timestamps -> hash of the cast-to-string
            s_aggs += [
                F.sum(
                    F.conv(F.substring(F.md5(F.col(c).cast("string")), 1, 15), 16, 10)
                    .cast("decimal(38,0)")
                )
                .cast("double")
                .alias(f"{c}__hsum"),
                F.count(c).cast("long").alias(f"{c}__nn"),
            ]
            d_aggs += [
                # '||' not concat(): DuckDB's concat SKIPS NULLs, so a
                # NULL cell would become the unparseable literal '0x'
                # (Spark's md5(NULL) is NULL and the sum skips it)
                f"CAST(sum(CAST(CAST(('0x' || substring(md5(CAST(\"{c}\" AS"
                f" VARCHAR)), 1, 15)) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE)"
                f" AS \"{c}__hsum\"",
                f'CAST(count("{c}") AS BIGINT) AS "{c}__nn"',
            ]
    try:
        srow = sdf.agg(*s_aggs).collect()[0].asDict()
    except Exception:
        out["err"] = "spark: " + traceback.format_exc(limit=3)
        return out
    try:
        drow = con.execute(
            f"SELECT {', '.join(d_aggs)} FROM ({spec.oracle}) __agg_t"
        ).df().iloc[0].to_dict()
    except Exception:
        out["err"] = "duckdb: " + traceback.format_exc(limit=3)
        return out
    errs = []
    for key, sv in srow.items():
        dv = drow.get(key)
        same = (sv is None and (dv is None or dv != dv)) or sv == dv
        if not same:
            errs.append(f"{key}: spark={sv!r} duck={dv!r}")
    out["spark_rows"] = out["duck_rows"] = int(srow["n_rows"])
    out["errors"] = errs
    out["ok"] = not errs
    return out


def main() -> None:
    # populate the registry exactly like __spark_entry__ does
    import __spark_entry__  # noqa: F401

    from end_to_end_etl_using_snowflake_spark.plans.registry import REGISTRY

    args = sys.argv[1:]
    agg_mode = "--agg" in args
    names = [a for a in args if a != "--agg"] or list(REGISTRY)
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
    import time as _time

    for n in names:
        t0 = _time.perf_counter()
        r = (compare_agg if agg_mode else compare)(n, spark, con)
        elapsed = _time.perf_counter() - t0
        if not r.get("ok"):
            bad += 1
        tag = f"OK  [{elapsed:7.1f}s]" if r.get("ok") else f"BAD [{elapsed:7.1f}s]"
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
