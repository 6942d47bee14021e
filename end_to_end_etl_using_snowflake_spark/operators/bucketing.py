"""Bucketed tables: pre-shuffled storage for exchange-free joins.

Engine extension beyond the reference surface (the reference delegates
physical layout to Snowflake's micro-partitions; SURVEY.md §4). On a
100 TB warehouse the recurring cost of the star join is the shuffle of
the fact table on its join key every query. Hash-bucketing both join
sides into the same number of buckets at WRITE time moves that shuffle
out of the query path entirely: Catalyst recognizes the matching
output partitioning and plans a SortMergeJoin with **no Exchange on
either side** (``Bucketed: true`` in the scan, verified in
tests/test_plan_shapes.py). ``sortBy`` on the bucket key additionally
lets single-file buckets skip the Sort.

This is the batch analog of co-partitioned Kafka topics: pay the
shuffle once at ingest, amortize it over every downstream join and
aggregation on the same key.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> DataFrame:
    """Write ``df`` as a bucketed (+ optionally sorted) catalog table
    and return the re-read table.

    ``num_buckets`` is a layout contract: every table that will join on
    the same key must use the same count for the exchange-free plan to
    apply. Size it so one bucket of the LARGEST participating table is
    a few hundred MB (at 100 TB that is thousands of buckets; the 16 of
    the local tests is the same mechanism at fixture scale).

    ``path=None`` puts the table under ``spark.sql.warehouse.dir``; a
    path makes it external (the data survives dropping the table).
    """
    spark = df.sparkSession
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols is None:
        sort_cols = list(bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", os.path.abspath(path))
    writer.saveAsTable(table)
    return spark.table(table)


def zorder_key(u, v, bits: int = 16):
    """Z-order (Morton) key: interleave the low ``bits`` of two
    non-negative integer columns — the multi-dimensional clustering
    key behind data-skipping layouts (Delta/Iceberg OPTIMIZE ZORDER).

    Sorting a table by z(u, v) before writing makes every output file
    cover a small RECTANGLE in (u, v) space, so min/max file statistics
    prune point/range queries on EITHER dimension — a single-column
    sort only prunes its own column. Pure integer bit arithmetic
    (shift/and/or), bit-identical in any engine.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(u, b).bitwiseAND(F.lit(1)).cast("long"), 2 * b)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(v, b).bitwiseAND(F.lit(1)).cast("long"), 2 * b + 1)
        )
    return z


def sql_zorder_key(u: str, v: str, bits: int = 16) -> str:
    """DuckDB twin of ``zorder_key`` (same shift/and/or chain)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({u} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({v} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"
