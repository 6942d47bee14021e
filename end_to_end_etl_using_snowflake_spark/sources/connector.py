"""External source/sink connector seam.

The reference's storage boundary is S3 + Snowflake (architecture
diagram: CSV -> S3 -> SQS -> Snowpipe -> warehouse; README.md:21-33).
This engine is filesystem-Parquet in this sandbox (no network), but
every table access goes through ``plans.catalog.ManagedTable`` /
``operators.dml.ParquetTable``, so swapping the physical layer means
implementing ONE narrow protocol — this module documents and pins that
seam.

Design rules the engine relies on (what an implementation must honor):

- ``read()`` returns a DataFrame of exactly ``schema`` (schema drift is
  the implementation's problem, not the caller's);
- ``overwrite()`` is ATOMIC from a reader's point of view (the Parquet
  implementation stages to a temp dir and renames; a warehouse-backed
  implementation gets this from its own transactions);
- writes are idempotent per batch — the MERGE state equation re-applied
  after a crash must converge (operators/merge.py docstring);
- partition pruning: ``read()`` must push partition filters down
  (DataSource V2 / JDBC predicate pushdown), because the 100 TB plans
  assume `order_date`-partition pruning is free.

``jdbc_reader_options`` builds the canonical Spark JDBC source options
for a warehouse-backed landing zone. It is construction-only here —
this environment has no network and no JDBC driver jar, so nothing in
the engine calls ``.load()`` on it; tests pin the option names so the
seam stays correct against the public Spark JDBC contract
(``format("jdbc")``, partitioned parallel reads via
partitionColumn/lowerBound/upperBound/numPartitions, predicate
pushdown via ``pushDownPredicate``).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession


@runtime_checkable
class TableConnector(Protocol):
    """The seam every storage backend implements (structural typing —
    ``ParquetTable`` already satisfies it without inheriting)."""

    def read(self) -> DataFrame: ...

    def overwrite(self, df: DataFrame) -> None: ...

    def append(self, df: DataFrame) -> None: ...


def jdbc_reader_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Spark JDBC source options for a parallel partitioned warehouse
    read — the shape a production deployment uses to land an external
    warehouse table into the stage layer.

    Without a partition column, a JDBC read is ONE task pulling the
    whole table through one connection — the classic ingest bottleneck;
    with (column, bounds, numPartitions) Spark issues numPartitions
    range-bounded queries in parallel. ``fetchsize`` keeps the driver-
    side row buffering bounded. Credentials deliberately NOT modeled
    here: pass them via the cluster's secret mechanism, never literals.
    """
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
        "pushDownPredicate": "true",
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def jdbc_reader(spark: SparkSession, **kwargs):
    """DataFrameReader wired with ``jdbc_reader_options`` (not loaded —
    call ``.load()`` where a JDBC driver and network exist)."""
    return spark.read.format("jdbc").options(**jdbc_reader_options(**kwargs))
