"""Stats-driven write planner: pick output file counts from the data,
not from ``spark.sql.shuffle.partitions`` (VERDICT r10 #8 — the
small-files / giant-files story beyond ``compact``).

The reference loads land however the warehouse shards them; a Spark
pipeline that writes a 100 TB fact with the shuffle default produces
either 200 multi-GB files (unreadable parallelism) or millions of KB
files (namenode poison). The planner closes the loop:

1. ``estimated_row_bytes(schema)`` — a JVM column expression summing
   fixed per-type widths and byte lengths of variable-width columns
   (the same arithmetic a columnar writer's memory estimate runs).
2. ``plan_partition_files(df, part_cols, target_bytes)`` — ONE
   partially-aggregated groupBy over the write input: per output
   partition, row count, estimated bytes, and
   ``n_files = max(1, ceil(bytes / target))``.
3. ``apply_write_plan(df, plan, part_cols, key_cols)`` — joins the
   (broadcast, one row per output partition) plan back, assigns each
   row ``__file_id = pmod(xxhash64(key_cols), n_files)``, and
   repartitions on (part_cols, __file_id) so every planned file is
   written by exactly one task. Writing with
   ``partitionBy(*part_cols, "__file_id")`` makes the planned count
   EXACT (hash collisions between groups cannot merge files — a task
   holding two groups still writes two leaf directories), at the cost
   of one extra directory level; readers prune on part_cols unchanged.

Scale posture: the plan is O(output partitions) rows (broadcast);
the estimate never leaves the JVM; the assignment adds ONE shuffle the
write needed anyway to avoid the small-files problem. Estimated bytes
are in-memory row widths, not encoded parquet bytes — callers tune
``target_bytes`` to their observed encoding ratio (the planner's job
is proportionality, which is what file sizing needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fixed in-memory widths per type; variable-width types add byte length
_FIXED_BYTES = {
    T.BooleanType: 1,
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 4,
    T.DateType: 4,
    T.FloatType: 4,
    T.LongType: 8,
    T.DoubleType: 8,
    T.TimestampType: 8,
    T.TimestampNTZType: 8,
    T.DecimalType: 16,
}
_VAR_OVERHEAD = 4  # length prefix for strings/binary/arrays


def _field_bytes(field: T.StructField) -> Column:
    dt = field.dataType
    col = F.col(field.name)
    for klass, width in _FIXED_BYTES.items():
        if isinstance(dt, klass):
            return F.when(col.isNull(), F.lit(0)).otherwise(F.lit(width))
    if isinstance(dt, (T.StringType, T.BinaryType)):
        return F.coalesce(F.octet_length(col), F.lit(0)) + F.when(
            col.isNull(), F.lit(0)
        ).otherwise(F.lit(_VAR_OVERHEAD))
    if isinstance(dt, T.ArrayType):
        elem = dt.elementType
        for klass, width in _FIXED_BYTES.items():
            if isinstance(elem, klass):
                return F.when(col.isNull(), F.lit(0)).otherwise(
                    F.lit(_VAR_OVERHEAD) + F.size(col) * F.lit(width)
                )
    raise ValueError(
        f"write planner cannot estimate width of column {field.name!r}"
        f" of type {dt.simpleString()}"
    )


def estimated_row_bytes(schema: T.StructType) -> Column:
    """Sum of per-column estimated widths — a pure JVM expression
    (stays inside whole-stage codegen; no Python in the path)."""
    total = F.lit(0).cast("long")
    for field in schema.fields:
        total = total + _field_bytes(field).cast("long")
    return total


def plan_partition_files(
    df: DataFrame,
    part_cols: list[str],
    target_bytes: int,
) -> DataFrame:
    """Per output partition: (part_cols..., n_rows, est_bytes, n_files).

    One map-side-combined groupBy over the write input; the result is
    O(partitions) rows. ``n_files = max(1, ceil(est_bytes / target))``
    in exact integer arithmetic (replicable in ANSI SQL)."""
    data_cols = [f for f in df.schema.fields if f.name not in part_cols]
    rb = estimated_row_bytes(T.StructType(data_cols))
    return (
        df.groupBy(*part_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(rb).cast("long").alias("est_bytes"),
        )
        .withColumn(
            "n_files",
            # integer ceil-div via DIV — never through a double quotient
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    f"(est_bytes + {target_bytes - 1}) DIV {target_bytes}"
                ),
            ),
        )
    )


def apply_write_plan(
    df: DataFrame,
    plan: DataFrame,
    part_cols: list[str],
    key_cols: list[str],
) -> DataFrame:
    """Assign each row its planned file and co-locate every planned
    file in exactly one task: broadcast-join the plan (O(partitions)
    rows), ``__file_id = pmod(xxhash64(*key_cols), n_files)``
    (deterministic — reruns produce identical layout), then repartition
    on (part_cols..., __file_id). Write the result with
    ``.write.partitionBy(*part_cols, "__file_id")`` for exact planned
    file counts."""
    planned = df.join(
        F.broadcast(plan.select(*part_cols, "n_files")), part_cols
    ).withColumn(
        "__file_id", F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]),
                            F.col("n_files")),
    ).drop("n_files")
    return planned.repartition(*part_cols, "__file_id")


def plan_compaction_groups(
    manifest: DataFrame,
    file_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """Group EXISTING files into compaction batches of ~``target_bytes``
    — the read-side half of the small-files story (``apply_write_plan``
    prevents new small files; this plans the rewrite of accumulated
    ones, e.g. streaming sink output or years of tiny daily loads).

    Deterministic start-offset binning over the size-DESCENDING file
    stream (first-fit on a sorted stream — the classic compaction
    heuristic): running byte offset ``S`` before each file, group =
    ``S DIV target``. Descending order packs the big files first so
    small files fill the remainders; every group's total is within one
    member file of the target. Ties break on the file id, so reruns
    produce identical groups and the plan is oracle-replicable as one
    window running sum.

    Scale: the input is a FILE MANIFEST — O(files) metadata rows, not
    data — so the single-partition ordered window is bounded by
    manifest size (the zonemap-manifest class of driver-adjacent
    state), never by table bytes. Output: (file, bytes, compact_group).
    """
    return (
        manifest.select(
            F.col(file_col).alias("file"),
            F.col(bytes_col).cast("long").alias("bytes"),
        )
        .withColumn("__end", F.sum("bytes").over(
            Window.orderBy(F.col("bytes").desc(), F.col("file").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
        .select(
            "file",
            "bytes",
            F.expr(f"(__end - bytes) DIV {target_bytes}").alias(
                "compact_group"
            ),
        )
    )
