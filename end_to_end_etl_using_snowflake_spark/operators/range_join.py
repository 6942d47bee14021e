"""Range (point-in-interval) join — an engine extension the reference
lacks but event/feature pipelines need: match each point row to every
interval row with ``start <= ts < end``, with no equi key.

Spark plans a bare inequality join as BroadcastNestedLoopJoin —
O(|P| x |I|) compared pairs, hopeless at 100 TB. The scalable
formulation is **bin bucketing** (the same trick DuckDB's IEJoin and
range-join optimizations in Delta/Databricks apply conceptually):

    points:    bucket = floor(ts / B)                    (one row each)
    intervals: explode to every bucket the interval overlaps
               (sequence(floor(start/B), floor(end/B)))
    equi-join on bucket  ->  residual start <= ts < end

Each (point, interval) match is found in exactly ONE bucket (the
point's), so no post-dedup is needed. The equi-join shuffles on the
bucket key, partial-agg-prunes nothing, and AQE handles bucket skew.
Bucket width B trades interval fan-out (wide intervals explode into
end-start / B rows) against bucket selectivity; pick B near the median
interval length so fan-out stays O(1) per interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows on ``start <= ts < end``.

    ``points`` and ``intervals`` must have disjoint column names apart
    from the join columns being compared. Returns points x matching
    intervals with all columns of both (bucket machinery dropped).
    ``how="left"`` keeps unmatched points (interval columns NULL).
    """
    b = F.lit(bucket_seconds).cast("long")

    def _epoch(c: str):
        # NTZ-safe epoch seconds: TIMESTAMP_NTZ cannot cast straight to
        # double; route through TIMESTAMP (identity under a UTC session,
        # which both the engine and the driver run)
        return F.col(c).cast("timestamp").cast("double")

    p = points.withColumn("__bucket", F.floor(_epoch(ts_col) / b))
    i = intervals.withColumn(
        "__buckets",
        F.sequence(
            F.floor(_epoch(start_col) / b),
            F.floor(_epoch(end_col) / b),
        ),
    ).withColumn("__bucket", F.explode(F.col("__buckets"))).drop("__buckets")
    residual = (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
    if how == "inner":
        return p.join(i, on=["__bucket"], how="inner").filter(residual).drop("__bucket")
    if how == "left":
        matched = p.join(i, on=["__bucket"], how="inner").filter(residual).drop("__bucket")
        unmatched = p.drop("__bucket").join(
            matched.select(*points.columns), on=list(points.columns), how="left_anti"
        )
        for c in intervals.columns:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}")
