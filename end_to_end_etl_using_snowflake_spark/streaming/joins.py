"""Stream-stream interval join (Structured Streaming).

The reference has no stream-stream join — its two-sided flows are
stream-vs-TABLE reads inside a task cycle (SURVEY.md §2.10). A
continuous training-data pipeline needs the real thing: attribute one
event stream to another (view -> click, impression -> conversion)
while BOTH sides are unbounded.

Spark's model: watermark both inputs, bound the match window with an
event-time interval in the join condition, and the state store keeps
only rows that can still find a partner — state for a left row is
dropped once the right watermark passes ``left_ts + max_delay``; an
unbounded join condition would grow state forever, so this operator
refuses to build one.

Scale: one shuffle per side on the join key; per-key state is bounded
by (watermark delay + interval width) x arrival rate, independent of
total stream length. Inner-join matches emit eagerly (no watermark
wait on the emit path); outer variants emit unmatched rows only when
the watermark closes their window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay_seconds: int = 600,
    watermark_delay: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events that occur within
    ``[left_ts, left_ts + max_delay_seconds]`` of a same-key left event.

    Both inputs must carry event-time columns; every non-key column is
    prefixed ``l_``/``r_`` so the output schema is unambiguous. Works
    on batch DataFrames too (same expression tree, no watermark
    needed) — the streaming/batch parity test leans on that.
    """
    streaming = left.isStreaming or right.isStreaming
    lw = left.withWatermark(left_ts, watermark_delay) if streaming else left
    rw = right.withWatermark(right_ts, watermark_delay) if streaming else right
    lp = lw.select(
        F.col(key),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != key],
    )
    rp = rw.select(
        F.col(key).alias("__rkey"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    )
    lcol, rcol = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (rcol >= lcol)
        & (rcol <= lcol + F.expr(f"INTERVAL {max_delay_seconds} SECONDS"))
    )
    # coalesce keeps the key populated on right-unmatched rows under
    # full_outer (inner/left rows always carry the left key, so this
    # is identity for them)
    return (
        lp.join(rp, cond, how)
        .withColumn(key, F.coalesce(F.col(key), F.col("__rkey")))
        .drop("__rkey")
    )
