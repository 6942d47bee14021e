"""As-of (nearest-prior) join — an engine extension the reference lacks
but large-scale event/feature pipelines constantly need: for each left
row, the single right row with the greatest ``right_ts <= left_ts`` per
key (e.g. join each event to the feature snapshot in force at the
time).

Spark has no native ASOF JOIN; the scalable formulation is union +
window, NOT a range self-join:

    tag left/right -> union -> window per key ordered by (ts, side)
    -> last(right payload, ignorenulls) carries the most recent right
    row forward -> keep left rows.

One shuffle + sort per key (exactly what a sort-merge join would pay),
zero row multiplication — a range-condition join would explode to
|L| x |R| pairs per key before filtering. Right rows must be unique
per (key, ts); dedup first (``dedup_latest``) or results would be
nondeterministic (DuckDB's ASOF has the same contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIDE_COL = "__is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns every ``left`` row plus ``payload_cols`` from the matched
    right row (null if no right row at or before, and ``how='left'``;
    ``how='inner'`` drops unmatched). ``on`` + ``ts_col`` must share
    names across both sides; left columns pass through untouched.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left/inner, got {how!r}")
    on = list(on)
    lcols = left.columns
    l = left.withColumn(SIDE_COL, F.lit(1))
    for c in payload_cols:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        *on, ts_col, *payload_cols
    ).withColumn(SIDE_COL, F.lit(0))
    for c in lcols:
        if c not in on and c != ts_col and c not in payload_cols:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.unionByName(r.select(*l.columns))
    # right rows sort BEFORE left rows at equal ts -> inclusive (>=)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col(SIDE_COL).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        SIDE_COL,
        *[
            F.last(F.when(F.col(SIDE_COL) == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in payload_cols
        ],
    )
    out = carried.filter(F.col(SIDE_COL) == 1).select(
        *[c for c in lcols if c not in payload_cols],
        *[F.col(f"__asof_{c}").alias(c) for c in payload_cols],
    )
    if how == "inner":
        out = out.filter(F.col(payload_cols[0]).isNotNull())
    return out
