"""Watermark-bounded streaming dedup (streaming/stateful.py).

Two availableNow drains on one checkpoint:

- batch 1: the time-earlier half of the events, each row sent twice ->
  exactly one row per key comes out (in-batch dedup);
- batch 2: re-sends of recent batch-1 rows (duplicates within the
  watermark delay, crossing the micro-batch/restart boundary) plus the
  time-later half (on-time new keys) -> re-sends are dropped from
  checkpointed state, new keys pass.

Splitting by event time matters: the watermark advances to
max(ts) - delay after batch 1, so batch-2 rows must not sit behind it
(they would be dropped as LATE, which is watermark semantics, not
dedup).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from end_to_end_etl_using_snowflake_spark.plans.tables import load
from end_to_end_etl_using_snowflake_spark.streaming.stateful import (
    dedup_within_watermark_stream,
)

from .conftest import SF_SMALL

IN_SCHEMA = "event_id bigint, user_id bigint, ts timestamp, value double"


def _drain(spark, in_glob: str, out_dir: str, ckpt: str) -> None:
    stream = spark.readStream.schema(IN_SCHEMA).parquet(in_glob)
    q = (
        dedup_within_watermark_stream(stream, ["event_id"], "ts", "2 hours")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_streaming_dedup_within_watermark(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream_dedup")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    os.makedirs(in_dir)

    events = load(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    split = events.selectExpr(
        "percentile_approx(cast(cast(ts as timestamp) as double), 0.5)"
    ).collect()[0][0]
    epoch = F.col("ts").cast("timestamp").cast("double")
    early = events.filter(epoch <= split)
    late_half = events.filter(epoch > split)
    # re-send only rows within the watermark delay of batch 1's max ts,
    # so they are duplicates (in-state), not late rows
    resend = early.filter(epoch > split - 3600)
    assert resend.count() > 0

    # batch 1: early half, every row twice
    early.unionByName(early).coalesce(1).write.parquet(in_dir + "/b1")
    _drain(spark, in_dir + "/b*", out_dir, ckpt)
    out1 = spark.read.schema(IN_SCHEMA).parquet(out_dir)
    assert out1.count() == early.count()
    assert out1.select("event_id").distinct().count() == early.count()

    # batch 2: recent re-sends + the on-time later half
    resend.unionByName(late_half).coalesce(1).write.parquet(in_dir + "/b2")
    _drain(spark, in_dir + "/b*", out_dir, ckpt)
    out2 = spark.read.schema(IN_SCHEMA).parquet(out_dir)
    # every key exactly once: re-sends died in checkpointed state
    assert out2.count() == events.count()
    assert out2.select("event_id").distinct().count() == events.count()
