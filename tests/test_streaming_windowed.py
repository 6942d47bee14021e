"""Watermarked windowed aggregation (streaming/stateful.py).

Runs the stream twice on one checkpoint:

- batch 1: all events up to a split point -> windows more than the
  watermark delay behind the max seen event time close and emit;
- batch 2: the rest of the events PLUS one late row whose window
  already closed -> the late row must be dropped (not re-emit or
  corrupt the closed window), newer windows emit on close.

Emitted windows must match the batch aggregate restricted to on-time
rows — exactly once each.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from end_to_end_etl_using_snowflake_spark.plans.tables import load
from end_to_end_etl_using_snowflake_spark.streaming.stateful import windowed_counts_stream

from .conftest import SF_SMALL

OUT_SCHEMA = "window_start timestamp, event_type string, n_events bigint, total_value double"


def run_stream(spark, in_glob: str, out_dir: str, ckpt: str) -> None:
    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, ts timestamp, "
                                "event_type string, value double")
        .parquet(in_glob)
    )
    q = (
        windowed_counts_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_watermarked_windows_emit_once_and_drop_late_rows(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("windowed")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    os.makedirs(in_dir)

    events = load(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    split = events.selectExpr("percentile_approx(cast(cast(ts as timestamp) as double), 0.5)").collect()[0][0]

    b1 = events.filter(F.col("ts").cast("timestamp").cast("double") <= split)
    b2 = events.filter(F.col("ts").cast("timestamp").cast("double") > split)
    b1.coalesce(1).write.parquet(in_dir + "/b1")
    run_stream(spark, in_dir + "/b*", out_dir, ckpt)

    # batch 2 = rest + one LATE duplicate of the earliest event (its
    # window closed in batch 1 if the watermark advanced past it)
    late = events.orderBy("ts").limit(1).withColumn("event_id", F.lit(-1))
    b2.unionByName(late).coalesce(1).write.parquet(in_dir + "/b2")
    run_stream(spark, in_dir + "/b*", out_dir, ckpt)

    got = spark.read.schema(OUT_SCHEMA).parquet(out_dir)

    # exactly-once: no (window, type) emitted twice
    dup = got.groupBy("window_start", "event_type").count().filter(F.col("count") > 1)
    assert dup.count() == 0

    # every emitted window matches the batch aggregate over ON-TIME rows
    # (the late duplicate must not have been counted)
    expect = (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    joined = got.alias("g").join(expect.alias("e"), ["window_start", "event_type"], "inner")
    mism = joined.filter(
        (F.col("g.n_events") != F.col("e.n_events"))
        | (F.col("g.total_value") != F.col("e.total_value"))
    )
    assert mism.count() == 0, mism.collect()[:5]
    # and the stream did emit a nontrivial number of closed windows
    assert got.count() > 0


def test_stream_static_join_enriches_microbatches(spark, tmp_path_factory):
    """Stream-static join (streaming enrichment): a file-source event
    stream joined per micro-batch against a static dimension. The
    static side re-resolves each batch (so a dim refresh between
    batches is picked up — Snowflake-stream-era semantics); with the
    dim under the broadcast threshold the join never shuffles the
    stream. Output must equal the batch join exactly."""
    base = tmp_path_factory.mktemp("ss_join")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    events = load(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    events.coalesce(2).write.parquet(in_dir)

    dim = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("seg_"), F.col("id") % 5).alias("segment"),
    )

    stream = spark.readStream.schema(
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double"
    ).parquet(in_dir)
    q = (
        stream.join(F.broadcast(dim), "user_id")
        .select("event_id", "user_id", "segment")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive

    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    want = sorted(
        tuple(r)
        for r in events.join(dim, "user_id")
        .select("event_id", "user_id", "segment")
        .collect()
    )
    assert got == want and len(got) > 0
