"""Stream-stream interval join (streaming/joins.py).

Splits the events fixture into a view stream and a click stream, runs
the watermarked interval join as a real availableNow streaming query
across TWO input batches on one checkpoint, and demands exact parity
with the same operator applied to the batch DataFrames — including
pairs whose view arrived in batch 1 and click in batch 2 (join state
must survive the micro-batch boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from end_to_end_etl_using_snowflake_spark.plans.tables import load
from end_to_end_etl_using_snowflake_spark.streaming.joins import interval_join

from .conftest import SF_SMALL

EVENT_SCHEMA = "event_id bigint, user_id bigint, ts timestamp, value double"


def test_interval_join_stream_matches_batch(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sjoin")
    views_dir, clicks_dir = str(base / "views"), str(base / "clicks")
    out_dir, ckpt = str(base / "out"), str(base / "ckpt")

    events = load(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    tagged = load(spark, SF_SMALL, "events")
    views = events.join(
        tagged.filter(F.col("event_type") == "view").select("event_id"), "event_id"
    )
    clicks = events.join(
        tagged.filter(F.col("event_type") == "click").select("event_id"), "event_id"
    )
    # two arrival batches per side, split on event time so some pairs
    # straddle the boundary (view lands in b1, its click in b2)
    split = events.selectExpr(
        "percentile_approx(cast(cast(ts as timestamp) as double), 0.5)"
    ).collect()[0][0]
    for df, d in ((views, views_dir), (clicks, clicks_dir)):
        os.makedirs(d)
        df.filter(F.col("ts").cast("timestamp").cast("double") <= split).coalesce(1).write.parquet(
            d + "/b1"
        )

    def run():
        vs = spark.readStream.schema(EVENT_SCHEMA).option(
            "pathGlobFilter", "*.parquet"
        ).parquet(views_dir + "/*")
        cs = spark.readStream.schema(EVENT_SCHEMA).option(
            "pathGlobFilter", "*.parquet"
        ).parquet(clicks_dir + "/*")
        q = (
            interval_join(vs, cs, max_delay_seconds=86400)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert not q.isActive

    run()  # batch 1 only
    for df, d in ((views, views_dir), (clicks, clicks_dir)):
        df.filter(F.col("ts").cast("timestamp").cast("double") > split).coalesce(1).write.parquet(
            d + "/b2"
        )
    run()  # batch 2: must also emit cross-batch pairs from retained state

    got = spark.read.parquet(out_dir)
    want = interval_join(views, clicks, max_delay_seconds=86400)
    assert sorted(map(tuple, got.select(*want.columns).collect())) == sorted(
        map(tuple, want.collect())
    )
    assert want.count() > 0  # non-vacuous: the window actually matches pairs
    # and some matched pairs straddled the arrival boundary
    straddle = want.filter(
        (F.col("l_ts").cast("timestamp").cast("double") <= split) & (F.col("r_ts").cast("timestamp").cast("double") > split)
    ).count()
    assert straddle > 0
