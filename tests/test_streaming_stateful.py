"""Stateful streaming sessionization (streaming/stateful.py).

Proves the two properties that make it a real stateful operator:

1. streaming/batch parity — run the stream over the events table (split
   into two files) and the output equals the batch LAG+running-sum
   sessionization (the e2_sessionize shape) on the combined data;
2. state survives a query RESTART — batch 2 runs as a new query on the
   same checkpoint, and sessions keep numbering from batch 1's state
   (not from 1), i.e. state came from the state store, not the data.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from end_to_end_etl_using_snowflake_spark.plans.tables import load
from end_to_end_etl_using_snowflake_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
    sessionize_stream,
)

from .conftest import SF_SMALL

GAP = 1800.0


def batch_sessionize(events):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_session",
        F.when(
            (F.col("ts").cast("timestamp").cast("double") - F.lag(F.col("ts")).over(w).cast("timestamp").cast("double") > GAP)
            | F.lag(F.col("ts")).over(w).isNull(),
            1,
        ).otherwise(0),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )


def run_stream(spark, in_dir: str, out_dir: str, ckpt: str) -> None:
    stream = (
        spark.readStream.schema("user_id bigint, event_id bigint, ts timestamp")
        .parquet(in_dir)
    )
    q = (
        sessionize_stream(stream, gap_seconds=GAP)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("sessionize")
    d = {k: str(base / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"], exist_ok=True)
    return d


def test_streaming_sessionize_matches_batch_and_survives_restart(spark, dirs):
    events = load(spark, SF_SMALL, "events").select("user_id", "event_id", "ts")
    split_ts = events.selectExpr("percentile_approx(cast(cast(ts as timestamp) as double), 0.5)").collect()[0][0]

    # batch 1: first half by event time, as one file in the stream dir
    events.filter(F.col("ts").cast("timestamp").cast("double") <= split_ts).coalesce(1).write.mode(
        "overwrite"
    ).parquet(dirs["in"] + "/batch1")
    run_stream(spark, dirs["in"] + "/batch*", dirs["out"], dirs["ckpt"])
    n_after_b1 = spark.read.schema(OUTPUT_SCHEMA).parquet(dirs["out"]).count()
    assert n_after_b1 > 0

    # batch 2: second half lands; NEW query, same checkpoint -> state restore
    events.filter(F.col("ts").cast("timestamp").cast("double") > split_ts).coalesce(1).write.mode(
        "overwrite"
    ).parquet(dirs["in"] + "/batch2")
    run_stream(spark, dirs["in"] + "/batch*", dirs["out"], dirs["ckpt"])

    got = spark.read.schema(OUTPUT_SCHEMA).parquet(dirs["out"])
    assert got.count() == events.count()

    expect = batch_sessionize(events)
    # exact parity: same (user_id, event_id) -> session_id assignment
    diff = (
        got.alias("g")
        .join(expect.alias("e"), ["user_id", "event_id"], "full_outer")
        .filter(
            F.col("g.session_id").isNull()
            | F.col("e.session_id").isNull()
            | (F.col("g.session_id") != F.col("e.session_id"))
        )
    )
    assert diff.count() == 0

    # restart-continuity: some user in batch 2 continues a batch-1 session
    # (session_id > 1 for their first batch-2 event) or at minimum no user
    # restarted numbering below their batch-1 max
    max_b1 = (
        got.join(
            events.filter(F.col("ts").cast("timestamp").cast("double") <= split_ts).select("event_id"),
            "event_id",
            "left_semi",
        )
        .groupBy("user_id")
        .agg(F.max("session_id").alias("m1"))
    )
    min_b2 = (
        got.join(
            events.filter(F.col("ts").cast("timestamp").cast("double") > split_ts).select("event_id"),
            "event_id",
            "left_semi",
        )
        .groupBy("user_id")
        .agg(F.min("session_id").alias("m2"))
    )
    regressions = max_b1.join(min_b2, "user_id").filter(F.col("m2") < F.col("m1"))
    assert regressions.count() == 0


def test_transform_with_state_running_totals(spark, tmp_path):
    """Spark 4 transformWithStateInPandas running totals: multiple real
    micro-batches (maxFilesPerTrigger=1), RocksDB state, final
    latest-per-user emission equals the batch GROUP BY. Skips where
    google.protobuf is unavailable (the TWS python state server
    requires it; this sandbox disallows installs)."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from end_to_end_etl_using_snowflake_spark.streaming.stateful import (
        running_totals_stream,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    rows = [(u, c) for u in range(5) for c in range(10 * (u + 1), 10 * (u + 1) + 4)]
    df = spark.createDataFrame(rows, "user_id bigint, cents bigint")
    df.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(in_dir)
    df.filter(F.col("user_id") % 2 == 1).coalesce(1).write.mode("append").parquet(in_dir)
    stream = (
        spark.readStream.schema("user_id bigint, cents bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        q = (
            running_totals_stream(stream)
            .writeStream.foreachBatch(
                lambda bdf, _bid: bdf.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    from pyspark.sql import Window

    emitted = spark.read.schema(
        "user_id bigint, n_events bigint, total_cents bigint"
    ).parquet(out_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    expect = {
        r["user_id"]: (r["n"], r["s"])
        for r in df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        .collect()
    }
    assert final == expect


def test_sessionize_stream_on_rocksdb_state_store(spark, tmp_path):
    """The e3 stateful sessionizer on the PRODUCTION state store
    (RocksDB): at 100 TB state sizes the default HDFS-backed in-memory
    map provider OOMs executors, so the engine must run (and restart
    from checkpoint) on RocksDB. Same availableNow drain, same
    output — only the provider differs."""
    from pyspark.sql import functions as F

    from end_to_end_etl_using_snowflake_spark.streaming.stateful import (
        OUTPUT_SCHEMA,
        sessionize_stream,
    )

    rows = []
    for u in range(3):
        base = 1_600_000_000 + u * 100_000
        for i in range(6):
            # two sessions per user: 3 events 10 s apart, 1 h gap, 3 more
            rows.append((u, u * 10 + i, base + (i % 3) * 10 + (i // 3) * 3600))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts long").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    in_dir = str(tmp_path / "in")
    df.write.parquet(in_dir)
    stream = spark.readStream.schema(
        "user_id bigint, event_id bigint, ts timestamp"
    ).parquet(in_dir)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        q = (
            sessionize_stream(stream, gap_seconds=1800.0)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    out = spark.read.schema(OUTPUT_SCHEMA).parquet(str(tmp_path / "out"))
    got = {
        (r["user_id"], r["event_id"]): r["session_id"] for r in out.collect()
    }
    assert len(got) == 18
    for u in range(3):
        # first 3 events -> session 1, last 3 -> session 2, per user
        assert {got[(u, u * 10 + i)] for i in range(3)} == {1}
        assert {got[(u, u * 10 + i)] for i in range(3, 6)} == {2}


def test_session_close_ids_unique_across_micro_batches(spark, tmp_path):
    """ADVICE r5: a user whose session closes by EVENT-TIME TIMEOUT and
    who then RETURNS in a later micro-batch must not reuse a session_id
    (the old per-user counter died with state.remove()). Ids are now
    derived from the session start (epoch micros), so this drives two
    real micro-batches (maxFilesPerTrigger=1) where user 1's first
    session times out before their second session's events arrive, and
    asserts key uniqueness + exact aggregates."""
    import datetime

    from end_to_end_etl_using_snowflake_spark.streaming.stateful import (
        SESSION_CLOSE_SCHEMA,
        session_close_stream,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda m: t0 + datetime.timedelta(minutes=m)
    # batch 1: user 1 session A (2 events), plus a watermark-driver row
    # from user 2 far enough ahead that session A's close deadline
    # (last + 30 min) is passed once batch 1 commits.
    batch1 = [(1, 10, s(0)), (1, 11, s(10)), (2, 20, s(120))]
    # batch 2: user 1 returns 3 h later (session B), sentinel user -1
    # pushes the watermark past session B's deadline so it also closes.
    batch2 = [(1, 12, s(180)), (1, 13, s(185)), (-1, -1, s(600))]
    schema = "user_id bigint, event_id bigint, ts timestamp"
    indir = str(tmp_path / "in")
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(indir + "/b1")
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(
        indir + "/b2"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(indir + "/b*")
        .withWatermark("ts", "0 seconds")
    )
    q = (
        session_close_stream(stream, gap_seconds=1800.0)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.read.schema(SESSION_CLOSE_SCHEMA)
        .parquet(str(tmp_path / "out"))
        .filter(F.col("user_id") == 1)
        .collect()
    )
    by_key = {(r.user_id, r.session_id): (r.n_events, r.start_ts, r.end_ts) for r in got}
    assert len(got) == 2, f"expected 2 closed sessions for user 1, got {got}"
    assert len(by_key) == 2, f"duplicate (user_id, session_id) keys: {got}"
    us = lambda dt: round(dt.timestamp() * 1_000_000)
    assert by_key[(1, us(s(0)))] == (2, s(0), s(10))
    assert by_key[(1, us(s(180)))] == (2, s(180), s(185))
