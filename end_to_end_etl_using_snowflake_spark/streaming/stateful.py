"""Custom stateful streaming operators (applyInPandasWithState).

The reference achieves correctness by pause+truncate batching, not by
stateful stream processing (SURVEY.md §2.10) — but a training-data
pipeline at 100 TB ingests event streams continuously, so the engine
ships the canonical custom stateful operator: gap sessionization with
per-key state that survives micro-batch boundaries AND query restarts
(state lives in the checkpoint's state store).

Semantics match the batch ``e2_sessionize`` query (plans/queries.py):
a new session starts when a user's inter-event gap exceeds
``gap_seconds``; ``session_id`` is the user's running session count.
Parity holds when events arrive in event-time order per user (the
pause-batching discipline guarantees this for the reference pipelines;
out-of-order arrival would need a watermark + event buffering — noted,
not required by the reference semantics).

Scale: state is one (last_ts, sessions) pair per user — bytes per key;
the state store shuffles by user_id once and every micro-batch touches
only keys present in the batch. Arrow-batched Pandas transfer, no
row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id bigint, event_id bigint, session_id bigint"
STATE_SCHEMA = "last_ts double, sessions bigint"


def sessionize_stream(events: DataFrame, gap_seconds: float = 1800.0):
    """events (streaming DataFrame with user_id, event_id, ts) ->
    streaming (user_id, event_id, session_id).

    Use ``.writeStream.outputMode("append")``; each micro-batch emits
    the session assignment for its own rows.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def assign(key, pdf_iter, state: GroupState):
        last_ts, sessions = state.get if state.exists else (None, 0)
        # a group can span Arrow chunks: concat before sorting so the
        # per-batch event-time order is global to the group
        pdf = pd.concat(list(pdf_iter))
        pdf = pdf.sort_values(["ts", "event_id"])
        sids = []
        for ts in pdf["ts"]:
            t = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
            if last_ts is None or t - last_ts > gap_seconds:
                sessions += 1
            last_ts = t
            sids.append(sessions)
        state.update((last_ts, sessions))
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "session_id": sids,
            }
        )

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            assign,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_counts_stream(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
):
    """Watermarked tumbling-window aggregate — the standard late-data
    streaming shape (the batch twin is ``e1_tumbling_window_agg``).

    The watermark bounds state: windows older than (max event time seen
    - delay) are finalized and evicted; later-arriving rows for them are
    dropped rather than corrupting finalized results. With ``append``
    output mode, a window emits exactly once, when it closes.

    Scale: state is one row per (window, event_type) — the shuffle is
    by group key and the state store holds only open windows, so state
    size is bounded by delay/duration x cardinality(event_type), not by
    the stream length.
    """
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """Streaming exact deduplication bounded by a watermark: the first
    row per key passes, later duplicates arriving within ``delay`` of
    the max seen event time are dropped — across micro-batch boundaries,
    from checkpointed state.

    ``dropDuplicatesWithinWatermark`` is the scale-correct streaming
    dedup: plain ``dropDuplicates`` on a stream keeps EVERY key ever
    seen in the state store (unbounded growth — fatal on a 100 TB
    ingest), while the watermark bound lets the store evict keys older
    than the delay, capping state at (keys per watermark window). The
    trade is explicit: a duplicate arriving later than ``delay`` after
    the original re-emits; size the delay to the source's real
    duplication window (e.g. an at-least-once ingest retry horizon).

    Batch analog (the correctness oracle in the test): latest-wins /
    first-wins dedup per key — operators.merge.dedup_latest.
    """
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_cents) on the Spark 4
    ``transformWithStateInPandas`` arbitrary-state API — the successor
    surface to ``applyInPandasWithState`` (e3 covers that one): a
    ``StatefulProcessor`` with an explicit named ``ValueState``,
    update-mode emission of the running total after every micro-batch.

    GATED CAPABILITY in this sandbox: the TWS Python state server
    speaks protobuf to the JVM, and ``google.protobuf`` is not
    installed here (and installs are disallowed) — the query-level
    registration is therefore withheld; ``tests/`` carries a
    skip-unless-protobuf end-to-end test so the operator activates
    wherever the dependency exists. The e3 ``applyInPandasWithState``
    entry keeps the arbitrary-stateful surface driver-verified.

    This is the streaming MERGE-running-aggregate shape (a live
    per-customer spend counter). State is ONE fixed-width row per key
    in RocksDB — bounded by key cardinality, not stream length; the
    shuffle is the groupBy exchange only. Requires the RocksDB state
    store provider (the API rejects the HDFS-map provider) — callers
    scope ``spark.sql.streaming.stateStore.providerClass``.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, cents BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, cents = self._totals.get()
            else:
                n, cents = 0, 0
            for pdf in rows:
                n += int(len(pdf))
                cents += int(pdf["cents"].sum())
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType="user_id bigint, n_events bigint, total_cents bigint",
            outputMode="Update",
            timeMode="None",
        )
    )


SESSION_CLOSE_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, "
    "start_ts timestamp, end_ts timestamp"
)


def session_close_stream(events: DataFrame, gap_seconds: float = 1800.0):
    """Sessionization that emits CLOSED SESSIONS (one row per session,
    with its aggregates) rather than per-event assignments (e3's
    shape) — which requires the one stateful-API mode e3 doesn't
    exercise: **event-time state timeouts**. A session closes either
    when a later event for the same user exceeds the gap (emitted
    in-batch) or when the WATERMARK passes last_ts + gap with no
    successor (``GroupStateTimeout.EventTimeTimeout`` fires on the
    evicted key — without it, each user's final session would sit in
    state forever). Input must carry ``withWatermark`` on ``ts``.

    ``session_id`` is DERIVED from the session's start time (exact
    epoch microseconds) rather than a per-user counter: a user's
    sessions are disjoint in time, so starts strictly increase and the
    id is unique per user across micro-batches BY CONSTRUCTION. A
    counter would have to survive session closes — ``state.remove()``
    on timeout discarded it, so a user returning in a later micro-batch
    restarted at session_id 1, duplicating (user_id, session_id) keys
    (ADVICE r5); persisting counter rows instead would grow state with
    ALL-TIME users. Start-derived ids need neither: state is one tuple
    per OPEN session, removed outright at close — bounded by ACTIVE
    users, which is what 100 TB streaming state must be.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cols = ["user_id", "session_id", "n_events", "start_ts", "end_ts"]

    def sid_of(start: float) -> int:
        return round(start * 1_000_000)  # exact micros of session start

    def close_sessions(key, pdf_iter, state: GroupState):
        out = []
        if state.hasTimedOut:
            start, last, n = state.get
            out.append((key[0], sid_of(start), n, start, last))
            state.remove()
        else:
            pdf = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
            if state.exists:
                start, last, n = state.get
            else:
                start = last = None
                n = 0
            for ts in pdf["ts"]:
                t = ts.timestamp()
                if last is None:
                    start, last, n = t, t, 1
                elif t - last > gap_seconds:
                    out.append((key[0], sid_of(start), n, start, last))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            state.update((start, last, n))
            # the close deadline: if no successor arrives before the
            # watermark passes last + gap, the session is over
            state.setTimeoutTimestamp(int((last + gap_seconds) * 1000))
        def us(vals):
            # float epoch seconds -> exact integer microseconds; a
            # direct unit="s" conversion leaves stray nanoseconds that
            # Arrow's safe timestamp[us] cast rejects
            return pd.to_datetime(
                pd.Series([round(v * 1_000_000) for v in vals], dtype="int64"),
                unit="us",
            )

        yield pd.DataFrame(
            {
                "user_id": pd.Series([r[0] for r in out], dtype="int64"),
                "session_id": pd.Series([r[1] for r in out], dtype="int64"),
                "n_events": pd.Series([r[2] for r in out], dtype="int64"),
                "start_ts": us([r[3] for r in out]),
                "end_ts": us([r[4] for r in out]),
            },
            columns=cols,
        )

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            close_sessions,
            outputStructType=SESSION_CLOSE_SCHEMA,
            stateStructType="start double, last double, n bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
