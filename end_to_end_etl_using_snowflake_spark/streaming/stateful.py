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
