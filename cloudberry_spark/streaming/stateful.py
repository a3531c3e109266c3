"""Custom stateful streaming operator: sessionization with
``applyInPandasWithState`` (SURVEY.md §2.10 superset).

The reference has no stateful stream processing at all — its session
analysis would be the batch gaps-and-islands SQL (window lag + running
sum). Here the same semantics run as an *online* operator: per-user
session state lives in the state store, updated per micro-batch, so at
100 TB/day the engine sessionizes without ever holding a user's history
— only open sessions — in memory.

Semantics match ``session_window(ts, gap)`` exactly (verified against
the same DuckDB oracle): a session ends when the next event is >= gap
later; session end = last event + gap.

State layout per user: (starts, ends, counts, sums) of OPEN sessions
(in practice ≤1 open session once watermark culling runs; the list form
keeps the merge correct when a batch straddles several sessions).
Emission policy: update-mode — every batch emits that user's current
session set; the final batch's emission is the converged answer.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cloudberry_spark.registry import register
from cloudberry_spark.streaming.windows import run_stream_once, stream_events

GAP_SECONDS = 3600
#: All session arithmetic is integer microseconds — float seconds would
#: round the µs-precision fixture timestamps and break bit-exact oracle
#: comparison.
GAP_US = GAP_SECONDS * 1_000_000

OUT_SCHEMA = (
    "user_id long, sess_start timestamp, sess_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "starts array<long>, ends array<long>, counts array<long>, sums array<double>"


def _merge_sessions(sessions: list[list[Any]], ts: int, value: float) -> None:
    """Fold one event (epoch-µs ts) into the open-session list.
    Sessions are [start, last_ts, count, sum] sorted by start."""
    for s in sessions:
        # Belongs to an existing session iff within gap of its span.
        if s[0] - GAP_US < ts < s[1] + GAP_US:
            s[0] = min(s[0], ts)
            s[1] = max(s[1], ts)
            s[2] += 1
            s[3] += value
            return
    sessions.append([ts, ts, 1, value])
    sessions.sort(key=lambda x: x[0])
    # Coalesce overlaps created by out-of-order arrival.
    i = 0
    while i + 1 < len(sessions):
        a, b = sessions[i], sessions[i + 1]
        if b[0] < a[1] + GAP_US:
            a[1] = max(a[1], b[1])
            a[2] += b[2]
            a[3] += b[3]
            del sessions[i + 1]
        else:
            i += 1


def sessionize(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState body: fold batch events into session state,
    emit the user's full current session set (update semantics)."""
    if state.exists:
        starts, ends, counts, sums = state.get
        sessions = [list(t) for t in zip(starts, ends, counts, sums)]
    else:
        sessions = []
    for pdf in pdfs:
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        for ts, value in zip(ts_us, pdf["value"]):
            _merge_sessions(sessions, int(ts), float(value))
    state.update(
        (
            [s[0] for s in sessions],
            [s[1] for s in sessions],
            [s[2] for s in sessions],
            [s[3] for s in sessions],
        )
    )
    (user_id,) = key
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "sess_start": [pd.Timestamp(s[0], unit="us") for s in sessions],
            "sess_end": [
                pd.Timestamp(s[1] + GAP_US, unit="us") for s in sessions
            ],
            "n_events": [s[2] for s in sessions],
            "sum_value": [s[3] for s in sessions],
        }
    )


@register(
    "stream_stateful_sessionize",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
            SELECT *, sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS sess_start,
               max(ts) + INTERVAL 1 HOUR AS sess_end,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM numbered
        GROUP BY user_id, sess_id
    """,
    doc="Online sessionization via applyInPandasWithState: per-user open-"
    "session state in the state store; converged output equals the "
    "batch session_window()/gaps-and-islands result.",
    tags=("streaming", "stateful", "session", "events"),
)
def stream_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).select("user_id", "ts", "value")
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_stream_once(sessions, "update")
    # Update-mode emissions accumulate; the last emission per (user,
    # session-start) is the converged session. Sessions that grew only
    # ever extend end/count, so max() selects the final version.
    return (
        out.groupBy("user_id", "sess_start")
        .agg(
            F.max("sess_end").alias("sess_end"),
            F.max("n_events").alias("n_events"),
            F.round(F.max("sum_value"), 4).alias("sum_value"),
        )
        .select("user_id", "sess_start", "sess_end", "n_events", "sum_value")
    )
