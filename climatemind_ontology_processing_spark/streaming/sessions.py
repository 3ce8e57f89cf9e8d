"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (§2.9 / task brief "applyInPandasWithState for
custom stateful operators").

The batch engine already answers gap sessionization with a lag window
(``__spark_entry__._q_user_sessions``); this is the STREAMING shape for the
same semantics: per-user state carries the open session (start, last event
time, count); a session closes either

* ``closed_by='gap'`` — the same user's next event arrives more than
  ``gap_sec`` later (emitted inline, exactly once, as soon as observed), or
* ``closed_by='timeout'`` — the event-time watermark passes
  ``last_ts + gap_sec`` with no new event (emitted by the state timeout).

State is per user-key (Spark shuffles by key and keeps state in the state
store); arbitrary numbers of users scale horizontally.  The pandas function
receives Arrow batches — no per-row Python in the hot path beyond the
per-event fold, which is the irreducible stateful logic.

Late-data semantics: events that arrive in a later micro-batch but are still
inside the watermark may precede the stored session (t < last_ts, or even
t < session_start).  The fold is interval-merge, not last-event-append: the
open session is one interval, every event is a 1-point interval, and sorted
neighbours within ``gap_sec`` merge — so a late event extends the open
session backwards (start = min), never drags its end backwards, and a late
event more than ``gap_sec`` before the open session forms its own gap-closed
session.  Batch/streaming equivalence therefore holds in exactly the
late-data case the watermark admits.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = ("user_id bigint, session_start bigint, "
                         "session_end bigint, n_events bigint, closed_by string")
SESSION_STATE_SCHEMA = "session_start bigint, last_ts bigint, n_events bigint"


def _epoch(series: pd.Series) -> pd.Series:
    # normalize to ns first: Arrow may deliver datetime64 at us resolution,
    # where a raw int64 view would be off by 1000x
    ns = pd.to_datetime(series).astype("datetime64[ns]").astype("int64")
    return (ns // 1_000_000_000).astype("int64")


def sessionize_stream(events: DataFrame, gap_sec: int = 1800,
                      ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Streaming DataFrame[user_id, ts, ...] -> appended closed sessions
    (user_id, session_start epoch, session_end epoch, n_events, closed_by).
    Epoch-seconds output keeps the schema timezone-free and oracle-friendly.
    """

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = ["user_id", "session_start", "session_end", "n_events",
                "closed_by"]
        if state.hasTimedOut:
            ss, lt, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, ss, lt, n, "timeout")], columns=cols)
            return

        # Interval-merge fold, robust to LATE in-watermark events: a later
        # micro-batch may deliver t < the stored last_ts (or even < the stored
        # session_start).  A naive "t - last > gap" fold would drag
        # session_end backwards or emit start > end.  Instead treat every
        # event as a 1-point interval, add the open session from state as an
        # interval, sort, and merge neighbours within gap_sec.  All merged
        # intervals except the newest are gap-closed; the newest stays open.
        intervals: list[tuple[int, int, int]] = []
        for pdf in pdfs:
            intervals.extend((t, t, 1) for t in _epoch(pdf[ts_col]).tolist())
        if state.exists:
            ss, lt, n = state.get
            intervals.append((ss, lt, n))
        if not intervals:          # defensive: no data, no timeout — no-op
            return
        intervals.sort()
        merged: list[list[int]] = []
        for s, e, c in intervals:
            if merged and s - merged[-1][1] <= gap_sec:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += c
            else:
                merged.append([s, e, c])
        closed = [(user_id, s, e, c, "gap") for s, e, c in merged[:-1]]
        ss, lt, n = merged[-1]
        state.update((ss, lt, n))
        # close the open session when the watermark passes last_ts + gap
        state.setTimeoutTimestamp((lt + gap_sec) * 1000)
        yield pd.DataFrame(closed, columns=cols)

    return (events
            .withWatermark(ts_col, f"{gap_sec} seconds")
            .groupBy(user_col)
            .applyInPandasWithState(
                fn, SESSION_OUTPUT_SCHEMA, SESSION_STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
