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

        ts_values: list[int] = []
        for pdf in pdfs:
            ts_values.extend(_epoch(pdf[ts_col]).tolist())
        ts_values.sort()

        if state.exists:
            ss, lt, n = state.get
        else:
            ss = lt = None
            n = 0
        closed = []
        for t in ts_values:
            if lt is None:
                ss, lt, n = t, t, 1
            elif t - lt > gap_sec:
                closed.append((user_id, ss, lt, n, "gap"))
                ss, lt, n = t, t, 1
            else:
                lt = t
                n += 1
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
