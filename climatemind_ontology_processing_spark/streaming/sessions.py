"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (§2.9 / task brief "applyInPandasWithState for
custom stateful operators").

The batch engine already answers gap sessionization with a lag window
(``__spark_entry__._q_user_sessions``); this is the STREAMING shape for the
same semantics, with WATERMARK-GATED emission so the streamed output equals
the batch result over the same events:

* per-user state carries the list of pending (start, end, count) session
  intervals, merged with each batch's events (interval-merge fold: late
  in-watermark events may precede — even bridge — stored intervals; sorted
  neighbours within ``gap_sec`` merge, so session_end never moves backwards
  and start > end is impossible);
* a session is EMITTED only once the event-time watermark passes
  ``session_end + gap_sec`` — before that, an admissible late event could
  still merge into it, so eager emission would split sessions a batch run
  would have joined (the round-2 advisor's late-data corruption, taken to
  its conclusion).  ``closed_by='gap'`` when a later pending interval for
  the same user already exists at emit time (the gap was observed),
  ``'timeout'`` when the watermark alone closed it;
* the state timeout fires at the earliest pending ``end + gap_sec`` so
  idle users flush without new events.

Guarantee: once the watermark passes every event, emitted sessions are
EXACTLY the batch sessionization of the delivered (in-watermark) events —
pinned by the associativity property test (``merge_intervals``) and the
multi-batch late-data pytest.

State is per user-key (Spark shuffles by key and keeps state in the state
store); arbitrary numbers of users scale horizontally.  The pandas function
receives Arrow batches — no per-row Python in the hot path beyond the
per-event fold, which is the irreducible stateful logic.
"""
from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = ("user_id bigint, session_start bigint, "
                         "session_end bigint, n_events bigint, closed_by string")
SESSION_STATE_SCHEMA = ("starts array<bigint>, ends array<bigint>, "
                        "counts array<bigint>")


def _epoch(series: pd.Series) -> pd.Series:
    # normalize to ns first: Arrow may deliver datetime64 at us resolution,
    # where a raw int64 view would be off by 1000x
    ns = pd.to_datetime(series).astype("datetime64[ns]").astype("int64")
    return (ns // 1_000_000_000).astype("int64")


def merge_intervals(intervals: Iterable[tuple[int, int, int]],
                    gap_sec: int) -> list[tuple[int, int, int]]:
    """Merge (start, end, count) intervals whose sorted neighbours are within
    ``gap_sec`` — the pure fold under the streaming operator.

    ASSOCIATIVE over batching: merging events in any grouping/order yields
    the same result as merging them all at once (property-tested), which is
    what makes incremental state maintenance equal to batch sessionization.
    """
    merged: list[list[int]] = []
    for s, e, c in sorted(intervals):
        if merged and s - merged[-1][1] <= gap_sec:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += c
        else:
            merged.append([s, e, c])
    return [tuple(x) for x in merged]


def sessionize_stream(events: DataFrame, gap_sec: int = 1800,
                      ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Streaming DataFrame[user_id, ts, ...] -> appended closed sessions
    (user_id, session_start epoch, session_end epoch, n_events, closed_by).
    Epoch-seconds output keeps the schema timezone-free and oracle-friendly.
    Emission is watermark-gated (see module docstring): a session appears
    once no admissible event can still extend it.
    """

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = ["user_id", "session_start", "session_end", "n_events",
                "closed_by"]
        wm_sec = state.getCurrentWatermarkMs() // 1000

        intervals: list[tuple[int, int, int]] = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                intervals.extend(
                    (t, t, 1) for t in _epoch(pdf[ts_col]).tolist())
        if state.exists:
            starts, ends, counts = state.get
            intervals.extend(zip(starts, ends, counts))
        if not intervals:              # defensive: no data, no state
            state.remove()
            return
        merged = merge_intervals(intervals, gap_sec)

        out = []
        pending: list[tuple[int, int, int]] = []
        for i, (s, e, c) in enumerate(merged):
            if e + gap_sec <= wm_sec:
                # no admissible event can reach within gap of this end
                out.append((user_id, s, e, c,
                            "gap" if i < len(merged) - 1 else "timeout"))
            else:
                pending.append((s, e, c))
        if pending:
            state.update((
                [p[0] for p in pending],
                [p[1] for p in pending],
                [p[2] for p in pending],
            ))
            # earliest pending end decides the next flush; guaranteed to be
            # strictly above the current watermark (else it would have been
            # emitted above), as setTimeoutTimestamp requires
            state.setTimeoutTimestamp((pending[0][1] + gap_sec) * 1000)
        else:
            state.remove()
        if out:
            yield pd.DataFrame(out, columns=cols)

    return (events
            .withWatermark(ts_col, f"{gap_sec} seconds")
            .groupBy(user_col)
            .applyInPandasWithState(
                fn, SESSION_OUTPUT_SCHEMA, SESSION_STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
