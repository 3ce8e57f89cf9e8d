"""Watermarked sliding-window aggregation (§2.9 — the event-time window
primitive the other streaming ops build around, exposed directly).

Counts (and any algebraic aggregate) per sliding event-time window with
late-data handling: the watermark bounds both state (windows older than
the horizon are finalized and dropped) and correctness (late events inside
the horizon still land in their true windows).  Used for crawl-rate /
per-domain ingest monitoring at 10^12-document scale: the aggregation
state is windows x keys, never events.

The SAME plan expression works for batch and streaming input — pinned by
the streaming == batch equivalence test (late in-watermark delivery
included), which is the property that makes incremental re-runs of the
batch pipeline replaceable by the always-on stream.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, window: str = "10 minutes",
                    slide: str | None = None, watermark: str = "1 hour",
                    ts_col: str = "ts", key_col: str | None = None) -> DataFrame:
    """(window_start, window_end[, key], n_events) per sliding window.

    ``slide=None`` -> tumbling.  On a streaming DataFrame the watermark is
    applied first (bounded state, late-data admission); on a batch
    DataFrame ``withWatermark`` is a no-op and the identical expression
    computes the full answer — callers use one function for both."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming \
        else events
    win = F.window(F.col(ts_col), window, slide or window)
    keys = [win] + ([F.col(key_col)] if key_col else [])
    out = src.groupBy(*keys).agg(F.count("*").alias("n_events"))
    cols = [F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end")]
    if key_col:
        cols.append(F.col(key_col))
    return out.select(*cols, "n_events")
