"""Streaming cardinality estimation: windowed HLL registers.

Distinct-count monitoring of an unbounded ingest stream (distinct urls /
fingerprints / token types per time window) cannot keep per-value state —
``dropDuplicates`` grows with the stream.  HLL registers make the state
FIXED: a windowed max-aggregation over (window, register) holds at most
2^p rows per open window, expired by the watermark, and the output
register tables merge with any batch backfill's ``hll_registers`` by
register-wise max (identical layout via ``sketch.hll_reg_rho``).

One expression serves batch AND streaming (the ``streaming/windows.py``
pattern) — pinned by the streaming ≡ batch equivalence test, late
in-watermark delivery included.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import hll_reg_rho


def hll_windowed_registers(events: DataFrame, ts_col: str = "ts",
                           value_col: str = "value",
                           window: str = "10 minutes",
                           watermark: str = "1 hour",
                           p: int = 9,
                           hash_family: str = "md5_60") -> DataFrame:
    """(window_start, window_end, register, max_rho) per tumbling
    event-time window — the per-window HLL sketch of ``value_col``.

    On a streaming frame the watermark bounds state (<= 2^p register rows
    per open window) and admits late in-horizon events into their true
    windows; on a batch frame the identical expression computes the full
    answer.  Estimate a window's cardinality by feeding its register rows
    to ``sketch.hll_estimate`` (or the in-plan estimator) — max_rho is a
    pure function of the value SET, so the streaming and batch tables are
    row-identical, not merely approximately equal."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming \
        else events
    reg, rho = hll_reg_rho(F.col(value_col), p, hash_family)
    win = F.window(F.col(ts_col), window)
    return (src.filter(F.col(value_col).isNotNull())
            .select(win.alias("window"), reg.alias("register"),
                    rho.alias("rho"))
            .groupBy("window", "register")
            .agg(F.max("rho").alias("max_rho"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    "register", "max_rho"))
