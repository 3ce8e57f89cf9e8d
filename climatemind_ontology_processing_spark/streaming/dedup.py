"""Streaming exact deduplication (§2.9 complement to the batch dedup suite).

A continuously-ingested crawl re-delivers pages (recrawls, mirror WARCs,
at-least-once sources).  Batch ``dedup_exact`` answers the offline pass; this
is the ONLINE shape: ``dropDuplicatesWithinWatermark`` keys state by content
fingerprint and expires it once the event-time watermark passes, so state is
bounded by the duplicate-arrival horizon instead of growing with the corpus
(the unbounded-state failure mode of plain ``dropDuplicates`` on a stream).

The dedup key is the fp128 pair of seeded xxhash64 values — the SAME
fingerprint scheme as ``operators/dedup.dedup_exact`` (collision odds
~2^-128/pair), so a document admitted by the stream and one admitted by a
batch backfill agree on identity.  Downstream consumers see each distinct
text at most once per watermark horizon.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(pages: DataFrame, watermark: str = "1 hour",
                 ts_col: str = "warc_ts",
                 text_col: str = "text") -> DataFrame:
    """Streaming DataFrame -> same columns, first-seen row per exact text
    within the watermark horizon.  State per distinct fingerprint only
    (two longs + timestamp), expired by the watermark."""
    fp1 = F.xxhash64(F.col(text_col))
    fp2 = F.xxhash64(F.lit("dedup-seed-2"), F.col(text_col))
    return (pages
            .withColumn("_f1", fp1).withColumn("_f2", fp2)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_f1", "_f2"])
            .drop("_f1", "_f2"))
