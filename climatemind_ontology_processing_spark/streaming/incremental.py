"""Incremental crawl ingestion (SURVEY §2.9).

The reference is batch-only (no streaming, no windows, no watermarks —
grep-verified).  Late-arriving crawl segments are handled as incremental
appends + an anti-join against already-processed (url, warc_ts) keys — the
snapshot-increment idiom (Iceberg incremental reads in production; plain
parquet directories here).

A Structured Streaming wrapper is provided for completeness: the same
extraction stages run under ``readStream`` with ``availableNow`` triggers —
possible because every stage in plans/pipeline.py is stateless per page (the
only stateful op, dedup, runs in the batch merge step).
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import triples_from_pages


def new_pages(pages: DataFrame, processed_keys: DataFrame | None) -> DataFrame:
    """Anti-join on (url, warc_ts): only pages not yet processed."""
    if processed_keys is None:
        return pages
    return pages.join(processed_keys.select("url", "warc_ts"),
                      ["url", "warc_ts"], "left_anti")


def incremental_triples(pages: DataFrame, triples_path: str) -> DataFrame:
    """Process only unprocessed pages; returns the new triples increment.
    Caller appends to the triples table and re-runs compaction/dedup as a
    MERGE (here: union + dropDuplicates on the key)."""
    spark = pages.sparkSession
    processed = None
    if os.path.exists(triples_path):
        existing = spark.read.parquet(triples_path)
        processed = existing.select("url", "warc_ts").distinct()
    fresh = new_pages(pages, processed)
    return triples_from_pages(fresh)


def streaming_triples(spark: SparkSession, pages_stream_path: str,
                      aliases: dict[str, str], checkpoint: str,
                      out_path: str):
    """Structured Streaming variant: parquet file source -> stateless
    extraction -> append sink with exactly-once file-source checkpointing.
    Use ``trigger(availableNow=True)`` for catch-up batches."""
    from ..functions.text import with_extracted_text
    from ..functions.triples import extract_triples
    from ..sources.pages import PAGES_SCHEMA

    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .parquet(pages_stream_path))
    extracted = with_extracted_text(stream)
    triples = extract_triples(extracted, aliases)
    return (triples.writeStream
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
