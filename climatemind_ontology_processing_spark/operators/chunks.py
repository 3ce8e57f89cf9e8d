"""Passage chunking — sliding token windows over documents.

The retrieval/training prep stage between cleaning and embedding: split
each document into overlapping fixed-size token windows (RAG passage
indexing, long-doc training-example generation, context-window packing
precursors).  Pure JVM array algebra — tokenize once with ``split``,
then ``sequence`` + ``slice`` + ``array_join`` per chunk — no Python,
no shuffle at all: chunking is a flatMap, output partitioning inherits
the scan.

Window semantics (the standard stride convention): starts at 0, stride,
2*stride, ...; the first window that already covers the document tail
is the last one emitted (so a doc with <= chunk_tokens tokens yields
exactly one chunk, and chunks never start beyond the text).  Token-free
and NULL-text documents yield NO chunks — emitting an empty chunk would
poison downstream embedding batches; the caller can anti-join to find
them (documented, mirrors paragraph_dedup's NULL handling).

Reconstruction note: chunk text re-joins tokens with single spaces —
a normalization, not byte-identity (byte-exact spans are
operators/dedup.duplicate_spans' contract; chunking feeds embedding
models where whitespace normalization is standard).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_passages(docs: DataFrame, chunk_tokens: int = 64,
                   stride: int = 32, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_id, start_token, n_tokens, chunk) — 0-based
    ``chunk_id`` in reading order; ``start_token = chunk_id * stride``;
    ``n_tokens`` = tokens actually covered (< chunk_tokens only for the
    final window of a short tail)."""
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    if stride > chunk_tokens:
        raise ValueError("stride > chunk_tokens would skip tokens")
    toks = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")),
                            r"\s+"),
                    lambda x: x != "")
    d0 = docs.select(F.col(id_col), toks.alias("_t"))
    n = F.size(F.col("_t"))
    # 1 + ceil(max(n - chunk, 0) / stride) chunks; 0 when n == 0.
    # Integer ceil-division — no float ceil, engine-exact by construction
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.expr(
            f"(greatest(size(_t) - {chunk_tokens}, 0) + {stride - 1}) "
            f"DIV {stride}").cast("int"))
    d = d0.select(id_col, "_t", n_chunks.alias("_k"))
    # filter BEFORE explode: Spark's sequence(0, -1) is a DESCENDING
    # sequence, not empty — unguarded it would emit phantom chunks
    d = d.filter(F.col("_k") > 0)
    out = d.select(
        id_col, "_t",
        F.explode(F.sequence(F.lit(0), F.col("_k") - 1)).alias("chunk_id"))
    start = F.col("chunk_id") * stride
    piece = F.slice(F.col("_t"), start + 1, chunk_tokens)
    return out.select(
        id_col, "chunk_id",
        start.cast("long").alias("start_token"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk"))
