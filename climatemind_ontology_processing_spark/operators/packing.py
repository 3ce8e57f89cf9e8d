"""Training-sequence packing — map documents to fixed-length sequences.

The last step of an LLM data pipeline: the cleaned corpus is concatenated
in a deterministic order (doc_id), each document followed by one EOS
token, and the token stream is chunked into training sequences of
``seq_len`` tokens.  Each document's placement is a pure function of the
prefix sum of token counts before it — so the op IS a distributed prefix
sum plus arithmetic.

100 TB shape — the naive ``sum() OVER (ORDER BY doc_id)`` global window
collapses the whole corpus into ONE task.  Instead, the classic two-phase
parallel prefix sum:

  1. bucket documents by id range (``doc_id div bucket_size``);
  2. per-bucket token totals (map-side combinable groupBy — one keys-only
     shuffle), then cumulate the TINY bucket-totals table (one row per
     bucket) with a single-partition window — fine, it is ~corpus/bucket
     rows, not corpus rows;
  3. broadcast the bucket offsets back and run the within-bucket window
     PARTITIONED BY bucket — every partition-sized window runs in
     parallel.

Only (doc_id, n_tokens) ever shuffles; document text is never read by
this operator at all.  Requires an orderable numeric id (at web scale:
derive a dense long from (crawl, segment, position) upstream).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def packed_spans(docs: DataFrame, id_col: str = "doc_id",
                 tokens_col: str = "n_tokens", seq_len: int = 2048,
                 eos_tokens: int = 1, bucket_size: int = 4096) -> DataFrame:
    """(doc_id, n_tokens, start_offset, first_seq, last_seq, n_seqs):
    the position of each document in the packed token stream.

    ``start_offset`` = sum of (n_tokens + eos_tokens) over all docs with a
    smaller id; a document occupies sequences
    ``floor(start/seq_len) .. floor((start + n + eos - 1)/seq_len)``
    (its EOS included — EOS crossing a boundary drags the doc into the
    next sequence, the standard concat-then-chunk semantics).

    A NULL or negative ``n_tokens`` raises AT EXECUTION TIME (lazy
    ``raise_error`` inside the projection — no extra validation job): a
    NULL row would otherwise vanish from both prefix-sum aggregations and
    silently shift every later document's offset.  Zero-width documents
    (``n_tokens + eos_tokens == 0``, only possible with ``eos_tokens=0``)
    occupy no sequence: ``first_seq``/``last_seq`` are NULL, ``n_seqs`` 0.
    """
    if eos_tokens < 0:
        raise ValueError(f"eos_tokens must be >= 0, got {eos_tokens}")
    tok = F.col(tokens_col).cast("long")
    checked = F.when(
        F.col(tokens_col).isNull() | (tok < 0),
        F.raise_error(F.concat(
            F.lit(f"packed_spans: NULL or negative {tokens_col} at "
                  f"{id_col}="),
            F.col(id_col).cast("string"))).cast("long")).otherwise(tok)
    w = (checked + F.lit(eos_tokens)).alias("_w")
    d = docs.select(F.col(id_col), F.col(tokens_col), w,
                    F.floor(F.col(id_col) / bucket_size).alias("_bkt"))
    totals = d.groupBy("_bkt").agg(F.sum("_w").alias("_bt"))
    prev_w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt", F.coalesce(F.sum("_bt").over(prev_w), F.lit(0)).alias("_boff"))
    in_w = Window.partitionBy("_bkt").orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    start = (F.col("_boff")
             + F.coalesce(F.sum("_w").over(in_w), F.lit(0))).alias("start_offset")
    out = (d.join(F.broadcast(offsets), "_bkt")
           .select(id_col, tokens_col, "_w", start))
    nonzero = F.col("_w") > 0
    return out.select(
        id_col, tokens_col,
        "start_offset",
        F.when(nonzero, F.floor(F.col("start_offset") / seq_len))
         .alias("first_seq"),
        F.when(nonzero,
               F.floor((F.col("start_offset") + F.col("_w") - 1) / seq_len))
         .alias("last_seq")) \
        .withColumn("n_seqs",
                    F.coalesce(F.col("last_seq") - F.col("first_seq") + 1,
                               F.lit(0)))


def sequence_membership(spans: DataFrame) -> DataFrame:
    """Explode ``packed_spans`` output to (seq_id, doc_id) rows — which
    documents each training sequence reads from.  Row count = total doc
    span coverage (each doc appears in n_seqs rows; zero-width docs with
    NULL spans appear in none)."""
    return spans.filter(F.col("first_seq").isNotNull()).select(
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
        spans.columns[0])


def write_training_shards(docs: DataFrame, spans: DataFrame, out_path: str,
                          seqs_per_shard: int = 1024,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Materialize the packed corpus as TRAINING SHARDS: shard k owns
    sequences ``[k*seqs_per_shard, (k+1)*seqs_per_shard)``, and its
    partition directory contains every document those sequences read —
    a document straddling a shard boundary is written to BOTH shards, so
    a trainer streams one directory per shard with no cross-shard reads
    (the data-loading contract of sequence-packed pretraining).

    Deterministic end to end (placement is ``packed_spans``' prefix sum;
    shard assignment is integer arithmetic on it) and IDEMPOTENT on rerun:
    the write uses dynamic partition overwrite, so a retried job rewrites
    its shards byte-for-byte instead of duplicating them.  Only the
    spans table shuffles (keys + 4 longs); text moves once, map-side,
    into its shard partition.

    Returns the shard manifest (shard, n_docs, n_tokens) read back from
    the COMMITTED output (at-least-once-safe source of truth, same policy
    as plans/lineage)."""
    if seqs_per_shard < 1:
        raise ValueError("seqs_per_shard must be >= 1")
    member = (sequence_membership(spans)
              .select(F.floor(F.col("seq_id") / seqs_per_shard)
                      .cast("long").alias("shard"), id_col)
              .distinct())
    rows = (member
            .join(spans.select(id_col, "n_tokens", "start_offset",
                               "first_seq", "last_seq"), id_col)
            .join(docs.select(id_col, text_col), id_col))
    (rows.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("shard").parquet(out_path))
    spark = docs.sparkSession
    return (spark.read.parquet(out_path)
            .groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"))
            .orderBy("shard"))
