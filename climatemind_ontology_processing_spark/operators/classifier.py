"""Linear text-quality classifier scoring over hashed n-gram features.

The quality-filter stage of the modern LLM data pipeline (CCNet's
fastText langid+quality, GPT-3/LLaMA's "looks-like-reference-corpus"
linear classifiers, DCLM's fastText filter) is at heart: hash the
document's n-grams into a fixed feature space, dot with a weight
vector, threshold the logit.  This module implements that SCORING path
Spark-first: features reuse the DSIR hashed unigram+bigram map
(operators/dsir.hashed_ngram_counts — one explode + groupBy, no Python),
and the dot product is one join + sum aggregate.

Weights here are hash-derived integers (same stand-in convention as
negatives.hash_embeddings: deterministic, engine-exact, no float
training state inside a hash-compared query) — production swaps in a
trained weight table via the ``weights`` argument with the identical
plan: the weight side is buckets-sized and broadcast, the corpus side
never shuffles anything wider than (id, bucket, cnt).

The logit stays a BIGINT (counts x integer weights): no sigmoid is
applied because the decision threshold commutes with any monotone
transform — ``label = logit > threshold`` is the filter contract, and
downstream calibration belongs to the (driver-side, tiny) training
loop, not the corpus scan.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import token_hash
from .dsir import hashed_ngram_counts


def hash_weight_expr(bucket_col, seed: str = "qlr", span: int = 1000,
                     hash_family: str = "md5_60"):
    """Deterministic integer weight in [-span, span] for a feature
    bucket: token_hash(seed|bucket) mod (2*span+1), centered."""
    key = F.concat_ws("|", F.lit(seed), bucket_col.cast("string"))
    return (F.pmod(token_hash(key, hash_family), F.lit(2 * span + 1))
            - F.lit(span)).cast("long")


def linear_quality_scores(docs: DataFrame, buckets: int = 512,
                          seed: str = "qlr", span: int = 1000,
                          threshold: int = 0,
                          weights: DataFrame | None = None,
                          id_col: str = "doc_id", text_col: str = "text",
                          hash_family: str = "xxhash64") -> DataFrame:
    """(id, logit, keep) for EVERY input doc — token-free and NULL-text
    docs score logit 0 (and keep accordingly), never drop silently.

    ``weights``, if given, must be (bucket, w) with integer w — the
    trained-model path; otherwise hash-derived stand-ins.  ``keep`` is
    an INT flag (driver hash-compare convention: booleans stringify
    differently across engines)."""
    feats = hashed_ngram_counts(docs, id_col, text_col, buckets,
                                hash_family)
    if weights is None:
        w = feats.select(
            "id", "cnt",
            hash_weight_expr(F.col("bucket"), seed, span, hash_family)
            .alias("w"))
    else:
        w = (feats.join(F.broadcast(weights), "bucket")
             .select("id", "cnt", F.col("w").cast("long").alias("w")))
    logits = (w.groupBy("id")
              .agg(F.sum(F.col("cnt") * F.col("w")).alias("logit")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(logits, "id", "left")
            .select("id", F.coalesce("logit", F.lit(0)).cast("long")
                    .alias("logit"))
            .withColumn("keep",
                        (F.col("logit") > F.lit(int(threshold)))
                        .cast("int")))
