"""Unigram language-model scoring — corpus-quality cross-entropy.

The CCNet / Gopher-style quality signal: train a smoothed unigram model on
the corpus (or a held-out ``train`` corpus), score every document by its
mean negative log-probability.  Low cross-entropy ~ fluent in-distribution
text; high ~ gibberish, boilerplate, wrong language.  Complements the
rule-based ``textstats.quality_features`` (ref climatemind applies no
statistical quality model; this is part of the training-data-pipeline
surface the task brief adds on top of reference parity).

100 TB shape:
* token counts: ONE explode + groupBy(token) with map-side partial
  aggregation — the shuffle carries (token, count) pairs only;
* vocabulary: top-V by count is a TakeOrdered (per-partition top-V merged
  on the driver), never a global sort;
* scoring: the V-row vocabulary and the 1-row constants broadcast; the
  only wide op is the per-doc aggregation whose shuffle payload is
  (doc_id, micro-logp partial sum, count) — document text never enters an
  exchange.

Determinism / oracle exactness: per-token log-probs are rounded to 6
decimals and summed as micro-scaled BIGINTs (order-independent integer
addition), so the DuckDB oracle replays the score hash-exactly; the only
cross-engine wiggle is the last ulp of ``ln`` itself, absorbed by the
round except on ~1e-8-probability boundaries.  Vocabulary cutoff ties
break (count desc, token asc) on both sides.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from climatemind_ontology_processing_spark.operators.textstats import _tokens


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (docs.select(F.col(id_col),
                        F.explode(_tokens(F.col(text_col))).alias("tok"))
            .filter(F.col("tok") != ""))


def unigram_counts(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(tok, cnt) over the lowercased letter/digit tokenization shared with
    ``textstats`` (so LM scores and token stats agree on what a token is)."""
    return _doc_tokens(docs, id_col, text_col).groupBy("tok") \
        .agg(F.count("*").alias("cnt"))


def lm_cross_entropy(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", top_v: int = 10000,
                     alpha: float = 1.0,
                     train: DataFrame | None = None) -> DataFrame:
    """(doc_id, n_tokens, ce_nats): mean negative ln-probability per token
    under an add-``alpha`` unigram model with a top-``top_v`` vocabulary
    and a single pooled UNK type.

    Model: ``p(tok) = (cnt + a) / (total + a*(V+1))`` for in-vocabulary
    tokens; every out-of-vocabulary token is the one UNK type with
    ``cnt = total - sum(vocab counts)``.  ``train`` defaults to ``docs``
    (self-scoring); pass a clean held-out corpus to score against it.
    Documents with zero tokens produce no row (they have no defined mean).
    """
    counts = unigram_counts(train if train is not None else docs,
                            id_col, text_col)
    vocab = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(top_v)
    consts = (counts.agg(F.sum("cnt").cast("double").alias("_total"))
              .crossJoin(vocab.agg(
                  F.sum("cnt").cast("double").alias("_invocab"),
                  F.count("*").cast("double").alias("_v"))))
    toks = _doc_tokens(docs, id_col, text_col)
    p = ((F.coalesce(F.col("cnt").cast("double"),
                     F.col("_total") - F.col("_invocab")) + F.lit(alpha))
         / (F.col("_total") + F.lit(alpha) * (F.col("_v") + 1.0)))
    lp_micro = F.round(F.round(F.log(p), 6) * 1e6).cast("long")
    scored = (toks.join(F.broadcast(vocab), "tok", "left")
              .crossJoin(F.broadcast(consts))
              .select(id_col, lp_micro.alias("_lp")))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_tokens"),
                 F.round(-F.sum("_lp") / (F.count("*") * 1e6), 6)
                  .alias("ce_nats")))
