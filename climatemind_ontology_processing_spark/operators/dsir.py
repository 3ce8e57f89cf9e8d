"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023).

Select raw-corpus documents whose hashed-n-gram distribution looks like a
TARGET corpus: fit two smoothed bag-of-hashed-ngrams multinomials (target p,
raw q), score each raw document by its importance log-weight
sum_b count_b * (ln p_b - ln q_b), and keep the top-k.  This is the standard
pretraining-data curation shape ("pick web pages that look like Wikipedia")
sitting beside the quality/LM filters (operators/lm.py) in the curation
toolbox — LM filtering ranks by fluency under ONE model; DSIR ranks by
similarity to a chosen target DISTRIBUTION.

Spark-first shape (everything JVM-side, no UDFs):

  features:  one pass per corpus — tokenize, build unigrams+bigrams as array
             expressions (``let_bound`` keeps the token split evaluated once
             per row), explode, hash to ``buckets`` ids, count by
             (doc, bucket).  After the explode only (doc, bucket) KEYS
             shuffle — text never leaves the scan stage.
  fit:       two map-side-combinable groupBy-sum passes over the feature
             rows + two 1-row totals; the bucket log-ratio table is at most
             ``buckets`` rows — broadcast everywhere downstream.
  score:     one broadcast join feature-rows x ratio-table, one
             map-side-combinable sum per doc.
  select:    global top-k via orderBy+limit (TakeOrdered — per-partition
             heaps + driver merge, NOT a single-partition window sort).

Engine-exactness (the repo's micro-BIGINT convention): smoothing uses
alpha = 1/2 so every probability is a ratio of integers
(2c+1)/(2C+B); the per-bucket log-ratio
ln(2tc+1) - ln(2T+B) - ln(2rc+1) + ln(2R+B) is computed on BIGINTs (exact
doubles below 2^53, libm ln agrees across engines), rounded to 6 decimals,
scaled to a micro-BIGINT, and all downstream sums are integer arithmetic —
order-independent and replayable by the DuckDB oracle (query
``dsir_scores``).

Scale notes: feature cardinality per doc is O(tokens); the shuffle rows are
(doc, bucket) pairs bounded by min(tokens, buckets) per doc.  ``buckets``
(default 8192; the paper uses 10^4) bounds the ratio table regardless of
corpus size.  Hash family is ``xxhash64`` in production, ``md5_60`` for the
oracle-replayable registered query — same dual-family convention as the
dedup suite (operators/dedup.token_hash).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import let_bound, token_hash

_TOKEN_SPLIT = r"[^\p{L}\p{N}]+"


def hashed_ngram_counts(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", buckets: int = 8192,
                        hash_family: str = "xxhash64") -> DataFrame:
    """(id, bucket, cnt) hashed unigram+bigram counts — DSIR's feature map.

    Bigrams come from ``zip_with`` of the token array with itself shifted by
    one (the shorter side pads with null; ``F.concat`` nulls those out and a
    filter drops them), so no per-token shuffle or window is needed to form
    adjacency."""
    toks_expr = F.filter(F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT),
                         lambda x: x != "")
    ngrams = let_bound(
        toks_expr,
        lambda t: F.concat(
            t,
            F.filter(
                F.zip_with(t,
                           F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                           lambda x, y: F.concat(x, F.lit(" "), y)),
                lambda g: g.isNotNull())))
    return (docs
            .select(F.col(id_col).alias("id"), F.explode(ngrams).alias("g"))
            .select("id",
                    F.pmod(token_hash(F.col("g"), hash_family),
                           F.lit(int(buckets))).alias("bucket"))
            .groupBy("id", "bucket")
            .agg(F.count("*").alias("cnt")))


def dsir_log_ratios(target_feats: DataFrame, raw_feats: DataFrame,
                    buckets: int) -> DataFrame:
    """(bucket, micro) — micro-BIGINT per-bucket importance log-ratio
    ln(p_b / q_b) under alpha=1/2 add-smoothing: p_b = (2tc_b+1)/(2T+B).

    Buckets unseen in BOTH corpora are absent (their ratio would be the
    constant ln((2R+B)/(2T+B)) and no raw feature row can reference them)."""
    b = int(buckets)
    tc = target_feats.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    rc = raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
    tot_t = target_feats.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("_T"))
    tot_r = raw_feats.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("_R"))
    joined = (tc.join(rc, "bucket", "full_outer")
              .select("bucket",
                      F.coalesce("tc", F.lit(0)).alias("tc"),
                      F.coalesce("rc", F.lit(0)).alias("rc"))
              .crossJoin(F.broadcast(tot_t))
              .crossJoin(F.broadcast(tot_r)))
    logratio = (F.log(2 * F.col("tc") + 1) - F.log(2 * F.col("_T") + b)
                - F.log(2 * F.col("rc") + 1) + F.log(2 * F.col("_R") + b))
    micro = F.round(F.round(logratio, 6) * 1e6).cast("long")
    return joined.select("bucket", micro.alias("micro"))


def dsir_scores(raw_docs: DataFrame, target_docs: DataFrame,
                id_col: str = "doc_id", text_col: str = "text",
                buckets: int = 8192,
                hash_family: str = "xxhash64") -> DataFrame:
    """(id, score_micro, n_ngrams) for EVERY raw doc (token-free docs score
    0 with 0 features — present, not silently dropped).  ``score_micro`` is
    the integer-exact importance log-weight x 1e6; rank descending to
    prefer target-like documents."""
    # NOTE: raw features feed two consumers (the q census and the scoring
    # join), but an eager checkpoint here measured NEUTRAL-to-worse once
    # plan construction was timed too (1.28 vs 1.39 s at sf0.1) — the
    # synchronous store of the corpus-sized feature table costs what the
    # recompute saves (AQE reuses the groupBy exchange).  Same verdict as
    # rule_mining's substrate; keep the plan lazy.
    rf = hashed_ngram_counts(raw_docs, id_col, text_col, buckets, hash_family)
    tf = hashed_ngram_counts(target_docs, id_col, text_col, buckets,
                             hash_family)
    ratios = dsir_log_ratios(tf, rf, buckets)
    scored = (rf.join(F.broadcast(ratios), "bucket")
              .groupBy("id")
              .agg(F.sum(F.col("cnt") * F.col("micro")).alias("score_micro"),
                   F.sum("cnt").alias("n_ngrams")))
    return (raw_docs.select(F.col(id_col).alias("id"))
            .join(scored, "id", "left")
            .select("id",
                    F.coalesce("score_micro", F.lit(0)).alias("score_micro"),
                    F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams")))


def dsir_select(raw_docs: DataFrame, target_docs: DataFrame, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                buckets: int = 8192, hash_family: str = "xxhash64",
                min_ngrams: int = 1) -> DataFrame:
    """Top-k most-target-like raw docs, deterministic tie-break by id.

    ``min_ngrams`` (default 1) excludes docs with fewer features from
    SELECTION: a token-free doc scores exactly 0, which outranks every
    net-negative real document — an empty page would float to rank 1 of a
    "looks like the target" list on zero evidence.  ``dsir_scores`` still
    reports such docs (score 0) for auditing.

    orderBy+limit lowers to TakeOrdered (distributed partial top-k), never
    a one-partition global sort."""
    s = dsir_scores(raw_docs, target_docs, id_col, text_col, buckets,
                    hash_family)
    return (s.filter(F.col("n_ngrams") >= int(min_ngrams))
            .orderBy(F.desc("score_micro"), F.asc("id")).limit(int(k)))
