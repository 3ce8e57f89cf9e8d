"""BM25 ranked retrieval over the document corpus.

Rounds out the text-analysis surface (tfidf_top_terms gives per-doc term
weights; this ranks DOCUMENTS against a query): Okapi BM25 with the
Lucene idf variant,

  idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
  score(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

100 TB shape: the query's term list is a literal filter pushed into the
token explode (only query-term hits survive the scan stage); per-(doc,
term) tf and per-doc length are keys-only aggregations co-keyed on
doc_id; the term df table is |query| rows and broadcasts; corpus-level
constants (N, total tokens) ride the 1-row crossJoin trick.  No document
text enters an exchange.

Engine-exact scoring: per-term contributions round to 6 decimals and sum
as micro-scaled BIGINTs (same convention as pq_topk / adamic_adar /
lm_cross_entropy), so the DuckDB oracle replays rankings hash-exactly.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from climatemind_ontology_processing_spark.operators.lm import _doc_tokens


def bm25_scores(docs: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(doc_id, n_hits, bm25_micro) for every document matching >= 1 query
    term; ``n_hits`` = distinct matched terms, ``bm25_micro`` = BM25 score
    in round-6 micro units.  Terms are matched on the shared lowercase
    letter/digit tokenization (``textstats._tokens``)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    toks = _doc_tokens(docs, id_col, text_col)
    dl = toks.groupBy(id_col).agg(F.count("*").alias("_dl"))
    consts = (docs.agg(F.count("*").cast("double").alias("_N"))
              .crossJoin(toks.agg(F.count("*").cast("double").alias("_T"))))
    hits = toks.filter(F.col("tok").isin(terms))
    tf = hits.groupBy(id_col, "tok").agg(F.count("*").alias("_tf"))
    df_t = tf.groupBy("tok").agg(F.count("*").cast("double").alias("_df"))
    avgdl = F.col("_T") / F.col("_N")
    idf = F.log(1.0 + (F.col("_N") - F.col("_df") + 0.5) / (F.col("_df") + 0.5))
    tfpart = (F.col("_tf") * (k1 + 1.0)
              / (F.col("_tf")
                 + k1 * (1.0 - b + b * F.col("_dl").cast("double") / avgdl)))
    contrib_micro = F.round(F.round(idf * tfpart, 6) * 1e6).cast("long")
    scored = (tf.join(F.broadcast(df_t), "tok")
              .join(dl, id_col)
              .crossJoin(F.broadcast(consts))
              .select(id_col, contrib_micro.alias("_c")))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_hits"),
                 F.sum("_c").alias("bm25_micro")))
