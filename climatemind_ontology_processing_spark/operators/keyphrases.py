"""RAKE-style keyphrase extraction (Rose, Engel, Cramer & Cowley 2010).

KG nodes need human-readable labels and topic tags; the reference gets
them from the curated ontology, a web-scale pipeline mines them.  RAKE
is the standard unsupervised baseline: candidate phrases are maximal
runs of non-stopword tokens; a word scores degree/frequency (degree =
summed length of phrases it appears in), a phrase scores the sum of its
words' scores.

Spark-first decomposition (every step is plain DataFrame algebra, no
Python, no UDF):

  1. tokenize (split + filter — the repo-wide tokenizer);
  2. phrase segmentation WITHOUT a fold: posexplode tokens, mark
     stopwords, ``phrase_id = running count of stopwords up to the
     position`` (one per-doc window), drop stopword rows, group by
     (doc, phrase_id) with sort_array(collect_list((pos, tok))) — the
     gaps-and-islands idiom (duplicate_spans precedent);
  3. word stats over phrase-word occurrences — two map-side-combinable
     aggregates;
  4. per-word micro-BIGINT score (deg * 10^6 DIV freq — truncating,
     engine-exact), phrase score = sum with multiplicity.

Per-doc windows bound skew by document length, not corpus size; the
only corpus-wide state is the word-stat table (vocabulary-sized).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 10 ** 6


def candidate_phrases(docs: DataFrame, stopwords: tuple[str, ...],
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(id, phrase_id, phrase, n_words): maximal non-stopword token runs
    per document, in reading order.  Text is lowercased."""
    if not stopwords:
        raise ValueError("stopwords must be non-empty")
    toks = F.filter(F.split(F.lower(F.coalesce(F.col(text_col),
                                               F.lit(""))), r"\s+"),
                    lambda x: x != "")
    t = (docs.select(F.col(id_col).alias("id"), toks.alias("_t"))
         .select("id", F.posexplode("_t").alias("pos", "tok")))
    is_stop = F.col("tok").isin(list(stopwords)).cast("int")
    w = Window.partitionBy("id").orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, 0)
    seg = t.select("id", "pos", "tok", is_stop.alias("_s"),
                   F.sum(is_stop).over(w).alias("phrase_id"))
    return (seg.filter(F.col("_s") == 0)
            .groupBy("id", "phrase_id")
            .agg(F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(
                            F.struct(F.col("pos"), F.col("tok")))),
                        lambda s: s["tok"]), " ").alias("phrase"),
                 F.count("*").cast("long").alias("n_words")))


def rake_keyphrases(docs: DataFrame, stopwords: tuple[str, ...],
                    top_k: int = 50, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Corpus-level keyphrases: (phrase, n_occurrences, score_micro),
    the ``top_k`` by (score desc, phrase asc) — deterministic ties.
    Word score = degree * 10^6 DIV frequency; phrase score sums word
    scores WITH multiplicity (canonical RAKE)."""
    ph = candidate_phrases(docs, stopwords, id_col, text_col) \
        .localCheckpoint(eager=True)
    words = ph.select(F.explode(F.split("phrase", " ")).alias("w"),
                      F.col("n_words"))
    stats = (words.groupBy("w")
             .agg(F.count("*").alias("_freq"),
                  F.sum("n_words").alias("_deg")))
    wscore = stats.select(
        "w", F.expr(f"(_deg * {MICRO}L) DIV _freq").alias("_ws"))
    occ = ph.select("id", "phrase_id", "phrase",
                    F.explode(F.split("phrase", " ")).alias("w"))
    pscores = (occ.join(F.broadcast(wscore), "w")
               .groupBy("id", "phrase_id", "phrase")
               .agg(F.sum("_ws").alias("_ps")))
    return (pscores.groupBy("phrase")
            .agg(F.count("*").cast("long").alias("n_occurrences"),
                 F.max("_ps").cast("long").alias("score_micro"))
            .orderBy(F.desc("score_micro"), F.asc("phrase"))
            .limit(top_k))
