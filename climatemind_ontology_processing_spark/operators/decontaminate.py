"""Training-data decontamination + BPE merge statistics (task brief:
"operations a large-scale training-data pipeline would need").

* ``contaminated_docs`` — the standard n-gram decontamination pass (the
  public GPT-3 appendix-C / PaLM recipe: flag any training document sharing
  an n-gram, canonically n=13, with an evaluation benchmark).  Scale shape:
  the benchmark n-gram set is orders of magnitude smaller than the corpus,
  so it BROADCASTS; the corpus streams through one narrow shingle+probe
  pass and only (doc_id, n_hits) rows — never text — reach the aggregation
  shuffle.  At 10^12 docs the probe is a broadcast hash join per task;
  nothing corpus-sized is exchanged.

* ``bpe_pair_counts`` — adjacent-token-pair frequencies, the statistic a
  BPE/WordPiece vocabulary induction computes per merge round (Sennrich et
  al. 2016).  One explode + one groupBy with map-side partial aggregation;
  the shuffle carries (pair, partial_count) only.  ``top_k`` bounds the
  result via a single ordered take.

Both reuse ``dedup.token_hash``'s hash-family parameterization so the
driver oracle (md5_60) can replay hash values exactly while production
defaults to xxhash64.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import let_bound, shingle_hashes

# the one shingling expression, imported from dedup so decontamination and
# the dedup suite can never silently diverge on tokenization or hashing
_ngram_hashes = shingle_hashes


def benchmark_ngrams(benchmark_docs: DataFrame, text_col: str = "text",
                     n: int = 13,
                     hash_family: str = "xxhash64") -> DataFrame:
    """Distinct n-gram hash set of an evaluation benchmark ->
    DataFrame[gram long, hash_family string].  Run once per benchmark and
    persist; the result is the small broadcast side of every
    decontamination pass.  The ``hash_family`` marker column records which
    family built the set — ``contaminated_docs`` validates it against its
    own family, because a mismatch (e.g. an md5_60-built set probed with
    the xxhash64 default) would match NOTHING and report every document
    clean."""
    return (benchmark_docs
            .select(F.explode(_ngram_hashes(F.col(text_col), n,
                                            hash_family)).alias("gram"))
            .distinct()
            .withColumn("hash_family", F.lit(hash_family)))


def contaminated_docs(docs: DataFrame, benchmark: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 13, hash_family: str = "xxhash64",
                      broadcast_benchmark: bool = True) -> DataFrame:
    """Documents sharing >= 1 n-gram with ``benchmark`` (from
    ``benchmark_ngrams``) -> (doc_id, n_hits), n_hits = DISTINCT shared
    n-grams.

    Default shape: the benchmark side is broadcast — the corpus-side
    explode is consumed by a map-side broadcast-hash probe, and only
    matched (doc_id, gram) pairs (a vanishing fraction at web scale)
    continue to the count shuffle.  Realistic eval suites are 10^5-10^7
    n-grams = tens of MB of longs, comfortably broadcastable.  For a
    pathological benchmark side (union of hundreds of suites beyond
    executor memory), ``broadcast_benchmark=False`` keeps a plain shuffled
    hash join keyed on the gram — the corpus side then shuffles its
    (doc_id, gram) pairs once; still no document text in any exchange.

    If the benchmark set carries ``benchmark_ngrams``' hash_family marker
    column, it is validated against this call's ``hash_family`` — a
    mismatch matches nothing and would silently report everything clean
    (sets persisted before the marker existed skip the check)."""
    if "hash_family" in benchmark.columns:
        fams = [r[0] for r in
                benchmark.select("hash_family").distinct().collect()]
        if fams and fams != [hash_family]:
            raise ValueError(
                f"benchmark n-gram set was built with hash_family={fams} "
                f"but this probe uses {hash_family!r} — the join would "
                "match nothing and report every document clean")
        benchmark = benchmark.drop("hash_family")
    grams = docs.select(
        F.col(id_col),
        F.explode(_ngram_hashes(F.col(text_col), n, hash_family))
         .alias("gram"))
    bench = F.broadcast(benchmark) if broadcast_benchmark else benchmark
    hits = grams.join(bench, "gram")
    return (hits.groupBy(id_col)
            .agg(F.count_distinct("gram").alias("n_hits")))


def bpe_pair_counts(docs: DataFrame, text_col: str = "text",
                    top_k: int | None = None,
                    min_count: int = 1) -> DataFrame:
    """Adjacent token-pair counts over the corpus -> (left, right, n) —
    the per-round statistic of BPE vocabulary induction.  Tokens are
    lowercase whitespace words; empties dropped.  Map-side combine applies
    (plain groupBy count), so the shuffle carries one partial row per
    (task, pair).  ``top_k`` returns the k most frequent pairs with a
    deterministic (n desc, left, right) order."""
    tokens = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                      lambda t: t != "")
    pairs = let_bound(
        tokens,
        lambda t: F.when(
            F.size(t) >= 2,
            F.transform(F.sequence(F.lit(1), F.size(t) - 1),
                        lambda i: F.struct(
                            F.element_at(t, i).alias("left"),
                            F.element_at(t, i + 1).alias("right"))))
        .otherwise(F.array().cast(
            "array<struct<left:string,right:string>>")))
    counts = (docs.select(F.explode(pairs).alias("p"))
              .groupBy(F.col("p.left").alias("left"),
                       F.col("p.right").alias("right"))
              .agg(F.count("*").alias("n"))
              .filter(F.col("n") >= min_count))
    if top_k is not None:
        counts = (counts.orderBy(F.col("n").desc(), "left", "right")
                  .limit(top_k))
    return counts
