"""Salted aggregation/join correctness vs plain equivalents, on the
head-domain-skewed synthetic pages table."""
from __future__ import annotations

from pyspark.sql import functions as F

from climatemind_ontology_processing_spark.operators.skew import (
    domain_of, salted_agg, salted_count_by_key, salted_join_small,
    with_salt)
from climatemind_ontology_processing_spark.sources.pages import pages_df


def test_domain_skew_exists(spark):
    pages = pages_df(spark, 500, seed=42)
    counts = (pages.groupBy(domain_of(F.col("url")).alias("domain"))
              .count().orderBy(F.col("count").desc()).collect())
    assert counts[0]["domain"] == "news.example.com"
    assert counts[0]["count"] / 500 > 0.15  # head domain ~20%


def test_salted_count_matches_plain(spark):
    pages = pages_df(spark, 400, seed=42).withColumn(
        "domain", domain_of(F.col("url")))
    plain = {r.domain: r["count"] for r in pages.groupBy("domain").count().collect()}
    salted = {r.domain: r.n
              for r in salted_count_by_key(pages, "domain", buckets=8).collect()}
    assert salted == plain


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(100)] + [("b", 1, 5.0)],
        "k string, x int, y double")
    got = {r.k: (r.n, r.sx, r.mn, r.mx) for r in salted_agg(
        df, "k", {"n": ("x", "count"), "sx": ("y", "sum"),
                  "mn": ("x", "min"), "mx": ("x", "max")}, buckets=4).collect()}
    assert got["a"] == (100, sum(float(i) for i in range(100)), 0, 99)
    assert got["b"] == (1, 5.0, 1, 1)


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(200)] + [("cold", 0), ("nomatch", 9)],
        "k string, v int")
    small = spark.createDataFrame([("hot", "H"), ("cold", "C"), ("other", "O")],
                                  "k string, tag string")
    plain = {(r.k, r.v, r.tag) for r in big.join(small, "k").collect()}
    salted = {(r.k, r.v, r.tag)
              for r in salted_join_small(big, small, "k", buckets=4).collect()}
    assert salted == plain
    assert len(salted) == 201


def test_salt_is_deterministic(spark):
    pages = pages_df(spark, 100, seed=42).select("url")
    a = {(r.url, r._salt) for r in with_salt(pages, "url", 8).collect()}
    b = {(r.url, r._salt) for r in with_salt(pages, "url", 8).collect()}
    assert a == b


def test_paragraph_dedup_100k_boilerplate_linear(spark):
    """Volume pin for the census design: 100k docs ALL sharing one
    boilerplate paragraph (df=100k, the Zipf-head shape).  A pairwise
    formulation would be 5*10^9 paragraph pairs; the fp128 census is one
    keys-only aggregate, so this completes in seconds and removes the
    paragraph from every document."""
    from pyspark.sql import functions as F
    from climatemind_ontology_processing_spark.operators.dedup import (
        paragraph_dedup)
    n = 100_000
    docs = (spark.range(n).withColumnRenamed("id", "doc_id")
            .select("doc_id", F.concat(
                F.lit("unique body "), F.col("doc_id").cast("string"),
                F.lit("\nglobal cookie banner text")).alias("text")))
    out = paragraph_dedup(docs, max_para_df=1000)
    agg = out.agg(F.count("*").alias("n"),
                  F.sum("n_removed").alias("rm"),
                  F.sum(F.when(F.col("text").contains("cookie"), 1)
                        .otherwise(0)).alias("leaks")).first()
    assert agg.n == n and agg.rm == n and agg.leaks == 0


def test_duplicate_spans_100k_license_linear(spark):
    """Volume pin: 100k docs all embedding the same 10-token license
    chunk.  Every chunk window has 100k occurrences, but the census is a
    keys-only count and span output is ONE row per doc (never pairs) —
    linear by construction."""
    from pyspark.sql import functions as F
    from climatemind_ontology_processing_spark.operators.dedup import (
        duplicate_spans)
    n = 100_000
    lic = "licensed under the creative commons attribution share alike terms"
    docs = (spark.range(n).withColumnRenamed("id", "doc_id")
            .select("doc_id", F.concat(
                F.lit("intro words body "), F.col("doc_id").cast("string"),
                F.lit(" " + lic)).alias("text")))
    out = duplicate_spans(docs, window=8, min_count=2)
    agg = out.agg(F.count("*").alias("rows"),
                  F.count_distinct("doc_id").alias("docs")).first()
    # one merged span per doc (the license region), no blowup
    assert agg.docs == n and agg.rows == n


def test_domain_cap_sample_head_domain_150k(spark):
    """Volume pin for the census split: one head domain with 150k pages
    (cap 100) + a 5k-domain tail.  Only the head's 150k rows enter the
    rank window; the tail passes via semi-join.  Output = 100 head
    survivors + the whole tail, deterministic."""
    from pyspark.sql import functions as F
    from climatemind_ontology_processing_spark.operators.domains import (
        domain_cap_sample)
    head = (spark.range(150_000)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("https://head.com/p"),
                             F.col("id").cast("string")).alias("url")))
    tail = (spark.range(5_000)
            .select((F.col("id") + 1_000_000).alias("doc_id"),
                    F.concat(F.lit("https://t"), F.col("id").cast("string"),
                             F.lit(".org/x")).alias("url")))
    pages = head.unionByName(tail)
    got = domain_cap_sample(pages, max_per_domain=100)
    agg = got.agg(
        F.sum(F.when(F.col("url").contains("head.com"), 1).otherwise(0))
         .alias("n_head"),
        F.count("*").alias("n_all")).first()
    assert agg.n_head == 100 and agg.n_all == 5_100
    again = domain_cap_sample(pages.repartition(17), max_per_domain=100)
    assert ({r.doc_id for r in got.filter(F.col("url").contains("head"))
             .collect()} ==
            {r.doc_id for r in again.filter(F.col("url").contains("head"))
             .collect()})


def test_skew_report_flags_hot_keys_and_salt_factor(spark):
    from climatemind_ontology_processing_spark.operators.skew import (
        skew_report)
    rows = [("hot",)] * 600 + [("warm",)] * 300 + \
           [(f"k{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string")
    got = {r.key: (r.n, r.share_micro, r.salt_factor)
           for r in skew_report(df, "k", share_threshold_micro=100_000,
                                target_rows_per_task=250).collect()}
    assert set(got) == {"hot", "warm"}
    assert got["hot"] == (600, 600000, 3)     # ceil(600/250)
    assert got["warm"] == (300, 300000, 2)


def test_skew_report_empty_when_uniform(spark):
    from climatemind_ontology_processing_spark.operators.skew import (
        skew_report)
    df = spark.createDataFrame([(f"k{i % 50}",) for i in range(500)],
                               "k string")
    assert skew_report(df, "k", share_threshold_micro=100_000).count() == 0
