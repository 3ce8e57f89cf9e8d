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
