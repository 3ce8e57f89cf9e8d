"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-construction query on /root/testdata/sf0.001:
mention detection over the ``documents`` table against a broadcast term
dictionary, then co-occurrence triple construction + dedup + ranking — the
engine's core loop (SURVEY §2 G1-analog + A1 + O1) on driver-provided data.

``queries()`` / ``oracle_sql()`` — per-operator DataFrame builders with DuckDB
oracle SQL (SURVEY §2 ids cited on each).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# dictionary of "concepts" for the driver's documents table (its vocabulary is
# engine words); deterministic + tiny -> broadcast
TERMS = [
    "spark", "join", "hash", "scan", "filter", "sort", "merge", "window",
    "stream", "agg", "group", "query", "table", "column", "vector", "batch",
    "customer", "order", "part", "line", "key", "value", "data", "row",
]


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Co-occurrence KG from documents: tokenize, keep dictionary terms,
    emit per-doc (subj < obj) pairs, count edge weight, rank."""
    return _q_cooccurrence_edges(spark, "/root/testdata/sf0.001")


def _q_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    terms = spark.createDataFrame([(t,) for t in TERMS], "term string")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    mentions = (tokens.join(F.broadcast(terms), tokens.tok == terms.term)
                .select("doc_id", "term").distinct())
    a = mentions.alias("a")
    b = mentions.alias("b")
    return (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) &
                   (F.col("a.term") < F.col("b.term")))
            .groupBy(F.col("a.term").alias("subj"), F.col("b.term").alias("obj"))
            .agg(F.count("*").alias("weight"))
            .withColumn("pred", F.lit("co_occurs_with"))
            .select("subj", "pred", "obj", "weight")
            .orderBy(F.col("weight").desc(), F.col("subj").asc(), F.col("obj").asc()))


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cooccurrence_edges": _q_cooccurrence_edges,
    }


def oracle_sql() -> dict[str, str]:
    terms_values = ", ".join(f"('{t}')" for t in TERMS)
    return {
        "cooccurrence_edges": f"""
            WITH terms(term) AS (VALUES {terms_values}),
            mentions AS (
              SELECT DISTINCT d.doc_id, t.term
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents) d
              JOIN terms t ON d.tok = t.term
            )
            SELECT a.term AS subj, 'co_occurs_with' AS pred, b.term AS obj,
                   count(*) AS weight
            FROM mentions a JOIN mentions b
              ON a.doc_id = b.doc_id AND a.term < b.term
            GROUP BY 1, 2, 3
            ORDER BY weight DESC, subj ASC, obj ASC
        """,
    }
