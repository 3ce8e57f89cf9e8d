"""Graph statistics over the KG edge table: triangle counts and degrees.

Not in the reference (tiny curated graphs); at web scale triangle counts
feed clustering-coefficient quality signals for extracted concept
neighborhoods (dense triangles ⇒ coherent topic cluster; zero triangles at
high degree ⇒ hub/spam suspect).

Triangle counting uses the canonical-orientation join (each undirected edge
stored once as (lo, hi)): triangles are (a<b<c) with all three edges
present, found by joining edge (a,b) x (b,c) and probing (a,c) — every
triangle is produced exactly once, so no division by 3/6 is needed.  The
orientation also bounds skew: a degree-d hub contributes at most d(d-1)/2
probe pairs but ordered orientation splits work across its neighbors (the
standard MapReduce triangle trick).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_canonical(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """One row per undirected edge as (lo, hi), self-loops dropped."""
    return (edges.select(F.least(src, dst).alias("lo"),
                         F.greatest(src, dst).alias("hi"))
            .filter(F.col("lo") != F.col("hi"))
            .distinct())


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """All triangles (a < b < c), each exactly once."""
    e = undirected_canonical(edges, src, dst)
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    return (ab.join(bc, "b")
            .join(ac, ["a", "c"], "left_semi")
            .select("a", "b", "c"))


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """(id, n_triangles) for every node incident to >= 1 canonical edge;
    nodes in no triangle report 0."""
    e = undirected_canonical(edges, src, dst)
    nodes = (e.select(F.col("lo").alias("id"))
             .unionByName(e.select(F.col("hi").alias("id"))).distinct())
    tri = triangles(edges, src, dst)
    member = (tri.select(F.col("a").alias("id"))
              .unionByName(tri.select(F.col("b").alias("id")))
              .unionByName(tri.select(F.col("c").alias("id"))))
    counts = member.groupBy("id").agg(F.count("*").alias("n_triangles"))
    return (nodes.join(counts, "id", "left")
            .select("id", F.coalesce("n_triangles", F.lit(0))
                    .cast("long").alias("n_triangles")))
