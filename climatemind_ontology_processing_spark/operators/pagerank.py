"""PageRank over the KG edge table — concept-importance ranking.

Not in the reference (its graphs are curated and tiny); at web scale the
extracted concept graph needs an importance signal for entity-link scoring
and feed ranking (the reference ranks by hand-curated ``CO2_eq_reduced`` /
``myth_frequency`` instead — O1/O2).

Implementation is the standard power iteration as DataFrame joins
(Brin & Page 1998; the MapReduce formulation is textbook):

    rank'(v) = (1 - d)/N + d * ( sum_{u -> v} rank(u)/outdeg(u)
                                 + dangling_mass/N )

* out-degrees computed once and joined broadcast-side when small;
* each iteration is ONE shuffle (groupBy dst) plus a tiny driver-side
  aggregate for the dangling mass — the loop is bounded by ``iters``
  (fixed-point iteration counts, not convergence tests, so an exact SQL
  oracle can replay it);
* ``localCheckpoint`` per iteration cuts lineage like the other fixpoint
  loops (SURVEY §4).

Determinism: float summation order inside a groupBy is partition-dependent;
ranks are therefore bit-stable only up to ~1e-15 per iteration — callers
that hash-compare round to 6 decimals (the driver query does).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 10, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Returns (id, rank) after ``iters`` power iterations with uniform
    initialization 1/N.  Dangling nodes (no out-edges) redistribute their
    mass uniformly, so total rank stays 1."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")) \
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull()) \
        .distinct().localCheckpoint(eager=True)
    nodes = (e.select(F.col("u").alias("id"))
             .unionByName(e.select(F.col("v").alias("id")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("u").agg(F.count("*").alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (e.join(ranks.withColumnRenamed("id", "u"), "u")
                    .join(outdeg, "u")
                    .select(F.col("v").alias("id"),
                            (F.col("rank") / F.col("deg")).alias("c")))
        inflow = contribs.groupBy("id").agg(F.sum("c").alias("inflow"))
        # dangling mass: rank held by nodes with no out-edges
        dangling = (ranks.join(outdeg.withColumnRenamed("u", "id"),
                               "id", "left_anti")
                    .agg(F.sum("rank")).first()[0]) or 0.0
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (nodes.join(inflow, "id", "left")
                 .select("id",
                         (F.lit(base) +
                          F.lit(damping) * F.coalesce("inflow", F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks
