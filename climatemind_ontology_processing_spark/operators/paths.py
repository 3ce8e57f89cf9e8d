"""Weighted shortest paths over the KG edge table.

Distance-bounded relevance for entity linking and neighborhood ranking:
BFS (`traversal.bfs_reachable`) gives hop counts; this gives WEIGHTED
distances (edge weights = confidence/cost), the quantity path-relevance
scoring actually wants.

Algorithm: distributed Bellman-Ford (min-plus label relaxation) — the
textbook Pregel SSSP expressed as DataFrame joins:

    dist'(v) = min(dist(v), min over edges (u,v) of dist(u) + w(u,v))

Each round is ONE shuffle (groupBy dst with map-side-combinable min) plus
a keys-only change check; rounds are bounded by the shortest-path hop
diameter.  Shuffle payload is (node, dist) pairs only.  Non-negative
INTEGRAL weights are REQUIRED (both checked, loudly): min-plus runs over
BIGINTs so every distance is engine-exact with zero float wiggle —
fractional confidences must be pre-scaled (e.g. ``round(conf * 1e6)``).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .traversal import _checkpoint


def shortest_paths(edges: DataFrame, seeds: DataFrame | list,
                   src: str = "src", dst: str = "dst",
                   weight: str | None = None,
                   max_rounds: int = 100) -> DataFrame:
    """(id, dist) for every node reachable from any seed; dist = weighted
    shortest-path distance (seeds at 0).  ``weight=None`` means unit
    weights (hop count).  Unreachable nodes produce no row."""
    w = (F.col(weight).cast("long") if weight is not None
         else F.lit(1).cast("long"))
    e = _checkpoint(edges.select(F.col(src).alias("u"),
                                 F.col(dst).alias("v"),
                                 w.alias("w"),
                                 *([F.col(weight).cast("double").alias("_wraw")]
                                   if weight is not None else []))
                    .filter(F.col("u").isNotNull() & F.col("v").isNotNull()))
    if weight is not None:
        # min-plus runs over BIGINTs for engine-exact determinism; a silent
        # cast('long') would truncate 0.9 -> 0 and corrupt every distance
        # (round-3 ADVICE, medium) — reject non-integral weights loudly.
        bad = e.filter(F.col("w").isNull() & F.col("_wraw").isNotNull()
                       | (F.col("_wraw") != F.col("w").cast("double")))
        if not bad.isEmpty():
            raise ValueError(
                f"shortest_paths requires integral, castable weights in "
                f"'{weight}' (min-plus over BIGINTs is engine-exact; "
                "fractional weights would be silently truncated) — "
                "pre-scale, e.g. round(confidence * 1e6) as a long column")
        e = e.drop("_wraw")
    if not e.filter(F.col("w") < 0).isEmpty():
        raise ValueError("negative edge weights not supported")
    spark = edges.sparkSession
    if isinstance(seeds, list):
        t = e.schema["u"].dataType.simpleString()
        seeds = spark.createDataFrame([(s,) for s in sorted(set(seeds))],
                                      f"id {t}")
    dist = _checkpoint(seeds.select("id", F.lit(0).cast("long").alias("dist")))
    converged = False
    for _ in range(max_rounds):
        relaxed = (e.join(dist.withColumnRenamed("id", "u"), "u")
                   .select(F.col("v").alias("id"),
                           (F.col("dist") + F.col("w")).alias("d")))
        new = (dist.unionByName(relaxed.withColumnRenamed("d", "dist"))
               .groupBy("id").agg(F.min("dist").alias("dist")))
        new = _checkpoint(new)
        changed = (new.join(dist.withColumnRenamed("dist", "old"),
                            "id", "left")
                   .filter(F.col("old").isNull() |
                           (F.col("dist") != F.col("old"))))
        dist = new
        if changed.isEmpty():
            converged = True
            break
    if not converged:
        # a truncated relaxation is indistinguishable from a converged one
        raise RuntimeError(
            f"shortest_paths did not converge within max_rounds={max_rounds} "
            "— the graph's hop diameter exceeds the cap; raise max_rounds")
    return dist
