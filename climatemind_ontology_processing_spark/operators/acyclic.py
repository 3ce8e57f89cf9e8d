"""G6 — rule-based cycle cutting (``make_graph_class.make_acyclic``, :395-431).

Remove ``causes_or_promotes`` edges whose source node has direct class
"feedback loop" and whose target has direct class "increase in atmospheric
greenhouse gas" or "root cause linked to humans".  No cycle detection needed —
the rule is declarative, so in Spark it is a pure filter built from two
broadcast class-lookup joins and an anti-join removal (SURVEY §2.7 G6).

The result is the engine's graph ``B``; the pre-cut graph ``G`` stays around
because later passes query both (``make_graph_class.py:516`` uses B,
``:533-540`` uses G — the G/B split is load-bearing, SURVEY §7).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CAUSES, CUT_TARGET_CLASSES, FEEDBACK_LOOP_CLASS


def feedback_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """The edges the rule removes: (src, dst) pairs."""
    classes = nodes.select(F.col("label").alias("_n"),
                           F.col("direct_classes").alias("_dc"))
    src_fb = classes.filter(F.array_contains("_dc", FEEDBACK_LOOP_CLASS)) \
                    .select(F.col("_n").alias("src"))
    tgt = classes.filter(
        F.array_contains("_dc", CUT_TARGET_CLASSES[0]) |
        F.array_contains("_dc", CUT_TARGET_CLASSES[1])
    ).select(F.col("_n").alias("dst"))
    return (edges.filter(F.col("type") == CAUSES)
            .join(F.broadcast(src_fb), "src", "left_semi")
            .join(F.broadcast(tgt), "dst", "left_semi")
            .select("src", "dst"))


def make_acyclic(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Edges of graph B = edges minus the feedback-loop cut set."""
    cut = feedback_edges(edges, nodes).withColumn("type", F.lit(CAUSES))
    return edges.join(F.broadcast(cut), ["src", "dst", "type"], "left_anti")
