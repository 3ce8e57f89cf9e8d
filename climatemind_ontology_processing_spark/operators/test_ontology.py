"""P5 — test-ontology node filter (``ontology_processing_utils.py:145-165``).

Keep a node iff at least one of its direct classes is in the allow-set AND
none is in the deny-set (deny wins — the reference's loop breaks on a deny hit
regardless of earlier allow hits).  Then re-induce edges on the surviving node
set (J5).

Reference quirk NOT replicated (documented): ``get_test_ontology`` iterates
edges and only tests edge ENDPOINTS — an isolated node would never be
examined; our graphs have no isolated nodes (nodes exist only as edge
endpoints, ``make_graph_class.py:89-91``), so semantics coincide.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import NON_TEST_ONT, VALID_TEST_ONT
from .traversal import induced_edges


def filter_test_ontology(nodes: DataFrame, edges: DataFrame,
                         allow: set[str] | None = None,
                         deny: set[str] | None = None) -> tuple[DataFrame, DataFrame]:
    """Returns (kept_nodes, induced_edges)."""
    allow_arr = F.array(*[F.lit(x) for x in sorted(allow or VALID_TEST_ONT)])
    deny_arr = F.array(*[F.lit(x) for x in sorted(deny or NON_TEST_ONT)])
    kept = nodes.filter(
        F.arrays_overlap(F.col("direct_classes"), allow_arr) &
        ~F.arrays_overlap(F.col("direct_classes"), deny_arr))
    kept_edges = induced_edges(edges, kept.select(F.col("label")))
    return kept, kept_edges
