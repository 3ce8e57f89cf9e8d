"""Basic-graph-pattern (motif) matching over the KG triple table.

The reference's graph queries are hand-coded NetworkX loops over fixed
shapes (e.g. the myth-neighbor walk, ontology_processing/graph_creation/
make_graph.py's per-edge-type scans); a web-scale KG needs the general
form: a SPARQL-style conjunctive pattern compiled to a chain of
DataFrame self-joins, the same operator GraphFrames exposes as
``find()``.  This is a from-scratch implementation over plain
(subj, pred, obj) rows.

Pattern syntax — semicolon-separated typed edges::

    (c)-[buys_from]->(s); (s)-[in_nation]->(n); (c)-[in_nation]->(n)

Each ``(x)`` is a node variable (bound across the whole pattern); the
bracket holds either a predicate literal or ``?p`` — a predicate
variable, itself bound across the pattern and returned as a column.

Plan shape / scale notes:

- Each pattern edge is one shuffle join keyed on the variables it shares
  with the already-bound prefix.  Predicate literals become pushed-down
  scan filters (one filtered scan per pattern edge — Catalyst prunes to
  (subj, obj) and pushes ``pred = 'x'`` into the parquet reader).
- Join ORDER is selectivity order: with ``reorder=True`` (default) a
  single tiny per-predicate count aggregate (bounded by the number of
  distinct predicates — schema-sized, not data-sized) picks the rarest
  connected pattern edge first, the classic greedy BGP heuristic from
  SPARQL engines.  Ties and the no-reorder path use author order.
- Disconnected patterns would need a cartesian product; that is almost
  always a query bug at 10^12 triples, so it raises unless
  ``allow_cartesian=True``.
- ``distinct_vars=True`` gives subgraph-isomorphism semantics (all node
  variables pairwise distinct) via post-join filters; False gives the
  cheaper homomorphism semantics.
"""
from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EDGE_RE = re.compile(
    r"^\(\s*(\w+)\s*\)\s*-\s*\[\s*(\??[\w:]+)\s*\]\s*->\s*\(\s*(\w+)\s*\)$")


@dataclass(frozen=True)
class TriplePattern:
    src: str          # node variable
    pred: str         # predicate literal, or variable name (pred_is_var)
    dst: str          # node variable
    pred_is_var: bool


def parse_pattern(pattern: str) -> list[TriplePattern]:
    """Parse the motif DSL into triple patterns; raises on malformed input."""
    out = []
    for part in pattern.split(";"):
        part = part.strip()
        if not part:
            continue
        m = _EDGE_RE.match(part)
        if m is None:
            raise ValueError(f"malformed motif edge: {part!r}")
        src, pred, dst = m.groups()
        out.append(TriplePattern(src, pred.lstrip("?"), dst,
                                 pred.startswith("?")))
    if not out:
        raise ValueError("empty motif pattern")
    return out


def _order_patterns(pats: list[TriplePattern],
                    pred_counts: dict[str, int] | None,
                    allow_cartesian: bool) -> list[TriplePattern]:
    """Greedy connected ordering, rarest-predicate-first when counts are
    known.  Author order breaks ties (stable sort)."""

    def cost(p: TriplePattern) -> int:
        if p.pred_is_var or pred_counts is None:
            return 1 << 62  # unknown selectivity sorts last among starts
        return pred_counts.get(p.pred, 0)

    remaining = list(pats)
    remaining.sort(key=cost)  # stable: author order within equal cost
    ordered = [remaining.pop(0)]
    bound = {ordered[0].src, ordered[0].dst}
    if ordered[0].pred_is_var:
        bound.add(ordered[0].pred)
    while remaining:
        nxt = next((p for p in remaining
                    if p.src in bound or p.dst in bound
                    or (p.pred_is_var and p.pred in bound)), None)
        if nxt is None:
            if not allow_cartesian:
                raise ValueError(
                    "disconnected motif pattern requires a cartesian "
                    "product; pass allow_cartesian=True if intended")
            nxt = remaining[0]
        remaining.remove(nxt)
        ordered.append(nxt)
        bound |= {nxt.src, nxt.dst}
        if nxt.pred_is_var:
            bound.add(nxt.pred)
    return ordered


def match_motif(triples: DataFrame, pattern: str, *,
                distinct_vars: bool = True, reorder: bool = True,
                allow_cartesian: bool = False) -> DataFrame:
    """One output row per binding of the pattern's variables.

    Output columns = node variables (binding values from subj/obj) plus
    predicate variables, in first-appearance order.
    """
    pats = parse_pattern(pattern)

    pred_counts = None
    if reorder and len(pats) > 1:
        # Tiny aggregate: one row per distinct predicate (schema-sized).
        pred_counts = {r["pred"]: r["n"] for r in
                       triples.groupBy("pred").agg(F.count("*").alias("n"))
                       .collect()}
    ordered = _order_patterns(pats, pred_counts, allow_cartesian)

    bound: DataFrame | None = None
    node_vars: list[str] = []
    pred_vars: list[str] = []
    for v in (x for p in pats for x in
              ((p.src, p.dst, p.pred) if p.pred_is_var else (p.src, p.dst))):
        if v not in node_vars and v not in pred_vars:
            (pred_vars if any(q.pred_is_var and q.pred == v for q in pats)
             else node_vars).append(v)

    for i, p in enumerate(ordered):
        e = triples
        cols = [F.col("subj").alias(p.src)]
        if p.pred_is_var:
            cols.append(F.col("pred").alias(p.pred))
        else:
            e = e.filter(F.col("pred") == p.pred)  # pushed-down scan filter
        cols.append(F.col("obj").alias(p.dst))
        # Self-edges within ONE pattern edge ((a)-[p]->(a)) bind src == dst.
        if p.src == p.dst:
            e = e.filter(F.col("subj") == F.col("obj"))
            cols = cols[:-1]
        step = e.select(*cols)
        if bound is None:
            bound = step
        else:
            shared = [c for c in step.columns if c in bound.columns]
            if shared:
                bound = bound.join(step, shared)
            else:
                bound = bound.crossJoin(step)

    assert bound is not None
    if distinct_vars:
        for i, a in enumerate(node_vars):
            for b in node_vars[i + 1:]:
                bound = bound.filter(F.col(a) != F.col(b))
    # SPARQL SELECT DISTINCT semantics; also shields against non-distinct
    # input triples (provenance-duplicated rows).
    return bound.select(*node_vars, *pred_vars).distinct()
