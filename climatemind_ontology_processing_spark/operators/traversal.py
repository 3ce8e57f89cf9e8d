"""Iterative graph-traversal operators (SURVEY §2.7 G2-G5, J5, J6).

The reference's traversals are Python recursion/stacks over an in-RAM NetworkX
graph (``ontology_processing_utils.py:7-41``, ``make_graph_class.py:440-455,
516-531``).  Catalyst has no fixpoint operator, so each traversal is a
driver-side loop of DataFrame joins with ``localCheckpoint`` per iteration to
cut lineage (SURVEY §4).  Iteration count is bounded by graph diameter (small
for causal web graphs); each iteration is one shuffle join on the frontier —
the frontier is usually tiny relative to the edge table, so Spark broadcasts
it under AQE.

Edges schema throughout: (src string, dst string, type string, ...).
"""
from __future__ import annotations

import os
import weakref
from collections import defaultdict, deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-DataFrame memo for the small-graph path: the graph pipeline runs 5+
# traversals over the SAME (checkpointed, immutable) edge DataFrame object;
# collecting its adjacency once instead of per call removes two Spark
# actions per repeat traversal.  Weak keys: entries die with the DataFrame.
_SMALL_GRAPH_MEMO: "weakref.WeakKeyDictionary[DataFrame, dict]" = \
    weakref.WeakKeyDictionary()

# Adaptive execution: below this edge count the traversal runs driver-side on
# the collected edge list (identical semantics, zero per-iteration job
# overhead); above it, the iterative-join path runs.  Mirrors Spark's own
# size-based strategy choices (broadcast threshold); the 10^12-scale path is
# the join loop, the curated-ontology path (hundreds of edges) is local.
SMALL_GRAPH_THRESHOLD = int(os.environ.get("CMKG_SMALL_GRAPH_EDGES", "200000"))


def _checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint with a defensive fallback.

    Spark 4.1's localCheckpoint intermittently fails with
    ``NoSuchElementException: key not found: <attr>`` when checkpointing a
    Union of previously-checkpointed plans (observed in the closure loop).
    Re-aliasing every column mints fresh attribute ids, which sidesteps the
    stale-attribute lookup; if even that fails we return the plan
    uncheckpointed (correctness unaffected — only lineage length grows).
    """
    try:
        return df.localCheckpoint(eager=True)
    except Exception:
        try:
            aliased = df.select([F.col(c).alias(c) for c in df.columns])
            return aliased.localCheckpoint(eager=True)
        except Exception:
            return df


def _probe_cols(edges: DataFrame) -> list[str]:
    """Columns the small-graph machinery collects: (src, dst[, type]) when
    present, else the frame's own first two columns (e.g. CC's (a, b))."""
    if "src" in edges.columns and "dst" in edges.columns:
        return (["src", "dst", "type"] if "type" in edges.columns
                else ["src", "dst"])
    return list(edges.columns[:2])


def _edge_count_small(edges: DataFrame) -> bool:
    """Size probe that doubles as the collect: ONE limited collect of the
    distinct probe columns decides small-vs-distributed AND, when small,
    caches the rows every downstream adjacency derives from — the upstream
    plan (often a multi-join substrate) executes once, not once for the
    probe and again for the collect (guide §1/§2.4: don't recompute what
    you already materialized)."""
    if SMALL_GRAPH_THRESHOLD <= 0:
        return False
    memo = _SMALL_GRAPH_MEMO.setdefault(edges, {})
    # keyed on the live threshold so tests that flip it mid-session re-probe
    key = ("small", SMALL_GRAPH_THRESHOLD)
    if key not in memo:
        cols = _probe_cols(edges)
        # RAW limited collect (same row-count gate the round-start probe
        # used) — no extra distinct exchange on top of the upstream plan;
        # the dedup happens driver-side on the rows we collected anyway
        rows = edges.select(*cols).limit(SMALL_GRAPH_THRESHOLD + 1).collect()
        memo[key] = len(rows) <= SMALL_GRAPH_THRESHOLD
        if memo[key]:
            seen = set()
            dedup = []
            for r in rows:
                t = tuple(r)
                if t not in seen:
                    seen.add(t)
                    dedup.append(t)
            memo[("probe_rows", tuple(cols))] = dedup
    return memo[key]


def _mark_small(df: DataFrame) -> DataFrame:
    """Pre-seed the small-graph verdict for a frame DERIVED from one
    already probed small (subset edge sets can only shrink) — skips the
    limit-collect probe; the first consumer still collects the rows."""
    if SMALL_GRAPH_THRESHOLD > 0:
        _SMALL_GRAPH_MEMO.setdefault(df, {})[
            ("small", SMALL_GRAPH_THRESHOLD)] = True
    return df


def _adopt_probe(target: DataFrame, source: DataFrame) -> None:
    """Copy a small-graph probe verdict (and its collected rows) from
    ``source`` onto ``target`` — for a target that differs from the probed
    source only by a dedup the probe machinery performs driver-side anyway
    (e.g. dropDuplicates over the same projection), so re-collecting
    through the target's exchange would do no new work."""
    src_memo = _SMALL_GRAPH_MEMO.get(source)
    if not src_memo:
        return
    tgt = _SMALL_GRAPH_MEMO.setdefault(target, {})
    for key, val in src_memo.items():
        tgt.setdefault(key, val)


def _stash_local_rows(df: DataFrame, rows: list) -> DataFrame:
    """Record the driver-side rows a small-path operator just built its
    DataFrame from, so downstream small-path consumers read them back
    without a collect job (WeakKeyDictionary — dies with the frame)."""
    _SMALL_GRAPH_MEMO.setdefault(df, {})["local_rows"] = rows
    return df


def _local_rows(df: DataFrame):
    """The stashed driver-side rows for ``df``, or None."""
    memo = _SMALL_GRAPH_MEMO.get(df)
    return None if memo is None else memo.get("local_rows")


def _collect_probe_rows(edges: DataFrame) -> list[tuple]:
    """Distinct rows of the probe columns, reusing the probe's collect."""
    memo = _SMALL_GRAPH_MEMO.setdefault(edges, {})
    cols = _probe_cols(edges)
    key = ("probe_rows", tuple(cols))
    if key not in memo:
        rows = edges.select(*cols).distinct().collect()
        memo[key] = [tuple(r) for r in rows]
    return memo[key]


def _collect_edge_rows(edges: DataFrame) -> list[tuple]:
    """One collect of (src, dst, type) per DataFrame object; every
    (direction, edge_type) adjacency derives from it driver-side, so N
    traversals over the same graph cost ONE Spark action total."""
    memo = _SMALL_GRAPH_MEMO.setdefault(edges, {})
    if "rows" not in memo:
        has_type = "type" in edges.columns
        rows = _collect_probe_rows(edges)
        memo["rows"] = [(r[0], r[1], r[2] if has_type else None) for r in rows]
    return memo["rows"]


def _collect_hops(edges: DataFrame, direction: str,
                  edge_type: str | None) -> dict[str, list]:
    memo = _SMALL_GRAPH_MEMO.setdefault(edges, {})
    key = ("adj", direction, edge_type)
    if key in memo:
        return memo[key]
    adj: dict = defaultdict(list)
    seen = set()
    for s, d, t in _collect_edge_rows(edges):
        if edge_type is not None and t != edge_type:
            continue
        if (s, d) in seen:          # distinct over (src, dst) like before
            continue
        seen.add((s, d))
        if direction in ("forward", "any"):
            adj[s].append(d)
        if direction in ("reverse", "any"):
            adj[d].append(s)
    memo[key] = adj
    return adj


def _seed_values(seeds: DataFrame | list) -> list:
    """Seeds may be a DataFrame[id] or a plain driver-side list (saves a
    Spark action when the caller already knows the seed labels); a frame
    with stashed local rows (a literal the caller just built) reads them
    back without the distinct+collect job."""
    if isinstance(seeds, list):
        return sorted(set(seeds))
    rows = _local_rows(seeds)
    if rows is not None:
        return sorted({r[0] for r in rows})
    return sorted({r[0] for r in seeds.distinct().collect()})


def _seed_df(spark, seeds: DataFrame | list) -> DataFrame:
    if isinstance(seeds, list):
        return spark.createDataFrame([(s,) for s in sorted(set(seeds))],
                                     "id string")
    return seeds


def _group_seeds(seeds: DataFrame) -> list[tuple[str, list]]:
    grouped: dict = defaultdict(list)
    for r in seeds.distinct().collect():
        grouped[r[0]].append(r[1])
    return sorted(grouped.items())


def _bfs_local(adj: dict, seeds: list) -> set:
    visited = set(seeds)
    q = deque(seeds)
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in visited:
                visited.add(v)
                q.append(v)
    return visited


def bfs_reachable(edges: DataFrame, seeds: DataFrame | list,
                  direction: str = "forward",
                  edge_type: str | None = None, max_iters: int = 200) -> DataFrame:
    """G2 — typed directional BFS (``custom_bfs``,
    ``ontology_processing_utils.py:7-41``): node set reachable from ``seeds``
    along edges of ``edge_type`` (None = "any") in ``direction`` (forward /
    reverse / any).  ``seeds`` is a DataFrame[id] or a driver-side list of
    string ids.  Returns DataFrame[id] including the seeds.

    The reference returns an *induced subgraph*; compose with
    :func:`induced_edges` for the edge set.
    """
    spark = edges.sparkSession
    if _edge_count_small(edges):
        adj = _collect_hops(edges, direction, edge_type)
        reached = sorted(_bfs_local(adj, _seed_values(seeds)))
        seed_type = ("string" if isinstance(seeds, list)
                     else seeds.schema.fields[0].dataType.simpleString())
        return spark.createDataFrame([(v,) for v in reached], f"id {seed_type}")
    seeds = _seed_df(spark, seeds)
    e = edges
    if edge_type is not None:
        e = e.filter(F.col("type") == edge_type)
    hops = []
    if direction in ("forward", "any"):
        hops.append(e.select(F.col("src").alias("from"), F.col("dst").alias("to")))
    if direction in ("reverse", "any"):
        hops.append(e.select(F.col("dst").alias("from"), F.col("src").alias("to")))
    if not hops:
        raise ValueError(f"bad direction {direction!r}")
    hop = hops[0] if len(hops) == 1 else hops[0].unionByName(hops[1])
    hop = _checkpoint(hop.distinct())

    visited = _checkpoint(seeds.select(F.col(seeds.columns[0]).alias("id")).distinct())
    frontier = visited
    for _ in range(max_iters):
        nxt = (frontier.join(hop, frontier.id == hop["from"])
               .select(F.col("to").alias("id")).distinct()
               .join(visited, "id", "left_anti"))
        nxt = _checkpoint(nxt)
        if nxt.isEmpty():
            break
        visited = _checkpoint(visited.unionByName(nxt))
        frontier = nxt
    return visited


def bfs_reachable_tagged(edges: DataFrame, seeds: DataFrame,
                         direction: str = "forward", edge_type: str | None = None,
                         max_iters: int = 200) -> DataFrame:
    """G10 — multi-source tagged BFS: ``seeds`` is DataFrame[tag, id]; expands
    all tags in ONE iterative join (one Spark loop for ~20 seeds, not 20
    loops).  Returns DataFrame[tag, id]."""
    spark = edges.sparkSession
    if _edge_count_small(edges):
        adj = _collect_hops(edges, direction, edge_type)
        id_field = seeds.schema.fields[1]
        rows = []
        for tag, seed_vals in _group_seeds(seeds):
            for v in sorted(_bfs_local(adj, seed_vals)):
                rows.append((tag, v))
        return spark.createDataFrame(
            rows, f"tag string, id {id_field.dataType.simpleString()}")
    e = edges
    if edge_type is not None:
        e = e.filter(F.col("type") == edge_type)
    hops = []
    if direction in ("forward", "any"):
        hops.append(e.select(F.col("src").alias("from"), F.col("dst").alias("to")))
    if direction in ("reverse", "any"):
        hops.append(e.select(F.col("dst").alias("from"), F.col("src").alias("to")))
    hop = hops[0] if len(hops) == 1 else hops[0].unionByName(hops[1])
    hop = _checkpoint(hop.distinct())

    visited = _checkpoint(seeds.select("tag", F.col(seeds.columns[1]).alias("id")).distinct())
    frontier = visited
    for _ in range(max_iters):
        nxt = (frontier.join(hop, frontier.id == hop["from"])
               .select("tag", F.col("to").alias("id")).distinct()
               .join(visited, ["tag", "id"], "left_anti"))
        nxt = _checkpoint(nxt)
        if nxt.isEmpty():
            break
        visited = _checkpoint(visited.unionByName(nxt))
        frontier = nxt
    return visited


def induced_edges(edges: DataFrame, nodeset: DataFrame) -> DataFrame:
    """J5 — ``graph.subgraph(nodes)`` edge selection
    (``ontology_processing_utils.py:41,59``): keep edges with BOTH endpoints in
    the node set, via two left-semi joins (broadcast when the set is small)."""
    ns = nodeset.select(F.col(nodeset.columns[0]).alias("id")).distinct()
    return (edges.join(ns.withColumnRenamed("id", "src"), "src", "left_semi")
                 .join(ns.withColumnRenamed("id", "dst"), "dst", "left_semi"))


def union_subgraph(nodesets: list[DataFrame], edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """U4 — ``union_subgraph`` (``ontology_processing_utils.py:44-59``): union
    the node sets, then re-induce edges from the BASE graph so cross-subgraph
    edges are kept (unlike ``nx.union``).  Returns (nodes, induced_edges)."""
    out = nodesets[0].select(F.col(nodesets[0].columns[0]).alias("id"))
    for ns in nodesets[1:]:
        out = out.unionByName(ns.select(F.col(ns.columns[0]).alias("id")))
    out = out.distinct()
    return out, induced_edges(edges, out)


def transitive_closure(edges: DataFrame, edge_type: str | None = None,
                       max_iters: int = 200) -> DataFrame:
    """Reflexive-transitive closure pairs (src, dst): src reaches dst.

    Supports the G5 rewrite (SURVEY §2.7): node n lies on a simple path
    root -> e in a DAG iff reach(root, n) ∧ reach(n, e) — replacing the
    reference's exponential ``nx.all_simple_paths`` enumeration
    (``make_graph_class.py:522-528``) with a polynomial reachability product.

    Semi-naive iteration: delta ⨝ edges, accumulate, stop at fixpoint; bounded
    by diameter.  Reflexive pairs (n, n) for every endpoint are included
    (``all_simple_paths(r, r)`` yields [[r]] in the reference's NetworkX).
    """
    spark = edges.sparkSession
    if _edge_count_small(edges):
        fwd = _collect_hops(edges, "forward", edge_type)
        nodes = set(fwd)
        for vs in list(fwd.values()):
            nodes.update(vs)
        pairs = []
        src_field = edges.schema["src"].dataType.simpleString()
        for n in sorted(nodes):
            for m in sorted(_bfs_local(fwd, [n])):
                pairs.append((n, m))
        return spark.createDataFrame(pairs, f"src {src_field}, dst {src_field}")
    e = edges
    if edge_type is not None:
        e = e.filter(F.col("type") == edge_type)
    base = _checkpoint(e.select("src", "dst").distinct())
    nodes = base.select(F.col("src").alias("n")).unionByName(
        base.select(F.col("dst").alias("n"))).distinct()
    closure = _checkpoint(
        nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        .unionByName(base).distinct())
    delta = closure
    for _ in range(max_iters):
        step = (delta.alias("c").join(base.alias("e"),
                                      F.col("c.dst") == F.col("e.src"))
                .select(F.col("c.src").alias("src"), F.col("e.dst").alias("dst"))
                .distinct()
                .join(closure, ["src", "dst"], "left_anti"))
        step = _checkpoint(step)
        if step.isEmpty():
            break
        closure = _checkpoint(closure.unionByName(step))
        delta = step
    return closure


def rpq_reachable(triples: DataFrame, seeds: DataFrame,
                  transitions: list[tuple[int, str, int]],
                  accept_states: tuple[int, ...],
                  start_state: int = 0, s: str = "subj", p: str = "pred",
                  o: str = "obj", max_rounds: int = 100) -> DataFrame:
    """Regular path query (label-constrained reachability): every
    (seed, node, state) with ``state`` accepting and some path from the
    seed whose predicate SEQUENCE drives the NFA ``transitions`` (list of
    (state, pred, next_state)) from ``start_state`` into ``state`` —
    e.g. ``buys_from* . in_nation . in_region`` as
    ``[(0,'buys_from',0), (0,'in_nation',1), (1,'in_region',2)]`` with
    accept ``(2,)``.

    The classic automaton-product construction: BFS over (node, NFA
    state) pairs — each round joins the frontier to the edge table on
    the node AND to the (broadcast, literally-tiny) transition table on
    (state, pred), anti-joins the visited set, and stops when the
    frontier drains (loud RuntimeError on the round cap: product-graph
    diameter exceeded).  State explosion is bounded by |V| x |NFA
    states| — NFAs for real path patterns have a handful of states.

    Returns (seed, node, state) for ACCEPTING visited pairs, including
    the seed itself when ``start_state`` accepts."""
    if not transitions:
        raise ValueError("transitions must be non-empty")
    if not accept_states:
        raise ValueError("accept_states must be non-empty")
    spark = triples.sparkSession
    trans = spark.createDataFrame(
        [(int(a), str(pr), int(b)) for a, pr, b in transitions],
        "state int, pred string, nstate int")
    e = (triples.select(F.col(s).alias("u"), F.col(p).alias("pred"),
                        F.col(o).alias("v"))
         .distinct().localCheckpoint(eager=True))
    visited = (seeds.select(F.col("id").alias("seed"),
                            F.col("id").alias("node"),
                            F.lit(start_state).alias("state"))
               .distinct().localCheckpoint(eager=True))
    frontier = visited
    for _ in range(max_rounds):
        step = (frontier
                .join(e, frontier.node == e.u)
                .join(F.broadcast(trans),
                      (frontier.state == trans.state)
                      & (e.pred == trans.pred))
                .select("seed", F.col("v").alias("node"),
                        F.col("nstate").alias("state"))
                .distinct())
        fresh = (step.join(visited, ["seed", "node", "state"], "left_anti")
                 .localCheckpoint(eager=True))
        if fresh.isEmpty():
            return (visited
                    .filter(F.col("state").isin(list(accept_states)))
                    .select("seed", "node", "state"))
        visited = visited.unionByName(fresh).localCheckpoint(eager=True)
        frontier = fresh
    raise RuntimeError(
        f"rpq_reachable: frontier still growing after max_rounds="
        f"{max_rounds} — product-graph diameter exceeds the cap")
